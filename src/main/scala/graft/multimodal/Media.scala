package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads carried as opaque
  * `binary` columns with typed metadata, processed in batched
  * `mapPartitions` stages (the Scala-side equivalent of mapInPandas
  * batching: iterate a partition, amortize per-batch setup, emit rows).
  *
  * The Spark-side plumbing — schema, batch shape, partition sizing,
  * deterministic feature rows — is real and tested. IMAGE decode is real:
  * [[ImageIoCodec]] reads actual pixels through JDK ImageIO
  * (PNG/JPEG/GIF/BMP, no external dependency). AUDIO decode is real too:
  * [[JavaSoundCodec]] parses RIFF/AIFF/AU containers and reads actual PCM
  * samples through `javax.sound.sampled` (also in the JDK). VIDEO decode
  * is real for UNCOMPRESSED streams: [[Y4mCodec]] parses YUV4MPEG2 (.y4m)
  * containers — header grammar, FRAME markers, 4:2:0/4:2:2/4:4:4/mono
  * plane geometry — and reads actual luma/chroma samples, needing no
  * codec at all. COMPRESSED video (H.264 etc.) genuinely has no JDK
  * decoder; those payloads fall out as undecodable through the same
  * [[VideoCodec]] seam a real library would plug into ([[StubCodec]]
  * remains the byte-stat fallback for opaque-blob accounting).
  */
final case class MediaRow(
    media_id: Long,
    kind: String, // "image" | "audio" | "video"
    data: Array[Byte],
    width: Int, // metadata carried alongside the blob
    height: Int,
    duration_ms: Int)

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    mean_byte: Double,
    byte_entropy: Double,
    frames_sampled: Int)

/** The decode seam. A real implementation wraps an image/audio codec and
  * MUST be initialized once per partition (expensive native setup), never
  * per row — see [[Media.extractFeatures]] for the batching contract.
  */
trait MediaCodec extends Serializable {
  def decode(row: MediaRow): MediaFeatures
}

/** Per-image pixel statistics from a REAL decode. `channels == 0` marks an
  * undecodable payload (truncated file, unknown format) — corrupt rows are
  * a fact of web-scale media corpora, so the schema carries the failure
  * instead of the task throwing. Channel means are e4-scaled truncating
  * integers (sum*10000/nPixels) so a cross-engine oracle can reproduce
  * them exactly.
  */
final case class ImageStats(
    media_id: Long,
    width: Int,
    height: Int,
    channels: Int,
    mean_r_e4: Long,
    mean_g_e4: Long,
    mean_b_e4: Long)

/** Pixel-decode seam: image bytes → stats, or None when undecodable. */
trait ImageCodec extends Serializable {
  /** Called once per PARTITION before any row — expensive setup belongs
    * here, never in [[decodeImage]].
    */
  def init(): Unit = ()
  def decodeImage(bytes: Array[Byte]): Option[ImageStats]
}

/** Real image decoder on JDK ImageIO — PNG/JPEG/GIF/BMP readers ship with
  * Java 17 itself (`javax.imageio`), so actual pixel decode needs no
  * external dependency. Reference treats media payloads as opaque blobs;
  * this is the §2.5 extension surface's decode stage made real.
  */
object ImageIoCodec extends ImageCodec {
  /** Disable ImageIO's disk-backed stream cache: executor-local temp files
    * per image would dominate decode cost at scale. Once per partition.
    */
  override def init(): Unit = javax.imageio.ImageIO.setUseCache(false)

  override def decodeImage(bytes: Array[Byte]): Option[ImageStats] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) None // unknown format or truncated payload
    else {
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y) // sRGB-converted ARGB regardless of raster layout
          sr += (rgb >> 16) & 0xff
          sg += (rgb >> 8) & 0xff
          sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Some(ImageStats(0L, w, h, img.getColorModel.getNumComponents,
        sr * 10000L / n, sg * 10000L / n, sb * 10000L / n))
    }
  }
}

/** Per-clip sample statistics from a REAL PCM decode. `channels == 0`
  * marks an undecodable payload (truncated container, unknown codec) —
  * carried in the schema, never thrown. The sums are exact integers over
  * the decoded samples so a cross-engine oracle can reproduce them from
  * the construction parameters alone: `sum_abs` = Σ|s| and `sum_signed`
  * = Σs over every sample of every channel.
  */
final case class AudioStats(
    media_id: Long,
    sample_rate: Int,
    channels: Int,
    bits: Int,
    n_frames: Long,
    sum_abs: Long,
    sum_signed: Long)

/** PCM-decode seam for audio payloads, mirroring [[ImageCodec]]. */
trait AudioCodec extends Serializable {
  /** Once per PARTITION before any row — expensive setup belongs here. */
  def init(): Unit = ()
  def decodeAudio(bytes: Array[Byte]): Option[AudioStats]
}

/** Real audio decoder on `javax.sound.sampled` — WAV/AIFF/AU PCM readers
  * ship with Java 17 itself, so actual sample decode needs no external
  * dependency (compressed codecs like MP3/AAC genuinely don't, and fall
  * out as `None`). Streams the clip in bounded chunks: executor memory
  * holds one 64 KiB buffer, never the decoded clip.
  */
object JavaSoundCodec extends AudioCodec {
  import javax.sound.sampled.{AudioFormat, AudioSystem}

  override def decodeAudio(bytes: Array[Byte]): Option[AudioStats] = {
    val in =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    if (in == null) None
    else
      try {
        val f = in.getFormat
        val enc = f.getEncoding
        val signed = enc == AudioFormat.Encoding.PCM_SIGNED
        val bits = f.getSampleSizeInBits
        // only uncompressed integer PCM is in scope (the WAV/AIFF/AU cases
        // the JDK can actually produce); anything else is "undecodable"
        if (!(signed || enc == AudioFormat.Encoding.PCM_UNSIGNED) ||
            (bits != 8 && bits != 16)) None
        else {
          val ch = f.getChannels
          val frameSize = f.getFrameSize
          val big = f.isBigEndian
          val buf = new Array[Byte](65536 - 65536 % math.max(frameSize, 1))
          var sumAbs = 0L; var sumSigned = 0L; var nBytes = 0L
          var havePrev = false // first byte of a sample straddling reads
          var prev: Byte = 0
          var read = in.read(buf)
          while (read > 0) {
            var i = 0
            while (i < read) {
              if (bits == 8) {
                val v = if (signed) buf(i).toInt else (buf(i) & 0xff) - 128
                sumAbs += math.abs(v); sumSigned += v
              } else if (!havePrev) { prev = buf(i); havePrev = true }
              else {
                val cur = buf(i)
                // the HIGH byte sign-extends (Byte → Int), the low masks
                val raw = if (big) (prev.toInt << 8) | (cur & 0xff)
                          else (cur.toInt << 8) | (prev & 0xff)
                val v = if (signed) raw else (raw & 0xffff) - 32768
                sumAbs += math.abs(v); sumSigned += v
                havePrev = false
              }
              i += 1
            }
            nBytes += read
            read = in.read(buf)
          }
          val frames = nBytes / math.max(frameSize, 1)
          Some(AudioStats(0L, f.getSampleRate.toInt, ch, bits, frames,
            sumAbs, sumSigned))
        }
      } catch { case _: java.io.IOException => None }
      finally in.close()
  }
}

/** Per-clip sample statistics from a REAL video decode. `n_frames == 0`
  * marks an undecodable payload (unknown container, truncated frame,
  * compressed codec) — carried in the schema, never thrown. The sums are
  * exact integers over every decoded sample of every frame so a
  * cross-engine oracle can reproduce them from the construction
  * parameters alone: `sum_y` = Σ luma bytes, `sum_cb`/`sum_cr` = Σ chroma
  * bytes across all frames.
  */
final case class VideoStats(
    media_id: Long,
    width: Int,
    height: Int,
    n_frames: Long,
    sum_y: Long,
    sum_cb: Long,
    sum_cr: Long)

/** Frame-decode seam for video payloads, mirroring [[ImageCodec]]. */
trait VideoCodec extends Serializable {
  /** Once per PARTITION before any row — expensive setup belongs here. */
  def init(): Unit = ()
  def decodeVideo(bytes: Array[Byte]): Option[VideoStats]
}

/** Real video decoder for UNCOMPRESSED streams: YUV4MPEG2 (.y4m) is the
  * classic raw-video interchange container (mjpegtools/ffmpeg lineage) —
  * an ASCII parameter header, then `FRAME` markers each followed by raw
  * Y'CbCr planes. No codec is involved, so ACTUAL sample decode needs no
  * external dependency; parsing covers the header grammar (`W`/`H`/`C`
  * tags, unknown tags skipped per spec), per-frame optional parameters,
  * and the plane geometry of 4:2:0 (all `C420*` variants), 4:2:2, 4:4:4,
  * and mono. Compressed video (H.264/VP9/…) genuinely has no JDK decoder
  * and falls out as `None`, as does any truncated or malformed stream.
  * Bounded memory: one pass over the byte array, O(1) state.
  */
object Y4mCodec extends VideoCodec {
  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII
  /** Dimension cap: a corrupt header must not turn into a giant plane
    * expectation (w*h drives only loop bounds here, but reject absurdity
    * loudly-by-None rather than scanning garbage).
    */
  private val MaxDim = 32768

  override def decodeVideo(bytes: Array[Byte]): Option[VideoStats] = {
    val n = bytes.length
    var i = 0
    while (i < n && bytes(i) != '\n') i += 1
    if (i >= n) return None // no header line
    val header = new String(bytes, 0, i, Ascii)
    if (!header.startsWith("YUV4MPEG2")) return None
    var w = -1
    var h = -1
    var cs = "420jpeg" // the spec's default colourspace when C is absent
    header.split(' ').iterator.drop(1).filter(_.nonEmpty).foreach { tok =>
      tok.charAt(0) match {
        case 'W' => w = toIntOr(tok.substring(1), -1)
        case 'H' => h = toIntOr(tok.substring(1), -1)
        case 'C' => cs = tok.substring(1)
        case _ => () // F/I/A/X… tags don't shape the planes
      }
    }
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return None
    // chroma plane geometry — EXACT 8-bit 3-plane variants only. Prefix
    // matching would mis-size geometry-incompatible tags that share the
    // family digits: C444alpha carries a FOURTH plane and the ffmpeg
    // bit-depth extensions (C420p10, C422p12, ...) carry 2-byte samples —
    // both must be rejected by NAME here, not discovered mid-stream as a
    // bogus "truncated planes" failure. (The three C420 suffixes differ
    // only in chroma SITING — sample counts are identical.)
    val (cw, ch) = cs match {
      case "420" | "420jpeg" | "420mpeg2" | "420paldv" =>
        ((w + 1) / 2, (h + 1) / 2)
      case "422" => ((w + 1) / 2, h)
      case "444" => (w, h)
      case "mono" => (0, 0)
      case _ => return None
    }
    val ySize = w * h
    val cSize = cw * ch
    var sumY = 0L; var sumCb = 0L; var sumCr = 0L
    var frames = 0L
    var p = i + 1
    while (p < n) {
      // FRAME marker line (optional parameters up to the newline)
      var e = p
      while (e < n && bytes(e) != '\n') e += 1
      if (e >= n || e - p < 5 || bytes(p) != 'F' || bytes(p + 1) != 'R' ||
          bytes(p + 2) != 'A' || bytes(p + 3) != 'M' || bytes(p + 4) != 'E')
        return None
      p = e + 1
      if (p.toLong + ySize + 2L * cSize > n) return None // truncated planes
      val yEnd = p + ySize
      while (p < yEnd) { sumY += bytes(p) & 0xff; p += 1 }
      val cbEnd = p + cSize
      while (p < cbEnd) { sumCb += bytes(p) & 0xff; p += 1 }
      val crEnd = p + cSize
      while (p < crEnd) { sumCr += bytes(p) & 0xff; p += 1 }
      frames += 1
    }
    if (frames == 0) None // a header with no frames is not a video
    else Some(VideoStats(0L, w, h, frames, sumY, sumCb, sumCr))
  }

  private def toIntOr(s: String, dflt: Int): Int =
    try s.toInt catch { case _: NumberFormatException => dflt }
}

/** Deterministic stand-in codec for OPAQUE media payloads (compressed
  * video etc. — formats with no JDK decoder; images have [[ImageIoCodec]],
  * audio [[JavaSoundCodec]], raw video [[Y4mCodec]]): "decode" derives
  * byte-level pseudo-features so the batching/plumbing stays exercised
  * for every media kind, decodable or not.
  */
object StubCodec extends MediaCodec {
  override def decode(r: MediaRow): MediaFeatures = {
    val bytes = r.data
    var sum = 0L
    val hist = new Array[Long](256)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b; hist(b) += 1
      i += 1
    }
    val n = math.max(bytes.length, 1)
    var entropy = 0.0
    var j = 0
    while (j < 256) {
      if (hist(j) > 0) {
        val p = hist(j).toDouble / n
        entropy -= p * math.log(p) / math.log(2)
      }
      j += 1
    }
    // frame sampling plan: 1 frame per second of "video", else 1
    val frames = if (r.kind == "video") math.max(r.duration_ms / 1000, 1) else 1
    MediaFeatures(r.media_id, r.kind, bytes.length, sum.toDouble / n,
      entropy, frames)
  }
}

object Media {

  /** Deterministic synthetic media table: binary payload derived from the
    * id (pure function → parallelism-independent), realistic size skew
    * (videos ≫ images).
    */
  def synth(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { id =>
      val r = new java.util.SplittableRandom(seed ^ (id * 0x9e3779b97f4a7c15L))
      val kind = r.nextInt(10) match {
        case 0 | 1 => "audio"
        case 2 => "video"
        case _ => "image"
      }
      val size = kind match {
        case "image" => 256 + r.nextInt(2048)
        case "audio" => 1024 + r.nextInt(8192)
        case "video" => 8192 + r.nextInt(32768)
      }
      val bytes = new Array[Byte](size)
      var i = 0
      while (i < size) { bytes(i) = (r.nextInt(256) - 128).toByte; i += 1 }
      MediaRow(id, kind, bytes,
        width = 64 + r.nextInt(1024), height = 64 + r.nextInt(1024),
        duration_ms = if (kind == "image") 0 else 1000 + r.nextInt(60000))
    })
  }

  /** Deterministic REAL-PNG fixture: each row is an actual PNG (encoded
    * through ImageIO) of a small two-band image — left half one solid
    * color, right half another, both derived from the id. Every pixel
    * statistic is therefore known in closed form from (w, h, colors), so
    * an oracle can verify DECODED pixels without itself decoding: the
    * stats only come out right if the PNG encode→decode round trip read
    * real pixel data. Width is even so the halves are exact.
    */
  def synthPngs(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val p = pngParams(id, seed)
        MediaRow(id, "image", encodePng(p), p.w, p.h, 0)
      }
    }
  }

  /** The closed-form construction parameters of [[synthPngs]] row `id` —
    * the independent path an oracle derives expected pixel stats from.
    */
  final case class PngParams(w: Int, h: Int,
      ra: Int, ga: Int, ba: Int, rb: Int, gb: Int, bb: Int)

  def pngParams(id: Long, seed: Long = 42L): PngParams = {
    val r = new java.util.SplittableRandom(seed ^ (id * 0x9e3779b97f4a7c15L))
    PngParams(w = 2 * (2 + r.nextInt(7)), h = 3 + r.nextInt(12),
      ra = r.nextInt(256), ga = r.nextInt(256), ba = r.nextInt(256),
      rb = r.nextInt(256), gb = r.nextInt(256), bb = r.nextInt(256))
  }

  private def encodePng(p: PngParams): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(p.w, p.h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val a = (p.ra << 16) | (p.ga << 8) | p.ba
    val b = (p.rb << 16) | (p.gb << 8) | p.bb
    var y = 0
    while (y < p.h) {
      var x = 0
      while (x < p.w) {
        img.setRGB(x, y, if (x < p.w / 2) a else b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic REAL-WAV fixture: each row is an actual RIFF/WAVE file
    * (encoded through `javax.sound.sampled`) holding a 16-bit signed
    * little-endian PCM square wave — every sample is `+amp` or `-amp`,
    * flipping each `half` frames, identical across channels. Every sample
    * statistic is therefore known in closed form from
    * (frames, channels, amp, half), so an oracle can verify DECODED
    * samples without itself decoding: Σ|s| and Σs only come out right if
    * the WAV encode→decode round trip read real PCM data.
    */
  def synthWavs(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { id =>
      val p = wavParams(id, seed)
      MediaRow(id, "audio", encodeWav(p), 0, 0,
        duration_ms = (p.frames * 1000L / p.rate).toInt)
    })
  }

  /** The closed-form construction parameters of [[synthWavs]] row `id` —
    * the independent path an oracle derives expected sample stats from.
    * Expected: `n_frames = frames`, `sum_abs = frames*channels*amp`
    * (every sample has magnitude amp), and with period `p = 2*half`,
    * remainder `r = frames mod p`:
    * `sum_signed = channels*amp*(min(r,half) - max(r-half,0))`
    * (full periods cancel; the tail is positive for its first half).
    */
  final case class WavParams(rate: Int, channels: Int, frames: Int,
      amp: Int, half: Int)

  def wavParams(id: Long, seed: Long = 42L): WavParams = {
    val r = new java.util.SplittableRandom(seed ^ (id * 0x9e3779b97f4a7c15L))
    WavParams(rate = Array(8000, 16000, 22050, 44100)(r.nextInt(4)),
      channels = 1 + r.nextInt(2), frames = 200 + r.nextInt(2001),
      amp = 1000 + r.nextInt(29001), half = 1 + r.nextInt(20))
  }

  private def encodeWav(p: WavParams): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val pcm = new Array[Byte](p.frames * p.channels * 2)
    var i = 0
    var off = 0
    while (i < p.frames) {
      val v = if ((i / p.half) % 2 == 0) p.amp else -p.amp
      var c = 0
      while (c < p.channels) {
        pcm(off) = (v & 0xff).toByte // little-endian 16-bit signed
        pcm(off + 1) = ((v >> 8) & 0xff).toByte
        off += 2; c += 1
      }
      i += 1
    }
    val fmt = new AudioFormat(p.rate.toFloat, 16, p.channels,
      /*signed=*/ true, /*bigEndian=*/ false)
    val bos = new java.io.ByteArrayOutputStream()
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, p.frames.toLong)
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic REAL-Y4M fixture: each row is an actual YUV4MPEG2
    * stream (4:2:0, the format's default chroma layout) whose every frame
    * has constant planes — luma `y0 + f*dy` on frame `f`, chroma `cb0` /
    * `cr0` throughout. Every sample statistic is therefore known in
    * closed form from (w, h, frames, y0, dy, cb0, cr0), so an oracle can
    * verify DECODED samples without itself decoding: the sums only come
    * out right if the parser walked real planes with real 4:2:0 geometry.
    * `y0 + (frames-1)*dy ≤ 252 < 256` by construction — no wraparound.
    */
  def synthY4ms(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { id =>
      val p = y4mParams(id, seed)
      MediaRow(id, "video", encodeY4m(p), p.w, p.h,
        duration_ms = p.frames * 40) // F25:1 ⇒ 40 ms per frame
    })
  }

  /** The closed-form construction parameters of [[synthY4ms]] row `id` —
    * the independent path an oracle derives expected sample stats from.
    * Expected: `n_frames = frames`,
    * `sum_y  = w*h*(frames*y0 + dy*frames*(frames-1)/2)` (arithmetic
    * series of constant-luma frames),
    * `sum_cb = (w/2)*(h/2)*frames*cb0` and `sum_cr` likewise (4:2:0
    * quarter-size chroma planes; w and h are even by construction).
    */
  final case class Y4mParams(w: Int, h: Int, frames: Int,
      y0: Int, dy: Int, cb0: Int, cr0: Int)

  def y4mParams(id: Long, seed: Long = 42L): Y4mParams = {
    val r = new java.util.SplittableRandom(seed ^ (id * 0x9e3779b97f4a7c15L))
    Y4mParams(w = 2 * (2 + r.nextInt(15)), h = 2 * (2 + r.nextInt(10)),
      frames = 2 + r.nextInt(29), y0 = 16 + r.nextInt(150),
      dy = r.nextInt(4), cb0 = r.nextInt(256), cr0 = r.nextInt(256))
  }

  private def encodeY4m(p: Y4mParams): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val ySize = p.w * p.h
    val cSize = (p.w / 2) * (p.h / 2)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(
      s"YUV4MPEG2 W${p.w} H${p.h} F25:1 Ip A1:1 C420jpeg\n".getBytes(ascii))
    val frameHdr = "FRAME\n".getBytes(ascii)
    val plane = new Array[Byte](math.max(ySize, cSize))
    var f = 0
    while (f < p.frames) {
      bos.write(frameHdr)
      java.util.Arrays.fill(plane, 0, ySize, (p.y0 + f * p.dy).toByte)
      bos.write(plane, 0, ySize)
      java.util.Arrays.fill(plane, 0, cSize, p.cb0.toByte)
      bos.write(plane, 0, cSize)
      java.util.Arrays.fill(plane, 0, cSize, p.cr0.toByte)
      bos.write(plane, 0, cSize)
      f += 1
    }
    bos.toByteArray
  }

  /** Batched frame decode over video rows: codec init once per PARTITION,
    * rows stream through (executor memory bounded by one payload — the
    * codec is a single O(1)-state pass over the bytes). Non-video kinds
    * are filtered out up front.
    */
  def videoStats(media: Dataset[MediaRow],
      codec: VideoCodec = Y4mCodec): Dataset[VideoStats] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").mapPartitions { it =>
      codec.init()
      it.map { r =>
        codec.decodeVideo(r.data) match {
          case Some(s) => s.copy(media_id = r.media_id)
          case None => VideoStats(r.media_id, 0, 0, 0L, 0L, 0L, 0L)
        }
      }
    }
  }

  /** Batched PCM decode over audio rows: codec init once per PARTITION,
    * rows stream through, executor memory bounded by one read buffer (the
    * codec streams the clip — never materializes decoded samples).
    * Non-audio kinds are filtered out up front.
    */
  def audioStats(media: Dataset[MediaRow],
      codec: AudioCodec = JavaSoundCodec): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "audio").mapPartitions { it =>
      codec.init()
      it.map { r =>
        codec.decodeAudio(r.data) match {
          case Some(s) => s.copy(media_id = r.media_id)
          case None => AudioStats(r.media_id, 0, 0, 0, 0L, 0L, 0L)
        }
      }
    }
  }

  /** Batched pixel decode over image rows: codec init once per PARTITION,
    * rows stream through (executor memory bounded by one decoded image).
    * Non-image kinds are filtered out up front — decode work never runs
    * on payloads the codec cannot own.
    */
  def imageStats(media: Dataset[MediaRow],
      codec: ImageCodec = ImageIoCodec): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "image").mapPartitions { it =>
      codec.init()
      it.map { r =>
        codec.decodeImage(r.data) match {
          case Some(s) => s.copy(media_id = r.media_id)
          case None => ImageStats(r.media_id, 0, 0, 0, 0L, 0L, 0L)
        }
      }
    }
  }

  /** Batched decode/feature-extract. Contract for a real codec:
    *  - codec init happens once per PARTITION (outside the row loop);
    *  - rows stream through the iterator — no partition-sized
    *    materialization, so executor memory is bounded by one blob;
    *  - partitions should be sized by BYTES not row count upstream
    *    (repartitionByBytes below) because blob sizes are skewed.
    */
  def extractFeatures(media: Dataset[MediaRow],
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec setup would go here (native handles etc.)
      it.map(codec.decode)
    }
  }

  /** Rebalance by payload size: salt = bucket of cumulative-size hash, so
    * a partition of videos doesn't take 30x a partition of thumbnails.
    */
  def repartitionByBytes(media: Dataset[MediaRow], partitions: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.repartition(partitions,
      pmod(hash(col("media_id"), length(col("data"))), lit(partitions)))
      .as[MediaRow]
  }

  /** A resized image: the re-encoded PNG plus exact integer channel sums
    * over the RESIZED pixels (the cross-engine verification surface —
    * `width == 0` marks an undecodable source payload, carried in the
    * schema like every other media failure).
    */
  final case class ResizedImage(
      media_id: Long,
      src_w: Int,
      src_h: Int,
      width: Int,
      height: Int,
      data: Array[Byte],
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** REAL image resize: exact box-average downscale by integer `factor` —
    * output pixel (X,Y) is the truncating integer mean, per channel, of
    * the source block [X·k, min((X+1)·k, w)) × [Y·k, min((Y+1)·k, h))
    * (partial edge blocks average over their true pixel count), so
    * `out_w = ceil(w/k)`, `out_h = ceil(h/k)`. The result is re-encoded as
    * an actual PNG and the resized pixels' exact channel sums ride along
    * for closed-form verification ([[synthBlockPngs]] fixtures make every
    * resized pixel equal its source block's constant value, so an oracle
    * can re-derive the sums from construction params alone —
    * q_media_resize).
    *
    * Scale shape matches the other decode stages: one `mapPartitions`
    * pass, codec-style per-partition init (the ImageIO cache toggle),
    * executor memory bounded by one decoded image + its (smaller) resized
    * twin, no shuffle. Size partitions by BYTES upstream
    * ([[repartitionByBytes]]) — image dimensions are skewed.
    */
  def resizeImages(media: Dataset[MediaRow], factor: Int): Dataset[ResizedImage] = {
    require(factor > 0, s"resize factor=$factor must be positive")
    import media.sparkSession.implicits._
    media.filter(col("kind") === "image").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition
      it.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.data))
          catch { case _: java.io.IOException => null }
        if (img == null)
          ResizedImage(r.media_id, 0, 0, 0, 0, Array.emptyByteArray, 0L, 0L, 0L)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val ow = (w + factor - 1) / factor
          val oh = (h + factor - 1) / factor
          val out = new java.awt.image.BufferedImage(ow, oh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var sr = 0L; var sg = 0L; var sb = 0L
          var oy = 0
          while (oy < oh) {
            val y0 = oy * factor
            val y1 = math.min(y0 + factor, h)
            var ox = 0
            while (ox < ow) {
              val x0 = ox * factor
              val x1 = math.min(x0 + factor, w)
              var br = 0L; var bg = 0L; var bb = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val rgb = img.getRGB(x, y) // sRGB ARGB, raster-agnostic
                  br += (rgb >> 16) & 0xff
                  bg += (rgb >> 8) & 0xff
                  bb += rgb & 0xff
                  x += 1
                }
                y += 1
              }
              val cnt = (x1 - x0).toLong * (y1 - y0)
              val vr = (br / cnt).toInt
              val vg = (bg / cnt).toInt
              val vb = (bb / cnt).toInt
              out.setRGB(ox, oy, (vr << 16) | (vg << 8) | vb)
              sr += vr; sg += vg; sb += vb
              ox += 1
            }
            oy += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          ResizedImage(r.media_id, w, h, ow, oh, bos.toByteArray, sr, sg, sb)
        }
      }
    }
  }

  /** Deterministic block-grid PNG fixture for [[resizeImages]]: the image
    * is a BX×BY grid of constant-color blocks of size `block` (the LAST
    * row/column block may be partial — `lastw`/`lasth` ∈ [1, block]), and
    * block (X,Y)'s channel value is the affine `base_c + X·dx_c + Y·dy_c`
    * (≤ 255 by construction). Resizing by `factor == block` therefore maps
    * every block — full or partial — onto exactly one output pixel whose
    * box average IS the block's constant, so the resized image and its
    * channel sums are known in closed form from the params alone:
    * `sum_c = BX·BY·base_c + dx_c·BY·BX(BX−1)/2 + dy_c·BX·BY(BY−1)/2`.
    * Only a real decode → real block-geometry average → truncating
    * division reproduces them.
    */
  def synthBlockPngs(spark: SparkSession, n: Long, block: Int = 4,
      seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val p = blockParams(id, block, seed)
        val bytes = encodeBlockPng(p, block)
        MediaRow(id, "image", bytes,
          (p.bxn - 1) * block + p.lastw, (p.byn - 1) * block + p.lasth, 0)
      }
    }
  }

  /** The closed-form construction parameters of [[synthBlockPngs]] row
    * `id` — the independent path an oracle derives expected RESIZED stats
    * from.
    */
  final case class BlockParams(bxn: Int, byn: Int, lastw: Int, lasth: Int,
      baseR: Int, dxR: Int, dyR: Int,
      baseG: Int, dxG: Int, dyG: Int,
      baseB: Int, dxB: Int, dyB: Int)

  def blockParams(id: Long, block: Int = 4, seed: Long = 42L): BlockParams = {
    val r = new java.util.SplittableRandom(seed ^ (id * 0x9e3779b97f4a7c15L))
    val bxn = 2 + r.nextInt(5) // 2..6 block columns
    val byn = 2 + r.nextInt(5)
    // channel value stays <= 255: base <= 185, slopes <= 7 over <= 5 steps
    def chan(): (Int, Int, Int) =
      (r.nextInt(186), r.nextInt(8), r.nextInt(8))
    val (br, dxr, dyr) = chan(); val (bg, dxg, dyg) = chan()
    val (bb, dxb, dyb) = chan()
    BlockParams(bxn, byn, 1 + r.nextInt(block), 1 + r.nextInt(block),
      br, dxr, dyr, bg, dxg, dyg, bb, dxb, dyb)
  }

  private def encodeBlockPng(p: BlockParams, block: Int): Array[Byte] = {
    val w = (p.bxn - 1) * block + p.lastw
    val h = (p.byn - 1) * block + p.lasth
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val by = y / block
      var x = 0
      while (x < w) {
        val bx = x / block
        img.setRGB(x, y,
          ((p.baseR + bx * p.dxR + by * p.dyR) << 16) |
          ((p.baseG + bx * p.dxG + by * p.dyG) << 8) |
          (p.baseB + bx * p.dxB + by * p.dyB))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Frame-sample plan for videos: one row per sampled frame index —
    * explode BEFORE decode so frame work distributes across tasks.
    */
  def frameSamplePlan(media: Dataset[MediaRow], fps: Double = 1.0): DataFrame =
    media.toDF()
      .filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest((col("duration_ms") / 1000.0 * fps).cast("int") - 1, lit(0)))))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") / fps * 1000).cast("int").as("ts_ms"))
}
