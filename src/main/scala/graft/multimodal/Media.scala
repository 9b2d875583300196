package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads carried as opaque
  * `binary` columns with typed metadata, processed in batched
  * `mapPartitions` stages (the Scala-side equivalent of mapInPandas
  * batching: iterate a partition, amortize per-batch setup, emit rows).
  *
  * The Spark-side plumbing — schema, batch shape, partition sizing,
  * deterministic feature rows — is real and tested. The codec itself is a
  * STUB (`StubCodec`): no image/audio libraries exist in this container,
  * so "decode" derives deterministic pseudo-features from the bytes. The
  * seam to a real decoder is exactly [[MediaCodec]].
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

/** Deterministic stand-in codec (container has no media libraries). */
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
