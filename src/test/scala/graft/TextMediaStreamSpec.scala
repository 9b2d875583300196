package graft

import graft.text.TextAnalysis
import graft.multimodal.{Media, MediaRow, StubCodec}
import graft.streaming.Streaming
import graft.config.RuleConfig
import graft.model._
import org.apache.spark.sql.functions._

class TextMediaStreamSpec extends SparkSpec {
  import spark.implicits._

  test("quality metrics + score: healthy prose scores 1, junk scores low") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it was a good day " +
        "for all of the animals in this big green forest by the river"),
      (2L, "!!! ??? ;;; ### $$$ %%% ^^^ &&& *** ((( ))) @@@"),
      (3L, "x")).toDF("id", "text")
    val q = TextAnalysis.withQuality(docs, "text").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("quality_score")).toMap
    assert(q(1L) === 1.0)
    assert(q(2L) <= 0.5) // junk fails the stopword + punct bands
    assert(q(3L) < 1.0)
  }

  test("token counts: ws vs bpe-ish") {
    val df = Seq((1L, "hello world, it's 2024!")).toDF("id", "text")
    val r = df.select(
      TextAnalysis.wsTokenCount(col("text")).as("ws"),
      TextAnalysis.bpeishTokenCount(col("text")).as("bpe")).head()
    assert(r.getInt(0) === 4)
    // hello|world|,|it|'|s|2024|! = 8 pieces
    assert(r.getInt(1) === 8)
  }

  test("winnowing fingerprints: shared substrings share fingerprints; determinism") {
    val a = "def compute(values) { return values.filter(v => v > 0).sum() }"
    val b = "XX prefix " + a + " YY suffix"
    val fa = TextAnalysis.winnow(a).toSet
    val fb = TextAnalysis.winnow(b).toSet
    assert(fa.intersect(fb).size >= fa.size / 2,
      s"containment ${fa.intersect(fb).size}/${fa.size}")
    assert(TextAnalysis.winnow(a).toSeq === TextAnalysis.winnow(a).toSeq)
    assert(TextAnalysis.winnow("", 8, 4).isEmpty)
    assert(TextAnalysis.winnow(null, 8, 4).isEmpty)
  }

  test("fingerprints distribute over the frame") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fp = TextAnalysis.fingerprints(docs, "doc_id", "text")
    assert(fp.count() === docs.count())
    assert(fp.filter(size(col("fingerprints")) > 0).count() === docs.count())
  }

  test("chunkByLines: chunks reassemble to the document, budget holds ±1 line") {
    val doc = (1 to 20).map(i => s"line number $i padded to some width").mkString("\n")
    val df = Seq((1L, doc), (2L, "short"), (3L, "")).toDF("id", "text")
    val out = TextAnalysis.chunkByLines(df, "id", "text", budgetChars = 100)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // chunks of doc 1 reassemble byte-identically in chunk order (the
    // inter-chunk newline is the one the prefix rule consumed)
    val ones = out.filter(_._1 == 1L).sortBy(_._2)
    assert(ones.length > 1, "budget 100 must split the 20-line doc")
    assert(ones.map(_._3).mkString("\n") === doc)
    // prefix rule: a chunk overflows its budget by at most one line
    val maxLine = doc.split("\n").map(_.length).max
    assert(ones.forall { c => c._4 > 0 && c._5 + c._4 <= 100 + maxLine + 1 })
    // single-line and empty documents chunk to themselves
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, "short", 1L, 5L)))
    assert(out.filter(_._1 == 3L).toSeq === Seq((3L, 0L, "", 1L, 0L)))
  }

  test("chunkByLines: corpus-wide reassembly is lossless") {
    import graft.corpus.CorpusGen
    val files = CorpusGen.files(spark, 300L).toDF()
      .selectExpr("cast(hash(repo, path, commit, content) as long) as id",
        "content as text")
    val rebuilt = TextAnalysis.chunkByLines(files, "id", "text", budgetChars = 256)
      .groupBy("id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
        s => s.getField("chunk")), "\n").as("re"))
    val mismatches = files.join(rebuilt, "id")
      .filter(col("text") =!= col("re")).count()
    assert(mismatches === 0L)
  }

  test("boilerplate: frequent lines found, short lines immune, removal exact") {
    import spark.implicits._
    val docs = (1L to 60L).map { i =>
      val nav = if (i % 2 == 0) "\nHome | About" else ""
      (i, s"unique line $i$nav\nAll rights reserved.\n}\nbody $i")
    }.toDF("id", "text")
    val lex = graft.text.Boilerplate.frequentLines(docs, "id", "text",
      minDocs = 20L).collect().map(r => r.getString(0) -> r.getLong(1))
    // ordered (n_docs desc, line asc); "}" excluded by trimmed length < 4
    assert(lex.toSeq === Seq("All rights reserved." -> 60L, "Home | About" -> 30L))
    val cleaned = graft.text.Boilerplate.removeLines(docs, "id", "text",
      lex.map(_._1).toIndexedSeq)
    val byId = cleaned.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(byId(1L) === (("unique line 1\n}\nbody 1", 4, 1)))
    assert(byId(2L) === (("unique line 2\n}\nbody 2", 5, 2)))
    // layout independence of the lexicon (hash-count pass shuffles)
    val lex2 = graft.text.Boilerplate.frequentLines(docs.repartition(7),
      "id", "text", minDocs = 20L).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(lex2.toSeq === lex.toSeq)
    // removing everything leaves the empty document, counts intact
    val gutted = graft.text.Boilerplate.removeLines(
      Seq((9L, "a b c d")).toDF("id", "text"), "id", "text", Seq("a b c d"))
      .collect().head
    assert(gutted.getString(1) === "" && gutted.getInt(3) === 1)
  }

  test("media: synth is deterministic; stub decode features are stable") {
    val m1 = Media.synth(spark, 200L).collect().sortBy(_.media_id)
    val m2 = Media.synth(spark, 200L).collect().sortBy(_.media_id)
    assert(m1.map(_.data.toSeq) === m2.map(_.data.toSeq))
    val f = Media.extractFeatures(Media.synth(spark, 200L)).collect()
      .sortBy(_.media_id)
    assert(f.length === 200)
    assert(f.forall(x => x.byte_entropy > 0 && x.n_bytes > 0))
    // video rows sample >1 frame; images exactly 1
    assert(f.filter(_.kind == "video").forall(_.frames_sampled >= 1))
    assert(f.filter(_.kind == "image").forall(_.frames_sampled == 1))
    // plain-JVM twin equality (batching must not change features)
    val row = m1.head
    assert(StubCodec.decode(row).mean_byte === f.head.mean_byte)
  }

  test("media: ImageIO decodes real PNG pixels — stats match the " +
    "closed-form construction params") {
    import graft.multimodal.{ImageIoCodec, ImageStats}
    val stats = Media.imageStats(Media.synthPngs(spark, 100L)).collect()
      .sortBy(_.media_id)
    assert(stats.length === 100)
    stats.foreach { s =>
      val p = Media.pngParams(s.media_id)
      val n = p.w.toLong * p.h
      val half = p.h.toLong * (p.w / 2)
      assert(s.width === p.w && s.height === p.h && s.channels === 3,
        s"id=${s.media_id}")
      assert(s.mean_r_e4 === half * (p.ra + p.rb) * 10000L / n)
      assert(s.mean_g_e4 === half * (p.ga + p.gb) * 10000L / n)
      assert(s.mean_b_e4 === half * (p.ba + p.bb) * 10000L / n)
    }
    // independent single-row path (no Spark, no batching) agrees
    val one = Media.synthPngs(spark, 1L).collect().head
    val direct = ImageIoCodec.decodeImage(one.data).get
    val viaSpark = stats.find(_.media_id == 0L).get
    assert(direct.copy(media_id = 0L) === viaSpark)
    // undecodable payload is a carried failure, not a task crash
    val junk = Media.synth(spark, 5L) // random bytes, kind mix
      .map(r => r.copy(kind = "image"))
    val bad = Media.imageStats(junk).collect()
    assert(bad.length === 5 && bad.forall(_.channels === 0))
    assert(ImageIoCodec.decodeImage(Array[Byte](1, 2, 3)) === None)
    // partition-layout independence
    val re = Media.imageStats(Media.synthPngs(spark, 100L).repartition(7))
      .collect().sortBy(_.media_id)
    assert(re.map(s => s: ImageStats).toSeq === stats.toSeq)
  }

  test("media: JavaSound decodes real WAV samples — stats match the " +
    "closed-form construction params") {
    import graft.multimodal.{AudioStats, JavaSoundCodec}
    val stats = Media.audioStats(Media.synthWavs(spark, 100L)).collect()
      .sortBy(_.media_id)
    assert(stats.length === 100)
    stats.foreach { s =>
      val p = Media.wavParams(s.media_id)
      val r = p.frames % (2 * p.half)
      val tail = math.min(r, p.half).toLong - math.max(r - p.half, 0)
      assert(s.sample_rate === p.rate && s.channels === p.channels &&
        s.bits === 16 && s.n_frames === p.frames.toLong,
        s"id=${s.media_id}")
      assert(s.sum_abs === p.frames.toLong * p.channels * p.amp)
      assert(s.sum_signed === p.channels * p.amp * tail, s"id=${s.media_id}")
    }
    // independent single-row path (no Spark, no batching) agrees
    val one = Media.synthWavs(spark, 1L).collect().head
    val direct = JavaSoundCodec.decodeAudio(one.data).get
    assert(direct.copy(media_id = 0L) ===
      stats.find(_.media_id == 0L).get)
    // undecodable payload is a carried failure, not a task crash
    val junk = Media.synth(spark, 5L).map(r => r.copy(kind = "audio"))
    val bad = Media.audioStats(junk).collect()
    assert(bad.length === 5 && bad.forall(_.channels === 0))
    assert(JavaSoundCodec.decodeAudio(Array[Byte](1, 2, 3)) === None)
    // a TRUNCATED but well-headed WAV must not crash either
    val cut = one.data.take(one.data.length / 2)
    JavaSoundCodec.decodeAudio(cut) // decodes fewer frames or None — no throw
    // partition-layout independence
    val re = Media.audioStats(Media.synthWavs(spark, 100L).repartition(7))
      .collect().sortBy(_.media_id)
    assert(re.map(s => s: AudioStats).toSeq === stats.toSeq)
  }

  test("media: Y4M parser decodes real raw-video planes — stats match the " +
    "closed-form construction params") {
    import graft.multimodal.{VideoStats, Y4mCodec}
    val stats = Media.videoStats(Media.synthY4ms(spark, 100L)).collect()
      .sortBy(_.media_id)
    assert(stats.length === 100)
    stats.foreach { s =>
      val p = Media.y4mParams(s.media_id)
      val cPlane = (p.w / 2).toLong * (p.h / 2)
      assert(s.width === p.w && s.height === p.h &&
        s.n_frames === p.frames.toLong, s"id=${s.media_id}")
      assert(s.sum_y === p.w.toLong * p.h *
        (p.frames.toLong * p.y0 + p.dy.toLong * p.frames * (p.frames - 1) / 2),
        s"id=${s.media_id}")
      assert(s.sum_cb === cPlane * p.frames * p.cb0)
      assert(s.sum_cr === cPlane * p.frames * p.cr0)
    }
    // independent single-row path (no Spark, no batching) agrees
    val one = Media.synthY4ms(spark, 1L).collect().head
    val direct = Y4mCodec.decodeVideo(one.data).get
    assert(direct.copy(media_id = 0L) === stats.find(_.media_id == 0L).get)
    // colourspace geometry: the same samples re-containered as 4:4:4 and
    // mono parse with full-size / absent chroma planes
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val c444 = "YUV4MPEG2 W4 H2 C444\nFRAME\n".getBytes(ascii) ++
      Array.fill[Byte](8)(10) ++ Array.fill[Byte](8)(20) ++
      Array.fill[Byte](8)(30)
    assert(Y4mCodec.decodeVideo(c444) ===
      Some(VideoStats(0L, 4, 2, 1L, 80L, 160L, 240L)))
    val mono = "YUV4MPEG2 W4 H2 Cmono\nFRAME\n".getBytes(ascii) ++
      Array.fill[Byte](8)(10)
    assert(Y4mCodec.decodeVideo(mono) ===
      Some(VideoStats(0L, 4, 2, 1L, 80L, 0L, 0L)))
    // undecodable payloads are carried failures, not task crashes:
    // garbage bytes, a compressed-codec stand-in, a frame-truncated
    // stream, a headers-only stream, and an unknown colourspace
    val junk = Media.synth(spark, 5L).map(r => r.copy(kind = "video"))
    val bad = Media.videoStats(junk).collect()
    assert(bad.length === 5 && bad.forall(_.n_frames === 0L))
    assert(Y4mCodec.decodeVideo(Array[Byte](1, 2, 3)) === None)
    assert(Y4mCodec.decodeVideo(one.data.take(one.data.length - 1)) === None)
    assert(Y4mCodec.decodeVideo("YUV4MPEG2 W4 H2\n".getBytes(ascii)) === None)
    assert(Y4mCodec.decodeVideo(
      "YUV4MPEG2 W4 H2 C999\nFRAME\n".getBytes(ascii)) === None)
    // geometry-INCOMPATIBLE family variants are rejected by NAME, not
    // discovered mid-stream: C444alpha carries a 4th plane, C420p10
    // carries 2-byte samples — prefix-matching the family digits would
    // mis-size both
    assert(Y4mCodec.decodeVideo(
      "YUV4MPEG2 W4 H2 C444alpha\nFRAME\n".getBytes(ascii) ++
        Array.fill[Byte](32)(10)) === None)
    assert(Y4mCodec.decodeVideo(
      "YUV4MPEG2 W4 H2 C420p10\nFRAME\n".getBytes(ascii) ++
        Array.fill[Byte](24)(10)) === None)
    // ...while the chroma-SITING C420 variants (same sample counts) parse
    val mpeg2 = "YUV4MPEG2 W4 H2 C420mpeg2\nFRAME\n".getBytes(ascii) ++
      Array.fill[Byte](8)(10) ++ Array.fill[Byte](2)(20) ++
      Array.fill[Byte](2)(30)
    assert(Y4mCodec.decodeVideo(mpeg2) ===
      Some(VideoStats(0L, 4, 2, 1L, 80L, 40L, 60L)))
    // partition-layout independence
    val re = Media.videoStats(Media.synthY4ms(spark, 100L).repartition(7))
      .collect().sortBy(_.media_id)
    assert(re.map(s => s: VideoStats).toSeq === stats.toSeq)
  }

  test("media: box-average resize — re-decoded output pixels equal the " +
    "closed-form block grid; truncation and edge geometry exact") {
    val block = 4
    val out = Media.resizeImages(Media.synthBlockPngs(spark, 100L, block),
      factor = block).collect().sortBy(_.media_id)
    assert(out.length === 100)
    out.foreach { s =>
      val p = Media.blockParams(s.media_id, block)
      assert(s.src_w === (p.bxn - 1) * block + p.lastw &&
        s.src_h === (p.byn - 1) * block + p.lasth, s"id=${s.media_id}")
      assert(s.width === p.bxn && s.height === p.byn, s"id=${s.media_id}")
      def series(base: Int, dx: Int, dy: Int): Long =
        p.bxn.toLong * p.byn * base +
          dx.toLong * p.byn * (p.bxn * (p.bxn - 1) / 2) +
          dy.toLong * p.bxn * (p.byn * (p.byn - 1) / 2)
      assert(s.sum_r === series(p.baseR, p.dxR, p.dyR), s"id=${s.media_id}")
      assert(s.sum_g === series(p.baseG, p.dxG, p.dyG), s"id=${s.media_id}")
      assert(s.sum_b === series(p.baseB, p.dxB, p.dyB), s"id=${s.media_id}")
      // the emitted artifact is a REAL PNG of the resized image: re-decode
      // it and check every pixel equals its block's affine constant
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(s.data))
      assert(img.getWidth === p.bxn && img.getHeight === p.byn)
      for (by <- 0 until p.byn; bx <- 0 until p.bxn) {
        val rgb = img.getRGB(bx, by)
        assert(((rgb >> 16) & 0xff) === p.baseR + bx * p.dxR + by * p.dyR)
        assert(((rgb >> 8) & 0xff) === p.baseG + bx * p.dxG + by * p.dyG)
        assert((rgb & 0xff) === p.baseB + bx * p.dxB + by * p.dyB)
      }
    }
    // non-constant blocks: truncating integer mean, partial edge block
    // averaged over its true count — 3x1 pixels (10, 11, 13), factor 2:
    // out = (floor(21/2), 13/1) = (10, 13)
    val tiny = new java.awt.image.BufferedImage(3, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    tiny.setRGB(0, 0, (10 << 16) | (10 << 8) | 10)
    tiny.setRGB(1, 0, (11 << 16) | (11 << 8) | 11)
    tiny.setRGB(2, 0, (13 << 16) | (13 << 8) | 13)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(tiny, "png", bos)
    import spark.implicits._
    val tinyDs = spark.createDataset(Seq(
      graft.multimodal.MediaRow(7L, "image", bos.toByteArray, 3, 1, 0)))
    val t = Media.resizeImages(tinyDs, factor = 2).collect().head
    assert(t.width === 2 && t.height === 1)
    assert(t.sum_r === 23L && t.sum_g === 23L && t.sum_b === 23L)
    val timg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(t.data))
    assert((timg.getRGB(0, 0) & 0xff) === 10 && (timg.getRGB(1, 0) & 0xff) === 13)
    // undecodable payload is a carried failure, not a task crash
    val junk = Media.synth(spark, 5L).map(r => r.copy(kind = "image"))
    val bad = Media.resizeImages(junk, factor = block).collect()
    assert(bad.length === 5 && bad.forall(_.width === 0))
    // partition-layout independence (minus the PNG bytes: encoder output
    // is deterministic too, but the verdict surface is the stats)
    val re = Media.resizeImages(
      Media.synthBlockPngs(spark, 100L, block).repartition(7), block)
      .collect().sortBy(_.media_id)
    assert(re.map(s => (s.media_id, s.width, s.height, s.sum_r, s.sum_g,
      s.sum_b)).toSeq ===
      out.map(s => (s.media_id, s.width, s.height, s.sum_r, s.sum_g,
        s.sum_b)).toSeq)
  }

  test("media: frame-sample plan explodes one row per sampled frame") {
    val plan = Media.frameSamplePlan(Media.synth(spark, 300L), fps = 1.0)
    val videos = Media.synth(spark, 300L).filter(_.kind == "video").collect()
    val expected = videos.map(v => math.max(v.duration_ms / 1000, 1).toLong).sum
    assert(plan.count() === expected)
  }

  test("streaming: windowed counts over readStream == batch equivalent") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val streamed = Streaming.runOnce(spark, path, "tms_stream")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    val batch = Streaming.windowedCounts(spark.read.parquet(path))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    // append mode emits only watermark-finalized windows: the streamed set
    // must be a prefix-subset of batch and agree exactly on every window
    assert(streamed.nonEmpty)
    val batchSet = batch.toSet
    assert(streamed.forall(batchSet.contains),
      "finalized streamed windows must match batch")
    val horizon = batch.map(_._1.getTime).max - 2 * 3600 * 1000L
    val finalized = batch.filter(_._1.getTime < horizon - 3600 * 1000L)
    val streamedSet = streamed.toSet
    assert(finalized.forall(streamedSet.contains),
      "all watermark-closed windows must have been emitted")
  }

  test("streaming: gap sessionization emits closed sessions") {
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val events = Seq(
      (1L, ts(0)), (1L, ts(5)), (1L, ts(10)), // session 1
      (1L, ts(120)), (1L, ts(125)), // session 2
      (1L, ts(300)), // open tail (never closed in this batch)
      (2L, ts(0)), (2L, ts(200))).toDS()
    val sessions = Streaming.sessionize(events, gapMs = 30 * 60000L)
      .collect().sortBy(s => (s.user_id, s.first_ts.getTime))
    assert(sessions.map(s => (s.user_id, s.n_events)).toSeq ===
      Seq((1L, 3L), (1L, 2L), (2L, 1L)))
  }

  test("session_window static == independent gap-split; all sessions emitted") {
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val events = Seq(
      (1L, ts(0)), (1L, ts(5)), (1L, ts(10)), // session 1
      (1L, ts(120)), (1L, ts(125)), // session 2
      (1L, ts(300)), // final session — emitted here, unlike sessionize()
      (2L, ts(0)), (2L, ts(200))).toDF("user_id", "ts")
    val got = Streaming.sessionWindows(events)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).toSeq
    assert(got === Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 1L)))
  }

  test("session_window stream: out-of-order event within watermark merges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val q = Streaming.sessionWindows(
      mem.toDF().toDF("user_id", "ts"), watermark = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("tms_sessions").start()
    try {
      mem.addData((1L, ts(0)), (1L, ts(10)))
      q.processAllAvailable()
      // OUT OF ORDER but within the 1h watermark: extends the open session
      mem.addData((1L, ts(5)), (1L, ts(20)))
      q.processAllAvailable()
      // nothing finalized yet (watermark hasn't passed last_ts + gap)
      assert(spark.table("tms_sessions").count() === 0)
      // a much later event advances the watermark → session finalizes
      mem.addData((1L, ts(600)))
      q.processAllAvailable()
      val rows = spark.table("tms_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getTimestamp(2), r.getTimestamp(3)))
      assert(rows.toSeq === Seq((1L, 4L, ts(0), ts(20))))
    } finally q.stop()
  }

  test("sessionizeStream (fMGWS + EventTimeTimeout): idle session " +
    "finalizes at the watermark horizon and its state evicts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val q = Streaming.sessionizeStream(mem.toDS(), watermark = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("tms_fmgws").start()
    try {
      mem.addData((1L, ts(0)), (1L, ts(10)))
      q.processAllAvailable()
      // open tail held: nothing emitted, watermark hasn't passed the gap
      assert(spark.table("tms_fmgws").count() === 0)
      // user 2's much-later event advances the watermark past user 1's
      // last_ts + gap → the TIMEOUT (not new user-1 data) must finalize
      // user 1's session and remove its state
      mem.addData((2L, ts(600)))
      q.processAllAvailable()
      // one more empty-ish batch so the timeout path definitely ran
      mem.addData((2L, ts(601)))
      q.processAllAvailable()
      val got = spark.table("tms_fmgws")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getTimestamp(2), r.getTimestamp(3))).toSeq
      assert(got.contains((1L, 2L, ts(0), ts(10))),
        s"user 1's idle session must finalize via timeout, got $got")
      // state eviction: the store now holds only user 2's open tail
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 1L,
        s"expected <=1 state row after eviction, saw $stateRows")
    } finally q.stop()
  }

  test("streaming content-dedup: first arrival wins across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = Streaming.dedupStream(
      mem.toDF().toDF("id", "ts", "content"), watermark = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("tms_dedup").start()
    try {
      mem.addData((1L, ts(0), "alpha"), (2L, ts(1), "beta"),
        (3L, ts(2), "alpha")) // same-batch duplicate
      q.processAllAvailable()
      // cross-batch duplicate, still within the 1h horizon
      mem.addData((4L, ts(10), "beta"), (5L, ts(11), "gamma"))
      q.processAllAvailable()
      val got = spark.table("tms_dedup")
        .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq
      assert(got === Seq((1L, "alpha"), (2L, "beta"), (5L, "gamma")))
    } finally q.stop()
  }

  test("quality pipeline runs under Structured Streaming (stream-static)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.corpus.CorpusGen
    import graft.filter.QualityPipeline
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // pk_dup needs a global aggregate (batch-only); everything else —
    // the fused scoring pass, the stream-static broadcast FK join, the
    // verdict projection — is stream-safe as-is
    val cfg = QualityPipeline.Config(checkPkDup = false)
    val mem = MemoryStream[graft.model.FileRow]
    val out = QualityPipeline.verdicts(QualityPipeline.annotate(
      QualityPipeline.score(mem.toDS()), CorpusGen.commitsDim(spark), cfg))
      .toDF()
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("qp_stream").start()
    val rows = (0L until 300L).map(CorpusGen.rowFor(_, 42L))
    try {
      mem.addData(rows.take(150): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(150): _*) // second micro-batch
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("qp_stream")
      .select("repo", "path", "commit", "keep").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3)))
      .sortBy(identity).toSeq
    val batch = QualityPipeline.verdicts(QualityPipeline.annotate(
      QualityPipeline.score(rows.toDS()), CorpusGen.commitsDim(spark), cfg))
      .toDF().select("repo", "path", "commit", "keep").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3)))
      .sortBy(identity).toSeq
    assert(streamed === batch, "streamed verdicts must equal batch verdicts")
    assert(streamed.nonEmpty && streamed.exists(!_._4)) // some drops occur
  }

  test("chunkByLines runs under Structured Streaming: stream == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the chunker is one stateless flatMap — stream-safe with no
    // watermark, no state store, append mode, any micro-batch split
    val mem = MemoryStream[(Long, String)]
    val out = TextAnalysis.chunkByLines(
      mem.toDS().toDF("id", "text"), "id", "text", budgetChars = 64)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("chunk_stream").start()
    val docs = (0L until 40L).map(i =>
      (i, (1 to 12).map(j => s"doc $i line $j some padding words").mkString("\n")))
    try {
      mem.addData(docs.take(25): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(25): _*)
      q.processAllAvailable()
    } finally q.stop()
    def norm(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4))).sortBy(t => (t._1, t._2)).toSeq
    val streamed = norm(spark.table("chunk_stream").collect())
    val batch = norm(TextAnalysis.chunkByLines(
      docs.toDF("id", "text"), "id", "text", budgetChars = 64).collect())
    assert(streamed === batch)
    assert(streamed.count(_._2 > 0) > 0, "multi-chunk docs present")
  }

  test("rule config: parse + ${VAR} substitution + full-width normalization") {
    val text =
      """# comment line
        |PK; id=pk1; table=${SCHEMA}.orders; cols=o_custkey
        |FK; id=fk1; table=lineitem; cols=l_orderkey; father=orders; fatherCols=o_orderkey; broadcast=Y
        |VC; id=vc1; table=orders; col=o_orderstatus; values=O，F，P
        |ZC; id=zc1; table=t; cols=k; start=st; end=en; tiebreak=id
        |PC; id=pc1; table=t; cols=c1,c2; codeTable=dim; codeCols=d1,d2; isEmpty=N
        |SC; id=sc1; table=t; col=code; values=a,b; runInd=N
        |""".stripMargin
    val rules = RuleConfig.parse(text, Map("SCHEMA" -> "prod"))
    assert(rules.length === 5) // sc1 disabled by runInd=N
    assert(rules(0) === PkRule("pk1", "prod.orders", Seq("o_custkey")))
    val fk = rules(1).asInstanceOf[FkRule]
    assert(fk.broadcastFather && fk.emptyGuard)
    val vc = rules(2).asInstanceOf[DomainRule]
    assert(vc.values === Set("O", "F", "P")) // full-width commas normalized
    val pc = rules(4).asInstanceOf[CodeTableRule]
    assert(!pc.isEmptyGuard)
    intercept[IllegalArgumentException] {
      RuleConfig.parse("XX; id=bad; table=t")
    }
  }
}
