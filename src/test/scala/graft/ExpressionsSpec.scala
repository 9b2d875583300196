package graft

import graft.dedup.Dedup
import graft.functions.expressions
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "def compute(values) { return values.filter(v => v > 0).sum() }"),
    (2L, "short"),
    (3L, ""),
    (4L, null.asInstanceOf[String])).toDF("id", "text")

  test("winnow_fp Column matches the static winnow; null-safe") {
    val got = docs.select($"id", expressions.winnow_fp($"text"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(got(1L) === TextAnalysis.winnow(
      "def compute(values) { return values.filter(v => v > 0).sum() }").toSeq)
    assert(got(2L) === TextAnalysis.winnow("short").toSeq)
    assert(got(3L) === Seq.empty)
    assert(got(4L) === null)
  }

  test("fnv64 Column matches Dedup.fnv1a64") {
    val got = docs.filter($"text".isNotNull)
      .select($"id", expressions.fnv64($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === Dedup.fnv1a64(
      "def compute(values) { return values.filter(v => v > 0).sum() }"))
    assert(got(3L) === Dedup.fnv1a64(""))
  }

  test("expressions run inside WholeStageCodegen (no fallback)") {
    // a file source (not LocalTableScan) so codegen stages actually form
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(expressions.fnv64(col("text")),
        expressions.winnow_fp(col("text")))
    val exec = real.queryExecution.executedPlan
    val codegenSpans = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty, exec.toString)
    // the projection carrying our expressions sits INSIDE a codegen span
    assert(codegenSpans.exists(_.collect {
      case p: org.apache.spark.sql.execution.ProjectExec => p
    }.nonEmpty), exec.toString)
    assert(real.count() === 500)
  }

  test("fix_mojibake: repairs single and double cp1252 mojibake, leaves clean text") {
    def garble(s: String): String = new String(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8), "windows-1252")
    // fixture chars avoid UTF-8 bytes undefined in cp1252 (0x81/0x8D/0x8F/
    // 0x90/0x9D — e.g. の is E3 81 AE): a crawl garbling THOSE replaces the
    // byte with U+FFFD, i.e. destroys information no repair can recover
    val samples = Seq(
      "café — naïve résumé ©®",
      "日本語テキスト",
      "mixed: ASCII + éèê + 中文",
      "quotes “smart and ‘single’ – dashes") // ” is E2 80 9D — 0x9D again
    samples.foreach { s =>
      assert(graft.functions.MojibakeRepair.fix(garble(s)) === s, s"single: $s")
      // already-clean text passes through untouched (no false repair)
      assert(graft.functions.MojibakeRepair.fix(s) === s, s"clean: $s")
    }
    // DOUBLE garble additionally requires the single-garble OUTPUT to
    // re-encode to cp1252-defined bytes: — garbles to â€” whose ” is
    // E2 80 9D → byte 0x9D undefined — destroyed at the second level, so
    // no repair can exist. Use byte-safe chars here.
    val doubleSafe = Seq("café naïve résumé ©®", "日本語テキスト", "éèê 中文 – ok")
    doubleSafe.foreach { s =>
      assert(graft.functions.MojibakeRepair.fix(garble(garble(s))) === s,
        s"double: $s")
    }
    assert(graft.functions.MojibakeRepair.fix("pure ascii text") ===
      "pure ascii text")
    assert(graft.functions.MojibakeRepair.fix("") === "")
    assert(graft.functions.MojibakeRepair.fix(null) === null)
    // repaired output is a fixpoint for these shapes
    samples.foreach { s =>
      val once = graft.functions.MojibakeRepair.fix(garble(s))
      assert(graft.functions.MojibakeRepair.fix(once) === once)
    }
    // Column route (codegen) == static kernel
    val df = samples.zipWithIndex
      .map { case (s, i) => (i.toLong, garble(s)) }.toDF("id", "g")
    val got = df.select($"id", expressions.fix_mojibake($"g"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) === s)
    }
  }

  test("double_sort_bucket: monotone in Spark's double order, edge-safe") {
    val rnd = new java.util.SplittableRandom(3L)
    val special = Seq(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, Double.MinValue, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NaN, 1e-300, -1e-300)
    val values = special ++ (1 to 500).map(_ =>
      rnd.nextDouble() * math.pow(10, rnd.nextInt(-30, 31)) *
        (if (rnd.nextBoolean()) 1 else -1))
    val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val got = df.select(col("v"),
      expressions.double_sort_bucket(col("v"), 8).as("bk"))
      .collect().map(r => r.getDouble(0) -> r.getInt(1))
    // buckets are non-decreasing along Spark's double sort order
    val sorted = df.orderBy(col("v").asc)
      .select(expressions.double_sort_bucket(col("v"), 8))
      .collect().map(_.getInt(0))
    sorted.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) <= w(1), w.mkString(","))
    }
    // -0.0 and 0.0 compare equal in Spark — same bucket
    assert(expressions_bucket(-0.0) === expressions_bucket(0.0))
    // NaN sorts greatest — top of the range
    assert(expressions_bucket(Double.NaN) >= got.map(_._2).max)
    // negatives below positives
    assert(expressions_bucket(-1.0) < expressions_bucket(1.0))
    // Column route == static kernel (codegen/eval share it)
    got.foreach { case (v, bk) =>
      assert(bk === graft.functions.DoubleSortBucket.bucket(v, 8), s"v=$v")
    }
  }

  private def expressions_bucket(x: Double): Int =
    graft.functions.DoubleSortBucket.bucket(x, 8)

  test("SQL registration: graft_fnv64/graft_winnow callable from SQL") {
    expressions.register(spark)
    docs.createOrReplaceTempView("exprs_docs")
    val viaSql = spark.sql(
      """SELECT id, graft_fnv64(text) h, size(graft_winnow(text, 8, 4)) n
        |FROM exprs_docs WHERE text IS NOT NULL""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(viaSql.nonEmpty)
    assert(viaSql.find(_._1 == 3L).get._3 === 0)
  }

  test("expression builders: interpreted eval matches static twins") {
    // (extensions apply only at SparkContext creation, which the shared
    // test session precludes — the builders themselves are exercised here
    // and through expressions.register's SQL path above)
    import org.apache.spark.sql.catalyst.expressions.Literal
    new graft.functions.GraftExtensions()(
      new org.apache.spark.sql.SparkSessionExtensions) // apply() wiring
    assert(Fnv64Eval("abc") === Dedup.fnv1a64("abc"))
    val wf = graft.functions.WinnowFingerprints(
      Literal("hello world hello winnow me please"), 8, 4)
    val got = wf.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq
    assert(got === TextAnalysis.winnow("hello world hello winnow me please", 8, 4).toSeq)
  }

  private def Fnv64Eval(s: String): Long =
    graft.functions.Fnv64(
      org.apache.spark.sql.catalyst.expressions.Literal(s))
      .eval(null).asInstanceOf[Long]

  test("nfc_normalize Column composes; cleanText strips/squashes/trims") {
    val decomposed = "cafe\u0301 au lait" // e + combining acute (U+0301)
    val composed = "caf\u00e9 au lait"    // precomposed
    val df = Seq((1L, decomposed), (2L, composed), (3L, null.asInstanceOf[String]),
      (4L, "a\u0000b\tc  d\n e")).toDF("id", "t")
    val nfc = df.select($"id", expressions.nfc_normalize($"t").as("n"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(nfc(1L) === composed) // composition actually happened
    assert(nfc(2L) === composed) // already-NFC fast path is identity
    assert(nfc(3L) === null)
    val clean = df.select($"id",
      graft.text.TextAnalysis.cleanText($"t").as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(clean(4L) === "ab c d\n e") // NUL gone, tab+runs squashed, trimmed
    assert(clean(1L) === composed)
    // SQL registration exposes the same expression
    expressions.register(spark)
    val viaSql = spark.sql(s"SELECT graft_nfc('$decomposed')").head().getString(0)
    assert(viaSql === composed)
  }

  test("repetitionMetrics: Column results match a plain-Scala oracle") {
    val texts = Seq(
      "a\nb\na\n\n  \nb\nc",            // dups a,b; blanks dropped
      "- one\n* two\n• three\nplain",   // 3 bullet lines
      "wait...\nno\ntrailing...",       // 2 ellipsis lines
      "same\nsame\nsame",               // one line tripled
      "",                               // empty doc
      null.asInstanceOf[String],        // null doc
      "   padded   \npadded")           // trim folds these together
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id") +:
        TextAnalysis.repetitionMetrics(col("text"))
          .map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    def oracle(t: String) = {
      val ls = Option(t).getOrElse("").split("\n", -1).map(_.trim)
        .filter(_.nonEmpty).toSeq
      (ls.size.toLong, (ls.size - ls.distinct.size).toLong,
        ls.map(_.length.toLong).sum,
        ls.count(l => "-*•".contains(l.head)).toLong,
        ls.count(_.endsWith("...")).toLong)
    }
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === oracle(t), s"doc $i")
    }
    // sanity on the fixture's intent, not just oracle agreement
    assert(got(0L) === ((5L, 2L, 5L, 0L, 0L))) // lines a,b,a,b,c
    assert(got(1L)._4 === 3L)
    assert(got(2L)._5 === 2L)
    assert(got(3L) === ((3L, 2L, 12L, 0L, 0L)))
    assert(got(4L) === ((0L, 0L, 0L, 0L, 0L)))
    assert(got(5L) === ((0L, 0L, 0L, 0L, 0L)))
    assert(got(6L) === ((2L, 1L, 12L, 0L, 0L)))
  }

  test("BloomMightContainLong: equality/hashCode/semanticEquals are " +
    "content-based, not array-reference-based") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.util.sketch.BloomFilter
    def sketchBytes(items: Long*): Array[Byte] = {
      val bf = BloomFilter.create(100, 0.01)
      items.foreach(bf.putLong)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    // two DISTINCT arrays with identical content: reference equality would
    // call these different and silently defeat semanticEquals /
    // subexpression elimination / plan canonicalization (the probe would
    // be duplicated per occurrence)
    val b1 = sketchBytes(1L, 2L, 3L)
    val b2 = sketchBytes(1L, 2L, 3L)
    assert(!(b1 eq b2) && java.util.Arrays.equals(b1, b2))
    val e1 = graft.functions.BloomMightContainLong(Literal(7L), b1)
    val e2 = graft.functions.BloomMightContainLong(Literal(7L), b2)
    assert(e1 === e2)
    assert(e1.hashCode === e2.hashCode)
    assert(e1.semanticEquals(e2))
    // different sketch content must NOT compare equal, and a different
    // child must not either
    val e3 = graft.functions.BloomMightContainLong(Literal(7L), sketchBytes(99L))
    assert(e1 !== e3)
    assert(!e1.semanticEquals(e3))
    val e4 = graft.functions.BloomMightContainLong(Literal(8L), b1)
    assert(e1 !== e4)
  }
}
