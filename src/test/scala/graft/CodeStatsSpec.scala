package graft

import graft.text.CodeStats
import graft.functions.expressions.{char_entropy, deflate_size}
import org.apache.spark.sql.functions._

/** Code-quality signals ([[graft.text.CodeStats]]) + the deflate/entropy
  * expressions: unit semantics, verdict branch coverage, kernel
  * verification (a REAL inflate round-trip), and plan shape.
  */
class CodeStatsSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(text: String): Map[String, Any] = {
    val row = CodeStats.withCodeStats(Seq(Tuple1(text)).toDF("text"), "text")
      .drop("text").head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("codeMetrics: comment families, lines, tokens, char classes") {
    val m = metrics("val x = 1\n// c\n# py\n-- sql\n; lisp\n' basic\n\n  \ncafe42")
    assert(m("n_lines") === 7L)          // two blank-ish lines filtered
    assert(m("n_comment_lines") === 5L)  // one per marker family
    assert(m("n_tokens") === 15L)        // \s+ spans newlines too
    assert(m("n_alpha_tokens") === 8L)   // =, 1, and bare markers lack letters
    assert(m("n_digit_chars") === 3L)    // 1, 4, 2
    assert(m("n_hex_chars") === 12L)     // a,1 | c | b,a,c | cafe42
    assert(m("has_xml_head") === false)
    val empty = metrics("")
    assert(empty("n_lines") === 0L && empty("n_tokens") === 0L &&
      empty("max_line_len") === 0L)
  }

  test("codeMetrics: xml head is bounded to the first 100 chars") {
    assert(metrics("<?xml version=\"1.0\"?>\n<a/>")("has_xml_head") === true)
    assert(metrics("x" * 200 + "<?xml")("has_xml_head") === false)
    val m = metrics("line one\n" + "y" * 300)
    assert(m("max_line_len") === 300L)
  }

  test("codeKeepVerdict: every drop branch fires on its own fixture") {
    val cases = Seq(
      ("keep", "def add(a, b):\n    # sum two values\n    return a + b"),
      ("digits", "10 20 30 40 50 60 70 80 90 100"),
      ("hex", "deadbeef" * 24),
      ("xml", "<?xml version=\"1.0\"?>\n<doc>hello there friend</doc>"),
      ("nocomment", "val alpha = beta\n" * 12),
      ("banded", "val alpha = beta\n" * 10 + "// doc\n// more"))
    val got = CodeStats
      .withCodeStats(cases.toDF("name", "text"), "text")
      .withColumn("keep", CodeStats.codeKeepVerdict)
      .select("name", "keep").as[(String, Boolean)].collect().toMap
    assert(got("keep") === true)
    assert(got("digits") === false)   // > 50 % digit chars
    assert(got("hex") === false)      // > 90 % hex chars
    assert(got("xml") === false)      // prolog in head
    assert(got("nocomment") === false) // 12 lines, 0 % comments
    assert(got("banded") === true)    // 2/12 lines in [1 %, 80 %]
  }

  test("code stats stay map-side: one projection, no Exchange") {
    val plan = CodeStats.withCodeStats(Seq(Tuple1("x")).toDF("text"), "text")
      .withColumn("keep", CodeStats.codeKeepVerdict)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("deflate_size: inflate round-trip proves the kernel, ordering holds") {
    // verify against a REAL inflater: deflated bytes must decompress back
    val text = "the quick brown fox jumps over the lazy dog " * 20
    val bytes = text.getBytes("UTF-8")
    val reported = graft.functions.DeflateHelper.deflatedSizeBytes(bytes)
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(bytes); d.finish()
    val out = new Array[Byte](bytes.length * 2 + 64)
    val n = d.deflate(out)
    d.end()
    assert(n.toLong === reported)
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(out, 0, n)
    val back = new Array[Byte](bytes.length)
    assert(inf.inflate(back) === bytes.length && back.sameElements(bytes))
    inf.end()

    // repetitive text compresses far below a high-entropy string of the
    // same length; codegen route == typed kernel route
    val rep = "abcd" * 250
    val rng = new scala.util.Random(7)
    val rand = Array.fill(1000)((rng.nextInt(94) + 33).toChar).mkString
    val sizes = Seq(rep, rand).toDF("t")
      .select(deflate_size(col("t"))).as[Long].collect()
    assert(sizes(0) < sizes(1) / 5, sizes.toSeq.toString)
    assert(sizes(0) ===
      graft.functions.DeflateHelper.deflatedSizeBytes(rep.getBytes("UTF-8")))
  }

  test("char_entropy: closed-form values, codegen route, null") {
    val got = Seq(Some("aabbbc"), Some("aaaa"), Some("abcdefgh"), Some(""),
        None)
      .toDF("t").select(char_entropy(col("t"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    // aabbbc: -(2/6 log 2/6 + 3/6 log 3/6 + 1/6 log 1/6) = 1.4591479...
    assert(math.abs(got(0).get - 1.4591479170272448) < 1e-12)
    assert(got(1).get === 0.0)           // degenerate text
    assert(got(2).get === 3.0)           // 8 uniform chars = log2(8)
    assert(got(3).get === 0.0)           // empty
    assert(got(4).isEmpty)               // null in, null out
  }

  test("deflate/entropy run inside whole-stage codegen") {
    // a Range scan (not a LocalRelation, which the optimizer folds away)
    // so the executed plan actually carries a codegen stage
    val plan = spark.range(4)
      .select(concat(lit("x"), col("id").cast("string")).as("t"))
      .select(deflate_size(col("t")), char_entropy(col("t")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(plan.contains("*(1)"), s"no codegen span:\n$plan")
  }
}
