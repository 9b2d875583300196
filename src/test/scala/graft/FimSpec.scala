package graft

import graft.text.Fim
import org.apache.spark.sql.functions._

/** Fill-in-the-middle transform ([[graft.text.Fim]]): split/serialize
  * semantics, determinism, and plan shape.
  */
class FimSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map { i =>
      // lengths 0..~350 incl. empty docs (i%30==0) and 1-char docs
      (i.toLong, ("w" + (i % 7) + " ") * (i % 30) + (if (i % 5 == 0) "" else "z"))
    }.toDF("doc_id", "text")

  test("fim: cuts bound the text, segments reassemble, serialization exact") {
    val n = 400
    val src = docs(n).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Fim.withFim(docs(n), "text", Seq("doc_id")).collect()
    assert(out.length === n)
    var applied = 0
    out.foreach { r =>
      val id = r.getLong(0)
      val text = src(id)
      if (!r.getBoolean(r.fieldIndex("fim_applied"))) {
        assert(r.getString(r.fieldIndex("fim_text")) === text)
        assert(r.isNullAt(r.fieldIndex("fim_cut_lo")))
        assert(!r.getBoolean(r.fieldIndex("fim_spm")))
      } else {
        applied += 1
        val lo = r.getLong(r.fieldIndex("fim_cut_lo"))
        val hi = r.getLong(r.fieldIndex("fim_cut_hi"))
        assert(0 <= lo && lo <= hi && hi <= text.length, s"doc $id cuts")
        val p = text.substring(0, lo.toInt)
        val m = text.substring(lo.toInt, hi.toInt)
        val s = text.substring(hi.toInt)
        val expect =
          if (r.getBoolean(r.fieldIndex("fim_spm")))
            s"${Fim.SuffixTok}$s${Fim.PrefixTok}$p${Fim.MiddleTok}$m"
          else
            s"${Fim.PrefixTok}$p${Fim.SuffixTok}$s${Fim.MiddleTok}$m"
        assert(r.getString(r.fieldIndex("fim_text")) === expect, s"doc $id")
      }
    }
    // rate=50 on 400 hash buckets: broad-bounds sanity, not exactness
    assert(applied > n / 4 && applied < 3 * n / 4, s"applied=$applied")
  }

  test("fim decisions are layout-independent and rate=0/100 degenerate") {
    val a = Fim.withFim(docs(300), "text", Seq("doc_id"))
      .select("doc_id", "fim_text").as[(Long, String)].collect().sorted.toSeq
    val b = Fim.withFim(docs(300).repartition(13), "text", Seq("doc_id"))
      .select("doc_id", "fim_text").as[(Long, String)].collect().sorted.toSeq
    assert(a === b)
    val none = Fim.withFim(docs(100), "text", Seq("doc_id"), rate = 0)
    assert(none.filter(col("fim_applied")).count() === 0)
    val all = Fim.withFim(docs(100), "text", Seq("doc_id"), rate = 100)
    assert(all.filter(!col("fim_applied")).count() === 0)
  }

  test("fim is map-side: no Exchange, no UDF") {
    val df = spark.range(50).select(col("id").as("doc_id"),
      concat(lit("body "), col("id")).as("text"))
    val s = Fim.withFim(df, "text", Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s"fim shuffled:\n$s")
    assert(!s.contains("BatchEvalPython") && !s.toLowerCase.contains("scalaudf"),
      s"UDF in the fim path:\n$s")
  }
}
