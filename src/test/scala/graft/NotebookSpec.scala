package graft

import graft.text.Notebook
import org.apache.spark.sql.functions._

/** Notebook→script conversion ([[graft.text.Notebook]]): the conversion
  * contract on closed-form fixtures, the not-a-notebook null path, and
  * plan shape (one map-side projection).
  */
class NotebookSpec extends SparkSpec {
  import spark.implicits._

  private def convert(json: String): Option[String] = {
    val r = Seq(Tuple1(json)).toDF("j").select(Notebook.toScript(col("j")))
      .head
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("toScript: code joins, markdown comments, raw drops, \\n\\n joins") {
    val nb =
      """{"nbformat": 4, "cells": [
        |  {"cell_type": "markdown", "source": ["# Title\n", "prose"]},
        |  {"cell_type": "code", "source": ["x = 1\n", "y = x + 1"]},
        |  {"cell_type": "raw", "source": ["ignored"]},
        |  {"cell_type": "code", "source": []}
        |]}""".stripMargin
    assert(convert(nb) ===
      Some("# # Title\n# prose\n\nx = 1\ny = x + 1\n\n"))
    // empty notebook is a real (empty) script, not null
    assert(convert("""{"cells": []}""") === Some(""))
    // only-raw cells: every piece drops, script is empty
    assert(convert("""{"cells": [{"cell_type": "raw", "source": ["a"]}]}""")
      === Some(""))
    // a cell with no source reads as empty, not null
    assert(convert("""{"cells": [{"cell_type": "code"}]}""") === Some(""))
  }

  test("toScript: unparseable or cell-less JSON is null (not a notebook)") {
    assert(convert("not json at all") === None)
    assert(convert("""{"nbformat": 4}""") === None)
    val stats = Seq(Tuple1("not json")).toDF("j")
      .select(Notebook.cellStats(col("j")).getField("n_code")).head
    assert(stats.isNullAt(0), "stats on a non-notebook are null, not 0")
  }

  test("cellStats: per-type counts, unknown and missing types are other") {
    val nb =
      """{"cells": [
        |  {"cell_type": "code", "source": ["a"]},
        |  {"cell_type": "code", "source": ["b"]},
        |  {"cell_type": "markdown", "source": ["c"]},
        |  {"cell_type": "raw", "source": ["d"]},
        |  {"source": ["no type"]}
        |]}""".stripMargin
    val r = Seq(Tuple1(nb)).toDF("j").select(Notebook.cellStats(col("j"))
      .as("s")).select("s.n_code", "s.n_markdown", "s.n_other").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 1L, 2L)))
  }

  test("toScript: string-form source ≡ its array form (splitlines(True))") {
    // string and array forms of the same cell text convert identically
    val str =
      """{"cells": [
        |  {"cell_type": "markdown", "source": "# Title\nprose"},
        |  {"cell_type": "code", "source": "x = 1\ny = x + 1"}
        |]}""".stripMargin
    assert(convert(str) === Some("# # Title\n# prose\n\nx = 1\ny = x + 1"))
    // trailing \n: splitlines keeps it on the last line, adds no phantom
    // empty line ("a\n" → ["a\n"], so commenting yields ONE prefix)
    assert(convert("""{"cells":[{"cell_type":"markdown","source":"a\n"}]}""")
      === Some("# a\n"))
    // interior blank line gets its own comment prefix, like the array form
    assert(
      convert("""{"cells":[{"cell_type":"markdown","source":"a\n\nb"}]}""")
        === Some("# a\n# \n# b"))
    // empty-string source is the empty cell, and code round-trips exactly
    assert(convert("""{"cells":[{"cell_type":"code","source":""}]}""")
      === Some(""))
    assert(convert("""{"cells":[{"cell_type":"code","source":"a\nb\n"}]}""")
      === Some("a\nb\n"))
    // mixed forms in ONE notebook
    val mixed =
      """{"cells": [
        |  {"cell_type": "markdown", "source": "m1\nm2"},
        |  {"cell_type": "code", "source": ["c1\n", "c2"]}
        |]}""".stripMargin
    assert(convert(mixed) === Some("# m1\n# m2\n\nc1\nc2"))
  }

  test("toScript: nbformat 3 — worksheets flatten, input, heading") {
    val v3 =
      """{"nbformat": 3, "worksheets": [
        |  {"cells": [
        |    {"cell_type": "code", "input": ["i = 1\n", "j = 2"],
        |     "language": "python"},
        |    {"cell_type": "heading", "level": 2, "source": ["Section"]},
        |    {"cell_type": "markdown", "source": "prose\ntail"}
        |  ]},
        |  {"cells": [{"cell_type": "code", "input": "k = 3"}]}
        |]}""".stripMargin
    assert(convert(v3) ===
      Some("i = 1\nj = 2\n\n# Section\n\n# prose\n# tail\n\nk = 3"))
    // stats: heading counts with markdown (both demote to comments)
    val r = Seq(Tuple1(v3)).toDF("j").select(Notebook.cellStats(col("j"))
      .as("s")).select("s.n_code", "s.n_markdown", "s.n_other").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, 0L)))
    // empty worksheets array is a real (empty) notebook, not null
    assert(convert("""{"worksheets": []}""") === Some(""))
    // a worksheet with no cells field contributes nothing
    assert(convert("""{"worksheets": [{}]}""") === Some(""))
  }

  test("kernelLanguage: kernelspec wins, v3 metadata.language fallback") {
    val rows = Seq(
      """{"metadata":{"kernelspec":{"language":"Python"}}}""",
      """{"metadata":{"language":"python"}}""",
      """{"metadata":{"kernelspec":{"language":"Scala"},"language":"r"}}""",
      """{"metadata":{}}""",
      "garbage").toDF("j")
      .select(Notebook.kernelLanguage(col("j"))).collect()
    assert(rows.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
      === Seq("python", "python", "scala", null, null))
  }

  test("conversion is one map-side projection: no Exchange, no UDF") {
    val plan = spark.range(4)
      .select(concat(lit("{\"cells\": []}"), lit("")).as("j"))
      .select(Notebook.toScript(col("j")), Notebook.cellStats(col("j")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }
}
