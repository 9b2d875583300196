package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Jupyter-notebook → script conversion — the published code-corpus
  * preprocessing step (The Stack / StarCoder train on notebooks converted
  * to scripts: code cells concatenated, markdown cells demoted to
  * comments). An .ipynb file is JSON (nbformat 4: `cells[]`, each with
  * `cell_type` and `source` as an array of line strings), so the whole
  * conversion is declarative: ONE `from_json` + array transforms in a
  * single projection — map-side, zero shuffle, no UDF — which is what
  * lets it run over 10^9 notebooks as a plain scan stage.
  *
  * Conversion contract (replayable by an independent JSON engine, which
  * is how the oracle checks it):
  *   - `code` cells      → source lines joined as-is;
  *   - `markdown` cells  → each source line prefixed with `commentPrefix`;
  *   - any other cell type (`raw`, unknown, missing) → dropped;
  *   - surviving cell texts joined with a blank line (`\n\n`);
  *   - unparseable JSON / no `cells` field → null script (callers treat
  *     null as "not a notebook" and route the file unconverted).
  *
  * Out of scope (documented, not silently wrong): nbformat 3 (`worksheets`
  * nesting), `source` as a single string (nbformat 4 writers emit the
  * line-array form), and cell OUTPUTS (The Stack's "notebooks with
  * outputs" variant interleaves them; training corpora usually strip
  * outputs, which is what dropping them here does).
  */
object Notebook {

  /** nbformat-4 shape we parse: everything else in the JSON is ignored by
    * the schema projection (from_json prunes unrequested fields for free).
    */
  val CellsSchema = "cells ARRAY<STRUCT<cell_type: STRING, source: ARRAY<STRING>>>"

  /** The parsed cells array (null when the JSON is malformed or has no
    * `cells` field).
    */
  def cells(json: Column): Column =
    from_json(json, CellsSchema, Map.empty[String, String]).getField("cells")

  /** Per-cell-type counts in one pass: (n_code, n_markdown, n_other) as a
    * struct — corpus triage (how notebook-heavy is this crawl?) without
    * materializing any script text.
    */
  def cellStats(json: Column): Column = {
    val cs = cells(json)
    val ct = (t: String) =>
      size(filter(cs, c => c.getField("cell_type") === t)).cast("long")
    struct(
      ct("code").as("n_code"),
      ct("markdown").as("n_markdown"),
      (size(cs).cast("long") - ct("code") - ct("markdown")).as("n_other"))
  }

  /** The notebook's kernel language (`metadata.kernelspec.language`,
    * lowercased), or null when the JSON is malformed or the field is
    * absent. Parsed with its own schema projection so the cells contract
    * above stays byte-for-byte replayable on its own.
    */
  def kernelLanguage(json: Column): Column =
    lower(from_json(json,
      "metadata STRUCT<kernelspec: STRUCT<language: STRING>>",
      Map.empty[String, String])
      .getField("metadata").getField("kernelspec").getField("language"))

  /** The converted script (see conversion contract above), or null when
    * the input doesn't parse as a notebook. `source` lines keep their own
    * trailing `\n`s (nbformat stores them), so joining with "" preserves
    * the cell text exactly; a missing/null `source` reads as empty.
    */
  def toScript(json: Column, commentPrefix: String = "# "): Column = {
    val cs = cells(json)
    val pieces = filter(
      transform(cs, c => {
        val src = coalesce(c.getField("source"),
          array().cast("array<string>"))
        when(c.getField("cell_type") === "code", concat_ws("", src))
          .when(c.getField("cell_type") === "markdown",
            concat_ws("",
              transform(src, l => concat(lit(commentPrefix), l))))
          .otherwise(lit(null).cast("string"))
      }),
      p => p.isNotNull)
    // null cells array (bad JSON) must yield null, not "" — "" is a real
    // (empty) notebook, null is "not a notebook"
    when(cs.isNull, lit(null).cast("string"))
      .otherwise(concat_ws("\n\n", pieces))
  }
}
