package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Jupyter-notebook → script conversion — the published code-corpus
  * preprocessing step (The Stack / StarCoder train on notebooks converted
  * to scripts: code cells concatenated, markdown cells demoted to
  * comments). An .ipynb file is JSON, so the whole conversion is
  * declarative: ONE `from_json` + array transforms in a single projection
  * — map-side, zero shuffle, no UDF — which is what lets it run over 10^9
  * notebooks as a plain scan stage.
  *
  * BOTH on-disk notebook generations are handled (since round 5; they
  * were documented out of scope before):
  *   - nbformat 4: top-level `cells[]`; each cell's `source` is either an
  *     ARRAY of line strings (each keeping its own trailing `\n`) or ONE
  *     multiline STRING — the spec allows both and writers emit both.
  *   - nbformat 3: cells nest under `worksheets[].cells[]` (worksheets
  *     concatenated in order); code cells carry their text in `input`
  *     instead of `source`; `heading` cells exist and demote to comments
  *     like markdown.
  * The string-vs-array duality is parsed by typing `source`/`input` as
  * VARIANT in the from_json schema and extracting with `try_variant_get`:
  * the `array<string>` target is null for a string value (no coercion),
  * so `coalesce(array-form, splitlines(string-form))` dispatches on the
  * actual JSON type per cell with no second parse. A string source is
  * normalized to the array form exactly the way nbformat's own reader
  * does (Python `str.splitlines(True)` restricted to `\n`, the only
  * separator notebooks emit): split keeping each `\n`, drop the trailing
  * empty piece.
  *
  * Conversion contract (replayable by an independent JSON engine, which
  * is how the oracle checks it):
  *   - `code` cells      → source lines joined as-is (v3: `input` lines);
  *   - `markdown` and v3 `heading` cells → each source line prefixed with
  *     `commentPrefix`;
  *   - any other cell type (`raw`, v3 `html`, unknown, missing) → dropped;
  *   - surviving cell texts joined with a blank line (`\n\n`);
  *   - unparseable JSON / neither `cells` nor `worksheets` → null script
  *     (callers treat null as "not a notebook" and route the file
  *     unconverted).
  *
  * Still out of scope: cell OUTPUTS (The Stack's "notebooks with outputs"
  * variant interleaves them; training corpora usually strip outputs,
  * which is what dropping them here does).
  */
object Notebook {

  /** Notebook shape we parse — everything else in the JSON is ignored by
    * the schema projection (from_json prunes unrequested fields for
    * free). `source`/`input` are VARIANT because the nbformat spec allows
    * string OR array-of-strings for both.
    */
  val CellSchema = "STRUCT<cell_type: STRING, source: VARIANT, input: VARIANT>"
  val CellsSchema =
    s"cells ARRAY<$CellSchema>, " +
      s"worksheets ARRAY<STRUCT<cells: ARRAY<$CellSchema>>>"

  /** The parsed cells array: nbformat 4's top-level `cells`, or nbformat
    * 3's `worksheets[].cells` concatenated in worksheet order. Null when
    * the JSON is malformed or has neither field — the "not a notebook"
    * signal every caller branches on.
    */
  def cells(json: Column): Column = {
    val p = from_json(json, CellsSchema, Map.empty[String, String])
    val ws = p.getField("worksheets")
    coalesce(
      p.getField("cells"),
      when(ws.isNotNull,
        flatten(transform(ws, w =>
          coalesce(w.getField("cells"),
            expr(s"CAST(array() AS ARRAY<$CellSchema>)"))))))
  }

  /** A cell's text as the canonical array-of-lines form: the v3 `input`
    * field wins over `source` when present (v3 code cells), array-form
    * sources pass through, string-form sources are splitlines-normalized,
    * and a missing/null source reads as the empty cell.
    */
  private def cellLines(c: Column): Column = {
    val src = coalesce(c.getField("input"), c.getField("source"))
    val str = try_variant_get(src, "$", "string")
    coalesce(
      try_variant_get(src, "$", "array<string>"),
      when(str.isNotNull, splitLines(str)),
      expr("CAST(array() AS ARRAY<STRING>)"))
  }

  /** Python `str.splitlines(True)` restricted to `\n`: split keeping each
    * separator on its line (lookbehind split), drop the trailing empty
    * piece ("a\nb\n" → ["a\n","b\n"], "" → []).
    */
  private def splitLines(s: Column): Column =
    filter(split(s, "(?<=\n)"), l => l =!= "")

  /** True for markdown-like cells — the ones that demote to comments:
    * v4/v3 `markdown` plus v3 `heading`.
    */
  private def isMarkdownish(t: Column): Column =
    t === "markdown" || t === "heading"

  /** Per-cell-type counts in one pass: (n_code, n_markdown, n_other) as a
    * struct — corpus triage (how notebook-heavy is this crawl?) without
    * materializing any script text. `n_markdown` counts the markdown-LIKE
    * cells (markdown + v3 heading — everything that demotes to comments);
    * `n_other` is the dropped remainder.
    */
  def cellStats(json: Column): Column = {
    val cs = cells(json)
    val nCode =
      size(filter(cs, c => c.getField("cell_type") === "code")).cast("long")
    val nMd =
      size(filter(cs, c => isMarkdownish(c.getField("cell_type"))))
        .cast("long")
    struct(
      nCode.as("n_code"),
      nMd.as("n_markdown"),
      (size(cs).cast("long") - nCode - nMd).as("n_other"))
  }

  /** The notebook's language: `metadata.kernelspec.language` (nbformat 4),
    * falling back to `metadata.language` (the nbformat-3 convention,
    * pre-kernelspec), lowercased; null when the JSON is malformed or both
    * fields are absent. Parsed with its own schema projection so the
    * cells contract above stays byte-for-byte replayable on its own.
    */
  def kernelLanguage(json: Column): Column = {
    val m = from_json(json,
      "metadata STRUCT<kernelspec: STRUCT<language: STRING>, " +
        "language: STRING>",
      Map.empty[String, String]).getField("metadata")
    lower(coalesce(
      m.getField("kernelspec").getField("language"),
      m.getField("language")))
  }

  /** The converted script (see conversion contract above), or null when
    * the input doesn't parse as a notebook. Array-form `source` lines
    * keep their own trailing `\n`s (nbformat stores them), so joining
    * with "" preserves the cell text exactly; string-form sources are
    * normalized through [[splitLines]] first, which round-trips the text
    * for code cells and gives markdown commenting real line granularity.
    */
  def toScript(json: Column, commentPrefix: String = "# "): Column = {
    val cs = cells(json)
    val pieces = filter(
      transform(cs, c => {
        val lines = cellLines(c)
        when(c.getField("cell_type") === "code", concat_ws("", lines))
          .when(isMarkdownish(c.getField("cell_type")),
            concat_ws("",
              transform(lines, l => concat(lit(commentPrefix), l))))
          .otherwise(lit(null).cast("string"))
      }),
      p => p.isNotNull)
    // null cells array (bad JSON) must yield null, not "" — "" is a real
    // (empty) notebook, null is "not a notebook"
    when(cs.isNull, lit(null).cast("string"))
      .otherwise(concat_ws("\n\n", pieces))
  }
}
