package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Code-corpus quality signals — the published source-file filters that
  * prose metrics ([[TextAnalysis.qualityMetrics]]) don't cover:
  *
  *  - alpha-token counts (Gopher's "word contains at least one alphabetic
  *    character" rule, Rae et al. 2021 A1.1 — applied to code it separates
  *    prose-and-identifiers from number/symbol dumps);
  *  - comment-line counts per line-comment marker set (StarCoder/The Stack
  *    keep files whose comment density sits in a band: near-zero means
  *    minified or generated, near-one means a license shell);
  *  - digit / hex character counts (The Stack's data-file probe: a "source
  *    file" that is mostly digits or hex is an embedded blob);
  *  - XML-prolog detection over a bounded head (The Stack drops `<?xml`
  *    files from "code" subsets);
  *  - longest-line length (minified/generated detection, also a Gopher
  *    signal).
  *
  * Everything is a pure Column expression — one whole-stage-codegen
  * projection, zero shuffle, linear in text length — because these run on
  * every file of a 10^12-file corpus before anything heavier earns a look.
  * All outputs are EXACT BIGINT counts (consumers derive ratios; the
  * cross-engine oracle compares integers, never floats) plus one boolean.
  * Patterns stay RE2-compatible so an independent engine replays them.
  */
object CodeStats {

  /** Line-comment markers by language family — the bounded public sets
    * (C-family `//`, script `#`, SQL `--`, Lisp `;`, BASIC `'`). A real
    * deployment keys this off the file's language tag; the RULE (trimmed
    * line starts with a family marker) is what matters here.
    */
  val LineCommentMarkers: Map[String, Seq[String]] = Map(
    "c" -> Seq("//"),
    "script" -> Seq("#"),
    "sql" -> Seq("--"),
    "lisp" -> Seq(";"),
    "basic" -> Seq("'"))

  /** Default marker set for untagged corpora: the union — over-counts a
    * `#include` line as a comment in C, which is exactly the documented
    * trade-off of the untyped variant; pass the family set when the
    * language is known.
    */
  val AllMarkers: Seq[String] =
    LineCommentMarkers.values.flatten.toSeq.distinct.sorted

  private def trimmedLines(text: Column): Column =
    filter(transform(split(coalesce(text, lit("")), "\n"), l => trim(l)),
      l => length(l) > 0)

  private def tokens(text: Column): Column = {
    val t = trim(coalesce(text, lit("")))
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  /** Count of trimmed non-empty lines starting with any of `markers`. */
  def commentLineCount(text: Column, markers: Seq[String]): Column = {
    require(markers.nonEmpty, "markers must be non-empty")
    size(filter(trimmedLines(text),
      l => markers.map(m => l.startsWith(lit(m))).reduce(_ || _)))
      .cast("long")
  }

  /** All signals in one projection, as exact counts. Columns:
    * n_lines, n_comment_lines, max_line_len, n_tokens, n_alpha_tokens,
    * n_digit_chars, n_hex_chars, n_chars, has_xml_head.
    */
  def codeMetrics(text: Column,
      markers: Seq[String] = AllMarkers): Seq[(String, Column)] = {
    val lines = trimmedLines(text)
    val toks = tokens(text)
    Seq(
      "n_lines" -> size(lines).cast("long"),
      "n_comment_lines" -> commentLineCount(text, markers),
      "max_line_len" ->
        coalesce(array_max(transform(lines, l => length(l))), lit(0))
          .cast("long"),
      "n_tokens" -> size(toks).cast("long"),
      "n_alpha_tokens" ->
        size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long"),
      "n_digit_chars" ->
        regexp_count(coalesce(text, lit("")), lit("[0-9]")).cast("long"),
      "n_hex_chars" ->
        regexp_count(coalesce(text, lit("")), lit("[0-9A-Fa-f]")).cast("long"),
      "n_chars" -> length(coalesce(text, lit(""))).cast("long"),
      "has_xml_head" ->
        substring(coalesce(text, lit("")), 1, 100).contains("<?xml"))
  }

  /** Attach [[codeMetrics]] to a frame. */
  def withCodeStats(df: DataFrame, textCol: String,
      markers: Seq[String] = AllMarkers): DataFrame =
    df.withColumns(codeMetrics(col(textCol), markers).toMap)

  /** The published keep/drop composition over the attached metrics
    * (expects [[withCodeStats]] columns). Declarative — every threshold
    * is visible in the plan:
    *  - ≥ 25 % of tokens contain a letter (Gopher A1.1's 80 % is prose
    *    calibration; code idles lower — 25 % is SantaCoder's alphabetic
    *    floor applied at token granularity);
    *  - digits < 50 % and hex < 90 % of characters (data-file probes);
    *  - no XML prolog in the head;
    *  - comment density in [1 %, 80 %] of lines (StarCoder band) —
    *    only enforced when the file has ≥ 10 lines, so snippets and
    *    single-expression files aren't judged on density.
    */
  def codeKeepVerdict: Column = {
    val nTok = greatest(col("n_tokens"), lit(1L)).cast("double")
    val nCh = greatest(col("n_chars"), lit(1L)).cast("double")
    val nLn = greatest(col("n_lines"), lit(1L)).cast("double")
    val commentRatio = col("n_comment_lines").cast("double") / nLn
    (col("n_alpha_tokens").cast("double") / nTok >= 0.25) &&
      (col("n_digit_chars").cast("double") / nCh < 0.50) &&
      (col("n_hex_chars").cast("double") / nCh < 0.90) &&
      !col("has_xml_head") &&
      (col("n_lines") < 10 ||
        (commentRatio >= 0.01 && commentRatio <= 0.80))
  }
}
