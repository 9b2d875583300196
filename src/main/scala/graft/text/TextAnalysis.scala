package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup.fnv1a64

/** Text analysis for training-data pipelines: quality scoring, token
  * counting (whitespace + BPE-ish regex), and winnowing document
  * fingerprints (Schleimer/Wilkerson/Aiken 2003 — the standard
  * content-defined fingerprinting scheme).
  *
  * Everything except winnowing is pure Column expressions (regexp/length
  * family codegen'd; the array-HOF folds in the repetition/stopword
  * metrics run as interpreted `CodegenFallback` subtrees — see
  * [[repetitionMetrics]] for why that is acceptable there); winnowing is
  * a per-row pure function run in mapPartitions.
  */
object TextAnalysis {

  /** Common English stopwords (public standard list, trimmed). */
  val stopwords: Seq[String] = Seq("the", "of", "and", "to", "in", "is",
    "was", "for", "that", "with", "as", "on", "be", "at", "by", "a", "an",
    "it", "or", "are", "this", "from", "not", "but", "they", "his", "her")

  /** Whitespace token count — size of split on runs of whitespace. */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: counts word pieces, numbers, and individual
    * punctuation marks the way byte-pair tokenizers fragment text —
    * a regexp_count, so it never materializes the token array.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Quality metrics per document, all in one projection. */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val words = wsTokenCount(text)
    Seq(
      "n_chars" -> nChars,
      "n_tokens_ws" -> words,
      "n_tokens_bpeish" -> bpeishTokenCount(text),
      "punct_ratio" -> (regexp_count(text, lit("[\\p{Punct}]")).cast("double") /
        greatest(nChars, lit(1))),
      "stopword_ratio" -> (size(filter(split(lower(text), "\\s+"),
        w => w.isin(stopwords: _*))).cast("double") / greatest(words, lit(1))),
      "mean_word_len" -> (length(regexp_replace(text, lit("\\s+"), lit("")))
        .cast("double") / greatest(words, lit(1))))
  }

  /** Composite quality score in [0,1]: each component clamps its ratio into
    * a "healthy band" (C4-style). Declarative — thresholds visible in the
    * plan, no UDF.
    */
  def qualityScore: Column = {
    def band(c: Column, lo: Double, hi: Double): Column =
      when(c >= lo && c <= hi, 1.0).otherwise(0.0)
    (band(col("stopword_ratio"), 0.01, 0.6) +
      band(col("punct_ratio"), 0.0, 0.3) +
      band(col("mean_word_len"), 2.0, 12.0) +
      band(col("n_tokens_ws").cast("double"), 5, 100000)) / 4.0
  }

  /** Attach metrics + score to a frame. */
  def withQuality(df: DataFrame, textCol: String): DataFrame =
    df.withColumns(qualityMetrics(col(textCol)).toMap)
      .withColumn("quality_score", qualityScore)

  /** Gopher-style repetition signals (Rae et al. 2021, appendix A —
    * the public quality-filter recipe): duplicate-line statistics plus
    * boilerplate line shapes (bullet lists, ellipsis endings). Pure
    * higher-order Column expressions over the split-lines array — one
    * projection, no UDF. (The array HOFs — transform/filter/aggregate —
    * evaluate via interpreted `CodegenFallback` inside the projection,
    * the same Spark limitation that motivated the VecKernel family;
    * acceptable HERE because the fold is line-array-sized and the metric
    * sits on oracle/report paths, not the flagship per-row pipeline.)
    * Emitted as EXACT counts (BIGINT); consumers derive the fractions —
    * and the DuckDB oracle compares integers, never floats (memory:
    * oracle-float-parity).
    *
    * A line = a `\n` segment, trimmed, non-empty. "dup extra" counts
    * instances beyond each distinct line's first occurrence — the
    * numerator of Gopher's duplicate-line fraction with `n_lines` the
    * denominator.
    */
  def repetitionMetrics(text: Column): Seq[(String, Column)] = {
    val lines = filter(
      transform(split(coalesce(text, lit("")), "\n"), l => trim(l)),
      l => length(l) > 0)
    Seq(
      "n_lines" -> size(lines).cast("long"),
      "n_dup_line_extra" ->
        (size(lines) - size(array_distinct(lines))).cast("long"),
      "line_chars" ->
        aggregate(lines, lit(0L), (a, l) => a + length(l)),
      "n_bullet_lines" ->
        size(filter(lines, l => substring(l, 1, 1).isin("-", "*", "•")))
          .cast("long"),
      "n_ellipsis_lines" ->
        size(filter(lines, l => l.endsWith("..."))).cast("long"))
  }

  /** Attach repetition signals to a frame. */
  def withRepetition(df: DataFrame, textCol: String): DataFrame =
    df.withColumns(repetitionMetrics(col(textCol)).toMap)

  /** Canonical pre-dedup text normalization: Unicode NFC (composed forms,
    * via the codegen [[graft.functions.NfcNormalize]] expression — so
    * byte-level hashing sees "é" and "e"+combining-acute identically) →
    * strip C0 control characters except `\n`/`\t` → collapse space/tab
    * runs → trim. Entirely Column-composed, one codegen projection; runs
    * BEFORE hashing/shingling so normalization differences never masquerade
    * as distinct documents.
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.functions.expressions.nfc_normalize(text),
        lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"), lit("")),
      lit("[ \\t]+"), lit(" ")))

  // ---- winnowing fingerprints ---------------------------------------------

  /** Winnowing: rolling k-gram hashes, keep the min of each window of w;
    * guarantees any match of length ≥ w+k-1 shares a fingerprint.
    * Deterministic, order-stable (ties keep the rightmost, per the paper).
    */
  def winnow(text: String, k: Int = 8, w: Int = 4): Array[Long] = {
    if (text == null || text.length < k) return Array.empty
    val n = text.length - k + 1
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) { hashes(i) = fnv1a64(text.substring(i, i + k)); i += 1 }
    if (n <= w) return Array(hashes.min)
    val out = new java.util.LinkedHashSet[Long]()
    var start = 0
    while (start + w <= n) {
      var minIdx = start
      var j = start + 1
      while (j < start + w) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j // rightmost min
        j += 1
      }
      out.add(hashes(minIdx))
      start += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator; var j2 = 0
    while (it.hasNext) { arr(j2) = it.next(); j2 += 1 }
    arr
  }

  /** (id, fingerprints array) per document. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, winnow(t, k, w)) })
      .toDF(idCol, "fingerprints")
  }

  // ---- context-window chunking --------------------------------------------

  /** Split each document into training-window chunks of ≈ `budgetChars`
    * characters at LINE boundaries — the context-window packing step of a
    * pretraining pipeline. A line belongs to chunk
    * `floor(exclusiveCumLen / budgetChars)`, where exclusiveCumLen counts
    * the code points (+1 newline) of every PRECEDING line. The prefix rule
    * means a chunk can overflow the budget by at most one line, chunk ids
    * can skip when a single line spans several budgets, and — unlike
    * greedy packing — the assignment is a pure per-line function of the
    * document that any engine with a window function can replay (the
    * cross-engine oracle does exactly that).
    *
    * Entirely map-side: a document's lines all live in its own input row,
    * so splitting, the prefix sums, and reassembly happen in ONE
    * mapPartitions pass — zero shuffle, no window state, linear in
    * document length, deterministic at any parallelism. (The equivalent
    * posexplode + per-doc window + regroup plan shuffles the whole corpus
    * twice for the same answer.)
    *
    * Returns (idCol, chunk_id, chunk, n_lines, n_chars). Non-null
    * `textCol` assumed (same contract as paragraphDedup): a null text
    * yields ZERO chunk rows — its document disappears from the output —
    * while an empty string yields one empty chunk; coalesce nulls
    * upstream if row preservation matters.
    */
  def chunkByLines(df: DataFrame, idCol: String, textCol: String,
      budgetChars: Int): DataFrame = {
    require(budgetChars > 0, s"budgetChars=$budgetChars must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        val ls = if (text == null) Array.empty[String] else text.split("\n", -1)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, String, Long, Long)]
        var cum = 0L
        var chunkId = -1L
        var sb: StringBuilder = null
        var nLines = 0L
        var nChars = 0L
        def flush(): Unit =
          if (sb != null) out += ((id, chunkId, sb.toString, nLines, nChars))
        var i = 0
        while (i < ls.length) {
          val line = ls(i)
          val cp = line.codePointCount(0, line.length).toLong
          val cid = cum / budgetChars
          if (cid != chunkId) {
            flush(); chunkId = cid; sb = new StringBuilder; nLines = 0; nChars = 0
          } else sb.append('\n')
          sb.append(line)
          nLines += 1
          nChars += cp
          cum += cp + 1
          i += 1
        }
        flush()
        out
      }
      .toDF(idCol, "chunk_id", "chunk", "n_lines", "n_chars")
  }
}
