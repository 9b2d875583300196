package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate detection and removal — the published C4 /
  * RefinedWeb cleaning step the per-document repetition metrics cannot
  * express: a line that appears in MANY documents ("Enable JavaScript to
  * continue", cookie banners, nav bars, license headers already handled
  * elsewhere) carries no signal and is removed everywhere, whatever each
  * individual document looks like.
  *
  * Two halves, separated so the expensive discovery runs once per corpus
  * snapshot and the cheap removal runs per pipeline pass:
  *  - [[frequentLines]] — the heavy-hitter pass. The distinct-document
  *    count shuffles (xxhash64(line), id) pairs — 16 B/row, never line
  *    text; only hashes OVER the threshold (a tiny set by definition of
  *    "boilerplate") are broadcast back to fetch one representative text
  *    each. Identity is the 64-bit line hash during counting (collision
  *    odds ~n²/2⁶⁵ — negligible against corpus-scale line counts; the
  *    lexicon itself carries exact text, so removal never trusts the
  *    hash).
  *  - [[removeLines]] — ONE map-side pass: the lexicon (bounded by
  *    `maxLines`) rides a broadcast set, each document is rebuilt in
  *    place. Zero shuffle, zero joins — the 10¹²-file half of the job.
  */
object Boilerplate {

  /** Lines whose distinct-document frequency is at least `minDocs`,
    * as (line, n_docs), deterministically ordered (n_docs desc, line asc)
    * and capped at `maxLines`. Lines whose TRIMMED length is below
    * `minTrimmedLen` never qualify — structural tokens (`}`, `import os`,
    * blank) are document shape, not boilerplate, and would otherwise
    * dominate any code corpus.
    *
    * The input is scanned twice (count pass + representative-text fetch),
    * both map-side from the source — at corpus scale caching the exploded
    * line frame would cost more than the second scan.
    */
  def frequentLines(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Long, maxLines: Int = 1000,
      minTrimmedLen: Int = 4): DataFrame = {
    require(minDocs > 1, s"minDocs=$minDocs: a 1-doc 'boilerplate' line is every line")
    val lines = docs
      .select(col(idCol).as("__id"),
        explode(split(col(textCol), "\n", -1)).as("line"))
      .filter(length(trim(col("line"))) >= minTrimmedLen)
      .select(xxhash64(col("line")).as("lh"), col("__id"), col("line"))
    val hot = lines.select("lh", "__id").distinct()
      .groupBy("lh").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    // fetch one representative text per hot hash: min(line) — any member
    // is the same text modulo a 64-bit collision, min makes it total
    lines.join(broadcast(hot), Seq("lh"))
      .groupBy(col("lh"), col("n_docs")).agg(min(col("line")).as("line"))
      .orderBy(col("n_docs").desc, col("line").asc)
      .limit(maxLines)
      .select("line", "n_docs")
  }

  /** Remove every exact-match lexicon line from every document — one
    * mapPartitions pass (no shuffle; the lexicon is a broadcast set).
    * Returns (idCol, textCol rewritten, n_lines, n_removed). Pure function
    * of (row, lexicon): partition-layout independent by construction.
    */
  def removeLines(docs: DataFrame, idCol: String, textCol: String,
      lexicon: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(lexicon.toSet)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val set = bc.value
        it.map { case (id, text) =>
          val ls = (if (text == null) "" else text).split("\n", -1)
          val kept = ls.filterNot(set.contains)
          (id, kept.mkString("\n"), ls.length, ls.length - kept.length)
        }
      }
      .toDF(idCol, textCol, "n_lines", "n_removed")
  }
}
