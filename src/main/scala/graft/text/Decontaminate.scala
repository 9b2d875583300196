package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-gram shingles with an evaluation/benchmark set — the public recipe
  * (GPT-3 appendix C, PaLM, Llama reports all describe n-gram-collision
  * decontamination of pretraining corpora against eval sets).
  *
  * Scale shape: the BENCHMARK side is small by nature (eval sets are
  * thousands of documents, not billions), so its distinct shingle set
  * broadcasts and the corpus-side probe is map-side — no shuffle touches
  * content; the only aggregation is hit-counting by document id. Shingles
  * are the same deterministic hashed word n-grams the dedup stages use
  * ([[graft.dedup.Dedup.shingles]]), at a longer n (default 8): long
  * n-grams make coincidental collisions rare, so any hit is meaningful —
  * the same reasoning the published pipelines give for 8-13-gram windows.
  */
object Decontaminate {

  /** (id, shingle-hash) — one row per distinct n-gram per document. */
  def docShingles(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, t) => graft.dedup.Dedup.shingles(t, n).map((id, _)) }
      .toDF(idCol, "shingle")
  }

  /** Per-document contamination: `n_hits` = distinct benchmark shingles
    * the document contains, `contaminated` = n_hits ≥ minHits. Every
    * input document appears in the output (zero hits included) so the
    * caller can anti-join or filter either way.
    */
  def contaminationFlags(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int = 8, minHits: Int = 1): DataFrame = {
    require(n > 0 && minHits > 0, s"n=$n minHits=$minHits must be positive")
    val benchShingles = broadcast(
      docShingles(benchmark.select(lit(0L).as("__bid"),
          col(benchTextCol).as("__btxt")), "__bid", "__btxt", n)
        .select(col("shingle")).distinct())
    val hits = docShingles(docs, idCol, textCol, n)
      .join(benchShingles, Seq("shingle"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    docs.select(col(idCol).cast("long"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") >= minHits)
  }
}
