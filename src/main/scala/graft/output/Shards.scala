package graft.output

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard layout — the OUTPUT stage of a data pipeline: the kept
  * corpus is globally shuffled (deterministically) and cut into shards of
  * ≈ `shardBytes` payload each, the artifact a trainer actually consumes
  * (size-balanced files in a reproducible order, à la WebDataset/Megatron
  * data shards).
  *
  * Both requirements fall out of ONE rule: rows are ordered by
  * `xxhash64(seed, tieCols)` (a uniform deterministic permutation — the
  * "global shuffle" that de-correlates adjacent training examples), and a
  * row belongs to shard `floor(exclusiveCumWeight / shardBytes)` where the
  * cumulative sum runs in that hash order. Size balance is exact by
  * construction (every shard spans exactly `shardBytes` of cumulative
  * payload, the crossing row overflowing by < its own weight), the
  * assignment is a pure function of row identity (re-runs, resumes, and
  * different parallelism levels produce the identical layout), and any
  * engine with a window function can replay it — the `q_shards` DuckDB
  * oracle does.
  *
  * Scale design (100 TB): a global cumulative sum cannot be one window —
  * that is a single-reducer sort. The prefix sum is bucketed exactly like
  * [[graft.sampling.Sampling.tokenBudgetSample]]: bucket = top 8 bits of
  * the hash (arithmetic shift — MONOTONE in the hash order, so buckets
  * tile the permutation), slim per-bucket weight sums (256 longs) roll
  * into exclusive bucket offsets broadcast back, and within-bucket window
  * prefix + offset = the exact global prefix. The one expensive exchange
  * partitions by bucket and sorts by hash — and because buckets tile the
  * hash order, that exchange IS the shard clustering: a shard is a
  * contiguous hash range touching at most two adjacent buckets, so
  * [[writeShards]] hands the windowed frame straight to
  * `write.partitionBy(shard_id)` with NO second content shuffle (each
  * task overlaps ≤ bucketBytes/shardBytes + 1 shards, each shard is
  * written by ≤ 2 tasks). Content moves over the wire exactly once.
  *
  * Nulls: `weight` coalesces to 0 (a null-payload row still gets a slot);
  * `tieCols` should be non-null unique identity (PK) columns.
  */
object Shards {

  /** Append a `shard_id` column under the replayable prefix rule above.
    * `weight` is the row's payload size (bytes, chars, tokens — caller's
    * unit); `tieCols` are the identity columns the permutation hashes.
    * One content exchange (the bucket window); everything else is slim.
    */
  def assignShards(df: DataFrame, shardBytes: Long, weight: Column,
      tieCols: Seq[String], seed: Long = 42L): DataFrame = {
    require(shardBytes > 0, s"shardBytes=$shardBytes must be positive")
    withGlobalCum(df, weight, tieCols, seed)
      // integral `div`, not `/`: long ÷ long via double misrounds near a
      // boundary once cums outgrow the mantissa — exact at any scale
      .withColumn("shard_id", expr(s"__cum div ${shardBytes}L"))
      .drop("__w", "__cum")
  }

  /** Shared bucketed-exact-prefix machinery of [[assignShards]] and
    * [[packSequences]]: appends `__w` (the long weight, null→0) and
    * `__cum` (the row's EXCLUSIVE global cumulative weight in
    * hash(seed, tieCols) permutation order). One content exchange (the
    * per-bucket window); the 256 bucket offsets broadcast.
    */
  private[output] def withGlobalCum(df: DataFrame, weight: Column,
      tieCols: Seq[String], seed: Long): DataFrame = {
    require(tieCols.nonEmpty, "tieCols must name the row identity")
    // cached: feeds BOTH the slim bucket-sum aggregation and the windowed
    // main pass (the exchanges differ, so Spark cannot reuse one scan).
    // Caller releases via Caches.release().
    val withH = graft.util.Caches.track(
      df.withColumn("__sh", graft.sampling.Sampling.sampleHash(seed, tieCols.map(col)))
        .withColumn("__w", coalesce(weight.cast("long"), lit(0L)))
        .withColumn("__bk", (shiftright(col("__sh"), 56) + lit(128)).cast("int")))
    val offsets = withH.groupBy(col("__bk"))
      .agg(sum(col("__w")).as("__bsum"))
      .withColumn("__off",
        coalesce(sum(col("__bsum")).over(
          Window.orderBy(col("__bk").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bk").as("__o_bk"), col("__off"))
    val wLocal = Window.partitionBy(col("__bk"))
      .orderBy(col("__sh").asc +: tieCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    withH
      .join(broadcast(offsets), col("__bk") === col("__o_bk"))
      .withColumn("__cum",
        col("__off") + coalesce(sum(col("__w")).over(wLocal), lit(0L)))
      .drop("__sh", "__bk", "__o_bk", "__off")
  }

  /** Training-sequence packing — GPT-style "concat and chunk": the kept
    * corpus is concatenated in a deterministic hash permutation (the same
    * global shuffle [[assignShards]] uses) and cut into fixed
    * `budgetTokens`-token training sequences, documents SPLITTING across
    * sequence boundaries (no padding, no truncation loss — the classic
    * pretraining packing; contrast with the per-document
    * [[graft.text.TextAnalysis.chunkByLines]], which never crosses
    * documents). Emits one row per (document × overlapped sequence):
    *
    *   tieCols…, `n_tokens` (the doc's own count), `seq_id`,
    *   `tok_start` (first token of the doc landing in this sequence,
    *   0-based within the doc), `seq_off` (where it lands in the
    *   sequence), `n_in_seq` (how many land there).
    *
    * Invariants (spec-pinned): Σ n_in_seq per doc = its token count;
    *   Σ n_in_seq per seq_id = budgetTokens for every sequence except the
    *   last; assignments are a pure function of row identity (layout- and
    *   parallelism-independent).
    *
    * Zero-token documents occupy no slot and emit no row. Scale: the one
    * content exchange is the shared bucketed prefix window; the span
    * explode is map-side (a doc overlaps ⌈len/budget⌉+1 ≤ small
    * sequences); every downstream column is codegen arithmetic. The rule
    * is replayable by any engine with a window + series generator — the
    * `q_pack_sequences` DuckDB oracle does exactly that.
    */
  def packSequences(df: DataFrame, budgetTokens: Long, tokenCount: Column,
      tieCols: Seq[String], seed: Long = 42L): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens=$budgetTokens must be positive")
    val b = lit(budgetTokens)
    withGlobalCum(df, tokenCount, tieCols, seed)
      .filter(col("__w") > 0)
      .withColumn("seq_id",
        explode(sequence(expr(s"__cum div ${budgetTokens}L"),
          expr(s"(__cum + __w - 1) div ${budgetTokens}L"))))
      .withColumn("__seq_start", col("seq_id") * b)
      .withColumn("tok_start",
        greatest(col("__seq_start") - col("__cum"), lit(0L)))
      .withColumn("seq_off",
        greatest(col("__cum") - col("__seq_start"), lit(0L)))
      .withColumn("n_in_seq",
        least(col("__seq_start") + b, col("__cum") + col("__w")) -
          greatest(col("__seq_start"), col("__cum")))
      .withColumn("n_tokens", col("__w"))
      .drop("__w", "__cum", "__seq_start")
  }

  /** Assign and MATERIALIZE: parquet partitioned by `shard_id`, reusing
    * the window's bucket clustering so no second exchange moves content.
    * Returns the layout summary (shard_id, n_docs, n_bytes) for manifest/
    * lineage use — a slim aggregate over the written frame.
    */
  def writeShards(df: DataFrame, path: String, shardBytes: Long,
      weight: Column, tieCols: Seq[String], seed: Long = 42L): DataFrame = {
    val assigned = assignShards(df, shardBytes, weight, tieCols, seed)
    assigned.write.mode("overwrite").partitionBy("shard_id").parquet(path)
    val spark = df.sparkSession
    spark.read.parquet(path)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(weight.cast("long"), lit(0L))).as("n_bytes"))
      .orderBy(col("shard_id"))
  }
}
