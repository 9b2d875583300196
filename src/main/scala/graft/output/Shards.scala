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
      // integral `div`, not `/`: long ÷ long via double misrounds near a
      // boundary once cums outgrow the mantissa — exact at any scale
      .withColumn("shard_id", expr(s"__cum div ${shardBytes}L"))
      .drop("__sh", "__w", "__bk", "__o_bk", "__off", "__cum")
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
