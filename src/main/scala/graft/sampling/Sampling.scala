package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines. Subsetting a
  * 100 TB corpus must be REPRODUCIBLE: the selection has to be a pure
  * function of row identity — never of partition layout, task scheduling,
  * or an RNG stream — so a resumed run, a re-run at different parallelism,
  * and a verification job all pick the identical subset
  * (`df.sample()` guarantees none of that: it is seeded per-partition).
  *
  * Two primitives cover the common shapes:
  *  - [[hashRateSample]] — "keep p% of rows / of groups": map-side only,
  *    no shuffle, exact in expectation with binomial deviation;
  *  - [[quotaPerStratum]] — "at most k rows per language/source":
  *    uniform-within-stratum top-k by hash order; a mega-stratum (half
  *    the web is English) never lands on one reducer because Catalyst's
  *    `InferWindowGroupLimit` caps every map partition at k rows per
  *    stratum before the exchange (see the method doc).
  */
object Sampling {

  /** The hash every sampling decision derives from: 64-bit mixed, seeded,
    * uniform across its low digits. Exposed so dumps/oracles can carry
    * the decision input alongside the decision.
    */
  def sampleHash(seed: Long, keys: Seq[Column]): Column =
    xxhash64(lit(seed) +: keys: _*)

  private val RateDenom = 1000000L

  /** Keep a row iff `hash(seed, keys) mod 1e6 < rate·1e6` — selection is a
    * pure per-row predicate (map-side, codegen, no shuffle, no state).
    * Sampling UNITS are whatever `keys` identify: pass a document id for
    * per-row sampling, or (repo) to keep or drop whole repositories
    * together (group-coherent sampling — the standard trick for
    * train/holdout splits that must not leak near-duplicates across the
    * boundary).
    */
  def hashRateSample(df: DataFrame, rate: Double, seed: Long,
      keys: Column*): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    val threshold = math.round(rate * RateDenom)
    df.filter(pmod(sampleHash(seed, keys), lit(RateDenom)) < lit(threshold))
  }

  /** Deterministic mixture UPSAMPLING — the domain-weighting primitive of
    * pretraining mixes (publicly described for SlimPajama/DoReMi-style
    * recipes: "2.1 epochs of domain X" means every row appears twice and a
    * 10%-of-rows subset a third time). Each row is emitted
    * `floor(w)` times, plus once more iff `hash(seed, keys) mod 1e6 <
    * frac(w)·1e6` — the fractional epoch is a hash-rate subset, so it is a
    * pure function of row identity: partition-layout independent,
    * identical on re-run, and group-coherent when keyed by repo. Copies
    * are tagged `copy_idx` (0-based) so downstream stages can
    * distinguish them; the explode is map-side (no shuffle, no state).
    *
    * Engine-parity note: the fractional threshold is
    * `round(frac(w)·1e6)` — ROUNDED, the same rule [[hashRateSample]]
    * applies, so `weightedRepeat(w=1.3)` selects the identical
    * fractional-epoch subset as `hashRateSample(rate=0.3)` (truncation
    * would put the two one millionth apart at e.g. 0.3, whose frac is
    * 0.29999…94 in binary). Weights exact in binary (.25 steps)
    * cross-replay bit-identically in any engine; arbitrary decimals may
    * differ by 1 ulp before rounding — quantize to 1e-6 when it matters.
    */
  def weightedRepeat(df: DataFrame, weight: Column, seed: Long,
      keys: Column*): DataFrame = {
    val frac = weight - floor(weight)
    val nCopies = floor(weight).cast("int") +
      when(pmod(sampleHash(seed, keys), lit(RateDenom)) <
        round(frac * RateDenom).cast("long"), 1).otherwise(0)
    df.withColumn("__nc", nCopies)
      .filter(col("__nc") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0), col("__nc") - 1)))
      .drop("__nc")
  }

  /** Token-BUDGET sampling — "take ~N tokens of each language": rows are
    * consumed in hash order (uniform, deterministic) until the stratum's
    * cumulative `weight` (tokens, bytes, chars) reaches `budget`; the
    * crossing row is kept, so every stratum gets at least one row and at
    * most budget + maxRowWeight − 1. This is the mix-construction
    * primitive quotas can't express: "10B tokens of Python" is a weight
    * budget, not a row count.
    *
    * Scale design — a cumulative sum is inherently order-dependent, so
    * instead of one global window per stratum (a mega-stratum lands on
    * one reducer) the prefix sum is RANGE-BUCKETED: bucket = top 8 bits
    * of the decision hash (arithmetic shift — monotone in the hash
    * order, so buckets tile the order), per-(stratum,bucket) sums roll
    * into exclusive bucket offsets (a |strata|×256 frame — broadcast),
    * and within-bucket window prefix + offset = the EXACT global prefix
    * in hash order. The expensive window partitions by (stratum,
    * bucket): a half-the-corpus stratum spreads over 256 reducers.
    */
  def tokenBudgetSample(df: DataFrame, stratumCols: Seq[String],
      budget: Long, weight: Column, tieCols: Seq[String],
      seed: Long = 42L): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    // cached: the hashed/weighted frame feeds BOTH the bucket-sum
    // aggregation and the main windowed join — uncached, the source scan
    // + hash projection would run twice (the exchanges differ, so Spark
    // can't reuse them). Caller releases via graft.util.Caches.release().
    val withH = graft.util.Caches.track(
      df.withColumn("__sh", sampleHash(seed, tieCols.map(col)))
        .withColumn("__w", weight.cast("long"))
        .withColumn("__bk", (shiftright(col("__sh"), 56) + lit(128)).cast("int")))
    val bucketSums = withH
      .groupBy((stratumCols.map(col) :+ col("__bk")): _*)
      .agg(sum(col("__w")).as("__bsum"))
    val offsets = bucketSums.withColumn("__off",
      coalesce(sum(col("__bsum")).over(
        Window.partitionBy(stratumCols.map(col): _*)
          .orderBy(col("__bk").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((stratumCols.map(col) :+ col("__bk") :+ col("__off")): _*)
    val wLocal = Window
      .partitionBy((stratumCols.map(col) :+ col("__bk")): _*)
      .orderBy(col("__sh").asc +: tieCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // null-safe (<=>) stratum keys: a NULL stratum (missing language tag,
    // absent domain) is a legitimate group with its own budget — a plain
    // equi-join would silently drop every such row, breaking the "every
    // stratum gets at least one row" guarantee. The offsets frame derives
    // FROM withH, so its key columns are renamed before the join (same-
    // lineage df("c") references resolve to one attribute and produce a
    // trivially-true predicate).
    val offsetsR = offsets.select(
      (stratumCols.map(c => col(c).as(s"__o_$c")) :+
        col("__bk").as("__o_bk") :+ col("__off")): _*)
    val joinCond = (stratumCols.map(c => col(c) <=> col(s"__o_$c")) :+
      (col("__bk") <=> col("__o_bk"))).reduce(_ && _)
    withH
      .join(broadcast(offsetsR), joinCond)
      .drop(("__o_bk" +: stratumCols.map(c => s"__o_$c")): _*)
      .withColumn("__cum",
        col("__off") + coalesce(sum(col("__w")).over(wLocal), lit(0L)))
      .filter(col("__cum") < budget)
      .drop("__sh", "__w", "__bk", "__off", "__cum")
  }

  /** EXACT 0-based rank of every row within its stratum under the total
    * order (`value` asc, `tieCols` asc), plus the stratum size — the
    * primitive behind quantile bucketing ([[quantileTiers]]) without a
    * one-reducer-per-stratum global window.
    *
    * Scale design — same decomposition as [[tokenBudgetSample]], but the
    * order is a DATA VALUE, not a uniform hash, so the range bucket must
    * be monotone in the value itself: bucket = top bits of the IEEE-754
    * sortable key ([[graft.functions.DoubleSortBucket]], map-side, no
    * sampling pass). Per-(stratum,bucket) counts roll into broadcast
    * exclusive offsets; within-bucket `row_number` + offset = the exact
    * global rank. The expensive window partitions by (stratum, bucket):
    * a half-the-corpus stratum spreads over 2^bits reducers.
    *
    * Unlike a hash order the buckets can be SKEWED (a spike of equal
    * values lands in one bucket); `bucketBits` trades bucket count
    * against offset-frame size (default 256 buckets/stratum — the offset
    * frame stays broadcastable at thousands of strata). Rows where
    * `value` is NULL rank FIRST (Spark's asc-nulls-first), one more
    * reason to coalesce or pre-filter nulls when the order must be
    * engine-portable (SQL engines default to NULLS LAST).
    */
  def rankInStratum(df: DataFrame, stratumCols: Seq[String], value: Column,
      tieCols: Seq[String], rankCol: String = "rank_in_stratum",
      nCol: String = "n_in_stratum", bucketBits: Int = 8): DataFrame = {
    // cached: feeds both the bucket-count aggregation and the main
    // windowed join (caller releases via graft.util.Caches.release())
    val withV = graft.util.Caches.track(
      df.withColumn("__v", value.cast("double"))
        .withColumn("__bk",
          graft.functions.expressions.double_sort_bucket(col("__v"), bucketBits)))
    val wS = Window.partitionBy(stratumCols.map(col): _*)
    val offsets = withV
      .groupBy((stratumCols.map(col) :+ col("__bk")): _*)
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__off", coalesce(sum(col("__bn")).over(
        wS.orderBy(col("__bk").asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__bn")).over(wS))
      .select((stratumCols.map(c => col(c).as(s"__o_$c")) :+
        col("__bk").as("__o_bk") :+ col("__off") :+ col("__n")): _*)
    // null-safe stratum keys — a NULL stratum is a legitimate group (see
    // tokenBudgetSample); __bk is null iff __v is null, same rule applies
    val joinCond = (stratumCols.map(c => col(c) <=> col(s"__o_$c")) :+
      (col("__bk") <=> col("__o_bk"))).reduce(_ && _)
    val wLocal = Window
      .partitionBy((stratumCols.map(col) :+ col("__bk")): _*)
      .orderBy(col("__v").asc_nulls_first +: tieCols.map(col(_).asc): _*)
    withV
      .join(broadcast(offsets), joinCond)
      .drop(("__o_bk" +: stratumCols.map(c => s"__o_$c")): _*)
      .withColumn(rankCol, col("__off") + row_number().over(wLocal) - 1)
      .withColumnRenamed("__n", nCol)
      .drop("__v", "__bk", "__off")
  }

  /** Per-stratum quantile tiers — the published CCNet recipe ("head /
    * middle / tail by per-language LM perplexity") generalized: tier =
    * `floor(rank·tiers / n)` under the exact within-stratum rank, so tier
    * 0 is the best (lowest-value) `1/tiers` of every stratum regardless
    * of the strata's absolute value ranges. Integer `div` — exact past
    * the double mantissa at any corpus size.
    */
  def quantileTiers(df: DataFrame, stratumCols: Seq[String], value: Column,
      tieCols: Seq[String], tiers: Int, tierCol: String = "tier",
      bucketBits: Int = 8): DataFrame = {
    require(tiers > 0, s"tiers=$tiers must be positive")
    rankInStratum(df, stratumCols, value, tieCols,
      rankCol = "__rk", nCol = "__rn_n", bucketBits = bucketBits)
      .withColumn(tierCol,
        expr(s"cast((__rk * ${tiers}L) div __rn_n as int)"))
      .drop("__rk", "__rn_n")
  }

  /** At most `k` rows per stratum, chosen uniformly within the stratum by
    * hash order (ties broken by the tie columns themselves, so the result
    * is total-ordered and deterministic).
    *
    * Skew defense: the `row_number() <= k` shape is recognized by
    * Catalyst's `InferWindowGroupLimit` (SPARK-37099, Spark ≥ 3.5), which
    * inserts a PARTIAL `WindowGroupLimit` before the exchange — every map
    * partition forwards at most k rows per stratum, so the post-shuffle
    * stratum sees ≤ k·numMapPartitions rows no matter how skewed the
    * input (SamplingSpec pins the Partial node in the plan). Earlier
    * rounds carried a hand-salted two-phase variant here; at n=48M with a
    * 90%-mass stratum the optimizer-protected single window measured 2.1×
    * faster (8.9 s vs 18.5 s, one exchange instead of two), so the salt
    * was retired — see BASELINE.md "skew defense". Operators whose
    * per-group work is NOT a rank-limit (pack emission, prefix sums)
    * still need engine-side range/salt defenses
    * ([[graft.text.RepoPack.packByRepoRanged]], [[tokenBudgetSample]]).
    */
  def quotaPerStratum(df: DataFrame, stratumCols: Seq[String], k: Int,
      tieCols: Seq[String], seed: Long = 42L): DataFrame = {
    require(k > 0, s"quota k=$k must be positive")
    val h = sampleHash(seed, tieCols.map(col))
    val ordering = col("__sh").asc +: tieCols.map(col(_).asc)
    df.withColumn("__sh", h)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(stratumCols.map(col): _*).orderBy(ordering: _*)))
      .filter(col("__rn") <= k)
      .drop("__rn", "__sh")
  }
}
