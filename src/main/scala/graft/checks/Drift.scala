package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot distribution drift — the data-quality check the
  * reference's row-level rules cannot express: two corpus snapshots can
  * both pass every PK/FK/domain rule while the DISTRIBUTION of a metric
  * (document length, perplexity, language mix) silently shifts. Standard
  * published measures: PSI (Population Stability Index, the banking
  * model-monitoring metric — apt for a reference engine that lived in a
  * bank) for numeric columns; per-category share deltas with an L1 total
  * for categorical columns.
  *
  * Scale shape: each side is ONE partial-aggregated count pass (groupBy on
  * ≤ a few dozen bucket ids — bytes of shuffle per partition regardless of
  * input size); the join of the two histograms is bucket-count-sized. No
  * content moves, nothing collects. At 100 TB a drift check costs two
  * column scans.
  */
object Drift {

  /** Bucket id of `v` against sorted `boundaries`: the number of
    * boundaries ≤ v, i.e. 0 for v < b(0), `boundaries.size` for
    * v ≥ b(last), NULL for null v. Pure codegen array expression; the
    * DuckDB oracle replays it verbatim as
    * `len(list_filter(bs, b -> v >= b))`.
    */
  def bucketOf(v: Column, boundaries: Seq[Double]): Column = {
    require(boundaries == boundaries.sorted && boundaries.nonEmpty,
      "boundaries must be non-empty and ascending")
    // the isNotNull guard matters: a null v makes every `v >= b` null,
    // which filter() drops — silently landing nulls in bucket 0 instead
    // of excluding them as documented
    when(v.isNotNull, size(filter(array(boundaries.map(lit): _*), b => v >= b)))
  }

  private def histogram(df: DataFrame, value: Column,
      boundaries: Seq[Double], cntCol: String): DataFrame =
    df.select(bucketOf(value, boundaries).as("bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy("bucket").agg(count(lit(1)).as(cntCol))

  /** Per-bucket PSI decomposition between a baseline and a current
    * snapshot of the same metric. Returns one row per occupied bucket:
    * (bucket, base_cnt, cur_cnt, psi_term) with
    * `psi_term = (p − q) · ln(p / q)`, p/q the eps-floored bucket shares
    * (the standard PSI smoothing so an empty bucket contributes a large
    * finite term instead of ∞). `sum(psi_term)` is the PSI; the
    * conventional read: < 0.1 stable, 0.1–0.25 moderate, > 0.25 major
    * shift. Null metric values are excluded from both sides (they are
    * nullity drift — profile territory, not distribution drift).
    */
  def psiByBucket(baseline: DataFrame, current: DataFrame, value: Column,
      boundaries: Seq[Double], eps: Double = 1e-6): DataFrame = {
    require(eps > 0, s"eps=$eps must be positive")
    val b = histogram(baseline, value, boundaries, "base_cnt")
    val c = histogram(current, value, boundaries, "cur_cnt")
    val joined = b.join(c, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("base_cnt"), lit(0L)).as("base_cnt"),
        coalesce(col("cur_cnt"), lit(0L)).as("cur_cnt"))
    val bTot = sum(col("base_cnt")).over()
    val cTot = sum(col("cur_cnt")).over()
    // the totals window is a single-partition exchange over BUCKET-COUNT
    // rows (dozens), not data rows — deliberately fine
    val p = greatest(col("base_cnt").cast("double") / bTot, lit(eps))
    val q = greatest(col("cur_cnt").cast("double") / cTot, lit(eps))
    joined.withColumn("psi_term", (p - q) * log(p / q))
      .orderBy("bucket")
  }

  /** Scalar PSI (see [[psiByBucket]]). */
  def psi(baseline: DataFrame, current: DataFrame, value: Column,
      boundaries: Seq[Double], eps: Double = 1e-6): Double =
    psiByBucket(baseline, current, value, boundaries, eps)
      .agg(sum("psi_term")).head.getDouble(0)

  /** Categorical drift: per-category baseline/current shares, their delta,
    * and the category's contribution to the total variation distance
    * (TVD = Σ|Δ|/2 — the standard categorical-shift measure). One count
    * pass per side over the category column; join is category-count-sized
    * (caller's column should be low-cardinality — language, source,
    * license class; for open-ended keys run it on a bucketed derivative).
    */
  def categoricalDrift(baseline: DataFrame, current: DataFrame,
      key: Column): DataFrame = {
    val b = baseline.select(key.as("key")).groupBy("key")
      .agg(count(lit(1)).as("base_cnt"))
    val c = current.select(key.as("key")).groupBy("key")
      .agg(count(lit(1)).as("cur_cnt"))
    val joined = b.join(c, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("base_cnt"), lit(0L)).as("base_cnt"),
        coalesce(col("cur_cnt"), lit(0L)).as("cur_cnt"))
    val bTot = sum(col("base_cnt")).over()
    val cTot = sum(col("cur_cnt")).over()
    joined
      .withColumn("base_share", col("base_cnt").cast("double") / bTot)
      .withColumn("cur_share", col("cur_cnt").cast("double") / cTot)
      .withColumn("share_delta", col("cur_share") - col("base_share"))
      .orderBy("key")
  }
}
