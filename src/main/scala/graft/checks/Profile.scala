package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the "what does this table look like" pass a data-
  * quality engine runs before anyone writes a rule: per column, row count,
  * null count, distinct cardinality, min and max. The reference engine
  * has no profiling stage (it checks rules someone already wrote —
  * DataQualityCheck_GenerateSQL.py consumes a configured workbook); this
  * is a §2.5 extension that feeds rule authoring: null-rate → isEmpty
  * rules, cardinality → PK candidates, min/max → VC numeric domains.
  *
  * Output: one row per profiled column —
  *   (column, n_rows, n_null, n_distinct, min_s, max_s)
  * min/max are computed on the NATIVE type (so numeric ordering, not
  * lexicographic) and cast to string only for the unified output schema.
  *
  * Plan shape: ONE aggregation job producing a single row, then a
  * driver-free `stack` unpivot of that row — profiling N columns costs one
  * pass over the data regardless of N. With `exactDistinct=true` the
  * multi-`count(DISTINCT ...)` aggregate makes Catalyst plan an Expand
  * (each input row replicated once per distinct-column) — exact, but the
  * shuffle carries N× the key volume. At corpus scale pass
  * `exactDistinct=false`: HyperLogLog++ `approx_count_distinct` keeps the
  * whole profile a single partial-aggregated pass with constant-size
  * state per column (the 100 TB default; exact mode exists for the oracle
  * and for small dimension tables).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // unpivot the single row to one output row per column; stack() is a
    // generator on an already-aggregated 1-row frame — no second shuffle
    val stackArgs = cols.map { c =>
      s"'$c', __n - `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`"
    }.mkString(", ")
    row.select(col("__n").as("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs) " +
          "as (column, n_null, n_distinct, min_s, max_s)"))
      .select(col("column"), col("n_rows"),
        col("n_null").cast("long").as("n_null"),
        col("n_distinct").cast("long").as("n_distinct"),
        col("min_s"), col("max_s"))
      .orderBy("column")
  }
}
