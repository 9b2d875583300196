package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named SparkEntry queries —
  * the `.explain("formatted")` audit loop (pushdowns, broadcasts,
  * codegen spans) without editing code.
  *
  * Usage: runMain graft.tools.PlanAudit <sfDir> <query> [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    // dump-based queries EAGERLY write their oracle aux parquet when the
    // query fn is constructed — keep those writes away from the Verify
    // dump the driver's DuckDB compare reads (same defense as Bench)
    System.setProperty("graft.oracle.aux", "/tmp/graft_planaudit_aux")
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
