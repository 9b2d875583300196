package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Evidence for the bucketing scale claim (SURVEY.md §4.2 / builder brief:
  * "bucketing for co-located joins"): a table written bucketBy(join key)
  * joins against another table bucketed the same way with NO shuffle on
  * either side — at 100 TB this converts the FK validation's dominant
  * exchange into a local zip of co-located buckets.
  */
class BucketingSpec extends SparkSpec {

  /** Exchanges in the (initial adaptive) physical plan — sufficient here:
    * both assertions concern the STATIC join/agg strategy (bucketed scans
    * satisfy the required distribution), not a runtime AQE rewrite.
    */
  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    def strip(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: AdaptiveSparkPlanExec => strip(a.executedPlan)
        case other => other +: other.children.flatMap(strip)
      }
    strip(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec])
  }

  test("bucketed tables join and aggregate without exchanges") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    // disable broadcast so the join strategy must rely on co-location
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      orders.write.mode("overwrite").bucketBy(8, "o_custkey")
        .sortBy("o_custkey").saveAsTable("orders_b")
      customer.write.mode("overwrite").bucketBy(8, "c_custkey")
        .sortBy("c_custkey").saveAsTable("customer_b")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      assert(countShuffles(joined) === 0,
        "co-bucketed equi-join must not exchange either side")
      // groupBy on the bucket key: partial agg only, no exchange
      val agg = spark.table("orders_b").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      assert(countShuffles(agg) === 0,
        "aggregation on the bucketing key must not exchange")
      // control: the same join over unbucketed parquet DOES shuffle
      val unbucketed = orders.join(customer,
        col("o_custkey") === col("c_custkey"))
      assert(countShuffles(unbucketed) > 0)
      // and produces identical results
      assert(joined.count() === unbucketed.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
      // warehouse dir is a static conf; clean the default local warehouse
      val wh = new java.io.File("spark-warehouse")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      if (wh.exists()) rm(wh)
    }
  }
}
