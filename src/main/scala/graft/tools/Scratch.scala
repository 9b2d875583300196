package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 60000L
    val cpus = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val nearDupCfg = Some(graft.dedup.Dedup.MinHashConfig(threshold = 0.8))
    time("runInMemory warm 50k") {
      graft.runner.Runner.runInMemory(spark, 50000L, partitions = cpus,
        includeDedup = true, nearDup = nearDupCfg)
    }
    (1 to 2).foreach { i =>
      time(s"runInMemory n=$n round$i") {
        val rows = graft.runner.Runner.runInMemory(spark, n,
          partitions = 4 * cpus, includeDedup = true, nearDup = nearDupCfg)
        println("[scratch] rows=" + rows)
      }
    }
    spark.stop()
  }
}
