package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 32
    val mode = if (args.length > 1) args(1) else "semdedup"
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

    mode match {
      case "semdedup" =>
        // the bench frame: untimed setup run, then 3 timed runs with aux
        // dumps skipped — measures the post-memo operator cost. Like
        // Bench, use a PRIVATE aux dir and clear it first: skipping (or
        // clobbering) against the default Verify dump would poison a
        // concurrent compare_oracle run.
        val aux = java.nio.file.Paths.get("/tmp/graft_scratch_aux")
        if (java.nio.file.Files.exists(aux)) {
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(aux)
          try walk.iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
          finally walk.close()
        }
        System.setProperty("graft.oracle.aux", aux.toString)
        System.setProperty("graft.oracle.auxSkipExisting", "1")
        val dir = "/root/testdata/sf0.1"
        for (q <- Seq("q_semdedup", "q_ann_ivf")) {
          val fn = graft.SparkEntry.queries(q)
          time(s"$q setup") {
            fn(spark, dir).write.format("noop").mode("overwrite").save()
          }
          graft.util.Caches.release()
          for (i <- 1 to 3) time(s"$q timed run $i") {
            fn(spark, dir).write.format("noop").mode("overwrite").save()
            graft.util.Caches.release()
          }
        }
      case "rangedprof" =>
        // where do packByRepoRanged's 102 s at 12M go?
        val rows = if (args.length > 2) args(2).toLong else 12000000L
        // the SAME fixture Bench's skew shot measures (one definition)
        val df = graft.Bench.skewRepoFixture(spark, rows, 4 * cpus)
        import spark.implicits._
        val parts = spark.sessionState.conf.numShufflePartitions
        val ranged = graft.util.Caches.track(
          df.repartitionByRange(parts, col("repo"), col("path"), col("commit"))
            .sortWithinPartitions(col("repo"), col("path"), col("commit")))
          .as[(String, String, String, String)]
        time("A: range+sort+cache materialize") { ranged.count() }
        val sums = time("B: slim sums collect") {
          ranged.mapPartitions { it =>
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val acc = scala.collection.mutable.LinkedHashMap.empty[String, Long]
            it.foreach { case (repo, _, _, c0) =>
              val c = if (c0 == null) "" else c0
              acc(repo) = acc.getOrElse(repo, 0L) +
                c.codePointCount(0, c.length).toLong
            }
            acc.iterator.map { case (r, w) => (pid, r, w) }
          }.collect()
        }
        println(s"[scratch] sums rows: ${sums.length}")
        time("C: full ranged run (reuses cache)") {
          graft.text.RepoPack.packByRepoRanged(df, budgetChars = 100000L)
            .write.format("noop").mode("overwrite").save()
        }
        graft.util.Caches.release()
        time("D: full ranged run (cold, own cache)") {
          graft.text.RepoPack.packByRepoRanged(df, budgetChars = 100000L)
            .write.format("noop").mode("overwrite").save()
          graft.util.Caches.release()
        }
      case "wgl" =>
        // does InferWindowGroupLimit fire on the rank-limit quota shape?
        import org.apache.spark.sql.expressions.Window
        val df = spark.range(0L, 1000L, 1L, 8)
          .select(col("id").as("doc_id"),
            pmod(col("id"), lit(7L)).cast("string").as("repo"))
        val h = graft.sampling.Sampling.sampleHash(42L, Seq(col("doc_id")))
        val out = df.withColumn("__sh", h)
          .withColumn("__rn", row_number().over(
            Window.partitionBy(col("repo"))
              .orderBy(col("__sh").asc, col("doc_id").asc)))
          .filter(col("__rn") <= 25).drop("__rn", "__sh")
        println(out.queryExecution.executedPlan.toString)
      case "skew" =>
        // repo-pack over a planted 90%-mass mega-repo: the plain
        // hash-shuffle path funnels the mega-repo through ONE task (pack
        // emission needs every row — no optimizer group-limit can help),
        // the ranged path spreads it. Same output rows (PackingSpec).
        val skewN = if (args.length > 2) args(2).toLong else 12000000L
        def job(rows: Long, ranged: Boolean): Unit = {
          // the SAME fixture Bench's skew shot measures (one definition)
          val df = graft.Bench.skewRepoFixture(spark, rows, 4 * cpus)
          val out =
            if (ranged)
              graft.text.RepoPack.packByRepoRanged(df, budgetChars = 100000L)
            else graft.text.RepoPack.packByRepo(df, budgetChars = 100000L)
          out.write.format("noop").mode("overwrite").save()
          graft.util.Caches.release()
        }
        for (ranged <- Seq(true, false)) job(100000L, ranged) // JIT warm-up
        for (round <- 1 to 3; ranged <- Seq(true, false))
          time(s"skew-pack n=$skewN ranged=$ranged round=$round") {
            job(skewN, ranged)
          }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
