package graft.tools

import org.apache.spark.sql.SparkSession

/** Extra benchmarks for optimization iteration — NOT part of the driver
  * contract (graft.Bench is the frozen harness; this main exists so a
  * round can isolate one expensive series without re-running the suite,
  * guide §1.4's noop-sink isolation discipline).
  *
  * Usage: runMain graft.tools.BenchExtra <mode> [rows]
  *   neardup   — the Bench near-dup single shot (runInMemory incl. exact
  *               dedup + MinHash/LSH + transitive closure) at `rows`
  *               (default 1,000,000), same session shape as Bench.
  *   minhash   — minHashPairs alone over the deterministic corpus at
  *               `rows` (default 1,000,000), noop sink, with the candidate
  *               diagnostics printed.
  * Prints one line per timed run: extra.<mode> rows=<n> sec=<s> [diag].
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("neardup")
    val rows = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$mode")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      mode match {
        case "neardup" =>
          val cfg = Some(graft.dedup.Dedup.MinHashConfig(threshold = 0.8))
          // JIT warm-up, then one timed shot — Bench's protocol
          graft.runner.Runner.runInMemory(spark, 50000L, partitions = cpus,
            includeDedup = true, nearDup = cfg)
          graft.util.Diag.clear()
          val t0 = System.nanoTime()
          val n = graft.runner.Runner.runInMemory(spark, rows,
            partitions = 4 * cpus, includeDedup = true, nearDup = cfg)
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"extra.neardup rows=$n sec=$sec%.1f tp=${n / sec}%.1f " +
            graft.util.Diag.snapshot().toSeq.sorted.mkString(" "))
        case "minhash" =>
          import org.apache.spark.sql.functions.{col, xxhash64}
          def shot(r: Long): Double = {
            val files = graft.corpus.CorpusGen
              .files(spark, r, partitions = 4 * cpus).toDF()
              .select(xxhash64(col("repo"), col("path"), col("commit"))
                .as("id"), col("content").as("text"))
            graft.util.Diag.clear()
            val t0 = System.nanoTime()
            graft.dedup.Dedup.minHashPairs(files, "id", "text",
              graft.dedup.Dedup.MinHashConfig(threshold = 0.8))
              .write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t0) / 1e9
            graft.util.Caches.release()
            sec
          }
          shot(50000L) // JIT warm-up
          val sec = shot(rows)
          println(f"extra.minhash rows=$rows sec=$sec%.1f " +
            graft.util.Diag.snapshot().toSeq.sorted.mkString(" "))
        case "passagededup" =>
          import org.apache.spark.sql.functions.{col, xxhash64}
          def shot(r: Long): Double = {
            val files = graft.corpus.CorpusGen
              .files(spark, r, partitions = 4 * cpus).toDF()
              .select(xxhash64(col("repo"), col("path"), col("commit"),
                col("content")).as("id"), col("content").as("text"))
            graft.util.Diag.clear()
            val t0 = System.nanoTime()
            graft.dedup.Dedup.passageDedup(files, "id", "text", k = 8)
              .write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t0) / 1e9
            graft.util.Caches.release()
            sec
          }
          shot(50000L) // JIT warm-up
          val sec = shot(rows)
          println(f"extra.passagededup rows=$rows sec=$sec%.1f " +
            f"tp=${rows / sec}%.1f " +
            graft.util.Diag.snapshot().toSeq.sorted.mkString(" "))
        case "paradedup" =>
          import org.apache.spark.sql.functions.{col, xxhash64}
          def shot(r: Long): Double = {
            val files = graft.corpus.CorpusGen
              .files(spark, r, partitions = 4 * cpus).toDF()
              .select(xxhash64(col("repo"), col("path"), col("commit"))
                .as("id"), col("content").as("text"))
            graft.util.Diag.clear()
            val t0 = System.nanoTime()
            graft.dedup.Dedup.paragraphDedup(files, "id", "text", sep = "\n")
              .write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t0) / 1e9
            graft.util.Caches.release()
            sec
          }
          shot(50000L) // JIT warm-up
          val sec = shot(rows)
          println(f"extra.paradedup rows=$rows sec=$sec%.1f " +
            f"tp=${rows / sec}%.1f " +
            graft.util.Diag.snapshot().toSeq.sorted.mkString(" "))
        case other =>
          System.err.println(
            s"unknown mode '$other' (neardup|minhash|passagededup|paradedup)")
          sys.exit(2)
      }
    } finally spark.stop()
  }
}
