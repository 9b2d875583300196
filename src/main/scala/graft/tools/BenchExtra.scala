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
        case "incprobe" =>
          // decompose q_dedup_incremental's timed path: batch construction
          // alone, then the full probe, over the same sf fixture shape
          import org.apache.spark.sql.functions._
          val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
            "/root/testdata/sf0.1")
          val docs = spark.read.parquet(s"$sfDir/documents.parquet")
            .select(col("doc_id").cast("long").as("id"), col("text"))
          val idxDir = "/tmp/graft_extra_inc_index"
          graft.dedup.Incremental.writeIndex(docs, "id", "text", idxDir)
          val fresh = concat_ws(" ",
            sha2(col("text").cast("binary"), 256),
            sha2(concat(col("text"), lit("x")).cast("binary"), 256),
            sha2(concat(col("text"), lit("y")).cast("binary"), 256),
            sha2(concat(col("text"), lit("z")).cast("binary"), 256))
          def batch = docs.filter(col("id") % 3 === 0)
            .select((col("id") + 1000000L).as("id"), col("text"))
            .unionByName(docs.filter(col("id") % 3 === 1)
              .select((col("id") + 2000000L).as("id"),
                concat(col("text"), lit("\n\n")).as("text")))
            .unionByName(docs.filter(col("id") % 3 === 2)
              .select((col("id") + 3000000L).as("id"), fresh.as("text")))
          def timed(label: String)(body: => Unit): Unit = {
            val t0 = System.nanoTime()
            body
            println(f"extra.incprobe.$label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
            graft.util.Caches.release()
          }
          // warm-up
          graft.dedup.Incremental.probe(batch, "id", "text", idxDir)
            .write.format("noop").mode("overwrite").save()
          graft.util.Caches.release()
          timed("batch_noop") {
            batch.write.format("noop").mode("overwrite").save()
          }
          timed("probe_full") {
            graft.dedup.Incremental.probe(batch, "id", "text", idxDir)
              .write.format("noop").mode("overwrite").save()
          }
          timed("probe_full2") {
            graft.dedup.Incremental.probe(batch, "id", "text", idxDir)
              .write.format("noop").mode("overwrite").save()
          }
        case other =>
          System.err.println(
            s"unknown mode '$other' (neardup|minhash|passagededup|paradedup|incprobe)")
          sys.exit(2)
      }
    } finally spark.stop()
  }
}
