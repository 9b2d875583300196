package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 32
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

    // q_code_clones decomposition
    val files = time("corpus gen + select") {
      val f = graft.corpus.CorpusGen.files(spark, 3000L).toDF()
        .select(xxhash64(col("repo"), col("path"), col("commit")).as("fid"),
          col("content"))
      f.write.format("noop").mode("overwrite").save(); f
    }
    val fps = graft.text.TextAnalysis.fingerprints(files, "fid", "content")
    time("fingerprints -> noop") {
      fps.write.format("noop").mode("overwrite").save()
    }
    val posts = fps.select(col("fid"), explode(col("fingerprints")).as("fp"))
      .distinct()
    time("posts distinct count") { println(posts.count()) }
    val aux = "/tmp/scratch_clone_posts"
    time("posts coalesce(1) write") {
      posts.coalesce(1).write.mode("overwrite").parquet(aux)
    }
    val back = spark.read.parquet(aux).select(col("fid").as("id"), col("fp"))
    time("clonePairsFromPosts + orderBy -> noop") {
      graft.dedup.Dedup.clonePairsFromPosts(back, minShared = 10,
        maxPostings = 100)
        .orderBy("id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
      graft.util.Caches.release()
    }
    time("second full run") {
      posts.coalesce(1).write.mode("overwrite").parquet(aux)
      graft.dedup.Dedup.clonePairsFromPosts(
        spark.read.parquet(aux).select(col("fid").as("id"), col("fp")),
        minShared = 10, maxPostings = 100)
        .orderBy("id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
      graft.util.Caches.release()
    }
    spark.stop()
  }
}
