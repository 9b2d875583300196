package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions.col

/** IVF as a storage layout: writeClustered partitions the table by
  * nearest-centroid assignment, so a probe prunes partition DIRECTORIES —
  * the 100 TB path where nprobe/k of the data is read before any file
  * opens. Asserts both the physical layout and the plan-level pruning,
  * plus result equality with the in-memory IVF path.
  */
class IvfLayoutSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("writeClustered + probe: directory pruning, results match ivfTopK") {
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding",
      k = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.writeClustered(emb, "vec_id", "embedding", cents, dir)

    // physical layout: one hive partition directory per non-empty cluster
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__cluster="))
    assert(parts.length > 2, s"expected several cluster dirs, got ${parts.length}")

    val q = emb.filter(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val nprobe = 3
    val fromLayout = Similarity.ivfTopKFromLayout(spark, dir, "vec_id",
      "embedding", q, 10, cents, nprobe)

    // the cluster filter must prune at the PARTITION level, not per-row:
    // the PartitionFilters bracket itself must carry the __cluster
    // predicate (an empty "PartitionFilters: []" with the filter applied
    // post-scan must FAIL here)
    val plan = fromLayout.queryExecution.executedPlan.toString
    val partFilter = "PartitionFilters: \\[[^\\]]*__cluster[^\\]]*\\]".r
    assert(partFilter.findFirstIn(plan).isDefined,
      s"__cluster not in PartitionFilters — pruning lost:\n$plan")

    val a = fromLayout.collect().map(r => (r.getLong(0),
      math.rint(r.getDouble(1) * 1e6))).toSeq
    val b = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 10, cents, nprobe)
      .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e6))).toSeq
    assert(a === b, "layout-backed IVF must equal the in-memory IVF")

    // and the layout is genuinely wider than a probe: the unfiltered
    // table holds more clusters than nprobe, so the pruned scan reads a
    // strict subset of the directories
    val allClusters = spark.read.parquet(dir)
      .select("__cluster").distinct().count()
    assert(allClusters > nprobe,
      s"layout must span more clusters ($allClusters) than nprobe=$nprobe")
  }
}
