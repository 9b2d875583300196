package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // crafted vectors: id 0 = query-like; 1 = same direction scaled;
  // 2 = slightly rotated; 3 = orthogonal; 4 = opposite
  val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(2.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.95f, 0.1f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f)))
  lazy val df = vecs.toDF("vec_id", "embedding")
  val query = Array(1.0d, 0.0d, 0.0d, 0.0d)

  test("brute-force cosine top-k: exact ranking, deterministic ties") {
    val top = Similarity.bruteForceTopK(df, "vec_id", "embedding", query, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // ids 0 and 1 are both cos=1.0 → tie broken by id asc
    assert(top.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(math.abs(top(0)._2 - 1.0) < 1e-9)
    assert(math.abs(top(1)._2 - 1.0) < 1e-9)
  }

  test("lsh top-k recalls the brute-force results on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", q, 10,
      bits = 16, hammingRadius = 8)
      .collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    info(f"lsh recall@10 = $recall%.2f")
    assert(lsh.contains(0L), "query vector itself must be found")
    assert(recall >= 0.5, s"recall $recall too low for radius=8/16 bits")
  }

  test("near-dup pairs: scaled copy found, orthogonal not; dim derived") {
    // dim intentionally NOT passed — must be derived from the data (a wrong
    // dim would zero every signature and cross-product the table)
    val pairs = Similarity.nearDupPairs(df, "vec_id", "embedding",
      threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ivf: clusters partition the data; topk recalls brute-force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(cents.length === 8 && cents.head.length === 64)
    val assigned = Similarity.withCluster(emb, "embedding", cents)
    assert(assigned.select("__cluster").distinct().count() > 1)
    assert(assigned.count() === emb.count())
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 10, cents,
      nprobe = 4).collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    info(f"ivf recall@10 (nprobe=4/8) = $recall%.2f")
    assert(ivf.contains(0L), "query's own vector must be found")
    assert(recall >= 0.5)
    // determinism: same centroids from a differently-partitioned frame
    val cents2 = Similarity.ivfCentroids(emb.repartition(7), "vec_id",
      "embedding", k = 8, iters = 2)
    assert(cents.map(_.toSeq).toSeq === cents2.map(_.toSeq).toSeq)
  }

  test("semDedup: groups collapse to the farthest-from-centroid member") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // plant 3-member semantic groups for ids 0..4: the original, an exact
    // copy, and a perturbed copy (cos ≈ 0.9998 — above eps, and with a
    // strictly different centroid cosine, so the representative rule is
    // genuinely exercised, not just the tiebreak)
    val planted = emb.filter(col("vec_id") < 5)
    val duped = emb
      .unionByName(planted.select((col("vec_id") + 1000).as("vec_id"),
        col("embedding")))
      .unionByName(planted.select((col("vec_id") + 2000).as("vec_id"),
        concat(array((element_at(col("embedding"), 1) + lit(0.02f))
          .cast("float")), slice(col("embedding"), 2, 63)).as("embedding")))
    val cents = Similarity.ivfCentroids(duped, "vec_id", "embedding",
      k = 4, iters = 2)
    val out = Similarity.semDedup(duped, "vec_id", "embedding", cents,
      eps = 0.995).collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getBoolean(4))).toMap
    graft.util.Caches.release()
    (0L until 5L).foreach { i =>
      val members = Seq(i, i + 1000, i + 2000)
      // all three share one group label = min id = i
      members.foreach { m =>
        assert(out(m)._1.contains(i), s"member $m of group $i")
      }
      // exactly one representative survives per group
      assert(members.count(m => out(m)._2) === 1, s"group $i")
    }
    // everything ungrouped is kept with a null label
    val ungrouped = out.filter { case (_, (lbl, _)) => lbl.isEmpty }
    assert(ungrouped.nonEmpty && ungrouped.values.forall(_._2))
    // the representative rule: argmin (cent_cos, id) — replay it from the
    // same centroids via an independent per-member centroid cosine
    val cc = Similarity.withCluster(duped, "embedding", cents)
      .withColumn("cent_cos",
        Similarity.centroidCosine(col("embedding"), cents))
      .select("vec_id", "cent_cos").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0L until 5L).foreach { i =>
      val members = Seq(i, i + 1000, i + 2000)
      val expectedRep = members.minBy(m => (cc(m), m))
      assert(out(expectedRep)._2 === true, s"group $i rep $expectedRep")
    }
    // deterministic at any input layout
    val re = Similarity.semDedup(duped.repartition(7, col("vec_id")),
      "vec_id", "embedding", cents, eps = 0.995).collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getBoolean(4))).toMap
    graft.util.Caches.release()
    assert(re === out)
  }

  test("cosine column matches plain-Scala computation on real data") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val q = emb.head._2
    val sparkScores = Similarity.bruteForceTopK(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
      "vec_id", "embedding", q, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    emb.foreach { case (id, v) =>
      val dot = v.zip(q).map { case (a, b) => a * b }.sum
      val expected = dot / (math.sqrt(v.map(x => x * x).sum) *
        math.sqrt(q.map(x => x * x).sum))
      assert(math.abs(sparkScores(id) - expected) < 1e-9, s"id=$id")
    }
  }
}
