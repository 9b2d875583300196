package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** The codegen vector kernels ([[graft.functions.VecKernel]] family) must
  * be BIT-identical to the interpreted higher-order-function Column chains
  * they replaced — the similarity oracles (q_ann_*, q_semdedup,
  * q_embed_neardup) and the memoized IVF centroids all depend on exact
  * doubles. Fuzz includes the guard edges: zero vectors (denom==0 → −1),
  * NaN elements (nanvl → −1), and exact ties (lowest-index argmin).
  */
class VecKernelSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new java.util.SplittableRandom(20260819L)
  private val dim = 16

  /** Random float vectors with planted edges: every 17th all-zero, every
    * 23rd carries a NaN element, every 11th duplicates the previous row.
    */
  private lazy val vecs: org.apache.spark.sql.DataFrame = {
    var prev: Array[Float] = Array.fill(dim)(0f)
    (0L until 600L).map { i =>
      val v =
        if (i % 17 == 0) Array.fill(dim)(0f)
        else if (i % 11 == 0) prev.clone()
        else {
          val a = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
          if (i % 23 == 0) a(rnd.nextInt(dim)) = Float.NaN
          a
        }
      prev = v
      (i, v.toSeq)
    }.toDF("id", "v").repartition(7)
  }

  private def bits(d: Any): Any = d match {
    case x: Double => java.lang.Double.doubleToRawLongBits(x)
    case other => other
  }

  private def assertColumnsBitEqual(kernel: org.apache.spark.sql.Column,
      hof: org.apache.spark.sql.Column): Unit = {
    val rows = vecs.select(col("id"), kernel.as("k"), hof.as("h"))
      .collect()
    assert(rows.length === 600)
    rows.foreach { r =>
      val k = if (r.isNullAt(1)) null else bits(r.get(1))
      val h = if (r.isNullAt(2)) null else bits(r.get(2))
      assert(k === h, s"id=${r.getLong(0)}")
    }
  }

  private lazy val query: Array[Double] =
    Array.fill(dim)(rnd.nextDouble() * 2 - 1)

  private lazy val centroids: Array[Array[Double]] =
    Array.fill(5)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))

  test("vec_cosine_lit ≡ HOF cosine against a literal (bit-equal, guards incl.)") {
    assertColumnsBitEqual(
      graft.functions.expressions.vec_cosine_lit(col("v"), query),
      Similarity.cosineHof(col("v"), typedlit(query.toSeq)))
  }

  test("vec_cosine ≡ HOF cosine between two columns (self-pairing: planted " +
    "duplicates hit cos=1 exactly)") {
    val shifted = vecs.select((col("id") + 1).as("id"), col("v").as("w"))
    val paired = vecs.join(shifted, "id")
    val rows = paired.select(col("id"),
      graft.functions.expressions.vec_cosine(col("v"), col("w")).as("k"),
      Similarity.cosineHof(col("v"), col("w")).as("h")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = if (r.isNullAt(1)) null else bits(r.get(1))
      val h = if (r.isNullAt(2)) null else bits(r.get(2))
      assert(k === h, s"id=${r.getLong(0)}")
    }
  }

  test("vec_dot_lit ≡ HOF dot against every LSH plane") {
    val planes = Similarity.hyperplanes(dim, 8)
    planes.foreach { p =>
      assertColumnsBitEqual(
        graft.functions.expressions.vec_dot_lit(col("v"), p),
        aggregate(zip_with(transform(col("v"), _.cast("double")),
          typedlit(p.toSeq), (x, y) => x * y), lit(0.0d), (acc, x) => acc + x))
    }
  }

  test("vec_nearest_centroid ≡ HOF struct/array_min argmin (ties → lowest " +
    "index; NaN rows excluded — the HOF chain accidentally mapped them to 0)") {
    // duplicate centroid 1 at index 3: rows nearest to it TIE exactly and
    // must resolve to index 1 on both paths
    val cents = centroids.updated(3, centroids(1).clone())
    val clean = vecs.filter(not(exists(col("v"), x => isnan(x))))
    val rows = clean.select(col("id"),
      graft.functions.expressions.vec_nearest_centroid(col("v"), cents).as("k"),
      Similarity.nearestCentroidHof(col("v"), cents).as("h")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.get(1) === r.get(2), s"id=${r.getLong(0)}"))
    assert(rows.forall(_.getInt(1) != 3)) // the tie never picks the copy
  }

  test("vec_centroid_cosine ≡ HOF centroid cosine") {
    val clean = vecs.filter(not(exists(col("v"), x => isnan(x))))
    val rows = clean.select(col("id"),
      graft.functions.expressions.vec_centroid_cosine(col("v"), centroids).as("k"),
      Similarity.centroidCosineHof(col("v"), centroids).as("h")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = if (r.isNullAt(1)) null else bits(r.get(1))
      val h = if (r.isNullAt(2)) null else bits(r.get(2))
      assert(k === h, s"id=${r.getLong(0)}")
    }
  }

  test("kernels run inside whole-stage codegen (the HOF chain could not)") {
    // a parquet scan (not a LocalTableScan) so the executed plan shows the
    // "*(n)" codegen-span markers PlanSpec keys on
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(
        graft.functions.expressions
          .vec_cosine_lit(col("embedding"), Array.fill(64)(0.1)).as("s"),
        graft.functions.expressions
          .vec_nearest_centroid(col("embedding"),
            Array.fill(4)(Array.fill(64)(0.2))).as("c"))
    val plan = emb.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no codegen span:\n${plan.take(2000)}")
  }

  test("double-element arrays and length mismatches: kernel ≡ HOF") {
    // the embeddings are float, but derived frames (asDouble casts,
    // centroid dumps) carry array<double> — and a dim-mismatched vector
    // must yield NULL on both paths (zip_with pads with null)
    val dd = (0L until 100L).map { i =>
      val n = if (i % 13 == 0) dim - 1 else dim // planted mismatches
      (i, Array.fill(n)(rnd.nextDouble() * 2 - 1).toSeq)
    }.toDF("id", "v")
    val rows = dd.select(col("id"),
      graft.functions.expressions.vec_cosine_lit(col("v"), query).as("k"),
      Similarity.cosineHof(col("v"), typedlit(query.toSeq)).as("h")).collect()
    assert(rows.length === 100)
    rows.foreach { r =>
      val k = if (r.isNullAt(1)) null else bits(r.get(1))
      val h = if (r.isNullAt(2)) null else bits(r.get(2))
      assert(k === h, s"id=${r.getLong(0)}")
    }
    assert(rows.count(_.isNullAt(1)) === 8) // every planted mismatch is null
  }

  test("interpreted eval ≡ codegen eval (a filter forces the interpreted " +
    "path through Predicate fallback scenarios via collect on a non-codegen " +
    "context)") {
    // direct Expression eval (no codegen): build a row and call eval
    import org.apache.spark.sql.catalyst.util.ArrayData
    val v = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val arr = ArrayData.toArrayData(v)
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      v.toSeq, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))
    val viaEval = graft.functions.VecCosineLit(lit, query).eval(null)
    val viaDf = Seq(Tuple1(v.toSeq)).toDF("v")
      .select(graft.functions.expressions.vec_cosine_lit(col("v"), query))
      .head().getDouble(0)
    assert(bits(viaEval) === bits(viaDf))
    assert(arr.numElements() === dim)
  }
}
