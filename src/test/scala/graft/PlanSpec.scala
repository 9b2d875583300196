package graft

import graft.checks.Checks
import graft.model._
import org.apache.spark.sql.DataFrame

/** explain()-level assertions: the scale claims in COVERAGE.md §2.3 as
  * executable checks — filters reach the parquet scan, join strategy
  * hints are honored, projections prune columns, hot paths stay inside
  * whole-stage codegen.
  */
class PlanSpec extends SparkSpec {

  private def tbl(name: String): DataFrame =
    spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("FK key guard pushes down to the parquet scan as IsNotNull") {
    val p = Checks.fk(
      FkRule("f", "lineitem", Seq("l_orderkey"), "orders", Seq("o_orderkey")),
      tbl("lineitem"), tbl("orders"))
    val s = plan(p.violations)
    assert(s.contains("PushedFilters: [IsNotNull(l_orderkey)]"),
      s"guard not pushed:\n$s")
  }

  test("FK father defaults to shuffle-hash; broadcastFather=Y broadcasts") {
    val rule = FkRule("f", "lineitem", Seq("l_orderkey"), "orders",
      Seq("o_orderkey"))
    val shuffled = plan(Checks.fk(rule, tbl("lineitem"), tbl("orders")).violations)
    assert(shuffled.contains("ShuffledHashJoin") &&
      shuffled.contains("LeftAnti"), s"expected shuffle-hash anti join:\n$shuffled")
    val bcast = plan(Checks.fk(rule.copy(broadcastFather = true),
      tbl("lineitem"), tbl("orders")).violations)
    assert(bcast.contains("BroadcastHashJoin") && bcast.contains("LeftAnti"),
      s"expected broadcast anti join:\n$bcast")
  }

  test("PC code-table dimension is always a broadcast anti-join") {
    val p = Checks.codeTable(
      CodeTableRule("p", "customer", Seq("c_nationkey"), "nation",
        Seq("n_nationkey")),
      tbl("customer"), tbl("nation"))
    assert(plan(p.violations).contains("BroadcastHashJoin"))
  }

  test("column pruning: the scan reads only what the query aggregates") {
    // select(doc_id, text).groupBy(text) — Catalyst prunes doc_id too:
    // the scan must read exactly struct<text>
    val s = plan(tbl("documents").select("doc_id", "text")
      .groupBy("text").count())
    val scanLine = s.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("ReadSchema: struct<text:string>"),
      s"unpruned scan: $scanLine")
  }

  test("text-quality metrics stay inside whole-stage codegen (no UDF)") {
    val df = tbl("documents").select(
      graft.text.TextAnalysis.wsTokenCount(org.apache.spark.sql.functions.col("text")))
    val s = plan(df)
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(s.contains("*(1)"), s"no codegen span:\n$s")
    assert(!s.contains("BatchEvalPython") && !s.toLowerCase.contains("scalaudf"),
      s"UDF leaked into the hot path:\n$s")
  }

  test("ingest transforms are map-side: no Exchange, no UDF") {
    import spark.implicits._
    val files = Seq(
      graft.model.FileRow("r", "a/x.ipynb", "c", "", "{}"),
      graft.model.FileRow("r", "a/y.py", "c", "", "print(1)")).toDS()
    val s1 = plan(graft.filter.QualityPipeline.convertNotebooks(files).toDF())
    assert(!s1.contains("Exchange"), s"notebook conversion shuffled:\n$s1")
    assert(!s1.contains("BatchEvalPython") && !s1.toLowerCase.contains("scalaudf"),
      s"UDF in the conversion path:\n$s1")
    val s2 = plan(graft.filter.QualityPipeline.backfillLanguages(files).toDF())
    assert(!s2.contains("Exchange"), s"lang backfill shuffled:\n$s2")
    assert(!s2.contains("BatchEvalPython") && !s2.toLowerCase.contains("scalaudf"),
      s"UDF in the backfill path:\n$s2")
  }

  test("hashRateSample is map-side: a pure filter, no Exchange in the plan") {
    import org.apache.spark.sql.functions.col
    val s = plan(graft.sampling.Sampling.hashRateSample(
      tbl("documents"), 0.3, seed = 7L, col("doc_id")))
    assert(!s.contains("Exchange"), s"sampling predicate shuffled:\n$s")
    assert(s.contains("Filter"), s"no filter in plan:\n$s")
  }

  test("decontamination probes via broadcast; corpus side never broadcasts") {
    import org.apache.spark.sql.functions.col
    val docs = tbl("documents").select(col("doc_id"), col("text"))
    val s = plan(graft.text.Decontaminate.contaminationFlags(
      docs, "doc_id", "text", docs.filter(col("doc_id") % 50 === 0), "text"))
    // the benchmark shingle set is the build side of a broadcast semi-join
    assert(s.contains("BroadcastHashJoin") && s.contains("LeftSemi"),
      s"benchmark shingles not broadcast:\n$s")
  }

  test("band self-joins honor the merge hint (never a static broadcast)") {
    import org.apache.spark.sql.functions.col
    // a range-derived frame reports tiny leaf stats — exactly the shape
    // that once made the planner broadcast a data-sized self-join side
    val docs = spark.range(500).selectExpr("id",
      "repeat(concat('word', cast(id % 7 as string), ' '), 30) as text")
    val s = plan(graft.dedup.Dedup.minHashPairs(docs, "id", "text"))
    assert(s.contains("SortMergeJoin"),
      s"band self-join lost its merge hint:\n$s")
  }

  test("clone-pair candidates come from ONE grouping pass (no postings " +
    "self-join), never a cartesian") {
    import org.apache.spark.sql.functions.col
    // the r6 clone/fork shape: postings are singleton-dominated, so the
    // grouping pass (collect_list bounded by maxPostings) replaces the
    // merge self-join — pin that it stays a grouping pass and that no
    // static broadcast/cartesian sneaks in over the data-sized frame
    val posts = spark.range(2000).selectExpr("id % 400 as id",
      "cast(id % 700 as long) as fp")
    val s = plan(graft.dedup.Dedup.clonePairsFromPosts(posts, minShared = 2))
    assert(s.contains("collect_list"),
      s"clone grouping pass missing (self-join resurrected?):\n$s")
    assert(!s.contains("CartesianProduct"), s"cartesian in clone plan:\n$s")
    graft.util.Caches.release()
  }

  test("chunkByLines is map-side: no Exchange anywhere in the plan") {
    val s = plan(graft.text.TextAnalysis.chunkByLines(
      tbl("documents"), "doc_id", "text", budgetChars = 200))
    assert(!s.contains("Exchange"), s"chunker shuffled:\n$s")
  }

  test("paragraph dedup: no shuffle carries paragraph text") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // collect every shuffle's output attributes, descending through AQE
    // wrappers AND into cached-frame plans (the builder materializes its
    // key frames behind InMemoryTableScan, which hides their shuffles
    // from a plain plan walk)
    def shuffleOutputs(p: SparkPlan): Seq[Seq[String]] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      def walk(pl: SparkPlan): Unit = pl.foreach {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan) // materialized AQE stages are leaves wrapping the exchange
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          walk(r.child)
        case s: ShuffleExchangeLike => buf += s.output.map(_.name).toSeq
        case im: InMemoryTableScanExec => walk(im.relation.cachedPlan)
        case _ =>
      }
      walk(p)
      buf.toSeq
    }
    import org.apache.spark.sql.functions.{col, concat, lit}
    // plant a shared paragraph: with no duplicates at all, AQE's
    // empty-relation propagation would erase the join and its shuffles
    val docs = tbl("documents").select(col("doc_id"),
      concat(col("text"), lit("\n\nshared footer")).as("text"))
    val out = graft.dedup.Dedup.paragraphDedup(docs, "doc_id", "text")
    out.collect() // AQE finalizes plans (and the builder picks its joins)
    val shuffled = shuffleOutputs(out.queryExecution.executedPlan)
    // every shuffle must move only ids/positions/hashes — a 'text' or
    // raw-paragraph attribute in a shuffle output means document content
    // went over the wire
    assert(shuffled.nonEmpty, "expected at least the winner aggregation shuffle")
    val leaked = shuffled.filter(_.exists(n => n == "text" || n == "__p"))
    assert(leaked.isEmpty, s"content shuffled: $leaked")
    graft.util.Caches.release()
  }

  test("rankInStratum: windows partition by (stratum, bucket); offsets broadcast") {
    import org.apache.spark.sql.functions.col
    val out = graft.sampling.Sampling.rankInStratum(
      tbl("documents"), Seq("lang"), col("n_chars").cast("double"),
      Seq("doc_id"))
    val s = plan(out)
    // the expensive row_number window must include the range bucket in its
    // partition spec — a stratum-only spec is the one-reducer-per-language
    // plan the decomposition exists to avoid
    val rnLines = s.linesIterator.filter(_.contains("row_number()")).toSeq
    assert(rnLines.nonEmpty, s"no row_number window in plan:\n$s")
    rnLines.foreach { l =>
      assert(l.contains("__bk"), s"window not bucket-partitioned: $l")
    }
    // the per-bucket offsets frame joins back as a broadcast
    assert(s.contains("BroadcastHashJoin"), s"offsets not broadcast:\n$s")
    graft.util.Caches.release()
  }

  test("semDedup: cluster self-join is sort-merge, never a cartesian") {
    import org.apache.spark.sql.functions.col
    val emb = tbl("embeddings").select(col("vec_id"), col("embedding"))
    val cents = graft.similarity.Similarity.ivfCentroids(
      emb, "vec_id", "embedding", k = 4, iters = 1)
    val out = graft.similarity.Similarity.semDedup(
      emb, "vec_id", "embedding", cents, eps = 0.995)
    val s = plan(out)
    assert(!s.contains("CartesianProduct"), s"cartesian in semDedup:\n$s")
    graft.util.Caches.release()
  }

  test("boilerplate removal is map-side: no Exchange in the rewrite plan") {
    val s = plan(graft.text.Boilerplate.removeLines(
      tbl("documents"), "doc_id", "text", Seq("a shared line")))
    assert(!s.contains("Exchange"), s"removal shuffled:\n$s")
  }

  test("fused batch counts: one plan, no cartesian beyond 1-row scalars") {
    val rules = Vector[Rule](
      PkRule("pk", "orders", Seq("o_custkey")),
      DomainRule("vc", "orders", "o_orderstatus", Set("O", "F")))
    val fusedBranches = rules.map(r =>
      graft.runner.CheckRunner.compile(r, _ => tbl("orders")))
    val union = fusedBranches.map(_.countsDf).reduce(_ unionByName _)
    val s = plan(union)
    assert(s.contains("Union"), s"expected a union of count branches:\n$s")
    assert(!s.contains("CartesianProduct"),
      s"unexpected cartesian in fused counts:\n$s")
  }
}
