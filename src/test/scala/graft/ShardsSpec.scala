package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ShardsSpec extends SparkSpec {
  import spark.implicits._

  private val S = 4000L

  private def docs(n: Int) =
    (0 until n).map { i =>
      (i.toLong, "x" * ((i * 37) % 500 + 1))
    }.toDF("doc_id", "text").withColumn("n_chars", length(col("text")))

  private def direct(n: Int): Map[Long, Long] = {
    // the rule as ONE global window — the semantics the bucketed plan
    // must reproduce exactly
    val h = graft.sampling.Sampling.sampleHash(7L, Seq(col("doc_id")))
    docs(n).withColumn("__h", h)
      .withColumn("__c", coalesce(sum(col("n_chars")).over(
        Window.orderBy(col("__h").asc, col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), expr(s"__c div ${S}L").as("shard_id"))
      .as[(Long, Long)].collect().toMap
  }

  private def assigned(n: Int, parts: Int): Map[Long, Long] = {
    val out = graft.output.Shards.assignShards(docs(n).repartition(parts),
      shardBytes = S, weight = col("n_chars"), tieCols = Seq("doc_id"),
      seed = 7L)
      .select(col("doc_id"), col("shard_id"))
      .as[(Long, Long)].collect().toMap
    graft.util.Caches.release()
    out
  }

  test("bucketed shard assignment equals the single-global-window rule") {
    assert(assigned(800, 4) === direct(800))
  }

  test("shard assignment is partition-layout independent") {
    assert(assigned(500, 1) === assigned(500, 13))
  }

  test("shards are byte-balanced within one row of the target") {
    val n = 800
    val byShard = assigned(n, 4).toSeq
      .map { case (id, sh) => (sh, ((id * 37) % 500 + 1)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val maxW = 500L
    val last = byShard.keys.max
    assert(byShard.keys.toSeq.sorted === (0L to last)) // contiguous ids
    byShard.foreach { case (sh, bytes) =>
      if (sh != last)
        assert(math.abs(bytes - S) < maxW,
          s"shard $sh holds $bytes bytes, target $S ± <$maxW")
      else assert(bytes <= S + maxW)
    }
  }

  // ---- training-sequence packing (concat-and-chunk) ----------------------

  private val B = 512L

  private def tokDocs(n: Int) =
    (0 until n).map { i =>
      // token counts 0..~900 incl. planted zeros (i%41==0) and
      // budget-straddlers (> B, spanning 2-3 sequences)
      val t = if (i % 41 == 0) 0L else ((i * 97) % 900 + 1).toLong
      (i.toLong, t)
    }.toDF("doc_id", "n_tok")

  private def packed(n: Int, parts: Int) = {
    val out = graft.output.Shards.packSequences(tokDocs(n).repartition(parts),
      budgetTokens = B, tokenCount = col("n_tok"), tieCols = Seq("doc_id"),
      seed = 11L)
      .select(col("doc_id"), col("seq_id"), col("n_tokens"),
        col("tok_start"), col("seq_off"), col("n_in_seq"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    graft.util.Caches.release()
    out
  }

  test("packSequences: spans tile each doc and fill every sequence exactly") {
    val n = 700
    val rows = packed(n, 4)
    val byDoc = rows.groupBy(_._1)
    // zero-token docs emit nothing; every other doc appears
    val expectTok = (0 until n).map(i =>
      i.toLong -> (if (i % 41 == 0) 0L else ((i * 97) % 900 + 1).toLong)).toMap
    assert(byDoc.keySet === expectTok.filter(_._2 > 0).keySet)
    byDoc.foreach { case (id, spans) =>
      val tok = expectTok(id)
      assert(spans.forall(_._3 == tok), s"doc $id n_tokens mismatch")
      // spans tile [0, tok): contiguous tok_starts, lengths sum to tok
      assert(spans.map(_._6).sum === tok, s"doc $id spans do not sum")
      val sorted = spans.sortBy(_._4)
      assert(sorted.head._4 === 0L)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 + a._6 === b._4, s"doc $id gap")
        case _ =>
      }
      // consecutive sequence ids, in-bounds offsets
      assert(sorted.map(_._2) === (sorted.head._2 to sorted.last._2))
      sorted.foreach { sp =>
        assert(sp._5 >= 0 && sp._5 + sp._6 <= B, s"doc $id overflows seq")
      }
    }
    // every sequence except the LAST is exactly full; offsets tile [0, B)
    val bySeq = rows.groupBy(_._2)
    val lastSeq = bySeq.keys.max
    assert(bySeq.keys.toSeq.sorted === (0L to lastSeq))
    bySeq.foreach { case (sq, spans) =>
      val filled = spans.map(_._6).sum
      if (sq != lastSeq) assert(filled === B, s"seq $sq holds $filled")
      else assert(filled <= B)
      val sorted = spans.sortBy(_._5)
      assert(sorted.head._5 === 0L)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._5 + a._6 === b._5, s"seq $sq gap")
        case _ =>
      }
    }
  }

  test("packSequences is partition-layout independent") {
    assert(packed(400, 1) === packed(400, 13))
  }

  test("writeShards: partitioned layout round-trips; content shuffles once") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def shuffleOutputs(p: SparkPlan): Seq[Seq[String]] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      def walk(pl: SparkPlan): Unit = pl.foreach {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          walk(r.child)
        case s: ShuffleExchangeLike => buf += s.output.map(_.name).toSeq
        case im: InMemoryTableScanExec => walk(im.relation.cachedPlan)
        case _ =>
      }
      walk(p)
      buf.toSeq
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_shards")
      .resolve("out").toString
    val in = docs(300)
    val summary = graft.output.Shards.writeShards(in, dir, shardBytes = S,
      weight = col("n_chars"), tieCols = Seq("doc_id"), seed = 7L)
      .as[(Long, Long, Long)].collect()
    // layout: hive-style shard_id=K directories
    val back = spark.read.parquet(dir)
    assert(back.count() === 300)
    assert(back.select("shard_id").distinct().count() === summary.length)
    // every input row survives byte-identically with its assignment
    val inRows = in.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    val backRows = back.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    assert(backRows === inRows)
    // summary n_bytes reconciles with the weights
    assert(summary.map(_._3).sum ===
      (0 until 300).map(i => ((i * 37) % 500 + 1).toLong).sum)
    // the assignment plan moves content over exactly ONE shuffle (the
    // bucket window); the prefix-sum machinery is slim
    val plan = graft.output.Shards.assignShards(in, S, col("n_chars"),
      Seq("doc_id"), seed = 7L)
    plan.collect()
    val carryingText = shuffleOutputs(plan.queryExecution.executedPlan)
      .count(_.contains("text"))
    graft.util.Caches.release()
    assert(carryingText === 1,
      s"content crossed $carryingText shuffles, expected 1")
  }
}
