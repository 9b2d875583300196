package graft

import graft.sampling.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = (1L to 4000L).map { i =>
    (i, s"repo${i % 37}", if (i % 5 == 0) "py" else if (i % 3 == 0) "go" else "sc")
  }.toDF("id", "repo", "lang")

  test("hashRateSample: partition-layout independent, rate within binomial bounds") {
    val a = Sampling.hashRateSample(docs, 0.3, seed = 7L, col("id"))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.hashRateSample(docs.repartition(13, col("lang")), 0.3,
      seed = 7L, col("id"))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b) // identical subset at any layout
    // 4000 Bernoulli(0.3) draws: mean 1200, sd ~29 — 6 sd ≈ ±174
    assert(math.abs(a.size - 1200) < 175, s"selected ${a.size}")
    // different seed = a genuinely different subset
    val c = Sampling.hashRateSample(docs, 0.3, seed = 8L, col("id"))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(c !== a)
  }

  test("hashRateSample keyed by repo keeps or drops whole repos together") {
    val kept = Sampling.hashRateSample(docs, 0.4, seed = 1L, col("repo"))
      .select("repo", "id").collect().map(r => r.getString(0)).toSet
    val all = docs.select("repo").distinct().collect().map(_.getString(0)).toSet
    // every kept repo is COMPLETE: its row count matches the full corpus
    val keptCounts = Sampling.hashRateSample(docs, 0.4, seed = 1L, col("repo"))
      .groupBy("repo").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fullCounts = docs.groupBy("repo").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    keptCounts.foreach { case (repo, n) => assert(n === fullCounts(repo), repo) }
    assert(kept.nonEmpty && kept.size < all.size)
  }

  test("quotaPerStratum: exact quota, deterministic, optimizer group-limit fires") {
    val q = Sampling.quotaPerStratum(docs, Seq("lang"), k = 50, Seq("id"))
    val counts = q.groupBy("lang").count().collect()
      .map(r => r.getString(r.fieldIndex("lang")) -> r.getLong(r.fieldIndex("count"))).toMap
    assert(counts.values.forall(_ == 50L)) // every stratum larger than k
    // small stratum: quota larger than the stratum keeps everything
    val tiny = Sampling.quotaPerStratum(docs.filter(col("id") <= 10),
      Seq("lang"), k = 50, Seq("id"))
    assert(tiny.count() === 10L)
    // the selection is the documented direct hash-order window — the
    // implementation must not change WHICH rows are chosen
    val h = Sampling.sampleHash(42L, Seq(col("id")))
    val direct = docs.withColumn("__h", h)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("__h").asc, col("id").asc)))
      .filter(col("__rn") <= 50).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val chosen = q.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(chosen === direct)
    // and is independent of the input partitioning
    val reparted = Sampling.quotaPerStratum(docs.repartition(17),
      Seq("lang"), k = 50, Seq("id")).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(reparted === direct)
    // the skew defense is Catalyst's InferWindowGroupLimit (SPARK-37099):
    // a PARTIAL WindowGroupLimit must sit below the exchange so every map
    // partition forwards at most k rows per stratum — pin it in the plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"expected a partial WindowGroupLimit in:\n$plan")
  }

  test("tokenBudgetSample: bucketed prefix == direct window, budget holds") {
    val weighted = docs.withColumn("w", (col("id") % 40 + 5).cast("long"))
    val budget = 600L
    val out = Sampling.tokenBudgetSample(weighted, Seq("lang"), budget,
      col("w"), Seq("id"), seed = 5L)
    // the range-bucketed distributed prefix sum must pick the EXACT rows
    // the direct single-window rule picks
    val h = Sampling.sampleHash(5L, Seq(col("id")))
    val direct = weighted.withColumn("__h", h)
      .withColumn("__c", coalesce(sum(col("w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("__h").asc, col("id").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .filter(col("__c") < budget).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val got = out.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === direct)
    // per-stratum totals: >= budget coverage intent, <= budget + max row
    val totals = out.groupBy("lang").agg(sum("w").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals.values.forall(t => t < budget + 45 && t > 0))
    assert(totals.keySet === Set("py", "go", "sc"), "every stratum sampled")
    // partition-layout independence
    val re = Sampling.tokenBudgetSample(weighted.repartition(17, col("repo")),
      Seq("lang"), budget, col("w"), Seq("id"), seed = 5L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(re === direct)
  }

  test("tokenBudgetSample: a NULL stratum is a real group with its own budget") {
    // rows with a missing language tag must not silently vanish (the
    // offsets join is null-safe) — they form their own stratum
    val weighted = docs
      .withColumn("lang", when(col("id") % 4 =!= 0, col("lang"))) // 1/4 NULL
      .withColumn("w", (col("id") % 40 + 5).cast("long"))
    val out = Sampling.tokenBudgetSample(weighted, Seq("lang"), 600L,
      col("w"), Seq("id"), seed = 5L)
    val byLang = out.groupBy("lang").agg(sum("w").as("t")).collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byLang.contains(None), "NULL stratum sampled")
    assert(byLang.values.forall(t => t > 0 && t < 600L + 45))
    assert(byLang.keySet.flatten === Set("py", "go", "sc"))
  }

  test("rankInStratum: bucketed rank == direct global window, any layout") {
    // duplicate values, negatives, and a skewed stratum — the shapes that
    // stress the monotone-bucket decomposition and its tie handling
    val vals = docs.withColumn("v",
      (pmod(col("id"), lit(97)) - 40).cast("double") / 7.0)
    val direct = vals.withColumn("__rk", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
        .orderBy(col("v").asc, col("id").asc)) - 1)
      .select("id", "__rk").collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong)).toMap
    val got = Sampling.rankInStratum(vals, Seq("lang"), col("v"), Seq("id"))
    val gotMap = got.select("id", "rank_in_stratum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotMap === direct)
    // stratum sizes are exact
    val ns = got.groupBy("lang").agg(max("rank_in_stratum").as("mx"),
      min("n_in_stratum").as("n"), count(lit(1)).as("c")).collect()
    ns.foreach { r => // row = (lang, mx, n, c)
      assert(r.getLong(2) === r.getLong(3), r.getString(0)) // n == count
      assert(r.getLong(1) === r.getLong(3) - 1, r.getString(0)) // max rank
    }
    // partition-layout independence
    val re = Sampling.rankInStratum(vals.repartition(17, col("repo")),
      Seq("lang"), col("v"), Seq("id"))
      .select("id", "rank_in_stratum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === direct)
    graft.util.Caches.release()
  }

  test("quantileTiers: exact per-stratum tertiles, tier sizes within one") {
    val vals = docs.withColumn("v", pmod(col("id") * 31, lit(1009)).cast("double"))
    val out = Sampling.quantileTiers(vals, Seq("lang"), col("v"), Seq("id"),
      tiers = 3)
    val sizes = out.groupBy("lang", "tier").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every (lang, tier) present, sizes = floor/ceil(n/3)
    total.foreach { case (lang, n) =>
      (0 until 3).foreach { t =>
        val sz = sizes.getOrElse((lang, t), 0L)
        assert(math.abs(sz - n / 3.0) <= 1.0, s"$lang tier $t size $sz of $n")
      }
    }
    // tier boundaries respect the value order: max(v) of tier t is <= the
    // min(v) of tier t+1 within every stratum (ties may touch, not cross)
    val bounds = out.groupBy("lang", "tier")
      .agg(min("v").as("mn"), max("v").as("mx")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    total.keys.foreach { lang =>
      (0 until 2).foreach { t =>
        assert(bounds((lang, t))._2 <= bounds((lang, t + 1))._1,
          s"$lang tier $t max > tier ${t + 1} min")
      }
    }
    graft.util.Caches.release()
  }

  test("weightedRepeat: floor copies + hash-gated fractional epoch") {
    val w = when(col("lang") === "py", 2.5)
      .when(col("lang") === "go", 0.25).otherwise(1.0)
    val out = Sampling.weightedRepeat(docs, w, seed = 9L, col("id"))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // py: 2 copies always, a third for ~half the rows (binomial bounds)
    assert(byLang("py") > (base("py") * 2.3).toLong &&
      byLang("py") < (base("py") * 2.7).toLong, s"py=${byLang("py")}")
    // go: ~25% of rows survive with one copy
    assert(byLang("go") > (base("go") * 0.15).toLong &&
      byLang("go") < (base("go") * 0.35).toLong, s"go=${byLang("go")}")
    // weight 1.0 is the identity
    assert(byLang("sc") === base("sc"))
    // copy indexes are dense 0..n-1 per surviving row
    val ragged = out.groupBy("id")
      .agg(count(lit(1)).as("n"), min("copy_idx").as("mn"), max("copy_idx").as("mx"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count()
    assert(ragged === 0L)
    // pure function of row identity: partition layout cannot change it
    val a = out.select("id", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val b = Sampling.weightedRepeat(docs.repartition(17, col("repo")), w,
      seed = 9L, col("id")).select("id", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(a === b)
  }
}
