package graft

import graft.text.Decontaminate
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  val benchText = "the quick brown fox jumps over the lazy dog near the river bank today"
  lazy val docs = Seq(
    (1L, s"prefix words here $benchText and a suffix"), // contains the bench 8-grams
    (2L, "completely unrelated content about spark catalyst optimizer internals"),
    (3L, "the quick brown fox jumps over seven fences"), // shares < 8-gram runs only
    (4L, ""),
    (5L, benchText)).toDF("id", "text")
  lazy val bench = Seq(benchText).toDF("text")

  test("contaminationFlags: 8-gram collisions flag supersets, not short overlaps") {
    val got = Decontaminate.contaminationFlags(docs, "id", "text", bench, "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(1L)._2 && got(1L)._1 > 0) // embedded benchmark text
    assert(got(5L)._2)                   // the benchmark doc itself
    assert(!got(2L)._2 && got(2L)._1 === 0)
    assert(!got(3L)._2, "a 7-token overlap must not collide at n=8")
    assert(!got(4L)._2 && got(4L)._1 === 0) // empty doc present with 0 hits
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L)) // every doc reported
  }

  test("hit counts equal a plain-Scala shingle intersection") {
    val benchSet = graft.dedup.Dedup.shingles(benchText, 8).toSet
    val expected = Seq(1L, 2L, 3L, 4L, 5L).map { id =>
      val t = docs.filter(col("id") === id).head().getString(1)
      id -> graft.dedup.Dedup.shingles(t, 8).count(benchSet.contains).toLong
    }.toMap
    val got = Decontaminate.contaminationFlags(docs, "id", "text", bench, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("minHits raises the collision bar") {
    val strict = Decontaminate.contaminationFlags(docs, "id", "text",
      bench, "text", minHits = 1000)
    assert(strict.filter(col("contaminated")).count() === 0)
  }

  // ---- exact-substring decontamination ------------------------------------

  test("bloom route is byte-identical to the exact route, at any fpp") {
    // a broader corpus than the fixture: 300 generated docs, ~1/5 seeded
    // with a bench 8-gram run (forces true hits the verify join must keep
    // and plenty of non-hits the sketch must mostly reject)
    val big = (0 until 300).map { i =>
      val body = s"doc $i " + (s"tok${i % 17} " * 12)
      (100L + i, if (i % 5 == 0) body + benchText else body)
    }.toDF("id", "text")
    val exact = Decontaminate.contaminationFlags(big, "id", "text",
        bench, "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    // fpp 0.5: the sketch passes LOTS of false positives — the exact
    // verify join must remove every one (identical output is the contract)
    for (fpp <- Seq(0.01, 0.5)) {
      val bloomed = Decontaminate.contaminationFlagsBloom(big, "id", "text",
          bench, "text", fpp = fpp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sortBy(_._1).toSeq
      assert(bloomed === exact, s"fpp=$fpp diverged from the exact route")
    }
    graft.util.Caches.release()
    // plan shape: the sketch probe is a map-side Filter on the corpus
    // side and the verify join is a shuffle join, never a broadcast of
    // the shingle set
    val plan = Decontaminate.contaminationFlagsBloom(big, "id", "text",
      bench, "text").queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_might_contain"),
      s"no sketch probe in plan:\n$plan")
    graft.util.Caches.release()
  }

  test("benchNeedles: aligned chunks, tail dropped, distinct, code-point counting") {
    val a = "0123456789abcdefXYZ" // len 19, chunk 8 -> 2 full chunks, tail dropped
    val b = "0123456789abcdef"    // duplicates a's chunks exactly
    val got = Decontaminate.benchNeedles(
      Seq(a, b, "short").toDF("text"), "text", 8)
      .as[String].collect().sorted
    assert(got === Array("0123456789abcdef".substring(0, 8),
      "0123456789abcdef".substring(8, 16)).sorted)
    // astral chars: Spark substr counts CODE POINTS, not UTF-16 units
    val emoji = "😀" // U+1F600, one code point, two Java chars
    val t = emoji + "abcd"     // 5 code points -> one chunk of 4 at chunk=4
    val got2 = Decontaminate.benchNeedles(Seq(t).toDF("text"), "text", 4)
      .as[String].collect()
    assert(got2.toSeq === Seq(emoji + "abc"))
  }

  test("exactSubstringFlags: aligned-chunk guarantee, distinct hit counts, all docs reported") {
    val benchDoc = (0 until 16).map(i => f"SEG$i%02d-xxxxxxxx").mkString // 16 chunks of 14 at chunk=14
    val chunk = 14
    val docs2 = Seq(
      // a verbatim >= 2*chunk-1 overlap, deliberately MISALIGNED by 3 chars:
      // still must contain one aligned full chunk
      (1L, "zzz" + benchDoc.substring(3, 3 + 2 * chunk) + "zzz"),
      (2L, "no overlap at all with anything here"),
      // shorter-than-chunk shared run, unaligned: must NOT flag
      (3L, "yy" + benchDoc.substring(5, 5 + chunk - 1) + "yy"),
      (4L, benchDoc), // the benchmark doc itself: every chunk hits, once each
      (5L, benchDoc.take(chunk) + benchDoc.take(chunk)), // duplicate occurrences, ONE distinct needle
      (6L, null.asInstanceOf[String]),
      (7L, "")).toDF("id", "text")
    val flags = Decontaminate.exactSubstringFlags(docs2, "id", "text",
      Seq(benchDoc).toDF("text"), "text", chunk = chunk)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(flags.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(flags(1L)._2 && flags(1L)._1 >= 1)
    assert(flags(2L) === ((0L, false)))
    assert(flags(3L) === ((0L, false)))
    assert(flags(4L) === ((16L, true)))
    assert(flags(5L) === ((1L, true))) // distinct needles, not occurrences
    assert(flags(6L) === ((0L, false)))
    assert(flags(7L) === ((0L, false)))
  }

  test("exactSubstringFlags is partition-layout independent") {
    val benchDoc = (0 until 16).map(i => f"SEG$i%02d-xxxxxxxx").mkString
    val many = (1L to 200L).map(i =>
      (i, if (i % 7 == 0) s"pad $benchDoc pad" else s"text $i " * 10))
      .toDF("id", "text")
    def run(parts: Int) = Decontaminate.exactSubstringFlags(
      many.repartition(parts), "id", "text",
      Seq(benchDoc).toDF("text"), "text", chunk = 14)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(run(1) === run(13))
  }

  test("SubstringAutomaton counts equal a plain contains() scan") {
    val needles = Array("abcd", "bcde", "aaaa", "dddd", "xyzw")
    val auto = graft.text.SubstringAutomaton.build(needles)
    val seen = new java.util.BitSet(needles.length)
    val texts = Seq("abcdef", "aaaaa", "zzabcdezz", "xy", "", "aabcdd",
      "abcdbcdeaaaaddddxyzw", "dddddddd", "ababab", "aaabcd")
    texts.foreach { t =>
      val expected = needles.count(t.contains(_))
      assert(auto.countDistinctHits(t, seen) === expected, s"text=$t")
    }
  }

  test("SubstringAutomaton rejects unequal-length or duplicate needles") {
    intercept[IllegalArgumentException] {
      graft.text.SubstringAutomaton.build(Array("ab", "abc"))
    }
    intercept[IllegalArgumentException] {
      graft.text.SubstringAutomaton.build(Array("ab", "ab"))
    }
  }
}
