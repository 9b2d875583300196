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
}
