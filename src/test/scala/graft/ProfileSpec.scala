package graft

import graft.checks.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq[(java.lang.Long, String)](
    (9L, "b"), (10L, "a"), (2L, "a"), (null, "c"), (2L, null))
    .toDF("v", "s")

  test("profile: counts, cardinality, native-type min/max ordering") {
    val p = Profile.profile(df, Seq("v", "s"))
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(p === Seq(
      // min/max of v are numeric (2 < 9 < 10), not lexicographic ("10"<"2")
      ("s", 5L, 1L, 3L, "a", "c"),
      ("v", 5L, 1L, 3L, "2", "10")))
  }

  test("profile: exact mode expands, approx mode stays a single " +
    "partial-aggregated pass") {
    val exact = Profile.profile(df, Seq("v", "s")).queryExecution
      .executedPlan.toString
    val approx = Profile.profile(df, Seq("v", "s"), exactDistinct = false)
      .queryExecution.executedPlan.toString
    assert(exact.contains("Expand"))
    assert(!approx.contains("Expand"))
    // approx mode still returns the unified schema and sane bounds
    val p = Profile.profile(df, Seq("v"), exactDistinct = false)
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(p.head._1 === "v" && p.head._2 === 5L && p.head._3 === 1L)
    assert(p.head._4 >= 2L && p.head._4 <= 4L) // HLL estimate of 3
  }
}
