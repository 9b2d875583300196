package graft

import graft.checks.Checks
import graft.model._

/** Per-operator unit tests on hand-built frames with known violations
  * (SURVEY.md §5.2.1). Each asserts the reference's semantics: counting,
  * empty-string guards, child-wider-than-father truncation, bidirectional
  * FC, interval overlap, isEmpty variants, expected-count verdicts.
  */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("PK: failedCnt = sum of dup-group sizes; allCnt = total") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 1), ("c", 1), ("c", 2))
      .toDF("k", "v")
    val plan = Checks.pk(PkRule("pk", "t", Seq("k")), df)
    assert(plan.counts() === ((6L, 5L))) // a:3 + c:2
    val det = plan.detail.collect()
    assert(det.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 3L), ("c", 2L)))
  }

  test("PK: expression keys (reference allowed COALESCE(col,'') keys)") {
    val df = Seq((Some("x"), 1), (None, 2), (None, 3)).toDF("k", "v")
    val plan = Checks.pk(
      PkRule("pk", "t", Seq("coalesce(k, '')")), df)
    assert(plan.counts() === ((3L, 2L))) // the two NULL keys collide on ''
  }

  test("PK: WHERE narrows the scanned set") {
    val df = Seq(("a", 1), ("a", 2), ("b", 9)).toDF("k", "v")
    val plan = Checks.pk(PkRule("pk", "t", Seq("k"), where = Some("v < 5")), df)
    assert(plan.counts() === ((2L, 2L)))
  }

  test("FK: orphans counted; empty-string children exempt (coalesce<>'' guard)") {
    val child = Seq("c1", "c1", "orph", "", null.asInstanceOf[String])
      .toDF("ck")
    val father = Seq("c1", "c2").toDF("fk")
    val plan = Checks.fk(
      FkRule("fk", "t", Seq("ck"), "f", Seq("fk")), child, father)
    // guard drops "" and null from the scanned set entirely (GQ:356-358)
    assert(plan.counts() === ((3L, 1L)))
  }

  test("FK: without guard, null children are orphans (anti-join semantics)") {
    val child = Seq("c1", null.asInstanceOf[String]).toDF("ck")
    val father = Seq("c1").toDF("fk")
    val plan = Checks.fk(
      FkRule("fk", "t", Seq("ck"), "f", Seq("fk"), emptyGuard = false),
      child, father)
    assert(plan.counts() === ((2L, 1L)))
  }

  test("FK: child key list wider than father's is truncated (GQ:1649-1651)") {
    val child = Seq(("a", 1), ("z", 2)).toDF("k1", "k2")
    val father = Seq("a").toDF("f1")
    val plan = Checks.fk(
      FkRule("fk", "t", Seq("k1", "k2"), "f", Seq("f1")), child, father)
    assert(plan.counts() === ((2L, 1L))) // only k1 participates
  }

  test("FC: both directions counted and tagged C/F") {
    val child = Seq("both", "childOnly").toDF("ck")
    val father = Seq("both", "fatherOnly", "fatherOnly2").toDF("fk")
    val plan = Checks.fc(FcRule("fc", "t", Seq("ck"), "f", Seq("fk")),
      child, father)
    assert(plan.counts() === ((5L, 3L)))
    val tags = plan.violations.collect().map(r => (r.getString(0), r.getString(1)))
    assert(tags.toSet === Set(("C", "childOnly"), ("F", "fatherOnly"),
      ("F", "fatherOnly2")))
  }

  test("ZC: adjacent interval overlap via window lag") {
    val df = Seq(
      ("k1", 1, 5), ("k1", 4, 8), ("k1", 9, 12), // one overlap (4 < 5)
      ("k2", 1, 2), ("k2", 2, 3) // touching, not overlapping
    ).toDF("k", "st", "en")
    val plan = Checks.zc(
      ZcRule("zc", "t", Seq("k"), "st", "en"), df)
    assert(plan.counts() === ((5L, 1L)))
    val v = plan.violations.select("k", "st").collect()
    assert(v.map(r => (r.getString(0), r.getInt(1))).toSeq === Seq(("k1", 4)))
  }

  test("ZC skew-safe path: equals window path on a 90%-hot key") {
    import org.apache.spark.sql.functions.{col, spark_partition_id}
    // HOT owns 90% of rows; every adjacent HOT pair overlaps, so the count
    // is only right if EVERY partition-boundary pair is checked too
    val hotOverlap = (0 until 360).map(i => ("HOT", i * 2, i * 2 + 3))
    val cold = (0 until 40).map(i => (s"c${i % 8}", i * 10, i * 10 + 1))
    val df = (hotOverlap ++ cold).toDF("k", "st", "en")
    val plain = Checks.zc(
      ZcRule("z", "t", Seq("k"), "st", "en", orderTiebreak = Seq("en")), df)
    val safe = Checks.zcSkewSafe(
      ZcRule("z", "t", Seq("k"), "st", "en", orderTiebreak = Seq("en")),
      df, numPartitions = 4)
    assert(safe.counts() === plain.counts())
    assert(safe.counts() === ((400L, 359L)))
    // a non-overlapping hot key: the boundary pass must not false-positive
    val clean = (0 until 360).map(i => ("HOT", i * 2, i * 2 + 2)).toDF("k", "st", "en")
    val safeClean = Checks.zcSkewSafe(
      ZcRule("z2", "t", Seq("k"), "st", "en"), clean, numPartitions = 4)
    assert(safeClean.counts() === ((360L, 0L)))
    // the skew defense itself: under range partitioning no single window
    // task holds the hot key — its largest (key, partition) segment is a
    // fraction of the key's rows (the plain path would hold all 360)
    val segSizes = df.repartitionByRange(4, col("k"), col("st"))
      .groupBy(col("k"), spark_partition_id().as("pid")).count()
      .filter(col("k") === "HOT").collect().map(_.getLong(2))
    assert(segSizes.length > 1 && segSizes.max < 360,
      s"hot key must span multiple segments: ${segSizes.toSeq}")
    // the config surface round-trips the flag and dispatches to this path
    val rendered = graft.config.RuleConfig.render(
      ZcRule("z3", "t", Seq("k"), "st", "en", hotKeySafe = true))
    assert(rendered.contains("hotKeySafe=Y"))
    val parsed = graft.config.RuleConfig.parseRule(rendered).get
      .asInstanceOf[ZcRule]
    assert(parsed.hotKeySafe)
    assert(Checks.zc(parsed.copy(table = "t"), df).counts() === ((400L, 359L)))
  }

  test("ZC skew-safe: null starts match the plain path across boundaries") {
    // null starts sort FIRST; the plain path's `null < prev_end` is never
    // a violation. A segment whose in-order first row has a null start
    // must report first_start = NULL (not the min non-null start), or the
    // boundary pass counts violations the plain path doesn't.
    val rows = (0 until 60).map(i => ("K", Integer.valueOf(i * 2), i * 2 + 3)) ++
      (0 until 12).map(i => ("K", null.asInstanceOf[Integer], 1000 + i))
    val df = rows.toDF("k", "st", "en")
    val rule = ZcRule("zn", "t", Seq("k"), "st", "en", orderTiebreak = Seq("en"))
    val plain = Checks.zc(rule, df)
    // several partition counts so null runs straddle different boundaries
    Seq(3, 4, 7).foreach { p =>
      val safe = Checks.zcSkewSafe(rule, df, numPartitions = p)
      assert(safe.counts() === plain.counts(), s"numPartitions=$p")
    }
  }

  test("ZC skew-safe: ties on the minimal start are not double-reported") {
    // two rows tying on a segment's first start: the boundary recovery
    // must return exactly ONE row per violating segment, and the viol
    // frame's row count must equal failed_cnt (plain-path invariant)
    val hot = (0 until 200).flatMap(i =>
      Seq(("T", i * 2, i * 2 + 3), ("T", i * 2, i * 2 + 1))) // tied starts
    val df = hot.toDF("k", "st", "en")
    val rule = ZcRule("zt", "t", Seq("k"), "st", "en", orderTiebreak = Seq("en"))
    val plain = Checks.zc(rule, df)
    val safe = Checks.zcSkewSafe(rule, df, numPartitions = 5)
    assert(safe.counts() === plain.counts())
    val (_, failed) = safe.counts()
    assert(safe.violations.count() === failed,
      "violation rows must equal failed_cnt")
  }

  test("VC: isEmpty guard exempts empty/null values (GQ:565-574)") {
    val df = Seq("ok", "bad", "", null.asInstanceOf[String]).toDF("c")
    val guarded = Checks.domain(
      DomainRule("vc", "t", "c", Set("ok")), df)
    assert(guarded.counts() === ((4L, 1L))) // only "bad"
    val strict = Checks.domain(
      DomainRule("vc", "t", "c", Set("ok"), isEmptyGuard = false), df)
    assert(strict.counts() === ((4L, 3L))) // bad, "", null all violate
  }

  test("VC: empty value set fails every non-empty value (GQ:2346-2347)") {
    val df = Seq("a", "b", "").toDF("c")
    val plan = Checks.domain(DomainRule("vc", "t", "c", Set.empty), df)
    assert(plan.counts() === ((3L, 2L)))
  }

  test("VC detail: offending values grouped + capped, deterministic order") {
    val df = (Seq.fill(3)("x") ++ Seq.fill(2)("y") ++ Seq("ok")).toDF("c")
    val plan = Checks.domain(DomainRule("vc", "t", "c", Set("ok")), df)
    val det = plan.detail.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(det.toSeq === Seq(("x", 3L), ("y", 2L)))
  }

  test("VC over BIGINT: codes above 2^53 compare exactly (no double trip)") {
    // 2^53 and 2^53+1 are distinct longs but the SAME double — a compare
    // through double would let the 2^53 row spuriously match (false pass)
    val big = 9007199254740992L // 2^53
    val df = Seq(big, big + 1).toDF("c")
    val plan = Checks.domain(
      DomainRule("v", "t", "c", Set((big + 1).toString), isEmptyGuard = false),
      df)
    assert(plan.counts() === ((2L, 1L)))
    // a fractional value can never match an integral column: it leaves the
    // probe set (warned), it is not rounded into a false match
    val plan2 = Checks.domain(
      DomainRule("v2", "t", "c", Set(s"$big.5"), isEmptyGuard = false), df)
    assert(plan2.counts() === ((2L, 2L)))
  }

  test("VC over DECIMAL: compares exactly at full precision") {
    // 22 significant digits — far beyond double's ~16; both values collapse
    // to the same double, so only an exact decimal compare separates them
    val df = Seq(BigDecimal("12345678901234567890.12"),
      BigDecimal("12345678901234567890.13")).toDF("c") // decimal(38,18)
    val plan = Checks.domain(
      DomainRule("v", "t", "c", Set("12345678901234567890.12"),
        isEmptyGuard = false), df)
    assert(plan.counts() === ((2L, 1L)))
  }

  test("PC: composite code keys against broadcast dimension") {
    val df = Seq(("a", "1"), ("a", "2"), ("b", "1")).toDF("t1", "t2")
    val dim = Seq(("a", "1"), ("b", "1")).toDF("c1", "c2")
    val plan = Checks.codeTable(
      CodeTableRule("pc", "t", Seq("t1", "t2"), "dim", Seq("c1", "c2")),
      df, dim)
    assert(plan.counts() === ((3L, 1L)))
  }

  test("UU: verdict N iff count != expected; failedCnt = diff (GQ:3159)") {
    val df = Seq(1, 2, 3).toDF("v")
    val pass = Checks.expectedCount(
      ExpectedCountRule("uu", "t", d => d, expected = 3L), df)
    assert(pass.counts() === ((3L, 0L)))
    val fail = Checks.expectedCount(
      ExpectedCountRule("uu", "t", d => d.filter($"v" > 1), expected = 3L), df)
    assert(fail.counts() === ((2L, -1L)))
    val results = Checks.run(spark, "b1", Seq(pass, fail))
    assert(results.map(_.checkResultInd) === Seq("Y", "N"))
  }

  test("UC: run-and-record, no verdict, failedCnt -1 (GQ:2972,3001)") {
    val df = Seq(1, 2).toDF("v")
    val plan = Checks.custom(CustomRule("uc", "t", d => d.filter($"v" > 1)), df)
    assert(plan.counts() === ((1L, -1L)))
    val res = Checks.run(spark, "b1", Seq(plan))
    assert(res.head.checkResultInd === "")
  }

  test("verdict derivation: Y/N/'' (GQ:300-317)") {
    assert(Verdict.of(0) === "Y")
    assert(Verdict.of(7) === "N")
    assert(Verdict.of(-1) === "")
  }
}
