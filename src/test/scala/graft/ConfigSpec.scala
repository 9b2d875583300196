package graft

import graft.config.{CodeDict, RuleConfig}
import graft.model._

class ConfigSpec extends SparkSpec {
  import spark.implicits._

  // ---- splitTop: paren/quote-aware field splitting -------------------------

  test("splitTop keeps commas inside parens and quotes") {
    assert(RuleConfig.splitTop("a, cast(x as decimal(12,2)) as y, 'p,q'") ===
      Seq("a", "cast(x as decimal(12,2)) as y", "'p,q'"))
    assert(RuleConfig.splitTop("coalesce(k,'') as k2, v") ===
      Seq("coalesce(k,'') as k2", "v"))
  }

  test("unknown or miscased field keys fail the parse loudly") {
    val bad = intercept[IllegalArgumentException] {
      RuleConfig.parseRule("UC; id=u; table=t; select=k; orderby=v; limit=5")
    }
    assert(bad.getMessage.contains("orderby"))
    intercept[IllegalArgumentException] {
      RuleConfig.parseRule("UU; id=u; table=t; filter=k > 0; Expected=100")
    }
    intercept[IllegalArgumentException] {
      RuleConfig.parseRule("PK; id=p; table=t; cols=k; father=f")
    }
    // disabled rules skip validation (reference ignored disabled rows)
    assert(RuleConfig.parseRule("PK; id=p; table=t; colz=k; runInd=N").isEmpty)
  }

  test("unpaired apostrophe is a plain char, not a quote-run opener") {
    assert(RuleConfig.splitTop("O'Brien,Smith") === Seq("O'Brien", "Smith"))
    // word-internal apostrophes never pair with each other or with a later
    // SQL literal's quote (a literal never follows an identifier char)
    assert(RuleConfig.splitTop("O'Brien,D'Arcy") === Seq("O'Brien", "D'Arcy"))
    assert(RuleConfig.splitTop("desc=it's broken; filter=c = 'O;P'; expected=0", ';')
      === Seq("desc=it's broken", "filter=c = 'O;P'", "expected=0"))
    val vc = RuleConfig.parseRule(
      "VC; id=v; table=t; col=c; values=O'Brien,Smith; isEmpty=N").get
      .asInstanceOf[DomainRule]
    // quote characters are stripped from values per the reference's
    // valScale normalization (GQ:2572) — but the comma and the isEmpty
    // field must survive the lone quote
    assert(vc.values === Set("OBrien", "Smith"))
    assert(!vc.isEmptyGuard)
  }

  test("opening quote with no plausible closer never swallows separators") {
    // the only later apostrophe is word-internal (followed by an identifier
    // char) — it cannot terminate a literal, so no quote run opens at 'a
    // and the ; separator between the fields survives
    assert(RuleConfig.splitTop("select='a; filter=it's ok", ';') ===
      Seq("select='a", "filter=it's ok"))
    // a word-internal apostrophe inside a real literal doesn't close it
    assert(RuleConfig.splitTop("filter=c = 'it's fine; really'; expected=0", ';') ===
      Seq("filter=c = 'it's fine; really'", "expected=0"))
    // and a real literal after a word-internal apostrophe still protects ;
    assert(RuleConfig.splitTop("desc=it's; filter=c = 'x;y'", ';') ===
      Seq("desc=it's", "filter=c = 'x;y'"))
  }

  test("rule lines split on ; outside quotes only") {
    val r = RuleConfig.parseRule(
      "UU; id=u; table=t; filter=c = 'a;b'; expected=1").get
      .asInstanceOf[ExpectedCountRule]
    assert(r.exprInfo === "filter=c = 'a;b'")
    assert(r.expected === 1L)
  }

  // ---- numeric coercion (GQ:2566-2575, GQ:3324-3326) ------------------------

  test("coerceNum: integral floats to int-strings, quotes stripped") {
    assert(RuleConfig.coerceNum("1.0") === "1")
    assert(RuleConfig.coerceNum("-42.000") === "-42")
    assert(RuleConfig.coerceNum("1.5") === "1.5")
    assert(RuleConfig.coerceNum("'A'") === "A")
    assert(RuleConfig.coerceNum("“B”") === "B")
    assert(RuleConfig.coerceNum("abc") === "abc")
  }

  test("VC over a numeric column: rule value 1.0 matches int 1") {
    val df = Seq(1, 2, 3, 6).toDF("c")
    val rule = RuleConfig.parseRule(
      "VC; id=v; table=t; col=c; values=1.0,2,3").get.asInstanceOf[DomainRule]
    assert(rule.values === Set("1", "2", "3"))
    val plan = graft.checks.Checks.domain(rule, df)
    assert(plan.counts() === ((4L, 1L))) // only 6 violates
  }

  test("VC numeric with nulls: guard = isNotNull; strict counts null") {
    val df = Seq[Option[Int]](Some(1), Some(9), None).toDF("c")
    val guarded = graft.checks.Checks.domain(
      DomainRule("v", "t", "c", Set("1")), df)
    assert(guarded.counts() === ((3L, 1L))) // 9 only; null exempt
    val strict = graft.checks.Checks.domain(
      DomainRule("v", "t", "c", Set("1"), isEmptyGuard = false), df)
    assert(strict.counts() === ((3L, 2L))) // 9 and null
  }

  // ---- CodeDict (readSdataCode3, GQ:3308-3344) ------------------------------

  test("CodeDict: float coercion, quote mapping, per-key union, key casing") {
    val dict = CodeDict.parse(
      """# comment
        |tab1,colA,1.0
        |TAB1,cola,2
        |Tab1,ColA,''
        |tab2,colB,x,y
        |""".stripMargin)
    assert(dict(CodeDict.key("TAB1", "COLA")) === Set("1", "2", ""))
    assert(dict("TAB2.COLB") === Set("x,y")) // code keeps inner commas
  }

  test("SC rule resolves values from dict; missing key → empty set + family") {
    val dict = Map("T.C" -> Set("a", "b"))
    val sc = RuleConfig.parseRule("SC; id=s; table=db.t; col=c", dict = dict)
      .get.asInstanceOf[DomainRule]
    assert(sc.family === "SC" && sc.values === Set("a", "b"))
    assert(sc.dbNm === "db" && sc.tabNm === "t")
    val missing = RuleConfig.parseRule("SC; id=s2; table=t; col=zzz", dict = dict)
      .get.asInstanceOf[DomainRule]
    assert(missing.values === Set.empty[String])
  }

  // ---- UC/UU from config text (GQ:1167-1176) --------------------------------

  test("UC config: filter/select/orderBy/limit compile to a typed transform") {
    val df = Seq((1, 30.0), (2, 10.0), (3, 20.0), (4, 5.0)).toDF("k", "v")
    val uc = RuleConfig.parseRule(
      "UC; id=u; table=t; filter=v > 6; select=k, cast(v as bigint) as vv; orderBy=v desc, k; limit=2")
      .get.asInstanceOf[CustomRule]
    val out = uc.transform(df).collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.toSeq === Seq((1, 30L), (3, 20L)))
  }

  test("UC config: declared join compiles to a typed a/b-aliased join") {
    val base = Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "tag")
    val other = Seq((1, 100L), (3, 300L), (4, 400L)).toDF("k", "amt")
    val uc = RuleConfig.parseRule(
      "UC; id=j; table=t; joinTable=o; joinOn=a.k = b.k; " +
        "filter=b.amt > 150; select=a.k, a.tag, b.amt; orderBy=a.k",
      tables = Some(_ => other)).get.asInstanceOf[CustomRule]
    val out = uc.transform(base).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((3, "z", 300L)))
    // a/b aliases disambiguate the shared column name `k` in joinOn/select
    assert(uc.exprInfo.startsWith("joinTable=o; joinOn=a.k = b.k"))
  }

  test("UC join: left type keeps unmatched base rows; render round-trips") {
    val base = Seq((1, "x"), (2, "y")).toDF("k", "tag")
    val other = Seq((1, 100L)).toDF("k", "amt")
    val uc = RuleConfig.parseRule(
      "UC; id=j; table=t; joinTable=o; joinOn=a.k = b.k; joinType=left; " +
        "select=a.k, b.amt; orderBy=a.k",
      tables = Some(_ => other)).get.asInstanceOf[CustomRule]
    val out = uc.transform(base).collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq === Seq((1, 100L), (2, -1L)))
    val again = RuleConfig.parseRule(RuleConfig.render(uc),
      tables = Some(_ => other)).get
    assert(RuleConfig.render(again) === RuleConfig.render(uc))
  }

  test("UC join declarations fail loudly when incomplete") {
    // joinTable without joinOn
    intercept[IllegalArgumentException] {
      RuleConfig.parseRule("UC; id=j; table=t; joinTable=o; select=a.k",
        tables = Some(_ => Seq(1).toDF("k")))
    }
    // joinTable without a table resolver — surfaced at PARSE time, before
    // any rule executes
    intercept[IllegalArgumentException] {
      RuleConfig.parseRule("UC; id=j; table=t; joinTable=o; joinOn=a.k = b.k")
    }
  }

  test("UU config: expected count default 0 (GQ:3079-3080)") {
    val uu = RuleConfig.parseRule("UU; id=u; table=t; filter=k > 0").get
      .asInstanceOf[ExpectedCountRule]
    assert(uu.expected === 0L)
  }

  // ---- render: the reproRule artifact round-trips ---------------------------

  test("render(parse(line)) round-trips every declarative family") {
    val lines = Seq(
      "PK; id=p; table=db.t; cols=a,b; where=x > 0",
      "FK; id=f; table=t; cols=a; father=ft; fatherCols=fa; fatherWhere=y = 1; emptyGuard=N; broadcast=Y",
      "FC; id=c; table=t; cols=a; father=ft; fatherCols=fa",
      "ZC; id=z; table=t; cols=k; start=s; end=e; tiebreak=o",
      "VC; id=v; table=t; col=c; values=A,B; isEmpty=N",
      "PC; id=q; table=t; cols=k; codeTable=dim; codeCols=dk",
      "UU; id=u; table=t; filter=k > 2; expected=7; ugcType=recon",
      "UC; id=c2; table=t; select=a, b; limit=3; ugcType=adhoc")
    lines.foreach { l =>
      val r1 = RuleConfig.parseRule(l).get
      val rendered = RuleConfig.render(r1)
      val r2 = RuleConfig.parseRule(rendered).get
      // UC/UU carry function fields — compare via a second render instead
      assert(RuleConfig.render(r2) === rendered, s"for line: $l")
      (r1, r2) match {
        case (_: ExpectedCountRule, _: ExpectedCountRule) => ()
        case (_: CustomRule, _: CustomRule) => ()
        case _ => assert(r1 === r2, s"for line: $l")
      }
    }
  }

  test("render: SC omits dictionary values; expression cols survive") {
    val sc = RuleConfig.parseRule("SC; id=s; table=t; col=c",
      dict = Map("T.C" -> Set("a"))).get
    assert(RuleConfig.render(sc) === "SC; id=s; table=t; col=c")
    val pk = PkRule("p", "t", Seq("coalesce(k,'') as k2", "v"))
    val again = RuleConfig.parseRule(RuleConfig.render(pk)).get
    assert(again === pk) // paren-aware cols split preserves the expression
  }
}
