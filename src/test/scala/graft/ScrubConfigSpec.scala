package graft

import graft.filter.{Scrub, ScrubRule, Scrubber}
import org.apache.spark.sql.functions._

/** The declarative scrub config (north_star: "regex-driven PII/toxicity
  * scrubbing ... compiled from declarative patterns"): parser contract,
  * the toxicity family, and the JVM/Column twin guarantee for a custom
  * (non-default) chain.
  */
class ScrubConfigSpec extends SparkSpec {
  import spark.implicits._

  test("default chain is compiled from the declarative config") {
    val ids = Scrub.rules.map(_.id)
    assert(ids === Seq("email", "aws_key", "slack_token", "ipv4", "jwt",
      "toxicity", "hex_secret", "b64_secret", "private_key"))
    assert(Scrub.families("toxicity") === "toxicity")
    assert(Scrub.families("email") === "pii")
    assert(Scrub.rules.filter(_.drop).map(_.id) === Seq("private_key"))
    assert(Scrub.rules.find(_.id == "aws_key").get.prescreen === Some("AKIA"))
    // the entropy-gated secret detectors (truffleHog-style public
    // thresholds: hex 3.0 bits, base64 4.5) sit last among scrub rules
    assert(Scrub.rules.find(_.id == "hex_secret").get.minBits === Some(3.0))
    assert(Scrub.rules.find(_.id == "b64_secret").get.minBits === Some(4.5))
  }

  test("chain fingerprint: pins the round-3 legacy constant, " +
    "moves when any output-affecting field moves") {
    // the EXACT default chain round 3 shipped — seals written before the
    // scrub field existed were built with it, and Runner.upgradeRunConfig
    // assumes this constant is its fingerprint
    val r3Config =
      """scrub email family=pii replace=<EMAIL> pre=@ pattern=[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}
        |scrub aws_key family=secret replace=<AWS_KEY> pre=AKIA pattern=AKIA[0-9A-Z]{16}
        |scrub slack_token family=secret replace=<TOKEN> pre=xox pattern=xox[baprs]-[0-9A-Za-z-]{10,}
        |scrub ipv4 family=pii replace=<IP> pattern=\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b
        |scrub jwt family=secret replace=<JWT> pre=eyJ pattern=eyJ[A-Za-z0-9_-]{10,}\.[A-Za-z0-9_-]{10,}\.[A-Za-z0-9_-]{5,}
        |scrub toxicity family=toxicity replace=<TOX> pattern=(?i)\b(?:fuck\w*|shit\w*|bitch\w*|asshole|bastard|cunt|dickhead)\b
        |drop private_key family=secret pre=-----BEGIN pattern=-----BEGIN [A-Z ]*PRIVATE KEY-----
        |""".stripMargin
    assert(Scrub.scrubber(r3Config).fingerprint ===
      graft.runner.Runner.LegacyR3ScrubFp)
    // the EXACT default chain round 4 shipped (r3 + entropy rules, no
    // prescreen fields) — Runner.upgradeRunConfig maps seals carrying this
    // fingerprint to the current default's, which is ONLY sound while the
    // current default differs from the r4 chain in prescreen fields alone
    // (prescreens cannot change output). The assertions below enforce
    // both halves; if either fails, remove the r4 upgrade in Runner.
    val r4Config = Scrub.defaultConfig.linesIterator.map(
      _.replace("prescan=digit.digit ", "")
        .replaceAll("preAny=\\S+ ", "")).mkString("\n")
    assert(Scrub.scrubber(r4Config).fingerprint ===
      graft.runner.Runner.LegacyR4ScrubFp)
    assert(Scrub.rules.map(r =>
      (r.id, r.family, r.pattern, r.replacement, r.prescreen, r.drop,
        r.minBits)) ===
      Scrub.parse(r4Config).map(r =>
        (r.id, r.family, r.pattern, r.replacement, r.prescreen, r.drop,
          r.minBits)),
      "current default must equal the r4 chain modulo prescreen fields")
    // sensitivity: a changed pattern or replacement moves the fingerprint
    val base = Scrub.scrubber("scrub a family=pii replace=<A> pattern=a+")
    assert(base.fingerprint !==
      Scrub.scrubber("scrub a family=pii replace=<A> pattern=a*").fingerprint)
    assert(base.fingerprint !==
      Scrub.scrubber("scrub a family=pii replace=<B> pattern=a+").fingerprint)
    // stable: same config, same fingerprint
    assert(base.fingerprint ===
      Scrub.scrubber("scrub a family=pii replace=<A> pattern=a+").fingerprint)
  }

  test("parse: declaration order, pre=, and pattern-to-end-of-line") {
    val rules = Scrub.parse(
      """# comment
        |scrub b family=pii replace=<B> pattern=b+
        |scrub a family=custom replace=<A> pre=a pattern=a b (with = and spaces)
        |drop k family=secret pattern=SECRET [A-Z]+
        |""".stripMargin)
    assert(rules.map(_.id) === Seq("b", "a", "k")) // declared, not sorted
    assert(rules(1) === ScrubRule("a", "custom", "a b (with = and spaces)",
      "<A>", Some("a"), drop = false))
    assert(rules(2).drop && rules(2).replacement === "")
  }

  test("parse: config errors fail at submit time") {
    def bad(cfg: String): String =
      intercept[IllegalArgumentException](Scrub.parse(cfg)).getMessage
    assert(bad("scrub x family=pii replace=<X> pattern=[unclosed")
      .contains("bad regex"))
    assert(bad("scrub x family=pii replace=<X>").contains("missing pattern="))
    assert(bad("scrub x replace=<X> pattern=x").contains("missing family="))
    assert(bad("scrub x family=pii pattern=x").contains("need replace="))
    assert(bad("drop x family=pii replace=<X> pattern=x")
      .contains("no replace="))
    assert(bad("munge x family=pii pattern=x").contains("unknown action"))
    assert(bad("scrub x family=pii typo=1 replace=<X> pattern=x")
      .contains("unknown key"))
    assert(bad(
      """scrub x family=pii replace=<X> pattern=x
        |scrub x family=pii replace=<Y> pattern=y
        |""".stripMargin).contains("duplicate rule ids"))
  }

  test("toxicity family scrubs case-insensitively and counts in lineage order") {
    val (out, counts) = Scrub.scrubPlain("this is Shitty code, total bullshit")
    assert(out === "this is <TOX> code, total bullshit") // \b: mid-word safe
    assert(counts("toxicity") === 1)
    val clean = Scrub.scrubPlain("polite and professional prose")._2
    assert(clean("toxicity") === 0)
  }

  test("scrub is idempotent with the toxicity family in the chain") {
    val once = Scrub.scrubPlain("damn, shit happens at 10.0.0.1")._1
    assert(Scrub.scrubPlain(once)._1 === once)
  }

  test("custom chain: JVM twin and Column twin are byte-identical") {
    val custom = Scrub.scrubber(
      """scrub ticket family=internal replace=<TICKET> pre=JIRA- pattern=JIRA-[0-9]{2,6}
        |scrub tox family=toxicity replace=<TOX> pattern=(?i)\bgarbage\b
        |drop blob family=binary pattern=\x00
        |""".stripMargin)
    val texts = Seq("see JIRA-1234: this Garbage code", "JIRA-9 too short",
      "clean", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val gotCol = df.select($"id", custom.scrubCol($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(gotCol(i.toLong) === custom.scrubPlain(t)._1, s"row $i")
    }
    assert(custom.scrubPlain(texts.head)._1
      === "see <TICKET>: this <TOX> code")
    assert(custom.hasDropSecret("has \u0000 byte") && !custom.hasDropSecret("no"))
  }

  test("entropy gate: high-entropy tokens scrubbed, same-charset " +
    "low-entropy tokens kept — JVM and Column twins byte-identical") {
    // random-looking hex (H≈3.9 bits) vs an all-'a' run (H=0) vs a long
    // camelCase identifier (b64 charset, H≈3.7 < 4.5) vs a base64-ish
    // random token (H≈5 > 4.5); margins are >= 0.5 bits from thresholds
    val hexSecret = "3f9c02d4a17be85e6690cbd41f2a7d08"
    val b64Secret = "q7Zx2Kf9TgWm4Vr8pLc3HnB6sYd0JeAu"
    val lowHex = "aaaaaaaaaaaaaaaaaaaaaaaaaaaa"
    val ident = "getUserAccountManagerFactoryInstance"
    val text = s"""val k = "$hexSecret"; val t = "$b64Secret"; """ +
      s"""val z = "$lowHex"; def $ident() = 1"""
    val (out, counts) = Scrub.scrubPlain(text)
    assert(out.contains("<SECRET:HEX>") && !out.contains(hexSecret))
    assert(out.contains("<SECRET:B64>") && !out.contains(b64Secret))
    assert(out.contains(lowHex), "low-entropy hex run kept")
    assert(out.contains(ident), "identifier kept")
    assert(counts("hex_secret") === 1 && counts("b64_secret") === 1)
    // Column route (codegen'd EntropyGatedScrub) is byte-identical
    val gotCol = Seq(Tuple1(text)).toDF("text")
      .select(Scrub.scrubCol($"text")).head().getString(0)
    assert(gotCol === out)
    // and so are the per-rule counts
    val colCounts = Seq(Tuple1(text)).toDF("text")
      .select(Scrub.countCols($"text").map { case (n, c) => c.as(n) }: _*)
      .head()
    assert(colCounts.getAs[Int]("scrub_hex_secret") === counts("hex_secret"))
    assert(colCounts.getAs[Int]("scrub_b64_secret") === counts("b64_secret"))
    // idempotent: replacements are below the length floor / wrong charset
    assert(Scrub.scrubPlain(out)._1 === out)
  }

  test("minBits on a drop rule gates hasDropSecret; parse validates it") {
    val chain = Scrub.scrubber(
      "drop anykey family=secret minBits=4.5 pattern=[A-Za-z0-9+/]{24,}")
    assert(chain.hasDropSecret("key: q7Zx2Kf9TgWm4Vr8pLc3HnB6sYd0JeAu"))
    assert(!chain.hasDropSecret("val aaaaaaaaaaaaaaaaaaaaaaaaaaaa = 1"))
    // Column route agrees
    val got = Seq(("q7Zx2Kf9TgWm4Vr8pLc3HnB6sYd0JeAu ok", true),
      ("aaaaaaaaaaaaaaaaaaaaaaaaaaaa no", false)).toDF("text", "want")
      .select($"want", chain.dropCols($"text").head._2.as("got")).collect()
    got.foreach(r => assert(r.getBoolean(1) === r.getBoolean(0)))
    val e = intercept[IllegalArgumentException](Scrub.parse(
      "scrub x family=a replace=<X> minBits=nope pattern=x+"))
    assert(e.getMessage.contains("minBits"))
    val e2 = intercept[IllegalArgumentException](Scrub.parse(
      "scrub x family=a replace=<X> minBits=-1 pattern=x+"))
    assert(e2.getMessage.contains("minBits"))
  }

  test("family-qualified scrub lineage rows") {
    import graft.filter.QualityPipeline
    import graft.corpus.CorpusGen
    val annotated = QualityPipeline.annotate(
      QualityPipeline.score(CorpusGen.files(spark, 500L)),
      CorpusGen.commitsDim(spark), QualityPipeline.Config())
    val lin = QualityPipeline.lineage(annotated, "scrub-spec")
    val scrubIds = lin.filter(_.stage == "scrub").map(_.ruleId)
    assert(scrubIds.contains("pii.email"))
    assert(scrubIds.contains("toxicity.toxicity"))
    assert(scrubIds.contains("secret.jwt"))
  }
}
