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
      "toxicity", "private_key"))
    assert(Scrub.families("toxicity") === "toxicity")
    assert(Scrub.families("email") === "pii")
    assert(Scrub.rules.filter(_.drop).map(_.id) === Seq("private_key"))
    assert(Scrub.rules.find(_.id == "aws_key").get.prescreen === Some("AKIA"))
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
