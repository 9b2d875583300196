package graft.filter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One declarative scrub rule (north_rule: "regex-driven PII/toxicity
  * scrubbing ... compiled from declarative patterns").
  *
  * @param id          unique rule id (lineage key)
  * @param family      grouping for lineage/reporting: "pii", "secret",
  *                    "toxicity", ... — free-form, not an enum, so a config
  *                    can introduce new families without code changes
  * @param pattern     java.util.regex pattern
  * @param replacement replacement text (scrub rules; empty for drop rules)
  * @param prescreen   literal substring implied by the pattern — a cheap
  *                    indexOf gate that skips the regex when absent (most
  *                    files carry no PII, so this is the common case)
  * @param drop        true = the match cannot be scrubbed in place and the
  *                    whole file is dropped (e.g. private key material)
  * @param minBits     entropy gate: when set, a match only fires if the
  *                    Shannon entropy over its characters is >= this many
  *                    bits — the public secret-scanner heuristic for keys
  *                    WITHOUT a known prefix (random base64/hex runs are
  *                    high-entropy; same-charset identifiers are not).
  *                    See [[graft.functions.SecretEntropy]].
  */
final case class ScrubRule(
    id: String,
    family: String,
    pattern: String,
    replacement: String,
    prescreen: Option[String],
    drop: Boolean,
    minBits: Option[Double] = None)

/** A compiled, ordered scrub chain. Rules are applied in DECLARED order —
  * scrubbing must be deterministic across partitionings so retained-content
  * sha256s are stable (SURVEY.md §7 hard part (b)). Both the Spark path
  * (`regexp_replace`/`regexp_count`, which compile to java.util.regex) and
  * the JVM twin `scrubPlain` share the same pattern strings, so their
  * outputs are byte-identical by construction; tests assert it anyway.
  */
final class Scrubber(val rules: Seq[ScrubRule]) {

  /** (rule id, java-regex pattern, replacement) for scrub rules, in order. */
  val patterns: Seq[(String, String, String)] =
    rules.filterNot(_.drop).map(r => (r.id, r.pattern, r.replacement))

  /** (id, pattern) for whole-file drop rules. */
  val dropPatterns: Seq[(String, String)] =
    rules.filter(_.drop).map(r => (r.id, r.pattern))

  /** id → declared family (lineage rows are family-qualified). */
  val families: Map[String, String] = rules.map(r => r.id -> r.family).toMap

  /** 16-hex content fingerprint of the chain — every field that changes
    * scrubbed OUTPUT participates (id/family are lineage metadata but kept
    * in: a renamed rule changes what lineage a resumed run would mix).
    * Sealed into a run's work dir ([[graft.runner.Runner]]) so checkpoints
    * built under a different chain refuse to resume instead of silently
    * mixing differently-scrubbed content/sha256s across stages.
    */
  lazy val fingerprint: String = {
    // minBits appends as an extra field only when present, so every
    // pre-entropy chain's canon (and thus Runner.LegacyR3ScrubFp) is stable
    val canon = rules.map(r => (Seq(r.id, r.family, r.pattern, r.replacement,
      r.prescreen.getOrElse(""), r.drop.toString) ++
      r.minBits.map(_.toString)).mkString("\u0001"))
      .mkString("\n")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(canon.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
  }

  /** Per-pattern match-count columns (lineage: "scrub counts"). Each
    * pattern is counted against the text AFTER the preceding patterns have
    * been applied — the same progressive semantics as [[scrubPlain]], so
    * e.g. an IP consumed by the email pattern is not double-counted.
    */
  def countCols(content: Column): Seq[(String, Column)] = {
    var cur = content
    rules.filterNot(_.drop).map { r =>
      val c = s"scrub_${r.id}" -> (r.minBits match {
        case None => regexp_count(cur, lit(r.pattern))
        case Some(b) =>
          graft.functions.expressions.entropy_count(cur, r.pattern, b)
      })
      cur = r.minBits match {
        case None => regexp_replace(cur, lit(r.pattern), lit(r.replacement))
        case Some(b) =>
          graft.functions.expressions.entropy_scrub(cur, r.pattern,
            r.replacement, b)
      }
      c
    }
  }

  /** The scrubbed content: ordered replace chain, one projection —
    * `regexp_replace` for plain rules, the codegen'd entropy-gated
    * expression for `minBits=` rules.
    */
  def scrubCol(content: Column): Column =
    rules.filterNot(_.drop).foldLeft(content) { (c, r) =>
      r.minBits match {
        case None => regexp_replace(c, lit(r.pattern), lit(r.replacement))
        case Some(b) =>
          graft.functions.expressions.entropy_scrub(c, r.pattern,
            r.replacement, b)
      }
    }

  /** Drop-rule columns for unsalvageable secrets. */
  def dropCols(content: Column): Seq[(String, Column)] =
    rules.filter(_.drop).map { r =>
      r.id -> (r.minBits match {
        case None => content.rlike(r.pattern)
        case Some(b) =>
          graft.functions.expressions.entropy_count(content, r.pattern, b) > 0
      })
    }

  // ---- plain-JVM twin (used by the fused pipeline pass and test oracles) -

  private val compiled =
    rules.filterNot(_.drop).map { r =>
      // entropy rules replace LITERALLY (SecretEntropy quotes) — quote here
      // too so the fused pass stays byte-identical to the Column route;
      // plain rules keep java $-group semantics (same as regexp_replace)
      val rep = if (r.minBits.isDefined)
        java.util.regex.Matcher.quoteReplacement(r.replacement)
      else r.replacement
      (r.id, java.util.regex.Pattern.compile(r.pattern), rep,
        r.prescreen, r.minBits)
    }
  private val compiledDrop =
    rules.filter(_.drop).map { r =>
      (r.id, java.util.regex.Pattern.compile(r.pattern), r.prescreen,
        r.minBits)
    }

  def scrubPlain(text: String): (String, Map[String, Int]) = {
    val (out, arr) = scrubPlainArray(text)
    (out, patterns.map(_._1).zip(arr).toMap)
  }

  /** Hot-path twin of [[scrubPlain]]: counts as a primitive array in
    * [[patterns]] order (a per-row Map costs catalyst MapData encoding in
    * the scoring stage; the user-facing Map is assembled once at the
    * verdict sink).
    */
  def scrubPlainArray(text: String): (String, Array[Int]) = {
    var out = text
    val counts = new Array[Int](patterns.length)
    var idx = 0
    compiled.foreach { case (_, p, r, pre, minBits) =>
      if (pre.forall(lit => out.indexOf(lit) >= 0)) {
        // single matcher pass: count and replace together; entropy-gated
        // rules skip non-qualifying matches (no appendReplacement ⇒ the
        // skipped region flows through verbatim), sharing the same kernel
        // as the Column route so the twin guarantee holds by construction
        val m = p.matcher(out)
        var n = 0
        var sb: java.lang.StringBuilder = null
        while (m.find()) {
          if (minBits.forall(b => graft.functions.SecretEntropy
            .qualifies(out, m.start, m.end, b))) {
            if (n == 0) sb = new java.lang.StringBuilder(out.length)
            n += 1
            m.appendReplacement(sb, r)
          }
        }
        if (n > 0) { m.appendTail(sb); out = sb.toString }
        counts(idx) = n
      } // else: prescreen literal absent ⇒ pattern can't match ⇒ 0
      idx += 1
    }
    (out, counts)
  }

  def hasDropSecret(text: String): Boolean =
    compiledDrop.exists { case (_, p, pre, minBits) =>
      pre.forall(text.contains(_)) && {
        val m = p.matcher(text)
        var found = false
        while (!found && m.find())
          found = minBits.forall(b => graft.functions.SecretEntropy
            .qualifies(text, m.start, m.end, b))
        found
      }
    }
}

/** Declarative scrub configuration + the default chain. The engine never
  * hardcodes a pattern list: [[Scrub.default]] is itself compiled from
  * [[Scrub.defaultConfig]] through the same parser a user-supplied config
  * goes through.
  *
  * Config format — one rule per line, `#` comments, blank lines ignored:
  * {{{
  *   scrub <id> family=<fam> replace=<text> [pre=<literal>] [minBits=<b>] pattern=<regex>
  *   drop  <id> family=<fam>                [pre=<literal>] [minBits=<b>] pattern=<regex>
  * }}}
  * `pattern=` consumes the REST OF THE LINE (regexes may contain spaces,
  * `=`, anything), so it must come last. Declaration order is application
  * order. `minBits=` makes the rule entropy-gated: a match only fires when
  * the Shannon entropy over its characters reaches the threshold — the
  * high-entropy secret detector for keys without a known prefix.
  */
object Scrub {

  /** The default chain: PII + secrets (as before) + a toxicity lexicon
    * family (north_star "PII/toxicity scrubbing") + entropy-gated secret
    * rules for keys WITHOUT a known prefix (the public truffleHog-style
    * heuristic: hex runs >= 3.0 bits of char entropy, base64 runs >= 4.5).
    * The lexicon is a small public-wordlist-shaped seed (LDNOOBW-style);
    * production configs are expected to extend it — which is the point of
    * the declarative format. Toxicity has no safe prescreen literal
    * (case-insensitive word alternation), so it always pays its regex pass.
    * Entropy rules run LAST among scrubs: prefix-keyed secrets (AKIA, xox,
    * eyJ) are consumed by their specific rules first, so the generic
    * detectors only see what those left behind.
    */
  val defaultConfig: String =
    """# id            family    action
      |scrub email family=pii replace=<EMAIL> pre=@ pattern=[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}
      |scrub aws_key family=secret replace=<AWS_KEY> pre=AKIA pattern=AKIA[0-9A-Z]{16}
      |scrub slack_token family=secret replace=<TOKEN> pre=xox pattern=xox[baprs]-[0-9A-Za-z-]{10,}
      |scrub ipv4 family=pii replace=<IP> pattern=\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b
      |scrub jwt family=secret replace=<JWT> pre=eyJ pattern=eyJ[A-Za-z0-9_-]{10,}\.[A-Za-z0-9_-]{10,}\.[A-Za-z0-9_-]{5,}
      |scrub toxicity family=toxicity replace=<TOX> pattern=(?i)\b(?:fuck\w*|shit\w*|bitch\w*|asshole|bastard|cunt|dickhead)\b
      |scrub hex_secret family=secret replace=<SECRET:HEX> minBits=3.0 pattern=\b[0-9a-fA-F]{24,}\b
      |scrub b64_secret family=secret replace=<SECRET:B64> minBits=4.5 pattern=[A-Za-z0-9+/]{24,}={0,2}
      |drop private_key family=secret pre=-----BEGIN pattern=-----BEGIN [A-Z ]*PRIVATE KEY-----
      |""".stripMargin

  /** Parse a declarative scrub config. Fails fast (IllegalArgumentException)
    * on: unknown action, missing family/pattern, `replace=` on a drop rule
    * or missing on a scrub rule, duplicate ids, and regexes that do not
    * compile — a config error must kill the job at submit time, not
    * mid-corpus.
    */
  def parse(text: String): Seq[ScrubRule] = {
    def fail(line: String, why: String): Nothing =
      throw new IllegalArgumentException(s"scrub config: $why in line [$line]")
    val rules = text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        val patIdx = line.indexOf("pattern=")
        if (patIdx < 0) fail(line, "missing pattern=")
        val pattern = line.substring(patIdx + "pattern=".length)
        if (pattern.isEmpty) fail(line, "empty pattern")
        try java.util.regex.Pattern.compile(pattern)
        catch {
          case e: java.util.regex.PatternSyntaxException =>
            fail(line, s"bad regex (${e.getDescription})")
        }
        val head = line.substring(0, patIdx).trim.split("\\s+").toSeq
        if (head.length < 2) fail(line, "expected: <action> <id> key=value...")
        val action = head(0)
        if (action != "scrub" && action != "drop")
          fail(line, s"unknown action '$action' (want scrub|drop)")
        val id = head(1)
        val kvs = head.drop(2).map { t =>
          val i = t.indexOf('=')
          if (i <= 0) fail(line, s"expected key=value, got '$t'")
          t.substring(0, i) -> t.substring(i + 1)
        }.toMap
        kvs.keySet.diff(Set("family", "replace", "pre", "minBits")).foreach(k =>
          fail(line, s"unknown key '$k'"))
        val family = kvs.getOrElse("family", fail(line, "missing family="))
        val drop = action == "drop"
        if (drop && kvs.contains("replace"))
          fail(line, "drop rules take no replace=")
        val replacement =
          if (drop) ""
          else kvs.getOrElse("replace", fail(line, "scrub rules need replace="))
        val minBits = kvs.get("minBits").map { v =>
          v.toDoubleOption.filter(b => b > 0.0 && !b.isNaN).getOrElse(
            fail(line, s"minBits must be a positive number, got '$v'"))
        }
        ScrubRule(id, family, pattern, replacement, kvs.get("pre"), drop,
          minBits)
      }.toVector
    val dups = rules.groupBy(_.id).collect { case (id, rs) if rs.sizeIs > 1 => id }
    if (dups.nonEmpty)
      throw new IllegalArgumentException(
        s"scrub config: duplicate rule ids ${dups.mkString(", ")}")
    rules
  }

  def scrubber(configText: String): Scrubber = new Scrubber(parse(configText))

  /** The default chain the pipeline runs. */
  val default: Scrubber = scrubber(defaultConfig)

  // ---- static facade over the default chain (pre-declarative API) --------

  def rules: Seq[ScrubRule] = default.rules
  def patterns: Seq[(String, String, String)] = default.patterns
  def dropPatterns: Seq[(String, String)] = default.dropPatterns
  def families: Map[String, String] = default.families
  def countCols(content: Column): Seq[(String, Column)] = default.countCols(content)
  def scrubCol(content: Column): Column = default.scrubCol(content)
  def dropCols(content: Column): Seq[(String, Column)] = default.dropCols(content)
  def scrubPlain(text: String): (String, Map[String, Int]) = default.scrubPlain(text)
  def scrubPlainArray(text: String): (String, Array[Int]) = default.scrubPlainArray(text)
  def hasDropSecret(text: String): Boolean = default.hasDropSecret(text)
}
