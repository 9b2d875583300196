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
  * @param preAny      case-INSENSITIVE (ASCII fold, matching java (?i)
  *                    without UNICODE_CASE) any-of literal prescreen: the
  *                    regex is skipped unless one of these words appears.
  *                    For alternation rules like the toxicity lexicon,
  *                    where no single `pre=` literal is implied by every
  *                    branch. Like `pre=`, it must be a NECESSARY condition
  *                    of the pattern — prescreens may only skip work, never
  *                    change output (PropertySpec fuzzes this).
  * @param preScan     named built-in prescreen scan. Supported:
  *                    "digit.digit" — a digit, '.', digit triple exists
  *                    (necessary for any IPv4-shaped match). Cheaper than
  *                    any literal for patterns with no fixed substring.
  */
final case class ScrubRule(
    id: String,
    family: String,
    pattern: String,
    replacement: String,
    prescreen: Option[String],
    drop: Boolean,
    minBits: Option[Double] = None,
    preAny: Seq[String] = Nil,
    preScan: Option[String] = None)

/** Compiled prescreen: a cheap necessary-condition scan that skips a rule's
  * regex pass when the text cannot match. Conservative by contract — a hit
  * only means "run the regex", so false positives cost time, never
  * correctness; false negatives are bugs (PropertySpec fuzzes equivalence
  * against unprescreened chains).
  */
private[filter] sealed trait Prescreen extends Serializable {
  def hit(s: String): Boolean
}
private[filter] object Prescreen {
  case object Always extends Prescreen {
    def hit(s: String): Boolean = true
  }
  final case class Literal(lit: String) extends Prescreen {
    def hit(s: String): Boolean = s.indexOf(lit) >= 0
  }
  /** ASCII-case-insensitive any-of-words scan: first-char dispatch table
    * (both cases), then regionMatches(ignoreCase) per candidate word.
    * regionMatches' Unicode fold is a superset of java (?i)'s ASCII fold on
    * ASCII words, so hits stay conservative.
    */
  final case class AnyOfCI(words: Seq[String]) extends Prescreen {
    // parse() already rejects these; guard direct construction too — a
    // non-ASCII or empty word could never hit the ASCII dispatch table, so
    // the prescreen would silently stop being a necessary condition (a
    // false NEGATIVE, i.e. skipped scrubs — a correctness bug, not a slow
    // path)
    require(words.nonEmpty && words.forall(w => w.nonEmpty && w.forall(_ < 128)),
      s"AnyOfCI words must be non-empty ASCII, got: ${words.mkString("|")}")
    @transient private lazy val byFirst: Array[Array[String]] = {
      val m = new Array[Array[String]](128)
      words.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.foreach { w =>
        val c = w.charAt(0)
        m(c) = if (m(c) == null) Array(w) else m(c) :+ w
      }
      m
    }
    def hit(s: String): Boolean = {
      val n = s.length
      var i = 0
      while (i < n) {
        var c = s.charAt(i)
        if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
        if (c < 128) {
          val ws = byFirst(c)
          if (ws != null) {
            var k = 0
            while (k < ws.length) {
              val w = ws(k)
              if (i + w.length <= n && s.regionMatches(true, i, w, 0, w.length))
                return true
              k += 1
            }
          }
        }
        i += 1
      }
      false
    }
  }
  /** digit '.' digit exists — necessary for any `[0-9]{1,3}(\.[0-9]...)`
    * shaped match.
    */
  case object DigitDotDigit extends Prescreen {
    def hit(s: String): Boolean = {
      val n = s.length
      var i = 1
      while (i < n - 1) {
        if (s.charAt(i) == '.' &&
          { val a = s.charAt(i - 1); a >= '0' && a <= '9' } &&
          { val b = s.charAt(i + 1); b >= '0' && b <= '9' }) return true
        i += 1
      }
      false
    }
  }
  val scanNames: Set[String] = Set("digit.digit")
  def of(r: ScrubRule): Prescreen =
    r.preScan match {
      case Some("digit.digit") => DigitDotDigit
      case Some(other) => throw new IllegalArgumentException(
        s"unknown prescan '$other'") // parse() validates; belt and braces
      case None =>
        if (r.preAny.nonEmpty) AnyOfCI(r.preAny)
        else r.prescreen.map(Literal.apply).getOrElse(Always)
    }
}

/** A compiled, ordered scrub chain. Rules are applied in DECLARED order —
  * scrubbing must be deterministic across partitionings so retained-content
  * sha256s are stable (SURVEY.md §7 hard part (b)). Both the Spark path
  * (`regexp_replace`/`regexp_count`, which compile to java.util.regex) and
  * the JVM twin `scrubPlain` share the same pattern strings, so their
  * outputs are byte-identical by construction; tests assert it anyway.
  */
final class Scrubber(val rules: Seq[ScrubRule]) extends Serializable {

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
    // optional fields append only when present (minBits bare — its shipped
    // form; newer fields tagged), so every pre-entropy chain's canon (and
    // thus Runner.LegacyR3ScrubFp) and every pre-prescan chain's canon is
    // stable
    val canon = rules.map(r => (Seq(r.id, r.family, r.pattern, r.replacement,
      r.prescreen.getOrElse(""), r.drop.toString) ++
      r.minBits.map(_.toString) ++
      (if (r.preAny.nonEmpty) Seq("preAny=" + r.preAny.mkString("|")) else Nil) ++
      r.preScan.map("prescan=" + _)).mkString("\u0001"))
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

  // entropy (minBits) rules route through SecretEntropy.scrubCount (literal
  // replacement, scanner fast path when the pattern is a recognized run
  // shape, its own compiled-regex cache otherwise) — the SAME kernel the
  // Column route calls, so the twin guarantee is one code path and the
  // java.util.regex Pattern is never consulted here: None, not dead work.
  // Plain rules keep java $-group semantics (same as regexp_replace).
  private val compiled =
    rules.filterNot(_.drop).map { r =>
      val p = if (r.minBits.isDefined) None
      else Some(java.util.regex.Pattern.compile(r.pattern))
      (r.id, p, r.replacement, Prescreen.of(r), r.minBits, r.pattern)
    }
  private val compiledDrop =
    rules.filter(_.drop).map { r =>
      val p = if (r.minBits.isDefined) None
      else Some(java.util.regex.Pattern.compile(r.pattern))
      (r.id, p, Prescreen.of(r), r.minBits, r.pattern)
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
    compiled.foreach { case (_, p, r, pre, minBits, patStr) =>
      minBits match {
        case Some(b) =>
          // fused count+scrub through the shared kernel (scanner fast path
          // for recognized run shapes, single matcher pass otherwise);
          // literal replacement on both paths, same as the Column route
          if (pre.hit(out)) {
            val (nout, n) = graft.functions.SecretEntropy
              .scrubCount(out, patStr, r, b)
            out = nout
            counts(idx) = n
          }
        case None =>
          if (pre.hit(out)) {
            // single matcher pass: count and replace together; the
            // prescreen is a necessary condition of the pattern, so a
            // miss means zero matches by construction. p is Some by
            // construction when minBits is empty (see `compiled`).
            val m = p.get.matcher(out)
            var n = 0
            var sb: java.lang.StringBuilder = null
            while (m.find()) {
              if (n == 0) sb = new java.lang.StringBuilder(out.length)
              n += 1
              m.appendReplacement(sb, r)
            }
            if (n > 0) { m.appendTail(sb); out = sb.toString }
            counts(idx) = n
          } // else: prescreen miss ⇒ pattern can't match ⇒ 0
      }
      idx += 1
    }
    (out, counts)
  }

  def hasDropSecret(text: String): Boolean =
    compiledDrop.exists { case (_, p, pre, minBits, patStr) =>
      minBits match {
        case Some(b) =>
          pre.hit(text) &&
            graft.functions.SecretEntropy.countAll(text, patStr, b) > 0
        case None =>
          pre.hit(text) && p.get.matcher(text).find()
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
  *   scrub <id> family=<fam> replace=<text> [prescreen] [minBits=<b>] pattern=<regex>
  *   drop  <id> family=<fam>                [prescreen] [minBits=<b>] pattern=<regex>
  *   prescreen := pre=<literal> | preAny=<w1|w2|...> | prescan=<name>
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
    * the declarative format. Toxicity carries a `preAny=` case-insensitive
    * any-of-stems prescreen (no single literal is implied by the
    * alternation); ipv4 carries the `prescan=digit.digit` built-in (no
    * literal exists at all) — both skip the regex pass on the overwhelming
    * majority of files. Entropy rules run LAST among scrubs: prefix-keyed
    * secrets (AKIA, xox, eyJ) are consumed by their specific rules first,
    * so the generic detectors only see what those left behind; their
    * candidate patterns take the [[graft.functions.SecretEntropy]] run-
    * scanner fast path (no regex engine at all).
    */
  val defaultConfig: String =
    """# id            family    action
      |scrub email family=pii replace=<EMAIL> pre=@ pattern=[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}
      |scrub aws_key family=secret replace=<AWS_KEY> pre=AKIA pattern=AKIA[0-9A-Z]{16}
      |scrub slack_token family=secret replace=<TOKEN> pre=xox pattern=xox[baprs]-[0-9A-Za-z-]{10,}
      |scrub ipv4 family=pii replace=<IP> prescan=digit.digit pattern=\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b
      |scrub jwt family=secret replace=<JWT> pre=eyJ pattern=eyJ[A-Za-z0-9_-]{10,}\.[A-Za-z0-9_-]{10,}\.[A-Za-z0-9_-]{5,}
      |scrub toxicity family=toxicity replace=<TOX> preAny=fuck|shit|bitch|asshole|bastard|cunt|dickhead pattern=(?i)\b(?:fuck\w*|shit\w*|bitch\w*|asshole|bastard|cunt|dickhead)\b
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
        kvs.keySet.diff(Set("family", "replace", "pre", "minBits", "preAny",
          "prescan")).foreach(k => fail(line, s"unknown key '$k'"))
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
        val preAny = kvs.get("preAny").map { v =>
          val words = v.split('|').toSeq.filter(_.nonEmpty)
          if (words.isEmpty) fail(line, "preAny needs at least one word")
          // the AnyOfCI scan dispatches on ASCII first chars and folds
          // ASCII case — non-ASCII words would silently never prescreen
          words.foreach(w => if (w.exists(_ >= 128))
            fail(line, s"preAny words must be ASCII, got '$w'"))
          words
        }.getOrElse(Nil)
        val preScan = kvs.get("prescan").map { v =>
          if (!Prescreen.scanNames(v))
            fail(line, s"unknown prescan '$v' " +
              s"(supported: ${Prescreen.scanNames.toSeq.sorted.mkString(", ")})")
          v
        }
        if (Seq(kvs.contains("pre"), preAny.nonEmpty, preScan.nonEmpty)
          .count(identity) > 1)
          fail(line, "at most one of pre=/preAny=/prescan= per rule")
        ScrubRule(id, family, pattern, replacement, kvs.get("pre"), drop,
          minBits, preAny, preScan)
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
