package graft.filter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII / secret scrubbing via declarative regex patterns (north_rule:
  * "regex-driven PII/toxicity scrubbing (emails, keys, secrets)").
  *
  * Patterns are applied in a FIXED declared order — scrubbing must be
  * deterministic across partitionings so retained-content sha256s are
  * stable (SURVEY.md §7 hard part (b)). Both the Spark path
  * (`regexp_replace`/`regexp_count`, which compile to java.util.regex) and
  * the JVM twin `scrubPlain` share the same pattern strings, so their
  * outputs are byte-identical by construction; tests assert it anyway.
  */
object Scrub {

  /** (rule id, java-regex pattern, replacement). Order matters. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("aws_key", "AKIA[0-9A-Z]{16}", "<AWS_KEY>"),
    ("slack_token", "xox[baprs]-[0-9A-Za-z-]{10,}", "<TOKEN>"),
    ("ipv4", "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    ("jwt", "eyJ[A-Za-z0-9_-]{10,}\\.[A-Za-z0-9_-]{10,}\\.[A-Za-z0-9_-]{5,}",
      "<JWT>"))

  /** Secrets that cannot be safely scrubbed in place → whole-file drop.
    * (id, pattern, prescreen literal implied by the pattern — null-safe
    * fast path like [[prescreens]]).
    */
  val dropPatterns: Seq[(String, String)] = Seq(
    ("private_key", "-----BEGIN [A-Z ]*PRIVATE KEY-----"))

  private val dropPrescreens: Map[String, String] = Map(
    "private_key" -> "-----BEGIN")

  /** Per-pattern match-count columns (lineage: "scrub counts"). Each
    * pattern is counted against the text AFTER the preceding patterns have
    * been applied — the same progressive semantics as [[scrubPlain]], so
    * e.g. an IP consumed by the email pattern is not double-counted.
    */
  def countCols(content: Column): Seq[(String, Column)] = {
    var cur = content
    patterns.map { case (id, p, r) =>
      val c = s"scrub_$id" -> regexp_count(cur, lit(p))
      cur = regexp_replace(cur, lit(p), lit(r))
      c
    }
  }

  /** The scrubbed content: ordered regexp_replace chain, one projection. */
  def scrubCol(content: Column): Column =
    patterns.foldLeft(content) { case (c, (_, p, r)) =>
      regexp_replace(c, lit(p), lit(r))
    }

  /** Drop-rule columns for unsalvageable secrets. */
  def dropCols(content: Column): Seq[(String, Column)] =
    dropPatterns.map { case (id, p) => id -> content.rlike(p) }

  // ---- plain-JVM twin (used by the fused pipeline pass and test oracles) -

  /** Literal substring implied by each pattern — a cheap indexOf prescreen
    * that skips the regex entirely when the literal is absent (most files
    * carry no PII, so this is the common case). null = no safe prescreen.
    */
  private val prescreens: Map[String, String] = Map(
    "email" -> "@", "aws_key" -> "AKIA", "slack_token" -> "xox",
    "jwt" -> "eyJ")

  private lazy val compiled =
    patterns.map { case (id, p, r) =>
      (id, java.util.regex.Pattern.compile(p), r, prescreens.get(id))
    }
  private lazy val compiledDrop =
    dropPatterns.map { case (id, p) =>
      (id, java.util.regex.Pattern.compile(p), dropPrescreens.get(id))
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
    compiled.foreach { case (_, p, r, pre) =>
      if (pre.forall(lit => out.indexOf(lit) >= 0)) {
        // single matcher pass: count and replace together
        val m = p.matcher(out)
        var n = 0
        var sb: java.lang.StringBuilder = null
        while (m.find()) {
          if (n == 0) sb = new java.lang.StringBuilder(out.length)
          n += 1
          m.appendReplacement(sb, r)
        }
        if (n > 0) { m.appendTail(sb); out = sb.toString }
        counts(idx) = n
      } // else: prescreen literal absent ⇒ pattern can't match ⇒ 0
      idx += 1
    }
    (out, counts)
  }

  def hasDropSecret(text: String): Boolean =
    compiledDrop.exists { case (_, p, pre) =>
      pre.forall(text.contains(_)) && p.matcher(text).find()
    }
}
