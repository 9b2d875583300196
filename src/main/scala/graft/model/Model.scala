package graft.model

import org.apache.spark.sql.{Column, DataFrame}

/** Core data model for the quality-check / quality-filter engine.
  *
  * Recasts the reference's rule taxonomy (9 check families, constants at
  * DataQualityCheck_GenerateSQL.py:43-59) as a typed Scala ADT. Rules carry
  * column NAMES and declarative parameters — they compile to Catalyst
  * `Column` expressions / `Dataset` transforms, never to SQL strings
  * (BASELINE.json north_star: "no string-templated SQL").
  */

/** One row of the source-code corpus (BASELINE.json input_hint). */
case class FileRow(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Per-file verdict emitted by the quality-filter pipeline.
  * `contentSha256` is computed on the ORIGINAL (unscrubbed) content so the
  * retained-row sha256 invariant vs the reference can be asserted
  * (input_hint: "per-row invariant vs the reference: content sha256
  * equality").
  */
case class FileVerdict(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    keep: Boolean,
    dropReasons: Seq[String],
    scrubbedContent: String,
    scrubCounts: Map[String, Int],
    contentSha256: String)

/** Audit row ≈ reference check_Result (GQ:283-299), typed. FLOAT counts in
  * Teradata become Long here; cast at the sink if needed.
  *
  * Operational fields mirror the reference insert: `runDate` (DATE,
  * GQ:285), `checkStartTime`/`checkEndTime` (the reference stamps
  * `CAST(DATE AS FORMAT 'YYYY-MM-DD')||' '||TIME`, GQ:1355), `dbNm`
  * (resolved from a qualified table name), and `reproRule` — the repro
  * artifact ≈ `QuerySQL` (GQ:298,1343, quoted at GQ:1361). The reference
  * stored the generated SQL so an operator could re-run a check by hand;
  * the Spark engine never generates SQL, so the honest analogue is the
  * serialized declarative rule line ([[graft.config.RuleConfig.render]]),
  * which `RuleConfig.parse` turns back into the same compiled check.
  */
case class CheckResult(
    checkId: String,
    runDate: String, // yyyy-MM-dd (UTC)
    batchId: String,
    checkStartTime: String, // "yyyy-MM-dd HH:mm:ss" (UTC)
    checkEndTime: String,
    dbNm: String,
    tabNm: String,
    colNm: String,
    checkType: String,
    checkResultInd: String, // "Y" pass / "N" fail / "" not-applicable (GQ:300-317)
    allRowCnt: Long,
    failedRowCnt: Long,
    reproRule: String, // serialized rule ≈ QuerySQL repro artifact
    description: String)

/** Per-partition/per-rule lineage row (north_rule: "per-partition lineage
  * rows (rule id, rows scanned, violations, scrub counts)").
  */
case class LineageRow(
    runId: String,
    stage: String,
    ruleId: String,
    rowsScanned: Long,
    violations: Long,
    scrubCount: Long)

/** Rule families, mirroring the reference's checkType constants (GQ:43-59).
  * PK=uniqueness, FK=referential, FC=parent-child bidirectional,
  * ZC=zipper-chain interval overlap, PC/SC/VC=code-value domains,
  * UC=custom (run-and-record), UU=custom with expected count.
  */
sealed trait Rule {
  def id: String
  def table: String
  def enabled: Boolean
  def description: String
  /** "db.tab" → "db"; unqualified → "" (reference dbNm, resolved through
    * `${PDATA}`/`${SDATA}` indirection GQ:1198-1201 — here the `${VAR}`
    * substitution happens at parse time, so the rule carries the final name).
    */
  final def dbNm: String = Rule.splitTable(table)._1
  /** "db.tab" → "tab"; unqualified → table. */
  final def tabNm: String = Rule.splitTable(table)._2
}

object Rule {
  /** THE table-qualification rule — every consumer (audit rows, SC
    * dictionary keys, parquet resolvers) splits the same way.
    */
  def splitTable(t: String): (String, String) = {
    val i = t.indexOf('.')
    if (i > 0) (t.substring(0, i), t.substring(i + 1)) else ("", t)
  }
}

/** PK uniqueness (GQ:1189-1393). `keyCols` may be column names or
  * expression strings parsed by `functions.expr` — the reference allowed
  * `COALESCE(col,'') as alias` entries (GQ:19,234); here expressions stay
  * typed Columns and no alias stripping is ever needed.
  */
final case class PkRule(
    id: String,
    table: String,
    keyCols: Seq[String],
    where: Option[String] = None,
    enabled: Boolean = true,
    description: String = "") extends Rule

/** FK referential integrity (GQ:1602-1833 foreignKeyCheck2).
  * Child key list may be wider than the father's — reference truncates to
  * father arity (GQ:1649-1651); we replicate that in the check.
  * Reference NOT-IN semantics are made null-safe by convention via
  * `coalesce(col,'')<>''` guards (GQ:356-358) — `emptyGuard=true` replicates.
  */
final case class FkRule(
    id: String,
    table: String,
    keyCols: Seq[String],
    fatherTable: String,
    fatherCols: Seq[String],
    where: Option[String] = None,
    fatherWhere: Option[String] = None,
    emptyGuard: Boolean = true,
    broadcastFather: Boolean = false,
    enabled: Boolean = true,
    description: String = "") extends Rule

/** Parent-child bidirectional containment (GQ:1840-2074).
  * `emptyGuard` mirrors [[FkRule.emptyGuard]] on BOTH sides: the
  * reference's `coalesce(col,'')<>''` convention keeps null/empty keys out
  * of NOT-IN checks — without it a nullable key becomes a violation via
  * left-anti semantics, diverging from NOT IN.
  */
final case class FcRule(
    id: String,
    table: String,
    keyCols: Seq[String],
    fatherTable: String,
    fatherCols: Seq[String],
    where: Option[String] = None,
    fatherWhere: Option[String] = None,
    emptyGuard: Boolean = true,
    enabled: Boolean = true,
    description: String = "") extends Rule

/** Zipper-chain (SCD-2) adjacent-interval overlap (GQ:2660-2860).
  * Implemented with a window lag instead of the reference's
  * row_number self-join — same semantics, one shuffle instead of two.
  */
final case class ZcRule(
    id: String,
    table: String,
    keyCols: Seq[String],
    startCol: String,
    endCol: String,
    orderTiebreak: Seq[String] = Nil,
    where: Option[String] = None,
    enabled: Boolean = true,
    description: String = "",
    /** true = hot-key-safe path (range-partitioned local lag + boundary
      * merge, [[graft.checks.Checks.zcSkewSafe]]) for tables where one key
      * owns a dominant share of rows — a plain key-partitioned window would
      * make that key a single straggler task */
    hotKeySafe: Boolean = false) extends Rule

/** Code-value domain against a literal value list (VC, GQ:2484-2655) or a
  * dictionary (SC, GQ:2294-2476). `isEmptyGuard` ≈ reference isEmpty='Y':
  * empty/null values are exempt (`coalesce(col,'')<>''`, GQ:565-574).
  * `family` keeps VC and SC distinguishable in the audit table (the
  * reference reports them as separate checkTypes); SC rules get their
  * `values` from the SA code dictionary ([[graft.config.CodeDict]],
  * readSdataCode3 semantics GQ:3308-3344) at parse time.
  */
final case class DomainRule(
    id: String,
    table: String,
    col: String,
    values: Set[String],
    isEmptyGuard: Boolean = true,
    where: Option[String] = None,
    enabled: Boolean = true,
    description: String = "",
    family: String = "VC") extends Rule

/** PDM code domain (PC, GQ:2082-2286): anti-join against a code-dimension
  * table, broadcast (north_rule: "broadcast joins for code-value
  * dictionaries"). Composite codes = multi-column join keys (GQ:20).
  */
final case class CodeTableRule(
    id: String,
    table: String,
    keyCols: Seq[String],
    codeTable: String,
    codeCols: Seq[String],
    isEmptyGuard: Boolean = true,
    where: Option[String] = None,
    enabled: Boolean = true,
    description: String = "") extends Rule

/** Custom check (UC, GQ:2868-3033): run a user transform, record the result,
  * no pass/fail verdict (reference emits failedCnt = -1, GQ:3001).
  * The reference's "user SQL" escape hatch becomes a typed transform.
  */
final case class CustomRule(
    id: String,
    table: String,
    transform: DataFrame => DataFrame,
    enabled: Boolean = true,
    description: String = "",
    /** declarative source of `transform` when config-built (e.g.
      * "filter=...; select=...") — the piece that makes the audit row's
      * reproRule round-trippable; empty for hand-written transforms */
    exprInfo: String = "",
    /** user check sub-type; audit checkType = "UC-<ugcType>" when set
      * (GQ:2983 'UC-'+ugcType) */
    ugcType: String = "") extends Rule

/** Custom rule with expected count (UU, GQ:3041-3224): verdict N iff
  * result count != expected (GQ:3159,3176-3177; default expected 0).
  */
final case class ExpectedCountRule(
    id: String,
    table: String,
    transform: DataFrame => DataFrame,
    expected: Long = 0L,
    enabled: Boolean = true,
    description: String = "",
    /** declarative source of `transform` when config-built (see
      * [[CustomRule.exprInfo]]) */
    exprInfo: String = "",
    /** audit checkType = "UU-<ugcType>" when set (GQ:3188) */
    ugcType: String = "") extends Rule

/** Compiled check: everything downstream consumers need, all lazy
  * DataFrames (nothing executed until an action). ≈ SURVEY.md §3.3.
  */
final case class CheckPlan(
    rule: Rule,
    /** rows (or groups) violating the rule */
    violations: DataFrame,
    /** one row (all_cnt: long, failed_cnt: long) — the scalar-cross-join
      * verdict assembly of the reference (O13, GQ:300-317), as a lazy plan */
    countsDf: DataFrame,
    /** bounded violation sample, deterministic ordering (≈ SAMPLE 50/500) */
    detail: DataFrame) {
  def counts(): (Long, Long) = {
    val r = countsDf.head()
    (r.getLong(0), r.getLong(1))
  }
}

object Verdict {
  /** CASE WHEN failedRowCnt=0 THEN 'Y' WHEN >0 THEN 'N' ELSE '' END
    * (GQ:300-317). -1 = "ran, no verdict" (UC, GQ:3001).
    */
  def of(failed: Long): String =
    if (failed == 0L) "Y" else if (failed > 0L) "N" else ""
}
