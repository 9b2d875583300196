package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.checks.Checks
import graft.model._

/** Batch check lifecycle ≈ the reference's `dataCheck` (GQ:664-804):
  * take a parsed ruleset, compile each family, execute, and publish the
  * three audit tables — check_Result (one row per rule, GQ:283-299),
  * check_Detail (bounded violation samples, GQ:322-332) and code_Detail
  * (offending code values, GQ:576-584) — with per-batch staging + marker
  * publish standing in for the reference's volatile-table isolation
  * (GQ:665-676, Iceberg snapshot commit at production scale).
  */
object CheckRunner {

  /** Resolves a rule's table name to a DataFrame (catalog stand-in). */
  type Tables = String => DataFrame

  /** Compile one rule against the resolver. CustomRule/ExpectedCountRule
    * carry their transform; relational rules dispatch to [[Checks]].
    */
  def compile(rule: Rule, tables: Tables): CheckPlan = rule match {
    case r: PkRule => Checks.pk(r, tables(r.table))
    case r: FkRule => Checks.fk(r, tables(r.table), tables(r.fatherTable))
    case r: FcRule => Checks.fc(r, tables(r.table), tables(r.fatherTable))
    case r: ZcRule => Checks.zc(r, tables(r.table))
    case r: DomainRule => Checks.domain(r, tables(r.table))
    case r: CodeTableRule => Checks.codeTable(r, tables(r.table), tables(r.codeTable))
    case r: CustomRule => Checks.custom(r, tables(r.table))
    case r: ExpectedCountRule => Checks.expectedCount(r, tables(r.table))
  }

  /** check_Detail normalization: every detail frame padded to the fixed
    * checkColumn1..10 + sampleCnt shape of the reference (GQ:322-332),
    * prefixed with rule identity. Domain-rule details go to code_Detail
    * instead (cdeVal shape, GQ:576-584).
    */
  private def normalizeDetail(rule: Rule, detail: DataFrame): DataFrame = {
    val present = detail.columns.toSet
    val fcInd = if (present.contains("fcInd")) col("fcInd")
    else lit("") // 'C'/'F' only for FC checks (GQ:1509)
    val keyCols = (1 to Checks.MaxSampleCols).map { i =>
      val n = s"checkColumn$i"
      (if (present.contains(n)) col(n).cast("string")
       else lit(null).cast("string")).as(n)
    }
    val sample = (if (present.contains("sampleCnt")) col("sampleCnt")
    else lit(1L)).cast("long").as("sampleCnt")
    // dbNm/tabNm split the same way check_Result does (GQ:322-332 carries
    // DBNm+TabNm in check_Detail too) — a qualified rule must join its
    // detail rows on the same (checkId, tabNm) key as its result row
    detail.select(
      lit(rule.id).as("checkId") +: lit(rule.dbNm).as("dbNm") +:
        lit(rule.tabNm).as("tabNm") +:
        fcInd.cast("string").as("fcInd") +: keyCols :+ sample: _*)
  }

  final case class BatchOutput(
      results: Seq[CheckResult],
      checkDetail: Option[DataFrame],
      codeDetail: Option[DataFrame])

  /** UC/UU detail frames carry the user transform's own columns; the
    * reference pivots that colList positionally into checkColumn1..N
    * (ucDetailSQL GQ:629-642, reused for UU GQ:3140) — replicate by
    * positional rename, capped at 10 and stringified. Kept separate from
    * Checks.sampleProjection on purpose: that one parses NAMES as
    * expressions (expr) for rule key lists; this one must take the frame's
    * columns verbatim (col), whatever characters they contain.
    */
  private def pivotColumns(detail: DataFrame): DataFrame =
    detail.select(detail.columns.take(Checks.MaxSampleCols).zipWithIndex
      .map { case (c, i) => col(c).cast("string").as(s"checkColumn${i + 1}") }
      .toIndexedSeq: _*)

  /** Execute all enabled rules. Detail capture follows the reference:
    * key-shaped checks AND custom UC/UU result samples → check_Detail,
    * domain checks → code_Detail.
    */
  def runBatch(spark: SparkSession, batchId: String, rules: Seq[Rule],
      tables: Tables): BatchOutput = {
    val enabled = rules.filter(_.enabled)
    val plans = enabled.map(r => r -> compile(r, tables))
    val results = Checks.run(spark, batchId, plans.map(_._2))
    val (codeRules, keyRules) = plans.partition(_._1.isInstanceOf[DomainRule])
    val checkDetail = keyRules
      .map {
        case (r, p) if r.isInstanceOf[CustomRule] ||
          r.isInstanceOf[ExpectedCountRule] =>
          normalizeDetail(r, pivotColumns(p.detail))
        case (r, p) => normalizeDetail(r, p.detail)
      }
      .reduceOption(_ unionByName _)
    val codeDetail = codeRules.map { case (r, p) =>
      p.detail.select(lit(r.id).as("checkId"), lit(r.dbNm).as("dbNm"),
        lit(r.tabNm).as("tabNm"), col("cdeVal"), col("sampleCnt"))
    }.reduceOption(_ unionByName _)
    BatchOutput(results, checkDetail, codeDetail)
  }

  final case class BatchSummary(
      config: String, batchId: String, skipped: Boolean, nRules: Int)

  /** Walk a test-case config directory × run manifest ≈ the reference's
    * `__main__` (GQ:3347-3357: os.walk over 测试案例文件, fan out each file
    * over its batchIds). Directory layout:
    *   manifest.txt   — `configFile = batchId1,batchId2` lines (BIC:2-59)
    *   params.txt     — optional `${VAR}` map (DBParams.txt)
    *   codes.txt      — optional SA code dictionary ([[graft.config.CodeDict]])
    *   <configFile>   — rule lines, one file per manifest entry; a manifest
    *                    entry naming a DIRECTORY loads as a reference-shaped
    *                    10-sheet workbook instead ([[graft.config.Workbook]])
    * Each (config × batchId) compiles with `BATCHID` added to the var map
    * (the reference substituted `${BATCHID}` into its volatile-table DDL,
    * GQ:665-669) and publishes to `outDir/config=<name>/batch=<id>`.
    * Already-published batches are SKIPPED before any compute (resume).
    */
  def orchestrateDir(spark: SparkSession, configDir: String, tables: Tables,
      outDir: String,
      stores: SnapshotStore.Binding = SnapshotStore.parquetMarkers): Seq[BatchSummary] = {
    import java.nio.file.{Files, Paths}
    import graft.config.{CodeDict, RuleConfig}
    def readOpt(name: String): Option[String] = {
      val p = Paths.get(configDir, name)
      if (Files.exists(p)) Some(Files.readString(p)) else None
    }
    val manifest = RuleConfig.parseManifest(readOpt("manifest.txt")
      .getOrElse(throw new IllegalArgumentException(
        s"$configDir/manifest.txt not found")))
    val vars = readOpt("params.txt").map(RuleConfig.parseVars)
      .getOrElse(Map.empty[String, String])
    val dict = readOpt("codes.txt").map(CodeDict.parse)
      .getOrElse(Map.empty[String, Set[String]])
    for {
      (name, batchIds) <- manifest.toSeq.sortBy(_._1)
      b <- batchIds
    } yield {
      val dir = s"$outDir/config=$name"
      if (stores(spark, s"$dir/batch=$b").isDone("check_result"))
        BatchSummary(name, b, skipped = true, 0)
      else {
        val p = Paths.get(configDir, name)
        val rules =
          if (Files.isDirectory(p))
            graft.config.Workbook.parse(p.toString, vars + ("BATCHID" -> b),
              dict, tables = Some(tables)).rules
          else {
            val text = readOpt(name).getOrElse(
              throw new IllegalArgumentException(
                s"manifest names missing config file: $configDir/$name"))
            RuleConfig.parse(text, vars + ("BATCHID" -> b), dict,
              tables = Some(tables))
          }
        val out = runBatch(spark, b, rules, tables)
        publish(spark, dir, b, out, stores)
        BatchSummary(name, b, skipped = false, out.results.length)
      }
    }
  }

  /** Publish a batch's audit tables under `outDir/batch=<id>/` with a
    * completion marker (staged, resumable — the volatile→permanent INSERT
    * of GQ:770-787). Re-running a published batch is a no-op.
    *
    * ORDER MATTERS: check_result is staged LAST because its marker is the
    * batch-completion predicate (used by the early return here and by
    * [[orchestrateDir]]'s resume skip). Detail tables go first, so a crash
    * mid-publish leaves the batch resumable — a re-run re-stages whatever
    * is missing and only then seals the batch. Staging check_result first
    * would make a half-published batch look complete and silently lose its
    * detail tables forever.
    */
  def publish(spark: SparkSession, outDir: String, batchId: String,
      out: BatchOutput,
      stores: SnapshotStore.Binding = SnapshotStore.parquetMarkers): Unit = {
    import spark.implicits._
    val store = stores(spark, s"$outDir/batch=$batchId")
    if (store.isDone("check_result")) return
    out.checkDetail.foreach(d => store.stage("check_detail")(d))
    out.codeDetail.foreach(d => store.stage("code_detail")(d))
    store.stage("check_result")(out.results.toDS().toDF())
  }
}
