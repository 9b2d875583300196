package graft.checks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model._

/** The nine check families of the reference (SURVEY.md §2.1, O1-O14),
  * re-expressed as declarative Dataset/Column transforms. No SQL strings are
  * templated — Catalyst gets whole plans and optimizes them (predicate
  * pushdown, partial aggregation, broadcast selection, AQE).
  *
  * Scale notes (100 TB / 1000 executors):
  *  - PK: one hash-aggregate pass computes allRowCnt + failedRowCnt together
  *    (the reference ran the same SQL twice and complained about it,
  *    GQ:575 "为什么同样的SQL要跑两遍"). Partial aggregation halves shuffle
  *    volume; AQE handles skewed keys.
  *  - FK/PC: left-anti join; dictionary-sized fathers broadcast
  *    (north_rule), big fathers use shuffle-hash (preferSortMergeJoin=false)
  *    because the build side (distinct father keys) is far smaller than the
  *    probe side and sorting 100 TB of child keys is wasted work.
  *  - ZC: window lag — one shuffle; the reference's row_number self-join
  *    (GQ:491-509) would shuffle the table twice and join it to itself.
  *  - details are LIMIT-ed (50/500 ≈ GQ:185,593) so the driver never
  *    collects unbounded violation sets.
  */
object Checks {

  val KeySampleCap = 50 // sampleNbr, GQ:185
  val CodeSampleCap = 500 // hardcoded, GQ:593,610
  val MaxSampleCols = 10 // checkColumn1..10 guard, GQ:1267-1277

  private def applyWhere(df: DataFrame, where: Option[String]): DataFrame =
    where.fold(df)(w => df.filter(expr(w)))

  /** Empty/null conflation guard Teradata-style: coalesce(col,'')<>''
    * (GQ:568, GQ:2181-2183). Applied per key column when a rule asks for it.
    */
  private def nonEmpty(c: Column): Column =
    coalesce(c.cast("string"), lit("")) =!= ""

  /** Guard a frame on the given key expressions, but only where the guard
    * can matter: for string-typed keys it is coalesce(col,'')<>''; for any
    * other type '' never occurs, so the semantic equivalent is a plain
    * isNotNull — which pushes down to the scan instead of forcing a
    * cast-to-string filter over every row (visible in explain() as a
    * PushedFilter vs an unpushable Condition).
    */
  private def guardKeys(df: DataFrame, keyExprs: Seq[String]): DataFrame =
    keyExprs.foldLeft(df) { (d, k) =>
      val dt = d.select(expr(k)).schema.head.dataType
      if (dt == org.apache.spark.sql.types.StringType) d.filter(nonEmpty(expr(k)))
      else d.filter(expr(k).isNotNull)
    }

  /** checkColumn1..N detail projection (GQ:1273-1277), capped at 10. */
  private def sampleProjection(cols: Seq[String]): Seq[Column] =
    cols.take(MaxSampleCols).zipWithIndex.map { case (c, i) =>
      expr(c).cast("string").as(s"checkColumn${i + 1}")
    }

  // ---- O2/O3: PK uniqueness ----------------------------------------------

  def pk(rule: PkRule, df0: DataFrame): CheckPlan = {
    val df = applyWhere(df0, rule.where)
    // alias key expressions so expression keys ("coalesce(k,'')") survive
    // into the grouped output — the reference needed an alias-strip regex
    // for this (GQ:234,1209-1213); typed Columns just carry a name
    val keys = rule.keyCols.zipWithIndex.map { case (c, i) =>
      expr(c).as(s"checkColumn${i + 1}")
    }
    val grouped = df.groupBy(keys: _*).agg(count(lit(1)).as("dup_cnt"))
    val dupGroups = grouped.filter(col("dup_cnt") > 1)
    // single aggregation pass → both counters (fixes GQ:575's double scan)
    val countsDf = grouped.agg(
      coalesce(sum(col("dup_cnt")), lit(0L)).as("all_cnt"),
      coalesce(sum(when(col("dup_cnt") > 1, col("dup_cnt"))), lit(0L))
        .as("failed_cnt"))
    val nKeys = math.min(rule.keyCols.length, MaxSampleCols)
    val keyRefs = (1 to nKeys).map(i => col(s"checkColumn$i"))
    val detail = dupGroups
      .select((1 to nKeys).map(i =>
        col(s"checkColumn$i").cast("string").as(s"checkColumn$i")) :+
        col("dup_cnt").as("sampleCnt"): _*)
      .orderBy(col("sampleCnt").desc +: keyRefs: _*)
      .limit(KeySampleCap)
    CheckPlan(rule, dupGroups, countsDf, detail)
  }

  /** Row-level PK violation flag (for keep/drop pipelines): true when the
    * row's key occurs more than once. Window count over the key partition.
    */
  def pkViolationCol(keyCols: Seq[String]): Column =
    count(lit(1)).over(Window.partitionBy(keyCols.map(expr): _*)) > 1

  // ---- O4/O5: FK referential ---------------------------------------------

  /** Child keys truncated to father arity (GQ:1649-1651). */
  private def fkKeys(childCols: Seq[String], fatherCols: Seq[String])
      : Seq[(String, String)] =
    childCols.zip(fatherCols) // zip truncates to the shorter list

  def fk(rule: FkRule, child0: DataFrame, father0: DataFrame): CheckPlan = {
    val keys = fkKeys(rule.keyCols, rule.fatherCols)
    val child = applyWhere(child0, rule.where)
    val father = applyWhere(father0, rule.fatherWhere)
    // guard replicates the reference's `col<>''` convention around NOT IN
    val guarded =
      if (rule.emptyGuard) guardKeys(child, keys.map(_._1))
      else child
    // father keys renamed to avoid child/father name collisions.
    // Join strategy (north_rule): dictionary-sized father → broadcast;
    // otherwise hint shuffle-hash — the build side (distinct father keys)
    // is far smaller than the probe side, and sort-merge would sort the
    // entire child table for nothing. AQE can still upgrade to broadcast
    // at runtime if the father turns out tiny.
    val fatherKeys0 = father
      .select(keys.map { case (_, f) => expr(f).as(s"__fk_$f") }: _*).distinct()
    val fatherKeys =
      if (rule.broadcastFather) broadcast(fatherKeys0)
      else fatherKeys0.hint("shuffle_hash")
    val cond = keys.map { case (c, f) => expr(c) === fatherKeys(s"__fk_$f") }
      .reduce(_ && _)
    val orphans = guarded.join(fatherKeys, cond, "left_anti")
    // scalar cross join of the two counts ≈ reference's ON 1=1 (O13)
    val countsDf = guarded.agg(count(lit(1)).as("all_cnt"))
      .crossJoin(orphans.agg(count(lit(1)).as("failed_cnt")))
    val detail = orphans
      .groupBy(keys.map { case (c, _) => expr(c) }: _*)
      .agg(count(lit(1)).as("sampleCnt"))
      .select(sampleProjection(keys.map(_._1)) :+ col("sampleCnt"): _*)
      .orderBy(col("sampleCnt").desc +: (1 to math.min(keys.length,
        MaxSampleCols)).map(i => col(s"checkColumn$i")): _*)
      .limit(KeySampleCap)
    CheckPlan(rule, orphans, countsDf, detail)
  }

  // ---- O6: FC bidirectional ----------------------------------------------

  def fc(rule: FcRule, child0: DataFrame, father0: DataFrame): CheckPlan = {
    val keys = fkKeys(rule.keyCols, rule.fatherCols)
    // coalesce(col,'')<>'' guard on BOTH sides (the reference convention
    // around NOT IN, GQ:2181-2183) — null/empty keys are exempt, not orphans
    val child0g =
      if (rule.emptyGuard) guardKeys(child0, keys.map(_._1)) else child0
    val father0g =
      if (rule.emptyGuard) guardKeys(father0, keys.map(_._2)) else father0
    val child = applyWhere(child0g, rule.where)
    val father = applyWhere(father0g, rule.fatherWhere)
    // key sets renamed on BOTH sides: expression keys parse via expr() (the
    // reference's COALESCE(col,'') convention) and a same-table parent/child
    // rule can't produce ambiguous self-join attributes
    val childKeys = child
      .select(keys.zipWithIndex.map { case ((c, _), i) =>
        expr(c).as(s"__fc_c$i") }: _*).distinct()
    val fatherKeys = father
      .select(keys.zipWithIndex.map { case ((_, f), i) =>
        expr(f).as(s"__fc_f$i") }: _*).distinct()
    val fwdCond = keys.zipWithIndex.map { case ((c, _), i) =>
      expr(c) === fatherKeys(s"__fc_f$i") }.reduce(_ && _)
    val revCond = keys.zipWithIndex.map { case ((_, f), i) =>
      expr(f) === childKeys(s"__fc_c$i") }.reduce(_ && _)
    val fwd = child.join(fatherKeys, fwdCond, "left_anti") // child w/o father
    val rev = father.join(childKeys, revCond, "left_anti") // father w/o child
    // samples tagged 'C' (child-side orphan) / 'F' (father-side), GQ:1974,1980
    val fwdD = fwd.select(lit("C").as("fcInd") +: sampleProjection(keys.map(_._1)): _*)
    val revD = rev.select(lit("F").as("fcInd") +: sampleProjection(keys.map(_._2)): _*)
    val viol = fwdD.unionByName(revD)
    val countsDf = child.agg(count(lit(1)).as("c_all"))
      .crossJoin(father.agg(count(lit(1)).as("f_all")))
      .crossJoin(fwd.agg(count(lit(1)).as("c_fail")))
      .crossJoin(rev.agg(count(lit(1)).as("f_fail")))
      .select((col("c_all") + col("f_all")).as("all_cnt"),
        (col("c_fail") + col("f_fail")).as("failed_cnt"))
    val detail = viol
      .groupBy(viol.columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("sampleCnt"))
      .orderBy(col("sampleCnt").desc +: viol.columns.map(col).toIndexedSeq: _*)
      .limit(KeySampleCap)
    CheckPlan(rule, viol, countsDf, detail)
  }

  // ---- O7: zipper-chain interval overlap ---------------------------------

  def zc(rule: ZcRule, df0: DataFrame): CheckPlan = {
    if (rule.hotKeySafe) return zcSkewSafe(rule, df0)
    val df = applyWhere(df0, rule.where)
    val orderCols = (rule.startCol +: rule.orderTiebreak).map(expr)
    val w = Window.partitionBy(rule.keyCols.map(expr): _*).orderBy(orderCols: _*)
    val withPrev = df.withColumn("prev_end", lag(expr(rule.endCol), 1).over(w))
    val viol = withPrev.filter(
      col("prev_end").isNotNull && expr(rule.startCol) < col("prev_end"))
    val countsDf = withPrev.agg(
      count(lit(1)).as("all_cnt"),
      coalesce(sum(when(col("prev_end").isNotNull &&
        expr(rule.startCol) < col("prev_end"), 1L)), lit(0L)).as("failed_cnt"))
    val projCols = rule.keyCols ++ Seq(rule.startCol, rule.endCol)
    val detail = viol
      .select(sampleProjection(projCols) :+ lit(1L).as("sampleCnt"): _*)
      .orderBy((1 to math.min(projCols.length, MaxSampleCols))
        .map(i => col(s"checkColumn$i")): _*)
      .limit(KeySampleCap)
    CheckPlan(rule, viol, countsDf, detail)
  }

  /** Hot-key-safe ZC: the plain path's `Window.partitionBy(keyCols)` puts
    * an entire key in ONE task, so a mega-entity's SCD history (90% of the
    * table under one key) becomes a single straggler at scale. Overlap
    * checking only needs each row's PREDECESSOR in (key, start, tiebreak)
    * order, so the total order can be RANGE-partitioned — a hot key spreads
    * over many partitions — and solved in two bounded pieces:
    *
    *   1. local lag inside each (key, range-partition) segment — the window
    *      partition is bounded by the range-partition size (~n/P rows),
    *      never by the key's row count;
    *   2. a segment-summary pass (first start, last end per segment; at
    *      most P rows PER KEY, however hot) window-lagged in range order —
    *      partition ids of `repartitionByRange` are ordered, so segment
    *      `i+1`'s first row's true predecessor is segment `i`'s last row.
    *
    * Every row's predecessor is checked exactly once (same-segment rows by
    * the local lag, each segment's first row by the boundary pass), so the
    * counts equal the plain path's — asserted cross-path in ChecksSpec.
    */
  def zcSkewSafe(rule: ZcRule, df0: DataFrame, numPartitions: Int = 0)
      : CheckPlan = {
    val df = applyWhere(df0, rule.where)
    val nKeys = rule.keyCols.length
    val proj = df.select(
      rule.keyCols.zipWithIndex.map { case (k, i) => expr(k).as(s"__zc_k$i") } ++
        Seq(expr(rule.startCol).as("__zc_start"),
          expr(rule.endCol).as("__zc_end")) ++
        rule.orderTiebreak.zipWithIndex.map { case (t, i) =>
          expr(t).as(s"__zc_t$i") }: _*)
    val keyRefs = (0 until nKeys).map(i => col(s"__zc_k$i"))
    val tbRefs = rule.orderTiebreak.indices.map(i => col(s"__zc_t$i"))
    val orderRefs = col("__zc_start") +: tbRefs
    val p =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val withPid = proj.repartitionByRange(p, keyRefs ++ orderRefs: _*)
      .withColumn("__pid", spark_partition_id())
    // (1) local lag: window partitions are (key, range-partition) segments
    val wLocal = Window.partitionBy(keyRefs :+ col("__pid"): _*)
      .orderBy(orderRefs: _*)
    val local = withPid
      .withColumn("prev_end", lag(col("__zc_end"), 1).over(wLocal))
    val localViol =
      col("prev_end").isNotNull && col("__zc_start") < col("prev_end")
    // (2) boundary pass over segment summaries (≤ P rows per key).
    // __first_start must be the start of the segment's FIRST ROW IN ORDER,
    // not min(start): nulls sort first, so a segment whose first row has a
    // null start has first_start = NULL (min() would skip it and compare
    // the smallest NON-null start — counting a boundary violation the
    // plain path's `null < prev_end` never does). count(col) counts
    // non-nulls, so "any null start present" ⇔ the in-order first row is
    // a null-start row.
    val seg = withPid.groupBy(keyRefs :+ col("__pid"): _*)
      .agg(when(count(col("__zc_start")) < count(lit(1)), lit(null))
          .otherwise(min(col("__zc_start"))).as("__first_start"),
        max_by(col("__zc_end"), struct(orderRefs: _*)).as("__last_end"))
    val wSeg = Window.partitionBy(keyRefs: _*).orderBy(col("__pid"))
    val boundaryViol = seg
      .withColumn("__prev_last_end", lag(col("__last_end"), 1).over(wSeg))
      .filter(col("__prev_last_end").isNotNull &&
        col("__first_start") < col("__prev_last_end"))
    val countsDf = local.agg(
        count(lit(1)).as("all_cnt"),
        coalesce(sum(when(localViol, 1L)), lit(0L)).as("__lv"))
      .crossJoin(boundaryViol.agg(count(lit(1)).as("__bv")))
      .select(col("all_cnt"), (col("__lv") + col("__bv")).as("failed_cnt"))
    // violations = local violators ∪ the boundary segments' first rows.
    // The first row is recovered by row_number=1 in the SAME window the
    // local lag uses — exactly one row per boundary segment (joining on
    // start == first_start instead would return every row tying on the
    // minimal start, double-reporting ties that are also local
    // violations). Boundary sets are violation-sized → broadcast.
    val bSel = boundaryViol.select(
      keyRefs.zipWithIndex.map { case (k, i) => k.as(s"__b_k$i") } :+
        col("__pid").as("__b_pid"): _*)
    val bCond = ((0 until nKeys).map(i =>
      col(s"__zc_k$i") <=> col(s"__b_k$i")) :+
      (col("__pid") === col("__b_pid"))).reduce(_ && _)
    val firstRows = withPid
      .withColumn("__rn", row_number().over(wLocal))
      .filter(col("__rn") === 1).drop("__rn")
    val bRows = firstRows.join(broadcast(bSel), bCond, "left_semi")
    val viol = local.filter(localViol).drop("prev_end").unionByName(bRows)
    val projCols = keyRefs ++ Seq(col("__zc_start"), col("__zc_end"))
    val nSample = math.min(projCols.length, MaxSampleCols)
    val detail = viol
      .select(projCols.take(MaxSampleCols).zipWithIndex.map { case (c, i) =>
        c.cast("string").as(s"checkColumn${i + 1}") } :+
        lit(1L).as("sampleCnt"): _*)
      .orderBy((1 to nSample).map(i => col(s"checkColumn$i")): _*)
      .limit(KeySampleCap)
    CheckPlan(rule, viol, countsDf, detail)
  }

  // ---- O8/O9: code-value domain (VC/SC) ----------------------------------

  /** String-typed columns compare against the literal values verbatim; a
    * NUMERIC column compares numerically (value "1.0" matches column value
    * 1) — the reference compared strings in Teradata, which implicitly
    * casts the quoted list to the column's numeric type (GQ:2482,2566-2575);
    * a verbatim string compare would silently diverge ("1" vs "1.0").
    *
    * The numeric compare happens in a LOSSLESS domain per column type —
    * never through double, whose 53-bit mantissa would let distinct BIGINT/
    * DECIMAL codes above 2^53 spuriously match (a false PASS):
    *  - integral columns compare as long (byte→long widening is exact);
    *    rule values with a fractional part or outside long range can never
    *    match and leave the probe set;
    *  - decimal columns compare as exact decimal literals, dropping values
    *    not representable at the column's precision/scale;
    *  - float/double columns compare as double (the column itself is
    *    already approximate — no exactness to lose).
    * Every dropped value is WARNed, never silently ignored.
    */
  def domainViolationCol(rule: DomainRule,
      dt: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.StringType): Column = {
    import org.apache.spark.sql.types._
    def warnDropped(v: String): Unit =
      System.err.println(s"[Checks] WARN: ${rule.family} rule '${rule.id}' " +
        s"value '$v' is not representable in column type ${dt.simpleString}" +
        " — it can never match and was dropped from the probe set")
    def parsed(v: String): Option[BigDecimal] = {
      val r = scala.util.Try(BigDecimal(v.trim)).toOption
      if (r.isEmpty) warnDropped(v)
      r
    }
    def numericCheck(c: Column, lits: Seq[Column]): Column = {
      val notInSet = if (lits.isEmpty) lit(true) else !c.isin(lits: _*)
      // '' never occurs in a numeric column: the guard degenerates to
      // isNotNull (which pushes down to the scan)
      if (rule.isEmptyGuard) c.isNotNull && notInSet
      else notInSet || c.isNull
    }
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        val longs = rule.values.toSeq.flatMap { v =>
          val l = parsed(v).filter { bd =>
            val ok = bd.isWhole && bd.isValidLong
            if (!ok) warnDropped(v)
            ok
          }.map(_.toLong)
          l
        }
        numericCheck(expr(rule.col).cast("long"), longs.map(lit(_)))
      case d: DecimalType =>
        val decs = rule.values.toSeq.flatMap { v =>
          parsed(v).filter { bd =>
            val n = bd.underlying.stripTrailingZeros
            val ok = n.scale <= d.scale &&
              (n.precision - n.scale) <= (d.precision - d.scale)
            if (!ok) warnDropped(v)
            ok
          }
        }
        numericCheck(expr(rule.col),
          decs.map(bd => lit(bd.underlying.setScale(d.scale)).cast(d)))
      case _: NumericType => // float/double — approximate by nature
        val nums = rule.values.toSeq.flatMap(parsed).map(_.toDouble)
        numericCheck(expr(rule.col).cast("double"), nums.map(lit(_)))
      case _ =>
        val c = expr(rule.col).cast("string")
        // big value sets become Catalyst InSet (O(1) probe) automatically
        val notInSet =
          if (rule.values.isEmpty) lit(true) // missing dict key ⇒ everything fails (GQ:2346-2347 semantics: empty set)
          else !c.isin(rule.values.toSeq: _*)
        if (rule.isEmptyGuard) nonEmpty(c) && notInSet
        else notInSet || c.isNull
    }
  }

  def domain(rule: DomainRule, df0: DataFrame): CheckPlan = {
    val df = applyWhere(df0, rule.where)
    val dt = df.select(expr(rule.col)).schema.head.dataType
    val violCol = domainViolationCol(rule, dt)
    val viol = df.filter(violCol)
    val countsDf = df.agg(
      count(lit(1)).as("all_cnt"),
      coalesce(sum(when(violCol, 1L)), lit(0L)).as("failed_cnt"))
    // offending values + counts, SAMPLE 500 → code_Detail (GQ:576-626)
    val detail = viol.groupBy(expr(rule.col).cast("string").as("cdeVal"))
      .agg(count(lit(1)).as("sampleCnt"))
      .orderBy(col("sampleCnt").desc, col("cdeVal"))
      .limit(CodeSampleCap)
    CheckPlan(rule, viol, countsDf, detail)
  }

  // ---- O10: PDM code-table domain (PC) -----------------------------------

  def codeTable(rule: CodeTableRule, df0: DataFrame, dim0: DataFrame)
      : CheckPlan = {
    val keys = fkKeys(rule.keyCols, rule.codeCols)
    val df = applyWhere(df0, rule.where)
    val guarded =
      if (rule.isEmptyGuard) guardKeys(df, keys.map(_._1))
      else df
    // code dictionaries are small by construction → always broadcast
    val dimKeys = broadcast(
      dim0.select(keys.map { case (_, f) => expr(f).as(s"__pc_$f") }: _*)
        .distinct())
    val cond = keys.map { case (c, f) => expr(c) === dimKeys(s"__pc_$f") }
      .reduce(_ && _)
    val viol = guarded.join(dimKeys, cond, "left_anti")
    val countsDf = guarded.agg(count(lit(1)).as("all_cnt"))
      .crossJoin(viol.agg(count(lit(1)).as("failed_cnt")))
    // detail carries checkColumnN names so the batch runner's check_Detail
    // normalization keeps the offending code values
    val nKeys = math.min(keys.length, MaxSampleCols)
    val keyRefs = (1 to nKeys).map(i => col(s"checkColumn$i"))
    val detail = viol
      .groupBy(keys.take(MaxSampleCols).zipWithIndex.map { case ((c, _), i) =>
        expr(c).cast("string").as(s"checkColumn${i + 1}") }: _*)
      .agg(count(lit(1)).as("sampleCnt"))
      .orderBy(col("sampleCnt").desc +: keyRefs: _*)
      .limit(CodeSampleCap)
    CheckPlan(rule, viol, countsDf, detail)
  }

  // ---- O11/O12: custom transforms ----------------------------------------

  def custom(rule: CustomRule, df: DataFrame): CheckPlan = {
    val out = rule.transform(df)
    // reference: run + record, verdict blank, failedCnt -1 (GQ:2972,3001)
    val countsDf = out.agg(count(lit(1)).as("all_cnt"))
      .withColumn("failed_cnt", lit(-1L))
    CheckPlan(rule, out, countsDf, out.limit(KeySampleCap))
  }

  def expectedCount(rule: ExpectedCountRule, df: DataFrame): CheckPlan = {
    val out = rule.transform(df)
    // failedCnt = count - expected (GQ:3159); verdict N iff != 0
    val countsDf = out.agg(count(lit(1)).as("all_cnt"))
      .select(col("all_cnt"), (col("all_cnt") - rule.expected).as("failed_cnt"))
    CheckPlan(rule, out, countsDf, out.limit(KeySampleCap))
  }

  // ---- runner: plans → audit rows (O13/O14) ------------------------------

  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
  private val dateFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd").withZone(java.time.ZoneOffset.UTC)

  /** Execute compiled plans into check_Result-shaped audit rows.
    *
    * All rules' (all_cnt, failed_cnt) frames are tagged with their plan
    * index and UNIONed into ONE Spark action — a 100-rule batch is one job
    * whose branches the scheduler runs concurrently, not 100 serialized
    * driver round-trips (the reference analogue: all rules flowed through
    * one bteq stream, GQ:713-768).
    *
    * Timestamps: because the batch executes as one fused job, every rule's
    * checkStartTime/checkEndTime is the job window (the reference stamped
    * per-statement DATE||TIME inside that one stream, GQ:1355 — same
    * granularity in practice). `clock` is injectable for deterministic
    * tests.
    */
  def run(spark: SparkSession, batchId: String, plans: Seq[CheckPlan],
      clock: () => java.time.Instant = () => java.time.Instant.now())
      : Seq[CheckResult] = {
    if (plans.isEmpty) return Nil
    val start = clock()
    // every countsDf is one (all_cnt, failed_cnt) row — tag and union
    val fused = plans.zipWithIndex.map { case (p, i) =>
      p.countsDf.select(lit(i).as("rule_idx"),
        col("all_cnt").cast("long").as("all_cnt"),
        col("failed_cnt").cast("long").as("failed_cnt"))
    }.reduce(_ unionByName _)
    val byIdx = fused.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val end = clock()
    val (startTs, endTs) = (tsFmt.format(start), tsFmt.format(end))
    val runDate = dateFmt.format(start)

    plans.zipWithIndex.map { case (p, i) =>
      val (all, failed) = byIdx(i)
      val verdict = p.rule match {
        case _: CustomRule => "" // UC never passes judgement
        case _: ExpectedCountRule => if (failed == 0L) "Y" else "N"
        case _ => Verdict.of(failed)
      }
      val (tpe, colNm) = p.rule match {
        case r: PkRule => ("PK", r.keyCols.mkString(","))
        case r: FkRule => ("FK", r.keyCols.mkString(","))
        case r: FcRule => ("FC", r.keyCols.mkString(","))
        case r: ZcRule => ("ZC", (r.keyCols ++ Seq(r.startCol, r.endCol)).mkString(","))
        case r: DomainRule => (r.family, r.col) // first-class SC vs VC
        case r: CodeTableRule => ("PC", r.keyCols.mkString(","))
        // 'UC-'+ugcType / 'UU-'+ugcType (GQ:2983,3188)
        case r: CustomRule =>
          (if (r.ugcType.nonEmpty) s"UC-${r.ugcType}" else "UC", "")
        case r: ExpectedCountRule =>
          (if (r.ugcType.nonEmpty) s"UU-${r.ugcType}" else "UU", "")
      }
      CheckResult(p.rule.id, runDate, batchId, startTs, endTs,
        p.rule.dbNm, p.rule.tabNm, colNm, tpe, verdict, all, failed,
        graft.config.RuleConfig.render(p.rule), p.rule.description)
    }
  }
}
