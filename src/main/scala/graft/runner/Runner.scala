package graft.runner

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{array_contains, coalesce, col, count, lit, sum, when}
import graft.corpus.CorpusGen
import graft.filter.QualityPipeline
import graft.model.{FileRow, FileVerdict, LineageRow}

/** Resumable end-to-end run of the quality-filter pipeline over a corpus,
  * with staged checkpoints and lineage/metrics publication — the Spark
  * recast of the reference's batch lifecycle (SURVEY.md §3.1): per-batch
  * isolation via staged writes, atomic-ish publish, audit rows at the end.
  */
object Runner {

  final case class RunReport(
      runId: String,
      rows: Long,
      kept: Long,
      lineage: Seq[LineageRow])

  /** Opt-in benchmark-decontamination stage config: the eval set to probe
    * (small by nature — its shingle set broadcasts), the column holding
    * its text, and the n-gram/threshold knobs (defaults = the published
    * 8-gram / single-collision recipe).
    */
  final case class DeconConfig(
      benchmark: DataFrame,
      textCol: String = "text",
      n: Int = 8,
      minHits: Int = 1,
      /** Bloom-prefiltered probe for eval sets too big to broadcast
        * exactly — byte-identical output, so deliberately NOT part of the
        * resume seal (checkpoints from either route interchange).
        */
      bloom: Boolean = false) {
    /** Order-independent content fingerprint of the eval set — sealed into
      * the work dir so a resume against a DIFFERENT benchmark refuses
      * instead of silently reusing stale decontamination verdicts.
      */
    def fingerprint: String = {
      val row = benchmark.select(org.apache.spark.sql.functions
        .sum(org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col(textCol))).as("s"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("c")).head()
      val s = if (row.isNullAt(0)) 0L else row.getLong(0)
      f"$s%016x-${row.getLong(1)}"
    }
  }

  /** Opt-in corpus-boilerplate removal stage config (C4-style): lines in
    * at least `minDocs` distinct kept documents are removed everywhere.
    */
  final case class BoilerplateConfig(
      minDocs: Long,
      maxLines: Int = 1000,
      minTrimmedLen: Int = 4)

  /** Opt-in URL/domain hygiene gate config (round-4 verdict item 7): the
    * source column canonicalizes to its registrable domain; listed domains
    * drop ("url_blocked"), and at most `domainCap` kept rows per domain
    * survive ("domain_capped"). See [[QualityPipeline.gateByUrl]].
    */
  final case class UrlGateConfig(
      urlCol: String = "repo",
      blocklist: Seq[String] = Nil,
      domainCap: Option[Int] = None) {
    /** Content seal: order-independent blocklist hash + the knobs. */
    def seal: String = {
      val h = java.security.MessageDigest.getInstance("SHA-256")
        .digest(blocklist.sorted.mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(6).map(b => f"$b%02x").mkString
      s"gate(col=$urlCol,blocklist=$h,cap=${domainCap.getOrElse(0)})"
    }
  }

  /** Opt-in distribution-drift monitoring config (round-4 verdict item 7).
    * Every flagged run PUBLISHES its own slim stats frame (`drift_stats`
    * stage: nChars as `v`, `lang`) so the next run can baseline against
    * it; with `baselinePath` set, the run additionally computes PSI over
    * nChars and the max language-share delta vs that baseline and emits
    * them as drift lineage rows (fixed-point ×1e6 in the `violations`
    * slot — LineageRow is integral by design) plus a 0/1 `psi_alert` row
    * against `psiAlert`. Monitoring only: drift never flips verdicts.
    */
  final case class DriftConfig(
      baselinePath: Option[String] = None,
      bounds: Seq[Double] = DriftConfig.DefaultBounds,
      psiAlert: Double = 0.2)
  object DriftConfig {
    /** nChars bucket boundaries sized to the corpus's 150-1200-char docs. */
    val DefaultBounds: Seq[Double] = Seq(200.0, 400.0, 600.0, 800.0, 1000.0)
  }

  /** Run (or resume) the pipeline. Stages:
    *   1. "annotated" — scored + rule-annotated frame (the expensive pass)
    *   2. "verdicts"  — narrowed keep/drop output (the published dataset)
    *   3. lineage parquet — per-rule and per-partition metrics
    * A crash between stages resumes from the last completed marker.
    */
  def run(spark: SparkSession, files: Dataset[FileRow], commitsDim: DataFrame,
      workDir: String, runId: String,
      cfg: QualityPipeline.Config = QualityPipeline.Config(),
      /** opt-in transitive NEAR-DUP dedup stage after the exact one —
        * adds a "verdicts_exact" checkpoint so the fuzzy stage reads a
        * materialized frame (its MinHash builder consumes it repeatedly) */
      nearDup: Option[graft.dedup.Dedup.MinHashConfig] = None,
      /** opt-in trained-classifier gate (threshold): after the dedup
        * stages, a logistic model is DISTILLED from this run's own
        * verdict labels (deterministic hash-ordered sample, driver GD)
        * and kept rows scoring below the threshold flip to "clf_low" —
        * the CCNet-style rules→model bootstrap */
      classifierGate: Option[Double] = None,
      /** opt-in benchmark decontamination after the dedup stages (and
        * before the classifier gate): kept rows colliding with the eval
        * set's n-gram shingles flip to "decontaminated" */
      decontaminate: Option[DeconConfig] = None,
      /** opt-in corpus-boilerplate removal after the dedup stages (and
        * before decontamination): lines shared by ≥ minDocs kept documents
        * are removed everywhere; gutted rows flip to "boilerplate_only" */
      boilerplate: Option[BoilerplateConfig] = None,
      /** opt-in code-stats gate (The Stack/StarCoder source-file filters)
        * BEFORE the dedup stages — row-pure and map-side-cheap, so every
        * row it drops is a row MinHash never shingles; kept rows failing
        * the composition flip to "code_stats" */
      codeGate: Boolean = false,
      /** opt-in notebook→script ingestion BEFORE scoring: .ipynb rows that
        * parse as nbformat-4 are rewritten to scripts with the kernel
        * language (see [[QualityPipeline.convertNotebooks]]) */
      nbConvert: Boolean = false,
      /** opt-in language backfill BEFORE scoring: rows with an empty
        * stated lang get the path/shebang-derived language (see
        * [[QualityPipeline.backfillLanguages]]) */
      langDetect: Boolean = false,
      /** opt-in URL/domain hygiene gate BEFORE the dedup stages (with the
        * code gate): blocklisted domains drop, per-domain cap enforced */
      urlGate: Option[UrlGateConfig] = None,
      /** opt-in drift monitoring: publish this run's stats frame; when a
        * baseline path is set, emit PSI/categorical drift lineage vs it */
      driftBaseline: Option[DriftConfig] = None,
      /** snapshot-store binding — parquet+markers here; an Iceberg
        * binding is a drop-in swap (see [[SnapshotStore]]) */
      stores: SnapshotStore.Binding = SnapshotStore.parquetMarkers): RunReport = {
    import spark.implicits._
    val store = stores(spark, workDir)

    // resume guard: checkpoints computed under a different dedup setting
    // must never be silently reused (a 'verdicts' checkpoint short-circuits
    // the nearDup branch entirely) — the run config is sealed into the
    // store on first run and every resume must match it
    guardRunConfig(store, workDir,
      renderRunConfig(nearDup, classifierGate, decontaminate, boilerplate,
        codeGate, nbConvert, langDetect, urlGate, driftBaseline,
        storeKindOf(stores)))

    def stage(name: String)(compute: => DataFrame): DataFrame =
      store.stage(name)(compute)

    // ingest transforms rewrite content/lang but never identity, so the
    // dup-key aggregation keeps scanning the ORIGINAL pruned key
    // projection (no from_json in the 3-column scan)
    val ingested0 =
      if (nbConvert) QualityPipeline.convertNotebooks(files) else files
    val ingested =
      if (langDetect) QualityPipeline.backfillLanguages(ingested0)
      else ingested0
    // ingest lineage: ONE extra aggregate over the pre-transform frame,
    // pruned to (path, lang, ipynb content) — only paid when a flag is on
    val ingestLineage: Seq[LineageRow] =
      if (!nbConvert && !langDetect) Nil
      else {
        val isNb = graft.text.CodeLang.extension(col("path")) === "ipynb" &&
          graft.text.Notebook.cells(col("content")).isNotNull
        val r = files.toDF().select(
          coalesce(sum(when(isNb, 1L)), lit(0L)).as("nb"),
          coalesce(sum(when(col("lang").isNull || col("lang") === "", 1L)),
            lit(0L)).as("lf"),
          count(lit(1)).as("n")).head()
        (if (nbConvert) Seq(LineageRow(runId, "ingest", "nb_convert",
          r.getLong(2), r.getLong(0), 0L)) else Nil) ++
          (if (langDetect) Seq(LineageRow(runId, "ingest", "lang_detect",
            r.getLong(2), r.getLong(1), 0L)) else Nil)
      }

    val annotated = stage("annotated") {
      QualityPipeline.annotate(QualityPipeline.score(ingested), commitsDim,
        cfg, rawKeys = Some(files.toDF().select("repo", "path", "commit")))
    }
    // scoped: the near-dup builders' internal caches are released when the
    // stage's write completes, without evicting any other consumer's frames
    val verdictsDf = graft.util.Caches.scoped {
      stage("verdicts") {
        val ruleVerdicts = QualityPipeline.verdicts(annotated)
        // code gate FIRST (when on): row-pure and map-side, so it shrinks
        // everything downstream — dedup never shingles a row it drops
        val gated0 =
          if (codeGate) QualityPipeline.gateByCodeStats(ruleVerdicts)
          else ruleVerdicts
        // url gate with the code gate, BEFORE dedup: blocked/capped rows
        // are rows MinHash never shingles
        val gated = urlGate match {
          case None => gated0
          case Some(u) => QualityPipeline.gateByUrl(gated0, u.urlCol,
            u.blocklist, u.domainCap)
        }
        // content-dedup after filtering: one survivor per distinct content
        val exact = QualityPipeline.dedupByContent(gated).toDF()
        val deduped = nearDup match {
          case None => exact
          case Some(mh) =>
            val staged = stage("verdicts_exact")(exact)
            QualityPipeline.dedupNearDup(staged.as[FileVerdict], mh).toDF()
        }
        val boiled = boilerplate match {
          case None => deduped
          case Some(bp) =>
            // materialize pre-boiler: the stage consumes its input twice
            // (lexicon pass + rewrite)
            val staged = stage("verdicts_preboiler")(deduped)
            QualityPipeline.removeBoilerplate(staged.as[FileVerdict],
              bp.minDocs, bp.maxLines, bp.minTrimmedLen).toDF()
        }
        val decond = decontaminate match {
          case None => boiled
          case Some(dc) =>
            // materialize pre-decon: the stage consumes its input twice
            // (shingle probe + final join)
            val staged = stage("verdicts_predecon")(boiled)
            QualityPipeline.decontaminate(staged.as[FileVerdict],
              dc.benchmark, dc.textCol, dc.n, dc.minHits,
              bloomPrefilter = dc.bloom).toDF()
        }
        classifierGate match {
          case None => decond
          case Some(th) =>
            // materialize pre-gate: training samples it and gating reads
            // it again — without the checkpoint the whole dedup chain
            // recomputes per consumer
            val staged = stage("verdicts_pregate")(decond)
            // train on the RULE verdicts only: dedup losers carry keep=false
            // with features byte-identical to their kept survivor twin, so
            // including them feeds the optimizer contradictory labels on
            // identical vectors (on a dup-heavy corpus that pushes every
            // duplicated-but-good document toward p≈0.5 and the gate would
            // flip legitimate keeps) — content_dup/near_dup rows are
            // excluded from the sample, not relabeled. Decontaminated rows
            // are excluded for the complementary reason: they are typically
            // GOOD content dropped for leakage, and a 0-label would teach
            // the model their STYLE is bad
            val labeled = staged
              .filter(!array_contains(col("dropReasons"), "content_dup") &&
                !array_contains(col("dropReasons"), "near_dup") &&
                !array_contains(col("dropReasons"), "decontaminated"))
              .withColumn("__cid", org.apache.spark.sql.functions
                .xxhash64(col("repo"), col("path"), col("commit"), col("lang")))
              .withColumn("__y", col("keep").cast("int"))
            val model = graft.filter.QualityClassifier.train(
              labeled, "__cid", "scrubbedContent", "__y")
            QualityPipeline.gateByClassifier(
              staged.as[FileVerdict], model, th).toDF()
        }
      }
    }
    // one scan for all three run counters
    val stats = verdictsDf.selectExpr(
      "count(*) as n",
      "coalesce(sum(case when keep then 1 else 0 end),0) as kept",
      "coalesce(sum(case when array_contains(dropReasons,'content_dup') " +
        "then 1 else 0 end),0) as dedup_drops",
      "coalesce(sum(case when array_contains(dropReasons,'near_dup') " +
        "then 1 else 0 end),0) as neardup_drops",
      "coalesce(sum(case when array_contains(dropReasons,'clf_low') " +
        "then 1 else 0 end),0) as clf_drops",
      "coalesce(sum(case when array_contains(dropReasons,'decontaminated') " +
        "then 1 else 0 end),0) as decon_drops",
      "coalesce(sum(case when array_contains(dropReasons,'boilerplate_only') " +
        "then 1 else 0 end),0) as boiler_drops",
      "coalesce(sum(case when array_contains(dropReasons,'code_stats') " +
        "then 1 else 0 end),0) as codegate_drops",
      "coalesce(sum(case when array_contains(dropReasons,'url_blocked') " +
        "then 1 else 0 end),0) as urlblock_drops",
      "coalesce(sum(case when array_contains(dropReasons,'domain_capped') " +
        "then 1 else 0 end),0) as domcap_drops").head()
    // drift monitoring (round-4 verdict item 7): publish this run's slim
    // stats frame as a stage; with a baseline, compute PSI + max language
    // share delta against it — lineage-only, verdicts untouched
    val driftLineage: Seq[LineageRow] = driftBaseline.toSeq.flatMap { dcfg =>
      import org.apache.spark.sql.functions.{abs, max}
      val cur = annotated.select(col("nChars").cast("double").as("v"),
        col("lang"))
      stage("drift_stats")(cur)
      dcfg.baselinePath match {
        case None =>
          Seq(LineageRow(runId, "drift", "baseline_published",
            stats.getLong(0), 0L, 0L))
        case Some(bp) =>
          val base = spark.read.parquet(bp)
          val psi = graft.checks.Drift
            .psiByBucket(base, cur, col("v"), dcfg.bounds)
            .agg(coalesce(sum(col("psi_term")), lit(0.0))).head().getDouble(0)
          val catMax = graft.checks.Drift
            .categoricalDrift(base, cur, col("lang"))
            .agg(coalesce(max(abs(col("share_delta"))), lit(0.0)))
            .head().getDouble(0)
          // fixed-point x1e6: LineageRow's numeric slots are integral
          Seq(
            LineageRow(runId, "drift", "psi_nchars",
              stats.getLong(0), math.round(psi * 1e6), 0L),
            LineageRow(runId, "drift", "lang_share_maxdelta",
              stats.getLong(0), math.round(catMax * 1e6), 0L),
            LineageRow(runId, "drift", "psi_alert",
              stats.getLong(0), if (psi >= dcfg.psiAlert) 1L else 0L, 0L))
      }
    }
    val lineage = ingestLineage ++ driftLineage ++
      (QualityPipeline.lineage(annotated, runId, cfg) :+
      LineageRow(runId, "dedup", "content_dup",
        stats.getLong(0), stats.getLong(2), 0L)) ++
      (if (codeGate) Seq(LineageRow(runId, "codegate", "code_stats",
        stats.getLong(0), stats.getLong(7), 0L)) else Nil) ++
      urlGate.toSeq.flatMap { u =>
        (if (u.blocklist.nonEmpty)
          Seq(LineageRow(runId, "urlgate", "url_blocked",
            stats.getLong(0), stats.getLong(8), 0L)) else Nil) ++
          u.domainCap.map(_ => LineageRow(runId, "urlgate", "domain_capped",
            stats.getLong(0), stats.getLong(9), 0L))
      } ++
      nearDup.map(_ => LineageRow(runId, "dedup", "near_dup",
        stats.getLong(0), stats.getLong(3), 0L)) ++
      boilerplate.map(_ => LineageRow(runId, "boilerplate",
        "boilerplate_only", stats.getLong(0), stats.getLong(6), 0L)) ++
      decontaminate.map(_ => LineageRow(runId, "decontaminate",
        "decontaminated", stats.getLong(0), stats.getLong(5), 0L)) ++
      classifierGate.map(_ => LineageRow(runId, "classifier", "clf_low",
        stats.getLong(0), stats.getLong(4), 0L))
    if (!store.isDone("lineage")) {
      stage("lineage") {
        lineage.toDS().toDF()
          .unionByName(
            QualityPipeline.partitionLineage(annotated, runId)
              .selectExpr(s"'$runId' as runId", "'partition' as stage",
                "cast(partition_id as string) as ruleId",
                "rows_scanned as rowsScanned", "violations",
                "cast(0 as bigint) as scrubCount"))
      }
    }
    RunReport(runId, stats.getLong(0), stats.getLong(1), lineage)
  }

  /** Canonical text form of the settings that change what a run's
    * checkpoints CONTAIN: the near-dup stage, the classifier gate, and the
    * SCRUB CHAIN (annotated/verdicts checkpoints embed scrubbed content
    * and sha256s, so a binary with a different default chain must not
    * resume into them — found the hard way when round 3 added the toxicity
    * rule and pre-existing work dirs resumed cleanly under the new binary).
    */
  private[graft] def renderRunConfig(
      nearDup: Option[graft.dedup.Dedup.MinHashConfig],
      classifierGate: Option[Double] = None,
      decontaminate: Option[DeconConfig] = None,
      boilerplate: Option[BoilerplateConfig] = None,
      codeGate: Boolean = false,
      nbConvert: Boolean = false,
      langDetect: Boolean = false,
      urlGate: Option[UrlGateConfig] = None,
      driftBaseline: Option[DriftConfig] = None,
      storeKind: String = "parquet"): String = {
    val nd = nearDup.fold("nearDup=off") { m =>
      s"nearDup=minhash(numHashes=${m.numHashes},bands=${m.bands}," +
        s"shingle=${m.shingleSize},threshold=${m.threshold}," +
        s"seed=${m.seed},maxBucket=${m.maxBucket})"
    }
    val cg = classifierGate.fold("clfGate=off")(t => s"clfGate=$t")
    val dc = decontaminate.fold("decon=off")(d =>
      s"decon=ngram(n=${d.n},minHits=${d.minHits},bench=${d.fingerprint})")
    val bp = boilerplate.fold("boiler=off")(b =>
      s"boiler=lines(minDocs=${b.minDocs},maxLines=${b.maxLines}," +
        s"minLen=${b.minTrimmedLen})")
    val cs = if (codeGate) "codeGate=on" else "codeGate=off"
    // ingest transforms rewrite the content/lang every checkpoint embeds,
    // so they are part of what the checkpoints CONTAIN
    val ing = s"ingest=nb:${if (nbConvert) "on" else "off"}," +
      s"lang:${if (langDetect) "on" else "off"}"
    val url = urlGate.fold("url=off")(u => s"url=${u.seal}")
    // drift never changes verdict content, but its rows land in the
    // lineage checkpoint — a resume against a different baseline would
    // publish mixed monitoring data, so the knobs seal too
    val dr = driftBaseline.fold("drift=off")(d =>
      s"drift=psi(bounds=${d.bounds.mkString("/")},alert=${d.psiAlert}," +
        s"baseline=${d.baselinePath.getOrElse("none")})")
    // the binding decides the on-disk LAYOUT: a parquet+marker work dir
    // resumed under the commit-log binding (or vice versa) would see no
    // completed stages and silently recompute into a mixed directory —
    // so the store kind seals like any other checkpoint-shaping knob
    s"$nd;$cg;$dc;$bp;$cs;$ing;$url;$dr;store=$storeKind;" +
      s"scrub=${graft.filter.Scrub.default.fingerprint}"
  }

  /** Seal name of a store binding: the two shipped bindings by identity,
    * anything else "custom" (a custom binding must keep its own layout
    * stable — the seal only guards against mixing the SHIPPED layouts).
    */
  private[graft] def storeKindOf(b: SnapshotStore.Binding): String =
    if (b eq SnapshotStore.commitLog) "commitlog"
    else if (b eq SnapshotStore.parquetMarkers) "parquet"
    else "custom"

  /** Fingerprint of the default scrub chain as shipped in round 3 (email /
    * aws_key / slack_token / ipv4 / jwt / toxicity / private_key) — the
    * chain every seal written BEFORE the scrub field existed was built
    * with. A spec pins this constant to the historical config text.
    */
  private[graft] val LegacyR3ScrubFp = "0bdf2ad8f94858c9"

  /** Fingerprint of the round-4 default chain (round 3 + the two
    * entropy-gated secret rules, no prescreen fields). Round 5 added
    * prescreen-ONLY metadata (prescan=/preAny=) to two rules — prescreens
    * are conservative necessary conditions that cannot change scrubbed
    * output (SecretScanSpec fuzzes the equivalence), so seals carrying
    * this fingerprint upgrade to the current default's and keep resuming.
    * ScrubConfigSpec pins BOTH constants to their historical config texts
    * AND asserts the current default differs from the r4 chain only in
    * prescreen fields — if a future change touches a pattern/replacement,
    * that assertion fails and this upgrade must be removed.
    */
  private[graft] val LegacyR4ScrubFp = "3df7d3315d373ebc"

  /** Seal the run config into the store on first run; on resume, refuse
    * to proceed when the flags differ from what the checkpoints were built
    * with — re-running `graft.Main` with a different `--near-dup` setting
    * must fail loudly, not silently reuse stale verdicts (and emit lineage
    * for a stage that never executed).
    */
  /** Settings absent from an OLDER binary's sealed config default to
    * "off" — off is byte-identical behavior to the code that predated the
    * setting, so a valid checkpoint set must keep resuming after an
    * upgrade (refusing would discard hours of work over a format change).
    */
  private[graft] def upgradeRunConfig(stored: String): String = {
    val withClf =
      if (stored.contains(";clfGate=")) stored else s"$stored;clfGate=off"
    // absent decon = off = byte-identical behavior (like clfGate); the
    // field sits BEFORE boiler/scrub in the canonical order
    val withDecon =
      if (withClf.contains(";decon=")) withClf
      else if (withClf.contains(";scrub="))
        withClf.replace(";scrub=", ";decon=off;scrub=")
      else s"$withClf;decon=off"
    // absent boiler = off = byte-identical behavior; sits BEFORE codeGate
    val withBoiler =
      if (withDecon.contains(";boiler=")) withDecon
      else if (withDecon.contains(";codeGate="))
        withDecon.replace(";codeGate=", ";boiler=off;codeGate=")
      else if (withDecon.contains(";scrub="))
        withDecon.replace(";scrub=", ";boiler=off;scrub=")
      else s"$withDecon;boiler=off"
    // absent codeGate = off = byte-identical behavior; sits BEFORE ingest
    val withCodeGate =
      if (withBoiler.contains(";codeGate=")) withBoiler
      else if (withBoiler.contains(";ingest="))
        withBoiler.replace(";ingest=", ";codeGate=off;ingest=")
      else if (withBoiler.contains(";scrub="))
        withBoiler.replace(";scrub=", ";codeGate=off;scrub=")
      else s"$withBoiler;codeGate=off"
    // absent ingest = both transforms off = byte-identical behavior; sits
    // BEFORE scrub
    val withIngest =
      if (withCodeGate.contains(";ingest=")) withCodeGate
      else if (withCodeGate.contains(";scrub="))
        withCodeGate.replace(";scrub=", ";ingest=nb:off,lang:off;scrub=")
      else s"$withCodeGate;ingest=nb:off,lang:off"
    // absent url/drift = off = byte-identical behavior; they sit BEFORE
    // scrub in the canonical order
    val withUrl =
      if (withIngest.contains(";url=")) withIngest
      else if (withIngest.contains(";scrub="))
        withIngest.replace(";scrub=", ";url=off;scrub=")
      else s"$withIngest;url=off"
    val withDrift =
      if (withUrl.contains(";drift=")) withUrl
      else if (withUrl.contains(";scrub="))
        withUrl.replace(";scrub=", ";drift=off;scrub=")
      else s"$withUrl;drift=off"
    // absent store = the parquet+marker binding (the only one that existed
    // when those seals were written); sits BEFORE scrub
    val withStore =
      if (withDrift.contains(";store=")) withDrift
      else if (withDrift.contains(";scrub="))
        withDrift.replace(";scrub=", ";store=parquet;scrub=")
      else s"$withDrift;store=parquet"
    // seals without a scrub field were written by the round-3 binary, whose
    // chain is KNOWN — upgrade to its fingerprint. Unlike clfGate (where
    // absent = off = identical behavior), this is NOT a free pass: if the
    // current default chain differs, the guard refuses the resume — which
    // is exactly the point (the old checkpoints hold old-chain content).
    val withScrub =
      if (withStore.contains(";scrub=")) withStore
      else s"$withStore;scrub=$LegacyR3ScrubFp"
    // round-4 chain → round-5 chain: prescreen-only change, byte-identical
    // output (see LegacyR4ScrubFp) — checkpoints stay resumable
    if (withScrub.endsWith(s";scrub=$LegacyR4ScrubFp"))
      withScrub.stripSuffix(LegacyR4ScrubFp) +
        graft.filter.Scrub.default.fingerprint
    else withScrub
  }

  private def guardRunConfig(store: SnapshotStore, workDir: String,
      line: String): Unit =
    store.readMeta("RUNCONFIG").map(upgradeRunConfig) match {
      case Some(existing) if existing != line =>
        throw new IllegalStateException(
          s"work dir $workDir holds checkpoints built with [$existing] but " +
            s"this run asks for [$line] — clear the work dir (or point at a " +
            "fresh one) instead of resuming across dedup settings")
      case Some(_) => ()
      case None => store.writeMeta("RUNCONFIG", line)
    }

  /** Verdicts of a finished (or resumed) run. */
  def verdicts(spark: SparkSession, workDir: String): Dataset[FileVerdict] = {
    import spark.implicits._
    spark.read.parquet(s"$workDir/verdicts").as[FileVerdict]
  }

  /** Verdicts read back through a store binding (binding-agnostic: resolves
    * the published snapshot whatever the on-disk layout). Fails loudly when
    * the stage was never committed in this work dir — never recomputes.
    */
  def verdicts(spark: SparkSession, workDir: String,
      stores: SnapshotStore.Binding): Dataset[FileVerdict] = {
    import spark.implicits._
    stores(spark, workDir).stage("verdicts") {
      throw new IllegalStateException(
        s"no committed 'verdicts' stage in $workDir — run the pipeline first")
    }.as[FileVerdict]
  }

  /** Convenience for benchmarks: synthesize n rows and run in-memory,
    * forcing FULL materialization of every verdict column via a noop sink
    * (a count would let Catalyst prune the scrub/sha work away and measure
    * nothing). Returns the row count it processed.
    */
  def runInMemory(spark: SparkSession, n: Long, seed: Long = 42L,
      partitions: Int = 0, includeDedup: Boolean = true,
      /** append the transitive MinHash near-dup stage after the exact one
        * (the benchmarked analogue of Runner.run's nearDup option) */
      nearDup: Option[graft.dedup.Dedup.MinHashConfig] = None,
      /** swap the scrub chain (Bench's entropy-family ablation series) */
      scrubber: graft.filter.Scrubber = graft.filter.Scrub.default): Long = {
    val files = CorpusGen.files(spark, n, seed, partitions)
    val verdicts = QualityPipeline.verdicts(QualityPipeline.annotate(
      QualityPipeline.score(files, scrubber), CorpusGen.commitsDim(spark),
      QualityPipeline.Config(),
      // keys-only generation ≈ a column-pruned scan of the source
      rawKeys = Some(CorpusGen.keys(spark, n, seed, partitions))),
      scrubber).toDF()
    if (!includeDedup) {
      verdicts.write.format("noop").mode("overwrite").save()
    } else {
      // dedup consumes its input 3x — materialize once (Runner.run uses a
      // parquet checkpoint for the same reason)
      import files.sparkSession.implicits._
      val mat = verdicts
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val exact = QualityPipeline.dedupByContent(mat.as[graft.model.FileVerdict])
        nearDup match {
          case None =>
            exact.toDF().write.format("noop").mode("overwrite").save()
          case Some(mh) =>
            // the near-dup builders consume THEIR input repeatedly too
            val exactMat = exact.toDF()
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try graft.util.Caches.scoped {
              QualityPipeline
                .dedupNearDup(exactMat.as[graft.model.FileVerdict], mh)
                .toDF().write.format("noop").mode("overwrite").save()
            } finally { exactMat.unpersist(); () }
        }
      } finally { mat.unpersist(); () }
    }
    n
  }
}
