package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.runner.Runner

/** spark-submit entry point with two modes:
  *
  *   graft.Main <nRows> <workDir> [runId] [--near-dup] [--clf-gate[=t]]
  *              [--decontaminate=<parquet>] [--boilerplate[=minDocs]]
  *              [--code-gate] [--nb-convert] [--lang-detect]
  *     — run (or resume) the quality-filter pipeline over a deterministic
  *       synthetic corpus and print a run report; --near-dup adds the
  *       transitive MinHash near-duplicate stage after exact dedup;
  *       --clf-gate distills a quality classifier from the run's own
  *       verdicts and drops kept rows scoring below t (default 0.5);
  *       --decontaminate drops kept rows colliding with the eval set in
  *       the given parquet (a `text` column) on 8-gram shingles;
  *       --boilerplate removes lines shared by >= minDocs kept documents
  *       from every document (rows left blank drop as boilerplate_only);
  *       --code-gate applies the published source-file filters (alpha
  *       tokens, digit/hex blobs, xml prolog, comment-density band) to
  *       kept rows before the dedup stages;
  *       --nb-convert plants .ipynb rows in the synthetic corpus and
  *       rewrites them to scripts (code cells verbatim, markdown as
  *       comments, kernel language) before scoring;
  *       --lang-detect backfills empty stated langs from the file path /
  *       shebang before scoring;
  *       --url-blocklist / --domain-cap enable the URL/domain hygiene
  *       gate over the repo column (blocklisted registrable domains drop
  *       as url_blocked; at most N kept rows per domain, losers drop as
  *       domain_capped);
  *       --drift-baseline publishes this run's drift-stats frame (and,
  *       given a prior run's drift_stats path, emits PSI / language-share
  *       drift lineage against it);
  *       --store=commitlog swaps checkpointing to the versioned
  *       snapshot-commit-log binding (immutable per-version data dirs +
  *       atomic-rename manifest commits, time-travel reads) — available
  *       in both modes; the store kind seals into the resume guard.
  *
  *   graft.Main check <configDir> <dataDir> <outDir>
  *     — the reference's batch orchestration (__main__, GQ:3347-3357):
  *       walk configDir's manifest (config file × batch ids), run every
  *       batch's checks over parquet tables in <dataDir>, publish audit
  *       tables per batch; re-running resumes (published batches skip).
  *
  * Re-running either mode with the same output dir resumes from completed
  * checkpoints (north_rule: resumable runs).
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: graft.Main <nRows> <workDir> [runId] [--near-dup] " +
          "[--clf-gate[=t]] [--decontaminate=<parquet>] " +
          "[--boilerplate[=minDocs]] [--code-gate] [--nb-convert] " +
          "[--lang-detect] [--url-blocklist=<file>] [--domain-cap=N] " +
          "[--drift-baseline[=<parquet>]] [--store=parquet|commitlog]\n" +
          "       graft.Main check <configDir> <dataDir> <outDir> " +
          "[--store=parquet|commitlog]")
      sys.exit(2)
    }
    if (args(0) == "check") {
      val (cFlags, cPos) = args.tail.partition(_.startsWith("--"))
      if (cPos.length < 3) {
        System.err.println("usage: graft.Main check <configDir> <dataDir> " +
          "<outDir> [--store=parquet|commitlog]")
        sys.exit(2)
      }
      runCheckMode(cPos(0), cPos(1), cPos(2), parseStoreFlag(cFlags))
      return
    }
    val (flags, positional) = args.partition(_.startsWith("--"))
    if (positional.length < 2) {
      System.err.println(
        "usage: graft.Main <nRows> <workDir> [runId] [--near-dup] " +
          "[--clf-gate[=t]] [--decontaminate=<parquet>] " +
          "[--boilerplate[=minDocs]] [--code-gate] [--nb-convert] " +
          "[--lang-detect] [--url-blocklist=<file>] [--domain-cap=N] " +
          "[--drift-baseline[=<parquet>]] [--store=parquet|commitlog]")
      sys.exit(2)
    }
    val nearDup =
      if (flags.contains("--near-dup"))
        Some(graft.dedup.Dedup.MinHashConfig(threshold = 0.9))
      else None
    // --code-gate: apply the published source-file filter composition
    // (alpha tokens, digit/hex blobs, xml prolog, comment-density band)
    // to kept rows BEFORE the dedup stages
    val codeGate = flags.contains("--code-gate")
    // --nb-convert / --lang-detect: ingest transforms before scoring.
    // --nb-convert also plants .ipynb rows in the synthetic corpus (the
    // default corpus has none, so the stage would be a proven no-op)
    val nbConvert = flags.contains("--nb-convert")
    val langDetect = flags.contains("--lang-detect")
    // --clf-gate[=threshold]: distill a classifier from this run's own
    // verdicts and drop kept rows scoring below the threshold. Malformed
    // or out-of-range values take the usage path (exit 2) like every
    // other argument error — a sigmoid gate at t>=1 would silently drop
    // the whole corpus
    val clfGate = flags.collectFirst {
      case "--clf-gate" => 0.5
      case f if f.startsWith("--clf-gate=") =>
        f.stripPrefix("--clf-gate=").toDoubleOption match {
          case Some(t) if t > 0.0 && t < 1.0 => t
          case _ =>
            System.err.println(
              s"--clf-gate threshold must be a number in (0,1), got: $f")
            sys.exit(2)
        }
    }
    // --boilerplate[=minDocs]: remove lines shared by >= minDocs kept
    // documents (default 1000) everywhere; gutted rows drop
    val boiler = flags.collectFirst {
      case "--boilerplate" => Runner.BoilerplateConfig(minDocs = 1000L)
      case f if f.startsWith("--boilerplate=") =>
        f.stripPrefix("--boilerplate=").toLongOption match {
          case Some(m) if m > 1 => Runner.BoilerplateConfig(minDocs = m)
          case _ =>
            System.err.println(
              s"--boilerplate minDocs must be an integer > 1, got: $f")
            sys.exit(2)
        }
    }
    // --decontaminate=<parquet>: benchmark set with a `text` column; the
    // DataFrame is read after the session exists (path validated here)
    val deconPath = flags.collectFirst {
      case f if f.startsWith("--decontaminate=") =>
        val p = f.stripPrefix("--decontaminate=")
        if (p.isEmpty) {
          System.err.println("--decontaminate needs =<parquetPath>")
          sys.exit(2)
        }
        p
      case "--decontaminate" =>
        System.err.println("--decontaminate needs =<parquetPath>")
        sys.exit(2)
    }
    // --url-blocklist=<file> (one registrable domain per line, # comments)
    // and/or --domain-cap=N enable the URL/domain hygiene gate over the
    // repo column (production corpora identify repos by forge URL)
    val urlBlocklistPath = flags.collectFirst {
      case f if f.startsWith("--url-blocklist=") =>
        val p = f.stripPrefix("--url-blocklist=")
        if (p.isEmpty || !java.nio.file.Files.exists(java.nio.file.Paths.get(p))) {
          System.err.println(s"--url-blocklist needs =<existing file>, got: $f")
          sys.exit(2)
        }
        p
      case "--url-blocklist" =>
        System.err.println("--url-blocklist needs =<file>")
        sys.exit(2)
    }
    val domainCap = flags.collectFirst {
      case f if f.startsWith("--domain-cap=") =>
        f.stripPrefix("--domain-cap=").toIntOption match {
          case Some(k) if k > 0 => k
          case _ =>
            System.err.println(s"--domain-cap must be a positive int, got: $f")
            sys.exit(2)
        }
      case "--domain-cap" =>
        System.err.println("--domain-cap needs =<N>")
        sys.exit(2)
    }
    // --drift-baseline[=<parquet>]: bare = publish this run's drift-stats
    // frame only (the first run of a chain); with a path = additionally
    // compute PSI/categorical drift vs that prior run's published stats
    val driftFlag: Option[Option[String]] = flags.collectFirst {
      case "--drift-baseline" => None
      case f if f.startsWith("--drift-baseline=") =>
        val p = f.stripPrefix("--drift-baseline=")
        if (p.isEmpty) {
          System.err.println("--drift-baseline= needs a path (or omit the =)")
          sys.exit(2)
        }
        Some(p)
    }
    val storeBinding = parseStoreFlag(flags)
    val n = positional(0).toLong
    val workDir = positional(1)
    val runId = if (positional.length > 2) positional(2) else s"run-$n"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-quality-filter")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val decon = deconPath.map(p =>
      Runner.DeconConfig(spark.read.parquet(p)))
    val urlGate =
      if (urlBlocklistPath.isEmpty && domainCap.isEmpty) None
      else Some(Runner.UrlGateConfig(
        blocklist = urlBlocklistPath.toSeq.flatMap { p =>
          val src = scala.io.Source.fromFile(p, "UTF-8")
          // lowercase: the gate compares against the canonicalized
          // registrable domain, which is always lowercase — a mixed-case
          // file entry would otherwise silently never match
          try src.getLines().map(_.trim.toLowerCase(java.util.Locale.ROOT))
            .filter(l => l.nonEmpty && !l.startsWith("#")).toVector
          finally src.close()
        },
        domainCap = domainCap))
    val drift = driftFlag.map(bp => Runner.DriftConfig(baselinePath = bp))
    val report = Runner.run(spark,
      CorpusGen.files(spark, n, notebooks = nbConvert),
      CorpusGen.commitsDim(spark), workDir, runId, nearDup = nearDup,
      classifierGate = clfGate, decontaminate = decon, boilerplate = boiler,
      codeGate = codeGate, nbConvert = nbConvert, langDetect = langDetect,
      urlGate = urlGate, driftBaseline = drift, stores = storeBinding)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[graft] run=$runId rows=${report.rows} kept=${report.kept} " +
      f"(${100.0 * report.kept / math.max(report.rows, 1)}%.1f%%) " +
      f"wall=${sec}%.1fs throughput=${report.rows / sec}%.0f files/sec")
    report.lineage.filter(_.stage == "ingest").foreach { l =>
      println(f"[graft]   ingest=${l.ruleId}%-12s rewritten=${l.violations}")
    }
    report.lineage.filter(_.stage == "filter").foreach { l =>
      println(f"[graft]   rule=${l.ruleId}%-14s violations=${l.violations}")
    }
    report.lineage.filter(_.stage == "scrub").foreach { l =>
      println(f"[graft]   scrub=${l.ruleId}%-13s matches=${l.scrubCount}")
    }
    report.lineage.filter(_.stage == "dedup").foreach { l =>
      println(f"[graft]   dedup=${l.ruleId}%-13s dropped=${l.violations}")
    }
    report.lineage.filter(_.stage == "codegate").foreach { l =>
      println(f"[graft]   codegate=${l.ruleId}%-11s dropped=${l.violations}")
    }
    report.lineage.filter(_.stage == "urlgate").foreach { l =>
      println(f"[graft]   urlgate=${l.ruleId}%-12s dropped=${l.violations}")
    }
    report.lineage.filter(_.stage == "drift").foreach { l =>
      // psi/delta rows are fixed-point x1e6 (see Runner.DriftConfig)
      println(f"[graft]   drift=${l.ruleId}%-14s value1e6=${l.violations}")
    }
    report.lineage.filter(_.stage == "boilerplate").foreach { l =>
      println(f"[graft]   boiler=${l.ruleId}%-13s dropped=${l.violations}")
    }
    report.lineage.filter(_.stage == "decontaminate").foreach { l =>
      println(f"[graft]   decon=${l.ruleId}%-14s dropped=${l.violations}")
    }
    report.lineage.filter(_.stage == "classifier").foreach { l =>
      println(f"[graft]   gate=${l.ruleId}%-14s dropped=${l.violations}")
    }
    if (storeBinding eq graft.runner.SnapshotStore.commitLog) {
      val s = new graft.runner.SnapshotStore.CommitLogStore(spark, workDir)
      val v = s.currentVersion
      println(s"[graft]   store=commitlog version=$v stages=" +
        s.manifest(v).keySet.toSeq.sorted.mkString(","))
    }
    spark.stop()
  }

  /** --store=parquet|commitlog: the snapshot-store binding, shared by both
    * modes. commitlog is the versioned commit-log layout (Iceberg-shaped:
    * immutable per-version data dirs + atomic-rename manifest commits,
    * time-travel reads); in pipeline mode the store kind seals into the
    * resume guard — layouts must not mix in one work dir.
    */
  private def parseStoreFlag(
      flags: Array[String]): graft.runner.SnapshotStore.Binding =
    flags.collectFirst {
      case f if f.startsWith("--store") =>
        f.stripPrefix("--store").stripPrefix("=") match {
          case "commitlog" => graft.runner.SnapshotStore.commitLog
          case "parquet" => graft.runner.SnapshotStore.parquetMarkers
          case other =>
            System.err.println(
              s"--store must be parquet or commitlog, got: '$other'")
            sys.exit(2)
        }
    }.getOrElse(graft.runner.SnapshotStore.parquetMarkers)

  /** `check` mode: manifest-driven multi-batch audit run over parquet
    * tables (qualified rule names `db.tab` resolve by bare table name).
    */
  private def runCheckMode(configDir: String, dataDir: String,
      outDir: String, stores: graft.runner.SnapshotStore.Binding): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-check-batches")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables: graft.runner.CheckRunner.Tables = t =>
      spark.read.parquet(
        s"$dataDir/${graft.model.Rule.splitTable(t)._2}.parquet")
    val t0 = System.nanoTime()
    val sums = graft.runner.CheckRunner.orchestrateDir(
      spark, configDir, tables, outDir, stores)
    val sec = (System.nanoTime() - t0) / 1e9
    sums.foreach { s =>
      println(s"[graft] config=${s.config} batch=${s.batchId} " +
        (if (s.skipped) "SKIPPED (published)" else s"rules=${s.nRules}"))
    }
    println(f"[graft] check mode: ${sums.count(!_.skipped)} run, " +
      f"${sums.count(_.skipped)} resumed-skip, wall=$sec%.1fs")
    spark.stop()
  }
}
