package graft

import graft.config.RuleConfig
import graft.model._
import graft.runner.{CheckRunner, Checkpoint}
import org.apache.spark.sql.DataFrame

class CheckRunnerSpec extends SparkSpec {
  import spark.implicits._

  lazy val child = Seq(("a", 1), ("a", 2), ("orph", 3), ("ok", 4)).toDF("k", "v")
  lazy val father = Seq("a", "ok", "extra").toDF("fk")
  lazy val codes = Seq("red", "blue").toDF("code")

  val tables: CheckRunner.Tables = {
    case "child" => child
    case "father" => father
    case "codes" => codes
    case "colors" => Seq("red", "green", "", null.asInstanceOf[String]).toDF("c")
  }

  test("batch run: config text → rules → audit rows with verdicts") {
    val rules = RuleConfig.parse(
      """PK; id=pk1; table=child; cols=k
        |FK; id=fk1; table=child; cols=k; father=father; fatherCols=fk
        |VC; id=vc1; table=colors; col=c; values=red,blue
        |""".stripMargin)
    val out = CheckRunner.runBatch(spark, "b9", rules, tables)
    val byId = out.results.map(r => r.checkId -> r).toMap
    assert(byId("pk1").checkResultInd === "N") // "a" duplicated
    assert(byId("pk1").failedRowCnt === 2L)
    assert(byId("fk1").failedRowCnt === 1L) // "orph"
    assert(byId("vc1").failedRowCnt === 1L) // "green" ("",null exempt)
    assert(out.results.forall(_.batchId === "b9"))
    // detail tables: key checks → check_Detail (padded to 10 cols),
    // domain checks → code_Detail
    val det = out.checkDetail.get
    assert(det.columns.toSeq === Seq("checkId", "dbNm", "tabNm", "fcInd") ++
      (1 to 10).map(i => s"checkColumn$i") :+ "sampleCnt")
    val pkRow = det.filter($"checkId" === "pk1").collect()
    assert(pkRow.length === 1 && pkRow.head.getAs[String]("checkColumn1") === "a")
    val code = out.codeDetail.get.select("checkId", "cdeVal").collect()
    assert(code.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("vc1", "green")))
  }

  test("audit row: timestamps, dbNm, checkType SC, reproRule round-trip") {
    val t = java.time.Instant.parse("2026-01-02T03:04:05Z")
    val rules = RuleConfig.parse(
      """PK; id=pk1; table=mydb.child; cols=k
        |SC; id=sc1; table=colors; col=c
        |""".stripMargin,
      dict = Map("COLORS.C" -> Set("red", "green", "blue")))
    val plans = rules.map(r => CheckRunner.compile(r, {
      case "mydb.child" => child
      case other => tables(other)
    }: CheckRunner.Tables))
    val res = graft.checks.Checks.run(spark, "b13", plans, clock = () => t)
    val pk = res.find(_.checkId == "pk1").get
    assert(pk.runDate === "2026-01-02")
    assert(pk.checkStartTime === "2026-01-02 03:04:05")
    assert(pk.checkEndTime === "2026-01-02 03:04:05")
    assert(pk.dbNm === "mydb" && pk.tabNm === "child")
    // the repro artifact parses back into the same compiled check
    val reparsed = RuleConfig.parseRule(pk.reproRule).get
    assert(reparsed === PkRule("pk1", "mydb.child", Seq("k")))
    val sc = res.find(_.checkId == "sc1").get
    assert(sc.checkType === "SC") // first-class, not folded into VC
    assert(sc.checkResultInd === "Y") // all colors in dict ('' / null exempt)
  }

  test("batch counts execute as ONE fused action, not per-rule jobs") {
    // Under AQE every shuffle stage surfaces as its own (concurrently
    // scheduled) job, so "one action" is only visible as "one job" with
    // AQE off — which is what this asserts: N rules, ONE collect, ONE job.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val rules = RuleConfig.parse(
      """PK; id=pk1; table=child; cols=k
        |VC; id=vc1; table=colors; col=c; values=red,blue
        |UU; id=uu1; table=child; filter=v > 0; expected=4
        |""".stripMargin)
    val plans = rules.map(r => CheckRunner.compile(r, tables))
    val group = s"fused-batch-${System.nanoTime()}"
    spark.sparkContext.setJobGroup(group, "fused batch counts", false)
    try graft.checks.Checks.run(spark, "b14", plans)
    finally {
      spark.sparkContext.clearJobGroup()
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    // the status store is fed asynchronously — poll briefly
    val deadline = System.currentTimeMillis() + 5000
    var ids = spark.sparkContext.statusTracker.getJobIdsForGroup(group)
    while (ids.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(50)
      ids = spark.sparkContext.statusTracker.getJobIdsForGroup(group)
    }
    assert(ids.length === 1, s"expected one fused job, saw ${ids.length}")
  }

  test("publish is staged and idempotent (volatile→permanent analogue)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_batch").toString
    val rules = Vector(PkRule("pk1", "child", Seq("k")))
    val out = CheckRunner.runBatch(spark, "b10", rules, tables)
    CheckRunner.publish(spark, dir, "b10", out)
    val first = spark.read.parquet(s"$dir/batch=b10/check_result").collect()
    assert(first.length === 1)
    // re-publishing the same batch is a no-op (resume semantics)
    CheckRunner.publish(spark, dir, "b10", out)
    val again = spark.read.parquet(s"$dir/batch=b10/check_result").collect()
    assert(again.toSeq === first.toSeq)
    assert(Checkpoint.isDone(spark, s"$dir/batch=b10", "check_result"))
  }

  test("UC/UU samples land in check_Detail pivoted to checkColumnN (GQ:629-642)") {
    val rules = RuleConfig.parse(
      """UC; id=uc1; table=child; select=k, v; orderBy=v; limit=2; ugcType=recon
        |UU; id=uu1; table=child; filter=v > 2; expected=0
        |""".stripMargin)
    val out = CheckRunner.runBatch(spark, "b15", rules, tables)
    assert(out.results.map(_.checkType).toSet === Set("UC-recon", "UU"))
    assert(out.results.find(_.checkId == "uc1").get.checkResultInd === "")
    val det = out.checkDetail.get
      .select("checkId", "checkColumn1", "checkColumn2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(det.filter(_._1 == "uc1").toSet ===
      Set(("uc1", "a", "1"), ("uc1", "a", "2")))
    assert(det.filter(_._1 == "uu1").map(_._2).toSet === Set("orph", "ok"))
  }

  test("orchestrateDir: manifest walk, 2 configs x 2 batches, resume") {
    import java.nio.file.{Files, Paths}
    val cfgDir = Files.createTempDirectory("graft_cfg").toString
    val outDir = Files.createTempDirectory("graft_orch").toString
    def write(name: String, text: String): Unit =
      Files.writeString(Paths.get(cfgDir, name), text)
    write("manifest.txt",
      """checks_a.txt = 1120,1520
        |checks_b.txt = 2000
        |""".stripMargin)
    write("params.txt", "MINV=2\n")
    write("codes.txt", "colors,c,red\ncolors,c,blue\n")
    write("checks_a.txt",
      """PK; id=pk1; table=child; cols=k
        |UU; id=uu1; table=child; filter=v >= ${MINV}; expected=3
        |""".stripMargin)
    write("checks_b.txt", "SC; id=sc1; table=colors; col=c\n")
    val first = CheckRunner.orchestrateDir(spark, cfgDir, tables, outDir)
    assert(first.map(s => (s.config, s.batchId, s.skipped)) === Seq(
      ("checks_a.txt", "1120", false), ("checks_a.txt", "1520", false),
      ("checks_b.txt", "2000", false)))
    // audit rows landed per (config, batch), with the right batch ids
    val a1 = spark.read.parquet(s"$outDir/config=checks_a.txt/batch=1120/check_result")
    assert(a1.select("batchId").distinct().collect().map(_.getString(0)).toSeq
      === Seq("1120"))
    assert(a1.count() === 2) // pk1 + uu1
    val b = spark.read.parquet(s"$outDir/config=checks_b.txt/batch=2000/check_result")
    assert(b.select("checkType").collect().map(_.getString(0)).toSeq === Seq("SC"))
    assert(b.select("failedRowCnt").head().getLong(0) === 1L) // "green"
    // second walk: everything already published → all skipped, output intact
    val second = CheckRunner.orchestrateDir(spark, cfgDir, tables, outDir)
    assert(second.forall(_.skipped))
    assert(spark.read
      .parquet(s"$outDir/config=checks_a.txt/batch=1520/check_result")
      .count() === 2)
  }

  test("PC details keep the offending code values through normalization") {
    val rules = Vector(
      CodeTableRule("pc9", "colors", Seq("c"), "codes", Seq("code")))
    val out = CheckRunner.runBatch(spark, "b12", rules, tables)
    val det = out.checkDetail.get
      .select("checkId", "checkColumn1", "sampleCnt").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(det.toSeq === Seq(("pc9", "green", 1L))) // "",null exempt by guard
  }

  test("FC details carry the C/F direction tag through normalization") {
    val rules = Vector(
      FcRule("fc1", "child", Seq("k"), "father", Seq("fk")))
    val out = CheckRunner.runBatch(spark, "b11", rules, tables)
    val det = out.checkDetail.get
      .select("fcInd", "checkColumn1").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(det === Set(("C", "orph"), ("F", "extra")))
  }

  /** A non-parquet SnapshotStore binding (in-memory frames + markers):
    * proves the orchestration layer only ever touches the trait, so the
    * production Iceberg binding is a dependency swap, not a rewrite.
    * Frames are persisted+counted at publish to honor the "readers get a
    * materialized frame" contract.
    */
  final class MemStore extends graft.runner.SnapshotStore {
    val frames = scala.collection.mutable.Map[String, DataFrame]()
    val meta = scala.collection.mutable.Map[String, String]()
    var computes = 0
    def isDone(name: String): Boolean = frames.contains(name)
    def stage(name: String)(compute: => DataFrame): DataFrame =
      frames.getOrElseUpdate(name, {
        computes += 1
        val d = compute.persist(); d.count(); d
      })
    def readMeta(key: String): Option[String] = meta.get(key)
    def writeMeta(key: String, value: String): Unit = meta(key) = value
  }

  test("SnapshotStore seam: orchestration + pipeline run against a non-parquet binding") {
    import java.nio.file.{Files, Paths}
    // one store per root, as a real catalog binding would scope tables
    val roots = scala.collection.mutable.Map[String, MemStore]()
    val binding: graft.runner.SnapshotStore.Binding =
      (_, root) => roots.getOrElseUpdate(root, new MemStore)

    // check orchestration: nothing lands on disk; resume skips via the store
    val cfgDir = Files.createTempDirectory("graft_cfg_mem").toString
    val outDir = s"/nonexistent/never_written_${System.nanoTime()}"
    Files.writeString(Paths.get(cfgDir, "manifest.txt"), "c.txt = 7\n")
    Files.writeString(Paths.get(cfgDir, "c.txt"),
      "PK; id=pk1; table=child; cols=k\n")
    val first = CheckRunner.orchestrateDir(spark, cfgDir, tables, outDir, binding)
    assert(first === Seq(CheckRunner.BatchSummary("c.txt", "7", false, 1)))
    val store = roots(s"$outDir/config=c.txt/batch=7")
    assert(store.isDone("check_result") && store.isDone("check_detail"))
    assert(store.frames("check_result").count() === 1)
    val again = CheckRunner.orchestrateDir(spark, cfgDir, tables, outDir, binding)
    assert(again.forall(_.skipped) && store.computes === 2) // result + detail, once

    // pipeline run: resume short-circuits stages; config guard via store meta
    import graft.corpus.CorpusGen
    import graft.runner.Runner
    val files = CorpusGen.files(spark, 300L)
    val dim = CorpusGen.commitsDim(spark)
    val work = s"/nonexistent/run_${System.nanoTime()}"
    val r1 = Runner.run(spark, files, dim, work, "mem-run", stores = binding)
    assert(r1.rows > 0)
    val runStore = roots(work)
    val computed = runStore.computes
    val r2 = Runner.run(spark, files, dim, work, "mem-run", stores = binding)
    assert(r2.rows === r1.rows && runStore.computes === computed) // pure resume
    val err = intercept[IllegalStateException] {
      Runner.run(spark, files, dim, work, "mem-run", stores = binding,
        nearDup = Some(graft.dedup.Dedup.MinHashConfig(threshold = 0.8)))
    }
    assert(err.getMessage.contains("checkpoints built with"))
    runStore.frames.values.foreach(_.unpersist())
    store.frames.values.foreach(_.unpersist())
  }

  test("commit log: crash between stages leaves no partials and resumes " +
    "by recomputing ONLY the uncommitted stage") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_clog").toString
    val store = new graft.runner.SnapshotStore.CommitLogStore(spark, root)
    var computes = 0
    def frame(tag: String) = {
      computes += 1
      spark.range(3).select(col("id"), lit(tag).as("tag"))
    }
    assert(store.currentVersion === 0 && !store.isDone("s1"))
    store.stage("s1")(frame("one"))
    assert(store.currentVersion === 1 && store.isDone("s1"))
    // CRASH SIMULATION: a stage that dies between its data write and its
    // manifest commit — exactly the bytes a killed job leaves behind
    spark.range(5).write.parquet(s"$root/data/s2/v2-deadbeef")
    assert(!store.isDone("s2"), "uncommitted data must be invisible")
    assert(store.manifest(store.currentVersion).keySet === Set("s1"))
    // resume: s1 is NOT recomputed, s2 is computed and committed
    store.stage("s1")(frame("never"))
    assert(computes === 1, "committed stage must not recompute")
    store.stage("s2")(frame("two"))
    assert(computes === 2 && store.currentVersion === 2)
    assert(store.isDone("s2"))
    assert(store.stage("s2")(frame("never")).count() === 3)
    assert(computes === 2)
    // meta seal works like the marker binding's
    store.writeMeta("RUNCONFIG", "cfg=x")
    assert(store.readMeta("RUNCONFIG") === Some("cfg=x"))
  }

  test("commit log: a losing committer ADOPTS the winner's snapshot — the " +
    "publish primitive fails on an existing manifest instead of overwriting") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_clog_race").toString
    val a = new graft.runner.SnapshotStore.CommitLogStore(spark, root)
    val b = new graft.runner.SnapshotStore.CommitLogStore(spark, root)
    // deterministic replay of the concurrent-committer race: b begins
    // staging "s", and DURING its compute a commits the same stage — so
    // b's commit attempt targets a manifest version that now exists.
    // POSIX rename(2) would silently OVERWRITE a's manifest here (the
    // local-FS divergence from the HDFS rename contract); the hard-link
    // publish must fail instead, and b must adopt a's snapshot rather
    // than re-commit its own at the next version.
    var aPath: String = null
    val out = b.stage("s") {
      a.stage("s")(spark.range(7).select(col("id")))
      aPath = a.manifest(a.currentVersion)("s")
      spark.range(3).select(col("id")) // b's own (losing) snapshot
    }
    // exactly ONE commit for the stage — the version must not bump twice
    assert(b.currentVersion === 1)
    assert(b.manifest(1)("s") === aPath, "the winner's manifest survives")
    // b returned the WINNER's data (7 rows), not its own 3-row frame
    assert(out.count() === 7)
    // the loser's never-visible data dir was cleaned up
    val dataDirs = new java.io.File(s"$root/data/s").listFiles()
    assert(dataDirs != null && dataDirs.length === 1,
      s"expected only the winner's snapshot dir, got ${dataDirs.toSeq}")
  }

  test("commit log: time travel — a reader pinned at version N never " +
    "sees version N+1 state") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_clog_tt").toString
    val store = new graft.runner.SnapshotStore.CommitLogStore(spark, root)
    store.stage("lineage")(spark.range(4).select(col("id")))
    val v1 = store.currentVersion
    store.stage("audit")(spark.range(9).select(col("id")))
    assert(store.currentVersion === v1 + 1)
    // version N resolves only the stages committed by N
    assert(store.manifest(v1).keySet === Set("lineage"))
    assert(store.readAt("audit", v1).isEmpty,
      "a v1 reader must not see the v2 stage")
    assert(store.readAt("audit", v1 + 1).get.count() === 9)
    // immutable snapshot dirs: the v1 read is byte-stable after v2 commits
    assert(store.readAt("lineage", v1).get.count() === 4)
    assert(store.manifest(v1)("lineage") ===
      store.manifest(v1 + 1)("lineage"), "commits never rewrite old paths")
  }

  test("commit log binding drives CheckRunner.publish + Runner.run " +
    "end-to-end with pure resume") {
    import graft.corpus.CorpusGen
    import graft.runner.{Runner, SnapshotStore}
    val rules = Vector(PkRule("pk1", "child", Seq("k")))
    val out = CheckRunner.runBatch(spark, "b30", rules, tables)
    val dir = java.nio.file.Files.createTempDirectory("graft_clog_pub").toString
    CheckRunner.publish(spark, dir, "b30", out, stores = SnapshotStore.commitLog)
    val store = new SnapshotStore.CommitLogStore(spark, s"$dir/batch=b30")
    assert(store.isDone("check_result"))
    val firstVersion = store.currentVersion
    CheckRunner.publish(spark, dir, "b30", out, stores = SnapshotStore.commitLog)
    assert(store.currentVersion === firstVersion, "re-publish is a no-op")
    // full pipeline run + resume on the binding
    val work = java.nio.file.Files.createTempDirectory("graft_clog_run").toString
    val files = CorpusGen.files(spark, 300L)
    val dim = CorpusGen.commitsDim(spark)
    val r1 = Runner.run(spark, files, dim, work, "clog-run",
      stores = SnapshotStore.commitLog)
    val runStore = new SnapshotStore.CommitLogStore(spark, work)
    val v = runStore.currentVersion
    val r2 = Runner.run(spark, files, dim, work, "clog-run",
      stores = SnapshotStore.commitLog)
    assert(r2.rows === r1.rows)
    assert(runStore.currentVersion === v, "resume commits nothing new")
  }
}
