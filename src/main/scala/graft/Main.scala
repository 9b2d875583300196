package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.runner.Runner

/** spark-submit entry point: run (or resume) the quality-filter pipeline
  * over a deterministic synthetic corpus and print a run report.
  *
  * Usage: graft.Main <nRows> <workDir> [runId]
  * Re-running with the same workDir resumes from completed checkpoints
  * (north_rule: resumable runs).
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.Main <nRows> <workDir> [runId]")
      sys.exit(2)
    }
    val n = args(0).toLong
    val workDir = args(1)
    val runId = if (args.length > 2) args(2) else s"run-$n"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-quality-filter")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val report = Runner.run(spark, CorpusGen.files(spark, n),
      CorpusGen.commitsDim(spark), workDir, runId)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[graft] run=$runId rows=${report.rows} kept=${report.kept} " +
      f"(${100.0 * report.kept / math.max(report.rows, 1)}%.1f%%) " +
      f"wall=${sec}%.1fs throughput=${report.rows / sec}%.0f files/sec")
    report.lineage.filter(_.stage == "filter").foreach { l =>
      println(f"[graft]   rule=${l.ruleId}%-14s violations=${l.violations}")
    }
    report.lineage.filter(_.stage == "scrub").foreach { l =>
      println(f"[graft]   scrub=${l.ruleId}%-13s matches=${l.scrubCount}")
    }
    report.lineage.filter(_.stage == "dedup").foreach { l =>
      println(f"[graft]   dedup=${l.ruleId}%-13s dropped=${l.violations}")
    }
    spark.stop()
  }
}
