package graft.filter

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.{FileRow, FileVerdict, LineageRow}

/** FileRow + the mapPartitions-scored fields (langid, perplexity). */
final case class ScoredFile(
    repo: String, path: String, commit: String, lang: String,
    content: String, predLang: String, perplexity: Double)

/** The flagship pipeline (BASELINE.json north_rule): language ID →
  * perplexity → heuristic quality rules → relational checks (PK dup,
  * FK orphan commit, lang code domain) → PII/secret scrub → keep/drop
  * verdict + lineage.
  *
  * Plan shape (one job, two exchanges max):
  *   scan → mapPartitions (langid+ppl, one pass, no shuffle)
  *        → window over hash(repo,path,commit)  [exchange 1]
  *        → broadcast-join commits dim           [no exchange]
  *        → one wide projection: metrics + scrub + verdict (codegen)
  *
  * The window exchange hash-partitions by the FULL key triple, so the
  * mega-repo skew never concentrates on one task (the triple is near-unique
  * within a repo) — this is the salting the north_rule asks for: the salt
  * is `hash(path, commit)` riding along with `repo`. Aggregations that
  * genuinely group by `repo` alone must two-phase via [[saltedRepartition]].
  */
object QualityPipeline {

  final case class Config(
      quality: QualityConfig = QualityConfig(),
      validLangs: Set[String] = graft.corpus.CorpusGen.validLangs.toSet,
      checkPkDup: Boolean = true,
      checkFkCommit: Boolean = true)

  /** Explicit salted repartition by repo-hash (north_rule). For stages that
    * later aggregate by repo: spread each repo over `saltBuckets` partitions,
    * aggregate per (repo, salt), then re-aggregate per repo — metrics stay
    * keyed by rule/repo, never by partition id (SURVEY.md §7 hard part (c)).
    */
  def saltedRepartition(df: DataFrame, numPartitions: Int,
      saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(col("path"), col("commit")), lit(saltBuckets)))
      .repartition(numPartitions, col("repo"), col("__salt"))
      .drop("__salt")

  /** Stage 1: langid + perplexity in ONE mapPartitions pass (both are pure
    * functions — deterministic at any parallelism/batching).
    */
  def score(files: Dataset[FileRow]): Dataset[ScoredFile] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map { f =>
      ScoredFile(f.repo, f.path, f.commit, f.lang, f.content,
        LangId.classify(f.content), Perplexity.score(f.content))
    })
  }

  /** Stage 2: all Column-expressed rules in one wide projection, plus the
    * two relational checks. Returns the full annotated frame (kept for
    * lineage and debugging); [[verdicts]] narrows it to FileVerdict.
    */
  def annotate(scored: Dataset[ScoredFile], commitsDim: DataFrame,
      cfg: Config = Config()): DataFrame = {
    var df = scored.toDF()

    // relational: PK duplicate (repo,path,commit) — window count, one shuffle
    if (cfg.checkPkDup) {
      val w = Window.partitionBy(col("repo"), col("path"), col("commit"))
      df = df.withColumn("pk_dup", count(lit(1)).over(w) > 1)
    } else df = df.withColumn("pk_dup", lit(false))

    // relational: FK orphan commit — broadcast left join, no shuffle
    if (cfg.checkFkCommit) {
      val dim = broadcast(commitsDim.select(col("commit_id")).distinct()
        .withColumn("__commit_ok", lit(true)))
      df = df.join(dim, df("commit") === dim("commit_id"), "left")
        .withColumn("fk_orphan", col("__commit_ok").isNull)
        .drop("commit_id", "__commit_ok")
    } else df = df.withColumn("fk_orphan", lit(false))

    // heuristics + scrub + domain + sha256: one projection, all codegen'd
    val metricCols = Heuristics.metrics(col("content"))
    val scrubCnts = Scrub.countCols(col("content"))
    val secretDrops = Scrub.dropCols(col("content"))
    df = df.withColumns((metricCols ++ scrubCnts ++ secretDrops).toMap)
      .withColumns(Map(
        "bad_lang" -> (col("lang").isNull || !col("lang").isin(cfg.validLangs.toSeq: _*)),
        "unknown_lang" -> (col("predLang") === "unknown"),
        "high_ppl" -> (col("perplexity") > cfg.quality.maxPerplexity),
        // sha256 over the ORIGINAL bytes — the retained-row invariant
        "content_sha256" -> sha2(col("content").cast("binary"), 256),
        "scrubbed_content" -> Scrub.scrubCol(col("content"))))

    val ruleCols: Seq[(String, Column)] =
      Heuristics.dropRules(cfg.quality).map { case (id, _) => id -> col(id) } ++
        secretDrops.map { case (id, _) => id -> col(id) } ++
        Seq("pk_dup", "fk_orphan", "bad_lang", "unknown_lang", "high_ppl")
          .map(id => id -> col(id))
    // heuristic drop rules need the metric columns attached first
    df = df.withColumns(Heuristics.dropRules(cfg.quality).toMap)

    val reasonArr = filter(
      array(ruleCols.map { case (id, _) => when(col(id), lit(id)) }: _*),
      x => x.isNotNull)
    df.withColumn("drop_reasons", reasonArr)
      .withColumn("keep", size(col("drop_reasons")) === 0)
  }

  /** All rule ids the pipeline can fire, in declaration order. */
  def ruleIds(cfg: Config = Config()): Seq[String] =
    Heuristics.dropRules(cfg.quality).map(_._1) ++
      Scrub.dropPatterns.map(_._1) ++
      Seq("pk_dup", "fk_orphan", "bad_lang", "unknown_lang", "high_ppl")

  /** Narrow the annotated frame to the typed verdict dataset. */
  def verdicts(annotated: DataFrame): Dataset[FileVerdict] = {
    import annotated.sparkSession.implicits._
    val scrubNames = Scrub.patterns.map(_._1)
    annotated.select(
      col("repo"), col("path"), col("commit"), col("lang"), col("keep"),
      col("drop_reasons").as("dropReasons"),
      col("scrubbed_content").as("scrubbedContent"),
      map_from_arrays(
        array(scrubNames.map(lit): _*),
        array(scrubNames.map(n => col(s"scrub_$n").cast("int")): _*))
        .as("scrubCounts"),
      col("content_sha256").as("contentSha256")).as[FileVerdict]
  }

  /** End-to-end convenience: files → verdicts. */
  def run(files: Dataset[FileRow], commitsDim: DataFrame,
      cfg: Config = Config()): Dataset[FileVerdict] =
    verdicts(annotate(score(files), commitsDim, cfg))

  /** Per-rule lineage (rows scanned, violations, scrub totals) in ONE
    * aggregation pass over the annotated frame (north_rule lineage rows).
    */
  def lineage(annotated: DataFrame, runId: String,
      cfg: Config = Config()): Seq[LineageRow] = {
    val rules = ruleIds(cfg)
    val scrubs = Scrub.patterns.map(_._1)
    val aggs =
      rules.map(id => coalesce(sum(when(col(id), 1L)), lit(0L)).as(s"v_$id")) ++
        scrubs.map(n => coalesce(sum(col(s"scrub_$n")), lit(0L)).as(s"s_$n")) :+
        count(lit(1)).as("rows_scanned")
    val row = annotated.agg(aggs.head, aggs.tail: _*).head()
    val scanned = row.getAs[Long]("rows_scanned")
    rules.map(id =>
      LineageRow(runId, "filter", id, scanned, row.getAs[Long](s"v_$id"), 0L)) ++
      scrubs.map(n =>
        LineageRow(runId, "scrub", n, scanned, 0L, row.getAs[Long](s"s_$n")))
  }

  /** Per-partition lineage rows (north_rule: "per-partition lineage"). */
  def partitionLineage(annotated: DataFrame, runId: String): DataFrame =
    annotated.groupBy(spark_partition_id().as("partition_id"))
      .agg(
        count(lit(1)).as("rows_scanned"),
        coalesce(sum(when(!col("keep"), 1L)), lit(0L)).as("violations"))
      .withColumn("run_id", lit(runId))
}
