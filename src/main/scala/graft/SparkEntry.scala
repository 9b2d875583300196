package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.checks.Checks
import graft.corpus.CorpusGen
import graft.filter.{LangId, Perplexity, QualityPipeline}
import graft.model._

/** Driver contract — one entry per implemented operator (SURVEY.md §2).
  *
  * Oracle-parity rules used throughout:
  *  - every aggregate is aliased identically in Spark and the DuckDB SQL;
  *  - money aggregates go through DECIMAL(12,2) and are emitted as BIGINT
  *    "cents" (scaled integers) — double-sum ordering differences between
  *    engines can never flip an exact-decimal integer;
  *  - detail/sample queries carry a TOTAL deterministic ordering before
  *    LIMIT, so both engines pick the same rows.
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def dec(c: Column): Column = c.cast("decimal(12,2)")

  /** Flagship: the quality-filter pipeline over a synthesized corpus
    * (BASELINE.json north_rule). Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val files = CorpusGen.files(spark, 2000L)
    QualityPipeline.run(files, CorpusGen.commitsDim(spark)).toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- O1/O2: PK uniqueness (counts + detail sample) -------------------
    "q_pk_check" -> ((s, dir) =>
      Checks.pk(PkRule("pk1", "orders", Seq("o_custkey")),
        tbl(s, dir, "orders")).countsDf),
    "q_pk_detail" -> ((s, dir) =>
      Checks.pk(PkRule("pk1", "orders", Seq("o_custkey")),
        tbl(s, dir, "orders")).detail),
    // multi-column + WHERE variant
    "q_pk_multi" -> ((s, dir) =>
      Checks.pk(PkRule("pk2", "lineitem", Seq("l_orderkey", "l_partkey"),
        where = Some("l_quantity > 25")), tbl(s, dir, "lineitem")).countsDf),

    // ---- O4/O5: FK referential (with father-side WHERE → real orphans) ---
    "q_fk_orphans" -> ((s, dir) =>
      Checks.fk(FkRule("fk1", "lineitem", Seq("l_orderkey"), "orders",
        Seq("o_orderkey"), fatherWhere = Some("o_totalprice > 300000")),
        tbl(s, dir, "lineitem"), tbl(s, dir, "orders")).countsDf),
    "q_fk_detail" -> ((s, dir) =>
      Checks.fk(FkRule("fk1", "lineitem", Seq("l_orderkey"), "orders",
        Seq("o_orderkey"), fatherWhere = Some("o_totalprice > 300000")),
        tbl(s, dir, "lineitem"), tbl(s, dir, "orders")).detail),

    // ---- O6: FC bidirectional --------------------------------------------
    "q_fc_check" -> ((s, dir) =>
      Checks.fc(FcRule("fc1", "orders", Seq("o_custkey"), "customer",
        Seq("c_custkey"), fatherWhere = Some("c_acctbal > 0")),
        tbl(s, dir, "orders"), tbl(s, dir, "customer")).countsDf),

    // ---- O7: zipper-chain interval overlap (window lag) ------------------
    "q_zc_overlap" -> ((s, dir) => {
      val df = tbl(s, dir, "orders")
        .withColumn("end_dt", col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      Checks.zc(ZcRule("zc1", "orders", Seq("o_custkey"), "o_orderdate",
        "end_dt", orderTiebreak = Seq("o_orderkey")), df).countsDf
    }),

    // ---- O8/O9: code-value domain ----------------------------------------
    "q_code_domain" -> ((s, dir) =>
      Checks.domain(DomainRule("vc1", "orders", "o_orderstatus",
        Set("O", "F")), tbl(s, dir, "orders")).countsDf),
    "q_code_detail" -> ((s, dir) =>
      Checks.domain(DomainRule("vc1", "orders", "o_orderstatus",
        Set("O", "F")), tbl(s, dir, "orders")).detail),

    // ---- O10: PDM code-table domain (broadcast anti-join) ----------------
    "q_pc_codetable" -> ((s, dir) =>
      Checks.codeTable(CodeTableRule("pc1", "customer", Seq("c_nationkey"),
        "nation", Seq("n_nationkey"),
        where = Some("c_nationkey < 20")), // father restricted below
        tbl(s, dir, "customer"),
        tbl(s, dir, "nation").filter(col("n_regionkey") < 3)).countsDf),

    // ---- O12: expected-count (UU) ----------------------------------------
    "q_uu_expected" -> ((s, dir) =>
      Checks.expectedCount(ExpectedCountRule("uu1", "orders",
        df => df.filter(col("o_orderstatus") === "O"), expected = 4000L),
        tbl(s, dir, "orders")).countsDf),

    // ---- headline relational queries (scan/agg/join/window) --------------
    "q1_agg" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("bigint").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          (sum(dec(col("l_extendedprice"))) * 100).cast("bigint")
            .as("price_cents"),
          (sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
            * 10000).cast("bigint").as("revenue_e4"))),
    "q_join_agg" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val c = broadcast(tbl(s, dir, "customer"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(dec(col("o_totalprice"))) * 100).cast("bigint")
            .as("total_cents"))
    }),
    "q_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      tbl(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("o_custkey") <= 200)
        .select(col("o_custkey"), col("o_orderkey").as("top_orderkey"),
          (dec(col("o_totalprice")) * 100).cast("bigint").as("top_cents"))
    }),

    // ---- text analysis over documents ------------------------------------
    "q_text_tokens" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("bigint").as("sum_chars"),
          sum(size(split(trim(col("text")), "\\s+"))).cast("bigint")
            .as("n_tokens"))),

    // ---- exact dedup over documents ---------------------------------------
    "q_dedup_exact" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
        .select(col("keep_id"), col("dup_cnt"))),

    // ---- north-rule pipeline (rows-only: corpus is engine-synthesized) ---
    "q_quality_pipeline" -> ((s, _) => {
      val verdicts = QualityPipeline.run(
        CorpusGen.files(s, 5000L), CorpusGen.commitsDim(s)).toDF()
      verdicts.select(explode_outer(col("dropReasons")).as("rule_id"),
          col("keep"))
        .groupBy(coalesce(col("rule_id"), lit("__kept__")).as("rule_id"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("rule_id"))
    }),
    "q_langid" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, t) =>
          (id, LangId.classify(t), Perplexity.score(t)) }
        .toDF("doc_id", "pred_lang", "perplexity")
        .groupBy(col("pred_lang")).agg(count(lit(1)).as("n"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q_pk_check" ->
      """SELECT CAST(coalesce(sum(cnt),0) AS BIGINT) AS all_cnt,
         CAST(coalesce(sum(CASE WHEN cnt>1 THEN cnt END),0) AS BIGINT) AS failed_cnt
         FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_custkey)""",
    "q_pk_detail" ->
      """SELECT CAST(o_custkey AS VARCHAR) AS checkColumn1,
         CAST(count(*) AS BIGINT) AS sampleCnt
         FROM orders GROUP BY o_custkey HAVING count(*) > 1
         ORDER BY sampleCnt DESC, checkColumn1 LIMIT 50""",
    "q_pk_multi" ->
      """SELECT CAST(coalesce(sum(cnt),0) AS BIGINT) AS all_cnt,
         CAST(coalesce(sum(CASE WHEN cnt>1 THEN cnt END),0) AS BIGINT) AS failed_cnt
         FROM (SELECT count(*) AS cnt FROM lineitem WHERE l_quantity > 25
               GROUP BY l_orderkey, l_partkey)""",
    "q_fk_orphans" ->
      """SELECT CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS all_cnt,
         CAST((SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
           (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000))
           AS BIGINT) AS failed_cnt""",
    "q_fk_detail" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS checkColumn1,
         CAST(count(*) AS BIGINT) AS sampleCnt
         FROM lineitem WHERE l_orderkey NOT IN
           (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)
         GROUP BY l_orderkey
         ORDER BY sampleCnt DESC, checkColumn1 LIMIT 50""",
    "q_fc_check" ->
      """SELECT
         CAST((SELECT count(*) FROM orders) +
              (SELECT count(*) FROM customer WHERE c_acctbal > 0) AS BIGINT)
           AS all_cnt,
         CAST((SELECT count(*) FROM orders WHERE o_custkey NOT IN
                 (SELECT c_custkey FROM customer WHERE c_acctbal > 0)) +
              (SELECT count(*) FROM customer WHERE c_acctbal > 0
                 AND c_custkey NOT IN (SELECT o_custkey FROM orders))
           AS BIGINT) AS failed_cnt""",
    "q_zc_overlap" ->
      """SELECT CAST(count(*) AS BIGINT) AS all_cnt,
         CAST(coalesce(sum(CASE WHEN prev_end IS NOT NULL
           AND o_orderdate < prev_end THEN 1 END),0) AS BIGINT) AS failed_cnt
         FROM (SELECT o_orderdate,
                 lag(o_orderdate + INTERVAL 30 DAY) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                 AS prev_end FROM orders)""",
    "q_code_domain" ->
      """SELECT CAST(count(*) AS BIGINT) AS all_cnt,
         CAST(coalesce(sum(CASE WHEN coalesce(o_orderstatus,'') <> ''
           AND o_orderstatus NOT IN ('O','F') THEN 1 END),0) AS BIGINT)
           AS failed_cnt FROM orders""",
    "q_code_detail" ->
      """SELECT CAST(o_orderstatus AS VARCHAR) AS cdeVal,
         CAST(count(*) AS BIGINT) AS sampleCnt
         FROM orders WHERE coalesce(o_orderstatus,'') <> ''
           AND o_orderstatus NOT IN ('O','F')
         GROUP BY o_orderstatus ORDER BY sampleCnt DESC, cdeVal LIMIT 500""",
    "q_pc_codetable" ->
      """SELECT CAST((SELECT count(*) FROM customer WHERE c_nationkey < 20)
           AS BIGINT) AS all_cnt,
         CAST((SELECT count(*) FROM customer WHERE c_nationkey < 20
           AND c_nationkey NOT IN (SELECT n_nationkey FROM nation
             WHERE n_regionkey < 3)) AS BIGINT) AS failed_cnt""",
    "q_uu_expected" ->
      """SELECT CAST(count(*) AS BIGINT) AS all_cnt,
         CAST(count(*) - 4000 AS BIGINT) AS failed_cnt
         FROM orders WHERE o_orderstatus = 'O'""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT)
           AS price_cents,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                  CAST(1 - l_discount AS DECIMAL(12,2))) * 10000 AS BIGINT)
           AS revenue_e4
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q_join_agg" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
           AS total_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey AS top_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS top_cents
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
         WHERE rn = 1 AND o_custkey <= 200""",
    "q_text_tokens" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(length(text)) AS BIGINT) AS sum_chars,
         CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
           AS n_tokens
         FROM documents GROUP BY lang""",
    "q_dedup_exact" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
         CAST(count(*) AS BIGINT) AS dup_cnt
         FROM documents GROUP BY text""")
}
