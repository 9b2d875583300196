package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) transformation — the published code-corpus
  * training transform (Bavarian et al. 2022, "Efficient Training of
  * Language Models to Fill in the Middle"; applied at corpus scale by
  * StarCoder): with probability `rate`, a document is split at two
  * uniform character positions into (prefix, middle, suffix) and
  * re-serialized with sentinel tokens so the model learns to infill —
  *
  *   PSM:  <fim_prefix> P <fim_suffix> S <fim_middle> M
  *   SPM:  <fim_suffix> S <fim_prefix> P <fim_middle> M
  *   (SPM = the paper's suffix-prefix-middle variant, `spmFraction` of
  *   the transformed docs; sentinel spellings are StarCoder's published
  *   special tokens, overridable)
  *
  * Determinism is the whole design: the apply/skip decision, both cut
  * points, and the PSM/SPM choice derive from xxhash64 of the row
  * identity (seeded) — a pure function of the row, so re-runs, resumes,
  * and any partition layout produce the identical corpus (the pipeline's
  * verdict-purity invariant extended to transforms). Everything is one
  * map-side codegen projection: `length`/`substring`/`concat` — zero
  * shuffle, no UDF. An independent engine replays the rule from the
  * dumped hashes with its own substr arithmetic (the `q_fim` oracle).
  *
  * Cut rule (replayable integer arithmetic, no floats): for text of
  * character length L, cuts are `pmod(h1, L+1)` and `pmod(h2, L+1)`,
  * lo = min, hi = max; prefix = [0, lo), middle = [lo, hi),
  * suffix = [hi, L). Degenerate cuts (lo == hi → empty middle; lo == 0 →
  * empty prefix) are kept — the paper trains on them too.
  */
object Fim {

  /** StarCoder's published FIM sentinel spellings. */
  val PrefixTok = "<fim_prefix>"
  val MiddleTok = "<fim_middle>"
  val SuffixTok = "<fim_suffix>"

  /** Append FIM columns: `fim_applied`, `fim_spm`, `fim_cut_lo`,
    * `fim_cut_hi`, and `fim_text` (the serialized document — untouched
    * original when not applied). `idCols` is the row identity the
    * decisions hash; `rate`/`spmFraction` are percentages acting on
    * integer hash buckets of 100 so the oracle replays them exactly.
    */
  def withFim(df: DataFrame, textCol: String, idCols: Seq[String],
      rate: Int = 50, spmFraction: Int = 50, seed: Long = 42L,
      prefixTok: String = PrefixTok, middleTok: String = MiddleTok,
      suffixTok: String = SuffixTok): DataFrame = {
    require(rate >= 0 && rate <= 100, s"rate=$rate outside [0,100]")
    require(spmFraction >= 0 && spmFraction <= 100,
      s"spmFraction=$spmFraction outside [0,100]")
    require(idCols.nonEmpty, "idCols must name the row identity")
    val t = col(textCol)
    val ids = idCols.map(col)
    def h(k: Long) = graft.sampling.Sampling.sampleHash(seed ^ k, ids)
    val len = length(t).cast("long")
    val applied = t.isNotNull && pmod(h(0L), lit(100L)) < rate
    val c1 = pmod(h(1L), len + 1L)
    val c2 = pmod(h(2L), len + 1L)
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    val spm = pmod(h(3L), lit(100L)) < spmFraction
    // substring is 1-based; len args stay exact longs (cast for the API)
    val p = substring(t, lit(1), lo.cast("int"))
    val m = substring(t, (lo + 1L).cast("int"), (hi - lo).cast("int"))
    val s = substring(t, (hi + 1L).cast("int"), (len - hi).cast("int"))
    val psm = concat(lit(prefixTok), p, lit(suffixTok), s, lit(middleTok), m)
    val spmSer = concat(lit(suffixTok), s, lit(prefixTok), p, lit(middleTok), m)
    df.withColumn("fim_applied", applied)
      .withColumn("fim_spm", applied && spm)
      .withColumn("fim_cut_lo", when(applied, lo))
      .withColumn("fim_cut_hi", when(applied, hi))
      .withColumn("fim_text",
        when(!applied, t).when(spm, spmSer).otherwise(psm))
  }
}
