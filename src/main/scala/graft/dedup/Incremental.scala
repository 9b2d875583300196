package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-incremental deduplication — dedup a NEW batch of documents
  * against a persisted index of everything the corpus already holds,
  * without re-reading a byte of the old corpus.
  *
  * This is the operation a living 100 TB corpus actually runs: a daily
  * crawl/commit batch (GBs) arrives and must be checked against the
  * accumulated corpus (TBs). Re-running whole-corpus dedup
  * ([[Dedup.exact]], [[Dedup.minHashPairs]]) re-reads and re-hashes the
  * entire corpus per refresh — O(corpus) per batch. The index makes a
  * refresh O(batch + index-keys): the old corpus is represented by its
  * 32-byte content hashes and its MinHash signatures/band buckets, all
  * keys-only tables that parquet column-prunes to a fraction of corpus
  * size, and the probe never touches old content at all.
  *
  * Index layout under `dir` (all plain parquet, append-grown):
  *   - `exact/`  — (h: sha256 hex, id: min holder id). 1 row per distinct
  *                 content.
  *   - `sigs/`   — (id, sig: array<long>) MinHash signatures of kept docs.
  *   - `bands/band=B/` — (bucket, id), hive-partitioned BY BAND: a probe
  *                 (or a compaction) can process one band directory at a
  *                 time, bounding the working set to 1/bands of the index
  *                 at extreme scale; a band is also the natural unit for
  *                 bucket-sorted rewrites.
  *
  * The probe decision per new document, in precedence order:
  *   1. `exact`   — its sha256 already in `exact/` (byte-identical seen).
  *   2. `neardup` — some surviving band bucket it shares with the index
  *                  verifies at signature agreement ≥ cfg.threshold;
  *                  `match_id` = the smallest matching index id.
  *   3. `new`     — neither; the batch's keeper. [[appendIndex]] folds the
  *                  keepers back so the next batch sees them.
  *
  * Within-batch duplication is deliberately out of scope: run the regular
  * whole-batch operators first ([[Dedup.exact]] → [[Dedup.minHashPairs]] —
  * the batch is small, that is cheap), then probe the survivors. The same
  * contract as [[Dedup.dropHotBuckets]] applies to the index: index only
  * deduplicated content, or identical-content bucket groups grow past the
  * cap and get pruned (loudly, via Diag).
  *
  * Scale notes: the exact probe is a keys-only join (32 B/row both sides)
  * — sort-merge beyond [[Dedup.BroadcastCandPairs]] batch rows, broadcast
  * of the BATCH side (never the index) below it. The band join is
  * merge-hinted both ways (both sides are data-sized; static parquet/range
  * stats routinely mis-broadcast — see [[Dedup.fetchPairSides]]).
  * Signature verification reuses [[Dedup.fetchPairSides]]'s
  * candidate-count-gated strategy. Reference scope: the reference engine
  * re-generates full-table SQL per run (DataQualityCheck_GenerateSQL.py);
  * incremental probing has no counterpart there — this is a §2.5
  * extension for corpus refresh.
  */
object Incremental {

  /** Build (overwrite) the index from a deduplicated kept corpus. */
  def writeIndex(df: DataFrame, idCol: String, textCol: String, dir: String,
      cfg: Dedup.MinHashConfig = Dedup.MinHashConfig()): Unit =
    write(df, idCol, textCol, dir, cfg, "overwrite")

  /** Fold a new batch's keepers into an existing index. Append-only: no
    * old file is rewritten, so a growing corpus never pays more than
    * O(batch) per refresh. (`exact/` stays 1-row-per-distinct-content as
    * long as callers append only `new`-status survivors, which is the
    * contract.)
    */
  def appendIndex(df: DataFrame, idCol: String, textCol: String, dir: String,
      cfg: Dedup.MinHashConfig = Dedup.MinHashConfig()): Unit =
    write(df, idCol, textCol, dir, cfg, "append")

  private def write(df: DataFrame, idCol: String, textCol: String,
      dir: String, cfg: Dedup.MinHashConfig, mode: String): Unit = {
    val base = df.select(col(idCol).cast("long").as("id"), col(textCol))
    base.select(sha2(col(textCol).cast("binary"), 256).as("h"), col("id"))
      .groupBy("h").agg(min("id").as("id"))
      .write.mode(mode).parquet(s"$dir/exact")
    val sigs = graft.util.Caches.track(
      Dedup.minHashSignatures(base, "id", textCol, cfg))
    sigs.write.mode(mode).parquet(s"$dir/sigs")
    // bands land in compactIndex's canonical layout from the FIRST write
    // (guide §6: partitioning + sort order on write determine reader
    // skipping): range-partitioned on (band, bucket) and bucket-sorted
    // within files, so parquet row-group min/max stats prune bucket probes
    // and each band directory holds a few contiguous-range files instead
    // of one shard per upstream task. Probe results are layout-independent
    // (IncrementalSpec pins probe equality across a compact).
    Dedup.lshBuckets(sigs, "id", cfg)
      .repartitionByRange(col("band"), col("bucket"))
      .sortWithinPartitions("band", "bucket", "id")
      .write.mode(mode).partitionBy("band").parquet(s"$dir/bands")
    graft.util.Caches.release()
  }

  /** Compact the index at `dir` in place. Append-only growth trades write
    * cost for read amplification: after K appends each index table holds K
    * generations of small files, and `bands/` rows arrive in append order,
    * so a probe reads every file of every touched band. Compaction
    * rewrites each table canonically — `exact/` re-grouped to one row per
    * distinct content (healing any double-append of the same keeper),
    * `sigs/` de-duplicated by id, `bands/` made distinct and rewritten
    * BUCKET-SORTED within each band partition so parquet row-group min/max
    * stats prune bucket probes — then swaps directories with per-table
    * filesystem renames (atomic on HDFS/local; run it between probe
    * batches, like any snapshot maintenance job). Correctness does not
    * depend on compaction: [[probe]] is a pure function of index CONTENT,
    * which compaction preserves (IncrementalSpec asserts probe equality
    * across a compact).
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val tmp = s"$dir/.compact"
    spark.read.parquet(s"$dir/exact")
      .groupBy("h").agg(min("id").as("id"))
      .write.mode("overwrite").parquet(s"$tmp/exact")
    spark.read.parquet(s"$dir/sigs").dropDuplicates("id")
      .write.mode("overwrite").parquet(s"$tmp/sigs")
    spark.read.parquet(s"$dir/bands")
      .select(col("band"), col("bucket"), col("id")).distinct()
      .repartitionByRange(col("band"), col("bucket"))
      .sortWithinPartitions("band", "bucket", "id")
      .write.mode("overwrite").partitionBy("band").parquet(s"$tmp/bands")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Seq("exact", "sigs", "bands").foreach { t =>
      val cur = new org.apache.hadoop.fs.Path(s"$dir/$t")
      val old = new org.apache.hadoop.fs.Path(s"$tmp/$t.old")
      fs.rename(cur, old)
      if (!fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/$t"), cur)) {
        fs.rename(old, cur) // roll back rather than leave a missing table
        throw new java.io.IOException(s"compactIndex: swap failed for $dir/$t")
      }
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  /** Probe a new batch against the index at `dir`. Returns one row per
    * input id: (idCol, status ∈ {exact, neardup, new}, match_id — the
    * matched index id, -1 for status=new). Pure function of (batch,
    * index); layout-independent.
    */
  def probe(df: DataFrame, idCol: String, textCol: String, dir: String,
      cfg: Dedup.MinHashConfig = Dedup.MinHashConfig()): DataFrame = {
    val spark = df.sparkSession
    val base = graft.util.Caches.track(
      df.select(col(idCol).cast("long").as("id"), col(textCol).as("__text"),
        sha2(col(textCol).cast("binary"), 256).as("__h")))
    val nBatch = base.count()
    val small = nBatch <= Dedup.BroadcastCandPairs
    graft.util.Diag.put("incdedup.batch_rows", nBatch)
    graft.util.Diag.put("incdedup.exact_path",
      if (small) "broadcast_batch" else "sort_merge")
    val idxExact = spark.read.parquet(s"$dir/exact")
      .select(col("h").as("__h"), col("id").as("__idx_id"))
    // the BATCH side broadcasts (bounded by the gate above); the index
    // side never does — it is corpus-sized
    val keys = base.select(col("id"), col("__h"))
    val exactHits = (if (small) broadcast(keys) else keys.hint("merge"))
      .join(idxExact, Seq("__h"))
      .groupBy(col("id")).agg(min(col("__idx_id")).as("__match"))
    val exactBc = graft.util.Caches.track(exactHits)

    // near-dup probe runs only over ids that missed the exact gate
    val rem = base.join(exactBc.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("__text"))
    val sigs = graft.util.Caches.track(
      Dedup.minHashSignatures(rem, "id", "__text", cfg))
    val newBands0 = Dedup.dropHotBuckets(
      Dedup.lshBuckets(sigs, "id", cfg), cfg.maxBucket)
      .select(col("band"), col("bucket"), col("id").as("id_a"))
    // the BATCH's banded side broadcasts while bounded (nBatch × bands
    // rows of three ints — the same already-counted gate the exact probe
    // uses, tightened by the band multiplier): the band probe then runs
    // map-side over the index scan with no shuffle or sort of either
    // side. The INDEX side never broadcasts — it is corpus-sized. Beyond
    // the gate both sides fall back to the merge join (spills at any
    // size; static stats must never pick the build — see
    // Dedup.fetchPairSides).
    val bandSmall = nBatch * cfg.bands <= Dedup.BroadcastCandPairs
    graft.util.Diag.put("incdedup.band_path",
      if (bandSmall) "broadcast_batch" else "sort_merge")
    val newBands =
      if (bandSmall) broadcast(newBands0) else newBands0.hint("merge")
    val idxBands = Dedup.dropHotBuckets(
      spark.read.parquet(s"$dir/bands")
        .select(col("band"), col("bucket"), col("id")),
      cfg.maxBucket)
      .select(col("band"), col("bucket"), col("id").as("id_b"))
    val cand = graft.util.Caches.track(
      newBands.join(idxBands, Seq("band", "bucket"))
        .select("id_a", "id_b").distinct())
    val sa = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
    val sb = spark.read.parquet(s"$dir/sigs")
      .select(col("id").as("id_b"), col("sig").as("sig_b"))
    val nearHits = Dedup.fetchPairSides(cand, sa, sb)
      .withColumn("__agree",
        graft.functions.expressions.sig_agree(
          col("sig_a"), col("sig_b"), cfg.numHashes))
      .filter(col("__agree") >= cfg.threshold)
      .groupBy(col("id_a")).agg(min(col("id_b")).as("__match"))
      .select(col("id_a").as("id"), col("__match"))

    base.select(col("id"))
      .join(exactBc.withColumnRenamed("__match", "__ex"), Seq("id"), "left")
      .join(nearHits.withColumnRenamed("__match", "__nd"), Seq("id"), "left")
      .select(col("id").as(idCol),
        when(col("__ex").isNotNull, lit("exact"))
          .when(col("__nd").isNotNull, lit("neardup"))
          .otherwise(lit("new")).as("status"),
        coalesce(col("__ex"), col("__nd"), lit(-1L)).as("match_id"))
  }
}
