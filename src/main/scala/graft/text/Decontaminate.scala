package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-gram shingles with an evaluation/benchmark set — the public recipe
  * (GPT-3 appendix C, PaLM, Llama reports all describe n-gram-collision
  * decontamination of pretraining corpora against eval sets).
  *
  * Scale shape: the BENCHMARK side is small by nature (eval sets are
  * thousands of documents, not billions), so its distinct shingle set
  * broadcasts and the corpus-side probe is map-side — no shuffle touches
  * content; the only aggregation is hit-counting by document id. Shingles
  * are the same deterministic hashed word n-grams the dedup stages use
  * ([[graft.dedup.Dedup.shingles]]), at a longer n (default 8): long
  * n-grams make coincidental collisions rare, so any hit is meaningful —
  * the same reasoning the published pipelines give for 8-13-gram windows.
  */
object Decontaminate {

  /** (id, shingle-hash) — one row per distinct n-gram per document. */
  def docShingles(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, t) => graft.dedup.Dedup.shingles(t, n).map((id, _)) }
      .toDF(idCol, "shingle")
  }

  /** Per-document contamination: `n_hits` = distinct benchmark shingles
    * the document contains, `contaminated` = n_hits ≥ minHits. Every
    * input document appears in the output (zero hits included) so the
    * caller can anti-join or filter either way.
    */
  def contaminationFlags(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int = 8, minHits: Int = 1): DataFrame = {
    require(n > 0 && minHits > 0, s"n=$n minHits=$minHits must be positive")
    val benchShingles = broadcast(
      docShingles(benchmark.select(lit(0L).as("__bid"),
          col(benchTextCol).as("__btxt")), "__bid", "__btxt", n)
        .select(col("shingle")).distinct())
    val hits = docShingles(docs, idCol, textCol, n)
      .join(benchShingles, Seq("shingle"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    docs.select(col(idCol).cast("long"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") >= minHits)
  }

  /** [[contaminationFlags]] for a HUGE eval-shingle set — the scale path
    * when the exact distinct set no longer broadcasts (10^8+ shingles ≈
    * gigabytes exact vs tens of MB as a sketch). Two stages, IDENTICAL
    * output to the exact route (spec-pinned):
    *
    *   1. a Bloom sketch of the benchmark shingles (Spark's public
    *      `stat.bloomFilter` — one distributed aggregate) rides the plan
    *      as a literal and prefilters the corpus shingles MAP-SIDE via the
    *      codegen [[graft.functions.BloomMightContainLong]] probe — no
    *      false negatives, so nothing contaminated can slip past;
    *   2. the surviving candidates (true hits + fpp·|corpus shingles|
    *      false positives) are verified with an exact SHUFFLE semi-join
    *      against the true set — removing the false positives, which is
    *      what makes the two routes byte-identical.
    *
    * The shuffle carries only the candidate (shingle, id) pairs — at 1 %
    * fpp that is ~1 % of the corpus-shingle volume the exact route never
    * shuffles at all, which is the trade: tiny broadcast + small shuffle
    * vs huge broadcast + no shuffle. `expectedShingles = 0` counts the
    * benchmark side first (one extra slim pass over the SMALL side) to
    * size the sketch.
    *
    * CALLER-MUST-RELEASE: the benchmark-shingle frame is persisted (it is
    * consumed by the sketch build AND the verify join) and registered via
    * [[graft.util.Caches.track]]. Inside a `Caches.scoped { ... }` block
    * (how Runner/Verify/Bench call it) release is automatic; DIRECT library
    * use must call `graft.util.Caches.release()` after the consuming action
    * or the cache stays pinned in executor memory for the session's
    * lifetime.
    */
  def contaminationFlagsBloom(docs: DataFrame, idCol: String,
      textCol: String, benchmark: DataFrame, benchTextCol: String,
      n: Int = 8, minHits: Int = 1, fpp: Double = 0.01,
      expectedShingles: Long = 0L): DataFrame = {
    require(n > 0 && minHits > 0, s"n=$n minHits=$minHits must be positive")
    require(fpp > 0.0 && fpp < 1.0, s"fpp=$fpp outside (0,1)")
    val benchShingles = graft.util.Caches.track(
      docShingles(benchmark.select(lit(0L).as("__bid"),
          col(benchTextCol).as("__btxt")), "__bid", "__btxt", n)
        .select(col("shingle")).distinct())
    val expected = if (expectedShingles > 0) expectedShingles
      else math.max(benchShingles.count(), 1L)
    val bloom = benchShingles.stat.bloomFilter("shingle", expected, fpp)
    val candidates = docShingles(docs, idCol, textCol, n)
      .filter(graft.functions.expressions
        .bloom_might_contain(col("shingle"), bloom))
    val hits = candidates
      .join(benchShingles.hint("shuffle_hash"), Seq("shingle"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    docs.select(col(idCol).cast("long"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") >= minHits)
  }

  // ---- exact-substring decontamination (Aho–Corasick) --------------------

  /** Needle set for [[exactSubstringFlags]]: the NON-OVERLAPPING
    * length-`chunk` character windows of each benchmark document
    * (stride = chunk, tail shorter than `chunk` dropped), distinct across
    * the whole benchmark. Extraction is pure Spark SQL (`sequence` +
    * `substr`), so an independent engine counting characters the same way
    * (code points — DuckDB's substring/length agree with Spark's) can
    * re-derive the identical set: the q_decon_substring oracle does.
    */
  def benchNeedles(benchmark: DataFrame, benchTextCol: String,
      chunk: Int): DataFrame = {
    require(chunk > 0, s"chunk=$chunk must be positive")
    val t = col(benchTextCol)
    val nChunks = floor(length(t) / chunk).cast("int")
    benchmark
      .filter(length(t) >= chunk)
      .select(explode(transform(
        sequence(lit(0), nChunks - 1),
        (k: Column) => t.substr(k * chunk + 1, lit(chunk)))).as("needle"))
      .distinct()
  }

  /** Verbatim-overlap decontamination: flag training documents that
    * contain an exact character substring of a benchmark document — the
    * complement of the shingle recipe above (shingles tokenize first, so
    * whitespace/markup edits dodge them; verbatim matching catches the
    * straight copy-paste). Published pipelines run both (Lee et al. 2022
    * run exact-substring matching at 50-token windows for dedup and the
    * same machinery for eval decontamination).
    *
    * Mechanism: the benchmark is chunked into its aligned length-`chunk`
    * windows ([[benchNeedles]]) and a single Aho–Corasick automaton over
    * all needles ([[SubstringAutomaton]]) is broadcast; each training
    * document is scanned ONCE, whatever the needle count. `n_hits` =
    * DISTINCT needles found. GUARANTEE: any verbatim overlap of length
    * ≥ 2·chunk−1 characters necessarily contains one aligned full chunk
    * and is caught; shorter overlaps are caught only when aligned.
    *
    * Scale shape: eval sets are thousands of documents, so the automaton
    * (O(total benchmark chars) nodes) broadcasts once; the corpus-side
    * probe is embarrassingly parallel and SHUFFLE-FREE — flags are
    * computed map-side, no join, no aggregation. `maxNeedles` is a
    * loud guard on the broadcast size, not a silent cap.
    */
  def exactSubstringFlags(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      chunk: Int = 64, minHits: Int = 1,
      maxNeedles: Int = 1 << 22): DataFrame = {
    require(minHits > 0, s"minHits=$minHits must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val needles = benchNeedles(benchmark, benchTextCol, chunk)
      .as[String].collect()
    require(needles.length <= maxNeedles,
      s"${needles.length} needles exceed maxNeedles=$maxNeedles — " +
        "raise the cap only if the benchmark side is genuinely this large")
    val auto = SubstringAutomaton.build(needles)
    val bc = spark.sparkContext.broadcast(auto)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val a = bc.value
        // reusable per-partition hit set: O(hits) reset per document
        val seen = new java.util.BitSet(a.numNeedles)
        it.map { case (id, text) =>
          (id, a.countDistinctHits(text, seen).toLong)
        }
      }
      .toDF(idCol, "n_hits")
      .withColumn("contaminated", col("n_hits") >= minHits)
  }
}

/** Aho–Corasick automaton over a set of EQUAL-LENGTH needles, frozen to
  * compact parallel arrays for broadcast. Equal length (plus distinct)
  * means no needle is a proper substring of another, so terminal nodes
  * are leaves and no dictionary-suffix chain is needed — each position
  * match reports at most one needle.
  *
  * Transitions are binary-searched over per-node sorted child arrays:
  * O(log fanout) per char, compactly serializable, cache-friendly —
  * chosen over a per-node hash map for broadcast size and over a dense
  * char table for alphabet independence (needles carry arbitrary UTF-16).
  */
final class SubstringAutomaton private[text] (
    childKeys: Array[Array[Char]],
    childVals: Array[Array[Int]],
    fail: Array[Int],
    term: Array[Int],
    val numNeedles: Int) extends Serializable {

  private def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val i = java.util.Arrays.binarySearch(childKeys(s), c)
      if (i >= 0) return childVals(s)(i)
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  /** Number of DISTINCT needles occurring in `text` (0 for null). `seen`
    * is caller-provided scratch (≥ numNeedles bits), left cleared.
    */
  def countDistinctHits(text: String, seen: java.util.BitSet): Int = {
    if (text == null || numNeedles == 0) return 0
    var s = 0
    var n = 0
    var i = 0
    val m = text.length
    while (i < m) {
      s = step(s, text.charAt(i))
      val t = term(s)
      if (t >= 0 && !seen.get(t)) { seen.set(t); n += 1 }
      i += 1
    }
    if (n > 0) seen.clear() // leave the scratch cleared for the next doc
    n
  }
}

object SubstringAutomaton {

  /** Build from needles (must be equal-length and distinct — enforced). */
  def build(needles: Array[String]): SubstringAutomaton = {
    require(needles.map(_.length).distinct.length <= 1,
      "needles must be equal-length (aligned benchmark chunks)")
    require(needles.distinct.length == needles.length,
      "needles must be distinct")
    import scala.collection.mutable
    val keys = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Char])
    val vals = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    val term = mutable.ArrayBuffer(-1)
    def child(s: Int, c: Char): Int = {
      val i = keys(s).indexOf(c)
      if (i >= 0) vals(s)(i) else -1
    }
    // trie insert (child lists kept sorted at freeze time)
    needles.zipWithIndex.foreach { case (w, wi) =>
      var s = 0
      w.foreach { c =>
        val nx = child(s, c)
        s = if (nx >= 0) nx
        else {
          keys += mutable.ArrayBuffer.empty[Char]
          vals += mutable.ArrayBuffer.empty[Int]
          term += -1
          keys(s) += c; vals(s) += keys.length - 1
          keys.length - 1
        }
      }
      term(s) = wi
    }
    // BFS failure links
    val fail = Array.fill(keys.length)(0)
    val q = mutable.Queue.empty[Int]
    keys(0).indices.foreach(i => q += vals(0)(i))
    while (q.nonEmpty) {
      val s = q.dequeue()
      keys(s).indices.foreach { i =>
        val c = keys(s)(i); val nx = vals(s)(i)
        var f = fail(s)
        var fc = child(f, c)
        while (fc < 0 && f != 0) { f = fail(f); fc = child(f, c) }
        fail(nx) = if (fc >= 0 && fc != nx) fc else 0
        q += nx
      }
    }
    // freeze: sort each node's children for binary search
    val ck = new Array[Array[Char]](keys.length)
    val cv = new Array[Array[Int]](keys.length)
    var s = 0
    while (s < keys.length) {
      val order = keys(s).indices.sortBy(keys(s))
      ck(s) = order.map(keys(s)).toArray
      cv(s) = order.map(vals(s)).toArray
      s += 1
    }
    new SubstringAutomaton(ck, cv, fail, term.toArray, needles.length)
  }
}
