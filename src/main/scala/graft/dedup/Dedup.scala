package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for web-scale corpora: exact, MinHash+LSH, SimHash, and
  * n-gram Jaccard (the standard toolchain of large-scale training-data
  * pipelines — cf. Broder 1997 "On the resemblance and containment of
  * documents"; Charikar 2002 for SimHash; public descriptions of C4/Gopher
  * dedup stages).
  *
  * Scale design:
  *  - exact dedup groups by a 256-bit content hash — the shuffle key is the
  *    hash, never the content, so shuffle volume is O(rows × 32B) not
  *    O(corpus bytes);
  *  - MinHash/SimHash candidate generation is LSH band-bucketing: only
  *    same-bucket pairs are joined, never the full cross product;
  *  - n-gram Jaccard caps inverted-index postings (`maxPostings`) the way
  *    prefix-filtering systems drop stop-shingles — an ubiquitous shingle
  *    contributes candidates quadratically and information ~zero;
  *  - all signatures are computed in one `mapPartitions` pass (pure
  *    per-row functions, deterministic at any parallelism).
  *
  * Caching contract: pair builders cache their signature/index frames via
  * [[graft.util.Caches.track]] because the returned LAZY plan consumes
  * them several times. After running the plan, call
  * `graft.util.Caches.release()` to unpersist exactly those intermediates
  * (a targeted alternative to `spark.catalog.clearCache()`).
  */
object Dedup {

  // ---- shared text → shingle machinery (pure, deterministic) -------------

  /** FNV-1a 64-bit — stable across JVMs (String.hashCode is too, but FNV
    * mixes better and we need many independent derived hashes).
    */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private val tokenSep = java.util.regex.Pattern.compile("[^a-z0-9_]+")

  /** Reference tokenizer (locale pinned to ROOT — the parameterless
    * `String.toLowerCase` reads the JVM default locale, so a Turkish-locale
    * executor would tokenize differently and break the "verdict is a pure
    * function of the row" invariant). The hot paths use [[tokenize]], which
    * is bit-identical and allocation-free; this form remains the executable
    * spec the property tests compare against.
    */
  def tokens(text: String): Array[String] =
    if (text == null) Array.empty
    else tokenSep.split(text.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty)

  /** Packed tokenizer output: lowered token chars sit contiguously in
    * `buf`; token k spans `buf(if (k==0) 0 else ends(k-1)) until ends(k)`,
    * `n` tokens total. No per-token Strings, no lowered copy of the text.
    */
  private[graft] final class Toks(val buf: Array[Char], val ends: Array[Int],
      val n: Int) {
    def start(k: Int): Int = if (k == 0) 0 else ends(k - 1)
    /** Materialized tokens — test/debug surface, not the hot path. */
    def strings: Array[String] =
      Array.tabulate(n)(k => new String(buf, start(k), ends(k) - start(k)))
  }

  /** Single-pass zero-String tokenizer, bit-identical to [[tokens]]
    * (profiled: the regex split + lowered copy + per-token Strings were
    * ~75% of the MinHash signature pass, which itself dominates near-dup
    * cost). Equivalence argument, property-tested in DedupSpec:
    *  - ASCII letters lower arithmetically; digits/underscore pass through;
    *    all other ASCII is a separator — exactly `[^a-z0-9_]+` post-lower.
    *  - Non-ASCII chars can only matter if ROOT-locale lowercasing maps
    *    them into `[a-z0-9_]`. Only two do: U+212A (KELVIN SIGN) → 'k',
    *    and U+0130 (İ) whose FULL mapping is "i" + U+0307 — the combining
    *    dot is a separator, so İ contributes 'i' and closes the token.
    *    Every other char (including surrogate halves) lowers to non-ASCII
    *    and separates.
    */
  private[graft] def tokenize(text: String): Toks = {
    if (text == null) return new Toks(Array.empty, Array.empty, 0)
    val m = text.length
    val buf = new Array[Char](m)
    var ends = new Array[Int](math.max(8, math.min(m / 4 + 1, 1024)))
    var ntok = 0
    var w = 0
    var tokStart = 0
    def close(): Unit = {
      if (w > tokStart) {
        if (ntok == ends.length)
          ends = java.util.Arrays.copyOf(ends, ends.length * 2)
        ends(ntok) = w
        ntok += 1
      }
      tokStart = w
    }
    var i = 0
    while (i < m) {
      val c = text.charAt(i)
      if (c >= 'A' && c <= 'Z') { buf(w) = (c + 32).toChar; w += 1 }
      else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_') {
        buf(w) = c; w += 1
      }
      else if (c < 128) close()
      else if (c == 'İ') { buf(w) = 'i'; w += 1; close() }
      else if (c == 'K') { buf(w) = 'k'; w += 1 }
      else close()
      i += 1
    }
    close()
    new Toks(buf, ends, ntok)
  }

  /** FNV-1a 64 over packed tokens `[start, start+n)` joined by ' ' —
    * bit-identical to [[fnv1aNgram]] over the materialized strings.
    */
  private def fnv1aNgramBuf(t: Toks, start: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var k = 0
    while (k < n) {
      if (k > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
      var i = t.start(start + k)
      val e = t.ends(start + k)
      while (i < e) {
        h ^= t.buf(i).toLong
        h *= 0x100000001b3L
        i += 1
      }
      k += 1
    }
    h
  }

  /** FNV-1a 64 over the space-joined n-gram `ts(start..start+n)` WITHOUT
    * materializing the joined string — bit-identical to
    * `fnv1a64(ts.slice(start, start+n).mkString(" "))`. The slice+mkString
    * form allocates an array, a StringBuilder, and a String per shingle;
    * at corpus scale that allocation churn (not the hashing) dominated the
    * signature pass.
    */
  private def fnv1aNgram(ts: Array[String], start: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var k = 0
    while (k < n) {
      if (k > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
      val t = ts(start + k)
      var i = 0
      while (i < t.length) {
        h ^= t.charAt(i).toLong
        h *= 0x100000001b3L
        i += 1
      }
      k += 1
    }
    h
  }

  /** Distinct hashed word n-gram shingles (sorted — callers use them as a
    * set; sorted order keeps the output deterministic).
    */
  def shingles(text: String, n: Int = 3): Array[Long] = {
    val ts = tokenize(text)
    if (ts.n < n) {
      if (ts.n == 0) Array.empty else Array(fnv1aNgramBuf(ts, 0, ts.n))
    } else {
      val m = ts.n - n + 1
      val raw = new Array[Long](m)
      var i = 0
      while (i < m) { raw(i) = fnv1aNgramBuf(ts, i, n); i += 1 }
      java.util.Arrays.sort(raw)
      var w = 0; var r = 0 // in-place dedup of the sorted run
      while (r < m) {
        if (w == 0 || raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
        r += 1
      }
      if (w == m) raw else java.util.Arrays.copyOf(raw, w)
    }
  }

  /** Executable spec for [[shingles]]: the straightforward split-then-hash
    * form the property tests compare the packed path against.
    */
  private[graft] def shinglesRef(text: String, n: Int = 3): Array[Long] = {
    val ts = tokens(text)
    if (ts.length < n) {
      if (ts.isEmpty) Array.empty else Array(fnv1aNgram(ts, 0, ts.length))
    } else {
      val m = ts.length - n + 1
      val raw = new Array[Long](m)
      var i = 0
      while (i < m) { raw(i) = fnv1aNgram(ts, i, n); i += 1 }
      java.util.Arrays.sort(raw)
      var w = 0; var r = 0
      while (r < m) {
        if (w == 0 || raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
        r += 1
      }
      if (w == m) raw else java.util.Arrays.copyOf(raw, w)
    }
  }

  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = a.toSet
    val inter = b.count(sa.contains)
    inter.toDouble / (a.length + b.length - inter)
  }

  // ---- exact dedup --------------------------------------------------------

  /** Exact dedup on content hash: one row survives per distinct value
    * (deterministic survivor = min id). Adds nothing to shuffle but the
    * 64-char hash + id.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), sha2(col(textCol).cast("binary"), 256).as("h"))
      .groupBy(col("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Survivors only: the deduplicated id set. */
  def exactSurvivors(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exact(df, idCol, textCol).select(col("keep_id").as(idCol))

  // ---- MinHash + LSH ------------------------------------------------------

  final case class MinHashConfig(
      numHashes: Int = 128,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.8,
      seed: Long = 42L,
      /** see [[dropHotBuckets]] */
      maxBucket: Int = DefaultMaxBucket) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rowsPerBand: Int = numHashes / bands
  }

  /** Default cap on LSH bucket size (see [[dropHotBuckets]]). 4096 rows in
    * one bucket already means ~8.4M candidate pairs from that bucket alone.
    */
  val DefaultMaxBucket = 4096

  /** Drop OVERSIZED (band,bucket) groups before a band self-join — the
    * 100 TB skew defense. A bucket of m rows contributes m(m-1)/2
    * candidate pairs; a corpus with heavy exact duplication (or a
    * degenerate signature, e.g. all-empty documents) funnels millions of
    * rows into ONE bucket and turns the "pruned" join quadratic. The hot
    * list is found with a keys-only aggregation and is tiny (only buckets
    * over the cap), so the prune is a broadcast anti-join.
    *
    * CONTRACT (cap is ON by default — read this): run [[exact]] dedup
    * first. An identical-content group LARGER than the cap collides in
    * every band, so every one of its buckets is hot and the group emits
    * ZERO pairs — by design: those rows are [[exact]]'s job (cheaper and
    * lossless), and materializing m²/2 candidate pairs for a
    * million-fold-duplicated boilerplate file is precisely the blow-up
    * that kills a 100 TB job. Near-dup (non-identical) pairs lose at most
    * their hot bands and are still emitted by any non-hot band they
    * share. Set maxBucket=0 to disable the cap when completeness over
    * mass-duplicated input matters more than bounded cost.
    */
  def dropHotBuckets(banded: DataFrame, maxBucket: Int,
      keys: Seq[String] = Seq("band", "bucket")): DataFrame = {
    if (maxBucket <= 0) return banded // cap disabled
    val hot = broadcast(banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bn")).filter(col("__bn") > maxBucket)
      .select(keys.map(col): _*))
    banded.join(hot, keys, "left_anti")
  }

  /** Unordered within-group co-occurrence pairs via ONE grouping pass —
    * the replacement for the banded SELF-JOIN shape (guide §2.3/§2.4:
    * fewer shuffles, fewer bytes). The old plan shuffled the posting frame
    * TWICE (both self-join sides) and sorted both for the merge join; this
    * shuffles it once into bounded per-key groups and emits the i<j pairs
    * map-side. Groups of 1 vanish in the size filter — the dominant case
    * for rare shingles/buckets, which the self-join paid a full sort-merge
    * pass to discover — and `maxGroup` replays [[dropHotBuckets]]'s
    * hot-bucket rule exactly (an over-cap group emits no pairs). The
    * hot-key count pass still runs FIRST (inside [[dropHotBuckets]]) when
    * `maxGroup > 0`, so no collect_list buffer can exceed `maxGroup`
    * payload structs — bounded task state at any corpus duplication level.
    * With `maxGroup = 0` the cap pass is skipped and group state is
    * unbounded, exactly as the uncapped self-join was quadratic — callers
    * that pass 0 must bound group sizes themselves ([[ngramJaccardPairs]]
    * does, via its freq prefilter). NOT used by [[minHashPairs]] /
    * [[simHashPairs]] / [[ngramJaccardPairsPrefix]]: measured at their
    * input shapes the self-join is as fast or faster (see the comments at
    * each site) — this pass wins where postings are singleton-dominated
    * (clone/fork fingerprints, cluster-local SemDeDup, embedding bands).
    *
    * `payload` must be a struct whose FIRST field is an id unique within
    * its group: struct ordering is lexicographic, so `least`/`greatest`
    * orient each pair by that id — identical to the self-join's
    * `id_a < id_b` filter. Returns (a, b) payload-struct columns.
    */
  private[graft] def pairsWithinGroups(posts: DataFrame, keys: Seq[String],
      payload: Column, maxGroup: Int): DataFrame = {
    val tagged = posts.select(keys.map(col) :+ payload.as("__s"): _*)
    val capped = dropHotBuckets(tagged, maxGroup, keys)
    capped.groupBy(keys.map(col): _*)
      .agg(collect_list(col("__s")).as("__ss"))
      .filter(size(col("__ss")) >= 2)
      .select(col("__ss"), posexplode(col("__ss")).as(Seq("__i", "__a")))
      .select(col("__a"),
        explode(slice(col("__ss"), col("__i") + lit(2),
          size(col("__ss")) - col("__i") - lit(1))).as("__b"))
      .select(least(col("__a"), col("__b")).as("a"),
        greatest(col("__a"), col("__b")).as("b"))
      // strict orientation, like the self-join's id_a < id_b: an id that
      // appears twice in one group (duplicate input ids) must not emit a
      // self-pair. Callers pass single-id payloads (or payloads equal iff
      // the id is equal), so struct equality IS id equality here.
      .filter(col("a") =!= col("b"))
  }

  /** The numHashes affine coefficient pairs for a config — derived once,
    * not per document (they depend only on seed/numHashes).
    */
  def minHashCoeffs(cfg: MinHashConfig): (Array[Long], Array[Long]) = {
    val r = new java.util.SplittableRandom(cfg.seed)
    (Array.fill(cfg.numHashes)(r.nextLong() | 1L), // odd multipliers
      Array.fill(cfg.numHashes)(r.nextLong()))
  }

  /** Per-row MinHash signature: min over shingles of (a_j·x + b_j), for
    * numHashes independent affine hash functions (classic MinHash).
    */
  def minHashSignature(sh: Array[Long], cfg: MinHashConfig): Array[Long] = {
    val (as, bs) = minHashCoeffs(cfg)
    minHashSignature(sh, cfg.numHashes, as, bs)
  }

  def minHashSignature(sh: Array[Long], numHashes: Int,
      as: Array[Long], bs: Array[Long]): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val x = sh(i)
      var j = 0
      while (j < numHashes) {
        val h = as(j) * x + bs(j)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** (id, signature: array<long>) for every row. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // coefficients derived once on the driver, shared by every row
    val (as, bs) = minHashCoeffs(cfg)
    val k = cfg.numHashes
    val n = cfg.shingleSize
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, minHashSignature(shingles(text, n), k, as, bs))
      })
      .toDF(idCol, "sig")
  }

  /** LSH band buckets: (id, band, bucket-hash-of-band-slice). Candidate
    * pairs are generated ONLY within (band, bucket) groups.
    */
  def lshBuckets(sigs: DataFrame, idCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    val r = cfg.rowsPerBand
    val bands = (0 until cfg.bands).map { b =>
      struct(lit(b).as("band"),
        hash(slice(col("sig"), b * r + 1, r)).as("bucket"))
    }
    sigs.select(col(idCol), explode(array(bands: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate near-dup pairs with their signature-estimated Jaccard.
    * Pipeline: signature pass → band explode → same-bucket self-join →
    * distinct pairs → signature comparison (estimate = fraction of equal
    * components). Returns (id_a, id_b, est_jaccard) with est ≥ threshold.
    */
  /** Candidate sets up to this many pairs take the broadcast/shuffle-hash
    * signature-fetch plan (candidate ids broadcast ≈ 16 B/pair); bigger
    * sets fall back to sort-merge joins, which spill at any size.
    */
  val BroadcastCandPairs = 1000000L

  /** Join a (id_a, id_b) candidate frame to per-id payload sides `sa`/`sb`
    * with an EXPLICITLY chosen strategy. Left to static estimates the
    * planner can broadcast the wrong side: synthesized corpora descend
    * from `spark.range`, whose leaf stats say "a few MB", so a
    * KiB-per-row signature/vector table looks broadcastable and the
    * broadcast build collects gigabytes into the driver at scale. Here
    * the ids-only candidate side is the one that may broadcast — never
    * the payload table — and beyond [[BroadcastCandPairs]] everything is
    * sort-merge (spills at any size). `cand` must be cached by the
    * caller; the count that picks the strategy doubles as its
    * materialization.
    */
  private[graft] def fetchPairSides(cand: DataFrame, sa: DataFrame,
      sb: DataFrame,
      /** precomputed cand count (callers that also need it for a
        * downstream decision count once and share); -1 = count here */
      nCandKnown: Long = -1L): DataFrame = {
    val nCand = if (nCandKnown >= 0) nCandKnown else cand.count()
    val small = nCand <= BroadcastCandPairs
    graft.util.Diag.put("neardup.cand_pairs", nCand)
    graft.util.Diag.put("neardup.fetch_path",
      if (small) "broadcast" else "sort_merge")
    val withA = (if (small) broadcast(cand) else cand.hint("merge"))
      .join(sa, "id_a")
    // join 2's build side carries the first payload (~KiB/row): hash-build
    // only while bounded by the pair cap, sort-merge beyond it
    (if (small) withA.hint("shuffle_hash") else withA.hint("merge"))
      .join(sb, "id_b")
  }

  def minHashPairs(df: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    val sigs = graft.util.Caches.track(minHashSignatures(df, idCol, textCol, cfg))
    // cache the pruned band frame: it feeds BOTH sides of the self-join
    // (and the hot-bucket aggregation already read the raw explode), so an
    // uncached plan recomputes the 16×-explode + band hashing four times
    val b = graft.util.Caches.track(
      dropHotBuckets(lshBuckets(sigs, idCol, cfg), cfg.maxBucket))
    val left = b.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val right = b.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    // merge hint: both sides of a band self-join are data-sized; left to
    // static estimates (range-derived corpora report a few MB at the leaf)
    // the planner broadcasts one side and the build collect kills the
    // driver at scale. Sort-merge spills at any size; AQE still handles
    // skewed buckets. Kept as a SELF-JOIN, not pairsWithinGroups: measured
    // at the flagship near-dup scale (3M docs, 41M band rows) the grouping
    // pass was ~20% slower end-to-end (112 s vs 93.6 s interleaved) — at
    // 16 bands the posting volume per doc is large and collect_list's
    // sort-based-fallback aggregation beats the merge join's sorts only on
    // small inputs, which this flagship path is not.
    val cand = graft.util.Caches.track(
      left.hint("merge").join(right, Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct())
    // materialize + count to pick the signature-fetch strategy EXPLICITLY.
    // Left to static estimates the planner can broadcast the wrong side:
    // synthesized corpora descend from spark.range, whose leaf stats say
    // "a few MB", so the 1 KiB/row SIGNATURE table looks broadcastable and
    // the build collect blows the driver's result-size cap at scale. The
    // ids-only candidate side is the one that may broadcast; the sig table
    // never.
    val sa = sigs.select(col(idCol).as("id_a"), col("sig").as("sig_a"))
    val sb = sigs.select(col(idCol).as("id_b"), col("sig").as("sig_b"))
    fetchPairSides(cand, sa, sb)
      .withColumn("est_jaccard",
        graft.functions.expressions.sig_agree(
          col("sig_a"), col("sig_b"), cfg.numHashes))
      .filter(col("est_jaccard") >= cfg.threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** The interpreted higher-order-function signature-agreement twin the
    * codegen [[graft.functions.SigAgreement]] kernel replaced on the
    * candidate-verify hot path (one call per candidate pair; HOFs are
    * `CodegenFallback` and allocate a zip array per call). Retained as the
    * fuzz reference — DedupSpec pins bit equality of the two.
    */
  private[graft] def sigAgreeHof(a: Column, b: Column, numHashes: Int): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes

  /** Greedy survivor set from near-dup pairs: drop any id that pairs with a
    * smaller id. (Full transitive clustering = iterative min-propagation;
    * one round is the standard single-pass compromise and is exact whenever
    * dup groups are cliques, which near-identical documents are.)
    */
  def survivorsFromPairs(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Pairs small enough to collect: below this many edges the closure runs
    * as driver-side union-find (ids only — 16 B/pair, so the default is
    * ~32 MB of driver heap). Post-LSH pair sets at threshold ≥ 0.8 are
    * SPARSE (exact dups were removed upstream), so this is the common case
    * even at corpus scale; above it the distributed loop takes over.
    */
  val DefaultCollectPairs = 2000000L

  /** Survivors under the TRANSITIVE closure of the pair graph: exactly one
    * row (the min id) survives per connected component — correct for
    * chain/star-shaped dup groups where [[survivorsFromPairs]] keeps
    * extras (e.g. pairs (1,3),(2,3): one-round keeps {1,2}; closure keeps
    * {1}).
    *
    * Two paths, chosen by pair count:
    *  - ≤ `collectPairs`: collect the edge list (IDS ONLY) and run
    *    union-find with path compression on the driver — O(pairs·α). An
    *    iterative DataFrame loop pays whole-job latency per round; for the
    *    sparse pair sets LSH emits, the driver finishes the entire closure
    *    in less time than one Spark round.
    *  - larger graphs: distributed min-label propagation — each round is
    *    one join + one aggregation over ids, converging in graph-diameter
    *    rounds (2-3 for near-dup clusters); content never shuffles.
    *    Convergence is detected by the label-sum fixpoint (labels only
    *    ever decrease). Each generation is lineage-TRUNCATED (reliable
    *    `checkpoint` when `sc.setCheckpointDir` is configured — the
    *    production binding — else `localCheckpoint`): the new labels
    *    reference the old twice, so without truncation the logical plan
    *    doubles per round and Catalyst analysis time grows 2^rounds even
    *    though the data is cached. Superseded generations are freed by
    *    the ContextCleaner once dereferenced.
    */
  def survivorsFromPairsTransitive(df: DataFrame, idCol: String,
      pairs: DataFrame, maxIters: Int = 25,
      collectPairs: Long = DefaultCollectPairs): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val edgeList = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
    // builders cache `pairs`, so this count materializes the cache the
    // first consumer needs anyway — not an extra pass over content
    val nPairs = edgeList.count()
    graft.util.Diag.put("neardup.closure_pairs", nPairs)
    graft.util.Diag.put("neardup.closure_path",
      if (nPairs == 0) "none"
      else if (nPairs <= collectPairs) "driver_union_find"
      else "label_propagation")
    if (nPairs == 0) return df
    val losers: DataFrame =
      if (nPairs <= collectPairs) {
        val (parent, find) = driverUnionFind(edgeList.as[(Long, Long)].collect())
        // snapshot keys before the sweep: find() compresses paths (mutates
        // the map), which would CME a live forEach. Every non-root node has
        // a parent entry (it got one the moment it lost a union), so the
        // key set covers all losers.
        val ids = new Array[Long](parent.size)
        val kit = parent.keySet().iterator(); var ki = 0
        while (kit.hasNext) { ids(ki) = kit.next(); ki += 1 }
        val out = Vector.newBuilder[Long]
        var i = 0
        while (i < ids.length) { if (find(ids(i)) != ids(i)) out += ids(i); i += 1 }
        broadcast(out.result().toDF(idCol))
      } else
        labelPropagation(edgeList, maxIters)
          .filter(col("lbl") =!= col("id")).select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Driver-side union-find with path compression over a COLLECTED
    * ids-only edge array. Callers collect with ONE job (not
    * toLocalIterator's job-per-partition — the bulk of
    * q_semdedup/q_neardup_losers' r5 fixed cost) and only on the path
    * where the edge total is ≤ collectPairs (≤ 2M pairs = 32 MB of ids —
    * bounded). Returns the parent map and a `find` closure (which MUTATES
    * the map — snapshot keys before sweeping). Union is by MIN ROOT, so
    * every component's root is its min id — the same labeling the
    * distributed path converges to.
    */
  private def driverUnionFind(edges: Array[(Long, Long)])
      : (java.util.HashMap[Long, Long], Long => Long) = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.getOrDefault(c, c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // min-id root ⇒ survivor = component min, same as label propagation
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    (parent, find)
  }

  /** Distributed min-label propagation over an ids-only edge list; returns
    * (id, lbl) for every participant, lbl = component min id at the
    * fixpoint. Each generation is lineage-TRUNCATED (see
    * [[survivorsFromPairsTransitive]] scaladoc for why: the uncut plan
    * references its predecessor twice, so Catalyst analysis grows
    * 2^rounds).
    */
  private def labelPropagation(edgeList: DataFrame, maxIters: Int): DataFrame = {
    val spark = edgeList.sparkSession
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    def snap(d: DataFrame): DataFrame =
      if (reliable) d.checkpoint(eager = true) else d.localCheckpoint(eager = true)
    val edges = snap(
      edgeList.toDF("src", "dst")
        .unionByName(edgeList.toDF("dst", "src").select("src", "dst")))
    var labels = snap(edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")))
    // decimal, not long: a sum of 64-bit ids can overflow
    def lblSum(l: DataFrame): java.math.BigDecimal = {
      val r = l.agg(sum(col("lbl").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    var prevSum = lblSum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src").as("nid")).agg(min(col("lbl")).as("nbr_lbl"))
      val next = snap(
        labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
          .select(labels("id"),
            least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl")))
      val nextSum = lblSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      it += 1
    }
    if (!converged)
      System.err.println(s"[Dedup] WARN: label propagation hit " +
        s"maxIters=$maxIters before the label fixpoint — a component with " +
        s"diameter > $maxIters may keep more than one survivor; raise maxIters")
    labels
  }

  /** Connected-component labels for the ids of a pair graph: (id, lbl),
    * lbl = the component's MIN id. The general form of
    * [[survivorsFromPairsTransitive]] (losers there = ids with lbl ≠ id)
    * for callers that pick a NON-min-id representative per component —
    * e.g. [[graft.similarity.Similarity.semDedup]]'s
    * farthest-from-centroid rule. Same two paths, same cutoff: driver
    * union-find for ≤ `collectPairs` edges, label propagation beyond.
    * Ids isolated by self-loops may be absent — callers should
    * `coalesce(lbl, id)` after an outer join.
    */
  def componentLabels(pairs: DataFrame, maxIters: Int = 25,
      collectPairs: Long = DefaultCollectPairs,
      /** caller-PROVEN upper bound on the pair count (e.g. the candidate
        * count an upstream fetch already paid for — a filtered frame can
        * only shrink). When it fits `collectPairs`, the convergence-probe
        * count job is skipped: the driver path is about to collect the
        * edges anyway, so ONE job materializes them and the true count
        * comes from the array (r5 verdict item 4). -1 = unknown, count.
        */
      pairsAtMost: Long = -1L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edgeList = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
    val bounded = pairsAtMost >= 0 && pairsAtMost <= collectPairs
    val edges: Array[(Long, Long)] =
      if (bounded) edgeList.as[(Long, Long)].collect() else null
    val nPairs = if (bounded) edges.length.toLong else edgeList.count()
    graft.util.Diag.put("components.pairs", nPairs)
    graft.util.Diag.put("components.path",
      if (nPairs == 0) "none"
      else if (nPairs <= collectPairs) "driver_union_find"
      else "label_propagation")
    if (nPairs == 0) return spark.emptyDataset[(Long, Long)].toDF("id", "lbl")
    if (nPairs <= collectPairs) {
      val (parent, find) = driverUnionFind(
        if (edges != null) edges else edgeList.as[(Long, Long)].collect())
      val ids = new Array[Long](parent.size)
      val kit = parent.keySet().iterator(); var ki = 0
      while (kit.hasNext) { ids(ki) = kit.next(); ki += 1 }
      val out = Vector.newBuilder[(Long, Long)]
      val roots = new java.util.HashSet[Long]()
      var i = 0
      while (i < ids.length) {
        val r = find(ids(i))
        out += ((ids(i), r))
        roots.add(r)
        i += 1
      }
      val rit = roots.iterator()
      while (rit.hasNext) { val r = rit.next(); out += ((r, r)) }
      broadcast(out.result().toDF("id", "lbl"))
    } else labelPropagation(edgeList, maxIters)
  }

  // ---- paragraph-level exact dedup ----------------------------------------

  /** CCNet/RefinedWeb-style PARAGRAPH-level exact dedup: across the whole
    * corpus, only the globally FIRST occurrence of each repeated paragraph
    * survives (first = min (id, position)); later occurrences are removed
    * from their documents and the documents are reassembled in original
    * order. Blank paragraphs (trimmed length < `minLen`) are never deduped
    * — they carry document shape, not content, and a corpus-wide blank
    * group would otherwise gut every document past the first.
    *
    * Scale design: the duplicate-detection shuffle carries only
    * (sha256, id, pos) — 80 B/paragraph, never paragraph text — and only
    * hashes with >1 occurrence enter the winner join. Document content is
    * touched twice, both map-side: the splitting projection and the final
    * reassembly, which joins the per-doc drop-position arrays back
    * (broadcast while the loser set is small, shuffle-hash beyond
    * [[BroadcastCandPairs]] docs) and rebuilds the text with a codegen'd
    * `filter`/`concat_ws` — no posexplode→regroup round trip of content.
    *
    * Returns the input columns with `textCol` rewritten plus
    * `n_paras`/`n_dropped` counts. Pure function of the dataset (no
    * partition- or ordering-dependence). Non-null `textCol` assumed.
    */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n", minLen: Int = 1): DataFrame = {
    val quoted = java.util.regex.Pattern.quote(sep)
    val parts = split(col(textCol), quoted, -1) // -1 keeps trailing empties
    // cached: feeds BOTH the winner aggregation and the loser join stream —
    // uncached, the split+sha pass over content would run twice. The cache
    // holds (id,pos,sha) tuples (~80 B/paragraph), never the text.
    // BINARY sha (unhex), not the 64-char hex string (guide §2.3 narrower
    // types): __h only ever feeds equality (winner groupBy + loser join),
    // and 32 raw bytes halve what the winner exchange, its sort keys and
    // the cache carry per paragraph
    val keys = graft.util.Caches.track(df
      .select(col(idCol).cast("long").as("__id"),
        posexplode(parts).as(Seq("__pos", "__p")))
      .filter(length(trim(col("__p"))) >= minLen)
      .select(col("__id"), col("__pos"),
        unhex(sha2(col("__p").cast("binary"), 256)).as("__h")))
    // winners: min (id,pos) per repeated hash — singleton hashes can have
    // no losers and are dropped before the join
    val firsts = keys.groupBy(col("__h"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__first"),
        count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select(col("__h"), col("__first"))
    // merge hint: both sides derive from the corpus; range-derived inputs
    // report tiny leaf stats and the planner would statically broadcast a
    // data-sized side (see minHashPairs)
    val losers = keys.hint("merge").join(firsts, Seq("__h"))
      .filter(struct(col("__id"), col("__pos")) =!= col("__first"))
      .select(col("__id"), col("__pos"))
    val dropPos = graft.util.Caches.track(
      losers.groupBy(col("__id"))
        .agg(sort_array(collect_list(col("__pos"))).as("__drop")))
    // docs-with-drops is small when duplication is sparse: broadcast then;
    // a boilerplate-dominated corpus falls back to a shuffle-hash join
    val nDrop = dropPos.count()
    val small = nDrop <= BroadcastCandPairs
    graft.util.Diag.put("paradedup.docs_with_drops", nDrop)
    graft.util.Diag.put("paradedup.rebuild_path",
      if (small) "broadcast" else "shuffle_hash")
    val joined = df.join(
      if (small) broadcast(dropPos) else dropPos.hint("shuffle_hash"),
      col(idCol).cast("long") === col("__id"), "left")
    val dropArr = coalesce(col("__drop"), array().cast("array<int>"))
    // always reassemble (round-trips byte-identically for a literal sep):
    // one code path, same shape the cross-engine oracle recomputes
    val kept = filter(parts, (p, i) => !array_contains(dropArr, i))
    joined
      .withColumn("n_paras", size(parts).cast("long"))
      .withColumn("n_dropped", coalesce(size(col("__drop")), lit(0)).cast("long"))
      .withColumn(textCol, concat_ws(sep, kept))
      .drop("__id", "__drop")
  }

  // ---- duplicate-passage excision (ExactSubstr at line granularity) -------

  /** ExactSubstr-style duplicate-PASSAGE removal (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better"), adapted
    * to line-window granularity for code-shaped corpora: every run of `k`
    * consecutive lines that occurs more than once in the corpus survives
    * only at its globally FIRST occurrence (min (id, startLine)); every
    * other occurrence's lines are excised and the documents reassembled in
    * order. The original operates on byte-level suffixes via a corpus
    * suffix array — a structure Spark cannot build without a superlinear
    * global sort — so this trades granularity for linearity: any duplicated
    * passage of ≥ k lines is caught in full (its covering k-windows all
    * repeat and their covered-line sets union to the passage), passages
    * shorter than k lines are left alone. That cutoff is the FEATURE for
    * code: single duplicated lines (`}`, `import os`) are legitimate
    * everywhere, which is exactly why line-level [[paragraphDedup]] is too
    * aggressive on source text.
    *
    * All-whitespace windows never dedup (they carry shape, not content,
    * and a corpus-wide blank group would gut every file past the first).
    * Self-repetition collapses too: a block repeated inside one document
    * keeps only its first occurrence — the windowed form of Gopher's
    * duplicate-paragraph signal, but excising instead of dropping the doc.
    *
    * Scale design mirrors [[paragraphDedup]]: the duplicate-detection
    * shuffle carries only (sha256, id, pos) — never window text — and only
    * hashes with >1 occurrence enter the loser join (merge-hinted: both
    * sides are corpus-derived, static stats would mis-broadcast). Window
    * hashing is map-side and linear in k × content. Rebuild joins the
    * per-doc loser-start arrays back (broadcast while sparse,
    * shuffle-hash beyond [[BroadcastCandPairs]]) and re-splits content in
    * a codegen projection — no posexplode→regroup of text.
    *
    * Returns the input columns with `textCol` rewritten plus
    * `n_lines`/`n_dropped`. Pure function of the dataset. Non-null
    * `textCol` and unique `idCol` assumed.
    */
  def passageDedup(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k > 0, s"window k=$k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val lines = split(col(textCol), "\n", -1)
    // cached: feeds BOTH the winner aggregation and the loser join —
    // (id, pos, sha) tuples only, ~80 B/window, never the text.
    // The window pass is the TYPED kernel [[windowShaRows]] (r6): the old
    // Column form (`transform`/`filter` HOFs + per-window `concat_ws` +
    // `rlike("\\S")` + sha2) ran INTERPRETED — Spark HOFs are
    // CodegenFallback — and materialized every k-line window string twice;
    // the kernel encodes each line's UTF-8 bytes once, feeds the digest
    // per window, and replaces the per-window blank regex with a sliding
    // non-blank count (measured 1.31× at the 1M series: 21.9 → 16.7 s
    // interleaved, identical diagnostics). Bit-identical by construction
    // (UTF-8 concatenation; java \\S over the joined window ⇔ some member
    // line has a non-[ \t\n\x0B\f\r] char) — DedupSpec pins equality
    // against the retained Column twin, and the q_passage_dedup oracle
    // re-derives the same windows independently in DuckDB.
    val keys = graft.util.Caches.track(df
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(windowShaRows(_, k))
      .toDF("__id", "__pos", "__h"))
    val firsts = keys.groupBy(col("__h"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__first"),
        count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select(col("__h"), col("__first"))
    val losers = keys.hint("merge").join(firsts, Seq("__h"))
      .filter(struct(col("__id"), col("__pos")) =!= col("__first"))
      .select(col("__id"), col("__pos"))
    val dropStarts = graft.util.Caches.track(
      losers.groupBy(col("__id"))
        .agg(sort_array(collect_list(col("__pos"))).as("__starts")))
    val nDrop = dropStarts.count()
    val small = nDrop <= BroadcastCandPairs
    graft.util.Diag.put("passagededup.docs_with_drops", nDrop)
    graft.util.Diag.put("passagededup.rebuild_path",
      if (small) "broadcast" else "shuffle_hash")
    val joined = df.join(
      if (small) broadcast(dropStarts) else dropStarts.hint("shuffle_hash"),
      col(idCol).cast("long") === col("__id"), "left")
    val starts = coalesce(col("__starts"), array().cast("array<int>"))
    // covered lines = union of the loser windows [start, start+k) — starts
    // never exceed nLines-k, so coverage stays in range and its size is
    // exactly the number of excised lines
    val covered = array_distinct(flatten(
      transform(starts, s0 => sequence(s0, s0 + k - 1))))
    val kept = filter(lines, (_, i) => !array_contains(covered, i))
    joined
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_dropped", size(covered).cast("long"))
      .withColumn(textCol, concat_ws("\n", kept))
      .drop("__id", "__starts")
  }

  /** Typed k-line-window sha pass for [[passageDedup]]: per doc, split on
    * '\n' (limit -1 — trailing empties kept, same as the Column split),
    * emit (id, start, binary sha256) for every k-window containing at least
    * one non-whitespace char (java \s set). Equality with the Column form:
    * the window string is lines(i..i+k-1) joined by '\n'; UTF-8 of a
    * concatenation is the concatenation of UTF-8 pieces ('\n' = 0x0A), so
    * feeding the digest per piece hashes the same bytes `cast("binary")`
    * produced; `rlike("\\S")` over the joined window holds iff some member
    * line holds a non-[ \t\n\x0B\f\r] char (the separators are themselves
    * \s). One MessageDigest per partition; line bytes encoded once per
    * line, not once per covering window.
    */
  private[graft] def windowShaRows(it: Iterator[(Long, String)], k: Int)
      : Iterator[(Long, Int, Array[Byte])] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def nonBlank(s: String): Boolean = {
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c != ' ' && c != '\t' && c != '\n' && c != '\u000B' &&
          c != '\f' && c != '\r') return true
        i += 1
      }
      false
    }
    it.flatMap { case (id, text) =>
      val ls = text.split("\n", -1)
      val n = ls.length
      if (n < k) Iterator.empty
      else {
        val bytes = new Array[Array[Byte]](n)
        val nb = new Array[Boolean](n)
        var j = 0
        while (j < n) {
          bytes(j) = ls(j).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          nb(j) = nonBlank(ls(j))
          j += 1
        }
        // sliding count of non-blank lines in the k-window
        var cnt = 0
        var w = 0
        while (w < k) { if (nb(w)) cnt += 1; w += 1 }
        val out = Vector.newBuilder[(Long, Int, Array[Byte])]
        var i = 0
        val last = n - k
        while (i <= last) {
          if (i > 0) { // slide: drop line i-1, add line i+k-1
            if (nb(i - 1)) cnt -= 1
            if (nb(i + k - 1)) cnt += 1
          }
          if (cnt > 0) {
            md.reset()
            md.update(bytes(i))
            var m = i + 1
            while (m < i + k) { md.update('\n'.toByte); md.update(bytes(m)); m += 1 }
            out += ((id, i, md.digest()))
          }
          i += 1
        }
        out.result().iterator
      }
    }
  }

  /** The original Column window pass — the interpreted HOF twin
    * [[windowShaRows]] is pinned bit-identical against (DedupSpec).
    */
  private[graft] def windowShaRowsColumnTwin(df: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    val lines = split(col(textCol), "\n", -1)
    // sequence(0, n) DESCENDS when n < 0 — guard short docs to an empty
    // index array instead
    val idxs = when(size(lines) >= k, sequence(lit(0), size(lines) - k))
      .otherwise(array().cast("array<int>"))
    val windows = filter(
      transform(idxs, i => struct(i.as("pos"),
        concat_ws("\n", slice(lines, i + 1, lit(k))).as("w"))),
      s => s.getField("w").rlike("\\S"))
    df.select(col(idCol).cast("long").as("__id"), explode(windows).as("__s"))
      .select(col("__id"), col("__s").getField("pos").as("__pos"),
        unhex(sha2(col("__s").getField("w").cast("binary"), 256)).as("__h"))
  }

  // ---- fork detection (repo-overlap pairs) --------------------------------

  /** Cross-repo fork detection for code corpora: repo pairs whose DISTINCT
    * file-content sets overlap by ≥ `minOverlap` of the smaller repo (and
    * share ≥ `minShared` files). Forks and vendored mirrors are the
    * repo-granularity analogue of document dup — pipelines drop or
    * downweight the duplicated side before file-level dedup ever runs.
    *
    * Scale design mirrors the LSH joins: the self-join key is the content
    * sha256 (32 B), repo content sets are deduplicated FIRST, a postings
    * cap ([[dropHotBuckets]] keyed on the hash) prunes file contents
    * present in more than `maxPostings` repos — a vendored `LICENSE` or
    * `jquery.min.js` sitting in 100k repos contributes candidate pairs
    * quadratically and fork evidence ~zero — and both sides of the join
    * carry merge hints so static stats can never pick a data-sized
    * broadcast build.
    */
  def forkPairs(df: DataFrame, repoCol: String, textCol: String,
      minShared: Long = 2, minOverlap: Double = 0.5,
      maxPostings: Int = 4096): DataFrame = {
    val fh = df.select(col(repoCol).as("repo"),
      sha2(col(textCol).cast("binary"), 256).as("h")).distinct()
    forkPairsFromHashes(fh, minShared, minOverlap, maxPostings)
  }

  /** [[forkPairs]] over a pre-hashed frame of DISTINCT (repo, h) rows —
    * the shape a pipeline persists anyway for exact dedup. Columns:
    * (repo_a, repo_b, shared, n_a, n_b), repo_a < repo_b.
    */
  def forkPairsFromHashes(fh: DataFrame, minShared: Long = 2,
      minOverlap: Double = 0.5, maxPostings: Int = 4096): DataFrame = {
    val cached = graft.util.Caches.track(fh.select(col("repo"), col("h")))
    // true set sizes (the overlap denominator) come from the UNCAPPED frame
    val sizes = graft.util.Caches.track(
      cached.groupBy(col("repo")).agg(count(lit(1)).as("n_files")))
    // ONE grouping pass replaces the content-hash self-join (see
    // pairsWithinGroups); the postings cap is applied inside, identically
    // to the old dropHotBuckets-then-join plan
    val shared = pairsWithinGroups(cached, Seq("h"), struct(col("repo")),
        maxPostings)
      .select(col("a").getField("repo").as("repo_a"),
        col("b").getField("repo").as("repo_b"))
      .groupBy(col("repo_a"), col("repo_b"))
      .agg(count(lit(1)).as("shared"))
    shared.hint("merge")
      .join(sizes.select(col("repo").as("repo_a"), col("n_files").as("n_a")), "repo_a")
      .hint("merge")
      .join(sizes.select(col("repo").as("repo_b"), col("n_files").as("n_b")), "repo_b")
      .filter(col("shared") >= minShared &&
        col("shared").cast("double") / least(col("n_a"), col("n_b")) >= minOverlap)
      .select(col("repo_a"), col("repo_b"), col("shared"), col("n_a"), col("n_b"))
  }

  // ---- code-clone candidate pairs (MOSS-style) ----------------------------

  /** Candidate CODE-CLONE pairs from winnowing fingerprints (Schleimer et
    * al. 2003 — the MOSS algorithm): files sharing ≥ `minShared` distinct
    * fingerprints. The winnow guarantee (any common substring of length ≥
    * w+k-1 shares a fingerprint) makes this a partial-copy detector —
    * unlike whole-document MinHash, two files that share one copied
    * function and nothing else still pair — which is the right granularity
    * for license-relevant code reuse and fork-lineage analysis.
    *
    * Takes the (id, fingerprints array) frame
    * ([[graft.text.TextAnalysis.fingerprints]] or the codegen
    * `winnow_fp` route) so this stays decoupled from the text layer.
    * Scale design is the shared inverted-index shape: postings are
    * (fp, id) pairs — 16 B — with [[dropHotBuckets]] keyed on the
    * fingerprint pruning boilerplate fragments present in more than
    * `maxPostings` files before they contribute quadratic candidates,
    * and merge hints on the self-join sides.
    */
  def clonePairsFromFingerprints(fps: DataFrame, idCol: String,
      minShared: Long = 5, maxPostings: Int = 1000): DataFrame =
    clonePairsFromPosts(
      fps.select(col(idCol).cast("long").as("id"),
        explode(col("fingerprints")).as("fp")).distinct(),
      minShared, maxPostings)

  /** [[clonePairsFromFingerprints]] over an ALREADY-EXPLODED frame of
    * DISTINCT (id, fp) postings — the shape a pipeline persists anyway
    * (and what the fingerprint dump already is), skipping the
    * regroup→re-explode round trip.
    */
  def clonePairsFromPosts(posts0: DataFrame, minShared: Long = 5,
      maxPostings: Int = 1000): DataFrame = {
    val posts = graft.util.Caches.track(posts0.select(col("id"), col("fp")))
    // ONE grouping pass replaces the postings self-join (see
    // pairsWithinGroups); the singleton-fingerprint majority — which the
    // sort-merge join paid two sorts to discover contributes nothing —
    // vanishes in the group-size filter, and the postings cap is applied
    // inside, identically to the old dropHotBuckets-then-join plan
    pairsWithinGroups(posts, Seq("fp"), struct(col("id")), maxPostings)
      .select(col("a").getField("id").as("id_a"),
        col("b").getField("id").as("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  // ---- SimHash -------------------------------------------------------------

  /** 64-bit SimHash over hashed tokens (Charikar): per-bit weighted vote.
    * Tokens come from the packed zero-String tokenizer and hash straight
    * from the shared char buffer.
    */
  def simHash(text: String): Long = {
    val votes = new Array[Int](64)
    val ts = tokenize(text)
    var t = 0
    while (t < ts.n) {
      var h = 0xcbf29ce484222325L
      var i = ts.start(t)
      val e = ts.ends(t)
      while (i < e) {
        h ^= ts.buf(i).toLong
        h *= 0x100000001b3L
        i += 1
      }
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      t += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  /** Executable spec for [[simHash]] (property-tested equal). */
  private[graft] def simHashRef(text: String): Long = {
    val votes = new Array[Int](64)
    val ts = tokens(text)
    var i = 0
    while (i < ts.length) {
      val h = fnv1a64(ts(i))
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  def simHashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, simHash(t)) })
      .toDF(idCol, "simhash")
  }

  /** Near-dup pairs with Hamming distance ≤ maxDist, found by band blocking
    * with maxDist+1 bands (pigeonhole: d differing bits can spoil at most d
    * of d+1 bands, so some band is identical — complete for ANY maxDist),
    * then verified with bit_count(xor) — both codegen'd Column ops.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(maxDist >= 0 && maxDist < 64, s"maxDist $maxDist out of range")
    val nBands = maxDist + 1
    val base = 64 / nBands
    // band i covers [start_i, start_i + width_i); remainder bits widen the
    // last band — union of bands always covers all 64 bits exactly once
    val bandSpecs = (0 until nBands).map { i =>
      val start = i * base
      val width = if (i == nBands - 1) 64 - start else base
      (i, start, width)
    }
    val sigs = graft.util.Caches.track(simHashes(df, idCol, textCol))
    val banded0 = sigs.select(col(idCol), col("simhash"),
      explode(array(bandSpecs.map { case (i, start, width) =>
        val mask = if (width >= 64) -1L else (1L << width) - 1
        struct(lit(i).as("band"),
          shiftrightunsigned(col("simhash"), start).bitwiseAND(lit(mask))
            .as("bucket"))
      }: _*)).as("bb"))
      .select(col(idCol), col("simhash"), col("bb.band"), col("bb.bucket"))
    // kept as a MERGE-HINTED SELF-JOIN, not pairsWithinGroups: measured in
    // r6, the grouping pass was SLOWER here (0.59→0.77 s at sf0.1) — with
    // only maxDist+1 bands the posting volume is small, singleton buckets
    // are rare (wide buckets collide often), and collect_list's
    // ObjectHashAggregate falls back to sort-based past 128 keys, so the
    // grouping pass pays the same sort the merge join does without the
    // volume reduction that makes it win for 16-band MinHash
    val banded = dropHotBuckets(banded0, maxBucket)
    val l = banded.select(col("band"), col("bucket"),
      col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val r = banded.select(col("band"), col("bucket"),
      col(idCol).as("id_b"), col("simhash").as("sh_b"))
    // merge hint: see minHashPairs — self-join sides must never broadcast
    l.hint("merge").join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // ---- n-gram Jaccard similarity join -------------------------------------

  /** n-gram Jaccard pairs ≥ threshold via a FULL inverted shingle index
    * with a postings cap. The cap bounds the quadratic per-shingle join
    * blowup but is LOSSY for content duplicated more than `maxPostings`
    * times: every shingle of such a group exceeds the cap, so the group's
    * pairs vanish and near-dup pairs sharing capped shingles under-count
    * their intersection. Run [[exact]] dedup first (identical content never
    * reaches this join), or prefer [[ngramJaccardPairsPrefix]], which is
    * exact at any duplication level and cheaper at high thresholds.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.7,
      maxPostings: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sh = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, t) => shingles(t, n).map(g => (id, g)) }
      .toDF(idCol, "g")
    val sizes = graft.util.Caches.track(sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz")))
    val capped = sh.hint("merge").join(
      sh.groupBy("g").agg(count(lit(1)).as("freq"))
        .filter(col("freq") <= maxPostings && col("freq") > 1)
        .select("g"),
      Seq("g"))
    // ONE grouping pass replaces the shingle self-join (see
    // pairsWithinGroups); maxGroup=0 — the freq prefilter above already
    // bounds every surviving group to (1, maxPostings], so the cap pass
    // would be a redundant second count aggregation
    val common = pairsWithinGroups(capped, Seq("g"), struct(col(idCol)),
        maxGroup = 0)
      .select(col("a").getField(idCol).as("id_a"),
        col("b").getField(idCol).as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    common.hint("merge")
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), "id_a")
      .hint("merge")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Prefix-filtered exact Jaccard join (PPJoin-style, Xiao et al. 2008) —
    * the scale path for high thresholds. Each doc indexes only its
    * ⌈(1-t)·|A|⌉+1 smallest shingles under the global (hash) order; any
    * pair with Jaccard ≥ t provably shares one of those prefix shingles,
    * so the candidate join touches ~(1-t) of the postings the full inverted
    * index would. Candidates are then verified EXACTLY with
    * `array_intersect` over the complete sorted shingle arrays (codegen'd,
    * no UDF). Exact at any duplication level; equals [[ngramJaccardPairs]]
    * whenever no shingle exceeds that variant's postings cap.
    */
  def ngramJaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.7): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // (id, sorted shingle array, prefix slice)
    val docs = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, t) =>
        val s = shingles(t, n) // already sorted (and PPJoin needs it sorted)
        val prefixLen = math.min(s.length,
          math.ceil((1.0 - threshold) * s.length).toInt + 1)
        (id, s, s.take(prefixLen))
      }
      .toDF(idCol, "sh", "prefix")
      .transform(graft.util.Caches.track)
    val index = docs.select(col(idCol), explode(col("prefix")).as("g"),
      size(col("sh")).as("sz"))
    val l = index.select(col("g"), col(idCol).as("id_a"), col("sz").as("sz_a"))
    val r = index.select(col("g"), col(idCol).as("id_b"), col("sz").as("sz_b"))
    // length filter: jaccard ≥ t ⇒ t·|B| ≤ |A| ≤ |B|/t — prune candidates
    // on two ints before touching the full shingle arrays. Kept as a
    // MERGE-HINTED SELF-JOIN, not pairsWithinGroups: measured in r6 the
    // grouping pass was SLOWER here (0.97→1.15 s at sf0.1) — the prefix
    // index is already threshold-thinned, and collect_list's
    // ObjectHashAggregate falls back to sort-based past 128 keys, so the
    // grouping pass pays the merge join's sort without a volume win
    val cand = graft.util.Caches.track(
      l.hint("merge").join(r, Seq("g")).filter(col("id_a") < col("id_b") &&
        col("sz_a") >= col("sz_b") * threshold &&
        col("sz_b") >= col("sz_a") * threshold)
      .select("id_a", "id_b").distinct())
    val da = docs.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val db = docs.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    // the shingle-array sides must never be the broadcast build
    fetchPairSides(cand, da, db)
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
