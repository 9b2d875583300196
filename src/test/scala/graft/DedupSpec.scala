package graft

import graft.dedup.Dedup
import graft.dedup.Dedup.MinHashConfig

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // corpus with two exact dup groups, one near-dup pair, and distinct docs
  val base = "the quick brown fox jumps over the lazy dog and runs far away " +
    "into the deep green forest while birds sing morning songs above the trees"
  val near = base.replace("morning", "evening") // 1-word change → high jaccard
  val docs = Seq(
    (0L, base), (1L, base), // exact dups
    (2L, near), // near-dup of 0/1
    (3L, "completely different content about spark dataframes and shuffles " +
      "partitions executors catalyst tungsten codegen adaptive query execution"),
    (4L, "completely different content about spark dataframes and shuffles " +
      "partitions executors catalyst tungsten codegen adaptive query execution"), // dup of 3
    (5L, "short unrelated text"),
    (6L, "another unrelated document mentioning nothing in common with others " +
      "entirely novel vocabulary zebras quasars philosophy harmonics"))
  lazy val df = docs.toDF("id", "text")

  test("exact dedup: survivor = min id per content group") {
    val d = Dedup.exact(df, "id", "text").collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(d.toSeq === Seq((0L, 2L), (2L, 1L), (3L, 2L), (5L, 1L), (6L, 1L)))
    val survivors = Dedup.exactSurvivors(df, "id", "text")
      .collect().map(_.getLong(0)).sorted
    assert(survivors.toSeq === Seq(0L, 2L, 3L, 5L, 6L))
  }

  test("shingles + jaccard: near-dup scores high, unrelated scores ~0") {
    val s0 = Dedup.shingles(base)
    val s2 = Dedup.shingles(near)
    val s6 = Dedup.shingles(docs(6)._2)
    assert(Dedup.jaccard(s0, s0) === 1.0)
    assert(Dedup.jaccard(s0, s2) > 0.7)
    assert(Dedup.jaccard(s0, s6) < 0.05)
  }

  test("minhash signature estimates jaccard") {
    val cfg = MinHashConfig()
    val sigA = Dedup.minHashSignature(Dedup.shingles(base), cfg)
    val sigB = Dedup.minHashSignature(Dedup.shingles(near), cfg)
    val est = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / cfg.numHashes
    val truth = Dedup.jaccard(Dedup.shingles(base), Dedup.shingles(near))
    assert(math.abs(est - truth) < 0.15, s"est=$est truth=$truth")
  }

  test("minhash LSH finds exact and near dups, not unrelated pairs") {
    val pairs = Dedup.minHashPairs(df, "id", "text",
      MinHashConfig(threshold = 0.7))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "exact dup pair")
    assert(pairs.contains((3L, 4L)), "second exact dup pair")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)), "near-dup pair")
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L), "unrelated doc clean")
  }

  test("survivorsFromPairs drops every doc that pairs with a smaller id") {
    val pairs = Dedup.minHashPairs(df, "id", "text",
      MinHashConfig(threshold = 0.7))
    val kept = Dedup.survivorsFromPairs(df, "id", pairs)
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(0L, 3L, 5L, 6L))
  }

  test("simhash: identical texts get identical hashes; near-dups within distance") {
    assert(Dedup.simHash(base) === Dedup.simHash(base))
    val d = java.lang.Long.bitCount(Dedup.simHash(base) ^ Dedup.simHash(near))
    assert(d <= 6, s"near-dup simhash distance $d")
    val far = java.lang.Long.bitCount(
      Dedup.simHash(base) ^ Dedup.simHash(docs(6)._2))
    assert(far > 10, s"unrelated distance $far")
  }

  test("simhash LSH pairs: exact dups at distance 0") {
    val pairs = Dedup.simHashPairs(df, "id", "text", maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((0L, 1L)) === 0)
    assert(m((3L, 4L)) === 0)
    assert(m.contains((0L, 2L)))
  }

  test("simhash LSH is complete for maxDist > 3 (band count adapts)") {
    // craft ids whose simhashes differ in exactly 5 scattered bits by
    // searching real text variants
    val base6 = docs.toDF("id", "text")
    val found = Dedup.simHashPairs(base6, "id", "text", maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every pair the brute-force O(n^2) scan finds must be found by LSH
    val sigs = docs.map { case (id, t) => id -> Dedup.simHash(t) }
    val brute = for {
      (a, ha) <- sigs; (b, hb) <- sigs
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 10
    } yield (a, b, java.lang.Long.bitCount(ha ^ hb))
    assert(found.toSet === brute.toSet)
    intercept[IllegalArgumentException] {
      Dedup.simHashPairs(base6, "id", "text", maxDist = 64)
    }
  }

  test("ngram jaccard join: exact pairwise scores above threshold") {
    val pairs = Dedup.ngramJaccardPairs(df, "id", "text", threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) === 1.0)
    assert(pairs((3L, 4L)) === 1.0)
    assert(pairs((0L, 2L)) > 0.7)
    assert(!pairs.keySet.exists(p => p._1 == 6L || p._2 == 6L))
    // exact jaccard must equal the plain-Scala computation
    val truth = Dedup.jaccard(Dedup.shingles(base), Dedup.shingles(near))
    assert(math.abs(pairs((0L, 2L)) - truth) < 1e-9)
  }

  test("prefix-filtered jaccard join equals the full inverted-index join") {
    for (t <- Seq(0.5, 0.7, 0.95)) {
      val full = Dedup.ngramJaccardPairs(df, "id", "text", threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e9))).toSet
      val prefix = Dedup.ngramJaccardPairsPrefix(df, "id", "text", threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e9))).toSet
      assert(prefix === full, s"threshold $t")
    }
    // and on a bigger frame: documents ∪ shifted copy, high threshold
    val docs0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id as id", "text")
    val duped = docs0.unionByName(
      docs0.selectExpr("id + 1000000 as id", "text"))
    val a = Dedup.ngramJaccardPairs(duped, "id", "text", threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.ngramJaccardPairsPrefix(duped, "id", "text", threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
    assert(b.size >= 500) // every doc pairs with its planted copy
  }

  test("transitive survivors: one per connected component (chain + star)") {
    val rows = (1L to 9L).map(i => (i, s"doc$i")).toDF("id", "text")
    // star 1-3, 2-3 (one-round keeps {1,2}); chain 5-6-7-8; isolated 4, 9
    val pairs = Seq((1L, 3L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 8L))
      .toDF("id_a", "id_b")
    val oneRound = Dedup.survivorsFromPairs(rows, "id", pairs)
      .collect().map(_.getLong(0)).sorted
    assert(oneRound.toSeq === Seq(1L, 2L, 4L, 5L, 9L)) // 2 extra survives
    val closed = Dedup.survivorsFromPairsTransitive(rows, "id", pairs)
      .collect().map(_.getLong(0)).sorted
    assert(closed.toSeq === Seq(1L, 4L, 5L, 9L)) // exactly one per component
    graft.util.Caches.release()
  }

  test("transitive survivors: distributed label propagation ≡ union-find") {
    // collectPairs=0 forces the distributed loop (checkpoint-truncated
    // min-label propagation) that production hits above the collect
    // threshold; it must match the driver-side union-find exactly — on the
    // chain/star fixture AND on a pseudo-random graph with long chains
    val rows = (1L to 200L).map(i => (i, s"doc$i")).toDF("id", "text")
    val rnd = new java.util.SplittableRandom(7L)
    val randomPairs = (1 to 150).map { _ =>
      val a = rnd.nextLong(1L, 201L); val b = rnd.nextLong(1L, 201L)
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2)
    for (pairSet <- Seq(
        Seq((1L, 3L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 8L)),
        randomPairs)) {
      val pairs = pairSet.toDF("id_a", "id_b")
      val viaUnionFind = Dedup.survivorsFromPairsTransitive(rows, "id", pairs)
        .collect().map(_.getLong(0)).sorted.toSeq
      val viaLabelProp = Dedup.survivorsFromPairsTransitive(rows, "id", pairs,
          collectPairs = 0L)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(viaLabelProp === viaUnionFind)
      graft.util.Caches.release()
    }
  }

  test("componentLabels: lbl = component min id, both paths, all participants") {
    // chain + star + a pseudo-random graph; labels must agree with the
    // survivor rule (survivors = ids labeled by themselves) on BOTH the
    // driver union-find and the distributed label-propagation path
    val rnd = new java.util.SplittableRandom(11L)
    val randomPairs = (1 to 150).map { _ =>
      val a = rnd.nextLong(1L, 201L); val b = rnd.nextLong(1L, 201L)
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2)
    for (pairSet <- Seq(
        Seq((1L, 3L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 8L)),
        randomPairs)) {
      val pairs = pairSet.toDF("id_a", "id_b")
      val participants = pairSet.flatMap(p => Seq(p._1, p._2)).distinct.sorted
      val viaUF = Dedup.componentLabels(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaLP = Dedup.componentLabels(pairs, collectPairs = 0L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaUF === viaLP)
      // the count-skipping bounded path (caller-proven pairsAtMost) must
      // be byte-identical to the counted path — incl. a LOOSE bound
      val viaBound = Dedup.componentLabels(pairs,
          pairsAtMost = pairSet.length.toLong + 17L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaBound === viaUF)
      assert(viaUF.keySet === participants.toSet, "every participant labeled")
      // a component's label is a member of the component and its minimum:
      // every id's label must itself be labeled by itself
      viaUF.foreach { case (id, lbl) =>
        assert(lbl <= id && viaUF(lbl) === lbl, s"id=$id lbl=$lbl")
      }
      // agreement with the survivor rule
      val rows = participants.map(i => (i, s"d$i")).toDF("id", "text")
      val survivors = Dedup.survivorsFromPairsTransitive(rows, "id", pairs)
        .collect().map(_.getLong(0)).toSet
      assert(viaUF.filter { case (id, lbl) => id == lbl }.keySet === survivors)
      graft.util.Caches.release()
    }
  }

  test("transitive survivors: empty pair set keeps everything") {
    val rows = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val kept = Dedup.survivorsFromPairsTransitive(rows, "id", empty)
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(1L, 2L))
    graft.util.Caches.release()
  }

  test("builders' internal caches are released by Caches.release") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.minHashPairs(df, "id", "text", MinHashConfig(threshold = 0.7)).count()
    Dedup.ngramJaccardPairsPrefix(df, "id", "text", threshold = 0.9).count()
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.nonEmpty, "builders should have cached intermediates")
    graft.util.Caches.release()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty, s"leaked cached RDDs: $after")
  }

  test("scoped caches: a scope releases only its own frames") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // an outer consumer's tracked frame (global registry)
    val outer = graft.util.Caches.track(df.select("id"))
    outer.count()
    graft.util.Caches.scoped {
      Dedup.minHashPairs(df, "id", "text", MinHashConfig(threshold = 0.7)).count()
      assert((spark.sparkContext.getPersistentRDDs.keySet -- before).size > 1)
    }
    // the scope's frames are gone; the outer consumer's frame survived —
    // interleaved consumers can no longer evict each other's intermediates
    val leftover = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leftover.size === 1, s"scope should leave only the outer frame: $leftover")
    graft.util.Caches.release()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("hot-bucket cap prunes degenerate buckets, leaves normal pairs intact") {
    // 40 identical docs (one degenerate bucket per band) + the normal corpus
    val flood = (100L until 140L).map(i => (i, base))
    val mixed = (docs ++ flood).toDF("id", "text")
    val capped = Dedup.minHashPairs(mixed, "id", "text",
      MinHashConfig(threshold = 0.7, maxBucket = 10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the flood's buckets (>10 rows in every band: 40 copies + docs 0/1/2)
    // are dropped — no quadratic candidate set is ever formed...
    assert(!capped.exists(p => p._1 >= 100L || p._2 >= 100L))
    // ...while pairs in normal-sized buckets are unaffected
    assert(capped.contains((3L, 4L)))
    // with the default cap nothing is hot and the flood pairs all appear
    val uncapped = Dedup.minHashPairs(mixed, "id", "text",
      MinHashConfig(threshold = 0.7))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((100L, 139L)) && uncapped.contains((0L, 100L)))
    graft.util.Caches.release()
  }

  test("dedup on the planted corpus: exact dup triples are found") {
    import graft.corpus.CorpusGen
    val files = CorpusGen.files(spark, 2000L).toDF()
      .selectExpr("cast(hash(repo, path, commit) as long) as id",
        "concat(repo, '/', path, '@', commit) as text")
    val d = Dedup.exact(files, "id", "text")
    val dups = d.filter("dup_cnt > 1").count()
    assert(dups === 20L) // 2000/97 planted duplicate triples (id%97==0, id>0)
  }

  // ---- paragraph-level exact dedup ----------------------------------------

  test("paragraph dedup: global first occurrence wins, blanks always kept") {
    val pdocs = Seq(
      // doc 0 defines P1 and P2; blank middle paragraph must survive
      (0L, "P1 shared paragraph\n\n\n\nP2 also shared\n\nU0 unique"),
      // doc 1 repeats P1 (dropped) around its own content
      (1L, "U1 own text\n\nP1 shared paragraph\n\nU1b more"),
      // doc 2 repeats both (both dropped), keeps nothing of its own
      (2L, "P1 shared paragraph\n\nP2 also shared"),
      // doc 3 repeats its OWN paragraph — second in-doc occurrence drops
      (3L, "D3 repeated\n\nD3 repeated\n\nD3 tail")
    ).toDF("id", "text")
    val out = Dedup.paragraphDedup(pdocs, "id", "text")
      .select("id", "text", "n_paras", "n_dropped")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out(0) === ((0L, "P1 shared paragraph\n\n\n\nP2 also shared\n\nU0 unique", 4L, 0L)))
    assert(out(1) === ((1L, "U1 own text\n\nU1b more", 3L, 1L)))
    assert(out(2) === ((2L, "", 2L, 2L)))
    assert(out(3) === ((3L, "D3 repeated\n\nD3 tail", 3L, 1L)))
    graft.util.Caches.release()
  }

  test("paragraph dedup is partition-layout independent") {
    import graft.corpus.CorpusGen
    val files = CorpusGen.files(spark, 400L).toDF()
      .selectExpr("cast(hash(repo, path, commit, content) as long) as id",
        "content as text")
    def run(parts: Int) = Dedup.paragraphDedup(
        files.repartition(parts), "id", "text", sep = "\n")
      .select("id", "text", "n_dropped")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val a = run(1); graft.util.Caches.release()
    val b = run(13); graft.util.Caches.release()
    assert(a === b)
    // line-granularity dedup over generated code MUST drop something
    assert(a.map(_._3).sum > 0L)
  }

  test("paragraph dedup is idempotent") {
    import graft.corpus.CorpusGen
    // line-granularity dedup over generated code (heavy natural dup)
    val files = CorpusGen.files(spark, 300L).toDF()
      .selectExpr("cast(hash(repo, path, commit, content) as long) as id",
        "content as text")
    val once = Dedup.paragraphDedup(files, "id", "text", sep = "\n")
      .select("id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    graft.util.Caches.release()
    val again = Dedup.paragraphDedup(once.toDF("id", "text"), "id", "text",
      sep = "\n")
    val dropped = again.agg(org.apache.spark.sql.functions.sum("n_dropped"))
      .head().getLong(0)
    assert(dropped === 0L, "second pass must find nothing left to drop")
    val againLocal = again.select("id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(againLocal === once)
    graft.util.Caches.release()
  }

  // ---- duplicate-passage excision (ExactSubstr at line granularity) -------

  test("passage dedup: first occurrence survives, loser passage excised") {
    val P = Seq("p1 alpha", "p2 beta", "p3 gamma")
    val d0 = ("head0" +: P :+ "tail0").mkString("\n") // P at lines 1..3
    val d1 = (Seq("u1 one", "u2 two") ++ P :+ "u3 three").mkString("\n")
    val d2 = "short\ndoc" // fewer than k lines → untouched
    val docs = Seq((0L, d0), (1L, d1), (2L, d2)).toDF("id", "text")
    val out = Dedup.passageDedup(docs, "id", "text", k = 3)
      .select("id", "text", "n_lines", "n_dropped")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) === ((0L, d0, 5L, 0L))) // winner keeps everything
    assert(out(1) === ((1L, "u1 one\nu2 two\nu3 three", 6L, 3L)))
    assert(out(2) === ((2L, d2, 2L, 0L)))
    graft.util.Caches.release()
  }

  test("passage dedup: in-document repetition collapses to first block") {
    // a 2-line block repeated 3× — the overlapping loser windows' covered
    // sets union to everything past the first occurrence
    val docs = Seq((7L, "b1\nb2\nb1\nb2\nb1\nb2")).toDF("id", "text")
    val out = Dedup.passageDedup(docs, "id", "text", k = 2)
      .select("text", "n_lines", "n_dropped")
      .as[(String, Long, Long)].head()
    assert(out === (("b1\nb2", 6L, 4L)))
    graft.util.Caches.release()
  }

  test("passage dedup: all-blank windows never dedup, reassembly is exact") {
    val blanks = "\n\n\n\n" // 5 empty lines — identical across docs
    val docs = Seq((0L, blanks), (1L, blanks + "\nx unique")).toDF("id", "text")
    val out = Dedup.passageDedup(docs, "id", "text", k = 3)
      .select("id", "text", "n_dropped")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) === ((0L, blanks, 0L))) // byte-identical round trip
    assert(out(1) === ((1L, blanks + "\nx unique", 0L)))
    graft.util.Caches.release()
  }

  test("passage dedup is partition-layout independent") {
    // NOT idempotence: excision creates new line adjacencies, so a second
    // pass can legitimately find fresh k-windows (true of byte-level
    // ExactSubstr too) — purity is the invariant, not a fixpoint
    import graft.corpus.CorpusGen
    val files = CorpusGen.files(spark, 400L).toDF()
      .selectExpr("cast(hash(repo, path, commit, content) as long) as id",
        "content as text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.passageDedup(d, "id", "text", k = 4)
        .select("id", "text", "n_dropped")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val a = run(files.repartition(1)); graft.util.Caches.release()
    val b = run(files.repartition(13)); graft.util.Caches.release()
    assert(a === b)
    // generated code repeats whole blocks (planted copies) — something
    // must excise
    assert(a.map(_._3).sum > 0L)
  }

  test("passage window-sha kernel ≡ Column HOF twin, fuzzed") {
    // adversarial shapes: trailing newlines (split -1 empties), all-blank
    // windows (every java \s char incl. VT/FF), unicode multi-byte lines,
    // docs shorter than k, empty docs, single-char lines
    val rnd = new scala.util.Random(77)
    val wsChars = " \t\u000B\f\r"
    def line(): String = rnd.nextInt(6) match {
      case 0 => ""
      case 1 => wsChars.substring(rnd.nextInt(wsChars.length)) * (1 + rnd.nextInt(3))
      case 2 => "日本語テキスト" + rnd.nextInt(3)
      case 3 => "x"
      case _ => s"val v${rnd.nextInt(5)} = ${rnd.nextInt(9)}"
    }
    val docs = (0L until 300L).map { i =>
      val n = rnd.nextInt(12)
      val t = (0 until n).map(_ => line()).mkString("\n") +
        ("\n" * rnd.nextInt(3))
      (i, t)
    }.toDF("id", "text")
    for (k <- Seq(1, 3, 8)) {
      val typed = docs.select($"id".cast("long"), $"text")
        .as[(Long, String)]
        .mapPartitions(Dedup.windowShaRows(_, k))
        .collect().map { case (id, pos, h) => (id, pos, h.toSeq) }.toSet
      val column = Dedup.windowShaRowsColumnTwin(docs, "id", "text", k)
        .as[(Long, Int, Array[Byte])].collect()
        .map { case (id, pos, h) => (id, pos, h.toSeq) }.toSet
      assert(typed === column, s"k=$k mismatch")
    }
  }

  // ---- fork detection ------------------------------------------------------

  test("fork pairs: planted fork found, low-overlap pairs excluded") {
    val mk = (repo: String, n: Int, tag: String) =>
      (0 until n).map(i => (repo, s"file body $tag $i"))
    // fork~a copies 8 of a's 10 files and has 2 of its own; repo b shares
    // just 1 file with a (below minShared=2); c is disjoint
    val rows = (mk("a", 10, "a") ++
      mk("a", 8, "a").map { case (_, c) => ("fork~a", c) } ++
      Seq(("fork~a", "own f1"), ("fork~a", "own f2")) ++
      Seq(("b", "file body a 0")) ++ mk("b", 6, "b") ++
      mk("c", 5, "c")).toDF("repo", "content")
    val pairs = Dedup.forkPairs(rows, "repo", "content",
      minShared = 2, minOverlap = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(pairs.toSeq === Seq(("a", "fork~a", 8L, 10L, 10L)))
    graft.util.Caches.release()
  }

  test("clone pairs: files sharing one copied block pair up, unrelated do not") {
    val block = "def sharedHelper(x: Int): Int = { val y = x * 31 + 7; " +
      "y ^ (y >>> 3) } // marker 31337"
    val fa = "object A {\n" + block + "\npadding alpha beta gamma delta\n}"
    val fb = "class B {\n totally different body with its own words\n" +
      block + "\n}"
    val fc = "object C { nothing in common at all zebra quasar }"
    val df = Seq((1L, fa), (2L, fb), (3L, fc)).toDF("id", "text")
    val fps = graft.text.TextAnalysis.fingerprints(df, "id", "text")
    val pairs = Dedup.clonePairsFromFingerprints(fps, "id", minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
    graft.util.Caches.release()
  }

  test("sig_agree kernel ≡ HOF agreement (bit-equal; planted length " +
    "mismatches, null elements, and exact-dup signatures)") {
    import org.apache.spark.sql.functions.col
    val rnd = new java.util.SplittableRandom(20260820L)
    val k = 16
    // pair fixtures: full agreement (clone), partial agreement, disjoint,
    // short arrays (zip_with pads — divisor stays k), and null elements
    var prev: Seq[java.lang.Long] = Seq.fill(k)(java.lang.Long.valueOf(0L))
    val rows = (0L until 400L).map { i =>
      val a: Seq[java.lang.Long] =
        if (i % 11 == 0) prev
        else Seq.fill(k)(java.lang.Long.valueOf(rnd.nextLong(8))) // collisions likely
      val b: Seq[java.lang.Long] =
        if (i % 7 == 0) a // exact dup → agreement 1.0
        else if (i % 13 == 0) a.take(k - 3) // planted length mismatch
        else if (i % 17 == 0) a.updated(3, null: java.lang.Long) // null elem
        else Seq.fill(k)(java.lang.Long.valueOf(rnd.nextLong(8)))
      prev = a
      (i, a, b)
    }.toDF("id", "sig_a", "sig_b").repartition(5)
    val got = rows.select(col("id"),
      graft.functions.expressions.sig_agree(col("sig_a"), col("sig_b"), k).as("kn"),
      Dedup.sigAgreeHof(col("sig_a"), col("sig_b"), k).as("hf")).collect()
    assert(got.length === 400)
    got.foreach { r =>
      val kn = java.lang.Double.doubleToRawLongBits(r.getDouble(1))
      val hf = java.lang.Double.doubleToRawLongBits(r.getDouble(2))
      assert(kn === hf, s"id=${r.getLong(0)}")
    }
    // the exact-dup rows really exercise the 1.0 ceiling
    assert(got.filter(_.getLong(0) % 7 == 0).forall(_.getDouble(1) == 1.0))
    // a short array can never reach 1.0 (divisor is the fixed width)
    assert(got.filter(r => r.getLong(0) % 13 == 0 && r.getLong(0) % 7 != 0)
      .forall(_.getDouble(1) < 1.0))
  }

  test("fork pairs: vendored-everywhere file is capped out of the join") {
    // one boilerplate file in every repo; without the cap every repo pair
    // becomes a candidate — with maxPostings below the repo count the
    // boilerplate contributes nothing and only the real fork surfaces
    val vendored = (0 until 30).map(i => (s"r$i", "vendored LICENSE text"))
    val fork = Seq(("r1", "x1"), ("r1", "x2"), ("r1", "x3"),
      ("fk", "x1"), ("fk", "x2"), ("fk", "x3"))
    val rows = (vendored ++ fork).toDF("repo", "content")
    val pairs = Dedup.forkPairs(rows, "repo", "content",
      minShared = 2, minOverlap = 0.5, maxPostings = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pairs.toSeq === Seq(("fk", "r1", 3L)))
    graft.util.Caches.release()
  }
}
