package graft

import org.scalacheck.Gen
import graft.checks.Checks
import graft.dedup.Dedup
import graft.filter.{LangId, Perplexity, Scrub}
import graft.model._

/** Property-based invariants (SURVEY.md §5.2.3) over ScalaCheck generators
  * with a fixed seed (deterministic CI). Spark-touching properties use
  * small generated frames; pure-function properties run wide.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic forAll: fixed seed chain, n samples. */
  private def forAll[A](gen: Gen[A], n: Int = 10)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private val keyGen = Gen.listOfN(30, Gen.oneOf("a", "b", "c", "d", "e", ""))

  test("PK invariant: failedCnt = Σ over groups with n>1 of n; allCnt = rows") {
    forAll(keyGen) { keys =>
      val df = keys.zipWithIndex.toDF("k", "v")
      val (all, failed) = Checks.pk(PkRule("p", "t", Seq("k")), df).counts()
      val expected = keys.groupBy(identity).values
        .filter(_.size > 1).map(_.size.toLong).sum
      assert(all === keys.size.toLong)
      assert(failed === expected)
    }
  }

  test("anti-join complement: orphans + matched = guarded child count") {
    val gen = for {
      child <- Gen.listOfN(25, Gen.oneOf("a", "b", "c", "x", "y", ""))
      father <- Gen.listOfN(5, Gen.oneOf("a", "b", "c"))
    } yield (child, father)
    forAll(gen) { case (child, father) =>
      val cdf = child.toDF("k")
      val fdf = father.toDF("fk")
      val rule = FkRule("f", "t", Seq("k"), "f", Seq("fk"))
      val (all, failed) = Checks.fk(rule, cdf, fdf).counts()
      val guarded = child.filter(_.nonEmpty)
      val matched = guarded.count(father.toSet)
      assert(all === guarded.size.toLong)
      assert(failed === (guarded.size - matched).toLong)
    }
  }

  private val textGen = Gen.listOfN(60, Gen.frequency(
    8 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.const('\n'),
    1 -> Gen.oneOf('@', '.', '-', '_', '!', ':'))).map(_.mkString)

  test("scrub idempotence + mass conservation of counts") {
    forAll(textGen) { t =>
      val (once, counts1) = Scrub.scrubPlain(t)
      val (twice, counts2) = Scrub.scrubPlain(once)
      assert(twice === once)
      // replacement tokens must not re-trigger their own pattern
      assert(counts2.values.sum === 0 ||
        counts2.filter(_._2 > 0).keySet.forall(k => counts1.getOrElse(k, 0) == 0))
    }
  }

  test("langid/perplexity are total functions on arbitrary strings") {
    forAll(Gen.asciiPrintableStr, Gen.oneOf(LangId.languages)) { (s, lang) =>
      val c = LangId.classify(s)
      assert(c == "unknown" || LangId.languages.contains(c))
      assert(!Perplexity.score(s).isNaN)
      assert(LangId.classify(LangId.sampleDoc(lang, s.hashCode.toLong)) === lang)
    }
  }

  test("jaccard bounds and symmetry over shingle sets") {
    forAll(textGen, textGen) { (a, b) =>
      val sa = Dedup.shingles(a); val sb = Dedup.shingles(b)
      val j = Dedup.jaccard(sa, sb)
      assert(j >= 0.0 && j <= 1.0)
      assert(j === Dedup.jaccard(sb, sa))
      assert(Dedup.jaccard(sa, sa) === (if (sa.isEmpty) 1.0 else 1.0))
    }
  }

  test("packed tokenizer ≡ split-lowercase reference on adversarial unicode") {
    // every class the equivalence argument in Dedup.tokenize leans on:
    // ASCII case/digits/underscore, ASCII separators, İ (U+0130 — full
    // lowercase is i + combining dot), KELVIN SIGN (U+212A → k), chars
    // that lower to non-ASCII (Σ À ß ı), combining marks, CJK, surrogate
    // pairs (Deseret capital), and the ASCII lookalikes I/i themselves
    val nastyGen = Gen.listOfN(80, Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '\n', '_', '.', ','),
      1 -> Gen.oneOf('İ', 'K', '̇', 'ı', 'I', 'i'),
      1 -> Gen.oneOf('Σ', 'ς', 'À', 'ß', 'ẞ', '中', '\uD801', '\uDC00')))
      .map(_.mkString)
    forAll(Gen.zip(nastyGen, Gen.choose(1, 4)), n = 200) { case (t, n) =>
      assert(Dedup.tokenize(t).strings.toSeq === Dedup.tokens(t).toSeq,
        s"tokens diverge on ${t.map(c => f"\\u${c.toInt}%04x").mkString}")
      assert(Dedup.shingles(t, n).toSeq === Dedup.shinglesRef(t, n).toSeq)
      assert(Dedup.simHash(t) === Dedup.simHashRef(t))
    }
    assert(Dedup.tokenize(null).n === 0 && Dedup.tokens(null).isEmpty)
  }

  test("simhash: hamming distance is a pseudo-metric on texts") {
    forAll(textGen, textGen) { (a, b) =>
      def d(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
      val (ha, hb) = (Dedup.simHash(a), Dedup.simHash(b))
      assert(d(ha, ha) === 0)
      assert(d(ha, hb) === d(hb, ha))
      assert(d(ha, hb) >= 0 && d(ha, hb) <= 64)
    }
  }

  test("rule config: parse ∘ render is the identity on declarative rules") {
    import graft.config.RuleConfig
    val ident = Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
    val colsG = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, ident))
    val ruleGen: Gen[Rule] = Gen.oneOf(
      for { t <- ident; cs <- colsG; w <- Gen.option(ident) }
        yield PkRule("p1", t, cs, w.map(c => s"$c > 0")),
      for {
        t <- ident; ft <- ident; cs <- colsG; fcs <- colsG
        eg <- Gen.oneOf(true, false); bc <- Gen.oneOf(true, false)
      } yield FkRule("f1", t, cs, ft, fcs, emptyGuard = eg,
        broadcastFather = bc),
      for { t <- ident; c <- ident; vs <- Gen.listOfN(3, ident)
            g <- Gen.oneOf(true, false) }
        yield DomainRule("v1", t, c, vs.toSet, isEmptyGuard = g),
      for { t <- ident; cs <- colsG; s <- ident; e <- ident }
        yield ZcRule("z1", t, cs, s, e),
      for { t <- ident; cs <- colsG; ct <- ident; ccs <- colsG }
        yield CodeTableRule("q1", t, cs, ct, ccs))
    forAll(ruleGen, 40) { r =>
      val reparsed = RuleConfig.parseRule(RuleConfig.render(r)).get
      assert(reparsed === r, s"render was: ${RuleConfig.render(r)}")
    }
  }

  test("coerceNum is idempotent and preserves non-float-integral strings") {
    import graft.config.RuleConfig.coerceNum
    val numish = Gen.oneOf(
      Gen.choose(-9999, 9999).map(_.toString),
      Gen.choose(-9999, 9999).map(n => s"$n.0"),
      Gen.choose(-9999, 9999).map(n => s"$n.5"),
      Gen.listOfN(4, Gen.alphaNumChar).map(_.mkString))
    forAll(numish, 60) { s =>
      assert(coerceNum(coerceNum(s)) === coerceNum(s))
      if (s.matches("-?\\d+")) assert(coerceNum(s) === s)
      if (s.matches("-?\\d+\\.5")) assert(coerceNum(s) === s)
      if (s.matches("-?\\d+\\.0")) assert(coerceNum(s) === s.dropRight(2))
    }
  }

  test("splitTop inverts a top-level join of balanced tokens") {
    import graft.config.RuleConfig.splitTop
    val token = Gen.oneOf("a", "f(x,y)", "cast(v as decimal(12,2))",
      "'p,q'", "coalesce(k,'') as k2", "b c")
    forAll(Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, token)), 40) { parts =>
      assert(splitTop(parts.mkString(", ")) === parts)
    }
  }

  test("verdict determinism: same corpus, any partitioning, same keep set") {
    import graft.corpus.CorpusGen
    import graft.filter.QualityPipeline
    forAll(Gen.oneOf(1, 3, 5, 11)) { parts =>
      val v = QualityPipeline.run(
        CorpusGen.files(spark, 300L, partitions = parts),
        CorpusGen.commitsDim(spark))
        .collect().map(x => (x.path, x.keep)).sortBy(_._1).toSeq
      val ref = QualityPipeline.run(
        CorpusGen.files(spark, 300L, partitions = 2),
        CorpusGen.commitsDim(spark))
        .collect().map(x => (x.path, x.keep)).sortBy(_._1).toSeq
      assert(v === ref)
    }
  }
}
