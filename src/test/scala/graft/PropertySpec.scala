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

  // ---- notebook conversion fuzz -----------------------------------------
  // Random v3/v4 notebooks — string-, array-, and missing-form sources,
  // hostile characters (quotes, backslashes, newlines, CJK) — serialized
  // by a local JSON writer and checked against a LOCAL reference
  // implementation (its own char-walk splitlines, not the engine's
  // lookbehind regex), batched through the engine in one DataFrame pass.

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Python splitlines(True) restricted to \n, by direct char walk. */
  private def splitKeep(s: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    val sb = new StringBuilder
    s.foreach { c =>
      sb.append(c); if (c == '\n') { out += sb.toString; sb.clear() }
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq
  }

  test("notebook fuzz: random v3/v4 string/array notebooks ≡ reference") {
    import graft.text.Notebook
    import org.apache.spark.sql.functions.col
    val charGen = Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const('\n'), 1 -> Gen.const('"'),
      1 -> Gen.const('\\'), 1 -> Gen.const(' '), 1 -> Gen.const('中'),
      1 -> Gen.const('#'))
    val strGen = Gen.choose(0, 10)
      .flatMap(n => Gen.listOfN(n, charGen)).map(_.mkString)
    // (cell_type, lines-if-array, raw-if-string, form 0=array 1=str 2=none)
    val cellGen = for {
      t <- Gen.frequency(4 -> "code", 3 -> "markdown", 1 -> "heading",
        1 -> "raw", 1 -> "mystery")
      nl <- Gen.choose(0, 3)
      lines <- Gen.listOfN(nl, strGen)
      raw <- strGen
      form <- Gen.oneOf(0, 1, 2)
    } yield (t, lines, raw, form)
    val nbGen = for {
      v3 <- Gen.oneOf(true, false)
      n <- Gen.choose(0, 5)
      cells <- Gen.listOfN(n, cellGen)
      cut <- Gen.choose(0, n) // v3: split cells across two worksheets
    } yield (v3, cells, cut)

    def cellJson(v3: Boolean,
        c: (String, List[String], String, Int)): String = {
      val (t, lines, raw, form) = c
      val key = if (v3 && t == "code") "input" else "source"
      val src = form match {
        case 0 => Some(lines.map(jstr).mkString("[", ",", "]"))
        case 1 => Some(jstr(raw))
        case _ => None
      }
      (Seq(s""""cell_type":${jstr(t)}""") ++
        src.map(v => s""""$key":$v""")).mkString("{", ",", "}")
    }
    def nbJson(v3: Boolean, cells: List[(String, List[String], String, Int)],
        cut: Int): String = {
      val cj = cells.map(cellJson(v3, _))
      if (!v3) s"""{"cells":[${cj.mkString(",")}],"nbformat":4}"""
      else {
        val (a, b) = cj.splitAt(cut)
        s"""{"worksheets":[{"cells":[${a.mkString(",")}]},""" +
          s"""{"cells":[${b.mkString(",")}]}],"nbformat":3}"""
      }
    }
    def expected(cells: List[(String, List[String], String, Int)]): String =
      cells.flatMap { case (t, lines, raw, form) =>
        val ls = form match {
          case 0 => lines
          case 1 => splitKeep(raw)
          case _ => Nil
        }
        t match {
          case "code" => Some(ls.mkString(""))
          case "markdown" | "heading" => Some(ls.map("# " + _).mkString(""))
          case _ => None
        }
      }.mkString("\n\n")

    forAll(Gen.listOfN(8, nbGen), n = 8) { nbs =>
      val rows = nbs.zipWithIndex.map { case ((v3, cells, cut), i) =>
        (i, nbJson(v3, cells, cut), expected(cells),
          cells.count(_._1 == "code").toLong,
          cells.count(c => c._1 == "markdown" || c._1 == "heading").toLong)
      }
      val got = rows.toDF("i", "j", "exp", "ec", "em")
        .select(col("i"), col("exp"), col("ec"), col("em"),
          Notebook.toScript(col("j")).as("script"),
          Notebook.cellStats(col("j")).as("st"))
        .collect().sortBy(_.getInt(0))
      got.foreach { r =>
        assert(r.getString(4) === r.getString(1), s"script, row ${r.getInt(0)}")
        assert(r.getStruct(5).getLong(0) === r.getLong(2), "n_code")
        assert(r.getStruct(5).getLong(1) === r.getLong(3), "n_markdown")
      }
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
