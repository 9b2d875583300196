package graft

import graft.filter.{LangId, Perplexity}

class LangIdSpec extends SparkSpec {

  test("langid >= 0.99 accuracy on generated multilingual docs") {
    val docs = for {
      lang <- LangId.languages
      i <- 0 until 200
    } yield (lang, LangId.sampleDoc(lang, seed = lang.hashCode * 1000L + i))
    val correct = docs.count { case (lang, text) => LangId.classify(text) == lang }
    val acc = correct.toDouble / docs.size
    info(f"langid accuracy: $acc%.4f over ${docs.size} docs")
    assert(acc >= 0.99)
  }

  test("langid is deterministic and handles degenerate input") {
    val t = LangId.sampleDoc("en", 1L)
    assert(LangId.classify(t) === LangId.classify(t))
    assert(LangId.classify("") === "unknown")
    assert(LangId.classify(null) === "unknown")
    assert(LangId.classify("ab") === "unknown")
  }

  test("perplexity separates code from noise") {
    val code = "def f(x: Int): Int = x * 2\nval y = f(21)\n" * 10
    val noise = "ÿþ~~~###!!!@@@^^^&&&" * 20
    val pCode = Perplexity.score(code)
    val pNoise = Perplexity.score(noise)
    val threshold = graft.filter.QualityConfig().maxPerplexity
    info(f"ppl(code)=$pCode%.2f ppl(noise)=$pNoise%.2f threshold=$threshold")
    assert(pCode < pNoise)
    assert(pCode < threshold, s"well-formed code must pass the default threshold, got $pCode")
    assert(pNoise > threshold, s"noise must fail the default threshold, got $pNoise")
  }

  test("perplexity is deterministic and degenerate-safe") {
    assert(Perplexity.score("x") === Double.MaxValue)
    assert(Perplexity.score(null) === Double.MaxValue)
    val t = "val x = 1\n" * 50
    assert(Perplexity.score(t) === Perplexity.score(t))
  }
}
