package graft

import graft.filter.QualityClassifier
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // separable synthetic corpus: stopword-rich prose vs punctuation junk.
  // Even ids are prose (label 1), odd ids junk (label 0); held-out = the
  // last quarter, excluded from training by id.
  private val prose = "the quick brown fox jumps over the lazy dog and it " +
    "was a good day for all of the animals in this big forest by the river"
  private val junk = "!!! ??? ;;; ### $$$ %%% ^^^ &&& *** ((( ))) @@@ ~~ " +
    "<<>> [] {} || \\ // ++ == --"
  private lazy val labeled = (0L until 400L).map { i =>
    val good = i % 2 == 0
    val text = (if (good) prose else junk) + s" tag$i"
    (i, text, if (good) 1 else 0)
  }.toDF("id", "text", "y")

  test("train separates prose from junk; held-out accuracy >= 0.95") {
    val m = QualityClassifier.train(labeled.filter(col("id") < 300),
      "id", "text", "y")
    val holdout = labeled.filter(col("id") >= 300)
      .withColumn("p", QualityClassifier.scoreCol(m, col("text")))
      .select("y", "p").collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    val correct = holdout.count { case (y, p) => (p >= 0.5) == (y == 1) }
    assert(correct.toDouble / holdout.length >= 0.95,
      s"held-out accuracy ${correct.toDouble / holdout.length}")
  }

  test("train drops null-label / null-text rows instead of NPEing; " +
    "all-null sample fails with a clear message") {
    val withNulls = labeled
      .withColumn("y", when(col("id") % 7 === 0, lit(null)).otherwise(col("y")))
      .withColumn("text", when(col("id") % 11 === 0, lit(null)).otherwise(col("text")))
    val m = QualityClassifier.train(withNulls, "id", "text", "y") // no NPE
    assert(m.weights.forall(w => !w.isNaN))
    val allNull = labeled.withColumn("y", lit(null).cast("int"))
    val e = intercept[IllegalArgumentException](
      QualityClassifier.train(allNull, "id", "text", "y"))
    assert(e.getMessage.contains("non-null"))
  }

  test("training is deterministic and partition-layout independent") {
    val m1 = QualityClassifier.train(labeled, "id", "text", "y")
    val m2 = QualityClassifier.train(labeled.repartition(13, col("y")),
      "id", "text", "y")
    assert(m1.weights.toSeq === m2.weights.toSeq)
    assert(m1.bias === m2.bias)
  }

  test("scoreCol agrees with the margin route: p >= 0.5 iff z > 0") {
    val m = QualityClassifier.train(labeled, "id", "text", "y")
    val feats = QualityClassifier.featureCols(col("text"))
    val both = labeled
      .withColumns(feats.toMap)
      .withColumn("p", QualityClassifier.scoreCol(m, col("text")))
      .withColumn("z", QualityClassifier.marginFromFeatures(m))
      .select("p", "z").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(both.forall { case (p, z) => (p >= 0.5) == (z >= 0.0) })
    // sigmoid really is 1/(1+e^-z) of the same margin
    assert(both.forall { case (p, z) =>
      math.abs(p - 1.0 / (1.0 + math.exp(-z))) < 1e-12 })
  }
}
