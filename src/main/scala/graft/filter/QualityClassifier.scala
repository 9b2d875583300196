package graft.filter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Trained quality classifier — the CCNet/GPT-3-style complement to the
  * hand-tuned heuristic bands: a labeled sample (labels from any source —
  * human raters, a reference corpus, or the heuristic rules themselves)
  * trains a logistic regression over the SAME codegen quality metrics,
  * and scoring runs distributed as one pure Column expression (dot
  * product + sigmoid with the weights baked in as literals — no
  * broadcast, no UDF, whole-stage codegen).
  *
  * The split of labor is deliberate and is how the public pipelines run:
  * training sees 10^4–10^5 labeled documents — a driver-sized problem,
  * solved here with deterministic full-batch gradient descent (no
  * distributed-LR dependency, bit-reproducible) — while SCORING is the
  * 10^12-file-scale part, and that is a map-side projection. The training
  * sample is chosen by hash order, so any partition layout trains the
  * identical model.
  *
  * Feature standardization (train-sample mean/std) is folded back into
  * the weights after training, so the scoring expression stays a plain
  * linear combination of the raw features.
  */
object QualityClassifier {

  /** Feature names, in the FIXED order every dot product uses. */
  val featureNames: Seq[String] =
    Seq("log_chars", "log_tokens", "punct_ratio", "stopword_ratio",
      "mean_word_len")

  /** The feature projection — log1p on counts (heavy-tailed), ratios as
    * is. One codegen projection, shared by training and scoring.
    */
  def featureCols(text: Column): Seq[(String, Column)] = {
    val m = TextAnalysis.qualityMetrics(text).toMap
    Seq(
      "log_chars" -> log1p(m("n_chars").cast("double")),
      "log_tokens" -> log1p(m("n_tokens_ws").cast("double")),
      "punct_ratio" -> m("punct_ratio"),
      "stopword_ratio" -> m("stopword_ratio"),
      "mean_word_len" -> m("mean_word_len"))
  }

  /** Weights over the raw features (standardization folded in). */
  final case class Model(weights: Array[Double], bias: Double) {
    require(weights.length == featureNames.length,
      s"expected ${featureNames.length} weights, got ${weights.length}")
  }

  /** Train on `df` rows labeled 0/1 in `labelCol`. Deterministic: the
    * sample is the `maxSample` smallest rows by `xxhash64(seed, id)` —
    * a pure function of row identity — and the optimizer is fixed-step
    * full-batch gradient descent with L2, so two runs (at any
    * parallelism) produce bit-identical models.
    */
  def train(df: DataFrame, idCol: String, textCol: String, labelCol: String,
      maxSample: Int = 50000, iters: Int = 300, lr: Double = 0.3,
      l2: Double = 1e-4, seed: Long = 42L): Model = {
    val feats = featureCols(col(textCol))
    val sample = df
      .select((col(labelCol).cast("double").as("__y") +:
        col(idCol).as("__id") +:
        feats.map { case (n, c) => c.as(n) }): _*)
      // a null label or a null-producing feature (null text nulls every
      // quality metric) must not surface as an opaque NPE mid-collect:
      // such rows carry no usable signal — drop them from the sample
      .na.drop("any", "__y" +: featureNames)
      .orderBy(xxhash64(lit(seed), col("__id")), col("__id"))
      .limit(maxSample)
      .collect()
    val n = sample.length
    require(n > 0,
      "empty training sample (no rows with non-null label and features)")
    val d = featureNames.length
    val xs = Array.ofDim[Double](n, d)
    val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      ys(i) = sample(i).getDouble(0)
      var j = 0
      while (j < d) { xs(i)(j) = sample(i).getDouble(j + 2); j += 1 }
      i += 1
    }
    // standardize in place (guard zero-variance features)
    val mu = new Array[Double](d); val sd = new Array[Double](d)
    var j = 0
    while (j < d) {
      var s = 0.0; var i2 = 0
      while (i2 < n) { s += xs(i2)(j); i2 += 1 }
      mu(j) = s / n
      var v = 0.0; i2 = 0
      while (i2 < n) { val t = xs(i2)(j) - mu(j); v += t * t; i2 += 1 }
      sd(j) = math.sqrt(v / n) max 1e-12
      i2 = 0
      while (i2 < n) { xs(i2)(j) = (xs(i2)(j) - mu(j)) / sd(j); i2 += 1 }
      j += 1
    }
    // full-batch GD on standardized features
    val w = new Array[Double](d); var b = 0.0
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](d); var gb = 0.0
      var i3 = 0
      while (i3 < n) {
        var z = b; var j2 = 0
        while (j2 < d) { z += w(j2) * xs(i3)(j2); j2 += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val err = p - ys(i3)
        j2 = 0
        while (j2 < d) { gw(j2) += err * xs(i3)(j2); j2 += 1 }
        gb += err
        i3 += 1
      }
      var j3 = 0
      while (j3 < d) { w(j3) -= lr * (gw(j3) / n + l2 * w(j3)); j3 += 1 }
      b -= lr * (gb / n)
      it += 1
    }
    // fold standardization: z = Σ w_j (x_j - mu_j)/sd_j + b
    //                         = Σ (w_j/sd_j) x_j + (b - Σ w_j mu_j / sd_j)
    val folded = new Array[Double](d); var b2 = b
    var j4 = 0
    while (j4 < d) {
      folded(j4) = w(j4) / sd(j4)
      b2 -= w(j4) * mu(j4) / sd(j4)
      j4 += 1
    }
    Model(folded, b2)
  }

  /** The raw margin z = w·features + b over ALREADY-COMPUTED feature
    * columns (named per [[featureNames]]) — strictly left-associated, so
    * any engine replaying the same literals over the same doubles gets a
    * bit-identical z. keep ⟺ z > 0.
    */
  def marginFromFeatures(m: Model): Column =
    featureNames.zip(m.weights)
      .map { case (n, w) => lit(w) * col(n) }
      .reduceLeft(_ + _) + lit(m.bias)

  /** P(keep) in [0,1] computed from the text column — the 10^12-file
    * scoring path: one projection, no shuffle.
    */
  def scoreCol(m: Model, text: Column): Column = {
    val z = featureCols(text).map(_._2).zip(m.weights.toSeq)
      .map { case (c, w) => lit(w) * c }
      .reduceLeft(_ + _) + lit(m.bias)
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
