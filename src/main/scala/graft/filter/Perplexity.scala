package graft.filter

/** KenLM-style n-gram perplexity scoring, reduced to a character-bigram
  * language model with add-one smoothing (north_rule: "batched n-gram
  * perplexity scoring"). The LM table is built deterministically at init
  * from a built-in sample of well-formed source code — no external model
  * files exist in this sandbox; at cluster scale the table would be loaded
  * once and `broadcast`.
  *
  * Pure function of the input string: identical results at any parallelism
  * and any batching (SURVEY.md §7 hard part (e) — no cross-row state).
  */
object Perplexity extends Serializable {

  /** Training sample: representative well-formed code (public idioms). */
  private val trainText: String =
    """def compute(values: Seq[Int]): Int = values.filter(_ > 0).sum
      |val result = data.map(x => x * 2).reduce(_ + _)
      |for (i <- 0 until n) { total += items(i).weight }
      |if (count == 0) return None else Some(total / count)
      |class Parser(input: String) { def parse(): Node = ... }
      |public static void main(String[] args) { System.out.println(x); }
      |import java.util.List; private final Map<String, Long> counts;
      |function update(state, action) { return { ...state, done: true }; }
      |while (queue.nonEmpty) { val head = queue.dequeue(); visit(head) }
      |match value { case Some(v) => v case None => default }
      |select key, count(*) as cnt from table group by key having cnt > 1
      |let mut buf = Vec::new(); for item in list.iter() { buf.push(item); }
      |# compute the rolling average over the trailing window
      |return [x for x in rows if x.valid and x.score > threshold]
      |""".stripMargin

  private final val Dim = 128 // ASCII table; others fold to DEL

  private def idx(c: Char): Int = if (c < 128) c.toInt else 127

  /** log P(c2|c1), add-one smoothed, flattened to a 128x128 table. */
  private lazy val logProb: Array[Double] = {
    val counts = Array.ofDim[Long](Dim * Dim)
    val rowTotals = Array.ofDim[Long](Dim)
    var i = 0
    while (i < trainText.length - 1) {
      val a = idx(trainText.charAt(i)); val b = idx(trainText.charAt(i + 1))
      counts(a * Dim + b) += 1; rowTotals(a) += 1
      i += 1
    }
    val table = Array.ofDim[Double](Dim * Dim)
    var a = 0
    while (a < Dim) {
      val denom = (rowTotals(a) + Dim).toDouble
      var b = 0
      while (b < Dim) {
        table(a * Dim + b) = math.log((counts(a * Dim + b) + 1.0) / denom)
        b += 1
      }
      a += 1
    }
    table
  }

  /** Per-character perplexity: exp(-mean log P). Low = code-like text;
    * high = binary noise / gibberish. Caps at `maxChars` — the statistic
    * converges long before that and full-body scans of 100 TB would be
    * wasted work.
    */
  def score(text: String, maxChars: Int = 4000): Double = {
    if (text == null || text.length < 2) return Double.MaxValue
    val t = if (text.length > maxChars) text.substring(0, maxChars) else text
    var sum = 0.0
    var i = 0
    while (i < t.length - 1) {
      sum += logProb(idx(t.charAt(i)) * Dim + idx(t.charAt(i + 1)))
      i += 1
    }
    math.exp(-sum / (t.length - 1))
  }
}
