package graft.filter

/** fastText-style language identification: character n-gram features scored
  * by per-language linear profiles (north_rule: "fastText langid"). The
  * public fastText idea (Joulin et al. 2016, "Bag of Tricks for Efficient
  * Text Classification") is hashed char n-grams + a linear classifier; here
  * the profiles are char-trigram log-likelihoods trained at object-init time
  * from built-in seed text (zero egress — no external model files exist in
  * this sandbox).
  *
  * Hot-path design (this runs once per corpus row inside mapPartitions):
  * trigrams are packed into a Long (no substring allocation), the profile
  * table is one specialized LongMap keyed by packed trigram holding a
  * per-language score vector (one lookup scores ALL languages), and
  * whitespace normalization streams char-by-char (no regex, no copies).
  * Pure, deterministic function of the input string → identical verdicts at
  * any parallelism. The model is built once per JVM/executor at lazy init;
  * at cluster scale it would be an explicit broadcast, which this equals.
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
      "样 道 想 作 种 开 美 总 从 无 情 己 面 最 女 但 现 前 些 所 同 日 手 又 行"),
    "it" -> ("di e il la che a in un per sono una su con non si le da nel " +
      "come lo dei alla piu anche della gli nella questo suo ha hanno essere " +
      "sono stato fatto quella questi loro tutto ancora dove quando prima " +
      "dopo senza molto tra fra ogni altri cosa anni parte stesso mentre " +
      "contro essere quindi sempre tanto nostro vostro mondo vita casa uomo"),
    "pt" -> ("de a o que e do da em um para com nao uma os no se na por mais " +
      "as dos como mas ao ele das seu sua ou quando muito nos ja eu tambem " +
      "so pelo pela ate isso ela entre depois sem mesmo aos seus quem nas " +
      "me esse eles voce essa num nem suas meu as minha numa pelos elas " +
      "qual nos lhe deles essas esses pelas este dele tu te voces vos"),
    "nl" -> ("de het een van en in is dat op te zijn met voor niet aan er om " +
      "ook als dan maar bij nog uit naar door over zo kan geen worden wel " +
      "hij tot al zou wat mijn men dit hem onder hebben heeft haar werd die " +
      "tussen was deze wordt meer geweest andere veel omdat hun alle grote " +
      "jaar twee na moet ons tegen eerste heel werd zelf land waar moeten"),
    "ru" -> ("и в не на я быть он с что а по это она этот к но они мы как из " +
      "у который то за свой весь год от так о для ты же все тот мочь вы " +
      "человек такой его сказать только или еще бы себя один как уже до " +
      "время если сам когда другой вот говорить наш мой знать стать при " +
      "чтобы дело жизнь кто первый очень два день ее новый рука даже во"))

  // stray copy-paste duplicates in a seed list would double those words'
  // trigram weight and bias sampleDoc — normalize to distinct words
  private val seedWords: Map[String, Array[String]] =
    seeds.map { case (l, t) => l -> t.split(" ").filter(_.nonEmpty).distinct }
  private val seedText: Map[String, String] =
    seedWords.map { case (l, ws) => l -> ws.mkString(" ") }

  val languages: Vector[String] = seeds.keys.toVector.sorted
  private val L = languages.length

  @inline private def isWs(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def pack(a: Char, b: Char, c: Char): Long =
    (a.toLong << 32) | (b.toLong << 16) | c.toLong

  /** Normalized trigram stream: leading/trailing sentinel space, internal
    * whitespace runs collapsed, chars lowercased — streamed into `f` with
    * no intermediate string.
    */
  private def foreachTrigram(text: String, maxChars: Int)(f: Long => Unit): Int = {
    val n = math.min(text.length, maxChars)
    // last1/last2 = trailing window; count = chars pushed incl. sentinel
    var last1 = ' '; var last2 = 0.toChar; var count = 1
    var grams = 0
    var prevWs = false
    var i = 0
    @inline def push(ch: Char): Unit = {
      if (count >= 2) { f(pack(last1, last2, ch)); grams += 1 }
      if (count == 1) last2 = ch else { last1 = last2; last2 = ch }
      count += 1
    }
    while (i < n) {
      val c = text.charAt(i)
      if (isWs(c)) { if (!prevWs) { push(' '); prevWs = true } }
      else { push(Character.toLowerCase(c)); prevWs = false }
      i += 1
    }
    push(' ') // trailing sentinel (matches "… + ' '" of the string form)
    grams
  }

  /** packed trigram → per-language log-prob vector; plus the per-language
    * unseen-gram floor vector. Deterministic.
    */
  private lazy val (profileTable, floorVec)
      : (scala.collection.mutable.LongMap[Array[Double]], Array[Double]) = {
    val counts = languages.map { lang =>
      val m = new scala.collection.mutable.LongMap[Long]()
      foreachTrigram(seedText(lang), Int.MaxValue)(g =>
        m.update(g, m.getOrElse(g, 0L) + 1L))
      m
    }
    val totals = counts.map(_.values.sum.toDouble)
    val vocabs = counts.map(_.size.toDouble)
    val floors = Array.tabulate(L)(i => math.log(1.0 / (totals(i) + vocabs(i) + 1.0)))
    val allGrams = counts.flatMap(_.keys).distinct
    val table = new scala.collection.mutable.LongMap[Array[Double]](allGrams.size * 2)
    allGrams.foreach { g =>
      val v = Array.tabulate(L) { i =>
        counts(i).get(g) match {
          case Some(c) => math.log((c + 1.0) / (totals(i) + vocabs(i) + 1.0))
          case None => floors(i)
        }
      }
      table.update(g, v)
    }
    (table, floors)
  }

  /** Classify a text; "unknown" when there's too little signal. Caps work at
    * the first `maxChars` characters — language is stable across a document,
    * so scoring 100 TB of full file bodies would be pure waste.
    */
  def classify(text: String, maxChars: Int = 2000): String = {
    if (text == null) return "unknown"
    val acc = new Array[Double](L)
    val table = profileTable
    val floors = floorVec
    val grams = foreachTrigram(text, maxChars) { g =>
      val v = table.getOrNull(g)
      val src = if (v == null) floors else v
      var i = 0
      while (i < L) { acc(i) += src(i); i += 1 }
    }
    if (grams < 3) return "unknown"
    var best = 0; var i = 1
    while (i < L) { if (acc(i) > acc(best)) best = i; i += 1 }
    languages(best)
  }

  /** Deterministic multilingual test-document generator: words sampled from
    * the language's seed vocabulary by a seeded RNG. Used by accuracy tests.
    */
  def sampleDoc(lang: String, seed: Long, nWords: Int = 40): String = {
    val words = seedWords(lang)
    val r = new java.util.SplittableRandom(seed)
    (0 until nWords).map(_ => words(r.nextInt(words.length))).mkString(" ")
  }
}
