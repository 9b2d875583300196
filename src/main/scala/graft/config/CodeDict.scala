package graft.config

/** SA code dictionary ≈ readSdataCode3 (GQ:3308-3344): the "SDATA代码全量"
  * sheet becomes `tab,col,code` text lines; the loaded shape is
  * `Map["TAB.COL" → Set[code]]` with the reference's exact normalization:
  *   - float codes that are integral coerce to int-strings
  *     ("1.0" → "1", GQ:3324-3326);
  *   - the literal cells `''` and `'` map to the empty string
  *     (GQ:3327-3328);
  *   - values union per key across rows (GQ:3336-3341);
  *   - keys are upper-cased, whitespace-stripped TAB.COL (GQ:3332-3334).
  * A missing key at rule-compile time warns and yields the empty set
  * (GQ:2346-2347) — handled in [[RuleConfig.parseRule]].
  */
object CodeDict {

  def key(tab: String, col: String): String =
    tab.trim.toUpperCase + "." + col.trim.toUpperCase

  /** One code cell, reference-normalized. Deliberately NOT the same
    * normalization as [[RuleConfig.coerceNum]]: the reference's two
    * loaders differ — valScale strips quote characters (GQ:2572) while
    * readSdataCode3 only maps the literal `''`/`'` cells and coerces
    * floats (GQ:3324-3328). Each path here mirrors its own original.
    */
  def normalizeCode(raw: String): String = {
    val s = raw.trim
    if (s == "''" || s == "'") "" // GQ:3327-3328
    else if (s.matches("-?\\d+\\.0+")) s.substring(0, s.indexOf('.')) // GQ:3324-3326
    else s
  }

  /** Parse `tab,col,code` lines (# comments allowed; code may contain
    * further commas — only the first two are separators).
    */
  def parse(text: String): Map[String, Set[String]] = {
    val entries = text.linesIterator
      .map(RuleConfig.normalize)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split(",", 3)
        require(parts.length == 3, s"bad code-dict line (want tab,col,code): $l")
        key(parts(0), parts(1)) -> normalizeCode(parts(2))
      }.toSeq
    entries.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
  }
}
