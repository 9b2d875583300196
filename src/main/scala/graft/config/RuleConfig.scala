package graft.config

import graft.model._

/** Declarative rule-config ingestion ≈ the reference's Excel parser
  * (dataCheckExcelParser, GQ:830-1180) + DBParams `${VAR}` substitution
  * (GQ:812-814) — recast as a plain key=value line format that compiles
  * straight into the typed Rule ADT (no SQL text is ever assembled).
  *
  * Format: one rule per line, `TYPE; key=value; key=value; ...`
  *   PK; id=pk1; table=orders; cols=o_custkey; where=o_totalprice > 0
  *   FK; id=fk1; table=lineitem; cols=l_orderkey; father=orders; fatherCols=o_orderkey
  *   VC; id=vc1; table=orders; col=o_orderstatus; values=O,F,P; isEmpty=Y
  * Lines starting with # are comments. runInd=N disables a rule
  * (GQ:994 semantics). Full-width commas/semicolons are normalized the way
  * the reference normalized Chinese punctuation (GQ:35-36,1265).
  */
object RuleConfig {

  /** `${VAR}` substitution from a parameter map (≈ readDBDict GQ:812-814). */
  def substitute(s: String, vars: Map[String, String]): String =
    vars.foldLeft(s) { case (acc, (k, v)) => acc.replace("${" + k + "}", v) }

  /** Chinese/full-width punctuation normalization (GQ:35-36, GQ:1265). */
  def normalize(s: String): String =
    s.replace('，', ',').replace('；', ';').replace('　', ' ').trim

  private def fields(line: String): (String, Map[String, String]) = {
    val parts = normalize(line).split(";").map(_.trim).filter(_.nonEmpty)
    val tpe = parts.head.toUpperCase
    val kv = parts.tail.map { p =>
      val i = p.indexOf('=')
      require(i > 0, s"bad field '$p' in rule line: $line")
      p.substring(0, i).trim -> p.substring(i + 1).trim
    }.toMap
    (tpe, kv)
  }

  private def cols(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** Parse one rule line (after ${VAR} substitution). */
  def parseRule(line: String, vars: Map[String, String] = Map.empty): Option[Rule] = {
    val substituted = substitute(line, vars)
    val (tpe, kv) = fields(substituted)
    if (kv.getOrElse("runInd", "Y").equalsIgnoreCase("N")) return None
    val id = kv.getOrElse("id", tpe.toLowerCase)
    val table = kv.getOrElse("table", "")
    val where = kv.get("where").filter(_.nonEmpty)
    val desc = kv.getOrElse("desc", "")
    Some(tpe match {
      case "PK" => PkRule(id, table, cols(kv("cols")), where, description = desc)
      case "FK" => FkRule(id, table, cols(kv("cols")), kv("father"),
        cols(kv("fatherCols")), where, kv.get("fatherWhere").filter(_.nonEmpty),
        emptyGuard = !kv.get("emptyGuard").exists(_.equalsIgnoreCase("N")),
        broadcastFather = kv.get("broadcast").exists(_.equalsIgnoreCase("Y")),
        description = desc)
      case "FC" => FcRule(id, table, cols(kv("cols")), kv("father"),
        cols(kv("fatherCols")), where, kv.get("fatherWhere").filter(_.nonEmpty),
        description = desc)
      case "ZC" => ZcRule(id, table, cols(kv("cols")), kv("start"), kv("end"),
        kv.get("tiebreak").map(cols).getOrElse(Nil), where, description = desc)
      case "VC" | "SC" => DomainRule(id, table, kv("col"),
        cols(kv.getOrElse("values", "")).toSet,
        isEmptyGuard = !kv.get("isEmpty").exists(_.equalsIgnoreCase("N")),
        where = where, description = desc)
      case "PC" => CodeTableRule(id, table, cols(kv("cols")), kv("codeTable"),
        cols(kv("codeCols")),
        isEmptyGuard = !kv.get("isEmpty").exists(_.equalsIgnoreCase("N")),
        where = where, description = desc)
      case other => throw new IllegalArgumentException(
        s"unknown rule type '$other' (expected PK/FK/FC/ZC/VC/SC/PC)")
    })
  }

  /** Run manifest ≈ batchIdConfig.py (BIC:2-59): maps a rule-config name to
    * the batch ids it runs under (a file can map to several, e.g.
    * ["1120","1520"] BIC:4). Format: one `name = id1,id2` per line.
    */
  def parseManifest(text: String): Map[String, Seq[String]] =
    text.linesIterator.map(normalize)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf('=')
        require(i > 0, s"bad manifest line: $l")
        l.substring(0, i).trim ->
          l.substring(i + 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      }.toMap

  /** Parse a whole config text into enabled rules, preserving order. */
  def parse(text: String, vars: Map[String, String] = Map.empty): Vector[Rule] =
    text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap(parseRule(_, vars))
      .toVector
}
