package graft.config

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr
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
  *   SC; id=sc1; table=orders; col=o_orderpriority            (values from CodeDict)
  *   UC; id=uc1; table=customer; select=c_custkey, c_name; orderBy=c_custkey; limit=5
  *   UU; id=uu1; table=orders; filter=o_orderstatus = 'O'; expected=4000
  * Lines starting with # are comments. runInd=N disables a rule
  * (GQ:994 semantics). Full-width commas/semicolons are normalized the way
  * the reference normalized Chinese punctuation (GQ:35-36,1265).
  *
  * UC/UU (GQ:1167-1176) carry their logic as `filter=`/`select=`/`orderBy=`/
  * `limit=` fields compiled via `functions.expr` — typed Column expressions,
  * never templated SQL. A two-table join — the most common shape of the
  * reference's free-SQL UC rules (GQ:2868-3033) — is declared with
  * `joinTable=`/`joinOn=`/`joinType=`: the base table is aliased `a`, the
  * joined table `b`, and `joinOn` is a Column expression over those aliases
  * (`joinOn=a.l_orderkey = b.o_orderkey`). The original field text is
  * preserved on the rule (`exprInfo`) so the audit row's reproRule
  * round-trips.
  *
  * MIGRATION BOUNDARY (deliberate, north_rule forbids string-templated
  * SQL): reference UC/UU rules hold ARBITRARY SQL text. The config surface
  * here covers single-table filter/select/orderBy/limit plus one declared
  * equi/theta join; anything beyond that (multi-joins, subqueries,
  * aggregation pipelines) migrates to a typed `DataFrame => DataFrame`
  * CustomRule written in Scala — same audit row, same runner.
  */
object RuleConfig {

  /** `${VAR}` substitution from a parameter map (≈ readDBDict GQ:812-814). */
  def substitute(s: String, vars: Map[String, String]): String =
    vars.foldLeft(s) { case (acc, (k, v)) => acc.replace("${" + k + "}", v) }

  /** Chinese/full-width punctuation normalization (GQ:35-36, GQ:1265). */
  def normalize(s: String): String =
    s.replace('，', ',').replace('；', ';').replace('　', ' ').trim

  /** Split on `sep` at paren/quote depth zero — expression values like
    * `coalesce(a,'') as k` or `cast(x as decimal(12,2))` keep their inner
    * commas (the reference needed an alias-strip regex + changelog entry
    * GQ:19,234 for the same problem).
    *
    * Quote runs follow SQL string-literal syntax: a quote OPENS a run only
    * when it does not directly follow an identifier character (a literal
    * never does) AND a plausible CLOSING quote exists — a later quote that
    * is itself not followed by an identifier character (a literal's closer
    * never is). Apostrophes inside words (`O'Brien`, `it's`) are therefore
    * plain characters on both ends: they can neither open a run nor
    * terminate one, so an opening quote can't pair with an unrelated
    * word-internal apostrophe and swallow real separators up to it.
    * Unbalanced ')' never drives the paren depth negative.
    */
  def splitTop(s: String, sep: Char = ','): Seq[String] = {
    // a quote terminates a literal only when not followed by an
    // identifier char (it's / O'Brien apostrophes never qualify)
    def isTerminator(j: Int): Boolean =
      j + 1 >= s.length || !Character.isLetterOrDigit(s.charAt(j + 1))
    def hasTerminator(from: Int): Boolean = {
      var j = s.indexOf('\'', from)
      while (j >= 0 && !isTerminator(j)) j = s.indexOf('\'', j + 1)
      j >= 0
    }
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) { cur += c; if (c == '\'' && isTerminator(i)) inQuote = false }
      else c match {
        case '\'' =>
          val prevIdent = i > 0 && Character.isLetterOrDigit(s.charAt(i - 1))
          inQuote = !prevIdent && hasTerminator(i + 1)
          cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth = math.max(depth - 1, 0); cur += c
        case `sep` if depth == 0 => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def fields(line: String): (String, Map[String, String]) = {
    val parts = splitTop(normalize(line), ';')
    val tpe = parts.head.toUpperCase
    val kv = parts.tail.map { p =>
      val i = p.indexOf('=')
      require(i > 0, s"bad field '$p' in rule line: $line")
      p.substring(0, i).trim -> p.substring(i + 1).trim
    }.toMap
    (tpe, kv)
  }

  private def cols(s: String): Seq[String] = splitTop(s)

  /** Float-code → int-string coercion (readSdataCode3 / valScale semantics,
    * GQ:2566-2575, GQ:3324-3326): "1.0" ≡ "1". Quote characters are
    * stripped the way the reference strips `'`/`“`/`”` from valScale.
    */
  def coerceNum(v: String): String = {
    val s = v.replace("'", "").replace("“", "").replace("”", "").trim
    if (s.matches("-?\\d+\\.0+")) s.substring(0, s.indexOf('.')) else s
  }

  /** A sort item: trailing ASC/DESC on an otherwise plain expression. */
  private def sortCol(s: String): Column = {
    val t = s.trim
    val lower = t.toLowerCase
    if (lower.endsWith(" desc")) expr(t.dropRight(5)).desc
    else if (lower.endsWith(" asc")) expr(t.dropRight(4)).asc
    else expr(t)
  }

  /** Compile UC/UU `joinTable`/`joinOn`/`joinType`/`filter`/`select`/
    * `orderBy`/`limit` fields into a typed transform, plus the canonical
    * exprInfo string that reproduces it. A declared join resolves its
    * second table through `tables` at RUN time (the same catalog resolver
    * the batch runner uses); requiring the resolver at parse time surfaces
    * a missing catalog before any rule executes.
    */
  private def customTransform(kv: Map[String, String],
      tables: Option[String => DataFrame])
      : (DataFrame => DataFrame, String) = {
    val joinT = kv.get("joinTable").filter(_.nonEmpty)
    val joinOn = kv.get("joinOn").filter(_.nonEmpty)
    val joinType = kv.get("joinType").filter(_.nonEmpty).getOrElse("inner")
    val filterE = kv.get("filter").filter(_.nonEmpty)
    val selectE = kv.get("select").filter(_.nonEmpty)
    val orderE = kv.get("orderBy").filter(_.nonEmpty)
    val limitE = kv.get("limit").filter(_.nonEmpty).map(_.toInt)
    joinT.foreach { jt =>
      require(joinOn.nonEmpty, s"joinTable=$jt needs a joinOn= predicate")
      require(tables.nonEmpty,
        s"rule declares joinTable=$jt but no table resolver was supplied " +
          "to RuleConfig.parse")
    }
    val t: DataFrame => DataFrame = df0 => {
      var d = df0
      joinT.foreach { jt =>
        // base aliased a, joined table b — joinOn/filter/select reference
        // a.col / b.col unambiguously even on shared column names
        d = d.alias("a").join(tables.get(jt).alias("b"),
          expr(joinOn.get), joinType)
      }
      filterE.foreach(f => d = d.filter(expr(f)))
      selectE.foreach(sel => d = d.select(splitTop(sel).map(expr): _*))
      orderE.foreach(o => d = d.orderBy(splitTop(o).map(sortCol): _*))
      limitE.foreach(n => d = d.limit(n))
      d
    }
    val info = Seq(
      joinT.map(v => s"joinTable=$v"), joinT.flatMap(_ => joinOn)
        .map(v => s"joinOn=$v"),
      joinT.filter(_ => joinType != "inner").map(_ => s"joinType=$joinType"),
      filterE.map(v => s"filter=$v"), selectE.map(v => s"select=$v"),
      orderE.map(v => s"orderBy=$v"), limitE.map(n => s"limit=$n"))
      .flatten.mkString("; ")
    (t, info)
  }

  /** Parse one rule line (after ${VAR} substitution). SC rules resolve
    * their value set from `dict` (the SA code dictionary, [[CodeDict]]);
    * a missing TAB.COL key warns and yields the empty set (GQ:2346-2347).
    */
  /** Field keys each rule type accepts — a typo'd or miscased key must
    * FAIL the parse, not silently change check semantics (e.g. `orderby=`
    * would drop the ordering and make the UC sample nondeterministic,
    * `Expected=` would silently revert a UU to expected=0).
    */
  private val knownKeys: Map[String, Set[String]] = {
    val common = Set("id", "table", "runInd", "desc")
    val custom = common ++ Set("filter", "select", "orderBy", "limit",
      "ugcType", "joinTable", "joinOn", "joinType")
    Map(
      "PK" -> (common ++ Set("cols", "where")),
      "FK" -> (common ++ Set("cols", "where", "father", "fatherCols",
        "fatherWhere", "emptyGuard", "broadcast")),
      "FC" -> (common ++ Set("cols", "where", "father", "fatherCols",
        "fatherWhere", "emptyGuard")),
      "ZC" -> (common ++ Set("cols", "where", "start", "end", "tiebreak",
        "hotKeySafe")),
      "VC" -> (common ++ Set("col", "where", "values", "isEmpty")),
      "SC" -> (common ++ Set("col", "where", "isEmpty")),
      "PC" -> (common ++ Set("cols", "where", "codeTable", "codeCols", "isEmpty")),
      "UC" -> custom,
      "UU" -> (custom + "expected"))
  }

  def parseRule(line: String, vars: Map[String, String] = Map.empty,
      dict: Map[String, Set[String]] = Map.empty,
      tables: Option[String => DataFrame] = None): Option[Rule] = {
    val substituted = substitute(line, vars)
    val (tpe, kv) = fields(substituted)
    if (kv.getOrElse("runInd", "Y").equalsIgnoreCase("N")) return None
    knownKeys.get(tpe).foreach { known =>
      val unknown = kv.keySet -- known
      require(unknown.isEmpty,
        s"unknown field(s) ${unknown.mkString(", ")} for $tpe rule " +
          s"(accepted: ${known.toSeq.sorted.mkString(", ")}): $line")
    }
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
        emptyGuard = !kv.get("emptyGuard").exists(_.equalsIgnoreCase("N")),
        description = desc)
      case "ZC" => ZcRule(id, table, cols(kv("cols")), kv("start"), kv("end"),
        kv.get("tiebreak").map(cols).getOrElse(Nil), where, description = desc,
        hotKeySafe = kv.get("hotKeySafe").exists(_.equalsIgnoreCase("Y")))
      case "VC" => DomainRule(id, table, kv("col"),
        cols(kv.getOrElse("values", "")).map(coerceNum).toSet,
        isEmptyGuard = !kv.get("isEmpty").exists(_.equalsIgnoreCase("N")),
        where = where, description = desc, family = "VC")
      case "SC" =>
        val key = CodeDict.key(Rule.splitTable(table)._2, kv("col"))
        val values = dict.getOrElse(key, {
          System.err.println(s"[RuleConfig] WARN: code dictionary has no key" +
            s" '$key' for SC rule '$id' — empty value set (GQ:2346-2347)")
          Set.empty[String]
        })
        DomainRule(id, table, kv("col"), values,
          isEmptyGuard = !kv.get("isEmpty").exists(_.equalsIgnoreCase("N")),
          where = where, description = desc, family = "SC")
      case "PC" => CodeTableRule(id, table, cols(kv("cols")), kv("codeTable"),
        cols(kv("codeCols")),
        isEmptyGuard = !kv.get("isEmpty").exists(_.equalsIgnoreCase("N")),
        where = where, description = desc)
      case "UC" =>
        val (t, info) = customTransform(kv, tables)
        CustomRule(id, table, t, description = desc, exprInfo = info,
          ugcType = kv.getOrElse("ugcType", ""))
      case "UU" =>
        val (t, info) = customTransform(kv, tables)
        ExpectedCountRule(id, table, t,
          expected = kv.get("expected").filter(_.nonEmpty).map(_.toLong)
            .getOrElse(0L), // default correctNum = 0, GQ:3079-3080
          description = desc, exprInfo = info,
          ugcType = kv.getOrElse("ugcType", ""))
      case other => throw new IllegalArgumentException(
        s"unknown rule type '$other' (expected PK/FK/FC/ZC/VC/SC/PC/UC/UU)")
    })
  }

  /** Serialize a rule back to its config-line form — the audit table's
    * repro artifact (≈ QuerySQL, GQ:298,1343). For declarative rules this
    * round-trips: parse(render(r)) == r (see ConfigSpec); hand-written
    * UC/UU transforms render their id/table plus exprInfo when present.
    */
  def render(rule: Rule): String = {
    def opt(k: String, v: Option[String]): String =
      v.filter(_.nonEmpty).map(x => s"; $k=$x").getOrElse("")
    def optDesc(d: String): String = opt("desc", Some(d))
    rule match {
      case r: PkRule =>
        s"PK; id=${r.id}; table=${r.table}; cols=${r.keyCols.mkString(",")}" +
          opt("where", r.where) + optDesc(r.description)
      case r: FkRule =>
        s"FK; id=${r.id}; table=${r.table}; cols=${r.keyCols.mkString(",")}" +
          s"; father=${r.fatherTable}; fatherCols=${r.fatherCols.mkString(",")}" +
          opt("where", r.where) + opt("fatherWhere", r.fatherWhere) +
          (if (r.emptyGuard) "" else "; emptyGuard=N") +
          (if (r.broadcastFather) "; broadcast=Y" else "") + optDesc(r.description)
      case r: FcRule =>
        s"FC; id=${r.id}; table=${r.table}; cols=${r.keyCols.mkString(",")}" +
          s"; father=${r.fatherTable}; fatherCols=${r.fatherCols.mkString(",")}" +
          opt("where", r.where) + opt("fatherWhere", r.fatherWhere) +
          (if (r.emptyGuard) "" else "; emptyGuard=N") + optDesc(r.description)
      case r: ZcRule =>
        s"ZC; id=${r.id}; table=${r.table}; cols=${r.keyCols.mkString(",")}" +
          s"; start=${r.startCol}; end=${r.endCol}" +
          opt("tiebreak",
            Some(r.orderTiebreak.mkString(",")).filter(_.nonEmpty)) +
          opt("where", r.where) +
          (if (r.hotKeySafe) "; hotKeySafe=Y" else "") + optDesc(r.description)
      case r: DomainRule =>
        s"${r.family}; id=${r.id}; table=${r.table}; col=${r.col}" +
          (if (r.family == "SC") "" // SC values come from the dictionary
           else s"; values=${r.values.toSeq.sorted.mkString(",")}") +
          (if (r.isEmptyGuard) "" else "; isEmpty=N") +
          opt("where", r.where) + optDesc(r.description)
      case r: CodeTableRule =>
        s"PC; id=${r.id}; table=${r.table}; cols=${r.keyCols.mkString(",")}" +
          s"; codeTable=${r.codeTable}; codeCols=${r.codeCols.mkString(",")}" +
          (if (r.isEmptyGuard) "" else "; isEmpty=N") +
          opt("where", r.where) + optDesc(r.description)
      case r: CustomRule =>
        s"UC; id=${r.id}; table=${r.table}" +
          (if (r.exprInfo.nonEmpty) s"; ${r.exprInfo}" else "") +
          opt("ugcType", Some(r.ugcType)) + optDesc(r.description)
      case r: ExpectedCountRule =>
        s"UU; id=${r.id}; table=${r.table}" +
          (if (r.exprInfo.nonEmpty) s"; ${r.exprInfo}" else "") +
          s"; expected=${r.expected}" +
          opt("ugcType", Some(r.ugcType)) + optDesc(r.description)
    }
  }

  /** `KEY=VALUE` parameter lines ≈ DBParams.txt (DBP:1-4, readDBDict
    * GQ:812-814) — the `${VAR}` substitution map.
    */
  def parseVars(text: String): Map[String, String] =
    text.linesIterator.map(normalize)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf('=')
        require(i > 0, s"bad params line: $l")
        l.substring(0, i).trim -> l.substring(i + 1).trim
      }.toMap

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
  def parse(text: String, vars: Map[String, String] = Map.empty,
      dict: Map[String, Set[String]] = Map.empty,
      tables: Option[String => DataFrame] = None): Vector[Rule] =
    text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap(parseRule(_, vars, dict, tables))
      .toVector
}
