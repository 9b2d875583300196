package graft.config

import org.apache.spark.sql.DataFrame
import graft.model.Rule

/** Reference-shaped rule-workbook ingestion.
  *
  * The reference ingests rules from .xlsx workbooks via xlrd: ten sheets
  * addressed by Chinese name (GQ:172-182), each parsed POSITIONALLY from
  * row 1 (row 0 = header, column names never inspected) into per-type
  * field dicts (GQ:990-1180). Two frontends feed the same
  * `(sheetName, rowIndex) → cells` surface here:
  *  - a real `.xlsx` FILE, read natively by [[Xlsx]] (zip + XML via the
  *    JDK alone) — the reference's actual input format, so a migrator's
  *    34 workbooks open directly;
  *  - a DIRECTORY of CSV sheets — one `<sheetName>.csv` per reference
  *    sheet, SAME Chinese names, SAME column order (the export-friendly
  *    fallback, and the fixture format most tests use).
  * [[parse]] dispatches on the path: regular file = xlsx, directory = CSV
  * sheets. All rule semantics live BELOW this surface, so the two
  * frontends cannot diverge.
  *
  * Each sheet row is LOWERED to the canonical rule-line form and fed
  * through [[RuleConfig.parseRule]] — one parser owns rule semantics
  * regardless of frontend, so the audit row's reproRule, `${VAR}`
  * substitution, SA-dictionary resolution and field validation are
  * byte-identical across the text-config and workbook paths.
  *
  * Reference quirks preserved:
  *  - only `runInd == 'Y'` runs (GQ:994 `if 'Y' == runInd`): blank or any
  *    other value is lowered to `runInd=N` (the text-config frontend's
  *    laxer "anything but N runs" stays as-is for hand-written configs);
  *  - `dbNm` values `pdata`/`sdata` (any case) become `${PDATA}`/`${SDATA}`
  *    indirections resolved from the var map (GQ:2491-2495);
  *  - full-width commas in colList/valScale normalize to ASCII (GQ:1265,
  *    via RuleConfig.normalize), float-typed cells coerce `4000.0`→`4000`
  *    (xlrd returns numeric cells as floats, GQ:2566-2570);
  *  - VC `valScale` is the value list; `valType` is advisory in the
  *    reference (values are compared as quoted strings regardless,
  *    GQ:2482) and is dropped here the same way;
  *  - `isEmpty` means "empty values allowed" only when exactly `Y`
  *    (GQ:2591): anything else lowers to the strict `isEmpty=N`;
  *  - a missing sheet warns and contributes no rules (the reference
  *    printed a warning per missing sheet and carried on, GQ:880-950);
  *  - the 配置项 sheet parses as key→value config; `SA代码表位置` names
  *    the SA code dictionary (readSdataCode3's input, GQ:3308), resolved
  *    relative to the workbook directory and parsed by [[CodeDict]].
  *
  * MIGRATION BOUNDARY (north rule forbids string-templated SQL): the
  * reference's UC/UU `sql` cells hold arbitrary SQL text. Here the cell
  * must hold the declarative `filter=/select=/joinTable=/...` form; a
  * cell that still holds free SQL fails loudly with this boundary named,
  * instead of silently mis-parsing.
  */
object Workbook {

  // sheet names, verbatim from the reference (GQ:173-182)
  val configSheet = "配置项"
  val pkSheet = "字段唯一性"
  val fkSheet = "外键完整性"
  val fcSheet = "父子关系"
  val pcSheet = "代码值域(PDM)"
  val scSheet = "代码值域(SA)"
  val vcSheet = "值域(手动设置)"
  val zcSheet = "历史拉链表"
  val ucSheet = "自定义SQL规则"
  val uuSheet = "自定义规则"

  /** Minimal RFC-4180 CSV: quoted cells may hold commas/newlines, `""`
    * escapes a quote. Returns all rows INCLUDING the header (callers drop
    * row 0, like the reference's `range(1, nrows)` loops).
    */
  def parseCsv(text: String): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    var row = Vector.newBuilder[String]
    val cell = new StringBuilder
    var inQ = false
    var sawAny = false
    var i = 0
    def endCell(): Unit = { row += cell.result(); cell.clear() }
    def endRow(): Unit = {
      endCell(); rows += row.result(); row = Vector.newBuilder[String]
    }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') {
            cell += '"'; i += 1
          } else inQ = false
        } else cell += c
      } else c match {
        case '"' => inQ = true; sawAny = true
        case ',' => endCell(); sawAny = true
        case '\r' => () // \r\n and stray \r both fold into the \n handling
        case '\n' => endRow(); sawAny = false
        case other => cell += other; sawAny = true
      }
      i += 1
    }
    if (sawAny || cell.nonEmpty) endRow()
    rows.result()
  }

  // ---- row → canonical rule line lowering ---------------------------------

  private def cellAt(r: Vector[String], i: Int): String =
    if (i < r.length) r(i).trim else ""

  /** pdata/sdata logical-db indirection (GQ:2491-2495). */
  private def db(dbNm: String): String = dbNm.toLowerCase match {
    case "pdata" => "${PDATA}"
    case "sdata" => "${SDATA}"
    case _ => dbNm
  }

  private def tableOf(dbNm: String, tabNm: String): String =
    if (dbNm.isEmpty) tabNm else s"${db(dbNm)}.$tabNm"

  /** Only exactly-'Y' runs (GQ:994 `if 'Y' == runInd` — case-sensitive;
    * 'y' does NOT run in the reference and must not run here).
    */
  private def runInd(v: String): String =
    if (v == "Y") "Y" else "N"

  /** Strict unless exactly 'Y' (GQ:2591, case-sensitive like runInd).
    * Emitted only when strict — the canonical line's default is the
    * guard ON.
    */
  private def isEmptyField(v: String): String =
    if (v == "Y") "" else "; isEmpty=N"

  private def opt(k: String, v: String): String =
    if (v.isEmpty) "" else s"; $k=$v"

  /** Audit free-text can carry the line syntax's separators — neutralize
    * them (desc is metadata, never executed).
    */
  private def descField(cells: String*): String = {
    val joined = cells.filter(_.nonEmpty).mkString(" | ")
      .replace(';', '，').replace('；', '，').replace('=', ':')
    opt("desc", joined)
  }

  /** Lower one sheet row to the canonical rule-line form. Exposed for
    * tests; `idx` is the 1-based sheet row index, mirroring the
    * reference's dict keys (checkId `pk1`, `fk3`, ... GQ:1245 etc).
    */
  def lowerRow(family: String, row: Vector[String], idx: Int): String = {
    def c(i: Int) = cellAt(row, i)
    val id = family.toLowerCase + idx
    family match {
      case "PK" => // runInd,dbNm,tabNm,tabRuleId,colList,where,op,info,desc (GQ:990-1005)
        s"PK; id=$id; table=${tableOf(c(1), c(2))}; cols=${c(4)}" +
          opt("where", c(5)) + s"; runInd=${runInd(c(0))}" +
          descField(c(3), c(8))
      case "FK" | "FC" => // runInd,dbNm,tabNm,colList,where,fatherDb,fatherTab,fatherCols,fatherWhere,op,info,desc (GQ:1010-1055)
        s"$family; id=$id; table=${tableOf(c(1), c(2))}; cols=${c(3)}" +
          opt("where", c(4)) +
          s"; father=${tableOf(c(5), c(6))}; fatherCols=${c(7)}" +
          opt("fatherWhere", c(8)) + s"; runInd=${runInd(c(0))}" +
          descField(c(11))
      case "ZC" => // runInd,dbNm,tabNm,stDt,endDt,colList,where,op,info,desc (GQ:1058-1075)
        s"ZC; id=$id; table=${tableOf(c(1), c(2))}; cols=${c(5)}" +
          s"; start=${c(3)}; end=${c(4)}" + opt("where", c(6)) +
          s"; runInd=${runInd(c(0))}" + descField(c(9))
      case "PC" => // runInd,dbNm,tabNm,colList,pdmCde,pdmCdeCol,isEmpty,where,op,info,desc (GQ:1077-1095)
        s"PC; id=$id; table=${tableOf(c(1), c(2))}; cols=${c(3)}" +
          s"; codeTable=${c(4)}; codeCols=${c(5)}" + isEmptyField(c(6)) +
          opt("where", c(7)) + s"; runInd=${runInd(c(0))}" + descField(c(10))
      case "SC" => // runInd,dbNm,tabNm,colList,isEmpty,where,op,info,desc (GQ:1100-1115)
        s"SC; id=$id; table=${tableOf(c(1), c(2))}; col=${c(3)}" +
          isEmptyField(c(4)) + opt("where", c(5)) +
          s"; runInd=${runInd(c(0))}" + descField(c(8))
      case "VC" => // runInd,dbNm,tabNm,colList,valType,valScale,isEmpty,where,op,info,desc (GQ:1120-1140)
        // valScale items are coerced (float→int, quote-strip) per item by
        // the canonical parser; only the full-width commas normalize here
        s"VC; id=$id; table=${tableOf(c(1), c(2))}; col=${c(3)}" +
          s"; values=${RuleConfig.normalize(c(5))}" +
          isEmptyField(c(6)) + opt("where", c(7)) +
          s"; runInd=${runInd(c(0))}" + descField(c(10))
      case "UC" | "UU" => // runInd,ugcType,dbNm,tabNm,colList,sql[,correctNum],op,info,desc (GQ:1142-1180)
        val sql = RuleConfig.normalize(c(5))
        // the declarative form always leads with `key=...`; free SQL never
        // does — fail at the documented boundary instead of mis-parsing
        val leadKey = sql.takeWhile(ch => ch.isLetter).nonEmpty &&
          sql.dropWhile(ch => ch.isLetterOrDigit).trim.startsWith("=")
        require(sql.isEmpty || leadKey,
          s"$family row $idx: sql cell is not in the declarative " +
            "filter=/select=/joinTable= form. Free-SQL rules are a " +
            "documented migration boundary (north rule: no string-templated " +
            "SQL) — express the rule declaratively, or as a typed " +
            "DataFrame=>DataFrame CustomRule in code.")
        val expected =
          if (family == "UU")
            opt("expected", RuleConfig.coerceNum(c(6)))
          else ""
        s"$family; id=$id; table=${tableOf(c(2), c(3))}" +
          (if (sql.isEmpty) "" else s"; $sql") + expected +
          opt("ugcType", c(1)) + s"; runInd=${runInd(c(0))}" +
          descField(if (family == "UU") c(9) else c(8))
      case other =>
        throw new IllegalArgumentException(s"unknown sheet family $other")
    }
  }

  final case class Parsed(rules: Vector[Rule], config: Map[String, String])

  /** ASCII fallback filename per sheet — export tools transliterate, and a
    * POSIX-locale JVM cannot even open the Chinese names; either filename
    * works, the Chinese one winning when both exist.
    */
  val asciiAlias: Map[String, String] = Map(
    configSheet -> "config", pkSheet -> "pk", fkSheet -> "fk",
    fcSheet -> "fc", pcSheet -> "pc", scSheet -> "sc", vcSheet -> "vc",
    zcSheet -> "zc", ucSheet -> "uc", uuSheet -> "uu")

  private val ruleSheets: Seq[(String, String)] = Seq(
    // reference parse order: pk, fk, fc, zc, pc, sc, vc, uc, uu (GQ:990-1180)
    "PK" -> pkSheet, "FK" -> fkSheet, "FC" -> fcSheet, "ZC" -> zcSheet,
    "PC" -> pcSheet, "SC" -> scSheet, "VC" -> vcSheet, "UC" -> ucSheet,
    "UU" -> uuSheet)

  /** Parse a workbook — a `.xlsx` file or a CSV-sheet directory — into
    * enabled rules + the 配置项 map. `dict` merges UNDER the workbook's
    * own SA dictionary (a caller-supplied dictionary wins on key
    * collision, mirroring params.txt precedence in
    * [[graft.runner.CheckRunner.orchestrateDir]]).
    */
  def parse(dir: String, vars: Map[String, String] = Map.empty,
      dict: Map[String, Set[String]] = Map.empty,
      tables: Option[String => DataFrame] = None,
      warn: String => Unit = _ => ()): Parsed = {
    import java.nio.file.{Files, InvalidPathException, Path, Paths}
    val isXlsx = Files.isRegularFile(Paths.get(dir))
    // xlsx sheets load once up front (one zip walk); the ASCII alias also
    // resolves so a transliterating export round-trips
    val xlsxSheets: Map[String, Vector[Vector[String]]] =
      if (isXlsx) Xlsx.read(dir) else Map.empty
    // relative paths named by the workbook (the SA dictionary) resolve
    // against the directory holding the workbook
    val baseDir =
      if (isXlsx) Option(Paths.get(dir).getParent).getOrElse(Paths.get("."))
      else Paths.get(dir)
    def sheet(name: String): Option[Vector[Vector[String]]] =
      if (isXlsx)
        xlsxSheets.get(name).orElse(xlsxSheets.get(asciiAlias(name)))
          .orElse {
            warn(s"workbook $dir has no sheet '$name' — skipped"); None
          }
      else {
        def existing(n: String): Option[Path] =
          // a POSIX-locale JVM throws on the non-ASCII path rather than
          // returning absent — treat both as "not this filename"
          try Some(Paths.get(dir, s"$n.csv")).filter(Files.exists(_))
          catch { case _: InvalidPathException => None }
        existing(name).orElse(existing(asciiAlias(name))) match {
          case Some(p) => Some(parseCsv(Files.readString(p)))
          case None =>
            warn(s"workbook $dir has no sheet '$name' — skipped"); None
        }
      }
    val config = sheet(configSheet).map { rows =>
      rows.drop(1).filter(_.exists(_.trim.nonEmpty))
        .map(r => cellAt(r, 0) -> cellAt(r, 1)).toMap
    }.getOrElse(Map.empty)
    // SA dictionary named by the config sheet (readSdataCode3's trigger):
    // resolved relative to the workbook dir
    val saDict = config.get("SA代码表位置").filter(_.nonEmpty).flatMap { f =>
      val p = baseDir.resolve(f)
      if (Files.exists(p)) Some(CodeDict.parse(Files.readString(p)))
      else { warn(s"SA code dictionary $p not found — SC rules resolve empty"); None }
    }.getOrElse(Map.empty)
    val fullDict = saDict ++ dict
    val rules = for {
      (family, name) <- ruleSheets.toVector
      rows <- sheet(name).toVector
      (row, i) <- rows.drop(1).zipWithIndex
      if row.exists(_.trim.nonEmpty) // blank padding rows contribute nothing
      rule <- RuleConfig.parseRule(lowerRow(family, row, i + 1), vars,
        fullDict, tables)
    } yield rule
    Parsed(rules, config)
  }
}
