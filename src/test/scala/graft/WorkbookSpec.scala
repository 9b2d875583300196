package graft

import java.nio.file.{Files, Path}
import graft.config.{RuleConfig, Workbook}
import graft.model._
import graft.runner.CheckRunner
import org.apache.spark.sql.DataFrame

class WorkbookSpec extends SparkSpec {
  import spark.implicits._

  // ---- CSV sheet parsing ----------------------------------------------------

  test("parseCsv: quoted commas, \"\" escapes, embedded newlines, CRLF") {
    val rows = Workbook.parseCsv(
      "a,b,c\r\n\"x,y\",\"he said \"\"hi\"\"\",\"two\nlines\"\r\nplain,,end\n")
    assert(rows === Vector(
      Vector("a", "b", "c"),
      Vector("x,y", "he said \"hi\"", "two\nlines"),
      Vector("plain", "", "end")))
  }

  // ---- fixture workbook -----------------------------------------------------

  private def writeSheet(dir: Path, name: String, rows: Seq[Seq[String]]): Unit = {
    def cell(c: String) =
      if (c.exists("\",\n".contains(_))) "\"" + c.replace("\"", "\"\"") + "\""
      else c
    Files.writeString(dir.resolve(s"$name.csv"),
      rows.map(_.map(cell).mkString(",")).mkString("", "\n", "\n"))
  }

  /** A 10-sheet fixture exercising the reference's parsing quirks. */
  private def fixtureDir(): Path = {
    val dir = Files.createTempDirectory("graft_wb")
    writeSheet(dir, Workbook.configSheet, Seq(
      Seq("配置项", "值"),
      Seq("验证通过标志", "Y"),
      Seq("SA代码表位置", "codes_sa.csv")))
    Files.writeString(dir.resolve("codes_sa.csv"),
      "colors,c,red\ncolors,c,blue\n")
    writeSheet(dir, Workbook.pkSheet, Seq(
      Seq("运行标志", "库名", "表名", "规则编号", "字段", "where条件", "维护人", "维护信息", "备注"),
      // full-width comma in colList + alias expression; pdata indirection
      Seq("Y", "pdata", "child", "r1", "k，coalesce(k,'') as k2", "", "张三", "", "主键; 检查=1"),
      // blank runInd does NOT run (reference: only exactly 'Y' runs)
      Seq("", "", "child", "r2", "k", "", "", "", "")))
    writeSheet(dir, Workbook.fkSheet, Seq(
      Seq("运行标志", "库名", "表名", "字段", "where", "父库", "父表", "父字段", "父where", "维护人", "信息", "备注"),
      Seq("Y", "", "child", "k", "", "", "father", "fk", "", "", "", "")))
    writeSheet(dir, Workbook.fcSheet, Seq(
      Seq("h") ++ Seq.fill(11)(""),
      Seq("N", "", "child", "k", "", "", "father", "fk", "", "", "", "")))
    writeSheet(dir, Workbook.zcSheet, Seq(
      Seq("运行标志", "库名", "表名", "开始日期", "结束日期", "字段", "where", "维护人", "信息", "备注"),
      Seq("Y", "", "zipper", "st", "en", "k", "", "", "", "")))
    writeSheet(dir, Workbook.pcSheet, Seq(
      Seq("运行标志", "库名", "表名", "字段", "代码表", "代码字段", "可空", "where", "维护人", "信息", "备注"),
      // isEmpty blank → strict (reference: only exactly 'Y' is lenient)
      Seq("Y", "", "child", "k", "codes", "code", "", "", "", "", "")))
    writeSheet(dir, Workbook.scSheet, Seq(
      Seq("运行标志", "库名", "表名", "字段", "可空", "where", "维护人", "信息", "备注"),
      Seq("Y", "", "colors", "c", "Y", "", "", "", "")))
    writeSheet(dir, Workbook.vcSheet, Seq(
      Seq("运行标志", "库名", "表名", "字段", "值域类型", "值域", "可空", "where", "维护人", "信息", "备注"),
      // float-typed cell + Chinese comma + quoted value
      Seq("Y", "", "nums", "n", "数字", "1.0，2,'3'", "Y", "", "", "", "")))
    writeSheet(dir, Workbook.ucSheet, Seq(
      Seq("运行标志", "类型", "库名", "表名", "字段", "SQL", "维护人", "信息", "备注"),
      Seq("Y", "adhoc", "", "child", "", "filter=v > 1; select=k, v; orderBy=v; limit=2", "", "", "")))
    writeSheet(dir, Workbook.uuSheet, Seq(
      Seq("运行标志", "类型", "库名", "表名", "字段", "SQL", "期望值", "维护人", "信息", "备注"),
      // correctNum as the float xlrd would return
      Seq("Y", "recon", "", "child", "", "filter=v > 0", "4.0", "", "", "")))
    dir
  }

  lazy val child = Seq(("a", 1), ("a", 2), ("orph", 3), ("ok", 4)).toDF("k", "v")
  lazy val tables: CheckRunner.Tables = {
    case "pdata_db.child" | "child" => child
    case "father" => Seq("a", "ok").toDF("fk")
    case "codes" => Seq("a", "ok").toDF("code")
    case "colors" => Seq("red", "green").toDF("c")
    case "nums" => Seq(1, 2, 3, 9).toDF("n")
    case "zipper" => Seq(("a", "2024-01-01", "2024-02-01"),
      ("a", "2024-01-15", "2024-03-01")).toDF("k", "st", "en")
  }

  test("10-sheet workbook parses with every reference quirk honored") {
    val wb = Workbook.parse(fixtureDir().toString,
      vars = Map("PDATA" -> "pdata_db"))
    assert(wb.config("验证通过标志") === "Y")
    val byId = wb.rules.map(r => r.id -> r).toMap
    // parse order = reference sheet order, disabled rows absent
    assert(wb.rules.map(_.id) ===
      Vector("pk1", "fk1", "zc1", "pc1", "sc1", "vc1", "uc1", "uu1"))
    val pk = byId("pk1").asInstanceOf[PkRule]
    assert(pk.table === "pdata_db.child") // ${PDATA} resolved from vars
    assert(pk.keyCols === Seq("k", "coalesce(k,'') as k2")) // ，normalized
    assert(pk.description.contains("主键")) // desc survives, sanitized
    assert(!pk.description.contains(";") && !pk.description.contains("="))
    val fk = byId("fk1").asInstanceOf[FkRule]
    assert(fk.fatherTable === "father" && fk.fatherCols === Seq("fk"))
    val pc = byId("pc1").asInstanceOf[CodeTableRule]
    assert(!pc.isEmptyGuard) // blank isEmpty → strict
    val sc = byId("sc1").asInstanceOf[DomainRule]
    // SA dictionary loaded from the path in the 配置项 sheet
    assert(sc.values === Set("red", "blue") && sc.isEmptyGuard)
    val vc = byId("vc1").asInstanceOf[DomainRule]
    assert(vc.values === Set("1", "2", "3")) // 1.0→1, ，→',' , quotes stripped
    val uu = byId("uu1").asInstanceOf[ExpectedCountRule]
    assert(uu.expected === 4L) // float correctNum coerced
  }

  // ---- native .xlsx frontend ------------------------------------------------

  test("xlsx: write→read round trip — shared+inline strings, native " +
    "numbers, sparse cells, Chinese sheet names") {
    import graft.config.Xlsx
    val path = Files.createTempDirectory("graft_xlsx").resolve("t.xlsx").toString
    Xlsx.write(path, Seq(
      "配置项" -> Seq(Seq("配置项", "值"), Seq("SA代码表位置", "codes.csv")),
      "data" -> Seq(
        Seq("a", "", "c", "4000.0"), // gap at B, native number cell at D
        Seq(), // entirely empty row keeps its index
        Seq("x,y", "he said \"hi\"", "多字节值"))))
    val sheets = Xlsx.read(path)
    assert(sheets.keySet === Set("配置项", "data"))
    assert(sheets("配置项") ===
      Vector(Vector("配置项", "值"), Vector("SA代码表位置", "codes.csv")))
    val d = sheets("data")
    assert(d(0) === Vector("a", "", "c", "4000.0"))
    assert(d(1) === Vector()) // positional indexing preserved through gaps
    assert(d(2) === Vector("x,y", "he said \"hi\"", "多字节值"))
    assert(Xlsx.colIndex("A1") === 0 && Xlsx.colIndex("AA3") === 26 &&
      Xlsx.colIndex("BC7") === 54)
  }

  test("xlsx: rich-text runs concatenate; prefixed namespaces resolve; " +
    "DOCTYPE is rejected (XXE hardening)") {
    import graft.config.Xlsx
    val dir = Files.createTempDirectory("graft_xlsx_raw")
    def zip(path: Path, parts: Seq[(String, String)]): Unit = {
      val out = new java.util.zip.ZipOutputStream(Files.newOutputStream(path))
      try parts.foreach { case (n, c) =>
        out.putNextEntry(new java.util.zip.ZipEntry(n))
        out.write(c.getBytes("UTF-8")); out.closeEntry()
      } finally out.close()
    }
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    // every part under an explicit x: prefix + a rich-text shared string —
    // exactly the shapes a writer other than ours may emit
    val rich = dir.resolve("rich.xlsx")
    zip(rich, Seq(
      "xl/workbook.xml" ->
        s"""<x:workbook xmlns:x="$ns" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><x:sheets><x:sheet name="s1" sheetId="1" r:id="rId1"/></x:sheets></x:workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""",
      "xl/sharedStrings.xml" ->
        s"""<x:sst xmlns:x="$ns"><x:si><x:r><x:t>he</x:t></x:r><x:r><x:t>llo</x:t></x:r></x:si></x:sst>""",
      "xl/worksheets/sheet1.xml" ->
        s"""<x:worksheet xmlns:x="$ns"><x:sheetData><x:row r="1"><x:c r="A1" t="s"><x:v>0</x:v></x:c><x:c r="C1" t="inlineStr"><x:is><x:t>in</x:t></x:is></x:c></x:row></x:sheetData></x:worksheet>"""))
    val sheets = Xlsx.read(rich.toString)
    assert(sheets("s1") === Vector(Vector("hello", "", "in")))
    // a workbook part carrying a DOCTYPE must be rejected outright
    val evil = dir.resolve("evil.xlsx")
    zip(evil, Seq("xl/workbook.xml" ->
      s"""<!DOCTYPE foo [<!ENTITY xxe SYSTEM "file:///etc/hostname">]><workbook xmlns="$ns"><sheets/></workbook>"""))
    intercept[Exception](Xlsx.read(evil.toString))
  }

  test("xlsx: rows and cells without r attributes position sequentially") {
    // ECMA-376 makes the r attribute optional — "the row/cell after the
    // previous one". Dropping such content would silently lose rules from
    // workbooks written by minimal emitters.
    import graft.config.Xlsx
    val dir = Files.createTempDirectory("graft_xlsx_seq")
    val path = dir.resolve("seq.xlsx")
    val out = new java.util.zip.ZipOutputStream(Files.newOutputStream(path))
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    try Seq(
      "xl/workbook.xml" ->
        s"""<workbook xmlns="$ns" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="s" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""",
      // row 1 has refs; row 2 has NO r anywhere; a third row resumes at r=5;
      // inside row 2 the second cell is ref-less (follows C2 → D2)
      "xl/worksheets/sheet1.xml" ->
        s"""<worksheet xmlns="$ns"><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>a1</t></is></c></row><row><c r="C2" t="inlineStr"><is><t>c2</t></is></c><c t="inlineStr"><is><t>d2</t></is></c></row><row r="5"><c t="inlineStr"><is><t>a5</t></is></c></row></sheetData></worksheet>"""
    ).foreach { case (n, c) =>
      out.putNextEntry(new java.util.zip.ZipEntry(n))
      out.write(c.getBytes("UTF-8")); out.closeEntry()
    } finally out.close()
    val s = Xlsx.read(path.toString)("s")
    assert(s(0) === Vector("a1"))
    assert(s(1) === Vector("", "", "c2", "d2")) // ref-less cell follows C2
    assert(s(2) === Vector() && s(3) === Vector()) // gap rows stay empty
    assert(s(4) === Vector("a5")) // ref-less row after r=5 would be 6
  }

  test("the 10-sheet fixture parses identically from .xlsx and CSV sheets") {
    import graft.config.Xlsx
    // re-emit the CSV fixture's sheet content as a real xlsx next to the
    // SA dictionary, then compare the parsed rule sets frontend-to-frontend
    val csvDir = fixtureDir()
    val names = Seq(Workbook.configSheet, Workbook.pkSheet, Workbook.fkSheet,
      Workbook.fcSheet, Workbook.zcSheet, Workbook.pcSheet, Workbook.scSheet,
      Workbook.vcSheet, Workbook.ucSheet, Workbook.uuSheet)
    val sheets = names.map { n =>
      n -> Workbook.parseCsv(Files.readString(csvDir.resolve(s"$n.csv")))
        .map(_.toSeq).toSeq
    }
    val xdir = Files.createTempDirectory("graft_wb_as_xlsx")
    Files.copy(csvDir.resolve("codes_sa.csv"), xdir.resolve("codes_sa.csv"))
    val xlsxPath = xdir.resolve("rules.xlsx").toString
    Xlsx.write(xlsxPath, sheets)
    val fromCsv = Workbook.parse(csvDir.toString, vars = Map("PDATA" -> "pdata_db"))
    val fromXlsx = Workbook.parse(xlsxPath, vars = Map("PDATA" -> "pdata_db"))
    assert(fromXlsx.config === fromCsv.config)
    // custom rules hold transform lambdas (never equal by reference):
    // compare their declarative source instead; all others byte-equal
    def key(r: Rule): String = r match {
      case u: CustomRule =>
        s"UC:${u.id}|${u.table}|${u.exprInfo}|${u.ugcType}|${u.description}"
      case u: ExpectedCountRule =>
        s"UU:${u.id}|${u.table}|${u.exprInfo}|${u.expected}|${u.ugcType}|${u.description}"
      case other => other.toString
    }
    assert(fromXlsx.rules.map(key) === fromCsv.rules.map(key))
    assert(fromXlsx.rules.map(_.id) ===
      Vector("pk1", "fk1", "zc1", "pc1", "sc1", "vc1", "uc1", "uu1"))
  }

  test("workbook rules execute and audit like text-config rules") {
    val wb = Workbook.parse(fixtureDir().toString,
      vars = Map("PDATA" -> "pdata_db"), tables = Some(tables))
    val out = CheckRunner.runBatch(spark, "wb1", wb.rules, tables)
    val byId = out.results.map(r => r.checkId -> r).toMap
    assert(byId("pk1").failedRowCnt === 2L) // "a" duplicated
    assert(byId("pk1").dbNm === "pdata_db")
    assert(byId("fk1").failedRowCnt === 1L) // "orph"
    assert(byId("zc1").failedRowCnt === 1L) // overlapping interval
    assert(byId("pc1").failedRowCnt === 1L) // "orph" off the code table
    assert(byId("sc1").failedRowCnt === 1L) // "green" off-dictionary
    assert(byId("vc1").failedRowCnt === 1L) // 9 outside {1,2,3}
    assert(byId("uc1").failedRowCnt === -1L) // run-and-record
    assert(byId("uu1").allRowCnt === 4L && byId("uu1").failedRowCnt === 0L)
    // reproRule round-trips through the SAME canonical renderer
    val again = RuleConfig.parseRule(byId("vc1").reproRule).get
    assert(RuleConfig.render(again) === byId("vc1").reproRule)
  }

  test("free-SQL UC cell fails at the documented migration boundary") {
    val dir = Files.createTempDirectory("graft_wb_sql")
    writeSheet(dir, Workbook.ucSheet, Seq(
      Seq("运行标志", "类型", "库名", "表名", "字段", "SQL", "维护人", "信息", "备注"),
      Seq("Y", "adhoc", "", "t", "", "select * from t where x > 0", "", "", "")))
    val e = intercept[IllegalArgumentException] {
      Workbook.parse(dir.toString)
    }
    assert(e.getMessage.contains("migration boundary"))
  }

  test("orchestrateDir loads a workbook directory named by the manifest") {
    val cfgDir = Files.createTempDirectory("graft_wb_orch")
    val wbDir = cfgDir.resolve("wb_case")
    Files.createDirectory(wbDir)
    writeSheet(wbDir, Workbook.pkSheet, Seq(
      Seq("运行标志", "库名", "表名", "规则编号", "字段", "where", "维护人", "信息", "备注"),
      Seq("Y", "", "child", "r1", "k", "", "", "", "")))
    Files.writeString(cfgDir.resolve("manifest.txt"), "wb_case = bwb\n")
    val outDir = Files.createTempDirectory("graft_wb_out").toString
    val sums = CheckRunner.orchestrateDir(spark, cfgDir.toString, tables, outDir)
    assert(sums === Seq(CheckRunner.BatchSummary("wb_case", "bwb", false, 1)))
    val res = spark.read.parquet(s"$outDir/config=wb_case/batch=bwb/check_result")
    assert(res.filter($"checkId" === "pk1").count() === 1L)
  }
}
