package graft.config

import java.nio.file.{Files, Paths}
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element}

/** Minimal native .xlsx reader — zero dependencies beyond the JDK.
  *
  * An xlsx file is a ZIP of XML parts (ECMA-376 / ISO 29500 SpreadsheetML,
  * the public format): `xl/workbook.xml` names the sheets,
  * `xl/_rels/workbook.xml.rels` maps them to worksheet parts,
  * `xl/sharedStrings.xml` interns string cells, and each
  * `xl/worksheets/sheetN.xml` holds rows of cells addressed by "A1"-style
  * references. `java.util.zip` + JAXP cover all of it, which is what makes
  * the reference's actual input format (xlrd-opened workbooks, GQ:867)
  * ingestible here without any new library.
  *
  * Scope — exactly what the rule-workbook frontend consumes (the
  * reference reads every cell positionally as text, GQ:990-1180):
  *  - shared strings (including multi-run rich text: runs concatenate),
  *    inline strings, plain `<v>` values (numbers, booleans, formula
  *    results) — all surfaced as their raw text; [[RuleConfig.coerceNum]]
  *    downstream coerces float-looking numerics the same way the xlrd
  *    path did;
  *  - sparse rows/cells: the `r` attributes position content, gaps fill
  *    with "" so positional row/column indexing matches the dense sheet
  *    the reference iterated;
  *  - no styles, merged-cell rendering, dates-as-serials, or formula
  *    evaluation — rule workbooks carry none of those.
  *
  * Hardening: DTDs and external entities are disabled (workbooks are
  * untrusted input; an XXE must not read files or reach the network).
  */
object Xlsx {

  /** Read every sheet: name → all rows (INCLUDING the header row), dense. */
  def read(path: String): Map[String, Vector[Vector[String]]] = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      def part(name: String): Option[Document] =
        Option(zf.getEntry(name)).map { e =>
          val in = zf.getInputStream(e)
          try newBuilder().parse(in) finally in.close()
        }
      val workbook = part("xl/workbook.xml").getOrElse(
        throw new IllegalArgumentException(
          s"$path is not an xlsx workbook (no xl/workbook.xml)"))
      val rels = part("xl/_rels/workbook.xml.rels").map(relTargets)
        .getOrElse(Map.empty)
      val shared = part("xl/sharedStrings.xml").map(sharedStrings)
        .getOrElse(Vector.empty)
      elems(workbook, "sheet").map { s =>
        val name = s.getAttribute("name")
        val rid = attrAnyNs(s, "id")
        val target = rels.getOrElse(rid,
          throw new IllegalArgumentException(
            s"sheet '$name' relationship $rid missing from workbook rels"))
        val entry =
          if (target.startsWith("/")) target.drop(1)
          else if (target.startsWith("xl/")) target
          else s"xl/$target"
        val doc = part(entry).getOrElse(
          throw new IllegalArgumentException(
            s"sheet '$name' part $entry missing from $path"))
        name -> sheetRows(doc, shared)
      }.toMap
    } finally zf.close()
  }

  // ---- part parsers -------------------------------------------------------

  private def newBuilder() = {
    val f = DocumentBuilderFactory.newInstance()
    // untrusted input: no DTDs, no external entities, no XInclude
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f.setNamespaceAware(false)
    f.newDocumentBuilder()
  }

  /** Elements by tag, namespace-prefix-agnostic (standard writers use the
    * default namespace, but a prefixed workbook must still parse).
    */
  private def elems(doc: Document, tag: String): Vector[Element] = {
    val all = doc.getElementsByTagName("*")
    (0 until all.getLength).iterator.map(all.item(_).asInstanceOf[Element])
      .filter(e => localName(e.getTagName) == tag).toVector
  }
  private def childElems(e: Element, tag: String): Vector[Element] = {
    val all = e.getElementsByTagName("*")
    (0 until all.getLength).iterator.map(all.item(_).asInstanceOf[Element])
      .filter(c => localName(c.getTagName) == tag).toVector
  }
  private def localName(tag: String): String = {
    val i = tag.indexOf(':')
    if (i < 0) tag else tag.substring(i + 1)
  }

  /** Attribute by local name under ANY prefix (`r:id` in practice). */
  private def attrAnyNs(e: Element, local: String): String = {
    val atts = e.getAttributes
    (0 until atts.getLength).iterator.map(atts.item(_))
      .find(a => localName(a.getNodeName) == local)
      .map(_.getNodeValue).getOrElse("")
  }

  private def relTargets(doc: Document): Map[String, String] =
    elems(doc, "Relationship")
      .map(r => r.getAttribute("Id") -> r.getAttribute("Target")).toMap

  /** `<si>` entries; rich-text runs (`<r><t>…`) concatenate, matching how
    * every reader (xlrd included) surfaces them as one cell string.
    */
  private def sharedStrings(doc: Document): Vector[String] =
    elems(doc, "si").map(si => childElems(si, "t").map(_.getTextContent).mkString)

  /** Dense rows from a worksheet part: `r` attributes position rows and
    * cells (both 1-based / "A1"-style); gaps fill with "". The `r`
    * attribute is OPTIONAL in ECMA-376 — some writers omit it, meaning
    * "next row/column after the previous one" — so a missing ref falls
    * back to sequential position instead of dropping content.
    */
  private def sheetRows(doc: Document, shared: Vector[String]): Vector[Vector[String]] = {
    var nextRow = 0 // sequential fallback for rows without an r attribute
    val rows = elems(doc, "row").map { rowEl =>
      var nextCol = 0 // ditto for cells
      val cells = childElems(rowEl, "c").map { c =>
        val colIdx = colIndex(c.getAttribute("r")) match {
          case -1 => nextCol // no ref: the cell after the previous one
          case i => i
        }
        nextCol = colIdx + 1
        colIdx -> cellText(c, shared)
      }
      val ri = rowEl.getAttribute("r").toIntOption.map(_ - 1)
        .getOrElse(nextRow)
      nextRow = ri + 1
      val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
      val dense = Array.fill(width)("")
      cells.foreach { case (i, v) => dense(i) = v }
      ri -> dense.toVector
    }
    if (rows.isEmpty) Vector.empty
    else {
      val height = rows.map(_._1).max + 1
      val out = Array.fill(height)(Vector.empty[String])
      rows.foreach { case (i, r) => out(i) = r }
      out.toVector
    }
  }

  /** "BC7" → 0-based column 54; -1 when the ref carries no letters. */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def cellText(c: Element, shared: Vector[String]): String = {
    def v = childElems(c, "v").headOption.map(_.getTextContent).getOrElse("")
    c.getAttribute("t") match {
      case "s" => // shared-string index
        v.toIntOption.flatMap(shared.lift).getOrElse("")
      case "inlineStr" =>
        childElems(c, "is").headOption
          .map(is => childElems(is, "t").map(_.getTextContent).mkString)
          .getOrElse("")
      case _ => v // n/str/b/e and untyped numerics: raw text
    }
  }

  // ---- minimal writer (fixtures + CSV-to-xlsx round trips) ----------------

  /** Write a minimal valid xlsx. Exists so tests and gate queries can
    * construct REAL workbook files without a spreadsheet application; the
    * writer emits XML by hand while [[read]] parses through JAXP, so the
    * two sides are independent implementations of the format. String
    * cells alternate between the shared-strings table and inline strings
    * (both read paths stay exercised); numeric-looking cells are written
    * as native number cells, which is exactly where xlrd's float-cell
    * quirk (4000 → "4000.0") came from in the reference.
    */
  def write(path: String, sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
    val xmlHead = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    def esc(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }
    // shared-strings pool: every other distinct string goes shared, the
    // rest stay inline — deterministic and exercises both cell encodings
    val pool = scala.collection.mutable.LinkedHashMap[String, Int]()
    var nextShared = 0
    var toggle = 0
    def sharedIdx(s: String): Option[Int] = pool.get(s) match {
      case Some(ix) => if (ix >= 0) Some(ix) else None
      case None =>
        val useShared = toggle % 2 == 0
        toggle += 1
        if (useShared) { pool(s) = nextShared; nextShared += 1; Some(pool(s)) }
        else { pool(s) = -1; None } // sentinel: this string stays inline
    }
    def colRef(i: Int): String = {
      var n = i + 1
      val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val sheetXmls = sheets.zipWithIndex.map { case ((_, rows), si) =>
      val body = rows.zipWithIndex.map { case (row, ri) =>
        val cells = row.zipWithIndex.collect {
          case (v, ci) if v.nonEmpty =>
            val ref = s"${colRef(ci)}${ri + 1}"
            if (v.toDoubleOption.isDefined)
              s"""<c r="$ref"><v>${esc(v)}</v></c>"""
            else sharedIdx(v) match {
              case Some(ix) => s"""<c r="$ref" t="s"><v>$ix</v></c>"""
              case None =>
                s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>"""
            }
        }.mkString
        if (cells.isEmpty) "" else s"""<row r="${ri + 1}">$cells</row>"""
      }.mkString
      s"xl/worksheets/sheet${si + 1}.xml" ->
        (xmlHead + "\n" +
          """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
          s"<sheetData>$body</sheetData></worksheet>")
    }
    val sstXml = xmlHead + "\n" +
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      pool.collect { case (s, ix) if ix >= 0 =>
        s"""<si><t xml:space="preserve">${esc(s)}</t></si>""" }.mkString +
      "</sst>"
    val wbXml = xmlHead + "\n" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
      sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString + "</sheets></workbook>"
    val relsXml = xmlHead + "\n" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      sheets.indices.map(i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString +
      s"""<Relationship Id="rId${sheets.length + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>""" +
      "</Relationships>"
    val typesXml = xmlHead + "\n" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      sheets.indices.map(i =>
        s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
      """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>"""
    val parts =
      Seq("[Content_Types].xml" -> typesXml,
        "xl/workbook.xml" -> wbXml,
        "xl/_rels/workbook.xml.rels" -> relsXml,
        "xl/sharedStrings.xml" -> sstXml) ++ sheetXmls
    val out = new java.util.zip.ZipOutputStream(
      Files.newOutputStream(Paths.get(path)))
    try parts.foreach { case (name, content) =>
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.closeEntry()
    } finally out.close()
  }
}
