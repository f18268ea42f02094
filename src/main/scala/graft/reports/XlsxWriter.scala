package graft.reports

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.DataFrame

/**
 * Dependency-free XLSX sink (S9/S10 — the reference writes reports with
 * openpyxl, ref: datafeeds/common/excel_csv_writer.py:229-262,
 * claims_reports.py:134-260). An .xlsx file is a zip of SpreadsheetML parts;
 * this writer emits the minimal valid set ([Content_Types], workbook,
 * worksheet per sheet, rels) with inline strings — no external library.
 *
 * Intended for final, already-aggregated report frames: rows are collected
 * to the driver (the distributed totals work happens upstream, see
 * `Feeds.groupedReport`).
 */
object XlsxWriter {

  final case class Sheet(name: String, header: Seq[String], rows: Seq[Seq[Any]])

  /** Cell formatting axes the reference styles with openpyxl
    * (ref: datafeeds/multiple_worksheets_with_formatting.py:88-141 fonts/
    * fills/alignment, :131-141 `$#,##0.00` number format, :238-260 widths).
    * Rendered into a real styles.xml part — no external library. */
  final case class CellStyle(
      bold: Boolean = false,
      size: Int = 8,
      numFmt: Option[String] = None,
      fill: Option[String] = None, // ARGB hex
      align: Option[String] = None)

  object CellStyle {
    val Data = CellStyle()
    val Right = CellStyle(align = Some("right"))
    val Money = CellStyle(numFmt = Some("#,##0.00"), align = Some("right"))
    val Dollar = CellStyle(numFmt = Some("$#,##0.00"), align = Some("right"))
    val TableHeader =
      CellStyle(bold = true, size = 10, fill = Some("FFD9D9D9"), align = Some("center"))
    val Title = CellStyle(bold = true, size = 12)
    val TitleRight = CellStyle(bold = true, size = 12, align = Some("right"))
    val Total = CellStyle(bold = true, align = Some("right"))
    val TotalMoney =
      CellStyle(bold = true, numFmt = Some("#,##0.00"), align = Some("right"))
    val TotalDollar =
      CellStyle(bold = true, numFmt = Some("$#,##0.00"), align = Some("right"))
  }

  final case class SCell(value: Any, style: CellStyle = CellStyle.Data)

  /** A fully-styled sheet: explicit column widths (chars) and cell styles,
    * plus merged ranges ("A1:C1") for the report header block. */
  final case class StyledSheet(
      name: String,
      colWidths: Seq[Double],
      rows: Seq[Seq[SCell]],
      merges: Seq[String] = Nil)

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Excel sheet-name rules: no []:*?/\ characters, 31 chars max,
    * non-empty. Violations are sanitized, not rejected. */
  private[graft] def sanitizeSheetName(name: String): String = {
    val cleaned = name.map(c => if ("[]:*?/\\".contains(c)) '_' else c).take(31).trim
    if (cleaned.isEmpty) "Sheet1" else cleaned
  }

  /** Sanitized names, made unique per workbook (sanitization/truncation can
    * collide; Excel rejects duplicate sheet names, case-insensitively):
    * collisions get a `_N` suffix, re-truncated to fit 31 chars. */
  private[graft] def uniqueSheetNames(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Set.empty[String]
    names.map { raw =>
      val base = sanitizeSheetName(raw)
      var candidate = base
      var i = 2
      while (seen.contains(candidate.toLowerCase)) {
        val suffix = s"_$i"
        candidate = base.take(31 - suffix.length) + suffix
        i += 1
      }
      seen += candidate.toLowerCase
      candidate
    }
  }

  private[reports] def colRef(i: Int): String = {
    // 0 -> A, 25 -> Z, 26 -> AA ...
    var n = i; val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  private def cellXml(ref: String, v: Any, styleAttr: String = ""): String = v match {
    case null => ""
    case n: Byte => s"""<c r="$ref"$styleAttr><v>$n</v></c>"""
    case n: Short => s"""<c r="$ref"$styleAttr><v>$n</v></c>"""
    case n: Int => s"""<c r="$ref"$styleAttr><v>$n</v></c>"""
    case n: Long => s"""<c r="$ref"$styleAttr><v>$n</v></c>"""
    case n: Float => s"""<c r="$ref"$styleAttr><v>$n</v></c>"""
    case n: Double => s"""<c r="$ref"$styleAttr><v>$n</v></c>"""
    case n: java.math.BigDecimal => s"""<c r="$ref"$styleAttr><v>$n</v></c>"""
    case other =>
      s"""<c r="$ref"$styleAttr t="inlineStr"><is><t>${xmlEscape(other.toString)}</t></is></c>"""
  }

  /** Deduplicated style registry rendered as the styles.xml part. Fill ids
    * 0 (none) and 1 (gray125) are reserved by the format; custom number
    * format ids start at 164. */
  private final class StyleBook(used: Seq[CellStyle]) {
    private val xfs = CellStyle.Data +: used.distinct.filterNot(_ == CellStyle.Data)
    private val fonts = xfs.map(s => (s.bold, s.size)).distinct
    private val fills = xfs.flatMap(_.fill).distinct
    private val fmts = xfs.flatMap(_.numFmt).distinct

    def styleId(s: CellStyle): Int = xfs.indexOf(s)

    def xml: String = {
      val numFmtXml = fmts.zipWithIndex.map { case (f, i) =>
        s"""<numFmt numFmtId="${164 + i}" formatCode="${xmlEscape(f)}"/>"""
      }.mkString
      val fontXml = fonts.map { case (b, sz) =>
        s"""<font>${if (b) "<b/>" else ""}<sz val="$sz"/><name val="Arial"/></font>"""
      }.mkString
      val fillXml = fills.map(c =>
        s"""<fill><patternFill patternType="solid"><fgColor rgb="$c"/></patternFill></fill>""").mkString
      val xfXml = xfs.map { s =>
        val fontId = fonts.indexOf((s.bold, s.size))
        val fillId = s.fill.map(fills.indexOf(_) + 2).getOrElse(0)
        val fmtId = s.numFmt.map(164 + fmts.indexOf(_)).getOrElse(0)
        val align = s.align.map(a => s"""<alignment horizontal="$a"/>""").getOrElse("")
        s"""<xf numFmtId="$fmtId" fontId="$fontId" fillId="$fillId" borderId="0"""" +
          s""" applyNumberFormat="${if (s.numFmt.isDefined) 1 else 0}" applyFont="1"""" +
          s""" applyFill="${if (s.fill.isDefined) 1 else 0}"""" +
          s""" applyAlignment="${if (s.align.isDefined) 1 else 0}">$align</xf>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        (if (fmts.nonEmpty) s"""<numFmts count="${fmts.size}">$numFmtXml</numFmts>""" else "") +
        s"""<fonts count="${fonts.size}">$fontXml</fonts>""" +
        s"""<fills count="${fills.size + 2}"><fill><patternFill patternType="none"/></fill><fill><patternFill patternType="gray125"/></fill>$fillXml</fills>""" +
        """<borders count="1"><border><left/><right/><top/><bottom/><diagonal/></border></borders>""" +
        """<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>""" +
        s"""<cellXfs count="${xfs.size}">$xfXml</cellXfs></styleSheet>"""
    }
  }

  private def styledSheetXml(s: StyledSheet, book: StyleBook): String = {
    val colsXml =
      if (s.colWidths.isEmpty) ""
      else "<cols>" + s.colWidths.zipWithIndex.map { case (w, i) =>
        s"""<col min="${i + 1}" max="${i + 1}" width="$w" customWidth="1"/>"""
      }.mkString + "</cols>"
    val rowsXml = s.rows.zipWithIndex.map { case (cells, r) =>
      val cellsXml = cells.zipWithIndex.map { case (sc, c) =>
        val sid = book.styleId(sc.style)
        cellXml(s"${colRef(c)}${r + 1}", sc.value,
          if (sid == 0) "" else s""" s="$sid"""")
      }.mkString
      s"""<row r="${r + 1}">$cellsXml</row>"""
    }.mkString
    val mergeXml =
      if (s.merges.isEmpty) ""
      else s"""<mergeCells count="${s.merges.size}">""" +
        s.merges.map(m => s"""<mergeCell ref="$m"/>""").mkString + "</mergeCells>"
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">$colsXml<sheetData>$rowsXml</sheetData>$mergeXml</worksheet>""".stripMargin
  }

  /** Write styled sheets to an .xlsx file (workbook + styles.xml parts). */
  def writeStyled(path: String, sheets: Seq[StyledSheet]): Unit = {
    require(sheets.nonEmpty, "at least one sheet")
    val book = new StyleBook(sheets.flatMap(_.rows.flatMap(_.map(_.style))))
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    val sheetTypes = sheets.indices.map(i =>
      s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString
    entry("[Content_Types].xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>$sheetTypes</Types>""".stripMargin)
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""".stripMargin)
    val names = uniqueSheetNames(sheets.map(_.name))
    val sheetDecls = names.zipWithIndex.map { case (n, i) =>
      s"""<sheet name="${xmlEscape(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    entry("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$sheetDecls</sheets></workbook>""".stripMargin)
    val sheetRels = sheets.indices.map(i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString
    entry("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$sheetRels<Relationship Id="rId${sheets.size + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/></Relationships>""".stripMargin)
    entry("xl/styles.xml", book.xml)
    sheets.zipWithIndex.foreach { case (s, i) =>
      entry(s"xl/worksheets/sheet${i + 1}.xml", styledSheetXml(s, book))
    }
    zos.close()
  }

  private def sheetXml(s: Sheet): String = {
    val all = s.header +: s.rows
    val rowsXml = all.zipWithIndex.map { case (cells, r) =>
      val cellsXml = cells.zipWithIndex
        .map { case (v, c) => cellXml(s"${colRef(c)}${r + 1}", v) }.mkString
      s"""<row r="${r + 1}">$cellsXml</row>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rowsXml</sheetData></worksheet>""".stripMargin
  }

  /** Write sheets to an .xlsx file. */
  def write(path: String, sheets: Seq[Sheet]): Unit = {
    require(sheets.nonEmpty, "at least one sheet")
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    val sheetTypes = sheets.indices.map(i =>
      s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString
    entry("[Content_Types].xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>$sheetTypes</Types>""".stripMargin)
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""".stripMargin)
    val names = uniqueSheetNames(sheets.map(_.name))
    val sheetDecls = names.zipWithIndex.map { case (n, i) =>
      s"""<sheet name="${xmlEscape(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    entry("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$sheetDecls</sheets></workbook>""".stripMargin)
    val sheetRels = sheets.indices.map(i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString
    entry("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$sheetRels</Relationships>""".stripMargin)
    sheets.zipWithIndex.foreach { case (s, i) =>
      entry(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(s))
    }
    zos.close()
  }

  /** Collect a (small, final) DataFrame into one sheet. */
  def sheetOf(name: String, df: DataFrame): Sheet =
    Sheet(name, df.columns.toSeq,
      df.collect().toSeq.map(r => r.toSeq))

  def writeDataFrame(path: String, name: String, df: DataFrame): Unit =
    write(path, Seq(sheetOf(name, df)))
}
