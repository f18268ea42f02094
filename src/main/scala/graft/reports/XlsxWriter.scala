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

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def colRef(i: Int): String = {
    // 0 -> A, 25 -> Z, 26 -> AA ...
    var n = i; val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  private def cellXml(ref: String, v: Any): String = v match {
    case null => ""
    case n: Byte => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Short => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Float => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
    case n: java.math.BigDecimal => s"""<c r="$ref"><v>$n</v></c>"""
    case other =>
      s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(other.toString)}</t></is></c>"""
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
    val sheetDecls = sheets.zipWithIndex.map { case (s, i) =>
      s"""<sheet name="${xmlEscape(s.name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
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
