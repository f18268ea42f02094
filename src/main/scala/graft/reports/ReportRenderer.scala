package graft.reports

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Driver-side rendering of the reference's grouped claims report
 * (ref: datafeeds/common/claims_reports.py:134-347): a header block
 * (carrier / date range / executed-on), per-group detail sections with group
 * subtotal rows, and a grand total — emitted as plain text lines (the
 * reference writes the same structure into Excel via openpyxl; the cell
 * formatting is presentation, the structure is this).
 *
 * All totals are computed IN Spark (rollup, see Feeds.groupedReport); only
 * the final small report reaches the driver.
 */
object ReportRenderer {

  final case class ReportHeader(
      title: String,
      carrier: String,
      periodStart: String,
      periodEnd: String,
      executedOn: String)

  /** Header block (ref: claims_reports.py:286-347). */
  def headerLines(h: ReportHeader): Seq[String] = Seq(
    h.title,
    s"Carrier: ${h.carrier}",
    s"Period: ${h.periodStart} - ${h.periodEnd}",
    s"Executed On: ${h.executedOn}",
    "")

  /**
   * Render detail rows grouped by `groupCol` with per-group subtotals and a
   * grand total for `measure`. The detail frame is collected once, ordered;
   * subtotals/grand total come from one distributed ROLLUP pass.
   */
  def render(
      header: ReportHeader,
      detail: DataFrame,
      groupCol: String,
      measure: String,
      detailCols: Seq[String]): Seq[String] = {
    // normalize the group column to its SQL string form up front so the
    // totals map (built via SQL cast in groupedReport) and the detail rows
    // (JVM toString) agree on keys — timestamp/date toString differs
    val detailStr = detail.withColumn(groupCol, col(groupCol).cast("string"))
    val totals = Feeds.groupedReport(detailStr, groupCol, Seq(measure -> "__total"))
      .collect()
      .map(r => Option(r.getAs[String](groupCol)).getOrElse("") ->
        r.getAs[Double]("__total")).toMap
    val orderCols = (groupCol +: detailCols).distinct
    val rows = detailStr
      .select(orderCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .collect()

    val out = collection.mutable.ArrayBuffer.empty[String]
    out ++= headerLines(header)
    out += (groupCol +: detailCols).distinct.mkString("\t")
    var current: Option[String] = None
    rows.foreach { r =>
      val g = Option(r.getAs[Any](groupCol)).map(_.toString).getOrElse("")
      if (!current.contains(g)) {
        current.foreach(prev => out += s"Total $prev\t${totals(prev)}")
        current = Some(g)
      }
      out += r.toSeq.map(v => Option(v).map(_.toString).getOrElse("")).mkString("\t")
    }
    current.foreach(prev => out += s"Total $prev\t${totals(prev)}")
    out += s"Grand Total\t${totals("Grand Total")}"
    out.toSeq
  }

  /**
   * The same grouped report as a STYLED workbook — the reference's openpyxl
   * formatting re-expressed in the dependency-free writer
   * (ref: datafeeds/multiple_worksheets_with_formatting.py:169-237 header
   * block with merged carrier/executed-on/page/date rows,
   * claims_reports.py:188-258 per-group subtotal + grand-total rows,
   * multiple_worksheets_with_formatting.py:131-141 `$#,##0.00` columns,
   * :238-260 column widths):
   *  - 3-row merged header block (carrier + Executed On; title + page;
   *    "For Dates: start To end"), bold 12pt;
   *  - bold, filled, centered table-header row;
   *  - detail rows in the 8pt data font, measure column `#,##0.00`
   *    (`$#,##0.00` for columns named in `dollarColumns`);
   *  - a bold subtotal row per group and a bold grand-total row, both from
   *    the SAME distributed rollup pass as the text renderer;
   *  - content-sized column widths capped at `maxColWidth`.
   */
  def renderXlsx(
      path: String,
      header: ReportHeader,
      detail: DataFrame,
      groupCol: String,
      measure: String,
      detailCols: Seq[String],
      dollarColumns: Set[String] = Set.empty,
      maxColWidth: Double = 40.0): Unit = {
    import XlsxWriter._
    val detailStr = detail.withColumn(groupCol, col(groupCol).cast("string"))
    val totals = Feeds.groupedReport(detailStr, groupCol, Seq(measure -> "__total"))
      .collect()
      .map(r => Option(r.getAs[String](groupCol)).getOrElse("") ->
        r.getAs[Double]("__total")).toMap
    val orderCols = (groupCol +: detailCols).distinct
    val rows = detailStr
      .select(orderCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .collect()

    val nCols = orderCols.size
    val mid = math.max(1, nCols / 2)
    val measureStyle =
      if (dollarColumns.contains(measure)) CellStyle.Dollar else CellStyle.Money
    val totalStyle =
      if (dollarColumns.contains(measure)) CellStyle.TotalDollar else CellStyle.TotalMoney
    def dataStyle(colName: String, v: Any): CellStyle = v match {
      case _: java.lang.Number if colName == measure => measureStyle
      case _: java.lang.Number => CellStyle.Right
      case _ => CellStyle.Data
    }
    def pad(cells: Seq[SCell]): Seq[SCell] =
      cells ++ Seq.fill(nCols - cells.size)(SCell(""))

    val buf = collection.mutable.ArrayBuffer.empty[Seq[SCell]]
    val merges = collection.mutable.ArrayBuffer.empty[String]
    // header block (rows 1-3), merged left/right halves like the reference
    // merged ranges must span >1 cell to be valid
    def merge(row: Int, from: Int, to: Int): Unit =
      if (to > from) merges += s"${colRef(from)}$row:${colRef(to)}$row"
    buf += pad(Seq.fill(mid)(SCell("")).updated(0, SCell(header.carrier, CellStyle.Title)) ++
      Seq(SCell(s"Executed On: ${header.executedOn}", CellStyle.TitleRight)))
    merge(1, 0, mid - 1); merge(1, mid, nCols - 1)
    buf += pad(Seq.fill(mid)(SCell("")).updated(0, SCell(header.title, CellStyle.Title)) ++
      Seq(SCell("Page 1 of 1", CellStyle.TitleRight)))
    merge(2, 0, mid - 1); merge(2, mid, nCols - 1)
    buf += pad(Seq(
      SCell(s"For Dates: ${header.periodStart} To ${header.periodEnd}", CellStyle.Title)))
    merge(3, 0, nCols - 1)
    buf += pad(Nil) // spacer
    buf += orderCols.map(c => SCell(c, CellStyle.TableHeader))

    if (rows.isEmpty) {
      // empty report → a merged centered notice instead of an empty grid
      // (ref: claims_reports.py:169-177)
      buf += pad(Seq(SCell("No data available",
        CellStyle(bold = true, size = 11, align = Some("center")))))
      merge(buf.size, 0, nCols - 1)
    } else {
      var current: Option[String] = None
      def subtotalRow(g: String): Seq[SCell] =
        pad(Seq(SCell(s"Total $g", CellStyle.Total)))
          .updated(orderCols.indexOf(measure), SCell(totals(g), totalStyle))
      rows.foreach { r =>
        val g = Option(r.getAs[Any](groupCol)).map(_.toString).getOrElse("")
        if (!current.contains(g)) {
          current.foreach(prev => buf += subtotalRow(prev))
          current = Some(g)
        }
        buf += orderCols.zipWithIndex.map { case (c, i) =>
          SCell(r.get(i), dataStyle(c, r.get(i)))
        }
      }
      current.foreach(prev => buf += subtotalRow(prev))
      buf += pad(Seq(SCell("Grand Total", CellStyle.Total)))
        .updated(orderCols.indexOf(measure), SCell(totals("Grand Total"), totalStyle))
    }

    // content-sized widths, capped (ref: set_column_widths)
    val widths = orderCols.indices.map { i =>
      val contentMax = (orderCols(i).length +:
        rows.map(r => Option(r.get(i)).map(_.toString.length).getOrElse(0)).toSeq).max
      math.min(maxColWidth, contentMax + 4.0)
    }

    writeStyled(path, Seq(StyledSheet(header.title, widths, buf.toSeq, merges.toSeq)))
  }
}
