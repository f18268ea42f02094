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
}
