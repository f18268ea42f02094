package graft.reports

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Datafeed/report assembly.
 *
 * The reference computes per-group subtotals, category totals and a grand
 * total by collecting to pandas and concatenating frames
 * (ref: datafeeds/common/claims_reports.py:188-258). Here the same output is
 * ONE distributed operator — `ROLLUP` — with `grouping()` labeling the total
 * rows; only final (small) report rows ever reach the driver.
 */
object Feeds {

  /**
   * A7 — grouped report with subtotal and grand-total rows.
   * Output: group column (with `totalsLabel` / `grandTotalLabel` on total
   * rows), the aggregated measures, and `row_kind` ∈ {detail-group, total}.
   */
  def groupedReport(
      df: DataFrame,
      groupCol: String,
      measures: Seq[(String, String)], // (column, alias)
      totalsLabel: String = "Grand Total"): DataFrame = {
    val aggs = measures.map { case (c, a) =>
      sum(col(c).cast("decimal(18,2)")).cast("double").as(a)
    } ++ Seq(count(lit(1)).as("n_rows"), grouping(col(groupCol)).as("__g"))
    df.rollup(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("row_kind", when(col("__g") === 1, "TOTAL").otherwise("GROUP"))
      .withColumn(groupCol,
        when(col("__g") === 1, lit(totalsLabel)).otherwise(col(groupCol)))
      .drop("__g")
  }

  /**
   * S5 — config-driven fetch: `SELECT * EXCLUDE(...) FROM t WHERE f ORDER BY s`
   * (ref: datafeeds/common/excel_csv_writer.py:321-353).
   */
  def fetchData(
      df: DataFrame,
      excludeColumns: Seq[String] = Seq.empty,
      filterRows: Option[Column] = None,
      sortingColumns: Seq[String] = Seq.empty): DataFrame = {
    val dropped = df.drop(excludeColumns: _*)
    val filtered = filterRows.map(dropped.filter).getOrElse(dropped)
    if (sortingColumns.nonEmpty) filtered.orderBy(sortingColumns.map(col): _*) else filtered
  }

  /**
   * S8 — CSV sink with header and optional CRLF terminators
   * (ref: datafeeds/common/excel_csv_writer.py:264-275). Single-file output
   * for feed delivery: coalesce(1) — the final report is small by
   * construction (post-aggregation), so this is a driver-sized write.
   */
  def writeCsv(df: DataFrame, path: String, carriageReturn: Boolean = false): Unit = {
    val w = df.coalesce(1).write.mode("overwrite").option("header", "true")
    (if (carriageReturn) w.option("lineSep", "\r\n") else w).csv(path)
  }
}
