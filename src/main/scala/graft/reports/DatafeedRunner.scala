package graft.reports

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.meta.{BatchControlRow, MetaStore}

/**
 * Config-driven datafeed runner — the reference's excel_csv_writer flow
 * (ref: datafeeds/common/excel_csv_writer.py:105-192,321-458 traced in
 * SURVEY §3.2): fetch (table → EXCLUDE → filter → order), write to
 * CSV/XLSX, and record the BATCH_CONTROL audit row with the record count.
 */
object DatafeedRunner {

  final case class FeedConfig(
      jobName: String,
      carrier: String,
      table: String,
      excludeColumns: Seq[String] = Seq.empty,
      filterRows: Option[Column] = None,
      sortingColumns: Seq[String] = Seq.empty,
      format: String = "csv", // csv | xlsx
      outputPath: String)

  final case class FeedResult(config: FeedConfig, recordCount: Long, status: String)

  def run(spark: SparkSession, meta: MetaStore, cfg: FeedConfig): FeedResult = {
    val fetched = Feeds.fetchData(spark.table(cfg.table),
      cfg.excludeColumns, cfg.filterRows, cfg.sortingColumns)
    val n = fetched.count()
    cfg.format.toLowerCase match {
      case "csv"  => Feeds.writeCsv(fetched, cfg.outputPath)
      case "xlsx" => XlsxWriter.writeDataFrame(cfg.outputPath, cfg.jobName, fetched)
      case other  => throw new IllegalArgumentException(s"unknown feed format: $other")
    }
    meta.appendBatchControl(Seq(BatchControlRow(
      batch_control_date = new java.sql.Timestamp(System.currentTimeMillis()),
      carrier_name = cfg.carrier,
      job_name = cfg.jobName,
      batch_status = "SUCCESS",
      output_file_name = cfg.outputPath,
      record_count = n)))
    FeedResult(cfg, n, "SUCCESS")
  }
}
