package graft.meta

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Execution / batch audit logging and the high-water-mark metadata store —
 * Spark-native mirror of the reference's operational tables
 * (ref: connector/snowpark_connector.py:1073-1236 DATAMART_EXECUTION_TABLE,
 *  datafeeds/common/excel_csv_writer.py:159-192 BATCH_CONTROL,
 *  models/load_models.py DATAMART_EXECUTION_LOG/METADATA tables).
 *
 * Logs are append-mode parquet Datasets of case classes; the metadata store
 * holds `LAST_LOAD_TIMESTAMP` per (process, carrier) for incremental loads
 * (ref: docs/KIMBALL_CDC_DATA_DESIGN.md:289-296).
 */
final case class ExecutionLogRow(
    execution_id: String,
    execution_start_ts: java.sql.Timestamp,
    execution_end_ts: java.sql.Timestamp,
    execution_status: String,
    target_table: String,
    records_inserted: Long,
    records_updated: Long,
    records_deleted: Long,
    carrier_name: String,
    error_message: String)

final case class BatchControlRow(
    batch_control_date: java.sql.Timestamp,
    carrier_name: String,
    job_name: String,
    batch_status: String,
    output_file_name: String,
    record_count: Long)

final case class HighWaterMark(
    process_name: String,
    carrier_name: String,
    last_load_timestamp: java.sql.Timestamp)

/** One persisted DMF evaluation outcome — the engine-side analogue of a
  * DATA_METRIC_FUNCTION_RESULTS row (ref:
  * sql/new_rfb_and_total_claimants_active/setup_dmf_data_quality.sql:174-190).
  * `value` is None when the metric produced no value (ERROR status). */
final case class DmfResultRow(
    run_ts: java.sql.Timestamp,
    table_name: String,
    metric_name: String,
    expectation_name: String,
    value: Option[Long],
    status: String)

/** One DMF suspend/resume event — the catalog-resident schedule state the
  * reference's warehouse keeps in object metadata. The per-association
  * (column-set) grain follows the warehouse's documented
  * `ALTER ... MODIFY DATA METRIC FUNCTION <name> ON (cols) SUSPEND|RESUME`
  * syntax; the reference tree itself only READS the resulting
  * schedule_status through the STEP-5 references query (ref:
  * sql/new_rfb_and_total_claimants_active/setup_dmf_data_quality.sql:153-166)
  * and never issues a suspend — the write path here is the engine's own.
  * `metric_columns` is the comma-joined column set of one association;
  * None = name-level (every association of the metric name on the table).
  * `event_seq` breaks same-millisecond ordering ties deterministically. */
final case class DmfSuspensionRow(
    event_ts: java.sql.Timestamp,
    event_seq: Long,
    table_name: String,
    metric_name: String,
    metric_columns: Option[String],
    suspended: Boolean)

/** JVM-wide serialization of metadata-log parquet appends: independent
  * pipeline steps now run CONCURRENTLY (guide §2.6 — the index appends and
  * the per-index maintenance sweeps touch disjoint roots), but their audit
  * rows land in the SAME log directories, and two simultaneous
  * FileOutputCommitter jobs against one path share a `_temporary` staging
  * dir — one job's commit-time cleanup can delete the other's in-flight
  * task output. The appends are single-row and driver-issued, so a plain
  * lock costs microseconds of contention and removes the race entirely. */
private object MetaStoreLocks {
  val appendLock = new Object
}

final class MetaStore(spark: SparkSession, dir: String) {
  import spark.implicits._

  private def path(name: String) = s"$dir/$name"

  def appendExecutionLog(rows: Seq[ExecutionLogRow]): Unit =
    MetaStoreLocks.appendLock.synchronized {
      rows.toDS().write.mode(SaveMode.Append).parquet(path("execution_log"))
    }

  def appendBatchControl(rows: Seq[BatchControlRow]): Unit =
    MetaStoreLocks.appendLock.synchronized {
      rows.toDS().write.mode(SaveMode.Append).parquet(path("batch_control"))
    }

  def executionLog: DataFrame = spark.read.parquet(path("execution_log"))

  /** Recent execution history, newest first — the reference's
    * `get_query_history(id, limit)` (ref:
    * connector/snowpark_connector.py:568-605): optional execution-id
    * filter, optional not-before bound, ordered by start desc, limit-N.
    * The id filter prunes before the sort, so the global top-N sort only
    * ever sees the (small) matching subset. */
  def queryHistory(
      id: Option[String] = None,
      since: Option[java.sql.Timestamp] = None,
      limit: Int = 10): DataFrame = {
    val base = executionLog
    val byId = id.fold(base)(i => base.filter($"execution_id" === i))
    val bounded = since.fold(byId)(ts => byId.filter($"execution_start_ts" >= ts))
    bounded.orderBy($"execution_start_ts".desc).limit(limit)
  }

  def batchControl: DataFrame = spark.read.parquet(path("batch_control"))

  def appendDmfResults(rows: Seq[DmfResultRow]): Unit =
    MetaStoreLocks.appendLock.synchronized {
      rows.toDS().write.mode(SaveMode.Append).parquet(path("dmf_results"))
    }

  /** The persisted results log; empty (typed) before the first run, so
    * `references` on a fresh store reports no-executions instead of
    * crashing on a missing path. */
  def dmfResults: DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(path("dmf_results"))
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) spark.emptyDataset[DmfResultRow].toDF()
    else spark.read.parquet(path("dmf_results"))
  }

  /** DMF results trend — the reference's STEP 6 query
    * (setup_dmf_data_quality.sql:174-190): optionally filter one
    * expectation, newest run first, limit-N. The filter prunes before the
    * sort, so the top-N sort only sees the matching expectation's rows. */
  def dmfResultHistory(
      expectation: Option[String] = None, limit: Int = 10): DataFrame = {
    val base = dmfResults
    val filtered = expectation.fold(base)(e => base.filter($"expectation_name" === e))
    filtered.orderBy($"run_ts".desc, $"metric_name").limit(limit)
  }

  // tie-break for same-millisecond events from THIS store; nanoTime seed
  // makes cross-instance collisions unlikely but two stores writing the
  // same association in the same millisecond remain formally unordered —
  // acceptable: suspension is an operator action, not a data-plane write
  private val suspensionSeq =
    new java.util.concurrent.atomic.AtomicLong(System.nanoTime())

  def appendDmfSuspension(
      table: String, metricName: String, metricColumns: Option[String],
      suspended: Boolean,
      ts: java.sql.Timestamp =
        new java.sql.Timestamp(System.currentTimeMillis())): Unit =
    MetaStoreLocks.appendLock.synchronized {
      Seq(DmfSuspensionRow(ts, suspensionSeq.incrementAndGet(),
          table, metricName, metricColumns, suspended))
        .toDS().write.mode(SaveMode.Append).parquet(path("dmf_suspensions"))
    }

  /** Replay the suspension event log into the set of currently-suspended
    * associations — `(table, metric, columns)` with columns None meaning a
    * name-level suspension. A name-level RESUME clears every key of that
    * metric name, exactly like the in-memory semantics it persists. The log
    * is catalog-sized (one row per operator action), so the ordered replay
    * on the driver is the honest cost model. */
  def activeDmfSuspensions: Set[(String, String, Option[String])] = {
    val hPath = new org.apache.hadoop.fs.Path(path("dmf_suspensions"))
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) return Set.empty
    val events = spark.read.parquet(path("dmf_suspensions"))
      .orderBy($"event_ts", $"event_seq")
      .as[DmfSuspensionRow].collect()
    val active = scala.collection.mutable.Set.empty[(String, String, Option[String])]
    events.foreach { e =>
      val key = (e.table_name, e.metric_name, e.metric_columns)
      if (e.suspended) active += key
      else e.metric_columns match {
        case None => active.filterInPlace { case (t, m, _) => t != e.table_name || m != e.metric_name }
        case Some(_) => active -= key
      }
    }
    active.toSet
  }

  /** Latest watermark per process/carrier; None on first run. */
  def lastLoadTimestamp(process: String, carrier: String): Option[java.sql.Timestamp] = {
    // existence through the Hadoop FileSystem of the path — java.io.File
    // is always false for hdfs://s3a:// URIs and would silently turn every
    // incremental load into a full scan
    val hPath = new org.apache.hadoop.fs.Path(path("high_water_mark"))
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) return None
    spark.read.parquet(path("high_water_mark"))
      .filter($"process_name" === process && $"carrier_name" === carrier)
      .agg(max($"last_load_timestamp")).head().getAs[java.sql.Timestamp](0) match {
      case null => None
      case ts => Some(ts)
    }
  }

  def recordLoad(process: String, carrier: String, ts: java.sql.Timestamp): Unit =
    MetaStoreLocks.appendLock.synchronized {
      Seq(HighWaterMark(process, carrier, ts)).toDS()
        .write.mode(SaveMode.Append).parquet(path("high_water_mark"))
    }
}

/**
 * Wrap a unit of work with execution-audit logging: SUCCESS or FAILED rows
 * with start/end timestamps and a sanitized error message — the reference
 * strips quotes/newlines before inserting the message into its log SQL
 * (ref: connector/snowpark_connector.py:1171-1216).
 */
object ExecutionLogger {

  def sanitize(msg: String): String =
    Option(msg).getOrElse("").replaceAll("['\n\r]", "").take(500)

  def logged[T](
      meta: MetaStore, process: String, carrier: String,
      counts: T => (Long, Long, Long) = (_: T) => (0L, 0L, 0L))(body: => T): T = {
    val start = new java.sql.Timestamp(System.currentTimeMillis())
    def row(status: String, c: (Long, Long, Long), err: String) = ExecutionLogRow(
      java.util.UUID.randomUUID().toString, start,
      new java.sql.Timestamp(System.currentTimeMillis()),
      status, process, c._1, c._2, c._3, carrier, err)
    // label the step's Spark jobs with the audit process name (thread-local,
    // restored after) so the UI/job listeners attribute work to pipeline
    // steps without cross-referencing the log's timestamps
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    val prevDesc = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(process)
    try {
      val result = body
      meta.appendExecutionLog(Seq(row("SUCCESS", counts(result), "")))
      result
    } catch {
      case e: Throwable =>
        meta.appendExecutionLog(Seq(row("FAILED", (0L, 0L, 0L), sanitize(e.getMessage))))
        throw e
    } finally sc.setJobDescription(prevDesc)
  }
}
