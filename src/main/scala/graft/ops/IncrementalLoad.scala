package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.merge.{Upsert, UpsertResult}
import graft.meta.{ExecutionLogRow, MetaStore}

/**
 * Incremental (high-water-mark) load orchestration — the reference's main
 * run shape tied together: read the last load timestamp, scan only newer
 * source rows, MERGE into the target, advance the watermark, and write the
 * execution-audit row
 * (ref: connector/snowpark_connector.py:425-453 incremental predicate,
 *  :607-688 upsert, :1137-1236 execution logging;
 *  docs/KIMBALL_CDC_DATA_DESIGN.md:289-296 watermark pattern).
 *
 * Scale notes: the watermark predicate lands on the source scan (predicate /
 * partition pruning), so each run reads only the new slice — the property
 * that keeps a 100 TB CDC table loadable in minutes. The merge is one
 * key-shuffle; audit writes are driver-sized.
 *
 * On date-partitioned storage the row-level watermark predicate alone does
 * NOT prune partitions — `ts > watermark` is a predicate on a data column,
 * and the scanner still lists and opens every date directory to evaluate
 * it. Pass `partitionDateCol` so the slice also carries the derived
 * coarse predicate `date >= date(watermark)`, which Catalyst turns into
 * PartitionFilters: old partitions are skipped at file-listing time, the
 * difference between reading one day and reading ten years
 * (PlanShapeSpec pins this; SCALE.md records the measured reduction).
 */
object IncrementalLoad {

  /** The incremental slice of `source` after watermark `since`.
    *
    * With `partitionDateCol` set (storage partitioned by a DATE column at
    * day granularity), the watermark also becomes a partition predicate:
    * every row with `ts > watermark` lives in a partition whose date is
    * >= date(watermark), so `date >= to_date(watermark)` is safe — it can
    * only over-include within the watermark day itself, where the exact
    * row predicate still applies. */
  def incrementalSlice(
      source: DataFrame,
      watermarkCol: String,
      since: Option[java.sql.Timestamp],
      partitionDateCol: Option[String] = None): DataFrame =
    since match {
      case None => source
      case Some(ts) =>
        val rowPred = col(watermarkCol) > lit(ts)
        partitionDateCol match {
          case Some(p) => source.filter(rowPred && col(p) >= to_date(lit(ts)))
          case None    => source.filter(rowPred)
        }
    }

  final case class LoadResult(
      processName: String,
      sourceRows: Long,
      upsert: UpsertResult,
      newWatermark: Option[java.sql.Timestamp])

  /**
   * Run one incremental load:
   *  - `source`: full source table (the watermark filter is applied here);
   *  - `target`: current target state (empty DataFrame on first load);
   *  - `sink`: persists the merged frame — runs BEFORE the watermark
   *    advances and the SUCCESS row is written, so a failed target write
   *    leaves the old watermark in place and the slice is re-read next run
   *    (at-least-once, the reference's recovery semantics).
   */
  def run(
      spark: SparkSession,
      meta: MetaStore,
      processName: String,
      carrier: String,
      source: DataFrame,
      target: DataFrame,
      keys: Seq[String],
      watermarkCol: String,
      partitionDateCol: Option[String] = None)(sink: DataFrame => Unit): LoadResult = {
    val start = new java.sql.Timestamp(System.currentTimeMillis())
    val since = meta.lastLoadTimestamp(processName, carrier)
    val incoming = incrementalSlice(source, watermarkCol, since, partitionDateCol)
    // one pass over the slice: rows + max watermark together
    val stats = incoming.agg(
      count(lit(1)).as("n"), max(col(watermarkCol)).as("hwm")).head()
    val nRows = stats.getLong(0)
    val newHwm = Option(stats.getTimestamp(1))

    val result = Upsert.merge(target, incoming, keys)
    sink(result.result) // persist first; only then advance watermark + audit
    newHwm.foreach(ts => meta.recordLoad(processName, carrier, ts))
    meta.appendExecutionLog(Seq(ExecutionLogRow(
      execution_id = java.util.UUID.randomUUID().toString,
      execution_start_ts = start,
      execution_end_ts = new java.sql.Timestamp(System.currentTimeMillis()),
      execution_status = "SUCCESS",
      target_table = processName,
      records_inserted = result.inserted,
      records_updated = result.updated,
      records_deleted = result.deleted,
      carrier_name = carrier,
      error_message = "")))
    LoadResult(processName, nRows, result, newHwm)
  }
}
