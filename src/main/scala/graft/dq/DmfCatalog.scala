package graft.dq

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * DMF scheduling + expectation metadata — the operational catalog the
 * reference keeps in engine object metadata
 * (ref: sql/new_rfb_and_total_claimants_active/setup_dmf_data_quality.sql:40-148):
 *
 *  - STEP 1 `ALTER ... SET DATA_METRIC_SCHEDULE = 'USING CRON ...'` — one
 *    schedule per object, REQUIRED before any DMF attaches, and shared by
 *    every DMF on that object;
 *  - STEP 3 `ALTER ... ADD DATA METRIC FUNCTION <name> ON (cols)` — the
 *    metric association;
 *  - STEP 4 `CREATE EXPECTATION <name> ... EXPECT <expr> WITH COMMENT` —
 *    the pass/fail criterion per metric.
 *
 * Actual triggering stays external (SURVEY §2.11's external-cron stance —
 * an orchestrator reads `catalog` and fires `evaluate` on its own clock);
 * this class records the metadata, exposes it as an ordinary DataFrame,
 * and evaluates all registered checks on demand.
 */
final case class DmfEntry(
    table_name: String,
    metric_name: String,
    metric_columns: Seq[String],
    schedule_cron: String,
    expectation_name: String,
    expectation_expr: String,
    comment: String)

final class DmfCatalog(spark: SparkSession) {
  import spark.implicits._

  private final case class Reg(
      entry: DmfEntry, metric: DataFrame => Long, expect: Long => Boolean)

  private val schedules = mutable.LinkedHashMap.empty[String, String]
  private val regs = mutable.ArrayBuffer.empty[Reg]

  /** STEP 1 — set (or change) an object's metric schedule. Changing it
    * re-schedules every DMF already attached to the object, exactly like
    * the reference's shared per-object DATA_METRIC_SCHEDULE. */
  def setSchedule(table: String, cron: String): Unit =
    schedules(table) = cron

  /** STEP 3 + 4 — attach a metric with its expectation. Fails if the object
    * has no schedule yet (the reference enforces the same ordering). */
  def addMetric(
      table: String, metricName: String, columns: Seq[String],
      metric: DataFrame => Long,
      expectationName: String, expectationExpr: String,
      expect: Long => Boolean, comment: String = ""): Unit = {
    require(schedules.contains(table),
      s"set a DATA_METRIC_SCHEDULE on '$table' before adding DMFs")
    regs += Reg(
      DmfEntry(table, metricName, columns, schedules(table),
        expectationName, expectationExpr, comment),
      metric, expect)
  }

  /** The catalog as a DataFrame — schedule_cron reflects the object's
    * CURRENT schedule, so a later setSchedule shows through. */
  def catalog: DataFrame =
    regs.toSeq.map(r => r.entry.copy(schedule_cron = schedules(r.entry.table_name)))
      .toDS().toDF()

  /** Evaluate every registered DMF + expectation; `resolve` maps a catalog
    * table name to its DataFrame. Each metric is one distributed aggregate;
    * only the (≤ #checks) scalar results land on the driver. */
  def evaluate(resolve: String => DataFrame): DataFrame =
    regs.toSeq.map { r =>
      val v = r.metric(resolve(r.entry.table_name))
      (r.entry.table_name, r.entry.metric_name, r.entry.expectation_name,
        v, if (r.expect(v)) "PASS" else "FAIL")
    }.toDF("table_name", "metric_name", "expectation_name", "value", "status")
}
