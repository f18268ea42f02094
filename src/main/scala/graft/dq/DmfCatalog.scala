package graft.dq

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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
 *
 * Two metric forms:
 *  - `addColumnMetric` (preferred): the metric is an aggregate Column.
 *    `evaluate` fuses every column metric registered on one table into a
 *    SINGLE `df.agg(...)` pass — N metrics on a 100 TB table cost one scan,
 *    not N (the same single-pass stance as the DQ suites).
 *  - `addMetric`: an opaque `DataFrame => Long` for metrics no single
 *    aggregate expresses (e.g. the two-table count difference). Each costs
 *    its own job.
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
      entry: DmfEntry,
      metric: Either[DataFrame => Long, Column], // Left opaque, Right fusable
      expect: Long => Boolean)

  private val schedules = mutable.LinkedHashMap.empty[String, String]
  private val regs = mutable.ArrayBuffer.empty[Reg]

  /** STEP 1 — set (or change) an object's metric schedule. Changing it
    * re-schedules every DMF already attached to the object, exactly like
    * the reference's shared per-object DATA_METRIC_SCHEDULE. */
  def setSchedule(table: String, cron: String): Unit =
    schedules(table) = cron

  private def register(
      table: String, metricName: String, columns: Seq[String],
      metric: Either[DataFrame => Long, Column],
      expectationName: String, expectationExpr: String,
      expect: Long => Boolean, comment: String): Unit = {
    require(schedules.contains(table),
      s"set a DATA_METRIC_SCHEDULE on '$table' before adding DMFs")
    regs += Reg(
      DmfEntry(table, metricName, columns, schedules(table),
        expectationName, expectationExpr, comment),
      metric, expect)
  }

  /** STEP 3 + 4 — attach an opaque metric function with its expectation.
    * Fails if the object has no schedule yet (the reference enforces the
    * same ordering). Prefer `addColumnMetric` when the metric is a single
    * aggregate — those fuse into one scan per table. */
  def addMetric(
      table: String, metricName: String, columns: Seq[String],
      metric: DataFrame => Long,
      expectationName: String, expectationExpr: String,
      expect: Long => Boolean, comment: String = ""): Unit =
    register(table, metricName, columns, Left(metric),
      expectationName, expectationExpr, expect, comment)

  /** STEP 3 + 4 with a fusable aggregate-Column metric (e.g.
    * `count(when(col("k").isNull, 1))`): all column metrics on one table
    * evaluate in a single aggregation pass. */
  def addColumnMetric(
      table: String, metricName: String, columns: Seq[String],
      metric: Column,
      expectationName: String, expectationExpr: String,
      expect: Long => Boolean, comment: String = ""): Unit =
    register(table, metricName, columns, Right(metric),
      expectationName, expectationExpr, expect, comment)

  /** The catalog as a DataFrame — schedule_cron reflects the object's
    * CURRENT schedule, so a later setSchedule shows through. */
  def catalog: DataFrame =
    regs.toSeq.map(r => r.entry.copy(schedule_cron = schedules(r.entry.table_name)))
      .toDS().toDF()

  /** Evaluate every registered DMF + expectation; `resolve` maps a catalog
    * table name to its DataFrame. Column metrics fuse into ONE aggregate
    * scan per table; opaque metrics run one job each. Only the (≤ #checks)
    * scalar results land on the driver; registration order is preserved. */
  def evaluate(resolve: String => DataFrame): DataFrame = {
    // one fused agg per table over the Right-form metrics, keyed by
    // registration index (metric names may repeat across column sets)
    val fused: Map[Int, Long] = regs.toSeq.zipWithIndex
      .collect { case (Reg(e, Right(c), _), i) => (e.table_name, c, i) }
      .groupBy(_._1)
      .flatMap { case (table, ms) =>
        val aggs = ms.map { case (_, c, i) => c.cast("long").as(s"__m_$i") }
        val row = resolve(table).agg(aggs.head, aggs.tail: _*).head()
        ms.zipWithIndex.map { case ((_, _, i), k) =>
          i -> (if (row.isNullAt(k)) 0L else row.getLong(k))
        }
      }
    regs.toSeq.zipWithIndex.map { case (r, i) =>
      val v = r.metric match {
        case Left(f) => f(resolve(r.entry.table_name))
        case Right(_) => fused(i)
      }
      (r.entry.table_name, r.entry.metric_name, r.entry.expectation_name,
        v, if (r.expect(v)) "PASS" else "FAIL")
    }.toDF("table_name", "metric_name", "expectation_name", "value", "status")
  }
}
