package graft.dq

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.meta.{DmfResultRow, MetaStore}

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
 *    the pass/fail criterion per metric. The `EXPECT VALUE <op> <n>` string
 *    is parsed at registration and IS the predicate — prose and check
 *    cannot drift;
 *  - STEP 5 `DATA_METRIC_FUNCTION_REFERENCES(...)` — per-DMF schedule
 *    status with last/next execution times (`references`, ref :153-166);
 *  - STEP 6 `DATA_METRIC_FUNCTION_RESULTS(...) ORDER BY timestamp DESC
 *    LIMIT 10` — the results history (`evaluateAndLog` persists each run
 *    through [[graft.meta.MetaStore]]; `MetaStore.dmfResultHistory` is the
 *    trend query, ref :174-190).
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

// top-level (not nested in the catalog class): a nested case class's
// pattern matches carry an outer-instance test scalac cannot check at
// run time and warns about under -deprecation
private[dq] final case class Reg(
    entry: DmfEntry,
    metric: Either[DataFrame => Long, Column], // Left opaque, Right fusable
    expect: Long => Boolean)

final class DmfCatalog(spark: SparkSession, meta: Option[MetaStore] = None) {
  import spark.implicits._

  private val schedules = mutable.LinkedHashMap.empty[String, String]
  private val regs = mutable.ArrayBuffer.empty[Reg]
  // suspension key: (table, metric, columns) where columns None = NAME-level
  // (every association of the name) and Some(joined) = one association —
  // the reference's `MODIFY DATA METRIC FUNCTION <name> ON (cols)` grain.
  // Seeded from the metastore's suspension event log when one is attached,
  // so suspension survives a session restart the way the reference's
  // catalog-resident schedule state does (setup_dmf_data_quality.sql:153-166);
  // without a metastore the state is session-only.
  private val suspendedKeys: mutable.Set[(String, String, Option[String])] =
    mutable.Set.empty ++ meta.map(_.activeDmfSuspensions).getOrElse(Set.empty)

  // association identity is the column SET: order- and case-insensitive,
  // matching the reference's MODIFY ... ON (cols) addressing
  private def colKey(columns: Seq[String]): Option[String] =
    Some(columns.map(_.toLowerCase).sorted.mkString(","))

  /** STEP 1 — set (or change) an object's metric schedule. Changing it
    * re-schedules every DMF already attached to the object, exactly like
    * the reference's shared per-object DATA_METRIC_SCHEDULE. */
  def setSchedule(table: String, cron: String): Unit =
    schedules(table) = cron

  /** Suspend a metric's schedule on an object — the analogue of
    * `ALTER ... MODIFY DATA METRIC FUNCTION <name> ON (...) SUSPEND`.
    * Suspended checks are NOT evaluated (they surface as status SKIPPED
    * and don't join the fused scan), and `references` reports
    * schedule_status SUSPENDED with a null next_execution_time. This form
    * applies to EVERY association of the metric name on the table; the
    * three-argument overload suspends one column-set association. */
  def suspend(table: String, metricName: String): Unit =
    suspendImpl(table, metricName, None)

  /** Suspend one association — the metric name on exactly this column set
    * (the reference's per-association grain). Other associations of the
    * same name keep evaluating. */
  def suspend(table: String, metricName: String, columns: Seq[String]): Unit =
    suspendImpl(table, metricName, colKey(columns))

  private def suspendImpl(
      table: String, metricName: String, key: Option[String]): Unit = {
    requireAttached(table, metricName, key)
    suspendedKeys += ((table, metricName, key))
    meta.foreach(_.appendDmfSuspension(table, metricName, key, suspended = true))
  }

  /** Resume a suspended metric (`... RESUME`); no-op if already started.
    * The name-level form lifts every suspension of the name (column-level
    * ones included). */
  def resume(table: String, metricName: String): Unit = {
    requireAttached(table, metricName, None)
    suspendedKeys.filterInPlace { case (t, m, _) => t != table || m != metricName }
    meta.foreach(_.appendDmfSuspension(table, metricName, None, suspended = false))
  }

  /** Resume one column-set association. Lifts only the column-level
    * suspension: a name-level suspension, if present, still applies. */
  def resume(table: String, metricName: String, columns: Seq[String]): Unit = {
    requireAttached(table, metricName, colKey(columns))
    suspendedKeys -= ((table, metricName, colKey(columns)))
    meta.foreach(_.appendDmfSuspension(table, metricName, colKey(columns), suspended = false))
  }

  private def requireAttached(
      table: String, metricName: String, key: Option[String]): Unit =
    require(regs.exists(r =>
        r.entry.table_name == table && r.entry.metric_name == metricName &&
          key.forall(_ == colKey(r.entry.metric_columns).get)),
      key match {
        case Some(k) => s"no DMF '$metricName' on columns ($k) attached to '$table'"
        case None => s"no DMF '$metricName' attached to '$table'"
      })

  private def isSuspended(e: DmfEntry): Boolean =
    suspendedKeys((e.table_name, e.metric_name, None)) ||
      suspendedKeys((e.table_name, e.metric_name, colKey(e.metric_columns)))

  private def register(
      table: String, metricName: String, columns: Seq[String],
      metric: Either[DataFrame => Long, Column],
      expectationName: String, expectationExpr: String,
      comment: String): Unit = {
    require(schedules.contains(table),
      s"set a DATA_METRIC_SCHEDULE on '$table' before adding DMFs")
    regs += Reg(
      DmfEntry(table, metricName, columns, schedules(table),
        expectationName, expectationExpr, comment),
      metric, Expectation.parse(expectationExpr))
  }

  /** STEP 3 + 4 — attach an opaque metric function with its expectation
    * (`VALUE <op> <n>`, parsed — see [[Expectation]]). Fails if the object
    * has no schedule yet (the reference enforces the same ordering). Prefer
    * `addColumnMetric` when the metric is a single aggregate — those fuse
    * into one scan per table. */
  def addMetric(
      table: String, metricName: String, columns: Seq[String],
      metric: DataFrame => Long,
      expectationName: String, expectationExpr: String,
      comment: String = ""): Unit =
    register(table, metricName, columns, Left(metric),
      expectationName, expectationExpr, comment)

  /** STEP 3 + 4 with a fusable aggregate-Column metric (e.g.
    * `count(when(col("k").isNull, 1))`): all column metrics on one table
    * evaluate in a single aggregation pass. */
  def addColumnMetric(
      table: String, metricName: String, columns: Seq[String],
      metric: Column,
      expectationName: String, expectationExpr: String,
      comment: String = ""): Unit =
    register(table, metricName, columns, Right(metric),
      expectationName, expectationExpr, comment)

  /** The catalog as a DataFrame — schedule_cron reflects the object's
    * CURRENT schedule, so a later setSchedule shows through. */
  def catalog: DataFrame =
    regs.toSeq.map(r => r.entry.copy(schedule_cron = schedules(r.entry.table_name)))
      .toDS().toDF()

  /** Evaluate every registered DMF + expectation; `resolve` maps a catalog
    * table name to its DataFrame. Column metrics fuse into ONE aggregate
    * scan per table; opaque metrics run one job each. Only the (≤ #checks)
    * scalar results land on the driver; registration order is preserved.
    *
    * A NULL fused aggregate (max/avg-style metric over an empty table) is
    * NOT coerced to 0 — it surfaces as a null `value` with status ERROR, so
    * an empty upstream cannot masquerade as `VALUE = 0` passing. */
  def evaluate(resolve: String => DataFrame): DataFrame =
    evaluated(resolve).toDF(
      "table_name", "metric_name", "expectation_name", "value", "status")

  private def evaluated(resolve: String => DataFrame)
      : Seq[(String, String, String, Option[Long], String)] = {
    // one fused agg per table over the Right-form metrics, keyed by
    // registration index (metric names may repeat across column sets).
    // Suspended metrics don't enter the fused scan at all — skipping a
    // check must also skip its evaluation cost.
    val fused: Map[Int, Option[Long]] = regs.toSeq.zipWithIndex
      .collect { case (Reg(e, Right(c), _), i) if !isSuspended(e) =>
        (e.table_name, c, i) }
      .groupBy(_._1)
      .flatMap { case (table, ms) =>
        val aggs = ms.map { case (_, c, i) => c.cast("long").as(s"__m_$i") }
        val row = resolve(table).agg(aggs.head, aggs.tail: _*).head()
        ms.zipWithIndex.map { case ((_, _, i), k) =>
          i -> (if (row.isNullAt(k)) None else Some(row.getLong(k)))
        }
      }
    regs.toSeq.zipWithIndex.map { case (r, i) =>
      if (isSuspended(r.entry))
        (r.entry.table_name, r.entry.metric_name, r.entry.expectation_name,
          Option.empty[Long], "SKIPPED")
      else {
        val v = r.metric match {
          case Left(f) => Some(f(resolve(r.entry.table_name)))
          case Right(_) => fused(i)
        }
        val status = v match {
          case Some(x) => if (r.expect(x)) "PASS" else "FAIL"
          case None => "ERROR" // metric produced no value — not a PASS
        }
        (r.entry.table_name, r.entry.metric_name, r.entry.expectation_name,
          v, status)
      }
    }
  }

  /** Evaluate and persist this run to the metastore's DMF results log —
    * the write side of the reference's DATA_METRIC_FUNCTION_RESULTS table
    * (setup_dmf_data_quality.sql:174-190). `runTs` defaults to now; tests
    * pass explicit timestamps for determinism. Returns the run's results. */
  def evaluateAndLog(
      resolve: String => DataFrame,
      meta: MetaStore,
      runTs: java.sql.Timestamp =
        new java.sql.Timestamp(System.currentTimeMillis())): DataFrame = {
    val rows = evaluated(resolve)
    meta.appendDmfResults(rows.map { case (t, m, e, v, s) =>
      DmfResultRow(runTs, t, m, e, v, s)
    })
    rows.toDF("table_name", "metric_name", "expectation_name", "value", "status")
  }

  /** STEP 5 — the DATA_METRIC_FUNCTION_REFERENCES view
    * (setup_dmf_data_quality.sql:153-166): the catalog plus the REAL
    * per-association schedule status (STARTED, or SUSPENDED after
    * [[suspend]]) and last/next execution times derived from the persisted
    * results log. `next_execution_time` comes from parsing the object's
    * cron schedule forward from the later of last-execution and `now`;
    * suspended associations have no next execution (null), matching a
    * paused schedule. */
  def references(
      meta: MetaStore,
      now: java.sql.Timestamp =
        new java.sql.Timestamp(System.currentTimeMillis())): DataFrame = {
    import org.apache.spark.sql.functions.max
    // last execution per metric key: bounded by the distinct
    // (table, metric, expectation) triples ever evaluated — catalog-sized
    // by construction, so collecting it lets the schedule arithmetic run
    // as a plain driver-side function instead of a UDF (the registry
    // itself already lives on the driver)
    val last = meta.dmfResults
      .groupBy("table_name", "metric_name", "expectation_name")
      .agg(max("run_ts").as("last_execution_time"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getTimestamp(3)).toMap
    regs.toSeq.map { r =>
      val e = r.entry.copy(schedule_cron = schedules(r.entry.table_name))
      val started = !isSuspended(e)
      val lastTs = last.get((e.table_name, e.metric_name, e.expectation_name))
        .filter(_ != null)
      val nextTs =
        if (started)
          Option(CronSchedule.next(e.schedule_cron,
            lastTs.filter(_.after(now)).getOrElse(now)))
        else None // a suspended schedule has no next firing
      (e.table_name, e.metric_name, e.metric_columns, e.schedule_cron,
        e.expectation_name, e.expectation_expr, e.comment,
        if (started) "STARTED" else "SUSPENDED", lastTs, nextTs)
    }.toDF("table_name", "metric_name", "metric_columns", "schedule_cron",
      "expectation_name", "expectation_expr", "comment", "schedule_status",
      "last_execution_time", "next_execution_time")
  }
}

/**
 * Minimal schedule arithmetic for the two schedule forms the reference
 * uses (setup_dmf_data_quality.sql:44-56): `USING CRON <m> <h[,h...]> * * *
 * [TZ]` (daily at fixed hours, e.g. `USING CRON 0 8,14,20 * * * UTC`) and
 * `<n> MINUTE` intervals. Day-of-month/month/weekday restrictions are out
 * of scope — the reference never sets them.
 */
object CronSchedule {
  private val Cron =
    """(?i)\s*USING\s+CRON\s+(\d+)\s+([\d,*]+)\s+\*\s+\*\s+\*\s*(\S*)\s*""".r
  private val Interval = """(?i)\s*(\d+)\s+MINUTE\s*""".r

  /** Next firing strictly after `after`, or null for an unparseable
    * schedule (surfaces as a null next_execution_time, not a crash). */
  def next(schedule: String, after: java.sql.Timestamp): java.sql.Timestamp =
    schedule match {
      case Interval(n) =>
        new java.sql.Timestamp(after.getTime + n.toLong * 60000L)
      case Cron(minute, hours, tzTok) =>
        // honor the trailing timezone token: 'USING CRON 0 8 * * *
        // America/New_York' means 8 AM Eastern, hours off from UTC. An
        // unknown zone id is unparseable → null (TimeZone.getTimeZone's
        // silent GMT fallback would be a wrong answer, so go via ZoneId).
        val tz: java.util.TimeZone =
          if (tzTok.isEmpty) java.util.TimeZone.getTimeZone("UTC")
          else
            try java.util.TimeZone.getTimeZone(java.time.ZoneId.of(tzTok))
            catch { case _: java.time.DateTimeException => null }
        if (tz == null) return null
        val m = minute.toInt
        val hs: Seq[Int] =
          if (hours == "*") 0 to 23
          else hours.split(",").toSeq.map(_.toInt).sorted
        val cal = java.util.Calendar.getInstance(tz)
        cal.setTimeInMillis(after.getTime)
        cal.set(java.util.Calendar.SECOND, 0)
        cal.set(java.util.Calendar.MILLISECOND, 0)
        val curH = cal.get(java.util.Calendar.HOUR_OF_DAY)
        val curM = cal.get(java.util.Calendar.MINUTE)
        hs.find(h => h > curH || (h == curH && m > curM)) match {
          case Some(h) =>
            cal.set(java.util.Calendar.HOUR_OF_DAY, h)
            cal.set(java.util.Calendar.MINUTE, m)
          case None => // first slot tomorrow
            cal.add(java.util.Calendar.DAY_OF_MONTH, 1)
            cal.set(java.util.Calendar.HOUR_OF_DAY, hs.head)
            cal.set(java.util.Calendar.MINUTE, m)
        }
        new java.sql.Timestamp(cal.getTimeInMillis)
      case _ => null
    }
}
