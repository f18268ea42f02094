package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{GraftConnection, SqlTemplate}

/**
 * Executes the reference's LARGEST hand-written SQL artifact — the 24-check
 * data-quality suite `test_data_quality.sql` (DQ-001..DQ-023 + summary,
 * ref: sql/new_rfb_and_total_claimants_active/test_data_quality.sql:10-350)
 * — VERBATIM through `SqlTemplate` + the dialect shim + `GraftConnection`,
 * and asserts each runnable check's (STATUS, FAILED_ROWS) equals the native
 * `DqSuite` row for the same logical data.
 *
 * The fixture is ONE logical claims dataset presented twice: in the native
 * claims-report schema for `DqSuite.run`, and in the reference report's
 * schema (`"Policy Number"`, `DAYS`, ...) for the asset. Column mapping and
 * value design make every check pair measure the same underlying rows,
 * including where the native suite adapted thresholds (calendar-day 14/730
 * vs working-day 11/10: the "slow" rows use 800 days and the "inconsistent"
 * rows sit outside both boundary zones, so both formulations flag the same
 * set — see the row comments).
 *
 * Exercises per statement: `SET` session-variable assignment (:10),
 * IDENTIFIER($report_table) scans, double-quoted identifiers, TRY_TO_DATE
 * with 'MM/DD/YYYY' source-dialect format tokens (:99), `$REPORT_START_DT`
 * inside a string literal that must NOT substitute (:252), LIKE '%\\%' with
 * the source dialect's no-escape semantics (:231), OBJECT_CONSTRUCT
 * payloads (:207,:288), `||` string-number concatenation, correlated NOT
 * EXISTS against `{{SOURCE_DATABASE}}`-rendered tables (:167-191).
 *
 * DQ-021 (:282-302) references `AVG(DAYS) OVER ()` inside an aggregate
 * FILTER — runnable NOWHERE as written (Spark rejects it with
 * INVALID_AGGREGATE_FILTER, and the source warehouse has no aggregate
 * FILTER clause at all). The dialect's window-in-filter hoist
 * (SqlDialect.rewriteWindowInAggFilter) rewrites it to the two-pass
 * 3-sigma form DqSuite computes natively (q07/q54, oracle-checked), so
 * since round 19 all 23 checks run and compare. DQ-022 also uses FILTER —
 * valid in Spark, so it runs despite being unrunnable at the source.
 * DQ-024 is not in this asset (it is the DMF count check from
 * setup_dmf_data_quality.sql, which DialectSpec runs verbatim); the native
 * suite's extra DQ-024 row is excluded from the comparison.
 */
/** One logical row of the fixture corpus (native claims-report shape) —
  * top-level so Spark can derive an Encoder. */
private[graft] case class DqVerbatimRow(
    cid: Option[String], rt: String, fdd: Option[String],
    days: Option[Long], flag: Option[Long], cv: Option[Double])

class DqVerbatimSpec extends AnyFunSuite with SparkSpec {
  import graft.{DqVerbatimRow => NR}

  private val RefFile =
    "/root/reference/sql/new_rfb_and_total_claimants_active/test_data_quality.sql"
  private val PeriodStart = "2024-01-01"
  private val PeriodEnd = "2024-01-20"

  private def fixtureRows: Seq[NR] = {
    val clean = (1 to 13).map(i => NR(Some(f"R$i%02d"), "TYPE_A",
      Some("01/10/2024"), Some(7L), Some(1L), Some(2.5)))
    val designed = Seq(
      // DQ-001: null key (also null PN on the reference side)
      NR(None, "TYPE_A", Some("01/10/2024"), Some(7L), Some(1L), Some(2.5)),
      // DQ-002 + DQ-007: null calculated fields
      NR(Some("R17"), "TYPE_A", Some("01/10/2024"), None, None, Some(2.5)),
      // DQ-003 + DQ-019 (+1 DQ-014 orphan type, +1 DQ-016 group): empty type
      NR(Some("R18"), "", Some("01/10/2024"), Some(7L), Some(1L), Some(2.5)),
      // DQ-006: unparseable date (both presentations fail TRY_TO_DATE)
      NR(Some("R19"), "TYPE_A", Some("garbage"), Some(7L), Some(1L), Some(2.5)),
      // DQ-001 + DQ-006: null date
      NR(Some("R20"), "TYPE_A", None, Some(7L), Some(1L), Some(2.5)),
      // DQ-008: negative days (flag=1 keeps it out of both DQ-012 forms)
      NR(Some("R21"), "TYPE_A", Some("01/10/2024"), Some(-2L), Some(1L), Some(2.5)),
      // DQ-009 only: 800 > both the 730-calendar and 10-working thresholds,
      // and flag=0 with days>=14 satisfies both DQ-012 formulations
      NR(Some("R22"), "TYPE_A", Some("01/10/2024"), Some(800L), Some(0L), Some(2.5)),
      // DQ-009 + DQ-012: flag=1 with days past both inconsistency bounds
      NR(Some("R23"), "TYPE_A", Some("01/10/2024"), Some(800L), Some(1L), Some(2.5)),
      // DQ-012 only: flag=0 with days below both bounds (5 < 10 and < 14)
      NR(Some("R24"), "TYPE_A", Some("01/10/2024"), Some(5L), Some(0L), Some(2.5)),
      // DQ-010 + DQ-020: year-2124 decision is after the period end AND
      // after CURRENT_DATE() (the reference's formulation) for the next century
      NR(Some("R25"), "TYPE_A", Some("01/15/2124"), Some(7L), Some(1L), Some(2.5)),
      // DQ-011 + DQ-020: decision before period start; the derived
      // Statistical Start Date flips to parsed+1 day, so the reference's
      // start>decision form flags exactly this row too
      NR(Some("R26"), "TYPE_A", Some("12/15/2023"), Some(7L), Some(1L), Some(2.5)),
      // DQ-017: zero measure (null Residence State on the reference side)
      NR(Some("R27"), "TYPE_A", Some("01/10/2024"), Some(7L), Some(1L), Some(0.0)),
      // DQ-018: domain-prefixed value (backslash)
      NR(Some("R28"), "DOM\\user", Some("01/10/2024"), Some(7L), Some(1L), Some(2.5)),
      // DQ-013: orphan key (absent from the source/events side)
      NR(Some("CX99"), "TYPE_A", Some("01/10/2024"), Some(7L), Some(1L), Some(2.5)),
      // DQ-004: exact duplicate pair (same key, same dates)
      NR(Some("RD0"), "TYPE_A", Some("01/10/2024"), Some(7L), Some(1L), Some(2.5)),
      NR(Some("RD0"), "TYPE_A", Some("01/10/2024"), Some(7L), Some(1L), Some(2.5)))
    // DQ-005: one key with 11 rows (distinct dates keep DQ-004 at one group)
    val many = (1 to 11).map(i => NR(Some("RMANY"), "TYPE_A",
      Some(f"01/$i%02d/2024"), Some(7L), Some(1L), Some(2.5)))
    // 13 + 16 + 11 = 40 rows: 10000 % 40 == 0, so the compliance rate is
    // exact in centi-percent and the reference's ROUND equals the native
    // suite's floor (DQ-022 compare)
    clean ++ designed ++ many
  }

  /** The fixture in the native claims-report schema (DqSuite input).
    * Request Id mirrors Request Type so the reference's "Status" column
    * (mapped to Request Id) has the distinct-count DQ-023 expects. */
  private def nativeReport: DataFrame = {
    import spark.implicits._
    fixtureRows.toDF("cid", "rt", "fdd", "days", "flag", "cv").select(
      col("cid").as("Claimant Id"),
      col("rt").as("Request Id"),
      col("rt").as("Request Type"),
      col("fdd").as("First Decision Date"),
      col("days").as("Working Days To Decision"),
      col("flag").as("Resolved Within Two Weeks"),
      col("cv").as("Clamped Value"))
  }

  /** The same data in the REFERENCE report's schema (test_data_quality.sql
    * targets new_rfb_and_total_claimants_active_detail). Derivations keep
    * each check pair counting the same rows — see the class doc. */
  private def referenceReport: DataFrame = {
    val parsed = expr("try_to_date(`First Decision Date`, 'MM/dd/yyyy')")
    nativeReport.select(
      col("Claimant Id").as("Policy Number"),
      col("Request Id").as("Status"),
      col("First Decision Date").as("EDB Decision Date"),
      // normally decision - 5 days; when the decision predates the period
      // it flips to decision + 1 day so the reference's "start after
      // decision" check (DQ-011) flags exactly the rows the native suite's
      // "decision before period start" check flags
      // coalesce: an unparseable decision date must stay NON-null here (it
      // is a DQ-006 format failure, not a DQ-001 missing-field failure)
      coalesce(
        when(parsed < to_date(lit(PeriodStart)),
            date_format(date_add(parsed, 1), "MM/dd/yyyy"))
          .otherwise(date_format(date_sub(parsed, 5), "MM/dd/yyyy")),
        col("First Decision Date"))
        .as("Statistical Start Date"),
      col("Request Type").as("carrier_name"),
      col("Working Days To Decision").as("DAYS"),
      col("Resolved Within Two Weeks").as("NumDaysResolvedWithinTwoWeeks"),
      col("Request Type").as("Insurance Group"),
      when(col("Clamped Value").isNull || col("Clamped Value") === 0.0, lit(null))
        .otherwise(lit("CA")).cast("string").as("Residence State"),
      lit("NY").as("Issue State"),
      col("Request Type").as("Modified By"),
      col("Request Type").as("status_cd"))
  }

  /** Source-system side: every non-orphan key exists; '' stays an orphan
    * request type (TYPE_A and DOM\user are both legitimate). */
  private def eventsFixture: DataFrame =
    nativeReport
      .filter(col("Claimant Id").isNotNull && col("Claimant Id") =!= "CX99")
      .select(col("Claimant Id").as("user_id"),
        when(col("Request Type") === "", "TYPE_A").otherwise(col("Request Type"))
          .as("event_type"),
        lit("2024-01-10 00:00:00").cast("timestamp").as("ts"))

  test("the reference's 24-check DQ suite asset runs verbatim and matches DqSuite") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(RefFile)), java.nio.charset.StandardCharsets.UTF_8)

    // stage the three tables the rendered asset reads
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_dqv")
    spark.sql("CREATE DATABASE IF NOT EXISTS dbo")
    referenceReport.write.mode("overwrite")
      .saveAsTable("graft_dqv.new_rfb_and_total_claimants_active_detail")
    eventsFixture.select(col("user_id").as("policy_no")).distinct()
      .write.mode("overwrite").saveAsTable("dbo.policy")
    eventsFixture.select(col("event_type").as("eb_status_cd")).distinct()
      .write.mode("overwrite").saveAsTable("dbo.eb_status")

    // native outcome for the SAME logical data
    val native = graft.dq.DqSuite.run(nativeReport, eventsFixture,
      PeriodStart, PeriodEnd)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2))).toMap

    // render {{placeholders}} only (dialect + $vars happen per-statement in
    // GraftConnection.sql, exactly the reference connector's layering)
    val rendered = SqlTemplate.render(text,
      placeholders = Map(
        "TARGET_DATABASE" -> "spark_catalog", "TARGET_SCHEMA" -> "graft_dqv",
        "SOURCE_DATABASE" -> "spark_catalog"),
      dialect = false)
    val stmts = GraftConnection.splitStatements(rendered)
    assert(stmts.size == 25, s"asset shape: SET + 23 checks + summary, got ${stmts.size}")

    val conn = new GraftConnection(spark)
    conn.sessionVars.setString("REPORT_START_DT", PeriodStart)
    conn.sessionVars.setString("REPORT_END_DT", PeriodEnd)

    val got = scala.collection.mutable.LinkedHashMap.empty[String, (String, Long)]
    stmts.foreach { stmt =>
      // DQ-021 (window inside an aggregate FILTER — unrunnable AS WRITTEN
      // on Spark and on the source warehouse alike) now runs through the
      // dialect's two-pass hoist (SqlDialect.rewriteWindowInAggFilter),
      // closing the asset's last verbatim gap: 23/23 checks execute
      val rows = conn.sql(stmt).collect()
      assert(rows.length == 1, s"each statement yields one row: $stmt")
      val r = rows.head
      val first = String.valueOf(r.get(0))
      if (first.startsWith("DQ-")) {
        val id = first.takeWhile(_ != ':')
        val failed = r.get(2) match {
          case l: Long => l
          case i: Int => i.toLong
          // DQ-022 reports ROUND(100 - rate, 2) percent — the native
          // suite's centi-percent scale, divided by 100
          case d: java.math.BigDecimal => math.round(d.doubleValue() * 100)
          case d: Double => math.round(d * 100)
          case other => fail(s"unexpected FAILED_ROWS type: $other")
        }
        got(id) = (r.getString(1), failed)
      }
    }

    // every check produced a row, and each matches the native suite
    val expectedIds = (1 to 23).map(i => f"DQ-$i%03d")
    assert(got.keySet == expectedIds.toSet)
    expectedIds.foreach { id =>
      assert(native.contains(id), s"native suite missing $id")
      assert(got(id) == native(id),
        s"$id: verbatim ${got(id)} != native ${native(id)}")
    }

    // the comparison is not vacuous: the designed rows trip real failures
    assert(got("DQ-001") == ("FAIL", 2L))
    assert(got("DQ-004") == ("FAIL", 1L))
    assert(got("DQ-005") == ("FAIL", 1L))
    assert(got("DQ-009") == ("WARNING", 2L))
    assert(got("DQ-012") == ("FAIL", 2L))
    assert(got("DQ-013") == ("FAIL", 2L))
    assert(got("DQ-015") == ("PASS", 40L))
    assert(got("DQ-016") == ("FAIL", 2L))
    assert(got("DQ-018") == ("WARNING", 1L))
    assert(got("DQ-020") == ("FAIL", 2L))
    // DQ-021 via the dialect hoist: the two DQ-009 slow-processing rows
    // are exactly the ones beyond mean + 3σ (the -2 low outlier is below,
    // not above) — and the value must equal DqSuite's two-pass native form
    assert(got("DQ-021") == ("INFO", 2L))
    assert(got("DQ-022") == ("INFO", 750L)) // 92.5% compliance, exact

    // the message literal embedding $REPORT_START_DT survived un-substituted
    val dq020 = stmts.find(_.contains("'DQ-020")).get
    val impact = conn.sql(dq020).collect().head.getString(3)
    assert(impact.contains("[$REPORT_START_DT to $REPORT_END_DT]"))

    Seq("graft_dqv.new_rfb_and_total_claimants_active_detail",
      "dbo.policy", "dbo.eb_status").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
