package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The reference's full hand-written data-quality suite re-expressed over the
 * claims detail report: 24 checks in 8 categories with PASS/FAIL/WARNING/INFO
 * statuses and `SAMPLE_FAILURES` JSON payloads
 * (ref: sql/new_rfb_and_total_claimants_active/test_data_quality.sql:13-350,
 * sample payloads :207-211,288-294,313-320; DQ-024 is the custom DMF
 * source-vs-target count check, setup_dmf_data_quality.sql:109-148).
 *
 * Scale design (the reference runs 24 independent SELECTs = 24 table scans;
 * we do not):
 *  - every row-level predicate check and every whole-table statistic shares
 *    ONE aggregation pass over the (persisted) report — a single scan
 *    produces 19 of the 24 result rows via `explode(array(struct...))`;
 *  - a second bounded pass computes the 3-sigma outlier count (needs the
 *    moments from pass one, broadcast as a 1-row frame);
 *  - only the duplicate-group checks (their own groupBy shuffles) and the
 *    referential checks (anti-joins) are separate jobs, as they must be;
 *  - all JSON sample payloads are non-null BIGINTs (rates/averages as exact
 *    centi-scaled integers) so the output is engine-portable — double
 *    formatting and null-field serialization differ across engines;
 *  - `run` is EAGER: it materializes the (<= 24 row) result, releases the
 *    report/metrics caches it took, and returns a local frame — repeated
 *    suite runs in a long-lived session pin nothing.
 */
object DqSuite {

  /** Result schema (ref: test_data_quality.sql:17-26). */
  private val ResultCols =
    Seq("test_id", "status", "failed_rows", "business_impact", "sample_failures")

  def run(report: DataFrame, events: DataFrame,
          periodStart: String, periodEnd: String): DataFrame = {
    val rep = report.persist()

    val cid  = col("Claimant Id")
    val rid  = col("Request Id")
    val rt   = col("Request Type")
    val fdd  = col("First Decision Date")
    val days = col("Working Days To Decision")
    val flag = col("Resolved Within Two Weeks")
    val cv   = col("Clamped Value")
    // MM/DD/YYYY parse-or-null (ref: TRY_TO_DATE, test_data_quality.sql:99)
    val parsedFdd =
      expr("try_to_timestamp(`First Decision Date`, 'MM/dd/yyyy')").cast("date")
    val startD = to_date(lit(periodStart))
    val endD   = to_date(lit(periodEnd))

    // coalesce: a global agg over an EMPTY report returns one row with null
    // sums — checks then report null failed_rows (and to_json drops the
    // payload field on Spark but not on other engines). 0 keeps every check
    // total: predicate checks pass vacuously; DQ-015 is the one that FAILs
    // on an empty report.
    def cnt(pred: Column): Column =
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L))

    // ---- pass 1: one scan, every predicate count + whole-table statistic
    val m = rep.agg(
      count(lit(1)).as("n"),
      cnt(cid.isNull || rid.isNull || rt.isNull || fdd.isNull).as("n001"),
      cnt(days.isNull || flag.isNull).as("n002"),
      cnt(rt === "" || fdd === "").as("n003"),
      cnt(parsedFdd.isNull).as("n006"),
      cnt(expr("try_cast(cast(`Working Days To Decision` as string) as bigint)").isNull ||
        expr("try_cast(cast(`Resolved Within Two Weeks` as string) as bigint)").isNull).as("n007"),
      cnt(days < 0).as("n008"),
      cnt(days > 10).as("n009"),
      cnt(parsedFdd > endD).as("n010"),
      cnt(parsedFdd < startD).as("n011"),
      // consistency: flag is CALENDAR-day-based (<=14) while days counts
      // WORKING days, so the tight cross-metric invariant (any start day) is
      // flag=1 => wd<=11 and flag=0 => wd>=10; both clauses of the
      // reference's symmetric check are kept with those adapted bounds
      // (ref: test_data_quality.sql:128-140)
      cnt((flag === 1 && days > 11) || (flag === 0 && days < 10) ||
        !flag.isin(0, 1)).as("n012"),
      cnt(cv.isNull || cv === 0.0).as("n017"),
      cnt(rt.contains("\\")).as("n018"),
      cnt(rt.isNull || rt === "").as("n019"),
      cnt(parsedFdd < startD || parsedFdd > endD).as("n020"),
      countDistinct(cid).as("cd_claimant"),
      countDistinct(rt).as("cd_rt"),
      // days are integers: BIGINT sums are exact and order-independent;
      // doubles are derived from them with one fixed expression. The squared
      // sum runs on DECIMAL so a pathological overflow surfaces as null (and
      // the oracle errors loudly) instead of wrapping silently.
      sum(days).as("sum_days"),
      sum(days.cast("decimal(19,0)") * days.cast("decimal(19,0)")).as("sum_days2"),
      max(days).as("max_days"),
      sum(flag).as("resolved"),
      coalesce(sum(when(flag === 1, days)), lit(0L)).as("sum_days_c"),
      cnt(flag === 1).as("n_c"),
      coalesce(sum(when(flag === 0, days)), lit(0L)).as("sum_days_nc"),
      cnt(flag === 0).as("n_nc")
    ).persist()

    // ---- pass 2: 3-sigma outlier count against broadcast moments
    // (ref: test_data_quality.sql:282-302 — AVG/STDDEV + filtered count)
    val mean = col("sum_days").cast("double") / col("n")
    val variance = (col("sum_days2").cast("double") -
      col("sum_days").cast("double") * col("sum_days").cast("double") / col("n")) /
      (col("n") - 1)
    val std = when(col("n") > 1, sqrt(variance)).otherwise(lit(0.0))
    val outliers = rep.crossJoin(broadcast(m))
      .agg(cnt(days.cast("double") > mean + std * 3.0).as("n021"))
    val c = m.crossJoin(broadcast(outliers))

    // centi-scaled exact rate/average helpers: floor of a double division —
    // numerators are far below 2^53 so the doubles are exact, and the same
    // IEEE expression on the oracle side yields the identical integer
    def centiDiv(num: Column, den: Column): Column =
      floor(num.cast("double") * 100 / den).cast("long")
    // -1 sentinel on an empty report (n=0) — keeps failed_rows/status/payload
    // non-null so the output stays engine-portable (see DQ-021 note)
    val rateCenti = coalesce(
      floor(col("resolved").cast("double") * 10000 / col("n")).cast("long"),
      lit(-1L))

    def row(id: String, status: Column, failed: Column, impact: Column,
            sample: Column = lit(null).cast("string")): Column =
      struct(lit(id).as("test_id"), status.as("status"),
        failed.cast("long").as("failed_rows"), impact.as("business_impact"),
        sample.as("sample_failures"))
    def pf(n: Column): Column = when(n === 0, "PASS").otherwise("FAIL")
    def pw(n: Column): Column = when(n === 0, "PASS").otherwise("WARNING")

    // 19 of 24 result rows come out of the single-scan metrics row
    val aggRows = c.select(explode(array(
      row("DQ-001", pf(col("n001")), col("n001"),
        lit("Critical business keys must be populated")),
      row("DQ-002", pf(col("n002")), col("n002"),
        lit("Working days and two-week flag must be calculated")),
      row("DQ-003", pf(col("n003")), col("n003"),
        lit("Empty strings should be NULL for consistency")),
      row("DQ-006", pf(col("n006")), col("n006"),
        lit("Dates must be in MM/DD/YYYY format for downstream systems")),
      row("DQ-007", pf(col("n007")), col("n007"),
        lit("Calculated day counts must be valid integers")),
      row("DQ-008", pf(col("n008")), col("n008"),
        lit("Turnaround time cannot be negative - calculation error")),
      row("DQ-009", pw(col("n009")), col("n009"),
        lit("Processing took >10 working days - may be valid but investigate")),
      row("DQ-010", pf(col("n010")), col("n010"),
        lit("Decision dates after period end indicate clock issues")),
      row("DQ-011", pf(col("n011")), col("n011"),
        lit("Decision cannot happen before report period start")),
      row("DQ-012", pf(col("n012")), col("n012"),
        lit("Two-week flag does not match turnaround days")),
      row("DQ-015",
        when(col("n") === 0, "FAIL").when(col("n") < 10, "WARNING").otherwise("PASS"),
        col("n"),
        concat(lit("Report has "), col("n").cast("string"),
          lit(" rows. Expected >10 for typical report period.")),
        to_json(struct(
          col("n").as("total_rows"),
          col("cd_claimant").as("unique_claimants"),
          col("cd_rt").as("unique_request_types")))),
      row("DQ-016", when(col("cd_rt") === 1, "PASS").otherwise("FAIL"),
        col("cd_rt") - 1,
        lit("Report should have a single request type per run")),
      row("DQ-017", pw(col("n017")), col("n017"),
        lit("Measure value missing or zero - impacts analysis")),
      row("DQ-018", pw(col("n018")), col("n018"),
        lit("Request type contains domain prefix - should be stripped")),
      row("DQ-019", pf(col("n019")), col("n019"),
        lit("Request type is required for grouping and analysis")),
      row("DQ-020", pf(col("n020")), col("n020"),
        lit("Decision dates should be within the report period")),
      // payload fields are coalesced to sentinels on an EMPTY report (n=0
      // makes the moments null): Spark's to_json silently drops null struct
      // fields while other engines emit them, so null here would break the
      // engine-portable payload contract
      row("DQ-021", lit("INFO"), col("n021"),
        lit("Records with days > 3 standard deviations from mean - investigate"),
        to_json(struct(
          col("n021").as("outlier_count"),
          coalesce(centiDiv(col("sum_days"), col("n")), lit(-1L)).as("mean_days_centi"),
          floor(std * 100).cast("long").as("stddev_days_centi"),
          coalesce(col("max_days").cast("long"), lit(-1L)).as("max_days"),
          coalesce(floor((mean + std * 3.0) * 100).cast("long"), lit(-1L))
            .as("threshold_centi")))),
      row("DQ-022", when(rateCenti < 5000, "WARNING").otherwise("INFO"),
        lit(10000L) - rateCenti,
        concat(floor(rateCenti / lit(100)).cast("long").cast("string"), lit("."),
          lpad((rateCenti % 100).cast("string"), 2, "0"),
          lit("% resolved within 14 days")),
        to_json(struct(
          col("n").as("total_claims"),
          coalesce(col("resolved"), lit(0L)).as("resolved_within_14_days"),
          rateCenti.as("compliance_rate_centipct"),
          coalesce(centiDiv(col("sum_days"), col("n")), lit(-1L)).as("avg_days_centi_all"),
          coalesce(centiDiv(col("sum_days_c"), when(col("n_c") > 0, col("n_c"))), lit(-1L))
            .as("avg_days_centi_compliant"),
          coalesce(centiDiv(col("sum_days_nc"), when(col("n_nc") > 0, col("n_nc"))), lit(-1L))
            .as("avg_days_centi_non_compliant")))),
      row("DQ-023", lit("INFO"), col("cd_rt"),
        lit("Distribution of request types - verify expected patterns"))
    )).as("r")).select("r.*")

    // duplicate-group checks — their own (small, post-report) shuffles
    // (ref: test_data_quality.sql:55-86)
    def groupCheck(id: String, offending: DataFrame, impact: String): DataFrame =
      offending.agg(count(lit(1)).as("failed_rows")).select(
        lit(id).as("test_id"), pf(col("failed_rows")).as("status"),
        col("failed_rows"), lit(impact).as("business_impact"),
        lit(null).cast("string").as("sample_failures"))

    val dq004 = groupCheck("DQ-004",
      rep.groupBy(cid, rid, fdd).agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1),
      "Same claimant should not appear twice with same dates - data multiplication")
    val dq005 = groupCheck("DQ-005",
      rep.groupBy(cid).agg(count(lit(1)).as("cnt")).filter(col("cnt") > 10),
      "Claimant appears >10 times - severe data multiplication issue")

    // referential integrity — anti-joins against the source
    // (ref: test_data_quality.sql:167-191)
    val srcUsers = events.select(col("user_id")).distinct()
    val dq013 = groupCheck("DQ-013",
      rep.join(srcUsers, cid === col("user_id"), "left_anti"),
      "Claimants in report do not exist in source event table")
    val srcTypes = events.select(col("event_type")).distinct()
    val dq014 = groupCheck("DQ-014",
      rep.join(srcTypes, rt === col("event_type"), "left_anti"),
      "Request types do not match source lookup values")

    // DQ-024 — custom DMF: |source count - target count|
    // (ref: setup_dmf_data_quality.sql:109-148)
    val src = events.filter(col("ts") <= lit(periodEnd).cast("timestamp"))
      .agg(countDistinct(col("user_id")).as("src_n"))
    val tgt = rep.agg(count(lit(1)).as("tgt_n"))
    val dq024 = src.crossJoin(tgt).select(
      lit("DQ-024").as("test_id"),
      when(abs(col("src_n") - col("tgt_n")) === 0, "PASS").otherwise("FAIL").as("status"),
      abs(col("src_n") - col("tgt_n")).cast("long").as("failed_rows"),
      lit("Source count must match target count: 0 = match, >0 = mismatch").as("business_impact"),
      lit(null).cast("string").as("sample_failures"))

    val out = aggRows.select(ResultCols.map(col): _*)
      .unionByName(dq004).unionByName(dq005)
      .unionByName(dq013).unionByName(dq014).unionByName(dq024)
      .orderBy("test_id")

    // Materialize while rep/m are cached, then RELEASE both — a suite run
    // must not leave pinned partitions behind in a long-lived session. The
    // result is structurally <= 24 rows at any input scale, so the local
    // copy is bounded (same justification as Upsert's counts collect).
    val resultRows = out.collect()
    rep.unpersist()
    m.unpersist()
    val spark = report.sparkSession
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(resultRows.toSeq.asJava, out.schema)
  }
}
