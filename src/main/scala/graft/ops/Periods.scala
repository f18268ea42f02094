package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Report-period generation — Spark-native re-expression of the reference's
 * `generate_monthly_periods` stored procedure (WHILE loop + idempotent
 * INSERT, ref: sql/new_rfb_and_total_claimants_active/report_period_config.sql:39-91)
 * and the six-frequency period view (ref: report_period_config.sql:149-188).
 *
 * Conventions preserved exactly (ref: report_period_config.sql:7-8):
 * period start = 00:00:00.000, period end = 23:59:59.997 of the last day.
 *
 * Generation is `spark.range`-based (distributed, no driver loop) even though
 * period tables are tiny — the same pattern generates a billion-row date
 * dimension unchanged.
 */
object Periods {

  /** End-of-day with the reference's 23:59:59.997 convention — single source
    * of truth lives in functions.Dates. */
  def endOfDay(d: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.Dates.endOfDay997(d)

  /**
   * Monthly periods covering [startYear, endYear], one row per month:
   * frequency, report_start_date, report_end_date, as_of_run_dt, carrier_name.
   */
  def monthlyPeriods(spark: SparkSession, startYear: Int, endYear: Int,
                     carrier: String): DataFrame = {
    val nMonths = (endYear - startYear + 1) * 12
    val base = to_date(lit(f"$startYear%04d-01-01"))
    spark.range(0, nMonths)
      .withColumn("month_start", add_months(base, col("id").cast("int")))
      .select(
        lit("MONTHLY").as("frequency"),
        col("month_start").cast("timestamp").as("report_start_date"),
        endOfDay(last_day(col("month_start"))).as("report_end_date"),
        last_day(col("month_start")).as("as_of_run_dt"),
        lit(carrier).as("carrier_name"))
  }

  /**
   * The six-frequency period set for a given run date
   * (ref: report_period_config.sql:149-188): DAILY / WEEKLY / MONTHLY /
   * QUARTERLY / SEMI_ANNUAL / YEARLY, each as the period containing `runDate`.
   */
  def periodsFor(spark: SparkSession, runDate: String): DataFrame = {
    import spark.implicits._
    val d = Seq(runDate).toDF("run_dt").select(to_date($"run_dt").as("run_dt"))
    val daily = d.select(lit("DAILY").as("frequency"),
      $"run_dt".cast("timestamp").as("report_start_date"),
      endOfDay($"run_dt").as("report_end_date"))
    val weekly = d.select(lit("WEEKLY").as("frequency"),
      date_trunc("week", $"run_dt").as("report_start_date"),
      endOfDay(date_add(date_trunc("week", $"run_dt"), 6)).as("report_end_date"))
    val monthly = d.select(lit("MONTHLY").as("frequency"),
      date_trunc("month", $"run_dt").as("report_start_date"),
      endOfDay(last_day($"run_dt")).as("report_end_date"))
    val quarterly = d.select(lit("QUARTERLY").as("frequency"),
      date_trunc("quarter", $"run_dt").as("report_start_date"),
      endOfDay(last_day(add_months(date_trunc("quarter", $"run_dt"), 2))).as("report_end_date"))
    val semi = d.select(lit("SEMI_ANNUAL").as("frequency"),
      when(month($"run_dt") <= 6, date_trunc("year", $"run_dt"))
        .otherwise(add_months(date_trunc("year", $"run_dt"), 6)).as("report_start_date"),
      endOfDay(when(month($"run_dt") <= 6,
          last_day(add_months(date_trunc("year", $"run_dt"), 5)))
        .otherwise(last_day(add_months(date_trunc("year", $"run_dt"), 11))))
        .as("report_end_date"))
    val yearly = d.select(lit("YEARLY").as("frequency"),
      date_trunc("year", $"run_dt").as("report_start_date"),
      endOfDay(last_day(add_months(date_trunc("year", $"run_dt"), 11))).as("report_end_date"))
    daily.unionByName(weekly).unionByName(monthly)
      .unionByName(quarterly).unionByName(semi).unionByName(yearly)
  }

  /**
   * The six-frequency LAST-COMPLETED-period set for a run date — the exact
   * semantics of the reference's `report_period_all_frequencies` view
   * (ref: report_period_config.sql:149-188): for each frequency, the most
   * recently completed period strictly before the one containing `runDate`
   * (DAILY = yesterday … YEARLY = last calendar year; SEMI_ANNUAL = Jul–Dec
   * of last year when `runDate` is in Jan–Jun, else Jan–Jun of this year),
   * with the view's full column set: `as_of_run_dt = runDate` and a null
   * `carrier_name`. [[periodsFor]] is the containing-period variant (q41);
   * this is the view's "report on the period that just closed" shape (q67).
   */
  def lastPeriodsFor(spark: SparkSession, runDate: String): DataFrame = {
    import spark.implicits._
    val d = Seq(runDate).toDF("run_dt").select(to_date($"run_dt").as("run_dt"))
    def period(freq: String, start: org.apache.spark.sql.Column,
               lastDay: org.apache.spark.sql.Column): DataFrame =
      d.select(lit(freq).as("frequency"),
        start.cast("timestamp").as("report_start_date"),
        endOfDay(lastDay).as("report_end_date"),
        $"run_dt".as("as_of_run_dt"),
        lit(null).cast("string").as("carrier_name"))
    val weekStart = date_trunc("week", $"run_dt").cast("date")
    val monthStart = date_trunc("month", $"run_dt").cast("date")
    val quarterStart = date_trunc("quarter", $"run_dt").cast("date")
    val y = year($"run_dt")
    period("DAILY", date_sub($"run_dt", 1), date_sub($"run_dt", 1))
      .unionByName(period("WEEKLY", date_sub(weekStart, 7), date_sub(weekStart, 1)))
      .unionByName(period("MONTHLY",
        add_months(monthStart, -1), last_day(add_months(monthStart, -1))))
      .unionByName(period("QUARTERLY",
        add_months(quarterStart, -3), last_day(add_months(quarterStart, -1))))
      .unionByName(period("SEMI_ANNUAL",
        when(month($"run_dt") <= 6, make_date(y - 1, lit(7), lit(1)))
          .otherwise(make_date(y, lit(1), lit(1))),
        when(month($"run_dt") <= 6, make_date(y - 1, lit(12), lit(31)))
          .otherwise(make_date(y, lit(6), lit(30)))))
      .unionByName(period("YEARLY",
        make_date(y - 1, lit(1), lit(1)), make_date(y - 1, lit(12), lit(31))))
  }
}
