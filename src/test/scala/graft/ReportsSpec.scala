package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.reports.Feeds
import graft.ops.Periods
import graft.dq.{Checks, Metrics}

class ReportsSpec extends AnyFunSuite with SparkSpec {

  test("groupedReport grand total equals sum of group rows") {
    import spark.implicits._
    val df = Seq(("a", 10.0), ("a", 5.0), ("b", 2.5)).toDF("g", "m")
    val out = Feeds.groupedReport(df, "g", Seq("m" -> "total"))
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Double]("total"),
        r.getAs[String]("row_kind"))).toSet
    assert(out == Set(("a", 15.0, "GROUP"), ("b", 2.5, "GROUP"),
      ("Grand Total", 17.5, "TOTAL")))
  }

  test("fetchData excludes, filters, sorts") {
    import spark.implicits._
    val df = Seq((3, "x", 1.0), (1, "y", 2.0), (2, "z", 3.0)).toDF("k", "drop_me", "v")
    val out = Feeds.fetchData(df, excludeColumns = Seq("drop_me"),
      filterRows = Some(col("k") =!= 2), sortingColumns = Seq("k"))
    assert(out.columns.toSeq == Seq("k", "v"))
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1, 3))
  }

  test("writeCsv produces a single header-first csv file") {
    import spark.implicits._
    val dir = TempDirs.create("graftcsv").toString + "/out"
    Feeds.writeCsv(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(f.length == 1)
    val lines = scala.io.Source.fromFile(f.head).getLines().toSeq
    assert(lines.head == "k,v" && lines.size == 3)
  }

  test("monthlyPeriods emits one row per month with the .997 end convention") {
    val out = Periods.monthlyPeriods(spark, 2024, 2024, "C")
      .orderBy("report_start_date").collect()
    assert(out.length == 12)
    val jan = out.head
    assert(jan.getAs[java.sql.Timestamp]("report_end_date").toString ==
      "2024-01-31 23:59:59.997")
  }

  test("periodsFor covers the six frequencies containing the run date") {
    val out = Periods.periodsFor(spark, "2024-08-15")
      .collect().map(r => r.getAs[String]("frequency") ->
        (r.getAs[java.sql.Timestamp]("report_start_date").toString,
         r.getAs[java.sql.Timestamp]("report_end_date").toString)).toMap
    assert(out.keySet == Set("DAILY", "WEEKLY", "MONTHLY", "QUARTERLY", "SEMI_ANNUAL", "YEARLY"))
    assert(out("MONTHLY") == ("2024-08-01 00:00:00.0", "2024-08-31 23:59:59.997"))
    assert(out("SEMI_ANNUAL") == ("2024-07-01 00:00:00.0", "2024-12-31 23:59:59.997"))
    assert(out("QUARTERLY") == ("2024-07-01 00:00:00.0", "2024-09-30 23:59:59.997"))
  }

  test("lastPeriodsFor emits each frequency's most recently COMPLETED period") {
    // 2024-03-10 is a Sunday in a leap year — exercises the week-start
    // arithmetic, the February 29 month end, and the Jan–Jun SEMI branch
    val out = Periods.lastPeriodsFor(spark, "2024-03-10")
      .collect().map(r => r.getAs[String]("frequency") ->
        (r.getAs[java.sql.Timestamp]("report_start_date").toString,
         r.getAs[java.sql.Timestamp]("report_end_date").toString)).toMap
    assert(out("DAILY") == ("2024-03-09 00:00:00.0", "2024-03-09 23:59:59.997"))
    assert(out("WEEKLY") == ("2024-02-26 00:00:00.0", "2024-03-03 23:59:59.997"))
    assert(out("MONTHLY") == ("2024-02-01 00:00:00.0", "2024-02-29 23:59:59.997"))
    assert(out("QUARTERLY") == ("2023-10-01 00:00:00.0", "2023-12-31 23:59:59.997"))
    assert(out("SEMI_ANNUAL") == ("2023-07-01 00:00:00.0", "2023-12-31 23:59:59.997"))
    assert(out("YEARLY") == ("2023-01-01 00:00:00.0", "2023-12-31 23:59:59.997"))
    val row = Periods.lastPeriodsFor(spark, "2024-03-10").limit(1).collect().head
    assert(row.getAs[java.sql.Date]("as_of_run_dt").toString == "2024-03-10")
    assert(row.isNullAt(row.fieldIndex("carrier_name")))
  }

  test("metrics: null/unique/duplicate counts in one definition") {
    import spark.implicits._
    val df = Seq(Some(1), Some(1), Some(2), None).toDF("c")
    assert(Metrics.nullCount(df, "c") == 1)
    assert(Metrics.uniqueCount(df, "c") == 2)
    assert(Metrics.duplicateCount(df, "c") == 2) // the two 1s
    val row = Metrics.metricsRow(df, Seq("c")).head()
    assert(row.getAs[Long]("row_count") == 4 && row.getAs[Long]("null_count_c") == 1)
  }

  test("checks: unique, orphan, notNull, negative") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "b"), (2, null)).toDF("k", "v")
    assert(Checks.uniqueCheck(df, "k").count() == 1)
    assert(Checks.notNullCheck(df, "v").count() == 1)
    val parent = Seq(1).toDF("pk")
    assert(Checks.orphanCheck(df, parent, "k", "pk").count() == 1)
    val r = Checks.run("T-1", Checks.negativeValueCheck(Seq(-1, 2).toDF("x"), "x"), "neg")
    assert(r.status == "FAIL" && r.failedRows == 1)
  }
}
