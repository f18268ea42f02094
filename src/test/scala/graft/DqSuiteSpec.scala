package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dq.DqSuite

/** The 24-check suite: tier logic (PASS/FAIL/WARNING/INFO), failed-row
  * accounting and the SAMPLE_FAILURES JSON payloads on a hand-built report
  * (ref: sql/new_rfb_and_total_claimants_active/test_data_quality.sql). */
class DqSuiteSpec extends AnyFunSuite with SparkSpec {

  /** Scratch dir deleted after the body — specs must not leak /tmp dirs
    * (same hygiene as the q62 engine query, SparkEntry.scala). */
  private def withTempDir[T](prefix: String)(body: String => T): T = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix)
    try body(tmp.toString)
    finally {
      val walk = java.nio.file.Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  private def run() = {
    import spark.implicits._
    // 4 rows (<10 → DQ-015 WARNING), one negative-days row (DQ-008 FAIL),
    // one >10-working-days row (DQ-009 WARNING), one orphan claimant
    // (DQ-013 FAIL), one zero measure (DQ-017 WARNING)
    val report = Seq(
      (1L, 10L, "claim", "01/05/2024", 3L, 1L, 2.5),
      (2L, 11L, "claim", "01/08/2024", 6L, 1L, 0.0),
      (3L, 12L, "appeal", "01/18/2024", 13L, 0L, 1.0),
      (9L, 13L, "claim", "01/02/2024", -1L, 1L, 4.0)
    ).toDF("Claimant Id", "Request Id", "Request Type", "First Decision Date",
      "Working Days To Decision", "Resolved Within Two Weeks", "Clamped Value")
    val events = Seq(
      (1L, "claim", java.sql.Timestamp.valueOf("2024-01-05 00:00:00")),
      (2L, "claim", java.sql.Timestamp.valueOf("2024-01-08 00:00:00")),
      (3L, "appeal", java.sql.Timestamp.valueOf("2024-01-18 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    DqSuite.run(report, events, "2024-01-01", "2024-01-20")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getString(4)))).toMap
  }

  test("emits all 24 check ids with correct tier statuses") {
    val out = run()
    assert(out.size == 24)
    assert(out.keySet == (1 to 24).map(i => f"DQ-$i%03d").toSet)
    assert(out("DQ-001")._1 == "PASS")
    assert(out("DQ-008") == (("FAIL", 1L, null)))      // negative days
    assert(out("DQ-009")._1 == "WARNING")              // 13 > 10 working days
    assert(out("DQ-015")._1 == "WARNING")              // 4 rows < 10
    assert(out("DQ-016") == (("FAIL", 1L, null)))      // 2 request types
    assert(out("DQ-017") == (("WARNING", 1L, null)))   // zero measure
    assert(out("DQ-021")._1 == "INFO")
    assert(out("DQ-023") == (("INFO", 2L, null)))
    // orphan claimant 9 not in events; DQ-024 source 3 vs target 4
    assert(out("DQ-013") == (("FAIL", 1L, null)))
    assert(out("DQ-024") == (("FAIL", 1L, null)))
  }

  test("empty report: every check total (non-null failed_rows), DQ-015 FAILs") {
    import spark.implicits._
    val report = Seq.empty[(Long, Long, String, String, Long, Long, Double)]
      .toDF("Claimant Id", "Request Id", "Request Type", "First Decision Date",
        "Working Days To Decision", "Resolved Within Two Weeks", "Clamped Value")
    val events = Seq((1L, "claim", java.sql.Timestamp.valueOf("2024-01-05 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    val rows = DqSuite.run(report, events, "2024-01-01", "2024-01-20").collect()
    assert(rows.length == 24)
    assert(rows.forall(!_.isNullAt(2)), "failed_rows must never be null")
    val byId = rows.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId("DQ-015") == "FAIL")  // the empty-report check itself
    assert(byId("DQ-001") == "PASS")  // predicate checks pass vacuously
    // payload fields survive to_json (engine-portable: no dropped nulls)
    val s21 = rows.find(_.getString(0) == "DQ-021").get.getString(4)
    assert(s21.contains(""""outlier_count":0""") && s21.contains(""""max_days":-1"""),
      s21)
  }

  test("sample_failures payloads are parseable JSON with exact centi rates") {
    val out = run()
    val s15 = out("DQ-015")._3
    assert(s15 == """{"total_rows":4,"unique_claimants":4,"unique_request_types":2}""")
    val s22 = out("DQ-022")._3
    // resolved=3 of 4 → 7500 centi-pct; avg days all = (3+6+13-1)*100/4 = 525
    assert(s22.contains(""""compliance_rate_centipct":7500"""))
    assert(s22.contains(""""avg_days_centi_all":525"""))
    val s21 = out("DQ-021")._3
    assert(s21.contains(""""outlier_count":""") && s21.contains(""""max_days":13"""))
  }

  test("approx metrics land within their error bounds") {
    import spark.implicits._
    import graft.dq.Metrics
    val df = (0L until 10000L).toDF("v")
    val approx = Metrics.approxUniqueCount(df, "v", rsd = 0.05)
    // HLL++ rsd 5%: allow 3 sigma
    assert(math.abs(approx - 10000L) <= 1500, s"approx=$approx")
    val Array(median) = Metrics.approxQuantiles(df, "v", Array(0.5), 0.01)
    assert(math.abs(median - 5000.0) <= 200.0, s"median=$median")
  }

  test("DmfCatalog: schedule-first ordering, shared cron, evaluate expectations") {
    import spark.implicits._
    import graft.dq.{DmfCatalog, Metrics}
    val cat = new DmfCatalog(spark)
    // a DMF cannot attach before its object has a schedule
    intercept[IllegalArgumentException] {
      cat.addMetric("t1", "row_count", Seq(), Metrics.rowCount,
        "rows_present", "VALUE > 0")
    }
    cat.setSchedule("t1", "USING CRON 0 8,14,20 * * * UTC")
    // the expectation string IS the predicate — an unparseable one fails
    // at registration, it cannot silently drift from a separate lambda
    intercept[IllegalArgumentException] {
      cat.addMetric("t1", "row_count", Seq(), Metrics.rowCount,
        "rows_present", "VALUE IS POSITIVE")
    }
    // one opaque metric and one fusable column metric, mixed
    cat.addMetric("t1", "row_count", Seq(), Metrics.rowCount,
      "rows_present", "VALUE > 0")
    cat.addColumnMetric("t1", "null_count", Seq("k"),
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("k").isNull, 1)),
      "no_null_keys", "VALUE = 0", comment = "DQ-024 analogue")
    // catalog is a plain DataFrame; cron is shared per object
    val rows = cat.catalog.orderBy("metric_name").collect()
    assert(rows.map(_.getAs[String]("schedule_cron")).distinct.toSeq ==
      Seq("USING CRON 0 8,14,20 * * * UTC"))
    // re-scheduling the object shows through for already-attached DMFs
    cat.setSchedule("t1", "5 MINUTE")
    assert(cat.catalog.collect().forall(_.getAs[String]("schedule_cron") == "5 MINUTE"))
    val t1 = Seq((Some(1), "a"), (None, "b")).toDF("k", "v")
    val out = cat.evaluate(_ => t1).orderBy("metric_name")
      .collect().map(r => r.getAs[String]("metric_name") ->
        ((r.getAs[Long]("value"), r.getAs[String]("status")))).toMap
    assert(out("row_count") == ((2L, "PASS")))
    assert(out("null_count") == ((1L, "FAIL")))
  }

  test("DmfCatalog: null aggregate surfaces as ERROR, never a silent PASS") {
    import spark.implicits._
    import graft.dq.DmfCatalog
    import org.apache.spark.sql.functions.max
    val cat = new DmfCatalog(spark)
    cat.setSchedule("empty", "5 MINUTE")
    // max over zero rows is NULL; under VALUE = 0 the old coercion-to-0
    // reported PASS on an empty table — it must be ERROR
    cat.addColumnMetric("empty", "max_v", Seq("v"),
      max(org.apache.spark.sql.functions.col("v")), "max_is_zero", "VALUE = 0")
    val row = cat.evaluate(_ =>
      Seq.empty[(Long, String)].toDF("v", "s")).collect().head
    assert(row.getAs[String]("status") == "ERROR")
    assert(row.isNullAt(row.fieldIndex("value")))
  }

  test("DmfCatalog: results history persists per run; trend + references") {
    import spark.implicits._
    import graft.dq.{DmfCatalog, CronSchedule}
    import graft.meta.MetaStore
    import org.apache.spark.sql.functions.{col, count, lit, when}
    withTempDir("graft-dmf") { dir =>
    val meta = new MetaStore(spark, dir)
    val cat = new DmfCatalog(spark)
    cat.setSchedule("t1", "USING CRON 0 8,14,20 * * * UTC")
    cat.addColumnMetric("t1", "null_count", Seq("k"),
      count(when(col("k").isNull, 1)), "no_null_keys", "VALUE = 0")
    val ts1 = java.sql.Timestamp.valueOf("2026-01-01 08:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2026-01-02 08:00:00")
    // run 1: clean table → PASS; run 2: a null key appears → FAIL
    cat.evaluateAndLog(_ => Seq((Some(1), "a")).toDF("k", "v"), meta, ts1)
    cat.evaluateAndLog(_ => Seq((Some(1), "a"), (None, "b")).toDF("k", "v"), meta, ts2)
    // STEP 6 trend: newest first, filtered to one expectation, limit-N
    val hist = meta.dmfResultHistory(Some("no_null_keys"), limit = 10)
      .select("run_ts", "value", "status").collect()
    assert(hist.length == 2)
    assert(hist(0).getTimestamp(0) == ts2 && hist(0).getString(2) == "FAIL")
    assert(hist(1).getTimestamp(0) == ts1 && hist(1).getString(2) == "PASS")
    // STEP 5 references: last execution observed, next derived from cron
    val now = java.sql.Timestamp.valueOf("2026-01-02 10:30:00")
    val ref = cat.references(meta, now).collect().head
    assert(ref.getAs[java.sql.Timestamp]("last_execution_time") == ts2)
    assert(ref.getAs[java.sql.Timestamp]("next_execution_time") ==
      java.sql.Timestamp.valueOf("2026-01-02 14:00:00"))
    // cron arithmetic: wrap to tomorrow's first slot; interval form
    assert(CronSchedule.next("USING CRON 0 8,14,20 * * * UTC",
      java.sql.Timestamp.valueOf("2026-01-02 20:00:00")) ==
      java.sql.Timestamp.valueOf("2026-01-03 08:00:00"))
    assert(CronSchedule.next("5 MINUTE",
      java.sql.Timestamp.valueOf("2026-01-02 20:00:00")) ==
      java.sql.Timestamp.valueOf("2026-01-02 20:05:00"))
    }
  }

  test("DmfCatalog: suspend/resume — SKIPPED status, real schedule_status") {
    import spark.implicits._
    import graft.dq.DmfCatalog
    import graft.meta.MetaStore
    import org.apache.spark.sql.functions.{col, count, lit, when}
    val cat = new DmfCatalog(spark)
    cat.setSchedule("t1", "USING CRON 0 8 * * * UTC")
    cat.addColumnMetric("t1", "row_count", Seq(), count(lit(1)),
      "rows_present", "VALUE > 0")
    cat.addColumnMetric("t1", "null_count", Seq("k"),
      count(when(col("k").isNull, 1)), "no_null_keys", "VALUE = 0")
    // suspending something that isn't attached is a usage error
    intercept[IllegalArgumentException] { cat.suspend("t1", "no_such_metric") }
    cat.suspend("t1", "null_count")
    val t1 = Seq((Some(1), "a"), (None, "b")).toDF("k", "v")
    // suspended check is SKIPPED with no value; the other still evaluates
    val out = cat.evaluate(_ => t1).collect()
      .map(r => r.getAs[String]("metric_name") -> r).toMap
    assert(out("row_count").getAs[String]("status") == "PASS")
    assert(out("null_count").getAs[String]("status") == "SKIPPED")
    assert(out("null_count").isNullAt(out("null_count").fieldIndex("value")))
    // references reports the real per-association status; suspended
    // schedules have no next execution
    withTempDir("graft-dmf-susp") { dir =>
      val meta = new MetaStore(spark, dir)
      cat.evaluateAndLog(_ => t1, meta,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
      val refs = cat.references(meta,
          java.sql.Timestamp.valueOf("2026-01-01 06:00:00"))
        .collect().map(r => r.getAs[String]("metric_name") -> r).toMap
      assert(refs("row_count").getAs[String]("schedule_status") == "STARTED")
      assert(refs("row_count").getAs[java.sql.Timestamp]("next_execution_time") ==
        java.sql.Timestamp.valueOf("2026-01-01 08:00:00"))
      assert(refs("null_count").getAs[String]("schedule_status") == "SUSPENDED")
      assert(refs("null_count")
        .isNullAt(refs("null_count").fieldIndex("next_execution_time")))
    }
    // resume restores evaluation: the null key now FAILs the check
    cat.resume("t1", "null_count")
    val out2 = cat.evaluate(_ => t1).collect()
      .map(r => r.getAs[String]("metric_name") ->
        r.getAs[String]("status")).toMap
    assert(out2("null_count") == "FAIL")
  }

  test("DmfCatalog: suspension persists through the metastore across catalogs") {
    import spark.implicits._
    import graft.dq.DmfCatalog
    import graft.meta.MetaStore
    import org.apache.spark.sql.functions.{col, count, when}
    withTempDir("graft-dmf-persist") { dir =>
      val meta = new MetaStore(spark, dir)
      def freshCatalog(): DmfCatalog = {
        val c = new DmfCatalog(spark, Some(meta))
        c.setSchedule("t1", "USING CRON 0 8 * * * UTC")
        c.addColumnMetric("t1", "null_count", Seq("k"),
          count(when(col("k").isNull, 1)), "no_null_keys", "VALUE = 0")
        c
      }
      val t1 = Seq((Some(1), "a"), (None, "b")).toDF("k", "v")
      val cat1 = freshCatalog()
      cat1.suspend("t1", "null_count")
      // a NEW catalog over the SAME metastore sees the suspension — the
      // reference's catalog-resident schedule state across sessions
      val cat2 = freshCatalog()
      val refs = cat2.references(meta,
          java.sql.Timestamp.valueOf("2026-01-01 06:00:00"))
        .collect().map(r => r.getAs[String]("metric_name") -> r).toMap
      assert(refs("null_count").getAs[String]("schedule_status") == "SUSPENDED")
      assert(cat2.evaluate(_ => t1).collect()
        .head.getAs[String]("status") == "SKIPPED")
      // resume persists the same way
      cat2.resume("t1", "null_count")
      val cat3 = freshCatalog()
      assert(cat3.evaluate(_ => t1).collect()
        .head.getAs[String]("status") == "FAIL")
    }
  }

  test("DmfCatalog: column-level suspension is per-association") {
    import spark.implicits._
    import graft.dq.DmfCatalog
    import org.apache.spark.sql.functions.{col, count, when}
    val cat = new DmfCatalog(spark)
    cat.setSchedule("t1", "USING CRON 0 8 * * * UTC")
    // same metric NAME on two different column sets — the reference's
    // ADD DATA METRIC FUNCTION <name> ON (cols) association grain
    cat.addColumnMetric("t1", "null_count", Seq("k"),
      count(when(col("k").isNull, 1)), "no_null_k", "VALUE = 0")
    cat.addColumnMetric("t1", "null_count", Seq("v"),
      count(when(col("v").isNull, 1)), "no_null_v", "VALUE = 0")
    val t1 = Seq((Option.empty[Int], Some("a"))).toDF("k", "v")
    intercept[IllegalArgumentException] {
      cat.suspend("t1", "null_count", Seq("nope"))
    }
    // the association is addressed by column SET — order/case-insensitive
    cat.suspend("t1", "null_count", Seq("K"))
    cat.resume("t1", "null_count", Seq("k"))
    cat.suspend("t1", "null_count", Seq("k"))
    val out = cat.evaluate(_ => t1).collect()
      .map(r => r.getAs[String]("expectation_name") ->
        r.getAs[String]("status")).toMap
    assert(out("no_null_k") == "SKIPPED") // suspended association
    assert(out("no_null_v") == "PASS")    // sibling still evaluates
    // column-level resume lifts only that association's suspension
    cat.resume("t1", "null_count", Seq("k"))
    val out2 = cat.evaluate(_ => t1).collect()
      .map(r => r.getAs[String]("expectation_name") ->
        r.getAs[String]("status")).toMap
    assert(out2("no_null_k") == "FAIL")
    // name-level suspend covers BOTH associations; name-level resume clears
    cat.suspend("t1", "null_count")
    assert(cat.evaluate(_ => t1).collect()
      .forall(_.getAs[String]("status") == "SKIPPED"))
    cat.resume("t1", "null_count")
    assert(cat.evaluate(_ => t1).collect()
      .forall(_.getAs[String]("status") != "SKIPPED"))
  }

  test("CronSchedule honors the timezone token; unknown zone is unparseable") {
    import graft.dq.CronSchedule
    // explicit UTC instants: Timestamp.valueOf would read the literal in the
    // JVM default zone and make this assertion environment-sensitive
    def utc(s: String) =
      java.sql.Timestamp.from(java.time.Instant.parse(s))
    // 8 AM America/New_York on 2026-01-02 (EST, UTC-5) is 13:00 UTC
    assert(CronSchedule.next("USING CRON 0 8 * * * America/New_York",
      utc("2026-01-02T10:00:00Z")) == utc("2026-01-02T13:00:00Z"))
    // unknown zone id → null, not TimeZone.getTimeZone's silent GMT fallback
    assert(CronSchedule.next("USING CRON 0 8 * * * Mars/Olympus",
      utc("2026-01-02T10:00:00Z")) == null)
  }
}
