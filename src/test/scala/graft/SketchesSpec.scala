package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches
import graft.operators.Sketches.SketchSpec

class SketchesSpec extends AnyFunSuite with SparkSpec {

  test("merged sketch stats equal the exact one-shot aggregation at small cardinality") {
    import spark.implicits._
    val path = TempDirs.create("graft-sketches").resolve("state").toString
    val spec = SketchSpec(Seq("grp"), distinctCols = Seq("src"),
      sumCols = Seq("v"))
    // 3 "nights", 2 groups, ≤30 distinct sources per group (HLL coupon
    // mode — estimates are exact), plus a null src and a null group
    val rows = (1 to 900).map { i =>
      (s"n${i % 3}", if (i % 7 == 0) null else s"g${i % 2}",
        if (i % 11 == 0) null else s"s${i % 30}", i.toLong)
    }.toDF("night", "grp", "src", "v")
    (0 to 2).foreach(n => Sketches.appendNight(
      rows.filter(col("night") === s"n$n").drop("night"), spec, path, s"n$n"))

    val got = Sketches.mergedStats(spark, path, spec)
      .orderBy(asc_nulls_first("grp"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    val want = rows.groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        count_distinct(col("src")).as("distinct_src"))
      .orderBy(asc_nulls_first("grp"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("HLL estimate within the lgK=12 error bound at 50k distinct; night-union == one-shot") {
    import spark.implicits._
    val path = TempDirs.create("graft-sketches-big").resolve("state").toString
    val spec = SketchSpec(Seq("grp"), distinctCols = Seq("src"))
    val n = 50000
    val rows = (1 to n).map(i => (s"n${i % 4}", "g", s"src_$i"))
      .toDF("night", "grp", "src")
    (0 to 3).foreach(k => Sketches.appendNight(
      rows.filter(col("night") === s"n$k").drop("night"), spec, path, s"n$k"))
    val est = Sketches.mergedStats(spark, path, spec)
      .select("distinct_src").head().getLong(0)
    // RSE at lgK=12 is ~1.04/sqrt(4096) ≈ 1.6%; 3σ ≈ 4.9% — assert 5%
    assert(math.abs(est - n.toDouble) / n < 0.05, s"estimate $est vs $n")
    // sketch union is register-wise max / coupon-set union: merging the
    // four per-night sketches must estimate EXACTLY like one sketch built
    // over the whole frame in a single pass
    val oneShot = Sketches.batchSketch(rows.drop("night"), spec)
      .select(hll_sketch_estimate(col("hll_src"))).head().getLong(0)
    assert(est == oneShot, s"union $est != one-shot $oneShot")
  }

  test("appendNight replay is idempotent and replaces only its night") {
    import spark.implicits._
    val path = TempDirs.create("graft-sketches-replay").resolve("st").toString
    val spec = SketchSpec(Seq("grp"), sumCols = Seq("v"))
    val n1 = Seq(("g", 1L), ("g", 2L)).toDF("grp", "v")
    val n2 = Seq(("g", 10L)).toDF("grp", "v")
    Sketches.appendNight(n1, spec, path, "n1")
    Sketches.appendNight(n2, spec, path, "n2")
    def stats() = Sketches.mergedStats(spark, path, spec)
      .select("n_rows", "sum_v").head()
    val before = stats()
    // a crash replay re-lands the SAME night: state must not double
    Sketches.appendNight(n1, spec, path, "n1")
    assert(stats() == before, "replay must not double-count")
    assert(before.getLong(0) == 3L && before.getLong(1) == 13L)
    // a night id that would escape its directory fails fast
    intercept[IllegalArgumentException] {
      Sketches.appendNight(n1, spec, path, "a/b")
    }
    intercept[IllegalArgumentException] {
      Sketches.appendNight(n1, spec, path, "")
    }
  }

  test("spec drift against recorded state fails fast, never merges as nulls") {
    import spark.implicits._
    val path = TempDirs.create("graft-sketches-drift").resolve("st").toString
    val spec = SketchSpec(Seq("grp"), distinctCols = Seq("src"),
      sumCols = Seq("v"))
    Sketches.appendNight(Seq(("g", "a", 1L)).toDF("grp", "src", "v"),
      spec, path, "n1")
    // a night appended WITHOUT the sum column would leave mixed parquet
    // schemas: later merges resolve sum_v to null for that night and the
    // null-skipping sum silently excludes it — the marker turns that
    // silence into an error at the append
    val drifted = SketchSpec(Seq("grp"), distinctCols = Seq("src"))
    val e1 = intercept[IllegalArgumentException] {
      Sketches.appendNight(Seq(("g", "b", 2L)).toDF("grp", "src", "v"),
        drifted, path, "n2")
    }
    assert(e1.getMessage.contains("drifted column set"), e1.getMessage)
    // ...and at analysis
    intercept[IllegalArgumentException] {
      Sketches.mergedStats(spark, path, drifted)
    }
    intercept[IllegalArgumentException] {
      Sketches.nightlyStats(spark, path,
        SketchSpec(Seq("grp", "src"), sumCols = Seq("v")))
    }
    // the recorded spec still works, and the state carries only n1
    assert(Sketches.mergedStats(spark, path, spec)
      .select("n_rows").head().getLong(0) == 1L)
  }

  test("an empty night is readable state and an empty replay clears old rows") {
    import spark.implicits._
    val path = TempDirs.create("graft-sketches-empty").resolve("st").toString
    val spec = SketchSpec(Seq("grp"), sumCols = Seq("v"))
    val empty = Seq.empty[(String, Long)].toDF("grp", "v")
    // first night empty: the write must still leave schema on disk (an
    // empty partitionBy write commits nothing and the read would fail)
    Sketches.appendNight(empty, spec, path, "n1")
    assert(Sketches.mergedStats(spark, path, spec).count() == 0)
    assert(Sketches.nightlyStats(spark, path, spec).count() == 0)
    // a non-empty night replayed EMPTY must clear its rows, not keep them
    Sketches.appendNight(Seq(("g", 5L)).toDF("grp", "v"), spec, path, "n2")
    assert(Sketches.mergedStats(spark, path, spec).count() == 1)
    Sketches.appendNight(empty, spec, path, "n2")
    assert(Sketches.mergedStats(spark, path, spec).count() == 0,
      "empty replay must replace the night's old rows")
  }

  test("marker-only state (crash before data) fails loudly, digit night ids stay strings") {
    import spark.implicits._
    val spec = SketchSpec(Seq("grp"), sumCols = Seq("v"))
    // crash window: appendNight writes the marker FIRST; simulate a crash
    // before the data write by hand-writing the marker it would leave
    val crashed = TempDirs.create("graft-sketches-crash").resolve("st")
    java.nio.file.Files.createDirectories(crashed)
    java.nio.file.Files.write(crashed.resolve("_graft_index_meta.json"),
      """{"distinctCols": "", "groupCols": "grp", "kind": "sketches", "sumCols": "v"}"""
        .getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      Sketches.mergedStats(spark, crashed.toString, spec)
    }
    assert(e.getMessage.contains("no night data"), e.getMessage)
    // a digit-shaped night id must read back as a STRING night, not the
    // int partition discovery would infer
    val path = TempDirs.create("graft-sketches-digit").resolve("st").toString
    Sketches.appendNight(Seq(("g", 1L)).toDF("grp", "v"), spec, path,
      "20260815")
    val row = Sketches.nightlyStats(spark, path, spec).head()
    assert(row.getAs[String]("night") == "20260815", row.toString)
  }

  test("nightlyStats resolves per-night contributions") {
    import spark.implicits._
    val path = TempDirs.create("graft-sketches-nightly").resolve("st").toString
    val spec = SketchSpec(Seq("grp"), distinctCols = Seq("src"))
    Sketches.appendNight(Seq(("g", "a"), ("g", "b")).toDF("grp", "src"),
      spec, path, "n1")
    Sketches.appendNight(Seq(("g", "b")).toDF("grp", "src"),
      spec, path, "n2")
    val got = Sketches.nightlyStats(spark, path, spec)
      .orderBy("night")
      .collect().map(r => (r.getAs[String]("night"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("distinct_src")))
    assert(got.toSeq == Seq(("n1", 2L, 2L), ("n2", 1L, 1L)))
  }

  test("nightDrift: hand-computed ratios, DRIFT/OK/MISSING verdicts, state-only") {
    import spark.implicits._
    val path = TempDirs.create("graft-sketches-drift").resolve("st").toString
    val spec = SketchSpec(Seq("grp"), sumCols = Seq("v"))
    // night 1: balanced — en 40 rows (sum 4000), de 40 rows (sum 4000),
    // fr 20 rows (sum 2000). night 2: en 90 (sum 9000), de 10 rows but
    // HALVED values (sum 500), fr absent.
    def night(rows: Seq[(String, Long)], id: String) =
      Sketches.appendNight(rows.toDF("grp", "v"), spec, path, id)
    night(Seq.fill(40)(("en", 100L)) ++ Seq.fill(40)(("de", 100L)) ++
      Seq.fill(20)(("fr", 100L)), "n1")
    night(Seq.fill(90)(("en", 100L)) ++ Seq.fill(10)(("de", 50L)), "n2")

    val got = Sketches.nightDrift(spark, path, spec, "n2", tolerance = 1.5)
      .orderBy("metric", "grp").collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getAs[java.lang.Double]("ratio")).map(_.toDouble),
        r.getAs[String]("status"))).toSeq
    // lifetime: en 130/13000, de 50/4500, fr 20/2000, total 200 rows
    // night:    en 90/9000,  de 10/500,  fr —,       total 100 rows
    val enShare = (90.0 / 100.0) / (130.0 / 200.0)   // 1.3846 → OK
    val deShare = (10.0 / 100.0) / (50.0 / 200.0)    // 0.4    → DRIFT
    val enAvg = (9000.0 / 90.0) / (13000.0 / 130.0)  // 1.0    → OK
    val deAvg = (500.0 / 10.0) / (4500.0 / 50.0)     // 0.5556 → DRIFT
    assert(got == Seq(
      ("de", "avg_v", Some(deAvg), "DRIFT"),
      ("en", "avg_v", Some(enAvg), "OK"),
      ("fr", "avg_v", None, "MISSING"),
      ("de", "row_share", Some(deShare), "DRIFT"),
      ("en", "row_share", Some(enShare), "OK"),
      ("fr", "row_share", None, "MISSING")), got.toString)

    // first night: every present group's ratio is exactly 1 — OK
    val first = TempDirs.create("graft-sketches-drift1").resolve("st").toString
    Sketches.appendNight(
      (Seq.fill(3)(("en", 10L)) ++ Seq.fill(2)(("de", 20L))).toDF("grp", "v"),
      spec, first, "n1")
    val d1 = Sketches.nightDrift(spark, first, spec, "n1", tolerance = 1.01)
      .collect()
    assert(d1.forall(r => r.getAs[Double]("ratio") == 1.0 &&
      r.getAs[String]("status") == "OK"), d1.mkString(";"))

    val e = intercept[IllegalArgumentException](
      Sketches.nightDrift(spark, path, spec, "n2", tolerance = 1.0))
    assert(e.getMessage.contains("tolerance"))

    // a NULL group value (the lang-ID-failure cohort) must compare
    // night-vs-lifetime like any other group — a null-unsafe join would
    // silently report it MISSING and hide its drift
    val np = TempDirs.create("graft-sketches-driftnull").resolve("st").toString
    def rowsN(g: Seq[(String, Long)]) = g.toDF("grp", "v")
    Sketches.appendNight(rowsN(Seq((null, 100L), (null, 100L),
      ("en", 100L), ("en", 100L))), spec, np, "n1")
    Sketches.appendNight(rowsN(Seq((null, 50L), ("en", 100L))),
      spec, np, "n2")
    val nullRow = Sketches.nightDrift(spark, np, spec, "n2",
        tolerance = 1.3)
      .filter(col("grp").isNull && col("metric") === "avg_v").head()
    assert(nullRow.getAs[String]("status") == "DRIFT",
      s"the null group's halved values must read DRIFT, not MISSING: $nullRow")
  }
}
