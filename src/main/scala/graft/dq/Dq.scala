package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality framework: metric library (system DMF analogues,
 * ref: sql/DMF_IMPLEMENTATION_GUIDE.md §3.1), the custom source-vs-target
 * count metric with expectations
 * (ref: sql/new_rfb_and_total_claimants_active/setup_dmf_data_quality.sql:109-148),
 * and the metadata-driven check types
 * (ref: tools/test_framework_helper.py:354-480).
 *
 * Every metric is a single distributed aggregation; checks return DataFrames
 * of offending rows so `limit(n)` sampling stays lazy. Multiple metrics over
 * one table should be combined into a single `df.agg(...)` pass by the
 * caller — `metricsRow` below does exactly that (one scan, many metrics).
 */
object Metrics {
  // System-DMF analogues (ref: sql/DMF_IMPLEMENTATION_GUIDE.md §3.1)
  def nullCount(df: DataFrame, c: String): Long =
    df.agg(count(when(col(c).isNull, 1)).as("n")).head().getLong(0)
  def rowCount(df: DataFrame): Long = df.count()
  def uniqueCount(df: DataFrame, c: String): Long =
    df.agg(countDistinct(col(c)).as("n")).head().getLong(0)
  def duplicateCount(df: DataFrame, c: String): Long =
    df.groupBy(col(c)).count().filter(col("count") > 1)
      .agg(coalesce(sum(col("count")), lit(0L))).head().getLong(0)
  /** Seconds between `now` and max(tsCol) — ref guide's FRESHNESS. */
  def freshnessSeconds(df: DataFrame, tsCol: String, now: java.sql.Timestamp): Long = {
    val maxTs = df.agg(max(col(tsCol))).head().getTimestamp(0)
    if (maxTs == null) Long.MaxValue else (now.getTime - maxTs.getTime) / 1000
  }

  /** One-scan metric row: null/distinct counts for many columns at once. */
  def metricsRow(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      count(lit(1)).as("row_count"),
      cols.flatMap(c => Seq(
        count(when(col(c).isNull, 1)).as(s"null_count_$c"),
        countDistinct(col(c)).as(s"unique_count_$c"))): _*)

  /** F2 — custom DMF `source_target_count_difference(TABLE, TABLE)`
   *  (ref: setup_dmf_data_quality.sql:109-119). */
  def sourceTargetCountDifference(source: DataFrame, target: DataFrame): Long =
    math.abs(source.count() - target.count())

  /** Sketch-based UNIQUE_COUNT for 100 TB-scale profiling (SURVEY §9):
    * HyperLogLog++ with relative standard deviation `rsd` — one pass,
    * fixed-size sketch per partition merged on the driver, where exact
    * `countDistinct` must shuffle every distinct value. Use when the
    * expectation is a bound ("roughly N keys"), not an exact equality. */
  def approxUniqueCount(df: DataFrame, c: String, rsd: Double = 0.05): Long =
    df.agg(approx_count_distinct(col(c), rsd).as("n")).head().getLong(0)

  /** Sketch-based quantiles (Greenwald-Khanna): bounded-memory single pass
    * vs the exact full sort; `relativeError` 0 degenerates to exact. */
  def approxQuantiles(
      df: DataFrame, c: String, probabilities: Array[Double],
      relativeError: Double = 0.01): Array[Double] =
    df.stat.approxQuantile(c, probabilities, relativeError)
}

/** Expectation runner (ref: setup_dmf_data_quality.sql:141-148 `EXPECT VALUE = 0`). */
final case class Expectation(name: String, predicate: Long => Boolean) {
  def check(value: Long): DqResult =
    DqResult(name, if (predicate(value)) "PASS" else "FAIL", value, "")
}

/**
 * The reference's `EXPECT VALUE <op> <n>` grammar
 * (setup_dmf_data_quality.sql:121,148 — `EXPECT VALUE = 0`), parsed into a
 * live predicate so the catalog string is the single source of truth (a
 * separate prose string and lambda can silently drift apart).
 * Supported ops: `= == != <> < <= > >=`.
 */
object Expectation {
  private val Grammar =
    """(?i)\s*VALUE\s*(=|==|!=|<>|<=|>=|<|>)\s*(-?\d+)\s*""".r

  /** Parse or die — a bad expectation string fails at registration, not as
    * a silent PASS at evaluation time. */
  def parse(expr: String): Long => Boolean = expr match {
    case Grammar(op, n) =>
      val bound = n.toLong
      op match {
        case "=" | "==" => (v: Long) => v == bound
        case "!=" | "<>" => (v: Long) => v != bound
        case "<" => (v: Long) => v < bound
        case "<=" => (v: Long) => v <= bound
        case ">" => (v: Long) => v > bound
        case ">=" => (v: Long) => v >= bound
      }
    case _ => throw new IllegalArgumentException(
      s"cannot parse expectation '$expr': expected VALUE <op> <integer> " +
        "with op in {=, ==, !=, <>, <, <=, >, >=}")
  }

  /** Parse into a named runner (the check-suite form). */
  def of(name: String, expr: String): Expectation =
    Expectation(name, parse(expr))
}

/** Result row shape of the hand-written DQ suite
 *  (ref: sql/.../test_data_quality.sql:17-26). */
final case class DqResult(testId: String, status: String, failedRows: Long, businessImpact: String)

/**
 * The 7 metadata-driven check types
 * (ref: tools/test_framework_helper.py:412-478). Each returns the offending
 * rows; `run` wraps them in PASS/FAIL accounting like the reference's
 * framework (ref: tools/test_framework_helper.py:584-608).
 */
object Checks {

  def uniqueCheck(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("err_count"))
      .filter(col("err_count") > 1)

  /** COMBINATION_COLUMN_UNIQUE_CHECK — TRIMmed composite key duplicates
   *  (ref: tools/sql_test_case_generator.py:139-150). */
  def combinationUniqueCheck(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(c => trim(col(c).cast("string")).as(c)): _*)
      .agg(count(lit(1)).as("err_count"))
      .filter(col("err_count") > 1)

  /** ORPHAN_CHECK — child keys missing from parent (left anti). */
  def orphanCheck(child: DataFrame, parent: DataFrame, childKey: String, parentKey: String): DataFrame =
    child.join(parent, child(childKey) === parent(parentKey), "left_anti")

  def notNullCheck(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNull || (col(c).cast("string") === ""))

  def defaultValueCheck(df: DataFrame, c: String, defaultValue: String): DataFrame =
    df.filter(col(c).cast("string") === defaultValue)

  def negativeValueCheck(df: DataFrame, c: String): DataFrame =
    df.filter(col(c) < 0)

  def zeroValueCheck(df: DataFrame, c: String): DataFrame =
    df.filter(col(c) === 0)

  def run(testId: String, offending: DataFrame, impact: String = ""): DqResult = {
    val n = offending.count()
    DqResult(testId, if (n == 0) "PASS" else "FAIL", n, impact)
  }
}
