package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.SqlTemplate

/**
 * Metadata-driven data-quality test framework — the Spark-native
 * re-expression of the reference's CSV-spec + SQL-template runner
 * (ref: test_framework_run.py:20-71, tools/test_framework_helper.py:117-163
 * block parser, :354-480 per-type condition builders, :584-698 result
 * accounting).
 *
 * Template files hold named query blocks:
 * {{{
 *   -- START_TEST
 *   @UNIQUE_CHECK
 *   @QUERY
 *   SELECT {column} AS err_value, COUNT(*) AS err_count
 *   FROM {table} GROUP BY 1 HAVING COUNT(*) > 1
 *   -- END_TEST
 * }}}
 * A spec row picks a block by name and supplies `{placeholder}` values; the
 * runner renders, executes, and PASS/FAILs on the reference's rule: the
 * `err_count` column sum if present, else the result row count.
 */
object TestFramework {

  final case class TestCase(
      testName: String,
      queryName: String,
      params: Map[String, String],
      isEnabled: Boolean = true)

  final case class TestOutcome(
      testName: String,
      queryName: String,
      status: String,
      failureCount: Long,
      renderedSql: String)

  final class OneOrMoreTestCasesFailedException(val failures: Seq[TestOutcome])
    extends RuntimeException(
      s"${failures.size} test case(s) failed: ${failures.map(_.testName).mkString(", ")}")

  private val StartMarker = "-- START_TEST"
  private val EndMarker = "-- END_TEST"

  /**
   * Parse `@NAME → SQL` blocks delimited by START/END markers
   * (ref: tools/test_framework_helper.py:117-163). The first `@NAME` line
   * names the block; the text after the `@QUERY` line is the SQL.
   */
  def parseTemplateBlocks(text: String): Map[String, String] = {
    val blocks = collection.mutable.LinkedHashMap.empty[String, String]
    var inBlock = false
    var name: Option[String] = None
    var inQuery = false
    val sql = new StringBuilder
    text.linesIterator.foreach { line =>
      val t = line.trim
      if (t.startsWith(StartMarker)) { inBlock = true; name = None; inQuery = false; sql.clear() }
      else if (t.startsWith(EndMarker)) {
        name.foreach(n => blocks(n) = sql.toString.trim)
        inBlock = false
      } else if (inBlock) {
        if (t == "@QUERY") inQuery = true
        else if (t.startsWith("@") && name.isEmpty) name = Some(t.stripPrefix("@"))
        else if (inQuery) { sql.append(line).append('\n') }
      }
    }
    blocks.toMap
  }

  def parseTemplateFile(path: String): Map[String, String] =
    parseTemplateBlocks(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** `{placeholder}` rendering (ref: tools/test_framework_helper.py:214-222). */
  private val braceRe = raw"\{([A-Za-z0-9_]+)\}".r
  def renderPlaceholders(sql: String, params: Map[String, String]): String =
    braceRe.replaceAllIn(sql, m =>
      scala.util.matching.Regex.quoteReplacement(
        params.getOrElse(m.group(1),
          throw new IllegalArgumentException(s"unbound test placeholder {${m.group(1)}}"))))

  /**
   * Schema-derived `{carrier_name_condition}` for a carrier-scoped check
   * (ref: tools/test_framework_helper.py:197-208): a table carrying the
   * plain `carrier_name` column filters on it directly; a dimensional table
   * carrying `carrier_name_dim_id` (= MD5 of the carrier) filters on the
   * hashed id; a table with neither gets the always-true `1=1` fallback.
   * Schema introspection only — no data is read.
   */
  def carrierNameCondition(df: DataFrame, carrierName: String): String = {
    val esc = carrierName.replace("'", "''")
    val cols = df.schema.fieldNames.toSet
    if (cols.contains("carrier_name")) s"carrier_name = '$esc'"
    else if (cols.contains("carrier_name_dim_id")) s"carrier_name_dim_id = MD5('$esc')"
    else "1=1"
  }

  /**
   * Fill `carrier_name_condition` from the case's table parameter when the
   * spec supplies a `carrier_name` but no explicit condition. Table lookup
   * prefers the target over the source, like the reference's row builder
   * (ref: tools/test_framework_helper.py:184-196).
   */
  private def withCarrierCondition(spark: SparkSession, tc: TestCase): Map[String, String] =
    if (tc.params.contains("carrier_name_condition") || !tc.params.contains("carrier_name"))
      tc.params
    else Seq("target_table", "table", "source_table").flatMap(tc.params.get).headOption match {
      case Some(t) =>
        tc.params + ("carrier_name_condition" ->
          carrierNameCondition(spark.table(t), tc.params("carrier_name")))
      case None => tc.params
    }

  /** Load the CSV cross-reference spec: test_name,query_name,is_enabled,params...
   *  (ref: tools/test_framework_helper.py:22-36). `params` is k1=v1;k2=v2. */
  def loadSpec(csvText: String): Seq[TestCase] =
    csvText.linesIterator.drop(1).filter(_.trim.nonEmpty).map { line =>
      val cols = line.split(",", -1).map(_.trim)
      val params = if (cols.length > 3 && cols(3).nonEmpty)
        cols(3).split(";").map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
      else Map.empty[String, String]
      TestCase(cols(0), cols(1), params, cols(2).equalsIgnoreCase("true"))
    }.toSeq

  /**
   * Execute one rendered test query. Failure count = sum of `err_count` if
   * the result has that column, else the row count
   * (ref: tools/test_framework_helper.py:584-608).
   */
  def executeCase(spark: SparkSession, sql: String): Long = {
    val df = spark.sql(sql)
    if (df.columns.contains("err_count"))
      df.agg(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.sum("err_count"),
        org.apache.spark.sql.functions.lit(0L))).head().getLong(0)
    else df.count()
  }

  /** Run all enabled cases and return every outcome (reporting mode). */
  def run(
      spark: SparkSession,
      blocks: Map[String, String],
      cases: Seq[TestCase],
      sessionVars: Map[String, String] = Map.empty): Seq[TestOutcome] =
    cases.filter(_.isEnabled).map { tc =>
      val template = blocks.getOrElse(tc.queryName,
        throw new IllegalArgumentException(s"unknown test query @${tc.queryName}"))
      val rendered = SqlTemplate.renderSessionVars(
        renderPlaceholders(template, withCarrierCondition(spark, tc)), sessionVars)
      val n = executeCase(spark, rendered)
      TestOutcome(tc.testName, tc.queryName, if (n == 0) "PASS" else "FAIL", n, rendered)
    }

  /** CI mode: run, then raise if anything failed
   *  (ref: tools/test_framework_helper.py:632-698). */
  def runOrThrow(
      spark: SparkSession,
      blocks: Map[String, String],
      cases: Seq[TestCase],
      sessionVars: Map[String, String] = Map.empty): Seq[TestOutcome] = {
    val outcomes = run(spark, blocks, cases, sessionVars)
    val failures = outcomes.filter(_.status == "FAIL")
    if (failures.nonEmpty) throw new OneOrMoreTestCasesFailedException(failures)
    outcomes
  }
}
