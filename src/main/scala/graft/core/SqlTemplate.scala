package graft.core

import scala.collection.mutable

/**
 * Session-variable store. Spark-native stand-in for Snowflake
 * `SET name = value` + `$NAME` references
 * (ref: connector/snowpark_connector.py:170-238).
 *
 * Values are stored as SQL literal text (already quoted if strings) so
 * substitution is a pure string pass before `spark.sql`.
 */
final class SessionVars {
  private val vars = mutable.LinkedHashMap.empty[String, String]

  def set(name: String, sqlLiteral: String): Unit = vars(name.toUpperCase) = sqlLiteral
  def setString(name: String, value: String): Unit =
    set(name, "'" + value.replace("'", "''") + "'")
  def unset(name: String): Unit = vars.remove(name.toUpperCase)
  def get(name: String): Option[String] = vars.get(name.toUpperCase)
  def all: Map[String, String] = vars.toMap
}

/**
 * `{{PLACEHOLDER}}` template + `$SESSION_VAR` rendering with the
 * reference's conditional blocks
 * (ref: connector/snowpark_connector.py:290-464 execute_query_from_file;
 *  case-insensitive variant ref: tools/datamart_utils.py:326-341).
 *
 * Semantics re-expressed, not ported:
 *  - `{{KEY}}` is replaced with its value; keys are matched
 *    case-insensitively; unknown keys raise (catches template drift early).
 *  - `{{AND_CONDITION}}` / `{{WHERE_CONDITION}}` are *conditional*: when an
 *    incremental predicate is provided they render as
 *    `AND <pred>` / `WHERE <pred>`, otherwise they render as empty text —
 *    this is the reference's incremental-load high-water-mark hook
 *    (ref: connector/snowpark_connector.py:425-453).
 *  - `$NAME` tokens are replaced from the session-variable map
 *    (longest-name-first so $REPORT_START_DT wins over $REPORT).
 *  - after substitution, the [[SqlDialect]] pass rewrites the source
 *    dialect's Snowflake-only constructs (QUALIFY, `* EXCLUDE`,
 *    double-quoted identifiers, CHARINDEX) into Spark SQL, so the
 *    reference's `.sql` assets run near-verbatim; the pass is identity for
 *    templates already written in Spark SQL. Pass `dialect = false` to
 *    skip it (e.g. for Spark SQL that uses double-quoted string literals).
 */
object SqlTemplate {

  private val placeholderRe = raw"\{\{\s*([A-Za-z0-9_]+)\s*\}\}".r

  def render(
      template: String,
      placeholders: Map[String, String] = Map.empty,
      sessionVars: Map[String, String] = Map.empty,
      incrementalPredicate: Option[String] = None,
      dialect: Boolean = true): String = {
    val ph = placeholders.map { case (k, v) => k.toUpperCase -> v }
    val withPlaceholders = placeholderRe.replaceAllIn(template, m => {
      val key = m.group(1).toUpperCase
      val value = key match {
        case "AND_CONDITION" =>
          incrementalPredicate.map(p => s"AND $p").getOrElse("")
        case "WHERE_CONDITION" =>
          incrementalPredicate.map(p => s"WHERE $p").getOrElse("")
        case k2 =>
          ph.getOrElse(k2,
            throw new IllegalArgumentException(s"unbound template placeholder {{$k2}}"))
      }
      scala.util.matching.Regex.quoteReplacement(value)
    })
    val rendered = renderSessionVars(withPlaceholders, sessionVars)
    if (dialect) SqlDialect.toSpark(rendered) else rendered
  }

  def renderSessionVars(sql: String, sessionVars: Map[String, String]): String =
    // scanner-based: reads the maximal $name word (so $REPORT_START_DT can
    // never half-match a shorter var), case-insensitive like the source
    // dialect, and skips string literals/quoted identifiers/comments — the
    // warehouse never expands variables inside a literal
    SqlDialect.substituteSessionVars(sql, sessionVars)

  /** Load a .sql file and render it (ref: connector/snowpark_connector.py:290-340). */
  def renderFile(
      path: String,
      placeholders: Map[String, String] = Map.empty,
      sessionVars: Map[String, String] = Map.empty,
      incrementalPredicate: Option[String] = None,
      dialect: Boolean = true): String = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    render(text, placeholders, sessionVars, incrementalPredicate, dialect)
  }
}
