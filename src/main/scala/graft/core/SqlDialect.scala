package graft.core

/**
 * Render-time Snowflake-dialect → Spark SQL rewriter, so the reference's
 * `.sql` assets run near-verbatim through `spark.sql`
 * (ref: sql/new_rfb_and_total_claimants_active/new_rfb_and_total_claimants_active_detail.sql:32,47-50,60
 *  uses `QUALIFY ROW_NUMBER() ... = 1` in nine-plus CTEs;
 *  ref: datafeeds/common/excel_csv_writer.py:330-332 emits
 *  `SELECT * EXCLUDE("col")`; both are Snowflake-only syntax).
 *
 * Four rewrites, applied in order:
 *
 *  1. **Double-quoted identifiers → backticks.** In the source dialect a
 *     double-quoted token is ALWAYS an identifier (strings are
 *     single-quoted); Spark's default parser reads `"x"` as a string
 *     literal. `"Claim Id"` → `` `Claim Id` ``, with `""` unescaped and
 *     any embedded backtick doubled.
 *  2. **Function surfaces** where Spark lacks the source form:
 *     `CHARINDEX(sub, str[, pos])` → `POSITION(sub, str[, pos])` (rename);
 *     `DATEADD('day', ...)` / `DATEDIFF('ms', ...)` quoted units → bare
 *     identifiers incl. the dialect's short aliases;
 *     `OBJECT_CONSTRUCT(k, v, ...)` → `to_json(named_struct(k, v, ...))`;
 *     TO_CHAR/TO_DATE/... format literals translated token-by-token
 *     (`'MM/DD/YYYY'` → `'MM/dd/yyyy'` — Spark's `DD` is day-of-year);
 *     `DATE_FROM_PARTS` → `MAKE_DATE` (rename); bare `VARCHAR` → `STRING`
 *     (Spark requires a length parameter); backslash pairs in LIKE/ILIKE
 *     pattern literals doubled + `ESCAPE '\'` appended (the source dialect
 *     has no default LIKE escape; Spark's default escape is `\`).
 *     (DATEADD with bare units, TO_CHAR itself, LEN, CONTAINS, TRY_TO_DATE,
 *     LEAD-with-default all parse natively in Spark 4 — no rewrite.)
 *  3. **`QUALIFY <pred>`** — filter on window functions, evaluated after
 *     WHERE/GROUP BY/HAVING and *before* DISTINCT/ORDER BY. Rewritten as:
 *     {{{
 *       SELECT <list> FROM <body> QUALIFY <pred>
 *       -- becomes
 *       SELECT * EXCEPT (__qualify_N) FROM (
 *         SELECT <list>, (<pred>) AS __qualify_N FROM <body>
 *       ) WHERE __qualify_N
 *     }}}
 *     The predicate is appended as a select item in the ORIGINAL scope, so
 *     its window functions see the pre-filter row set and may reference
 *     base columns that are not in the select list (both required by the
 *     reference's `QUALIFY ROW_NUMBER() OVER (... ORDER BY sequenced_at
 *     DESC) = 1` on a `SELECT series_id, filing_state` list, detail.sql:32).
 *     A `SELECT DISTINCT` moves to the outer query — the dialect dedupes
 *     after QUALIFY. A trailing ORDER BY stays outside the wrap, with each
 *     non-ordinal sort expression hoisted into a hidden inner column so
 *     sorting on base columns missing from the select list keeps working;
 *     LIMIT stays outside untouched. Multiple QUALIFYs (one per CTE) and
 *     QUALIFY in FROM-subqueries are handled by re-scanning until none
 *     remain.
 *  4. **`* EXCLUDE (a, b)` / `* EXCLUDE a` → `* EXCEPT (a, b)`** — Spark 4
 *     supports star-EXCEPT natively, so this is a keyword swap (plus
 *     parenthesizing the bare single-column form).
 *
 * All rewrites are identity on SQL that contains none of these constructs:
 * the scanner only edits where a construct is found, so Spark-dialect
 * templates pass through byte-for-byte. QUALIFY/EXCLUDE are reserved words
 * in the source dialect, so treating them as keywords cannot collide with
 * identifiers in assets written for it.
 */
object SqlDialect {

  /** Snowflake-dialect SQL → Spark SQL. Identity when the input is already
    * Spark SQL (modulo the double-quote rule — Spark-dialect text must use
    * single quotes for strings, as all repo templates do). Idempotent:
    * re-applying to already-rewritten text changes nothing. */
  def toSpark(sql: String): String =
    rewriteExclude(rewriteQualify(rewriteWindowInAggFilter(rewriteLikeEscapes(
      rewriteBareVarchar(rewriteObjectConstruct(translateFormats(
        unquoteUnitArgs(renameFunctions(
          quotedIdentifiersToBackticks(sql))))))))))

  // ------------------------------------------------------------- scanning

  /** Per-character classification: `code(i)` true when the char is plain
    * SQL text (not inside a string literal, quoted identifier, or comment);
    * `depth(i)` its paren depth, with both `(` and `)` carrying the INNER
    * depth (so the `)` closing a block has the block's depth). */
  private final class Scan(val code: Array[Boolean], val depth: Array[Int])

  private def scan(sql: String): Scan = {
    val n = sql.length
    val code = new Array[Boolean](n)
    val depth = new Array[Int](n)
    var d = 0
    var i = 0
    while (i < n) {
      depth(i) = d
      val c = sql.charAt(i)
      if (c == '\'') { // string literal: '' and \x escapes
        i += 1
        var done = false
        while (i < n && !done) {
          depth(i) = d
          val ch = sql.charAt(i)
          if (ch == '\\' && i + 1 < n) { depth(i + 1) = d; i += 1 }
          else if (ch == '\'' && i + 1 < n && sql.charAt(i + 1) == '\'') {
            depth(i + 1) = d; i += 1
          } else if (ch == '\'') done = true
          i += 1
        }
      } else if (c == '"' || c == '`') { // quoted identifier, "" / `` escapes
        i += 1
        var done = false
        while (i < n && !done) {
          depth(i) = d
          if (sql.charAt(i) == c) {
            if (i + 1 < n && sql.charAt(i + 1) == c) { depth(i + 1) = d; i += 1 }
            else done = true
          }
          i += 1
        }
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') { // -- comment
        while (i < n && sql.charAt(i) != '\n') { depth(i) = d; i += 1 }
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') { // /* */
        depth(i) = d; depth(i + 1) = d; i += 2
        while (i < n && !(sql.charAt(i) == '*' && i + 1 < n && sql.charAt(i + 1) == '/')) {
          depth(i) = d; i += 1
        }
        if (i < n) { depth(i) = d; i += 1 }
        if (i < n) { depth(i) = d; i += 1 }
      } else if (c == '(') { d += 1; depth(i) = d; code(i) = true; i += 1 }
      else if (c == ')') { depth(i) = d; d -= 1; code(i) = true; i += 1 }
      else { code(i) = true; i += 1 }
    }
    new Scan(code, depth)
  }

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_' || c == '$'

  /** Index of the closing quote of the string literal opening at `q`
    * (`sql(q) == '\''`), honoring `''` and backslash escapes — the same
    * walk as [[scan]], shared by the unit/format-literal rewrites so an
    * escaped quote inside the literal cannot truncate the edit. Returns -1
    * when the literal is unterminated. */
  private def literalEnd(sql: String, q: Int): Int = {
    var i = q + 1
    while (i < sql.length) {
      val ch = sql.charAt(i)
      if (ch == '\\' && i + 1 < sql.length) i += 2
      else if (ch == '\'' && i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 2
      else if (ch == '\'') return i
      else i += 1
    }
    -1
  }

  /** Whole-word, case-insensitive keyword match at `i`, in plain code. */
  private def keywordAt(sql: String, s: Scan, i: Int, kw: String): Boolean =
    i >= 0 && i + kw.length <= sql.length &&
      sql.regionMatches(true, i, kw, 0, kw.length) &&
      s.code(i) &&
      (i == 0 || !s.code(i - 1) || !isWordChar(sql.charAt(i - 1))) &&
      (i + kw.length == sql.length || !isWordChar(sql.charAt(i + kw.length)))

  /** Skip whitespace and comments forward from `i`. */
  private def nextSignificant(sql: String, i0: Int): Int = {
    var i = i0
    var more = true
    while (more && i < sql.length) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        while (i < sql.length && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
        i += 2
        while (i < sql.length && !(sql.charAt(i) == '*' && i + 1 < sql.length && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(i + 2, sql.length)
      } else more = false
    }
    i
  }

  // ------------------------------------------- 1. double-quoted identifiers

  /** `"Mixed Case"` → `` `Mixed Case` `` ("" unescapes to ", embedded
    * backticks double). Leaves single-quoted strings, backtick identifiers,
    * and comments untouched; identity when the input has no double quote.
    * Single state-machine pass over the text (same states as [[scan]]). */
  def quotedIdentifiersToBackticks(sql: String): String = {
    if (sql.indexOf('"') < 0) return sql
    val sb = new StringBuilder(sql.length + 8)
    var i = 0
    def copyUntil(end: Int): Unit = { sb.append(sql.substring(i, end)); i = end }
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') { // string literal — copy verbatim
        var j = i + 1
        var done = false
        while (j < sql.length && !done) {
          val ch = sql.charAt(j)
          if (ch == '\\' && j + 1 < sql.length) j += 1
          else if (ch == '\'' && j + 1 < sql.length && sql.charAt(j + 1) == '\'') j += 1
          else if (ch == '\'') done = true
          j += 1
        }
        copyUntil(j)
      } else if (c == '`') { // already-backticked identifier — copy verbatim
        var j = i + 1
        var done = false
        while (j < sql.length && !done) {
          if (sql.charAt(j) == '`') {
            if (j + 1 < sql.length && sql.charAt(j + 1) == '`') j += 1 else done = true
          }
          j += 1
        }
        copyUntil(j)
      } else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        var j = i
        while (j < sql.length && sql.charAt(j) != '\n') j += 1
        copyUntil(j)
      } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
        var j = i + 2
        while (j < sql.length && !(sql.charAt(j) == '*' && j + 1 < sql.length && sql.charAt(j + 1) == '/')) j += 1
        copyUntil(math.min(j + 2, sql.length))
      } else if (c == '"') { // quoted identifier — convert
        val content = new StringBuilder
        var j = i + 1
        var done = false
        while (j < sql.length && !done) {
          val ch = sql.charAt(j)
          if (ch == '"' && j + 1 < sql.length && sql.charAt(j + 1) == '"') {
            content.append('"'); j += 2
          } else if (ch == '"') { done = true; j += 1 }
          else { content.append(ch); j += 1 }
        }
        sb.append('`').append(content.toString.replace("`", "``")).append('`')
        i = j
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ----------------------------------------------------- 2. function names

  /** Source-dialect function names Spark lacks, mapped to
    * argument-compatible Spark builtins. `DATE_FROM_PARTS(y, m, d)` →
    * `MAKE_DATE(y, m, d)` covers the six-frequency period view
    * (ref: report_period_config.sql:177-186, six uses); `GETDATE()` →
    * `CURRENT_TIMESTAMP()` covers the test-case generator's emitted
    * last-7-days templates (ref: tools/sql_test_case_generator.py:75-146,
    * eight uses). */
  private val FnRenames =
    Seq("CHARINDEX" -> "POSITION", "DATE_FROM_PARTS" -> "MAKE_DATE",
      "GETDATE" -> "CURRENT_TIMESTAMP")

  /** Rename source-dialect function names Spark lacks to argument-compatible
    * Spark builtins (only when followed by an open paren). */
  def renameFunctions(sql0: String): String = {
    var sql = sql0
    FnRenames.foreach { case (from, to) =>
      var changed = true
      while (changed) {
        changed = false
        val s = scan(sql)
        var i = 0
        while (i < sql.length && !changed) {
          if (keywordAt(sql, s, i, from) &&
              nextSignificant(sql, i + from.length) < sql.length &&
              sql.charAt(nextSignificant(sql, i + from.length)) == '(') {
            sql = sql.substring(0, i) + to + sql.substring(i + from.length)
            changed = true
          }
          i += 1
        }
      }
    }
    sql
  }

  // ------------------------------------------------- 2b. function surfaces

  /** Datetime units the source dialect quotes (`DATEADD('day', ...)`, 34
    * uses in the reference's feed SQL) mapped to the bare identifiers
    * Spark's DATEADD/DATEDIFF require, including the dialect's short
    * aliases. Unknown unit strings are left untouched. */
  private val DatetimeUnits: Map[String, String] = {
    val full = Seq("year", "quarter", "month", "week", "day", "dayofyear",
      "hour", "minute", "second", "millisecond", "microsecond")
    val aliases = Map(
      "yyyy" -> "year", "yy" -> "year", "qq" -> "quarter", "q" -> "quarter",
      "mm" -> "month", "mon" -> "month", "wk" -> "week", "ww" -> "week",
      "dd" -> "day", "d" -> "day", "hh" -> "hour", "mi" -> "minute",
      "ss" -> "second", "s" -> "second", "ms" -> "millisecond",
      "us" -> "microsecond")
    full.map(u => u -> u).toMap ++ aliases
  }

  private val UnitFns = Seq("DATEADD", "DATEDIFF", "TIMESTAMPADD", "TIMESTAMPDIFF")

  /** `DATEADD('day', x, y)` → `DATEADD(day, x, y)` — Spark requires a bare
    * unit identifier where the source dialect also accepts a string. */
  def unquoteUnitArgs(sql0: String): String = {
    var sql = sql0
    var changed = true
    while (changed) {
      changed = false
      val s = scan(sql)
      var i = 0
      while (i < sql.length && !changed) {
        if (UnitFns.exists(f => keywordAt(sql, s, i, f))) {
          val fn = UnitFns.find(f => keywordAt(sql, s, i, f)).get
          val po = nextSignificant(sql, i + fn.length)
          if (po < sql.length && sql.charAt(po) == '(') {
            val a = nextSignificant(sql, po + 1)
            if (a < sql.length && sql.charAt(a) == '\'') {
              val close = literalEnd(sql, a)
              if (close > a) {
                DatetimeUnits.get(sql.substring(a + 1, close).trim.toLowerCase) match {
                  case Some(unit) =>
                    sql = sql.substring(0, a) + unit + sql.substring(close + 1)
                    changed = true
                  case None => // not a unit string — leave it alone
                }
              }
            }
          }
        }
        i += 1
      }
    }
    sql
  }

  /** Datetime format tokens of the source dialect (`TO_CHAR(ts,
    * 'MM/DD/YYYY')`, six uses in the reference's report SQL) mapped to
    * Spark's pattern letters — in Spark `DD` is day-of-YEAR and `MI` is
    * unknown, so the literal cannot be shared verbatim. Longest token
    * first; anything unmatched copies through (separators, numeric `9`
    * masks). Matching is CASE-SENSITIVE on the dialect's conventional
    * UPPERCASE spellings: lowercase tokens are taken as already-Spark,
    * which keeps the rewrite idempotent ('MI'→'mm' must not then read
    * 'mm' as month). */
  private val FormatTokens: Seq[(String, String)] = Seq(
    "MONTH" -> "MMMM", "HH24" -> "HH", "HH12" -> "hh", "YYYY" -> "yyyy",
    "FF3" -> "SSS", "MON" -> "MMM", "DY" -> "EEE", "YY" -> "yy",
    "MM" -> "MM", "DD" -> "dd", "HH" -> "HH", "MI" -> "mm", "SS" -> "ss",
    "AM" -> "a", "PM" -> "a")

  private val FormatFns =
    Seq("TO_CHAR", "TO_VARCHAR", "TO_DATE", "TRY_TO_DATE", "TO_TIMESTAMP",
      "TRY_TO_TIMESTAMP")

  private def translateFormatLiteral(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      FormatTokens.find { case (tok, _) =>
        fmt.regionMatches(false, i, tok, 0, tok.length)
      } match {
        case Some((tok, rep)) => sb.append(rep); i += tok.length
        case None => sb.append(fmt.charAt(i)); i += 1
      }
    }
    sb.toString
  }

  /** Rewrite the second-argument format literal of TO_CHAR/TO_DATE/... from
    * source-dialect tokens to Spark pattern letters. Only touches string
    * literals in that exact position. */
  def translateFormats(sql0: String): String = {
    var sql = sql0
    var i = 0
    var s = scan(sql)
    while (i < sql.length) {
      val fn = FormatFns.find(f => keywordAt(sql, s, i, f))
      if (fn.isDefined) {
        val po = nextSignificant(sql, i + fn.get.length)
        if (po < sql.length && sql.charAt(po) == '(') {
          val d = s.depth(po)
          // find the first comma at the call's depth, then a string literal
          var c = po + 1
          while (c < sql.length && !(s.code(c) && s.depth(c) == d &&
            (sql.charAt(c) == ',' || sql.charAt(c) == ')'))) c += 1
          if (c < sql.length && sql.charAt(c) == ',') {
            val a = nextSignificant(sql, c + 1)
            if (a < sql.length && sql.charAt(a) == '\'') {
              val close = literalEnd(sql, a)
              if (close > a) {
                val translated = translateFormatLiteral(sql.substring(a + 1, close))
                if (translated != sql.substring(a + 1, close)) {
                  sql = sql.substring(0, a + 1) + translated + sql.substring(close)
                  s = scan(sql) // indices after the edit shift
                }
              }
            }
          }
        }
      }
      i += 1
    }
    sql
  }

  /** `OBJECT_CONSTRUCT(k1, v1, ...)` → `to_json(named_struct(k1, v1, ...))`
    * — the engine's established mapping for the source dialect's JSON
    * object constructor (semi-structured §2.8, q24). */
  def rewriteObjectConstruct(sql0: String): String = {
    var sql = sql0
    var changed = true
    while (changed) {
      changed = false
      val s = scan(sql)
      var i = 0
      while (i < sql.length && !changed) {
        if (keywordAt(sql, s, i, "OBJECT_CONSTRUCT")) {
          val nameEnd = i + "OBJECT_CONSTRUCT".length
          val po = nextSignificant(sql, nameEnd)
          if (po < sql.length && sql.charAt(po) == '(') {
            val d = s.depth(po)
            var close = po + 1
            while (close < sql.length &&
              !(s.code(close) && sql.charAt(close) == ')' && s.depth(close) == d)) close += 1
            require(close < sql.length, s"unbalanced OBJECT_CONSTRUCT at offset $i")
            sql = sql.substring(0, i) + "to_json(named_struct" +
              sql.substring(nameEnd, close + 1) + ")" + sql.substring(close + 1)
            changed = true
          }
        }
        i += 1
      }
    }
    sql
  }

  // --------------------------------------------- 2c. bare VARCHAR / LIKE

  /** Bare `VARCHAR` (no length) → `STRING`: the source dialect's
    * length-free VARCHAR means "maximum length", while Spark's parser
    * requires a length parameter (DATATYPE_MISSING_SIZE) —
    * `CAST(NULL AS VARCHAR)`, six uses in the reference's period view
    * (ref: report_period_config.sql:155-187). `VARCHAR(50)` parses
    * natively in Spark and is left alone. */
  def rewriteBareVarchar(sql0: String): String = {
    var sql = sql0
    var changed = true
    while (changed) {
      changed = false
      val s = scan(sql)
      var i = 0
      while (i < sql.length && !changed) {
        if (keywordAt(sql, s, i, "VARCHAR")) {
          val after = nextSignificant(sql, i + "VARCHAR".length)
          if (after >= sql.length || sql.charAt(after) != '(') {
            sql = sql.substring(0, i) + "STRING" + sql.substring(i + "VARCHAR".length)
            changed = true
          }
        }
        i += 1
      }
    }
    sql
  }

  /** Backslashes in `LIKE`/`ILIKE` pattern literals: the source dialect has
    * NO default LIKE escape character, so a backslash in the pattern matches
    * a literal backslash (`"Modified By" LIKE '%\\%'` finds DOMAIN\user
    * prefixes, ref: test_data_quality.sql:231); Spark's LIKE treats `\` as
    * the default escape, silently turning that pattern into "ends with %".
    * Rewrite: when a LIKE/ILIKE pattern literal contains a (raw) `\\` pair
    * and carries no ESCAPE clause, double each pair and append an explicit
    * `ESCAPE '\'` — Spark then matches the literal backslash, and the
    * appended clause marks the pattern as already-rewritten so the pass
    * stays idempotent. Patterns with an explicit ESCAPE clause, or with no
    * backslash at all, pass through byte-for-byte. */
  def rewriteLikeEscapes(sql0: String): String = {
    var sql = sql0
    var changed = true
    while (changed) {
      changed = false
      val s = scan(sql)
      var i = 0
      while (i < sql.length && !changed) {
        if (keywordAt(sql, s, i, "LIKE") || keywordAt(sql, s, i, "ILIKE")) {
          val kwLen = if (keywordAt(sql, s, i, "ILIKE")) 5 else 4
          val a = nextSignificant(sql, i + kwLen)
          if (a < sql.length && sql.charAt(a) == '\'') {
            val close = literalEnd(sql, a)
            if (close > a) {
              val raw = sql.substring(a + 1, close)
              val afterLit = nextSignificant(sql, close + 1)
              val hasEscape = keywordAt(sql, s, afterLit, "ESCAPE")
              // a concatenated pattern (`LIKE '...' || x`) binds the || into
              // the pattern expression — splicing ESCAPE after the first
              // literal would break it; leave composite patterns alone
              val isConcat = sql.regionMatches(afterLit, "||", 0, 2)
              if (!hasEscape && !isConcat && raw.contains("\\\\")) {
                // the ESCAPE literal is '\\' in raw SQL text (Spark's
                // literal parser reduces it to one backslash; a lone '\''
                // would read as an escaped quote and break the statement)
                val doubled = raw.replace("\\\\", "\\\\\\\\")
                sql = sql.substring(0, a + 1) + doubled + "' ESCAPE '\\\\'" +
                  sql.substring(close + 1)
                changed = true
              }
            }
          }
        }
        i += 1
      }
    }
    sql
  }

  // ----------------------------------------------------- session variables

  /** `$NAME` → value, matched case-insensitively and ONLY outside string
    * literals, quoted identifiers, and comments — the source warehouse
    * expands session variables in SQL text but never inside a literal, so a
    * message string embedding `[$REPORT_START_DT ...]` must survive
    * verbatim (ref: test_data_quality.sql:252). Names not in `vars` pass
    * through untouched. */
  def substituteSessionVars(sql: String, vars: Map[String, String]): String = {
    if (vars.isEmpty || sql.indexOf('$') < 0) return sql
    // normalize map keys once: `$var` matches case-insensitively regardless
    // of the CALLER's key case too — external callers (SqlTemplate.render,
    // TestFramework.run) pass user maps that may hold lowercase names, and
    // a lookup keyed only on pre-uppercased entries would silently skip them
    val uv = vars.map { case (k, v) => k.toUpperCase -> v }
    val s = scan(sql)
    val sb = new StringBuilder(sql.length)
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '$' && s.code(i) && i + 1 < sql.length &&
          (sql.charAt(i + 1).isLetter || sql.charAt(i + 1) == '_')) {
        var j = i + 1
        while (j < sql.length &&
          (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_')) j += 1
        uv.get(sql.substring(i + 1, j).toUpperCase) match {
          case Some(v) => sb.append(v); i = j
          case None => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ------------------------------------------------------------ 3. QUALIFY

  /** Clause keywords that end a QUALIFY predicate at the same depth. */
  private val QualifyStoppers =
    Seq("ORDER", "LIMIT", "FETCH", "OFFSET", "UNION", "INTERSECT", "EXCEPT", "MINUS", "WINDOW")

  def rewriteQualify(sql0: String): String = {
    var sql = sql0
    var counter = 0
    var guard = 0
    while (guard < 10000) {
      guard += 1
      val s = scan(sql)
      var qi = -1
      var i = 0
      while (i < sql.length && qi < 0) {
        if (keywordAt(sql, s, i, "QUALIFY")) qi = i
        i += 1
      }
      if (qi < 0) return sql
      val d = s.depth(qi)

      // nearest SELECT at the same depth before the QUALIFY
      var selStart = -1
      i = 0
      while (i < qi) {
        if (s.depth(i) == d && keywordAt(sql, s, i, "SELECT")) selStart = i
        i += 1
      }
      require(selStart >= 0, s"QUALIFY without an enclosing SELECT (offset $qi)")

      // the select's FROM at the same depth
      var fromIdx = -1
      i = selStart
      while (i < qi && fromIdx < 0) {
        if (s.depth(i) == d && keywordAt(sql, s, i, "FROM")) fromIdx = i
        i += 1
      }
      require(fromIdx >= 0, s"QUALIFY requires a FROM clause (offset $qi)")

      // optional DISTINCT / ALL set quantifier right after SELECT
      var listStart = selStart + "SELECT".length
      var distinct = false
      locally {
        val j = nextSignificant(sql, listStart)
        if (keywordAt(sql, s, j, "DISTINCT")) { distinct = true; listStart = j + "DISTINCT".length }
        else if (keywordAt(sql, s, j, "ALL")) listStart = j + "ALL".length
      }

      // predicate span: QUALIFY .. first same-depth stopper / closing paren /
      // statement end
      val predStart = qi + "QUALIFY".length
      var predEnd = sql.length
      i = predStart
      while (i < sql.length && predEnd == sql.length) {
        if (s.code(i)) {
          val c = sql.charAt(i)
          if ((c == ')' && s.depth(i) == d) || c == ';') predEnd = i
          else if (s.depth(i) == d && QualifyStoppers.exists(k => keywordAt(sql, s, i, k)))
            predEnd = i
        }
        i += 1
      }
      val pred = sql.substring(predStart, predEnd).trim
      require(pred.nonEmpty, s"empty QUALIFY predicate (offset $qi)")

      val qcol = s"__qualify_$counter"

      // a trailing ORDER BY may sort on base columns that are NOT in the
      // select list (legal in the source dialect and in plain Spark) — the
      // wrap would hide them, so HOIST each non-ordinal sort expression into
      // a hidden inner column and sort the outer query on that. Ordinals
      // pass through (star-EXCEPT preserves the original column positions).
      // Not under DISTINCT: there ORDER BY may only use selected columns
      // (standard SQL), and a sort above Distinct cannot see hidden ones —
      // the original clause is left in place.
      var tailFrom = predEnd // original text to append after the wrap
      val ordCols = scala.collection.mutable.ArrayBuffer.empty[String] // hidden col defs
      var outerOrder = "" // rewritten ORDER BY clause, empty if none
      if (!distinct && predEnd < sql.length && keywordAt(sql, s, predEnd, "ORDER")) {
        val by = nextSignificant(sql, predEnd + "ORDER".length)
        require(keywordAt(sql, s, by, "BY"), s"ORDER without BY (offset $predEnd)")
        // each item runs to a same-depth comma or the clause end
        val items = scala.collection.mutable.ArrayBuffer.empty[String]
        var p = by + "BY".length
        var itemStart = p
        var clauseEnd = sql.length
        var scanning = true
        while (p <= sql.length && scanning) {
          val atEnd = p == sql.length
          val stop = !atEnd && s.code(p) && ((sql.charAt(p) == ')' && s.depth(p) == d) ||
            sql.charAt(p) == ';' ||
            (s.depth(p) == d && Seq("LIMIT", "FETCH", "OFFSET", "UNION", "INTERSECT", "EXCEPT", "MINUS")
              .exists(k => keywordAt(sql, s, p, k))))
          if (atEnd || stop) {
            items += sql.substring(itemStart, p)
            clauseEnd = p
            scanning = false
          } else if (s.code(p) && sql.charAt(p) == ',' && s.depth(p) == d) {
            items += sql.substring(itemStart, p)
            itemStart = p + 1
          }
          p += 1
        }
        val rewritten = items.zipWithIndex.map { case (item, ix) =>
          // split the trailing direction words (ASC/DESC/NULLS FIRST|LAST)
          // off the sort expression
          val dirRe = "(?is)\\s+(asc|desc|nulls\\s+first|nulls\\s+last)\\s*$".r
          var expr = item.trim
          var dir = ""
          var more = true
          while (more) dirRe.findFirstMatchIn(expr) match {
            case Some(m) => dir = " " + m.group(1).toUpperCase + dir
              expr = expr.substring(0, m.start)
            case None => more = false
          }
          if (expr.matches("\\d+")) item.trim // ordinal — positions survive EXCEPT
          else {
            val oc = s"${qcol}_ord_$ix"
            ordCols += s", ($expr\n) AS $oc"
            oc + dir
          }
        }
        outerOrder = " ORDER BY " + rewritten.mkString(", ")
        tailFrom = clauseEnd
      }

      counter += 1
      // raw (untrimmed) slices + added newlines so a trailing line comment in
      // the select list or predicate cannot swallow the inserted text
      val selectList = sql.substring(listStart, fromIdx)
      val body = sql.substring(fromIdx, qi)
      val exceptList = (qcol +: ordCols.indices.map(ix => s"${qcol}_ord_$ix")).mkString(", ")
      val inner = s"SELECT $selectList\n, (${sql.substring(predStart, predEnd)}\n) AS $qcol" +
        ordCols.mkString("") + s"\n$body"
      val outer =
        s"SELECT ${if (distinct) "DISTINCT " else ""}* EXCEPT ($exceptList) FROM (\n$inner) WHERE $qcol$outerOrder\n"
      sql = sql.substring(0, selStart) + outer + sql.substring(tailFrom)
    }
    throw new IllegalStateException("QUALIFY rewrite did not terminate")
  }

  // ------------------------------------- window inside an aggregate FILTER

  /** Keywords that would change what rows an empty-frame window sees if the
    * window were hoisted below them — their presence vetoes the rewrite. */
  private val WindowFilterVetoes = Seq("WHERE", "GROUP", "HAVING", "QUALIFY")

  /**
   * `AGG(x) OVER ()` inside an aggregate's `FILTER (WHERE …)` clause →
   * hoisted into a derived table, so the filter predicate references plain
   * columns:
   *
   * {{{
   *   SELECT COUNT(*) FILTER (WHERE d > AVG(d) OVER ()) FROM t
   *   -- becomes
   *   SELECT COUNT(*) FILTER (WHERE d > __win_flt_0)
   *   FROM (SELECT *, AVG(d) OVER () AS __win_flt_0 FROM t)
   * }}}
   *
   * This is the reference's DQ-021 shape (3-sigma outlier count,
   * ref: sql/new_rfb_and_total_claimants_active/test_data_quality.sql:300)
   * — a statement NO engine runs as written (Spark rejects the window in an
   * aggregate filter, the source warehouse has no aggregate FILTER clause
   * at all), whose evident intent is "count rows beyond a whole-input
   * statistic": exactly the two-pass form `DqSuite` computes natively. The
   * rewrite only fires for a whole-input window (`OVER ()`) whose SELECT
   * has no WHERE/GROUP BY/HAVING/QUALIFY (those would change the window's
   * row set when hoisted — such statements are left as-is and keep failing
   * loudly in Spark). One window per pass; several windows in one filter
   * nest derived tables (inner columns stay visible through `*`).
   * Idempotent: rewritten text has no window left inside a filter.
   */
  def rewriteWindowInAggFilter(sql0: String): String = {
    var sql = sql0
    var counter = 0
    var guard = 0
    while (guard < 1000) {
      guard += 1
      val s = scan(sql)

      // the last index p < i with an OPEN paren enclosing i (depth match)
      def enclosingOpen(i: Int): Int = {
        val dv = s.depth(i)
        var p = i - 1
        while (p >= 0 && !(s.code(p) && sql.charAt(p) == '(' && s.depth(p) == dv))
          p -= 1
        p
      }
      // last significant code char before i (skipping whitespace/comments)
      def prevSignificant(i0: Int): Int = {
        var p = i0 - 1
        while (p >= 0 && (!s.code(p) || sql.charAt(p).isWhitespace)) p -= 1
        p
      }
      // is offset i inside a `FILTER ( … )` group (walking outward)?
      def insideFilter(i: Int): Boolean = {
        var cur = i
        while (s.depth(cur) > 0) {
          val open = enclosingOpen(cur)
          if (open < 0) return false
          val before = prevSignificant(open)
          if (before >= 0) {
            val wordStart = {
              var w = before
              while (w >= 0 && s.code(w) && isWordChar(sql.charAt(w))) w -= 1
              w + 1
            }
            if (keywordAt(sql, s, wordStart, "FILTER")) return true
          }
          cur = open - 1
          if (cur < 0) return false
        }
        false
      }

      // find the first `<fn>( … ) OVER ()` that sits inside a FILTER group
      var winStart = -1 // start of the aggregate function name
      var winEnd = -1 // one past OVER's closing paren
      var i = 0
      while (i < sql.length && winStart < 0) {
        if (keywordAt(sql, s, i, "OVER")) {
          val j = nextSignificant(sql, i + "OVER".length)
          if (j < sql.length && s.code(j) && sql.charAt(j) == '(') {
            val k = nextSignificant(sql, j + 1)
            if (k < sql.length && s.code(k) && sql.charAt(k) == ')' &&
                insideFilter(i)) {
              // window expr = the call whose args close right before OVER;
              // ')' and its matching '(' both carry the INNER depth, so
              // enclosingOpen finds the match (inner parens sit deeper)
              val argClose = prevSignificant(i)
              if (argClose >= 0 && sql.charAt(argClose) == ')') {
                val argOpen = enclosingOpen(argClose)
                if (argOpen > 0) {
                  var w = argOpen - 1
                  while (w >= 0 && s.code(w) && isWordChar(sql.charAt(w))) w -= 1
                  if (w + 1 < argOpen) { winStart = w + 1; winEnd = k + 1 }
                }
              }
            }
          }
        }
        i += 1
      }
      if (winStart < 0) return sql

      // the enclosing SELECT: nearest preceding SELECT whose depth equals
      // the depth of the FILTER keyword itself (select-list level)
      var filterKw = -1
      locally { // re-find the owning FILTER keyword for its depth
        var cur = winStart
        var foundAt = -1
        while (foundAt < 0 && cur >= 0 && s.depth(cur) > 0) {
          val open = enclosingOpen(cur)
          if (open < 0) cur = -1
          else {
            val before = prevSignificant(open)
            var wStart = before
            while (wStart >= 0 && s.code(wStart) && isWordChar(sql.charAt(wStart)))
              wStart -= 1
            wStart += 1
            if (keywordAt(sql, s, wStart, "FILTER")) foundAt = wStart
            else cur = open - 1
          }
        }
        filterKw = foundAt
      }
      require(filterKw >= 0, s"window-in-filter lost its FILTER (offset $winStart)")
      val sd = s.depth(filterKw)
      var selStart = -1
      i = 0
      while (i < filterKw) {
        if (s.depth(i) == sd && keywordAt(sql, s, i, "SELECT")) selStart = i
        i += 1
      }
      if (selStart < 0) return sql // malformed — leave for Spark's error

      // the select's FROM at the same depth, after the filter
      var fromIdx = -1
      i = selStart
      while (i < sql.length && fromIdx < 0) {
        if (s.depth(i) == sd && keywordAt(sql, s, i, "FROM")) fromIdx = i
        i += 1
      }
      if (fromIdx < 0) return sql
      // the FILTER must sit in the SELECT LIST (before FROM): a windowed
      // filter after the FROM (e.g. inside ORDER BY) has no hoist target —
      // leave the statement as written to fail loudly in Spark, rather
      // than splicing substrings backwards
      if (fromIdx < winEnd) return sql

      // FROM body runs to the subquery's close / statement end / a clause
      // keyword; WHERE/GROUP/HAVING/QUALIFY veto the hoist (semantics)
      val bodyStart = fromIdx + "FROM".length
      var bodyEnd = sql.length
      i = bodyStart
      while (i < sql.length && bodyEnd == sql.length) {
        if (s.code(i)) {
          val c = sql.charAt(i)
          if ((c == ')' && s.depth(i) == sd) || c == ';') bodyEnd = i
          else if (s.depth(i) == sd &&
              (QualifyStoppers ++ WindowFilterVetoes)
                .exists(k => keywordAt(sql, s, i, k))) {
            if (WindowFilterVetoes.exists(k => keywordAt(sql, s, i, k)))
              return sql // veto: hoisting would change the window's rows
            bodyEnd = i
          }
        }
        i += 1
      }

      val winText = sql.substring(winStart, winEnd)
      val colName = s"__win_flt_$counter"
      counter += 1
      val fromBody = sql.substring(bodyStart, bodyEnd)
      // right-to-left surgery: wrap the FROM first, then swap the window
      sql = sql.substring(0, winStart) + colName +
        sql.substring(winEnd, bodyStart) +
        s" (SELECT *, $winText AS $colName FROM $fromBody\n) " +
        sql.substring(bodyEnd)
    }
    throw new IllegalStateException("window-in-filter rewrite did not terminate")
  }

  // ------------------------------------------------------------ 4. EXCLUDE

  /** `* EXCLUDE (a, b)` / `t.* EXCLUDE a` → `* EXCEPT (a, b)`. */
  def rewriteExclude(sql0: String): String = {
    var sql = sql0
    var changed = true
    while (changed) {
      changed = false
      val s = scan(sql)
      var i = 0
      while (i < sql.length && !changed) {
        if (s.code(i) && sql.charAt(i) == '*') {
          val j = nextSignificant(sql, i + 1)
          if (j < sql.length && keywordAt(sql, s, j, "EXCLUDE")) {
            val afterKw = j + "EXCLUDE".length
            val k = nextSignificant(sql, afterKw)
            if (k < sql.length && sql.charAt(k) == '(') {
              sql = sql.substring(0, j) + "EXCEPT" + sql.substring(afterKw)
            } else {
              // bare single-column form: consume one identifier — plain or
              // backticked (double quotes were already converted), possibly
              // dot-qualified (t.a)
              var e = k
              var more = true
              while (more) {
                val segStart = e
                if (e < sql.length && sql.charAt(e) == '`') {
                  e += 1
                  var done = false
                  while (e < sql.length && !done) {
                    if (sql.charAt(e) == '`') {
                      if (e + 1 < sql.length && sql.charAt(e + 1) == '`') e += 1 else done = true
                    }
                    e += 1
                  }
                } else {
                  while (e < sql.length && isWordChar(sql.charAt(e))) e += 1
                }
                require(e > segStart, s"EXCLUDE without a column list (offset $j)")
                if (e < sql.length && sql.charAt(e) == '.') e += 1
                else more = false
              }
              sql = sql.substring(0, j) + "EXCEPT (" + sql.substring(k, e) + ")" + sql.substring(e)
            }
            changed = true
          }
        }
        i += 1
      }
    }
    sql
  }
}
