package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{GraftConnection, SessionVars, SqlTemplate}

class CoreSpec extends AnyFunSuite with SparkSpec {

  test("render substitutes placeholders case-insensitively") {
    val out = SqlTemplate.render("SELECT * FROM {{ source_table }}",
      placeholders = Map("SOURCE_TABLE" -> "t1"))
    assert(out == "SELECT * FROM t1")
  }

  test("unbound placeholder raises") {
    intercept[IllegalArgumentException] {
      SqlTemplate.render("SELECT {{NOPE}}")
    }
  }

  test("AND/WHERE_CONDITION render conditionally") {
    val t = "SELECT 1 {{WHERE_CONDITION}}"
    assert(SqlTemplate.render(t) == "SELECT 1 ")
    assert(SqlTemplate.render(t, incrementalPredicate = Some("x > 1")) ==
      "SELECT 1 WHERE x > 1")
    val t2 = "WHERE 1=1 {{AND_CONDITION}}"
    assert(SqlTemplate.render(t2, incrementalPredicate = Some("x > 1")) ==
      "WHERE 1=1 AND x > 1")
  }

  test("session vars substitute longest-name-first with word boundary") {
    val out = SqlTemplate.renderSessionVars(
      "BETWEEN $REPORT_START AND $REPORT_START_DT",
      Map("REPORT_START" -> "'a'", "REPORT_START_DT" -> "'b'"))
    assert(out == "BETWEEN 'a' AND 'b'")
  }

  test("SessionVars quotes strings and upper-cases names") {
    val v = new SessionVars
    v.setString("carrier", "O'Neill")
    assert(v.get("CARRIER").contains("'O''Neill'"))
  }

  test("GraftConnection sql + executeMultipleStatements use session vars") {
    val conn = new GraftConnection(spark)
    conn.sessionVars.set("N", "41")
    val out = conn.executeMultipleStatements(
      "SELECT 1 AS a; SELECT $N + 1 AS n")
    assert(out.head.getInt(0) == 42)
  }

  test("statement splitting honors quoted semicolons, '' escapes, comments") {
    assert(GraftConnection.splitStatements("SELECT 'a;b' AS x; SELECT 2") ==
      Seq("SELECT 'a;b' AS x", "SELECT 2"))
    assert(GraftConnection.splitStatements("SELECT 'it''s;fine'") ==
      Seq("SELECT 'it''s;fine'"))
    assert(GraftConnection.splitStatements("SELECT 1 -- trailing; not a split\n; SELECT 2") ==
      Seq("SELECT 1 -- trailing; not a split", "SELECT 2"))
    val conn = new GraftConnection(spark)
    assert(conn.executeMultipleStatements("SELECT 'x;y' AS v").head.getString(0) == "x;y")
  }

  test("obfuscation round-trips credentials incl. unicode") {
    import graft.core.Obfuscation
    val creds = Map("user" -> "svc_account", "password" -> "p@ss/wörd=+")
    val enc = Obfuscation.encodeMap(creds)
    assert(enc("password") != creds("password"))
    assert(Obfuscation.decodeMap(enc) == creds)
  }

  test("saveAsTable modes: errorifexists then overwrite then append") {
    import spark.implicits._
    val conn = new GraftConnection(spark)
    val name = "core_spec_t1"
    conn.dropTable(name)
    conn.saveAsTable(Seq(1).toDF("x"), name)
    intercept[Exception] { conn.saveAsTable(Seq(2).toDF("x"), name) }
    conn.saveAsTable(Seq(2).toDF("x"), name, mode = "overwrite")
    conn.saveAsTable(Seq(3).toDF("x"), name, mode = "append")
    assert(conn.table(name).collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    assert(conn.tableExists(name))
    conn.truncateTable(name)
    assert(conn.table(name).count() == 0)
    conn.dropTable(name)
    assert(!conn.tableExists(name))
  }
}
