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
    assert(out.head().getInt(0) == 42)
  }

  test("statement splitting honors quoted semicolons, '' escapes, comments") {
    assert(GraftConnection.splitStatements("SELECT 'a;b' AS x; SELECT 2") ==
      Seq("SELECT 'a;b' AS x", "SELECT 2"))
    assert(GraftConnection.splitStatements("SELECT 'it''s;fine'") ==
      Seq("SELECT 'it''s;fine'"))
    assert(GraftConnection.splitStatements("SELECT 1 -- trailing; not a split\n; SELECT 2") ==
      Seq("SELECT 1 -- trailing; not a split", "SELECT 2"))
    val conn = new GraftConnection(spark)
    assert(conn.executeMultipleStatements("SELECT 'x;y' AS v").head().getString(0) == "x;y")
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

  test("table types: temporary is session-scoped, transient is tagged") {
    import spark.implicits._
    val conn = new GraftConnection(spark)

    // temporary: a materialized temp view honoring the mode axis
    conn.saveAsTable(Seq(1).toDF("x"), "core_tmp1", tableType = "temporary")
    assert(spark.catalog.listTables()
      .filter("name = 'core_tmp1'").head().isTemporary)
    intercept[Exception] {
      conn.saveAsTable(Seq(2).toDF("x"), "core_tmp1", tableType = "temporary")
    }
    conn.saveAsTable(Seq(2).toDF("x"), "core_tmp1", mode = "append", tableType = "temporary")
    assert(conn.table("core_tmp1").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    conn.saveAsTable(Seq(9).toDF("x"), "core_tmp1", mode = "ignore", tableType = "temporary")
    assert(conn.table("core_tmp1").count() == 2)
    conn.saveAsTable(Seq(9).toDF("x"), "core_tmp1", mode = "overwrite", tableType = "temporary")
    assert(conn.table("core_tmp1").collect().map(_.getInt(0)).toSeq == Seq(9))
    conn.dropTable("core_tmp1")
    assert(!conn.tableExists("core_tmp1"))

    // transient: a real table carrying the durability-intent property
    conn.dropTable("core_trans1")
    conn.saveAsTable(Seq(1).toDF("x"), "core_trans1", tableType = "transient")
    val props = spark.sql("SHOW TBLPROPERTIES core_trans1").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.table_type").contains("transient"))
    conn.dropTable("core_trans1")
  }

  test("temp tables shadow permanent ones; drops and upserts respect the shadow") {
    import spark.implicits._
    val conn = new GraftConnection(spark)
    // permanent "core_shadow" + temp view of the same name
    conn.dropTable("core_shadow"); conn.dropTable("core_shadow")
    conn.saveAsTable(Seq(1).toDF("x"), "core_shadow")
    conn.saveAsTable(Seq(99).toDF("x"), "core_shadow", mode = "overwrite",
      tableType = "temporary")
    assert(conn.table("core_shadow").head().getInt(0) == 99, "temp shadows permanent")
    // first drop removes ONLY the temp; the permanent table survives
    conn.dropTable("core_shadow")
    assert(conn.table("core_shadow").head().getInt(0) == 1)
    conn.dropTable("core_shadow")
    assert(!conn.tableExists("core_shadow"))

    // upsertFromQuery on a TEMP target must update the view, not write a
    // shadowed permanent table
    conn.saveAsTable(Seq((1, 10)).toDF("k", "m"), "core_tmp_target",
      tableType = "temporary")
    val r = conn.upsertFromQuery(
      "SELECT * FROM VALUES (1, 11), (2, 20) AS s(k, m)",
      "core_tmp_target", joinKeys = Seq("k"))
    assert(r.updated == 1 && r.inserted == 1)
    assert(conn.table("core_tmp_target").orderBy("k").collect()
      .map(x => (x.getInt(0), x.getInt(1))).toSeq == Seq((1, 11), (2, 20)))
    conn.dropTable("core_tmp_target")

    // staging cleanup must not destroy a same-named PERMANENT table
    conn.dropTable("core_stage_perm")
    conn.saveAsTable(Seq(7).toDF("x"), "core_stage_perm")
    conn.dropTable("core_upsert_t2"); conn.saveAsTable(Seq((1, "a")).toDF("k", "v"), "core_upsert_t2")
    conn.upsertFromQuery("SELECT * FROM VALUES (2, 'b') AS s(k, v)",
      "core_upsert_t2", joinKeys = Seq("k"), tempTableName = Some("core_stage_perm"))
    assert(conn.tableExists("core_stage_perm") &&
      conn.table("core_stage_perm").head().getInt(0) == 7,
      "permanent table with the staging name must survive cleanup")
    conn.dropTable("core_stage_perm"); conn.dropTable("core_upsert_t2")
  }

  test("upsertFromQuery: render, stage temp, merge, rewrite target") {
    import spark.implicits._
    val conn = new GraftConnection(spark)
    conn.dropTable("core_upsert_t")
    conn.saveAsTable(Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "m"), "core_upsert_t")
    conn.sessionVars.setString("NEW_V", "z")
    val r = conn.upsertFromQuery(
      "SELECT * FROM VALUES (2, $NEW_V, 99), (3, $NEW_V, 30) AS s(k, v, m)",
      "core_upsert_t", joinKeys = Seq("k"),
      tempTableName = Some("core_upsert_stage"))
    assert(r.updated == 1 && r.inserted == 1 && r.deleted == 0)
    assert(!conn.tableExists("core_upsert_stage"), "staging temp table dropped")
    val rows = conn.table("core_upsert_t").orderBy("k").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getInt(2))).toSeq
    assert(rows == Seq((1, "a", 10), (2, "z", 99), (3, "z", 30)))
    conn.dropTable("core_upsert_t")
  }

  test("SET with a trailing line comment stores the literal, not the comment") {
    val conn = new GraftConnection(spark)
    // evaluable RHS: the comment must not swallow the closing paren of the
    // scalar-SELECT eval (regression: the fallback then stored the comment
    // text inside the variable, corrupting every later splice)
    conn.sql("SET rv = 42 -- the answer")
    assert(conn.sessionVars.get("rv").contains("42"))
    conn.sql("SET rs = 'a' || 'b' -- concat")
    assert(conn.sessionVars.get("rs").contains("'ab'"))
    // unevaluable RHS: the fallback stores the text COMMENT-FREE
    conn.sql("SET rb = not_a_column_at_all -- junk /* more junk */")
    val stored = conn.sessionVars.get("rb").get
    assert(!stored.contains("--") && !stored.contains("junk"), stored)
    assert(stored == "not_a_column_at_all")
  }

  test("session-var substitution accepts lowercase keys from external callers") {
    // SessionVars uppercases on set, but SqlTemplate.render / TestFramework
    // accept caller-built maps whose keys may be lowercase — substitution
    // must not silently skip them
    import graft.core.SqlDialect
    assert(SqlDialect.substituteSessionVars("SELECT $foo, $BAR",
      Map("foo" -> "1", "bar" -> "2")) == "SELECT 1, 2")
    assert(SqlTemplate.render("SELECT $report_dt AS d",
      sessionVars = Map("report_dt" -> "DATE '2024-01-01'")) ==
      "SELECT DATE '2024-01-01' AS d")
  }

  test("ShuffleSizing warns on raise and stands down on stat-less plans") {
    import graft.core.{ShuffleSizing, Warn}
    import spark.implicits._
    val key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    spark.conf.unset(key)
    try {
      val small = (1 to 10).map(i => (i, "x")).toDF("id", "t")
      // a raise announces itself (the setting persists on the session)
      val (_, warns) = Warn.capturing(ShuffleSizing.ensureFor(small, 1e12))
      assert(warns.exists(_.contains("raising")), warns.mkString("; "))
      spark.conf.unset(key)
      // a LogicalRDD has no size statistics — sizeInBytes is the
      // defaultSizeInBytes sentinel (Long.MaxValue), not a measurement; a
      // raise from it would pin the session at MaxPartitions forever
      val statless = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.IntegerType))))
      val base = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val (got, w2) = Warn.capturing(ShuffleSizing.ensureFor(statless, 1e9))
      assert(got == base, "no raise from the sentinel")
      assert(spark.conf.getOption(key).isEmpty)
      assert(w2.exists(_.contains("no size statistics")), w2.mkString("; "))
    } finally spark.conf.unset(key)
  }

  test("ShuffleSizing.scoped restores the initial partition count after the action") {
    import graft.core.ShuffleSizing
    import spark.implicits._
    val key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val small = (1 to 10).map(i => (i, "x")).toDF("id", "t")
    // unset before: the raise inside the scope is visible to the action,
    // gone afterwards — a later small query sees the original conf
    spark.conf.unset(key)
    try {
      ShuffleSizing.scoped(spark) {
        ShuffleSizing.ensureFor(small, 1e12)
        assert(spark.conf.getOption(key).nonEmpty)
        small.groupBy("t").count().count() // the operator's terminal action
      }
      assert(spark.conf.getOption(key).isEmpty, "restored to unset")
      // pre-existing value round-trips too
      spark.conf.set(key, "7")
      ShuffleSizing.scoped(spark) { ShuffleSizing.ensureFor(small, 1e12) }
      assert(spark.conf.get(key) == "7")
    } finally spark.conf.unset(key)
  }

  test("no main-source file contains raw control bytes (grep binary-classification guard)") {
    // a single raw NUL inside a string literal (r11: merge/Upsert.scala) makes
    // grep treat the whole file as binary and silently drop its matches from
    // text tooling — audits then miss the file entirely. Escape such bytes
    // (\\u0000 escapes) instead of embedding them.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filter { p =>
        val bytes = java.nio.file.Files.readAllBytes(p)
        bytes.exists(b => b >= 0 && b < 0x09) // NUL..BS; tab/LF/CR are fine
      }.map(_.toString).toSeq
    assert(offenders.isEmpty,
      s"raw control bytes found in: ${offenders.mkString(", ")}")
  }

  test("Bench runner restores initialPartitionNum after a sizing-raising query") {
    import graft.core.ShuffleSizing
    import spark.implicits._
    val key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    spark.conf.unset(key)
    try {
      // a query that raises sizing inside (the shape of q27/q44 under the
      // shared bench session), run through Bench's real per-run code path
      Bench.runOnce(spark, "unused") { (s, _) =>
        import s.implicits._
        val df = (1 to 10).map(i => (i, "x")).toDF("id", "t")
        ShuffleSizing.ensureFor(df, 1e12)
        assert(s.conf.getOption(key).nonEmpty, "raise visible inside the run")
        df.groupBy("t").count()
      }
      assert(spark.conf.getOption(key).isEmpty,
        "the raise must not leak into the next bench query's plan")
    } finally spark.conf.unset(key)
  }

  test("Bench regression guard: truncated baselines parse, the trigger fires right") {
    // r13's filed artifact was truncated mid-record (parsed:null) — the
    // guard must still read whatever query pairs survive, keyed by the
    // compact qNN prefix it looks them up under
    val truncated = """5,"q23_dq_suite":2.672,"q24_json_props":1.153,""" +
      """"q25_dedup_exact":1.07},"sf":"/root/testdata/sf0.1"}"""
    val base = Bench.parseBaseline(truncated)
    assert(base == Map("q23" -> 2.672, "q24" -> 1.153, "q25" -> 1.07),
      base.toString)
    // fires only on >1.5x AND a >0.3s material gap — a sub-second query
    // doubling is jitter, not contamination; an unknown query never fires.
    // Lookups arrive with FULL names (the runner's keys) and must hit
    assert(Bench.regressedAgainst(base, "q23_dq_suite", 4.5))
    assert(!Bench.regressedAgainst(base, "q23_dq_suite", 2.9)) // < 1.5x
    assert(!Bench.regressedAgainst(base, "q24_json_props", 1.4)) // gap <= 0.3
    assert(Bench.regressedAgainst(base, "q24_json_props", 1.8))
    assert(!Bench.regressedAgainst(base, "q99_unknown", 100.0))
    assert(!Bench.regressedAgainst(Map("q1" -> 0.0), "q1_x", 9.0)) // b > 0 guard
    // the RETRY tier fires earlier (>1.3×): r16's q89 drifted to 1.49×
    // (18.057 → 26.9) and slid under the single 1.5× trigger unchallenged —
    // under the two-tier rule that value gets a clean re-sample...
    val r15q89 = Map("q89" -> 18.057)
    assert(Bench.driftedAgainst(r15q89, "q89_ingest_ivfpq", 26.9))
    // ...while the suspect flag (the artifact taint) keeps the 1.5× bar
    assert(!Bench.regressedAgainst(r15q89, "q89_ingest_ivfpq", 26.9))
    assert(!Bench.driftedAgainst(base, "q23_dq_suite", 2.672 * 1.25)) // < 1.3×
    assert(Bench.driftedAgainst(base, "q23_dq_suite", 2.672 * 1.4))
    assert(!Bench.driftedAgainst(base, "q24_json_props", 1.45)) // gap <= 0.3
    assert(!Bench.driftedAgainst(base, "q99_unknown", 100.0))
    // one contaminated filed round must not poison the combined baseline:
    // the per-query median of three rounds outvotes it in either direction
    // (r17's guard read only r16's inflated values and barely armed)
    val combined = Bench.combineBaselines(Seq(
      Map("q46" -> 0.219, "q47" -> 0.309),
      Map("q46" -> 0.186, "q47" -> 0.302),
      Map("q46" -> 0.706, "q47" -> 1.095))) // the r16-shaped bad round
    assert(combined("q46") == 0.219 && combined("q47") == 0.309, combined)
    // a query filed in only some rounds still baselines from those; an
    // even count takes the midpoint
    val partial = Bench.combineBaselines(Seq(
      Map("q1" -> 1.0), Map("q1" -> 3.0, "q2" -> 2.0)))
    assert(partial("q1") == 2.0 && partial("q2") == 2.0, partial)
    // the filed "baseline" field is a JSON ARRAY of paths (r17 filed a
    // comma-joined string a single-path consumer would mis-parse), null
    // when no baseline was found, and escapes path characters
    assert(Bench.baselineJson(Nil, identity) == "null")
    assert(Bench.baselineJson(Seq("BENCH_r17.json"), identity)
      == "[\"BENCH_r17.json\"]")
    assert(Bench.baselineJson(
        Seq("BENCH_r15.json", "BENCH_r16.json", "BENCH_r17.json"), identity)
      == "[\"BENCH_r15.json\",\"BENCH_r16.json\",\"BENCH_r17.json\"]")
    assert(Bench.baselineJson(Seq("a\"b"), s => s.replace("\"", "\\\""))
      == "[\"a\\\"b\"]")
  }

  test("pinnedWithMeasuredStats: the pin carries measured bytes, not the join-product guess") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit}
    import org.apache.spark.sql.graft.ColumnBridge
    // a join chain whose cost-model estimate multiplies: the plain
    // checkpoint INHERITS that estimate (the q100 defect — a 2 MB frame
    // claiming ~189 TB pinned ShuffleSizing at its 4096-partition max)
    val base = (1 to 500).map(i => (i.toLong, s"doc $i body")).toDF("id", "t")
    val a = base.groupBy("id").agg(count(lit(1)).as("n"))
    val chained = base.join(a, Seq("id")).join(base.select(col("id")), Seq("id"))
    def estOf(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    val plain = chained.localCheckpoint(true)
    val pinned = ColumnBridge.pinnedWithMeasuredStats(chained)
    assert(pinned.collect().length == 500 &&
      plain.collect().length == 500, "same data either way")
    val (pe, me) = (estOf(plain), estOf(pinned))
    // measured: positive, and sane — within 100x of the raw data's real
    // footprint (UnsafeRow in-memory bytes over-count vs parquet, which is
    // the safe direction for shuffle sizing)
    assert(me > 0, s"measured estimate must be positive, got $me")
    assert(me < BigInt(100L * 1024 * 1024),
      s"500 tiny rows must not measure in the gigabytes: $me")
    assert(pe > me,
      s"the inherited estimate ($pe) should exceed the measured one ($me) " +
        "on a join chain — otherwise this spec guards nothing")
    // an EMPTY pinned frame measures tiny (clamped to >= 1), never the
    // inherited guess
    val empty = ColumnBridge.pinnedWithMeasuredStats(chained.filter(lit(false)))
    assert(empty.collect().isEmpty)
    assert(estOf(empty) < BigInt(1024 * 1024),
      s"empty pin must read tiny, got ${estOf(empty)}")
  }

  test("Bench sampling plan: heavy queries single-sample, budget overrun degrades, retries cap") {
    // a set whose FIRST sample is genuinely heavy (≥ 2×heavySec) stops at
    // 1 (the seven ~12-22 s pipeline compositions at 3 reps + retries are
    // what pushed BENCH_r19 past the driver budget to rc 124)
    assert(Bench.samplesPlanned(14.2, 5.0, 3, overBudget = false) == 1)
    assert(Bench.samplesPlanned(10.0, 5.0, 3, overBudget = false) == 1) // at-threshold counts
    // the [heavySec, 2×heavySec) BORDERLINE zone keeps the median-of-N
    // discipline: there cold ≈ 3× warm (codegen), and whether the first
    // sample runs cold depends on suite-order luck — the r21 q29 lesson
    // (filed 2.6 → 7.4 with no change on its own path)
    assert(Bench.samplesPlanned(7.4, 5.0, 3, overBudget = false) == 3)
    assert(Bench.samplesPlanned(5.0, 5.0, 3, overBudget = false) == 3)
    // sub-second queries keep the full median-of-N discipline
    assert(Bench.samplesPlanned(0.3, 5.0, 3, overBudget = false) == 3)
    assert(Bench.samplesPlanned(2.1, 5.0, 3, overBudget = false) == 3)
    // past the soft budget EVERYTHING single-samples — a degraded-but-
    // complete artifact beats the driver's kill
    assert(Bench.samplesPlanned(0.3, 5.0, 3, overBudget = true) == 1)
    // heavy sets retry at most once, light keep the configured cap,
    // nothing retries past the budget
    assert(Bench.retryCap(heavy = true, maxRetries = 2, overBudget = false) == 1)
    assert(Bench.retryCap(heavy = true, maxRetries = 0, overBudget = false) == 0)
    assert(Bench.retryCap(heavy = false, maxRetries = 2, overBudget = false) == 2)
    assert(Bench.retryCap(heavy = false, maxRetries = 2, overBudget = true) == 0)
    assert(Bench.retryCap(heavy = true, maxRetries = 2, overBudget = true) == 0)
  }

  test("Bench contended flag: sustained EXTERNAL cpu marks the entry, self-load does not") {
    // external = machine busy cores minus our own (clamped at 0): a bench
    // query saturating all 32 cores itself reads external ≈ 0, while r18's
    // co-tenant builder reads as the 5-12 cores it actually burned
    assert(Bench.externalCores(32.0, 31.5) == 0.5)
    assert(Bench.externalCores(30.0, 31.0) == 0.0) // scheduler jitter clamps
    assert(Bench.externalCores(12.0, 2.0) == 10.0)
    // the set flags only when EVERY run saw external load above the bound
    // (min-of-set): a one-run cron spike stays clean, a plateau flags
    assert(Bench.contendedSet(Seq(5.6, 6.1, 6.5), 2.0),
      "r18's q23-shaped plateau must flag")
    assert(Bench.contendedSet(Seq(8.0, 12.3, 9.9), 2.0),
      "r18's q100-shaped plateau must flag")
    assert(!Bench.contendedSet(Seq(0.3, 9.0, 0.2), 2.0),
      "a single spike must not flag the set")
    assert(!Bench.contendedSet(Seq(0.1, 0.4, 0.2), 2.0), "idle stays clean")
    assert(!Bench.contendedSet(Nil, 2.0), "no samples, no flag")
  }

  test("Bench regression guard arms on the LITERAL filed artifacts") {
    // r14's guard never fired because the filed files' per-query entries
    // live inside a JSON-escaped "tail" string (\"q79_bpe_pairs\":3.503 —
    // the naive scan recovered ZERO entries from BENCH_r13.json) and the
    // healthy parsed block keys by SHORT names the full-name lookups
    // missed. This test feeds the exact bytes on disk — not a hand-written
    // fixture, which is how the r14 spec passed over a broken parser.
    def fileText(name: String): String = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(name)),
      java.nio.charset.StandardCharsets.UTF_8)
    val r13 = Bench.parseBaseline(fileText("BENCH_r13.json"))
    val r14 = Bench.parseBaseline(fileText("BENCH_r14.json"))
    // r13 is the TRUNCATED artifact (parsed:null): its 2000-char tail
    // still carries 76 of the 86 queries; r14 is healthy — all 88
    assert(r13.size >= 70, s"r13 recovered only ${r13.size} entries")
    assert(r14.size >= 85, s"r14 recovered only ${r14.size} entries")
    // spot-checks against the filed values, via full-name lookups
    assert(r13("q79") == 0.444 && r13("q46") == 0.186, r13.toString)
    assert(r14("q79") == 3.503 && r14("q88") == 8.497, r14.toString)
    // the exact r14 failure mode this guard was built for must now fire:
    // q79_bpe_pairs ran 3.503 s against r13's filed 0.444 s (7.9x)
    assert(Bench.regressedAgainst(r13, "q79_bpe_pairs", 3.503))
    assert(Bench.regressedAgainst(r13, "q46_rollup_two_level", 0.886))
    // and a synthetic 2x-the-median regression flags against r14
    assert(Bench.regressedAgainst(r14, "q74_ingest_pipeline",
      r14("q74") * 2))
    // an in-family time does not
    assert(!Bench.regressedAgainst(r14, "q74_ingest_pipeline",
      r14("q74") * 1.1))
  }

  test("ShuffleSizing raises the initial partition count only when needed") {
    import spark.implicits._
    import graft.core.ShuffleSizing
    val key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    spark.conf.unset(key)
    try {
      val small = (1 to 10).map(i => (i, "x")).toDF("id", "t")
      val base = spark.conf.get("spark.sql.shuffle.partitions").toInt
      // tiny input: today's behavior, the knob is untouched
      assert(ShuffleSizing.ensureFor(small, 1.0) == base)
      assert(spark.conf.getOption(key).isEmpty)
      // an estimate demanding more partitions raises the knob, capped
      val n = ShuffleSizing.ensureFor(small, 1e12)
      assert(n > base && n <= ShuffleSizing.MaxPartitions)
      assert(spark.conf.get(key).toInt == n)
      // never lowered by a later small estimate
      assert(ShuffleSizing.ensureFor(small, 1.0) == n)
      assert(spark.conf.get(key).toInt == n)
    } finally spark.conf.unset(key)
  }
}
