package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.merge.Upsert

class UpsertSpec extends AnyFunSuite with SparkSpec {

  test("merge classifies insert/update and counts exactly") {
    import spark.implicits._
    val target = Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("k", "v", "m")
    val source = Seq((2, "b2", 22.0), (3, "c", 30.0)).toDF("k", "v", "m")
    val r = Upsert.merge(target, source, Seq("k"))
    assert(r.inserted == 1 && r.updated == 1 && r.deleted == 0)
    val rows = r.result.orderBy("k").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getDouble(2))).toSeq
    assert(rows == Seq((1, "a", 10.0), (2, "b2", 22.0), (3, "c", 30.0)))
  }

  test("matched condition limits updates; unmatched rows keep target values") {
    import spark.implicits._
    val target = Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("k", "v", "m")
    val source = Seq((1, "a2", 11.0), (2, "b2", 22.0)).toDF("k", "v", "m")
    val r = Upsert.merge(target, source, Seq("k"),
      matchedCondition = Some(Upsert.source("m") > 15.0))
    assert(r.updated == 1 && r.inserted == 0)
    val v1 = r.result.filter(col("k") === 1).head().getString(1)
    assert(v1 == "a") // condition false → kept
  }

  test("delete-when-not-matched-by-source removes and counts rows") {
    import spark.implicits._
    val target = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val source = Seq((1, "a2")).toDF("k", "v")
    val r = Upsert.merge(target, source, Seq("k"),
      deleteNotMatchedBySource = Some(lit(true)))
    assert(r.deleted == 2 && r.updated == 1)
    assert(r.result.count() == 1)
  }

  test("target-only columns survive the rewrite") {
    import spark.implicits._
    val target = Seq((1, "a", "keepme")).toDF("k", "v", "extra")
    val source = Seq((1, "a2")).toDF("k", "v")
    val r = Upsert.merge(target, source, Seq("k"))
    val row = r.result.head()
    assert(row.getAs[String]("extra") == "keepme" && row.getAs[String]("v") == "a2")
  }

  test("null keys never match: null-keyed source inserts, target row kept") {
    import spark.implicits._
    val target = Seq((Some(1), "a"), (None, "t-null")).toDF("k", "v")
    val source = Seq((Option.empty[Int], "s-null")).toDF("k", "v")
    val r = Upsert.merge(target, source, Seq("k"))
    // SQL MERGE ON t.k = s.k: NULL = NULL is not a match
    assert(r.inserted == 1 && r.updated == 0 && r.deleted == 0)
    val vs = r.result.collect().map(_.getString(1)).toSet
    assert(vs == Set("a", "t-null", "s-null"))
  }

  test("null-keyed target row is not-matched-by-source and deletable") {
    import spark.implicits._
    val target = Seq((Some(1), "a"), (None, "t-null")).toDF("k", "v")
    val source = Seq((Some(1), "a2")).toDF("k", "v")
    val r = Upsert.merge(target, source, Seq("k"),
      deleteNotMatchedBySource = Some(lit(true)))
    assert(r.deleted == 1 && r.updated == 1)
    assert(r.result.collect().map(_.getString(1)).toSeq == Seq("a2"))
  }

  test("update columns can be restricted") {
    import spark.implicits._
    val target = Seq((1, "a", 10.0)).toDF("k", "v", "m")
    val source = Seq((1, "a2", 99.0)).toDF("k", "v", "m")
    val r = Upsert.merge(target, source, Seq("k"), updateCols = Some(Seq("m")))
    val row = r.result.head()
    assert(row.getAs[String]("v") == "a" && row.getAs[Double]("m") == 99.0)
  }

  // ---- partition-scoped table merge ------------------------------------

  /** (file name, size, mtime) set for one partition directory of a saved
    * table — part-file names are unique per write, so set equality proves
    * the partition's files were not rewritten. */
  private def partFiles(table: String, partDir: String): Set[(String, Long, Long)] = {
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
      .filter(col("col_name") === "Location")
      .head().getString(1).stripPrefix("file:")
    val dir = new java.io.File(loc, partDir)
    if (!dir.isDirectory) return Set.empty
    dir.listFiles().filter(f => f.isFile && !f.getName.startsWith("."))
      .map(f => (f.getName, f.length, f.lastModified)).toSet
  }

  test("mergeIntoTable matches the full rewrite and leaves untouched partitions' files alone") {
    import spark.implicits._
    val init = Seq((1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2"), (4, "d", "d3"))
    for (t <- Seq("pm_scoped", "pm_full")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      init.toDF("k", "v", "dt").write.partitionBy("dt").saveAsTable(t)
    }
    // source touches d2 (update k=3) and d4 (brand-new partition insert)
    val src = Seq((3, "c2", "d2"), (5, "e", "d4")).toDF("k", "v", "dt")

    val before1 = partFiles("pm_scoped", "dt=d1")
    val before3 = partFiles("pm_scoped", "dt=d3")
    assert(before1.nonEmpty && before3.nonEmpty)
    val (r, warns) = graft.core.Warn.capturing(
      Upsert.mergeIntoTable("pm_scoped", src, Seq("k", "dt")))
    assert(warns.isEmpty, s"scoped path must not fall back: $warns")

    // full rewrite on the identical twin — identical UpsertResult...
    val full = Upsert.merge(spark.table("pm_full"), src, Seq("k", "dt"))
    assert((r.inserted, r.updated, r.deleted) ==
      (full.inserted, full.updated, full.deleted))
    assert(r.inserted == 1 && r.updated == 1 && r.deleted == 0)
    // ...and identical table contents
    val got = spark.table("pm_scoped").orderBy("k")
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2))).toSeq
    val want = full.result.orderBy("k")
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2))).toSeq
    full.cleanup()
    assert(got == want)
    assert(got == Seq((1, "a", "d1"), (2, "b", "d1"), (3, "c2", "d2"),
      (4, "d", "d3"), (5, "e", "d4")))

    // untouched partitions: the very same files, byte for byte
    assert(partFiles("pm_scoped", "dt=d1") == before1)
    assert(partFiles("pm_scoped", "dt=d3") == before3)
    // touched partition was rewritten; new partition exists
    assert(partFiles("pm_scoped", "dt=d4").nonEmpty)
    spark.sql("DROP TABLE pm_scoped"); spark.sql("DROP TABLE pm_full")
  }

  test("mergeIntoTable scoped delete stays inside the scope and drops emptied partitions") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS pm_del")
    Seq((1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2"), (4, "d", "d3"))
      .toDF("k", "v", "dt").write.partitionBy("dt").saveAsTable("pm_del")
    val before1 = partFiles("pm_del", "dt=d1")
    // reload of the d2..d3 period: k=3 updated, k=4 no longer present →
    // delete, but ONLY inside the declared scope — d1's unmatched rows live
    val src = Seq((3, "c2", "d2")).toDF("k", "v", "dt")
    val (r, warns) = graft.core.Warn.capturing(
      Upsert.mergeIntoTable("pm_del", src, Seq("k", "dt"),
        deleteNotMatchedBySource = Some(lit(true)),
        deletePartitionScope = Some(col("dt").isin("d2", "d3"))))
    assert(warns.isEmpty, s"scoped path must not fall back: $warns")
    assert(r.updated == 1 && r.deleted == 1 && r.inserted == 0)
    val rows = spark.table("pm_del").orderBy("k")
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2))).toSeq
    assert(rows == Seq((1, "a", "d1"), (2, "b", "d1"), (3, "c2", "d2")))
    // d3 was deleted to empty → its partition is gone, not stale
    val parts = spark.sql("SHOW PARTITIONS pm_del").collect().map(_.getString(0)).toSet
    assert(parts == Set("dt=d1", "dt=d2"), parts.mkString(","))
    assert(partFiles("pm_del", "dt=d3").isEmpty)
    // out-of-scope partition untouched on disk
    assert(partFiles("pm_del", "dt=d1") == before1)
    spark.sql("DROP TABLE pm_del")
  }

  test("mergeIntoTable falls back (correctly, with a warning) when scoping is unsound") {
    import spark.implicits._
    // partition column NOT a merge key: same key may move partitions — the
    // scoped slice would misclassify; must fall back and stay correct
    spark.sql("DROP TABLE IF EXISTS pm_fb")
    Seq((1, "a", "d1"), (2, "b", "d2")).toDF("k", "v", "dt")
      .write.partitionBy("dt").saveAsTable("pm_fb")
    val src = Seq((1, "a2", "d9")).toDF("k", "v", "dt") // k=1 moves d1 → d9
    val (r, warns) = graft.core.Warn.capturing(
      Upsert.mergeIntoTable("pm_fb", src, Seq("k")))
    assert(warns.exists(_.contains("not all merge keys")), warns.mkString(";"))
    assert(r.updated == 1 && r.inserted == 0)
    val rows = spark.table("pm_fb").orderBy("k")
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2))).toSeq
    assert(rows == Seq((1, "a2", "d9"), (2, "b", "d2")), rows.toString)

    // deletes without a declared partition scope: no derivable bound → full
    // rewrite, full-merge delete semantics
    val (r2, w2) = graft.core.Warn.capturing(
      Upsert.mergeIntoTable("pm_fb", Seq((2, "b2", "d2")).toDF("k", "v", "dt"),
        Seq("k", "dt"), deleteNotMatchedBySource = Some(lit(true))))
    assert(w2.exists(_.contains("deletePartitionScope")), w2.mkString(";"))
    assert(r2.updated == 1 && r2.deleted == 1)
    assert(spark.table("pm_fb").collect().map(_.getInt(0)).toSeq == Seq(2))
    spark.sql("DROP TABLE pm_fb")
  }

  test("upsertFromQuery uses the partition-scoped path on a partitioned table") {
    import spark.implicits._
    import graft.core.GraftConnection
    spark.sql("DROP TABLE IF EXISTS pm_conn")
    Seq((1, "a", "d1"), (2, "b", "d2")).toDF("k", "v", "dt")
      .write.partitionBy("dt").saveAsTable("pm_conn")
    val before1 = partFiles("pm_conn", "dt=d1")
    val conn = new GraftConnection(spark)
    val r = conn.upsertFromQuery(
      "SELECT * FROM VALUES (2, 'b2', 'd2'), (3, 'c', 'd2') AS s(k, v, dt)",
      "pm_conn", joinKeys = Seq("k", "dt"))
    assert(r.updated == 1 && r.inserted == 1)
    assert(partFiles("pm_conn", "dt=d1") == before1,
      "untouched partition rewritten through the connection path")
    val rows = spark.table("pm_conn").orderBy("k")
      .collect().map(x => (x.getInt(0), x.getString(1))).toSeq
    assert(rows == Seq((1, "a"), (2, "b2"), (3, "c")))
    spark.sql("DROP TABLE pm_conn")
  }

  test("a real column named 'present' is not clobbered by side markers") {
    import spark.implicits._
    // "present" renames to __t_present/__s_present; the side markers must
    // live outside that namespace or they overwrite the real column
    val target = Seq((1, false), (2, false)).toDF("k", "present")
    val source = Seq((2, true), (3, true)).toDF("k", "present")
    val r = Upsert.merge(target, source, Seq("k"))
    assert(r.inserted == 1 && r.updated == 1)
    val out = r.result.collect().map(x => x.getInt(0) -> x.getBoolean(1)).toMap
    assert(out == Map(1 -> false, 2 -> true, 3 -> true))
  }
}
