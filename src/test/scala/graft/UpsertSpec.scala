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
    val v1 = r.result.filter(col("k") === 1).head.getString(1)
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
    val row = r.result.head
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
    val row = r.result.head
    assert(row.getAs[String]("v") == "a" && row.getAs[Double]("m") == 99.0)
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
