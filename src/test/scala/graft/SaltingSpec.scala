package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Salting

class SaltingSpec extends AnyFunSuite with SparkSpec {

  test("saltedJoin is row-identical to the plain join, including a hot key") {
    import spark.implicits._
    // heavily skewed large side: 500 rows of key 1, few of others
    val large = ((1 to 500).map(i => (1, s"hot$i")) ++
      Seq((2, "a"), (3, "b"), (4, "c"))).toDF("k", "payload")
    val small = Seq((1, "dim1"), (2, "dim2"), (5, "dim5")).toDF("k", "dim")
    val plain = large.join(small, Seq("k")).orderBy("k", "payload")
      .collect().map(_.toSeq).toSeq
    val salted = Salting.saltedJoin(large, small, "k", factor = 8)
      .select("k", "payload", "dim").orderBy("k", "payload")
      .collect().map(_.toSeq).toSeq
    assert(salted == plain && plain.length == 501) // 500 hot + key 2
  }

  test("saltedJoin left join preserves unmatched rows exactly once") {
    import spark.implicits._
    val large = Seq((1, "x"), (9, "none")).toDF("k", "payload")
    val small = Seq((1, "dim1")).toDF("k", "dim")
    val out = Salting.saltedJoin(large, small, "k", factor = 4, joinType = "left")
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(2))).toSeq
    assert(out == Seq((1, "dim1"), (9, null)))
  }

  test("saltedSumAgg equals the direct aggregation") {
    import spark.implicits._
    val df = ((1 to 300).map(_ => (1, 2.5)) ++ Seq((2, 10.0), (2, 1.5)))
      .toDF("k", "m")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("m").cast("decimal(18,2)")).cast("double").as("total"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Salting.saltedSumAgg(df, "k", "m", factor = 8)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == direct)
  }
}
