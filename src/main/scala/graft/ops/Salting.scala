package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation by key salting. AQE's skew-join splitting handles most
 * skew automatically; explicit salting is the tool for the pathological
 * case it can't fix — a single hot key whose rows exceed one task's
 * capacity on BOTH sides, or skewed aggregations.
 *
 *  - `saltedJoin`: the skewed (large) side gets a random-but-deterministic
 *    salt in [0, factor); the small side is replicated `factor` times with
 *    every salt value; the join key becomes (key, salt), spreading a hot
 *    key over `factor` tasks. Result is row-identical to the unsalted join.
 *  - `saltedAgg`: two-phase aggregation — partial aggregate on
 *    (key, salt), then final aggregate on key — for skewed groupBys whose
 *    map-side combine isn't enough.
 */
object Salting {

  /** Deterministic salt in [0, factor) from the row's key (stable runs). */
  def saltOf(key: Column, factor: Int): Column =
    pmod(xxhash64(key, monotonically_increasing_id()), lit(factor)).cast("int")

  /**
   * Equi-join `large ⋈ small` on `key`, with the large side salted and the
   * small side replicated across all salt values. `small` here means "fits
   * `factor`-fold replication", not broadcastable — if it were broadcastable
   * there would be no shuffle to skew.
   */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String,
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    // right/full would emit one row per salt for unmatched SMALL rows
    // (they are replicated); only the large side's semantics are preserved
    require(Set("inner", "left", "left_outer", "leftouter", "leftsemi",
        "left_semi", "leftanti", "left_anti")
        .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins, got $joinType")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(factor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: sum-like measures only (partial sums
    * compose). Returns key → total count and decimal-exact sum of `measure`. */
  def saltedSumAgg(df: DataFrame, key: String, measure: String, factor: Int): DataFrame = {
    require(factor > 0)
    df.withColumn("__salt",
        pmod(xxhash64(col(key), monotonically_increasing_id()), lit(factor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sum(col(measure).cast("decimal(18,2)")).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("total"))
  }
}
