package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Parquet-directory catalog over the TESTDATA.md layout: each table is one
 * parquet file under a scale-factor directory. The engine's sources are
 * schema-on-read, mirroring the reference's dynamic-schema stance
 * (ref: SURVEY.md §1.3 — the reference never declares source schemas).
 *
 * Scale notes: `spark.read.parquet` gives splittable columnar scans with
 * predicate pushdown + column pruning; at 100 TB each table would be a
 * date-partitioned parquet/iceberg directory and everything here still holds
 * (partition pruning replaces the high-water-mark filter, see ops.Cdc).
 */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables small enough to always broadcast in joins at any scale. */
  val broadcastable: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    name match {
      // events.ts is parquet TIMESTAMP(NANOS) — read as Long nanos
      // (spark.sql.legacy.parquet.nanosAsLong) and floor-convert to a µs
      // timestamp, which matches DuckDB's ns→µs truncation on read.
      case "events" if df.schema("ts").dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }

  /** Register selected tables of a scale-factor dir as temp views — prefer
    * this over `registerAll` when the query set is known (pays the
    * read-footer/register fixed cost only for tables actually referenced). */
  def register(spark: SparkSession, dir: String, tables: String*): Unit =
    tables.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }

  /** Register every table of a scale-factor dir as a temp view. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, names: _*)
}
