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

  /**
   * Streaming latest-version-per-key — the streaming counterpart of
   * `Cdc.latestVersion` (W1): custom keyed state via `mapGroupsWithState`
   * holds the current winner per key and emits it whenever a newer version
   * (by event time, then a sequence column) arrives. Output mode `update`.
   *
   * State is one small row per key — the minimal CDC upsert state — so
   * memory scales with |keys|, not |events|; at cluster scale the state
   * store shards by the groupBy key exactly like the batch shuffle.
   */
  def latestVersionStream(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      seqCol: String): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.{Encoders, Row}
    val spark = events.sparkSession
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(events.schema)
    implicit val verEnc: org.apache.spark.sql.Encoder[(java.sql.Timestamp, Long, Row)] =
      Encoders.tuple(Encoders.TIMESTAMP, Encoders.scalaLong, rowEnc)
    import spark.implicits._
    // null-safe accessors: one malformed CDC row (null key/ts/seq) must not
    // kill the streaming query — batch latestVersion tolerates the same rows
    def seqOf(r: Row): Long =
      Option(r.getAs[Number](seqCol)).map(_.longValue()).getOrElse(Long.MinValue)
    def tsOf(r: Row): Long =
      Option(r.getAs[java.sql.Timestamp](tsCol)).map(_.getTime).getOrElse(Long.MinValue)
    events.groupByKey(r => Option(r.getAs[Any](keyCol)).map(_.toString).orNull)
      .mapGroupsWithState[(java.sql.Timestamp, Long, Row), Row](
        GroupStateTimeout.NoTimeout()) { case (_, rows, state) =>
        // iterator FOLD, not buffer-then-max: a hot key with millions of
        // events in one micro-batch holds O(1) rows in memory, never the
        // whole group
        val best = rows.foldLeft(state.getOption.map(_._3).orNull) { (acc, r) =>
          if (acc == null || Ordering[(Long, Long)].lt((tsOf(acc), seqOf(acc)), (tsOf(r), seqOf(r)))) r
          else acc
        }
        state.update((best.getAs[java.sql.Timestamp](tsCol), seqOf(best), best))
        best
      }
  }

  /** Read a parquet file's rows as a file stream (schema must be supplied). */
  def parquetStream(spark: SparkSession, dir: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)

  /**
   * Streaming gap-based sessionization — the streaming counterpart of
   * `Cdc.sessionize` (q52), composed from Spark's native `session_window`
   * (dynamic-gap session merging in the state store) rather than
   * hand-rolled `flatMapGroupsWithState`: Catalyst manages per-key session
   * state, merges overlapping windows across micro-batches, and emits each
   * session exactly once when the watermark passes its end. State is one
   * small merged window per open session per key.
   *
   * Note the end-bound convention: `session_end` here is the window end
   * (= last event + gap, the point at which the session is provably
   * closed); the batch form's session extent [min ts, max ts] is
   * recoverable as [session_start, session_end - gap].
   */
  def sessionizeStream(
      events: DataFrame, keyCol: String, tsCol: String,
      gapMinutes: Int, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), s"$gapMinutes minutes"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol).as("key"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /**
   * Streaming exact dedup — the streaming counterpart of
   * `Dedup.dropExactDuplicates` (q26): ONE row survives per content hash.
   * A duplicate in a later micro-batch than its original always drops;
   * within a single micro-batch the surviving duplicate is arbitrary
   * (partition order), matching `dropDuplicatesWithinWatermark` semantics —
   * the batch operator's deterministic min-id pick needs a global view a
   * stream doesn't have. Built on the native
   * `dropDuplicatesWithinWatermark`, so the state store keeps one compact
   * md5 entry per distinct document and EVICTS entries older than the
   * watermark — without the watermark bound, streaming dedup state grows
   * with the corpus forever, which is the operational failure mode at
   * ingest scale. Duplicates arriving farther apart than the watermark
   * delay both survive (the dedup guarantee is scoped to the watermark
   * window); run the batch operator over the landed data for a final
   * global pass.
   */
  def dedupStream(
      docs: DataFrame, textCol: String, tsCol: String,
      watermark: String): DataFrame =
    docs.withColumn("__text_hash", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__text_hash")
      .drop("__text_hash")
}
