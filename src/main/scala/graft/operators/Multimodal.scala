package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
 * columns with typed metadata, plus batch feature extraction.
 *
 * The Spark-side shape is real and tested — schema, partitioning, and the
 * per-partition batch path via `mapPartitions` (the JVM analogue of
 * `mapInPandas`: one iterator per partition, amortized per-batch setup such
 * as codec initialization). The codec itself is STUBBED with a deterministic
 * fake (`decodeStub`) because no image/audio libraries ship in this
 * environment; swap `decodeStub` for a real decoder without touching any
 * plumbing.
 *
 * Scale notes: binary payloads stay distributed end-to-end — no collect, no
 * driver-side bytes. Feature extraction is a narrow map (no shuffle);
 * repartition upstream only to balance payload-size skew.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  /** Wrap a text table as fake media rows (payload = utf8 bytes). */
  def asMedia(df: DataFrame, id: String, text: String): DataFrame =
    df.select(
      col(id).cast("long").as("media_id"),
      col(text).cast("binary").as("payload"),
      struct(
        lit("fake/utf8").as("format"),
        (length(col(text)) % 1024).cast("int").as("width"),
        (length(col(text)) % 768).cast("int").as("height")).as("meta"))

  final case class MediaFeatures(media_id: Long, n_bytes: Long, checksum: Long,
                                 mean_byte: Double, format: String)

  /**
   * Deterministic stand-in for a real decoder: byte length, additive
   * checksum, and mean byte value of the payload. A real implementation
   * would decode pixels/samples here — per partition, so codec state is
   * initialized once per task, not once per row.
   */
  def decodeStub(payload: Array[Byte]): (Long, Long, Double) = {
    if (payload == null || payload.isEmpty) (0L, 0L, 0.0)
    else {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      (payload.length.toLong, sum, sum.toDouble / payload.length)
    }
  }

  /**
   * Byte-window sampling over payloads — the video frame-sample / audio
   * window analogue as pure column plumbing: one row per (media_id,
   * chunk_no) with the sliced bytes. `stride < chunkBytes` gives
   * overlapping windows (the RAG-chunking shape applied to bytes);
   * `stride == chunkBytes` tiles. Entirely codegen'd (`sequence` +
   * `posexplode` + `substr` on binary — no UDF) and shuffle-free: a
   * narrow map whose output is bounded by `ceil(bytes / stride)` rows
   * per payload. Null/empty payloads yield zero chunks. A real frame
   * sampler would replace the fixed stride with codec-reported frame
   * offsets; every downstream contract (row shape, per-chunk bytes,
   * ordering) stays as pinned here.
   */
  def chunkPayload(media: DataFrame, chunkBytes: Int,
      stride: Int): DataFrame = {
    require(chunkBytes > 0, s"chunkBytes must be positive (got $chunkBytes)")
    require(stride > 0, s"stride must be positive (got $stride)")
    val n = length(col("payload"))
    media
      .where(col("payload").isNotNull && n > 0)
      .select(col("media_id"), col("payload"),
        posexplode(sequence(lit(0), n - 1, lit(stride)))
          .as(Seq("chunk_no", "__start")))
      .select(col("media_id"), col("chunk_no"),
        col("payload").substr(col("__start") + 1, lit(chunkBytes))
          .as("chunk"))
      .withColumn("chunk_bytes", length(col("chunk")))
  }

  /** Exact payload-level duplicate groups — byte-identical media (the
    * re-upload case) keyed by md5 of the RAW payload, never a decode:
    * one aggregation, map-side combined, `(payload_md5, canonical_id =
    * min media_id, n_copies)`. The binary twin of
    * [[Dedup.exactGroups]]. */
  def payloadDupGroups(media: DataFrame): DataFrame =
    media.where(col("payload").isNotNull)
      .groupBy(md5(col("payload")).as("payload_md5"))
      .agg(min(col("media_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"))

  /** Batch feature extraction over media rows (mapPartitions plumbing). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload", "meta.format").as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition setup happens here (codec init in a real impl)
        it.map { case (id, payload, fmt) =>
          val (n, sum, mean) = decodeStub(payload)
          MediaFeatures(id, n, sum, mean, fmt)
        }
      }
  }
}
