package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) data clustering — the layout half of table
 * maintenance, next to [[Compaction]]'s file-count half.
 *
 * Parquet scans prune ROW GROUPS by per-column min/max statistics; a table
 * sorted by one column prunes well on that column and not at all on any
 * other. Interleaving the bits of several range-normalized key columns
 * into one z-value and range-partitioning + sorting by it gives every key
 * column locality: each output file covers a narrow rectangle of the key
 * space, so predicates on ANY clustered column (or several at once) skip
 * most files' row groups. This is how lakehouse engines serve selective
 * multi-dimension scans off 100 TB tables without an index; the reference
 * leaves physical layout to its warehouse (SURVEY.md §4 — storage is
 * opaque to it), so at self-managed parquet scale the engine must supply
 * it.
 *
 * Shape: one stats aggregation over the keys (driver gets 2×k numbers), a
 * projection computing the z-value (codegen'd shifts/masks, no UDF), and
 * ONE range exchange + in-partition sort — the same cost as a plain
 * `orderBy`, better multi-column pruning. Rows are bit-for-bit preserved
 * (oracle-checked: q73 hash-matches the unclustered table).
 *
 * Normalization is linear between each column's observed min/max
 * (nulls → bucket 0, degenerate min==max → 0). Linear buckets under heavy
 * skew concentrate z-ranges — rank-based normalization would fix that at
 * the price of a full sort per column; at the scales this engine targets
 * the linear pass is the right default and skew belongs to `ops.Salting`.
 */
object ZOrder {

  /** Bits per column; 2 columns × 16 bits interleave into a 32-bit z. */
  val DefaultBits = 16

  /** Morton interleave of pre-bucketed non-negative longs in [0, 2^bits):
    * bit i of column j lands at position i*k + j. Pure shifts and masks —
    * whole-stage codegen keeps this in the projection. */
  private[graft] def interleave(bucketed: Seq[Column], bits: Int): Column = {
    val k = bucketed.size
    val terms = for {
      (c, j) <- bucketed.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Key column as a monotone DOUBLE, per type: numerics cast directly;
    * DATE via `unix_date` (epoch days — `CAST(DATE AS DOUBLE)` is not
    * defined); TIMESTAMP casts to epoch seconds; TIMESTAMP_NTZ goes through
    * TIMESTAMP first (the session-TZ reinterpretation is monotone, which is
    * all bucketing needs — same trick as Cdc's second arithmetic); STRING
    * via `xxhash64`, which clusters EQUAL values together — equality
    * predicates then prune via parquet dictionary filtering (each row group
    * holds few distinct values of the key), while range predicates on the
    * string itself gain nothing (hashing destroys lexicographic order). */
  private[graft] def asOrderedDouble(
      dt: org.apache.spark.sql.types.DataType, c: Column): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case DateType => unix_date(c).cast("double")
      case TimestampNTZType => c.cast("timestamp").cast("double")
      case StringType => xxhash64(c).cast("double")
      case _ => c.cast("double")
    }
  }

  /** Linear [min,max] → [0, 2^bits) bucket of a numeric column; null and
    * degenerate (min == max) inputs land in bucket 0. */
  private[graft] def bucket(c: Column, min: Double, max: Double, bits: Int): Column = {
    val span = max - min
    val buckets = (1L << bits) - 1
    if (span <= 0) lit(0L)
    else least(lit(buckets), greatest(lit(0L),
      floor((coalesce(c.cast("double"), lit(min)) - lit(min)) / lit(span)
        * lit(buckets.toDouble)).cast("long")))
  }

  /** Validate key columns and counts — shared by [[zorderBy]] and
    * [[graft.ops.Compaction.compactPath]]'s clustering rewrite. */
  private[graft] def validateKeys(df: DataFrame, cols: Seq[String],
      bits: Int): Unit = {
    require(cols.nonEmpty, "z-order needs at least one cluster column")
    require(cols.size * bits <= 63,
      s"${cols.size} columns × $bits bits = ${cols.size * bits} interleaved " +
        "bits overflows the signed-long z-value; lower `bits` (63 / #cols)")
    // an unsupported key type would cast to null and silently land every
    // row in bucket 0 — no clustering, no error; reject it instead
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      val ok = dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        dt == org.apache.spark.sql.types.DateType ||
        dt == org.apache.spark.sql.types.TimestampType ||
        dt == org.apache.spark.sql.types.TimestampNTZType ||
        dt == org.apache.spark.sql.types.StringType
      require(ok, s"z-order column '$c' has unsupported type $dt; " +
        "cluster on numeric/date/timestamp/string keys")
    }
  }

  /** The z-value expression for `cols` ∈ [0, 2^(k·bits)), normalized by
    * min/max stats computed over `statsOf` (one aggregation, 2k numbers to
    * the driver). `statsOf` is usually the frame being rewritten — a
    * compaction passes its selected slice so normalization reflects the
    * data actually being laid out. */
  private[graft] def zValue(statsOf: DataFrame, cols: Seq[String],
      bits: Int): Column = {
    val keyed = cols.map(c => asOrderedDouble(statsOf.schema(c).dataType, col(c)))
    val stats = statsOf.agg(
      min(keyed.head),
      (keyed.tail.map(min) ++ keyed.map(max)): _*).head()
    def d(i: Int): Double =
      if (stats.isNullAt(i)) 0.0 else stats.getDouble(i)
    val mins = cols.indices.map(d)
    val maxs = cols.indices.map(i => d(cols.size + i))
    interleave(
      cols.indices.map(i => bucket(keyed(i), mins(i), maxs(i), bits)), bits)
  }

  /**
   * Rewrite `df` clustered on `cols`: z-value projection, range exchange
   * into `numFiles` partitions, in-partition sort by (z, cols) — written
   * out, each partition is one file covering a compact key-space
   * rectangle. Columns and rows pass through unchanged.
   */
  def zorderBy(df: DataFrame, cols: Seq[String],
      numFiles: Int, bits: Int = DefaultBits): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    validateKeys(df, cols, bits)
    df.withColumn("__z", zValue(df, cols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z") +: cols.map(col): _*)
      .drop("__z")
  }
}
