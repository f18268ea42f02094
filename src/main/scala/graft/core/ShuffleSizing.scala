package graft.core

import org.apache.spark.sql.DataFrame

/**
 * Input-size-derived shuffle sizing for the dedup pipelines.
 *
 * Measured failure mode (SCALE.md): at 5M docs the shingle aggregations
 * sort hundreds of millions of rows; with the session default of 32
 * shuffle partitions, per-task sort state outgrew memory, spilled 11 GB
 * at 1M docs and ran a multi-hundred-GB /tmp spill into ENOSPC at 5M.
 * The remedy was a MANUAL `SPARK_GRAFT_SHUFFLE=128` — a sizing rule the
 * user had to know. This helper derives it instead: estimate the
 * operator's shuffle volume from the input plan's size statistic times a
 * measured expansion factor, and RAISE
 * `spark.sql.adaptive.coalescePartitions.initialPartitionNum` so each
 * initial shuffle partition targets ~128 MB.
 *
 * Why this knob: with AQE + partition coalescing (the engine defaults,
 * GraftSession.builder), shuffles START at initialPartitionNum and AQE
 * merges small partitions back to the advisory size — so at small scale
 * behavior is exactly as before (the raise is invisible after coalescing),
 * while at large scale the extra initial partitions keep per-task state
 * bounded. The knob is only ever raised, never lowered, and the raise is
 * capped at [[MaxPartitions]]; when AQE or coalescing is disabled the
 * helper does nothing (initialPartitionNum would not be read — and
 * silently rewriting `spark.sql.shuffle.partitions` under a user who
 * turned AQE off would be worse than the spill).
 *
 * Plan-size statistics are driver-side only (file sizes for parquet
 * scans; no job runs). Expansion factors are calibrated from ScaleBench's
 * measured shuffle-write volumes relative to the on-disk corpus
 * (SCALE.md "Measured" tables: minhash ≈ 48 GB shuffle from a ~2 GB
 * corpus at 5M docs).
 */
object ShuffleSizing {

  val TargetPartitionBytes: Long = 128L << 20
  val MaxPartitions: Int = 4096

  private val InitKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

  /** Raise the initial shuffle partition count so `df`'s downstream
    * shuffles (≈ input size × `expansionFactor` bytes) land near the
    * 128 MB/partition target. No-op when the estimate fits the current
    * setting, when statistics are unavailable, or when AQE coalescing is
    * off. Returns the partition count now in effect (for specs/logging). */
  def ensureFor(df: DataFrame, expansionFactor: Double): Int = {
    val spark = df.sparkSession
    val aqeOn = spark.conf.get("spark.sql.adaptive.enabled", "true").toBoolean &&
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true").toBoolean
    val current = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val currentInit = spark.conf.getOption(InitKey)
      .flatMap(_.toIntOption).getOrElse(current)
    if (!aqeOn) return currentInit
    val est =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case _: Throwable => return currentInit }
    val needed = ((BigDecimal(est) * expansionFactor / TargetPartitionBytes)
      .toBigInt min BigInt(MaxPartitions)).toInt + 1
    if (needed > currentInit) {
      spark.conf.set(InitKey, math.min(needed, MaxPartitions).toString)
      math.min(needed, MaxPartitions)
    } else currentInit
  }
}
