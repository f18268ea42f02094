package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling/splitting for training-data curation. Random
 * sampling (`df.sample`) drifts between runs and engines; these assign each
 * row a stable bucket from a content hash, so splits are reproducible
 * forever and portable across engines (md5-digit arithmetic — the same
 * formula runs in any ANSI engine).
 *
 * Scale: pure per-row expressions, no shuffle, no state.
 */
object Sampling {

  /** Stable bucket 0..99 from the first two hex digits of md5(key). */
  def hashBucket(key: Column): Column =
    (conv(substring(md5(key.cast("string").cast("binary")), 1, 2), 16, 10)
      .cast("int") % 100)

  /** Label rows train/test by bucket threshold (trainPct in 0..100). */
  def trainTestSplit(df: DataFrame, key: String, trainPct: Int): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100)
    df.withColumn("bucket", hashBucket(col(key)))
      .withColumn("split",
        when(col("bucket") < trainPct, "train").otherwise("test"))
  }

  /** Deterministic fraction sample: keep rows whose bucket < pct. */
  def deterministicSample(df: DataFrame, key: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(key)) < pct)
}
