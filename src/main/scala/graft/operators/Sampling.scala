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

  /**
   * Per-stratum deterministic sampling: each stratum keeps its own
   * percentage of rows (0..100, unlisted strata keep `defaultPct`), chosen
   * by the stable hash bucket — reproducible downsampling of
   * over-represented languages/sources in a training corpus. Pure per-row
   * expressions, no shuffle (`df.stat.sampleBy` is seed-random; this is
   * content-stable forever).
   */
  def stratifiedSample(
      df: DataFrame, key: String, stratum: Column,
      pcts: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    require((pcts.values.toSeq :+ defaultPct).forall(p => p >= 0 && p <= 100))
    // fold into one CASE chain (deterministic order for stable plans)
    val pctCol = pcts.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (s, p)) => when(stratum === s, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(col(key)) < pctCol)
  }

  /**
   * Leakage-safe train/test split: rows are bucketed on their exact-dup
   * group's CANONICAL id (min id per md5(text) group), so duplicate
   * documents can never straddle the train/test boundary — a row-keyed
   * split silently leaks duplicates from train into test and inflates
   * eval. One groupBy shuffle + one equi-join (AQE broadcasts the
   * canonical map while it is small). For NEAR-dup safety, split on
   * `Dedup.dupClusters` labels with `trainTestSplit(df, "cluster", pct)`
   * instead — the bucketing is identical, only the group key changes.
   */
  def leakageSafeSplit(df: DataFrame, id: String, text: String, trainPct: Int): DataFrame = {
    val canon = Dedup.exactGroups(df, id, text)
      .select(col("text_hash"), col("canonical_id"))
    // null-safe join: md5(NULL) is NULL on both sides, and null-text rows
    // must still be split (they form their own group), not silently dropped
    val withH = df.withColumn("__th", md5(col(text).cast("binary")))
    withH.join(canon, withH("__th") <=> canon("text_hash"))
      .drop("text_hash", "__th")
      .transform(d => trainTestSplit(d, "canonical_id", trainPct))
  }
}
