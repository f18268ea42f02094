package graft.reports

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.meta.MetaStore

/**
 * Flagged-share drift monitor for the standing-state ingest gates of
 * [[IngestPipeline.runNight]]. Each gate's nightly flagged share is a
 * one-number health signal whose jump names its own suspect: the LM and
 * NB gates score against STANDING persisted models (jump = stale model
 * or drifted corpus — the same failure mode
 * [[graft.operators.Sketches.nightDrift]] catches for column statistics,
 * here for drop rates); the bloom exact gate's share is the re-crawl
 * rate (jump = crawler re-fetch storm or an upstream dedup break); the
 * eval gate's share is the contamination rate (jump = eval data leaking
 * into the crawl). Nothing used to warn on any of them.
 *
 * The audit record is the standing execution log: each gate's logged row
 * already carries the night's input count (`records_inserted`) and drop
 * count (`records_deleted`), so the per-night share needs no new storage
 * — [[gateShares]] derives the (night, rows_in, flagged, flagged_share)
 * history straight from it, and [[checkAfterNight]] compares the night
 * just run against the trailing nights' MEDIAN share (median, not mean:
 * one earlier outlier night must not disarm or false-fire the monitor —
 * the [[graft.Bench]] combineBaselines lesson). The trigger needs BOTH a
 * multiplicative jump and an absolute gap, the engine's standard two-part
 * guard (a 0.1% → 0.3% wiggle on a near-zero share is noise; a 10% → 35%
 * jump is a finding). Informational, never a gate: the night has already
 * landed, the warning tells the operator to retrain or investigate.
 *
 * Cost: one filtered scan of the (small, metadata-sized) execution log
 * per monitored gate per night, collected bounded by `window`.
 */
object GateDrift {

  /** Trailing nights consulted for the baseline median. */
  val DefaultWindow = 7

  /** Fires past median × factor AND median + absGap (both required). */
  val DefaultFactor = 2.0
  val DefaultAbsGap = 0.05

  /** Fewest trailing nights that form a baseline — one night is an
    * anecdote, not a baseline. */
  val MinTrailing = 2

  private def medianOf(vs: Seq[Double]): Double = {
    val s = vs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  /** Pure trigger, extracted for the spec: does `share` drift against the
    * `trailing` nights' shares? */
  def drifted(share: Double, trailing: Seq[Double],
              factor: Double = DefaultFactor,
              absGap: Double = DefaultAbsGap): Boolean =
    trailing.length >= MinTrailing && {
      val med = medianOf(trailing)
      share > med * factor && share - med > absGap
    }

  /** Per-night flagged shares for one gate — the queryable audit surface.
    * `processPrefix` is the gate's execution-log process name up to the
    * night (e.g. `ingest_lm_`); a replayed night keeps only its LATEST
    * successful row (the replay's verdicts supersede). Newest first. */
  def gateShares(meta: MetaStore, processPrefix: String,
                 limit: Int = 30): DataFrame = {
    val rows = meta.executionLog
      .filter(col("execution_status") === "SUCCESS" &&
        col("target_table").startsWith(processPrefix))
      .select(
        col("target_table").substr(lit(processPrefix.length + 1),
          lit(Int.MaxValue)).as("night"),
        col("execution_start_ts"),
        col("records_inserted").as("rows_in"),
        col("records_deleted").as("flagged"))
    val latest = rows.groupBy(col("night"))
      .agg(max(struct(col("execution_start_ts"), col("rows_in"),
        col("flagged"))).as("__last"))
      .select(col("night"),
        col("__last.rows_in").as("rows_in"),
        col("__last.flagged").as("flagged"),
        col("__last.execution_start_ts").as("ts"))
    latest
      .withColumn("flagged_share",
        round(when(col("rows_in") > 0,
          col("flagged").cast("double") / col("rows_in"))
          .otherwise(0.0), 6))
      .orderBy(col("ts").desc, col("night").desc)
      .select("night", "rows_in", "flagged", "flagged_share")
      .limit(limit)
  }

  /** Compare the night just run against the trailing window and
    * [[graft.core.Warn]] on drift; returns the night's share (the caller
    * may file it). Runs on the driver AFTER the gate's logged row landed;
    * the night's own row is excluded from its baseline. */
  def checkAfterNight(meta: MetaStore, processPrefix: String, night: String,
                      rowsIn: Long, flagged: Long,
                      window: Int = DefaultWindow,
                      factor: Double = DefaultFactor,
                      absGap: Double = DefaultAbsGap): Double = {
    val share = if (rowsIn <= 0) 0.0 else flagged.toDouble / rowsIn
    // zero-input nights (empty weekend/holiday batches) say nothing about
    // the gate: counting them as 0.0-share baselines would drag the
    // median to 0 and make the next ORDINARY night false-fire — exclude
    // them from the baseline (they stay visible in gateShares)
    val trailing = gateShares(meta, processPrefix, limit = window + 8)
      .filter(col("night") =!= night && col("rows_in") > 0)
      .limit(window)
      .select(col("flagged_share"))
      .collect().map(_.getDouble(0)).toSeq
    if (drifted(share, trailing, factor, absGap))
      graft.core.Warn(
        f"$processPrefix$night: gate flagged share $share%.4f jumped vs " +
          f"the trailing ${trailing.length} nights (median " +
          f"${medianOf(trailing)}%.4f) — a stale model or a drifted " +
          "corpus; retrain the gate model or investigate the source")
    share
  }
}
