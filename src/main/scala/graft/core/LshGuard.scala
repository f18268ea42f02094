package graft.core

import java.lang.ref.WeakReference
import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd
import org.apache.spark.sql.functions._
import org.apache.spark.util.AccumulatorV2

/**
 * Bucket-space saturation guard for the banded-LSH operators.
 *
 * Measured failure mode (SCALE.md, ScaleBench at 250k docs / signBits=8):
 * when the corpus outgrows the bucket space (2^signBits buckets per band),
 * EVERY bucket exceeds `maxBucket`, the cap drops them all, and recall
 * silently collapses to ZERO pairs — previously only the optional
 * bucket-stats audit surfaced it. This guard makes the pair operators
 * self-reporting at RUN time, with no extra scan, shuffle, or action.
 *
 * Mechanism: an [[AccumulatorV2]] fed by a boolean pass-through filter on
 * the per-(band,bucket) size frame — one accumulator add per BUCKET (the
 * frame is already aggregated; its cardinality is orders of magnitude below
 * the shingle/banding rows, so the tap is off the hot path), evaluated by a
 * listener at SQL-execution end. `Dataset.observe` (CollectMetrics) was the
 * first design, but its metrics are assembled from the FINAL adaptive plan,
 * and AQE's empty-relation propagation replaces the whole observed subtree
 * with an empty LocalRelation precisely when the cap drops every bucket —
 * the saturation case itself silenced the metric (reproduced on the real
 * pipeline: pairs-with-distinct + all-buckets-dropped ⇒ observedMetrics
 * empty). Accumulator values survive: the stage that computed them ran,
 * whatever the replanner did above it.
 *
 * Each accumulator is evaluated only at the end of ITS OWN SQL execution:
 * the listener maps accumulator → stage → job → execution id from the
 * task-end events, so an unrelated query finishing mid-run of the
 * instrumented one cannot read-and-reset partial stats (which would split
 * one observation into fragments that each duck the thresholds).
 * Observations are keyed by the owning [[SparkSession]]; concurrent
 * sessions in one JVM read their own windows via `observations(spark)`.
 *
 * The warning fires on the listener thread (the driver) through [[Warn]];
 * [[observations]] keeps a recent window for specs and for operators that
 * want the numbers. Advisory accuracy: speculative/retried tasks can
 * double-count a bucket (standard accumulator at-least-once semantics) —
 * irrelevant to a mean-vs-cap/2 threshold check.
 *
 * STRICT mode (`instrument(..., strict = true)`) additionally splices a
 * distributed fail-fast into the PLAN: a one-row global aggregate of the
 * pre-filter bucket sizes is cross-joined (broadcast) under the operator's
 * output behind an `assert_true` filter, so the caller's own action ABORTS
 * with an actionable message when the bucket space is saturated, instead of
 * completing with silently-zeroed recall. In-plan rather than
 * listener-side because a listener evaluates after the action already
 * returned — too late to abort — and because the guard must fire exactly
 * when the output is EMPTY (the saturation symptom), where any check
 * attached to output rows never runs. Cost: one extra aggregation over the
 * already-aggregated bucket frame (the (band,bucket) exchange is reused),
 * broadcast of a single row; opt-in.
 */
object LshGuard {

  /** Merged per-bucket statistics. `droppedRows` counts band-membership
    * rows living in over-cap buckets — the mass the cap removes from
    * pairing, an upper-bound proxy for lost recall. */
  final case class Stats(nBuckets: Long, totalRows: Long, maxSize: Long,
                         droppedRows: Long) {
    def meanSize: Double = if (nBuckets == 0) 0.0 else totalRows.toDouble / nBuckets
    def droppedRowFrac: Double =
      if (totalRows == 0) 0.0 else droppedRows.toDouble / totalRows
  }

  /** One evaluated guard observation. `sessionKey` identifies the owning
    * SparkSession (see [[observations(spark*]]). */
  final case class Observation(caller: String, cap: Int, stats: Stats,
                               sessionKey: String = "") {
    /** By the time the MEAN reaches the cap most mass is already dropped —
      * warn at half. The dropped-row fraction is the second trigger: a
      * SKEWED bucket distribution (a few giant buckets holding most docs)
      * can drop the majority of rows while the mean stays low. */
    def saturated: Boolean = stats.nBuckets > 0 &&
      (stats.meanSize > cap / 2.0 || stats.droppedRowFrac > 0.5)
    def meanSize: Double = stats.meanSize
    def droppedRowFrac: Double = stats.droppedRowFrac
  }

  private[core] final class BucketAcc(cap: Int) extends AccumulatorV2[Long, Stats] {
    private var n = 0L
    private var total = 0L
    private var mx = 0L
    private var dropped = 0L
    override def isZero: Boolean = n == 0L
    override def copyAndReset(): BucketAcc = new BucketAcc(cap)
    override def copy(): BucketAcc = {
      val c = new BucketAcc(cap)
      c.n = n; c.total = total; c.mx = mx; c.dropped = dropped
      c
    }
    override def reset(): Unit = { n = 0L; total = 0L; mx = 0L; dropped = 0L }
    override def add(sz: Long): Unit = {
      n += 1L; total += sz; mx = math.max(mx, sz)
      if (sz > cap) dropped += sz
    }
    override def merge(o: AccumulatorV2[Long, Stats]): Unit = o match {
      case b: BucketAcc =>
        n += b.n; total += b.total; mx = math.max(mx, b.mx); dropped += b.dropped
      case other =>
        throw new UnsupportedOperationException(s"cannot merge ${other.getClass}")
    }
    override def value: Stats = Stats(n, total, mx, dropped)
  }

  private final class Entry(val ref: WeakReference[BucketAcc], val caller: String,
                            val cap: Int, val sessionKey: String) {
    /** Last SQL execution whose tasks updated the accumulator — the only
      * execution-end event allowed to evaluate it. -1 until a task reports. */
    @volatile var lastExecId: Long = -1L
  }

  private val registry = scala.collection.mutable.ArrayBuffer.empty[Entry]
  private val byAccId = scala.collection.mutable.HashMap.empty[Long, Entry]
  // stage → SQL execution id, fed by job-start events (bounded, FIFO eviction)
  private val stageToExec = scala.collection.mutable.LinkedHashMap.empty[Int, Long]
  private val MaxStages = 4096
  // weak identity set: one listener per SparkContext, never pinned
  private val contexts = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext, java.lang.Boolean])
  private val recent = scala.collection.mutable.ArrayBuffer.empty[Observation]
  private val KeepLast = 64

  private def sessionKeyOf(spark: SparkSession): String =
    java.lang.Integer.toHexString(System.identityHashCode(spark))

  /** Recent observations across ALL sessions, newest last (bounded window). */
  def observations: Seq[Observation] = recent.synchronized(recent.toSeq)

  /** Recent observations made by operators of THIS session only — two
    * concurrent sessions in one JVM never read each other's window. */
  def observations(spark: SparkSession): Seq[Observation] = {
    val k = sessionKeyOf(spark)
    recent.synchronized(recent.toSeq).filter(_.sessionKey == k)
  }

  def clearObservations(): Unit = recent.synchronized(recent.clear())

  /** Attach the guard to a per-(band,bucket) size frame: `buckets` carries
    * one row per bucket with its row count in `sizeCol`; the returned frame
    * is row-identical (an always-true filter). No-op when uncapped — that
    * path already warns at call time. With `strict = true` the returned
    * frame additionally ABORTS any action run over it while the bucket
    * space is saturated (see object docs). */
  def instrument(buckets: DataFrame, sizeCol: String, cap: Int,
                 caller: String, strict: Boolean = false): DataFrame = {
    if (cap == Int.MaxValue) return buckets
    val spark = buckets.sparkSession
    ensureListener(spark)
    val acc = new BucketAcc(cap)
    spark.sparkContext.register(acc, s"graft.lsh.guard.$caller")
    val entry = new Entry(new WeakReference(acc), caller, cap, sessionKeyOf(spark))
    registry.synchronized {
      registry.filterInPlace(_.ref.get != null)
      byAccId.filterInPlace((_, e) => e.ref.get != null)
      registry += entry
      byAccId.put(acc.id, entry)
    }
    // non-deterministic so the optimizer can neither prune the tap nor
    // push/reorder it below the bucket aggregation it measures
    val tap = udf((sz: java.lang.Long) => {
      if (sz != null) acc.add(sz.longValue())
      true
    }).asNondeterministic()
    val tapped = buckets.filter(tap(col(sizeCol)))
    if (strict) strictGuard(tapped, buckets, sizeCol, cap, caller) else tapped
  }

  /** In-plan fail-fast: 1-row saturation check cross-joined under the
    * operator output. The `assert_true` lives in a FILTER on the one-row
    * aggregate, so column pruning of the join's payload cannot remove it,
    * and it executes as part of the broadcast build — i.e. during the
    * caller's own action, even when the final output is empty. */
  private def strictGuard(tapped: DataFrame, buckets: DataFrame, sizeCol: String,
                          cap: Int, caller: String): DataFrame = {
    val stats = buckets.agg(
      count(lit(1)).as("__g_n"),
      coalesce(sum(col(sizeCol)), lit(0L)).as("__g_total"),
      coalesce(max(col(sizeCol)), lit(0L)).as("__g_max"),
      coalesce(sum(when(col(sizeCol) > cap, col(sizeCol))), lit(0L)).as("__g_dropped"))
    val mean = col("__g_total").cast("double") / col("__g_n").cast("double")
    val dropFrac = col("__g_dropped").cast("double") / col("__g_total").cast("double")
    val healthy = (col("__g_n") === 0L) ||
      (mean <= lit(cap / 2.0) && dropFrac <= lit(0.5))
    val guard = stats
      .filter(isnull(assert_true(healthy, format_string(
        s"$caller: LSH bucket space saturated (strict mode) — mean bucket " +
          s"size %.1f vs cap $cap (max %d, %.1f%% of band rows in over-cap " +
          "buckets, dropped from pairing). Recall would silently collapse " +
          "toward ZERO: raise the bucket space (signBits / numHashes per " +
          "band) or the cap, or rerun without strict to inspect the " +
          "bucket-stats histogram.",
        mean, col("__g_max"), dropFrac * 100))))
      .select(lit(1).as("__g_ok"))
    tapped.crossJoin(broadcast(guard)).drop("__g_ok")
  }

  private def ensureListener(spark: SparkSession): Unit =
    contexts.synchronized {
      val sc = spark.sparkContext
      if (contexts.add(sc)) {
        sc.addSparkListener(new SparkListener {
          override def onJobStart(e: SparkListenerJobStart): Unit = {
            val execId = Option(e.properties)
              .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
              .flatMap(_.toLongOption)
            execId.foreach { id =>
              stageToExec.synchronized {
                e.stageIds.foreach(s => stageToExec.put(s, id))
                while (stageToExec.size > MaxStages)
                  stageToExec.remove(stageToExec.head._1)
              }
            }
          }
          override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
            val accIds = e.taskInfo.accumulables.map(_.id)
            if (accIds.nonEmpty) {
              stageToExec.synchronized(stageToExec.get(e.stageId)).foreach { id =>
                registry.synchronized {
                  accIds.foreach(aid => byAccId.get(aid).foreach(_.lastExecId = id))
                }
              }
            }
          }
          override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
            case end: SparkListenerSQLExecutionEnd => evaluate(end.executionId)
            case _ => ()
          }
        })
      }
    }

  /** Evaluate the accumulators whose data came from THIS execution, report,
    * and reset them so a re-execution of the same frame observes afresh. */
  private def evaluate(execId: Long): Unit = {
    val due = registry.synchronized {
      registry.filterInPlace(_.ref.get != null)
      byAccId.filterInPlace((_, e) => e.ref.get != null)
      registry.toList.filter(_.lastExecId == execId)
        .flatMap(e => Option(e.ref.get).filterNot(_.isZero).map(acc => (e, acc)))
    }
    due.foreach { case (e, acc) =>
      val o = Observation(e.caller, e.cap, acc.value, e.sessionKey)
      acc.reset()
      e.lastExecId = -1L
      recent.synchronized {
        recent += o
        if (recent.size > KeepLast) recent.remove(0, recent.size - KeepLast)
      }
      if (o.saturated) Warn(f"${o.caller}: LSH bucket space is saturating — " +
        f"mean bucket size ${o.meanSize}%.1f vs cap ${e.cap} " +
        f"(max ${o.stats.maxSize}, ${o.droppedRowFrac * 100}%.1f%% of band " +
        "rows in over-cap buckets, dropped from pairing). Recall degrades " +
        "toward ZERO as buckets overflow: raise the bucket space " +
        "(signBits / numHashes per band) or the cap, and audit with the " +
        "bucket-stats histogram")
    }
  }

  /** Test seam: the live accumulators registered for `caller`. */
  private[graft] def accsFor(caller: String): Seq[BucketAcc] =
    registry.synchronized(
      registry.toList.filter(_.caller == caller).flatMap(e => Option(e.ref.get)))
}
