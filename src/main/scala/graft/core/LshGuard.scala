package graft.core

import java.lang.ref.WeakReference
import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.DataFrame
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
 * The warning fires on the listener thread (the driver) through [[Warn]];
 * [[observations]] keeps a recent window for specs and for operators that
 * want the numbers. Advisory accuracy: speculative/retried tasks can
 * double-count a bucket (standard accumulator at-least-once semantics) —
 * irrelevant to a mean-vs-cap/2 threshold check.
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

  /** One evaluated guard observation. */
  final case class Observation(caller: String, cap: Int, stats: Stats) {
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

  private final case class Entry(ref: WeakReference[BucketAcc], caller: String,
                                 cap: Int)

  private val registry = scala.collection.mutable.ArrayBuffer.empty[Entry]
  // weak identity set: one listener per SparkContext, never pinned
  private val contexts = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext, java.lang.Boolean])
  private val recent = scala.collection.mutable.ArrayBuffer.empty[Observation]
  private val KeepLast = 64

  /** Recent observations, newest last (bounded window). */
  def observations: Seq[Observation] = recent.synchronized(recent.toSeq)
  def clearObservations(): Unit = recent.synchronized(recent.clear())

  /** Attach the guard to a per-(band,bucket) size frame: `buckets` carries
    * one row per bucket with its row count in `sizeCol`; the returned frame
    * is row-identical (an always-true filter). No-op when uncapped — that
    * path already warns at call time. */
  def instrument(buckets: DataFrame, sizeCol: String, cap: Int,
                 caller: String): DataFrame = {
    if (cap == Int.MaxValue) return buckets
    val spark = buckets.sparkSession
    ensureListener(spark)
    val acc = new BucketAcc(cap)
    spark.sparkContext.register(acc, s"graft.lsh.guard.$caller")
    registry.synchronized {
      registry.filterInPlace(_.ref.get != null)
      registry += Entry(new WeakReference(acc), caller, cap)
    }
    // non-deterministic so the optimizer can neither prune the tap nor
    // push/reorder it below the bucket aggregation it measures
    val tap = udf((sz: java.lang.Long) => {
      if (sz != null) acc.add(sz.longValue())
      true
    }).asNondeterministic()
    buckets.filter(tap(col(sizeCol)))
  }

  private def ensureListener(spark: org.apache.spark.sql.SparkSession): Unit =
    contexts.synchronized {
      val sc = spark.sparkContext
      if (contexts.add(sc)) {
        sc.addSparkListener(new SparkListener {
          override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
            case _: SparkListenerSQLExecutionEnd => evaluateAll()
            case _ => ()
          }
        })
      }
    }

  /** Evaluate every accumulator that has data, report, and reset it so a
    * re-execution of the same frame observes afresh. */
  private def evaluateAll(): Unit = {
    val due = registry.synchronized {
      registry.filterInPlace(_.ref.get != null)
      registry.toList.flatMap(e => Option(e.ref.get).filterNot(_.isZero)
        .map(acc => (e, acc)))
    }
    due.foreach { case (e, acc) =>
      val o = Observation(e.caller, e.cap, acc.value)
      acc.reset()
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
}
