package graft.core

import org.apache.spark.sql.DataFrame

/**
 * Session-wide registry for caches taken INSIDE operators whose results are
 * returned lazily — the operator persists an intermediate that several
 * branches of its output plan share, but cannot know when the caller
 * materializes that output, so it cannot unpersist itself.
 *
 * Contract: the session owner calls `releaseAll()` after materializing an
 * operator's result (Verify and Bench do this per query). The registry is
 * session-global: a service running CONCURRENT requests on one session must
 * call `releaseAll()` only at idle points (or scope operators per request),
 * because a release mid-flight unpersists another request's live caches and
 * forces recomputation. Operators whose lifecycle IS bounded release their
 * own caches instead and never appear here (DqSuite.run is eager, Upsert
 * exposes `cleanup()`, Dedup.dupClusters unpersists in-loop).
 *
 * Without this, repeated operator invocations in a long-lived session pin
 * dead cache partitions and re-persists of identical plans surface as
 * "Asked to cache already cached data" churn.
 */
object Caches {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` and remember it for the next `releaseAll()`. */
  def track(df: DataFrame): DataFrame = synchronized {
    val c = df.persist()
    frames += c
    c
  }

  /** Unpersist every tracked frame (idempotent; blocking=false). */
  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist())
    frames.clear()
  }

  /** Number of currently tracked (still-pinned) frames — for specs. */
  def trackedCount: Int = synchronized(frames.size)
}
