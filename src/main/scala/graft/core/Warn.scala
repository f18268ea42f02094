package graft.core

/**
 * Engine warning channel with a pluggable sink — operational footgun
 * warnings (e.g. requesting uncapped LSH bucket expansion) go through here
 * so library users see them on stderr by default and specs can observe the
 * warning path by swapping the sink.
 */
object Warn {
  @volatile var sink: String => Unit =
    msg => System.err.println(s"[graft][WARN] $msg")

  // capture is thread-scoped: sbt runs suites in parallel, and a
  // process-global swap would let concurrent suites steal (or lose) each
  // other's warnings. Threads outside any capture fall through to `sink`.
  private val captured =
    new scala.util.DynamicVariable[Option[String => Unit]](None)

  def apply(msg: String): Unit = captured.value.getOrElse(sink)(msg)

  /** Run `body` with warnings from THIS thread captured into a buffer —
    * the spec-side observer. Other threads' warnings still reach the
    * default sink, and concurrent captures cannot interfere.
    *
    * Limitation (by design): capture is driver-caller-thread scoped, so a
    * warning emitted from inside a Spark task (an executor pool thread)
    * during `body` bypasses the capture and lands on the default sink.
    * Every current `Warn(...)` call site warns at OPERATOR CALL TIME on the
    * caller thread (Dedup/Similarity cap checks) — keep it that way: a new
    * operator that must warn from inside a job should instead surface the
    * condition as data (a column / count) and warn from the driver. */
  def capturing[T](body: => T): (T, Seq[String]) = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val result = captured.withValue(Some(msg => buf.synchronized { buf += msg }))(body)
    (result, buf.synchronized(buf.toSeq))
  }
}
