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

  def apply(msg: String): Unit = sink(msg)

  /** Run `body` with warnings captured into a buffer (restores the
    * previous sink afterwards) — the spec-side observer. */
  def capturing[T](body: => T): (T, Seq[String]) = {
    val prev = sink
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    sink = msg => buf.synchronized { buf += msg }
    try (body, buf.toSeq) finally sink = prev
  }
}
