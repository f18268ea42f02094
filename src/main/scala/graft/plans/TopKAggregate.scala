package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Bounded top-k aggregate: keeps the k best (score, id) pairs per group —
 * ordered by score DESC then id ASC — in a fixed-size heap.
 *
 * This is the scale-correct form of "rank ≤ k": the window formulation
 * (`row_number().over(partitionBy(key).orderBy(score))`) shuffles and
 * SORTS every candidate row per key, O(n log n) per key with the full
 * candidate set materialized; this aggregate keeps only k entries per group
 * on the map side (partial aggregation), shuffles at most k rows per group,
 * and never sorts the full set — O(n log k), with the candidate volume cut
 * before the exchange.
 *
 * Output: array<struct<id bigint, score double>> sorted best-first; explode
 * with posexplode to recover (rank, id, score) rows identical to the window
 * form (ties broken by id asc — deterministic).
 */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopK.Heap] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"bounded_top_k expects (double, bigint), got (${s.simpleString}, ${i.simpleString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"

  override def createAggregationBuffer(): BoundedTopK.Heap = new BoundedTopK.Heap(k)

  override def update(buf: BoundedTopK.Heap, input: InternalRow): BoundedTopK.Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedTopK.Heap, other: BoundedTopK.Heap): BoundedTopK.Heap = {
    other.foreach((s, i) => buf.offer(s, i))
    buf
  }

  override def eval(buf: BoundedTopK.Heap): Any = {
    val sorted = buf.sortedBestFirst
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(i, s)
    })
  }

  override def serialize(buf: BoundedTopK.Heap): Array[Byte] = {
    val entries = buf.sortedBestFirst
    val bb = java.nio.ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = new BoundedTopK.Heap(k)
    (0 until n).foreach(_ => heap.offer(bb.getDouble, bb.getLong))
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(score = newChildren(0), id = newChildren(1))
}

object BoundedTopK {
  /** "Worst-first" bounded heap: root is the entry to evict. Ordering of
    * quality: higher score better; equal score → SMALLER id better, so the
    * root (worst) is the lowest score / largest id. */
  final class Heap(k: Int) {
    // better(a, b): is a strictly better than b
    private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)
    private val pq = new java.util.PriorityQueue[(Double, Long)](k,
      // worst first: a before b when a is WORSE than b
      (a: (Double, Long), b: (Double, Long)) =>
        if (better(a._1, a._2, b._1, b._2)) 1
        else if (better(b._1, b._2, a._1, a._2)) -1
        else 0)

    def offer(s: Double, i: Long): Unit = {
      if (pq.size < k) pq.offer((s, i))
      else {
        val worst = pq.peek()
        if (better(s, i, worst._1, worst._2)) { pq.poll(); pq.offer((s, i)) }
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit =
      pq.iterator().forEachRemaining(e => f(e._1, e._2))

    def sortedBestFirst: Array[(Double, Long)] = {
      import scala.jdk.CollectionConverters._
      pq.iterator().asScala.toArray.sortWith((a, b) => better(a._1, a._2, b._1, b._2))
    }
  }
}
