package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Uniform k-sample per group as a MERGEABLE bottom-k sketch: keep
  * the k items whose seeded rank hash is smallest (KMV / hash-rank
  * sampling — a uniform sample because the hash induces a uniform
  * random permutation of the group). Unlike classic reservoir
  * sampling (Algorithm R), whose result depends on encounter order,
  * bottom-k is a pure FUNCTION of the input SET: deterministic at
  * any parallelism, merge-order-independent (merge = bottom-k of the
  * union), and therefore replicable by an external engine as
  * `row_number() OVER (ORDER BY hash) <= k` — which is exactly what
  * the sample_reservoir oracle does.
  *
  * The point of the custom aggregate vs that window form is the
  * SHUFFLE: the window sorts every row of the corpus through an
  * exchange; this aggregate keeps a ≤ k bounded max-heap per
  * partition, so map-side partial aggregation reduces each
  * partition to k rows and only k·groups tiny buffers cross the
  * wire — the difference between shuffling 100 TB and shuffling
  * kilobytes.
  *
  * Ties: ordered by (hash, payload) so duplicate hash values (or
  * duplicate payloads) cannot make the result ambiguous.
  */
case class ReservoirAgg(
    left: Expression, // rank hash (long)
    right: Expression, // sampled payload (long)
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]]
  with BinaryLike[Expression] {

  // max-heap on (hash, payload): head is the current worst of the
  // best-k and is evicted in O(log k) when a smaller rank arrives
  private def ord: Ordering[(Long, Long)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Long)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(ord)

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null) {
      val e = (h.asInstanceOf[Long], v.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(e)
      else if (ord.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
    }
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Long, Long)],
      b2: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    b2.foreach { e =>
      if (b1.size < k) b1.enqueue(e)
      else if (ord.lt(e, b1.head)) { b1.dequeue(); b1.enqueue(e) }
    }
    b1
  }

  /** Sampled payloads, ascending (hash, payload) — position = rank. */
  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted(ord).map(_._2: Any))

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val entries = buf.toArray
    val bb = java.nio.ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (h, v) => bb.putLong(h); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): ReservoirAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ReservoirAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ReservoirAgg =
    copy(left = l, right = r)
}

object ReservoirAgg {
  /** Bottom-k payload sample ordered by (rankHash, payload). */
  def reservoir(rankHash: Column, payload: Column, k: Int): Column =
    Bridge.column(ReservoirAgg(Bridge.expression(rankHash),
      Bridge.expression(payload), k).toAggregateExpression())
}
