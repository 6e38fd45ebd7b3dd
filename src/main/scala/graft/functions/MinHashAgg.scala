package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as ONE custom aggregate.
  *
  * The composed form — 128 separate `min((h*a+b) % p)` aggregate
  * columns — builds a 128-wide expression tree and 128 independent
  * agg buffers. This TypedImperativeAggregate keeps the whole
  * signature in a single long-array buffer, applies every
  * permutation in one pass per input row (map-side partial, i.e.
  * combiner semantics preserved), and merges buffers elementwise —
  * the idiomatic Spark shape for sketch-like aggregation state
  * (same machinery as HLL/percentile sketches).
  */
case class MinHashAgg(
    child: Expression,
    permA: Seq[Long],
    permB: Seq[Long],
    p: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  // Seq fields (structural equality) keep semanticEquals/
  // canonicalization working; the hot loop runs on cached arrays.
  @transient private lazy val pa: Array[Long] = permA.toArray
  @transient private lazy val pb: Array[Long] = permB.toArray

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(pa.length)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = child.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long]
      var i = 0
      while (i < buf.length) {
        val v = (pa(i) * hv + pb(i)) % p
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = LongArrayCodec.write(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = LongArrayCodec.read(bytes)

  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MinHashAgg =
    copy(child = c)
}

/** Shared buffer codec for Array[Long]-buffered aggregates. */
private[functions] object LongArrayCodec {
  def write(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  def read(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }
}

object MinHashAgg {
  /** Aggregate Column: array<long> minhash signature of a
    * hash-valued column under the given permutations.
    */
  def minhashAgg(h: Column, permA: Seq[Long], permB: Seq[Long], p: Long): Column =
    Bridge.column(MinHashAgg(Bridge.expression(h), permA, permB, p)
      .toAggregateExpression())
}
