package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer scatter-matrix aggregate for emb_pca: quantizes each
  * vector to the q = round(x·scale) lattice INSIDE the update loop
  * (no per-row HOF projection) and accumulates the d×d outer-product
  * sums, the d vector sums, and the row count in ONE mergeable
  * Array[Long] buffer of d²+d+1 entries (~33 KB at d=64 — the
  * kilobyte-summary class: the corpus never shuffles, buffers do).
  * Integer sums are exact and order-independent, so the downstream
  * eigendecomposition is bit-deterministic at any parallelism.
  *
  * Overflow bound: |q| ≤ |x|·scale; at unit-scale embeddings and
  * scale = 1000, q² ≤ ~2.5·10⁷ per row — the global sum stays inside
  * a signed long up to ~3·10¹¹ rows; larger deployments lower the
  * scale one decade per ~100× rows (the lattice granularity is part
  * of the operator's published contract either way).
  */
case class ScatterAgg(
    child: Expression,
    dim: Int,
    scale: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val size = dim * dim + dim + 1

  override def createAggregationBuffer(): Array[Long] = new Array[Long](size)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dim, arr.numElements())
      val q = new Array[Long](dim)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) q(i) = math.round(arr.getDouble(i) * scale)
        i += 1
      }
      i = 0
      while (i < dim) {
        val qi = q(i)
        val row = i * dim
        var j = 0
        while (j < dim) { buf(row + j) += qi * q(j); j += 1 }
        buf(dim * dim + i) += qi
        i += 1
      }
      buf(size - 1) += 1L
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = LongArrayCodec.write(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = LongArrayCodec.read(bytes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): ScatterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ScatterAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ScatterAgg =
    copy(child = c)
}

object ScatterAgg {
  def scatter(v: Column, dim: Int, scale: Double): Column =
    Bridge.column(ScatterAgg(Bridge.expression(v), dim, scale).toAggregateExpression())
}
