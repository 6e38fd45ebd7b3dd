package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Approximate heavy hitters — the MISRA-GRIES summary (decrement
  * on miss, so estimates never exceed true counts; Space-Saving, by
  * contrast, replaces the min counter and overestimates) as one
  * custom aggregate, the frequent-items counterpart of q16's HLL:
  * exact
  * top-terms need a full term shuffle; this keeps ≤ `capacity`
  * counters per partition, merges mergeably (Agarwal et al., the
  * MERGEABLE SUMMARIES result), and guarantees every term with true
  * frequency > n/(capacity+1) survives with count error ≤
  * n/(capacity+1). Map-side partial aggregation does almost all the
  * work; only capacity-bounded buffers cross the wire.
  *
  * Determinism caveat, and how the operator handles it: the
  * estimates depend on merge order ONLY when evictions occur. With
  * `capacity` above the live vocabulary nothing ever evicts and the
  * summary IS the exact count table — which is what makes the
  * registered query oracle-checkable; the approximation regime is
  * covered by an error-bound spec on a synthetic over-capacity
  * corpus.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None =>
          if (buf.size < capacity) buf(s) = 1L
          else decrementAll(buf, 1L) // Misra-Gries miss: all counters -1
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, c) => b1(k) = b1.getOrElse(k, 0L) + c }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest count — the mergeable-
      // summaries reduction, leaving ≤ capacity survivors
      val cut = b1.values.toArray.sortBy(-_).apply(capacity)
      decrementAll(b1, cut)
    }
    b1
  }

  private def decrementAll(buf: mutable.HashMap[String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer[String]()
    buf.foreach { case (k, c) => if (c <= by) dead += k else buf(k) = c - by }
    dead.foreach(buf.remove)
  }

  /** Survivors as (term, est) structs, count-desc then UTF-8-binary
    * term order (Spark's own string order) — deterministic given a
    * deterministic summary.
    */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray
      .map { case (k, c) => (UTF8String.fromString(k), c) }
      .sortWith { case ((k1, c1), (k2, c2)) =>
        c1 > c2 || (c1 == c2 && k1.compareTo(k2) < 0)
      }
      .map { case (k, c) => InternalRow(k, c): Any }
    new GenericArrayData(rows)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val bytes = entries.map { case (k, _) => k.getBytes("UTF-8") }
    val bb = java.nio.ByteBuffer.allocate(
      4 + bytes.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.zip(bytes).foreach { case ((_, c), kb) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf(new String(kb, "UTF-8")) = bb.getLong
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("est", LongType))))
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
}

object MisraGriesAgg {
  /** Heavy-hitters (Misra-Gries) summary column over a string column. */
  def frequentTerms(c: Column, capacity: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(c), capacity)
      .toAggregateExpression())
}
