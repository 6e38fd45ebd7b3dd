package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Buffer of [[RetractMaxAgg]]: signed net counts for every value
  * ABOVE the low watermark, plus the watermark itself. Invariant:
  * `m` holds the EXACT net count of every distinct value > `lw`
  * seen by this buffer (lw = Long.MinValue until a truncation
  * happens, so initially everything is exact).
  */
final class RetractMaxBuf(
    var lw: Long,
    val m: mutable.HashMap[Long, Long])

/** MAX over a changelog — the non-invertible aggregate under
  * DELETION, as a bounded MERGEABLE sketch (the alternative to
  * [[graft.operators.Warehouse.viewRetract]]'s affected-group
  * rescan, which a STREAMING view cannot do: there is no base to
  * rescan inside a micro-batch). State per group is a signed count
  * table of the `capacity` LARGEST distinct values; when it
  * overflows, the smallest entries are dropped and the low
  * watermark `lw` records the largest value ever discarded.
  *
  * Contract (the Misra-Gries determinism convention): every value
  * > lw is tracked with its exact net count, so
  *
  *  - some tracked value has net count > 0  → that value IS the true
  *    max (exact = true);
  *  - all tracked counts ≤ 0 after a truncation → the true max is
  *    somewhere ≤ lw: the sketch reports (lw, exact = false), a
  *    STALE UPPER BOUND — the documented price of never rescanning.
  *    Production re-seeds the group from storage when it sees
  *    exact = false (the view_retract path);
  *  - all counts ≤ 0 and never truncated → the group is genuinely
  *    empty (every insert retracted): NULL, exact = true.
  *
  * Below capacity nothing truncates, lw stays at MinValue, and the
  * merge (count addition + watermark max) is commutative and
  * associative — stream ≡ batch bit-for-bit regardless of
  * micro-batch partitioning (RetractStreamSpec). Deletes arriving
  * BEFORE their insert (changelog reordering) leave a negative net
  * count that cancels when the insert lands — no ordering
  * assumption between ops on different keys.
  */
case class RetractMaxAgg(
    left: Expression, // value (long)
    right: Expression, // sign (+1 insert / -1 delete)
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RetractMaxBuf]
  with BinaryLike[Expression] {

  override def createAggregationBuffer(): RetractMaxBuf =
    new RetractMaxBuf(Long.MinValue, mutable.HashMap.empty)

  private def truncate(buf: RetractMaxBuf): Unit = {
    if (buf.m.size <= capacity) return
    val doomed = buf.m.keysIterator.toArray.sorted
      .take(buf.m.size - capacity)
    doomed.foreach(buf.m.remove)
    buf.lw = math.max(buf.lw, doomed.last)
  }

  override def update(buf: RetractMaxBuf, input: InternalRow): RetractMaxBuf = {
    val v = left.eval(input)
    val s = right.eval(input)
    if (v != null && s != null) {
      val value = v.asInstanceOf[Long]
      // a value at or below the watermark lives in the discarded
      // region — its counts are already unrecoverable there
      if (value > buf.lw) {
        buf.m(value) = buf.m.getOrElse(value, 0L) + s.asInstanceOf[Long]
        truncate(buf)
      }
    }
    buf
  }

  override def merge(b1: RetractMaxBuf, b2: RetractMaxBuf): RetractMaxBuf = {
    b1.lw = math.max(b1.lw, b2.lw)
    b2.m.foreach { case (v, c) =>
      if (v > b1.lw) b1.m(v) = b1.m.getOrElse(v, 0L) + c
    }
    // entries from b1 now at or below the merged watermark are stale
    if (b1.lw > Long.MinValue)
      b1.m.keysIterator.filter(_ <= b1.lw).toArray.foreach(b1.m.remove)
    truncate(b1)
    b1
  }

  override def eval(buf: RetractMaxBuf): Any = {
    val live = buf.m.iterator.filter(_._2 > 0).map(_._1).toArray
    if (live.nonEmpty) InternalRow(live.max, true)
    else if (buf.lw == Long.MinValue) InternalRow(null, true)
    else InternalRow(buf.lw, false)
  }

  override def serialize(buf: RetractMaxBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + 16 * buf.m.size)
    bb.putLong(buf.lw)
    bb.putInt(buf.m.size)
    buf.m.foreach { case (v, c) => bb.putLong(v); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): RetractMaxBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val lw = bb.getLong
    val n = bb.getInt
    val m = mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < n) { m(bb.getLong) = bb.getLong; i += 1 }
    new RetractMaxBuf(lw, m)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("mx", LongType, nullable = true),
    StructField("exact", BooleanType, nullable = false)))
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): RetractMaxAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RetractMaxAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): RetractMaxAgg = copy(left = l, right = r)
}

object RetractMaxAgg {
  /** Retract-capable max sketch over (value, sign) columns. */
  def retractMax(value: Column, sign: Column, capacity: Int): Column =
    Bridge.column(RetractMaxAgg(
      Bridge.expression(value), Bridge.expression(sign), capacity)
      .toAggregateExpression())
}
