package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Mergeable quantile summary — a LOG-HISTOGRAM sketch of the
  * DDSketch / HDR-histogram class (Masson, Rim & Lee, "DDSketch: a
  * fast and fully-mergeable quantile sketch with relative-error
  * guarantees", VLDB 2019), the quantile member of the engine's
  * mergeable-summary family next to HLL (sketch_cube), Misra-Gries
  * ([[MisraGriesAgg]]) and bottom-k ([[ReservoirAgg]]): non-negative
  * long values collapse into exponentially-spaced buckets — the
  * value's power-of-two exponent plus the next [[QuantileSketchAgg.M]]
  * mantissa bits — so the buffer is a count map over at most
  * `64 · 2^M` cells (KILOBYTES, never corpus-sized), counts add under
  * merge with no ordering sensitivity, and any quantile reads off the
  * cumulative histogram with relative value error ≤ 2^-M (≈ 3% at
  * M = 5). Where KLL/t-digest trade determinism for rank-error
  * optimality (their compactions are randomized / merge-order
  * dependent), the log-histogram's state is a pure function of the
  * input MULTISET — deterministic at any parallelism, which is what
  * lets the registered query be oracle-checked bit-exactly (DuckDB
  * reproduces the bucket lattice with `bin()`/shift/mask integer
  * ops) instead of rows-only like a randomized sketch would force.
  *
  * Quantile convention: percentile p of n values is the bucket
  * REPRESENTATIVE (lower bound) of the first bucket whose cumulative
  * count reaches ceil(p·n/100) in ascending value order — an order
  * statistic on the bucket lattice, the ccnet_buckets tertile rule.
  * Scale shape: partial aggregation does all the data-sized work
  * map-side; only bounded bucket maps cross the wire, and a hot
  * group is a hot AGGREGATION key absorbed by map-side combine.
  */
case class QuantileSketchAgg(
    child: Expression,
    percents: Seq[Int],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Long]]
  with UnaryLike[Expression] {

  import QuantileSketchAgg._

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Long, Long],
      input: InternalRow): mutable.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val idx = bucketOf(v.asInstanceOf[Long])
      buf(idx) = buf.getOrElse(idx, 0L) + 1L
    }
    buf
  }

  override def merge(b1: mutable.HashMap[Long, Long],
      b2: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    b2.foreach { case (k, c) => b1(k) = b1.getOrElse(k, 0L) + c }
    b1
  }

  /** One long per requested percentile, ascending-lattice order
    * statistics; null when the group had no non-null values.
    */
  override def eval(buf: mutable.HashMap[Long, Long]): Any = {
    if (buf.isEmpty) return null
    val cells = buf.toArray.sortBy(_._1)
    val n = cells.map(_._2).sum
    val out = new Array[Any](percents.length)
    var pi = 0
    while (pi < percents.length) {
      val threshold = (percents(pi) * n + 99) / 100 // ceil(p·n/100)
      var cum = 0L
      var ci = 0
      var rep = 0L
      var found = false
      while (ci < cells.length && !found) {
        cum += cells(ci)._2
        if (cum >= threshold) { rep = repOf(cells(ci)._1); found = true }
        ci += 1
      }
      out(pi) = rep
      pi += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < n) { buf(bb.getLong) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantileSketchAgg =
    copy(child = c)
}

object QuantileSketchAgg {

  /** Mantissa bits per bucket: relative value error ≤ 2^-M. M = 5
    * bounds the lattice at 64·32 = 2048 cells (a ≤ 32 KB buffer) —
    * the kilobyte-summary regime the mergeable-sketch family targets.
    */
  val M = 5

  private val Base = 1L << M // 32: values below it are exact cells

  /** Bucket index of a non-negative value (negatives clamp to 0, the
    * sketch's domain contract): values < 2^M are their own exact
    * cell; above, the cell is (exponent, top-M mantissa bits) packed
    * so indices increase with value — bit-for-bit the SQL lattice
    * `CASE WHEN v < 32 THEN v ELSE (length(bin(v)) - 5) * 32 +
    * (v >> (length(bin(v)) - 6)) & 31 END` (DuckDB and Spark agree
    * on bin/shift/mask over BIGINT, which is what makes the
    * registered query hash-comparable).
    */
  def bucketOf(v: Long): Long = {
    val x = if (v < 0) 0L else v
    if (x < Base) x
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val sub = (x >> (e - M)) & (Base - 1)
      ((e - M + 1).toLong << M) + sub
    }
  }

  /** Bucket representative: the cell's LOWER BOUND (so the reported
    * quantile is always an achievable value floor, never above any
    * member of the cell). Inverse of [[bucketOf]] on cell floors.
    */
  def repOf(idx: Long): Long =
    if (idx < Base) idx
    else (Base + (idx & (Base - 1))) << ((idx >> M) - 1)

  /** Quantile-card column: one long per percent point (ascending
    * order statistics on the bucket lattice) over a long column.
    */
  def quantileSketch(c: Column, percents: Seq[Int]): Column =
    Bridge.column(QuantileSketchAgg(Bridge.expression(c), percents)
      .toAggregateExpression())
}
