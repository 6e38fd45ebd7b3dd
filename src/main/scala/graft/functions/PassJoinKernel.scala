package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PassJoin key generation for dedup_fuzzy_text (round 16, guide §4):
  * ONE eval per document emits the whole probe/index key array that
  * the r15 form built from three chained `explode(sequence(...))`
  * Generates plus a per-row `xxhash64(substring(...))` projection —
  * measured 1.8-2.2 s of the query's 3.5-4.2 s at sf0.1: each of the
  * ~350 probe rows per doc allocated boxed sequence arrays and
  * re-walked the text's UTF-8 bytes from position 0 to find its
  * substring (substring is O(position) on variable-width encodings).
  * The kernel walks the byte array ONCE per document to index char
  * starts, then hashes each key's byte slice in place with the SAME
  * XXH64 (seed 42) Spark's `xxhash64` applies to a string — key
  * values are bit-identical to the SQL form's, so the candidate join
  * (and every downstream row) is unchanged; PassJoinKernelSpec pins
  * kernel ≡ SQL on the corpus and on crafted multi-byte texts.
  *
  * Enumeration mirrors the operator verbatim (integer div on longs,
  * same clamps): index side — the doc's τ+1 proportional segments,
  * (i_b, h) per non-empty segment; probe side — for each target
  * length l2 ∈ [len−τ, len] ∩ [1, ∞) and segment i_a of the
  * l2-partition, the substring of the segment's length at every
  * 1-based start within ±τ of its home offset, (l2, i_a, h) each.
  */
object PassJoinKernel {

  def passJoinIndex(t: Column, tau: Int): Column =
    Bridge.column(PassJoinIndexKernel(Bridge.expression(t), tau))

  def passJoinProbes(t: Column, tau: Int): Column =
    Bridge.column(PassJoinProbeKernel(Bridge.expression(t), tau))

  /** Byte offset of each character start, plus the terminal byte
    * length — offsets(c) = first byte of char c, offsets(numChars) =
    * numBytes. One walk per document.
    */
  private def charOffsets(t: UTF8String): Array[Int] = {
    val nBytes = t.numBytes
    val base = t.getBaseObject
    val off = t.getBaseOffset
    val out = new Array[Int](t.numChars + 1)
    var i = 0
    var c = 0
    while (i < nBytes) {
      out(c) = i
      i += UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + i))
      c += 1
    }
    out(c) = nBytes
    out
  }

  /** xxhash64 (seed 42 — Spark's default) of the chars [s, e) as the
    * SQL `xxhash64(substring(t, s+1, e-s))` hashes them: over the
    * substring's UTF-8 bytes, sliced in place.
    */
  private def sliceHash(t: UTF8String, offsets: Array[Int], s: Int, e: Int): Long =
    XXH64.hashUnsafeBytes(t.getBaseObject,
      t.getBaseOffset + offsets(s), offsets(e) - offsets(s), 42L)

  private[functions] def indexKeys(t: UTF8String, tau: Int): GenericArrayData = {
    val n = tau + 1
    val offsets = charOffsets(t)
    val len = (offsets.length - 1).toLong
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0L
    while (i <= tau) {
      val start = i * len / n        // 0-based char start
      val slen = (i + 1) * len / n - start
      if (slen >= 1)
        out += InternalRow(i, sliceHash(t, offsets, start.toInt, (start + slen).toInt))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private[functions] def probeKeys(t: UTF8String, tau: Int): GenericArrayData = {
    val n = tau + 1
    val offsets = charOffsets(t)
    val len = (offsets.length - 1).toLong
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    var l2 = math.max(1L, len - tau)
    while (l2 <= len) {
      var ia = 0L
      while (ia <= tau) {
        val off2 = 1L + ia * l2 / n  // 1-based home offset in the l2-partition
        val slen = (ia + 1) * l2 / n - ia * l2 / n
        if (slen >= 1) {
          val lo = math.max(1L, off2 - tau)
          val hi = math.min(len - slen + 1, off2 + tau)
          var p = lo
          while (p <= hi) {
            out += InternalRow(l2, ia,
              sliceHash(t, offsets, (p - 1).toInt, (p - 1 + slen).toInt))
            p += 1
          }
        }
        ia += 1
      }
      l2 += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class PassJoinIndexKernel(child: Expression, tau: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i_b", LongType),
    StructField("h", LongType))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(t: Any): Any =
    PassJoinKernel.indexKeys(t.asInstanceOf[UTF8String], tau)
  override protected def withNewChildInternal(c: Expression): PassJoinIndexKernel =
    copy(child = c)
}

case class PassJoinProbeKernel(child: Expression, tau: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("l2", LongType),
    StructField("i_a", LongType),
    StructField("h", LongType))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(t: Any): Any =
    PassJoinKernel.probeKeys(t.asInstanceOf[UTF8String], tau)
  override protected def withNewChildInternal(c: Expression): PassJoinProbeKernel =
    copy(child = c)
}
