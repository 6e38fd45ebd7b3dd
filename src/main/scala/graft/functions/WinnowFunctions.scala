package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
  * MOSS algorithm): k-gram RABIN-KARP ROLLING hashes — each hash is
  * O(1) from its predecessor, O(n) per document total, where
  * re-hashing every k-gram from scratch would be O(n·k) — then the
  * rightmost-minimum of every w-hash window is selected. The
  * guarantee: any substring match of length ≥ w+k−1 between two
  * documents shares at least one selected fingerprint, at an
  * expected density of 2/(w+1) — the index stays a constant fraction
  * of the corpus at 100 TB.
  *
  * Arithmetic is the polynomial hash mod M = 2³¹−1 with base 257
  * over Unicode CODEPOINTS (what the oracle's substr/unicode see,
  * not UTF-16 units); powers are taken mod M so every intermediate
  * fits comfortably in 64 bits (max term 0x10FFFF·(2³¹−1) < 2⁵²) —
  * which is also what makes the operator ORACLE-REPLICABLE: the
  * oracle engine evaluates the same lattice with plain BIGINT
  * arithmetic and must agree bit-for-bit.
  *
  * Output: one long per selected fingerprint, encoded
  * `(pos << 32) | hash` (pos = 1-based k-gram offset; hash < 2³¹),
  * ordered by pos — decoded to columns by the operator.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType)
  override def nullIntolerant: Boolean = true

  import WinnowFingerprints.{B, M}

  @transient private lazy val topPow: Long = {
    var p = 1L
    for (_ <- 0 until k - 1) p = p * B % M
    p
  }

  override def nullSafeEval(input: Any): Any = {
    // hash UNICODE CODEPOINTS, not UTF-16 code units: the oracle
    // engine's substr/length/unicode are codepoint-based, and a
    // supplementary-plane char (emoji) is 2 UTF-16 units but 1
    // codepoint — unit-based hashing would shift every downstream
    // position and hash
    val cp = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cp.length
    val nh = n - k + 1
    if (nh < w) return new GenericArrayData(Array.emptyLongArray)
    // Rabin-Karp: h(p+1) = (h(p) − s[p]·B^(k−1))·B + s[p+k]  (mod M)
    val h = new Array[Long](nh)
    var cur = 0L
    var i = 0
    while (i < k) { cur = (cur * B + cp(i)) % M; i += 1 }
    h(0) = cur
    var p = 1
    while (p < nh) {
      cur = ((cur - cp(p - 1).toLong * topPow % M + M) % M * B + cp(p + k - 1)) % M
      h(p) = cur
      p += 1
    }
    // winnow: rightmost minimum of each w-window via a monotonic
    // deque (amortized O(1) per position); `>=` when popping makes
    // the RIGHTMOST of equal minima win, the standard robust variant
    val deque = new Array[Int](nh)
    var head = 0; var tail = 0 // [head, tail) holds candidate indices
    val out = new scala.collection.mutable.ArrayBuffer[Long]
    var last = -1
    var q = 0
    while (q < nh) {
      while (tail > head && h(deque(tail - 1)) >= h(q)) tail -= 1
      deque(tail) = q; tail += 1
      if (deque(head) <= q - w) head += 1
      if (q >= w - 1) {
        val sel = deque(head)
        if (sel != last) { // consecutive windows re-select silently
          out += ((sel + 1).toLong << 32) | h(sel)
          last = sel
        }
      }
      q += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

object WinnowFingerprints {
  /** Polynomial base and modulus (2³¹−1, Mersenne): shared with the
    * oracle SQL so both engines hash identically.
    */
  val B = 257L
  val M = 2147483647L

  /** The k powers B^(k−1), …, B, 1 (mod M) — exposed so the oracle
    * SQL embeds the very same constants the expression rolls with.
    */
  def powers(k: Int): Seq[Long] =
    (0 until k).map { j =>
      var p = 1L
      for (_ <- 0 until k - 1 - j) p = p * B % M
      p
    }
}

object WinnowFunctions {
  /** Winnowing fingerprints of a string column: array of
    * `(pos << 32) | hash` longs (see [[WinnowFingerprints]]).
    */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), k, w))
}
