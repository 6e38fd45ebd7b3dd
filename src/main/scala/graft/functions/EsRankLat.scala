package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** The Efraimidis–Spirakis rank `−ln(u)/w` as a PURE-INTEGER lattice
  * function (round 12 — the promotion that retires the last rows-only
  * entry a cross-engine form exists for): libm `ln` was the blocker —
  * Spark's Math.log and the oracle engine's ln may differ in the last
  * ulp, and one flipped 2⁴⁰-lattice point flips bottom-k membership.
  * This expression SPECIFIES the logarithm instead of delegating it:
  * the classic square-and-compare binary logarithm, 40 exact integer
  * steps both engines replay verbatim (the lsh_tune floor-recurrence
  * precedent).
  *
  * Spec, for u = U/2⁵³ (U ∈ [1, 2⁵³] the seeded 53-bit uniform) and
  * integer weight w_q4 ≥ 1 (the quality score in 10⁻⁴ units):
  *
  *  - e = bitlength(U); mantissa m = U·2^(63−e) ∈ [2⁶², 2⁶³).
  *  - 40 rounds: mm = m² (126-bit); if mm ≥ 2¹²⁵ the frac bit is 1
  *    and m = mm >> 63, else 0 and m = mm >> 62 — after which
  *    f ∈ [0, 2⁴⁰) is the 40-bit fraction of log₂(U) (truncated; the
  *    truncation is part of the spec, not an error term).
  *  - A = (54−e)·2⁴⁰ − f  ( = −log₂(u)·2⁴⁰ )
  *  - rank = A·7621233847860000 div (w_q4·2⁴⁰), where 7621233847860000
  *    = round(ln2·2⁴⁰)·10⁴ — i.e. −ln(u)/w on the 2⁴⁰ lattice with the
  *    q4 weight scale folded in. All intermediates < 2⁹⁹ (fits both
  *    engines' 128-bit integer arithmetic).
  *
  * The map from true E-S ranks is monotone up to ~2⁻⁴⁰ relative error
  * in the logarithm, so the weighted-without-replacement inclusion
  * property is preserved to far below any statistical resolution —
  * and the deterministic bottom-k is now the SAME set on any engine
  * that follows the spec (the DuckDB oracle unrolls the 40 rounds
  * over HUGEINT).
  */
case class EsRankLat(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(u: Any, w: Any): Any =
    EsRankLat.rank(u.asInstanceOf[Long], w.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): EsRankLat = copy(left = l, right = r)
}

object EsRankLat {
  /** round(ln2 · 2⁴⁰) — the one transcendental, frozen as an integer. */
  val Ln2Q40 = 762123384786L
  private val Ln2Q40TimesQ4 = Ln2Q40 * 10000L

  def esRankLat(u: Column, wq4: Column): Column =
    Bridge.column(EsRankLat(Bridge.expression(u), Bridge.expression(wq4)))

  /** The spec above, in longs (one 128-bit square per round via
    * multiplyHigh; BigInteger only for the final 99-bit product).
    * Also the spec suite's reference — there is exactly one JVM
    * implementation to diverge from.
    */
  def rank(u: Long, wq4: Long): Long = {
    require(u >= 1L && u <= (1L << 53), s"U out of [1, 2^53]: $u")
    require(wq4 >= 1L, s"non-positive weight: $wq4")
    val e = 64 - java.lang.Long.numberOfLeadingZeros(u)
    var m = u << (63 - e)
    var f = 0L
    var i = 0
    while (i < 40) {
      val hi = Math.multiplyHigh(m, m)
      val lo = m * m
      if (hi >= (1L << 61)) { // mm >= 2^125
        f = (f << 1) | 1L
        m = (hi << 1) | (lo >>> 63)
      } else {
        f = f << 1
        m = (hi << 2) | (lo >>> 62)
      }
      i += 1
    }
    val a = (54L - e) * (1L << 40) - f
    java.math.BigInteger.valueOf(a)
      .multiply(java.math.BigInteger.valueOf(Ln2Q40TimesQ4))
      .divide(java.math.BigInteger.valueOf(wq4).shiftLeft(40))
      .longValueExact()
  }
}
