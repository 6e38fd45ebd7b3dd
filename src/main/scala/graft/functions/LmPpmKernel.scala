package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Map-side bigram-LM scorer for STREAM admission
  * ([[graft.streaming.CurationStream.curateGated]]): evaluates
  * [[graft.operators.LangModel]]'s add-one-smoothed mean bigram
  * probability over a word array with the trained model carried as
  * EXPRESSION data (the [[BpeEncodeText]] artifact convention, and
  * CCNet's production shape — the batch-trained LM file shipped to
  * every ingest node). Scoring a document never joins or shuffles:
  * one expression eval inside the scan stage, which is what an
  * admission gate on a live ingest path needs.
  *
  * Semantics: identical to the batch scorer on its own training
  * corpus — p_ppm(w1,w2) = (c2+1)·10⁶ div (c1+V), lm_ppm = Σp div n
  * on the same integer lattice (the equivalence is spec-asserted
  * bit-for-bit). UNSEEN bigrams — which the batch scorer never
  * meets, training on the corpus it scores — take the same add-one
  * formula with c2 = 0 (and c1 = 0 for an unseen context): the
  * natural smoothing extension. Sub-2-word docs score null (the
  * batch out-of-scope contract); an empty model (V = 0) scores 0 —
  * the gate treats both as unmeasurable and admits.
  */
case class LmPpmKernel(
    child: Expression,
    c2: Map[(String, String), Long],
    c1: Map[String, Long],
    vocab: Long)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    if (n < 2) return null
    var sum = 0L
    var prev = words.getUTF8String(0).toString
    var i = 1
    while (i < n) {
      val w = words.getUTF8String(i).toString
      val num = c2.getOrElse((prev, w), 0L) + 1L
      val den = c1.getOrElse(prev, 0L) + vocab
      sum += (
        if (den <= 0L) 0L
        // hot path stays in long arithmetic; a count beyond
        // Long.Max/10⁶ (possible at 100 TB bigram frequencies) takes
        // the exact BigInt route — same floor, no overflow
        else if (num < Long.MaxValue / 1000000L) num * 1000000L / den
        else (BigInt(num) * 1000000L / den).toLong)
      prev = w
      i += 1
    }
    sum / (n - 1)
  }

  override protected def withNewChildInternal(c: Expression): LmPpmKernel =
    copy(child = c)
}

object LmPpmKernel {
  /** lm_ppm of a word-array column under a driver-held bigram model. */
  def lmPpm(words: Column, c2: Map[(String, String), Long],
      c1: Map[String, Long], vocab: Long): Column =
    Bridge.column(LmPpmKernel(Bridge.expression(words), c2, c1, vocab))
}
