package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-class, Kudo 2018) segmentation kernels:
  * the OTHER production subword family next to BPE — instead of a
  * greedy merge table, a probability model over candidate pieces,
  * and each word segments to its maximum-likelihood piece sequence
  * (Viterbi). The model rides along as expression data (the
  * BpeEncodeText convention): piece → count pairs, bounded by the
  * trainer's seed cap — broadcast-dimension class, no join.
  *
  * Scoring: a segmentation into pieces p₁..pₖ scores
  * Σ ln(c(pᵢ)) − k·ln(B) (B = total model count). Doubles, NOT a
  * cross-engine lattice — the tokenizer family is rows-only + an
  * exact in-JVM reference spec (the bpe_train convention), and the
  * arithmetic per word is a fixed-order fold, so results are
  * deterministic at any parallelism.
  *
  * Tie convention (part of the algorithm definition, mirrored by the
  * reference trainer in the spec): higher score, then FEWER pieces,
  * then the longer last piece at each DP cell. A character absent
  * from the model segments as itself at the unknown score
  * ln(0.5) − ln(B) — coverage is total by construction.
  */
object UnigramFunctions {

  private[graft] val UnkNumerator = 0.5

  /** Viterbi best segmentation of one word under a piece→count model.
    * `scores` maps piece → ln(count); `lnB` is ln(total count).
    */
  private[graft] def segmentWord(word: String,
      scores: java.util.HashMap[String, java.lang.Double],
      maxLen: Int, lnB: Double, unkScore: Double): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = new Array[Double](n + 1)
    val pieces = new Array[Int](n + 1) // piece count of the best path
    val back = new Array[Int](n + 1)   // start index of the last piece
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxLen)
      while (j - i >= 1) {
        if (best(i) > Double.NegativeInfinity) {
          val sub = word.substring(i, j)
          val ln = scores.get(sub)
          val s =
            if (ln != null) best(i) + ln.doubleValue() - lnB
            else if (j - i == 1) best(i) + unkScore // unknown single char
            else Double.NegativeInfinity
          if (s > Double.NegativeInfinity) {
            val k = pieces(i) + 1
            // strict improvement, or equal score with the tie rules
            val take =
              s > best(j) ||
                (s == best(j) && (k < pieces(j) ||
                  (k == pieces(j) && i < back(j))))
            if (take) { best(j) = s; pieces(j) = k; back(j) = i }
          }
        }
        i += 1
      }
      j += 1
    }
    val out = new Array[String](pieces(n))
    var pos = n
    var idx = pieces(n) - 1
    while (pos > 0) {
      out(idx) = word.substring(back(pos), pos)
      pos = back(pos)
      idx -= 1
    }
    out
  }

  def encodeText(wordsArr: Column, model: Seq[(String, Long)]): Column =
    Bridge.column(UnigramEncodeText(Bridge.expression(wordsArr), model))
}

/** Segment every word of a word-array column with the unigram model;
  * output is the concatenated piece sequence (empty words skipped).
  * One eval per document, map-side inside the scan stage.
  */
case class UnigramEncodeText(child: Expression, model: Seq[(String, Long)])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType)
  override def nullIntolerant: Boolean = true

  @transient private lazy val scores = {
    // values MUST be boxed java.lang.Double: with a primitive-typed
    // map Scala unboxes a missing key's null to 0.0, the null check
    // in segmentWord can never fire, and an unknown multi-char
    // substring scores like a count-1 piece — the Viterbi then emits
    // pieces OUTSIDE the vocabulary (caught by UnigramSpec's
    // out-of-vocab probe)
    val m = new java.util.HashMap[String, java.lang.Double](model.size * 2)
    model.foreach { case (p, c) =>
      m.put(p, java.lang.Double.valueOf(math.log(c.toDouble)))
    }
    m
  }
  @transient private lazy val maxLen =
    if (model.isEmpty) 1 else model.map(_._1.length).max
  @transient private lazy val lnB =
    math.log(math.max(1L, model.map(_._2).sum).toDouble)
  @transient private lazy val unkScore =
    math.log(UnigramFunctions.UnkNumerator) - lnB

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i).toString
        if (w.nonEmpty) {
          val segs = UnigramFunctions.segmentWord(w, scores, maxLen, lnB, unkScore)
          var k = 0
          while (k < segs.length) { out += UTF8String.fromString(segs(k)); k += 1 }
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): UnigramEncodeText =
    copy(child = c)
}
