package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding kernels (Sennrich et al. 2016, the
  * subword-nmt/GPT-2 tokenizer family) as map-side Catalyst
  * expressions. The merge table rides along as expression data (the
  * [[PQKernel]] codebook pattern): no per-row join, and the model is
  * merge-count pairs of short strings — broadcast-dimension class.
  *
  * Merge semantics everywhere: apply a merge exhaustively, scanning
  * LEFT TO RIGHT (so "aaa" under (a,a) yields [aa, a]); merges are
  * applied in rank order. Rank order is equivalent to the
  * lowest-rank-present loop of the reference implementations because
  * a merge only creates NEW symbols — it can never make an
  * earlier-ranked pair newly adjacent — so one ordered pass is
  * complete.
  */
object BpeFunctions {

  /** The end-of-word marker appended as a final symbol before any
    * merging (the classic BPE word-boundary device: "low" the word
    * and "low" the prefix of "lower" merge differently).
    */
  val EndOfWord = "</w>"

  /** One left-to-right exhaustive merge pass of (l, r) → l+r. */
  private[graft] def mergeOnce(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** A word's initial symbol sequence: its codepoint characters plus
    * the [[EndOfWord]] marker.
    */
  private[graft] def initialSymbols(word: String): Array[String] = {
    val cps = word.codePoints().toArray
    val out = new Array[String](cps.length + 1)
    var i = 0
    while (i < cps.length) { out(i) = new String(Character.toChars(cps(i))); i += 1 }
    out(cps.length) = EndOfWord
    out
  }

  def mergePair(syms: Column, l: String, r: String): Column =
    Bridge.column(BpeMergePair(Bridge.expression(syms), l, r))

  def encodeText(normText: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncodeText(Bridge.expression(normText), merges))
}

/** Apply ONE merge (l, r) → l+r exhaustively to a symbol array —
  * the training-loop step: round k rewrites the whole vocabulary
  * with merge k.
  */
case class BpeMergePair(child: Expression, l: String, r: String)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    val syms = new Array[String](in.numElements())
    var i = 0
    while (i < syms.length) { syms(i) = in.getUTF8String(i).toString; i += 1 }
    new GenericArrayData(
      BpeFunctions.mergeOnce(syms, l, r).map(s => UTF8String.fromString(s): Any))
  }

  override protected def withNewChildInternal(c: Expression): BpeMergePair =
    copy(child = c)
}

/** Encode a whole NORMALIZED text (space-separated words) with a
  * learned merge table: per word, start from characters +
  * [[BpeFunctions.EndOfWord]] and apply every merge in rank order;
  * the outputs concatenate in word order. One eval per document —
  * map-side inside the scan stage, no shuffle, no join against a
  * merge table.
  */
case class BpeEncodeText(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    text.split(' ').foreach { word =>
      if (word.nonEmpty) {
        var syms = BpeFunctions.initialSymbols(word)
        merges.foreach { case (l, r) =>
          // cheap containment pre-check keeps the common no-op merge
          // from allocating a fresh array
          var hit = false
          var i = 0
          while (!hit && i + 1 < syms.length) {
            if (syms(i) == l && syms(i + 1) == r) hit = true
            i += 1
          }
          if (hit) syms = BpeFunctions.mergeOnce(syms, l, r)
        }
        syms.foreach(s => out += UTF8String.fromString(s))
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): BpeEncodeText =
    copy(child = c)
}
