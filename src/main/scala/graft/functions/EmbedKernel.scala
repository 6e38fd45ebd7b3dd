package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass evaluator for the doc_embed hashing-trick vector:
  * walks the word array ONCE, accumulating the signed-count vector
  * and its squared norm, replacing the
  * `transform(sequence(0,63), i -> aggregate(bs, ...))` shape whose
  * per-dimension lambda evaluation is interpreted (ArrayAggregate has
  * no codegen) — that form re-scanned the whole word array once per
  * dimension, O(dim · words) interpreted lambda calls per document,
  * and was the single largest bench cost at sf0.1 (~84 s of 212 s).
  *
  * Semantics are IDENTICAL to the SQL form the DuckDB oracle still
  * runs (SparkEntry oracle "doc_embed"): per word w (empty tokens
  * skipped), bucket = hash60("emb:"+w) mod 64 and sign ±1 from
  * hash60("sgn:"+w) mod 2, where hash60(s) is the first 15 hex chars
  * of md5(s) read as a 60-bit integer — computed here directly from
  * the first 7.5 digest bytes, no hex round-trip. The oracle
  * hash-match is the equivalence proof.
  *
  * Natural-language corpora repeat words heavily, so per-word
  * (bucket, sign) is memoized in a per-thread table (capped; the
  * mapping is pure, so sharing across tasks on a thread is safe).
  */
case class EmbedKernel(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("vec", ArrayType(LongType, containsNull = false)),
    StructField("n2", LongType)))
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    EmbedKernel.eval(input.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(c: Expression): EmbedKernel = copy(child = c)
}

object EmbedKernel {
  val Dim = 64

  /** Per-thread memo bound (r6 advisory: the former 2^20 cap could
    * pin hundreds of MB of String keys per executor thread for the
    * JVM's lifetime). 2^16 entries ≈ a few MB per thread covers the
    * hot vocabulary of any natural-language corpus (Zipf: the top
    * 65k words are ~all instances); on overflow the table FLUSHES
    * and rebuilds rather than evicting — bounded memory, one cheap
    * amortized reset per 65k distinct cold words, and the hot head
    * re-fills immediately.
    */
  private val CacheCap = 1 << 16

  def embedKernel(words: Column): Column =
    Bridge.column(EmbedKernel(Bridge.expression(words)))

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  // word -> (bucket | positiveBit << 6), pure mapping so thread-shared is safe
  private val memo = new ThreadLocal[java.util.HashMap[String, Integer]] {
    override def initialValue() = new java.util.HashMap[String, Integer](1 << 16)
  }
  private val EmbPrefix = "emb:".getBytes("UTF-8")
  private val SgnPrefix = "sgn:".getBytes("UTF-8")

  /** First 15 hex chars of md5(prefix ++ word) as a 60-bit long —
    * i.e. the top 60 bits of the digest (7 bytes + the high nibble
    * of byte 7), identical to conv(substring(md5(s),1,15),16,10).
    */
  private def hash60(d: MessageDigest, prefix: Array[Byte], word: Array[Byte]): Long = {
    d.reset()
    d.update(prefix)
    d.update(word)
    val out = d.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (out(i) & 0xffL); i += 1 }
    (v << 4) | ((out(7) >> 4) & 0xfL)
  }

  private def bucketSign(w: String): Int = {
    val cache = memo.get()
    val hit = cache.get(w)
    if (hit != null) return hit.intValue()
    val d = md.get()
    val wb = w.getBytes("UTF-8")
    val bucket = (hash60(d, EmbPrefix, wb) % Dim).toInt
    val positive = (hash60(d, SgnPrefix, wb) & 1L) == 0L
    val packed = bucket | (if (positive) 1 << 6 else 0)
    if (cache.size >= CacheCap) cache.clear() // flush-on-full: see CacheCap
    cache.put(w, packed)
    packed
  }

  private[functions] def eval(words: ArrayData): InternalRow = {
    val vec = new Array[Long](Dim)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val u = words.getUTF8String(i)
        if (u.numBytes() > 0) {
          val packed = bucketSign(u.toString)
          vec(packed & 63) += (if ((packed & (1 << 6)) != 0) 1L else -1L)
        }
      }
      i += 1
    }
    var n2 = 0L
    var j = 0
    while (j < Dim) { n2 += vec(j) * vec(j); j += 1 }
    InternalRow(new GenericArrayData(vec), n2)
  }
}
