package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash as one custom aggregate: per-bit signed counters in a
  * single buffer (one pass per word hash, additive merges), final
  * evaluation assembles the signature long — replaces 60 separate
  * sum(CASE) aggregate columns.
  */
case class SimHashAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = child.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        buf(i) += (if (((hv >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var i = 0
    while (i < bits) { if (buf(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = LongArrayCodec.write(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = LongArrayCodec.read(bytes)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SimHashAgg =
    copy(child = c)
}

object SimHashAgg {
  def simhashAgg(h: Column, bits: Int): Column =
    Bridge.column(SimHashAgg(Bridge.expression(h), bits).toAggregateExpression())
}

/** Map-side SimHash of a word ARRAY in one pass — the streaming
  * complement of [[SimHashAgg]] (which aggregates an exploded word
  * stream and therefore needs a shuffle): a stream computes the
  * signature inside the scan stage, no explode, no state. Bit-exact
  * with the aggregate by construction: the same per-word hash — the
  * REPLICABLE md5/hash60 lattice since round 10 (first 15 hex chars
  * of md5(word), identical to `conv(substring(md5(w),1,15),16,10)`
  * and to the DuckDB oracle's rebuild; the lsh_tune/dedup_minhash
  * convention — promoting dedup_simhash to the oracle gate is worth
  * the md5 cost, and the per-thread word-hash memo below makes the
  * repeated-stopword common case cheap) — the same ±1 per-bit
  * counters, the same `> 0` majority. NearDupStreamSpec asserts
  * signature equality over the corpus.
  */
case class SimHashKernel(child: Expression, bits: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val counts = new Array[Long](bits)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val hv = SimHashKernel.wordHash60(words.getUTF8String(i).toString)
        var b = 0
        while (b < bits) {
          counts(b) += (if (((hv >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHashKernel =
    copy(child = c)
}

object SimHashKernel {
  def simhashKernel(words: Column, bits: Int): Column =
    Bridge.column(SimHashKernel(Bridge.expression(words), bits))

  private val md = ThreadLocal.withInitial(
    () => java.security.MessageDigest.getInstance("MD5"))
  private val WordCacheCap = 4096
  private val memo = ThreadLocal.withInitial(
    () => new java.util.HashMap[String, java.lang.Long]())

  /** First 15 hex chars of md5(word) as a 60-bit long (the
    * EmbedKernel byte-fold — top 7 bytes + the high nibble of byte
    * 7), per-thread memoized: natural text repeats its stopwords, so
    * the digest runs ~once per distinct word per task. Flush-on-full
    * keeps the memo bounded on adversarial vocabularies.
    */
  private[functions] def wordHash60(w: String): Long = {
    val cache = memo.get()
    val hit = cache.get(w)
    if (hit != null) return hit.longValue()
    val d = md.get()
    d.reset()
    val out = d.digest(w.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (out(i) & 0xffL); i += 1 }
    v = (v << 4) | ((out(7) >> 4) & 0xfL)
    if (cache.size >= WordCacheCap) cache.clear()
    cache.put(w, v)
    v
  }
}
