package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE length of a string's UTF-8 bytes — the kernel behind the
  * comp_ratio compression-quality signal (text that compresses far
  * below the corpus norm is repetitive/templated; text that barely
  * compresses is noise — the cheap entropy proxy the
  * Gopher/data-juicer filtering lines use next to the rule gates).
  *
  * One Deflater per executor thread (ThreadLocal, reset per row, raw
  * deflate — no zlib wrapper bytes — at the DEFAULT level), one
  * reused output buffer: zero per-row allocation beyond what
  * Deflater itself does. Determinism contract: DEFLATE output length
  * is deterministic for a fixed zlib implementation and level —
  * bit-stable across runs, tasks, and partitionings of the same JVM
  * runtime, which is exactly the rows-only + in-JVM-twin class this
  * operator is registered under (a zlib UPGRADE may shift lengths;
  * the ratio card is re-derived, never compared across runtimes).
  */
case class CompressKernel(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    CompressKernel.deflateLen(input.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(c: Expression): CompressKernel =
    copy(child = c)
}

object CompressKernel {

  def compressLen(text: Column): Column =
    Bridge.column(CompressKernel(Bridge.expression(text)))

  private val deflater = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, true)
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  /** Raw-deflate byte length of `bytes` at the default level. */
  def deflateLen(bytes: Array[Byte]): Long = {
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val b = buf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(b)
    total
  }
}
