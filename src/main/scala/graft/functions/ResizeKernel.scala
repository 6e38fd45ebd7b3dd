package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Specialized evaluator for the mm_resize integer box-filter: one
  * tight-loop pass over the stub pixel lattice per row, replacing the
  * doubly-nested `aggregate(sequence(...))` higher-order expressions
  * whose per-pixel lambda evaluation is interpreted (ArrayAggregate
  * has no codegen) — measured ~6× on the resize benchmark at sf0.1.
  * Semantics are IDENTICAL to the SQL form the DuckDB oracle still
  * runs: pixel(x,y) = (fp60 + 31x + 17y) mod 256, cell(i,j) = integer
  * mean of the exact box [i·w/8,(i+1)·w/8) × [j·h/8,(j+1)·h/8),
  * checksum = Σ (8i + j + 1)·cell(i,j) — the oracle hash-match is the
  * equivalence proof.
  *
  * Emits (r00, r77, checksum) as one struct so the lattice is walked
  * ONCE per row; [[graft.multimodal.Multimodal.mmResize]] projects
  * the fields from a cached struct column (the projection sits above
  * one evaluation, not three).
  */
case class ResizeKernel(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("r00", LongType),
    StructField("r77", LongType),
    StructField("checksum", LongType)))
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(fp: Any, w: Any, h: Any): Any =
    ResizeKernel.eval(fp.asInstanceOf[Long], w.asInstanceOf[Long], h.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ResizeKernel = copy(f, s, t)
}

/** Single-pass evaluator for the mm_phash 56-bit difference hash:
  * box-filters the stub pixel lattice to the 8×8 cell matrix and
  * emits one bit per adjacent-column gradient (cell(i+1,j) >
  * cell(i,j), bit 7j+i) in ONE tight-loop walk, replacing the
  * interpreted nested `aggregate(sequence(...))` cell matrix +
  * gradient fold (the same interpreted-HOF cost class ResizeKernel
  * kills for mm_resize). Geometry and pixel function are IDENTICAL
  * to the SQL twin the DuckDB oracle runs
  * ([[graft.multimodal.Multimodal.phashCellsSql]]): pixel(x,y) =
  * (fp60 + 31x + 17y) mod 256, cell boxes [i·w/8,(i+1)·w/8) ×
  * [j·h/8,(j+1)·h/8) — the oracle hash-match is the equivalence
  * proof.
  */
case class PhashKernel(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(fp: Any, w: Any, h: Any): Any =
    PhashKernel.eval(fp.asInstanceOf[Long], w.asInstanceOf[Long], h.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PhashKernel = copy(f, s, t)
}

object PhashKernel {
  private val OutDim = 8

  def phashKernel(fp60: Column, srcW: Column, srcH: Column): Column =
    Bridge.column(PhashKernel(
      Bridge.expression(fp60), Bridge.expression(srcW), Bridge.expression(srcH)))

  private[functions] def eval(fp60: Long, w: Long, h: Long): Long = {
    // cells(j)(i): row j (y-box), column i (x-box) — matches the SQL
    // nesting transform(j -> transform(i -> mean))
    val cells = Array.ofDim[Long](OutDim, OutDim)
    var i = 0
    while (i < OutDim) {
      val x0 = i * w / OutDim
      val x1 = (i + 1) * w / OutDim
      var j = 0
      while (j < OutDim) {
        val y0 = j * h / OutDim
        val y1 = (j + 1) * h / OutDim
        var sum = 0L
        var x = x0
        while (x < x1) {
          var y = y0
          while (y < y1) {
            sum += java.lang.Math.floorMod(fp60 + 31 * x + 17 * y, 256L)
            y += 1
          }
          x += 1
        }
        cells(j.toInt)(i.toInt) = sum / ((x1 - x0) * (y1 - y0))
        j += 1
      }
      i += 1
    }
    var hash = 0L
    var j = 0
    while (j < OutDim) {
      var c = 0
      while (c < OutDim - 1) {
        if (cells(j)(c + 1) > cells(j)(c)) hash |= 1L << ((OutDim - 1) * j + c)
        c += 1
      }
      j += 1
    }
    hash
  }
}

/** Single-pass evaluator for the mm_audio_fp stub-PCM fingerprint:
  * frame energies, the energy-delta sign bits and the weighted
  * checksum in ONE tight loop over the sample lattice, replacing
  * the interpreted `transform`/`aggregate(sequence(...))` folds
  * (the same interpreted-HOF cost class the other kernels kill —
  * measured 2.7 s → ~0.4 s at sf0.1). PCM function, framing and
  * packing are IDENTICAL to the SQL twin kept as
  * [[graft.multimodal.Multimodal.mmAudioFpSql]] (row-for-row
  * equivalence spec) and to the DuckDB oracle — the oracle
  * hash-match is the equivalence proof.
  */
case class AudioFpKernel(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType),
    StructField("n_frames", LongType),
    StructField("afp", LongType),
    StructField("energy_checksum", LongType)))
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(fp: Any): Any =
    AudioFpKernel.eval(fp.asInstanceOf[Long])

  override protected def withNewChildInternal(c: Expression): AudioFpKernel =
    copy(c)
}

object AudioFpKernel {
  // geometry constants mirrored from Multimodal (single source of
  // truth is the operator object; asserted equal there)
  val Frame = 64L
  val MinSamples = 512L
  val SamplesMod = 1024L

  def audioFpKernel(fp60: Column): Column =
    Bridge.column(AudioFpKernel(Bridge.expression(fp60)))

  private[functions] def eval(fp60: Long)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val nSamples = fp60 % SamplesMod + MinSamples
    val nFrames = nSamples / Frame
    var afp = 0L
    var checksum = 0L
    var prev = 0L
    var f = 0L
    while (f < nFrames) {
      var e = 0L
      var t = f * Frame
      val end = t + Frame
      while (t < end) {
        val s = java.lang.Math.floorMod(fp60 + 37 * t + (t * t) % 97, 65536L) - 32768L
        e += java.lang.Math.abs(s)
        t += 1
      }
      if (f > 0 && e > prev) afp |= 1L << (f - 1)
      checksum += (f + 1) * e
      prev = e
      f += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(nSamples, nFrames, afp, checksum)
  }
}

object ResizeKernel {
  private val OutDim = 8

  def resizeKernel(fp60: Column, srcW: Column, srcH: Column): Column =
    Bridge.column(ResizeKernel(
      Bridge.expression(fp60), Bridge.expression(srcW), Bridge.expression(srcH)))

  private[functions] def eval(fp60: Long, w: Long, h: Long)
      : org.apache.spark.sql.catalyst.InternalRow = {
    var r00 = 0L
    var r77 = 0L
    var checksum = 0L
    var i = 0
    while (i < OutDim) {
      val x0 = i * w / OutDim
      val x1 = (i + 1) * w / OutDim
      var j = 0
      while (j < OutDim) {
        val y0 = j * h / OutDim
        val y1 = (j + 1) * h / OutDim
        var sum = 0L
        var x = x0
        while (x < x1) {
          var y = y0
          while (y < y1) {
            sum += java.lang.Math.floorMod(fp60 + 31 * x + 17 * y, 256L)
            y += 1
          }
          x += 1
        }
        val cell = sum / ((x1 - x0) * (y1 - y0))
        if (i == 0 && j == 0) r00 = cell
        if (i == OutDim - 1 && j == OutDim - 1) r77 = cell
        checksum += (OutDim * i + j + 1) * cell
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(r00, r77, checksum)
  }
}

/** Landmark-array evaluator for mm_audio_match (round 16, guide §4 +
  * §2.4): ONE tight loop over the stub-PCM sample lattice emits a
  * track's (t, h) landmark pairs — h = en(f)·AnchorBase + en(f+1)
  * over consecutive frame energies — replacing (a) the interpreted
  * `aggregate(sequence(...))` per-frame energy fold (the
  * [[AudioFpKernel]] cost class), (b) the per-side window-`lead`
  * that paired consecutive energies (one exchange + sort per side:
  * energies are a pure function of (fp60, f), so the successor
  * energy is computable, never shuffled-for), and (c) the clip-side
  * explode + re-aggregate that re-derived per-doc constants.
  *
  * `clip = false`: the full track's landmarks, t = f ∈
  * [0, n_frames − 2]. `clip = true`: the derived query excerpt —
  * empty unless the doc is long enough (n_frames ≥ ClipLen + 2),
  * cut at k = fp60 mod (n_frames − ClipLen), t = f − k ∈
  * [0, ClipLen − 2]. PCM function, framing, anchor encoding and the
  * eligibility/cut arithmetic are IDENTICAL to the SQL form the
  * DuckDB oracle runs — the oracle hash-match is the equivalence
  * proof (geometry constants are asserted against the operator's in
  * Multimodal).
  */
case class AudioMarksKernel(child: Expression, clip: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", LongType),
    StructField("h", LongType))), containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(fp: Any): Any =
    AudioMarksKernel.eval(fp.asInstanceOf[Long], clip)

  override protected def withNewChildInternal(c: Expression): AudioMarksKernel =
    copy(child = c)
}

object AudioMarksKernel {
  // geometry constants mirrored from Multimodal (single source of
  // truth is the operator object; asserted equal there)
  val Frame = 64L
  val MinSamples = 512L
  val SamplesMod = 1024L
  val AnchorBase = 4194304L
  val ClipLen = 6L

  def audioMarks(fp60: Column, clip: Boolean): Column =
    Bridge.column(AudioMarksKernel(Bridge.expression(fp60), clip))

  private def energy(fp60: Long, f: Long): Long = {
    var e = 0L
    var t = f * Frame
    val end = t + Frame
    while (t < end) {
      val s = java.lang.Math.floorMod(fp60 + 37 * t + (t * t) % 97, 65536L) - 32768L
      e += java.lang.Math.abs(s)
      t += 1
    }
    e
  }

  private[functions] def eval(fp60: Long, clip: Boolean): Any = {
    val nSamples = fp60 % SamplesMod + MinSamples
    val nFrames = nSamples / Frame
    val (from, len) =
      if (!clip) (0L, nFrames)
      else if (nFrames < ClipLen + 2) (0L, 0L)
      else (java.lang.Math.floorMod(fp60, nFrames - ClipLen), ClipLen)
    if (len < 2)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](0))
    val out = new Array[Any]((len - 1).toInt)
    var prev = energy(fp60, from)
    var t = 0L
    while (t < len - 1) {
      val next = energy(fp60, from + t + 1)
      out(t.toInt) = org.apache.spark.sql.catalyst.InternalRow(
        t, prev * AnchorBase + next)
      prev = next
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
