package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Product-quantization kernels as map-side Catalyst expressions.
  *
  * The codebook (sample vectors quantized onto an integer lattice)
  * rides along as expression data — the [[HyperplaneSignaturesLat]]
  * pattern: no per-row join against a centroid table, no literal-array
  * blowup in the expression tree, and the model footprint is
  * centroids×dim longs (broadcast-dimension class).
  *
  * All distances are INTEGER squared-L2 on the lattice
  * `l(x) = floor(x·scale + 0.5)` — exact in any engine, so
  * [[PQCodes]] is oracle-replicable bit-for-bit (the reason the
  * lattice exists: float accumulation order would diverge across
  * engines; 64-bit integer sums cannot).
  *
  * Constant fields are Seq (structural equals/hashCode), not Array —
  * semanticEquals/canonicalization must hold between identical
  * instances or subexpression elimination stops working.
  */
abstract class PQKernel extends UnaryExpression with CodegenFallback {
  def samples: Seq[Seq[Long]]
  def numSubspaces: Int
  def latticeScale: Double

  override def dataType: DataType = ArrayType(LongType)
  override def nullIntolerant: Boolean = true

  @transient protected lazy val cb: Array[Array[Long]] = samples.map(_.toArray).toArray
  @transient protected lazy val subDim: Int =
    if (cb.isEmpty) 0 else cb(0).length / numSubspaces

  protected def quantize(v: ArrayData): Array[Long] = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(v.getDouble(i) * latticeScale + 0.5).toLong
      i += 1
    }
    out
  }

  /** Integer squared-L2 between lattice vector `lv` and codebook row
    * `c`, restricted to subspace `m` (dims [m·subDim, (m+1)·subDim)).
    * Dimensions past `lv`'s length contribute the centroid's own mass
    * (vector implicitly zero-padded) so ragged inputs stay ordered
    * consistently.
    */
  protected def subDist(lv: Array[Long], c: Array[Long], m: Int): Long = {
    var d = 0L
    var i = m * subDim
    val end = (m + 1) * subDim
    while (i < end) {
      val x = if (i < lv.length) lv(i) else 0L
      val diff = x - c(i)
      d += diff * diff
      i += 1
    }
    d
  }
}

/** Per-subspace nearest-centroid codes of a vector: array of
  * `numSubspaces` longs in [0, centroids), ties to the lower code.
  */
case class PQCodes(
    child: Expression,
    samples: Seq[Seq[Long]],
    numSubspaces: Int,
    latticeScale: Double)
  extends PQKernel {

  override def nullSafeEval(input: Any): Any = {
    val lv = quantize(input.asInstanceOf[ArrayData])
    val codes = new Array[Long](numSubspaces)
    var m = 0
    while (m < numSubspaces) {
      var best = 0L
      var bestD = Long.MaxValue
      var j = 0
      while (j < cb.length) {
        val d = subDist(lv, cb(j), m)
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(m) = best
      m += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): PQCodes = copy(child = c)
}

/** ADC (asymmetric distance computation) lookup table of a QUERY
  * vector: flat array of `numSubspaces × centroids` longs where entry
  * `m·centroids + j` is the lattice squared-L2 between the query's
  * subspace `m` and centroid `j`. A corpus vector's approximate
  * distance is then Σₘ table[m·centroids + code_m] — `numSubspaces`
  * array lookups per (query, vector), never a vector-vector kernel.
  */
case class PQDistTable(
    child: Expression,
    samples: Seq[Seq[Long]],
    numSubspaces: Int,
    latticeScale: Double)
  extends PQKernel {

  override def nullSafeEval(input: Any): Any = {
    val lv = quantize(input.asInstanceOf[ArrayData])
    val table = new Array[Long](numSubspaces * cb.length)
    var m = 0
    while (m < numSubspaces) {
      var j = 0
      while (j < cb.length) {
        table(m * cb.length + j) = subDist(lv, cb(j), m)
        j += 1
      }
      m += 1
    }
    new GenericArrayData(table)
  }

  override protected def withNewChildInternal(c: Expression): PQDistTable = copy(child = c)
}

object PQFunctions {
  /** PQ codes (array<long>, one code per subspace) of a vector column. */
  def pqCodes(v: Column, samples: Seq[Seq[Long]], numSubspaces: Int,
      latticeScale: Double): Column =
    Bridge.column(PQCodes(Bridge.expression(v), samples, numSubspaces, latticeScale))

  /** ADC distance table (flat array<long>) of a query-vector column. */
  def pqDistTable(v: Column, samples: Seq[Seq[Long]], numSubspaces: Int,
      latticeScale: Double): Column =
    Bridge.column(PQDistTable(Bridge.expression(v), samples, numSubspaces, latticeScale))
}
