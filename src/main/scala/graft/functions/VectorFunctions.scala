package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Vector similarity kernels as native Catalyst expressions.
  *
  * A higher-order-function formulation (`aggregate(zip_with(...))`)
  * allocates a lambda frame per element; at 100 TB × 64-d vectors the
  * inner loop IS the workload, so these are real expressions with
  * `doGenCode` — a tight scalar Java loop inside whole-stage codegen,
  * no per-element boxing.
  *
  * Accumulation is sequential in index order: results are
  * bit-deterministic at any parallelism (and match the oracle
  * engine's list_cosine_similarity, which uses the same
  * dot/(sqrt(na)*sqrt(nb)) formula).
  */
abstract class VectorKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
}

/** Cosine similarity: dot / (sqrt(|a|²) * sqrt(|b|²)). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorKernel {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Plain dot product (LSH hyperplane projections, IVF scoring). */
case class DotProduct(left: Expression, right: Expression) extends VectorKernel {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Exact integer dot product of two array<long> columns (the
  * hashing-trick chunk vectors of ann_maxsim): accumulates in a
  * long, so the result is integer-exact and engine-portable — the
  * double kernel above would be too at these magnitudes, but the
  * consumer feeds an integer ppm lattice and an integer source type
  * keeps the whole chain float-free. Chunk vectors bound the terms:
  * |dot| ≤ n2 ≤ ChunkWords² = 10⁴, far from long overflow at any
  * corpus size (chunks are fixed-width by construction).
  */
case class DotProductLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L; var i = 0
    while (i < n) { dot += x.getLong(i) * y.getLong(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All LSH table signatures of a vector in ONE expression, on the
  * INTEGER lattice — the oracle-replicable form (round 11, the
  * dedup_minhash/simhash promotion play applied to the ANN
  * bucketing; this replaced the earlier double-Gaussian
  * HyperplaneSignatures — building signatures from per-plane
  * `typedLit` columns inlines tables×planes×dim literal arrays into
  * the expression tree, so the matrix rides along as an expression
  * FIELD instead, serialized once per task; constant fields are Seq,
  * not Array, so canonicalization and exchange reuse keep working).
  * The input vector quantizes to
  * `l(x) = floor(x·latScale + 0.5)` (the PQ lattice convention) and
  * projects onto INTEGER plane coefficients, so the per-plane dot is
  * exact 64-bit arithmetic — the sign bit can never differ across
  * engines, where the double form's near-zero projections sit one
  * reassociation away from flipping. Bit j of table t is set iff the
  * dot is strictly positive.
  *
  * Overflow headroom: |coef| ≤ 1000 (the hash60 plane law), |l(x)| ≤
  * latScale·max|x|; 64 dims × 1000 × ~10⁵ ≈ 6.4·10⁹ ≪ 2⁶³.
  */
case class HyperplaneSignaturesLat(
    child: Expression,
    planes: Seq[Seq[Long]],
    planesPerTable: Int,
    latScale: Double)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.{ArrayType, LongType}
  override def dataType: DataType = ArrayType(LongType)
  override def nullIntolerant: Boolean = true

  @transient private lazy val mat: Array[Array[Long]] = planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nEl = v.numElements()
    val q = new Array[Long](nEl)
    var i = 0
    while (i < nEl) { q(i) = math.floor(v.getDouble(i) * latScale + 0.5).toLong; i += 1 }
    val nTables = mat.length / planesPerTable
    val sigs = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var j = 0
      while (j < planesPerTable) {
        val p = mat(t * planesPerTable + j)
        var dot = 0L
        val n = math.min(nEl, p.length)
        var d = 0
        while (d < n) { dot += q(d) * p(d); d += 1 }
        if (dot > 0) sig |= (1L << j)
        j += 1
      }
      sigs(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSignaturesLat =
    copy(child = c)
}

/** The `nprobe` nearest centroids (by cosine, ties broken by lower
  * centroid id) of a vector — IVF cell assignment as ONE map-side
  * expression.
  *
  * The centroid matrix rides along as expression data (the
  * [[HyperplaneSignatures]] pattern): cell assignment is a pure
  * projection inside the scan stage — no (vector × centroid)
  * expansion, no window, no shuffle. The matrix is √n-sized
  * quantizer metadata, the same driver/executor footprint class as
  * a broadcast dimension.
  *
  * Scoring uses the identical sequential fold as [[CosineSimilarity]]
  * so cell assignment agrees bit-exactly with any re-ranking pass;
  * NaN similarities (zero-norm vectors) rank FIRST, matching Spark's
  * descending double sort order the previous window formulation had.
  */
case class NearestCentroids(
    child: Expression,
    centroidIds: Seq[Long],
    centroids: Seq[Seq[Double]],
    nprobe: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.{ArrayType, LongType}
  override def dataType: DataType = ArrayType(LongType)
  override def nullIntolerant: Boolean = true

  @transient private lazy val ids: Array[Long] = centroidIds.toArray
  @transient private lazy val mat: Array[Array[Double]] = centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = mat.length
    val n = math.min(nprobe, m)
    val best = new Array[Int](n)
    val bestSim = new Array[Double](n)
    var filled = 0
    var c = 0
    while (c < m) {
      val p = mat(c)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      val len = math.min(v.numElements(), p.length)
      var i = 0
      while (i < len) {
        val xi = v.getDouble(i); val yi = p(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      // bounded insertion under (sim desc, cid asc): centroids arrive
      // in ascending-cid order, so strict > keeps the earlier cid on
      // ties; Double.compare puts NaN above all finite values.
      var pos = filled
      while (pos > 0 && java.lang.Double.compare(sim, bestSim(pos - 1)) > 0) pos -= 1
      if (pos < n) {
        var j = math.min(filled, n - 1)
        while (j > pos) { bestSim(j) = bestSim(j - 1); best(j) = best(j - 1); j -= 1 }
        bestSim(pos) = sim
        best(pos) = c
        if (filled < n) filled += 1
      }
      c += 1
    }
    val out = new Array[Long](filled)
    var k = 0
    while (k < filled) { out(k) = ids(best(k)); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroids =
    copy(child = c)
}

/** Two-level (IVF-routed) cell assignment for corpus-proportional
  * quantizers: argmax-cosine over `fine` restricted to the buckets
  * of the `nprobe` nearest `coarse` centroids. A flat argmax over K
  * cells costs O(K) per vector — with the semdedup regime K ∝ n
  * that is O(n·K) = quadratic corpus work; routing through
  * C ≈ √K coarse cells costs O(C + nprobe·K/C) ≈ O(√K) per vector,
  * the standard IVF trick applied to ASSIGNMENT itself. Returns the
  * global fine index (the cell id); ties break to the lower index,
  * NaN similarities rank first — both mirroring [[NearestCentroids]]
  * so the two quantizer forms are drop-in comparable.
  *
  * `owners(j)` is the coarse bucket of fine centroid j; when the
  * coarse set is a subset of the fine set every bucket is non-empty,
  * but an empty probed union still yields cell −1 rather than a
  * crash (a vector probing only empty buckets — possible with a
  * degenerate caller-supplied mapping).
  */
case class TwoLevelCellId(
    child: Expression,
    coarse: Seq[Seq[Double]],
    fine: Seq[Seq[Double]],
    owners: Seq[Int],
    nprobe: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.LongType
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val coarseMat: Array[Array[Double]] =
    coarse.map(_.toArray).toArray
  @transient private lazy val fineMat: Array[Array[Double]] =
    fine.map(_.toArray).toArray
  @transient private lazy val buckets: Array[Array[Int]] = {
    val bs = Array.fill(coarse.length)(List.newBuilder[Int])
    owners.zipWithIndex.foreach { case (o, j) => bs(o) += j }
    bs.map(_.result().toArray)
  }

  private def cos(v: ArrayData, p: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val len = math.min(v.numElements(), p.length)
    var i = 0
    while (i < len) {
      val xi = v.getDouble(i); val yi = p(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // top-nprobe coarse buckets (sim desc, index asc — the
    // NearestCentroids insertion)
    val m = coarseMat.length
    val np = math.min(nprobe, m)
    val bestC = new Array[Int](np)
    val bestCSim = new Array[Double](np)
    var filled = 0
    var c = 0
    while (c < m) {
      val sim = cos(v, coarseMat(c))
      var pos = filled
      while (pos > 0 && java.lang.Double.compare(sim, bestCSim(pos - 1)) > 0) pos -= 1
      if (pos < np) {
        var j = math.min(filled, np - 1)
        while (j > pos) { bestCSim(j) = bestCSim(j - 1); bestC(j) = bestC(j - 1); j -= 1 }
        bestCSim(pos) = sim
        bestC(pos) = c
        if (filled < np) filled += 1
      }
      c += 1
    }
    // argmax over the probed buckets' fine centroids
    var bestIdx = -1
    var bestSim = 0.0
    var b = 0
    while (b < filled) {
      val bucket = buckets(bestC(b))
      var t = 0
      while (t < bucket.length) {
        val j = bucket(t)
        val sim = cos(v, fineMat(j))
        val cmp = java.lang.Double.compare(sim, bestSim)
        if (bestIdx < 0 || cmp > 0 || (cmp == 0 && j < bestIdx)) {
          bestIdx = j; bestSim = sim
        }
        t += 1
      }
      b += 1
    }
    bestIdx.toLong
  }

  override protected def withNewChildInternal(c: Expression): TwoLevelCellId =
    copy(child = c)
}

object VectorFunctions {
  /** Column API: cosine similarity of two array<double> columns
    * (cast float arrays with `.cast("array<double>")` — exact).
    */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Exact integer dot product of two array<long> columns. */
  def dotProductLong(a: Column, b: Column): Column =
    Bridge.column(DotProductLong(Bridge.expression(a), Bridge.expression(b)))

  /** Per-table integer-lattice LSH signatures (array of longs) of a
    * vector column (oracle-replicable; see [[HyperplaneSignaturesLat]]).
    */
  def hyperplaneSignaturesLat(v: Column, planes: Seq[Seq[Long]],
      planesPerTable: Int, latScale: Double): Column =
    Bridge.column(HyperplaneSignaturesLat(Bridge.expression(v), planes,
      planesPerTable, latScale))

  /** The `nprobe` nearest centroid ids of a vector column (cosine,
    * ties to the lower id). Pass centroids sorted by id.
    */
  def nearestCentroids(v: Column, centroidIds: Seq[Long],
      centroids: Seq[Seq[Double]], nprobe: Int): Column =
    Bridge.column(NearestCentroids(Bridge.expression(v), centroidIds, centroids, nprobe))

  /** IVF-routed cell id of a vector column: nearest of `fine`,
    * searched via the `nprobe` nearest `coarse` buckets (ties to the
    * lower fine index).
    */
  def twoLevelCellId(v: Column, coarse: Seq[Seq[Double]], fine: Seq[Seq[Double]],
      owners: Seq[Int], nprobe: Int): Column =
    Bridge.column(TwoLevelCellId(Bridge.expression(v), coarse, fine, owners, nprobe))
}
