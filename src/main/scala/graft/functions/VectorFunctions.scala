package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

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

/** All LSH table signatures of a vector in ONE expression.
  *
  * Building signatures from per-plane `typedLit` columns inlines
  * tables×planes×dim literal arrays into the expression tree —
  * analyzer/optimizer/codegen cost grows with the constant data.
  * Here the plane matrix rides along as a field of the expression
  * (serialized once per task), and the output is one
  * array<long> of per-table signatures.
  */
case class HyperplaneSignatures(
    child: Expression,
    planes: Array[Array[Double]],
    planesPerTable: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.{ArrayType, LongType}
  override def dataType: DataType = ArrayType(LongType)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nTables = planes.length / planesPerTable
    val sigs = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var j = 0
      while (j < planesPerTable) {
        val p = planes(t * planesPerTable + j)
        var dot = 0.0
        val n = math.min(v.numElements(), p.length)
        var i = 0
        while (i < n) { dot += v.getDouble(i) * p(i); i += 1 }
        if (dot > 0) sig |= (1L << j)
        j += 1
      }
      sigs(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSignatures =
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

  /** Per-table LSH signatures (array of longs) of a vector column. */
  def hyperplaneSignatures(v: Column, planes: Array[Array[Double]],
      planesPerTable: Int): Column =
    Bridge.column(HyperplaneSignatures(Bridge.expression(v), planes, planesPerTable))
}
