package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** sketch_cube's estimator laws: per-stratum estimates near exact,
  * the rollup consistent with a direct global sketch (union is
  * register-max, so they see identical register state), and full
  * determinism under repartitioning.
  */
class SketchCubeSpec extends AnyFunSuite {
  lazy val spark = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"

  test("per-language estimates are within 5% of exact distinct counts") {
    import graft.functions.TextFunctions.{hash60, normalize}
    val docs = Tables(spark, sf).documents
    val exact = docs
      .select(col("lang"), hash60(normalize(col("text"))).as("fp60"))
      .groupBy(col("lang")).agg(countDistinct(col("fp60")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = operators.Curation.sketchCube(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    for ((lang, n) <- exact) {
      val e = est(lang)
      assert(math.abs(e - n) <= math.max(1L, (n * 0.05).toLong),
        s"$lang: est $e vs exact $n")
    }
    val totalExact = docs
      .select(hash60(normalize(col("text"))).as("fp60"))
      .agg(countDistinct(col("fp60"))).head().getLong(0)
    assert(math.abs(est("ALL") - totalExact) <= math.max(1L, (totalExact * 0.05).toLong))
  }

  test("rollup from per-stratum sketches tracks a direct global sketch") {
    import graft.functions.TextFunctions.{hash60, normalize}
    val direct = Tables(spark, sf).documents
      .select(hash60(normalize(col("text"))).as("fp60"))
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("fp60"), lit(operators.Curation.SketchLgK))))
      .head().getLong(0)
    val rolled = operators.Curation.sketchCube(spark, sf)
      .filter(col("lang") === "ALL").head().getLong(2)
    // NOT exact equality: sparse→dense promotion depends on union
    // order (the documented reason sketch_cube is rows-only)
    assert(math.abs(rolled - direct) <= math.max(2L, (direct * 0.02).toLong),
      s"union-of-strata $rolled drifted from direct sketch $direct")
  }

  test("estimates stay in tolerance under any partitioning; shape is stable") {
    val docs = Tables(spark, sf).documents
    val runs = Seq(
      operators.Curation.sketchCubeOn(docs).collect(),
      operators.Curation.sketchCubeOn(docs.repartition(13)).collect(),
      operators.Curation.sketchCubeOn(docs.repartition(3)).collect())
    // identical shape: same languages, same exact doc counts
    val shapes = runs.map(_.map(r => (r.getString(0), r.getLong(1))).toSeq)
    assert(shapes.distinct.size == 1)
    // estimates for each language agree across partitionings within
    // the sparse-promotion wobble
    val ests = runs.map(_.map(r => r.getString(0) -> r.getLong(2)).toMap)
    for (lang <- ests.head.keys) {
      val vs = ests.map(_(lang))
      assert(vs.max - vs.min <= math.max(2L, (vs.min * 0.02).toLong),
        s"$lang estimates vary too much across partitionings: $vs")
    }
  }
}
