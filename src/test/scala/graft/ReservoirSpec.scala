package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** sample_reservoir — the mergeable bottom-k sketch vs its window
  * definition: identical results (bottom-k is a pure function of the
  * input set), partitioning invariance (merge order can't matter),
  * and the per-group size contract min(k, |group|). The plan is also
  * asserted aggregate-shaped: partial aggregation before the
  * exchange, no window sort of the corpus.
  */
class ReservoirSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  private def docs(n: Int, parts: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"g${i % 7}"))
      .toDF("doc_id", "lang").repartition(parts)
  }

  private def windowForm(d: DataFrame, k: Int): Array[(String, Long, Long)] = {
    import graft.functions.TextFunctions.hash60
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("hk"), col("doc_id"))
    d.withColumn("hk", hash60(col("doc_id").cast("string")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("lang"), col("rn").cast("long"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
  }

  test("sketch equals the window definition, at any partitioning") {
    val base = docs(3000, 4)
    val expected = windowForm(base, operators.Curation.ReservoirK)
    Seq(1, 3, 16).foreach { parts =>
      val got = operators.Curation.sampleReservoirOn(docs(3000, parts))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.sameElements(expected), s"parts=$parts")
    }
  }

  test("per-group size is min(k, group size); small groups survive whole") {
    import spark.implicits._
    // group sizes 1..10 over k=8
    val d = (1 to 10).flatMap(g => (1 to g).map(i => ((g * 100 + i).toLong, s"s$g")))
      .toDF("doc_id", "lang")
    val sizes = operators.Curation.sampleReservoirOn(d)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0).drop(1).toInt -> r.getLong(1)).toMap
    (1 to 10).foreach(g =>
      assert(sizes(g) == math.min(g, operators.Curation.ReservoirK).toLong))
  }

  test("plan: hash aggregate with map-side partial, no window exchange-sort of the corpus") {
    val plan = operators.Curation.sampleReservoirOn(docs(1000, 4))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based plan:\n$plan")
    assert(!plan.contains("Window"), s"sketch must not plan a window:\n$plan")
  }
}
