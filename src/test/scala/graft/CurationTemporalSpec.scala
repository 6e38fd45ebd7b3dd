package graft

import graft.operators.{Curation, Temporal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case behavior of the temporal-join and curation operators
  * (the oracle gate covers the bulk semantics; these pin the corners
  * the oracle data may not exercise).
  */
class CurationTemporalSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("asOfJoin: inclusive match, carry-forward, and no-predecessor null") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 150L, 20.0), (2L, 60L, 30.0))
      .toDF("k", "rt", "v")
    val out = Temporal.asOfJoin(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))
      .orderBy(col("k"), col("t"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[Any]("right_v"))))
    // t=100 matches rt=100 (inclusive); t=200 matches rt=150 (carry
    // past an older row); t=50 has no predecessor → null
    assert(out.toSeq == Seq(("a", Some(10.0)), ("b", Some(20.0)), ("c", None)))
  }

  test("asOfJoin tie-break: greatest tie-break value wins among equal-time right rows") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 100L, 7L, 1.0), (1L, 100L, 9L, 2.0), (1L, 100L, 8L, 3.0))
      .toDF("k", "rt", "id", "v")
    val out = Temporal.asOfJoin(left, right, Seq("k"), "t", "rt",
      Seq("id", "v"), rightTieBreak = Seq("id")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("right_id") == 9L)
    assert(out.head.getAs[Double]("right_v") == 2.0)
  }

  test("q23 range join bin-and-refine plans no broadcast-nested-loop") {
    val plan = Temporal.q23(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "range join fell back to BNLJ")
    assert(!plan.contains("CartesianProduct"))
  }

  test("doc_chunk: exact boundaries, 20-word overlap, short docs get one chunk") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 5).map(i => s"w$i").mkString(" ")),   // < size → 1 chunk
      (2L, (1 to 250).map(i => s"t$i").mkString(" "))) // 4 chunks: 100,100,90,10
      .toDF("doc_id", "text")
    val out = Curation.docChunkOn(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("n_chunk_words"), r.getAs[String]("chunk_text")))
    assert(out.count(_._1 == 1L) == 1)
    assert(out.find(_._1 == 1L).get._3 == 5)
    val d2 = out.filter(_._1 == 2L).sortBy(_._2)
    assert(d2.map(_._3).toSeq == Seq(100L, 100L, 90L, 10L))
    // overlap: chunk 1 starts at word 81 — its first 20 words are
    // chunk 0's last 20
    assert(d2(1)._4.startsWith("t81 t82"))
    assert(d2(0)._4.endsWith("t100"))
    assert(d2(3)._4 == (241 to 250).map(i => s"t$i").mkString(" "))
    // every word appears in at least one chunk
    val covered = d2.flatMap(_._4.split(" ")).toSet
    assert((1 to 250).forall(i => covered(s"t$i")))
  }

  test("pii_scrub removes every injected email/phone and counts them") {
    val out = Curation.piiScrub(spark, sf)
    val injected = out.filter(col("doc_id") % 7 === 0)
    assert(injected.count() > 0)
    assert(injected.filter(col("n_emails") < 1 || col("n_phones") < 1).count() == 0)
    assert(out.filter(col("scrubbed").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))
      .count() == 0, "emails survived the scrub")
    assert(out.filter(col("scrubbed").rlike("\\d{3}-\\d{3}-\\d{4}")).count() == 0,
      "phones survived the scrub")
    assert(injected.filter(!col("scrubbed").contains("[EMAIL]")).count() == 0)
  }

  test("tfidf: ranks are dense 1..k per doc and rarer terms outrank at equal tf") {
    val out = Curation.tfidf(spark, sf)
    val byDoc = out.groupBy(col("doc_id"))
      .agg(collect_list(col("rk")).as("rks"), count(lit(1)).as("n"))
    assert(byDoc.filter(col("n") > 5).count() == 0)
    val nonDense = byDoc.filter(array_sort(col("rks")) =!=
      sequence(lit(1L), col("n"))).count()
    assert(nonDense == 0, "ranks not dense 1..n")
    // within a doc, scores are non-increasing by rank
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("rk"))
    assert(out.withColumn("prev", lag(col("score_ppm"), 1).over(w))
      .filter(col("prev").isNotNull && col("score_ppm") > col("prev")).count() == 0)
  }

  test("sample_stratified rebalances: en keep-rate ≈ 15%, others ≈ 50%") {
    val docs = Tables(spark, sf).documents.groupBy(col("lang"))
      .agg(count(lit(1)).as("total"))
    val kept = Curation.sampleStratified(spark, sf).groupBy(col("lang"))
      .agg(count(lit(1)).as("kept"))
    val rates = docs.join(kept, "lang")
      .select(col("lang"), (col("kept") / col("total")).as("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // loose bounds: sf0.001 strata are small (tens of docs)
    assert(rates("en") > 0.02 && rates("en") < 0.35, s"en rate ${rates("en")}")
    rates.filterKeys(_ != "en").foreach { case (l, r) =>
      assert(r > 0.2 && r < 0.8, s"$l rate $r")
    }
  }
}
