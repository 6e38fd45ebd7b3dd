package graft

import graft.functions.QuantileSketchAgg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** quantile_sketch — the mergeable log-histogram quantile card vs
  * its three ground truths: the SQL bucket-lattice form (bit-exact,
  * the oracle's shape), the EXACT per-group order statistics (the
  * 2^-M relative-error guarantee), and itself under any partitioning
  * (merge is count addition — order can't matter). Plus the lattice
  * unit laws, the n=1/zero corners, and the aggregate-shaped plan.
  */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  import QuantileSketchAgg.{bucketOf, repOf}

  private val percents = Seq(25, 50, 75, 90, 99)

  /** Deterministic skewed lengths: mixes exact cells (< 32), every
    * exponent up to ~2^17, and heavy ties — the shapes a doc-length
    * distribution actually has.
    */
  private def docs(n: Int, parts: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val len = ((i * i * 2654435761L) % 131071L).abs % (1L << (5 + i % 13))
      (i.toLong, s"g${i % 5}", len)
    }.toDF("doc_id", "lang", "len").repartition(parts)
  }

  private def sketchCard(d: DataFrame): Array[(String, Seq[Long])] =
    d.groupBy(col("lang"))
      .agg(QuantileSketchAgg.quantileSketch(col("len"), percents).as("qs"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1)))
      .sortBy(_._1)

  test("lattice unit laws: floors, monotonicity, exact small cells, error bound") {
    val vals = (0L to 2048L) ++ Seq(4095L, 4096L, 1L << 40, Long.MaxValue, -7L)
    vals.foreach { v =>
      val x = math.max(v, 0L)
      val idx = bucketOf(v)
      val rep = repOf(idx)
      assert(rep <= x, s"rep above value for $v")
      if (x < 32) assert(rep == x, s"small cells must be exact: $v")
      else assert(x - rep <= rep / 32, s"relative error above 2^-5 for $v")
      // floors are fixed points and indices are value-monotone
      assert(bucketOf(rep) == idx, s"rep of $v not a fixed point")
      if (x > 0) assert(bucketOf(x - 1) <= idx, s"non-monotone at $v")
    }
  }

  test("sketch equals the SQL bucket-lattice form (the oracle's shape)") {
    val d = docs(4000, 4)
    d.createOrReplaceTempView("qs_docs")
    val sql = spark.sql(
      """WITH b AS (SELECT lang,
        |    CASE WHEN len < 32 THEN len
        |         ELSE (length(bin(len)) - 5) * 32 + ((shiftright(len, length(bin(len)) - 6)) & 31)
        |    END AS idx, COUNT(*) AS c
        |  FROM qs_docs GROUP BY 1, 2),
        |cum AS (SELECT lang, idx, c,
        |    SUM(c) OVER (PARTITION BY lang ORDER BY idx) AS cum,
        |    SUM(c) OVER (PARTITION BY lang) AS n
        |  FROM b),
        |r AS (SELECT lang, n, cum,
        |    CASE WHEN idx < 32 THEN idx
        |         ELSE shiftleft(32 + (idx & 31), CAST(idx div 32 AS INT) - 1) END AS rep
        |  FROM cum)
        |SELECT lang,
        |  MIN(CASE WHEN cum >= (25*n+99) div 100 THEN rep END) AS p25,
        |  MIN(CASE WHEN cum >= (50*n+99) div 100 THEN rep END) AS p50,
        |  MIN(CASE WHEN cum >= (75*n+99) div 100 THEN rep END) AS p75,
        |  MIN(CASE WHEN cum >= (90*n+99) div 100 THEN rep END) AS p90,
        |  MIN(CASE WHEN cum >= (99*n+99) div 100 THEN rep END) AS p99
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin)
      .collect()
      .map(r => (r.getString(0), (1 to 5).map(r.getLong)))
    assert(sketchCard(d).map { case (l, q) => (l, q.toIndexedSeq) }
      .sameElements(sql.toSeq))
  }

  test("2^-5 relative error vs the exact order statistics") {
    val d = docs(4000, 4)
    val exact = d.collect()
      .map(r => (r.getString(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (l, rows) => l -> rows.map(_._2).sorted }
    sketchCard(d).foreach { case (lang, qs) =>
      val sortedVals = exact(lang)
      percents.zip(qs).foreach { case (p, rep) =>
        val rank = (p * sortedVals.length + 99) / 100 // ceil(p·n/100)
        val truth = sortedVals(rank - 1)
        assert(rep <= truth && truth - rep <= math.max(rep / 32, 0),
          s"$lang p$p: sketch $rep vs exact $truth")
      }
    }
  }

  test("partitioning invariance: counts merge, order can't matter") {
    val expected = sketchCard(docs(4000, 4)).toSeq
    Seq(1, 3, 16).foreach { parts =>
      assert(sketchCard(docs(4000, parts)).toSeq == expected, s"parts=$parts")
    }
  }

  test("corners: singleton group, all-equal group, zero lengths, null skip") {
    import spark.implicits._
    val d = (Seq((1L, "one", 7L)) ++
      (1 to 9).map(i => (10L + i, "tied", 1000L)) ++
      (1 to 4).map(i => (20L + i, "zero", 0L)))
      .toDF("doc_id", "lang", "len")
    val got = sketchCard(d).toMap
    assert(got("one") == percents.map(_ => 7L))
    assert(got("tied") == percents.map(_ => repOf(bucketOf(1000L))))
    assert(got("zero") == percents.map(_ => 0L))
    // all-null group evaluates to SQL NULL, never a fabricated card
    val withNull = d.withColumn("len",
      when(col("lang") === "zero", lit(null)).otherwise(col("len")))
    val rows = withNull.groupBy(col("lang"))
      .agg(QuantileSketchAgg.quantileSketch(col("len"), percents).as("qs"))
      .collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(rows("zero") && !rows("one") && !rows("tied"))
  }

  test("sketch buffers merge through the streaming state store across micro-batches") {
    import org.apache.spark.sql.streaming.Trigger
    val base = "target/tmp/quantilestream"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    // 4 event-time windows × langs, arrival split into 4 files → 4
    // micro-batches with maxFilesPerTrigger=1: most (window, lang)
    // groups receive rows in SEVERAL batches, so their sketch
    // buffers round-trip the state store and merge incrementally
    val ingest = docs(2000, 4)
      .withColumn("text", expr("repeat('x', CAST(len AS INT))"))
      .withColumn("event_ts",
        expr("timestamp_micros(CAST(1700000000000000 + (doc_id % 4) * 60000000 + doc_id AS BIGINT))"))
      .select("doc_id", "lang", "text", "event_ts")
    val inDir = s"$base/in"
    ingest.repartition(4).write.mode("overwrite").parquet(inDir)
    val streamIn = spark.readStream.schema(ingest.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = streaming.CurationStream.ingestCard(streamIn).writeStream
      .format("memory").queryName("qs_cards")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "card stream did not finish")
    val got = spark.table("qs_cards").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(t => (t._1.getTime, t._2))
    val expected = streaming.CurationStream
      .ingestCard(spark.read.parquet(inDir)).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(t => (t._1.getTime, t._2))
    assert(got.nonEmpty && got.sameElements(expected),
      s"streamed cards (${got.length}) diverge from batch cards (${expected.length})")
  }

  test("registered card: aggregate-shaped plan, never a corpus sort/window") {
    val d = docs(1000, 4)
      .withColumn("text", expr("repeat('x', CAST(len AS INT))"))
    val card = operators.Curation.quantileCardOn(d)
    val plan = card.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based plan:\n$plan")
    assert(!plan.contains("Window"), s"card must not plan a window:\n$plan")
    // and the card is the sketch of length(text)
    val direct = sketchCard(d)
    val viaText = card.collect().map(r =>
      (r.getString(0), (2 to 6).map(r.getLong).toSeq)).sortBy(_._1)
    assert(viaText.sameElements(direct.map { case (l, q) => (l, q.toIndexedSeq) }))
  }

  test("exact_pctl: segment decomposition equals the serial rank rule") {
    val sf = "/root/testdata/sf0.001"
    val got = operators.Relational.exactPctl(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // serial reference: sort each group's cents, apply ceil(q*n)
    val vals = Tables(spark, sf).events
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, rows) => g -> rows.map(_._2).sorted }
    val expected = (for {
      (g, sorted) <- vals.toSeq
      q <- operators.Relational.PctlPpms
    } yield {
      val n = sorted.length.toLong
      val k = ((n * q + 999999L) / 1000000L).toInt
      (g, q, n, sorted(k - 1))
    }).sortBy(t => (t._1, t._2))
    assert(got == expected, "decomposed percentiles diverge from the sort rule")
    assert(got.nonEmpty)
  }

  test("exact_pctl: tie-heavy and single-value corners") {
    import spark.implicits._
    // group a: values 0.01..1.00 (cents 1..100) => p50=50, p90=90,
    // p99=99; group b: one value repeated => every pctl is it
    val ev = ((1 to 100).map(i => ("a", i / 100.0)) ++
      (1 to 7).map(_ => ("b", 3.25)))
      .toDF("event_type", "value")
    val got = operators.Relational.exactPctlOn(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    assert(got == Seq(("a", 500000L, 50L), ("a", 900000L, 90L),
      ("a", 990000L, 99L), ("b", 500000L, 325L), ("b", 900000L, 325L),
      ("b", 990000L, 325L)), s"corner percentiles wrong: $got")
    assert(operators.Relational.exactPctlOn(
      Seq.empty[(String, Double)].toDF("event_type", "value"))
      .count() == 0, "empty input must yield no percentiles")
  }

  test("exact_pctl: adversarial value clustering stays correct (degenerate segmentation)") {
    import spark.implicits._
    // 1000 values packed into 1/1000th of the range plus one far
    // outlier: range segmentation collapses almost everything into
    // one segment — the documented degenerate case; correctness must
    // not depend on the segments being balanced
    val ev = ((1 to 1000).map(i => ("c", i / 100.0)) :+ ("c", 100000.0))
      .toDF("event_type", "value")
    val got = operators.Relational.exactPctlOn(ev)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    // n=1001: p50 -> ceil(500.5)=501 -> cents 501; p90 -> 901; p99 -> 991
    assert(got == Seq((500000L, 501L), (900000L, 901L), (990000L, 991L)),
      s"clustered-domain percentiles wrong: $got")
  }
}
