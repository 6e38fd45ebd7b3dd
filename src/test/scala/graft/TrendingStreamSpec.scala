package graft

import graft.streaming.TrendingStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming trending card: per-window top sources from
  * Misra-Gries state, stream ≡ batch when the capacity doesn't bind
  * (nothing evicts → the sketch is the exact count table and
  * micro-batch merge order is irrelevant).
  */
class TrendingStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()
  val sf = sys.env.get("SPARK_GRAFT_SPEC_SF").filter(_.nonEmpty)
    .getOrElse("/root/testdata/sf0.001")

  test("file-streamed trending card equals the batch form; ranks and counts exact") {
    import org.apache.spark.sql.streaming.Trigger
    val base = "target/tmp/trendingstream"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"

    // three event-time windows, sources from the corpus (vocabulary
    // ≪ capacity — the exactness regime); a far-future flush row
    // advances the watermark past them so append mode emits (its own
    // window stays open and is excluded from both sides)
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("source"))
      .withColumn("event_ts", expr(
        "timestamp_micros(CAST(1700000000000000 + (doc_id % 3) * 60000000 + doc_id AS BIGINT))"))
    val flush = spark.sql(
      "SELECT -1L AS doc_id, 'flush' AS source, timestamp_micros(1700009000000000) AS event_ts")
    docs.unionAll(flush).coalesce(2).write.mode("overwrite").parquet(inDir)

    val streamIn = spark.readStream.schema(docs.schema).parquet(inDir)
    val q = TrendingStream.trendingCard(streamIn, watermark = "10 seconds").writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "trending stream did not finish")

    val got = spark.read.parquet(outDir)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1),
        r.getString(2), r.getLong(3))).toSet
    assert(got.nonEmpty)
    val want = TrendingStream.trendingCard(docs)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1),
        r.getString(2), r.getLong(3))).toSet
    assert(got == want, s"stream diverges from batch: ±${(got diff want).size}")
    // counts are EXACT (capacity above vocab): cross-check one window
    // against a plain groupBy
    val winStarts = got.map(_._1)
    assert(winStarts.size == 3, s"expected 3 windows, got ${winStarts.size}")
    val exact = docs
      .groupBy(window(col("event_ts"), "1 minute"), col("source"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("source"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    got.foreach { case (ws, _, src, n) =>
      assert(exact((ws, src)) == n, s"estimated count drifted for $src@$ws")
    }
    // ranks are the count order with the term tie-break
    got.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.toSeq.sortBy(_._2)
      assert(byRank.map(_._2) == (1L to byRank.length))
      val resorted = byRank.sortBy(t => (-t._4, t._3))
      assert(resorted == byRank, "rank order is not (count desc, source asc)")
    }
  }
}
