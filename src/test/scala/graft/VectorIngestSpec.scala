package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch for the IVF ingest loop: the streamed per-cell
  * arrival counts, assembled through the SHARED card definition,
  * must reproduce the batch ann_incremental card bit-for-bit — and a
  * checkpoint restart must RESUME the counts (phase 2 arrives in a
  * second run), never recount or drop.
  */
class VectorIngestSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()
  // fuzz-replayable (the stream-suite convention)
  val sf = sys.env.get("SPARK_GRAFT_SPEC_SF").filter(_.nonEmpty)
    .getOrElse("/root/testdata/sf0.001")

  private def emb: DataFrame = Tables(spark, sf).embeddings
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("streamed IVF ingest equals batch ann_incremental across micro-batches and a restart") {
    val base = "target/tmp/vectoringest"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    val inDir = s"$base/in"; val ckpt = s"$base/ckpt"

    val old = emb.filter(col("vec_id") % 5 =!= 4 && col("v").isNotNull)
    val neu = emb.filter(col("vec_id") % 5 === 4 && col("v").isNotNull)
    val (cids, cvecs) = operators.SimilaritySearch.incrementalCentroids(old)
    assert(cids.nonEmpty, "fixture produced no centroids")

    // the arrival batch lands in TWO phases; phase 1 as several files
    // so maxFilesPerTrigger=1 drives multiple micro-batches
    val phase1 = neu.filter(col("vec_id") % 2 === 0)
    val phase2 = neu.filter(col("vec_id") % 2 =!= 0)
    phase1.repartition(3).write.mode("overwrite").parquet(inDir)

    def run(tag: String): Map[Long, Long] = {
      val streamIn = spark.readStream.schema(phase1.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val q = streaming.VectorIngestStream.cellCounts(streamIn, cids, cvecs)
        .writeStream.format("memory").queryName(s"vic_$tag")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), s"run $tag did not finish")
      q.stop()
      spark.table(s"vic_$tag").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

    // phase 1: counts must equal the batch assignment of phase 1
    val got1 = run("p1")
    val want1 = phase1
      .withColumn("cid", element_at(
        functions.VectorFunctions.nearestCentroids(col("v"), cids, cvecs, 1), 1))
      .groupBy(col("cid")).agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got1 == want1, s"phase-1 stream counts diverge: $got1 vs $want1")

    // phase 2 lands; the RESTARTED query must resume phase-1 state
    phase2.repartition(2).write.mode("append").parquet(inDir)
    val got2 = run("p2")

    // assemble through the SHARED card definition and compare to the
    // registered batch operator bit-for-bit
    import spark.implicits._
    val oldN = old.withColumn("cid", element_at(
        functions.VectorFunctions.nearestCentroids(col("v"), cids, cvecs, 1), 1))
      .groupBy(col("cid")).agg(count(lit(1)).as("old_n"))
    val newN = got2.toSeq.toDF("cid", "new_n")
    val streamCard = operators.SimilaritySearch.ivfCardFrom(
        oldN, newN, old.count(), neu.count())
      .collect().map(_.toSeq).toSeq
    val batchCard = operators.SimilaritySearch.annIncremental(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamCard == batchCard,
      s"stream-assembled card diverges from batch ann_incremental")
  }
}
