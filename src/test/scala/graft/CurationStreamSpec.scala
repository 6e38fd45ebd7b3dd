package graft

import graft.streaming.CurationStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingest curation end-to-end: documents (with injected
  * re-crawl duplicates) stream in from files, the quality gate +
  * content dedup admit each surviving CONTENT exactly once, and the
  * admitted set equals the batch operators' answer on the same data.
  */
class CurationStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()
  val sf = sys.env.get("SPARK_GRAFT_SPEC_SF").filter(_.nonEmpty)
    .getOrElse("/root/testdata/sf0.001")

  test("file-streamed curation admits each quality-passing content exactly once, matching batch") {
    import org.apache.spark.sql.streaming.Trigger
    val base = "target/tmp/curationstream"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"

    // ingest fixture: the corpus plus a re-crawl echo of every 4th
    // document (new ids, same text — the duplicate class the stream
    // must admit exactly once), all timestamped inside one watermark
    // horizon
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text"), col("lang"))
    val echoes = docs.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"), col("lang"))
    val ingest = docs.unionAll(echoes)
      .withColumn("event_ts",
        expr("timestamp_micros(CAST(1700000000000000 + doc_id * 1000 AS BIGINT))"))
    ingest.coalesce(2).write.mode("overwrite").parquet(inDir)

    val streamIn = spark.readStream.schema(ingest.schema).parquet(inDir)
    val q = CurationStream.curate(streamIn).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish")

    val admitted = spark.read.parquet(outDir).collect()
    assert(admitted.nonEmpty)
    // exactly-once per content
    val byFp = admitted.groupBy(_.getAs[String]("fingerprint"))
    assert(byFp.forall(_._2.length == 1),
      s"content admitted twice: ${byFp.filter(_._2.length > 1).keys.take(3)}")
    // the admitted CONTENT set equals the batch answer (quality gate +
    // distinct fingerprint) on the same ingest — which admission of a
    // duplicate won is arrival-order-dependent, the content set is not
    val batch = CurationStream.curate(ingest)
    val expectFps = batch.select("fingerprint").distinct()
      .collect().map(_.getString(0)).toSet
    assert(byFp.keySet == expectFps,
      s"admitted content diverges from batch: ±${(byFp.keySet diff expectFps).size}/${(expectFps diff byFp.keySet).size}")
    // the gate really fired: fewer CONTENTS admitted than the ingest
    // carries (counting rows would pass vacuously — the echo fixture
    // alone makes rows > contents)
    import graft.functions.TextFunctions.normalize
    val allContents = ingest.select(md5(normalize(col("text"))).as("fp"))
      .distinct().count()
    assert(expectFps.size < allContents,
      s"quality gate admitted all $allContents contents")
    // and the stream's gate is the REGISTERED batch operator's gate:
    // admitted contents == contents of quality_score survivors
    val keep = graft.operators.Text
      .qualityScoreOn(ingest.select(col("doc_id"), col("text")))
      .filter(col("score") >= CurationStream.MinQuality)
      .select("doc_id")
    val gateFps = ingest.join(keep, "doc_id")
      .select(md5(normalize(col("text"))).as("fp"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(byFp.keySet == gateFps,
      "stream gate diverges from the batch quality_score operator")
  }

  test("perplexity-gated ingest rejects the ccnet tail at the door, exactly-once unchanged") {
    import org.apache.spark.sql.streaming.Trigger
    val base = "target/tmp/curationstream_gated"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"

    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text"), col("lang"))
    // the gate trains on the BATCH corpus (the lambda split's slow
    // path); the stream then ingests that corpus plus re-crawl echoes
    val gate = CurationStream.trainPerplexityGate(docs)
    assert(gate.vocab > 0 && gate.tailThresholds.nonEmpty)
    val echoes = docs.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"), col("lang"))
    val ingest = docs.unionAll(echoes)
      .withColumn("event_ts",
        expr("timestamp_micros(CAST(1700000000000000 + doc_id * 1000 AS BIGINT))"))
    ingest.coalesce(2).write.mode("overwrite").parquet(inDir)

    val streamIn = spark.readStream.schema(ingest.schema).parquet(inDir)
    val q = CurationStream.curateGated(streamIn, gate).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "gated stream did not finish")

    val admitted = spark.read.parquet(outDir).collect()
    assert(admitted.nonEmpty)
    // exactly-once per content, unchanged by the gate
    val byFp = admitted.groupBy(_.getAs[String]("fingerprint"))
    assert(byFp.forall(_._2.length == 1),
      s"content admitted twice: ${byFp.filter(_._2.length > 1).keys.take(3)}")
    // the admitted content set equals the batch form of the SAME gate
    val expectFps = CurationStream.curateGated(ingest, gate)
      .select("fingerprint").distinct()
      .collect().map(_.getString(0)).toSet
    assert(byFp.keySet == expectFps,
      "streamed gate diverges from its batch form")
    // and the gate IS the registered ccnet_buckets split: admitted ==
    // ungated admission minus exactly the batch operator's tail slice
    // (bit-exact kernel/batch score equivalence on the training corpus)
    val ungatedFps = CurationStream.curate(ingest)
      .select("fingerprint").distinct()
      .collect().map(_.getString(0)).toSet
    import graft.functions.TextFunctions.normalize
    // CONTENT granularity: the gate is per-DOC 'not tail', and the
    // exactly-once dedup admits the first PASSING copy (rejected docs
    // never occupy state — the documented contract). A text can ride
    // several docs under different langs (fuzz corpora plant exact
    // cross-lang dups — found live on fuzz seed 11), so the contents
    // the gate rejects are those whose EVERY carrier doc is tail, not
    // those with ANY tail carrier. Scores and quality are content-
    // deterministic; only the per-lang threshold varies per carrier.
    val tailOnlyFps = operators.LangModel.ccnetBucketsOn(docs)
      .join(docs, "doc_id")
      .select(md5(normalize(col("text"))).as("fp"),
        (col("bucket") === "tail").cast("int").as("is_tail"))
      .groupBy(col("fp")).agg(min(col("is_tail")).as("all_tail"))
      .filter(col("all_tail") === 1)
      .select("fp").collect().map(_.getString(0)).toSet
    assert(expectFps == (ungatedFps diff tailOnlyFps),
      s"gate admission is not 'everything but the all-tail contents': " +
        s"admitted ${expectFps.size}, ungated ${ungatedFps.size}, " +
        s"all-tail ${tailOnlyFps.size}")
    // the gate actually rejected something
    assert(expectFps.size < ungatedFps.size, "no tail content was rejected at ingest")
  }

  test("gopher-strict ingest rejects rule-failing content at the door, exactly-once unchanged") {
    import org.apache.spark.sql.streaming.Trigger
    val base = "target/tmp/curationstrict"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"

    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text"), col("lang"))
    val ingest = docs.withColumn("event_ts",
      expr("timestamp_micros(CAST(1700000000000000 + doc_id * 1000 AS BIGINT))"))
    ingest.coalesce(2).write.mode("overwrite").parquet(inDir)

    val streamIn = spark.readStream.schema(ingest.schema).parquet(inDir)
    val q = CurationStream.curateStrict(streamIn).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "strict stream did not finish")

    val admitted = spark.read.parquet(outDir).collect()
    assert(admitted.nonEmpty)
    val byFp = admitted.groupBy(_.getAs[String]("fingerprint"))
    assert(byFp.forall(_._2.length == 1), "content admitted twice")
    // admitted rows all carry fully-passing rule flags
    admitted.foreach { r =>
      Seq("r_words", "r_wordlen", "r_rep", "r_stop", "r_alpha")
        .foreach(f => assert(r.getAs[Long](f) == 1L, s"admitted row fails $f"))
    }
    // the stream's verdicts ARE the registered batch operator's:
    // admitted contents == quality-gate ∩ gopher-keep contents
    import graft.functions.TextFunctions.normalize
    val gopherKeep = graft.operators.Text
      .gopherQualityOn(ingest.select(col("doc_id"), col("text")))
      .filter(col("keep") === 1).select("doc_id")
    val qualityKeep = graft.operators.Text
      .qualityScoreOn(ingest.select(col("doc_id"), col("text")))
      .filter(col("score") >= CurationStream.MinQuality).select("doc_id")
    val expectFps = ingest
      .join(gopherKeep, "doc_id").join(qualityKeep, "doc_id")
      .select(md5(normalize(col("text"))).as("fp"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(byFp.keySet == expectFps,
      "strict stream diverges from batch gopher_quality ∩ quality_score")
    // the gopher rules rejected content the quality gate alone passes
    val qualityOnlyFps = CurationStream.curate(ingest)
      .select("fingerprint").distinct().collect().map(_.getString(0)).toSet
    assert(expectFps.size < qualityOnlyFps.size,
      "gopher gate rejected nothing beyond the quality gate")
  }
}
