package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming SimHash near-dup gate: kernel/aggregate signature
  * equality (the map-side stream path cannot drift from the batch
  * operator), stream-verdict equivalence vs the all-pairs batch
  * reference across micro-batch boundaries, and the bounded-state
  * bucket transition unit-tested directly.
  */
class NearDupStreamSpec extends AnyFunSuite {
  val specSf = sys.env.get("SPARK_GRAFT_SPEC_SF").filter(_.nonEmpty)
    .getOrElse("/root/testdata/sf0.001")
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()

  test("SimHashKernel equals the batch SimHashAgg signature on the corpus") {
    val docs = Tables(spark, specSf).documents
      .select(col("doc_id"), col("text"))
    val agg = operators.Dedup.simhashSignatures(docs)
      .withColumnRenamed("simhash", "sig_agg")
    val kernel = streaming.NearDupStream.withSimhash(docs)
      .select(col("doc_id"), col("simhash").as("sig_kernel"))
    val joined = agg.join(kernel, "doc_id")
    assert(joined.count() == docs.count())
    val diff = joined.filter(col("sig_agg") =!= col("sig_kernel")).count()
    assert(diff == 0L, s"$diff signatures differ between kernel and aggregate")
  }

  test("stream verdicts equal the all-pairs earlier-arrival reference across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // corpus with planted structure: distinct bases, exact copies,
    // near copies (one word appended — usually within hamming 3 of
    // the base), split across three micro-batches
    val base = Tables(spark, specSf).documents
      .select(col("doc_id"), col("text")).limit(40)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val planted: Seq[(Long, String, Long)] =
      base.toSeq.map { case (id, t) => (id, t, 100L + id) } ++
        Seq( // exact + near copies of docs 0..4 arriving later
          (1000L, base(0)._2, 300L),
          (1001L, base(1)._2 + " trailing extra", 301L),
          (1002L, base(2)._2, 302L),
          (1003L, base(3)._2 + " x", 303L),
          (1004L, base(4)._2, 304L))
    val (b1, rest) = planted.splitAt(20)
    val (b2, b3) = rest.splitAt(15)

    val in = MemoryStream[(Long, String, Long)]
    val flags = streaming.NearDupStream.nearDupFlags(
      in.toDF().toDF("doc_id", "text", "epoch_s")
        .withColumn("event_ts", timestamp_seconds(col("epoch_s")))
        .select(col("doc_id"), col("text"), col("event_ts")),
      watermark = "10 seconds", window = "10 seconds")
    val q = flags.writeStream
      .format("memory").queryName("neardup_out").outputMode("append").start()
    try {
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      in.addData(b3); q.processAllAvailable()
      // flush: advance the watermark far past every planted window
      in.addData(Seq((9999L, "flush doc", 100000L))); q.processAllAvailable()

      val got = spark.table("neardup_out")
        .select(col("doc_id"), col("is_near_dup"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // all-pairs reference over the ACTUAL kernel signatures, in
      // (event_ts, doc_id) arrival order
      val sigRows = streaming.NearDupStream.withSimhash(
          planted.toDF("doc_id", "text", "epoch_s"))
        .select(col("doc_id"), col("simhash"), col("epoch_s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(r => (r._3, r._1))
      val expected = sigRows.zipWithIndex.map { case ((id, sig, _), i) =>
        id -> sigRows.take(i).exists { case (_, psig, _) =>
          java.lang.Long.bitCount(psig ^ sig) <= streaming.NearDupStream.MaxHamming
        }
      }.toMap

      assert(got.keySet == expected.keySet, // flush doc not yet emitted
        s"missing/extra docs: ${got.keySet.diff(expected.keySet)} / ${expected.keySet.diff(got.keySet)}")
      for ((id, exp) <- expected)
        assert(got(id) == (if (exp) 1L else 0L), s"doc $id: stream ${got(id)} vs reference $exp")
      // the planted copies must actually be caught (exact copy =
      // hamming 0, always within radius)
      assert(got(1000L) == 1L && got(1002L) == 1L && got(1004L) == 1L)
      // and the 40 distinct bases include at least one non-dup
      assert(expected.exists(!_._2))
    } finally q.stop()
  }

  test("bucket transition: prior-state hit, in-batch ordering, FIFO cap") {
    import org.apache.spark.sql.streaming.TestGroupState
    import streaming.{BandObs, BucketSigs, NearDupStream}
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)

    // in-batch: second arrival sees the first (same signature)
    val s1 = TestGroupState.create[BucketSigs](
      optionalState = org.apache.spark.api.java.Optional.empty[streaming.BucketSigs](), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val out1 = NearDupStream.checkBucket(0L,
      Iterator(BandObs(0L, 2L, 0xF0F0L, ts(2)), BandObs(0L, 1L, 0xF0F0L, ts(1))), s1).toSeq
    assert(out1.map(v => v.doc_id -> v.prior_dup) ==
      Seq(1L -> false, 2L -> true), s"in-batch order broken: $out1")

    // cross-batch: state survives and flags the next batch
    val s2 = TestGroupState.create[BucketSigs](
      optionalState = org.apache.spark.api.java.Optional.of(s1.get), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val out2 = NearDupStream.checkBucket(0L,
      Iterator(BandObs(0L, 3L, 0xF0F1L, ts(3))), s2).toSeq // hamming 1 from held sigs
    assert(out2 == Seq(streaming.BandVerdict(3L, 0xF0F1L, ts(3), prior_dup = true)))

    // FIFO cap: the state never exceeds BucketCap and evicts oldest
    val many = (1 to NearDupStream.BucketCap + 10).map(i =>
      BandObs(0L, 100L + i, i.toLong << 20, ts(10 + i))) // far-apart sigs: no dups
    val s3 = TestGroupState.create[BucketSigs](
      optionalState = org.apache.spark.api.java.Optional.empty[streaming.BucketSigs](), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    NearDupStream.checkBucket(0L, many.iterator, s3).length // force the iterator
    assert(s3.get.sigs.length == NearDupStream.BucketCap)
    assert(s3.get.docIds.head == many(10).doc_id, "oldest entries must evict first")
  }
}
