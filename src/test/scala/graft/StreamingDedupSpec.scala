package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact dedup — the streaming complement of the batch
  * dedup_exact operator: dropDuplicatesWithinWatermark keeps one row
  * per key while the watermark bounds state (keys older than the
  * watermark are evicted — constant state at 100 TB/day ingest,
  * unlike an unbounded dropDuplicates).
  */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()

  test("duplicates within the watermark emit once; state does not grow unbounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val in = MemoryStream[(Long, String, Long)] // (event_id, payload, epoch_s)
    val deduped = in.toDF().toDF("event_id", "payload", "epoch_s")
      .withColumn("ts", timestamp_seconds(col("epoch_s")))
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("event_id")

    val q = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      // batch 1: ids 1,2,3 with 1 duplicated immediately
      in.addData((1L, "a", 100L), (2L, "b", 101L), (1L, "a-dup", 102L), (3L, "c", 103L))
      q.processAllAvailable()
      // batch 2: id 2 again (still within watermark) + new id 4
      in.addData((2L, "b-dup", 105L), (4L, "d", 106L))
      q.processAllAvailable()
      // batch 3: advance event time far past the watermark gap
      in.addData((5L, "e", 500L))
      q.processAllAvailable()

      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L, 4L, 5L), s"got $ids")
      assert(ids.size == ids.distinct.size, "a duplicate escaped")

      // state eviction: after the watermark moved to ~490s, the old
      // keys are gone from the store
      val progress = q.lastProgress
      val stateRows = progress.stateOperators.head.numRowsTotal
      assert(stateRows <= 1, s"expected old keys evicted, state holds $stateRows rows")
    } finally q.stop()
  }
}
