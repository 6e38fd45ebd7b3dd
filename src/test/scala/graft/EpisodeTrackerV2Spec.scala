package graft

import graft.streaming.{Episode, EpisodeTrackerV2, WindowAlert}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState episode tracking: run-merging semantics match
  * the flatMapGroupsWithState tracker, and the event-time timer
  * flushes a still-open episode once the watermark passes its quiet
  * gap — the capability the old API couldn't express off event time.
  */
class EpisodeTrackerV2Spec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def alert(p: String, start: String, end: String, hr: Double, t: String) =
    WindowAlert(p, ts(start), ts(end), hr, t)

  test("same episodes as V1 on closed runs; event-time timer flushes the open run") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[WindowAlert]
      val eps = EpisodeTrackerV2.episodes(
        in.toDS().withWatermark("window_start", "0 seconds").as[WindowAlert])
      val q = eps.writeStream
        .format("memory").queryName("eps_v2").outputMode("append").start()
      try {
        // p1: two tachy windows then normal (closed by the break);
        // p2: one brady window then silence (closed by the timer)
        in.addData(
          alert("p1", "2025-01-01 00:00:00", "2025-01-01 00:01:00", 130, "tachycardia"),
          alert("p1", "2025-01-01 00:01:00", "2025-01-01 00:02:00", 140, "tachycardia"),
          alert("p2", "2025-01-01 00:00:00", "2025-01-01 00:01:00", 40, "bradycardia"))
        q.processAllAvailable()
        in.addData(
          alert("p1", "2025-01-01 00:02:00", "2025-01-01 00:03:00", 80, "normal"))
        q.processAllAvailable()
        val afterBreak = spark.table("eps_v2").as[Episode].collect()
        assert(afterBreak.length == 1)
        assert(afterBreak.head.patient_id == "p1" &&
          afterBreak.head.episode_type == "tachycardia" &&
          afterBreak.head.n_windows == 2 && afterBreak.head.peak_avg_hr == 140.0)

        // advance the watermark past p2's window_end + 10min quiet gap
        // (watermark moves off event time only — no wall-clock wait)
        in.addData(
          alert("p3", "2025-01-01 01:00:00", "2025-01-01 01:01:00", 75, "normal"))
        q.processAllAvailable()
        // one more microbatch so the expired timer's output commits
        in.addData(
          alert("p3", "2025-01-01 01:01:00", "2025-01-01 01:02:00", 75, "normal"))
        q.processAllAvailable()

        val all = spark.table("eps_v2").as[Episode].collect()
        val p2 = all.filter(_.patient_id == "p2")
        assert(p2.length == 1, s"timer did not flush p2: ${all.toSeq}")
        assert(p2.head.episode_type == "bradycardia" && p2.head.n_windows == 1)
        assert(all.length == 2) // no duplicate emissions
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
