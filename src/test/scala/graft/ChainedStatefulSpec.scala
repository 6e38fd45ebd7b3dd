package graft

import graft.sources.HealthDataGenerator
import graft.streaming.{EpisodeTracker, HealthMonitor, WindowAlert}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two stateful operators fused in ONE streaming query (Spark 4
  * multi-stateful-operator support): watermarked tumbling-window
  * aggregation (HealthMonitor.alerts) feeding keyed episode state
  * (EpisodeTracker.episodes) — raw JSON in, episodes out, no
  * intermediate topic or batch hop.
  */
class ChainedStatefulSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()

  test("windowed aggregation chains into flatMapGroupsWithState in one query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val in = MemoryStream[String]
    val alerts = HealthMonitor.alerts(in.toDF())
    val episodes = EpisodeTracker.episodes(
      alerts.select(
        col("patient_id"), col("window_start"), col("window_end"),
        col("avg_hr"), col("alert_type")).as[WindowAlert])

    val q = episodes.writeStream
      .format("memory").queryName("chained_eps").outputMode("append").start()
    try {
      // p1: two tachycardia windows then a normal one closes the run;
      // p2: stays normal throughout. Readings 10s apart, windows 1min.
      def payload(p: String, t: String, hr: Int) =
        s"""{"patient_id": "$p", "timestamp": "$t", "heart_rate_bpm": $hr}"""
      val minute = (m: Int, s: Int) => f"2024-01-01T10:$m%02d:$s%02dZ"
      val batch1 =
        (0 until 6).map(i => payload("p1", minute(0, i * 10), 130)) ++
        (0 until 6).map(i => payload("p1", minute(1, i * 10), 140)) ++
        (0 until 6).map(i => payload("p2", minute(0, i * 10), 80))
      val batch2 =
        (0 until 6).map(i => payload("p1", minute(2, i * 10), 70)) ++
        (0 until 6).map(i => payload("p2", minute(2, i * 10), 85))
      // push the watermark far past every earlier window so the agg
      // finalizes them and the tracker sees the run break
      val flush = Seq(payload("p1", minute(30, 0), 75), payload("p2", minute(30, 0), 75))

      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      in.addData(flush); q.processAllAvailable()

      val eps = spark.table("chained_eps").as[graft.streaming.Episode].collect()
      assert(eps.length == 1, s"expected exactly one closed episode, got: ${eps.toSeq}")
      val ep = eps.head
      assert(ep.patient_id == "p1")
      assert(ep.episode_type == "tachycardia")
      assert(ep.n_windows == 2)
      assert(ep.peak_avg_hr == 140.0)
      assert(ep.start.getTime == java.time.Instant.parse("2024-01-01T10:00:00Z").toEpochMilli)
      assert(ep.end.getTime == java.time.Instant.parse("2024-01-01T10:02:00Z").toEpochMilli)
    } finally q.stop()
  }
}
