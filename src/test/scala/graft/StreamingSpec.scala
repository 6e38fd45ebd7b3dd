package graft

import graft.streaming._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end streaming behavior with MemoryStream sources: the
  * same pipeline code the Kafka path runs, driven synchronously.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  private def ev(patient: String, ts: String, hr: Int): String =
    s"""{"patient_id":"$patient","timestamp":"$ts","heart_rate_bpm":$hr}"""

  test("streaming alerts: windowed stats + classification, invalid rows dropped") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[String]
    val alerts = HealthMonitor.alerts(input.toDF().toDF("value"))
    val q = HealthMonitor.memorySink(alerts, "alerts_t1", "update")
    try {
      input.addData(
        ev("p1", "2025-01-01T00:00:10+00:00", 120),
        ev("p1", "2025-01-01T00:00:30+00:00", 130),
        ev("p2", "2025-01-01T00:00:20+00:00", 45),
        "garbage-not-json",
        """{"patient_id":"p3"}""")
      q.processAllAvailable()
      val out = spark.table("alerts_t1").collect()
        .map(r => (r.getAs[String]("patient_id"), r.getAs[Double]("avg_hr"),
          r.getAs[String]("alert_type"))).toSet
      assert(out == Set(("p1", 125.0, "tachycardia"), ("p2", 45.0, "bradycardia")))
    } finally q.stop()
  }

  test("streaming alerts honor the watermark: late data beyond 5s is dropped (append mode)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[String]
    val alerts = HealthMonitor.alerts(input.toDF().toDF("value"))
    val q = HealthMonitor.memorySink(alerts, "alerts_t2", "append")
    try {
      input.addData(ev("p1", "2025-01-01T00:00:10+00:00", 80))
      q.processAllAvailable()
      // advance event time far past the first window + watermark
      input.addData(ev("p1", "2025-01-01T00:05:00+00:00", 85))
      q.processAllAvailable()
      // late event for the long-closed first window: must not resurrect it
      input.addData(ev("p1", "2025-01-01T00:00:40+00:00", 200))
      q.processAllAvailable()
      val w1 = spark.table("alerts_t2")
        .filter(col("window_start") === lit("2025-01-01 00:00:00").cast("timestamp"))
        .collect()
      assert(w1.length == 1)
      assert(w1.head.getAs[Double]("avg_hr") == 80.0) // late 200-bpm reading excluded
      assert(w1.head.getAs[Long]("n_readings") == 1L)
    } finally q.stop()
  }

  test("alert JSON payload has the reference's fields") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[String]
    val json = HealthMonitor.alertJson(HealthMonitor.alerts(input.toDF().toDF("value")))
    val q = HealthMonitor.memorySink(json, "alerts_t3", "update")
    try {
      input.addData(ev("p9", "2025-01-01T10:00:05+00:00", 110))
      q.processAllAvailable()
      val s = spark.table("alerts_t3").as[String].collect().head
      for (f <- Seq("patient_id", "window_start", "window_end", "avg_hr", "min_hr",
          "max_hr", "alert_type"))
        assert(s.contains(s""""$f""""), s"missing $f in $s")
      assert(s.contains(""""alert_type":"tachycardia""""))
    } finally q.stop()
  }

  test("sliding windows: one event lands in size/slide windows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[String]
    val alerts = HealthMonitor.alerts(input.toDF().toDF("value"),
      windowSize = "1 minute", slide = Some("15 seconds"))
    val q = HealthMonitor.memorySink(alerts, "alerts_sl", "update")
    try {
      input.addData(ev("p1", "2025-01-01T00:01:00+00:00", 90))
      q.processAllAvailable()
      val rows = spark.table("alerts_sl").collect()
      assert(rows.length == 4, s"expected 4 sliding windows, got ${rows.length}")
      assert(rows.forall(_.getAs[Long]("n_readings") == 1L))
    } finally q.stop()
  }

  test("session windows: readings within the gap merge, a silent gap splits") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[String]
    // session aggregation only supports append mode: sessions emit
    // once the watermark passes their close
    val alerts = HealthMonitor.sessionAlerts(input.toDF().toDF("value"), gap = "5 minutes")
    val q = HealthMonitor.memorySink(alerts, "alerts_se", "append")
    try {
      input.addData(
        ev("p1", "2025-01-01T00:00:00+00:00", 80),
        ev("p1", "2025-01-01T00:03:00+00:00", 90), // within gap → same session
        ev("p1", "2025-01-01T00:20:00+00:00", 70)) // 17 min silence → new session
      q.processAllAvailable()
      // advance the watermark far past both p1 sessions so they close
      input.addData(ev("p2", "2025-01-01T02:00:00+00:00", 85))
      q.processAllAvailable()
      val rows = spark.table("alerts_se").filter(col("patient_id") === "p1").collect()
      assert(rows.length == 2, s"expected 2 closed p1 sessions, got ${rows.length}")
      val byN = rows.map(_.getAs[Long]("n_readings")).sorted.toSeq
      assert(byN == Seq(1L, 2L))
    } finally q.stop()
  }

  test("hello pipeline adds processed_by like the reference hello job") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[String]
    val q = HealthMonitor.memorySink(
      HelloPipeline.transform(input.toDF().toDF("value")), "hello_t", "append")
    try {
      input.addData("""{"id": "0", "message": "hello spark"}""", "not json",
        """{"processed_by": "someone_else"}""") // pre-existing key: overwrite, don't crash
      q.processAllAvailable()
      val out = spark.table("hello_t").as[String].collect().sorted
      assert(out.count(_.contains(""""processed_by":"hello_spark_job"""")) == 2)
      assert(!out.exists(_.contains("someone_else")))
      assert(out.contains("not json")) // defensive passthrough
    } finally q.stop()
  }

  test("episode tracker merges consecutive abnormal windows and closes on normal") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[WindowAlert]
    input.addData(
      WindowAlert("p1", ts("2025-01-01 00:00:00"), ts("2025-01-01 00:01:00"), 120, "tachycardia"),
      WindowAlert("p1", ts("2025-01-01 00:01:00"), ts("2025-01-01 00:02:00"), 140, "tachycardia"),
      WindowAlert("p1", ts("2025-01-01 00:02:00"), ts("2025-01-01 00:03:00"), 80, "normal"),
      WindowAlert("p2", ts("2025-01-01 00:00:00"), ts("2025-01-01 00:01:00"), 40, "bradycardia"))
    // AvailableNow: with ProcessingTimeTimeout in the state machine, a
    // default-trigger query never quiesces for processAllAvailable.
    val q = EpisodeTracker.episodes(input.toDS()).writeStream
      .format("memory").queryName("episodes_t").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "query did not finish")
      val eps = spark.table("episodes_t").as[Episode].collect()
      // p1's run closed by the normal window; p2's episode still open (no emission)
      assert(eps.length == 1)
      val e = eps.head
      assert(e.patient_id == "p1" && e.episode_type == "tachycardia")
      assert(e.n_windows == 2 && e.peak_avg_hr == 140.0)
      assert(e.start == ts("2025-01-01 00:00:00") && e.end == ts("2025-01-01 00:02:00"))
    } finally q.stop()
  }
}
