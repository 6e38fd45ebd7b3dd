package graft

import graft.sources.HealthDataGenerator
import graft.streaming.HealthMonitor
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Producer-side semantics, mirroring the reference's payload tests
  * (tests/test_kafka_payload.py) plus an end-to-end generator →
  * pipeline run.
  */
class GeneratorSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()

  test("generated events have the reference's fields and plausible ranges") {
    // mirrors tests/test_kafka_payload.py:7-25
    val ev = HealthDataGenerator.events(spark, nPatients = 5, perPatient = 100).collect()
    assert(ev.length == 500)
    assert(ev.forall(_.getAs[String]("patient_id").matches("p\\d{3}")))
    val rates = ev.map(_.getAs[Long]("heart_rate_bpm"))
    // reference's range check (test_kafka_payload.py:24-25) is 30..200
    // for the baseline-only producer; ours injects bradycardia lows
    // (the extension kafka_producer.py:14-16 suggests), so the floor
    // is lower but still physiological
    assert(rates.min > 10 && rates.max < 200)
    // both abnormal regimes are represented
    assert(rates.exists(_ > 100) && rates.exists(_ < 50))
  }

  test("payloads parse back through parse_event losslessly") {
    import spark.implicits._
    val n = 300
    val parsed = HealthDataGenerator.payloads(spark, perPatient = n / 5 + 1)
      .limit(n)
      .select(graft.functions.HealthFunctions.parseEvent(col("value")).as("e"))
    assert(parsed.filter(col("e").isNull).count() == 0)
    assert(parsed.filter(col("e.heart_rate_bpm") <= 0).count() == 0)
  }

  test("generator → full monitoring pipeline produces windows and alerts of every type") {
    val alerts = HealthMonitor.alerts(
      HealthDataGenerator.payloads(spark, nPatients = 5, perPatient = 2000))
    // batch-mode run of the same streaming transformation
    val out = alerts.groupBy(col("alert_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("normal", "tachycardia", "bradycardia"),
      s"expected all three alert types, got $out")
    assert(out("normal") > out("tachycardia"))
  }
}
