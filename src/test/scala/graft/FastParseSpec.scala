package graft

import graft.functions.HealthFunctions.{parseEvent, parseEventFast}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fast parser must be indistinguishable from the general path:
  * for every payload, `parseEventFast` ≡ `parseEvent` (the strict
  * fast profile falls back on anything it can't prove).
  */
class FastParseSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()

  val payloads: Seq[String] = Seq(
    // the reference's canonical payload (tests/test_flink_logic.py:7)
    """{"patient_id":"p001","timestamp":"2025-11-19T07:15:23.123456+00:00","heart_rate_bpm":85}""",
    """{"patient_id":"p002","timestamp":"2025-01-01T00:00:00Z","heart_rate_bpm":60}""",
    """{ "patient_id" : "p003" , "timestamp" : "2025-01-01T10:20:30+05:30" , "heart_rate_bpm" : 99 }""",
    // field order permuted + extra field
    """{"heart_rate_bpm":70,"timestamp":"2025-06-01T12:00:00+00:00","patient_id":"p004","extra":"x"}""",
    // invalids: bad json, missing fields, wrong types, non-positive
    "not-json", "", "{}",
    """{"patient_id":"p001"}""",
    """{"patient_id":"p1","timestamp":"2025-01-01T00:00:00Z","heart_rate_bpm":"85"}""",
    """{"patient_id":"p1","timestamp":"2025-01-01T00:00:00Z","heart_rate_bpm":85.5}""",
    """{"patient_id":"p1","timestamp":"2025-01-01T00:00:00Z","heart_rate_bpm":0}""",
    """{"patient_id":"p1","timestamp":"2025-01-01T00:00:00Z","heart_rate_bpm":-5}""",
    """{"patient_id":"p1","timestamp":"garbage","heart_rate_bpm":85}""",
    // fast-profile edges — must fall back or reject exactly like
    // Jackson, never be laxer
    """{"patient_id":"p\"1","timestamp":"2025-01-01T00:00:00Z","heart_rate_bpm":85}""", // escape → fallback
    """{"patient_id":"p1","timestamp":"2025-01-01 00:00:00","heart_rate_bpm":85}""", // no offset → fallback
    """{"patient_id":{"nested":"p1"},"timestamp":"2025-01-01T00:00:00Z","heart_rate_bpm":85}""",
    """[1,2,3]""",
    """{"patient_id":"p1","timestamp":"2025-01-01T00:00:00Z","heart_rate_bpm":85}trailing""",
    // malformed-JSON cases Jackson rejects that a lax scanner might accept
    """{"patient_id":"p1","timestamp":"2025-01-01T00:00:00Z","heart_rate_bpm":85,}""", // trailing comma
    "{\"patient_id\":\"p\n1\",\"timestamp\":\"2025-01-01T00:00:00Z\",\"heart_rate_bpm\":85}", // raw control char
    """{"patient_id":"p1","timestamp":"2025-01-01T00:00:00Z","heart_rate_bpm":085}""", // leading zero
    """{"patient_id":"p1","timestamp":"2025-01-01T00:00:00Z","heart_rate_bpm":85,"x":-}""", // bare minus
    // valid ISO with 9-digit year: OffsetDateTime parses it but
    // epoch-millis overflows Long — must fall back, not crash the task
    """{"patient_id":"p1","timestamp":"+292278995-01-01T00:00:00Z","heart_rate_bpm":85}""")

  test("parseEventFast ≡ parseEvent on every payload class") {
    import spark.implicits._
    val df = payloads.toDF("raw")
      .select(col("raw"), parseEvent(col("raw")).as("slow"), parseEventFast(col("raw")).as("fast"))
    val rows = df.collect()
    rows.foreach { r =>
      val raw = r.getString(0)
      val slow = if (r.isNullAt(1)) null else r.getStruct(1).toSeq
      val fast = if (r.isNullAt(2)) null else r.getStruct(2).toSeq
      assert(fast == slow, s"fast=$fast slow=$slow for payload: $raw")
    }
    // sanity: the canonical payload produced the reference's values
    val canon = rows.head.getStruct(2)
    assert(canon.getAs[String]("patient_id") == "p001")
    assert(canon.getAs[Long]("event_time") == 1763536523123L)
  }
}
