package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level re-expression of the reference's pure functions.
  *
  * `parse_event` (reference src/flink_job.py:19-32): JSON string →
  * (patient_id, heart_rate_bpm, event_time epoch-millis), NULL on
  * any parse/validation failure.
  * `classify_window` (src/flink_job.py:35-46): avg>100 tachycardia,
  * avg<50 bradycardia, else normal.
  *
  * Both are pure `functions._` expression trees — whole-stage
  * codegen'd, no UDF boxing, usable identically in batch and
  * Structured Streaming.
  */
object HealthFunctions {

  /** Kafka-payload schema of the reference producer
    * (src/kafka_producer.py:23-27).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("patient_id", StringType),
    StructField("timestamp", StringType),
    StructField("heart_rate_bpm", LongType)))

  /** parse_event: raw JSON → struct(patient_id, heart_rate_bpm,
    * event_time). Any failure (malformed JSON, missing field,
    * unparseable timestamp, non-positive rate) yields NULL, matching
    * the reference's None (tests/test_flink_logic.py:14-23).
    *
    * Usage note (measured): alias the result ONCE (`.as("e")`) and
    * filter on `e.isNotNull` — a multi-conjunct filter on the parsed
    * fields gets predicate-pushed with one full copy of this tree
    * per conjunct (Catalyst substitutes trees, not DAGs), which
    * multiplied the JSON parse ~6× on the batch path.
    */
  def parseEvent(raw: Column): Column = {
    val j = from_json(raw, eventSchema)
    // try_to_timestamp: under ANSI mode (Spark 4 default) a plain
    // to_timestamp THROWS on malformed input instead of yielding null
    // — the reference drops such events (parse_event → None)
    val eventTime = unix_millis(try_to_timestamp(j.getField("timestamp")))
    val ok = j.isNotNull &&
      j.getField("patient_id").isNotNull &&
      j.getField("heart_rate_bpm").isNotNull &&
      eventTime.isNotNull &&
      j.getField("heart_rate_bpm") > lit(0L)
    when(ok, struct(
      j.getField("patient_id").as("patient_id"),
      j.getField("heart_rate_bpm").as("heart_rate_bpm"),
      eventTime.as("event_time")))
  }

  /** parse_event with the specialized fast path: identical semantics
    * (the strict [[FastEventParse]] yields null for anything outside
    * its profile and the general parser takes over via lazy
    * coalesce), ~10× faster on well-formed traffic.
    */
  def parseEventFast(raw: Column): Column =
    coalesce(FastEventParse.fastParseEvent(raw), parseEvent(raw))

  /** classify_window: avg heart rate → alert label. */
  def classifyWindow(avgHr: Column): Column =
    when(avgHr > lit(100.0), "tachycardia")
      .when(avgHr < lit(50.0), "bradycardia")
      .otherwise("normal")
}
