package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming click→purchase attribution: the STREAM-STREAM interval
  * join (SURVEY §2 #7e) — the live twin of the batch as-of/range
  * joins (Temporal.q22/q23). Two unbounded streams join on user
  * within a ± time band; watermarks on BOTH sides bound the join
  * state, which is the whole 100 TB-scale story: without them every
  * click ever seen stays buffered forever. With watermark W and band
  * B, each side retains only ~(W + B) of event-time history per key
  * — constant state per key regardless of stream age (the Spark
  * Structured Streaming stream-stream join design; see also
  * flink_job.py:75-122's bounded-out-of-orderness analog).
  */
object Attribution {

  /** Join window: a click within ± this of a purchase attributes. */
  val BandMs = 300000L

  /** Watermark: how late either stream's events may arrive. */
  val Lateness = "10 seconds"

  /** Inner interval join of two streaming frames, each with columns
    * (user_id, ts, event_id). State on both sides is watermark+band
    * bounded; the time-range predicate is what lets Spark evict.
    */
  def attribute(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", Lateness)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", Lateness)
    p.join(c,
        col("c_user") === col("p_user") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL ${BandMs / 1000} SECONDS") &&
          col("c_ts") <= col("p_ts") + expr(s"INTERVAL ${BandMs / 1000} SECONDS"))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("p_ts"),
        col("click_id"), col("c_ts"),
        (unix_millis(col("c_ts")) - unix_millis(col("p_ts"))).as("gap_ms"))
  }
}
