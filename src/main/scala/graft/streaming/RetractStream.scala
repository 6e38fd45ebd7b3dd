package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming CHANGELOG view maintenance — the stream-side sibling of
  * [[graft.operators.Warehouse.viewRetract]]: a CDC-shaped stream of
  * order events (op = I insert / D delete) maintains the `revenue per
  * (priority, order year)` view continuously.
  *
  *  - COUNT and SUM are invertible: deletes contribute SIGNED terms
  *    (−1, −cents) to plain built-in streaming aggregates — no custom
  *    state at all, map-side combinable, the state store holds one
  *    row per group.
  *  - MAX is not invertible, and a stream has no base table to
  *    rescan when the max-carrier is deleted (the batch operator's
  *    answer). Instead the group state holds
  *    [[graft.functions.RetractMaxAgg]] — a bounded sketch of the
  *    `MaxSketchCapacity` largest distinct values with signed
  *    counts. Below capacity the result is EXACT and merge-order
  *    free (stream ≡ batch bit-for-bit, RetractStreamSpec); past it
  *    the sketch degrades to a declared stale upper bound
  *    (max_exact = false), the signal a deployment uses to re-seed
  *    that group from storage.
  *
  * Groups whose count reaches zero are filtered out of the emitted
  * view (fully-retracted groups disappear, matching the batch
  * operator). Works unchanged on a batch frame — the spec's
  * equivalence oracle.
  *
  * Scale shape: one streaming aggregation keyed by (priority, year);
  * state per group is one row + one ≤ capacity-entry sketch,
  * independent of ingest volume; everything before the shuffle is a
  * stateless projection.
  */
object RetractStream {

  /** Distinct-value capacity of the per-group max sketch. */
  val MaxSketchCapacity = 64

  /** The maintained view over a changelog of
    * (o_orderkey, o_orderpriority, o_totalprice, o_orderdate, op).
    */
  def retractView(events: DataFrame): DataFrame = {
    val sign = when(col("op") === "D", lit(-1L)).otherwise(lit(1L))
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    events
      .select(col("o_orderpriority"),
        year(col("o_orderdate")).cast("long").as("oyear"),
        cents.as("cents"), sign.as("s"))
      .groupBy(col("o_orderpriority"), col("oyear"))
      .agg(sum(col("s")).as("n_orders"),
        sum(col("s") * col("cents")).as("total_cents"),
        graft.functions.RetractMaxAgg
          .retractMax(col("cents"), col("s"), MaxSketchCapacity).as("mxs"))
      .filter(col("n_orders") > 0)
      .select(col("o_orderpriority"), col("oyear"),
        col("n_orders"), col("total_cents"),
        col("mxs.mx").as("max_cents"), col("mxs.exact").as("max_exact"),
        expr("total_cents div n_orders").as("avg_cents"))
  }
}
