package graft.plans

import graft.Materialize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-key row_number WITHOUT a corpus-sized per-key window
  * partition — the generalized form of the two-level prefix-sum
  * family (seq_pack's sharded running sum, shard_balance's
  * segment-spliced round-robin, exact_pctl's segmented cumulative
  * counts), for the remaining case those don't cover: a rank whose
  * ORDER is a data column, under a partition key whose cardinality
  * is semantic rather than scalable. `Window.partitionBy(key)` puts
  * corpus/|keys| rows on single tasks when |keys| is bounded (the
  * shard_balance bounded-key hazard); this splits each key's value
  * range into [[Segments]] order-contiguous segments, folds
  * per-(key, segment) totals into exclusive offsets via a window
  * over ≤ Segments rows per key (bounded by the CONSTANT, not the
  * corpus), and computes rank = offset + local row_number within
  * (key, segment). Bit-identical to the single-window form at any
  * parallelism — asserted per consumer (proto_prune's serial twin,
  * q41's DuckDB native-rank oracle).
  */
object TwoLevelRank {

  /** Order-contiguous value segments per key (the exact_pctl
    * segmentation constant class).
    */
  val Segments = 64L

  /** Appends `out` = the 1-based rank of each row within its `keys`
    * group under (`value` asc|desc, `ties` asc...) — the row_number
    * contract; `value` must be LONG and (value, ties) a total order
    * within each key group.
    *
    * The input materializes once for its two consumers (range pass,
    * rank pass). The ranges/offsets join sides hold ≤
    * |keys| · ([[Segments]]+1) rows — metadata under every caller's
    * key contract (a handful of priority classes, a clustering's
    * label artifact); a caller with genuinely unbounded keys swaps
    * the broadcasts for plain equi-joins without touching the rank
    * math. Degenerate value clustering (a key whose values all land
    * in one 1/64th of its range) degrades toward the single-window
    * form for that key only — same caveat and sampled-boundary swap
    * as exact_pctl.
    */
  def rowNumberPerKey(dfIn: DataFrame, keys: Seq[String], value: String,
      descending: Boolean, ties: Seq[String], out: String): DataFrame = {
    val df = Materialize.ensure(dfIn)
    val kc = keys.map(col)
    val ranges = df.groupBy(kc: _*)
      .agg(min(col(value)).as("__tlr_lo"), max(col(value)).as("__tlr_hi"))
      .withColumn("__tlr_span",
        greatest(lit(1L), expr(s"(__tlr_hi - __tlr_lo) div ${Segments}") + lit(1L)))
    val seg = df.join(broadcast(ranges), keys)
      .withColumn("__tlr_seg",
        if (descending) expr(s"(__tlr_hi - $value) div __tlr_span")
        else expr(s"($value - __tlr_lo) div __tlr_span"))
      .drop("__tlr_lo", "__tlr_hi", "__tlr_span")
    val segKeys = keys :+ "__tlr_seg"
    val offs = seg.groupBy(segKeys.map(col): _*)
      .agg(count(lit(1)).as("__tlr_cnt"))
      .withColumn("__tlr_off", coalesce(sum(col("__tlr_cnt")).over(
        Window.partitionBy(kc: _*).orderBy(col("__tlr_seg"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(segKeys.map(col) :+ col("__tlr_off"): _*)
    val ord = (if (descending) col(value).desc else col(value).asc) +:
      ties.map(col(_).asc)
    val w = Window.partitionBy(segKeys.map(col): _*).orderBy(ord: _*)
    seg.join(broadcast(offs), segKeys)
      .withColumn(out, (col("__tlr_off") + row_number().over(w)).cast("long"))
      .drop("__tlr_seg", "__tlr_off")
  }
}
