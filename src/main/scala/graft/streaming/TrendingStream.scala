package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming trending card — per event-time window, the top sources
  * by document count, with the per-window histogram held as the
  * engine's own Misra-Gries summary
  * ([[graft.functions.MisraGriesAgg]], the freq_words / DriftStream
  * pattern): the state store keeps ONE ≤ [[TrendCapacity]]-entry
  * buffer per window at any ingest rate — never a per-(window,
  * source) row explosion — and the summary merges across
  * micro-batches by the mergeable-summaries law. The top
  * [[TrendTopK]] extraction happens IN-ROW (array_sort + slice over
  * the ≤ capacity survivors), because a rank window function over a
  * streaming aggregation is not expressible in append mode — the
  * sketch array being already bounded is exactly what makes the
  * in-row sort legal at scale.
  *
  * Determinism contract (the sketch_cube convention): with
  * [[TrendCapacity]] above the live source vocabulary nothing
  * evicts, the summary IS the exact count table, and stream ≡ batch
  * bit-for-bit (TrendingStreamSpec). Over capacity the MG guarantee
  * applies: any source with > n/(capacity+1) of a window's docs
  * survives with bounded undercount. Works unchanged on a batch
  * frame (the spec's equivalence oracle).
  */
object TrendingStream {

  /** Sketch capacity per window (64 ≫ the source vocabulary of the
    * fixtures; production sizes this to the dashboard's tail
    * tolerance, n/(capacity+1)).
    */
  val TrendCapacity = 64

  /** Rows emitted per window. */
  val TrendTopK = 5

  def trendingCard(docs: DataFrame, windowLen: String = "1 minute",
      watermark: String = "10 minutes"): DataFrame = {
    val base =
      if (docs.isStreaming) docs.withWatermark("event_ts", watermark) else docs
    base
      .filter(col("source").isNotNull)
      .groupBy(window(col("event_ts"), windowLen))
      .agg(graft.functions.MisraGriesAgg
        .frequentTerms(col("source"), TrendCapacity).as("sk"))
      .select(col("window.start").as("win_start"),
        posexplode(expr(
          s"""slice(array_sort(sk, (l, r) ->
             |  CASE WHEN l.est > r.est THEN -1 WHEN l.est < r.est THEN 1
             |       WHEN l.term < r.term THEN -1 WHEN l.term > r.term THEN 1
             |       ELSE 0 END), 1, $TrendTopK)""".stripMargin)))
      .select(col("win_start"), (col("pos") + 1).cast("long").as("source_rank"),
        col("col.term").as("source"), col("col.est").as("n_docs"))
  }
}
