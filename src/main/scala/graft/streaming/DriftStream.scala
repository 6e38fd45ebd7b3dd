package graft.streaming

import graft.operators.Quality
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming distribution-drift card — the batch drift_check
  * crossing the lambda split (the curateGated/curateStrict
  * convention): the REFERENCE distribution trains in batch from the
  * operator's own feature expressions ([[Quality.featurePairs]] —
  * shared code, stream and batch cannot bucket differently) and
  * rides into the stream as a literal; each event-time window then
  * emits one row per feature with its observed doc count and the
  * integer chi-square drift statistic against the baseline.
  *
  * The per-window histogram is held as the engine's own Misra-Gries
  * summary ([[graft.functions.MisraGriesAgg]], the freq_words
  * pattern): capacity above the bucket space makes the sketch
  * EXACT while the state store holds one kilobyte-bounded buffer
  * per (window, feature) group at any ingest rate — the same
  * reason the quantile cards stream (ingestCard). ONE stateful
  * aggregation, append mode, watermark-gated emission; the
  * chi-square folds IN-ROW over the ≤ bucket-space survivors
  * against the baseline literal. Novel buckets — a language the
  * baseline never saw — take expected 0 (the batch convention), so
  * their contribution is obs²·10⁶ and drift on unseen content is
  * the loudest signal. All integer/DECIMAL(38) lattice arithmetic.
  */
object DriftStream {

  /** Sketch capacity: far above any real bucket space (|langs| +
    * the 10 length deciles), so the summary is exact.
    */
  val HistCapacity = 64

  /** Per-feature baseline proportions (ppm), trained in batch. */
  final case class DriftBaseline(ppm: Seq[(String, String, Long)])

  /** Train the reference distribution from a batch corpus: per
    * (feature, bucket), its ppm share of the feature's docs — the
    * bucket spaces are fixed and tiny, so this card is
    * metadata-sized by nature (the mix_budget collect class).
    */
  def trainBaseline(docs: DataFrame): DriftBaseline = {
    val counts = docs.select(Quality.featurePairs.as("f"))
      .groupBy(col("f.feature").as("feature"), col("f.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val totals = counts.groupBy(_._1).map { case (f, rs) => f -> rs.map(_._3).sum }
    DriftBaseline(counts.map { case (f, b, c) =>
      (f, b, (BigInt(c) * 1000000 / math.max(1L, totals(f))).toLong)
    }.sortBy(e => (e._1, e._2)).toSeq)
  }

  /** The per-window drift card over a streaming (text, lang,
    * event_ts) frame: one row per (window, feature) with the doc
    * count and chi2_ppm vs the baseline. Works unchanged on a batch
    * frame (the spec's reference path).
    */
  def driftCard(docs: DataFrame, base: DriftBaseline,
      watermark: String = "10 minutes", windowLen: String = "1 minute"): DataFrame = {
    val withWm =
      if (docs.isStreaming) docs.withWatermark("event_ts", watermark) else docs
    withWm
      .select(col("event_ts"), Quality.featurePairs.as("f"))
      .groupBy(window(col("event_ts"), windowLen), col("f.feature").as("feature"))
      .agg(graft.functions.MisraGriesAgg
        .frequentTerms(col("f.bucket"), HistCapacity).as("hist"))
      .withColumn("bl", typedLit(base.ppm))
      .withColumn("n_docs", expr("aggregate(hist, 0L, (a, x) -> a + x.est)"))
      .withColumn("bl_f", expr("filter(bl, e -> e._1 = feature)"))
      // baseline buckets: (obs − exp)²·10⁶ div max(exp, 1) with
      // exp = ppm·n div 10⁶; DECIMAL(38) accumulator (obs can be a
      // window's whole doc count — diff²·10⁶ outgrows a long)
      .withColumn("chi2_base", expr(
        """CAST(aggregate(bl_f, CAST(0 AS DECIMAL(38,0)), (a, e) ->
          |  a + ((CAST(coalesce(get(filter(hist, x -> x.term = e._2), 0).est, 0L)
          |          AS DECIMAL(38,0)) - (e._3 * n_docs) div 1000000)
          |       * (CAST(coalesce(get(filter(hist, x -> x.term = e._2), 0).est, 0L)
          |          AS DECIMAL(38,0)) - (e._3 * n_docs) div 1000000)
          |       * 1000000)
          |      div greatest(CAST((e._3 * n_docs) div 1000000 AS DECIMAL(38,0)), 1)
          |) AS BIGINT)""".stripMargin))
      // novel buckets (not in the baseline): expected 0 → obs²·10⁶
      .withColumn("chi2_novel", expr(
        """CAST(aggregate(
          |  filter(hist, x -> NOT exists(bl_f, e -> e._2 = x.term)),
          |  CAST(0 AS DECIMAL(38,0)),
          |  (a, x) -> a + CAST(x.est AS DECIMAL(38,0)) * x.est * 1000000) AS BIGINT)""".stripMargin))
      .select(col("window.start").as("window_start"), col("feature"),
        col("n_docs"), (col("chi2_base") + col("chi2_novel")).as("chi2_ppm"))
  }
}
