package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest curation — the batch curation chain's front half
  * applied as documents ARRIVE (the shape of a crawl-ingest service):
  * quality gate and fingerprinting are the batch operators' own
  * column expressions (identical semantics, same codegen), and
  * admission is exactly-once per CONTENT via
  * `dropDuplicatesWithinWatermark` on the content fingerprint — a
  * re-crawled page admitted once, state bounded by the watermark
  * horizon instead of growing with the corpus.
  *
  * The heavy corpus-statistics stages (decontamination df, mixture
  * rates, packing) stay batch — they need corpus totals a stream
  * doesn't have yet; this is the standard lambda split: stream
  * admits and normalizes, batch periodically re-curates. The CCNet
  * perplexity filter crosses the split via [[curateGated]]: its
  * corpus statistics (bigram LM + per-language tertiles) train in
  * batch and ride into the stream as a broadcast-shaped artifact,
  * so the tail third is rejected at the door instead of at the next
  * batch re-curation.
  */
object CurationStream {

  /** Same gate as the batch pipeline ([[graft.operators.Pipeline.MinQuality]]). */
  val MinQuality: Double = graft.operators.Pipeline.MinQuality

  /** Curate a streaming (doc_id, text, lang, event_ts) frame:
    * score → gate → scrub → fingerprint → watermarked content dedup.
    * Works unchanged on a batch frame minus the dedup-state bound
    * (used by the batch-equivalence spec). The score columns are the
    * batch operator's OWN expressions
    * ([[graft.operators.Text.withQualityScore]]) — shared code, not
    * a re-derivation, so stream and batch cannot drift.
    */
  def curate(docs: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val scored = graft.operators.Text.withQualityScore(docs)
      .filter(col("score") >= MinQuality)
      .withColumn("fingerprint", md5(col("norm")))
      .select(col("doc_id"), col("event_ts"), col("lang"),
        col("score"), col("fingerprint"))
    if (docs.isStreaming)
      scored
        .withWatermark("event_ts", watermark)
        .dropDuplicatesWithinWatermark("fingerprint")
    else scored
  }

  /** [[curate]] plus the Gopher rule gate AT INGEST: the hard
    * admission rules ([[graft.operators.Text.withGopherFlags]] — the
    * batch operator's OWN flag expressions on the quality chain's
    * existing word array, so the stream cannot drift from the batch
    * gopher_quality verdicts) applied before the fingerprint dedup.
    * Everything is map-side column work — no model artifact, no
    * join, no extra state; rejected content never occupies dedup
    * state. The per-rule flags ride along in the output so an
    * ingest dashboard can attribute rejections to rules live.
    */
  def curateStrict(docs: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val flagged = graft.operators.Text.withGopherFlags(
        graft.operators.Text.withQualityScore(docs))
      .filter(col("score") >= MinQuality && col("keep") === 1)
      .withColumn("fingerprint", md5(col("norm")))
      .select(col("doc_id"), col("event_ts"), col("lang"), col("score"),
        col("r_words"), col("r_wordlen"), col("r_rep"), col("r_stop"),
        col("r_alpha"), col("fingerprint"))
    if (docs.isStreaming)
      flagged
        .withWatermark("event_ts", watermark)
        .dropDuplicatesWithinWatermark("fingerprint")
    else flagged
  }

  /** Ingest drift monitor: per-(event-time window, language) doc
    * counts and length-quantile cards over the arriving corpus — the
    * dataset-card statistics ([[graft.operators.Curation
    * .quantileCardOn]]) computed LIVE, so a crawl whose p99 document
    * length suddenly doubles (boilerplate regression, markup leak)
    * shows up within a window instead of at the next batch re-card.
    * The quantile column is the mergeable log-histogram sketch
    * ([[graft.functions.QuantileSketchAgg]]): its kilobyte buffers
    * are what the streaming STATE STORE holds per (window, lang) and
    * merges across micro-batches — a per-group sort would be
    * impossible in a stream, which is exactly why the sketch family
    * exists. Works unchanged on a batch frame (the spec's
    * equivalence oracle).
    */
  def ingestCard(docs: DataFrame, windowLen: String = "1 minute",
      watermark: String = "10 minutes"): DataFrame = {
    import graft.functions.QuantileSketchAgg.quantileSketch
    val base =
      if (docs.isStreaming) docs.withWatermark("event_ts", watermark) else docs
    base
      .groupBy(window(col("event_ts"), windowLen).as("win"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        quantileSketch(length(col("text")).cast("long"), Seq(50, 90, 99)).as("qs"))
      .select(col("win.start").as("win_start"), col("lang"), col("n_docs"),
        col("qs").getItem(0).as("len_p50"),
        col("qs").getItem(1).as("len_p90"),
        col("qs").getItem(2).as("len_p99"))
  }

  /** Batch-trained perplexity-admission artifacts for
    * [[curateGated]]: the raw bigram model (c2/c1/V) the map-side
    * scorer needs, and the per-language CCNet tail thresholds. Train
    * on a curated batch corpus with [[trainPerplexityGate]]; ship
    * the value to the ingest job (it is plain serializable data —
    * the LM-file shape).
    */
  final case class PerplexityGate(
      c2: Map[(String, String), Long],
      c1: Map[String, Long],
      vocab: Long,
      tailThresholds: Seq[(String, Long)])

  /** Train the admission gate on a batch (doc_id, text, lang)
    * corpus: the same bigram LM and per-language tertile order
    * statistics the registered lm_score / ccnet_buckets queries
    * compute (shared code — the gate CANNOT drift from the batch
    * split), collected to driver-side maps PRUNED to `modelCap`
    * entries each (count-ordered, deterministic — see
    * [[graft.operators.LangModel.perplexityGateData]] for the size
    * law: the collect is ≤ 2·modelCap + |langs| rows at any corpus
    * scale, the CCNet pruned-model-file shape). The periodic lambda
    * re-train is the caller's schedule.
    */
  def trainPerplexityGate(docs: DataFrame,
      modelCap: Int = graft.operators.LangModel.GateModelCap): PerplexityGate = {
    val (c2, c1, vocab, th) =
      graft.operators.LangModel.perplexityGateData(docs, modelCap)
    PerplexityGate(c2, c1, vocab, th)
  }

  /** [[curate]] plus the CCNet perplexity gate AT INGEST (the round-6
    * verdict's lambda-split extension): each arriving doc is scored
    * map-side by the batch-trained bigram LM
    * ([[graft.functions.LmPpmKernel]] — no join, no shuffle, no
    * state) and rejected when its language has a trained threshold
    * and the score falls in the TAIL third (the slice batch
    * ccnet_buckets labels 'tail'). Unmodeled languages and
    * sub-2-word docs pass through — the decontaminate convention:
    * what cannot be measured is not dropped. Exactly-once content
    * admission is unchanged (same watermarked fingerprint dedup,
    * AFTER the gate so rejected content never occupies state).
    */
  def curateGated(docs: DataFrame, gate: PerplexityGate,
      watermark: String = "10 minutes"): DataFrame = {
    import docs.sparkSession.implicits._
    val th = gate.tailThresholds.toDF("lang", "t2")
    val scored = graft.operators.Text.withQualityScore(docs)
      .filter(col("score") >= MinQuality)
      .withColumn("lm_ppm",
        graft.functions.LmPpmKernel.lmPpm(col("w"), gate.c2, gate.c1, gate.vocab))
      .withColumn("fingerprint", md5(col("norm")))
    val gated = scored
      .join(broadcast(th), Seq("lang"), "left_outer")
      .filter(col("t2").isNull || col("lm_ppm").isNull ||
        col("lm_ppm") >= col("t2"))
      .select(col("doc_id"), col("event_ts"), col("lang"),
        col("score"), col("lm_ppm"), col("fingerprint"))
    if (docs.isStreaming)
      gated
        .withWatermark("event_ts", watermark)
        .dropDuplicatesWithinWatermark("fingerprint")
    else gated
  }
}
