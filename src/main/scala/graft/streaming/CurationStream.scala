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
  * admits and normalizes, batch periodically re-curates.
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
}
