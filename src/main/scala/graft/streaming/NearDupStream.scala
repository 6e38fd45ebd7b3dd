package graft.streaming

import java.sql.Timestamp

import graft.functions.SimHashKernel
import graft.functions.TextFunctions.words
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One band observation: a document's signature filed under one of
  * its [[graft.operators.Dedup.Blocks]] pigeonhole bucket keys.
  */
final case class BandObs(
    bucket: Long, doc_id: Long, simhash: Long, event_ts: Timestamp)

/** Per-band verdict: did THIS bucket hold an earlier signature
  * within the hamming radius when the document arrived?
  */
final case class BandVerdict(
    doc_id: Long, simhash: Long, event_ts: Timestamp, prior_dup: Boolean)

/** Bounded per-bucket signature memory (parallel id/sig lists,
  * newest last; Seq fields so the Encoder derives cleanly).
  */
final case class BucketSigs(docIds: Seq[Long], sigs: Seq[Long])

/** Streaming SimHash near-duplicate detection — the near-dup
  * complement of the exact streaming dedup
  * (dropDuplicatesWithinWatermark keys on the exact content
  * fingerprint; a re-crawled page with one changed sentence walks
  * right through it). Batch near-dup is dedup_simhash
  * ([[graft.operators.Dedup.simhashOn]]); this runs the SAME
  * pigeonhole scheme as keyed stream state:
  *
  *  - signatures compute MAP-SIDE inside the scan via
  *    [[graft.functions.SimHashKernel]] (bit-exact with the batch
  *    SimHashAgg — spec-asserted), no explode, no shuffle;
  *  - each doc files under its [[Dedup.Blocks]] 15-bit block keys;
  *    two signatures within hamming ≤ [[MaxHamming]] provably share
  *    ≥ 1 block (pigeonhole), so per-bucket checks have NO false
  *    negatives across buckets;
  *  - `flatMapGroupsWithState` per bucket holds the last
  *    [[BucketCap]] signatures and flags an arrival when any held
  *    signature is within the radius — then a per-doc windowed OR
  *    (append mode, watermark-gated) folds the band verdicts into
  *    one row per document.
  *
  * State is bounded BY CONSTRUCTION, not just by eviction: the key
  * space is Blocks · 2^BlockBits buckets and each holds ≤ BucketCap
  * (id, sig) pairs — ≤ 4·2¹⁵·64 entries ≈ 8M longs worst-case at ANY
  * corpus size, the footprint class of a broadcast dimension. The
  * FIFO cap is the recall tradeoff (a partner older than BucketCap
  * same-bucket arrivals can be missed — the horizon convention of
  * dropDuplicatesWithinWatermark, expressed in arrivals instead of
  * time); the spec's fixture stays under the cap so stream verdicts
  * equal the all-pairs batch reference exactly.
  */
object NearDupStream {

  val MaxHamming = 3
  val BucketCap = 64

  /** simhash column via the map-side kernel (stream-safe: no agg). */
  def withSimhash(docs: DataFrame): DataFrame =
    docs.withColumn("simhash",
      SimHashKernel.simhashKernel(words(col("text")), Dedup.SimBits))

  /** Per-band verdict stream: input (doc_id, text, event_ts), output
    * one row per (doc, band) with the bucket's prior-dup flag.
    * Exposed for callers that fold verdicts themselves (foreachBatch
    * sinks); [[nearDupFlags]] is the one-row-per-doc form.
    */
  def bandVerdicts(docs: DataFrame, watermark: String = "10 minutes"): Dataset[BandVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bandCols = (0 until Dedup.Blocks).map { j =>
      // bucket id = block index * 2^BlockBits + block slice
      lit(j.toLong << Dedup.BlockBits).bitwiseOR(
        shiftright(col("simhash"), j * Dedup.BlockBits)
          .bitwiseAND((1L << Dedup.BlockBits) - 1)).cast("long")
    }
    val banded = withSimhash(docs)
      .withWatermark("event_ts", watermark)
      .select(explode(array(bandCols: _*)).as("bucket"),
        col("doc_id"), col("simhash"), col("event_ts"))
      .as[BandObs]
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(checkBucket)
  }

  /** One row per document: (doc_id, simhash, event_ts window, is_near_dup).
    * The per-doc OR is a watermark-gated windowed aggregation chained
    * AFTER the stateful band check (append mode end to end) — rows
    * emit once the watermark passes their window.
    */
  def nearDupFlags(docs: DataFrame, watermark: String = "10 minutes",
      window: String = "1 minute"): DataFrame =
    bandVerdicts(docs, watermark).toDF()
      .withWatermark("event_ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("event_ts"), window),
        col("doc_id"), col("simhash"))
      .agg(max(when(col("prior_dup"), 1L).otherwise(0L)).as("is_near_dup"))
      .select(col("window.start").as("window_start"), col("doc_id"),
        col("simhash"), col("is_near_dup"))

  /** The per-bucket state transition. Arrivals in one micro-batch
    * process in (event_ts, doc_id) order — deterministic at any
    * parallelism; "prior" = held state plus earlier arrivals of the
    * same batch, exactly the earlier-doc convention of the batch
    * reference.
    */
  private[graft] def checkBucket(bucket: Long, rows: Iterator[BandObs],
      state: GroupState[BucketSigs]): Iterator[BandVerdict] = {
    val arrivals = rows.toSeq.sortBy(o => (o.event_ts.getTime, o.doc_id))
    var ids = state.getOption.map(_.docIds.toVector).getOrElse(Vector.empty)
    var sigs = state.getOption.map(_.sigs.toVector).getOrElse(Vector.empty)
    val out = Vector.newBuilder[BandVerdict]
    for (o <- arrivals) {
      var dup = false
      var i = 0
      while (!dup && i < sigs.length) {
        dup = ids(i) != o.doc_id &&
          java.lang.Long.bitCount(sigs(i) ^ o.simhash) <= MaxHamming
        i += 1
      }
      out += BandVerdict(o.doc_id, o.simhash, o.event_ts, dup)
      ids :+= o.doc_id
      sigs :+= o.simhash
      if (sigs.length > BucketCap) { // FIFO horizon
        ids = ids.drop(ids.length - BucketCap)
        sigs = sigs.drop(sigs.length - BucketCap)
      }
    }
    state.update(BucketSigs(ids, sigs))
    out.result().iterator
  }
}
