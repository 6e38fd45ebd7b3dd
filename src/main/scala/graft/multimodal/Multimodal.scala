package graft.multimodal

import graft.Tables
import graft.functions.TextFunctions.{hash60, normalize}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque binary payload + typed metadata — the
  * column shape a multimodal training pipeline carries for
  * image/audio/video.
  */
final case class MediaItem(
    doc_id: Long,
    payload: Array[Byte],
    mime: String,
    n_bytes: Long)

/** Deterministic stand-in for decoded media features. */
final case class MediaFeatures(
    doc_id: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    feature: Array[Float])

/** Multimodal column plumbing (SURVEY §2 #33-34).
  *
  * Real decode libraries are unavailable in this environment, so the
  * decode kernel is a clearly-marked deterministic STUB — but the
  * Spark-side shape is the real thing: binary payload column, typed
  * metadata, and batch decode via `mapPartitions` (one decoder init
  * per partition, streaming iterator, no per-row setup — the same
  * plumbing a JNI/FFI decoder needs at 100 TB).
  */
object Multimodal {

  /** documents → media table: payload is the utf-8 text bytes (the
    * stand-in for image/audio bytes), metadata typed alongside.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      concat(lit("application/x-graft-"), col("source")).as("mime"),
      octet_length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"))

  /** STUB decode: derives fake-but-deterministic dimensions and an
    * 8-d feature vector from the payload bytes. A real deployment
    * replaces ONLY this function body with the codec call; the
    * partition-batched pipeline around it is unchanged.
    */
  def decodeStub(item: MediaItem): MediaFeatures = {
    var h = 1125899906842597L // deterministic FNV-ish rolling hash
    var i = 0
    while (i < item.payload.length) { h = h * 31 + (item.payload(i) & 0xff); i += 1 }
    val pos = h & Long.MaxValue
    MediaFeatures(
      doc_id = item.doc_id,
      width = (pos % 640).toInt + 1,
      height = ((pos / 640) % 480).toInt + 1,
      n_frames = (item.n_bytes % 32).toInt + 1,
      feature = Array.tabulate(8)(j => (((pos >> (j * 7)) & 0x7f).toFloat / 127f)))
  }

  /** Batch decode: mapPartitions so decoder initialization happens
    * once per partition (the expensive part with real codecs), rows
    * stream through an iterator (no materialization).
    */
  def decodeAll(media: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: init codec context here, close on iterator end
      it.map(decodeStub)
    }
  }

  /** mm_meta — the oracle-checkable metadata slice: byte lengths,
    * content hash, and hash-derived stub dimensions (pure arithmetic
    * on the 60-bit text hash so an external engine can reproduce it).
    */
  def mmMeta(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    docs
      .withColumn("payload", encode(col("text"), "utf-8"))
      .withColumn("fp60", hash60(normalize(col("text"))))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("text")).as("content_md5"),
        (col("fp60") % 640 + 1).as("stub_width"),
        // integer div — a double-typed `/` would lose precision on 60-bit values
        (expr("fp60 div 640") % 480 + 1).as("stub_height"))
      .orderBy(col("doc_id"))
  }
}
