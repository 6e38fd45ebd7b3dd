package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation pack (SURVEY §2 #35-38): the document-
  * shaping operators between raw corpus and training shards —
  * chunking, PII scrubbing, term scoring, stratified sampling. All
  * pure column expressions (codegen, no UDFs), all oracle-checked.
  */
object Curation {

  val ChunkWords = 100
  val ChunkStride = 80 // 20-word overlap between consecutive chunks

  /** doc_chunk — split each document into fixed-size word windows
    * with overlap (context-window packing for training). Chunk i
    * covers words [i·stride, i·stride + size); starts advance while
    * they're inside the doc, so every word lands in ≥1 chunk and
    * interior words in 2. Pure integer arithmetic + array slicing —
    * a map-side explode, no shuffle before the output sort; at
    * 100 TB this pipelines inside the scan stage.
    */
  def docChunk(spark: SparkSession, dir: String): DataFrame =
    docChunkOn(Tables(spark, dir).documents)

  /** Same chunking over any (doc_id, text) DataFrame. */
  def docChunkOn(docs: DataFrame): DataFrame = {
    val start = col("chunk_id") * ChunkStride + 1 // slice() is 1-based
    docs.withColumn("w", words(col("text")))
      .withColumn("chunk_id",
        explode(sequence(lit(0L),
          floor((size(col("w")) + lit(ChunkStride - 1)) / lit(ChunkStride)).cast("long") - 1)))
      .select(
        col("doc_id"), col("chunk_id"),
        size(slice(col("w"), start, lit(ChunkWords))).cast("long").as("n_chunk_words"),
        concat_ws(" ", slice(col("w"), start, lit(ChunkWords))).as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val PackBudget = 256 // words per training sequence

  /** seq_pack — sequence packing: assign chunks to fixed-budget
    * training sequences by contiguous fill in canonical (doc_id,
    * chunk_id) order — pack p holds the chunks whose running word
    * total lands in (p·budget, (p+1)·budget]. One window over a
    * single global ordering; deterministic, and the pack id doubles
    * as the shard key for the training-shard write. (True first-fit
    * bin packing is inherently sequential; contiguous fill is the
    * standard distributed approximation — waste is bounded by the
    * max chunk size per boundary and the fill factor is reported per
    * pack.) At 100 TB the single global window would serialize;
    * partition the running sum by shard (e.g. doc_id div N) and the
    * same plan runs embarrassingly parallel — the global form is
    * registered because the oracle's window must see the identical
    * total order.
    */
  def seqPack(spark: SparkSession, dir: String): DataFrame = {
    val chunks = docChunk(spark, dir)
      .select(col("doc_id"), col("chunk_id"), col("n_chunk_words"))
    val order = Window.orderBy(col("doc_id"), col("chunk_id"))
    val packed = chunks
      .withColumn("cum", sum(col("n_chunk_words"))
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // ceil(cum/budget) - 1: the pack whose (p+1)·budget the running
      // total first fits under; pure integer arithmetic both engines
      .withColumn("pack_id", ceil(col("cum").cast("double") / PackBudget).cast("long") - 1)
    packed.groupBy(col("pack_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_words")).as("n_words"),
        min(concat_ws("#", col("doc_id"), col("chunk_id"))).as("first_chunk"))
      .orderBy(col("pack_id"))
  }

  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "\\d{3}-\\d{3}-\\d{4}"

  /** pii_scrub — regex redaction of emails and phone numbers with
    * per-document counts. The synthetic corpus contains no PII, so
    * every 7th document gets a deterministic injected email+phone
    * prefix INSIDE the query (the same fixture pattern as hr_parse's
    * 1-in-13 corruption) — the scrub then provably removes it. Both
    * patterns are RE2-safe (no backtracking constructs) so Spark's
    * Java regex and DuckDB's RE2 agree; at scale this is a pure
    * map-side pass, regex-bound like quality_score.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val aug = when(col("doc_id") % 7 === 0,
      concat(lit("contact user"), col("doc_id").cast("string"), lit("@example.com or 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-0199 "), col("text")))
      .otherwise(col("text"))
    docs.withColumn("aug", aug)
      .select(
        col("doc_id"),
        regexp_count(col("aug"), lit(EmailPat)).cast("long").as("n_emails"),
        regexp_count(col("aug"), lit(PhonePat)).cast("long").as("n_phones"),
        regexp_replace(regexp_replace(col("aug"), EmailPat, "[EMAIL]"),
          PhonePat, "[PHONE]").as("scrubbed"))
      .orderBy(col("doc_id"))
  }

  /** tfidf — top-5 distinguishing terms per document. Rarity weight
    * is integer-exact: score_ppm = tf·10⁶ div df (floor division on
    * both engines — same ranking as tf·idf without cross-engine
    * float log drift). Two shuffles (per-doc tf, per-term df) then a
    * broadcast-size join of df back onto tf at any corpus size where
    * the vocabulary ≪ corpus; top-5 via one windowed rank over the
    * doc-keyed partial.
    */
  def tfidf(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val docs = Tables(spark, dir).documents
    val terms = docs.withColumn("word", explode(words(col("text"))))
      .filter(col("word") =!= "")
    val tf = terms.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = terms.groupBy(col("word"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_ppm").desc, col("word"))
    tf.join(df, "word")
      .withColumn("score_ppm", expr("tf * 1000000 div df"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("word"), col("tf"), col("df"), col("score_ppm"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Per-language keep rates (ppm): downsample the dominant language
    * toward a balanced corpus. Literal spec so both engines see the
    * same CASE.
    */
  val SampleRatesPpm: Seq[(String, Long)] =
    Seq("en" -> 150000L, "zh" -> 500000L, "es" -> 500000L, "de" -> 500000L, "fr" -> 500000L)

  /** sample_stratified — deterministic hash sampling with per-stratum
    * rates: keep a document iff its seeded 60-bit content-independent
    * hash mod 10⁶ falls under its language's rate. Reproducible on
    * any engine (md5-derived hash, no rand()), map-side only, and at
    * 100 TB the sample decision needs no shuffle at all — it's a
    * scan-level filter.
    */
  /** sample_quota — exact per-stratum quotas: exactly K documents
    * per language (or all of a smaller stratum), selected by seeded
    * hash order so the draw is uniform, deterministic, and stable
    * under corpus growth in expectation. Runs on the engine's own
    * [[graft.plans.TopKPerKey]] operator — bounded per-key heaps,
    * one shuffle on lang, NO per-stratum sort — so the quota draw
    * costs the same as any grouped aggregation at 100 TB. Oracle:
    * row_number over the same hash order.
    */
  def sampleQuota(spark: SparkSession, dir: String, k: Int = 40): DataFrame = {
    val docs = Tables(spark, dir).documents
      .withColumn("bucket",
        pmod(hash60(concat(lit("quota:"), col("doc_id").cast("string"))), lit(1000000L)))
      .select(col("doc_id"), col("lang"), col("bucket"))
    graft.plans.TopK.topKPerKey(docs,
        keys = Seq(col("lang")),
        order = Seq(col("bucket").asc, col("doc_id").asc), k = k)
      .orderBy(col("lang"), col("bucket"), col("doc_id"))
  }

  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val bucket = pmod(hash60(concat(lit("smpl:"), col("doc_id").cast("string"))), lit(1000000L))
    val rate = SampleRatesPpm.foldLeft(lit(0L)) { case (acc, (lang, ppm)) =>
      when(col("lang") === lang, lit(ppm)).otherwise(acc)
    }
    docs.withColumn("bucket", bucket)
      .filter(col("bucket") < rate)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))
  }
}
