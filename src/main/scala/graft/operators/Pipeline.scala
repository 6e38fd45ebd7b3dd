package graft.operators

import graft.Materialize.MatOps
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed curation pipeline — the reason the operator pack
  * exists: one query that takes a raw corpus to training shards
  * through quality filtering → exact dedup → benchmark
  * decontamination → mixture sampling → sequence packing, each stage
  * the engine's own operator, each stage's semantics already
  * individually oracle-checked. A user of the engine runs THIS; the
  * per-operator queries are its unit tests.
  */
object Pipeline {

  /** Minimum quality score a document needs to enter training
    * (the quality_score operator's medium/high buckets).
    */
  val MinQuality = 0.3

  /** pipeline_e2e — the full batch curation chain over `documents`,
    * ending in the packed-sequence summary (seq_pack's shape). Every
    * stage consumes the previous stage's SURVIVORS, so corpus-derived
    * statistics (document frequencies for decontamination, language
    * token totals for mixture rates) are computed on what actually
    * remains — the way a production pipeline must, and the part a
    * per-operator test can't show.
    *
    * Scale shape is the union of its stages' shapes, unchanged by
    * composition: quality is map-side; dedup is one uniform-hash
    * shuffle; decontamination one shingle-keyed join; mixture is two
    * metadata aggregations + a scan filter; packing is the sharded
    * two-level prefix sum. Catalyst fuses adjacent map-side stages
    * into the same scan — composition costs no extra passes over the
    * corpus.
    *
    * Oracle: the same five stages as one DuckDB CTE chain (each
    * fragment mirrored from the already-hash-matched per-operator
    * oracles).
    *
    * API note (the r6 advisory): CONSTRUCTING this frame runs Spark
    * jobs — the survivor set is eagerly materialized
    * ([[graft.Materialize.eager]]) because seq_pack's shard-bound
    * metadata actions would otherwise re-execute the whole four-stage
    * chain per action. Callers composing frames they may never
    * execute should not call pipeline operators speculatively; the
    * same applies to every operator documented as materializing
    * (winnow_pairs, chunk_dedup, the dedup family).
    */
  def pipelineE2e(spark: SparkSession, dir: String): DataFrame =
    pipelineE2eOn(Tables(spark, dir).documents)

  private[graft] def pipelineE2eOn(docs: DataFrame): DataFrame = {
    // 1. quality gate: medium/high buckets only (score is the
    //    lattice-shifted rounded double both engines agree on)
    val quality = Text.qualityScoreOn(docs)
      .filter(col("score") >= MinQuality).select(col("doc_id"))
    val s1 = docs.join(quality, "doc_id")

    // 2. exact dedup: keep the min doc_id of every fingerprint group
    val keep = s1
      .groupBy(md5(graft.functions.TextFunctions.normalize(col("text"))).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val s2 = s1.join(keep, "doc_id")

    // 3. decontamination: the benchmark slice (doc_id ≡ 3 mod 17)
    //    never trains, and training docs sharing ≥ 25% of their
    //    shingles with it are dropped; docs too short to shingle
    //    cannot be measured and pass through
    val flags = Text.decontaminateOn(Text.shingleSetOf(s2))
      .select(col("doc_id"), col("contaminated"))
    val s3 = s2.filter(col("doc_id") % 17 =!= 3)
      .join(flags, Seq("doc_id"), "left")
      .filter(coalesce(col("contaminated"), lit(0L)) === 0)
      .drop("contaminated")

    // 4. mixture sampling: rates from the SURVIVING corpus's
    //    per-language token supply
    val sampled = Curation.sampleMixtureOn(s3).select(col("doc_id"))
    // materialize the survivor set: seqPackOn drives two metadata
    // actions (shard bounds, per-shard totals) before the output
    // job, and each would otherwise re-execute the whole four-stage
    // chain — measured 3× the pipeline cost. localCheckpoint, not
    // cache: blocks free with the RDD, no CacheManager pin.
    val s4 = s3.join(sampled, "doc_id").materialized

    // 5. sequence packing over the survivors
    Curation.seqPackOn(s4)
  }
}
