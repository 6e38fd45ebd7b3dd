package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-space clustering for corpus curation (the SemDeDup
  * family: cluster the corpus, then prune semantic duplicates WITHIN
  * clusters — the trick that turns O(n²) semantic dedup into
  * O(Σ cellᵢ²) with cells sized to taste).
  */
object Clustering {

  /** k-means geometry: up to [[KmeansK]] cells (capped — the
    * MaxCentroids/MaxQueries bounding discipline, so the model
    * footprint on the driver stays K×dim doubles, broadcast-dimension
    * class), [[KmeansIters]] Lloyd rounds. The actual K comes from
    * [[autoK]]: ≈ n/[[TargetCell]] vectors per cell — cells must hold
    * enough neighbors that near-dup pairs land together (a cell of ~2
    * vectors separates almost every pair), but few enough that the
    * within-cell quadratic term stays cheap. A production run raises
    * the cap with available memory; the shape is unchanged.
    */
  val KmeansK = 32
  val KmeansIters = 2
  val TargetCell = 8

  /** Cell count for a corpus of n vectors: n/[[TargetCell]] within
    * [2, [[KmeansK]]]. Deterministic in n, so the operator stays
    * reproducible at every SF.
    */
  def autoK(n: Long): Int =
    math.max(2L, math.min(KmeansK.toLong, n / TargetCell)).toInt

  /** Same near-dup threshold as dedup_embedding, so the two
    * operators' outputs are directly comparable (asserted in
    * ClusteringSpec).
    */
  val SemThreshold = 0.4

  /** Deterministic Lloyd k-means over an embedding frame
    * ((vec_id, v: array<double>), nulls already dropped).
    *
    * Deterministic at ANY parallelism: init is the first K vectors by
    * vec_id (bounded TakeOrdered); assignment is the map-side
    * [[graft.functions.NearestCentroids]] expression (cosine, ties to
    * the lower centroid id); and the per-cell means accumulate in
    * exact DECIMAL(28,18) — decimal addition is associative and
    * commutative where double addition is not, so the means (and
    * every downstream assignment) are bit-identical however Spark
    * partitions the corpus (asserted under repartition in
    * ClusteringSpec). Per round the driver sees K×dim aggregated
    * rows — model-sized, never corpus-sized.
    *
    * Empty cells keep their previous centroid (the standard Lloyd
    * convention that avoids dead-centroid NaNs).
    */
  private[graft] def kmeansCentroids(
      emb: DataFrame, k: Int, iters: Int): (Seq[Long], Seq[Seq[Double]]) = {
    val init = emb.orderBy(col("vec_id")).limit(k)
      .select(col("v")).collect().map(_.getSeq[Double](0)).toSeq
    (init.indices.map(_.toLong), kmeansRefine(emb, init, iters))
  }

  /** The Lloyd loop of [[kmeansCentroids]] from a CALLER-SUPPLIED
    * init (same determinism guarantees) — lets a quantizer refine an
    * existing centroid set (ann_ivf's trained flag refines its stride
    * sample in place, keeping the cell count identical so the recall
    * comparison isolates training, not geometry).
    */
  private[graft] def kmeansRefine(
      emb: DataFrame, init: Seq[Seq[Double]], iters: Int): Seq[Seq[Double]] = {
    val ids: Seq[Long] = init.indices.map(_.toLong)
    var cvecs: Seq[Seq[Double]] = init
    for (_ <- 0 until iters) {
      val sums = emb
        .withColumn("cid", element_at(nearestCentroids(col("v"), ids, cvecs, 1), 1))
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("x").cast("decimal(28,18)")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cvecs.map(_.toArray).toArray
      sums.groupBy(_.getLong(0)).foreach { case (cid, rows) =>
        val dim = rows.map(_.getInt(1)).max + 1
        val mean = new Array[Double](dim)
        rows.foreach { r =>
          mean(r.getInt(1)) = r.getDecimal(2).doubleValue() / r.getLong(3)
        }
        next(cid.toInt) = mean
      }
      cvecs = next.map(_.toSeq).toSeq
    }
    cvecs
  }

  /** semdedup — SemDeDup-style semantic deduplication: k-means the
    * embedding space, then within each cell drop every vector that
    * has a higher-similarity (cosine ≥ [[SemThreshold]]) partner
    * with a LOWER vec_id in the same cell. Output is one row per
    * vector: its cell and its keep flag — the keep-list a curation
    * pipeline feeds the tokenizer.
    *
    * Scale shape: assignment is a map-side expression (no shuffle);
    * the pairwise pass joins each cell with itself — one shuffle
    * keyed by cell, work Σ cellᵢ², the quantity K exists to control.
    * Exactly the published SemDeDup economics: pay a clustering pass
    * to make the quadratic term local. Rows-only (k-means cell
    * boundaries make it approximate vs the exact all-pairs operator;
    * the containment + recall relation to dedup_embedding is asserted
    * in ClusteringSpec).
    */
  def semdedup(spark: SparkSession, dir: String): DataFrame =
    semdedupOn(Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))

  private[graft] def semdedupOn(embIn: DataFrame): DataFrame = {
    val emb = embIn.filter(col("v").isNotNull)
    // one metadata-sized count sizes the cell grid (dedup_embedding's
    // autoBlocks pattern)
    val (ids, cvecs) = kmeansCentroids(emb, autoK(emb.count()), KmeansIters)
    val cells = emb.withColumn("cluster_id",
      element_at(nearestCentroids(col("v"), ids, cvecs, 1), 1))
    // same rounding as dedup_embedding so thresholds bite identically
    val dupped = cells.as("a").join(cells.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(cosineSim(col("a.v"), col("b.v")), 4))
      .filter(col("cos") >= SemThreshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    cells.join(dupped.withColumn("dup", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id"),
        (coalesce(col("dup"), lit(0L)) === 0).cast("long").as("keep"))
      .orderBy(col("vec_id"))
  }
}
