package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** VectorIngestStream — streaming IVF index ingest (SURVEY §2 52g):
  * the live half of [[graft.operators.SimilaritySearch.annIncremental]].
  * A production vector index does not re-train per arrival; it
  * assigns incoming vectors against a FROZEN coarse quantizer and
  * watches per-cell growth for the re-train/split signal. This
  * topology is that loop as a Structured Streaming query: incoming
  * (vec_id, v) rows route to their nearest frozen centroid MAP-SIDE
  * (the [[graft.functions.NearestCentroids]] expression — the
  * centroid matrix rides the plan, so the streaming stage needs no
  * join), and a streaming aggregation maintains per-cell arrival
  * counts across micro-batches. Downstream, the batch card assembly
  * ([[graft.operators.SimilaritySearch.ivfCardFrom]] — THE shared
  * definition, so stream and batch cannot drift) joins the counts
  * against the frozen snapshot's cell sizes into the
  * growth/rebalance card.
  *
  * Scale shape: assignment is stateless and map-side; the one
  * stateful operator is a cid-keyed count — state is bounded by the
  * CELL COUNT (≤ SimilaritySearch.IvfMaxCells rows), not the stream, so the state
  * store stays metadata-sized forever. Checkpoint recovery resumes
  * the counts, never recounts (VectorIngestSpec drives a two-phase
  * restart).
  */
object VectorIngestStream {

  /** Per-cell arrival counts for a stream of (vec_id, v) rows against
    * frozen centroids. Null vectors drop (they cannot be assigned —
    * the batch operator's rule). Complete-mode sink expected (the
    * count table IS the result; it is cell-bounded).
    */
  def cellCounts(stream: DataFrame, cids: Seq[Long],
      cvecs: Seq[Seq[Double]]): DataFrame =
    stream.filter(col("v").isNotNull)
      .withColumn("cid", element_at(
        graft.functions.VectorFunctions.nearestCentroids(
          col("v"), cids, cvecs, 1), 1))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("new_n"))
}
