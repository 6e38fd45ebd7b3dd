package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once parquet delivery via foreachBatch (SURVEY §2 #7f).
  *
  * Structured Streaming's contract is at-least-once per micro-batch
  * on retry: after a crash between "sink written" and "offsets
  * committed", the SAME batchId is re-delivered. A sink is
  * effectively exactly-once iff re-delivery is a no-op. This sink
  * makes the parquet write idempotent the standard way (the
  * foreachBatch pattern of the Spark docs, and what Delta's
  * txn-version check does internally): one directory per batchId,
  * written once, guarded by a commit marker written AFTER the data —
  * a replayed batch sees the marker and skips.
  *
  * At scale this matters more, not less: a 1000-executor job
  * restarts somewhere weekly, and a non-idempotent sink silently
  * double-counts the restart batch.
  */
object IdempotentSink {

  /** The per-batch writer: data → `path/batch=<id>`, then the marker.
    * Visible for direct replay testing.
    *
    * The marker is resolved through Hadoop's FileSystem — not
    * java.io.File — so the check works on every scheme the write
    * itself supports (hdfs://, s3a://, local). A driver-local File
    * check against an object-store path is always-false and the
    * replayed batch would be silently rewritten.
    */
  def writeBatch(batch: Dataset[Row], path: String, batchId: Long): Boolean = {
    val dir = new org.apache.hadoop.fs.Path(path, s"batch=$batchId")
    val marker = new org.apache.hadoop.fs.Path(dir, "_GRAFT_COMMITTED")
    val fs = dir.getFileSystem(
      batch.sparkSession.sessionState.newHadoopConf())
    if (fs.exists(marker)) false // replay of a committed batch: no-op
    else {
      batch.write.mode("overwrite") // overwrite: a torn uncommitted attempt
        .parquet(dir.toString) //        is discarded, never appended to
      fs.create(marker, true).close()
      true
    }
  }

  /** Start the stream with the idempotent writer attached. */
  def start(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: Dataset[Row], id: Long) => {
        writeBatch(batch, path, id); ()
      })
      .start()
}
