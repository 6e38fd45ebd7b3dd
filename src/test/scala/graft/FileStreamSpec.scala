package graft

import graft.sources.HealthDataGenerator
import graft.streaming.HealthMonitor
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full production topology minus the broker: payload files stream
  * in (readStream over a directory — the same incremental engine the
  * Kafka source drives), the monitoring pipeline aggregates with
  * watermarks, alerts land as files with checkpointing, and the
  * result equals the batch run over identical data.
  */
class FileStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()

  test("file-source streaming end-to-end equals the batch run") {
    val base = "target/tmp/filestream"
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))

    val payloads = HealthDataGenerator.payloads(spark, nPatients = 5, perPatient = 500)
    payloads.coalesce(2).write.mode("overwrite").text(inDir)

    val streamIn = spark.readStream
      .schema("value STRING")
      .text(inDir)
    val alerts = HealthMonitor.alerts(streamIn)
    val q = alerts.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish")

    val streamed = spark.read.parquet(outDir)
      .select("patient_id", "window_start", "avg_hr", "min_hr", "max_hr", "n_readings", "alert_type")
    val batch = HealthMonitor.alerts(payloads)
      .select("patient_id", "window_start", "avg_hr", "min_hr", "max_hr", "n_readings", "alert_type")

    // append mode withholds windows the watermark hasn't passed; all
    // emitted windows must match the batch result exactly, and the
    // emitted set must cover all but the final open windows
    val sKeys = streamed.collect().map(_.toSeq).toSet
    val bKeys = batch.collect().map(_.toSeq).toSet
    assert(sKeys.nonEmpty)
    assert(sKeys.subsetOf(bKeys), s"streamed rows not in batch: ${(sKeys -- bKeys).take(3)}")
    val missing = bKeys -- sKeys
    val maxStart = batch.agg(max(col("window_start"))).head().getTimestamp(0)
    assert(missing.forall(_.exists {
      case t: java.sql.Timestamp => t.getTime >= maxStart.getTime - 60000
      case _ => false
    }), s"non-final windows missing from stream: ${missing.take(3)}")
  }
}
