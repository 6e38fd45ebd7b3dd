package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming drift card: batch-trained baseline, per-window
  * Misra-Gries histograms in stream state, in-row integer chi².
  * Verified against an in-JVM BigInt recomputation and across
  * micro-batch boundaries with a planted second-window shift.
  */
class DriftStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()

  private def mkDocs(rows: Seq[(Long, String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "epoch_s")
      .withColumn("event_ts", timestamp_seconds(col("epoch_s")))
      .drop("epoch_s")
  }

  /** BigInt mirror of the in-row chi² fold. */
  private def refChi2(obs: Map[String, Long], base: Map[String, Long]): Long = {
    val n = obs.values.sum
    val fromBase = base.map { case (b, ppm) =>
      val e = BigInt(ppm) * n / 1000000
      val o = BigInt(obs.getOrElse(b, 0L))
      (o - e) * (o - e) * 1000000 / (e max 1)
    }.sum
    val novel = obs.collect { case (b, o) if !base.contains(b) =>
      BigInt(o) * o * 1000000
    }.sum
    (fromBase + novel).toLong
  }

  test("stream windows equal the batch path and the BigInt reference; a planted shift screams") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // baseline corpus: 50/50 en/de, 60-word docs
    val baseDocs = mkDocs((0 until 100).map(i =>
      (i.toLong, Seq.fill(60)("w").mkString(" "), if (i % 2 == 0) "en" else "de", 0L)))
    val base = streaming.DriftStream.trainBaseline(baseDocs)
    assert(base.ppm.exists(e => e._1 == "lang" && e._2 == "en" && e._3 == 500000L))

    // window 1 (t=0..59): matches the baseline; window 2 (t=60..119):
    // 'fr' appears (novel) and the en share collapses
    val w1 = (0 until 40).map(i =>
      (100L + i, Seq.fill(60)("w").mkString(" "), if (i % 2 == 0) "en" else "de", 10L + i % 20))
    val w2 = (0 until 40).map(i =>
      (200L + i, Seq.fill(60)("w").mkString(" "), if (i % 4 == 0) "en" else "fr", 70L + i % 20))
    val all = w1 ++ w2

    // batch path = the reference semantics
    val batch = streaming.DriftStream.driftCard(mkDocs(all), base, windowLen = "1 minute")
      .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap

    // in-JVM recomputation per (window, feature)
    val baseMap = base.ppm.groupBy(_._1).map { case (f, es) =>
      f -> es.map(e => e._2 -> e._3).toMap }
    for (((win, feature), (n, chi2)) <- batch) {
      val docsIn = all.filter(d => d._4 / 60 == win)
      val obs: Map[String, Long] = feature match {
        case "lang" => docsIn.groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
        case "len"  => docsIn.groupBy(d => "b" + math.min(9, d._2.split(" ").length / 50))
          .map { case (k, v) => k -> v.size.toLong }
      }
      assert(n == docsIn.size.toLong, s"($win,$feature): n_docs $n vs ${docsIn.size}")
      assert(chi2 == refChi2(obs, baseMap(feature)),
        s"($win,$feature): chi2 $chi2 vs reference ${refChi2(obs, baseMap(feature))}")
    }
    // the shifted window screams, the matching window stays quiet
    assert(batch((1, "lang"))._2 > 100L * batch((0, "lang"))._2,
      s"shift not detected: ${batch((1, "lang"))} vs ${batch((0, "lang"))}")

    // the STREAM path across micro-batch boundaries emits the same rows
    val in = MemoryStream[(Long, String, String, Long)]
    val q = streaming.DriftStream.driftCard(
      in.toDF().toDF("doc_id", "text", "lang", "epoch_s")
        .withColumn("event_ts", timestamp_seconds(col("epoch_s")))
        .select(col("text"), col("lang"), col("event_ts")),
      base, watermark = "10 seconds", windowLen = "1 minute")
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = all.splitAt(25) // split mid-window-1
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      in.addData(Seq((9999L, "flush", "en", 100000L))); q.processAllAvailable()
      val got = spark.table("drift_out")
        .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(got == batch,
        s"stream differs from batch:\n stream $got\n batch  $batch")
    } finally q.stop()
  }
}
