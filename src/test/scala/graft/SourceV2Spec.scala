package graft

import graft.sources.v2.HealthSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 connector contract, end-to-end: schema, determinism
  * against a plain-Scala re-derivation, column pruning reaching the
  * reader, and filter pushdown pruning input partitions at planning.
  */
class SourceV2Spec extends AnyFunSuite {
  lazy val spark = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def read() = spark.read.format(classOf[HealthSource].getName)
    .option("patients", 4).option("perPatient", 100).load()

  test("reads the configured volume with the declared schema, deterministically") {
    val df = read()
    assert(df.schema == HealthSource.Schema)
    assert(df.count() == 400L)
    val a = df.collect().map(_.toSeq).toSet
    val b = read().collect().map(_.toSeq).toSet
    assert(a == b)
    // spot-check against the plain-Scala model
    val row = df.filter(col("patient_id") === "p003")
      .orderBy(col("event_time_ms")).limit(1).collect().head
    assert(row.getLong(1) == HealthSource.DefaultStartMs + 3 * 7L)
    assert(row.getLong(2) == HealthSource.heartRate(42L, 3, 0L))
  }

  test("column pruning reaches the scan (reader materializes only requested fields)") {
    val pruned = read().select("heart_rate_bpm")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("heart_rate_bpm") && !scan.contains("patient_id"),
      s"scan not pruned:\n$scan")
    // and the values are the same ones the full read produces
    val full = read().select("heart_rate_bpm").collect().map(_.getLong(0)).sorted
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == full.toSeq)
  }

  test("patient_id filter pushdown prunes input partitions at planning time") {
    val all = read()
    assert(all.rdd.getNumPartitions == 4, "one input partition per patient")
    val one = read().filter(col("patient_id") === "p002")
    assert(one.rdd.getNumPartitions == 1,
      "pushed EqualTo(patient_id) must plan exactly one partition")
    assert(one.count() == 100L)
    assert(one.select("patient_id").distinct().collect().map(_.getString(0)).toSeq
      == Seq("p002"))
    // an unsupported predicate is NOT pushed: partitions stay, Spark
    // re-filters, results are still correct
    val hi = read().filter(col("heart_rate_bpm") > 100L)
    assert(hi.rdd.getNumPartitions == 4)
    assert(hi.collect().forall(_.getLong(2) > 100L))
  }

  test("limit pushdown caps every partition's generation horizon") {
    import graft.sources.v2.{HealthPartition, HealthScanBuilder}
    val b = new HealthScanBuilder(4, 1000000L, HealthSource.DefaultStartMs, 42L)
    assert(b.pushLimit(5))
    val parts = b.build().toBatch.planInputPartitions()
    assert(parts.length == 4)
    assert(parts.forall(_.asInstanceOf[HealthPartition].untilK == 5L),
      "each partition must generate at most the pushed limit")
    // end-to-end semantics unchanged
    val got = spark.read.format(classOf[HealthSource].getName)
      .option("patients", 4).option("perPatient", 1000000).load()
      .limit(5).collect()
    assert(got.length == 5)
  }

  test("the same table streams: micro-batches pace by kPerBatch and equal the batch read") {
    val q = spark.readStream.format(classOf[HealthSource].getName)
      .option("patients", 3).option("perPatient", 40).option("kPerBatch", 15)
      .load()
      .writeStream.format("memory").queryName("dsv2_stream").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dsv2_stream").collect().map(_.toSeq)
      assert(streamed.length == 120, s"expected 3×40 rows, got ${streamed.length}")
      assert(streamed.toSet.size == 120, "micro-batches must not duplicate rows")
      val batch = spark.read.format(classOf[HealthSource].getName)
        .option("patients", 3).option("perPatient", 40).load()
        .collect().map(_.toSeq)
      assert(streamed.toSet == batch.toSet,
        "streaming and batch reads of one table must agree")
      // admission control actually paced it: ceil(40/15) = 3 batches
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 3, s"expected 3 paced micro-batches, got ${batches.length}")
      assert(batches.map(_.numInputRows).toSeq == Seq(45L, 45L, 30L))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the horizon in paced batches, then terminates") {
    val q = spark.readStream.format(classOf[HealthSource].getName)
      .option("patients", 3).option("perPatient", 40).option("kPerBatch", 15)
      .load()
      .writeStream.format("memory").queryName("dsv2_avnow").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
      val rows = spark.table("dsv2_avnow").collect()
      assert(rows.length == 120, s"expected the full 3×40 horizon, got ${rows.length}")
      assert(rows.map(_.toSeq).toSet.size == 120, "no duplication across batches")
      // still paced by the source's default read limit, not one giant batch
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 3, s"expected 3 paced batches, got ${batches.length}")
    } finally q.stop()
  }

  test("COUNT(*) pushdown answers at planning time: one 1-row partition, zero events") {
    val big = spark.read.format(classOf[HealthSource].getName)
      .option("patients", 100).option("perPatient", 10000000).load()
    val counted = big.agg(count(lit(1)))
    // a fully-pushed count plans ONE partition carrying one row — it
    // never generates the 10⁹ events (this would take minutes raw)
    val t0 = System.nanoTime()
    assert(counted.collect().head.getLong(0) == 1000000000L)
    assert((System.nanoTime() - t0) / 1e9 < 30.0, "count generated rows instead of metadata")
    val plan = counted.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates") || !plan.contains("HashAggregate"),
      s"no aggregate pushdown visible:\n$plan")
    // composes with filter pushdown: one patient's horizon only
    val one = spark.read.format(classOf[HealthSource].getName)
      .option("patients", 100).option("perPatient", 10000000).load()
      .filter(col("patient_id") === "p007").agg(count(lit(1)))
    assert(one.collect().head.getLong(0) == 10000000L)
    // grouping by patient_id is ALSO answered whole — one metadata
    // row per patient, no generation (closed-form per group)
    val grouped = spark.read.format(classOf[HealthSource].getName)
      .option("patients", 4).option("perPatient", 10000000).load()
      .groupBy("patient_id").agg(count(lit(1)), max(col("event_time_ms")))
    val t1 = System.nanoTime()
    val g = grouped.collect().sortBy(_.getString(0))
    assert((System.nanoTime() - t1) / 1e9 < 30.0, "grouped count generated rows")
    assert(g.map(_.getString(0)).toSeq == Seq("p001", "p002", "p003", "p004"))
    assert(g.forall(_.getLong(1) == 10000000L))
    val start = graft.sources.v2.HealthSource.DefaultStartMs
    assert(g.map(_.getLong(2)).toSeq ==
      (1 to 4).map(p => start + 9999999L * 10000L + p * 7L))
    // any OTHER grouping key is declined: Spark aggregates raw rows
    val byHr = read().groupBy("heart_rate_bpm").agg(count(lit(1)))
    assert(byHr.collect().map(_.getLong(1)).sum == 400L)
  }

  test("MIN/MAX(event_time_ms) pushdown: closed-form extrema, zero events generated") {
    val big = spark.read.format(classOf[HealthSource].getName)
      .option("patients", 100).option("perPatient", 10000000).load()
    val t0 = System.nanoTime()
    val r = big.agg(min(col("event_time_ms")), max(col("event_time_ms")),
      count(lit(1))).collect().head
    assert((System.nanoTime() - t0) / 1e9 < 30.0, "extrema generated rows instead of metadata")
    // affine model: min at (k=0, p=1), max at (k=horizon-1, p=100)
    val start = graft.sources.v2.HealthSource.DefaultStartMs
    assert(r.getLong(0) == start + 7L)
    assert(r.getLong(1) == start + 9999999L * 10000L + 700L)
    assert(r.getLong(2) == 1000000000L)
    // composes with filter pushdown: one patient's bounds
    val one = spark.read.format(classOf[HealthSource].getName)
      .option("patients", 100).option("perPatient", 10000000).load()
      .filter(col("patient_id") === "p007")
      .agg(min(col("event_time_ms")), max(col("event_time_ms"))).collect().head
    assert(one.getLong(0) == start + 49L)
    assert(one.getLong(1) == start + 9999999L * 10000L + 49L)
    // heart_rate aggregates are NOT closed-form: declined, computed raw
    val hr = read().agg(min(col("heart_rate_bpm"))).collect().head
    val raw = read().select(col("heart_rate_bpm")).collect().map(_.getLong(0)).min
    assert(hr.getLong(0) == raw)
  }

  test("rowsPerSecond pacing model: availability tracks the arrival rate") {
    import graft.sources.v2.{HealthMicroBatchStream, KOffset}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    var now = 5000L
    val s = new HealthMicroBatchStream(2, 1000L, HealthSource.DefaultStartMs, 42L,
      HealthSource.Schema.fieldNames, None, kPerBatch = 1000L,
      rowsPerSecond = 100L, nowMs = () => now)
    // first ask pins the clock origin; nothing has arrived yet
    assert(s.reportLatestOffset().asInstanceOf[KOffset].k == 0L)
    now += 1000L // 1 s × 100 rows/s over 2 patients → 50 indices each
    assert(s.reportLatestOffset().asInstanceOf[KOffset].k == 50L)
    // admission control still caps the per-trigger step below arrivals
    now += 10000L
    val end = s.latestOffset(KOffset(50L), ReadLimit.maxRows(40))
      .asInstanceOf[KOffset].k
    assert(end == 70L, "maxRows(40) over 2 patients admits 20 indices")
    // availability never exceeds the horizon
    now += 1000000L
    assert(s.reportLatestOffset().asInstanceOf[KOffset].k == 1000L)
    // unpaced source: the full horizon is available immediately
    val un = new HealthMicroBatchStream(2, 1000L, HealthSource.DefaultStartMs, 42L,
      HealthSource.Schema.fieldNames, None, kPerBatch = 10L, nowMs = () => now)
    assert(un.reportLatestOffset().asInstanceOf[KOffset].k == 1000L)
  }

  test("rowsPerSecond paces a live stream; AvailableNow drains the horizon regardless") {
    val t0 = System.nanoTime()
    val q = spark.readStream.format(classOf[HealthSource].getName)
      .option("patients", 1).option("perPatient", 30)
      .option("rowsPerSecond", 30).option("kPerBatch", 1000)
      .load()
      .writeStream.format("memory").queryName("dsv2_rate").outputMode("append")
      .start()
    try {
      // availability grows with wall time: keep draining until the
      // horizon lands (bounded by a deadline, not an exact schedule)
      val deadline = System.currentTimeMillis() + 60000
      var n = 0L
      while (n < 30 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.table("dsv2_rate").count()
        if (n < 30) Thread.sleep(50)
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      assert(n == 30, s"horizon not drained, got $n rows")
      assert(elapsed >= 0.9, f"30 rows at 30 rows/s drained in $elapsed%.2f s — unpaced")
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "rate pacing must spread the horizon over multiple batches")
    } finally q.stop()
    // AvailableNow: arrival pacing is suspended — the full horizon is
    // the prepared target and the query self-terminates promptly
    val t1 = System.nanoTime()
    val q2 = spark.readStream.format(classOf[HealthSource].getName)
      .option("patients", 1).option("perPatient", 30)
      .option("rowsPerSecond", 1).option("kPerBatch", 1000)
      .load()
      .writeStream.format("memory").queryName("dsv2_rate_avnow").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q2.awaitTermination(120000), "AvailableNow query must self-terminate")
      assert(spark.table("dsv2_rate_avnow").count() == 30,
        "AvailableNow must drain the full horizon")
      assert((System.nanoTime() - t1) / 1e9 < 25.0,
        "AvailableNow waited on arrival pacing (30 rows at 1 row/s)")
    } finally q2.stop()
  }

  test("a pushed LIMIT over a pushed aggregate bounds output rows, not the horizon") {
    // Spark pushes LIMIT after a complete aggregate pushdown; the limit
    // then applies to the scan's metadata rows. Computing the aggregates
    // over a limit-capped horizon corrupted COUNT/MIN/MAX (count=2 per
    // group under .limit(2)).
    val start = graft.sources.v2.HealthSource.DefaultStartMs
    def tbl = spark.read.format(classOf[HealthSource].getName)
      .option("patients", 4).option("perPatient", 1000).load()
    val g = tbl.groupBy("patient_id")
      .agg(count(lit(1)).as("n"), max(col("event_time_ms")).as("mx"))
      .limit(2).collect()
    assert(g.length == 2, "the limit itself must still apply")
    assert(g.forall(_.getLong(1) == 1000L),
      s"per-group count must be the full horizon, got ${g.map(_.getLong(1)).toSeq}")
    g.foreach { r =>
      val p = r.getString(0).drop(1).toInt
      assert(r.getLong(2) == start + 999L * 10000L + p * 7L,
        "per-group max must be the full-horizon extremum")
    }
    // ungrouped: limit(1) over the single metadata row — values intact
    val u = tbl.agg(count(lit(1)).as("n"), min(col("event_time_ms")).as("mn"))
      .limit(1).collect().head
    assert(u.getLong(0) == 4000L)
    assert(u.getLong(1) == start + 7L)
  }

  test("MIN+MAX over an empty horizon yield NULLs with distinct field names") {
    val empty = spark.read.format(classOf[HealthSource].getName)
      .option("patients", 3).option("perPatient", 0).load()
      .agg(min(col("event_time_ms")).as("mn"), max(col("event_time_ms")).as("mx"),
        count(lit(1)).as("n"))
    val r = empty.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1), "empty horizon → NULL extrema")
    assert(r.getLong(2) == 0L)
    // the scan schema must not carry duplicate column names
    import graft.sources.v2.HealthScanBuilder
    import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Max, Min}
    import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
    val b = new HealthScanBuilder(3, 0L, HealthSource.DefaultStartMs, 42L)
    val tref = Expressions.column("event_time_ms").asInstanceOf[NamedReference]
    val agg = new Aggregation(
      Array[AggregateFunc](new Min(tref), new Max(tref)), Array.empty)
    assert(b.pushAggregation(agg))
    val names = b.build().readSchema().fieldNames.toSeq
    assert(names.distinct == names, s"duplicate scan field names: $names")
  }

  test("streaming restart resumes from the checkpointed offset: no loss, no duplication") {
    val out = "target/tmp/dsv2_restart_out"
    val ckpt = "target/tmp/dsv2_restart_ckpt"
    def rm(p: String): Unit = {
      def go(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(go); f.delete()
      }
      go(new java.io.File(p))
    }
    rm(out); rm(ckpt)
    def start(perPatient: Int) = spark.readStream
      .format(classOf[HealthSource].getName)
      .option("patients", 2).option("perPatient", perPatient).option("kPerBatch", 10)
      .load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    // phase 1: horizon 20 → k in [0, 20) committed
    val q1 = start(20)
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 40L)
    // phase 2: SAME checkpoint, horizon extended to 35 — the restart
    // must resume at k=20 (not regenerate [0,20)) and emit the rest
    val q2 = start(35)
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).collect()
    assert(rows.length == 70L, s"expected 2×35 rows, got ${rows.length}")
    assert(rows.map(_.toSeq).toSet.size == 70, "restart must not duplicate rows")
  }
}
