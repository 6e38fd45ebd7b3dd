package graft

import graft.streaming.RetractStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming changelog view: signed COUNT/SUM plus the bounded
  * retract-max sketch. Below sketch capacity the stream must equal
  * the batch retract operator bit-for-bit across micro-batch
  * boundaries; past capacity the sketch must degrade to the declared
  * stale-bound contract, never a wrong "exact" answer.
  */
class RetractStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()
  // fuzz-replayable like the other stream ≡ batch suites (the r9
  // pattern that caught a real gate-spec blind spot): point
  // SPARK_GRAFT_SPEC_SF at a tools/fuzz_corpus.py output and the
  // changelog equivalence re-proves itself on a perturbed orders
  // table (jittered prices/dates, resampled keys)
  val sf = sys.env.get("SPARK_GRAFT_SPEC_SF").filter(_.nonEmpty)
    .getOrElse("/root/testdata/sf0.001")

  test("streamed changelog view equals the batch retract operator across micro-batches") {
    import org.apache.spark.sql.streaming.Trigger
    val base = "target/tmp/retractstream"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    val inDir = s"$base/in"

    val orders = Tables(spark, sf).orders
      .select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
    // precondition for the exactness regime: every group's distinct
    // cent values fit the sketch
    val maxDistinct = orders
      .groupBy(col("o_orderpriority"), year(col("o_orderdate")))
      .agg(countDistinct((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(maxDistinct <= RetractStream.MaxSketchCapacity,
      s"fixture outgrew the sketch ($maxDistinct > ${RetractStream.MaxSketchCapacity})")

    // the changelog: every order inserted, the viewRetract delete
    // class deleted again — deletes written as SEPARATE files so
    // maxFilesPerTrigger=1 drives them through later micro-batches
    // and the sketch state round-trips the store between op kinds
    val inserts = orders.withColumn("op", lit("I"))
    val deletes = orders
      .filter(col("o_orderkey") % operators.Warehouse.ViewDeltaMod
        === operators.Warehouse.RetractClass)
      .withColumn("op", lit("D"))
    inserts.repartition(3).write.mode("overwrite").parquet(inDir)
    deletes.repartition(2).write.mode("append").parquet(inDir)

    val streamIn = spark.readStream.schema(inserts.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = RetractStream.retractView(streamIn).writeStream
      .format("memory").queryName("retract_view")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "retract stream did not finish")

    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(6))
    val got = spark.table("retract_view").collect()
    assert(got.forall(_.getBoolean(5)), "in-capacity groups must be exact")
    // batch twin #1: the SAME topology on a batch frame
    val unioned = spark.read.parquet(inDir)
    val batchTwin = RetractStream.retractView(unioned).collect()
    assert(got.map(key).toSet == batchTwin.map(key).toSet,
      "stream diverges from the batch form of the same topology")
    // batch twin #2: the warehouse retract operator on the raw table
    // (different algorithm — signed merge + rescan — same contract)
    val warehouse = operators.Warehouse.viewRetractOn(orders).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got.map(key).toSet == warehouse,
      "stream diverges from the batch retract operator")
  }

  test("over capacity: deleted top degrades to a stale bound, never a wrong exact") {
    import spark.implicits._
    // 200 distinct values in ONE partition: inserts 1..200 ascending,
    // then deletes. capacity 64 ⇒ after the inserts the sketch holds
    // {137..200} with lw = 136
    def run(deleteFrom: Long): (Option[Long], Boolean) = {
      val rows =
        (1L to 200L).map(v => (v, 1L)) ++
          (deleteFrom to 200L).map(v => (v, -1L))
      val df = rows.toDF("v", "s").coalesce(1)
      val r = df.agg(graft.functions.RetractMaxAgg
        .retractMax(col("v"), col("s"), 64).as("m"))
        .select(col("m.mx"), col("m.exact")).head()
      (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getBoolean(1))
    }
    // partial delete of the top: the true max survives in the sketch
    assert(run(191L) == (Some(190L), true))
    // the ENTIRE tracked region deleted: true max (≤ 136) is below
    // the watermark — the sketch must say so, not guess
    assert(run(137L) == (Some(136L), false))
    // delete everything: stale bound again (the sketch cannot know
    // the group is empty once truncation discarded the low region)
    assert(run(1L) == (Some(136L), false))
  }

  test("restart from checkpoint: signed state and max sketch resume, not restart") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val base = "target/tmp/retract-recovery"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    val inDir = s"$base/in"; val ckpt = s"$base/ckpt"
    val ts = (d: String) => java.sql.Timestamp.valueOf(d + " 00:00:00")
    // phase 1: all inserts (A holds its max 500 in the sketch)
    val phase1 = Seq(
      (3L, "A", 5.00, ts("2024-01-01"), "I"),
      (1L, "A", 2.00, ts("2024-01-02"), "I"),
      (2L, "A", 1.00, ts("2024-01-03"), "I"),
      (13L, "B", 9.00, ts("2024-03-01"), "I"),
      (4L, "C", 7.00, ts("2024-06-01"), "I"))
    // phase 2: delete A's MAX CARRIER and all of B — only correct if
    // run 2 resumed run 1's counts + sketch rather than starting cold
    val phase2 = Seq(
      (3L, "A", 5.00, ts("2024-01-01"), "D"),
      (13L, "B", 9.00, ts("2024-03-01"), "D"))
    val cols = Seq("o_orderkey", "o_orderpriority", "o_totalprice",
      "o_orderdate", "op")
    def run(tag: String): org.apache.spark.sql.DataFrame = {
      val schema = phase1.toDF(cols: _*).schema
      val streamIn = spark.readStream.schema(schema).parquet(inDir)
      val q = RetractStream.retractView(streamIn).writeStream
        .format("memory").queryName(s"retract_rec_$tag")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), s"run $tag did not finish")
      q.stop()
      spark.table(s"retract_rec_$tag")
    }
    phase1.toDF(cols: _*).coalesce(1).write.mode("overwrite").parquet(inDir)
    val after1 = run("one").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(4))).toSet
    assert(after1 == Set(("A", 3L, 500L), ("B", 1L, 900L), ("C", 1L, 700L)),
      s"run 1 state wrong: $after1")
    phase2.toDF(cols: _*).coalesce(1).write.mode("append").parquet(inDir)
    val after2 = run("two").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5))).toSet
    assert(after2 == Set(("A", 2L, 300L, 200L, true), ("C", 1L, 700L, 700L, true)),
      s"recovered view wrong (lost state or re-read phase 1?): $after2")
  }

  test("below capacity: out-of-order deletes cancel and empty groups are null-exact") {
    import spark.implicits._
    // delete arrives BEFORE its insert; net state must cancel to
    // empty — and with no truncation the sketch knows it is empty
    val rows = Seq((5L, -1L), (3L, 1L), (5L, 1L), (3L, -1L))
    val r = rows.toDF("v", "s").coalesce(1)
      .agg(graft.functions.RetractMaxAgg
        .retractMax(col("v"), col("s"), 64).as("m"))
      .select(col("m.mx"), col("m.exact")).head()
    assert(r.isNullAt(0) && r.getBoolean(1),
      "fully-retracted group must be NULL + exact below capacity")
  }
}
