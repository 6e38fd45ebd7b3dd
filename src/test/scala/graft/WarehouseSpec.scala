package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the warehouse-maintenance pack: SCD2 invariants
  * (one current row per key, closed/open version chaining, change
  * detection) and CDC compaction equality against the window
  * formulation, plus partitioning invariance.
  */
class WarehouseSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val sf = "/root/testdata/sf0.001"

  private lazy val merged: DataFrame =
    operators.Warehouse.scd2Merge(spark, sf).cache()
  private lazy val customer: DataFrame = Tables(spark, sf).customer.cache()

  test("scd2: exactly one current version per key, intervals chain") {
    val perKey = merged.groupBy(col("c_custkey"))
      .agg(sum(col("is_current")).as("n_current"), count(lit(1)).as("n_versions"))
    assert(perKey.filter(col("n_current") =!= 1).count() == 0,
      "every key must end with exactly one current version")
    // two-version keys: the closed version's valid_to must equal the
    // new version's valid_from (no gap, no overlap)
    val closed = merged.filter(col("is_current") === 0)
    assert(closed.filter(col("valid_to_ms") =!= operators.Warehouse.Scd2EffMs).count() == 0)
    val openNew = merged.filter(col("valid_from_ms") === operators.Warehouse.Scd2EffMs)
    assert(closed.select("c_custkey").except(
      openNew.select("c_custkey")).count() == 0,
      "every closed version must have a successor opening at the same instant")
  }

  test("scd2: balance updates version with exact +100.00; inserts and pass-throughs") {
    val cents = (c: String) => round(col(c) * 100).cast("long")
    val two = merged.groupBy(col("c_custkey")).agg(
      count(lit(1)).as("nv"),
      max(when(col("is_current") === 0, cents("c_acctbal"))).as("old_cents"),
      max(when(col("is_current") === 1, cents("c_acctbal"))).as("new_cents"))
    // output keys are parity-encoded (existing = 2·k, inserts =
    // 2·k+1), so raw customer keys join via the same encoding
    def enc(df: DataFrame) = df.select((col("c_custkey") * 2).as("c_custkey"))
    val balKeys = enc(customer.filter(col("c_custkey") % 3 === 1))
    // every balance-updated key carries exactly two versions, +100.00 apart
    val bad = two.join(balKeys, "c_custkey")
      .filter(col("nv") =!= 2 || col("new_cents") - col("old_cents") =!= 10000L)
    assert(bad.count() == 0, "balance update must close old and open +100.00 new")
    // change detection: a segment 'update' to the segment the row
    // already has must NOT create a version
    val noop = enc(customer.filter(col("c_custkey") % 5 === 2 &&
      col("c_mktsegment") === "MACHINERY" && col("c_custkey") % 3 =!= 1))
    val noopVersions = two.join(noop, "c_custkey").filter(col("nv") =!= 1)
    assert(noopVersions.count() == 0, "no-op updates must not version")
    // inserts: brand-new (odd, parity-encoded) keys appear exactly
    // once, opening at EffMs
    val ins = merged.filter(col("c_custkey") % 2 === 1)
    assert(ins.count() == customer.filter(col("c_custkey") % 50 === 0).count())
    assert(ins.filter(col("valid_from_ms") =!= operators.Warehouse.Scd2EffMs ||
      col("is_current") =!= 1).count() == 0)
    // untouched keys: one open version with the original balance
    val untouched = enc(customer.filter(col("c_custkey") % 3 =!= 1 && col("c_custkey") % 5 =!= 2))
    val u = two.join(untouched, "c_custkey").filter(col("nv") =!= 1)
    assert(u.count() == 0, "untouched dimension rows must stay single-version")
  }

  test("cdc: equals the window (row_number desc) formulation and drops trailing deletes") {
    val orders = Tables(spark, sf).orders
    val log = orders.select(
      (col("o_orderkey") % operators.Warehouse.CdcEntities).as("entity_id"),
      col("o_orderkey").as("seq"),
      when(col("o_orderkey") % 11 === 3, lit("D")).otherwise(lit("U")).as("op"),
      col("o_totalprice"), col("o_orderstatus"))
    val w = Window.partitionBy(col("entity_id")).orderBy(col("seq").desc)
    val viaWindow = log
      .withColumn("rn", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(Window.partitionBy(col("entity_id"))))
      .filter(col("rn") === 1 && col("op") === "U")
      .select(col("entity_id"), col("seq").as("last_seq"),
        col("o_totalprice"), col("o_orderstatus"), col("n_ops"))
    val got = operators.Warehouse.cdcApply(spark, sf)
    assert(got.collect().toSeq == viaWindow.orderBy(col("entity_id")).collect().toSeq)
    // an entity whose highest-seq op is a delete must be absent
    val deleted = log.groupBy(col("entity_id"))
      .agg(max(struct(col("seq"), col("op"))).as("last"))
      .filter(col("last.op") === "D").select("entity_id")
    val delCount = deleted.count()
    assert(delCount > 0, "fixture must exercise the delete path")
    assert(got.join(deleted, "entity_id").count() == 0)
  }

  test("cdc: invariant to partitioning") {
    val orders = Tables(spark, sf).orders
    val a = operators.Warehouse.cdcApplyOn(orders).collect().toSeq
    val b = operators.Warehouse.cdcApplyOn(orders.repartition(7)).collect().toSeq
    assert(a == b)
  }

  test("hierarchy: pointer jumping equals the sequential parent-chain walk") {
    val part = Tables(spark, sf).part
    val got = operators.Warehouse.hierarchyOn(part)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ids = part.select(col("p_partkey")).collect().map(_.getLong(0))
    // in-JVM reference: walk parent = id div 10 one hop at a time
    val bound = operators.Warehouse.HierarchyRootBound
    val expect = ids.map { id =>
      var cur = id; var d = 0L
      while (cur >= bound) { cur = cur / 10; d += 1 }
      id -> (cur, d)
    }.toMap
    assert(got == expect, "root/depth diverge from the sequential walk")
    // the fixture exercises real depth, not a flat forest (sf0.001's
    // ~200 parts reach depth 2; the depth-17 chain test below covers
    // long chains through the same operator)
    assert(got.values.map(_._2).max >= 2, "forest too shallow to test jumping")
  }

  test("hierarchy: a depth-17 chain resolves through the shipped operator") {
    import spark.implicits._
    // powers of 10 form a single div-10 chain 10¹⁷ → 10¹⁶ → … → 1:
    // the deepest hierarchy a long key can encode. Pointer jumping
    // resolves it (⌈log₂17⌉ = 5 doubling rounds); a per-level
    // frontier loop would need 17.
    val chain = (0 to 17).map(j => math.pow(10, j).toLong).toDF("p_partkey")
    val got = operators.Warehouse.hierarchyOn(chain)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = (0 to 17).map(j => (math.pow(10, j).toLong, 1L, j.toLong)).toSet
    assert(got == expect, "deep chain roots/depths wrong")
  }

  test("hierarchy: a dangling parent pointer terminates the walk as a root, drops nothing") {
    import spark.implicits._
    // 73's parent (7) is absent → 73 is an orphan root; 737 chains to
    // it; 5 is a plain root. No row may vanish.
    val got = operators.Warehouse.hierarchyOn(
        Seq(5L, 73L, 737L).toDF("p_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((5L, 5L, 0L), (73L, 73L, 0L), (737L, 73L, 1L)),
      s"orphan semantics wrong: $got")
  }

  test("view_refresh: incremental merge equals the full recompute (IVM contract)") {
    val orders = Tables(spark, sf).orders
    val inc = operators.Warehouse.viewRefreshOn(orders)
    val dec = (c: String) => col(c).cast("decimal(18,2)")
    val full = orders
      .groupBy(col("o_orderpriority"), year(col("o_orderdate")).cast("long").as("oyear"))
      .agg(count(lit(1)).as("n_orders"),
        sum((dec("o_totalprice") * 100).cast("long")).as("total_cents"),
        max((dec("o_totalprice") * 100).cast("long")).as("max_cents"))
      .select(col("o_orderpriority"), col("oyear"), col("n_orders"),
        col("total_cents"), col("max_cents"),
        expr("total_cents div n_orders").as("avg_cents"))
      .orderBy(col("o_orderpriority"), col("oyear"))
    assert(inc.collect().toSeq == full.collect().toSeq,
      "incremental view diverges from full recompute")
    // the split is real: both sides of the fixture carry rows
    val nDelta = orders.filter(col("o_orderkey") % operators.Warehouse.ViewDeltaMod === 0).count()
    assert(nDelta > 0 && nDelta < orders.count(), "degenerate base/delta split")
  }

  test("view_retract: signed merge + targeted rescan equals recompute over survivors") {
    val orders = Tables(spark, sf).orders
    val inc = operators.Warehouse.viewRetractOn(orders)
    val dec = (c: String) => col(c).cast("decimal(18,2)")
    val full = orders
      .filter(col("o_orderkey") % operators.Warehouse.ViewDeltaMod
        =!= operators.Warehouse.RetractClass)
      .groupBy(col("o_orderpriority"), year(col("o_orderdate")).cast("long").as("oyear"))
      .agg(count(lit(1)).as("n_orders"),
        sum((dec("o_totalprice") * 100).cast("long")).as("total_cents"),
        max((dec("o_totalprice") * 100).cast("long")).as("max_cents"))
      .select(col("o_orderpriority"), col("oyear"), col("n_orders"),
        col("total_cents"), col("max_cents"),
        expr("total_cents div n_orders").as("avg_cents"))
      .orderBy(col("o_orderpriority"), col("oyear"))
    assert(inc.collect().toSeq == full.collect().toSeq,
      "retract merge diverges from full recompute over survivors")
  }

  test("view_retract: max-carrier deletion repairs via rescan; emptied group drops") {
    import spark.implicits._
    // mod 10, class 3 ⇒ keys 3, 13 are deleted. Group A: the deleted
    // row 3 CARRIES the max (500) — the survivor max 200 must come
    // back via the rescan path, not the stale stored max. Group B is
    // retracted entirely and must vanish. Group C has no deletions.
    val ts = (d: String) => java.sql.Timestamp.valueOf(d + " 00:00:00")
    val orders = Seq(
      (3L, "A", 5.00, ts("2024-01-01")),
      (1L, "A", 2.00, ts("2024-01-02")),
      (2L, "A", 1.00, ts("2024-01-03")),
      (13L, "B", 9.00, ts("2024-03-01")),
      (4L, "C", 7.00, ts("2024-06-01")))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
    val got = operators.Warehouse.viewRetractOn(orders)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("A", 2024L, 2L, 300L, 200L, 150L),
      ("C", 2024L, 1L, 700L, 700L, 700L)),
      s"retract semantics wrong: $got")
    // the fixture corpus actually exercises the rescan arm: at least
    // one group's delete batch carries the stored max
    val corpus = Tables(spark, sf).orders
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    val byDel = corpus.groupBy(col("o_orderpriority"),
        year(col("o_orderdate")).cast("long").as("oyear"))
      .agg(max(cents).as("mx"),
        max(when(col("o_orderkey") % operators.Warehouse.ViewDeltaMod
          === operators.Warehouse.RetractClass, cents)).as("dmx"))
    assert(byDel.filter(col("dmx") === col("mx")).count() > 0,
      "degenerate fixture: no group's max is ever deleted")
  }

  test("hierarchy and view_refresh survive empty inputs") {
    import spark.implicits._
    val noParts = Seq.empty[Long].toDF("p_partkey")
    assert(operators.Warehouse.hierarchyOn(noParts).count() == 0)
    val noOrders = Seq.empty[(Long, String, Double, java.sql.Timestamp)]
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
    assert(operators.Warehouse.viewRefreshOn(noOrders).count() == 0)
    assert(operators.Warehouse.viewRetractOn(noOrders).count() == 0)
  }
}
