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
    val balKeys = customer.filter(col("c_custkey") % 3 === 1)
    // every balance-updated key carries exactly two versions, +100.00 apart
    val bad = two.join(balKeys, "c_custkey")
      .filter(col("nv") =!= 2 || col("new_cents") - col("old_cents") =!= 10000L)
    assert(bad.count() == 0, "balance update must close old and open +100.00 new")
    // change detection: a segment 'update' to the segment the row
    // already has must NOT create a version
    val noop = customer.filter(col("c_custkey") % 5 === 2 &&
      col("c_mktsegment") === "MACHINERY" && col("c_custkey") % 3 =!= 1)
    val noopVersions = two.join(noop, "c_custkey").filter(col("nv") =!= 1)
    assert(noopVersions.count() == 0, "no-op updates must not version")
    // inserts: brand-new keys appear exactly once, opening at EffMs
    val ins = merged.filter(col("c_custkey") >= operators.Warehouse.Scd2InsertOffset)
    assert(ins.count() == customer.filter(col("c_custkey") % 50 === 0).count())
    assert(ins.filter(col("valid_from_ms") =!= operators.Warehouse.Scd2EffMs ||
      col("is_current") =!= 1).count() == 0)
    // untouched keys: one open version with the original balance
    val untouched = customer.filter(col("c_custkey") % 3 =!= 1 && col("c_custkey") % 5 =!= 2)
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
}
