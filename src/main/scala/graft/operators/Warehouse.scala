package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse-maintenance pack (SURVEY §2 #60-61): the two mutation
  * primitives a 100 TB analytical store runs every load cycle —
  * SCD Type-2 dimension merge (history-preserving upsert) and
  * changelog compaction (CDC apply). Both are single-join /
  * single-aggregation shapes: nothing here iterates, collects, or
  * windows globally.
  */
object Warehouse {

  /** Effective timestamp (epoch ms) of the scd2_merge update batch —
    * one load cycle, one effective time, like a warehouse ETL stamp.
    */
  val Scd2EffMs = 1000000000L

  /** Key offset that makes a fixture row a brand-new dimension key
    * (the MERGE insert path).
    */
  val Scd2InsertOffset = 10000000L

  /** scd2_merge — Slowly-Changing-Dimension Type-2 merge of an
    * update batch into the `customer` dimension: matched+changed
    * keys close the old version (valid_to = [[Scd2EffMs]]) and open
    * a new current one, matched-but-identical rows are untouched
    * (change detection — no spurious versions), unmatched update
    * keys insert as version 1, and unmatched dimension rows pass
    * through. The update batch is a deterministic in-query fixture:
    * every key ≡ 1 (mod 3) gets +100.00 on its balance (exact
    * DECIMAL addition), every key ≡ 2 (mod 5) moves to segment
    * MACHINERY (a no-op for rows already there — exercising change
    * detection), and every key ≡ 0 (mod 50) also arrives as a brand
    * new key (+[[Scd2InsertOffset]]).
    *
    * Scale shape: ONE full-outer shuffle join on the dimension key
    * followed by a map-side explode of per-key version arrays — the
    * Delta/Iceberg MERGE INTO plan shape. No global state: each key
    * decides its own versions. When the update batch is small
    * relative to the dimension (the common nightly case) the same
    * semantics decompose into a broadcast left join + broadcast
    * anti join; with the dimension bucketed on its key (the
    * engine's storage-layout pattern) even the full-outer form
    * shuffles nothing.
    */
  def scd2Merge(spark: SparkSession, dir: String): DataFrame =
    scd2MergeOn(Tables(spark, dir).customer)

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** The fixture update batch: (k, u_seg, u_bal, changed). */
  private[graft] def scd2Updates(customer: DataFrame): DataFrame = {
    val k = col("c_custkey")
    val uSeg = when(k % 5 === 2, lit("MACHINERY")).otherwise(col("c_mktsegment"))
    val uBal = when(k % 3 === 1, (dec(col("c_acctbal")) + dec(lit(100.00))).cast("double"))
      .otherwise(col("c_acctbal"))
    val upserts = customer
      .filter(k % 3 === 1 || k % 5 === 2)
      .select(k.as("k"), uSeg.as("u_seg"), uBal.as("u_bal"),
        // +100 always changes the balance; the segment move may be a
        // no-op — integer/string comparison only, never float equality
        (k % 3 === 1 || uSeg =!= col("c_mktsegment")).as("changed"))
    val inserts = customer
      .filter(k % 50 === 0)
      .select((k + Scd2InsertOffset).as("k"), col("c_mktsegment").as("u_seg"),
        col("c_acctbal").as("u_bal"), lit(true).as("changed"))
    upserts.unionAll(inserts)
  }

  private[graft] def scd2MergeOn(customer: DataFrame): DataFrame = {
    val dim = customer.select(col("c_custkey").as("k"),
      col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"),
      lit(1).as("in_dim"))
    val upd = scd2Updates(customer).withColumn("in_upd", lit(1))

    def ver(from: Column, to: Column, current: Column, seg: Column, bal: Column) =
      struct(from.cast("long").as("valid_from_ms"), to.cast("long").as("valid_to_ms"),
        current.cast("long").as("is_current"), seg.as("c_mktsegment"), bal.as("c_acctbal"))

    val oldOpen   = ver(lit(0L), lit(null), lit(1L), col("seg"), col("bal"))
    val oldClosed = ver(lit(0L), lit(Scd2EffMs), lit(0L), col("seg"), col("bal"))
    val newVer    = ver(lit(Scd2EffMs), lit(null), lit(1L), col("u_seg"), col("u_bal"))

    dim.join(upd, Seq("k"), "full_outer")
      .withColumn("v", explode(
        when(col("in_upd").isNull, array(oldOpen))
          .when(col("in_dim").isNull, array(newVer))
          .when(col("changed"), array(oldClosed, newVer))
          .otherwise(array(oldOpen))))
      .select(col("k").as("c_custkey"),
        col("v.valid_from_ms"), col("v.valid_to_ms"), col("v.is_current"),
        col("v.c_mktsegment"), col("v.c_acctbal"))
      .orderBy(col("c_custkey"), col("valid_from_ms"))
  }

  /** Synthetic-entity modulus of the cdc_apply changelog fixture
    * (collisions are the point: multiple ops per entity).
    */
  val CdcEntities = 2000L

  /** cdc_apply — changelog compaction: reduce an ordered stream of
    * upserts/deletes to final table state, last writer wins, a
    * trailing delete removes the key. The changelog is a
    * deterministic reinterpretation of `orders`: entity = orderkey
    * mod [[CdcEntities]], sequence = orderkey (unique, so the
    * ordering is total), op = D for orderkey ≡ 3 (mod 11) else U.
    *
    * Scale shape: ONE aggregation keyed by entity whose combiner is
    * `max(struct(seq, …))` — associative, so map-side partial
    * aggregation collapses each partition's log before the shuffle;
    * the shuffle carries at most one row per (partition, entity).
    * This is exactly how a log-structured table compacts a day of
    * CDC at 100 TB: no sort, no window, no state.
    */
  def cdcApply(spark: SparkSession, dir: String): DataFrame =
    cdcApplyOn(Tables(spark, dir).orders)

  private[graft] def cdcApplyOn(orders: DataFrame): DataFrame = {
    val log = orders.select(
      (col("o_orderkey") % CdcEntities).as("entity_id"),
      col("o_orderkey").as("seq"),
      when(col("o_orderkey") % 11 === 3, lit("D")).otherwise(lit("U")).as("op"),
      col("o_totalprice"), col("o_orderstatus"))
    log.groupBy(col("entity_id"))
      .agg(max(struct(col("seq"), col("op"), col("o_totalprice"), col("o_orderstatus"))).as("last"),
        count(lit(1)).as("n_ops"))
      .filter(col("last.op") === "U")
      .select(col("entity_id"), col("last.seq").as("last_seq"),
        col("last.o_totalprice").as("o_totalprice"),
        col("last.o_orderstatus").as("o_orderstatus"), col("n_ops"))
      .orderBy(col("entity_id"))
  }
}
