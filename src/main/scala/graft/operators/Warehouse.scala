package graft.operators

import graft.{PlanScope, Tables}
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

  /** The fixture's brand-new dimension keys (the MERGE insert path)
    * are PARITY-encoded: existing dimension keys ride as
    * c_custkey·2 (even), fixture inserts as c_custkey·2+1 (odd);
    * decode real key = k div 2. Replaces the r13
    * `Scd2InsertOffset = 10⁷`, a frozen constant of the retired
    * SupplierNodeOffset class: past 10⁷ customers (any production
    * dimension) an insert key aliased a real key and the fixture's
    * key-distinctness collapsed. Parity is collision-free at every
    * key range to 2⁶², with no constant left to freeze.
    */

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
    * new key (parity-encoded 2·k+1 — see the note above; existing
    * keys ride as 2·k).
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
      .select((k * 2).as("k"), uSeg.as("u_seg"), uBal.as("u_bal"),
        // +100 always changes the balance; the segment move may be a
        // no-op — integer/string comparison only, never float equality
        (k % 3 === 1 || uSeg =!= col("c_mktsegment")).as("changed"))
    val inserts = customer
      .filter(k % 50 === 0)
      .select((k * 2 + 1).as("k"), col("c_mktsegment").as("u_seg"),
        col("c_acctbal").as("u_bal"), lit(true).as("changed"))
    upserts.unionAll(inserts)
  }

  private[graft] def scd2MergeOn(customer: DataFrame): DataFrame = {
    val dim = customer.select((col("c_custkey") * 2).as("k"),
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

  /** Root-key threshold for [[q43Hierarchy]]'s synthetic forest:
    * parent(p) = p div 10 for p ≥ [[HierarchyRootBound]]; smaller
    * keys are roots. Depth is ⌊log₁₀⌋-bounded (≤ 4 at sf0.1's 20k
    * parts), but the OPERATOR is built for unbounded chains.
    */
  val HierarchyRootBound = 10L

  /** q43_hierarchy — recursive hierarchy traversal (the WITH
    * RECURSIVE / BOM-explosion class Spark SQL lacks): every node of
    * a parent-pointer forest resolves its ROOT ancestor and DEPTH.
    * The fixture forest derives parents arithmetically from `part`
    * ([[HierarchyRootBound]]), so both engines construct the
    * identical graph; the oracle is DuckDB's native WITH RECURSIVE.
    *
    * The implementation is POINTER JUMPING (path doubling), not
    * row-at-a-time recursion: each round every unresolved node
    * replaces its ancestor pointer `anc` with `anc`'s own pointer
    * and accumulates the hop distance, so pointer reach DOUBLES per
    * round — O(log depth) rounds for ANY chain length, where naive
    * frontier expansion needs O(depth) rounds (a 10⁶-deep chain:
    * 20 rounds vs 10⁶). Each round is ONE node-keyed SHUFFLE_HASH
    * join of the unresolved slice against the full pointer table
    * (both node-count-sized — never broadcast) plus the one
    * convergence scalar; resolved rows are set aside and never
    * rejoin. The pagerank/k_core driver-loop discipline applies:
    * AQE off around the loop, lazy localCheckpoint per round to
    * truncate lineage. A node whose parent id is ABSENT from the
    * node set is a root (dangling pointers are normal in real
    * hierarchy data; dropping such rows silently in the lookup join
    * would be the quiet-corruption failure mode).
    */
  def q43Hierarchy(spark: SparkSession, dir: String): DataFrame =
    hierarchyOn(Tables(spark, dir).part)

  private[graft] def hierarchyOn(part: DataFrame): DataFrame = {
    // conf-isolated AQE-off scope (graft.PlanScope, round 15): the
    // caller's session is never mutated, so a concurrent query keeps
    // its adaptive planning while the loop's fixed-shape rounds skip
    // the re-planning latency. The loop also runs under the graph
    // shuffle-partition law: the pointer table is node-count-sized
    // (the same rounds × stages × oversharding shape as the LPA
    // loops; the count is a parquet footer scan), session conf the
    // ceiling.
    val spark = part.sparkSession
    val parts = Graph.loopShufflePartitions(spark, part.count())
    PlanScope.static(spark, parts) { scope =>
      hierarchyRounds(PlanScope.rebind(scope, part))
    }
  }

  private def hierarchyRounds(part: DataFrame): DataFrame = {
    val ids = part.select(col("p_partkey").as("id"))
    // a node is a ROOT when its key is below the bound OR its parent
    // id is absent from the node set — real hierarchy data has
    // dangling pointers, and terminating the walk there (root = the
    // orphan node itself) beats silently dropping the row in the
    // pointer-lookup join
    val flagged = ids.withColumn("p", expr("id div 10"))
      .join(ids.select(col("id").as("p")).withColumn("p_exists", lit(true)),
        Seq("p"), "left")
      .select(col("id"), col("p"),
        (col("id") < HierarchyRootBound || col("p_exists").isNull).as("is_root"))
    val rootFlags = flagged
      .select(col("id").as("anc"), col("is_root").as("anc_root"))
    var state = flagged
      .select(col("id"),
        when(col("is_root"), col("id")).otherwise(col("p")).as("anc"),
        when(col("is_root"), lit(0L)).otherwise(lit(1L)).as("d"),
        col("is_root"))
      .join(rootFlags.hint("SHUFFLE_HASH"), "anc")
      .select(col("id"), col("anc"), col("d"),
        (col("is_root") || col("anc_root")).as("done"))
      .transform(graft.Materialize.round(_))
    var prev: DataFrame = null
    var lastPending = Long.MaxValue
    var pending = state.filter(!col("done")).count()
    while (pending > 0) {
      // a non-final round halves (at least) the longest unresolved
      // suffix; zero progress is a graph cycle or a logic error —
      // fail loudly, never loop forever
      if (pending >= lastPending) throw new IllegalStateException(
        s"hierarchy resolution stalled at $pending unresolved nodes (cycle?)")
      lastPending = pending
      val look = state.select(col("id").as("anc"), col("anc").as("anc2"),
        col("d").as("d2"), col("done").as("done2"))
      val settled = state.filter(col("done"))
      val advanced = state.filter(!col("done"))
        .join(look.hint("SHUFFLE_HASH"), "anc")
        .select(col("id"), col("anc2").as("anc"),
          (col("d") + col("d2")).as("d"), col("done2").as("done"))
      prev = state
      state = graft.Materialize.round(
        settled.select(col("id"), col("anc"), col("d"), col("done"))
          .unionAll(advanced))
      pending = state.filter(!col("done")).count() // materializes the round
      graft.Materialize.release(prev)
    }
    val out = graft.Materialize.eager(
      state.select(col("id").as("p_partkey"), col("anc").as("root"),
        col("d").as("depth")))
    graft.Materialize.release(state)
    out.orderBy(col("p_partkey"))
  }

  /** Fraction knob for [[viewRefresh]]'s fixture split: orders with
    * o_orderkey ≡ 0 (mod [[ViewDeltaMod]]) form the DELTA batch, the
    * rest the materialized base.
    */
  val ViewDeltaMod = 10L

  /** view_refresh — incremental materialized-view maintenance (IVM)
    * for an algebraic aggregate view: `revenue per (priority, order
    * year)` maintained as partials (count, exact DECIMAL sum, max)
    * that MERGE — refresh = base partials ⊎ delta partials re-
    * aggregated, never a rescan of the base facts. AVG is derived
    * from (sum, count) at read time on the cents lattice — the
    * standard algebraic decomposition (SUM/COUNT/MIN/MAX merge;
    * AVG/stddev derive), which is why the view can absorb a delta
    * without recomputation. Emits the refreshed view; the oracle is
    * the full recompute over base ∪ delta (the IVM correctness
    * contract: incremental ≡ full).
    *
    * Scale shape: the delta aggregation touches ONLY delta rows (at
    * 100 TB the nightly delta is ≪ the base), the merge re-aggregates
    * two card-sized partial tables (|priorities|×|years| rows —
    * metadata class), and every aggregate is map-side-combinable.
    * The base partials here are computed in-query from the fixture
    * split (Verify is stateless); a deployment reads them from the
    * stored view — the merge is the shipped operator either way.
    */
  def viewRefresh(spark: SparkSession, dir: String): DataFrame =
    viewRefreshOn(Tables(spark, dir).orders)

  private[graft] def viewRefreshOn(orders: DataFrame): DataFrame = {
    // both partial tables from ONE scan: the snapshot membership is a
    // grouping key, so base and delta partials fall out of a single
    // map-side-combinable aggregation (a deployment reads the base
    // partials from the stored view instead — the MERGE below is the
    // shipped operator either way)
    val partials = orders
      .groupBy(col("o_orderpriority"),
        year(col("o_orderdate")).cast("long").as("oyear"),
        (col("o_orderkey") % ViewDeltaMod === 0).as("is_delta"))
      .agg(count(lit(1)).as("n_orders"),
        sum((dec(col("o_totalprice")) * 100).cast("long")).as("total_cents"),
        max((dec(col("o_totalprice")) * 100).cast("long")).as("max_cents"))
    partials
      .groupBy(col("o_orderpriority"), col("oyear"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("total_cents")).as("total_cents"),
        max(col("max_cents")).as("max_cents"))
      .select(col("o_orderpriority"), col("oyear"), col("n_orders"),
        col("total_cents"), col("max_cents"),
        expr("total_cents div n_orders").as("avg_cents"))
      .orderBy(col("o_orderpriority"), col("oyear"))
  }

  /** Modulus class for [[viewRetract]]'s fixture: orders with
    * o_orderkey ≡ 3 (mod [[ViewDeltaMod]]) form the DELETE batch.
    */
  val RetractClass = 3L

  /** view_retract — DELETE-capable incremental view maintenance, the
    * retraction half [[viewRefresh]]'s insert-only merge cannot do.
    * The view `revenue per (priority, order year)` holds partials
    * (count, exact cent sum, max); a delete batch retracts rows:
    *
    *  - COUNT/SUM are INVERTIBLE — signed merge: n' = n − Δn,
    *    s' = s − Δs, a card-sized join (|view| rows, metadata class).
    *    Groups whose count reaches 0 drop out of the view.
    *  - MAX is NOT invertible — a deleted non-max row leaves it
    *    untouched (Δmax < max ⇒ keep), but when the delete batch
    *    carried a group's max the true new max may be ANY surviving
    *    row: those AFFECTED groups (and only those) are rescanned.
    *    This is the standard non-invertible-aggregate treatment; the
    *    alternative (keep a per-group top-k sketch) trades rescan
    *    for bounded staleness and is noted, not shipped.
    *
    * Scale shape: the delete-batch aggregation touches only deleted
    * rows (a nightly delete ≪ the base), the signed merge joins two
    * card-sized tables, and the rescan is restricted by a BROADCAST
    * semi join on the affected group keys — with the base stored
    * partitioned by group (the natural layout for a grouped view)
    * that restriction is partition PRUNING, so rescan cost is
    * proportional to the affected groups' mass, not the corpus. The
    * base partials here are computed in-query from the fixture split
    * (Verify is stateless); a deployment reads them from the stored
    * view — the merge + targeted rescan is the shipped operator
    * either way. Oracle: full recompute over surviving rows (the IVM
    * correctness contract).
    */
  def viewRetract(spark: SparkSession, dir: String): DataFrame =
    viewRetractOn(Tables(spark, dir).orders)

  private[graft] def viewRetractOn(orders: DataFrame): DataFrame = {
    val cents = (dec(col("o_totalprice")) * 100).cast("long")
    val facts = orders.select(
      col("o_orderpriority"),
      year(col("o_orderdate")).cast("long").as("oyear"),
      cents.as("cents"),
      (col("o_orderkey") % ViewDeltaMod === RetractClass).as("is_del"))
    val keys = Seq("o_orderpriority", "oyear")
    // one scan → per-(group, membership) partials; folding both out
    // of one pass is the stateless-fixture stand-in for "read the
    // stored view + aggregate the delete batch"
    val partials = facts
      .groupBy(col("o_orderpriority"), col("oyear"), col("is_del"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        max(col("cents")).as("mx"))
    val baseView = partials // the stored view: partials over ALL rows
      .groupBy(col("o_orderpriority"), col("oyear"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"), max(col("mx")).as("mx"))
    val delBatch = partials.filter(col("is_del"))
      .select(col("o_orderpriority"), col("oyear"),
        col("n").as("dn"), col("s").as("ds"), col("mx").as("dmx"))
    val merged = baseView.join(delBatch, keys, "left")
      .select(col("o_orderpriority"), col("oyear"),
        (col("n") - coalesce(col("dn"), lit(0L))).as("n_orders"),
        (col("s") - coalesce(col("ds"), lit(0L))).as("total_cents"),
        col("mx"), col("dmx"))
      .filter(col("n_orders") > 0) // fully-retracted groups drop out
    // MAX repair: only groups whose deleted max reached the stored max
    val affected = merged
      .filter(col("dmx").isNotNull && col("dmx") === col("mx"))
      .select(col("o_orderpriority"), col("oyear"))
    val rescan = facts.filter(!col("is_del"))
      .join(broadcast(affected), keys, "left_semi")
      .groupBy(col("o_orderpriority"), col("oyear"))
      .agg(max(col("cents")).as("rmx"))
    merged.join(rescan, keys, "left")
      .select(col("o_orderpriority"), col("oyear"),
        col("n_orders"), col("total_cents"),
        when(col("dmx").isNotNull && col("dmx") === col("mx"), col("rmx"))
          .otherwise(col("mx")).as("max_cents"),
        expr("total_cents div n_orders").as("avg_cents"))
      .orderBy(col("o_orderpriority"), col("oyear"))
  }
}
