package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the star schema (SURVEY §2 #62): iterative
  * PageRank on the customer–supplier trade network. The engine's
  * third driver-loop operator family (after label propagation and
  * BPE): rounds are plain joins + aggregations, data never visits
  * the driver, and every arithmetic step is on the integer lattice —
  * so a fixed iteration count is bit-reproducible at any
  * parallelism, and the oracle can unroll the same rounds in SQL.
  */
object Graph {

  /** Initial per-node mass (pr is "parts-per-billion of one node's
    * fair share": the corpus-wide mass is n·Scale).
    */
  val PrScale = 1000000000L

  /** Damping factor, as an integer percentage (d = 0.85). */
  val PrDampPct = 85L

  /** Fixed round count — no convergence test, so the oracle can
    * unroll exactly this many rounds.
    */
  val PrIters = 10

  /** Supplier node ids live above this offset (disjoint from
    * customer keys at any realistic SF).
    */
  val SupplierNodeOffset = 1000000L

  private[graft] val PrTeleport = PrScale * (100 - PrDampPct) / 100

  /** pagerank — 10 rounds of damped PageRank over the undirected
    * bipartite graph customer↔supplier (an edge per distinct
    * (customer, supplier) trading pair in orders⋈lineitem). All
    * arithmetic is integer: contrib = pr div degree, next =
    * teleport + 85·Σcontrib div 100 — deterministic flooring, no
    * float drift, HUGEINT/DECIMAL(38) guard on the damped sum.
    *
    * Scale shape: the edge list is built once (one shuffle join +
    * distinct) and cached; each round is ONE hash join of edges
    * against the current rank table (keyed by src) and ONE
    * aggregation (keyed by dst, map-side partial sum) — the standard
    * Pregel-on-MapReduce round, rounds fixed at [[PrIters]].
    * localCheckpoint truncates lineage per round (the
    * label-propagation lesson: without it the logical plan doubles
    * per round). A hot node (a supplier everyone buys from) is a hot
    * AGGREGATION key, not a join explosion — partial aggregation
    * absorbs it map-side.
    */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    pagerankOn(t.customer, t.supplier, t.orders, t.lineitem)
  }

  private[graft] def pagerankOn(customer: DataFrame, supplier: DataFrame,
      orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val nodes = customer.select(col("c_custkey").as("id"))
      .unionAll(supplier.select((col("s_suppkey") + SupplierNodeOffset).as("id")))
    val pairs = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + SupplierNodeOffset).as("s"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
      .cache()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var pr = nodes
      .join(deg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        lit(PrScale).as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to PrIters)
      pr = pagerankRound(edges, pr).localCheckpoint(true)
    edges.unpersist()
    pr.select(col("id").as("node_id"),
        when(col("id") >= SupplierNodeOffset, lit("s")).otherwise(lit("c")).as("node_type"),
        col("outdeg").as("degree"), col("pr").as("pr_ppb"))
      .orderBy(col("node_id"))
  }

  /** One PageRank round over (src, dst) edges and (id, outdeg, pr)
    * ranks — factored out so its PLAN is directly assertable (the
    * driver-loop discipline shared with [[Dedup.propagationRound]]
    * and BPE's pair counts): one src-keyed hash join, one dst-keyed
    * aggregation, one left join back — nothing may degenerate to a
    * nested loop or a single partition.
    */
  private[graft] def pagerankRound(edges: DataFrame, pr: DataFrame): DataFrame = {
    // contrib is computed AFTER the src join, so outdeg ≥ 1 by
    // construction (no division-by-zero path for isolated nodes)
    val contribs = edges
      .join(pr.select(col("id"), expr("pr div outdeg").as("contrib")),
        edges("src") === col("id"))
      .groupBy(col("dst"))
      .agg(expr(s"CAST($PrDampPct * sum(CAST(contrib AS DECIMAL(38,0))) div 100 AS BIGINT)")
        .as("damped"))
    pr.select(col("id"), col("outdeg"))
      .join(contribs, pr("id") === contribs("dst"), "left")
      .select(col("id"), col("outdeg"),
        (lit(PrTeleport) + coalesce(col("damped"), lit(0L))).as("pr"))
  }
}
