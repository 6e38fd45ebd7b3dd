package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the pagerank operator: exact equality against an
  * independent in-memory integer PageRank at sf0.001, teleport-only
  * mass for isolated nodes, and partitioning invariance (integer
  * lattice ⇒ parallelism cannot change a digit).
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val sf = "/root/testdata/sf0.001"

  /** Plain-Scala reference: same integer arithmetic, same rounds. */
  private def referencePr(nodes: Seq[Long], edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long)] = {
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inbound = edges.groupBy(_._2)
    var pr: Map[Long, Long] = nodes.map(_ -> operators.Graph.PrScale).toMap
    for (_ <- 1 to operators.Graph.PrIters) {
      pr = nodes.map { n =>
        val s = inbound.getOrElse(n, Nil)
          .map { case (src, _) => pr(src) / outdeg(src) }
          .foldLeft(BigInt(0))(_ + _)
        n -> (operators.Graph.PrTeleport +
          (BigInt(operators.Graph.PrDampPct) * s / 100).toLong)
      }.toMap
    }
    pr.map { case (n, v) => n -> (outdeg.getOrElse(n, 0L), v) }
  }

  test("pagerank equals the in-memory integer reference on the sf0.001 trade graph") {
    val t = Tables(spark, sf)
    val got = operators.Graph.pagerank(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
    // rebuild the same graph with plain Scala
    import spark.implicits._
    val off = operators.Graph.SupplierNodeOffset
    val custs = t.customer.select("c_custkey").as[Long].collect().toSeq
    val supps = t.supplier.select("s_suppkey").as[Long].collect().toSeq.map(_ + off)
    val li = t.lineitem
    val ord = t.orders
    val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select("o_custkey", "l_suppkey").as[(Long, Long)]
      .collect().toSeq.map { case (c, s) => (c, s + off) }.distinct
    val edges = pairs ++ pairs.map(_.swap)
    val ref = referencePr(custs ++ supps, edges)
    assert(got.length == (custs.size + supps.size))
    for ((id, (tpe, deg, pr)) <- got) {
      assert(tpe == (if (id >= off) "s" else "c"))
      val (refDeg, refPr) = ref(id)
      assert(deg == refDeg, s"node $id degree $deg != $refDeg")
      assert(pr == refPr, s"node $id pr $pr != $refPr")
    }
  }

  test("isolated nodes hold exactly the teleport mass; connected mass exceeds it") {
    import spark.implicits._
    val customer = Seq(1L, 2L, 99L).toDF("c_custkey")
      .withColumn("c", org.apache.spark.sql.functions.lit("x"))
    val supplier = Seq(7L).toDF("s_suppkey")
    val orders = Seq((10L, 1L), (11L, 2L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 7L), (11L, 7L)).toDF("l_orderkey", "l_suppkey")
    val got = operators.Graph.pagerankOn(customer, supplier, orders, lineitem)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(99L) == operators.Graph.PrTeleport, "isolated node must keep teleport only")
    val hub = operators.Graph.SupplierNodeOffset + 7L
    assert(got(hub) > got(1L) && got(hub) > got(99L),
      "the hub supplier must out-rank its leaf customers")
  }

  test("a pagerank round never re-shuffles the partitioned edge list") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // mirror pagerankOn's EXACT round environment: edges
    // hash-partitioned on src and materialized as row blocks, ranks
    // partitioned on id, AQE off (pagerankOn pins it off for the
    // loop — the round is never planned under AQE)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
        .toDF("src", "dst").repartition(col("src")).localCheckpoint(true)
      val base = Seq((1L, 1L), (2L, 2L), (3L, 1L))
        .toDF("id", "outdeg").repartition(col("id")).localCheckpoint(true)
      val pr = Seq((1L, 1000L), (2L, 1000L), (3L, 1000L))
        .toDF("id", "pr").repartition(col("id")).localCheckpoint(true)
      val round = operators.Graph.pagerankRound(edges, base, pr)
      val plan = round.queryExecution.executedPlan.toString
      // both join inputs are pre-partitioned on their join keys, so
      // the round's COMPLETE shuffle budget is the ONE contrib
      // aggregation exchange (dst): the shuffled-hash contrib join
      // and the rank join-back must both consume the existing
      // hash(·) partitioning with no planner-inserted exchange, and
      // the rank table must never be broadcast (node-count-sized at
      // cluster scale).
      val perRound = "Exchange hashpartitioning\\([^)]*\\), ENSURE_REQUIREMENTS".r
        .findAllIn(plan).toSeq
      assert(perRound.size <= 1, s"round plans ${perRound.size} planner exchanges:\n$plan")
      assert(!perRound.exists(_.contains("src#")),
        s"the materialized edge list is being re-shuffled on src:\n$plan")
      assert(plan.contains("ShuffledHashJoin"),
        s"contrib join must be the co-partitioned shuffled-hash join:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"a round must not broadcast the node-count-sized rank table:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("pagerank is invariant to partitioning") {
    val t = Tables(spark, sf)
    val a = operators.Graph.pagerankOn(t.customer, t.supplier, t.orders, t.lineitem)
      .collect().toSeq
    val b = operators.Graph.pagerankOn(t.customer.repartition(7), t.supplier,
        t.orders.repartition(3), t.lineitem.repartition(5))
      .collect().toSeq
    assert(a == b)
  }

  /** Brute-force reference: every id triple, edge-set membership. */
  private def referenceTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (a min b, a max b) }.toSet
    val nodes = es.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val tris = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if es((a, b)) && es((b, c)) && es((a, c))
    } yield (a, b, c)
    tris.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("triangle_count equals the brute-force reference on the fixture graph") {
    val edges = operators.Graph.triangleEdges(Tables(spark, sf).customer)
    import spark.implicits._
    val ref = referenceTriangles(edges.as[(Long, Long)].collect().toSeq)
    val got = operators.Graph.triangleCount(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
    assert(got.nonEmpty, "fixture graph must contain triangles")
  }

  test("triangle orientation handles a celebrity hub without wedge blowup at it") {
    import spark.implicits._
    // star center 1 with leaves 10..29 (degree 20), plus one genuine
    // triangle (1, 10, 11) closed by the leaf edge, plus a triangle
    // far from the hub (100, 101, 102)
    val star = (10L to 29L).map(l => (1L, l))
    val extra = Seq((10L, 11L), (100L, 101L), (101L, 102L), (100L, 102L))
    val edges = (star ++ extra).toDF("u", "v")
    val got = operators.Graph.triangleCountOn(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = referenceTriangles(star ++ extra)
    assert(got == ref)
    assert(got(1L) == 1L && got(100L) == 1L)
  }

  test("k_core equals the in-memory reference peeler on the sf0.001 trade graph") {
    import org.apache.spark.sql.functions._
    val t = Tables(spark, sf)
    val pairs = t.lineitem
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"),
        (col("l_suppkey") + operators.Graph.SupplierNodeOffset).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    // reference: peel undirected adjacency until fixpoint
    var adj: Map[Long, Set[Long]] = (pairs.flatMap { case (c, s) =>
      Seq(c -> s, s -> c) }).groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    var changed = true
    while (changed) {
      val doomed = adj.collect { case (n, es) if es.size < operators.Graph.KCoreK => n }.toSet
      changed = doomed.nonEmpty
      if (changed)
        adj = adj.collect { case (n, es) if !doomed(n) => n -> (es -- doomed) }
    }
    val want = adj.map { case (n, es) => n -> es.size.toLong }
    val got = operators.Graph.kCore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == want, s"k-core differs: got ${got.size} nodes, want ${want.size}")
    assert(got.nonEmpty, "fixture sanity: the trade graph must have a 3-core")
    assert(got.values.forall(_ >= operators.Graph.KCoreK),
      "fixpoint violated: a survivor has degree below K")
    // node_type tagging
    val types = operators.Graph.kCore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    types.foreach { case (id, tp) =>
      assert(tp == (if (id >= operators.Graph.SupplierNodeOffset) "s" else "c"))
    }
  }

  test("triangle_count is invariant to partitioning") {
    val e = operators.Graph.triangleEdges(Tables(spark, sf).customer)
    val a = operators.Graph.triangleCountOn(e).collect().toSeq
    val b = operators.Graph.triangleCountOn(e.repartition(7)).collect().toSeq
    assert(a == b)
  }

  test("graph_communities equals the in-memory semi-synchronous LPA reference") {
    import org.apache.spark.sql.functions._
    val off = operators.Graph.SupplierNodeOffset
    val t = Tables(spark, sf)
    val pairs = t.lineitem
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), (col("l_suppkey") + off).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = (t.customer.select(col("c_custkey")).collect().map(_.getLong(0)) ++
      t.supplier.select(col("s_suppkey") + off).collect().map(_.getLong(0))).toSeq
    val adj: Map[Long, Seq[Long]] = pairs.toSeq.flatMap { case (c, s) =>
      Seq(c -> s, s -> c) }.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    // reference: LpaRounds alternating half-rounds, majority neighbor
    // label with ties to the smallest, non-updating/isolated keep
    var lbl: Map[Long, Long] = nodes.map(n => n -> n).toMap
    for (r <- 1 to operators.Graph.LpaRounds) {
      val updates = nodes.filter(n =>
        if (r % 2 == 0) n >= off else n < off).flatMap { n =>
        val votes = adj.getOrElse(n, Seq.empty).map(lbl)
        if (votes.isEmpty) None
        else {
          val counts = votes.groupBy(identity).map { case (l, v) => (l, v.size) }
          Some(n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1)
        }
      }.toMap
      lbl = lbl ++ updates
    }
    val want = {
      val sizes = lbl.values.groupBy(identity).map { case (l, v) => l -> v.size.toLong }
      lbl.map { case (n, l) => n -> (l, sizes(l)) }
    }
    val got = operators.Graph.graphCommunities(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"LPA differs: got ${got.size} nodes, want ${want.size}")
    // structure sanity: the dense trade graph must actually cluster
    // (labels propagate), and isolated nodes stay singletons
    assert(got.values.map(_._1).toSet.size < nodes.size,
      "no label ever propagated — LPA is inert")
    val isolated = nodes.toSet -- adj.keySet
    isolated.foreach { n =>
      assert(got(n) == ((n, 1L)), s"isolated node $n must keep its own singleton label")
    }
    val types = operators.Graph.graphCommunities(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    types.foreach { case (id, tp) => assert(tp == (if (id >= off) "s" else "c")) }
  }

  test("community_stats equals the in-memory modularity recomputation over the LPA labeling") {
    import org.apache.spark.sql.functions._
    val off = operators.Graph.SupplierNodeOffset
    // labels from the registered operator (already proven against the
    // in-JVM LPA reference above); recompute the card's integers
    val labels = operators.Graph.graphCommunities(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val t = Tables(spark, sf)
    val pairs = t.lineitem
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), (col("l_suppkey") + off).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val mirrored = pairs.flatMap { case (c, s) => Seq(c -> s, s -> c) }
    val mMir = mirrored.length.toLong
    val deg = mirrored.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    val want = labels.values.toSeq.distinct.sorted.map { lbl =>
      val members = labels.collect { case (n, l) if l == lbl => n }.toSet
      val dSum = members.toSeq.map(n => deg.getOrElse(n, 0L)).sum
      val eMir = mirrored.count { case (a, b) => members(a) && labels(b) == lbl }.toLong
      val q = (BigInt(eMir) * 1000000 / mMir -
        BigInt(dSum) * dSum * 1000000 / (BigInt(mMir) * mMir)).toLong
      (lbl, members.size.toLong, dSum, eMir / 2, q)
    }
    val got = operators.Graph.communityStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == want, s"modularity card differs:\ngot  $got\nwant $want")
    // the summed Q must sit in Newman's range; singleton communities
    // (isolated nodes) contribute exactly 0
    val totalQ = got.map(_._5).sum
    assert(totalQ >= -500000L && totalQ < 1000000L, s"global Q out of range: $totalQ")
    got.filter(_._2 == 1L).foreach { r =>
      if (r._3 == 0L) assert(r._5 == 0L, s"isolated singleton with nonzero q: $r")
    }
  }

  test("an LPA half-round keeps the loop plan discipline (no edge re-shuffle, no broadcast)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val off = operators.Graph.SupplierNodeOffset
      val edges = Seq((1L, off + 2L), (off + 2L, 1L), (2L, off + 2L), (off + 2L, 2L))
        .toDF("src", "dst").repartition(col("src")).localCheckpoint(true)
      val labels = Seq((1L, 1L), (2L, 2L), (off + 2L, off + 2L))
        .toDF("id", "lbl").repartition(col("id")).localCheckpoint(true)
      val round = operators.Graph.lpaRound(edges, labels, updateSuppliers = true)
      val plan = round.queryExecution.executedPlan.toString
      // budget: the (dst, lbl) count exchange + the dst argmax
      // exchange — the label join and join-back consume the existing
      // hash partitioning
      val perRound = "Exchange hashpartitioning\\([^)]*\\), ENSURE_REQUIREMENTS".r
        .findAllIn(plan).toSeq
      assert(perRound.size <= 2, s"half-round plans ${perRound.size} exchanges:\n$plan")
      assert(!perRound.exists(_.contains("src#")),
        s"the materialized edge list is being re-shuffled on src:\n$plan")
      assert(plan.contains("ShuffledHashJoin"), s"label join must be shuffled-hash:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"a half-round must not broadcast the node-count-sized label table:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }
}
