package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Dev A/B for the LPA half-round exchange cut (round-16 ADVICE fix:
  * the round-15 copy compared Graph.lpaRound against itself after
  * the one-exchange shape SHIPPED — `oldRound` is now the shipped
  * skew-safe fallback [[operators.Graph.lpaRoundSkewSafe]], which IS
  * the pre-r15 two-exchange body, so the A/B is meaningful again):
  * the default half-round ([[operators.Graph.lpaRound]]) pre-
  * partitions the joined (dst, lbl) rows by dst alone so both
  * aggregations and the join-back plan zero-exchange behind ONE
  * exchange; the skew-safe shape exchanges twice (partial-agged
  * (dst,lbl) pairs to hash(dst,lbl), then the counted rows to
  * hash(dst)) and its map-side combine is the hub protection —
  * the trade LpaSkewBench measures. Runs the REAL fixpoint driver
  * (cycle stepping, lazy first half, carry column, release
  * discipline) with the round function parameterized, alternating
  * variants, and asserts label equality once per dir.
  * runMain graft.DebugLpa <dir> [n]
  */
object DebugLpa {

  type Round = (DataFrame, DataFrame, Boolean, Boolean) => DataFrame

  /** The real fixpoint driver with the round function parameterized —
    * identical cycle stepping, lazy first half, carry column and
    * release discipline to [[operators.Graph.lpaFixpoint]], shared
    * with LpaSkewBench so both harnesses measure the shipped loop
    * shape, not an approximation.
    */
  def fixpoint(nodes: DataFrame, edges: DataFrame, round: Round): DataFrame = {
    import operators.Graph
    var labels = Materialize.eager(
      nodes.select(col("id"), col("id").as("lbl")).repartition(col("id")))
    val cap = Graph.lpaCapHalfRounds(labels.count())
    var r = 0
    var converged = false
    while (!converged && r < cap) {
      val half1 = Materialize.round(round(edges, labels, false, false))
      val half2 = Materialize.round(round(edges, half1, true, true))
      val row = half2.agg(
        coalesce(sum(col("pchg")), lit(0L)).as("c1"),
        coalesce(sum(col("chg")), lit(0L)).as("c2")).head()
      r += 2
      Materialize.release(labels)
      Materialize.release(half1)
      labels = half2
      converged = row.getLong(0) == 0L && row.getLong(1) == 0L
    }
    val out = Materialize.eager(labels.select(col("id"), col("lbl"),
      lit(r.toLong).as("rounds_used"), lit(if (converged) 1L else 0L).as("converged")))
    Materialize.release(labels)
    out
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators.Graph

    val oldRound: Round = (edges, labels, updateSuppliers, carryPrev) =>
      Graph.lpaRoundSkewSafe(edges, labels, updateSuppliers, carryPrev)

    val newRound: Round = (edges, labels, updateSuppliers, carryPrev) =>
      Graph.lpaRound(edges, labels, updateSuppliers, carryPrev)

    def runOnce(tag: String, round: Round): (Long, Long) = {
      CacheLedger.drain(spark); System.gc()
      val t0 = System.nanoTime()
      val t = Tables(spark, dir)
      val parts = Graph.loopShufflePartitions(spark, t.lineitem.count())
      val out = PlanScope.static(spark, parts) { loop =>
        val tl = Tables(loop, dir)
        val nodes = tl.customer.select((col("c_custkey") * 2).as("id"))
          .unionAll(tl.supplier.select((col("s_suppkey") * 2 + 1).as("id")))
        val edges = Graph.mirroredTradeEdges(tl.orders, tl.lineitem)
        try fixpoint(nodes, edges, round)
        finally Materialize.release(edges)
      }
      // order-free result fingerprint, consumed within the run (a
      // retained frame would not survive the next run's drain)
      val r = out.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(id, lbl, rounds_used, converged))"), lit(0L))).head()
      Materialize.release(out)
      println(f"[debuglpa] $tag $dir ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        s" rows=${r.getLong(0)} fp=${r.getLong(1)}")
      (r.getLong(0), r.getLong(1))
    }

    val fa = runOnce("old-eq", oldRound)
    val fb = runOnce("new-eq", newRound)
    require(fa == fb, s"variants diverge: $fa vs $fb")
    println(s"[debuglpa] equality OK (${fa._1} rows, fp match)")

    for (i <- 1 to n; (tag, rd) <- Seq("old" -> oldRound, "new" -> newRound))
      runOnce(s"$tag run$i", rd)
    spark.stop()
  }
}
