package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.concurrent.duration._
import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global

/** The conf-isolation contract of [[PlanScope]] (the r14 verdict's
  * one code-level defect class): a graph/cluster/dedup driver loop
  * pins AQE-off + the loop partition law for ITS OWN plans only — a
  * query planned on the caller's session, even concurrently with a
  * running loop, must keep session AQE and session shuffle
  * partitions, and the frame a loop returns must be bound back to
  * the caller's session so downstream composition plans under the
  * caller's conf.
  */
class PlanScopeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  private def sessionParts: String = spark.conf.get("spark.sql.shuffle.partitions")

  /** A representative relational plan on the PARENT session: a
    * shuffled aggregation whose executed plan shows both the AQE
    * wrapper and the conf-derived exchange width.
    */
  private def parentProbe() = {
    import spark.implicits._
    (1L to 64L).toDF("k").groupBy(col("k") % 7).agg(sum(col("k")))
  }

  private def assertParentPlanning(): Unit = {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "parent session AQE flag must never be touched by a scope")
    assert(sessionParts == "4",
      "parent session shuffle partitions must never be touched by a scope")
    val probe = parentProbe()
    assert(probe.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec],
      "a parent-session query must plan adaptively during a scope")
    // the exchange width comes from the SESSION conf, not the loop's
    assert(probe.queryExecution.executedPlan.toString.contains(", 4)"),
      "a parent-session exchange must be planned at the session width")
  }

  test("inside a static scope: the scoped session pins, the parent session doesn't move") {
    import spark.implicits._
    val input = (1L to 100L).toDF("v")
    val out = PlanScope.static(spark, 2) { scope =>
      assert(!(scope eq spark), "the scope must be a distinct session")
      assert(scope.sparkContext eq spark.sparkContext, "same context — shared storage")
      assert(scope.conf.get("spark.sql.adaptive.enabled") == "false")
      assert(scope.conf.get("spark.sql.shuffle.partitions") == "2")
      // the clone carries the caller's session state (time zone etc.)
      assert(scope.conf.get("spark.sql.session.timeZone") ==
        spark.conf.get("spark.sql.session.timeZone"))
      // a PARENT-session query planned mid-scope keeps session conf
      assertParentPlanning()
      // a scope-bound aggregation plans static at the pinned width
      val inScope = PlanScope.rebind(scope, input)
        .groupBy(col("v") % 5).agg(sum(col("v")).as("s"))
      assert(!inScope.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec],
        "a scope-bound query must plan without AQE")
      assert(inScope.queryExecution.executedPlan.toString.contains(", 2)"),
        "a scope-bound exchange must be planned at the law width")
      inScope
    }
    // the result is rebound to the CALLER: downstream composition
    // plans under the caller's conf again
    assert(out.sparkSession eq spark)
    val downstream = out.groupBy(lit(1)).agg(sum(col("s")).as("t"))
    assert(downstream.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec])
    assert(downstream.select(col("t")).head().getLong(0) == (1L to 100L).sum)
    assertParentPlanning()
  }

  test("rebind is plan surgery, not a copy: same rows, shared storage, zero jobs") {
    import spark.implicits._
    val m = Materialize.eager((1L to 10L).toDF("v"))
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val scope = org.apache.spark.sql.graftbridge.Bridge.cloneSession(spark)
    val rebound = PlanScope.rebind(scope, m)
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(jobsAfter == jobsBefore, "rebinding a materialized frame must run no job")
    assert(rebound.sparkSession eq scope)
    assert(rebound.as[Long].collect().sorted.toSeq == (1L to 10L))
    assert(PlanScope.rebind(spark, m) eq m, "rebind to the owning session is identity")
    Materialize.release(m)
  }

  test("a relational query planned CONCURRENTLY with a running LPA loop keeps session conf") {
    import spark.implicits._
    // a trade graph big enough that the loop spans several jobs
    val n = 30000L
    val customer = (1L to n).toDF("c_custkey")
    val supplier = (1L to 100L).toDF("s_suppkey")
    val orders = (1L to n).map(i => (i, i)).toDF("o_orderkey", "o_custkey")
    val lineitem = (1L to n).map(i => (i, i % 100 + 1)).toDF("l_orderkey", "l_suppkey")
    val loopStarted = new java.util.concurrent.CountDownLatch(1)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        loopStarted.countDown()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val fut = Future(
        operators.Graph.graphCommunitiesOn(customer, supplier, orders, lineitem))
      assert(loopStarted.await(60, java.util.concurrent.TimeUnit.SECONDS),
        "the loop must start jobs")
      // while the loop runs, the parent session must plan untouched;
      // sample repeatedly until the loop completes (≥1 sample is
      // guaranteed mid-loop by the latch; the rest harden the window)
      var samples = 0
      while (!fut.isCompleted && samples < 200) {
        assertParentPlanning()
        samples += 1
      }
      assert(samples >= 1)
      val out = Await.result(fut, 120.seconds)
      assert(out.sparkSession eq spark, "the loop result must be caller-bound")
      assert(out.count() == n + 100L)
      // and after the loop: still untouched
      assertParentPlanning()
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
