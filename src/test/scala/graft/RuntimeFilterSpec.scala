package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime filtering evidence: with a selective filter on one join
  * side, Catalyst injects a bloom-filter semi-join that prunes the
  * fact scan BEFORE the shuffle — at 100 TB this is the difference
  * between shuffling the whole fact table and shuffling only rows
  * that can possibly match. The default size thresholds
  * (creation ≤ 10 MB build side, application ≥ 10 GB scan) target
  * production sizes, so the spec lowers them to demonstrate the
  * mechanism at test SF.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("local[4]", 4).getOrCreate()
  val sf = "/root/testdata/sf0.01"

  test("selective dim filter injects a bloom runtime filter on the fact side") {
    val conf = Map(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force a shuffle join so the filter has a shuffle to save
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val t = Tables(spark, sf)
      val sel = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      val joined = t.lineitem.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") || optimized.contains("bloom_filter"),
        s"no runtime bloom filter injected:\n${optimized.take(2000)}")
      // and it still computes the right answer
      val n = joined.collect().map(r => r.getAs[Long]("n")).sum
      val expect = t.lineitem.join(t.orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expect)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
