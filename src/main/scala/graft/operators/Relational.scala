package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator pack (SURVEY §2 q1–q14).
  *
  * Every query is declarative DataFrame API — Catalyst handles
  * pushdown, join strategy, and whole-stage codegen. Outputs are
  * deterministic (explicit ORDER BY with full tie-breaks, exact
  * decimal money arithmetic via [[graft.Exact]]) so the DuckDB
  * oracle hash-matches at any parallelism.
  */
object Relational {
  import Exact._

  /** q1_agg — TPC-H Q1 shape: scan-filter + groupBy multi-aggregate.
    * Reference analog: the windowed avg/min/max aggregation pattern
    * of /root/reference/src/flink_job.py:104-122, as a batch
    * aggregate. Map-side partial aggregation then a 2-key shuffle;
    * at 100 TB this is scan-bound (filter + 7 columns pushed to
    * parquet).
    */
  def q1(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        intSum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
          * (lit(1) + dec2(col("l_tax")))).cast("double").as("sum_charge"),
        intAvg(col("l_quantity")).as("avg_qty"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        moneyAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
}
