package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline data-quality operators (SURVEY §2 #68-69): constraint
  * verification over the warehouse tables (the Deequ/
  * great-expectations capability class, engine-native) and
  * distribution-drift detection between corpus splits — the checks a
  * production ingest runs before letting data reach training.
  */
object Quality {

  /** dq_check — declarative constraint verification over the star
    * schema: uniqueness, completeness, referential integrity,
    * value-range and accepted-value constraints, one result row per
    * constraint with checked/violation counts and a pass flag.
    *
    * Scale shape: every constraint is ONE aggregation over its
    * table — conditional counts (map-side combinable; completeness,
    * ranges, accepted values), a distinct-count (uniqueness), or a
    * broadcast-dim anti-join count (referential integrity: the
    * orphan side is the FACT table, which never shuffles — the key
    * set joins in the scan stage). Each produces a 1-row result;
    * the union is constraint-count-sized. The per-constraint scalar
    * aggregations are the documented multi-scalar plan class (one
    * single-partition exchange per constraint — bounded by the
    * CONSTRAINT LIST, a code constant, never by data).
    */
  def dqCheck(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    dqCheckOn(t.customer, t.orders, t.lineitem)
  }

  private[graft] def dqCheckOn(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    def result(name: String, checked: Column, violations: Column)(df: DataFrame): DataFrame =
      df.agg(checked.cast("long").as("n_checked"),
          violations.cast("long").as("n_violations"))
        .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"),
          (col("n_violations") === 0L).cast("long").as("pass"))

    val uniqueCust = result("unique_c_custkey",
      count(lit(1)), count(lit(1)) - countDistinct(col("c_custkey")))(customer)
    val uniqueOrder = result("unique_o_orderkey",
      count(lit(1)), count(lit(1)) - countDistinct(col("o_orderkey")))(orders)
    val completeCust = result("complete_c_name",
      count(lit(1)), sum(when(col("c_name").isNull, 1L).otherwise(0L)))(customer)
    val qtyRange = result("range_l_quantity_1_50",
      count(lit(1)),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L)))(lineitem)
    val discRange = result("range_l_discount_0_01",
      count(lit(1)),
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L).otherwise(0L)))(lineitem)
    val flagVals = result("accepted_l_returnflag",
      count(lit(1)),
      sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L)))(lineitem)
    // referential integrity: fact-side orphans via a broadcast-dim
    // anti join — o_custkey ⊆ customer, l_orderkey ⊆ orders. The
    // build side is the DISTINCT key set: a duplicated dimension key
    // must not fan out the probe (QualitySpec's planted-duplicate
    // fixture caught exactly that — n_checked inflated past the
    // fact-row count)
    val orphanOrders = result("ref_o_custkey_in_customer",
      count(lit(1)), sum(when(col("c_custkey").isNull, 1L).otherwise(0L)))(
      orders.join(broadcast(customer.select(col("c_custkey")).distinct()),
        col("o_custkey") === col("c_custkey"), "left"))
    val orphanLines = result("ref_l_orderkey_in_orders",
      count(lit(1)), sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)))(
      lineitem.select(col("l_orderkey")).join(
        broadcast(orders.select(col("o_orderkey")).distinct()),
        col("l_orderkey") === col("o_orderkey"), "left"))

    Seq(uniqueCust, uniqueOrder, completeCust, qtyRange, discRange,
        flagVals, orphanOrders, orphanLines)
      .reduce(_ unionAll _)
      .orderBy(col("check_name"))
  }

  /** Length-bucket width and score-band count for [[driftCheck]]. */
  val DriftLenBucket = 50L
  val DriftLenMax = 9L

  /** drift_check — distribution-shift card between the corpus's
    * even/odd doc_id halves (the two-snapshot comparison an ingest
    * pipeline runs between yesterday's and today's crawl): for each
    * feature (language, words-length decile bucket), the early/late
    * bucket counts, the expected late count under the early
    * distribution, and an integer chi-square contribution
    * (late − expected)²·10⁶ div max(expected, 1) — all on the
    * integer lattice (no ln, no float), so a PSI-class drift flag
    * reduces to summing contributions downstream.
    *
    * Scale shape: ONE corpus scan, one (feature, bucket, half)
    * aggregation (map-side combinable — bucket spaces are fixed and
    * tiny), a pivot on the half, and the 1-row (N_early, N_late)
    * scalar broadcast (the word_pmi class). Buckets with mass in
    * either half appear; a bucket present only late (novel language
    * — the strongest drift signal) reads expected = 0.
    */
  def driftCheck(spark: SparkSession, dir: String): DataFrame =
    driftCheckOn(Tables(spark, dir).documents)

  /** The (feature, bucket) pair generator shared by the batch card
    * and the streaming gate ([[graft.streaming.DriftStream]]) — one
    * definition, so stream and batch bucket identically. Input needs
    * `lang` and `text`.
    */
  private[graft] def featurePairs: org.apache.spark.sql.Column = {
    import graft.functions.TextFunctions.words
    explode(array(
      struct(lit("lang").as("feature"), col("lang").as("bucket")),
      struct(lit("len").as("feature"),
        concat(lit("b"), least(lit(DriftLenMax),
          (size(words(col("text"))) / DriftLenBucket).cast("long"))).as("bucket"))))
  }

  private[graft] def driftCheckOn(docs: DataFrame): DataFrame = {
    val buckets = docs
      .select((col("doc_id") % 2 === 1).cast("long").as("late"),
        featurePairs.as("f"))
      .groupBy(col("f.feature").as("feature"), col("f.bucket").as("bucket"))
      .agg(sum(when(col("late") === 0L, 1L).otherwise(0L)).as("early_cnt"),
        sum(col("late")).as("late_cnt"))
    val totals = docs
      .select((col("doc_id") % 2 === 1).cast("long").as("late"))
      .agg(
      sum(when(col("late") === 0L, 1L).otherwise(0L)).as("n_early"),
      sum(col("late")).as("n_late"))
    buckets.crossJoin(broadcast(totals))
      .select(col("feature"), col("bucket"), col("early_cnt"), col("late_cnt"),
        when(col("n_early") > 0,
          expr("CAST(CAST(early_cnt AS DECIMAL(38,0)) * n_late div n_early AS BIGINT)"))
          .otherwise(lit(0L)).as("expected"))
      .withColumn("chi2_ppm", expr(
        "CAST(CAST(late_cnt - expected AS DECIMAL(38,0)) * (late_cnt - expected)" +
          " * 1000000 div greatest(CAST(expected AS DECIMAL(38,0)), 1) AS BIGINT)"))
      .orderBy(col("feature"), col("bucket"))
  }
}
