package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) interleaving
  * (SURVEY §2 #63). The 100 TB problem this solves: a table laid out
  * by ONE column prunes scans on that column only — a predicate on a
  * second dimension reads every file. Interleaving the bits of two
  * dimensions into one sort key gives every file a bounded min/max
  * rectangle in BOTH dimensions, so file/row-group stats prune scans
  * on either (the Delta/Iceberg OPTIMIZE ZORDER design, e.g.
  * delta-io/delta's SpaceFillingCurveClustering).
  *
  * Dimensions are first hash-bucketized to 8 bits ([[ByteBuckets]]).
  * Production systems bucketize by per-column RANGE IDS (quantiles)
  * for the same reason — equalizing the bit-significance of skewed
  * dimensions; the fixed modulus here keeps the math engine-exact so
  * the DuckDB oracle can replicate the interleave bit-for-bit (a
  * quantile bucketizer would be data/parallelism-dependent).
  *
  * Scale shape: zval is pure map-side bit arithmetic inside codegen;
  * the layout write is one range-shuffle on zval (the same shuffle a
  * plain sorted write costs). ZOrderSpec measures the payoff: files
  * actually pruned for a second-dimension box predicate.
  */
object Layout {

  /** Per-dimension bucket count (8 bits each → 16-bit Morton code). */
  val ByteBuckets = 256L

  /** Bit-spread steps for one 8-bit dimension: after the fold, bit i
    * of the input sits at bit 2i (the even positions). Shared source
    * of truth for the Column expression and the oracle SQL.
    */
  val SpreadSteps: Seq[(Int, Long)] = Seq((4, 0x0F0FL), (2, 0x3333L), (1, 0x5555L))

  /** Spread an 8-bit value to the even bit positions (codegen'd
    * bitwise chain, no UDF).
    */
  def spread8(c: Column): Column =
    SpreadSteps.foldLeft(c.bitwiseAND(lit(255L))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 16-bit Morton code of two 8-bit bucket ids: x on even bits, y on
    * odd bits.
    */
  def zval8(x: Column, y: Column): Column =
    spread8(x).bitwiseOR(shiftleft(spread8(y), 1))

  /** The identical spread chain as oracle SQL (same constants, same
    * order — injected so engine and oracle cannot drift).
    */
  def spreadSql(e: String): String =
    SpreadSteps.foldLeft(s"(($e) & 255)") { case (x, (s, m)) =>
      s"(($x | ($x << $s)) & $m)"
    }

  /** q29_zorder — the Morton key for lineitem in the
    * (part-bucket, order-bucket) plane, plus the bucket ids whose
    * file-level min/max later drive the pruning. Both driver columns
    * span the full 0..255 range, so each contributes equal bit
    * significance.
    */
  def q29(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        pmod(col("l_partkey"), lit(ByteBuckets)).as("x8"),
        pmod(col("l_orderkey"), lit(ByteBuckets)).as("y8"))
      .withColumn("zval", zval8(col("x8"), col("y8")))
      .orderBy(col("zval"), col("l_orderkey"), col("l_linenumber"))
  }

  /** Write `df` clustered by the Z-curve over (xCol, yCol) buckets:
    * one range shuffle on the Morton key, files carry tight min/max
    * rectangles on BOTH bucket columns. The bucket columns are
    * materialized (that is what file-skipping stats index).
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String,
      nFiles: Int, path: String): Unit =
    df.withColumn("x8", pmod(col(xCol), lit(ByteBuckets)))
      .withColumn("y8", pmod(col(yCol), lit(ByteBuckets)))
      .withColumn("__z", zval8(col("x8"), col("y8")))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** The one-dimensional baseline: same write, laid out by xCol's
    * bucket only.
    */
  def linearWrite(df: DataFrame, xCol: String, yCol: String,
      nFiles: Int, path: String): Unit =
    df.withColumn("x8", pmod(col(xCol), lit(ByteBuckets)))
      .withColumn("y8", pmod(col(yCol), lit(ByteBuckets)))
      .repartitionByRange(nFiles, col("x8"))
      .sortWithinPartitions(col("x8"))
      .write.mode("overwrite").parquet(path)
}
