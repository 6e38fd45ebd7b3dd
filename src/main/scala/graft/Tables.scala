package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the star-schema parquet tables under one sf dir.
  *
  * Plain `spark.read.parquet` so Catalyst sees a native FileScan:
  * filters and projections in downstream operators push all the way
  * into the parquet reader (verified via explain — `PushedFilters`
  * / `ReadSchema`).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  import org.apache.spark.sql.functions.expr
  import org.apache.spark.sql.types.LongType

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.ts is TIMESTAMP(NANOS) in parquet; with
    * spark.sql.legacy.parquet.nanosAsLong it arrives as epoch-nanos
    * LONG — convert (integer `div`, no double precision loss) to a
    * µs timestamp so downstream time functions work unchanged.
    */
  def events: DataFrame = {
    val raw = t("events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
