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

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
