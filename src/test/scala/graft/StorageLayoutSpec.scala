package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof of the SURVEY §5 storage-layout claims on real writes:
  * bucketing co-locates a join (no Exchange on bucketed sides) and
  * date-partitioned layout prunes partitions at the scan.
  */
class StorageLayoutSpec extends AnyFunSuite {
  lazy val spark = {
    val s = GraftSession.builder("local[4]", 4)
      .config("spark.sql.warehouse.dir", "target/tmp/warehouse")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast join
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"

  /** Drop the table AND its physical location: the suites share one
    * session (getOrCreate), so this spec's warehouse config may not
    * win, and an orphaned location from a crashed run would otherwise
    * fail CREATE with LOCATION_ALREADY_EXISTS.
    */
  private def dropHard(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val dir = new java.io.File(wh, name)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("bucketed tables join without a shuffle on either side") {
    val t = Tables(spark, sf)
    dropHard("li_b")
    dropHard("ord_b")
    t.lineitem.select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    t.orders.select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_b")
    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")))
    val plan = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(joined.count() > 0)
    // co-located bucket join: the join itself needs no Exchange
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0, plan)
    assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
  }

  test("date-partitioned write prunes partitions at the scan") {
    val t = Tables(spark, sf)
    val path = "target/tmp/orders_by_status"
    t.orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    val one = spark.read.parquet(path).filter(col("o_orderstatus") === "F")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("o_orderstatus"), plan)
    // pruned scan reads strictly fewer files than the full table scan
    val all = spark.read.parquet(path)
    assert(one.count() < all.count())
    val prunedFiles = one.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(prunedFiles.contains("o_orderstatus=F") || plan.contains("isnotnull"))
  }

  test("dynamic partition overwrite replaces only the touched partitions") {
    val t = Tables(spark, sf)
    val path = "target/tmp/orders_dyn_overwrite"
    t.orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    val before = spark.read.parquet(path)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rewrite ONLY status 'F' with a 10-row slice; under DYNAMIC
    // overwrite the other partitions must survive untouched (STATIC —
    // Spark's default — would wipe the whole table first)
    val slice = Tables(spark, sf).orders
      .filter(col("o_orderstatus") === "F").limit(10)
    slice.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("o_orderstatus").parquet(path)
    val after = spark.read.parquet(path)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("F") == 10L, s"overwritten partition: ${after("F")}")
    for ((k, v) <- before if k != "F")
      assert(after(k) == v, s"untouched partition $k changed: ${after.get(k)} vs $v")
  }

  test("ORC round-trip preserves the binary media table bit-exactly") {
    val media = graft.multimodal.Multimodal.mediaTable(spark, sf)
    val path = "target/tmp/media_orc"
    media.write.mode("overwrite").format("orc").save(path)
    val back = spark.read.format("orc").load(path)
    assert(back.schema == media.schema)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("mime"), r.getAs[Long]("n_bytes"),
        java.util.Arrays.hashCode(r.getAs[Array[Byte]]("payload")))
    }.sortBy(_._1).toSeq
    assert(key(back) == key(media))
    // predicate pushdown reaches the ORC scan too
    val plan = back.filter(col("n_bytes") > 100L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_bytes"), plan)
  }
}
