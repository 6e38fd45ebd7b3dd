package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Dirty-input ingestion policy, pinned: at 100 TB some rows ARE
  * malformed, and the difference between PERMISSIVE (quarantine via
  * _corrupt_record), DROPMALFORMED (silent loss), and FAILFAST
  * (abort) is an operational decision that must be explicit, not
  * discovered in production. The JSON path's null-on-invalid contract
  * (parse_event semantics) is covered by FastParseSpec; this spec
  * pins the CSV reader's three modes plus the quarantine-column
  * pattern the curation pipeline uses for reprocessing.
  */
class MalformedIngestSpec extends AnyFunSuite {
  lazy val spark = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("value", DoubleType),
    StructField("tag", StringType)))

  private def writeDirtyCsv(): String = {
    val dir = new java.io.File("target/tmp/dirty_csv")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(dir); dir.mkdirs()
    val lines = Seq(
      "id,value,tag",
      "1,10.5,ok",
      "2,not-a-number,bad-double", // type error
      "3,30.25,ok",
      "4,40.0,ok")
    java.nio.file.Files.write(new java.io.File(dir, "part.csv").toPath,
      lines.mkString("\n").getBytes("UTF-8"))
    dir.getPath
  }

  test("PERMISSIVE quarantines malformed rows in _corrupt_record; clean rows survive") {
    val path = writeDirtyCsv()
    val withQuarantine = schema.add("_corrupt_record", StringType)
    val df = spark.read.schema(withQuarantine)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path).cache() // corrupt-column queries need the cached full parse
    val bad = df.filter(col("_corrupt_record").isNotNull).collect()
    val good = df.filter(col("_corrupt_record").isNull).collect()
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record").contains("not-a-number"))
    assert(bad.head.getAs[Long]("id") == 2L, "well-typed fields of a bad row still parse")
    assert(good.map(_.getAs[Long]("id")).sorted.toSeq == Seq(1L, 3L, 4L))
    df.unpersist()
  }

  test("DROPMALFORMED silently drops the bad row; FAILFAST aborts the read") {
    val path = writeDirtyCsv()
    val dropped = spark.read.schema(schema)
      .option("header", "true").option("mode", "DROPMALFORMED").csv(path)
    assert(dropped.collect().map(_.getAs[Long]("id")).sorted.toSeq == Seq(1L, 3L, 4L))
    val failing = spark.read.schema(schema)
      .option("header", "true").option("mode", "FAILFAST").csv(path)
    val e = intercept[Exception] { failing.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null &&
      (m.contains("Malformed") || m.contains("FAILFAST") || m.contains("not-a-number"))),
      s"unexpected failure: ${messages(e)}")
  }
}
