package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SURVEY §2.2 scans/sources/sinks row: the engine's tables interoperate
  * with the standard columnar/text sources — parquet (native), ORC, CSV
  * and JSON round-trip with schema preserved, so ingest from any of them
  * feeds the same MergeTree path.
  */
class SourceFormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  test("ORC round-trip preserves rows and schema") {
    val src = spark.read.parquet(s"$dir/customer.parquet")
    val out = Files.createTempDirectory("orc_rt_").toString
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == src.count())
    assert(back.schema == src.schema)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      src.orderBy("c_custkey").collect().toSeq)
  }

  test("CSV round-trip preserves rows and schema") {
    val src = spark.read.parquet(s"$dir/customer.parquet")
    val out = Files.createTempDirectory("csv_rt_").toString
    src.write.option("header", "true").mode("overwrite").csv(out)
    val back = spark.read.option("header", "true").schema(src.schema).csv(out)
    assert(back.count() == src.count())
    assert(back.schema == src.schema)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      src.orderBy("c_custkey").collect().toSeq)
  }

  test("JSON round-trip preserves rows; ingest feeds the MergeTree path") {
    import spark.implicits._
    val src = spark.read.parquet(s"$dir/nation.parquet")
    val out = Files.createTempDirectory("json_rt_").toString
    src.write.mode("overwrite").json(out)
    val back = spark.read.schema(src.schema).json(out)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
    // JSON → KVRow → MergeTree: any source feeds the same ingest path
    val t = graft.mergetree.MergeTreeTable.create(spark,
      Files.createTempDirectory("json_mt_").toString)
    t.insertBatch(back.select(
      col("n_name").as("key"),
      col("n_regionkey").cast("string").as("value"),
      col("n_nationkey").cast("long").as("timestamp"))
      .as[graft.mergetree.KVRow], 1)
    assert(t.totalRows == src.count())
    t.shutdown()
  }
}
