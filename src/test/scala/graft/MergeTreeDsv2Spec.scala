package graft

import graft.mergetree._
import graft.sources.MergeTreeScan
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** DSv2 `mergetree` connector: schema, filter pushdown (driver-side part
  * pruning + parquet row-group predicate), column pruning, SQL access, and
  * agreement with the programmatic query path.
  */
class MergeTreeDsv2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def buildTable(): MergeTreeTable = {
    val t = MergeTreeTable.create(spark,
      Files.createTempDirectory("mt_dsv2_").toString)
    // three parts with disjoint key ranges → part pruning observable
    t.insertBatch(spark.range(100).map(i => KVRow(f"a$i%03d", s"va$i", i)), 1)
    t.insertBatch(spark.range(100).map(i => KVRow(f"m$i%03d", s"vm$i", i)), 1)
    t.insertBatch(spark.range(100).map(i => KVRow(f"z$i%03d", s"vz$i", i)), 1)
    t
  }

  test("reads a table with the declared schema and all rows") {
    val t = buildTable()
    val df = spark.read.format("mergetree").load(t.path)
    assert(df.schema == MergeTreeTable.schema)
    assert(df.count() == 300) // empty-projection (count) path works
    t.shutdown()
  }

  test("key-range filter prunes parts on the driver and rows stay correct") {
    val t = buildTable()
    val df = spark.read.format("mergetree").load(t.path)
      .filter(col("key") >= "m000" && col("key") <= "m049")
    val rows = df.collect()
    assert(rows.length == 50)
    assert(rows.forall(r => r.getString(0).startsWith("m")))
    val (planned, total) = MergeTreeScan.lastPruning.get()
    assert(total == 3 && planned == 1,
      s"expected 1/3 parts after manifest pruning, got $planned/$total")
    t.shutdown()
  }

  test("column pruning: projected read returns only requested columns") {
    val t = buildTable()
    val keys = spark.read.format("mergetree").load(t.path)
      .select("key").filter(col("key") < "a010").collect()
    assert(keys.length == 10 && keys.head.length == 1)
    t.shutdown()
  }

  test("SQL over the connector matches the programmatic query path") {
    val t = buildTable()
    spark.read.format("mergetree").load(t.path).createOrReplaceTempView("mt")
    val viaSql = spark.sql(
      """SELECT key, max(value) AS value, timestamp FROM mt
        |WHERE key BETWEEN 'a050' AND 'm010'
        |GROUP BY key, timestamp ORDER BY key, timestamp""".stripMargin)
      .as[KVRow].collect().toList
    val viaApi = t.query("a050", "m010").collect().toList
    assert(viaSql == viaApi)
    t.shutdown()
  }
}
