package graft

import graft.mergetree._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Rewrite-free ALTER TABLE ADD/DROP COLUMN: schema changes are tabledef
  * metadata only — old parts null-fill added columns at read, dropped
  * columns stop being projected, and later merges converge the physical
  * layout. No O(data) rewrite anywhere.
  */
class SchemaEvolutionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def baseDf = spark.range(100).select(
    col("id").as("k"), (col("id") % 5).cast("long").as("grp"))

  test("ADD COLUMN: old parts read as null, new batches carry values, merge converges") {
    val dir = Files.createTempDirectory("evo_add_").toString
    val t0 = ColumnarMergeTree.create(spark, dir, baseDf.schema,
      orderBy = Seq("k"), MergeTreeConfig(maxParts = 1))
    t0.insertBatch(baseDf.filter(col("k") < 50))
    val t1 = t0.addColumn("score", DoubleType)
    assert(t1.schema.fieldNames.toSeq == Seq("k", "grp", "score"))
    t1.insertBatch(baseDf.filter(col("k") >= 50)
      .withColumn("score", col("k") * 0.5))
    val rows = t1.scan().orderBy("k").collect()
    assert(rows.length == 100)
    assert(rows.take(50).forall(_.isNullAt(2)), "pre-ALTER parts null-fill")
    assert(rows.drop(50).forall(r => r.getDouble(2) == r.getLong(0) * 0.5))
    // a merge materializes the column physically in the rewritten part
    t1.optimize()
    val after = t1.scan().orderBy("k").collect()
    assert(after.length == 100 && after.take(50).forall(_.isNullAt(2)))
    // the SQL/DSv2 face serves the evolved schema from the same tabledef
    val viaSql = spark.read.format("mergetree").load(dir)
    assert(viaSql.schema.fieldNames.toSeq == Seq("k", "grp", "score"))
    assert(viaSql.count() == 100)
    assert(viaSql.filter(col("score").isNull).count() == 50)
  }

  test("DROP COLUMN: stops being projected; protected columns are refused") {
    val dir = Files.createTempDirectory("evo_drop_").toString
    val df = baseDf.withColumn("note", concat(lit("n"), col("k")))
    val t0 = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), partitionBy = Some("grp"))
    t0.insertBatch(df)
    val t1 = t0.dropColumn("note")
    assert(t1.schema.fieldNames.toSeq == Seq("k", "grp"))
    assert(t1.scan().columns.toSeq == Seq("k", "grp"))
    assert(t1.scan().count() == 100)
    // ORDER BY and PARTITION BY columns are protected
    intercept[IllegalArgumentException](t1.dropColumn("k"))
    intercept[IllegalArgumentException](t1.dropColumn("grp"))
    intercept[IllegalArgumentException](t1.dropColumn("nope"))
  }

  test("ADD COLUMN on a mode table: collapse still works across old and new parts") {
    val df = spark.range(60).select(
      (col("id") % 10).as("k"), col("id").as("ver"))
    val dir = Files.createTempDirectory("evo_mode_").toString
    val t0 = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), mode = MergeMode.Replacing(Seq("k"), "ver"))
    t0.insertBatch(df.filter(col("ver") < 30))
    val t1 = t0.addColumn("tag", StringType)
    t1.insertBatch(df.filter(col("ver") >= 30).withColumn("tag", lit("new")))
    val rows = t1.scan().orderBy("k").collect()
    assert(rows.length == 10)
    // every key's latest version (50..59) is in the new batch, tagged
    assert(rows.forall(r => r.getLong(1) >= 50 && r.getString(2) == "new"))
  }
}
