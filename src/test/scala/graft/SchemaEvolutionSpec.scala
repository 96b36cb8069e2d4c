package graft

import graft.mergetree._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}
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

  test("catalog SQL face: CREATE / INSERT / ALTER ADD,DROP,TYPE / SHOW / RENAME / DROP, pure SQL") {
    // The whole lifecycle driven by spark.sql(...) against the name-addressed
    // GraftCatalog — no Scala table handle anywhere. The catalog maps
    // gsql.evo.t -> <warehouse>/evo/t holding the same tabledef.json the
    // API writes, and ALTER delegates to the rewrite-free evolution.
    val wh = Files.createTempDirectory("graft_wh_").toString
    spark.conf.set("spark.sql.catalog.gsql", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsql.warehouse", wh)
    spark.sql("CREATE TABLE gsql.evo.t (k BIGINT, grp BIGINT) USING mergetree " +
      "OPTIONS (orderBy 'k')")
    spark.sql("INSERT INTO gsql.evo.t SELECT id, id % 5 FROM range(50)")
    spark.sql("ALTER TABLE gsql.evo.t ADD COLUMN score DOUBLE")
    spark.sql("INSERT INTO gsql.evo.t SELECT id, id % 5, id * 0.5 FROM range(50, 100)")
    val rows = spark.sql("SELECT * FROM gsql.evo.t ORDER BY k").collect()
    assert(rows.length == 100)
    assert(rows.take(50).forall(_.isNullAt(2)), "pre-ALTER parts null-fill via SQL read")
    assert(rows.drop(50).forall(r => r.getDouble(2) == r.getLong(0) * 0.5))
    // widen INT -> BIGINT purely from SQL
    spark.sql("CREATE TABLE gsql.evo.w (k BIGINT, n INT) USING mergetree " +
      "OPTIONS (orderBy 'k')")
    spark.sql("INSERT INTO gsql.evo.w VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE gsql.evo.w ALTER COLUMN n TYPE BIGINT")
    assert(spark.table("gsql.evo.w").schema("n").dataType == LongType)
    assert(spark.sql("SELECT sum(n) AS s FROM gsql.evo.w").first().getLong(0) == 30L)
    // BIGINT->DOUBLE passes Spark's own up-cast check but is lossy for the
    // engine (>2^53 keys) — the API's widen guard must refuse through SQL too.
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gsql.evo.w ALTER COLUMN n TYPE DOUBLE"))
    assert(e.getMessage.contains("widen"))
    spark.sql("ALTER TABLE gsql.evo.t DROP COLUMN score")
    assert(spark.table("gsql.evo.t").columns.toSeq == Seq("k", "grp"))
    assert(spark.sql("SELECT count(*) FROM gsql.evo.t").first().getLong(0) == 100L)
    // catalog bookkeeping verbs
    assert(spark.sql("SHOW TABLES IN gsql.evo").collect()
      .map(_.getString(1)).toSet == Set("t", "w"))
    spark.sql("ALTER TABLE gsql.evo.w RENAME TO evo.w2")
    assert(spark.sql("SELECT count(*) FROM gsql.evo.w2").first().getLong(0) == 2L)
    spark.sql("DROP TABLE gsql.evo.w2")
    assert(spark.sql("SHOW TABLES IN gsql.evo").collect()
      .map(_.getString(1)).toSet == Set("t"))
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

  test("MODIFY COLUMN widening: int parts read as long, no rewrite, SQL face follows") {
    val df = spark.range(100).select(
      col("id").as("k"), (col("id") % 7).cast("int").as("v"))
    val dir = Files.createTempDirectory("evo_widen_").toString
    val t0 = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), MergeTreeConfig(maxParts = 1))
    t0.insertBatch(df.filter(col("k") < 50))
    val partsBefore = t0.parts.map(_.partId).toSet
    val t1 = t0.widenColumn("v", LongType)
    assert(t1.schema("v").dataType == LongType)
    assert(t1.parts.map(_.partId).toSet == partsBefore, "widening rewrites NO part")
    // old int32 parts up-convert at scan; values intact
    val got = t1.scan().orderBy("k").collect()
    assert(got.forall(r => r.getLong(1) == r.getLong(0) % 7))
    // new batches land the wide type; both generations scan together
    t1.insertBatch(df.filter(col("k") >= 50).withColumn("v", col("v").cast("long") + 100L))
    assert(t1.scan().filter(col("v") >= 100L).count() == 50)
    assert(t1.scan().agg(max("v")).head.getLong(0) == 106L)
    // the DSv2/SQL face serves the widened schema (vectorized reader path)
    val viaSql = spark.read.format("mergetree").load(dir)
    assert(viaSql.schema("v").dataType == LongType)
    assert(viaSql.agg(sum("v")).head.getLong(0) ==
      t1.scan().agg(sum("v")).head.getLong(0))
    // a merge materializes the wide type physically
    t1.optimize()
    assert(t1.scan().count() == 100)
    // refusals: narrowing, non-numeric, float structural column
    intercept[IllegalArgumentException](t1.widenColumn("v", IntegerType))
    intercept[IllegalArgumentException](t1.widenColumn("missing", LongType))
    val tf = ColumnarMergeTree.create(spark,
      Files.createTempDirectory("evo_widenf_").toString,
      spark.range(1).select(col("id").cast("float").as("k")).schema,
      orderBy = Seq("k"))
    intercept[IllegalArgumentException](tf.widenColumn("k", DoubleType))
  }

  test("widening the ORDER BY key keeps part pruning and key bounds working") {
    val df = spark.range(1000).select(col("id").cast("int").as("k"),
      col("id").as("v"))
    val dir = Files.createTempDirectory("evo_widenkey_").toString
    val t0 = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), MergeTreeConfig(maxParts = 100))
    t0.insertBatch(df.filter(col("k") < 500))
    val t1 = t0.widenColumn("k", LongType)
    t1.insertBatch(df.filter(col("k") >= 500)
      .withColumn("k", col("k").cast("long")))
    // manifest bounds are numeric strings — width-blind; range scans prune
    val got = t1.rangeScan(100L, 109L).orderBy("k").collect().map(_.getLong(0)).toList
    assert(got == (100L to 109L).toList)
    assert(t1.lastPruning._1 == 1 && t1.lastPruning._2 == 2,
      s"pre-widen part must still prune: ${t1.lastPruning}")
  }
}
