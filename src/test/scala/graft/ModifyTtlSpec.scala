package graft

import graft.mergetree.{ColumnarMergeTree, MergeTreeTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** ALTER TABLE … MODIFY TTL / REMOVE TTL: retention policy as mutable
  * metadata — the next materialization enforces the NEW predicate, a bad
  * policy fails at ALTER time, and the O(manifest) partition-drop fast
  * path follows the policy change.
  */
class ModifyTtlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  test("policy change is metadata-only and the next MATERIALIZE TTL enforces it") {
    val dir = Files.createTempDirectory("mttl_").toString
    import spark.implicits._
    val df = spark.range(100).select(col("id").as("k"), (col("id") % 10).as("day"))
    val t0 = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), ttl = Some("day < 2"))
    try {
      t0.insertBatch(df)
      // tighten the policy through the SQL verb; no data file touched yet
      val partsBefore = t0.parts.map(_.partId).toSet
      spark.sql(s"ALTER TABLE '$dir' MODIFY TTL 'day < 5'").collect()
      val t1 = ColumnarMergeTree.open(spark, dir)
      assert(t1.parts.map(_.partId).toSet == partsBefore, "MODIFY TTL must not rewrite parts")
      assert(t1.scan().count() == 100, "lazy TTL: rows visible until materialized")
      spark.sql(s"ALTER TABLE '$dir' MATERIALIZE TTL").collect()
      val t2 = ColumnarMergeTree.open(spark, dir)
      assert(t2.scan().count() == 50, "the NEW policy must be the one enforced")
      // REMOVE TTL: applyTtl afterwards must refuse
      spark.sql(s"ALTER TABLE '$dir' REMOVE TTL").collect()
      val t3 = ColumnarMergeTree.open(spark, dir)
      intercept[IllegalStateException](t3.applyTtl())
      t3.shutdown()
    } finally {
      t0.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("a bad policy fails at ALTER time, never inside a future merge") {
    val dir = Files.createTempDirectory("mttl_bad_").toString
    import spark.implicits._
    val df = spark.range(10).select(col("id").as("k"), col("id").as("v"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    try {
      t.insertBatch(df)
      intercept[IllegalArgumentException](t.modifyTtl(Some("nope < 5")))
      intercept[Exception](t.modifyTtl(Some("v +")))          // unparseable
      intercept[IllegalArgumentException](t.modifyTtl(Some("'x'"))) // no column refs
      // table unchanged after the refusals
      assert(ColumnarMergeTree.open(spark, dir).scan().count() == 10)
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("partition-drop fast path follows the modified policy") {
    val dir = Files.createTempDirectory("mttl_part_").toString
    import spark.implicits._
    val df = spark.range(90).select(col("id").as("k"), (col("id") % 3).as("day"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), partitionBy = Some("day"))
    try {
      t.insertBatch(df)
      assert(t.partCount == 3)
      val t1 = t.modifyTtl(Some("day < 1"))
      val removed = t1.applyTtl()
      assert(removed == 30 && t1.partCount == 2,
        "bare-column partition TTL must drop whole parts, O(manifest)")
      t1.shutdown()
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }
}
