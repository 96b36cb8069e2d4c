package graft

import graft.mergetree.{ColumnarMergeTree, MergeTreeConfig, MergeTreeTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** SYSTEM STOP/START MERGES and the `system 'mutations'` relation. */
class SystemMergesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  test("STOP MERGES pauses the background worker; START resumes; OPTIMIZE stays available") {
    val dir = Files.createTempDirectory("sysm_").toString
    import spark.implicits._
    val df = spark.range(100).select(col("id").as("k"), col("id").as("v"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"),
      config = MergeTreeConfig(maxParts = 2, enableBackgroundMerge = true,
        mergeIntervalSeconds = 1))
    try {
      spark.sql(s"SYSTEM STOP MERGES '$dir'").collect()
      assert(t.mergesStopped)
      (0 until 6).foreach(i => t.insertBatch(df.filter(col("k") % 6 === i)))
      Thread.sleep(2500) // > 2 worker wakes
      assert(t.partCount == 6, "worker must not compact while merges are stopped")
      // explicit OPTIMIZE is NOT gated (ClickHouse semantics)
      t.optimize()
      assert(t.partCount <= 2)
      (0 until 6).foreach(i => t.insertBatch(df.filter(col("k") % 6 === i)))
      spark.sql(s"SYSTEM START MERGES '$dir'").collect()
      assert(!t.mergesStopped)
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (t.partCount > 2 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(t.partCount <= 2, "worker must resume after START MERGES")
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("system 'mutations': pending tags listed in order, drained by OPTIMIZE FINAL") {
    val dir = Files.createTempDirectory("sysmut_").toString
    import spark.implicits._
    val df = spark.range(100).select(col("id").as("k"), (col("id") % 4).as("grp"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    try {
      t.insertBatch(df)
      t.deleteLightweight(col("grp") === 1)
      t.updateLightweight(col("grp") === 2, Map("grp" -> lit(3L)))
      val rows = spark.read.format("mergetree").option("system", "mutations")
        .load(dir).orderBy("part_id", "ord").collect()
      assert(rows.length == 2)
      assert(rows(0).getString(2) == "delete" && rows(0).getInt(1) == 0)
      assert(rows(1).getString(2) == "update" && rows(1).getInt(1) == 1)
      assert(rows(1).getString(4) != null && rows(1).getString(4).contains("grp"))
      // table-function face agrees
      val fn = spark.sql(s"SELECT kind FROM mutations_meta('$dir') ORDER BY ord").collect()
      assert(fn.map(_.getString(0)).toSeq == Seq("delete", "update"))
      t.optimizeFinal()
      assert(spark.sql(s"SELECT * FROM mutations_meta('$dir')").count() == 0)
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }
}
