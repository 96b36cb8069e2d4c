package graft

import graft.mergetree.{ColumnarMergeTree, MergeTreeConfig, MergeTreeTable}
import graft.sources.QueryLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Learned write bounds on the generic engine: multi-file part writes
  * (batches AND merges) split on the live parts' row-group lead-key
  * distribution instead of repartitionByRange's sampling pass — which
  * reads every incoming batch (and every merge input) twice. Numeric lead
  * keys exercise the typed exchange ("10" must NOT sort after "9").
  */
class CmtLearnedBoundsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  private def awaitPlan(pred: String => Boolean): Boolean = {
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    while (!QueryLog.entries.exists(e => pred(e.plan)) && System.nanoTime() < deadline)
      Thread.sleep(20)
    QueryLog.entries.exists(e => pred(e.plan))
  }

  test("numeric-lead batches write via learned bounds; scans stay correct and ordered files balanced") {
    QueryLog.install(spark)
    val dir = Files.createTempDirectory("cmtlb_").toString
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def batch(n: Int) = spark.createDataset((0 until n).map(_ =>
      (rnd.nextLong(100000L), rnd.nextInt(100)))).toDF("k", "v")
    val t = ColumnarMergeTree.create(spark, dir, batch(1).schema,
      orderBy = Seq("k"), config = MergeTreeConfig(granuleSize = 256))
    try {
      // batch 1: empty table — sampling path (and it leaves ~80 row groups
      // of lead stats behind)
      t.insertBatch(batch(20000), partitions = 4)
      QueryLog.clear()
      // batch 2: learned-bounds path
      t.insertBatch(batch(20000), partitions = 4)
      assert(awaitPlan(p => p.contains("WriteFiles") && p.contains("BoundedRangeRepartition")),
        "steady-state generic write must plan the learned-bounds exchange")
      assert(!QueryLog.entries.exists(e =>
          e.plan.contains("WriteFiles") && e.plan.contains("rangepartitioning")),
        "no sampling exchange may appear in a steady-state generic write")
      assert(t.scan().count() == 40000)
      // numeric order, not string order: the max of each file's lead key
      // must be monotone across the second part's 4 range files
      val p2 = t.parts.maxBy(_.partId)
      val files = Files.list(Paths.get(s"$dir/${p2.dir}")).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).sorted
      assert(files.length == 4)
      val maxima = files.map(f =>
        spark.read.parquet(f).agg(max(col("k"))).head().getLong(0))
      assert(maxima.toSeq == maxima.sorted.toSeq,
        s"range files must tile the numeric key space in order: ${maxima.mkString(",")}")
      // merges also take the learned path (inputs already carry stats)
      QueryLog.clear()
      t.optimize()
      assert(t.scan().count() == 40000)
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("partition-scoped bounds: each partition learns its own distribution") {
    QueryLog.install(spark)
    val dir = Files.createTempDirectory("cmtlb_part_").toString
    import spark.implicits._
    // two partitions with DISJOINT key ranges — table-wide bounds would
    // put one partition's whole batch into few files
    def batch(lo: Long, n: Int, tag: String) = spark.createDataset(
      (0 until n).map(i => (lo + i, tag))).toDF("k", "part")
    val t = ColumnarMergeTree.create(spark,
      dir, batch(0, 1, "a").schema, orderBy = Seq("k"),
      partitionBy = Some("part"), config = MergeTreeConfig(granuleSize = 128))
    try {
      t.insertBatch(batch(0L, 8000, "a").unionByName(batch(1000000L, 8000, "b")))
      // second round: rewrite each partition through writePart with n>1
      t.replacePartition("a", batch(0L, 8000, "a"))
      assert(t.scanPartitions(Seq("a")).count() == 8000)
      assert(t.scanPartitions(Seq("b")).count() == 8000)
      assert(t.scan().count() == 16000)
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }
}
