package graft

import graft.mergetree.{ColumnarMergeTree, KVRow, KeySample, MergeTreeConfig, MergeTreeTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** The r14-advice guards on metadata-derived range bounds:
  *
  *  - monotonic/append-keyed ingest must NOT permanently degenerate to
  *    one-file parts (every batch's keys above all learned bounds routed
  *    the whole batch to the tail partition, steady-state, with nothing
  *    re-triggering the sampling fallback);
  *  - sampleless parts' endpoint masses must not feed the scan-side range
  *    exchange when they dominate (they collapse onto ~3 percentile
  *    positions on unclustered tables — worse than one sampling pass);
  *  - parts past the driver sampling ceiling get an executor-side
  *    decimated sample instead of carrying none.
  */
class LearnedBoundsGuardSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  private def parquetFiles(dir: String): Seq[String] = {
    val s = Files.list(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toList
    } finally s.close()
  }

  test("KV engine: monotonic-key batches fall back to sampling and stay balanced") {
    val dir = Files.createTempDirectory("lbg_kv_").toString
    import spark.implicits._
    val t = MergeTreeTable.create(spark, dir, MergeTreeConfig(localScanMaxRows = 0))
    def batch(lo: Int, n: Int) = spark.createDataset(
      (lo until lo + n).map(i => KVRow(f"k$i%08d", s"v$i", i.toLong)))
    try {
      t.insertBatch(batch(0, 40000), partitions = 4)       // first: sampling
      t.insertBatch(batch(40000, 40000), partitions = 4)   // staircase not yet visible: may misroute
      // two parts now form the staircase — every later batch must sample
      for (b <- 2 to 3) {
        t.insertBatch(batch(b * 40000, 40000), partitions = 4)
        val p = t.parts.maxBy(_.partId)
        val files = parquetFiles(s"$dir/part_${p.partId}")
        assert(files.length == 4,
          s"monotonic batch $b must range-split 4 ways (staircase -> sampling), got ${files.length} file(s)")
        val counts = files.map(f => spark.read.parquet(f).count())
        assert(counts.max < 20000,
          s"batch $b files must be balanced, got ${counts.mkString(",")}")
      }
      assert(t.fullScan().count() == 160000)
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("generic engine: monotonic numeric-lead batches fall back to sampling and stay balanced") {
    val dir = Files.createTempDirectory("lbg_cmt_").toString
    import spark.implicits._
    def batch(lo: Long, n: Int) = spark.createDataset(
      (0 until n).map(i => (lo + i, s"v$i"))).toDF("k", "v")
    val t = ColumnarMergeTree.create(spark, dir, batch(0, 1).schema,
      orderBy = Seq("k"), config = MergeTreeConfig(granuleSize = 512))
    try {
      t.insertBatch(batch(0L, 20000), partitions = 4)
      t.insertBatch(batch(1000000L, 20000), partitions = 4) // staircase not yet visible
      // staircase of 2 → every later monotonic batch must sample + balance
      for (b <- 2 to 3) {
        t.insertBatch(batch(b * 1000000L, 20000), partitions = 4)
        val p = t.parts.maxBy(_.partId)
        val files = parquetFiles(s"$dir/${p.dir}")
        assert(files.length == 4,
          s"monotonic batch $b must range-split 4 ways (staircase -> sampling), got ${files.length} file(s)")
        val counts = files.map(f => spark.read.parquet(f).count())
        assert(counts.max < 10000, s"batch $b files must be balanced, got ${counts.mkString(",")}")
      }
      assert(t.scan().count() == 80000)
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("endpoint-mass domination (sampleless unclustered parts) surrenders the scan-side exchange") {
    val dir = Files.createTempDirectory("lbg_ep_").toString
    import spark.implicits._
    val cfg = MergeTreeConfig(localScanMaxRows = 0)
    val t = MergeTreeTable.create(spark, dir, cfg)
    val rnd = new scala.util.Random(7)
    def randBatch(n: Int) = spark.createDataset(
      (0 until n).map(i => KVRow(f"k${rnd.nextInt(1000000)}%07d", "v", rnd.nextLong(1L << 40))))
    try {
      // two UNCLUSTERED parts (each spans the whole key space), > 64k rows
      // in total so the exchange would cut more than one partition
      t.insertBatch(randBatch(70000), partitions = 2)
      t.insertBatch(randBatch(70000), partitions = 2)
      // sampled: the bounded exchange plans
      val planned = t.query("k0000000", "k9999999").toDF()
        .queryExecution.executedPlan.toString
      assert(planned.contains("BoundedRangeRepartition"),
        "sampled parts must keep the bounded range exchange")
      // strip the sidecars -> a fresh open sees only endpoint masses
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(Paths.get(dir))
      try walk.iterator().asScala.filter(_.getFileName.toString == KeySample.FileName)
        .toList.foreach(Files.delete)
      finally walk.close()
      val t2 = MergeTreeTable.open(spark, dir, cfg)
      val df2 = t2.query("k0000000", "k9999999").toDF()
      assert(!df2.queryExecution.executedPlan.toString.contains("BoundedRangeRepartition"),
        "endpoint-dominated point set must fall back to the stock sampling shape")
      assert(df2.count() == 140000)
      t2.shutdown()
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("executor-side decimated sample: sorted, bounded, row-count faithful") {
    val dir = Files.createTempDirectory("lbg_dist_").toString
    import spark.implicits._
    val t = MergeTreeTable.create(spark, dir, MergeTreeConfig())
    try {
      t.insertBatch(spark.createDataset(
        (0 until 50000).map(i => KVRow(f"k$i%06d", "v", i.toLong))), partitions = 2)
      val part = t.parts.head
      val s = KeySample.fromPartDirDistributed(spark, s"$dir/part_${part.partId}", part.rowCount)
      assert(s.isDefined, "distributed sample must build")
      val ks = s.get
      assert(ks.rows == 50000)
      assert(ks.keys.size <= KeySample.Size && ks.keys.size > 32)
      assert(ks.keys == ks.keys.sorted(graft.mergetree.KeyOrder.ordering))
      // quantile fidelity within a loose tolerance: the middle sample key
      // sits near the median of the written key space
      val mid = ks.keys(ks.keys.size / 2).drop(1).toInt
      assert(math.abs(mid - 25000) < 5000, s"median sample key k$mid far from 25000")
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }
}
