package graft

import graft.mergetree.{KVRow, KeyOrder, KeySample, MergeTreeConfig, MergeTreeTable}
import graft.plans.{BoundedRangeRepartition, BoundedRangeStrategy}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** The sampling-free range exchange and its inputs: persisted per-part key
  * samples (KeySample), the driver-computed split bounds, and the custom
  * physical operator (BoundedRangeRepartition/Exec). The headline
  * assertions: the range-scan plan contains NO stock Exchange (the
  * aggregate's clustering requirement is satisfied by the custom node's
  * RangePartitioning — a second exchange would mean the contract broke)
  * and partitions come out balanced on an unclustered table, the case
  * footer-only bounds measurably could not handle.
  */
class BoundedRangeExchangeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  private def tmp(): String =
    Files.createTempDirectory("brx_spec_").toString

  // ------------------------------------------------------------- KeySample

  test("evenly picks endpoints and spreads interior") {
    val ks = KeySample.evenly(Vector("a", "b", "c", "d", "e"), 3)
    assert(ks == Seq("a", "c", "e"))
    assert(KeySample.evenly(Vector("a"), 4) == Seq("a"))
    assert(KeySample.evenly(Vector[String](), 4).isEmpty)
  }

  test("quantiles of a weighted point set are rank-correct") {
    // 100 points 'a', 100 points 'b' → quartiles: a,a,b,b
    val pts = Seq(("b", 100.0), ("a", 100.0))
    assert(KeySample.quantiles(pts, 4) == Seq("a", "a", "b", "b"))
  }

  test("flush writes a key sample; batch write samples the part; merge folds inputs") {
    val dir = tmp()
    val t = MergeTreeTable.create(spark, dir,
      MergeTreeConfig(memtableFlushThreshold = 100, maxParts = 1))
    try {
      import spark.implicits._
      // memtable flush path
      (0 until 100).foreach(i => t.insert(f"k$i%04d", s"v$i", i.toLong))
      // batch path
      t.insertBatch(spark.createDataset((100 until 200).map(i => KVRow(f"k$i%04d", s"v$i", i.toLong))))
      val partDirs = Files.list(Paths.get(dir)).toArray.map(_.toString)
        .filter(p => p.split('/').last.startsWith("part_"))
      assert(partDirs.length == 2)
      partDirs.foreach { pd =>
        val s = KeySample.load(pd)
        assert(s.isDefined, s"no key sample in $pd")
        assert(s.get.keys.nonEmpty && s.get.rows == 100)
        assert(s.get.keys == s.get.keys.sorted(KeyOrder.ordering))
      }
      // merge folds the two samples into the output part's sample
      t.optimize()
      val merged = Files.list(Paths.get(dir)).toArray.map(_.toString)
        .filter(p => p.split('/').last.startsWith("part_"))
        .flatMap(KeySample.load)
        .filter(_.rows == 200)
      assert(merged.nonEmpty, "merged part carries no folded sample")
      val keys = merged.head.keys
      assert(keys.head <= "k0005" && keys.last >= "k0195",
        s"folded sample must span both inputs: ${keys.head}..${keys.last}")
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  // ------------------------------------------------- the exchange operator

  test("range scan plans the custom exchange and NO stock exchange") {
    val dir = tmp()
    val t = MergeTreeTable.create(spark, dir, MergeTreeConfig(
      memtableFlushThreshold = 1000, maxParts = 100, localScanMaxRows = 0))
    try {
      import spark.implicits._
      val rnd = new scala.util.Random(7)
      (0 until 4).foreach { b =>
        t.insertBatch(spark.createDataset(
          (0 until 50000).map(i => KVRow(s"key_${rnd.nextInt(40000)}", s"v$i", (b * 50000 + i).toLong))),
          partitions = 1)
      }
      val df = t.query("key_1", "key_8") // ~78% of the key space → several range partitions
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("BoundedRangeRepartition"),
        s"expected the custom exchange in:\n$phys")
      assert(!phys.contains("Exchange "), // stock ShuffleExchangeExec prints as "Exchange ..."
        s"stock exchange crept back in (the aggregate re-shuffled):\n$phys")
      // balance: no partition more than 2× the mean on this unclustered table
      val sizes = df.toDF()
        .groupBy(org.apache.spark.sql.functions.spark_partition_id()).count()
        .collect().map(_.getLong(1))
      assert(sizes.length > 1, s"expected a multi-partition exchange, got ${sizes.length}")
      val mean = sizes.sum.toDouble / sizes.length
      assert(sizes.max <= mean * 2.0 + 1000,
        s"unbalanced partitions: ${sizes.mkString(",")}")
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("exchange results match semantics: dedup keeps max value, global (key,ts) order") {
    val dir = tmp()
    val t = MergeTreeTable.create(spark, dir, MergeTreeConfig(
      memtableFlushThreshold = 10, maxParts = 100, localScanMaxRows = 0))
    try {
      // duplicate (key, ts) across parts with different values
      t.insertAll((0 until 30).map(i => KVRow(f"k${i % 10}%02d", s"a$i", (i % 3).toLong)))
      t.insertAll((0 until 30).map(i => KVRow(f"k${i % 10}%02d", s"z$i", (i % 3).toLong)))
      t.flush()
      val rows = t.fullScan().collect()
      assert(rows.length == 30) // 10 keys × 3 timestamps
      assert(rows.forall(_.value.startsWith("z")), "dedup must keep max(value)")
      val sortedRows = rows.sortBy(r => (r.key, r.timestamp))(
        Ordering.Tuple2(KeyOrder.ordering, Ordering.Long))
      assert(rows.toSeq == sortedRows.toSeq, "fullScan must return (key,ts)-sorted rows")
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("steady-state batch writes sort by LEARNED bounds — no sampling job") {
    import graft.sources.QueryLog
    QueryLog.install(spark)
    val dir = tmp()
    val t = MergeTreeTable.create(spark, dir, MergeTreeConfig(
      memtableFlushThreshold = 1000000, maxParts = 100, localScanMaxRows = 0))
    try {
      import spark.implicits._
      val rnd = new scala.util.Random(13)
      def batch(n: Int) = spark.createDataset(
        (0 until n).map(i => KVRow(f"k${rnd.nextInt(100000)}%06d", s"v$i", i.toLong)))
      // batch 1: nothing learned — the sampling path runs (and persists a
      // key sample for the part)
      t.insertBatch(batch(20000), partitions = 4)
      QueryLog.clear()
      // batch 2: the table's samples supply the bounds
      t.insertBatch(batch(20000), partitions = 4)
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (!QueryLog.entries.exists(_.plan.contains("BoundedRangeRepartition")) &&
          System.nanoTime() < deadline) Thread.sleep(20)
      val writes = QueryLog.entries.filter(_.plan.contains("WriteFiles"))
      assert(writes.exists(_.plan.contains("BoundedRangeRepartition")),
        s"steady-state write must use learned bounds:\n${writes.map(_.plan).mkString("\n---\n")}")
      assert(!writes.exists(_.plan.contains("rangepartitioning")),
        "no sampling exchange may appear in a steady-state write")
      // the learned layout must still read back correctly and balanced-ish
      val total = t.fullScan().count()
      assert(total > 0)
      val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
        .map(_.toString).filter(_.split('/').last.startsWith("part_"))
        .flatMap(p => java.nio.file.Files.list(java.nio.file.Paths.get(p)).toArray
          .map(_.toString).filter(_.endsWith(".parquet")))
      assert(files.length == 8, s"expected 2 parts x 4 files, got ${files.length}")
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("bounds route rows exactly: partition i ascending, equal keys co-located") {
    BoundedRangeStrategy.register(spark)
    import spark.implicits._
    val df = (1 to 1000).map(i => (f"k$i%04d", i)).toDF("key", "n")
    val exchanged = org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
      BoundedRangeRepartition("key", Seq("k0250", "k0500", "k0750"), df.queryExecution.analyzed))
    val byPart = exchanged
      .select(spark_partition_id().as("p"), col("key"))
      .collect().groupBy(_.getInt(0)).view.mapValues(_.map(_.getString(1)).sorted).toMap
    assert(byPart.keySet == Set(0, 1, 2, 3))
    assert(byPart(0).max == "k0250" && byPart(1).min == "k0251")
    assert(byPart(1).max == "k0500" && byPart(2).min == "k0501")
    assert(byPart(2).max == "k0750" && byPart(3).min == "k0751")
  }
}
