package graft

import graft.mergetree._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** O19 — the background merge worker (reference: background_merge_worker,
  * src/merge_tree.cpp:207-226): flush-at-threshold and merge-over-maxParts
  * happen without explicit optimize()/flush() calls, concurrently with
  * writers, and sub-threshold rows are NOT flushed early (fidelity:
  * trigger_flush_if_needed respects the threshold even from the worker).
  */
class BackgroundWorkerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def waitUntil(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(200)
    }
    cond
  }

  test("background worker merges down to maxParts without explicit optimize") {
    val t = MergeTreeTable.create(spark,
      Files.createTempDirectory("mt_bg_").toString,
      MergeTreeConfig(memtableFlushThreshold = 1000, maxParts = 4,
        enableBackgroundMerge = true, mergeIntervalSeconds = 1))
    (0 until 7).foreach { b =>
      t.insertBatch(spark.range(50).map(i => KVRow(f"bg${b}_$i%03d", s"v$i", i)), 1)
    }
    // NOTE: the worker may already be merging while batches land — that
    // concurrency is the point; only the end state is asserted.
    assert(waitUntil(60000)(t.partCount <= 4),
      s"worker never compacted: parts=${t.partCount}")
    // results unchanged by background merging
    assert(t.fullScan().count() == 350)
    t.shutdown()
  }

  test("background worker does not flush a sub-threshold memtable; shutdown does") {
    val t = MergeTreeTable.create(spark,
      Files.createTempDirectory("mt_bg2_").toString,
      MergeTreeConfig(memtableFlushThreshold = 1000, maxParts = 10,
        enableBackgroundMerge = true, mergeIntervalSeconds = 1))
    (0 until 20).foreach(i => t.insert(s"k$i", s"v$i", i.toLong))
    Thread.sleep(2500) // two worker wakes
    assert(t.memtableSize == 20 && t.partCount == 0,
      "worker must respect the flush threshold (src/merge_tree.cpp:228-238)")
    t.shutdown()
    assert(t.memtableSize == 0 && t.partCount == 1) // shutdown flushes
  }

  test("generic table: background worker compacts with writers landing parts") {
    import org.apache.spark.sql.functions._
    val df0 = spark.range(0).select(col("id").as("k"), col("id").as("v"))
    val t = ColumnarMergeTree.create(spark,
      Files.createTempDirectory("cmt_bg_").toString, df0.schema,
      orderBy = Seq("k"),
      MergeTreeConfig(maxParts = 3, enableBackgroundMerge = true,
        mergeIntervalSeconds = 1))
    (0 until 7).foreach { b =>
      t.insertBatch(spark.range(b * 100, b * 100 + 50)
        .select(col("id").as("k"), col("id").as("v")))
    }
    assert(waitUntil(60000) { t.refresh(); t.partCount <= 3 },
      s"worker never compacted: parts=${t.partCount}")
    assert(t.scan().count() == 350)
    t.shutdown()
  }

  test("background worker materializes pending lightweight mutations under maxParts") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("cmt_bg_lw_").toString
    val df = spark.range(100).select(col("id").as("k"),
      (col("id") % 4).cast("long").as("grp"), (col("id") * 1.0).as("v"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"),
      // maxParts ABOVE the part count: compaction alone would never touch
      // these parts, so convergence proves the materialization pass.
      config = MergeTreeConfig(maxParts = 10, enableBackgroundMerge = true,
        mergeIntervalSeconds = 1))
    t.insertBatch(df.filter(col("k") < 50))
    t.insertBatch(df.filter(col("k") >= 50))
    t.deleteLightweight(col("grp") === 1)
    t.updateLightweight(col("grp") === 2, Map("v" -> lit(-1.0)))
    assert(waitUntil(60000) {
      t.refresh(); t.parts.nonEmpty && t.parts.forall(_.muts.isEmpty)
    }, s"tags never materialized: ${t.parts.map(_.muts.size)}")
    assert(!ColumnarMergeTree.hasLwMarker(dir), "advisory marker cleared")
    // Physically applied: raw parquet (no engine filter) shows the folds.
    val raw = spark.read.parquet(t.parts.map(p => s"$dir/${p.dir}"): _*)
    assert(raw.count() == 75 && raw.filter(col("grp") === 1).count() == 0)
    assert(raw.filter(col("v") === -1.0).count() == 25)
    assert(t.scan().count() == 75, "the answer never changes")
    t.shutdown()
  }

  test("parts landed while optimize() is compacting survive the manifest swap") {
    val t = MergeTreeTable.create(spark,
      Files.createTempDirectory("mt_race_").toString,
      MergeTreeConfig(memtableFlushThreshold = 1000, maxParts = 4))
    (0 until 8).foreach { b =>
      t.insertBatch(spark.range(100).map(i => KVRow(f"r${b}_$i%03d", s"v$i", i)), 1)
    }
    val opt = new Thread(() => t.optimize())
    opt.start()
    // land more parts while compaction may be running
    (8 until 12).foreach { b =>
      t.insertBatch(spark.range(100).map(i => KVRow(f"r${b}_$i%03d", s"v$i", i)), 1)
    }
    opt.join(60000)
    assert(!opt.isAlive)
    assert(t.totalRows == 1200, s"rows lost in the swap: ${t.totalRows}")
    assert(t.fullScan().count() == 1200)
    t.shutdown()
  }

  test("concurrent inserts during background merging neither deadlock nor lose rows") {
    val t = MergeTreeTable.create(spark,
      Files.createTempDirectory("mt_bg3_").toString,
      MergeTreeConfig(memtableFlushThreshold = 100, maxParts = 3,
        enableBackgroundMerge = true, mergeIntervalSeconds = 1))
    val writers = (0 until 4).map { w =>
      new Thread(() => (0 until 250).foreach(i =>
        t.insert(f"w${w}_k$i%04d", s"v$i", (w * 1000 + i).toLong)))
    }
    writers.foreach(_.start())
    writers.foreach(_.join(30000))
    t.shutdown() // flush residue, stop worker
    assert(t.totalRows == 1000)
    assert(t.fullScan().count() == 1000)
  }
}
