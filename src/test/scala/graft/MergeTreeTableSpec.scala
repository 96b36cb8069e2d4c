package graft

import graft.mergetree._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Ports the reference's five demo scenarios (examples/demo.cpp:9-190) as
  * assertions over exact row sets (SURVEY §5), plus the semantics quirks
  * from SURVEY §2.1 (lexicographic inclusive bounds, read-your-writes,
  * dedup) and compat-reader cross-validation against the C++-written
  * fixtures.
  */
class MergeTreeTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("mergetree_test_").toString

  // demo.cpp:9-38 test_basic_operations
  test("basic operations: insert, point lookup, range query") {
    val t = MergeTreeTable.create(spark, tmpTable())
    t.insert("key1", "value1", 1000L)
    t.insert("key2", "value2", 2000L)
    t.insert("key3", "value3", 3000L)
    t.insert("key1", "updated_value1", 4000L) // same key, new version: both kept
    val k1 = t.queryKey("key1").collect().toList
    assert(k1 == List(KVRow("key1", "value1", 1000L), KVRow("key1", "updated_value1", 4000L)))
    val range = t.query("key1", "key2").collect().toList
    assert(range.map(_.key) == List("key1", "key1", "key2"))
    t.shutdown()
  }

  // demo.cpp:40-64 test_memtable_flush
  test("memtable flush at threshold creates parts; stats are metadata-only") {
    val t = MergeTreeTable.create(spark, tmpTable(),
      MergeTreeConfig(memtableFlushThreshold = 10))
    (0 until 25).foreach(i => t.insert(f"key$i%02d", s"value$i", i * 1000L))
    assert(t.partCount == 2)      // two automatic flushes at 10 and 20
    assert(t.memtableSize == 5)   // 5 rows still buffered
    assert(t.totalRows == 25)     // metadata sum + memtable, no scan
    // read-your-writes: unflushed rows visible (src/merge_tree.cpp:40-54)
    assert(t.query("key00", "key24").count() == 25)
    t.shutdown()
  }

  // demo.cpp:66-98 test_merge_operations
  test("optimize merges parts below maxParts and preserves query results") {
    val t = MergeTreeTable.create(spark, tmpTable(),
      MergeTreeConfig(memtableFlushThreshold = 5, maxParts = 3))
    (0 until 10).foreach { b =>
      (0 until 25).foreach(i => t.insert(f"batch${b}_key$i%02d", s"v${b}_$i", (b * 100 + i).toLong))
    }
    t.flush()
    val before = t.fullScan().collect().toList
    assert(before.size == 250)
    val partsBefore = t.partCount
    assert(partsBefore > 3)
    t.optimize()
    assert(t.partCount <= 3)
    val after = t.fullScan().collect().toList
    assert(after == before, "merge must not change query results (Q4)")
    // merged-away dirs enter the reader-grace GC list (our fix for the
    // reference leak, SURVEY §3.3 — grace-windowed since round 7, same as
    // the generic table): still on disk for in-flight scans, invisible to
    // new ones, gone after purge.
    def partDirs: Int = new java.io.File(t.path).listFiles().count(f =>
      f.isDirectory && f.getName.startsWith("part_"))
    assert(partDirs == t.partCount + t.gcPending.size)
    assert(t.gcPending.nonEmpty, "optimize must retire the merged-away parts")
    t.purgeGc(force = true)
    assert(partDirs == t.partCount)
    assert(t.fullScan().collect().toList == before,
      "purge after grace must not affect results")
    t.shutdown()
  }

  // demo.cpp:155-190 test_persistence
  test("persistence: reopen from disk returns identical results") {
    val dir = tmpTable()
    val t = MergeTreeTable.create(spark, dir)
    (0 until 100).foreach(i => t.insert(f"persistent_key$i%03d", s"v$i", i.toLong))
    t.shutdown() // shutdown flushes (src/merge_tree.cpp:110)
    val t2 = MergeTreeTable.open(spark, dir)
    assert(t2.totalRows == 100)
    val got = t2.query("persistent_key010", "persistent_key019").collect()
    assert(got.length == 10)
    assert(got.map(_.key).toList == (10 until 20).map(i => f"persistent_key$i%03d").toList)
    t2.shutdown()
  }

  test("exact (key,timestamp) duplicate collapses to one row, max(value) wins") {
    val t = MergeTreeTable.create(spark, tmpTable())
    t.insert("k", "a", 1L)
    t.flush()
    t.insert("k", "b", 1L) // exact dup in a different part
    t.insert("k", "b", 1L) // and in the memtable twice
    val got = t.queryKey("k").collect().toList
    assert(got == List(KVRow("k", "b", 1L))) // deterministic: max(value)
    t.shutdown()
  }

  test("lexicographic inclusive bounds: query(key1,key3) matches key10..key29") {
    val t = MergeTreeTable.create(spark, tmpTable())
    (1 to 30).foreach(i => t.insert(s"key$i", s"v$i", i.toLong))
    t.flush()
    val got = t.query("key1", "key3").collect().map(_.key).toSet
    // lexicographic: key1, key10..key19, key2, key20..key29, key3
    val expected = (1 to 30).map(i => s"key$i")
      .filter(k => k >= "key1" && k <= "key3").toSet
    assert(got == expected)
    assert(got.contains("key10") && got.contains("key29") && !got.contains("key4"))
    t.shutdown()
  }

  test("distributed batch ingest writes a part without driver memtable") {
    val t = MergeTreeTable.create(spark, tmpTable())
    val ds = spark.range(1000).map(i => KVRow(f"bk$i%04d", s"v$i", i))
    t.insertBatch(ds)
    assert(t.partCount == 1 && t.memtableSize == 0)
    assert(t.query("bk0100", "bk0199").count() == 100)
    t.shutdown()
  }

  test("ingest self-heals a crashed writer's claimed-but-unfenced part dir") {
    // Regression: a crash between the staged rename and the manifest store
    // left a part_<id> dir whose id was never fenced — every later ingest
    // picked the same id and failed on the existing name forever.
    val dir = Files.createTempDirectory("mt_claim_").toString
    val t = MergeTreeTable.create(spark, dir,
      MergeTreeConfig(memtableFlushThreshold = 2))
    t.insert("k1", "v1", 1L); t.insert("k2", "v2", 2L) // flushes part
    // simulate the crashed claim at the NEXT id
    val m = graft.mergetree.Manifest.load(dir).get
    val nextId = math.max(m.version, m.parts.map(_.partId + 1).max)
    val orphan = java.nio.file.Paths.get(dir, s"part_$nextId")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("stale.parquet"), "crashed writer junk")
    // the next flush must skip past the collided id, not fail
    t.insert("k3", "v3", 3L); t.insert("k4", "v4", 4L)
    t.flush()
    assert(t.query("k1", "k4").count() == 4, "all rows ingested despite the orphan")
    assert(java.nio.file.Files.isDirectory(orphan), "orphan dir left inert")
    t.shutdown()
  }

  test("merge candidate scoring matches reference formula") {
    def pm(id: Long, rows: Long, size: Long) =
      PartMetadata(id, "a", "z", 0, 1, rows, 1, size, 0)
    // two equal 10MiB parts: ratio=1, factor=1/2, size=min(1,2)=1 → 50
    assert(Merger.calculateMergeScore(Seq(pm(1, 10, 10L << 20), pm(2, 10, 10L << 20))) == 50.0)
    // zero size → 0
    assert(Merger.calculateMergeScore(Seq(pm(1, 10, 0), pm(2, 10, 0))) == 0.0)
    // truncation quirk: maxCandidates=1 returns the (0,1) pair
    val parts = Seq(pm(1, 10, 100), pm(2, 10, 100), pm(3, 10, 100))
    val sel = Merger.selectMergeCandidates(parts)
    assert(sel.get.map(_.partId) == List(1L, 2L))
  }

  test("compat reader: C++-written fixtures round-trip") {
    val basic = RefFormatReader.readPartRows("/root/reference/data/test_basic/part_1")
    assert(basic.toSet == Set(
      KVRow("key1", "value1", 1000L), KVRow("key2", "value2", 2000L),
      KVRow("key3", "value3", 3000L), KVRow("key1", "updated_value1", 4000L)))
    val meta = RefFormatReader.readMetadata("/root/reference/data/test_basic/part_1")
    assert(meta.rowCount == 4 && meta.minKey == "key1" && meta.maxKey == "key3")
    // ingest the fixture into our engine and query like the demo does
    val t = MergeTreeTable.create(spark, tmpTable())
    t.insertAll(basic)
    t.flush()
    assert(t.queryKey("key1").collect().map(_.value).toList ==
      List("value1", "updated_value1"))
    t.shutdown()
  }

  test("compat reader: flush + persistence fixtures") {
    val flushRows = RefFormatReader.readTable(spark, "/root/reference/data/test_flush").collect()
    assert(flushRows.length == 25 || flushRows.length == 20,
      s"test_flush has 25 rows total (some may be memtable-lost): got ${flushRows.length}")
    val persist = RefFormatReader.readTable(spark, "/root/reference/data/test_persistence").collect()
    assert(persist.length == 100)
  }
}
