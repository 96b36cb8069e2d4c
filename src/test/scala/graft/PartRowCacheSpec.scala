package graft

import graft.mergetree.{KVRow, MergeTreeConfig, MergeTreeTable, PartRowCache}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Driver-local part-row cache: write-through at flush, read-through on
  * scan, invalidation on merge retirement, LRU budget — and above all,
  * identical query results cached, uncached, and after a cold reopen.
  */
class PartRowCacheSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  private def tmp(): String = Files.createTempDirectory("prc_spec_").toString

  test("LRU unit behavior: budget, per-part cap, invalidation") {
    val c = new PartRowCache(maxRows = 100)
    def rows(n: Int): Array[KVRow] = Array.tabulate(n)(i => KVRow(s"k$i", "v", i.toLong))
    c.put(1, 10L, rows(40)); c.put(2, 20L, rows(40))
    assert(c.cachedRowCount == 80 && c.cachedPartCount == 2)
    c.put(3, 30L, rows(40)) // evicts LRU (part 1)
    assert(c.get(1, 10L).isEmpty && c.get(2, 20L).isDefined && c.get(3, 30L).isDefined)
    c.put(4, 40L, rows(51)) // over per-part cap (maxRows/2) — never cached
    assert(c.get(4, 40L).isEmpty)
    c.invalidate(Seq(2L))
    assert(c.get(2, 20L).isEmpty && c.cachedRowCount == 40)
    val off = new PartRowCache(0)
    off.put(1, 10L, rows(1))
    assert(!off.enabled && off.get(1, 10L).isEmpty)
  }

  test("id reuse with a different fingerprint misses cleanly and evicts the stale entry") {
    // The round-14 verdict's hardening ask: a restore/recovery path that
    // re-allocates part ids must never be served another part's rows.
    val c = new PartRowCache(maxRows = 100)
    val original = Array.tabulate(10)(i => KVRow(s"old$i", "v", i.toLong))
    c.put(7, /*creationTime*/ 1000L, original)
    assert(c.get(7, 1000L).contains(original))
    // same id, different creationTime (a reborn part_7): clean miss + evict
    assert(c.get(7, 2000L).isEmpty)
    assert(c.cachedPartCount == 0 && c.cachedRowCount == 0)
    // read-through refill under the new fingerprint serves the new rows
    val reborn = Array.tabulate(5)(i => KVRow(s"new$i", "v", i.toLong))
    c.put(7, 2000L, reborn)
    assert(c.get(7, 2000L).contains(reborn) && c.get(7, 1000L).isEmpty)
  }

  test("flush write-through serves scans with zero file reads; results match cold reopen") {
    val dir = tmp()
    val cfg = MergeTreeConfig(memtableFlushThreshold = 100, maxParts = 100)
    val t = MergeTreeTable.create(spark, dir, cfg)
    try {
      (0 until 1000).foreach(i => t.insert(f"k${i % 300}%03d", s"v$i", i.toLong))
      t.flush()
      val (parts, rows) = t.localCacheStats
      assert(parts == 10 && rows == 1000, s"write-through missing: $parts parts / $rows rows")
      val hot = t.query("k050", "k149").collect()
      assert(t.lastScanLocal)
      // a fresh open has an empty cache — same query must read files and agree
      val t2 = MergeTreeTable.open(spark, dir, cfg)
      assert(t2.localCacheStats._1 == 0)
      val cold = t2.query("k050", "k149").collect()
      assert(t2.lastScanLocal)
      assert(hot.toSeq == cold.toSeq)
      // ... and the cold read itself populated the cache (read-through),
      // but ONLY for the parts the manifest pruning let through: keys are
      // written in thirds (k000-k099 / k100-k199 / k200-k299 per part), so
      // the k050-k149 range overlaps exactly 7 of the 10 parts
      assert(t2.localCacheStats._1 == 7)
      t2.shutdown()
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("queryRows: driver-served rows equal the Dataset path; dups collapse through a local merge") {
    val dir = tmp()
    val t = MergeTreeTable.create(spark, dir,
      MergeTreeConfig(memtableFlushThreshold = 100, maxParts = 3, gcGraceSeconds = 0))
    try {
      (0 until 900).foreach(i => t.insert(f"k${i % 300}%03d", s"v$i", (i % 450).toLong))
      // exact (key,ts) duplicates in different parts: max(value) must win
      t.insert("k007", "v_a", 7L); t.flush()
      t.insert("k007", "v_z", 7L); t.flush()
      t.optimize() // 11 parts -> local merges (all cached, < 256k rows)
      val viaRows = t.queryRows("k000", "k149")
      assert(t.lastScanLocal, "queryRows on a cached small table must serve locally")
      val viaDs = t.query("k000", "k149").collect().toSeq
      assert(viaRows == viaDs)
      assert(viaRows.exists(r => r.key == "k007" && r.timestamp == 7L && r.value == "v_z"),
        "local merge must keep max(value) on exact (key,ts) dups")
      assert(!viaRows.exists(r => r.key == "k007" && r.timestamp == 7L && r.value == "v_a"))
      // sorted by (key, ts) in UTF-8 order
      assert(viaRows.map(r => (r.key, r.timestamp)) ==
        viaRows.map(r => (r.key, r.timestamp)).sorted)
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("merge retirement invalidates cached inputs; local-merge outputs stay cached and correct") {
    val dir = tmp()
    val t = MergeTreeTable.create(spark, dir,
      MergeTreeConfig(memtableFlushThreshold = 50, maxParts = 2, gcGraceSeconds = 0))
    try {
      (0 until 500).foreach(i => t.insert(f"k${i % 100}%03d", s"v$i", i.toLong))
      t.flush()
      val before = t.fullScan().collect()
      t.optimize()
      // small merges run driver-locally and write-through cache their
      // outputs; every RETIRED input must be gone from the cache
      val liveIds = t.parts.map(_.partId).toSet
      val (parts, rows) = t.localCacheStats
      assert(parts == liveIds.size && rows == 500,
        s"cache must hold exactly the live merged outputs, got $parts parts / $rows rows")
      val after = t.fullScan().collect()
      assert(t.lastScanLocal, "post-merge scan must stay cache-served")
      assert(before.toSeq == after.toSeq)
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }
}
