package graft

import graft.mergetree.ColumnarMergeTree.{GcEntry, GcList, GManifest, GPartMeta, SnapshotLog}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

/** Helper main for CrossProcessLockSpec: run read-modify-write appends on a
  * table's gclist.json from a SEPARATE JVM, so the test exercises the OS
  * file lock in ManifestLocks rather than the JVM-local monitor.
  */
object LockStressMain {
  def main(args: Array[String]): Unit = {
    val Array(path, nStr, offStr) = args
    val off = offStr.toLong
    (0 until nStr.toInt).foreach { i =>
      GcList.update(path)(cur => GcList(cur.retired :+ GcEntry(off + i, 0L)))
    }
  }
}

/** Helper main for the manifest-LOG variant: append part entries through
  * GManifest.update on a log-mode table from a separate JVM — the
  * put-if-absent CAS, not the advisory file lock, is the serializer there.
  */
object LogStressMain {
  def main(args: Array[String]): Unit = {
    val Array(path, nStr, offStr) = args
    val off = offStr.toLong
    (0 until nStr.toInt).foreach { i =>
      val id = off + i
      GManifest.update(path) { cur =>
        GManifest(math.max(cur.version, id + 1),
          cur.parts :+ GPartMeta(id, s"k$id", s"k$id", numericKey = false,
            rowCount = 1L, granuleCount = 1L, diskSize = 0L, creationTime = 0L))
      }
    }
  }
}

/** The multi-writer manifest gap (round-6 verdict "missing" item 4): the
  * per-table lock is now a JVM monitor PLUS an OS advisory file lock, so
  * read-modify-write commits on gmanifest.json/gclist.json from different
  * PROCESSES serialize instead of losing updates. Pinned by racing two real
  * child JVMs against this one on the same table path.
  */
class CrossProcessLockSpec extends AnyFunSuite {

  test("manifest read-modify-writes are atomic across processes (OS file lock)") {
    val dir = Files.createTempDirectory("xproc_lock_").toString
    val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    val perWriter = 40
    val procs = (1 to 2).map { p =>
      new ProcessBuilder(java, "-cp", cp, "graft.LockStressMain",
        dir, perWriter.toString, (p * 100000).toString)
        .inheritIO().start()
    }
    (0 until perWriter).foreach { i =>
      GcList.update(dir)(cur => GcList(cur.retired :+ GcEntry(i.toLong, 0L)))
    }
    procs.foreach { p =>
      assert(p.waitFor(180, TimeUnit.SECONDS), "child JVM did not finish")
      assert(p.exitValue() == 0, "child JVM failed")
    }
    val got = GcList.load(dir).retired.map(_.partId)
    assert(got.size == 3 * perWriter,
      s"lost ${3 * perWriter - got.size} of ${3 * perWriter} cross-process updates")
    assert(got.distinct.size == got.size)
  }

  test("manifest LOG commits: two processes + this one race, no lost commits, no lock") {
    val dir = Files.createTempDirectory("xproc_log_").toString
    GManifest.enableLogLayout(dir)
    // migration itself serializes via the advisory lock; COMMITS must not —
    // delete its lock file and assert no commit path recreates it
    Files.deleteIfExists(Paths.get(dir, ".manifest.lock"))
    val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    val perWriter = 40
    val procs = (1 to 2).map { p =>
      new ProcessBuilder(java, "-cp", cp, "graft.LogStressMain",
        dir, perWriter.toString, (p * 100000).toString)
        .inheritIO().start()
    }
    (0 until perWriter).foreach { i =>
      GManifest.update(dir) { cur =>
        GManifest(math.max(cur.version, i + 1L),
          cur.parts :+ GPartMeta(i.toLong, s"k$i", s"k$i", numericKey = false,
            rowCount = 1L, granuleCount = 1L, diskSize = 0L, creationTime = 0L))
      }
    }
    procs.foreach { p =>
      assert(p.waitFor(180, TimeUnit.SECONDS), "child JVM did not finish")
      assert(p.exitValue() == 0, "child JVM failed")
    }
    val parts = GManifest.load(dir).get.parts.map(_.partId)
    assert(parts.size == 3 * perWriter,
      s"lost ${3 * perWriter - parts.size} of ${3 * perWriter} log-mode commits")
    assert(parts.distinct.size == parts.size, "duplicate part entries")
    // the lock file was never the serializer here
    assert(!Files.exists(Paths.get(dir, ".manifest.lock")),
      "log mode must not touch the advisory lock")
    // snapshot reads stay consistent: every commit the log retains is a
    // complete readable state, and part counts grow monotonically with seq
    val seqs = SnapshotLog.list(dir)
    assert(seqs.nonEmpty && seqs.size <= 64, s"compaction bound: ${seqs.size}")
    val sizes = seqs.map(s => SnapshotLog.load(dir, s)
      .getOrElse(fail(s"snapshot $s vanished")).parts.size)
    assert(sizes == sizes.sorted, s"append-only history must be monotone: $sizes")
    assert(sizes.last == 3 * perWriter)
  }

  test("log-mode register: concurrent part claims get distinct ids and all commit") {
    val dir = Files.createTempDirectory("xlog_reg_").toString
    GManifest.enableLogLayout(dir)
    val writers = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val metas = java.util.concurrent.ConcurrentHashMap.newKeySet[GPartMeta]()
    val fs = (0 until writers).map { w =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          val staged = Files.createTempDirectory(Paths.get(dir), s".stage_$w")
          Files.writeString(staged.resolve("data.bin"), s"writer $w")
          val meta = GManifest.register(dir, staged, append = true)(id =>
            GPartMeta(id, s"w$w", s"w$w", numericKey = false,
              rowCount = 1L, granuleCount = 1L, diskSize = 0L, creationTime = 0L))
          metas.add(meta)
        }
      })
    }
    fs.foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(metas.size == writers)
    val ids = {
      val b = Seq.newBuilder[Long]; metas.forEach(m => b += m.partId); b.result()
    }
    assert(ids.distinct.size == writers, s"id collision: $ids")
    val man = GManifest.load(dir).get
    assert(man.parts.size == writers, "every claimed part must be committed")
    metas.forEach { m =>
      // uuid naming: the dir name is unique, never the contended part_<id>
      assert(m.dirName.exists(_.startsWith("part_u")),
        s"log-mode parts must claim uuid dir names, got ${m.dirName}")
      assert(Files.isDirectory(Paths.get(dir, m.dir)),
        s"claimed directory ${m.dir} must exist")
    }
    assert(man.version > man.parts.map(_.partId).max,
      "version fence must outrun every allocated id")
  }

  test("log mode: a writer killed between claim and publish neither stalls nor leaks") {
    import graft.mergetree.{ColumnarMergeTree, MergeTreeConfig}
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = TestSpark.session
    import spark.implicits._
    val dir = Files.createTempDirectory("xlog_orphan_").toString
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val t = ColumnarMergeTree.create(spark, dir, schema, orderBy = Seq("k"),
      MergeTreeConfig(manifestLog = true, gcGraceSeconds = 0))
    t.insertBatch(Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .select(col("k"), col("v")))
    // Simulate a writer dying between the uuid rename and the manifest
    // publish: an orphaned part_u* directory appears, referenced by nothing.
    val orphan = Paths.get(dir, "part_udeadbeefdeadbeefdeadbeefdeadbeef")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("junk.parquet"), "not really parquet")
    // A subsequent writer must register promptly — no same-id rename stall
    // exists to wait on (the uuid name can't contend).
    val t0 = System.nanoTime()
    t.insertBatch(Seq((3L, "c")).toDF("k", "v").select(col("k"), col("v")))
    assert((System.nanoTime() - t0) / 1e9 < 30.0, "register must not stall")
    // The orphan never leaks into the manifest…
    val man = GManifest.load(dir).get
    assert(!man.parts.exists(_.dir == orphan.getFileName.toString))
    assert(t.scan().count() == 3)
    // …and the orphan sweep ages it out (mtime floor is ≥ 10 min: a young
    // orphan — possibly an in-flight writer — survives, an old one goes).
    assert(t.purgeGc(force = true) == 0, "young orphan must survive the sweep")
    assert(Files.isDirectory(orphan))
    // age the dir AND its children: the sweep uses the newest mtime of
    // the dir's immediate subtree (an in-flight write keeps bumping its)
    val aged = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 20 * 60 * 1000L)
    Files.setLastModifiedTime(orphan.resolve("junk.parquet"), aged)
    Files.setLastModifiedTime(orphan, aged)
    assert(t.purgeGc(force = true) == 1, "aged orphan must be swept")
    assert(!Files.exists(orphan), "orphan dir must be deleted")
    assert(t.scan().count() == 3, "registered parts must be untouched")
  }

  test("lock-mode register skips a crashed writer's stale part claim") {
    import graft.mergetree.{ColumnarMergeTree, MergeTreeConfig}
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = TestSpark.session
    import spark.implicits._
    val dir = Files.createTempDirectory("xlock_stale_").toString
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val t = ColumnarMergeTree.create(spark, dir, schema, orderBy = Seq("k"))
    t.insertBatch(Seq((1L, "a")).toDF("k", "v").select(col("k"), col("v")))
    // Simulate a writer that died between its part_<id> rename and the
    // manifest store: the NEXT id's dir exists but was never fenced.
    val nextId = GManifest.load(dir).get.version
    val stale = Paths.get(dir, s"part_$nextId")
    Files.createDirectories(stale)
    Files.writeString(stale.resolve("junk"), "crashed claim")
    // Registration must skip past the collision (not fail every later
    // ingest until the dir is removed by hand).
    t.insertBatch(Seq((2L, "b")).toDF("k", "v").select(col("k"), col("v")))
    assert(t.scan().count() == 2)
    assert(GManifest.load(dir).get.parts.forall(_.partId != nextId),
      "the stale id must never be fenced into the manifest")
    assert(Files.isDirectory(stale), "the stale dir is inert, not clobbered")
  }

  test("intent-listed maintenance outputs survive the orphan sweep until their swap") {
    import graft.mergetree.ColumnarMergeTree.{IntentEntry, IntentSet}
    import graft.mergetree.{ColumnarMergeTree, MergeTreeConfig}
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types._
    val spark = TestSpark.session
    import spark.implicits._
    val dir = Files.createTempDirectory("xlog_intent_").toString
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val t = ColumnarMergeTree.create(spark, dir, schema, orderBy = Seq("k"),
      MergeTreeConfig(gcGraceSeconds = 0))
    t.insertBatch(Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .select(col("k"), col("v")))
    // Simulate a LONG maintenance rewrite: a register=false output staged
    // >10 min ago (past the mtime floor), swap not yet run. Without the
    // intent record a concurrent purger would sweep it — then the swap
    // would publish metas pointing at deleted dirs (the data-loss race).
    val staged = Paths.get(dir, "part_777")
    Files.createDirectories(staged)
    Files.writeString(staged.resolve("data.parquet"), "output of a slow rewrite")
    val aged = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 20 * 60 * 1000L)
    Files.setLastModifiedTime(staged.resolve("data.parquet"), aged)
    Files.setLastModifiedTime(staged, aged)
    IntentSet.update(dir)(cur =>
      IntentSet(IntentEntry("part_777", System.currentTimeMillis()) :: cur.staged))
    assert(t.purgeGc(force = true) == 0,
      "an intent-listed output must survive the sweep regardless of age")
    assert(Files.isDirectory(staged))
    // The op's swap releases the intent; the (never-published) dir is now
    // an ordinary aged orphan and sweeps.
    IntentSet.update(dir)(cur =>
      IntentSet(cur.staged.filterNot(_.dir == "part_777")))
    assert(t.purgeGc(force = true) == 1, "released dir must sweep as an orphan")
    assert(!Files.exists(staged))
    // An entry past the TTL belongs to a CRASHED op: it stops protecting
    // (and is pruned), so dead outputs don't leak disk forever.
    val staged2 = Paths.get(dir, "part_778")
    Files.createDirectories(staged2)
    Files.writeString(staged2.resolve("data.parquet"), "crashed op output")
    Files.setLastModifiedTime(staged2.resolve("data.parquet"), aged)
    Files.setLastModifiedTime(staged2, aged)
    IntentSet.update(dir)(cur => IntentSet(IntentEntry("part_778",
      System.currentTimeMillis() - ColumnarMergeTree.IntentTtlMs - 1000L) :: cur.staged))
    assert(t.purgeGc(force = true) == 1, "expired intent must not protect")
    assert(!Files.exists(staged2))
    assert(!IntentSet.load(dir).staged.exists(_.dir == "part_778"),
      "expired entries must be pruned")
    // Real maintenance ops leave no intent residue behind their swap.
    t.updateWhere(col("k") === 1L, Map("v" -> lit("z")))
    assert(t.scan().filter(col("v") === "z").count() == 1)
    t.deleteWhere(col("k") === 2L)
    t.optimizeFinal()
    assert(IntentSet.load(dir).staged.isEmpty,
      s"maintenance swaps must drop their intents: ${IntentSet.load(dir).staged}")
    assert(t.scan().count() == 1)
  }
}
