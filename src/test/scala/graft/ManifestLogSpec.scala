package graft

import graft.mergetree._
import graft.mergetree.ColumnarMergeTree.GManifest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import java.util.concurrent.CountDownLatch

/** The manifest log's object-store commit contract, exercised through the
  * pluggable [[CommitBackend]]: commits are immutable numbered objects
  * published by atomic put-if-absent — no advisory lock anywhere, losers
  * observe `false` and retry on the fresh state. The in-memory fake IS the
  * contract (a flat key space with conditional puts, like S3
  * `If-None-Match:*` / GCS `ifGenerationMatch=0`); racing real writers
  * through it proves the protocol needs nothing else from storage.
  */
class ManifestLogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("in-memory backend honors the conditional-put contract") {
    val b = new InMemoryCommitBackend
    val d = Paths.get("/fake/table/_manifest_log")
    assert(b.putIfAbsent(d, "1.json", "a".getBytes))
    assert(!b.putIfAbsent(d, "1.json", "b".getBytes),
      "second put of the same name must LOSE, never overwrite")
    assert(b.read(d, "1.json").contains("a"), "the winner's bytes survive")
    assert(b.putIfAbsent(d, "2.json", "c".getBytes))
    assert(b.list(d).toSet == Set("1.json", "2.json"))
    b.delete(d, "1.json")
    assert(b.list(d) == Seq("2.json") && b.read(d, "1.json").isEmpty)
    assert(b.puts.get == 2 && b.conflicts.get == 1)
  }

  test("3 writers race through the conditional-put fake: no lost commits, losers retry") {
    val dir = Files.createTempDirectory("mlog_fake_").toString
    val backend = new InMemoryCommitBackend
    CommitBackends.register(dir, backend)
    try {
      val df0 = spark.range(0).select(col("id").as("k"), col("id").as("v"))
      val t = ColumnarMergeTree.create(spark, dir, df0.schema,
        orderBy = Seq("k"),
        config = MergeTreeConfig(manifestLog = true, maxParts = 100))
      // Three concurrent writers, five parts each — every part lands via
      // the uuid-rename + CAS-publish path with NO lock (the fake has none
      // to offer).
      val go = new CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val writers = (0 until 3).map { w =>
        new Thread(() => {
          go.await()
          try (0 until 5).foreach { b =>
            t.insertBatch(spark.range(w * 1000 + b * 100, w * 1000 + b * 100 + 20)
              .select(col("id").as("k"), col("id").as("v")))
          } catch { case e: Throwable => errs.add(e) }
        })
      }
      writers.foreach(_.start()); go.countDown(); writers.foreach(_.join(120000))
      assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
      t.refresh()
      assert(t.partCount == 15 && t.totalRows == 300,
        s"lost commit: parts=${t.partCount} rows=${t.totalRows}")
      // 1 layout-creation commit + 15 part registrations, dense from 1:
      // every sequence number was won by exactly one writer.
      assert(backend.puts.get == 16,
        s"expected 16 published commits, saw ${backend.puts.get}")
      assert(t.snapshots.sorted == (1L to 16L),
        "commit sequence must be dense — a hole is a lost commit")
      // Force guaranteed contention to observe the loser-retries path:
      // three tight CAS loops bumping the version.
      val v0 = ColumnarMergeTree.GManifest.load(dir).get.version
      val bump = (0 until 3).map { _ =>
        new Thread(() => (0 until 30).foreach { _ =>
          GManifest.update(dir)(m => m.copy(version = m.version + 1))
        })
      }
      bump.foreach(_.start()); bump.foreach(_.join(60000))
      val v1 = ColumnarMergeTree.GManifest.load(dir).get.version
      assert(v1 == v0 + 90, s"lost update under contention: $v0 -> $v1")
      assert(backend.conflicts.get > 0,
        "tight 3-writer CAS loops must produce losing conditional puts " +
          "(losers retried — that's the whole protocol)")
    } finally CommitBackends.unregister(dir)
  }

  test("local hard-link backend has the same conflict semantics") {
    val d = Files.createTempDirectory("mlog_local_")
    assert(LocalLinkCommitBackend.putIfAbsent(d, "7.json", "x".getBytes))
    assert(!LocalLinkCommitBackend.putIfAbsent(d, "7.json", "y".getBytes))
    assert(LocalLinkCommitBackend.read(d, "7.json").contains("x"))
    assert(LocalLinkCommitBackend.list(d) == Seq("7.json"))
    LocalLinkCommitBackend.delete(d, "7.json")
    assert(LocalLinkCommitBackend.read(d, "7.json").isEmpty)
  }
}
