package graft

import graft.mergetree._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The round-5 storage features, previously unverified (round-5 verdict):
  * PARTITION BY (per-partition parts, partition-pruned scans, value
  * canonicalization across types), DROP PARTITION (O(manifest) unlink +
  * reader grace), TTL (lazy in compaction, NULL rows kept, eager applyTtl),
  * and VersionedCollapsing merge semantics.
  */
class ColumnarMergeTreeRetentionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  // ------------------------------------------------------------ PARTITION BY

  test("partitioned ingest lands one part per partition value; scanPartitions prunes") {
    val df = spark.range(300).select(
      col("id").as("k"),
      (col("id") % 3).cast("long").as("bucket"),
      (col("id") * 2).as("v"))
    val dir = Files.createTempDirectory("cmt_part_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), partitionBy = Some("bucket"))
    t.insertBatch(df.filter(col("k") < 150))
    t.insertBatch(df.filter(col("k") >= 150))
    // 2 batches x 3 partition values = 6 parts, each tagged with its value
    assert(t.partCount == 6)
    assert(t.partitions == Seq("0", "1", "2"))
    assert(t.parts.forall(_.partition.isDefined))
    // partition-restricted scan prunes parts BEFORE any file I/O
    val one = t.scanPartitions(Seq("1"))
    assert(t.lastPruning == (2, 6), s"bucket=1 must touch 2/6 parts: ${t.lastPruning}")
    val got = one.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2))).toList
    val exp = df.filter(col("bucket") === 1).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toList
    assert(got == exp)
    // full scan still sees everything
    assert(t.scan().count() == 300)
  }

  test("DETACH/ATTACH PARTITION: quarantine without deletion, one-commit re-link") {
    val df = spark.range(300).select(
      col("id").as("k"), (col("id") % 3).cast("long").as("bucket"))
    val dir = Files.createTempDirectory("cmt_detach_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), partitionBy = Some("bucket"))
    t.insertBatch(df.filter(col("k") < 150))
    t.insertBatch(df.filter(col("k") >= 150))
    val detachedIds = t.parts.filter(_.partition.contains("1")).map(_.partId)
    assert(t.detachPartition("1") == 100L)
    // rows vanish from scans; the directories do NOT (no GC involvement)
    assert(t.scan().count() == 200)
    assert(t.detachedParts.map(_.partId).sorted == detachedIds.sorted)
    detachedIds.foreach(id =>
      assert(Files.isDirectory(Paths.get(dir, s"part_$id")), s"part_$id must survive"))
    t.purgeGc(force = true) // even a forced purge must not touch detached parts
    detachedIds.foreach(id =>
      assert(Files.isDirectory(Paths.get(dir, s"part_$id")),
        s"GC must never delete a detached part ($id)"))
    // detach is idempotent on an absent partition
    assert(t.detachPartition("1") == 0L)
    // re-attach restores the exact rows in one manifest commit
    assert(t.attachPartition("1") == 100L)
    assert(t.scan().count() == 300 && t.detachedParts.isEmpty)
    val got = t.scanPartitions(Seq("1")).orderBy("k").collect().map(_.getLong(0)).toList
    assert(got == (1L until 300L by 3).toList)
  }

  test("attachPartition self-heals a detached record whose part is still live") {
    val df = spark.range(30).select(col("id").as("k"), lit("a").as("p"))
    val dir = Files.createTempDirectory("cmt_detheal_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), partitionBy = Some("p"))
    t.insertBatch(df)
    // simulate the detach crash window: recorded detached, manifest unlink
    // never happened — the part is live AND in detached.json
    ColumnarMergeTree.DetachedSet.update(dir)(_ ++ t.parts.toList)
    assert(t.attachPartition("a") == 0L, "live parts must not re-link (no double rows)")
    assert(t.scan().count() == 30 && t.detachedParts.isEmpty)
    // a detached directory that disappeared fails ATTACH loudly
    t.detachPartition("a")
    t.detachedParts.foreach(p =>
      MergeTreeTable.deleteRecursively(Paths.get(dir, s"part_${p.partId}")))
    intercept[IllegalArgumentException](t.attachPartition("a"))
  }

  test("scanPartitions sees parts landed by another table instance (manifest refresh)") {
    val df = spark.range(10).select(col("id").as("k"), lit("a").as("p"))
    val dir = Files.createTempDirectory("cmt_part_rf_").toString
    val t1 = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), partitionBy = Some("p"))
    t1.insertBatch(df)
    val t2 = ColumnarMergeTree.open(spark, dir)
    assert(t2.scanPartitions(Seq("a")).count() == 10)
    // a part landed through t1 AFTER t2's open must be visible to t2
    t1.insertBatch(df)
    assert(t2.scanPartitions(Seq("a")).count() == 20,
      "stale in-memory manifest: scanPartitions missed a concurrent insert")
  }

  test("partition values round-trip across types (dir-name vs cast-to-string)") {
    // The manifest stores values parsed from Spark's escaped `__pv=` dynamic
    // partition directory names, while collapse/scanPartitions callers use
    // the expression's cast-to-string rendering — these MUST agree or
    // collapse groups silently split (round-5 verdict hazard 2a).
    val cases: Seq[(String, org.apache.spark.sql.DataFrame, Set[String])] = Seq(
      ("string col", spark.range(20).select(col("id").as("k"),
        concat(lit("g "), (col("id") % 2).cast("string")).as("p")), // space: escaped in dir names
        Set("g 0", "g 1")),
      ("int expr", spark.range(20).select(col("id").as("k"),
        (col("id") % 3).cast("int").as("p")), Set("0", "1", "2")),
      ("double col", spark.range(20).select(col("id").as("k"),
        ((col("id") % 2).cast("double") / 2.0).as("p")), Set("0.0", "0.5")),
      ("date expr", spark.range(20).select(col("id").as("k"),
        date_add(lit(java.sql.Date.valueOf("2024-01-01")), (col("id") % 2).cast("int")).as("p")),
        Set("2024-01-01", "2024-01-02")),
      ("timestamp col", spark.range(20).select(col("id").as("k"),
        to_timestamp(lit("2024-01-01 03:04:05")).as("p")), // ':' escaped in dir names
        Set("2024-01-01 03:04:05")),
      ("null value", spark.range(20).select(col("id").as("k"),
        when(col("id") % 2 === 0, lit("x")).as("p")),
        Set("x", ColumnarMergeTree.NullPartition)))
    for ((tag, df, expect) <- cases) {
      val dir = Files.createTempDirectory("cmt_pv_").toString
      val t = ColumnarMergeTree.create(spark, dir, df.schema,
        orderBy = Seq("k"), partitionBy = Some("p"))
      t.insertBatch(df)
      // manifest values (directory-derived) == cast-to-string rendering
      assert(t.partitions.toSet == expect, s"$tag: manifest values ${t.partitions}")
      val castSide = df.select(coalesce(col("p").cast("string"),
        lit(ColumnarMergeTree.NullPartition))).distinct()
        .collect().map(_.getString(0)).toSet
      assert(castSide == expect, s"$tag: cast rendering $castSide")
      // and scanPartitions addressed by the cast rendering finds the rows
      val v = expect.head
      val expected = df.filter(coalesce(col("p").cast("string"),
        lit(ColumnarMergeTree.NullPartition)) === v).count()
      assert(t.scanPartitions(Seq(v)).count() == expected, s"$tag: scanPartitions($v)")
    }
  }

  test("merges and Summing collapse never cross partitions") {
    val df = spark.range(200).select(
      (col("id") % 4).cast("long").as("k"),
      ((col("id") / 4) % 2).cast("long").as("month"), // independent of k
      lit(1L).as("cnt"))
    val dir = Files.createTempDirectory("cmt_part_sum_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), MergeTreeConfig(maxParts = 2),
      mode = MergeMode.Summing(Seq("k"), Seq("cnt")),
      partitionBy = Some("month"))
    (0 until 4).foreach(i => t.insertBatch(df.filter(col("id") % 4 === i)
      .select(col("k"), col("month"), col("cnt"))))
    t.optimize() // collapse-in-merge must stay within each partition
    // per-(k,month) sums survive — the same k in two months stays two rows
    val got = t.scan().orderBy("k", "month").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val exp = df.groupBy("k", "month").agg(sum("cnt").as("cnt"))
      .orderBy("k", "month").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == exp)
    assert(got.map(_._1).distinct.size * 2 == got.size, "k must appear once per month")
    // merged parts keep their partition tag
    assert(t.parts.forall(_.partition.isDefined))
  }

  // ---------------------------------------------------------- DROP PARTITION

  test("dropPartition unlinks exactly that partition without touching other parts") {
    val df = spark.range(300).select(
      col("id").as("k"), (col("id") % 3).cast("long").as("bucket"))
    val dir = Files.createTempDirectory("cmt_drop_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), partitionBy = Some("bucket"))
    t.insertBatch(df)
    val survivorsBefore = t.parts.filterNot(_.partition.contains("1")).map(_.partId).toSet
    val dropped = t.dropPartition("1")
    assert(dropped == 100)
    assert(t.totalRows == 200)
    assert(t.partitions == Seq("0", "2"))
    // O(manifest): surviving parts are the SAME part ids — nothing rewritten
    assert(t.parts.map(_.partId).toSet == survivorsBefore)
    assert(t.scan().filter(col("bucket") === 1).count() == 0)
    // dropping a missing partition is a no-op
    assert(t.dropPartition("1") == 0L)
  }

  test("reader grace: a scan planned before maintenance still reads retired parts") {
    val df = spark.range(100).select(
      col("id").as("k"), (col("id") % 2).cast("long").as("bucket"))
    val dir = Files.createTempDirectory("cmt_gc_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), MergeTreeConfig(gcGraceSeconds = 3600),
      partitionBy = Some("bucket"))
    t.insertBatch(df)
    val before = t.scan() // plan pinned to the pre-drop part list
    t.dropPartition("1")
    // retired dirs are in the GC list, not deleted: the old plan still works
    assert(t.gcPending.nonEmpty)
    // ...and the leak-in-waiting is observable through metadata-only stats
    assert(t.stats("gc_pending") == t.gcPending.size.toLong)
    assert(t.stats("parts") == t.partCount.toLong)
    assert(before.count() == 100, "in-flight reader lost its parts to eager GC")
    assert(t.scan().count() == 50) // new scans see the post-drop manifest
    // force-purge deletes the directories and empties the list
    val purged = t.purgeGc(force = true)
    assert(purged == t.partCount || purged > 0)
    assert(t.gcPending.isEmpty)
    assert(!Files.list(Paths.get(dir)).iterator().asScala.exists(p =>
      p.getFileName.toString.startsWith("part_") &&
        !t.parts.map(x => s"part_${x.partId}").contains(p.getFileName.toString)))
  }

  test("gcGraceSeconds=0 deletes retired parts in the same maintenance op") {
    val df = spark.range(100).select(col("id").as("k"))
    val dir = Files.createTempDirectory("cmt_gc0_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), MergeTreeConfig(gcGraceSeconds = 0))
    t.insertBatch(df.filter(col("k") < 50))
    t.insertBatch(df.filter(col("k") >= 50))
    val oldIds = t.parts.map(_.partId)
    t.deleteWhere(col("k") >= 50)
    assert(t.gcPending.isEmpty, "grace 0 must purge inside the op")
    assert(oldIds.exists(id => !Files.exists(Paths.get(s"$dir/part_$id"))))
    assert(t.scan().count() == 50)
  }

  test("mutation hit-counting plans ONE scan regardless of part count") {
    // The pre-round-8 shape — one scan+aggregate subtree per part,
    // reduce(_ unionAll _) — builds an O(parts)-operator plan: driver
    // analysis/codegen stalls at 10⁴–10⁵ parts long before data volume
    // matters. The plan must stay constant-size as parts grow.
    val dir = Files.createTempDirectory("cmt_hitplan_").toString
    val proto = spark.range(1).select(col("id").as("k"), col("id").as("v"))
    val t = ColumnarMergeTree.create(spark, dir, proto.schema, orderBy = Seq("k"))
    (0 until 24).foreach(i => t.insertBatch(
      spark.range(i * 10L, i * 10L + 10L)
        .select(col("id").as("k"), col("id").as("v"))))
    assert(t.partCount == 24)
    val plan = t.hitCountPlan(t.parts, col("v") % 2 === 0)
      .queryExecution.executedPlan.toString()
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      s"expected ONE scan node over 24 parts:\n$plan")
    // and the counts it feeds still drive the mutation correctly
    assert(t.deleteWhere(col("v") >= 200L) == 40L)
    assert(t.scan().count() == 200)
    assert(t.updateWhere(col("v") < 5L, Map("v" -> lit(-1L))) == 5L)
    assert(t.scan().filter(col("v") === -1L).count() == 5)
  }

  test("gcGraceSeconds is table metadata: self-describing open honors the creator's value") {
    val df = spark.range(10).select(col("id").as("k"))
    val dir = Files.createTempDirectory("cmt_gcpersist_").toString
    ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"),
      MergeTreeConfig(gcGraceSeconds = 7200))
    // A default-config opener must not purge on its own (shorter) clock.
    assert(ColumnarMergeTree.open(spark, dir).config.gcGraceSeconds == 7200)
    assert(ColumnarMergeTree.open(spark, dir,
      MergeTreeConfig(gcGraceSeconds = 1)).config.gcGraceSeconds == 7200)
  }

  test("time travel: scanAt reads a pre-mutation snapshot within the GC grace; fails loudly after purge") {
    val df = spark.range(100).select(col("id").as("k"), (col("id") % 4).cast("long").as("v"))
    val dir = Files.createTempDirectory("cmt_tt_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), MergeTreeConfig(gcGraceSeconds = 3600))
    t.insertBatch(df)
    val s0 = t.snapshots.last
    t.deleteWhere(col("v") === 0L)
    assert(t.scan().count() == 75)
    // the pre-delete snapshot is still fully readable (retired part on disk)
    assert(t.scanAt(s0).count() == 100)
    assert(t.snapshots.last > s0, "each commit adds a snapshot")
    // purging the retired parts makes the old snapshot unreadable — loudly
    t.purgeGc(force = true)
    val e = intercept[IllegalArgumentException](t.scanAt(s0).count())
    assert(e.getMessage.contains("no longer readable"))
    // the CURRENT state is of course unaffected
    assert(t.scan().count() == 75)
    intercept[IllegalArgumentException](t.scanAt(999999L))
  }

  test("KV table: grace window is table metadata — openers purge on the creator's clock") {
    val dir = Files.createTempDirectory("kv_gcpersist_").toString
    MergeTreeTable.create(spark, dir, MergeTreeConfig(gcGraceSeconds = 7200)).shutdown()
    // a default-config opener must not purge on its own shorter clock
    assert(MergeTreeTable.open(spark, dir).config.gcGraceSeconds == 7200)
    assert(MergeTreeTable.open(spark, dir,
      MergeTreeConfig(gcGraceSeconds = 1)).config.gcGraceSeconds == 7200)
  }

  test("KV table: optimize/merge retire through the same grace GC (round-7 symmetry)") {
    // Round 6 left the KV MergeTreeTable hard-deleting replaced part dirs
    // inline — the exact reader race the grace window exists to close, on
    // the table the bench and q1-q8 use. Both tables now share gclist.json.
    val dir = Files.createTempDirectory("kv_gc_").toString
    val t = MergeTreeTable.create(spark, dir, MergeTreeConfig(
      memtableFlushThreshold = 5, maxParts = 3, localScanMaxRows = 0,
      gcGraceSeconds = 3600))
    (0 until 10).foreach { b =>
      (0 until 25).foreach(i => t.insert(f"k$b%02d_$i%02d", s"v${b}_$i", (b * 100 + i).toLong))
    }
    t.flush()
    assert(t.partCount > 3)
    val before = t.fullScan() // lazy plan over the pre-optimize part list
    t.optimize()
    assert(t.partCount <= 3)
    assert(t.gcPending.nonEmpty, "optimize must retire, not delete inline")
    assert(before.count() == 250, "in-flight reader lost its parts to eager GC")
    assert(t.fullScan().count() == 250)
    val purged = t.purgeGc(force = true)
    assert(purged > 0 && t.gcPending.isEmpty)
    assert(t.fullScan().count() == 250)
    t.shutdown()
  }

  // ----------------------------------------------------------------- TTL

  test("TTL is lazy: reads keep expired rows until a merge; compaction drops them") {
    val df = spark.range(400).select(col("id").as("k"), col("id").as("ts"))
    val dir = Files.createTempDirectory("cmt_ttl_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), MergeTreeConfig(maxParts = 2),
      ttl = Some("ts < 100"))
    (0 until 4).foreach(i => t.insertBatch(
      df.filter(col("k") >= i * 100 && col("k") < (i + 1) * 100)))
    // before any merge, expired rows are still readable (ClickHouse-lazy)
    assert(t.scan().filter(col("ts") < 100).count() == 100)
    t.optimize() // 4 parts > maxParts: every bin rewrites → TTL applies
    assert(t.partCount <= 2)
    assert(t.scan().filter(col("ts") < 100).count() == 0,
      "compaction must drop expired rows")
    assert(t.scan().count() == 300)
  }

  test("applyTtl drops exactly the expired rows now; NULL-predicate rows are kept") {
    val df = spark.range(100).select(
      col("id").as("k"),
      when(col("id") % 10 === 0, lit(null).cast("long"))
        .otherwise(col("id")).as("ts"))
    val dir = Files.createTempDirectory("cmt_ttl2_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), ttl = Some("ts < 50"))
    t.insertBatch(df)
    val removed = t.applyTtl()
    // k in 1..49 except multiples of 10 (NULL ts → kept): 49 - 4 = 45
    assert(removed == 45, s"expected 45 expired rows, got $removed")
    assert(t.scan().count() == 55)
    assert(t.scan().filter(col("ts").isNull).count() == 10,
      "rows where the TTL predicate is NULL must be KEPT")
    // idempotent
    assert(t.applyTtl() == 0L)
    // a table with no TTL refuses
    val t2 = ColumnarMergeTree.create(spark,
      Files.createTempDirectory("cmt_ttl3_").toString, df.schema, Seq("k"))
    intercept[IllegalStateException](t2.applyTtl())
  }

  test("partition-scoped TTL drops whole partitions without rewriting any part") {
    // ClickHouse ttl_only_drop_parts: TTL reads only the (bare-column)
    // partition key, so retention is dropPartition per expired value —
    // O(manifest), no data I/O. Survivor part ids must be UNCHANGED.
    val df = spark.range(300).select(
      col("id").as("k"), (col("id") % 3).cast("long").as("day"))
    val dir = Files.createTempDirectory("cmt_pttl_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), partitionBy = Some("day"), ttl = Some("day < 1"))
    t.insertBatch(df)
    assert(t.partCount == 3)
    val survivorIds = t.parts.filterNot(_.partition.contains("0")).map(_.partId).toSet
    val dropped = t.applyTtl()
    assert(dropped == 100L, s"day=0 rows dropped, got $dropped")
    assert(t.partitions == Seq("1", "2"))
    assert(t.parts.map(_.partId).toSet == survivorIds,
      "surviving parts must not be rewritten (O(manifest) retention)")
    assert(t.scan().count() == 200)
  }

  test("REPLACE PARTITION swaps content atomically; foreign rows are rejected") {
    val df = spark.range(100).select(
      col("id").as("k"), (col("id") % 2).cast("long").as("bucket"),
      lit(1L).as("v"))
    val dir = Files.createTempDirectory("cmt_repl_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), MergeTreeConfig(gcGraceSeconds = 3600),
      partitionBy = Some("bucket"))
    t.insertBatch(df)
    val pre = t.scan() // planned against the pre-swap manifest
    val backfill = spark.range(10).select(
      (col("id") * 2 + 1).as("k"), lit(1L).as("bucket"), lit(9L).as("v"))
    t.replacePartition("1", backfill)
    // new reads: bucket 0 untouched, bucket 1 wholly replaced
    assert(t.scan().filter(col("bucket") === 0).count() == 50)
    val b1 = t.scan().filter(col("bucket") === 1)
    assert(b1.count() == 10 && b1.agg(min(col("v"))).head().getLong(0) == 9L)
    // the pre-swap plan still reads the retired parts (grace GC)
    assert(pre.count() == 100)
    // rows whose partition expression != the named value are refused
    intercept[IllegalArgumentException] {
      t.replacePartition("1", spark.range(3).select(
        col("id").as("k"), lit(0L).as("bucket"), lit(1L).as("v")))
    }
  }

  test("REPLACE PARTITION with an empty frame drops the partition (no phantom part)") {
    val df = spark.range(40).select(
      col("id").as("k"), (col("id") % 2).cast("long").as("bucket"), lit(1L).as("v"))
    val dir = Files.createTempDirectory("cmt_replempty_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), partitionBy = Some("bucket"))
    t.insertBatch(df)
    t.replacePartition("1", df.filter(lit(false)))
    assert(t.scan().count() == 20 && t.partitions == Seq("0"),
      "empty replacement must drop the partition entirely")
    assert(t.parts.forall(_.rowCount > 0),
      "no 0-row phantom part may be registered")
  }

  test("swapParts CAS: a racing maintenance op's rewrite is discarded, not double-applied") {
    val df = spark.range(100).select(col("id").as("k"), lit(1L).as("v"))
    val dir = Files.createTempDirectory("cmt_cas_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"),
      MergeTreeConfig(maxParts = 100, gcGraceSeconds = 0))
    t.insertBatch(df.filter(col("k") < 50))
    t.insertBatch(df.filter(col("k") >= 50))
    val oldParts = t.parts
    // Winner merges the two parts into one.
    t.optimizeFinal()
    assert(t.partCount == 1 && t.totalRows == 100)
    val merged = t.parts.head
    // Loser: computed the same inputs from a pre-merge manifest read and
    // finished its rewrite late. Its CAS must refuse (the oldIds are gone),
    // delete its staged output dir, and leave the manifest untouched —
    // before the CAS this appended a second copy of every row.
    val loserMeta = merged.copy(partId = merged.partId + 1000)
    val loserDir = Paths.get(dir, s"part_${loserMeta.partId}")
    Files.createDirectories(loserDir)
    assert(!t.swapParts(oldParts, Seq(loserMeta), Seq(loserMeta)),
      "stale swap must be refused")
    t.refresh()
    assert(t.partCount == 1 && t.totalRows == 100,
      "manifest must be untouched by the losing swap")
    assert(!Files.exists(loserDir), "loser's staged dir must be cleaned up")
    // and a VALID swap (current ids) still applies
    assert(t.swapParts(Seq(merged), Seq(merged), Seq.empty))
  }

  test("TTL + PARTITION BY survive the self-describing reopen") {
    val df = spark.range(10).select(col("id").as("k"), (col("id") % 2).as("p"))
    val dir = Files.createTempDirectory("cmt_def2_").toString
    ColumnarMergeTree.create(spark, dir, df.schema, Seq("k"),
      partitionBy = Some("p"), ttl = Some("k < 0")).insertBatch(df)
    val t = ColumnarMergeTree.open(spark, dir)
    assert(t.partitionBy.contains("p") && t.ttl.contains("k < 0"))
    assert(t.partitions == Seq("0", "1"))
  }

  // ------------------------------------------------------------- Collapsing

  private def collapsingTable(dir: String) = {
    val schema = Seq(("a", 1L, 1, "x")).toDF("k", "ver", "sign", "payload").schema
    ColumnarMergeTree.create(spark, dir, schema, orderBy = Seq("k", "ver"),
      mode = MergeMode.Collapsing(Seq("k"), "sign", "ver"))
  }

  test("Collapsing cancels (key,version) pairs across parts; survivors emit sign=1") {
    val dir = Files.createTempDirectory("cmt_coll_").toString
    val t = collapsingTable(dir)
    t.insertBatch(Seq(("a", 1L, 1, "a1"), ("b", 1L, 1, "b1"))
      .toDF("k", "ver", "sign", "payload"))
    // cancel a@1 from a LATER part (the streaming-update idiom), restate a@2
    t.insertBatch(Seq(("a", 1L, -1, "a1"), ("a", 2L, 1, "a2"))
      .toDF("k", "ver", "sign", "payload"))
    val got = t.scan().orderBy("k", "ver").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3))).toList
    assert(got == List(("a", 2L, 1, "a2"), ("b", 1L, 1, "b1")))
    // a cancel with no matching state (net < 0) yields nothing
    t.insertBatch(Seq(("c", 9L, -1, "c9")).toDF("k", "ver", "sign", "payload"))
    assert(t.scan().filter(col("k") === "c").count() == 0)
    // merge-collapse == read-collapse
    val before = t.scan().orderBy("k", "ver").collect().toSeq
    t.optimize()
    assert(t.scan().orderBy("k", "ver").collect().toSeq == before)
  }

  test("Collapsing net-sign refinement: duplicate states collapse to ONE row (pinned divergence)") {
    // ClickHouse VersionedCollapsing keeps unpaired duplicates; our net-sign
    // rule emits exactly one sign=1 row per (key,version) group with net>0 —
    // a deterministic refinement, declared in MergeMode's scaladoc.
    val dir = Files.createTempDirectory("cmt_coll2_").toString
    val t = collapsingTable(dir)
    t.insertBatch(Seq(("a", 1L, 1, "x"), ("a", 1L, 1, "x"), ("a", 1L, 1, "y"))
      .toDF("k", "ver", "sign", "payload"))
    val rows = t.scan().collect()
    assert(rows.length == 1)
    assert(rows(0).getInt(2) == 1 && rows(0).getString(3) == "y") // max() payload
    // net exactly 0 after one cancel of net=3? sum=3-1=2 > 0 → still one row
    t.insertBatch(Seq(("a", 1L, -1, "x")).toDF("k", "ver", "sign", "payload"))
    assert(t.scan().count() == 1)
    // two more cancels → net 0 → gone
    t.insertBatch(Seq(("a", 1L, -1, "x"), ("a", 1L, -1, "x"))
      .toDF("k", "ver", "sign", "payload"))
    assert(t.scan().count() == 0)
  }

  test("Collapsing mode survives the self-describing reopen") {
    val dir = Files.createTempDirectory("cmt_coll3_").toString
    val t = collapsingTable(dir)
    t.insertBatch(Seq(("a", 1L, 1, "a1")).toDF("k", "ver", "sign", "payload"))
    val t2 = ColumnarMergeTree.open(spark, dir)
    assert(t2.mode == MergeMode.Collapsing(Seq("k"), "sign", "ver"))
    assert(t2.scan().count() == 1)
  }

  private implicit class IterHasAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }
}
