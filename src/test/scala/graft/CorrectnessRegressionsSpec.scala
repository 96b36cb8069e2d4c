package graft

import graft.mergetree._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Regression pins for the round-3 verdict's four correctness bugs:
  *
  *  1. deleteWhere dropped rows whose predicate evaluated NULL (silent loss).
  *  2. footerBounds degraded to always-prune sentinels when parquet omitted
  *     key statistics (binary min/max above the ~4 KB footer stats cap),
  *     silently dropping the part from every range scan.
  *  3. Part-pruning bounds compared as Java Strings (UTF-16 code-unit
  *     order) while Spark filters compare UTF-8 bytes — keys mixing
  *     U+E000..U+FFFF with supplementary-plane characters pruned wrongly.
  *  4. A DSv2 connector commit and a live MergeTreeTable instance writing
  *     the same path could clobber each other's manifest appends / reuse a
  *     part id (stale in-memory manifest stored over the other's commit).
  */
class CorrectnessRegressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  // ------------------------------------------------- 1. deleteWhere + NULLs

  test("deleteWhere keeps rows whose predicate evaluates NULL") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "bad"), (2L, "bad"), (3L, null), (4L, null), (5L, "good"))
      .toDF("k", "tag")
    val dir = Files.createTempDirectory("cmt_nulldel_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    t.insertBatch(df)
    val removed = t.deleteWhere(col("tag") === "bad")
    assert(removed == 2, s"only the two tag='bad' rows match, got $removed")
    val left = t.scan().orderBy("k").collect()
    assert(left.length == 3, "NULL-tag rows must survive the rewrite")
    assert(left.map(_.getLong(0)).toList == List(3L, 4L, 5L))
    assert(left.count(_.isNullAt(1)) == 2)
  }

  test("deleteWhere whole-part drop is not fooled by an all-NULL residue") {
    // One part where every row either matches or evaluates NULL: the old
    // hits==rowCount check saw 2 != 4 and rewrote with filter(!cond), which
    // ALSO dropped the NULL rows — the part silently emptied while `removed`
    // reported 2. The NULL rows must remain.
    val df = Seq[(java.lang.Long, String)](
      (1L, "bad"), (2L, "bad"), (3L, null), (4L, null)).toDF("k", "tag")
    val dir = Files.createTempDirectory("cmt_nullres_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    t.insertBatch(df)
    assert(t.deleteWhere(col("tag") === "bad") == 2)
    assert(t.totalRows == 2 && t.scan().count() == 2)
    assert(t.scan().collect().forall(_.isNullAt(1)))
  }

  // ---------------------------------- 2. missing footer stats ≠ always-prune

  test("parts whose keys exceed the parquet stats cap are unprunable, not invisible") {
    // parquet-mr omits binary min/max when they exceed the footer stats size
    // cap (~4 KB); bounds must then mark the part unbounded, not ""/"".
    val big = spark.range(20)
      .select(concat(lit("k"), lpad(col("id").cast("string"), 4, "0"),
        lit("x" * 8000)).as("k"), col("id").as("v"))
    val dir = Files.createTempDirectory("cmt_bigkey_").toString
    val t = ColumnarMergeTree.create(spark, dir, big.schema, orderBy = Seq("k"))
    t.insertBatch(big)
    // sanity: the footer really did omit the stats → unbounded bounds
    val m = ColumnarMergeTree.GManifest.load(dir).get
    assert(m.parts.forall(p => p.minKey == null && p.maxKey == null),
      s"expected unbounded part bounds, got ${m.parts.map(p => (p.minKey, p.maxKey))}")
    // every range scan must still see the part (old code pruned it silently)
    val got = t.rangeScan("k0005", "k0010~")
    assert(got.count() == 6, "range scan must not lose the stats-less part")
    assert(t.lastPruning == (t.partCount, t.partCount), "unbounded part never pruned")
    // full scan unaffected
    assert(t.scan().count() == 20)
  }

  // ----------------------------------------- 3. UTF-8 vs UTF-16 key collation

  test("supplementary-plane keys are not pruned by UTF-16 bound comparison") {
    // U+1F600 (😀) is a surrogate pair: UTF-16 code units 0xD83D,0xDE00 sort
    // BELOW U+E000, but its UTF-8 bytes (F0 9F 98 80) sort ABOVE U+E000's
    // (EE 80 80). A part holding only 😀-keys has maxKey=😀; Java-order
    // pruning says maxKey < "" and drops the part, while the Spark
    // filter (UTF-8 order) would keep the rows.
    val emoji = new String(Character.toChars(0x1F600))
    val hiEnd = new String(Character.toChars(0x1F64F))
    val t = MergeTreeTable.create(spark,
      Files.createTempDirectory("mt_utf8_").toString)
    t.insertBatch(Seq(KVRow(emoji + "1", "grin", 1L), KVRow(emoji + "2", "grin2", 2L)).toDS(), 1)
    t.insertBatch(Seq(KVRow("ascii", "low", 3L)).toDS(), 1)
    val got = t.query("", hiEnd).collect()
    assert(got.length == 2, s"emoji keys lost to UTF-16 pruning: ${got.toList}")
    assert(got.forall(_.key.startsWith(emoji)))
    t.shutdown()
  }

  test("generic table: supplementary-plane leading key prunes in UTF-8 order") {
    val emoji = new String(Character.toChars(0x1F600))
    val df = Seq((emoji + "a", 1L), (emoji + "b", 2L)).toDF("k", "v")
    val dir = Files.createTempDirectory("cmt_utf8_").toString
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    t.insertBatch(df)
    val got = t.rangeScan("", emoji + "zzz")
    assert(got.count() == 2, "generic-table pruning must use UTF-8 byte order")
  }

  // --------------------------- 4. DSv2 commit vs live-instance manifest race

  test("interleaved DSv2 and instance writes never clobber each other's manifest") {
    val dir = Files.createTempDirectory("mt_race_").toString
    val t = MergeTreeTable.create(spark, dir)
    t.insertBatch(spark.range(100).map(i => KVRow(f"a$i%03d", "v", i)), 1)
    // connector append while the instance holds its manifest in memory
    spark.range(100).map(i => KVRow(f"b$i%03d", "v", i))
      .toDF().write.format("mergetree").mode("append").save(dir)
    // instance writes again: its store must read-merge, not overwrite
    t.insertBatch(spark.range(100).map(i => KVRow(f"c$i%03d", "v", i)), 1)
    val m = Manifest.load(dir).get
    assert(m.parts.size == 3,
      s"connector part clobbered: ${m.parts.map(_.partId)}")
    assert(m.parts.map(_.partId).distinct.size == 3, "part ids must be unique")
    val reopened = MergeTreeTable.open(spark, dir)
    assert(reopened.totalRows == 300)
    reopened.shutdown(); t.shutdown()
  }

  test("concurrent DSv2 and instance writes: all parts survive, ids unique") {
    val dir = Files.createTempDirectory("mt_race2_").toString
    val t = MergeTreeTable.create(spark, dir)
    val threads = (0 until 6).map { i =>
      new Thread(() =>
        if (i % 2 == 0)
          t.insertBatch(spark.range(50).map(j => KVRow(f"i$i%02d$j%03d", "v", j)), 1)
        else
          spark.range(50).map(j => KVRow(f"d$i%02d$j%03d", "v", j))
            .toDF().write.format("mergetree").mode("append").save(dir))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val m = Manifest.load(dir).get
    assert(m.parts.size == 6, s"lost parts: ${m.parts.map(_.partId)}")
    assert(m.parts.map(_.partId).distinct.size == 6)
    assert(m.parts.map(_.rowCount).sum == 300)
    val reopened = MergeTreeTable.open(spark, dir)
    assert(reopened.query("a", "z").count() == 300)
    reopened.shutdown(); t.shutdown()
  }

  // ----------------- generic-table maintenance vs concurrent writers race

  test("generic table: parts landed during optimize/deleteWhere survive the swap") {
    val df0 = spark.range(1000)
      .select(col("id").as("k"), (col("id") % 10).cast("long").as("grp"))
    val dir = Files.createTempDirectory("cmt_race_").toString
    val t = ColumnarMergeTree.create(spark, dir, df0.schema,
      orderBy = Seq("k"), MergeTreeConfig(maxParts = 2))
    (0 until 6).foreach(i => t.insertBatch(df0.filter(col("k") % 6 === i)))
    @volatile var writerRows = 0L
    val writer = new Thread(() => (0 until 4).foreach { i =>
      val extra = spark.range(2000 + i * 100, 2000 + i * 100 + 50)
        .select(col("id").as("k"), lit(99L).as("grp"))
      t.insertBatch(extra); writerRows += 50
    })
    writer.start()
    t.optimize()
    val removed = t.deleteWhere(col("grp") === 3L) // 100 rows from df0, no extras
    writer.join()
    t.refresh()
    assert(removed == 100)
    assert(t.totalRows == 1000 - 100 + writerRows,
      s"rows lost across concurrent maintenance: ${t.totalRows}")
    assert(t.scan().count() == 1000 - 100 + writerRows)
    assert(t.scan().filter(col("grp") === 3L).count() == 0)
  }

  // ------------------- small-query short-circuit ≡ distributed scan

  test("local-scan short-circuit matches the distributed path exactly") {
    val dir = Files.createTempDirectory("mt_localscan_").toString
    val t0 = MergeTreeTable.create(spark, dir,
      MergeTreeConfig(memtableFlushThreshold = 100))
    // Several parts with (key, ts) collisions across parts (max(value)
    // survivor), keys straddling the U+E000 vs supplementary-plane
    // UTF-16/UTF-8 order divergence, and range-bound keys.
    val bmp = "prepost"      // U+E000: sorts HIGH in UTF-16, low in UTF-8
    val supp = "pre😀post" // U+1F600: surrogate pair, high in UTF-8
    val rnd = new scala.util.Random(7)
    (0 until 450).foreach { i =>
      t0.insert(s"k${rnd.nextInt(80)}", s"v$i", (i % 37).toLong)
    }
    t0.insert(bmp, "b1", 1L); t0.insert(supp, "s1", 1L)
    t0.insert("k10", "zz9", 5L); t0.insert("k10", "aa0", 5L) // collision
    t0.flush(); t0.shutdown()

    val local = MergeTreeTable.open(spark, dir,
      MergeTreeConfig(localScanMaxRows = 1 << 20))
    val dist = MergeTreeTable.open(spark, dir,
      MergeTreeConfig(localScanMaxRows = 0))
    // identical unflushed memtable rows on both instances, with one more
    // (key, ts) collision against a flushed part
    Seq(local, dist).foreach { t =>
      t.insert("k10", "mm5", 5L)
      t.insert("k5", "memv", 999L)
      t.insert(supp, "s2", 2L)
    }
    def check(res: (Seq[KVRow], Seq[KVRow])): Unit = {
      assert(res._1.nonEmpty && res._1 == res._2)
    }
    check((local.query("k1", "k5").collect().toSeq,
      dist.query("k1", "k5").collect().toSeq))
    check((local.query("a", "z").collect().toSeq,
      dist.query("a", "z").collect().toSeq))
    check((local.queryKey("k10").collect().toSeq,
      dist.queryKey("k10").collect().toSeq))
    check((local.fullScan().collect().toSeq,
      dist.fullScan().collect().toSeq))
    // the collision survivor is the UTF-8 max(value) on both paths
    assert(local.queryKey("k10").collect()
      .find(_.timestamp == 5L).get.value == "zz9")
    local.shutdown(); dist.shutdown()
    MergeTreeTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  // -------------------------- 5. (round 8) events ts type changed generation

  test("events queries agree across both testdata ts encodings (nanos Long / timestamp)") {
    // The round-8 driver regenerated events.parquet with ts as
    // TIMESTAMP(MICROS) where earlier generations stored INT64 nanos (read
    // as Long under nanosAsLong) — which broke every `ts div 1000` query.
    // The events() reader now adapts on the stored type; pin that both
    // encodings of the SAME data produce identical query results.
    val base = (0 until 500).map { i =>
      (i.toLong, 1700000000000000000L + i.toLong * 137000000000L,
        (i % 7).toLong, s"et${i % 3}", i * 0.25, s"p$i")
    }
    val dirNanos = Files.createTempDirectory("ev_nanos_").toString
    base.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dirNanos/events.parquet")
    val dirMicros = Files.createTempDirectory("ev_micros_").toString
    base.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dirMicros/events.parquet")
    val a = graft.queries.AnalyticQueries.q16RunningSum(spark, dirNanos).collect().toSeq
    val b = graft.queries.AnalyticQueries.q16RunningSum(spark, dirMicros).collect().toSeq
    assert(a.nonEmpty && a == b,
      s"ts-encoding must not change results: ${a.take(3)} vs ${b.take(3)}")
  }

  // ------------------------- q80's codegen host extraction == parse_url(HOST)

  test("substring host extraction matches parse_url(HOST) on authority URLs") {
    // q80 derives the domain with substring ops (codegen) instead of
    // parse_url's interpreted java.net.URI parse; pin equality on the URL
    // shapes the query family constructs (scheme://host/path?query).
    val urls = Seq(
      "https://sub0.example.com/view/123?uid=4&page=2",
      "http://a.b.co/x", "https://example.com/", "https://example.com",
      "https://sub4.example.com/purchase/99999?uid=123&page=6")
      .toDF("url")
    val both = urls.select(
      parse_url(col("url"), lit("HOST")).as("viaParse"),
      substring_index(substring_index(col("url"), "://", -1), "/", 1).as("viaSubstr"))
      .collect()
    both.foreach(r => assert(r.getString(0) == r.getString(1),
      s"host extraction diverged: ${r.getString(0)} vs ${r.getString(1)}"))
  }

  // ------------- 7. (round 11) granule-refined small-query short-circuit

  test("narrow queries on a big table short-circuit via the sparse index; wide ones don't") {
    import graft.mergetree.{KVRow, MergeTreeConfig, MergeTreeTable}
    val dir = java.nio.file.Files.createTempDirectory("mt_granule_gate_").toString
    // Three sorted parts, EACH spanning the whole key space (the shape
    // randomly-keyed ingest produces): part-level bounds say every part
    // overlaps every range, so the old row-count gate pushed even point
    // lookups to a Spark job once the table outgrew the threshold. The
    // row-group bounds are narrow (granuleSize 128), so the refined
    // estimate lets narrow ranges stay driver-local.
    val t0 = MergeTreeTable.create(spark, dir, MergeTreeConfig(
      localScanMaxRows = 500, granuleSize = 128))
    (0 until 3).foreach { b =>
      val rows = (0 until 2000).map(i =>
        KVRow(f"k${(i * 3 + b) % 6000}%05d", s"v${b}_$i", b.toLong))
      t0.insertBatch(spark.createDataset(rows), partitions = 1)
    }
    t0.shutdown()
    val local = MergeTreeTable.open(spark, dir, MergeTreeConfig(
      localScanMaxRows = 500, granuleSize = 128))
    val dist = MergeTreeTable.open(spark, dir, MergeTreeConfig(localScanMaxRows = 0))
    assert(local.fullScan().count() == 6000)
    assert(!local.lastScanLocal, "6000-row full scan must take the Spark path")
    // Point lookup: overlaps ~1 row group per part -> refined ~384 <= 500.
    val viaLocal = local.queryKey("k00500").collect().toSeq
    assert(local.lastScanLocal,
      "point lookup on a big table must short-circuit via granule bounds")
    assert(viaLocal == dist.queryKey("k00500").collect().toSeq && viaLocal.nonEmpty)
    // Narrow range: same story.
    val nr = local.query("k00100", "k00140").collect().toSeq
    assert(local.lastScanLocal, "narrow range must short-circuit")
    assert(nr == dist.query("k00100", "k00140").collect().toSeq && nr.nonEmpty)
    // A range matching most granules must fall back to the Spark path.
    local.query("k00000", "k05999").collect()
    assert(!local.lastScanLocal, "wide range must take the Spark path")
    local.shutdown(); dist.shutdown()
    MergeTreeTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
