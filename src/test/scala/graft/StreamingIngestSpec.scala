package graft

import graft.mergetree._
import graft.streaming.{StreamingIngest, UserEvent}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** SURVEY §7 Phase 5 — streaming ingest and watermarked operators:
  * foreachBatch → insertBatch (one part per micro-batch), tumbling-window
  * aggregation with late-data drop, dropDuplicatesWithinWatermark.
  */
class StreamingIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("streaming micro-batches land as parts; results match batch ingest") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KVRow]
    val t = MergeTreeTable.create(spark,
      Files.createTempDirectory("mt_stream_").toString)
    val q = StreamingIngest.start(t, source.toDS(),
      Files.createTempDirectory("mt_stream_ckpt_").toString)
    try {
      source.addData((0 until 100).map(i => KVRow(f"s$i%03d", s"v$i", i.toLong)))
      q.processAllAvailable()
      source.addData((100 until 150).map(i => KVRow(f"s$i%03d", s"v$i", i.toLong)))
      q.processAllAvailable()
      assert(t.partCount == 2) // one part per non-empty micro-batch
      assert(t.totalRows == 150)
      assert(t.query("s010", "s019").collect().map(_.key).toList ==
        (10 until 20).map(i => f"s$i%03d").toList)
    } finally q.stop()
    t.shutdown()
  }

  test("streaming micro-batches land as parts in a schema-generic table") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, Double)]
    val schema = source.toDF().toDF("k", "name", "score").schema
    val dir = Files.createTempDirectory("cmt_stream_").toString
    val t = ColumnarMergeTree.create(spark, dir, schema, orderBy = Seq("k"))
    val q = StreamingIngest.startGeneric(t, source.toDF().toDF("k", "name", "score"),
      Files.createTempDirectory("cmt_stream_ckpt_").toString)
    try {
      source.addData((0 until 80).map(i => (i.toLong, s"n$i", i * 0.5)))
      q.processAllAvailable()
      source.addData((80 until 120).map(i => (i.toLong, s"n$i", i * 0.5)))
      q.processAllAvailable()
      t.refresh()
      assert(t.partCount == 2) // one part per non-empty micro-batch
      assert(t.totalRows == 120)
      assert(t.rangeScan(10L, 19L).collect().map(_.getLong(0)).sorted.toList ==
        (10L to 19L).toList)
    } finally q.stop()
  }

  test("streaming into a partitioned table lands one part per partition per batch") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, Double)]
    val schema = source.toDF().toDF("k", "cat", "v").schema
    val dir = Files.createTempDirectory("cmt_pstream_").toString
    val t = ColumnarMergeTree.create(spark, dir, schema, orderBy = Seq("k"),
      partitionBy = Some("cat"))
    val q = StreamingIngest.startGeneric(t, source.toDF().toDF("k", "cat", "v"),
      Files.createTempDirectory("cmt_pstream_ckpt_").toString)
    try {
      // batch 1 spans partitions a,b — batch 2 spans b,c
      source.addData((0 until 40).map(i =>
        (i.toLong, if (i % 2 == 0) "a" else "b", i * 0.5)))
      q.processAllAvailable()
      source.addData((40 until 60).map(i =>
        (i.toLong, if (i % 2 == 0) "b" else "c", i * 0.5)))
      q.processAllAvailable()
      t.refresh()
      assert(t.partCount == 4, s"2 + 2 per-partition parts, got ${t.partCount}")
      assert(t.partitions == Seq("a", "b", "c"))
      assert(t.totalRows == 60)
      // partition-scoped read prunes to that partition's parts only
      assert(t.scanPartitions(Seq("c")).count() == 10)
      assert(t.lastPruning == (1, 4), s"cat=c is 1/4 parts: ${t.lastPruning}")
    } finally q.stop()
  }

  test("streaming upsert feed: Replacing table collapses to latest version at read") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long, String)]
    val schema = source.toDF().toDF("k", "ver", "payload").schema
    val dir = Files.createTempDirectory("cmt_rstream_").toString
    val t = ColumnarMergeTree.create(spark, dir, schema, orderBy = Seq("k"),
      mode = MergeMode.Replacing(Seq("k"), "ver"))
    val q = StreamingIngest.startGeneric(t, source.toDF().toDF("k", "ver", "payload"),
      Files.createTempDirectory("cmt_rstream_ckpt_").toString)
    try {
      source.addData((0L until 50L).map(k => (k, 1L, s"v1-$k")))
      q.processAllAvailable()
      source.addData((0L until 20L).map(k => (k, 2L, s"v2-$k"))) // updates
      q.processAllAvailable()
      t.refresh()
      assert(t.totalRows == 70) // raw rows across 2 parts, pre-collapse
      val collapsed = t.scan().collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(collapsed.size == 50)
      assert((0L until 20L).forall(k => collapsed(k) == s"v2-$k"),
        "latest version must win across micro-batch parts")
      assert((20L until 50L).forall(k => collapsed(k) == s"v1-$k"))
    } finally q.stop()
  }

  test("session_window closes a session only after the watermark passes its gap") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Double)] // (user, epochSec, value)
    val events = source.toDF().toDF("user_id", "sec", "value")
      .select(col("user_id"), expr("timestamp_seconds(sec)").as("ts"), col("value"))
    val out = StreamingIngest.sessionizedStats(events,
      gap = "30 minutes", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      val base = 1700000000L
      // user 1: two events 10 min apart (one session), then silence;
      // user 2: one event. A later batch advances the watermark far past
      // both gaps, closing and emitting the sessions.
      source.addData((1L, base, 1.0), (1L, base + 600, 2.0), (2L, base, 5.0))
      q.processAllAvailable()
      source.addData((9L, base + 10000, 0.0)) // watermark pusher
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select("user_id", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2L, 3.0)),
        s"user 1's two events merge into one closed session: $rows")
      assert(rows.contains((2L, 1L, 5.0)), s"user 2's singleton session: $rows")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps cumulative per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[UserEvent]
    val out = StreamingIngest.runningUserStats(source.toDS())
    val q = out.writeStream.format("memory").queryName("running_stats")
      .outputMode("update").start()
    try {
      val t0 = new Timestamp(1700000000000L)
      source.addData(UserEvent(1L, t0, 2.0), UserEvent(1L, t0, 3.0),
        UserEvent(2L, t0, 7.0))
      q.processAllAvailable()
      source.addData(UserEvent(1L, t0, 5.0)) // state must carry n=2, sum=5
      q.processAllAvailable()
      val latest = spark.table("running_stats")
        .groupBy("user_id").agg(max(struct(col("n"), col("sum_value"), col("max_value"))).as("s"))
        .select(col("user_id"), col("s.n"), col("s.sum_value"), col("s.max_value"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(latest(1L) == ((3L, 10.0, 5.0)),
        s"user 1 accumulates across batches: ${latest(1L)}")
      assert(latest(2L) == ((1L, 7.0, 7.0)), s"user 2: ${latest(2L)}")
    } finally q.stop()
  }

  test("streaming micro-batches trigger attached materialized views") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Double)]
    val schema = source.toDF().toDF("k", "grp", "v").schema
    val src = ColumnarMergeTree.create(spark,
      Files.createTempDirectory("cmt_mvstream_").toString,
      schema, orderBy = Seq("k"))
    val tgt = src.createMaterializedView("by_grp",
      Files.createTempDirectory("cmt_mvstream_tgt_").toString,
      s"""SELECT grp, count(*) AS n, sum(v) AS sum_v
         |FROM ${ColumnarMergeTree.MvInput} GROUP BY grp""".stripMargin,
      targetOrderBy = Seq("grp"),
      targetMode = MergeMode.Summing(Seq("grp"), Seq("n", "sum_v")))
    val q = StreamingIngest.startGeneric(src, source.toDF().toDF("k", "grp", "v"),
      Files.createTempDirectory("cmt_mvstream_ckpt_").toString)
    try {
      source.addData((0 until 50).map(i => (i.toLong, (i % 3).toLong, 1.0)))
      q.processAllAvailable()
      source.addData((50 until 80).map(i => (i.toLong, (i % 3).toLong, 1.0)))
      q.processAllAvailable()
      tgt.refresh()
      assert(tgt.partCount == 2, "one partial-agg part per micro-batch")
      val got = tgt.scan().orderBy("grp").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toList
      assert(got == List((0L, 27L), (1L, 27L), (2L, 26L)),
        s"streaming MV totals: $got")
    } finally q.stop()
  }

  test("watermarked tumbling window drops late data and finalizes windows") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String, Double)]
    val events = source.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingIngest.windowedCounts(events,
      watermark = "10 minutes", width = "1 hour")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_counts").start()
    try {
      def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
      source.addData((ts(0), "click", 1.0), (ts(30), "click", 2.0), (ts(45), "view", 3.0))
      q.processAllAvailable()
      // advance event time past window end + watermark → first hour finalizes
      source.addData((ts(75), "click", 4.0))
      q.processAllAvailable()
      // this event is older than watermark (win already finalized) → dropped
      source.addData((ts(20), "click", 99.0))
      q.processAllAvailable()
      source.addData((ts(150), "click", 5.0)) // push watermark past hour 2
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("win_start", "event_type", "n", "sum_value").collect()
      // hour-1 windows: the late 99.0 click must NOT be counted; hour-2
      // window finalized by the 12:30 event
      assert(rows.map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet ==
        Set(
          ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
          ("2024-01-01 10:00:00.0", "view", 1L, 3.0),
          ("2024-01-01 11:00:00.0", "click", 1L, 4.0)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes in-window duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, Long, Long, Double)]
    val events = source.toDF().toDF("ts", "user_id", "event_id", "value")
    val q = StreamingIngest.dedupWithinWatermark(events, "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      source.addData((t0, 1L, 100L, 1.0), (t0, 1L, 100L, 1.0), (t0, 2L, 200L, 2.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_stream").collect()
      assert(rows.length == 2, s"duplicates must collapse: ${rows.mkString}")
    } finally q.stop()
  }

  test("streaming corpus ingest drops cross-batch near-dups via the signature store") {
    import graft.operators.MinHashStore
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val docsStream = source.toDF().toDF("doc_id", "text")
    val emptyDsh = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType), StructField("h", LongType))))
    val store = MinHashStore.create(spark,
      Files.createTempDirectory("mhs_stream_").toString, emptyDsh)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingIngest.dedupedCorpusIngest(docsStream, store,
      fresh => got.synchronized {
        got ++= fresh.select("doc_id").collect().map(_.getLong(0))
      },
      Files.createTempDirectory("mhs_stream_ckpt_").toString)
    try {
      val docA = (1 to 60).map(i => s"tok$i").mkString(" ")
      val docB = (100 to 160).map(i => s"other$i").mkString(" ")
      source.addData((1L, docA), (2L, docB))
      q.processAllAvailable()
      assert(got.sorted.toList == List(1L, 2L), "empty store: batch 1 passes through")
      // batch 2: a one-token edit of docA (J ≈ 0.84 on 5-shingles — LSH
      // collision with doc 1's stored bands) plus a genuinely novel doc
      val docA2 = docA.replace("tok30 ", "edited ")
      val docC = (200 to 260).map(i => s"novel$i").mkString(" ")
      source.addData((3L, docA2), (4L, docC))
      q.processAllAvailable()
      assert(got.sorted.toList == List(1L, 2L, 4L),
        s"near-dup 3 dropped, novel 4 kept: $got")
      assert(store.signatures.select("doc_id").distinct().count() == 3,
        "store holds signatures of the three KEPT docs only")
    } finally q.stop()
  }

  test("streaming index ingest: search after N micro-batches == one-shot build; replays skipped") {
    import graft.operators.InvertedIndex
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val terms = Seq("dup", "vector", "merge")

    // One-shot reference: the whole corpus in a single build.
    val oneShotPath = Files.createTempDirectory("inv_oneshot_").toString
    val oneShot = InvertedIndex.build(spark, corpus, oneShotPath, nbuckets = 8)

    // Streamed: build over the first slice, then feed the rest through
    // indexedCorpusIngest in three micro-batches.
    val streamedPath = Files.createTempDirectory("inv_stream_").toString
    val idx = InvertedIndex.build(spark,
      corpus.filter(col("doc_id") < 20), streamedPath, nbuckets = 8)
    val rest = corpus.filter(col("doc_id") >= 20)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val ckpt = Files.createTempDirectory("inv_stream_ckpt_").toString
    val source = MemoryStream[(Long, String)]
    val q = StreamingIngest.indexedCorpusIngest(
      source.toDF().toDF("doc_id", "text"), idx, ckpt)
    try {
      rest.grouped((rest.length + 2) / 3).foreach { batch =>
        source.addData(batch.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // Equality is exact: per-doc postings are deterministic and
    // df/avgdl/nDocs derive from totals, which appends bump exactly.
    val a = idx.search(terms, k = 15).collect().toSeq
    val b = oneShot.search(terms, k = 15).collect().toSeq
    assert(a == b, s"streamed index must equal one-shot build:\n$a\nvs\n$b")
    val (sa, sb) = (InvertedIndex.readStats(streamedPath),
      InvertedIndex.readStats(oneShotPath))
    assert((sa.n_docs, sa.n_dl_docs, sa.total_dl) ==
      ((sb.n_docs, sb.n_dl_docs, sb.total_dl)),
      s"streamed totals must equal one-shot totals: $sa vs $sb")

    // Replay posture: an index append is NOT harmlessly duplicable (a
    // replay would double postings and totals). The applied batch id
    // commits INSIDE the stats swap (stream_batch), so replaying the last
    // micro-batch exactly as foreachBatch would re-deliver it is a no-op
    // — no crash point between an append and a separate record file can
    // exist, because there is no separate record file.
    val lastBatch = 2L
    val saStats = InvertedIndex.readStats(streamedPath)
    val feeds = saStats.stream_feeds.getOrElse(fail("feed map must be recorded"))
    assert(feeds.size == 1 && feeds.head._2 == lastBatch,
      s"the feed's high-water mark must be $lastBatch: $feeds")
    val lin = feeds.head._1
    assert(!idx.appendStream(corpus.filter(col("doc_id") >= 20), lastBatch, lin),
      "a replayed batch id must be skipped")
    val sa2 = InvertedIndex.readStats(streamedPath)
    assert((sa2.n_docs, sa2.n_dl_docs, sa2.total_dl) ==
      ((sa.n_docs, sa.n_dl_docs, sa.total_dl)),
      "a replayed batch must not change the index")
    idx.table.shutdown(); oneShot.table.shutdown()
  }

  test("streaming index ingest: torn append attempt repairs on replay (exactly-once)") {
    import graft.operators.InvertedIndex
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val terms = Seq("dup", "vector", "merge")

    // Reference: one-shot build over the full corpus.
    val oneShotPath = Files.createTempDirectory("inv_torn_ref_").toString
    val oneShot = InvertedIndex.build(spark, corpus, oneShotPath, nbuckets = 8)

    // Index over the first slice; batch 0 streams in the rest — but a
    // prior attempt of batch 0 "crashed" after publishing (some of) its
    // parts and before the stats stamp: simulate by landing posting-shaped
    // rows for the batch's doc ids straight into the table and leaving the
    // intent marker behind. The rows' content doesn't matter — the repair
    // scrubs by doc_id before redoing the batch.
    val tornPath = Files.createTempDirectory("inv_torn_").toString
    val idx = InvertedIndex.build(spark,
      corpus.filter(col("doc_id") < 20), tornPath, nbuckets = 8)
    val batch = corpus.filter(col("doc_id") >= 20 && col("doc_id") < 40)
    import spark.implicits._
    val fakeRows = batch.select(col("doc_id")).distinct().as[Long].collect()
      .map(id => (id % 8, "torn_garbage", id, 1L, 1L, Seq(0L)))
    idx.table.insertBatch(spark.createDataset(fakeRows.toSeq)
      .toDF("bucket", "term", "doc_id", "tf", "dl", "positions"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tornPath, "_stream_intent"), "feedA:0")

    // The replay: guard passes (stream_batch absent), intent names this
    // lineage's batch 0 -> scrub the torn rows, then append cleanly.
    assert(idx.appendStream(batch, 0L, "feedA"), "the torn batch must re-apply")

    // A NEW checkpoint lineage pointed at the same index starts at ITS
    // batch 0 — same number as feedA's committed high-water mark, so a
    // lineage-blind guard would silently discard it.
    assert(idx.appendStream(corpus.filter(col("doc_id") >= 40), 0L, "feedB"),
      "a new lineage's batch 0 must apply, not read as a replay")
    assert(!idx.appendStream(corpus.filter(col("doc_id") >= 40), 0L, "feedB"),
      "the new lineage's own replays must still be skipped")
    val a = idx.search(terms, k = 15).collect().toSeq
    val b = oneShot.search(terms, k = 15).collect().toSeq
    assert(a == b, s"repaired index must equal one-shot build:\n$a\nvs\n$b")
    val leftover = idx.table.scan()
      .filter(col("term") === "torn_garbage").count()
    assert(leftover == 0L, "torn rows must be scrubbed, not merged")

    // A FOREIGN lineage's torn intent (a batch the feed map has never
    // committed) must refuse loudly — its ids are unknowable, and
    // appending over it would bury phantom rows.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tornPath, "_stream_intent"), "ghost:7")
    val ex = intercept[IllegalArgumentException] {
      idx.appendStream(corpus.filter(col("doc_id") >= 40), 1L, "feedB")
    }
    assert(ex.getMessage.contains("rebuild"), s"got: ${ex.getMessage}")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(tornPath, "_stream_intent"))
    val (sa, sb) = (InvertedIndex.readStats(tornPath),
      InvertedIndex.readStats(oneShotPath))
    assert((sa.n_docs, sa.n_dl_docs, sa.total_dl) ==
      ((sb.n_docs, sb.n_dl_docs, sb.total_dl)),
      s"repaired totals must equal one-shot totals: $sa vs $sb")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(tornPath, "_stream_intent")),
      "a committed append clears its intent marker")
    idx.table.shutdown(); oneShot.table.shutdown()
  }

  test("streaming ANN ingest: torn attempt repairs, lineages scope, stream == rebuild") {
    import graft.operators.IvfIndex
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vectors = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = vectors.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))

    val path = Files.createTempDirectory("ivf_stream_").toString
    val idx = IvfIndex.build(spark,
      vectors.filter(col("vec_id") < 100), path, nlist = 8)

    // Torn prior attempt of feedA's batch 0 (vec_ids [100, 300)): its
    // rows "landed" (fake dim-1 rows stand in — the repair scrubs by
    // vec_id, content never read) but the guard never advanced; the
    // intent marker names the batch.
    val batchA = vectors.filter(col("vec_id") >= 100 && col("vec_id") < 300)
    val fakeIds = batchA.select(col("vec_id")).as[Long].collect()
    idx.table.insertBatch(
      spark.createDataset(fakeIds.toSeq.map(id => (id % 8, id, Seq(9.9))))
        .toDF("cid", "vec_id", "v"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_stream_intent"), "feedA:0")
    assert(idx.appendStream(batchA, 0L, "feedA"), "the torn batch must re-apply")
    assert(!idx.appendStream(batchA, 0L, "feedA"), "feedA's replay must skip")

    // The rest arrives through the streaming sink — a DIFFERENT lineage
    // (the stream's own checkpoint id) whose batch ids also start at 0:
    // a lineage-blind guard would discard every one of them.
    val rest = vectors.filter(col("vec_id") >= 300)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val ckpt = Files.createTempDirectory("ivf_stream_ckpt_").toString
    val source = MemoryStream[(Long, Seq[Double])]
    val q = StreamingIngest.annCorpusIngest(
      source.toDF().toDF("vec_id", "v"), idx, ckpt)
    try {
      rest.grouped(math.max(1, (rest.length + 1) / 2)).foreach { batch =>
        source.addData(batch.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    idx.table.refresh()
    val n = vectors.count()
    assert(idx.table.totalRows == n,
      s"every vector must land exactly once: ${idx.table.totalRows} of $n")
    assert(idx.table.scan().filter(size(col("v")) === 1).count() == 0L,
      "torn fake rows must be scrubbed, not merged")
    // nprobe = nlist makes the IVF path exact brute-force, so quantizer
    // drift between the two builds cannot move either answer.
    val rebuilt = IvfIndex.build(spark, vectors,
      Files.createTempDirectory("ivf_stream_full_").toString, nlist = 8)
    val a = idx.search(queries, k = 5, nprobe = 8).collect().toSeq
    val b = rebuilt.search(queries, k = 5, nprobe = 8).collect().toSeq
    assert(a == b, s"streamed index must equal rebuild:\n$a\nvs\n$b")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "_stream_intent")),
      "a committed append clears its intent marker")
    idx.table.shutdown(); rebuilt.table.shutdown()
  }

  test("deduped ingest is replay-stable: intra-batch dups resolve before the store check") {
    import graft.operators.MinHashStore
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    implicit val sqlCtx = spark.sqlContext
    val emptyDsh = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType), StructField("h", LongType))))
    val store = MinHashStore.create(spark,
      Files.createTempDirectory("mhs_replay_").toString, emptyDsh)
    val docA = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docA2 = docA.replace("tok30 ", "edited ") // J ≈ 0.84 vs docA
    val docC = (200 to 260).map(i => s"novel$i").mkString(" ")
    val batch = Seq((1L, docA), (2L, docA2), (7L, docC))

    def runBatch(): List[Long] = {
      val source = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = StreamingIngest.dedupedCorpusIngest(
        source.toDF().toDF("doc_id", "text"), store,
        fresh => got.synchronized {
          got ++= fresh.select("doc_id").collect().map(_.getLong(0))
        },
        Files.createTempDirectory("mhs_replay_ckpt_").toString)
      try {
        source.addData(batch: _*)
        q.processAllAvailable()
      } finally q.stop()
      got.sorted.toList
    }

    // first attempt: the intra-batch near-dup pair {1, 2} resolves to its
    // min id BEFORE the (empty) store is consulted
    assert(runBatch() == List(1L, 7L),
      "intra-batch near-dup must keep the min doc_id")
    // replay (fresh checkpoint, same batch, store now holding the first
    // attempt's appended signatures): the store check must ignore the
    // batch's own stored ids — the ADVICE r8 failure mode was 1 and 2
    // colliding with each other's stored bands and BOTH vanishing
    assert(runBatch() == List(1L, 7L),
      "replay after append must emit exactly the first attempt's rows")
    assert(store.signatures.select("doc_id").distinct().count() == 2,
      "store holds the kept ids only (duplicated signature rows allowed)")
  }

  test("composed RAG ingest: one stream advances chunk-text + ANN indexes " +
    "together; hybrid serve == one-shot build of both") {
    import graft.operators.{InvertedIndex, IvfIndex}
    import graft.queries.PipelineQueries
    implicit val sqlCtx = spark.sqlContext
    // 10 docs, ~30 tokens each (3 chunks at W=16 O=4); every 3rd doc
    // carries 'needle' at token 20 — evidence ONLY in its 2nd chunk — and
    // a deterministic 4-dim embedding.
    def doc(i: Long): (Long, String, Seq[Double]) = {
      val ws = (0 until 30).map(j => s"word${(i * 7 + j) % 40}")
      val txt = (if (i % 3 == 0) ws.updated(20, "needle") else ws).mkString(" ")
      (i, txt, (0 until 4).map(d => math.sin(i.toDouble * 4 + d)))
    }
    val docsAll = (0L until 10L).map(doc)
    val span = PipelineQueries.ChunkKeySpan
    def chunksOf(ds: Seq[(Long, String, Seq[Double])]) =
      PipelineQueries.ragChunksText(
          ds.map(d => (d._1, d._2)).toDF("doc_id", "text"), 16, 4)
        .select((col("doc_id") * span + col("chunk_idx")).as("doc_id"),
          col("txt").as("text"))
    def vecsOf(ds: Seq[(Long, String, Seq[Double])]) =
      ds.map(d => (d._1, d._3)).toDF("vec_id", "v")

    // Streamed pair: seed build on the first 4 docs, the remaining 6
    // arrive in 3 micro-batches through ONE composed stream.
    val (seed, rest) = docsAll.splitAt(4)
    val textIdx = InvertedIndex.build(spark, chunksOf(seed),
      Files.createTempDirectory("rag_text_").toString, nbuckets = 8)
    val annIdx = IvfIndex.build(spark, vecsOf(seed),
      Files.createTempDirectory("rag_ann_").toString, nlist = 4)
    val ckpt = Files.createTempDirectory("rag_ckpt_").toString
    val source = MemoryStream[(Long, String, Seq[Double])]
    val q = StreamingIngest.ragCorpusIngest(
      source.toDF().toDF("doc_id", "text", "v"), textIdx, annIdx, ckpt)
    try {
      rest.grouped(2).foreach { b =>
        source.addData(b.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // One-shot twins over the full corpus (nprobe = nlist keeps the ANN
    // comparison exact despite quantizer drift between the two builds).
    val oneText = InvertedIndex.build(spark, chunksOf(docsAll),
      Files.createTempDirectory("rag_text_one_").toString, nbuckets = 8)
    val oneAnn = IvfIndex.build(spark, vecsOf(docsAll),
      Files.createTempDirectory("rag_ann_one_").toString, nlist = 4)

    // Lexical face at chunk granularity: identical fold, identical ranks,
    // and the 2nd-chunk-only docs are found with the chunk attributed.
    val lexS = PipelineQueries.chunkLexTopDocs(textIdx, 0L, Seq("needle"), 10)
      .collect().toSeq
    val lexO = PipelineQueries.chunkLexTopDocs(oneText, 0L, Seq("needle"), 10)
      .collect().toSeq
    assert(lexS == lexO, s"streamed chunk-lexical != one-shot:\n$lexS\nvs\n$lexO")
    assert(lexS.map(_.getLong(1)).toSet == Set(0L, 3L, 6L, 9L),
      s"every needle doc (incl. streamed ones) must be found: $lexS")
    assert(lexS.forall(_.getLong(3) == 1L),
      s"the evidence chunk is chunk 1 for every needle doc: $lexS")

    // ANN face: exact search equal after streaming.
    val queries = vecsOf(docsAll.take(2)).select(col("vec_id").as("qid"),
      col("v").as("qv"))
    val annS = annIdx.search(queries, k = 5, nprobe = 4).collect().toSeq
    val annO = oneAnn.search(queries, k = 5, nprobe = 4).collect().toSeq
    assert(annS == annO, s"streamed ANN != one-shot:\n$annS\nvs\n$annO")

    // The HYBRID serve — RRF fusion of the two lists — is therefore equal
    // too; pin it end to end through the shared fusion arithmetic.
    def fused(ti: InvertedIndex, ai: IvfIndex) = PipelineQueries.rrfFuse(
      PipelineQueries.chunkLexTopDocs(ti, 0L, Seq("needle"), 10)
        .select(col("qid"), col("doc_id"), col("lrk")),
      ai.search(queries, k = 5, nprobe = 4)
        .filter(col("qid") === 0L)
        .select(col("qid"), col("vec_id").as("doc_id"), col("rnk").as("vrk")),
      topN = 10).collect().toSeq
    assert(fused(textIdx, annIdx) == fused(oneText, oneAnn),
      "hybrid serve after N batches must equal the one-shot build of both")

    textIdx.table.shutdown(); annIdx.table.shutdown()
    oneText.table.shutdown(); oneAnn.table.shutdown()
  }
}
