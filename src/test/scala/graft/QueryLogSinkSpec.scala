package graft

import graft.sources.{QueryLog, QueryLogSink}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** query_log persistence into a ColumnarMergeTree table: entries survive
  * ring eviction, the reopened table is an ordinary mergetree table, and
  * the sink's own flush writes never log themselves (recursion guard).
  */
class QueryLogSinkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  private def awaitLog(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    while (!cond && System.nanoTime() < deadline) Thread.sleep(20)
    assert(cond, "query log condition not met within 5s")
  }

  test("ring-evicted entries stay queryable from the persisted table; flushes never log themselves") {
    val dir = Files.createTempDirectory("qlog_sink_").toString
    QueryLog.install(spark)
    QueryLog.clear()
    spark.conf.set(QueryLogSink.ConfKey, dir)
    try {
      QueryLogSink.configure(spark)
      (1 to 5).foreach(i => spark.range(i * 10L).selectExpr("sum(id)").collect())
      awaitLog(QueryLog.entries.count(_.status == "ok") >= 5)
      val mySession = org.apache.spark.sql.graft.SessionBridge.uuid(spark)
      val digests = QueryLog.entries.filter(_.status == "ok").map(_.planDigest).toSet
      QueryLogSink.flushNow()
      QueryLog.clear() // simulate ring eviction past Capacity
      // the reopened log is an ordinary mergetree table
      val persisted = spark.read.format("mergetree").load(dir)
        .select("plan_digest", "session", "status")
        .collect()
      assert(persisted.nonEmpty, "flush must have persisted entries")
      val got = persisted.map(_.getString(0)).toSet
      assert(digests.subsetOf(got),
        s"ring entries missing from the persisted table: ${digests.diff(got)}")
      // recursion guard: every persisted entry came from the USER session —
      // the sink's own insertBatch jobs (cloned session) never logged
      assert(persisted.forall(_.getString(1) == mySession),
        "sink flush executions leaked into the log")
      // …and the in-memory ring (post-clear) gained nothing from the
      // flush or the reads above beyond user-session entries
      awaitLog(QueryLog.entries.forall(_.session == mySession))
    } finally {
      spark.conf.unset(QueryLogSink.ConfKey)
      QueryLogSink.reset()
      graft.mergetree.MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("re-activation appends to the existing table: both generations queryable") {
    val dir = Files.createTempDirectory("qlog_sink_gen_").toString
    QueryLog.install(spark)
    spark.conf.set(QueryLogSink.ConfKey, dir)
    try {
      // generation 1
      QueryLogSink.configure(spark)
      QueryLog.clear()
      spark.range(11L).count()
      awaitLog(QueryLog.entries.nonEmpty)
      QueryLogSink.flushNow()
      val gen1 = spark.read.format("mergetree").load(dir).count()
      assert(gen1 > 0)
      // simulate a restart: deactivate, then re-configure the SAME dir
      QueryLogSink.reset()
      QueryLogSink.configure(spark)
      val before = QueryLog.entries.size
      spark.range(13L).selectExpr("max(id)").collect()
      awaitLog(QueryLog.entries.size > before) // the NEW query's offer landed
      QueryLogSink.flushNow()
      val gen2 = spark.read.format("mergetree").load(dir).count()
      assert(gen2 > gen1, s"re-activated sink must append ($gen1 -> $gen2)")
    } finally {
      spark.conf.unset(QueryLogSink.ConfKey)
      QueryLogSink.reset()
      graft.mergetree.MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("reopening a persisted log fast-forwards seq past the table's max") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.{col, max}
    val dir = Files.createTempDirectory("qlog_seed_").toString
    QueryLog.install(spark)
    try {
      // a previous process generation persisted entries up to seq = 10^9;
      // this process's counter is far below it
      val t = graft.mergetree.ColumnarMergeTree.create(spark, dir,
        QueryLogSink.schema, orderBy = Seq("seq"))
      import scala.jdk.CollectionConverters._
      val old = (999999998L to 1000000000L).map(s =>
        Row(s, 0L, "oldgen", "f", 1.0, "ok", null, null, "d", "p"))
      t.insertBatch(spark.createDataFrame(old.asJava, QueryLogSink.schema),
        partitions = 1)
      spark.conf.set(QueryLogSink.ConfKey, dir)
      QueryLogSink.configure(spark)
      val before = QueryLog.entries.size
      spark.range(7L).selectExpr("max(id)").collect()
      awaitLog(QueryLog.entries.size > before)
      QueryLogSink.flushNow()
      val maxNew = spark.read.format("mergetree").load(dir)
        .where(col("session") =!= "oldgen")
        .agg(max(col("seq"))).collect().head.getLong(0)
      assert(maxNew > 1000000000L,
        s"new entries must continue the persisted monotone seq, got $maxNew")
    } finally {
      spark.conf.unset(QueryLogSink.ConfKey)
      QueryLogSink.reset()
      graft.mergetree.MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("sink inactive without the conf: offers are dropped, nothing is written") {
    QueryLogSink.reset()
    val e = QueryLog.Entry(1L, 0L, "s", "f", 1.0, "ok", None, None, "d", "p")
    QueryLogSink.offer(e) // must be a no-op, not a crash
    QueryLogSink.flushNow()
  }
}
