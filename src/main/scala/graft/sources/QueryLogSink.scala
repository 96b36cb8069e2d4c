package graft.sources

import graft.mergetree.{ColumnarMergeTree, MergeTreeConfig}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Opt-in persistence of [[QueryLog]] into a ColumnarMergeTree table —
  * ClickHouse's `system.query_log` IS a MergeTree table; the in-memory
  * ring alone forgets everything past `Capacity` entries.
  *
  * Enable with `spark.graft.queryLog.path=<table dir>` on any
  * extension-enabled session (checked at `QueryLog.install`, i.e. session
  * construction, and re-checked on the first offer after a conf change).
  * Every logged entry is buffered; each `FlushEvery` entries one
  * insertBatch — the engine's own ingest path, dogfooded — lands them as a
  * sorted part, asynchronously on a dedicated thread so the listener bus
  * never blocks on parquet I/O. The reopened log is an ordinary mergetree
  * table: `spark.read.format("mergetree").load(dir)` or
  * `ColumnarMergeTree.open(spark, dir).scan()`.
  *
  * Recursion guard: the sink runs its writes on a CLONED session whose
  * UUID `QueryLog.record` drops — the flush's own jobs (which fire the
  * same QueryExecutionListener) never log, so one flush cannot enqueue
  * the next. Session-UUID suppression is airtight where thread-identity
  * is not (listener callbacks arrive on the shared listener bus thread,
  * not the query's thread).
  *
  * Scale posture: the table is keyed by `seq` (monotone), so parts never
  * overlap and range scans over "recent history" prune to the tail part —
  * and the flush batches are bounded (`FlushEvery` rows), so the sink adds
  * O(1) driver memory regardless of query rate.
  */
object QueryLogSink {

  val ConfKey = "spark.graft.queryLog.path"

  /** Entries per persisted batch. Small enough that a crash loses minutes
    * of history, large enough that parts are not confetti (the table's own
    * merges compact them anyway).
    */
  val FlushEvery = 64

  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("event_ms", LongType, nullable = false),
    StructField("session", StringType, nullable = false),
    StructField("func", StringType, nullable = false),
    StructField("duration_ms", DoubleType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("error", StringType, nullable = true),
    StructField("output_rows", LongType, nullable = true),
    StructField("plan_digest", StringType, nullable = false),
    StructField("plan", StringType, nullable = false)))

  private final class Active(val dir: String, val sinkSession: SparkSession,
      val table: ColumnarMergeTree)

  @volatile private var active: Option[Active] = None
  private val buf = new ArrayBuffer[QueryLog.Entry]()
  private val lock = new Object

  /** Seconds between timed flushes of a PARTIALLY filled buffer — a quiet
    * session must not hold its last < FlushEvery entries hostage forever.
    */
  val FlushSeconds = 30L

  /** Single daemon flusher: batches are small and ordered; one thread
    * keeps part ids monotone with arrival order without any further
    * synchronization. Doubles as the timed-flush scheduler.
    */
  private lazy val flusher = {
    val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-querylog-sink"); t.setDaemon(true); t
    })
    ex.scheduleWithFixedDelay(() => {
      val batch = lock.synchronized {
        if (buf.isEmpty) Vector.empty else { val b = buf.toVector; buf.clear(); b }
      }
      if (batch.nonEmpty) persist(batch)
    }, FlushSeconds, FlushSeconds, java.util.concurrent.TimeUnit.SECONDS)
    ex
  }

  /** True iff `sessionUUID` is the sink's own write session — such
    * executions must never be logged (see recursion guard above).
    */
  def isSinkSession(sessionUUID: String): Boolean =
    active.exists(a =>
      org.apache.spark.sql.graft.SessionBridge.uuid(a.sinkSession) == sessionUUID)

  /** Read the conf and (de)activate the sink. Idempotent; called from
    * QueryLog.install and safe to call again after a conf change.
    */
  def configure(spark: SparkSession): Unit = lock.synchronized {
    val path = try spark.conf.getOption(ConfKey).filter(_.nonEmpty)
      catch { case _: Exception => None }
    (path, active) match {
      case (Some(dir), Some(a)) if a.dir == dir => // already active
      case (Some(dir), _) =>
        val sink = spark.newSession()
        val table =
          if (ColumnarMergeTree.TableDef.load(dir).isDefined) {
            val t = ColumnarMergeTree.open(sink, dir)
            // Reopening an existing log (driver restart): fast-forward the
            // process-lifetime seq counter past the persisted max(seq) —
            // manifest-only (seq is the numeric lead key, so each part's
            // maxKey IS its max seq) — else new entries would repeat seq
            // values and readers ordering by seq would interleave
            // generations, breaking the monotone-key/no-overlap posture.
            val persistedMax = t.parts.flatMap(p => Option(p.maxKey))
              .flatMap(k => scala.util.Try(k.toLong).toOption)
            persistedMax.maxOption.foreach(QueryLog.seedSeq)
            t
          } else ColumnarMergeTree.create(sink, dir, schema, orderBy = Seq("seq"),
            config = MergeTreeConfig(maxParts = 16))
        active = Some(new Active(dir, sink, table))
        flusher // start the timed partial-buffer flush with the first activation
      case (None, Some(_)) => active = None
      case (None, None)    =>
    }
  }

  /** Called by QueryLog.record for every ring entry; no-op when inactive. */
  def offer(e: QueryLog.Entry): Unit = {
    if (active.isEmpty) return
    val batch = lock.synchronized {
      buf += e
      if (buf.size >= FlushEvery) { val b = buf.toVector; buf.clear(); Some(b) }
      else None
    }
    batch.foreach(b => flusher.execute(() => persist(b)))
  }

  /** Drain the buffer synchronously — shutdown/test hook. Waits for any
    * in-flight async flush so callers observe a complete table.
    */
  def flushNow(): Unit = {
    val batch = lock.synchronized {
      val b = buf.toVector; buf.clear(); b
    }
    val done = flusher.submit(new Runnable {
      def run(): Unit = if (batch.nonEmpty) persist(batch)
    })
    done.get()
  }

  private def persist(batch: Vector[QueryLog.Entry]): Unit =
    active.foreach { a =>
      try {
        val rows = batch.map(e => Row(e.seq, e.eventMs, e.session, e.func,
          e.durationMs, e.status, e.error.orNull,
          e.outputRows.map(Long.box).orNull, e.planDigest, e.plan))
        import scala.jdk.CollectionConverters._
        a.table.insertBatch(
          a.sinkSession.createDataFrame(rows.asJava, schema), partitions = 1)
      } catch {
        case e: Exception => // persistence must never break the query path
          System.err.println(s"[querylog-sink] flush failed: $e")
      }
    }

  /** Test hook: deactivate and forget buffered entries. */
  private[graft] def reset(): Unit = lock.synchronized {
    active = None; buf.clear()
  }
}
