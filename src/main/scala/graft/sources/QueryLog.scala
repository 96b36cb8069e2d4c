package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.atomic.AtomicLong

/** ClickHouse `system.query_log`, driver-side: every action's query
  * execution lands in a bounded in-memory ring — what ran, how long it
  * took, whether it failed, how many rows the plan emitted, and a
  * canonical plan digest (two queries with the same digest planned
  * identically — the first thing to check when a query is suddenly slow).
  *
  * Faces: `QueryLog.df(spark)` and the SQL table function
  * `SELECT * FROM query_log()` (registered by GraftExtensions; the
  * listener installs itself with the extension, so any extension-enabled
  * session logs from its first query).
  *
  * Scale posture: the ring is driver memory only — `Capacity` entries ×
  * ~2.5 KB of strings ≈ 5 MB ceiling, strings truncated at record time so
  * no QueryExecution (and thus no plan tree) is ever retained. ClickHouse
  * persists its query_log into a MergeTree table; wiring this ring to a
  * ColumnarMergeTree sink is one insertBatch per flush if durability is
  * ever needed — observability of a LIVE session does not need it.
  */
object QueryLog {

  val Capacity = 1024

  final case class Entry(
      seq: Long,
      eventMs: Long,
      func: String,
      durationMs: Double,
      status: String,
      error: Option[String],
      outputRows: Option[Long],
      planDigest: String,
      plan: String)

  private val seq = new AtomicLong(0L)
  private val ring = new java.util.ArrayDeque[Entry](Capacity)

  /** Sessions that already carry the listener — install is idempotent per
    * session; weak keys so the set never retains a session.
    */
  private val installed = java.util.Collections.newSetFromMap(
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def install(spark: SparkSession): Unit =
    if (installed.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          record(funcName, qe, durationNs, None)
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
          record(funcName, qe, 0L, Some(exception))
      })
    }

  private def record(funcName: String, qe: QueryExecution, durationNs: Long,
      failure: Option[Exception]): Unit = {
    // Extract strings NOW — an Entry must never pin the plan tree.
    val entry = try {
      val exec = qe.executedPlan
      Entry(
        seq = seq.incrementAndGet(),
        eventMs = System.currentTimeMillis(),
        func = funcName,
        durationMs = durationNs / 1e6,
        status = if (failure.isEmpty) "ok" else "error",
        error = failure.map(e => s"${e.getClass.getSimpleName}: ${
          Option(e.getMessage).getOrElse("")}".take(500)),
        outputRows = exec.metrics.get("numOutputRows").map(_.value).filter(_ > 0),
        planDigest = digest(exec.canonicalized.toString),
        plan = exec.treeString.linesIterator.take(40).mkString("\n").take(2500))
    } catch {
      case e: Exception => // a log must never fail the query path
        Entry(seq.incrementAndGet(), System.currentTimeMillis(), funcName,
          durationNs / 1e6, if (failure.isEmpty) "ok" else "error",
          Some(s"query_log extraction failed: $e".take(500)), None, "", "")
    }
    ring.synchronized {
      if (ring.size >= Capacity) ring.pollFirst()
      ring.addLast(entry)
    }
  }

  private def digest(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** The digest a log entry for `df`'s execution carries — lets a caller
    * find its own query in the log.
    */
  def digestOf(df: org.apache.spark.sql.DataFrame): String =
    digest(df.queryExecution.executedPlan.canonicalized.toString)

  def entries: Seq[Entry] = ring.synchronized {
    import scala.jdk.CollectionConverters._
    ring.iterator().asScala.toList
  }

  def clear(): Unit = ring.synchronized(ring.clear())

  def df(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    entries.map(e => (e.seq, e.eventMs, e.func, e.durationMs, e.status,
        e.error.orNull, e.outputRows.map(Long.box).orNull, e.planDigest, e.plan))
      .toDF("seq", "event_ms", "func", "duration_ms", "status", "error",
        "output_rows", "plan_digest", "plan")
  }
}
