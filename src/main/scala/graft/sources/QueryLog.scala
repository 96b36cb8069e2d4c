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
  * ~2.5 KB of strings ≈ 5 MB ceiling. Everything extracted on the
  * listener path is BOUNDED: the digest is the canonicalized plan's
  * structural `semanticHash` (no plan string is ever materialized for it)
  * and the `plan` preview renders through a capped appender, so a
  * 10k-operator union can't allocate an unbounded string per query.
  * Like ClickHouse's, the log is SERVER-wide (process-global ring): the
  * `session` column carries each entry's session UUID so a multi-session
  * deployment can filter to its own history — deliberate, documented
  * scope (one driver == one "server").
  *
  * Durability: ClickHouse persists query_log into a MergeTree table; see
  * [[QueryLogSink]] — an opt-in conf routes evicted ring entries into a
  * ColumnarMergeTree table through the engine's own insertBatch path.
  */
object QueryLog {

  val Capacity = 1024

  /** Cap on the stored plan preview (chars). */
  val PlanPreviewChars = 2500

  final case class Entry(
      seq: Long,
      eventMs: Long,
      session: String,
      func: String,
      durationMs: Double,
      status: String,
      error: Option[String],
      outputRows: Option[Long],
      planDigest: String,
      plan: String)

  private val seq = new AtomicLong(0L)

  /** Fast-forward the seq counter past `atLeast` — QueryLogSink seeds it
    * from a reopened persisted log's max(seq), so entries appended after a
    * driver restart continue the table's monotone key instead of
    * restarting at 1 and interleaving generations on read.
    */
  private[sources] def seedSeq(atLeast: Long): Unit = {
    var cur = seq.get()
    while (cur < atLeast && !seq.compareAndSet(cur, atLeast)) cur = seq.get()
  }

  private val ring = new java.util.ArrayDeque[Entry](Capacity)

  /** Sessions that already carry the listener — install is idempotent per
    * session; weak keys so the set never retains a session.
    */
  private val installed = java.util.Collections.newSetFromMap(
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** `spark.graft.queryLog.enabled=false` keeps the listener out of a
    * session entirely — observability is opt-out, never a tax a user
    * can't decline.
    */
  private def enabled(spark: SparkSession): Boolean =
    try spark.conf.get("spark.graft.queryLog.enabled", "true").toBoolean
    catch { case _: Exception => true }

  def install(spark: SparkSession): Unit = {
    QueryLogSink.configure(spark)
    if (enabled(spark) && installed.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          record(funcName, qe, durationNs, None)
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
          record(funcName, qe, 0L, Some(exception))
      })
    }
  }

  private def record(funcName: String, qe: QueryExecution, durationNs: Long,
      failure: Option[Exception]): Unit = {
    val sess = try org.apache.spark.sql.graft.SessionBridge.uuid(qe.sparkSession)
      catch { case _: Exception => "" }
    if (QueryLogSink.isSinkSession(sess)) return // the sink's own flushes never log
    // Extract strings NOW — an Entry must never pin the plan tree.
    val entry = try {
      val exec = qe.executedPlan
      Entry(
        seq = seq.incrementAndGet(),
        eventMs = System.currentTimeMillis(),
        session = sess,
        func = funcName,
        durationMs = durationNs / 1e6,
        status = if (failure.isEmpty) "ok" else "error",
        error = failure.map(e => s"${e.getClass.getSimpleName}: ${
          Option(e.getMessage).getOrElse("")}".take(500)),
        outputRows = exec.metrics.get("numOutputRows").map(_.value).filter(_ > 0),
        planDigest = structuralDigest(exec),
        plan = boundedTreeString(exec, PlanPreviewChars))
    } catch {
      case e: Exception => // a log must never fail the query path
        Entry(seq.incrementAndGet(), System.currentTimeMillis(), "", funcName,
          durationNs / 1e6, if (failure.isEmpty) "ok" else "error",
          Some(s"query_log extraction failed: $e".take(500)), None, "", "")
    }
    ring.synchronized {
      if (ring.size >= Capacity) ring.pollFirst()
      ring.addLast(entry)
    }
    QueryLogSink.offer(entry)
  }

  /** Structural digest of the canonicalized plan: `semanticHash` walks the
    * tree without ever materializing a plan string (the old
    * `canonicalized.toString` allocated the FULL tree string — unbounded
    * for wide plans — on every logged query).
    */
  private def structuralDigest(exec: org.apache.spark.sql.execution.SparkPlan): String =
    f"${exec.canonicalized.semanticHash()}%08x"

  /** Plan preview through a capped appender — generation walks the tree
    * but never holds more than `cap` chars.
    */
  private def boundedTreeString(
      exec: org.apache.spark.sql.execution.SparkPlan, cap: Int): String = {
    val sb = new java.lang.StringBuilder(math.min(cap, 1024))
    exec.treeString(
      (s: String) => if (sb.length < cap) {
        sb.append(s, 0, math.min(s.length, cap - sb.length)); ()
      },
      false, false, 25, false, false)
    sb.toString
  }

  /** The digest a log entry for `df`'s execution carries — lets a caller
    * find its own query in the log.
    */
  def digestOf(df: org.apache.spark.sql.DataFrame): String =
    structuralDigest(df.queryExecution.executedPlan)

  def entries: Seq[Entry] = ring.synchronized {
    import scala.jdk.CollectionConverters._
    ring.iterator().asScala.toList
  }

  def clear(): Unit = ring.synchronized(ring.clear())

  def df(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    entries.map(e => (e.seq, e.eventMs, e.session, e.func, e.durationMs, e.status,
        e.error.orNull, e.outputRows.map(Long.box).orNull, e.planDigest, e.plan))
      .toDF("seq", "event_ms", "session", "func", "duration_ms", "status", "error",
        "output_rows", "plan_digest", "plan")
  }
}
