package graft.queries

import graft.mergetree._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files
import scala.collection.concurrent.TrieMap

/** Storage-semantics queries (SURVEY §2.3 Q1–Q8): each one runs through the
  * MergeTree table path — ingest → (flush/compact/reopen) → query — and is
  * oracle-checked against DuckDB SQL computing the same rows directly from
  * the source parquet (or from literals, for the scenario queries).
  *
  * Ingest mapping (FIXTURES.md §3): events →
  *   key = event_type || '_' || user_id   (string key, natural duplicates)
  *   value = props
  *   timestamp = event_id                  (unique u64 version)
  * Rows are inserted in event_id order so flush boundaries are
  * deterministic. event_id uniqueness makes the engine's (key,ts) dedup a
  * no-op on this data, so the oracle is a plain SELECT — the dedup-active
  * cases are covered by Q5 with literal rows.
  */
object StorageQueries {

  private val FlushThreshold = 750 // guarantees a memtable residue for sf row counts (n % 750 != 0)
  private val BulkChunks = 8       // bulk ingest lands as 8 distributed parts

  private val cache = TrieMap.empty[(String, String), MergeTreeTable]

  private def eventsKVDf(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .select(
        concat(col("event_type"), lit("_"), col("user_id").cast("string")).as("key"),
        col("props").as("value"),
        col("event_id").as("timestamp"))

  /** Ingest events into `t`: the bulk goes through `insertBatch` — 8
    * contiguous event_id ranges, each written as one distributed sorted part
    * with NO rows transiting the driver (the 100 TB path; round 1 collected
    * the whole table to the driver here and fed it row-at-a-time) — and the
    * tail (n mod FlushThreshold rows, a few hundred) goes through the
    * row-at-a-time memtable path (O1/O2) so read-your-writes stays exercised.
    */
  private def ingestEvents(t: MergeTreeTable, spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val kv = eventsKVDf(spark, dir)
    val n = spark.read.parquet(s"$dir/events.parquet").count() // footer-only
    val residue = n % FlushThreshold
    val cutoff = n - residue
    val bounds = (0 to BulkChunks).map(i => i * cutoff / BulkChunks)
    bounds.sliding(2).foreach { case Seq(lo, hi) =>
      if (lo < hi) {
        val chunk = kv.filter(col("timestamp") >= lo && col("timestamp") < hi).as[KVRow]
        t.insertBatch(chunk, partitions = math.min(32L, (hi - lo) / 1000000L + 1L).toInt)
      }
    }
    val tail = kv.filter(col("timestamp") >= cutoff).as[KVRow]
      .orderBy(col("timestamp")).collect()
    t.insertAll(tail.toSeq) // residue < threshold: stays in the memtable
  }

  /** Base table: bulk distributed ingest, NO final flush — the tail stays in
    * the memtable so every query exercises the memtable ∪ parts union
    * (read-your-writes, src/merge_tree.cpp:40-54).
    */
  private def baseTable(spark: SparkSession, dir: String): MergeTreeTable =
    cache.getOrElseUpdate((dir, "base"), {
      val t = MergeTreeTable.create(spark,
        Files.createTempDirectory("mt_q_base_").toString,
        MergeTreeConfig(memtableFlushThreshold = FlushThreshold))
      ingestEvents(t, spark, dir)
      t
    })

  /** Same data, flushed and compacted to ≤ 4 parts (O15–O21). */
  private def optimizedTable(spark: SparkSession, dir: String): MergeTreeTable =
    cache.getOrElseUpdate((dir, "optimized"), {
      val t = MergeTreeTable.create(spark,
        Files.createTempDirectory("mt_q_opt_").toString,
        MergeTreeConfig(memtableFlushThreshold = FlushThreshold, maxParts = 4))
      ingestEvents(t, spark, dir)
      t.optimize() // 9 parts (8 bulk + flushed residue) → bin-packed to 2
      t
    })

  /** Same data, flushed + shut down + REOPENED from disk (O23). */
  private def reopenedTable(spark: SparkSession, dir: String): MergeTreeTable =
    cache.getOrElseUpdate((dir, "reopened"), {
      val path = Files.createTempDirectory("mt_q_reopen_").toString
      val t = MergeTreeTable.create(spark, path,
        MergeTreeConfig(memtableFlushThreshold = FlushThreshold))
      ingestEvents(t, spark, dir)
      t.shutdown() // flushes the residue
      MergeTreeTable.open(spark, path)
    })

  private def kvOracle(where: String): String =
    s"""SELECT event_type || '_' || CAST(user_id AS VARCHAR) AS key,
       | props AS value, event_id AS "timestamp"
       |FROM events WHERE $where ORDER BY key, "timestamp"""".stripMargin

  /** Q1 — point lookup: all versions of one key (O12). The key is the one
    * belonging to event_id = 0, computed identically on both sides.
    */
  def q1PointLookup(spark: SparkSession, dir: String): DataFrame = {
    val row0 = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_id") === 0)
      .select(concat(col("event_type"), lit("_"), col("user_id").cast("string")))
      .collect()(0).getString(0)
    baseTable(spark, dir).queryKey(row0).toDF()
  }

  val q1Sql: String = kvOracle(
    """event_type || '_' || CAST(user_id AS VARCHAR) =
      | (SELECT event_type || '_' || CAST(user_id AS VARCHAR)
      |  FROM events WHERE event_id = 0)""".stripMargin)

  /** Q2 — inclusive key-range scan with part pruning (O11, O7/O8). */
  def q2RangeScan(spark: SparkSession, dir: String): DataFrame =
    baseTable(spark, dir).query("click_1", "error_5").toDF()

  val q2Sql: String = kvOracle(
    "event_type || '_' || CAST(user_id AS VARCHAR) BETWEEN 'click_1' AND 'error_5'")

  /** Q3 — range straddling memtable + parts: the base table keeps its tail
    * unflushed (n mod 750 rows), and this wide range covers keys in both.
    */
  def q3MemtableUnion(spark: SparkSession, dir: String): DataFrame = {
    val t = baseTable(spark, dir)
    require(t.memtableSize > 0, "Q3 requires an unflushed memtable residue")
    t.query("purchase_1", "view_3").toDF()
  }

  val q3Sql: String = kvOracle(
    "event_type || '_' || CAST(user_id AS VARCHAR) BETWEEN 'purchase_1' AND 'view_3'")

  /** Q4 — identical results after optimize(): same oracle shape as Q2, run
    * over the compacted table (O15–O21 preserve query semantics).
    */
  def q4AfterOptimize(spark: SparkSession, dir: String): DataFrame = {
    val t = optimizedTable(spark, dir)
    require(t.partCount <= 4, "Q4 requires compaction to have run")
    t.query("click_1", "error_5").toDF()
  }

  val q4Sql: String = q2Sql

  /** Q5 — exact (key,timestamp) duplicate collapses to one row (O14), with
    * our deterministic max(value) tiebreak. Literal scenario; constant
    * oracle.
    */
  def q5ExactDup(spark: SparkSession, dir: String): DataFrame = {
    val t = MergeTreeTable.create(spark,
      Files.createTempDirectory("mt_q5_").toString)
    t.insert("dup_key", "v_a", 42L)
    t.flush() // duplicate lands in a *different* part than the original
    t.insert("dup_key", "v_b", 42L)
    t.insert("dup_key", "v_a", 42L)
    t.insert("other_key", "v_c", 7L)
    t.queryKey("dup_key").toDF()
  }

  val q5Sql: String =
    """SELECT 'dup_key' AS key, 'v_b' AS value, CAST(42 AS BIGINT) AS "timestamp""""

  /** Q6 — lexicographic inclusive-bound quirk: query("key1","key3") matches
    * key10..key29 (src/granule.cpp:57). Literal rows key1..key30.
    */
  def q6LexBounds(spark: SparkSession, dir: String): DataFrame = {
    val t = MergeTreeTable.create(spark,
      Files.createTempDirectory("mt_q6_").toString)
    (1 to 30).foreach(i => t.insert(s"key$i", s"v$i", i.toLong))
    t.flush()
    t.query("key1", "key3").toDF()
  }

  val q6Sql: String =
    """SELECT 'key' || CAST(i AS VARCHAR) AS key,
      | 'v' || CAST(i AS VARCHAR) AS value, CAST(i AS BIGINT) AS "timestamp"
      |FROM generate_series(1, 30) t(i)
      |WHERE 'key' || CAST(i AS VARCHAR) >= 'key1'
      |  AND 'key' || CAST(i AS VARCHAR) <= 'key3'
      |ORDER BY key, "timestamp"""".stripMargin

  /** Q7 — full-scan count == metadata-only count (O22 vs O24): the scan
    * side runs the real distributed count; the meta side sums the manifest
    * without touching data.
    */
  def q7Counts(spark: SparkSession, dir: String): DataFrame = {
    val t = baseTable(spark, dir)
    val scanRows = t.fullScan().count()
    val metaRows = t.totalRows
    spark.createDataFrame(Seq((scanRows, metaRows)))
      .toDF("scan_rows", "meta_rows")
  }

  val q7Sql: String =
    "SELECT count(*) AS scan_rows, count(*) AS meta_rows FROM events"

  /** Q8 — reopen from disk, re-run a range scan → identical (O23). */
  def q8Reopen(spark: SparkSession, dir: String): DataFrame = {
    val t = reopenedTable(spark, dir)
    require(t.memtableSize == 0 && t.partCount > 0)
    t.query("signup_1", "view_2").toDF()
  }

  val q8Sql: String = kvOracle(
    "event_type || '_' || CAST(user_id AS VARCHAR) BETWEEN 'signup_1' AND 'view_2'")

  /** Q36 — the same storage queried through SQL via the DSv2 `mergetree`
    * format (SURVEY §7 Phase 3): key-range filter pushed to the connector
    * (manifest part pruning + parquet row-group predicate), dedup + sort
    * applied as ordinary relational ops on top — the reference's query
    * semantics (src/merge_tree.cpp:37-63) spelled in SQL.
    */
  def q36Dsv2Scan(spark: SparkSession, dir: String): DataFrame = {
    val t = reopenedTable(spark, dir)
    spark.read.format("mergetree").load(t.path)
      .filter(col("key") >= "click_1" && col("key") <= "purchase_5")
      .groupBy(col("key"), col("timestamp"))
      .agg(max(col("value")).as("value"))
      .select(col("key"), col("value"), col("timestamp"))
      .orderBy(col("key"), col("timestamp"))
  }

  val q36Sql: String = kvOracle(
    "event_type || '_' || CAST(user_id AS VARCHAR) BETWEEN 'click_1' AND 'purchase_5'")

  /** Q44 — the schema-generic MergeTree (arbitrary StructType + declared
    * ORDER BY, SURVEY §1.4's "ClickHouse's real model") through its SQL
    * face: lineitem stored ORDER BY (l_orderkey, l_linenumber) across
    * key-range parts, then queried via the DSv2 connector (the tabledef-
    * self-describing `USING mergetree` path) — the key-range predicate is
    * pushed through the connector for driver-side part pruning + row-group
    * skip, and results must equal the same query over the raw parquet.
    */
  def q44GenericTable(spark: SparkSession, dir: String): DataFrame = {
    val t = cacheG.getOrElseUpdate(dir, {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val tbl = ColumnarMergeTree.create(spark,
        Files.createTempDirectory("mt_q44_").toString,
        li.schema, orderBy = Seq("l_orderkey", "l_linenumber"))
      val cuts = Seq(0L, 500L, 1000L, 1500L, Long.MaxValue)
      cuts.sliding(2).foreach { case Seq(lo, hi) =>
        tbl.insertBatch(li.filter(col("l_orderkey") >= lo && col("l_orderkey") < hi))
      }
      tbl
    })
    spark.read.format("mergetree").load(t.path)
      .filter(col("l_orderkey") >= 400L && col("l_orderkey") <= 1200L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        floor(sum(col("l_quantity")) * lit(100.0) + lit(0.5))
          .as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  private val cacheG = TrieMap.empty[String, ColumnarMergeTree]

  private def eventsSlim(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))

  private def chunkedInsert(t: ColumnarMergeTree, df: DataFrame, n: Long): Unit =
    (0 to 3).map(i => (i * n / 4, (i + 1) * n / 4)).foreach { case (lo, hi) =>
      if (lo < hi) t.insertBatch(
        df.filter(col("event_id") >= lo && col("event_id") < hi))
    }

  /** Q45 — ReplacingMergeTree semantics (keep greatest version per key) on
    * the generic table: versions of a key land in different parts and the
    * collapse happens at READ time (merge-on-read) — the ClickHouse
    * table-engine flavor of Q22's keep-latest dedup, pushed into storage.
    */
  def q45Replacing(spark: SparkSession, dir: String): DataFrame = {
    val t = cacheG.getOrElseUpdate(dir + "#replacing", {
      val ev = eventsSlim(spark, dir)
      val tbl = ColumnarMergeTree.create(spark,
        Files.createTempDirectory("mt_q45_").toString,
        ev.schema, orderBy = Seq("user_id", "event_type", "event_id"),
        mode = MergeMode.Replacing(Seq("user_id", "event_type"), "event_id"))
      chunkedInsert(tbl, ev, ev.count())
      tbl
    })
    t.scan()
      .select(col("user_id"), col("event_type"), col("event_id"),
        floor(col("value") * lit(1000000.0) + lit(0.5))
          .as("value_r"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val q45Sql: String =
    """SELECT user_id, event_type, event_id,
      | CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS value_r
      |FROM (
      |  SELECT user_id, event_type, event_id, value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY event_id DESC) AS rn
      |  FROM events) sub
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** Q46 — SummingMergeTree semantics (sum value columns per key) on the
    * generic table: partial sums collapse inside compaction merges
    * (optimize runs first) AND at read — sum associativity makes partial
    * application safe even when a key straddles merge bins.
    */
  def q46Summing(spark: SparkSession, dir: String): DataFrame = {
    val t = cacheG.getOrElseUpdate(dir + "#summing", {
      val ev = eventsSlim(spark, dir).select(
        col("user_id"), col("event_type"), col("value"))
      val tbl = ColumnarMergeTree.create(spark,
        Files.createTempDirectory("mt_q46_").toString,
        ev.schema, orderBy = Seq("user_id", "event_type"),
        MergeTreeConfig(maxParts = 2),
        mode = MergeMode.Summing(Seq("user_id", "event_type"), Seq("value")))
      val full = eventsSlim(spark, dir)
      val n = spark.read.parquet(s"$dir/events.parquet").count()
      (0 to 3).map(i => (i * n / 4, (i + 1) * n / 4)).foreach { case (lo, hi) =>
        if (lo < hi) tbl.insertBatch(
          full.filter(col("event_id") >= lo && col("event_id") < hi)
            .select(col("user_id"), col("event_type"), col("value")))
      }
      tbl
    })
    t.optimize() // collapse-in-merge path (idempotent once <= maxParts)
    t.scan()
      .select(col("user_id"), col("event_type"),
        floor(col("value") * lit(1000000.0) + lit(0.5))
          .as("sum_value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val q46Sql: String =
    """SELECT user_id, event_type,
      | CAST(floor(sum(value) * 1000000.0 + 0.5) AS BIGINT) AS sum_value
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  /** Q47 — DELETE mutation (ClickHouse ALTER ... DELETE / the pipeline
    * opt-out pass): click events are deleted from a generic table by
    * predicate (only matching parts rewritten), then the remaining rows are
    * aggregated — must equal the oracle computed over events sans clicks.
    */
  def q47DeleteWhere(spark: SparkSession, dir: String): DataFrame = {
    val t = cacheG.getOrElseUpdate(dir + "#delete", {
      val ev = eventsSlim(spark, dir)
      val tbl = ColumnarMergeTree.create(spark,
        Files.createTempDirectory("mt_q47_").toString,
        ev.schema, orderBy = Seq("user_id", "event_id"))
      chunkedInsert(tbl, ev, ev.count())
      tbl.deleteWhere(col("event_type") === "click")
      tbl
    })
    t.scan()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        floor(sum(col("value")) * lit(100.0) + lit(0.5))
          .as("sum_value"))
      .orderBy(col("event_type"))
  }

  val q47Sql: String =
    """SELECT event_type, count(*) AS n,
      | CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sum_value
      |FROM events WHERE event_type != 'click'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val q44Sql: String =
    """SELECT l_returnflag, count(*) AS n,
      | CAST(floor(sum(l_quantity) * 100.0 + 0.5) AS BIGINT) AS sum_qty
      |FROM lineitem WHERE l_orderkey BETWEEN 400 AND 1200
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Q51 — VersionedCollapsingMergeTree semantics on the generic table:
    * every event lands as a state row (sign = +1); click events additionally
    * get a cancel row (sign = −1, same keys + version, payload repeated) in a
    * LATER part, so the cancellation crosses part boundaries and must happen
    * at read/merge time (net-sign > 0 refinement of ClickHouse's pairwise
    * collapse — ColumnarMergeTree.collapse). optimize() runs first so the
    * collapse is exercised both inside compaction merges and merge-on-read.
    * The query goes through the SQL FINAL face (`final 'true'` table option →
    * MergeTreeFinalRule rewrites the DSv2 relation to the collapsed plan), so
    * this one entry pins Collapsing semantics AND the FINAL-applying SQL read.
    */
  def q51Collapsing(spark: SparkSession, dir: String): DataFrame = {
    val t = cacheG.getOrElseUpdate(dir + "#collapsing", {
      val ev = eventsSlim(spark, dir).withColumn("sign", lit(1))
      val tbl = ColumnarMergeTree.create(spark,
        Files.createTempDirectory("mt_q51_").toString,
        ev.schema, orderBy = Seq("user_id", "event_type", "event_id"),
        MergeTreeConfig(maxParts = 2),
        mode = MergeMode.Collapsing(Seq("user_id", "event_type"), "sign", "event_id"))
      chunkedInsert(tbl, ev, spark.read.parquet(s"$dir/events.parquet").count())
      // Cancel batch: one −1 row per click, in its own part.
      tbl.insertBatch(ev.filter(col("event_type") === "click")
        .withColumn("sign", lit(-1)))
      tbl.optimize() // collapse-in-merge path
      tbl
    })
    val view = s"q51_final_${math.abs(dir.hashCode)}"
    spark.sql(s"DROP TABLE IF EXISTS $view")
    spark.sql(
      s"CREATE TABLE $view USING mergetree OPTIONS (`final` 'true') LOCATION '${t.path}'")
    spark.sql(
      s"""SELECT user_id, event_type, event_id, sign,
         | CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS value_micros
         |FROM $view ORDER BY user_id, event_type, event_id""".stripMargin)
  }

  val q51Sql: String =
    """SELECT user_id, event_type, event_id, CAST(1 AS INTEGER) AS sign,
      | CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS value_micros
      |FROM events WHERE event_type <> 'click'
      |ORDER BY user_id, event_type, event_id""".stripMargin

  /** Q52 — PARTITION BY: events partitioned by event_type (each ingest batch
    * lands one part per partition value), queried through scanPartitions so
    * every part outside the two requested partitions is pruned from the
    * manifest before any file I/O (the first and cheapest pruning layer at
    * 100 TB). The pruned-part count is asserted in MergeTreeDsv2Spec.
    */
  def q52Partitioned(spark: SparkSession, dir: String): DataFrame = {
    val t = partitionedTable(spark, dir)
    t.scanPartitions(Seq("click", "view"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        floor(sum(col("value")) * lit(100.0) + lit(0.5))
          .as("sum_value"))
      .orderBy(col("event_type"))
  }

  private[graft] def partitionedTable(spark: SparkSession, dir: String): ColumnarMergeTree =
    cacheG.getOrElseUpdate(dir + "#partitioned", {
      val ev = eventsSlim(spark, dir)
      val tbl = ColumnarMergeTree.create(spark,
        Files.createTempDirectory("mt_q52_").toString,
        ev.schema, orderBy = Seq("user_id", "event_id"),
        partitionBy = Some("event_type"))
      chunkedInsert(tbl, ev, spark.read.parquet(s"$dir/events.parquet").count())
      tbl
    })

  val q52Sql: String =
    """SELECT event_type, count(*) AS n,
      | CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sum_value
      |FROM events WHERE event_type IN ('click', 'view')
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q53 — TTL retention: the table declares its expiry predicate
    * (`event_id < 500` — the spelled-out form of ClickHouse
    * `TTL ts + INTERVAL …`), rows land across parts, and applyTtl()
    * materializes the retention pass (eager twin of the lazy drop inside
    * compaction merges, which ColumnarMergeTreeRetentionSpec pins). The
    * surviving rows must equal the oracle's NOT-expired complement.
    */
  def q53Ttl(spark: SparkSession, dir: String): DataFrame = {
    val t = cacheG.getOrElseUpdate(dir + "#ttl", {
      val ev = eventsSlim(spark, dir)
      val tbl = ColumnarMergeTree.create(spark,
        Files.createTempDirectory("mt_q53_").toString,
        ev.schema, orderBy = Seq("user_id", "event_id"),
        ttl = Some("event_id < 500"))
      chunkedInsert(tbl, ev, spark.read.parquet(s"$dir/events.parquet").count())
      tbl.applyTtl()
      tbl
    })
    t.scan()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("event_id")).as("min_event_id"),
        floor(sum(col("value")) * lit(100.0) + lit(0.5))
          .as("sum_value"))
      .orderBy(col("event_type"))
  }

  val q53Sql: String =
    """SELECT event_type, count(*) AS n, min(event_id) AS min_event_id,
      | CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sum_value
      |FROM events WHERE event_id >= 500
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q54 — AggregatingMergeTree semantics on the generic table: per
    * (user_id, event_type) group, `value` collapses with sum, `event_id`
    * with max, and `n` (a 1-valued column — the count-as-sum idiom the mode
    * documents) with sum. Rows land across 4 parts so the collapse is
    * exercised both inside compaction merges (optimize) and merge-on-read;
    * sum/min/max re-apply associatively so the two paths agree by
    * construction, and the oracle is the equivalent GROUP BY over the same
    * parquet.
    */
  def q54Aggregating(spark: SparkSession, dir: String): DataFrame = {
    val t = cacheG.getOrElseUpdate(dir + "#aggregating", {
      val ev = eventsSlim(spark, dir).withColumn("n", lit(1L))
      val tbl = ColumnarMergeTree.create(spark,
        Files.createTempDirectory("mt_q54_").toString,
        ev.schema, orderBy = Seq("user_id", "event_type"),
        MergeTreeConfig(maxParts = 2),
        mode = MergeMode.Aggregating(Seq("user_id", "event_type"),
          Seq("event_id" -> "max", "value" -> "sum", "n" -> "sum")))
      val n = spark.read.parquet(s"$dir/events.parquet").count()
      (0 to 3).map(i => (i * n / 4, (i + 1) * n / 4)).foreach { case (lo, hi) =>
        if (lo < hi) tbl.insertBatch(
          ev.filter(col("event_id") >= lo && col("event_id") < hi))
      }
      tbl
    })
    t.optimize() // collapse-in-merge path (idempotent once <= maxParts)
    t.scan()
      .select(col("user_id"), col("event_type"), col("n"),
        col("event_id").as("max_event_id"),
        floor(col("value") * lit(1000000.0) + lit(0.5))
          .as("sum_value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val q54Sql: String =
    """SELECT user_id, event_type, count(*) AS n, max(event_id) AS max_event_id,
      | CAST(floor(sum(value) * 1000000.0 + 0.5) AS BIGINT) AS sum_value
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  /** Q55 — insert-triggered materialized view (ClickHouse MV pattern):
    * events stream into a source table in 4 batches; each batch's partial
    * GROUP BY lands in an Aggregating target, which collapses the partials
    * at read. The oracle is the same GROUP BY over ALL events — i.e. the MV
    * pipeline (4 incremental partials + collapse) must equal the one-shot
    * aggregate, which is the whole point of the pattern at 100 TB: ingest
    * pays one map-side partial per batch, never a table re-aggregation.
    */
  def q55MatView(spark: SparkSession, dir: String): DataFrame = {
    val tgt = cacheG.getOrElseUpdate(dir + "#matview", {
      val ev = eventsSlim(spark, dir)
      val src = ColumnarMergeTree.create(spark,
        Files.createTempDirectory("mt_q55s_").toString,
        ev.schema, orderBy = Seq("user_id", "event_id"))
      val target = src.createMaterializedView("by_type",
        Files.createTempDirectory("mt_q55t_").toString,
        s"""SELECT event_type, count(*) AS n, sum(value) AS sum_value
           |FROM ${ColumnarMergeTree.MvInput} GROUP BY event_type""".stripMargin,
        targetOrderBy = Seq("event_type"),
        targetMode = MergeMode.Aggregating(Seq("event_type"),
          Seq("n" -> "sum", "sum_value" -> "sum")))
      chunkedInsert(src, ev, spark.read.parquet(s"$dir/events.parquet").count())
      target
    })
    tgt.scan()
      .select(col("event_type"), col("n"),
        floor(col("sum_value") * lit(1000000.0) + lit(0.5))
          .as("sum_value"))
      .orderBy(col("event_type"))
  }

  val q55Sql: String =
    """SELECT event_type, count(*) AS n,
      | CAST(floor(sum(value) * 1000000.0 + 0.5) AS BIGINT) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q79 — part-level minmax skip index (ClickHouse `minmax`): the table
    * declares `minmaxColumns = event_id, value`; batches land with
    * disjoint event_id ranges (chunkedInsert splits on event_id
    * quartiles), so the fixed range below prunes to 1 of 4 parts
    * driver-side — O(manifest), before any footer read — at every scale
    * factor (the range sits inside the first quartile for all SFs).
    * MinmaxIndexSpec pins pruning counts, type coverage (long/double/
    * string), pre-index-part safety, and merge-recompute; this entry pins
    * the end-to-end answer against the oracle.
    */
  def q79MinmaxScan(spark: SparkSession, dir: String): DataFrame = {
    val t = cacheG.getOrElseUpdate(dir + "#minmax", {
      val ev = eventsSlim(spark, dir)
      val tbl = ColumnarMergeTree.create(spark,
        Files.createTempDirectory("mt_q79_").toString,
        ev.schema, orderBy = Seq("user_id", "event_id"),
        config = MergeTreeConfig(minmaxColumns = Seq("event_id", "value")))
      chunkedInsert(tbl, ev, spark.read.parquet(s"$dir/events.parquet").count())
      tbl
    })
    t.scanWhere("event_id", 100L, 220L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        floor(sum(col("value")) * lit(100.0) + lit(0.5))
          .as("sum_value"))
      .orderBy(col("event_type"))
  }

  val q79Sql: String =
    """SELECT event_type, count(*) AS n,
      | CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sum_value
      |FROM events WHERE event_id BETWEEN 100 AND 220
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q91 — rewrite-free schema evolution through the PURE SQL face: a
    * catalog-addressed mergetree table (GraftCatalog, `gq91.q91.<t>`) is
    * created, filled, ALTERed (ADD COLUMN), filled again, and aggregated —
    * every step a spark.sql statement, no Scala table handle. Pre-ALTER
    * parts null-fill the added column at read time (no part rewritten —
    * the only ALTER economics that hold at 100 TB), so grouping on the
    * added column must reproduce the even/odd split the two INSERTs
    * encoded. Oracle: the same aggregation from the raw parquet.
    */
  def q91AlterSql(spark: SparkSession, dir: String): DataFrame = {
    val tblName = cacheSqlAlter.getOrElseUpdate(dir, {
      val wh = Files.createTempDirectory("mt_q91_wh_").toString
      spark.conf.set("spark.sql.catalog.gq91",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.gq91.warehouse", wh)
      // unique table name per dir: the catalog maps names to directories
      // under one warehouse conf, and Verify may run several SFs in-process
      val n = "t" + Integer.toHexString(dir.hashCode & 0x7fffffff)
      spark.read.parquet(s"$dir/orders.parquet")
        .createOrReplaceTempView("q91_orders")
      spark.sql(s"CREATE TABLE gq91.q91.$n (o_orderkey BIGINT, " +
        "o_custkey BIGINT) USING mergetree OPTIONS (orderBy 'o_orderkey')")
      spark.sql(s"INSERT INTO gq91.q91.$n SELECT o_orderkey, o_custkey " +
        "FROM q91_orders WHERE o_orderkey % 2 = 0")
      spark.sql(s"ALTER TABLE gq91.q91.$n ADD COLUMN odd_flag BIGINT")
      spark.sql(s"INSERT INTO gq91.q91.$n SELECT o_orderkey, o_custkey, 1 " +
        "FROM q91_orders WHERE o_orderkey % 2 = 1")
      s"gq91.q91.$n"
    })
    spark.sql(
      s"""SELECT coalesce(odd_flag, 0) AS flag, count(*) AS n,
         | sum(o_custkey) AS sum_cust
         |FROM $tblName GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  private val cacheSqlAlter = TrieMap.empty[String, String]

  /** Q92 — the SQL maintenance verbs end-to-end: a catalog table is
    * double-filled with the same batch (full-row duplicates a Plain table
    * would never collapse), then `OPTIMIZE TABLE … FINAL DEDUPLICATE` — the
    * parser-extension verb — rewrites it to one deduplicated part, and a
    * DETACH/ATTACH round-trip proves the quarantine path preserves content
    * exactly. Oracle: the single-copy aggregation from the raw parquet
    * (o_orderkey is unique in orders, so DEDUPLICATE restores exactly one
    * copy per key).
    */
  def q92OptimizeSql(spark: SparkSession, dir: String): DataFrame = {
    val tblName = cacheSqlOptimize.getOrElseUpdate(dir, {
      val wh = Files.createTempDirectory("mt_q92_wh_").toString
      spark.conf.set("spark.sql.catalog.gq92",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.gq92.warehouse", wh)
      val n = "t" + Integer.toHexString(dir.hashCode & 0x7fffffff)
      spark.read.parquet(s"$dir/orders.parquet")
        .createOrReplaceTempView("q92_orders")
      spark.sql(s"CREATE TABLE gq92.q92.$n (o_orderkey BIGINT, " +
        "o_custkey BIGINT, bucket BIGINT) USING mergetree " +
        "OPTIONS (orderBy 'o_orderkey', partitionBy 'bucket')")
      val ins = s"INSERT INTO gq92.q92.$n SELECT o_orderkey, o_custkey, " +
        "o_orderkey % 2 FROM q92_orders WHERE o_orderkey % 3 = 0"
      spark.sql(ins)
      spark.sql(ins) // identical second copy of every row
      spark.sql(s"OPTIMIZE TABLE gq92.q92.$n FINAL DEDUPLICATE")
      // quarantine round-trip must be content-preserving
      spark.sql(s"ALTER TABLE gq92.q92.$n DETACH PARTITION '1'")
      spark.sql(s"ALTER TABLE gq92.q92.$n ATTACH PARTITION '1'")
      s"gq92.q92.$n"
    })
    spark.sql(
      s"""SELECT bucket, count(*) AS n, sum(o_custkey) AS sum_cust
         |FROM $tblName GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  private val cacheSqlOptimize = TrieMap.empty[String, String]

  val q92Sql: String =
    """SELECT o_orderkey % 2 AS bucket, count(*) AS n,
      | CAST(sum(o_custkey) AS BIGINT) AS sum_cust
      |FROM orders WHERE o_orderkey % 3 = 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q97 — tokenbf-indexed text search: documents land in a MergeTree table
    * with a token-bloom sidecar per part (tokenBloomColumns), and the query
    * runs through `scanHasToken` — the driver probes each part's bloom
    * before any task launches, then applies the exact whole-token residual.
    * On this corpus every part contains the common token, so pruning keeps
    * all parts (the pruning behaviour itself is pinned on a synthetic
    * disjoint-vocabulary table in TokenBloomSpec); the oracle pins the
    * whole-token-match SEMANTICS against DuckDB's split-and-contains.
    */
  def q97HasToken(spark: SparkSession, dir: String): DataFrame = {
    val t = cacheG.getOrElseUpdate(dir + "#tokenbf", {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val tbl = ColumnarMergeTree.create(spark,
        Files.createTempDirectory("mt_q97_").toString,
        d.schema, orderBy = Seq("doc_id"),
        MergeTreeConfig(tokenBloomColumns = Seq("text")))
      val n = d.count()
      tbl.insertBatch(d.filter(col("doc_id") < n / 3))
      tbl.insertBatch(d.filter(col("doc_id") >= n / 3 && col("doc_id") < 2 * n / 3))
      tbl.insertBatch(d.filter(col("doc_id") >= 2 * n / 3))
      tbl
    })
    t.scanHasToken("text", "customer")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  val q97Sql: String =
    """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |WHERE list_contains(string_split_regex(text, '[^A-Za-z0-9]+'), 'customer')
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Q128 — part-level set(N) skip index (ClickHouse `set`): the table
    * declares `setIndexColumns = event_type`; each ingest batch carries
    * ONE event type (the kafka-topic-per-type / per-source-feed ingest
    * shape), so every part's minmax on event_type is useless to a
    * different type's probe only by luck — but its distinct-value SET is
    * exactly one value, and `scanIn` prunes 3 of 5 parts driver-side
    * before any file I/O. This is the pruning minmax can never give a
    * low-cardinality column whose values interleave in sort order.
    * SetIndexSpec pins pruning counts, saturation fallback, sidecar-less
    * safety, merge rebuild, and the SQL = / IN faces; this entry pins the
    * end-to-end answer against the oracle.
    */
  def q128SetIndexScan(spark: SparkSession, dir: String): DataFrame = {
    val t = cacheG.getOrElseUpdate(dir + "#setidx", {
      val ev = eventsSlim(spark, dir)
      val tbl = ColumnarMergeTree.create(spark,
        Files.createTempDirectory("mt_q128_").toString,
        ev.schema, orderBy = Seq("user_id", "event_id"),
        config = MergeTreeConfig(setIndexColumns = Seq("event_type")))
      Seq("click", "error", "purchase", "signup", "view").foreach(et =>
        tbl.insertBatch(ev.filter(col("event_type") === et)))
      tbl
    })
    // Fixed-point PER ROW before the sum (the r6/q51 contract): summing
    // doubles and rounding after the reduction is exactly the
    // cross-engine .5-boundary wobble the repo bans — int64 end to end.
    t.scanIn("event_type", Seq("purchase", "signup"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  val q128Sql: String =
    """SELECT event_type, count(*) AS n,
      | CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value
      |FROM events WHERE event_type IN ('purchase', 'signup')
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q131 — STORAGE-PARTITIONED JOIN end to end (Spark SPJ, SPARK-37375):
    * customer and supplier live as mergetree tables PARTITION BY their
    * nation key; the per-nation join + aggregate then plans with ZERO
    * exchanges — both the join and the groupBy ride the reported
    * KeyGroupedPartitioning (at 100 TB this is the fact join neither
    * broadcast nor shuffle should pay for). The SPJ confs are scoped to
    * this entry, so the query EXECUTES inside it (the result is ≤ 25
    * aggregate rows) — and the zero-exchange claim is SELF-ENFORCED: a
    * plan that regressed to shuffling fails the entry rather than
    * silently passing on the same rows. pushPartValues handles the
    * partition-set mismatch (small SFs have supplier-less nations).
    * Acctbals fixed-point per row BEFORE the sum (exact int64 both
    * engines).
    */
  /** The nation-partitioned customer/supplier mergetree tables shared by
    * q131 (storage-partitioned join) and q136 (runtime part pruning) —
    * built once per source dir.
    */
  private def spjDirs(spark: SparkSession, dir: String): (String, String) =
    cacheSpjDirs.getOrElseUpdate(dir, {
      val cust = spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val supp = spark.read.parquet(s"$dir/supplier.parquet")
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
      val da = Files.createTempDirectory("mt_q131_c_").toString
      val db = Files.createTempDirectory("mt_q131_s_").toString
      ColumnarMergeTree.create(spark, da, cust.schema,
        orderBy = Seq("c_custkey"), partitionBy = Some("c_nationkey"))
        .insertBatch(cust)
      ColumnarMergeTree.create(spark, db, supp.schema,
        orderBy = Seq("s_suppkey"), partitionBy = Some("s_nationkey"))
        .insertBatch(supp)
      (da, db)
    })

  def q131SpjJoin(spark: SparkSession, dir: String): DataFrame = {
    val (pa, pb) = spjDirs(spark, dir)
    val confs = Seq(
      "spark.graft.preserveDataGrouping" -> "true",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val a = spark.read.format("mergetree").load(pa)
      val b = spark.read.format("mergetree").load(pb)
      val out = a.join(b, col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long")
            + floor(col("s_acctbal") * lit(100.0) + lit(0.5)).cast("long"))
            .as("sum_bal"))
        .select(col("c_nationkey").cast("long").as("nation"),
          col("n_pairs"), col("sum_bal"))
        .orderBy(col("nation"))
      val rows = out.collect()
      val plan = out.queryExecution.executedPlan.toString
      // Join AND aggregate ride the reported partitioning: no hash or
      // broadcast exchange anywhere (the one remaining exchange is the
      // output ORDER BY's range partitioning — unavoidable for a global
      // sort and sized by the 25-row aggregate, not the corpus).
      require(!plan.contains("Exchange hashpartitioning")
          && !plan.contains("BroadcastExchange")
          && !plan.contains("Exchange SinglePartition"),
        s"q131: the join/aggregate must not shuffle or broadcast:\n$plan")
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq), out.schema)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private val cacheSpjDirs = TrieMap.empty[String, (String, String)]

  /** Q133 — SPJ over the bucket(N, col) TRANSFORM (task: expression
    * partitioning, not just bare columns — ClickHouse PARTITION BY is
    * usually an expression, and the engine's own index layouts are
    * bucket-partitioned): customer and orders land as mergetree tables
    * PARTITION BY bucket(16, custkey), read through the graft CATALOG
    * (bucket SPJ requires a FunctionCatalog — Spark resolves the scan's
    * reported `bucket` transform to GraftBucketFunction on the relation's
    * catalog; the path-based face has no catalog, which is why q131 stops
    * at identity). The customer⋈orders fact join — the shape neither
    * broadcast (orders is corpus-sized) nor shuffle should pay for at
    * 100 TB — then plans with ZERO exchanges on either side, and the
    * per-custkey aggregate rides the same grouping. Zero-exchange is
    * SELF-ENFORCED like q131: a regression to hash/broadcast exchanges
    * fails the entry, not just a spec. Prices fixed-point per row BEFORE
    * the sum (exact int64 both engines).
    */
  def q133BucketSpj(spark: SparkSession, dir: String): DataFrame = {
    val (custTbl, ordTbl) = cacheBucketSpj.getOrElseUpdate(dir, {
      val wh = bucketSpjWarehouse
      spark.conf.set("spark.sql.catalog.graft_spj",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_spj.warehouse", wh)
      val h = java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(dir).toLong & 0xffffffffL)
      val (cn, on) = (s"cust_$h", s"ord_$h")
      val cust = spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_acctbal"))
      val ord = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      ColumnarMergeTree.create(spark, s"$wh/$cn", cust.schema,
        orderBy = Seq("c_custkey"),
        partitionBy = Some("bucket(16, c_custkey)")).insertBatch(cust)
      ColumnarMergeTree.create(spark, s"$wh/$on", ord.schema,
        orderBy = Seq("o_orderkey"),
        partitionBy = Some("bucket(16, o_custkey)")).insertBatch(ord)
      (cn, on)
    })
    val confs = Seq(
      "spark.graft.preserveDataGrouping" -> "true",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val a = spark.table(s"graft_spj.$custTbl")
      val b = spark.table(s"graft_spj.$ordTbl")
      val out = a.join(b, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
            .as("sum_price"))
        .select(col("c_custkey").cast("long").as("custkey"),
          col("n_orders"), col("sum_price"))
        .orderBy(col("custkey"))
      val rows = out.collect()
      val plan = out.queryExecution.executedPlan.toString
      require(!plan.contains("Exchange hashpartitioning")
          && !plan.contains("BroadcastExchange")
          && !plan.contains("Exchange SinglePartition"),
        s"q133: the bucket-SPJ join/aggregate must not shuffle or broadcast:\n$plan")
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq), out.schema)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** One catalog warehouse per JVM (the catalog instance is cached by Spark
    * at first use with its init-time warehouse — never re-point it).
    */
  private lazy val bucketSpjWarehouse: String =
    Files.createTempDirectory("graft_spj_wh_").toString
  private val cacheBucketSpj = TrieMap.empty[String, (String, String)]

  /** Q135 — SPJ across MISMATCHED bucket counts (the ReducibleFunction
    * path, Spark's v2.bucketing allowCompatibleTransforms): customer lands
    * PARTITION BY bucket(16, c_custkey), orders PARTITION BY
    * bucket(4, o_custkey) — the realistic state when two teams sized their
    * tables years apart — and the fact join STILL plans with zero
    * exchanges: the finer side folds each bucket onto the coarser grid
    * (pmod(h, 16) mod 4 == pmod(h, 4); GraftBucketBound.reducer). Same
    * self-enforced zero-exchange contract as q131/q133; same per-row
    * fixed-point sums.
    */
  def q135BucketMixSpj(spark: SparkSession, dir: String): DataFrame = {
    val (custTbl, ordTbl) = cacheBucketMix.getOrElseUpdate(dir, {
      val wh = bucketSpjWarehouse
      spark.conf.set("spark.sql.catalog.graft_spj",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_spj.warehouse", wh)
      val h = java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(dir).toLong & 0xffffffffL)
      val (cn, on) = (s"mixc_$h", s"mixo_$h")
      val cust = spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_acctbal"))
      val ord = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      ColumnarMergeTree.create(spark, s"$wh/$cn", cust.schema,
        orderBy = Seq("c_custkey"),
        partitionBy = Some("bucket(16, c_custkey)")).insertBatch(cust)
      ColumnarMergeTree.create(spark, s"$wh/$on", ord.schema,
        orderBy = Seq("o_orderkey"),
        partitionBy = Some("bucket(4, o_custkey)")).insertBatch(ord)
      (cn, on)
    })
    val confs = Seq(
      "spark.graft.preserveDataGrouping" -> "true",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val a = spark.table(s"graft_spj.$custTbl")
      val b = spark.table(s"graft_spj.$ordTbl")
      val out = a.join(b, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
            .as("sum_price"))
        .select(col("c_custkey").cast("long").as("custkey"),
          col("n_orders"), col("sum_price"))
        .orderBy(col("custkey"))
      val rows = out.collect()
      val plan = out.queryExecution.executedPlan.toString
      require(!plan.contains("Exchange hashpartitioning")
          && !plan.contains("BroadcastExchange")
          && !plan.contains("Exchange SinglePartition"),
        s"q135: the mismatched-bucket SPJ join must not shuffle or broadcast:\n$plan")
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq), out.schema)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private val cacheBucketMix = TrieMap.empty[String, (String, String)]

  /** Q136 — RUNTIME part pruning from a join (Spark dynamic filtering,
    * SPARK-35779 / the DSv2 face of dynamic partition pruning): customer
    * lives as a mergetree table PARTITION BY c_nationkey (q131's table);
    * nation is a tiny dim with a selective predicate. The scan reports its
    * prunable columns through SupportsRuntimeFiltering, so Spark hands the
    * BROADCAST side's join keys to the scan before any fact task launches
    * and the scan drops every partition outside the dim's 5 nations — at
    * 100 TB this is the star-join contract: the dim predicate names 5 of
    * 1000 partitions and the fact scan never lists the other 995, without
    * the query naming a partition anywhere. SELF-ENFORCED twice: the
    * executed plan must carry the dynamicpruning subquery AND the scan's
    * planned-part counter must show a strict subset of the manifest
    * (regressing either fails the entry, not just a spec). Acctbals
    * fixed-point per row before the sum (exact int64 both engines).
    */
  def q136RuntimePrune(spark: SparkSession, dir: String): DataFrame = {
    val (pa, _) = spjDirs(spark, dir)
    val confs = Seq(
      // Defaults, pinned: the entry's claim is about THIS machinery.
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      "spark.sql.exchange.reuse" -> "true",
      // SPJ grouping off: key-grouped scans refuse runtime filtering
      // (dropping a key group would break the co-partitioned join).
      "spark.graft.preserveDataGrouping" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.format("mergetree").load(pa)
      val dim = spark.read.parquet(s"$dir/nation.parquet")
        .filter(col("n_regionkey") === 1)
      val out = fact.join(dim, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          sum(floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long"))
            .as("sum_bal"))
        .select(col("c_nationkey").cast("long").as("nation"),
          col("n_cust"), col("sum_bal"))
        .orderBy(col("nation"))
      val rows = out.collect()
      val plan = out.queryExecution.executedPlan.toString
      require(plan.toLowerCase.contains("dynamicpruning"),
        s"q136: the fact scan must carry a dynamic-pruning runtime filter:\n$plan")
      val (planned, total) = graft.sources.GenericMergeTreeScan.lastPruning.get()
      require(planned > 0 && planned < total,
        s"q136: runtime filter must prune the fact scan to a strict subset " +
          s"of its parts (planned $planned of $total)")
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq), out.schema)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  val q136Sql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nation, count(*) AS n_cust,
      | CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      |   AS sum_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE n_regionkey = 1
      |GROUP BY c_nationkey ORDER BY nation""".stripMargin

  /** Q137 — Z-ORDER (Morton) clustering: multi-dimensional part pruning
    * from ONE sort order. orders lands in a mergetree table ORDER BY
    * morton_encode(o_custkey, o_day) — the native codegen expression
    * interleaving both coordinates' bits (ClickHouse mortonEncode) — cut
    * into 16 z-contiguous parts, with minmax sidecars on BOTH source
    * columns. Because the z-curve keeps rectangles local, each part's
    * (custkey, day) bounding box is TIGHT on both dimensions, so a
    * rectangle predicate prunes parts on either column — the
    * multi-column-primary-key economics a lexicographic (custkey, day)
    * sort only gives its leading column. At 100 TB this is how a
    * time+tenant (or user+day) workload avoids choosing which dimension
    * gets pruning: layout once, prune on both. SELF-ENFORCED: the scan
    * must plan at most half the parts (a lexicographic layout scans all
    * 16 for any day-only-selective rectangle; regressing the layout or
    * the sidecar pruning fails the entry). The rectangle is the middle
    * quarter of each dimension's span, derived from the data so the entry
    * is scale-free; prices fixed-point per row before the sum.
    */
  def q137ZOrderScan(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val zdir = cacheZOrder.getOrElseUpdate(dir, {
      val d = Files.createTempDirectory("mt_q137_z_").toString
      val src = zOrderSrc(spark, dir)
        .withColumn("zval",
          call_function("morton_encode", col("o_custkey"), col("o_day")))
      // Build-time layout: repartitionByRange(zval) — the 100 TB path its
      // own scale story recommends (a distributed sample-based range
      // shuffle; NO single-partition global window anywhere). Each range
      // partition becomes one part with a contiguous, disjoint zval span:
      // the per-partition MAX zvals are exact cut points (RangePartitioner
      // never splits equal keys across partitions), so the half-open
      // interval batches reproduce the partitioning row for row.
      val cached = src.persist()
      try {
        val uppers = cached.repartitionByRange(16, col("zval"))
          .select(col("zval"),
            org.apache.spark.sql.functions.spark_partition_id().as("pid"))
          .groupBy(col("pid")).agg(max(col("zval")).as("hi"))
          .collect().map(_.getLong(1)).distinct.sorted
        val t = ColumnarMergeTree.create(spark, d, src.schema,
          orderBy = Seq("zval"),
          config = MergeTreeConfig(minmaxColumns = Seq("o_custkey", "o_day")))
        uppers.foldLeft(Long.MinValue) { (lo, hi) =>
          t.insertBatch(cached.filter(col("zval") > lo && col("zval") <= hi))
          hi
        }
      } finally cached.unpersist()
      d
    })
    // The query rectangle: the middle quarter of each dimension's span
    // (data-derived literals — 4 longs from one tiny aggregate — so the
    // same entry exercises every scale factor).
    val b = zOrderSrc(spark, dir)
      .agg(min("o_custkey").as("ck0"), max("o_custkey").as("ck1"),
        min("o_day").as("d0"), max("o_day").as("d1")).head()
    val (ck0, ck1, d0, d1) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val (ckLo, ckHi) = (ck0 + (ck1 - ck0) / 4, ck0 + (ck1 - ck0) / 2)
    val (dLo, dHi) = (d0 + (d1 - d0) / 4, d0 + (d1 - d0) / 2)
    val t = spark.read.format("mergetree").load(zdir)
    val out = t
      .filter(col("o_custkey").between(ckLo, ckHi) &&
        col("o_day").between(dLo, dHi))
      .groupBy(col("o_day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
          .as("sum_price"))
      .orderBy(col("o_day"))
    val rows = out.collect()
    val (planned, total) = graft.sources.GenericMergeTreeScan.lastPruning.get()
    require(total == 16 && planned > 0 && planned <= total / 2,
      s"q137: the z-layout must prune the rectangle scan to at most half " +
        s"the parts (planned $planned of $total)")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), out.schema)
  }

  /** orders projected to the two z-order coordinates + the measure; o_day
    * = days since 1992-01-01 (nonnegative longs, well under 2^31 — the
    * signed-ordering contract of morton_encode as a sort key).
    */
  private def zOrderSrc(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
          .cast("long").as("o_day"),
        col("o_totalprice"))

  private val cacheZOrder = TrieMap.empty[String, String]

  val q137Sql: String =
    """WITH src AS (
      |  SELECT o_custkey,
      |         date_diff('day', DATE '1992-01-01', o_orderdate) AS o_day,
      |         o_totalprice
      |  FROM orders
      |), b AS (
      |  SELECT min(o_custkey) AS ck0, max(o_custkey) AS ck1,
      |         min(o_day) AS d0, max(o_day) AS d1 FROM src
      |)
      |SELECT o_day, count(*) AS n_orders,
      | CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      |   AS sum_price
      |FROM src, b
      |WHERE o_custkey BETWEEN ck0 + CAST(floor((ck1 - ck0) / 4.0) AS BIGINT)
      |                    AND ck0 + CAST(floor((ck1 - ck0) / 2.0) AS BIGINT)
      |  AND o_day BETWEEN d0 + CAST(floor((d1 - d0) / 4.0) AS BIGINT)
      |                AND d0 + CAST(floor((d1 - d0) / 2.0) AS BIGINT)
      |GROUP BY o_day ORDER BY o_day""".stripMargin

  /** Q138 — LIGHTWEIGHT DELETE (ClickHouse `DELETE FROM`, the O(manifest)
    * mutation): events land as a mergetree table in 4 parts; `DELETE`ing
    * the 'click' slice tags every part with the predicate in ONE manifest
    * CAS — no part file is read or rewritten (SELF-ENFORCED: the entry
    * fingerprints every data file before and after and requires identity)
    * — and every subsequent read hides the rows until a merge
    * materializes the deletion. At 100 TB this is the decontamination
    * fast path: "hide the flagged slice NOW" costs metadata, the rewrite
    * rides the merges that were going to happen anyway. The aggregate
    * then runs through the SQL face (the resolution rule routes tagged
    * tables through the delete-aware part funnel), values fixed-point per
    * row before the sum.
    */
  def q138LightweightDelete(spark: SparkSession, dir: String): DataFrame = {
    val d = cacheLwDel.getOrElseUpdate(dir, {
      val p = Files.createTempDirectory("mt_q138_lw_").toString
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("event_type"), col("value"))
      val t = ColumnarMergeTree.create(spark, p, ev.schema,
        orderBy = Seq("event_id"))
      (0 until 4).foreach(b =>
        t.insertBatch(ev.filter(col("event_id") % 4 === b)))
      def files: Set[(String, Long)] = {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
            .map(f => (f.toString,
              java.nio.file.Files.getLastModifiedTime(f).toMillis)).toSet
        } finally s.close()
      }
      val before = files
      t.deleteLightweight(col("event_type") === lit("click"))
      require(before.nonEmpty && files == before,
        "q138: lightweight DELETE must not read or rewrite any data file")
      p
    })
    spark.read.format("mergetree").load(d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
          .as("sum_val"))
      .orderBy(col("event_type"))
  }

  private val cacheLwDel = TrieMap.empty[String, String]

  /** Q139 — LIGHTWEIGHT UPDATE + ordered DELETE (ClickHouse patch-part
    * updates): events land in 4 parts; an UPDATE patches every 'view'
    * row's value (value*2+1) in ONE manifest CAS, then a DELETE hides
    * every row whose PATCHED value exceeds the raw corpus maximum — a
    * threshold only patched rows can cross, so the oracle equality is
    * also a proof the engine applies the two mutations IN ORDER (the
    * reversed order deletes nothing). No part file is read or rewritten
    * by either statement (SELF-ENFORCED by file fingerprints). The
    * aggregate runs through the SQL face; values fixed-point per row
    * before the sum.
    */
  def q139LightweightUpdate(spark: SparkSession, dir: String): DataFrame = {
    val d = cacheLwUpd.getOrElseUpdate(dir, {
      val p = Files.createTempDirectory("mt_q139_lwu_").toString
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("event_type"), col("value"))
      val rawMax = ev.agg(max("value")).head().getDouble(0)
      val t = ColumnarMergeTree.create(spark, p, ev.schema,
        orderBy = Seq("event_id"))
      (0 until 4).foreach(b =>
        t.insertBatch(ev.filter(col("event_id") % 4 === b)))
      def files: Set[(String, Long)] = {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
            .map(f => (f.toString,
              java.nio.file.Files.getLastModifiedTime(f).toMillis)).toSet
        } finally s.close()
      }
      val before = files
      t.updateLightweight(col("event_type") === lit("view"),
        Map("value" -> (col("value") * lit(2.0) + lit(1.0))))
      t.deleteLightweight(col("value") > lit(rawMax))
      require(before.nonEmpty && files == before,
        "q139: lightweight UPDATE/DELETE must not read or rewrite any data file")
      p
    })
    spark.read.format("mergetree").load(d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
          .as("sum_val"))
      .orderBy(col("event_type"))
  }

  private val cacheLwUpd = TrieMap.empty[String, String]

  val q139Sql: String =
    """WITH patched AS (
      |  SELECT event_type,
      |         CASE WHEN event_type = 'view' THEN value * 2.0 + 1.0
      |              ELSE value END AS value
      |  FROM events
      |)
      |SELECT event_type, count(*) AS n_events,
      | CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      |   AS sum_val
      |FROM patched
      |WHERE NOT coalesce(value > (SELECT max(value) FROM events), FALSE)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val q138Sql: String =
    """SELECT event_type, count(*) AS n_events,
      | CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      |   AS sum_val
      |FROM events
      |WHERE NOT coalesce(event_type = 'click', FALSE)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Same answer as q133 — the join is the same; only the physical bucket
    * counts differ (that equality is itself part of what the oracle pins).
    * `def`, not `val`: q133Sql is declared below and a val would read its
    * pre-init null.
    */
  def q135Sql: String = q133Sql

  val q133Sql: String =
    """SELECT CAST(c_custkey AS BIGINT) AS custkey, count(*) AS n_orders,
      | CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      |   AS sum_price
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY custkey""".stripMargin

  val q131Sql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nation, count(*) AS n_pairs,
      | CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)
      |        + CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      |   AS sum_bal
      |FROM customer JOIN supplier ON c_nationkey = s_nationkey
      |GROUP BY c_nationkey ORDER BY nation""".stripMargin

  val q91Sql: String =
    """SELECT CAST(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END AS BIGINT) AS flag,
      | count(*) AS n, CAST(sum(o_custkey) AS BIGINT) AS sum_cust
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q105 — the append-only manifest-LOG layout (object-store commit
    * posture, round 9) through the full table lifecycle: a `manifestLog`
    * table takes four ingest commits and a compaction — every one a
    * put-if-absent CAS on `_manifest_log/`, no advisory lock on the commit
    * path — then serves the aggregate through the DSv2 SQL face reading
    * the latest log commit. Oracle: the same aggregate over the raw
    * parquet; equality proves no commit was lost or doubled across the
    * ingest/compaction CAS sequence.
    */
  def q105LogManifest(spark: SparkSession, dir: String): DataFrame = {
    val t = cacheG.getOrElseUpdate(dir + "#logmanifest", {
      val o = spark.read.parquet(s"$dir/orders.parquet")
      val tbl = ColumnarMergeTree.create(spark,
        Files.createTempDirectory("mt_q105_").toString,
        o.schema, orderBy = Seq("o_orderkey"),
        MergeTreeConfig(maxParts = 2, manifestLog = true))
      (0 until 4).foreach(i => tbl.insertBatch(o.filter(col("o_orderkey") % 4 === i)))
      tbl.optimize()
      tbl
    })
    spark.read.format("mergetree").load(t.path)
      .filter(col("o_orderkey") % 3 === 0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        floor(sum(col("o_totalprice")) * lit(100.0) + lit(0.5)).as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  val q105Sql: String =
    """SELECT o_orderstatus, count(*) AS n,
      | CAST(floor(sum(o_totalprice) * 100.0 + 0.5) AS BIGINT) AS sum_price
      |FROM orders WHERE o_orderkey % 3 = 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q107 — AGGREGATE projection (ClickHouse `ADD PROJECTION … GROUP BY`,
    * round 9): the table keeps a per-(user_id, event_type) pre-aggregated
    * copy — two batches covered by POPULATE, two by the insert trigger —
    * and the query asks for a COARSER rollup (by event_type alone), which
    * aggScanAuto answers by re-aggregating the projection's partials
    * instead of the table. At 100 TB that is the feature: the rollup reads
    * Σ|groups per part| projection rows, never the fact rows. `value` is
    * fixed-pointed BEFORE summation so both engines add exact int64s (the
    * sum-of-floors vs floor-of-sum trap). Oracle: the same rollup over the
    * raw parquet — equality proves populate + trigger partials + the merge
    * fold reconstruct the table-wide aggregate exactly.
    */
  def q107AggProjection(spark: SparkSession, dir: String): DataFrame = {
    val t = cacheG.getOrElseUpdate(dir + "#aggproj", {
      val ev = eventsSlim(spark, dir)
        .withColumn("value_fp",
          floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long"))
        .drop("value")
      val tbl = ColumnarMergeTree.create(spark,
        Files.createTempDirectory("mt_q107_").toString,
        ev.schema, orderBy = Seq("user_id", "event_id"),
        MergeTreeConfig(maxParts = 4))
      val n = spark.read.parquet(s"$dir/events.parquet").count()
      (0 to 1).foreach(i => tbl.insertBatch(
        ev.filter(col("event_id") >= i * n / 4 && col("event_id") < (i + 1) * n / 4)))
      tbl.addAggProjection("by_user_type", Seq("user_id", "event_type"),
        Seq("sum" -> "value_fp", "count" -> "*", "max" -> "event_id"))
      (2 to 3).foreach(i => tbl.insertBatch(
        ev.filter(col("event_id") >= i * n / 4 && col("event_id") < (i + 1) * n / 4)))
      tbl
    })
    t.aggScanAuto(Seq("event_type"),
        Seq("sum" -> "value_fp", "count" -> "*", "max" -> "event_id"))
      .orderBy(col("event_type"))
  }

  val q107Sql: String =
    """SELECT event_type,
      | CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
      |   AS sum_value_fp,
      | count(*) AS count_all, max(event_id) AS max_event_id
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q142 — FREEZE backup (ClickHouse `ALTER TABLE … FREEZE`): the backup
    * must pin the PRE-mutation state while the original mutates on — the
    * entry builds an events table, freezes it through the SQL verb, then
    * physically DELETEs half the original and OPTIMIZEs it (rewriting and
    * GC-ing the very dirs the backup hard-links), and aggregates the
    * BACKUP. The oracle is the UN-mutated corpus: hash equality proves the
    * frozen view stayed bit-stable through the original's rewrite cycle.
    */
  def q142Freeze(spark: SparkSession, dir: String): DataFrame = {
    val bdir = cacheFreeze.getOrElseUpdate(dir, {
      val ev = eventsSlim(spark, dir)
      val p = Files.createTempDirectory("mt_q142_").toString
      val tbl = ColumnarMergeTree.create(spark, p, ev.schema,
        orderBy = Seq("user_id", "event_id"),
        config = graft.mergetree.MergeTreeConfig(gcGraceSeconds = 0))
      chunkedInsert(tbl, ev, ev.count())
      val b = spark.sql(s"ALTER TABLE '$p' FREEZE WITH NAME 'q142'")
        .collect().head.getString(0)
      tbl.deleteWhere(col("event_type") === "click") // mutate the original…
      tbl.optimizeFinal()                            // …rewrite + GC its parts
      tbl.purgeGc(force = true)
      b
    })
    ColumnarMergeTree.open(spark, bdir).scan()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        floor(sum(col("value")) * lit(100.0) + lit(0.5)).as("sum_value"))
      .orderBy(col("event_type"))
  }

  private val cacheFreeze = TrieMap.empty[String, String]

  val q142Sql: String =
    """SELECT event_type, count(*) AS n,
      | CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q141 — system.query_log (rows-only: the log is session-history by
    * nature, so no DuckDB oracle exists; the entry is SELF-ENFORCING
    * instead). Runs one deterministic probe action, then proves the probe
    * landed in the ring by finding its own canonical plan digest via the
    * `query_log()` SQL face with status ok and a positive duration.
    */
  def q141QueryLog(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{QueryLog, QueryLogSink}
    QueryLog.install(spark) // idempotent; extensions normally do this
    // Persisted face (ClickHouse: query_log IS a MergeTree table): route
    // the ring into a sink table for the duration of the entry.
    val sinkDir = Files.createTempDirectory("mt_q141_sink_").toString
    spark.conf.set(QueryLogSink.ConfKey, sinkDir)
    try {
      QueryLogSink.configure(spark)
      val probe = spark.read.parquet(s"$dir/region.parquet")
        .selectExpr("count(*) AS n")
      val n = probe.collect().head.getLong(0)
      require(n > 0, "q141: probe must see rows")
      val dig = QueryLog.digestOf(probe)
      // the listener is async — poll briefly for the probe's entry
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (!QueryLog.entries.exists(e => e.planDigest == dig && e.status == "ok") &&
          System.nanoTime() < deadline) Thread.sleep(20)
      val mine = spark.sql(
        s"SELECT plan_digest, status, duration_ms FROM query_log() " +
          s"WHERE plan_digest = '$dig' AND status = 'ok'")
      val rows = mine.collect()
      require(rows.nonEmpty, "q141: the probe's execution must be in query_log()")
      require(rows.forall(_.getDouble(2) > 0), "q141: logged duration must be positive")
      // …and the same digest must be durable: flush the sink, read the
      // entry back through the ordinary mergetree connector.
      QueryLogSink.flushNow()
      val persisted = spark.read.format("mergetree").load(sinkDir)
        .filter(col("plan_digest") === dig && col("status") === "ok")
        .count()
      require(persisted > 0, "q141: probe entry missing from the persisted query_log table")
      import spark.implicits._
      // Deterministic projection for the rows-only check: the probe was
      // found (ring + persisted table), with its region count (stable per
      // SF dir).
      Seq(("ok", n)).toDF("probe_status", "region_rows")
    } finally {
      spark.conf.unset(QueryLogSink.ConfKey)
      QueryLogSink.reset()
    }
  }

  /** Q143 — ClickHouse `SAMPLE k` clause (storage-level sampling): a
    * catalog table declares `sampleBy 'smp'` where smp = the first 8 hex
    * chars of md5(user_id) as an integer (uniform on [0, 2³²), computed
    * identically on both sides), leading the ORDER BY. `SELECT … FROM t
    * SAMPLE 0.25` then reads the deterministic slice smp < 2³⁰ — all
    * events of a sampled user together, parts/row groups outside the
    * slice pruned (SampleClauseSpec pins the pruning; this entry pins the
    * VALUES against DuckDB computing the same hash slice from raw
    * parquet). Self-enforcing: the sampled row count must be a proper
    * subset of the full table's.
    */
  /** The q143/q145/q146/q147 shared catalog table — built once per dir. */
  private def sampleTable(spark: SparkSession, dir: String): String =
    cacheSample.getOrElseUpdate(dir, {
      val wh = Files.createTempDirectory("mt_q143_wh_").toString
      spark.conf.set("spark.sql.catalog.gq143",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.gq143.warehouse", wh)
      val n = "t" + Integer.toHexString(dir.hashCode & 0x7fffffff)
      spark.read.parquet(s"$dir/events.parquet")
        .createOrReplaceTempView("q143_events")
      spark.sql(s"CREATE TABLE gq143.q143.$n (smp BIGINT, event_id BIGINT, " +
        "user_id BIGINT, event_type STRING, value DOUBLE) USING mergetree " +
        "OPTIONS (orderBy 'smp,event_id', sampleBy 'smp')")
      // two halves -> two parts; each part is smp-sorted, so the slice
      // prunes row groups inside every part
      for (half <- 0 to 1)
        spark.sql(s"INSERT INTO gq143.q143.$n SELECT " +
          "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT), " +
          s"event_id, user_id, event_type, value FROM q143_events WHERE event_id % 2 = $half")
      s"gq143.q143.$n"
    })

  def q143Sample(spark: SparkSession, dir: String): DataFrame = {
    val tblName = sampleTable(spark, dir)
    val sampled = spark.sql(
      s"""SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS users,
         | CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sum_value
         |FROM $tblName SAMPLE 0.25
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin)
    // Materialize the grouped sample ONCE; the subset self-enforcement
    // folds over the collected rows instead of re-running the sampled scan
    // (round-16 optimization: the old agg + lazy return scanned twice).
    val rows = java.util.Arrays.asList(sampled.collect(): _*)
    val nSampled = rows.stream.mapToLong(_.getLong(1)).sum()
    val nAll = spark.sql(s"SELECT count(*) FROM $tblName").collect().head.getLong(0)
    require(nSampled > 0 && nSampled < nAll,
      s"q143: SAMPLE must read a proper subset ($nSampled of $nAll)")
    spark.createDataFrame(rows, sampled.schema)
  }

  private val cacheSample = TrieMap.empty[String, String]

  val q143Sql: String =
    """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS users,
      | CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sum_value
      |FROM events
      |WHERE ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT < 1073741824
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q144 — STREAMING ingest under the oracle contract (the one §2.2
    * category previously spec'd only): the events fixture is re-laid as 4
    * files, streamed file-by-file (`maxFilesPerTrigger 1` → 4 real
    * micro-batches) through [[graft.streaming.StreamingIngest.startGeneric]]
    * — each micro-batch one distributed sorted part via insertBatch, the
    * applied-batch replay guard armed — drained with Trigger.AvailableNow,
    * then aggregated from the TABLE. Hash-equality against DuckDB reading
    * the raw parquet proves streamed ingest ≡ batch ingest. Self-enforcing:
    * the table must hold ≥ 2 parts (really several micro-batches) and
    * every fixture row.
    */
  def q144StreamIngest(spark: SparkSession, dir: String): DataFrame = {
    val tblDir = cacheStreamIngest.getOrElseUpdate(dir, {
      val ev = eventsSlim(spark, dir)
      val feed = Files.createTempDirectory("mt_q144_feed_").toString
      ev.repartitionByRange(4, col("event_id")).write.mode("overwrite").parquet(feed)
      val p = Files.createTempDirectory("mt_q144_tbl_").toString
      val t = ColumnarMergeTree.create(spark, p, ev.schema,
        orderBy = Seq("user_id", "event_id"))
      val ckpt = Files.createTempDirectory("mt_q144_ckpt_").toString
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(feed)
      val q = graft.streaming.StreamingIngest.startGeneric(t, stream, ckpt,
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination()
      require(t.parts.size >= 2,
        s"q144: expected one part per micro-batch (>= 2), got ${t.parts.size}")
      require(t.scan().count() == ev.count(), "q144: streamed rows must all land")
      p
    })
    ColumnarMergeTree.open(spark, tblDir).scan()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"),
        floor(sum(col("value")) * lit(100.0) + lit(0.5)).cast("long").as("sum_value"),
        max(col("event_id")).as("max_event"))
      .orderBy(col("event_type"))
  }

  private val cacheStreamIngest = TrieMap.empty[String, String]

  val q144Sql: String =
    """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS users,
      | CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sum_value,
      | max(event_id) AS max_event
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q145 — ClickHouse `ORDER BY … WITH FILL FROM a TO b STEP s` (gap
    * filling through the parser): a sparse bucket aggregate over the q143
    * catalog table (150 distinct buckets on a 211-point grid) fills its
    * 61 missing grid rows with type defaults. Oracle: DuckDB
    * generate_series/range LEFT JOIN with the same COALESCE defaults.
    */
  def q145WithFill(spark: SparkSession, dir: String): DataFrame = {
    val tblName = sampleTable(spark, dir)
    val out = spark.sql(
      s"""SELECT bucket, count(*) AS n,
         | CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sv
         |FROM (SELECT CAST(event_id % 211 AS BIGINT) * 2 AS bucket, value
         |      FROM $tblName WHERE event_id < 150)
         |GROUP BY bucket
         |ORDER BY bucket WITH FILL FROM 0 TO 422 STEP 2""".stripMargin)
    // Materialize the 211-row grid ONCE and self-enforce on the collected
    // rows (round-16 optimization: count() + lazy return ran the fill
    // twice per invocation).
    val rows = java.util.Arrays.asList(out.collect(): _*)
    require(rows.size == 211, s"q145: 211 grid rows expected, got ${rows.size}")
    spark.createDataFrame(rows, out.schema)
  }

  val q145Sql: String =
    """WITH agg AS (
      |  SELECT CAST(event_id % 211 AS BIGINT) * 2 AS bucket, count(*) AS n,
      |   CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sv
      |  FROM events WHERE event_id < 150 GROUP BY 1)
      |SELECT g.bucket, coalesce(n, 0) AS n, coalesce(sv, 0) AS sv
      |FROM (SELECT range AS bucket FROM range(0, 422, 2)) g
      |LEFT JOIN agg USING (bucket)
      |ORDER BY bucket""".stripMargin

  /** Q146 — `WITH FILL … INTERPOLATE (c)` (ClickHouse fill interpolation,
    * carry-forward form): q145's sparse grid, but the filled rows CARRY
    * the last real row's `sv` instead of zero — the time-series readout
    * shape ("no data this bucket → hold the last reading"). `n` stays
    * type-default 0, so the two fill behaviors are pinned side by side.
    * Oracle: the same carry via DuckDB `last_value(sv IGNORE NULLS)`.
    */
  def q146FillInterpolate(spark: SparkSession, dir: String): DataFrame = {
    val tblName = sampleTable(spark, dir)
    spark.sql(
      s"""SELECT bucket, count(*) AS n,
         | CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sv
         |FROM (SELECT CAST(event_id % 211 AS BIGINT) * 2 AS bucket, value
         |      FROM $tblName WHERE event_id < 150)
         |GROUP BY bucket
         |ORDER BY bucket WITH FILL FROM 0 TO 422 STEP 2 INTERPOLATE (sv)""".stripMargin)
  }

  val q146Sql: String =
    """WITH agg AS (
      |  SELECT CAST(event_id % 211 AS BIGINT) * 2 AS bucket, count(*) AS n,
      |   CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sv
      |  FROM events WHERE event_id < 150 GROUP BY 1)
      |SELECT g.bucket, coalesce(n, 0) AS n,
      |  coalesce(sv,
      |    last_value(sv IGNORE NULLS) OVER (ORDER BY g.bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    0) AS sv
      |FROM (SELECT range AS bucket FROM range(0, 422, 2)) g
      |LEFT JOIN agg USING (bucket)
      |ORDER BY bucket""".stripMargin

  /** Q147 — ClickHouse `LIMIT n BY cols` (top-n per key as a clause): the
    * 3 highest-value events per event_type from the catalog table, ordered
    * and tie-broken deterministically on both sides (value floored to
    * integer cents for cross-engine ordering equality). Oracle: the
    * equivalent row_number window in DuckDB.
    */
  def q147LimitBy(spark: SparkSession, dir: String): DataFrame = {
    val tblName = sampleTable(spark, dir)
    spark.sql(
      s"""SELECT event_type, event_id,
         | CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v100
         |FROM $tblName
         |ORDER BY event_type, v100 DESC, event_id
         |LIMIT 3 BY event_type""".stripMargin)
  }

  val q147Sql: String =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v100
      |  FROM events),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY v100 DESC, event_id) AS rk
      |  FROM e)
      |SELECT event_type, event_id, v100 FROM r WHERE rk <= 3
      |ORDER BY event_type, v100 DESC, event_id""".stripMargin

  /** Q156 — `LIMIT o, n BY cols` (round 16; ClickHouse's offset form):
    * skip each event_type's 2 highest-value events, return the next 3 —
    * per-key pagination as one clause. Oracle: the same rank window with
    * `rk > 2 AND rk <= 5` in DuckDB.
    */
  def q156LimitOffsetBy(spark: SparkSession, dir: String): DataFrame = {
    val tblName = sampleTable(spark, dir)
    spark.sql(
      s"""SELECT event_type, event_id,
         | CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v100
         |FROM $tblName
         |ORDER BY event_type, v100 DESC, event_id
         |LIMIT 2, 3 BY event_type""".stripMargin)
  }

  val q156Sql: String =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v100
      |  FROM events),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY v100 DESC, event_id) AS rk
      |  FROM e)
      |SELECT event_type, event_id, v100 FROM r WHERE rk > 2 AND rk <= 5
      |ORDER BY event_type, v100 DESC, event_id""".stripMargin

  /** Q148 — `SELECT … FROM t FINAL` (ClickHouse's per-statement collapse
    * spelling, the missing third face next to the per-table catalog
    * property and the per-read DSv2 option): a Replacing table ingests
    * every event (k = user_id, version = event_id) across two parts; the
    * plain SELECT sees the RAW stored rows (ClickHouse semantics — one
    * per event, self-enforced) while FROM t FINAL collapses to the
    * latest version per key, cross-part. Oracle: DuckDB's latest-per-key
    * window over the raw events.
    */
  /** The q148/q154 shared Replacing catalog table — built once per dir. */
  private def fromFinalTable(spark: SparkSession, dir: String): String =
    cacheFromFinal.getOrElseUpdate(dir, {
      val wh = Files.createTempDirectory("mt_q148_wh_").toString
      spark.conf.set("spark.sql.catalog.gq148",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.gq148.warehouse", wh)
      val n = "t" + Integer.toHexString(dir.hashCode & 0x7fffffff)
      spark.read.parquet(s"$dir/events.parquet")
        .createOrReplaceTempView("q148_events")
      spark.sql(s"CREATE TABLE gq148.q148.$n (k BIGINT, ver BIGINT, v100 BIGINT) " +
        "USING mergetree OPTIONS (orderBy 'k', mode 'replacing', " +
        "keys 'k', version 'ver')")
      for (half <- 0 to 1)
        spark.sql(s"INSERT INTO gq148.q148.$n SELECT user_id, event_id, " +
          "CAST(floor(value * 100.0 + 0.5) AS BIGINT) " +
          s"FROM q148_events WHERE event_id % 2 = $half")
      s"gq148.q148.$n"
    })

  def q148FromFinal(spark: SparkSession, dir: String): DataFrame = {
    val tblName = fromFinalTable(spark, dir)
    val raw = spark.sql(s"SELECT count(*) FROM $tblName").collect().head.getLong(0)
    val fin = spark.sql(
      s"SELECT k, ver, v100 FROM $tblName FINAL ORDER BY k")
    // Materialize the collapsed face ONCE and self-enforce on the collected
    // rows — the old count() + lazy return executed the FINAL collapse
    // twice per invocation (round-16 optimization). Key-count-sized.
    val rows = java.util.Arrays.asList(fin.collect(): _*)
    require(raw > rows.size && rows.size > 0,
      s"q148: plain SELECT must see raw versions ($raw) above FINAL's collapse (${rows.size})")
    spark.createDataFrame(rows, fin.schema)
  }

  private val cacheFromFinal = TrieMap.empty[String, String]

  val q148Sql: String =
    """SELECT user_id AS k, event_id AS ver,
      | CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v100
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY event_id DESC) AS rn
      |  FROM events) sub
      |WHERE rn = 1 ORDER BY k""".stripMargin

  /** Q150 — ClickHouse `PREWHERE` (parser): the explicit early-filter
    * clause rewrites to the semantically identical WHERE — Spark's scan
    * already evaluates pushed predicates before materializing the other
    * columns, so pasted ClickHouse queries keep working and get the very
    * optimization PREWHERE asks for. The query carries BOTH clauses —
    * `PREWHERE cheap WHERE expensive`, the combination real ClickHouse
    * queries routinely paste — which AND-merge; the WHERE condition ends
    * with an OR so the merge's parenthesization (precedence) is under
    * oracle too. Oracle: one WHERE with the conjunction spelled out.
    */
  def q150Prewhere(spark: SparkSession, dir: String): DataFrame = {
    val tblName = sampleTable(spark, dir)
    spark.sql(
      s"""SELECT event_type, count(*) AS n, max(event_id) AS max_ev
         |FROM $tblName PREWHERE user_id % 3 = 0
         |WHERE event_id % 5 = 0 OR event_id % 7 = 0
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q150Sql: String =
    """SELECT event_type, count(*) AS n, max(event_id) AS max_ev
      |FROM events
      |WHERE (user_id % 3 = 0) AND (event_id % 5 = 0 OR event_id % 7 = 0)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q154 — FINAL on a JOIN target (round 16; ClickHouse allows the
    * modifier on any table expression): the raw Replacing table (every
    * version, 2 per key) joins its OWN collapsed face — each raw row
    * pairs with its key's latest version, the "annotate history with the
    * current value" shape. Self-enforcing: the join must preserve the raw
    * row count exactly (one latest per key). Oracle: DuckDB joins the raw
    * events against the latest-per-key window.
    */
  def q154JoinFinal(spark: SparkSession, dir: String): DataFrame = {
    val tblName = fromFinalTable(spark, dir)
    val al = tblName.split('.').last
    val out = spark.sql(
      s"""SELECT a.k AS k, a.ver AS ver, $al.ver AS latest_ver,
         | $al.v100 AS latest_v100
         |FROM $tblName a JOIN $tblName FINAL ON a.k = $al.k
         |ORDER BY k, ver""".stripMargin)
    val raw = spark.sql(s"SELECT count(*) FROM $tblName").collect().head.getLong(0)
    // Materialize the join ONCE and self-enforce on the collected rows —
    // the old count() + lazy return executed the raw×collapsed join twice
    // per invocation (round-16 optimization). Raw-row-sized (4 longs/row).
    val rows = java.util.Arrays.asList(out.collect(): _*)
    require(rows.size == raw,
      s"q154: raw x collapsed must preserve the raw count (${rows.size} vs $raw)")
    spark.createDataFrame(rows, out.schema)
  }

  val q154Sql: String =
    """WITH latest AS (
      |  SELECT user_id AS k, event_id AS ver,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v100
      |  FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id
      |      ORDER BY event_id DESC) AS rn
      |    FROM events) sub
      |  WHERE rn = 1)
      |SELECT e.user_id AS k, e.event_id AS ver,
      |  l.ver AS latest_ver, l.v100 AS latest_v100
      |FROM events e JOIN latest l ON e.user_id = l.k
      |ORDER BY k, ver""".stripMargin

  /** Q151 — ClickHouse `SAMPLE n` (the ABSOLUTE-rows spelling, next to
    * q143's fractional form): `SAMPLE 250` reads ≈250 rows by deriving
    * the fraction from the manifest's row count — metadata only, no
    * counting scan — then applying the exact same deterministic slice
    * predicate (here a prunable range on the declared SAMPLE BY column).
    * The oracle derives the identical threshold in DuckDB from count(*):
    * floor(250.0 / total · 2³²) is the same IEEE double arithmetic on
    * both engines, so the slice hashes equal. Self-enforcing: a proper
    * subset lands.
    */
  def q151SampleRows(spark: SparkSession, dir: String): DataFrame = {
    val tblName = sampleTable(spark, dir)
    val sampled = spark.sql(
      s"""SELECT event_type, count(*) AS n,
         | CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sum_value
         |FROM $tblName SAMPLE 250
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin)
    // Materialize the grouped sample ONCE; the subset self-enforcement
    // folds over the collected rows instead of re-running the sampled scan
    // (round-16 optimization: the old agg + lazy return scanned twice).
    val rows = java.util.Arrays.asList(sampled.collect(): _*)
    val nSampled = rows.stream.mapToLong(_.getLong(1)).sum()
    val nAll = spark.sql(s"SELECT count(*) FROM $tblName").collect().head.getLong(0)
    require(nSampled > 0 && nSampled < nAll,
      s"q151: SAMPLE 250 must read a proper subset ($nSampled of $nAll)")
    spark.createDataFrame(rows, sampled.schema)
  }

  val q151Sql: String =
    """WITH thr AS (
      |  SELECT CAST(floor(250.0 / count(*) * 4294967296.0) AS BIGINT) AS t
      |  FROM events)
      |SELECT event_type, count(*) AS n,
      | CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sum_value
      |FROM events, thr
      |WHERE ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT < thr.t
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q163 — ClickHouse-NATIVE CREATE TABLE DDL under oracle (round 16):
    * the pasted-ClickHouse form `CREATE TABLE … ENGINE =
    * ReplacingMergeTree(ver) PARTITION BY … PRIMARY KEY … ORDER BY …
    * SETTINGS index_granularity = 8192` rewrites (ChCreateTable) to the
    * SAME options-face DDL q148 spells by hand — UInt64/LowCardinality/
    * Date map per the published type rules, the engine args become
    * mode/keys/version, PRIMARY KEY is checked as an ORDER BY prefix and
    * subsumed, and the SETTINGS tail is tuning-allowlisted. PARTITION BY
    * k % 4 keeps every key inside one partition, so FINAL's collapse is
    * the oracle's plain per-key max-version pick. The engine posture is
    * q148's: version-latest dedup at read via mergetree_final, no
    * cartesian, partition-pruned scans.
    */
  private val cacheChDdl = TrieMap.empty[String, String]

  private def chDdlTable(spark: SparkSession, dir: String): String =
    cacheChDdl.getOrElseUpdate(dir, {
      val wh = Files.createTempDirectory("mt_q163_wh_").toString
      spark.conf.set("spark.sql.catalog.gq163",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.gq163.warehouse", wh)
      val n = "t" + Integer.toHexString(dir.hashCode & 0x7fffffff)
      spark.read.parquet(s"$dir/events.parquet")
        .createOrReplaceTempView("q163_events")
      spark.sql(
        s"""CREATE TABLE gq163.q163.$n (
           |  k    UInt64,
           |  ver  UInt64,
           |  cat  LowCardinality(String) CODEC(ZSTD(3)),
           |  v100 Nullable(Int64),
           |  d    Date
           |) ENGINE = ReplacingMergeTree(ver)
           |PARTITION BY k % 4
           |PRIMARY KEY k
           |ORDER BY k
           |SETTINGS index_granularity = 8192""".stripMargin)
      for (half <- 0 to 1)
        spark.sql(s"INSERT INTO gq163.q163.$n SELECT user_id, event_id, " +
          "event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT), " +
          s"CAST(ts AS DATE) FROM q163_events WHERE event_id % 2 = $half")
      s"gq163.q163.$n"
    })

  def q163ChCreateTable(spark: SparkSession, dir: String): DataFrame = {
    val tbl = chDdlTable(spark, dir)
    val raw = spark.sql(s"SELECT count(*) FROM $tbl").collect().head.getLong(0)
    val fin = spark.sql(
      s"SELECT k, ver, cat, v100, CAST(d AS STRING) AS d FROM $tbl FINAL ORDER BY k")
    // Materialize the collapsed face ONCE and self-enforce on the collected
    // rows (round-16 optimization: count() + lazy return collapsed twice).
    val rows = java.util.Arrays.asList(fin.collect(): _*)
    require(raw > rows.size && rows.size > 0,
      s"q163: raw versions ($raw) must exceed FINAL's collapse (${rows.size})")
    spark.createDataFrame(rows, fin.schema)
  }

  val q163Sql: String =
    """SELECT k, ver, cat, v100, CAST(d AS VARCHAR) AS d FROM (
      |  SELECT user_id AS k, event_id AS ver, event_type AS cat,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v100,
      |    ts::DATE AS d,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |  FROM events) sub
      |WHERE rn = 1 ORDER BY k""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q1_point_lookup", q1PointLookup _, Some(q1Sql)),
    ("q2_range_scan", q2RangeScan _, Some(q2Sql)),
    ("q3_memtable_union", q3MemtableUnion _, Some(q3Sql)),
    ("q4_after_optimize", q4AfterOptimize _, Some(q4Sql)),
    ("q5_exact_dup", q5ExactDup _, Some(q5Sql)),
    ("q6_lex_bounds", q6LexBounds _, Some(q6Sql)),
    ("q7_counts", q7Counts _, Some(q7Sql)),
    ("q8_reopen", q8Reopen _, Some(q8Sql)),
    ("q36_dsv2_scan", q36Dsv2Scan _, Some(q36Sql)),
    ("q44_generic_table", q44GenericTable _, Some(q44Sql)),
    ("q45_replacing_mt", q45Replacing _, Some(q45Sql)),
    ("q46_summing_mt", q46Summing _, Some(q46Sql)),
    ("q47_delete_where", q47DeleteWhere _, Some(q47Sql)),
    ("q51_collapsing_mt", q51Collapsing _, Some(q51Sql)),
    ("q52_partitioned", q52Partitioned _, Some(q52Sql)),
    ("q53_ttl", q53Ttl _, Some(q53Sql)),
    ("q54_aggregating_mt", q54Aggregating _, Some(q54Sql)),
    ("q55_mat_view", q55MatView _, Some(q55Sql)),
    ("q79_minmax_scan", q79MinmaxScan _, Some(q79Sql)),
    ("q91_alter_sql", q91AlterSql _, Some(q91Sql)),
    ("q92_optimize_sql", q92OptimizeSql _, Some(q92Sql)),
    ("q97_has_token", q97HasToken _, Some(q97Sql)),
    ("q105_log_manifest", q105LogManifest _, Some(q105Sql)),
    ("q107_agg_projection", q107AggProjection _, Some(q107Sql)),
    ("q128_set_index_scan", q128SetIndexScan _, Some(q128Sql)),
    ("q131_spj_join", q131SpjJoin _, Some(q131Sql)),
    ("q133_bucket_spj", q133BucketSpj _, Some(q133Sql)),
    ("q135_bucket_mix_spj", q135BucketMixSpj _, Some(q135Sql)),
    ("q136_runtime_prune", q136RuntimePrune _, Some(q136Sql)),
    ("q137_zorder_scan", q137ZOrderScan _, Some(q137Sql)),
    ("q138_lightweight_delete", q138LightweightDelete _, Some(q138Sql)),
    ("q139_lightweight_update", q139LightweightUpdate _, Some(q139Sql)),
    ("q141_query_log", q141QueryLog _, None),
    ("q142_freeze", q142Freeze _, Some(q142Sql)),
    ("q143_sample", q143Sample _, Some(q143Sql)),
    ("q144_stream_ingest", q144StreamIngest _, Some(q144Sql)),
    ("q145_with_fill", q145WithFill _, Some(q145Sql)),
    ("q146_fill_interpolate", q146FillInterpolate _, Some(q146Sql)),
    ("q147_limit_by", q147LimitBy _, Some(q147Sql)),
    ("q148_from_final", q148FromFinal _, Some(q148Sql)),
    ("q150_prewhere", q150Prewhere _, Some(q150Sql)),
    ("q151_sample_rows", q151SampleRows _, Some(q151Sql)),
    ("q154_join_final", q154JoinFinal _, Some(q154Sql)),
    ("q156_limit_offset_by", q156LimitOffsetBy _, Some(q156Sql)),
    ("q163_ch_create_table", q163ChCreateTable _, Some(q163Sql)))
}
