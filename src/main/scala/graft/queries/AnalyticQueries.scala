package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The analytic query surface (SURVEY §2.3 Q9–Q22): the SQL-on-columnar
  * capability a ClickHouse-class engine exposes over its tables, expressed
  * as declarative DataFrame plans so Catalyst supplies pushdown, pruning,
  * partial aggregation, and join strategy selection.
  *
  * Every query:
  *   - has a total ORDER BY (deterministic row order);
  *   - aliases every computed column identically to its oracle SQL;
  *   - rounds floating-point aggregates (sum/avg of doubles) so the
  *     Spark and DuckDB results land on the same IEEE double after
  *     differing reduction orders.
  *
  * Scale notes are per-query; the common ones: filters/projections sit
  * directly on the parquet scan (pushdown + pruning), aggregations are
  * hash-based with map-side partial combine, small dimension tables are
  * broadcast explicitly.
  */
object AnalyticQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")


  /** events.parquet has stored ts two ways across testdata generations:
    * INT64 TIMESTAMP(NANOS) — which Spark reads as a nanos Long under
    * spark.sql.legacy.parquet.nanosAsLong — and plain TIMESTAMP(MICROS),
    * which Spark reads as TIMESTAMP_NTZ. Normalize both to a session-TZ
    * (UTC) timestamp. For the nanos Long, integer division (`div`) is
    * load-bearing: nanos since epoch (~1.7e18) exceed a double's 53-bit
    * mantissa, so `/ 1000` would corrupt the value. For NTZ, the cast is
    * epoch-preserving because every Graft session pins timeZone=UTC.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Q9 — TPC-H Q1 shape: full-scan hash aggregate.
    * Scale: partial agg on 6M-row/partition scans; 6-group output, no skew.
    */
  def q9Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        floor(sum("l_quantity") * lit(100.0) + lit(0.5)).as("sum_qty"),
        floor(sum("l_extendedprice") * lit(100.0) + lit(0.5)).as("sum_base_price"),
        floor(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * lit(100.0) + lit(0.5))
          .as("sum_disc_price"),
        floor(avg("l_quantity") * lit(1000000.0) + lit(0.5)).as("avg_qty"),
        floor(avg("l_discount") * lit(1000000.0) + lit(0.5)).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q9Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(floor(sum(l_quantity) * 100.0 + 0.5) AS BIGINT) AS sum_qty,
      | CAST(floor(sum(l_extendedprice) * 100.0 + 0.5) AS BIGINT) AS sum_base_price,
      | CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) AS BIGINT) AS sum_disc_price,
      | CAST(floor(avg(l_quantity) * 1000000.0 + 0.5) AS BIGINT) AS avg_qty,
      | CAST(floor(avg(l_discount) * 1000000.0 + 0.5) AS BIGINT) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q10 — filter + projection; predicate and 4-column ReadSchema both
    * reach the parquet scan (verified via explain: PushedFilters).
    */
  def q10FilterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q10Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Q11 — orders ⋈ customer, grouped by nation key.
    * Scale: customer is the small side at TPC-H ratios (1:10) but not tiny;
    * we broadcast only genuinely-small dims (nation/region). Here the join
    * shuffles on custkey — both sides hash-partitioned once, then one
    * 25-group aggregate.
    */
  def q11Join(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    orders.join(customer, orders("o_custkey") === customer("c_custkey"), "inner")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        floor(sum("o_totalprice") * lit(100.0) + lit(0.5)).as("total_price"))
      .orderBy(col("c_nationkey"))
  }

  val q11Sql: String =
    """SELECT c_nationkey, count(*) AS n_orders,
      | CAST(floor(sum(o_totalprice) * 100.0 + 0.5) AS BIGINT) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Q12 — TPC-H Q3 shape: 3-way join, filtered, aggregated, top-10.
    * Scale: filters push into all three scans before the joins; join order
    * customer→orders→lineitem lets AQE/CBO broadcast the filtered customer
    * side; final TakeOrderedAndProject avoids a global sort.
    */
  def q12Join3(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = t(spark, dir, "lineitem")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(floor(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * lit(100.0)
        + lit(0.5)).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q12Sql: String =
    """SELECT l_orderkey,
      | CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) AS BIGINT) AS revenue
      |FROM lineitem
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Q13 — left-semi + left-anti: customers with / without orders, tagged.
    * Scale: semi/anti joins shuffle only the distinct keys of the right
    * side; no row multiplication.
    */
  def q13SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    val ord = t(spark, dir, "orders")
    val withOrders = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("with_orders").as("tag"))
    val noOrders = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_orders").as("tag"))
    withOrders.unionByName(noOrders).orderBy(col("c_custkey"), col("tag"))
  }

  val q13Sql: String =
    """SELECT c_custkey, 'with_orders' AS tag FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |UNION ALL
      |SELECT c_custkey, 'no_orders' AS tag FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      |ORDER BY c_custkey, tag""".stripMargin

  /** Q14 — top-k by aggregate with deterministic tiebreak.
    * Scale: orderBy(...).limit(k) plans TakeOrderedAndProject — per-partition
    * heaps + driver merge of k rows, never a global sort.
    */
  def q14TopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(floor(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * lit(100.0)
        + lit(0.5)).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  val q14Sql: String =
    """SELECT l_orderkey,
      | CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) AS BIGINT) AS revenue
      |FROM lineitem GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Q15 — ranking window: latest order per customer.
    * Scale: one shuffle on o_custkey; rank computed within partitions.
    */
  def q15WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"))
      .orderBy(col("o_custkey"))
  }

  val q15Sql: String =
    """SELECT o_custkey, o_orderkey FROM (
      | SELECT o_custkey, o_orderkey,
      |  row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      | FROM orders) sub
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** Q16 — analytic window: running sum per user over event time.
    * Frame rowsBetween(unboundedPreceding, currentRow); additions happen in
    * frame order in both engines, so doubles agree bit-for-bit (rounded
    * anyway for safety).
    */
  def q16RunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      .withColumn("running_value", floor(sum("value").over(w) * lit(100.0) + lit(0.5)))
      .select(col("user_id"), col("event_id"), col("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q16Sql: String =
    """SELECT user_id, event_id,
      | CAST(floor(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100.0 + 0.5) AS BIGINT)
      |   AS running_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** Q17 — exact distinct count (oracle-checked); the approx variant is
    * q17b (rows-only, no SQL oracle — sketch output is engine-specific).
    */
  def q17Distinct(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .agg(countDistinct(col("user_id")).as("exact_users"))

  val q17Sql: String =
    "SELECT count(DISTINCT user_id) AS exact_users FROM events"

  /** Q17b — approx_count_distinct (HLL++). No oracle: tolerance-checked by
    * construction (rsd 5%); driver records a rows-only check.
    */
  def q17bApprox(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))

  /** Q18 — tumbling 1-hour window per event_type. Bucket emitted as epoch
    * seconds (bigint) so Spark/DuckDB timestamp types can't diverge.
    */
  def q18Tumbling(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        floor(sum("value") * lit(100.0) + lit(0.5)).as("sum_value"))
      .orderBy(col("hour_ts"), col("event_type"))

  val q18Sql: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
      | event_type, count(*) AS n,
      | CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""".stripMargin

  /** Q19 — set operators over two event-type key sets, tagged per branch. */
  def q19SetOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val clickers = ev.filter(col("event_type") === "click").select(col("user_id"))
    val buyers = ev.filter(col("event_type") === "purchase").select(col("user_id"))
    val u = clickers.union(buyers).distinct().select(lit("union").as("op"), col("user_id"))
    val i = clickers.intersect(buyers).select(lit("intersect").as("op"), col("user_id"))
    val e = clickers.except(buyers).select(lit("except").as("op"), col("user_id"))
    u.unionByName(i).unionByName(e).orderBy(col("op"), col("user_id"))
  }

  val q19Sql: String =
    """SELECT 'union' AS op, user_id FROM
      | (SELECT user_id FROM events WHERE event_type = 'click'
      |  UNION SELECT user_id FROM events WHERE event_type = 'purchase') a
      |UNION ALL
      |SELECT 'intersect' AS op, user_id FROM
      | (SELECT user_id FROM events WHERE event_type = 'click'
      |  INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase') b
      |UNION ALL
      |SELECT 'except' AS op, user_id FROM
      | (SELECT user_id FROM events WHERE event_type = 'click'
      |  EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase') c
      |ORDER BY op, user_id""".stripMargin

  /** Q20 — scalar-function mix: string, date, math, json.
    *
    * value_tax is round-half-up to 2 dp spelled as floor(x*110 + 0.5)/100:
    * Spark's round(double, 2) goes through BigDecimal's shortest-decimal
    * representation while DuckDB rounds the raw binary double, so the two
    * disagree on ties that `value * 1.1` manufactures (round-1 q20 red row).
    * floor over identical double arithmetic is bit-identical in both engines.
    */
  def q20Scalars(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("event_type").like("%c%"))
      .select(
        col("event_id"),
        substring(col("event_type"), 1, 3).as("et3"),
        upper(col("event_type")).as("et_upper"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day_ts"),
        floor(col("value") * lit(110.0) + lit(0.5)).as("value_tax"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k_val"))
      .orderBy(col("event_id"))

  val q20Sql: String =
    """SELECT event_id,
      | substring(event_type, 1, 3) AS et3,
      | upper(event_type) AS et_upper,
      | CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_ts,
      | CAST(floor(value * 110.0 + 0.5) AS BIGINT) AS value_tax,
      | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
      |FROM events WHERE event_type LIKE '%c%'
      |ORDER BY event_id""".stripMargin

  /** Q21 — ROLLUP grouping sets; null group keys coalesced to 'ALL' so
    * Spark/DuckDB null-ordering differences can't matter.
    */
  def q21Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        floor(sum("l_quantity") * lit(100.0) + lit(0.5)).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("cnt"), col("sum_qty"))
      .orderBy(col("rf"), col("ls"))

  val q21Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      | coalesce(l_linestatus, 'ALL') AS ls,
      | count(*) AS cnt, CAST(floor(sum(l_quantity) * 100.0 + 0.5) AS BIGINT) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  /** Q22 — keep-latest dedup on (user_id, event_type): the canonical
    * LLM-pipeline dedup pattern (window + rn=1), deterministic tiebreak on
    * event_id. Scale: one shuffle on the dedup key; state bounded per key.
    */
  def q22DedupLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val q22Sql: String =
    """SELECT user_id, event_type, event_id FROM (
      | SELECT user_id, event_type, event_id,
      |  row_number() OVER (PARTITION BY user_id, event_type
      |    ORDER BY ts DESC, event_id DESC) AS rn
      | FROM events) sub
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------- join variants Spark lacks natively

  /** Q39 — AS-OF join (an operator the reference class of engines ships and
    * Spark lacks): for each event, the most recent order of the same
    * customer at or before the event time — the MERGE formulation: union
    * both sides tagged, ONE hash exchange on the key, one per-key ordered
    * window carrying the latest order key forward
    * (`last(o_orderkey) ignoreNulls` over rows-unbounded-preceding), then
    * keep the event rows that saw an order. Orders sort BEFORE events at
    * the same instant (kind 0 < 1 — the `<=` bound) and ascending orderkey
    * within a date makes `last` pick the max key — exactly the
    * `ORDER BY date DESC, key DESC LIMIT 1` row the previous join+max_by
    * formulation aggregated. That formulation multiplied every event by
    * ALL its user's prior orders before collapsing (rows ∝ Σ_user
    * events·orders); this one shuffles each input row once (rows ∝
    * events + orders) — round-16 optimization, guide §2.3/§2.4. Scale:
    * one shuffle on the join key; skewed users get salting, not a
    * different algorithm.
    */
  def q39AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val ord = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    // NULL-time rows are dropped BEFORE the union (r16 ADVICE): a null
    // o_orderdate sorts NULLS FIRST in the window ordering and its
    // o_orderkey would carry forward to every event of that user, where
    // the join formulation's `o_orderdate <= ts` predicate dropped such
    // rows. (Assumes unique event_ids, as the events table guarantees —
    // the former groupBy collapsed exact-duplicate (event_id, user_id)
    // input rows, the merge does not.)
    val tagged = ord.select(col("o_custkey").as("user_id"),
        col("o_orderdate").cast("timestamp").as("time"), lit(0).as("kind"),
        col("o_orderkey"), lit(null).cast("long").as("event_id"))
      .unionByName(ev.select(col("user_id"), col("ts").as("time"),
        lit(1).as("kind"), lit(null).cast("long").as("o_orderkey"),
        col("event_id")))
      .filter(col("time").isNotNull)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("time"), col("kind"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_key", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1 && col("asof_key").isNotNull)
      .select(col("event_id"), col("user_id"), col("asof_key").as("o_orderkey"))
      .orderBy(col("event_id"))
  }

  val q39Sql: String =
    """SELECT event_id, user_id, o_orderkey FROM (
      |  SELECT e.event_id, e.user_id, o.o_orderkey,
      |    row_number() OVER (PARTITION BY e.event_id
      |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e JOIN orders o
      |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) sub
      |WHERE rn = 1 ORDER BY event_id""".stripMargin

  /** Q40 — range (band) join: events of the same user in the preceding
    * hour, implemented with the bucketize-then-equi-join pattern — the right
    * side is duplicated into its own and the NEXT hour bucket, so every
    * band pair meets in exactly one equi-bucket and the O(n·m) inequality
    * join becomes an equi-join plus a residual band filter. Time compared as
    * integer epoch-micros on both engines.
    */
  def q40RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val ev = events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val left = ev.withColumn("bucket", floor(col("us") / hourUs))
    val right = ev
      .select(col("user_id").as("r_user"), col("event_id").as("r_id"), col("us").as("r_us"))
      .withColumn("bucket",
        explode(array(floor(col("r_us") / hourUs), floor(col("r_us") / hourUs) + 1)))
    left.join(right,
        left("user_id") === right("r_user") && left("bucket") === right("bucket") &&
          col("r_us") >= col("us") - hourUs && col("r_us") < col("us"),
        "left")
      .groupBy(col("event_id"))
      .agg(count(col("r_id")).as("n_prev_hour"))
      .orderBy(col("event_id"))
  }

  val q40Sql: String =
    """SELECT e.event_id, count(p.event_id) AS n_prev_hour
      |FROM events e LEFT JOIN events p
      |  ON p.user_id = e.user_id
      | AND epoch_us(p.ts) >= epoch_us(e.ts) - 3600000000
      | AND epoch_us(p.ts) < epoch_us(e.ts)
      |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin

  /** Q41 — sessionization (gaps-and-islands): a new session starts after a
    * 30-minute silence; per user report session count, largest session, and
    * total events. Two windows over one shuffle on user_id; integer
    * epoch-micros gaps so both engines agree exactly.
    */
  def q41Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val sessioned = events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessioned
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("sess_events"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        max(col("sess_events")).as("max_session_events"),
        sum(col("sess_events")).as("n_events"))
      .orderBy(col("user_id"))
  }

  val q41Sql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |sessioned AS (
      |  SELECT user_id, event_id,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM marked),
      |per_sess AS (
      |  SELECT user_id, sess_id, count(*) AS sess_events
      |  FROM sessioned GROUP BY user_id, sess_id)
      |SELECT user_id, count(*) AS n_sessions,
      |  max(sess_events) AS max_session_events,
      |  sum(sess_events)::BIGINT AS n_events
      |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Q42 — exact interpolated quantiles per group (the ordered-set
    * aggregate ClickHouse-class engines expose as quantile()): Spark's
    * `percentile` and DuckDB's `quantile_cont` share the pos = q·(n−1)
    * linear-interpolation definition; outputs go through the portable
    * 6-dp rounding.
    */
  def q42Quantiles(spark: SparkSession, dir: String): DataFrame = {
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000.0) + lit(0.5)) // fixed-point micros (BIGINT) — hash-portable
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        r6(expr("percentile(value, 0.5)")).as("p50"),
        r6(expr("percentile(value, 0.9)")).as("p90"),
        r6(expr("percentile(value, 0.99)")).as("p99"))
      .orderBy(col("event_type"))
  }

  val q42Sql: String =
    """SELECT event_type,
      | CAST(floor(quantile_cont(value, 0.5) * 1000000.0 + 0.5) AS BIGINT) AS p50,
      | CAST(floor(quantile_cont(value, 0.9) * 1000000.0 + 0.5) AS BIGINT) AS p90,
      | CAST(floor(quantile_cont(value, 0.99) * 1000000.0 + 0.5) AS BIGINT) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q43 — structured JSON extraction: from_json into a typed struct (vs
    * q20's path-at-a-time get_json_object), aggregated on the parsed field.
    */
  def q43JsonStruct(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), lit("k INT")).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n"),
        sum(col("k")).cast("bigint").as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val q43Sql: String =
    """SELECT event_type, count(CAST(props->>'$.k' AS INT)) AS n,
      | sum(CAST(props->>'$.k' AS INT))::BIGINT AS sum_k,
      | min(CAST(props->>'$.k' AS INT)) AS min_k,
      | max(CAST(props->>'$.k' AS INT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** name → (query fn, oracle SQL or None). */
  /** Q49 — correlated EXISTS / NOT EXISTS spelled in SQL: customers with an
    * urgent order but no high-value one. Exercises Catalyst's subquery
    * decorrelation (RewritePredicateSubquery → one semi + one anti join) —
    * the SQL spelling of q13's explicit join shapes; no per-row subquery
    * execution survives in the plan.
    */
  def q49ExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("v_customer")
    t(spark, dir, "orders").createOrReplaceTempView("v_orders")
    spark.sql(
      """SELECT c_custkey, c_name FROM v_customer c
        |WHERE EXISTS (SELECT 1 FROM v_orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM v_orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin)
  }

  val q49Sql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  /** Q50 — CUBE grouping sets (all 4 combinations of the two dims),
    * complementing q21's ROLLUP; NULL group keys disambiguated with
    * coalesce like q21 so the oracle compare is exact.
    */
  def q50Cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        floor(sum(col("o_totalprice")) * lit(100.0) + lit(0.5)).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        col("cnt"), col("sum_price"))
      .orderBy(col("st"), col("pri"))

  val q50Sql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS st,
      | coalesce(o_orderpriority, 'ALL') AS pri,
      | count(*) AS cnt,
      | CAST(floor(sum(o_totalprice) * 100.0 + 0.5) AS BIGINT) AS sum_price
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY st, pri""".stripMargin

  /** Q58 — FULL OUTER join with unmatched rows on BOTH sides: a customer
    * subset (nation < 10) against per-customer order counts. Customers in
    * the subset without orders null-fill the right side; ordering customers
    * outside the subset null-fill the left — coalesced to sentinels so the
    * result is deterministic and hash-comparable. Completes the join-type
    * family (inner/semi/anti/broadcast/as-of/band already declared).
    */
  def q58FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val co = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    val cs = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_nationkey") < 10)
      .select(col("c_custkey"), col("c_nationkey"))
    cs.join(co, cs("c_custkey") === co("o_custkey"), "full_outer")
      .select(
        coalesce(cs("c_custkey"), co("o_custkey")).cast("long").as("custkey"),
        coalesce(col("c_nationkey"), lit(-1L)).cast("long").as("nationkey"),
        coalesce(col("n_orders"), lit(0L)).cast("long").as("n_orders"))
      .orderBy(col("custkey"))
  }

  val q58Sql: String =
    """WITH co AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey),
      |     cs AS (SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 10)
      |SELECT CAST(coalesce(cs.c_custkey, co.o_custkey) AS BIGINT) AS custkey,
      |       CAST(coalesce(cs.c_nationkey, -1) AS BIGINT) AS nationkey,
      |       CAST(coalesce(co.n_orders, 0) AS BIGINT) AS n_orders
      |FROM cs FULL OUTER JOIN co ON cs.c_custkey = co.o_custkey
      |ORDER BY custkey""".stripMargin

  /** Q59 — ARRAY JOIN shape (ClickHouse `ARRAY JOIN` = Spark `explode` =
    * SQL UNNEST): tokenize documents, explode to one row per token, hash-
    * aggregate term frequencies, keep the top 100. Scale: explode is
    * pipelined inside the scan stage (no shuffle), the count is a partial
    * agg on token, and the top-k is TakeOrderedAndProject — never a global
    * sort of the full term dictionary.
    */
  def q59ArrayJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(100)

  val q59Sql: String =
    """SELECT token, count(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token
      |ORDER BY cnt DESC, token
      |LIMIT 100""".stripMargin

  /** Q60 — RANGE-frame window: per-user sum of `value` over the trailing
    * 10 minutes of event time (value-based frame, not row-count — peers at
    * the same timestamp are all in-frame, so the result is deterministic
    * even under ts ties). Completes the window-frame family: ROWS (q16),
    * named frames/rank (q15), sessionize (q41). Scale: one shuffle on
    * user_id; the frame is evaluated with a sliding aggregate per
    * partition, O(n) per user.
    */
  def q60RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"))
      .rangeBetween(-600L, 0L)
    events(spark, dir)
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      .withColumn("sum_10m", floor(sum("value").over(w) * lit(100.0) + lit(0.5)))
      .select(col("user_id"), col("event_id"), col("ts_sec"), col("sum_10m"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q60Sql: String =
    """SELECT user_id, event_id, ts_sec,
      | CAST(floor(sum(value) OVER (PARTITION BY user_id ORDER BY ts_sec
      |   RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) * 100.0 + 0.5) AS BIGINT) AS sum_10m
      |FROM (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value FROM events)
      |ORDER BY user_id, event_id""".stripMargin

  /** Q61 — ClickHouse `LIMIT n BY col`: the 3 most recent orders per
    * customer (deterministic tiebreak on orderkey). Spark has no LIMIT BY
    * operator; the equivalent declarative plan is a ranking window +
    * rank filter — one shuffle on the BY key, then a per-partition sort
    * and an early-out filter (WindowGroupLimit pushes the limit into the
    * sort at the exec level, so no group is fully ranked).
    */
  def q61LimitBy(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q61Sql: String =
    """SELECT o_custkey, o_orderkey, rn FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS BIGINT) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Q64 — ClickHouse `GROUP BY … WITH TOTALS`: the per-group aggregate
    * plus one overall-totals row, in a single pass via GROUPING SETS
    * ((event_type), ()) — Spark expands the sets inside one hash
    * aggregate (Expand + partial agg), so the totals row costs no second
    * scan. The NULL grouping key of the totals row is coalesced to a
    * sentinel for deterministic ordering/hashing.
    */
  def q64WithTotals(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir).createOrReplaceTempView("ev_totals")
    spark.sql(
      """SELECT coalesce(event_type, '__totals__') AS event_type,
        | count(*) AS n,
        | CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sum_value
        |FROM ev_totals
        |GROUP BY GROUPING SETS ((event_type), ())
        |ORDER BY event_type""".stripMargin)
  }

  val q64Sql: String =
    """SELECT coalesce(event_type, '__totals__') AS event_type,
      | count(*) AS n,
      | CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sum_value
      |FROM events
      |GROUP BY GROUPING SETS ((event_type), ())
      |ORDER BY event_type""".stripMargin

  /** Q65 — ClickHouse `argMax`/`argMin` (Spark `max_by`/`min_by`): per
    * event type, which user produced the highest/lowest value. Partial-
    * aggregable (each partial keeps one (arg, extreme) pair per group), so
    * it collapses map-side like any min/max. Ties broken deterministically
    * by taking the extreme (user_id, value) pair lexicographically via a
    * struct comparison — ClickHouse's argMax tie behavior is unspecified,
    * so we pin one.
    */
  def q65ArgMax(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        max(struct(col("value"), col("user_id"))).getField("user_id").as("top_user"),
        floor(max(col("value")) * lit(100.0) + lit(0.5)).as("top_value"),
        min(struct(col("value"), col("user_id"))).getField("user_id").as("bottom_user"),
        floor(min(col("value")) * lit(100.0) + lit(0.5)).as("bottom_value"))
      .orderBy(col("event_type"))

  val q65Sql: String =
    """WITH ranked AS (
      |  SELECT event_type, user_id, value,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value DESC, user_id DESC) AS rt,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value ASC, user_id ASC) AS rb
      |  FROM events)
      |SELECT t.event_type,
      | t.user_id AS top_user,
      | CAST(floor(t.value * 100.0 + 0.5) AS BIGINT) AS top_value,
      | b.user_id AS bottom_user,
      | CAST(floor(b.value * 100.0 + 0.5) AS BIGINT) AS bottom_value
      |FROM (SELECT * FROM ranked WHERE rt = 1) t
      |JOIN (SELECT * FROM ranked WHERE rb = 1) b USING (event_type)
      |ORDER BY t.event_type""".stripMargin

  /** Q66 — ClickHouse `groupArray`/`groupUniqArray`: per event type, the
    * set of distinct users as ONE value. Emitted sorted and string-joined
    * so the result is deterministic and engine-portable (array reprs
    * differ between engines; a joined string hashes identically).
    */
  def q66GroupArray(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        concat_ws(",", array_sort(collect_set(col("user_id")))).as("users"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))

  val q66Sql: String =
    """SELECT event_type,
      | array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users,
      | count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q68 — ClickHouse `windowFunnel`: per user, the deepest prefix of the
    * funnel view → click → purchase completed inside a 24 h window
    * anchored at the chain's first event, then a histogram of users per
    * funnel level.
    *
    * Routed through [[graft.operators.Funnel.levels]] — the linear
    * per-user DP (one shuffle, k−1 window passes, no self-joins; see the
    * operator scaladoc for the dominance argument and scale posture).
    */
  def q68Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(
      col("user_id"), col("event_id"), col("event_type"),
      expr("unix_micros(ts)").as("tus"))
    graft.operators.Funnel
      .levels(ev, "user_id", "tus", "event_id",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"),
        windowMicros = 86400000000L) // 24 h
      .groupBy("level").agg(count(lit(1)).as("n_users"))
      .orderBy("level")
  }

  val q68Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
      |  FROM events),
      |s1 AS (
      |  SELECT *, max(CASE WHEN event_type = 'view' THEN tus END) OVER
      |    (PARTITION BY user_id ORDER BY tus, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS v_prev
      |  FROM e),
      |s2 AS (
      |  SELECT *, max(CASE WHEN event_type = 'click' THEN v_prev END) OVER
      |    (PARTITION BY user_id ORDER BY tus, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best2
      |  FROM s1),
      |pu AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS l1,
      |    max(CASE WHEN event_type = 'click'
      |          AND tus - v_prev <= 86400000000 THEN 1 ELSE 0 END) AS l2,
      |    max(CASE WHEN event_type = 'purchase'
      |          AND tus - best2 <= 86400000000 THEN 1 ELSE 0 END) AS l3
      |  FROM s2 GROUP BY user_id)
      |SELECT CASE WHEN l3 = 1 THEN 3 WHEN l2 = 1 THEN 2
      |            WHEN l1 = 1 THEN 1 ELSE 0 END AS level,
      |  count(*) AS n_users
      |FROM pu GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q69 — ClickHouse `retention(cond1, cond2, …)`: of the users who
    * signed up in week 1 of the dataset, how many came back with ANY
    * activity in week 2 / week 3 (each later flag is ANDed with the
    * anchor, exactly ClickHouse's retention semantics). One groupBy(user)
    * with conditional flags + one global fold — two shuffles total, both
    * over tiny aggregates; counts use `count(CASE…)` rather than
    * `sum(int)` so both engines emit int64 (DuckDB's sum(int) is
    * int128).
    */
  def q69Retention(spark: SparkSession, dir: String): DataFrame = {
    def in(lo: String, hi: String) =
      col("ts") >= lit(lo).cast("timestamp") && col("ts") < lit(hi).cast("timestamp")
    val perUser = events(spark, dir).groupBy("user_id").agg(
      max(when(col("event_type") === "signup" &&
        in("2024-01-01", "2024-01-08"), 1).otherwise(0)).as("c1"),
      max(when(in("2024-01-08", "2024-01-15"), 1).otherwise(0)).as("c2"),
      max(when(in("2024-01-15", "2024-01-22"), 1).otherwise(0)).as("c3"))
    perUser.agg(
      count(when(col("c1") === 1, 1)).as("cohort"),
      count(when(col("c1") === 1 && col("c2") === 1, 1)).as("retained_w1"),
      count(when(col("c1") === 1 && col("c3") === 1, 1)).as("retained_w2"),
      floor(count(when(col("c1") === 1 && col("c2") === 1, 1)) /
        count(when(col("c1") === 1, 1)) * lit(10000.0) + lit(0.5)).as("ratio_w1"),
      floor(count(when(col("c1") === 1 && col("c3") === 1, 1)) /
        count(when(col("c1") === 1, 1)) * lit(10000.0) + lit(0.5)).as("ratio_w2"))
  }

  val q69Sql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'signup'
      |          AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
      |        THEN 1 ELSE 0 END) AS c1,
      |    max(CASE WHEN ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
      |        THEN 1 ELSE 0 END) AS c2,
      |    max(CASE WHEN ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-22'
      |        THEN 1 ELSE 0 END) AS c3
      |  FROM events GROUP BY user_id)
      |SELECT
      |  count(CASE WHEN c1 = 1 THEN 1 END) AS cohort,
      |  count(CASE WHEN c1 = 1 AND c2 = 1 THEN 1 END) AS retained_w1,
      |  count(CASE WHEN c1 = 1 AND c3 = 1 THEN 1 END) AS retained_w2,
      |  CAST(floor(count(CASE WHEN c1 = 1 AND c2 = 1 THEN 1 END) /
      |    count(CASE WHEN c1 = 1 THEN 1 END) * 10000.0 + 0.5) AS BIGINT) AS ratio_w1,
      |  CAST(floor(count(CASE WHEN c1 = 1 AND c3 = 1 THEN 1 END) /
      |    count(CASE WHEN c1 = 1 THEN 1 END) * 10000.0 + 0.5) AS BIGINT) AS ratio_w2
      |FROM pu""".stripMargin

  /** Q70 — ClickHouse `-If` aggregate combinators (`countIf`, `sumIf`,
    * `avgIf`, `maxIf`): conditional aggregates folded into ONE hash
    * aggregate pass instead of per-condition filtered scans. Spark's
    * `agg(count/sum/avg/max over CASE)` partial-aggregates map-side like
    * any plain aggregate; the NULL-skipping of avg/max gives -If's
    * "ignore non-matching rows" for free (sumIf pins ELSE 0 so an empty
    * match set yields 0, ClickHouse-style, not NULL).
    */
  def q70CondAgg(spark: SparkSession, dir: String): DataFrame = {
    val big = col("value") > 100.0
    events(spark, dir).groupBy("event_type").agg(
      count(lit(1)).as("n"),
      count(when(big, 1)).as("n_big"),
      floor(sum(when(big, col("value")).otherwise(0.0)) * lit(100.0) + lit(0.5))
        .as("sum_big"),
      floor(avg(when(big, col("value"))) * lit(1000000.0) + lit(0.5)).as("avg_big"),
      floor(max(when(!big, col("value"))) * lit(1000000.0) + lit(0.5)).as("max_small"))
      .orderBy("event_type")
  }

  val q70Sql: String =
    """SELECT event_type,
      | count(*) AS n,
      | count(CASE WHEN value > 100.0 THEN 1 END) AS n_big,
      | CAST(floor(sum(CASE WHEN value > 100.0 THEN value ELSE 0 END) * 100.0 + 0.5)
      |   AS BIGINT) AS sum_big,
      | CAST(floor(avg(CASE WHEN value > 100.0 THEN value END) * 1000000.0 + 0.5)
      |   AS BIGINT) AS avg_big,
      | CAST(floor(max(CASE WHEN NOT value > 100.0 THEN value END) * 1000000.0 + 0.5)
      |   AS BIGINT) AS max_small
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q71 — ClickHouse `dictGet`: enrich the customer fact stream with
    * nation names through a [[graft.functions.Dictionary]] — a plan-
    * literal map lookup (codegen `element_at` on a constant), NOT a join:
    * zero shuffle, zero build-side, the plan over the fact table is a
    * single aggregate. Unknown keys fall back like
    * `dictGetOrDefault`. The oracle spells the same query as the join it
    * replaces.
    */
  def q71DictGet(spark: SparkSession, dir: String): DataFrame = {
    val dict = graft.functions.Dictionary.fromDataFrame(
      t(spark, dir, "nation"), "n_nationkey", "n_name")
    t(spark, dir, "customer")
      .groupBy(dict.getOrDefault(col("c_nationkey"), lit("__unknown__"))
        .as("nation_name"))
      .agg(count(lit(1)).as("n_cust"),
        floor(sum("c_acctbal") * lit(100.0) + lit(0.5)).as("sum_bal"))
      .orderBy("nation_name")
  }

  val q71Sql: String =
    """SELECT coalesce(n.n_name, '__unknown__') AS nation_name,
      | count(*) AS n_cust,
      | CAST(floor(sum(c.c_acctbal) * 100.0 + 0.5) AS BIGINT) AS sum_bal
      |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q72 — ClickHouse array-function family (`arrayMap`/`arrayFilter`/
    * `arrayReduce`/`arrayExists` ≙ Spark `transform`/`filter`/`aggregate`/
    * `exists`): per embedding vector, component stats computed inside the
    * row — no explode, no shuffle; the whole query is scan + project +
    * sort. Elements are cast float→double BEFORE arithmetic and folded
    * sequentially in array order by both engines, so per-row results are
    * bit-identical (no cross-row reduction anywhere).
    */
  def q72ArrayHof(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings").select(
      col("vec_id"),
      size(filter(col("embedding"), x => x > lit(0.0f))).as("n_pos"),
      floor(
        sqrt(aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x)) * lit(1000000.0) + lit(0.5)).as("l2"),
      floor(array_max(col("embedding")).cast("double") * lit(1000000.0) + lit(0.5))
        .as("mx"),
      exists(col("embedding"), x => x > lit(0.25)).as("has_big"))
      .orderBy("vec_id")

  val q72Sql: String =
    """SELECT vec_id,
      | len(list_filter(embedding, x -> x > 0))::INT AS n_pos,
      | CAST(floor(sqrt(list_aggregate(
      |   list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum'))
      |   * 1000000.0 + 0.5) AS BIGINT) AS l2,
      | CAST(floor(list_aggregate(embedding, 'max')::DOUBLE * 1000000.0 + 0.5)
      |   AS BIGINT) AS mx,
      | len(list_filter(embedding, x -> x > 0.25)) > 0 AS has_big
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** Q73 — ClickHouse `sumMap`: per user, the event_type → Σvalue mapping
    * as ONE value. Two-level aggregate (pair sums, then map assembly per
    * user — both partial-agg hash aggregates). The map is emitted as a
    * sorted `k:v` string with values in fixed-point cents (`bigint`), not
    * doubles, so the rendering is engine-portable (double→string
    * formatting differs between engines; int64 doesn't).
    */
  def q73SumMap(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(floor(sum("value") * lit(100.0) + lit(0.5)).as("cents"))
      .groupBy("user_id")
      .agg(
        concat_ws(",", array_sort(collect_list(
          concat(col("event_type"), lit(":"), col("cents"))))).as("value_map"),
        count(lit(1)).as("n_types"))
      .orderBy("user_id")

  val q73Sql: String =
    """WITH pairs AS (
      |  SELECT user_id, event_type,
      |    CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS cents
      |  FROM events GROUP BY user_id, event_type)
      |SELECT user_id,
      | array_to_string(list_sort(list(event_type || ':' || cents)), ',') AS value_map,
      | count(*) AS n_types
      |FROM pairs GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Q74 — ClickHouse `ORDER BY … WITH FILL`: daily event counts over
    * January 2024 with missing days materialized as zero rows. The fill
    * axis is generated with `sequence()` + explode (a few hundred rows —
    * driver-free, shuffle-free) and the observed days are left-joined
    * onto it; at 100 TB the fact side still aggregates to one row per
    * day before touching the (tiny, broadcast) calendar spine.
    */
  def q74WithFill(spark: SparkSession, dir: String): DataFrame = {
    val days = spark.range(1).select(explode(expr(
      "sequence(to_date('2024-01-01'), to_date('2024-01-31'), interval 1 day)"))
      .as("day"))
    val observed = events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    days.join(observed, Seq("day"), "left")
      .select(col("day").cast("string").as("day"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("day")
  }

  val q74Sql: String =
    """WITH spine AS (
      |  SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31',
      |    INTERVAL 1 DAY))::DATE AS day),
      |observed AS (
      |  SELECT ts::DATE AS day, count(*) AS n FROM events GROUP BY 1)
      |SELECT spine.day::VARCHAR AS day, coalesce(observed.n, 0) AS n
      |FROM spine LEFT JOIN observed USING (day)
      |ORDER BY day""".stripMargin

  /** Q75 — ClickHouse `sequenceCount('(?1)(?2)')`: per user, how many
    * non-overlapping view→click sequences occur in time order, matched by
    * ClickHouse's left-to-right scan that RESUMES after each match's end
    * (so view,view,click,click counts 1, not the max-matching 2).
    *
    * Routed through [[graft.operators.Funnel.sequenceCount]] — the lag-1
    * closed form of the scan automaton (one lag window + one aggregate;
    * see the operator scaladoc). The oracle mirrors it: over the filtered
    * view/click stream, a click fires iff the previous event is a view.
    */
  def q75SequenceCount(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(
      col("user_id"), col("event_id"), col("event_type"),
      expr("unix_micros(ts)").as("tus"))
    graft.operators.Funnel
      .sequenceCount(ev, "user_id", "tus", "event_id",
        first = col("event_type") === "view",
        second = col("event_type") === "click")
      .orderBy("user_id")
  }

  val q75Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tus,
      |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS f
      |  FROM events WHERE event_type IN ('view', 'click')),
      |lagd AS (
      |  SELECT *, lag(f) OVER (PARTITION BY user_id ORDER BY tus, event_id)
      |    AS prev_f
      |  FROM ev)
      |SELECT user_id,
      |  count(CASE WHEN f = 0 AND prev_f = 1 THEN 1 END)::BIGINT AS n_pairs
      |FROM lagd GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Q76 — ClickHouse statistical aggregates (`stddevSamp`/`varSamp`/
    * `covarSamp`/`corr`): per event type, second-moment statistics of
    * value against user_id. All four are partial-aggregable (Spark merges
    * per-partition moment sketches); results are rounded because the
    * merge order of floating moments differs between engines.
    */
  def q76StatsAgg(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).groupBy("event_type").agg(
      count(lit(1)).as("n"),
      floor(stddev_samp(col("value")) * lit(1000000.0) + lit(0.5)).as("sd"),
      floor(var_samp(col("value")) * lit(1000000.0) + lit(0.5)).as("var"),
      floor(covar_samp(col("value"), col("user_id").cast("double")) * lit(10000.0) + lit(0.5))
        .as("covar"),
      floor(corr(col("value"), col("user_id").cast("double")) * lit(1000000.0) + lit(0.5))
        .as("corr"))
      .orderBy("event_type")

  val q76Sql: String =
    """SELECT event_type, count(*) AS n,
      | CAST(floor(stddev_samp(value) * 1000000.0 + 0.5) AS BIGINT) AS sd,
      | CAST(floor(var_samp(value) * 1000000.0 + 0.5) AS BIGINT) AS "var",
      | CAST(floor(covar_samp(value, user_id::DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS covar,
      | CAST(floor(corr(value, user_id::DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS corr
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q77 — ClickHouse `quantileTDigest`-family: approximate p50/p90/p99
    * per event type via Spark's `approx_percentile` (KLL-style mergeable
    * sketch, partial-agg friendly — the only quantile shape that works at
    * 100 TB without a global sort). No SQL oracle: sketch results are
    * engine-specific; bounded against exact quantiles (q42's family) in
    * CorrectnessRegressionsSpec instead, and the driver records a
    * rows-only check (same posture as q17b).
    */
  def q77ApproxQuantiles(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).groupBy("event_type").agg(
      expr("approx_percentile(value, array(0.5, 0.9, 0.99), 10000)").as("qs"))
      .select(col("event_type"),
        round(element_at(col("qs"), 1), 2).as("p50"),
        round(element_at(col("qs"), 2), 2).as("p90"),
        round(element_at(col("qs"), 3), 2).as("p99"))
      .orderBy("event_type")

  /** Q78 — corpus-level TF-IDF with per-document top terms: tokenize →
    * per-(doc,term) tf → per-term df over the WHOLE corpus → smoothed
    * idf = ln((N+1)/(df+1)) → top-3 terms for the first 20 docs.
    *
    * Scale: tokenization explodes map-side; tf and df are hash
    * aggregates; the df side collapses to one row per distinct term
    * before joining back (never corpus-sized × corpus-sized); the final
    * top-3 is a WindowGroupLimit over 20 docs. Tokenizer (lowercase,
    * split on non-letters, length ≥ 3) is spelled identically in both
    * engines so term sets match exactly; ties in tf·idf break on term
    * asc.
    */
  def q78Tfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val nDocs = docs.select(countDistinct("doc_id")).first().getLong(0)
    // latin_tokens fuses the lowercase + regex split + length filter into
    // one codegen byte scan (bit-identical term multiset; round-17).
    val terms = docs
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.latinTokensCol(col("text")))
          .as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .withColumn("tfidf",
        floor(col("tf") * log((lit(nDocs) + 1.0) / (col("df") + 1.0))
          * lit(1000000.0) + lit(0.5)))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    scored
      .filter(col("doc_id") < 20)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"),
        col("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  val q78Sql: String =
    """WITH terms AS (
      |  SELECT doc_id, t.term FROM documents,
      |    unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
      |  WHERE len(t.term) >= 3),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
      |df AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    CAST(floor(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0))
      |      * 1000000.0 + 0.5) AS BIGINT) AS tfidf
      |  FROM tf JOIN df USING (term) CROSS JOIN n),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY tfidf DESC, term) AS rk
      |  FROM scored WHERE doc_id < 20)
      |SELECT doc_id, rk, term, tf, df, tfidf
      |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** Q80 — ClickHouse URL function family (`domain`, `topLevelDomain`,
    * `path`, `extractURLParameter`, `cutQueryString`) over a
    * deterministically constructed URL column, aggregated per domain.
    * Spark's native `parse_url` supplies HOST/PATH/QUERY-param extraction
    * (codegen'd string ops, embarrassingly parallel — one scan, one tiny
    * per-domain aggregate); the oracle mirrors each extraction with
    * regexes over the identically constructed strings.
    */
  def q80UrlFunctions(spark: SparkSession, dir: String): DataFrame = {
    val parsed = events(spark, dir)
      .select(concat(
        lit("https://sub"), (col("user_id") % 5).cast("string"),
        lit(".example.com/"), col("event_type"),
        lit("/"), col("event_id").cast("string"),
        lit("?uid="), col("user_id").cast("string"),
        lit("&page="), (col("event_id") % 7).cast("string")).as("url"))
      // domain (ClickHouse `domain()` = authority host) via codegen'd
      // substring ops: host = chars between "://" and the next "/". Spark's
      // parse_url(HOST) computes the same value but routes every row
      // through an interpreted java.net.URI parse — it was the remaining
      // per-row cost once the regexes were gone (round-7/8 verdicts), and
      // with three aggregation branches below it would run three times.
      // Equality of the two extractions on authority-style URLs is pinned
      // in CorrectnessRegressionsSpec.
      .withColumn("domain",
        substring_index(substring_index(col("url"), "://", -1), "/", 1))
      .withColumn("cut", substring_index(col("url"), "?", 1))
      .select(
        col("domain"),
        substring_index(col("domain"), ".", -1).as("tld"),
        // url = https://<domain><path>?…  → path starts at |https://| + 1
        expr("substring(cut, length(domain) + 9)").as("path"),
        substring_index(substring_index(
          substring_index(col("url"), "?", -1), "&", 1), "=", -1).as("uid"),
        col("cut"))
    // Each DISTINCT target pre-aggregates in its own branch, joined back on
    // the tiny (domain, tld) key: two count(DISTINCT) in one aggregate
    // would plan an Expand — every row tripled through the hash aggregate —
    // while each branch here map-side-collapses to its distinct values
    // before its shuffle (round-8 verdict: the Expand was q80's last CPU
    // sink). The per-(domain, tld) results are a handful of rows, so the
    // final joins broadcast.
    val byDomain = parsed.groupBy(col("domain"), col("tld"))
      .agg(count(lit(1)).as("n"), min(col("cut")).as("first_cut"))
    val paths = parsed.select(col("domain"), col("tld"), col("path")).distinct()
      .groupBy(col("domain"), col("tld")).agg(count(lit(1)).as("paths"))
    val uids = parsed.select(col("domain"), col("tld"), col("uid")).distinct()
      .groupBy(col("domain"), col("tld")).agg(count(lit(1)).as("uids"))
    byDomain
      .join(paths, Seq("domain", "tld"))
      .join(uids, Seq("domain", "tld"))
      .select(col("domain"), col("tld"), col("n"), col("paths"),
        col("uids"), col("first_cut"))
      .orderBy(col("domain"))
  }

  val q80Sql: String =
    """WITH u AS (
      |  SELECT 'https://sub' || (user_id % 5) || '.example.com/' ||
      |    event_type || '/' || event_id || '?uid=' || user_id ||
      |    '&page=' || (event_id % 7) AS url
      |  FROM events),
      |parsed AS (
      |  SELECT
      |    regexp_extract(url, '^https?://([^/]+)', 1) AS domain,
      |    regexp_extract(regexp_extract(url, '^https?://([^/]+)', 1),
      |      '([^.]+)$', 1) AS tld,
      |    regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path,
      |    regexp_extract(url, '[?&]uid=([^&]*)', 1) AS uid,
      |    split_part(url, '?', 1) AS cut
      |  FROM u)
      |SELECT domain, tld, count(*)::BIGINT AS n,
      |  count(DISTINCT path)::BIGINT AS paths,
      |  count(DISTINCT uid)::BIGINT AS uids,
      |  min(cut) AS first_cut
      |FROM parsed GROUP BY domain, tld ORDER BY domain""".stripMargin

  /** Q104 — canonical-URL (crawl-frontier) dedup: the URL-level dedup stage
    * a crawler runs BEFORE fetching — strip the query string and lowercase,
    * then collapse repeat hits of the same canonical page. Sits between
    * exact-content dedup (q35, post-fetch) and chunk dedup (q99) in a
    * pipeline. URLs are synthesized deterministically from events (session
    * params vary per hit; the page path repeats), canonicalization and the
    * per-domain rollup are pure string ops — one scan, map-side, only the
    * tiny (domain) aggregate shuffles. `first_seen` (min event_id per
    * domain's canonical set is order-free) keeps the output deterministic.
    */
  def q104UrlDedup(spark: SparkSession, dir: String): DataFrame = {
    val url = concat(
      lit("https://Sub"), (col("user_id") % 5).cast("string"),
      lit(".Example.com/"), col("event_type"),
      lit("/page"), (col("event_id") % 50).cast("string"),
      lit("?session="), col("event_id").cast("string"))
    t(spark, dir, "events")
      .select(col("event_id"), lower(substring_index(url, "?", 1)).as("curl"))
      .select(col("event_id"), col("curl"),
        substring_index(substring_index(col("curl"), "//", -1), "/", 1).as("domain"))
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("hits"),
        countDistinct(col("curl")).as("pages"),
        (count(lit(1)) - countDistinct(col("curl"))).as("dup_fetches"),
        min(col("event_id")).as("first_seen"),
        min(col("curl")).as("first_page"))
      .orderBy(col("domain"))
  }

  val q104Sql: String =
    """WITH c AS (
      |  SELECT event_id,
      |    lower(split_part('https://Sub' || (user_id % 5) || '.Example.com/' ||
      |      event_type || '/page' || (event_id % 50) ||
      |      '?session=' || event_id, '?', 1)) AS curl
      |  FROM events),
      |d AS (
      |  SELECT event_id, curl,
      |    split_part(split_part(curl, '//', 2), '/', 1) AS domain
      |  FROM c)
      |SELECT domain,
      |  count(*)::BIGINT AS hits,
      |  count(DISTINCT curl)::BIGINT AS pages,
      |  (count(*) - count(DISTINCT curl))::BIGINT AS dup_fetches,
      |  min(event_id) AS first_seen,
      |  min(curl) AS first_page
      |FROM d GROUP BY domain ORDER BY domain""".stripMargin

  /** Q81 — ClickHouse `runningDifference` (the sessionization primitive):
    * per-user inter-event time gaps via one lag window, aggregated to gap
    * statistics per user. One shuffle (hash by user) shared by the window
    * and the aggregate; integer micros end-to-end so the engines agree
    * bit-for-bit (avg is floor-rounded to a bigint).
    */
  def q81EventGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("tus"))
      .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_gaps"),
        min(col("gap")).as("min_gap"),
        max(col("gap")).as("max_gap"),
        sum(col("gap")).as("sum_gap"),
        floor(avg(col("gap")) + lit(0.5)).cast("bigint").as("avg_gap"))
      .orderBy("user_id")
  }

  val q81Sql: String =
    """WITH g AS (
      |  SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS gap
      |  FROM events)
      |SELECT user_id, count(*)::BIGINT AS n_gaps,
      |  min(gap)::BIGINT AS min_gap, max(gap)::BIGINT AS max_gap,
      |  sum(gap)::BIGINT AS sum_gap,
      |  floor(avg(gap) + 0.5)::BIGINT AS avg_gap
      |FROM g WHERE gap IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Q82 — ClickHouse `sequenceMatch('(?1)(?2)')`: per user, does at least
    * one view→click chain exist? Shares q75's lag closed form (match
    * exists iff the scan fires once); the oracle asks the same EXISTS of
    * the lag formula.
    */
  def q82SequenceMatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(
      col("user_id"), col("event_id"), col("event_type"),
      expr("unix_micros(ts)").as("tus"))
    graft.operators.Funnel
      .sequenceMatch(ev, "user_id", "tus", "event_id",
        first = col("event_type") === "view",
        second = col("event_type") === "click")
      .orderBy("user_id")
  }

  val q82Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tus,
      |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS f
      |  FROM events WHERE event_type IN ('view', 'click')),
      |lagd AS (
      |  SELECT *, lag(f) OVER (PARTITION BY user_id ORDER BY tus, event_id)
      |    AS prev_f
      |  FROM ev)
      |SELECT user_id,
      |  CASE WHEN count(CASE WHEN f = 0 AND prev_f = 1 THEN 1 END) > 0
      |    THEN 1 ELSE 0 END::INT AS matched
      |FROM lagd GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Q83 — ClickHouse `windowFunnel(…, 'strict_increase')`: the q68 funnel
    * with strictly increasing timestamps between consecutive stages (two
    * same-timestamp events never chain). Same one-shuffle DP; the chain
    * carry runs over a RANGE frame on the micros column ending at
    * time − 1 instead of the ROWS frame (see Funnel.levels scaladoc).
    */
  def q83FunnelStrict(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(
      col("user_id"), col("event_id"), col("event_type"),
      expr("unix_micros(ts)").as("tus"))
    graft.operators.Funnel
      .levels(ev, "user_id", "tus", "event_id",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"),
        windowMicros = 86400000000L, strictIncrease = true)
      .groupBy("level").agg(count(lit(1)).as("n_users"))
      .orderBy("level")
  }

  val q83Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
      |  FROM events),
      |s1 AS (
      |  SELECT *, max(CASE WHEN event_type = 'view' THEN tus END) OVER
      |    (PARTITION BY user_id ORDER BY tus
      |     RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS v_prev
      |  FROM e),
      |s2 AS (
      |  SELECT *, max(CASE WHEN event_type = 'click' THEN v_prev END) OVER
      |    (PARTITION BY user_id ORDER BY tus
      |     RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best2
      |  FROM s1),
      |pu AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS l1,
      |    max(CASE WHEN event_type = 'click'
      |          AND tus - v_prev <= 86400000000 THEN 1 ELSE 0 END) AS l2,
      |    max(CASE WHEN event_type = 'purchase'
      |          AND tus - best2 <= 86400000000 THEN 1 ELSE 0 END) AS l3
      |  FROM s2 GROUP BY user_id)
      |SELECT CASE WHEN l3 = 1 THEN 3 WHEN l2 = 1 THEN 2
      |            WHEN l1 = 1 THEN 1 ELSE 0 END AS level,
      |  count(*) AS n_users
      |FROM pu GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q84 — ClickHouse `ORDER BY … WITH FILL INTERPOLATE (u AS u)`: the q74
    * daily spine, but gap days CARRY FORWARD the last observed value
    * instead of zero-filling. Portable closed form (no IGNORE NULLS
    * dialect): the carry source day is `max(day-if-observed)` over the
    * running window (max skips NULLs by definition), then one join back
    * fetches its value; days before the first observation stay 0 with
    * filled = 1. Spine-sized frames (31 rows) — the window and joins are
    * driver-trivial at any corpus scale because the aggregate collapses
    * first.
    */
  def q84WithFillInterpolate(spark: SparkSession, dir: String): DataFrame = {
    val days = spark.range(1).select(explode(expr(
      "sequence(to_date('2024-01-01'), to_date('2024-01-31'), interval 1 day)"))
      .as("day"))
    val observed = events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("u"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(observed, Seq("day"), "left")
      .withColumn("src_day", max(when(col("u").isNotNull, col("day"))).over(w))
      .select(col("day"), col("src_day"), col("u").isNull.cast("int").as("filled"))
      .join(observed.select(col("day").as("src_day"), col("u")), Seq("src_day"), "left")
      .select(col("day").cast("string").as("day"),
        coalesce(col("u"), lit(0L)).as("u"), col("filled"))
      .orderBy("day")
  }

  val q84Sql: String =
    """WITH spine AS (
      |  SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31',
      |    INTERVAL 1 DAY))::DATE AS day),
      |observed AS (
      |  SELECT ts::DATE AS day, count(DISTINCT user_id) AS u
      |  FROM events GROUP BY 1),
      |joined AS (
      |  SELECT spine.day, observed.u,
      |    max(CASE WHEN observed.u IS NOT NULL THEN spine.day END) OVER
      |      (ORDER BY spine.day
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS src_day,
      |    (observed.u IS NULL)::INT AS filled
      |  FROM spine LEFT JOIN observed USING (day))
      |SELECT joined.day::VARCHAR AS day,
      |  coalesce(o2.u, 0)::BIGINT AS u, joined.filled
      |FROM joined LEFT JOIN observed o2 ON o2.day = joined.src_day
      |ORDER BY day""".stripMargin

  /** Q86 — GROUP BY GROUPING SETS with `grouping()` markers: the explicit
    * form completing the rollup (q21) / cube (q50) family — exactly the
    * requested aggregation levels ((status, priority), (status), ()) in
    * one pass over the scan (Spark expands to a single Expand + hash
    * aggregate, not three scans), with grouping() distinguishing a real
    * NULL from an aggregated-out column.
    */
  def q86GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val v = s"graft_q86_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    t(spark, dir, "orders").createOrReplaceTempView(v)
    try spark.sql(
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS st,
         |  coalesce(o_orderpriority, 'ALL') AS pri,
         |  cast(grouping(o_orderstatus) AS int) AS g_st,
         |  cast(grouping(o_orderpriority) AS int) AS g_pri,
         |  count(*) AS cnt
         |FROM $v
         |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
         |  (o_orderstatus), ())
         |ORDER BY st, pri""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q86Sql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS st,
      |  coalesce(o_orderpriority, 'ALL') AS pri,
      |  grouping(o_orderstatus)::INT AS g_st,
      |  grouping(o_orderpriority)::INT AS g_pri,
      |  count(*) AS cnt
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |  (o_orderstatus), ())
      |ORDER BY st, pri""".stripMargin

  /** Q87 — ranking-family windows beyond q15's rank/dense_rank: `ntile`
    * (equi-depth bucketing), `percent_rank`, `cume_dist` per customer
    * segment by account balance. The divisions are exact IEEE doubles of
    * small integers, so both engines agree bitwise; one hash-by-segment
    * shuffle for all three functions.
    */
  def q87RankingFamily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(spark, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"),
        // DuckDB ntile returns BIGINT, Spark's returns INT — align widths
        // on the Spark side (same both-sides-cast rule as q61 row_number).
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  val q87Sql: String =
    """SELECT c_mktsegment, c_custkey,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment
      |  ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  /** Q88 — ClickHouse `uniqUpTo(8)(x)`: exact distinct while ≤ 8, the
    * saturation sentinel 9 beyond — in bounded state (each partial ships
    * at most 9 values however large the true cardinality; see
    * UniqUpToAggregator). One column stays under the cap, one saturates,
    * so both regimes are oracle-pinned; the oracle is the unbounded
    * `least(count(DISTINCT …), 9)` equivalent.
    */
  def q88UniqUpTo(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    events(spark, dir).groupBy("event_type").agg(
      expr("uniq_up_to_8(cast(user_id % 6 as string))").as("u_small"),
      expr("uniq_up_to_8(cast(user_id as string))").as("u_sat"))
      .orderBy("event_type")
  }

  val q88Sql: String =
    """SELECT event_type,
      |  least(count(DISTINCT user_id % 6), 9)::BIGINT AS u_small,
      |  least(count(DISTINCT user_id), 9)::BIGINT AS u_sat
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Q89 — ClickHouse bit aggregates (`groupBitAnd`/`groupBitOr`/
    * `groupBitXor`): per order-priority AND/OR/XOR folds over order keys —
    * associative+commutative, so Spark partial-aggregates them map-side
    * like any algebraic aggregate; exact integers, no rounding concerns.
    */
  def q89BitAggregates(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        bit_and(col("o_orderkey")).as("k_and"),
        bit_or(col("o_orderkey")).as("k_or"),
        bit_xor(col("o_orderkey")).as("k_xor"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  val q89Sql: String =
    """SELECT o_orderpriority,
      |  bit_and(o_orderkey) AS k_and,
      |  bit_or(o_orderkey) AS k_or,
      |  bit_xor(o_orderkey) AS k_xor,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q90 — ClickHouse `entropy(x)`: Shannon entropy (bits) of the
    * event-type distribution per user bucket. Built from two hash
    * aggregates (per-(bucket,type) counts → per-bucket −Σ p·log2 p) —
    * the same partial-aggregable shape DuckDB's native entropy() uses;
    * rounded to 6 dp because the Σ over doubles is reduction-order
    * sensitive in the last ulp.
    */
  def q90Entropy(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select((col("user_id") % 10).as("bucket"), col("event_type"))
      .groupBy("bucket", "event_type").agg(count(lit(1)).as("c"))
      .groupBy("bucket")
      .agg(floor(
        (-sum(col("c") * log2(col("c"))).cast("double") / sum(col("c")) +
          log2(sum(col("c")))) * lit(1000000.0) + lit(0.5)).as("h"))
      .orderBy("bucket")

  val q90Sql: String =
    """WITH c AS (
      |  SELECT user_id % 10 AS bucket, event_type, count(*) AS c
      |  FROM events GROUP BY 1, 2)
      |SELECT bucket,
      |  CAST(floor((-sum(c * log2(c)) / sum(c) + log2(sum(c)))
      |    * 1000000.0 + 0.5) AS BIGINT) AS h
      |FROM c GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Q100 — ClickHouse `histogram` (fixed-width flavor): per-event-type
    * value histograms with width-50 buckets, each bucket carrying its count
    * and exact mass. bucket = floor(value/50) is one IEEE double divide +
    * floor — bit-identical across engines; the per-bucket mass is summed in
    * fixed-point CENTS (the source values are 2-dp) because cross-row
    * double summation order is engine-specific (the q51 lesson) while int64
    * sums are exact. Map-side partial aggregation; output is |types|×|buckets|
    * rows however large the fact table.
    */
  def q100Histogram(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        floor(col("value") / lit(50.0)).cast("long").as("bucket"),
        expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("event_type"), col("bucket"))

  val q100Sql: String =
    """SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bucket,
      |  count(*) AS n,
      |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q149 — q74's daily gap fill, THROUGH THE PARSER over a DATE column:
    * `ORDER BY day WITH FILL FROM '2024-01-01' TO '2024-02-01'` (TO
    * exclusive) zero-fills January's missing days; observed days OUTSIDE
    * the window survive (WITH FILL keeps off-grid originals, where q74's
    * spine join deliberately drops them — both shapes exist for a
    * reason). day rendered as string for cross-engine hash stability.
    */
  def q149DateWithFill(spark: SparkSession, dir: String): DataFrame = {
    val v = s"graft_q149_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .createOrReplaceTempView(v)
    try spark.sql(
        s"SELECT day, n FROM $v " +
          "ORDER BY day WITH FILL FROM '2024-01-01' TO '2024-02-01'")
      .select(col("day").cast("string").as("day"), col("n"))
      .orderBy(col("day"))
    finally spark.catalog.dropTempView(v)
  }

  val q149Sql: String =
    """WITH obs AS (SELECT ts::DATE AS day, count(*) AS n FROM events GROUP BY 1),
      |grid AS (SELECT unnest(generate_series(DATE '2024-01-01',
      |  DATE '2024-01-31', INTERVAL 1 DAY))::DATE AS day),
      |miss AS (SELECT day FROM grid WHERE day NOT IN (SELECT day FROM obs))
      |SELECT CAST(day AS VARCHAR) AS day, n FROM obs
      |UNION ALL SELECT CAST(day AS VARCHAR) AS day, 0 AS n FROM miss
      |ORDER BY day""".stripMargin

  /** Q152 — `WITH FILL … INTERPOLATE (c AS expr)` (the EXPRESSION form,
    * next to q146's plain carry): filled days take `sv + 7` EVALUATED
    * OVER THE CARRIED ROW — the last real day's reading plus a drift
    * constant — while `n` stays type-default 0. Oracle: DuckDB computes
    * the same carry (`last_value IGNORE NULLS`) and applies the same
    * arithmetic on fill rows only.
    */
  def q152InterpolateExpr(spark: SparkSession, dir: String): DataFrame = {
    val v = s"graft_q152_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // odd days only — STRUCTURAL gaps (every even day is a fill row at
    // every scale factor, so the interpolation path is really under oracle)
    events(spark, dir)
      .where(dayofmonth(to_date(col("ts"))) % 2 === 1)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        floor(sum(col("value")) * lit(100.0) + lit(0.5)).cast("long").as("sv"))
      .createOrReplaceTempView(v)
    try spark.sql(
        s"SELECT day, n, sv FROM $v " +
          "ORDER BY day WITH FILL FROM '2024-01-01' TO '2024-02-01' " +
          "INTERPOLATE (sv AS sv + 7)")
      .select(col("day").cast("string").as("day"), col("n"), col("sv"))
      .orderBy(col("day"))
    finally spark.catalog.dropTempView(v)
  }

  val q152Sql: String =
    """WITH obs AS (SELECT ts::DATE AS day, count(*) AS n,
      |  CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS sv
      |  FROM events
      |  WHERE date_part('day', ts::DATE) % 2 = 1 GROUP BY 1),
      |grid AS (SELECT unnest(generate_series(DATE '2024-01-01',
      |  DATE '2024-01-31', INTERVAL 1 DAY))::DATE AS day),
      |j AS (SELECT g.day, n, sv FROM grid g LEFT JOIN obs USING (day)),
      |c AS (SELECT day, n, sv,
      |  last_value(sv IGNORE NULLS) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry
      |  FROM j)
      |SELECT CAST(day AS VARCHAR) AS day, coalesce(n, 0) AS n,
      |  coalesce(sv, carry + 7, 0) AS sv
      |FROM c ORDER BY day""".stripMargin

  /** Q155 — DESC `WITH FILL` (round 16): ClickHouse's descending fill —
    * `ORDER BY day DESC WITH FILL FROM '2024-01-31' TO '2023-12-31'`
    * (FROM above TO, default step −1 day) emits the newest-first daily
    * readout with gaps filled, the shape a monitoring "last 31 days"
    * panel reads. Odd days only (q152's structural-gap discipline), so
    * half the grid is really filled at every scale factor. Oracle: the
    * same grid in DuckDB, ordered descending.
    */
  def q155DescFill(spark: SparkSession, dir: String): DataFrame = {
    val v = s"graft_q155_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    events(spark, dir)
      .where(dayofmonth(to_date(col("ts"))) % 2 === 1)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .createOrReplaceTempView(v)
    try spark.sql(
        s"SELECT day, n FROM $v " +
          "ORDER BY day DESC WITH FILL FROM '2024-01-31' TO '2023-12-31'")
      .select(col("day").cast("string").as("day"), col("n"))
    finally spark.catalog.dropTempView(v)
  }

  val q155Sql: String =
    """WITH obs AS (SELECT ts::DATE AS day, count(*) AS n FROM events
      |  WHERE date_part('day', ts::DATE) % 2 = 1 GROUP BY 1),
      |grid AS (SELECT unnest(generate_series(DATE '2024-01-01',
      |  DATE '2024-01-31', INTERVAL 1 DAY))::DATE AS day)
      |SELECT CAST(g.day AS VARCHAR) AS day, coalesce(n, 0) AS n
      |FROM grid g LEFT JOIN obs USING (day)
      |ORDER BY g.day DESC""".stripMargin

  /** Q157 — ClickHouse `ARRAY JOIN` (round 16; parser): per-element row
    * expansion — token frequencies over exploded `split(text)` arrays,
    * the clause ClickHouse uses where Spark says LATERAL VIEW explode.
    * `ARRAY JOIN toks AS tok` keeps the array and rides the element
    * alongside; the aggregate is deterministic (count DESC, token
    * tiebreak). Oracle: DuckDB unnest(string_split(…)) — identical
    * split semantics including empty fields.
    */
  def q157ArrayJoin(spark: SparkSession, dir: String): DataFrame = {
    val v = s"graft_q157_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") < 50)
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .createOrReplaceTempView(v)
    try spark.sql(
        s"""SELECT tok, count(*) AS n FROM $v ARRAY JOIN toks AS tok
           |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q157Sql: String =
    """SELECT tok, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS tok
      |      FROM documents WHERE doc_id < 50) u
      |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin

  /** Q158 — ClickHouse FUNCTION-NAME aliases under oracle (round 16): a
    * pasted ClickHouse aggregate using the conversion (`toDate`,
    * `toInt64`), date-part (`toYear`, `toMonth`, `toStartOfMonth`) and
    * -If-combinator (`countIf`, `sumIf`, `maxIf`) families runs
    * unchanged — each alias is a pure Catalyst composition (Cast, Year,
    * TruncDate, Sum(If(…))), codegen'd. Oracle: DuckDB's native
    * spellings (year/month/date_trunc/FILTER).
    */
  def q158ChFunctions(spark: SparkSession, dir: String): DataFrame = {
    val v = s"graft_q158_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    events(spark, dir).createOrReplaceTempView(v)
    try spark.sql(
        s"""SELECT toYear(ts) AS y, toMonth(ts) AS m,
           | CAST(toStartOfMonth(toDate(ts)) AS STRING) AS mon,
           | countIf(value > 0.5) AS hi,
           | CAST(floor(coalesce(sumIf(value, user_id % 3 = 0), 0) * 100.0 + 0.5)
           |   AS BIGINT) AS sv100,
           | toInt64(coalesce(maxIf(event_id, user_id % 2 = 0), -1)) AS max_even_ev,
           | count(*) AS n
           |FROM $v GROUP BY 1, 2, 3 ORDER BY y, m""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q158Sql: String =
    """SELECT year(ts) AS y, month(ts) AS m,
      | CAST(date_trunc('month', ts::DATE)::DATE AS VARCHAR) AS mon,
      | count(*) FILTER (WHERE value > 0.5) AS hi,
      | CAST(floor(coalesce(sum(value) FILTER (WHERE user_id % 3 = 0), 0)
      |   * 100.0 + 0.5) AS BIGINT) AS sv100,
      | CAST(coalesce(max(event_id) FILTER (WHERE user_id % 2 = 0), -1)
      |   AS BIGINT) AS max_even_ev,
      | count(*) AS n
      |FROM events GROUP BY 1, 2, 3 ORDER BY y, m""".stripMargin

  /** Q153 — MULTI-column `WITH FILL` (the cross-product grid): a sparse
    * (day, bucket) aggregate fills the full DATE-range × bucket-range
    * frame — ClickHouse's per-sort-key fill grammar, the dense matrix a
    * per-segment time-series readout wants. The WHERE pins every original
    * tuple onto the grid, so the output is exactly the 10×5 frame.
    * Oracle: DuckDB cross-joins the two ranges and left-joins the
    * observations.
    */
  def q153MultiFill(spark: SparkSession, dir: String): DataFrame = {
    val v = s"graft_q153_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // checkerboard: only (day + bk)-even cells keep data — STRUCTURAL
    // gaps, so half the grid is fill rows at every scale factor
    events(spark, dir)
      .where(to_date(col("ts")) < lit("2024-01-11"))
      .groupBy(to_date(col("ts")).as("day"), (col("user_id") % 5).as("bk"))
      .agg(count(lit(1)).as("n"))
      .where((dayofmonth(col("day")) + col("bk")) % 2 === 0)
      .createOrReplaceTempView(v)
    try {
      val out = spark.sql(
          s"SELECT day, bk, n FROM $v " +
            "ORDER BY day WITH FILL FROM '2024-01-01' TO '2024-01-11', " +
            "bk WITH FILL FROM 0 TO 5")
        .select(col("day").cast("string").as("day"), col("bk"), col("n"))
        .orderBy(col("day"), col("bk"))
      // Materialize the 50-row grid ONCE and self-enforce on the collected
      // rows — the old count() + lazy return ran the fill twice per
      // invocation (round-16 optimization).
      val rows = java.util.Arrays.asList(out.collect(): _*)
      require(rows.size == 50,
        s"q153: the 10x5 cross-product grid must land, got ${rows.size}")
      spark.createDataFrame(rows, out.schema)
    } finally spark.catalog.dropTempView(v)
  }

  val q153Sql: String =
    """WITH obs AS (
      |  SELECT ts::DATE AS day, user_id % 5 AS bk, count(*) AS n
      |  FROM events
      |  WHERE ts::DATE < DATE '2024-01-11'
      |  GROUP BY 1, 2
      |  HAVING (date_part('day', day) + bk) % 2 = 0),
      |days AS (SELECT unnest(generate_series(DATE '2024-01-01',
      |  DATE '2024-01-10', INTERVAL 1 DAY))::DATE AS day),
      |bks AS (SELECT range AS bk FROM range(0, 5)),
      |grid AS (SELECT day, bk FROM days CROSS JOIN bks)
      |SELECT CAST(g.day AS VARCHAR) AS day, g.bk AS bk, coalesce(n, 0) AS n
      |FROM grid g LEFT JOIN obs ON g.day = obs.day AND g.bk = obs.bk
      |ORDER BY g.day, g.bk""".stripMargin

  /** Q159 — ClickHouse AGGREGATE-NAME aliases under oracle (round 16,
    * second family): argMax/argMin (→ max_by/min_by), uniqExact (the
    * builder-level count-DISTINCT), groupUniqArray (→ collect_set), and
    * avgWeighted/stddevPop — each a pure alias over Spark's aggregate
    * machinery. Each multi-column uniqExact runs in its own subaggregate
    * (see the note in the body: one combined SELECT triggers the
    * multi-distinct Expand plan). Determinism: the arg ordering key
    * (l_orderkey*10+l_linenumber) is UNIQUE, so argMax/argMin are
    * single-valued; the array face is sorted then stringified (array
    * dtype round-trips differ between engines, strings don't).
    */
  def q159AggNames(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val v = s"graft_q159_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    t(spark, dir, "lineitem").createOrReplaceTempView(v)
    // One statement, but the two multi-column uniqExacts live in their OWN
    // subaggregates joined back on the 4-row group key: spelling all three
    // in one SELECT makes Spark plan the multi-distinct Expand(×3) whose
    // partial aggregate keys on (flag, partkey, suppkey, linestatus, gid)
    // — ~600k distinct keys carrying max_by/collect_set/stddev buffers, an
    // ObjectHashAggregate that falls back to sort-based past its key
    // threshold and sorts 1.8M wide rows (measured 4.5–5.4 s at sf0.1;
    // plans/r16/q159_agg_names_before.txt). Split, each distinct is the
    // Expand-free two-level hash aggregate and the alias surface under
    // test is unchanged. Same values, same oracle (guide §2.4: remove the
    // accidental exchange shape, not the computation).
    try spark.sql(
        s"""SELECT m.l_returnflag,
           | m.last_price, m.first_price, p.parts, s.supp_status,
           | m.statuses, m.aw100, m.sd6
           |FROM (
           |  SELECT l_returnflag,
           |   argMax(l_extendedprice,
           |     (l_orderkey * 10 + l_linenumber) * 1000000.0 + l_extendedprice)
           |     AS last_price,
           |   argMin(l_extendedprice,
           |     (l_orderkey * 10 + l_linenumber) * 1000000.0 + l_extendedprice)
           |     AS first_price,
           |   array_join(sort_array(groupUniqArray(l_linestatus)), ',') AS statuses,
           |   CAST(floor(avgWeighted(l_extendedprice, l_quantity) * 100.0 + 0.5)
           |     AS BIGINT) AS aw100,
           |   CAST(floor(stddevPop(l_quantity) * 1000000.0 + 0.5) AS BIGINT) AS sd6
           |  FROM $v GROUP BY l_returnflag) m
           |JOIN (
           |  SELECT l_returnflag, uniqExact(l_partkey) AS parts
           |  FROM $v GROUP BY l_returnflag) p ON m.l_returnflag = p.l_returnflag
           |JOIN (
           |  SELECT l_returnflag, uniqExact(l_suppkey, l_linestatus) AS supp_status
           |  FROM $v GROUP BY l_returnflag) s ON m.l_returnflag = s.l_returnflag
           |ORDER BY m.l_returnflag""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q159Sql: String =
    """SELECT l_returnflag,
      | arg_max(l_extendedprice,
      |   (l_orderkey * 10 + l_linenumber) * 1000000.0 + l_extendedprice)
      |   AS last_price,
      | arg_min(l_extendedprice,
      |   (l_orderkey * 10 + l_linenumber) * 1000000.0 + l_extendedprice)
      |   AS first_price,
      | count(DISTINCT l_partkey) AS parts,
      | count(DISTINCT (l_suppkey, l_linestatus)) AS supp_status,
      | array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
      | CAST(floor(sum(l_extendedprice * l_quantity) / sum(l_quantity) * 100.0
      |   + 0.5) AS BIGINT) AS aw100,
      | CAST(floor(stddev_pop(l_quantity) * 1000000.0 + 0.5) AS BIGINT) AS sd6
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Q160 — ClickHouse PARAMETRIC aggregate syntax under oracle:
    * `quantile(0.5)(x)`, `quantiles(…)(x)`, `topK(3)(x)`, `uniqUpTo(n)(x)`
    * — the `f(params)(args)` call shape Spark's grammar cannot parse,
    * rewritten by GraftSqlParser.rewriteParametrics to flat calls over
    * percentile / the SpaceSaving and bounded-distinct UDAFs. Quantiles
    * run over l_quantity (integral values) at dyadic levels (.25/.5/.75),
    * so the interpolated doubles are EXACT in both engines and
    * hash-comparable without rounding. topK is exact here (3 distinct
    * values, nothing evicts) with the deterministic (cnt desc, term asc)
    * order; uniqUpTo is pinned below (2 distinct ≤ 4) and at saturation.
    */
  def q160Parametric(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val v = s"graft_q160_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    t(spark, dir, "lineitem").createOrReplaceTempView(v)
    try spark.sql(
        s"""SELECT
           | quantile(0.5)(l_quantity) AS p50,
           | array_join(transform(quantiles(0.25, 0.75)(l_quantity),
           |   e -> CAST(e AS STRING)), ',') AS p25_75,
           | array_join(topK(3)(l_returnflag), ',') AS top_flags,
           | uniqUpTo(4)(l_linestatus) AS u_small,
           | uniqUpTo(10)(CAST(l_partkey % 40 AS STRING)) AS u_sat
           |FROM $v""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q160Sql: String =
    """SELECT
      | quantile_cont(l_quantity, 0.5) AS p50,
      | array_to_string(quantile_cont(l_quantity, [0.25, 0.75]), ',') AS p25_75,
      | array_to_string((SELECT list(rf ORDER BY c DESC, rf)[1:3]
      |   FROM (SELECT l_returnflag rf, count(*) c FROM lineitem GROUP BY 1)),
      |   ',') AS top_flags,
      | least(count(DISTINCT l_linestatus), 5) AS u_small,
      | least(count(DISTINCT CAST(l_partkey % 40 AS VARCHAR)), 11) AS u_sat
      |FROM lineitem""".stripMargin

  /** Q161 — higher-order array functions in ClickHouse's LAMBDA-FIRST
    * order under oracle: arrayMap/arrayFilter/arraySum/arraySort over
    * per-order quantity arrays. The builders swap arguments into Spark's
    * own HigherOrderFunction expressions (transform/filter/aggregate),
    * so the plan is identical to the Spark spelling — codegen'd lambda
    * evaluation, no UDFs. Arrays are stringified for the compare (dtype
    * round-trips differ between engines); sums of integral-valued
    * doubles are exact.
    */
  def q161ArrayHofCh(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val v = s"graft_q161_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    t(spark, dir, "lineitem").where(col("l_orderkey") < 200)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_quantity"))).as("q"))
      .createOrReplaceTempView(v)
    try spark.sql(
        s"""SELECT l_orderkey,
           | array_join(arrayMap(x -> x * 2, q), ',') AS doubled,
           | array_join(arrayFilter(x -> x > 25, q), ',') AS big,
           | CAST(arraySum(q) AS BIGINT) AS total,
           | arrayCount(x -> x >= 10, q) AS n10,
           | array_join(arrayReverseSort(q), ',') AS rev
           |FROM $v ORDER BY l_orderkey""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q161Sql: String =
    """WITH arrs AS (
      |  SELECT l_orderkey, list_sort(list(l_quantity)) AS q
      |  FROM lineitem WHERE l_orderkey < 200 GROUP BY l_orderkey)
      |SELECT l_orderkey,
      | array_to_string(list_transform(q, x -> x * 2), ',') AS doubled,
      | coalesce(array_to_string(list_filter(q, x -> x > 25), ','), '') AS big,
      | CAST(list_sum(q) AS BIGINT) AS total,
      | length(list_filter(q, x -> x >= 10)) AS n10,
      | array_to_string(list_reverse_sort(q), ',') AS rev
      |FROM arrs ORDER BY l_orderkey""".stripMargin

  /** Q162 — ClickHouse string/arithmetic/date-name families under oracle:
    * positionUTF8, replaceOne (locate+overlay — first occurrence only),
    * leftPad, multiIf, intDiv, toYYYYMM, addDays, the quoted-unit
    * dateDiff('day', …) (normalized by rewriteDateDiffUnit into Spark's
    * own grammar form), and formatDateTime's %-token translation. All
    * codegen'd built-in compositions.
    */
  def q162ChScalars(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val v = s"graft_q162_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    t(spark, dir, "orders").where(col("o_orderkey") < 500)
      .createOrReplaceTempView(v)
    try spark.sql(
        s"""SELECT o_orderkey,
           | positionUTF8(o_orderpriority, '-') AS dash_at,
           | replaceOne(o_orderpriority, '-', '_') AS pri_u,
           | leftPad(CAST(o_orderkey AS STRING), 8, '0') AS key8,
           | multiIf(o_totalprice > 200000, 'high',
           |         o_totalprice > 100000, 'mid', 'low') AS bucket,
           | intDiv(o_orderkey, 7) AS k7,
           | toYYYYMM(o_orderdate) AS ym,
           | CAST(addDays(toDate(o_orderdate), 30) AS STRING) AS due,
           | dateDiff('day', toDate(o_orderdate), DATE '2025-01-01') AS days_left,
           | formatDateTime(o_orderdate, '%Y/%m/%d') AS ymd
           |FROM $v ORDER BY o_orderkey""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q162Sql: String =
    """SELECT o_orderkey,
      | strpos(o_orderpriority, '-') AS dash_at,
      | CASE WHEN strpos(o_orderpriority, '-') = 0 THEN o_orderpriority
      |   ELSE substr(o_orderpriority, 1, strpos(o_orderpriority, '-') - 1)
      |     || '_' || substr(o_orderpriority, strpos(o_orderpriority, '-') + 1)
      | END AS pri_u,
      | lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS key8,
      | CASE WHEN o_totalprice > 200000 THEN 'high'
      |      WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS bucket,
      | o_orderkey // 7 AS k7,
      | year(o_orderdate) * 100 + month(o_orderdate) AS ym,
      | CAST((o_orderdate::DATE + INTERVAL 30 DAY)::DATE AS VARCHAR) AS due,
      | date_diff('day', o_orderdate::DATE, DATE '2025-01-01') AS days_left,
      | strftime(o_orderdate, '%Y/%m/%d') AS ymd
      |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin

  /** Q164 — ClickHouse `ASOF JOIN` through the SQL face (round 16): each
    * event joined to the same customer's latest order at or before the
    * event time — q39's operator, but spelled as ClickHouse spells it
    * (`FROM e ASOF JOIN o ON e.k = o.k AND o.t <= e.ts`) and planned by
    * extractAsof's marker splice (eq-join + per-left-row top-1 window).
    * The projected column is the DATE (not the order key), so ties on
    * o_orderdate are value-deterministic. Oracle: DuckDB's explicit
    * row_number formulation.
    */
  def q164AsofSql(spark: SparkSession, dir: String): DataFrame = {
    val v = s"graft_q164_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val vo = s"${v}_o"
    events(spark, dir).createOrReplaceTempView(v)
    t(spark, dir, "orders").createOrReplaceTempView(vo)
    try spark.sql(
        s"""SELECT e.event_id, e.user_id,
           |  CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS od
           |FROM $v e ASOF JOIN $vo o
           |  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
           |ORDER BY e.event_id""".stripMargin)
    finally { spark.catalog.dropTempView(v); spark.catalog.dropTempView(vo) }
  }

  val q164Sql: String =
    """SELECT event_id, user_id, CAST(od::DATE AS VARCHAR) AS od FROM (
      |  SELECT e.event_id, e.user_id, o.o_orderdate AS od,
      |    row_number() OVER (PARTITION BY e.event_id
      |      ORDER BY o.o_orderdate DESC) AS rn
      |  FROM events e JOIN orders o
      |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) sub
      |WHERE rn = 1 ORDER BY event_id""".stripMargin

  /** Q165 — `ORDER BY … LIMIT n WITH TIES` (round 16): the first n rows
    * plus the n-th row's whole tie group, as `rank() <= n` over the
    * statement's ORDER BY. Projecting exactly the ordered columns makes
    * every tie row identical, so the result is hash-deterministic while
    * the TIES semantics still shows (the result is far larger than n).
    */
  def q165LimitWithTies(spark: SparkSession, dir: String): DataFrame = {
    val v = s"graft_q165_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    t(spark, dir, "lineitem").createOrReplaceTempView(v)
    try spark.sql(
        s"""SELECT l_returnflag, l_linestatus FROM $v
           |ORDER BY l_returnflag, l_linestatus LIMIT 100 WITH TIES""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q165Sql: String =
    """SELECT l_returnflag, l_linestatus FROM (
      |  SELECT l_returnflag, l_linestatus,
      |    rank() OVER (ORDER BY l_returnflag, l_linestatus) AS rk
      |  FROM lineitem) sub
      |WHERE rk <= 100 ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q166 — the JSON/bit/split/regexp name families under oracle (round
    * 16, third wave): JSONExtractInt over the events props JSON (ClickHouse
    * returns 0 on absence — the coalesce is part of the alias), bitwise
    * names, splitByString, countMatches — DuckDB spells the same
    * computations natively (json_extract, &, <<, string_split, regexp).
    */
  def q166JsonBit(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val v = s"graft_q166_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    events(spark, dir).where(col("event_id") < 500).createOrReplaceTempView(v)
    try spark.sql(
        s"""SELECT event_id,
           |  JSONExtractInt(props, 'k') AS k,
           |  JSONExtractInt(props, 'missing') AS k0,
           |  JSONHas(props, 'k') AS hk,
           |  bitAnd(user_id, 255) AS low8,
           |  bitShiftLeft(bitAnd(user_id, 7), 2) AS sh,
           |  bitXor(user_id, event_id) AS bx,
           |  size(splitByString('-', event_type)) AS segs,
           |  countMatches(props, '[0-9]+') AS digits
           |FROM $v ORDER BY event_id""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q166Sql: String =
    """SELECT event_id,
      |  coalesce(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k,
      |  coalesce(TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT),
      |           0) AS k0,
      |  json_extract_string(props, '$.k') IS NOT NULL AS hk,
      |  user_id & 255 AS low8,
      |  (user_id & 7) << 2 AS sh,
      |  xor(user_id, event_id) AS bx,
      |  len(string_split(event_type, '-')) AS segs,
      |  len(regexp_extract_all(props, '[0-9]+')) AS digits
      |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin

  /** Q167 — `numbers()` table function + `arrayJoin()` in function
    * position (round 16): ClickHouse's integer-sequence TVF (both arities,
    * through the parser's range() rewrite) feeding arrayJoin's per-element
    * row expansion (the registered explode alias). The join of the two
    * forms exercises the implicit `numbers` alias and a user alias at
    * once. DuckDB spells the same with range() and unnest().
    */
  def q167NumbersArrayJoin(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    spark.sql(
      """SELECT numbers.number, m.number AS off,
        |  arrayJoin(sequence(0L, numbers.number % 3)) AS x
        |FROM numbers(20) JOIN numbers(100, 20) m
        |  ON m.number = numbers.number + 100
        |ORDER BY number, off, x""".stripMargin)
  }

  val q167Sql: String =
    """SELECT n.number, m.number AS off,
      |  unnest(generate_series(0, n.number % 3)) AS x
      |FROM (SELECT CAST(range AS BIGINT) AS number FROM range(0, 20)) n
      |JOIN (SELECT CAST(range AS BIGINT) AS number FROM range(100, 120)) m
      |  ON m.number = n.number + 100
      |ORDER BY n.number, off, x""".stripMargin

  /** Q168 — `SELECT DISTINCT ON (cols) …` (round 16): ClickHouse's
    * first-row-per-group clause, folded by the parser onto LIMIT 1 BY
    * (ClickHouse's own documented equivalence) with the trailing plain
    * LIMIT applied after the fold (ClickHouse's clause order). The ORDER
    * BY makes the pick deterministic — the engine refuses the clause
    * without one. DuckDB spells DISTINCT ON natively.
    */
  def q168DistinctOn(spark: SparkSession, dir: String): DataFrame = {
    val v = s"graft_q168_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    t(spark, dir, "lineitem").createOrReplaceTempView(v)
    try spark.sql(
        s"""SELECT DISTINCT ON (l_orderkey) l_orderkey, l_linenumber, l_quantity
           |FROM $v
           |ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q168Sql: String =
    """SELECT DISTINCT ON (l_orderkey) l_orderkey, l_linenumber, l_quantity
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin

  /** Q169 — ClickHouse's select-list star machinery (round 16):
    * `* REPLACE (expr AS col)` substitutes IN PLACE inside a subquery, and
    * `COLUMNS('regex')` (partial-match, ClickHouse's re2 posture) selects
    * from the replaced expansion — the two modifiers composing through one
    * statement. The oracle spells the expanded columns explicitly (DuckDB's
    * COLUMNS/EXCLUDE grammar differs; the semantics is what's pinned).
    */
  def q169StarModifiers(spark: SparkSession, dir: String): DataFrame = {
    val v = s"graft_q169_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    t(spark, dir, "lineitem").createOrReplaceTempView(v)
    try spark.sql(
        s"""SELECT COLUMNS('^l_(orderkey|linenumber)$$'), l_extendedprice
           |FROM (SELECT * REPLACE (
           |        l_extendedprice * (1 - l_discount) AS l_extendedprice)
           |      FROM $v)
           |WHERE l_orderkey < 1000
           |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q169Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1 - l_discount) AS l_extendedprice
      |FROM lineitem WHERE l_orderkey < 1000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Q170 — ClickHouse expression-alias `WITH` macros (round 16): a
    * constant (`24 AS qty_cap`), a per-row expression (`net`, used inside
    * an aggregate), and a scalar subquery (`avg_qty`, used in WHERE
    * arithmetic) — all three macro shapes in one statement, substituted
    * at their use sites by the parser. Sums in integer cents (the
    * registry's deterministic-double discipline). DuckDB spells the
    * substitutions out.
    */
  def q170WithMacros(spark: SparkSession, dir: String): DataFrame = {
    val v = s"graft_q170_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    t(spark, dir, "lineitem").createOrReplaceTempView(v)
    try spark.sql(
        s"""WITH 24 AS qty_cap,
           |     l_extendedprice * (1 - l_discount) AS net,
           |     (SELECT avg(l_quantity) FROM $v) AS avg_qty
           |SELECT l_returnflag, count(*) AS c,
           |  sum(CAST(floor(net * 100.0 + 0.5) AS BIGINT)) AS net_cents
           |FROM $v
           |WHERE l_quantity < qty_cap AND l_quantity > avg_qty - 20
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q170Sql: String =
    """SELECT l_returnflag, count(*) AS c,
      |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
      |    AS BIGINT)) AS BIGINT) AS net_cents
      |FROM lineitem
      |WHERE l_quantity < 24
      |  AND l_quantity > (SELECT avg(l_quantity) FROM lineitem) - 20
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Q171 — ClickHouse collection literals (round 16): `[1, 3, 5]` array
    * literals (as function arguments) and `{'k': v}` map literals (with
    * subscript access), both rewritten by the parser onto array()/map()
    * constructors with subscripts left intact. DuckDB shares the bracket
    * syntax; the map access is constant-folded in the oracle.
    */
  def q171CollectionLiterals(spark: SparkSession, dir: String): DataFrame = {
    val v = s"graft_q171_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    t(spark, dir, "lineitem").createOrReplaceTempView(v)
    try spark.sql(
        s"""SELECT l_returnflag,
           |  CAST(count_if(array_contains([1, 3, 5], l_linenumber))
           |    AS BIGINT) AS odd_lines,
           |  CAST({'low': 10, 'high': 40}['low'] AS BIGINT) AS low_bound,
           |  CAST(count_if(l_quantity < {'low': 10, 'high': 40}['low'])
           |    AS BIGINT) AS below_low
           |FROM $v GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q171Sql: String =
    """SELECT l_returnflag,
      |  CAST(count_if(list_contains([1, 3, 5], l_linenumber))
      |    AS BIGINT) AS odd_lines,
      |  CAST(10 AS BIGINT) AS low_bound,
      |  CAST(count_if(l_quantity < 10) AS BIGINT) AS below_low
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Q172 — the `-State`/`-Merge` combinator pair (round 16):
    * AggregatingMergeTree's two-stage vocabulary — partial aggregate
    * STATES per fine group (here (flag, status), standing in for
    * per-part pre-aggregation), MERGED at read into the coarse group.
    * uniqState/uniqMerge ride a real mergeable HLL sketch (DataSketches
    * binary — exact at this cardinality, the sketch still holds coupons);
    * sum/count/max states are their own values. The oracle computes the
    * same aggregates single-stage — the whole point of the combinator
    * contract is that the two-stage answer is the same answer.
    */
  def q172AggStates(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val v = s"graft_q172_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    t(spark, dir, "lineitem").createOrReplaceTempView(v)
    try spark.sql(
        s"""SELECT f,
           |  CAST(uniqMerge(u) AS BIGINT) AS uniq_orders,
           |  CAST(sumMerge(q) AS BIGINT) AS qty,
           |  CAST(countMerge(c) AS BIGINT) AS cnt,
           |  maxMerge(m) AS mx
           |FROM (SELECT l_returnflag AS f, l_linestatus AS s,
           |        uniqState(l_orderkey) AS u,
           |        sumState(CAST(l_quantity AS BIGINT)) AS q,
           |        countState(l_orderkey) AS c,
           |        maxState(l_quantity) AS m
           |      FROM $v WHERE l_orderkey < 400
           |      GROUP BY l_returnflag, l_linestatus)
           |GROUP BY f ORDER BY f""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q172Sql: String =
    """SELECT l_returnflag AS f,
      |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS uniq_orders,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
      |  CAST(count(l_orderkey) AS BIGINT) AS cnt,
      |  max(l_quantity) AS mx
      |FROM lineitem WHERE l_orderkey < 400
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Q173 — the ternary operator `cond ? a : b` (round 16): ClickHouse's
    * conditional spelling inside an aggregate, over the numbers() TVF —
    * rewritten by the parser onto if(). DuckDB spells CASE WHEN.
    */
  def q173Ternary(spark: SparkSession, dir: String): DataFrame =
    spark.sql(
      """SELECT number % 3 AS g,
        |  CAST(sum(number % 2 = 0 ? number : 0) AS BIGINT) AS even_sum,
        |  count(*) AS c
        |FROM numbers(300) GROUP BY number % 3 ORDER BY g""".stripMargin)

  val q173Sql: String =
    """SELECT number % 3 AS g,
      |  CAST(sum(CASE WHEN number % 2 = 0 THEN number ELSE 0 END)
      |    AS BIGINT) AS even_sum,
      |  CAST(count(*) AS BIGINT) AS c
      |FROM (SELECT CAST(range AS BIGINT) AS number FROM range(0, 300))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q174 — text tokenizers + the readability bar (round 16): `tokens()`
    * (split on non-alphanumeric runs, no empties), `ngrams(s, 3)`
    * (character trigrams), and `bar()` (clamped block-chart) over the
    * per-type event counts. formatReadable* stays spec-only — C printf
    * rounds %.2f half-even where Java rounds half-up, so the text face is
    * pinned in ClickHouseNamesSpec instead of against DuckDB.
    */
  def q174TokensBar(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val v = s"graft_q174_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    events(spark, dir).createOrReplaceTempView(v)
    try spark.sql(
        s"""SELECT event_type,
           |  array_join(tokens(event_type), '|') AS toks,
           |  array_join(ngrams(event_type, 3), ',') AS tri,
           |  bar(cnt, 0, 1000, 10) AS b,
           |  cnt
           |FROM (SELECT event_type, count(*) AS cnt FROM $v
           |      GROUP BY event_type)
           |ORDER BY event_type""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q174Sql: String =
    """SELECT event_type,
      |  array_to_string(list_filter(
      |    regexp_split_to_array(event_type, '[^a-zA-Z0-9]+'),
      |    x -> len(x) > 0), '|') AS toks,
      |  array_to_string(
      |    [substr(event_type, CAST(i AS INT), 3)
      |     FOR i IN generate_series(1, len(event_type) - 2)], ',') AS tri,
      |  repeat('█', CAST(least(10, greatest(0,
      |    floor(10 * ((cnt * 1.0 - 0) / (1000.0 - 0))))) AS INT)) AS b,
      |  cnt
      |FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
      |      FROM events GROUP BY event_type)
      |ORDER BY event_type""".stripMargin

  /** Q175 — base64 + IPv4 name families (round 16): round-trip
    * base64Encode/Decode and dotted-quad/UInt32 conversions, both spelled
    * natively in DuckDB (base64/from_base64 over blobs, printf + integer
    * arithmetic).
    */
  def q175Base64Ip(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val v = s"graft_q175_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    events(spark, dir).createOrReplaceTempView(v)
    try spark.sql(
        s"""SELECT event_id,
           |  base64Encode(event_type) AS b64,
           |  base64Decode(base64Encode(event_type)) AS rt,
           |  IPv4NumToString(3232235777 + event_id % 10) AS ip,
           |  IPv4StringToNum(IPv4NumToString(3232235777 + event_id % 10))
           |    AS ipn
           |FROM $v WHERE event_id < 20 ORDER BY event_id""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q175Sql: String =
    """SELECT event_id,
      |  base64(encode(event_type)) AS b64,
      |  event_type AS rt,
      |  printf('%d.%d.%d.%d',
      |    (3232235777 + event_id % 10) // 16777216 % 256,
      |    (3232235777 + event_id % 10) // 65536 % 256,
      |    (3232235777 + event_id % 10) // 256 % 256,
      |    (3232235777 + event_id % 10) % 256) AS ip,
      |  CAST(3232235777 + event_id % 10 AS BIGINT) AS ipn
      |FROM events WHERE event_id < 20 ORDER BY event_id""".stripMargin

  /** Q176 — `QUALIFY` (round 16): the window-result filter clause, as the
    * idiomatic top-1-per-key pick with ORDER BY + LIMIT applying AFTER
    * the filter. DuckDB spells QUALIFY natively — same clause, same
    * semantics, hash-equal.
    */
  def q176Qualify(spark: SparkSession, dir: String): DataFrame = {
    val v = s"graft_q176_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    t(spark, dir, "lineitem").createOrReplaceTempView(v)
    try spark.sql(
        s"""SELECT l_orderkey, l_linenumber, l_quantity,
           |  row_number() OVER (PARTITION BY l_orderkey
           |    ORDER BY l_quantity DESC, l_linenumber) AS rn
           |FROM $v QUALIFY rn = 1 ORDER BY l_orderkey LIMIT 800""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  val q176Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  row_number() OVER (PARTITION BY l_orderkey
      |    ORDER BY l_quantity DESC, l_linenumber) AS rn
      |FROM lineitem QUALIFY rn = 1 ORDER BY l_orderkey LIMIT 800""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q9_agg_tpch1", q9Agg _, Some(q9Sql)),
    ("q10_filter_project", q10FilterProject _, Some(q10Sql)),
    ("q11_join_agg", q11Join _, Some(q11Sql)),
    ("q12_join3_tpch3", q12Join3 _, Some(q12Sql)),
    ("q13_semi_anti", q13SemiAnti _, Some(q13Sql)),
    ("q14_topk", q14TopK _, Some(q14Sql)),
    ("q15_window_rank", q15WindowRank _, Some(q15Sql)),
    ("q16_running_sum", q16RunningSum _, Some(q16Sql)),
    ("q17_count_distinct", q17Distinct _, Some(q17Sql)),
    ("q17b_approx_distinct", q17bApprox _, None),
    ("q18_tumbling_window", q18Tumbling _, Some(q18Sql)),
    ("q19_set_ops", q19SetOps _, Some(q19Sql)),
    ("q20_scalar_mix", q20Scalars _, Some(q20Sql)),
    ("q21_rollup", q21Rollup _, Some(q21Sql)),
    ("q22_dedup_latest", q22DedupLatest _, Some(q22Sql)),
    ("q39_asof_join", q39AsofJoin _, Some(q39Sql)),
    ("q40_range_join", q40RangeJoin _, Some(q40Sql)),
    ("q41_sessionize", q41Sessionize _, Some(q41Sql)),
    ("q42_quantiles", q42Quantiles _, Some(q42Sql)),
    ("q43_json_struct", q43JsonStruct _, Some(q43Sql)),
    ("q49_exists_subquery", q49ExistsSubquery _, Some(q49Sql)),
    ("q50_cube", q50Cube _, Some(q50Sql)),
    ("q58_full_outer", q58FullOuter _, Some(q58Sql)),
    ("q59_array_join", q59ArrayJoin _, Some(q59Sql)),
    ("q60_range_frame", q60RangeFrame _, Some(q60Sql)),
    ("q61_limit_by", q61LimitBy _, Some(q61Sql)),
    ("q64_with_totals", q64WithTotals _, Some(q64Sql)),
    ("q65_argmax", q65ArgMax _, Some(q65Sql)),
    ("q66_group_array", q66GroupArray _, Some(q66Sql)),
    ("q68_funnel", q68Funnel _, Some(q68Sql)),
    ("q69_retention", q69Retention _, Some(q69Sql)),
    ("q70_cond_agg", q70CondAgg _, Some(q70Sql)),
    ("q71_dict_get", q71DictGet _, Some(q71Sql)),
    ("q72_array_hof", q72ArrayHof _, Some(q72Sql)),
    ("q73_sum_map", q73SumMap _, Some(q73Sql)),
    ("q74_with_fill", q74WithFill _, Some(q74Sql)),
    ("q75_sequence_count", q75SequenceCount _, Some(q75Sql)),
    ("q76_stats_agg", q76StatsAgg _, Some(q76Sql)),
    ("q77_approx_quantiles", q77ApproxQuantiles _, None),
    ("q78_tfidf", q78Tfidf _, Some(q78Sql)),
    ("q80_url_functions", q80UrlFunctions _, Some(q80Sql)),
    ("q104_url_dedup", q104UrlDedup _, Some(q104Sql)),
    ("q81_event_gaps", q81EventGaps _, Some(q81Sql)),
    ("q82_sequence_match", q82SequenceMatch _, Some(q82Sql)),
    ("q83_funnel_strict", q83FunnelStrict _, Some(q83Sql)),
    ("q84_with_fill_interpolate", q84WithFillInterpolate _, Some(q84Sql)),
    ("q86_grouping_sets", q86GroupingSets _, Some(q86Sql)),
    ("q87_ranking_family", q87RankingFamily _, Some(q87Sql)),
    ("q88_uniq_up_to", q88UniqUpTo _, Some(q88Sql)),
    ("q89_bit_aggregates", q89BitAggregates _, Some(q89Sql)),
    ("q90_entropy", q90Entropy _, Some(q90Sql)),
    ("q100_histogram", q100Histogram _, Some(q100Sql)),
    ("q149_date_with_fill", q149DateWithFill _, Some(q149Sql)),
    ("q152_interpolate_expr", q152InterpolateExpr _, Some(q152Sql)),
    ("q153_multi_fill", q153MultiFill _, Some(q153Sql)),
    ("q155_desc_fill", q155DescFill _, Some(q155Sql)),
    ("q157_array_join", q157ArrayJoin _, Some(q157Sql)),
    ("q158_ch_functions", q158ChFunctions _, Some(q158Sql)),
    ("q159_agg_names", q159AggNames _, Some(q159Sql)),
    ("q160_parametric", q160Parametric _, Some(q160Sql)),
    ("q161_array_hof_ch", q161ArrayHofCh _, Some(q161Sql)),
    ("q162_ch_scalars", q162ChScalars _, Some(q162Sql)),
    ("q164_asof_sql", q164AsofSql _, Some(q164Sql)),
    ("q165_limit_with_ties", q165LimitWithTies _, Some(q165Sql)),
    ("q166_json_bit", q166JsonBit _, Some(q166Sql)),
    ("q167_numbers_array_join", q167NumbersArrayJoin _, Some(q167Sql)),
    ("q168_distinct_on", q168DistinctOn _, Some(q168Sql)),
    ("q169_star_modifiers", q169StarModifiers _, Some(q169Sql)),
    ("q170_with_macros", q170WithMacros _, Some(q170Sql)),
    ("q171_collection_literals", q171CollectionLiterals _, Some(q171Sql)),
    ("q172_agg_states", q172AggStates _, Some(q172Sql)),
    ("q173_ternary", q173Ternary _, Some(q173Sql)),
    ("q174_tokens_bar", q174TokensBar _, Some(q174Sql)),
    ("q175_base64_ip", q175Base64Ip _, Some(q175Sql)),
    ("q176_qualify", q176Qualify _, Some(q176Sql)))
}
