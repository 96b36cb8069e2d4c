package graft

import graft.functions.Dictionary
import graft.queries.AnalyticQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Edge-case pins for Q68 (windowFunnel DP) and Q71 (Dictionary).
  *
  * The funnel DP's correctness rests on a dominance argument — "keep the
  * MAX chain-start time per prefix length" — that the oracle comparison
  * over random data exercises only statistically. These tests construct
  * the adversarial orderings directly.
  */
class FunnelDictionarySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  /** Build an events-shaped parquet dir from (user, eventId, type, tsMicros)
    * and run q68Funnel over it. ts is written as a nanos INT64 column read
    * back under nanosAsLong, matching the real testdata layout.
    */
  private def funnelLevels(rows: Seq[(Long, Long, String, Long)]): Map[Int, Long] = {
    val dir = Files.createTempDirectory("funnel_").toString
    rows.toDF("user_id", "event_id", "event_type", "tus")
      .select(col("event_id"), (col("tus") * lit(1000L)).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    AnalyticQueries.q68Funnel(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  private val H = 3600000000L // 1 h in micros; window is 24 h

  test("funnel: full chain inside the window reaches level 3") {
    assert(funnelLevels(Seq(
      (1L, 1L, "view", 0L), (1L, 2L, "click", H), (1L, 3L, "purchase", 2 * H)))
      == Map(3 -> 1L))
  }

  test("funnel: chain whose purchase falls outside 24h of its ONLY view stops at 2") {
    assert(funnelLevels(Seq(
      (1L, 1L, "view", 0L), (1L, 2L, "click", H), (1L, 3L, "purchase", 25 * H)))
      == Map(2 -> 1L))
  }

  test("funnel: a LATER view restarts the window (max-start dominance)") {
    // view@0, click@1h, view@23h, click@24h, purchase@26h:
    // the chain through the second view (23h → 24h → 26h) fits in 24h even
    // though the first-view chain does not. Keeping only the FIRST start
    // would miss it.
    assert(funnelLevels(Seq(
      (1L, 1L, "view", 0L), (1L, 2L, "click", H),
      (1L, 3L, "view", 23 * H), (1L, 4L, "click", 24 * H),
      (1L, 5L, "purchase", 26 * H)))
      == Map(3 -> 1L))
  }

  test("funnel: out-of-order stages never chain") {
    // click before any view, purchase before any click
    assert(funnelLevels(Seq(
      (1L, 1L, "click", 0L), (1L, 2L, "purchase", H), (1L, 3L, "view", 2 * H)))
      == Map(1 -> 1L))
    // no funnel events at all → level 0
    assert(funnelLevels(Seq((2L, 1L, "error", 0L))) == Map(0 -> 1L))
  }

  test("funnel: strict (ts, event_id) order — same-timestamp stages chain by id") {
    // view and click share ts: event_id breaks the tie, so (id1 view,
    // id2 click) chains but (id2 view, id1 click) does not.
    assert(funnelLevels(Seq(
      (1L, 1L, "view", 0L), (1L, 2L, "click", 0L))) == Map(2 -> 1L))
    assert(funnelLevels(Seq(
      (2L, 2L, "view", 0L), (2L, 1L, "click", 0L))) == Map(1 -> 1L))
  }

  test("funnel: users are independent — one level histogram per user") {
    assert(funnelLevels(Seq(
      (1L, 1L, "view", 0L),
      (2L, 2L, "view", 0L), (2L, 3L, "click", H),
      (3L, 4L, "error", 0L)))
      == Map(0 -> 1L, 1 -> 1L, 2 -> 1L))
  }

  private def fourStageLevels(rows: Seq[(Long, Long, String, Long)]): Map[Long, Int] = {
    val ev = rows.toDF("user_id", "event_id", "event_type", "tus")
    graft.operators.Funnel
      .levels(ev, "user_id", "tus", "event_id",
        Seq(col("event_type") === "a", col("event_type") === "b",
          col("event_type") === "c", col("event_type") === "d"),
        windowMicros = 24 * H)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("funnel operator: generalizes to 4 stages") {
    // full 4-chain in window; a 3-chain whose 4th step misses the window;
    // deepest level wins even when earlier stages also match later
    assert(fourStageLevels(Seq(
      (1L, 1L, "a", 0L), (1L, 2L, "b", H), (1L, 3L, "c", 2 * H), (1L, 4L, "d", 3 * H),
      (2L, 1L, "a", 0L), (2L, 2L, "b", H), (2L, 3L, "c", 2 * H), (2L, 4L, "d", 30 * H),
      (3L, 1L, "a", 0L), (3L, 2L, "b", H), (3L, 3L, "a", 2 * H)))
      == Map(1L -> 4, 2L -> 3, 3L -> 2))
  }

  test("funnel operator: 4-deep window restart (dominance at depth)") {
    // chain 1 (a@0 … c@20h) stalls: d@30h misses its window; but a second
    // a@10h,b@12h,c@20h chain reaches d@30h within 24h of ITS start.
    assert(fourStageLevels(Seq(
      (1L, 1L, "a", 0L), (1L, 2L, "b", H), (1L, 3L, "a", 10 * H),
      (1L, 4L, "b", 12 * H), (1L, 5L, "c", 20 * H), (1L, 6L, "d", 30 * H)))
      == Map(1L -> 4))
  }

  test("dictionary: lookup, default, has; no join in the plan") {
    val dim = Seq((1L, "one"), (2L, "two")).toDF("k", "v")
    val d = Dictionary.fromDataFrame(dim, "k", "v")
    assert(d.size == 2)
    val facts = Seq(1L, 2L, 9L).toDF("k")
    val out = facts.select(
      d.getOrDefault(col("k"), lit("?")).as("name"), d.has(col("k")).as("hit"))
    assert(out.collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq ==
      Seq(("one", true), ("two", true), ("?", false)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"dictGet must not plan a join:\n$plan")
  }

  test("dictionary: duplicate keys are rejected loudly") {
    val dup = Seq((1L, "a"), (1L, "b")).toDF("k", "v")
    assertThrows[IllegalArgumentException] {
      Dictionary.fromDataFrame(dup, "k", "v")
    }
  }
}
