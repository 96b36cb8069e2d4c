package graft

import graft.functions.Dictionary
import graft.queries.AnalyticQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Edge-case pins for Q68 (windowFunnel DP), Q75 (sequenceCount scan
  * automaton), and Q71 (Dictionary).
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

  /** Run Funnel.sequenceCount(view→click) over an in-memory event list. */
  private def seqCount(rows: Seq[(Long, Long, String, Long)]): Map[Long, Long] = {
    val ev = rows.toDF("user_id", "event_id", "event_type", "tus")
    graft.operators.Funnel
      .sequenceCount(ev, "user_id", "tus", "event_id",
        first = col("event_type") === "view",
        second = col("event_type") === "click")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference implementation: ClickHouse's literal scan automaton.
    * seeking-first → (first) → armed → (second) → fire, reset. */
  private def seqCountSim(types: Seq[String]): Long = {
    var armed = false
    var n = 0L
    types.foreach {
      case "view" => armed = true
      case "click" => if (armed) n += 1; armed = false
      case _ => () // skipped: matches neither condition
    }
    n
  }

  test("sequenceCount: restart rule — V V C C is ONE match, not two") {
    // Max matching would pair (V1,C1) and (V2,C2) = 2; ClickHouse's scan
    // consumes V2 inside the first match and resumes after C1.
    assert(seqCount(Seq(
      (1L, 1L, "view", 0L), (1L, 2L, "view", 1L),
      (1L, 3L, "click", 2L), (1L, 4L, "click", 3L))) == Map(1L -> 1L))
  }

  test("sequenceCount: disjoint pairs all count; stray seconds/firsts don't") {
    // V C V C = 2; C (unarmed) and trailing V add nothing.
    assert(seqCount(Seq(
      (1L, 1L, "click", 0L), (1L, 2L, "view", 1L), (1L, 3L, "click", 2L),
      (1L, 4L, "view", 3L), (1L, 5L, "click", 4L), (1L, 6L, "view", 5L)))
      == Map(1L -> 2L))
  }

  test("sequenceCount: non-matching events between stages are skipped") {
    assert(seqCount(Seq(
      (1L, 1L, "view", 0L), (1L, 2L, "error", 1L), (1L, 3L, "click", 2L)))
      == Map(1L -> 1L))
  }

  test("sequenceCount: same-timestamp events order by event_id") {
    // (id1 view, id2 click) at one ts pairs; swapped ids do not.
    assert(seqCount(Seq(
      (1L, 1L, "view", 0L), (1L, 2L, "click", 0L))) == Map(1L -> 1L))
    assert(seqCount(Seq(
      (2L, 2L, "view", 0L), (2L, 1L, "click", 0L))) == Map(2L -> 0L))
  }

  test("sequenceMatch: exists-a-chain, 0/1 per entity") {
    val rows = Seq(
      (1L, 1L, "view", 0L), (1L, 2L, "click", 1L),   // chain → 1
      (2L, 1L, "click", 0L), (2L, 2L, "view", 1L),   // wrong order → 0
      (3L, 1L, "view", 0L), (3L, 2L, "error", 1L))   // no second → 0
    val got = graft.operators.Funnel
      .sequenceMatch(rows.toDF("user_id", "event_id", "event_type", "tus"),
        "user_id", "tus", "event_id",
        first = col("event_type") === "view",
        second = col("event_type") === "click")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> 0))
  }

  test("sequenceCount: lag closed form equals the scan automaton on random streams") {
    val rnd = new scala.util.Random(41)
    val alphabet = Vector("view", "click", "error", "scroll")
    val rows = for {
      user <- 1L to 40L
      i <- 0 until (1 + rnd.nextInt(20))
    } yield (user, i.toLong, alphabet(rnd.nextInt(alphabet.length)), i.toLong * 10)
    // Entities whose events all match neither condition are absent from
    // the operator's output (the pre-filter drops them) — same as the
    // DuckDB oracle's WHERE clause. The simulation mirrors that.
    val expected = rows.groupBy(_._1)
      .filter(_._2.exists(e => e._3 == "view" || e._3 == "click"))
      .map { case (u, evs) =>
        u -> seqCountSim(evs.sortBy(e => (e._4, e._2)).map(_._3))
      }
    assert(seqCount(rows) == expected)
  }

  private def strictLevels(rows: Seq[(Long, Long, String, Long)]): Map[Long, Int] = {
    val ev = rows.toDF("user_id", "event_id", "event_type", "tus")
    graft.operators.Funnel
      .levels(ev, "user_id", "tus", "event_id",
        Seq(col("event_type") === "view", col("event_type") === "click"),
        windowMicros = 24 * H, strictIncrease = true)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("funnel strict_increase: same-timestamp stages never chain") {
    // default mode chains (id1 view, id2 click) at one ts (pinned above);
    // strict_increase refuses — the click must be strictly later
    assert(strictLevels(Seq(
      (1L, 1L, "view", 0L), (1L, 2L, "click", 0L))) == Map(1L -> 1))
    assert(strictLevels(Seq(
      (2L, 1L, "view", 0L), (2L, 2L, "click", 1L))) == Map(2L -> 2))
    // a later same-ts pair still chains through an EARLIER view
    assert(strictLevels(Seq(
      (3L, 1L, "view", 0L), (3L, 2L, "view", 5L), (3L, 3L, "click", 5L)))
      == Map(3L -> 2))
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

  test("dictionary: has() is key membership, even for NULL-valued keys") {
    val dim = Seq((1L, Some("one")), (2L, None)).toDF("k", "v")
    val d = Dictionary.fromDataFrame(dim, "k", "v")
    val facts = Seq(1L, 2L, 9L).toDF("k")
    val out = facts.select(col("k"), d.has(col("k")).as("hit"),
      d.get(col("k")).as("v")).collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(1))).toSeq ==
      Seq((1L, true), (2L, true), (9L, false)))
    assert(out.map(_.isNullAt(2)).toSeq == Seq(false, true, true))
  }

  test("dictionary: duplicate keys are rejected loudly") {
    val dup = Seq((1L, "a"), (1L, "b")).toDF("k", "v")
    assertThrows[IllegalArgumentException] {
      Dictionary.fromDataFrame(dup, "k", "v")
    }
  }

  test("dictionary: NULL keys fail with the actual cause, not an NPE") {
    // two NULLs would otherwise collide in the map and trip the misleading
    // duplicate-keys error; one NULL would NPE at getLong
    val withNull = Seq((Some(1L), "a"), (None, "b"), (None, "c")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Dictionary.fromDataFrame(withNull, "k", "v")
    }
    assert(e.getMessage.contains("NULL"), e.getMessage)
  }
}
