package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** ClickHouse `ASOF JOIN` through the SQL face: for each left row, the
  * single right row with matching keys and the closest time satisfying the
  * inequality. The spec pins all four operators, the LEFT form's NULL
  * fill, alias/qualifier survival (SELECT l.x, r.y AND SELECT * — no
  * helper columns leak), composition with WHERE/GROUP BY, quote safety,
  * and every loud refusal.
  */
class AsofJoinSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.session
    import s.implicits._
    // trades: (sym, t, qty); quotes: (sym, t, px) — the canonical as-of pair
    Seq(("a", 10L, 1L), ("a", 20L, 2L), ("b", 15L, 3L), ("c", 5L, 4L))
      .toDF("sym", "t", "qty").createOrReplaceTempView("asof_trades")
    Seq(("a", 8L, 100.0), ("a", 12L, 110.0), ("a", 25L, 120.0),
      ("b", 15L, 200.0), ("b", 16L, 210.0))
      .toDF("sym", "qt", "px").createOrReplaceTempView("asof_quotes")
    s
  }

  private def rows(sql: String): Seq[Row] = spark.sql(sql).collect().toSeq

  test("<=: latest quote at or before each trade; unmatched left drops (inner)") {
    val r = rows(
      """SELECT tr.sym, tr.t, q.px FROM asof_trades tr
        |ASOF JOIN asof_quotes q ON tr.sym = q.sym AND q.qt <= tr.t
        |ORDER BY tr.sym, tr.t""".stripMargin)
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2)))
    // a@10 -> qt 8 (100), a@20 -> qt 12 (110), b@15 -> qt 15 (200); c drops
    assert(r == Seq(("a", 10L, 100.0), ("a", 20L, 110.0), ("b", 15L, 200.0)))
  }

  test("ASOF LEFT JOIN keeps unmatched left rows with NULL right columns") {
    val r = rows(
      """SELECT tr.sym, tr.t, q.px FROM asof_trades tr
        |ASOF LEFT JOIN asof_quotes q ON tr.sym = q.sym AND q.qt <= tr.t
        |ORDER BY tr.sym, tr.t""".stripMargin)
    assert(r.size == 4)
    val c = r.find(_.getString(0) == "c").get
    assert(c.isNullAt(2), "unmatched left row carries NULL right columns")
  }

  test(">=: earliest quote at or after; < and > strict variants") {
    val ge = rows(
      """SELECT tr.t, q.qt FROM asof_trades tr
        |ASOF JOIN asof_quotes q ON tr.sym = q.sym AND q.qt >= tr.t
        |WHERE tr.sym = 'a' ORDER BY tr.t""".stripMargin)
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(ge == Seq((10L, 12L), (20L, 25L)))
    val lt = rows(
      """SELECT tr.t, q.qt FROM asof_trades tr
        |ASOF JOIN asof_quotes q ON tr.sym = q.sym AND q.qt < tr.t
        |WHERE tr.sym = 'b' ORDER BY tr.t""".stripMargin)
    assert(lt.isEmpty, "strict <: the qt=15 quote must not match the t=15 trade")
    // flipped spelling (left side first) normalizes identically
    val flip = rows(
      """SELECT tr.t, q.qt FROM asof_trades tr
        |ASOF JOIN asof_quotes q ON tr.sym = q.sym AND tr.t >= q.qt
        |WHERE tr.sym = 'a' ORDER BY tr.t""".stripMargin)
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(flip == Seq((10L, 8L), (20L, 12L)))
  }

  test("SELECT * carries exactly both sides' columns — no helpers leak") {
    val df = spark.sql(
      """SELECT * FROM asof_trades tr
        |ASOF JOIN asof_quotes q ON tr.sym = q.sym AND q.qt <= tr.t""".stripMargin)
    assert(df.columns.toSeq == Seq("sym", "t", "qty", "sym", "qt", "px"))
  }

  test("composes with aggregation and does not fire inside string literals") {
    val agg = rows(
      """SELECT tr.sym, count(*) AS n, CAST(sum(q.px) AS BIGINT) AS s
        |FROM asof_trades tr
        |ASOF JOIN asof_quotes q ON tr.sym = q.sym AND q.qt <= tr.t
        |GROUP BY tr.sym ORDER BY tr.sym""".stripMargin)
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(agg == Seq(("a", 2L, 210L), ("b", 1L, 200L)))
    val lit = rows("SELECT 'x ASOF JOIN y' AS s").map(_.getString(0))
    assert(lit == Seq("x ASOF JOIN y"))
  }

  test("ANY JOIN: one right row per left match; LEFT keeps unmatched") {
    // unique matches -> deterministic: ANY == plain join here, but the
    // t=15 trade has TWO b-quotes and must surface exactly once
    val r = rows(
      """SELECT tr.sym, tr.t, count(*) AS n FROM asof_trades tr
        |ANY JOIN asof_quotes q ON tr.sym = q.sym
        |GROUP BY tr.sym, tr.t ORDER BY tr.sym, tr.t""".stripMargin)
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r == Seq(("a", 10L, 1L), ("a", 20L, 1L), ("b", 15L, 1L)),
      s"each matching left row exactly once: $r")
    val left = rows(
      """SELECT tr.sym, q.px FROM asof_trades tr
        |ANY LEFT JOIN asof_quotes q ON tr.sym = q.sym
        |WHERE tr.sym = 'c'""".stripMargin)
    assert(left.size == 1 && left.head.isNullAt(1))
    val e = intercept[Exception](spark.sql(
      """SELECT * FROM asof_trades tr ANY JOIN asof_quotes q
        |ON tr.sym = q.sym AND q.qt <= tr.t""".stripMargin).collect())
    assert(e.getMessage.contains("equality conditions"))
  }

  test("SEMI/ANTI LEFT JOIN word order maps to Spark's LEFT SEMI/ANTI") {
    val semi = rows(
      """SELECT tr.sym, tr.t FROM asof_trades tr
        |SEMI LEFT JOIN asof_quotes q ON tr.sym = q.sym
        |ORDER BY tr.sym, tr.t""".stripMargin)
      .map(x => (x.getString(0), x.getLong(1)))
    assert(semi == Seq(("a", 10L), ("a", 20L), ("b", 15L)))
    val anti = rows(
      """SELECT tr.sym FROM asof_trades tr
        |ANTI LEFT JOIN asof_quotes q ON tr.sym = q.sym""".stripMargin)
      .map(_.getString(0))
    assert(anti == Seq("c"))
  }

  test("refusals: no inequality, two inequalities, unqualified time, USING") {
    def bad(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains(frag), s"wanted '$frag', got: ${e.getMessage}")
    }
    bad("""SELECT * FROM asof_trades tr ASOF JOIN asof_quotes q
          |ON tr.sym = q.sym""".stripMargin, "exactly ONE inequality")
    bad("""SELECT * FROM asof_trades tr ASOF JOIN asof_quotes q
          |ON tr.sym = q.sym AND q.qt <= tr.t AND q.qt > 0""".stripMargin,
      "exactly ONE inequality")
    bad("""SELECT * FROM asof_trades tr ASOF JOIN asof_quotes q
          |ON tr.sym = q.sym AND 1 <= 2""".stripMargin, "qualified")
    bad("""SELECT * FROM asof_trades tr ASOF JOIN asof_quotes q
          |USING (sym, t)""".stripMargin, "unsupported ASOF JOIN shape")
  }
}
