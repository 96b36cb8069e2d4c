package graft

import org.scalatest.funsuite.AnyFunSuite

/** ClickHouse `ORDER BY … WITH FILL`: grid semantics (FROM inclusive, TO
  * exclusive, STEP), type-default fill values, off-grid originals
  * surviving, derived bounds, and empty-input safety.
  */
class WithFillSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  private def view(): Unit = {
    import spark.implicits._
    Seq((1L, "a", 10L), (4L, "b", 40L), (9L, "c", 90L))
      .toDF("b", "s", "v").createOrReplaceTempView("wf_src")
  }

  test("literal bounds: grid filled with defaults, off-grid originals survive, sorted") {
    view()
    val rows = spark.sql(
      "SELECT b, s, v FROM wf_src ORDER BY b WITH FILL FROM 0 TO 10 STEP 2").collect()
    // grid {0,2,4,6,8}: 4 present only as fills (4 is original); originals 1, 9 off-grid survive
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 4L, 6L, 8L, 9L))
    val byB = rows.map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byB(0L) == (("", 0L)), "fill rows carry type defaults (ClickHouse), not NULLs")
    assert(byB(1L) == (("a", 10L)) && byB(4L) == (("b", 40L)) && byB(9L) == (("c", 90L)))
  }

  test("derived bounds: min..max of the result, inclusive, default step 1") {
    view()
    val rows = spark.sql("SELECT b, v FROM wf_src ORDER BY b WITH FILL").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L))
    assert(rows.map(_.getLong(1)).sum == 140L, "fills contribute 0")
  }

  test("empty input with derived bounds yields an empty result, no crash") {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("b", "v").createOrReplaceTempView("wf_empty")
    assert(spark.sql("SELECT b, v FROM wf_empty ORDER BY b WITH FILL").count() == 0)
    // …but explicit bounds fill even an empty result
    assert(spark.sql(
      "SELECT b, v FROM wf_empty ORDER BY b WITH FILL FROM 0 TO 5").count() == 5)
  }

  test("INTERPOLATE carries the last real value forward; other columns keep defaults") {
    view()
    val rows = spark.sql(
      "SELECT b, s, v FROM wf_src ORDER BY b WITH FILL FROM 0 TO 11 INTERPOLATE (v)")
      .collect()
    val byB = rows.map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byB(0L) == (("", 0L)), "fill before the first real row keeps the default")
    assert(byB(2L) == (("", 10L)) && byB(3L) == (("", 10L)),
      "fills after b=1 carry v=10")
    assert(byB(5L) == (("", 40L)) && byB(8L) == (("", 40L)), "fills after b=4 carry v=40")
    assert(byB(10L) == (("", 90L)), "fills after b=9 carry v=90")
    assert(byB(1L) == (("a", 10L)) && byB(4L) == (("b", 40L)) && byB(9L) == (("c", 90L)),
      "real rows untouched")
  }

  test("INTERPOLATE c AS expr evaluates the expression over the carried row") {
    view()
    // fills take (last real v) + 1; real rows keep their own v
    val rows = spark.sql(
      "SELECT b, v FROM wf_src ORDER BY b WITH FILL FROM 0 TO 11 INTERPOLATE (v AS v + 1)")
      .collect()
    val byB = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byB(0L) == 0L, "fill before the first real row keeps the type default")
    assert(byB(2L) == 11L && byB(3L) == 11L, "fills after b=1 carry v(10) + 1")
    assert(byB(5L) == 41L && byB(8L) == 41L, "fills after b=4 carry v(40) + 1")
    assert(byB(10L) == 91L, "fills after b=9 carry v(90) + 1")
    assert(byB(1L) == 10L && byB(4L) == 40L && byB(9L) == 90L, "real rows untouched")
    // the expression may reference OTHER columns of the carried row, and
    // may contain commas (splitTopLevel, not a naive split)
    val multi = spark.sql(
      "SELECT b, s, v FROM wf_src ORDER BY b WITH FILL FROM 0 TO 6 " +
        "INTERPOLATE (v AS greatest(v, 20), s)")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(multi(2L) == (("a", 20L)), "expr over the carried row: greatest(10, 20)")
    assert(multi(5L) == (("b", 40L)), "greatest(40, 20) after b=4; s carries too")
    // an INTERPOLATE column that is a fill column stays a loud error
    intercept[Exception] {
      spark.sql("SELECT b, v FROM wf_src ORDER BY b WITH FILL INTERPOLATE (b AS b+1)")
        .collect()
    }
  }

  test("multi-column WITH FILL: the grid is the cross product of the fill sequences") {
    import spark.implicits._
    // sparse (day, bucket) readings: 2 of the 3x3 grid points present
    Seq((1L, 10L, 100L), (3L, 12L, 300L))
      .toDF("d", "bk", "v").createOrReplaceTempView("wf_multi")
    val rows = spark.sql(
      "SELECT d, bk, v FROM wf_multi ORDER BY d WITH FILL FROM 1 TO 4, " +
        "bk WITH FILL FROM 10 TO 13").collect()
    assert(rows.length == 9, s"3x3 cross-product grid, got ${rows.length}")
    val byKey = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(byKey((1L, 10L)) == 100L && byKey((3L, 12L)) == 300L, "originals survive")
    assert(byKey((1L, 11L)) == 0L && byKey((2L, 10L)) == 0L && byKey((3L, 10L)) == 0L,
      "missing grid tuples fill with defaults")
    // result sorted by the fill key tuple
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (for (d <- 1L to 3L; bk <- 10L to 12L) yield (d, bk)))
    // derived bounds per column compose with literal ones: d derives
    // [1,3] from the data, bk is pinned
    val mixed = spark.sql(
      "SELECT d, bk, v FROM wf_multi ORDER BY d WITH FILL, bk WITH FILL FROM 10 TO 12")
      .collect()
    // 3x2 grid plus the off-grid original (3, bk=12), which survives
    assert(mixed.length == 7, s"3x2 grid + 1 off-grid original, got ${mixed.length}")
    assert(mixed.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .contains((3L, 12L, 300L)), "off-grid original must survive")
    // INTERPOLATE composes with the multi-column grid
    val interp = spark.sql(
      "SELECT d, bk, v FROM wf_multi ORDER BY d WITH FILL FROM 1 TO 3, " +
        "bk WITH FILL FROM 10 TO 12 INTERPOLATE (v)")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(interp((1L, 11L)) == 100L && interp((2L, 10L)) == 100L,
      "carry runs along the (d, bk) fill order")
    // duplicate fill column is loud
    intercept[Exception] {
      spark.sql("SELECT d, bk, v FROM wf_multi ORDER BY d WITH FILL, d WITH FILL")
        .collect()
    }
  }

  test("DATE fill column: day grid, TO exclusive, STEP in days, mismatched bounds loud") {
    import spark.implicits._
    Seq(("2024-03-01", 5L), ("2024-03-04", 7L))
      .toDF("ds", "n").selectExpr("CAST(ds AS DATE) AS day", "n")
      .createOrReplaceTempView("wf_dates")
    val rows = spark.sql(
      "SELECT day, n FROM wf_dates ORDER BY day WITH FILL FROM '2024-03-01' TO '2024-03-06'")
      .collect()
    assert(rows.map(_.getDate(0).toString).toSeq ==
      Seq("2024-03-01", "2024-03-02", "2024-03-03", "2024-03-04", "2024-03-05"),
      "daily grid, TO exclusive")
    assert(rows.map(_.getLong(1)).toSeq == Seq(5L, 0L, 0L, 7L, 0L))
    // STEP 2 days
    val s2 = spark.sql(
      "SELECT day, n FROM wf_dates ORDER BY day WITH FILL FROM '2024-03-01' TO '2024-03-08' STEP 2")
      .collect()
    assert(s2.map(_.getDate(0).toString).toSeq ==
      Seq("2024-03-01", "2024-03-03", "2024-03-04", "2024-03-05", "2024-03-07"),
      "2-day grid plus the off-grid original 03-04")
    // derived bounds over dates
    val d = spark.sql("SELECT day, n FROM wf_dates ORDER BY day WITH FILL").collect()
    assert(d.length == 4 && d.map(_.getLong(1)).sum == 12L)
    // an integer bound against a DATE column is a loud error
    intercept[Exception] {
      spark.sql("SELECT day, n FROM wf_dates ORDER BY day WITH FILL FROM 0 TO 5").collect()
    }
  }

  test("DESC WITH FILL: descending grid, FROM above TO, negative STEP") {
    view()
    // ClickHouse's grammar: ORDER BY b DESC WITH FILL FROM 10 TO 0 STEP -2
    val rows = spark.sql(
      "SELECT b, v FROM wf_src ORDER BY b DESC WITH FILL FROM 10 TO 0 STEP -2")
      .collect()
    // grid {10,8,6,4,2}: originals 1, 9 off-grid survive, 4 is original
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L, 9L, 8L, 6L, 4L, 2L, 1L),
      s"descending grid + off-grid originals, got ${rows.map(_.getLong(0)).toSeq}")
    val byB = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byB(10L) == 0L && byB(4L) == 40L && byB(9L) == 90L)
    // derived bounds descend max..min, default step -1
    val d = spark.sql("SELECT b, v FROM wf_src ORDER BY b DESC WITH FILL").collect()
    assert(d.map(_.getLong(0)).toSeq == (9L to 1L by -1L))
    // DESC with a positive step is loud; ASC with a negative step is loud
    intercept[Exception] {
      spark.sql("SELECT b FROM wf_src ORDER BY b DESC WITH FILL STEP 2").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT b FROM wf_src ORDER BY b WITH FILL STEP -2").collect()
    }
    // mixed directions across a multi-column grid
    import spark.implicits._
    Seq((1L, 10L, 100L)).toDF("d", "bk", "v").createOrReplaceTempView("wf_mixdir")
    val mixed = spark.sql(
      "SELECT d, bk, v FROM wf_mixdir ORDER BY d WITH FILL FROM 1 TO 3, " +
        "bk DESC WITH FILL FROM 11 TO 9").collect()
    assert(mixed.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 11L), (1L, 10L), (2L, 11L), (2L, 10L)),
      "asc x desc cross product in the declared directions")
  }

  test("composes with SAMPLE-free standard SQL and rejects bad steps") {
    view()
    intercept[Exception] {
      spark.sql("SELECT b FROM wf_src ORDER BY b WITH FILL FROM 5 TO 2").collect()
    }
    // plain ORDER BY is untouched
    assert(spark.sql("SELECT b FROM wf_src ORDER BY b").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 4L, 9L))
  }
}
