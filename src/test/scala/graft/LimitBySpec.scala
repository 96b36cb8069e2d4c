package graft

import org.scalatest.funsuite.AnyFunSuite

/** ClickHouse `LIMIT n BY cols`: top-n per key through the parser. */
class LimitBySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  test("first n rows per group under the query's ORDER BY; plain LIMIT untouched") {
    import spark.implicits._
    Seq(("a", 1L, 30L), ("a", 2L, 20L), ("a", 3L, 10L),
        ("b", 4L, 5L), ("b", 5L, 50L), ("c", 6L, 7L))
      .toDF("g", "id", "v").createOrReplaceTempView("lb_src")
    val rows = spark.sql(
      "SELECT g, id, v FROM lb_src ORDER BY g, v DESC, id LIMIT 2 BY g").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("a", 2L), ("b", 5L), ("b", 4L), ("c", 6L)),
      "top-2 per group by v DESC, groups in order")
    // plain LIMIT still standard
    assert(spark.sql("SELECT g FROM lb_src ORDER BY g LIMIT 2").count() == 2)
    // unknown BY column is loud
    intercept[Exception] {
      spark.sql("SELECT g, v FROM lb_src ORDER BY v LIMIT 1 BY nope").collect()
    }
  }

  test("PREWHERE rewrites to WHERE; PREWHERE alongside WHERE is refused") {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "g")
      .createOrReplaceTempView("pw_src")
    val rows = spark.sql("SELECT id FROM pw_src PREWHERE g = 'a' ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    intercept[Exception] {
      spark.sql("SELECT id FROM pw_src PREWHERE g = 'a' WHERE id > 1").collect()
    }
  }

  test("multi-column BY and composition with WHERE") {
    import spark.implicits._
    Seq(("a", "x", 1L), ("a", "x", 2L), ("a", "y", 3L), ("b", "x", 4L), ("b", "x", 5L))
      .toDF("g1", "g2", "id").createOrReplaceTempView("lb_src2")
    val rows = spark.sql(
      "SELECT g1, g2, id FROM lb_src2 WHERE id <= 4 " +
        "ORDER BY g1, g2, id LIMIT 1 BY g1, g2").collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 3L, 4L))
  }
}
