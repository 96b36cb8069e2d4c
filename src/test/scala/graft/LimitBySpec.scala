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
    // LIMIT o, n BY (ClickHouse's offset form): skip each group's first o
    // rows, return the next n — per-key pagination
    val paged = spark.sql(
      "SELECT g, id, v FROM lb_src ORDER BY g, v DESC, id LIMIT 1, 2 BY g").collect()
    assert(paged.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 2L), ("a", 3L), ("b", 4L)),
      "offset 1 skips each group's top row; c has nothing past its first")
    // plain LIMIT still standard
    assert(spark.sql("SELECT g FROM lb_src ORDER BY g LIMIT 2").count() == 2)
    // unknown BY column is loud
    intercept[Exception] {
      spark.sql("SELECT g, v FROM lb_src ORDER BY v LIMIT 1 BY nope").collect()
    }
  }

  test("PREWHERE rewrites to WHERE and AND-merges with a same-block WHERE") {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "a")).toDF("id", "g")
      .createOrReplaceTempView("pw_src")
    val rows = spark.sql("SELECT id FROM pw_src PREWHERE g = 'a' ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L))
    // PREWHERE + WHERE in one block: both predicates apply (AND-merged)
    val both = spark.sql(
      "SELECT id FROM pw_src PREWHERE g = 'a' WHERE id > 1 ORDER BY id").collect()
    assert(both.map(_.getLong(0)).toSeq == Seq(3L, 4L))
    // precedence survives the merge: an OR in the WHERE condition stays
    // grouped — (g='a') AND (id=2 OR id=3) keeps only id=3, never id=2
    val orRows = spark.sql(
      "SELECT id FROM pw_src PREWHERE g = 'a' WHERE id = 2 OR id = 3").collect()
    assert(orRows.map(_.getLong(0)).toSeq == Seq(3L))
    // the WHERE clause ends at the next clause keyword, not at end of text
    val grouped = spark.sql(
      "SELECT g, count(*) AS n FROM pw_src PREWHERE id > 0 WHERE id < 4 " +
        "GROUP BY g ORDER BY g").collect()
    assert(grouped.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 2L), ("b", 1L)))
    // a WHERE in an OUTER block is not the PREWHERE's own: the inner
    // clause rewrites 1:1, the outer WHERE stays where it is
    val nested = spark.sql(
      "SELECT id FROM (SELECT id FROM pw_src PREWHERE g = 'a') t WHERE id > 1").collect()
    assert(nested.map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    // quote-awareness: a PREWHERE inside a string literal is data, and a
    // statement carrying both the literal and a real WHERE still parses
    val lit = spark.sql(
      "SELECT 'has PREWHERE inside' AS s FROM pw_src WHERE id = 1").collect()
    assert(lit.head.getString(0) == "has PREWHERE inside")
    // multiple PREWHERE clauses stay refused — cross-block merging is
    // genuinely ambiguous for a textual rewrite
    intercept[Exception] {
      spark.sql("SELECT id FROM (SELECT id FROM pw_src PREWHERE g = 'a') t " +
        "PREWHERE id > 1").collect()
    }
  }

  test("SETTINGS tuning knobs strip; semantic settings refuse; GLOBAL drops") {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "g")
      .createOrReplaceTempView("st_src")
    // execution-tuning SETTINGS are accepted and ignored
    val rows = spark.sql("SELECT id FROM st_src WHERE id > 1 ORDER BY id " +
      "SETTINGS max_threads = 8, max_memory_usage = 10000000000").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    // ...and compose with the statement-end clauses (stripped first)
    val filled = spark.sql("SELECT id, count(*) AS n FROM st_src GROUP BY id " +
      "ORDER BY id WITH FILL FROM 0 TO 5 SETTINGS max_threads = 4").collect()
    assert(filled.length == 5)
    // a result-changing setting is a loud refusal, never a silent drop
    intercept[Exception] {
      spark.sql("SELECT id FROM st_src SETTINGS join_use_nulls = 1").collect()
    }
    // SETTINGS inside a string literal is data
    assert(spark.sql("SELECT 'SETTINGS max_threads = 8' AS s FROM st_src WHERE id = 1")
      .collect().head.getString(0) == "SETTINGS max_threads = 8")
    // GLOBAL JOIN / GLOBAL NOT IN: the distributed spelling parses as the
    // plain form (Spark owns distribution)
    val j = spark.sql("SELECT count(*) FROM st_src a GLOBAL JOIN st_src b ON a.g = b.g")
      .collect().head.getLong(0)
    assert(j == 5, s"GLOBAL JOIN must plan as a plain join, got $j")
    val notIn = spark.sql("SELECT id FROM st_src WHERE id GLOBAL NOT IN " +
      "(SELECT id FROM st_src WHERE id > 2) ORDER BY id").collect()
    assert(notIn.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // GLOBAL as an ordinary identifier is untouched
    assert(spark.sql("SELECT 1 AS global").collect().head.getInt(0) == 1)
    // FORMAT <known format> at statement end strips (and composes with
    // SETTINGS in ClickHouse's clause order)
    val fmt = spark.sql("SELECT id FROM st_src WHERE id = 2 " +
      "SETTINGS max_threads = 4 FORMAT JSONEachRow").collect()
    assert(fmt.map(_.getLong(0)).toSeq == Seq(2L))
    // an unknown trailing word is NOT eaten — a column named format stays
    Seq((1L, "x")).toDF("id", "format").createOrReplaceTempView("fmt_src")
    assert(spark.sql("SELECT format FROM fmt_src").collect().head.getString(0) == "x")
    // a literal ending in a format name survives (quote anchors the end)
    assert(spark.sql("SELECT 'use FORMAT JSON' AS s").collect()
      .head.getString(0) == "use FORMAT JSON")
  }

  test("ARRAY JOIN: element expansion, column replacement, LEFT keeps empties") {
    import spark.implicits._
    Seq((1L, Seq("a", "b")), (2L, Seq("c")), (3L, Seq.empty[String]))
      .toDF("id", "arr").createOrReplaceTempView("aj_src")
    // bare form: arr is REPLACED by its element; empty-array rows drop
    val bare = spark.sql(
      "SELECT id, arr FROM aj_src ARRAY JOIN arr ORDER BY id, arr").collect()
    assert(bare.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (1L, "b"), (2L, "c")))
    // AS e: the array column stays, the element rides alongside
    val al = spark.sql(
      "SELECT id, e, size(arr) AS n FROM aj_src ARRAY JOIN arr AS e ORDER BY id, e")
      .collect()
    assert(al.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "a", 2), (1L, "b", 2), (2L, "c", 1)))
    // LEFT keeps the empty-array row, element NULL (documented divergence
    // from ClickHouse's type default)
    val lj = spark.sql(
      "SELECT id, e FROM aj_src LEFT ARRAY JOIN arr AS e ORDER BY id, e").collect()
    assert(lj.length == 4 && lj.last.getLong(0) == 3L && lj.last.isNullAt(1))
    // a REAL join whose left side is aliased `array` stays a join
    Seq((1L, 10L)).toDF("id", "v").createOrReplaceTempView("aj_other")
    val real = spark.sql("SELECT array.id, o.v FROM aj_src array " +
      "JOIN aj_other o ON array.id = o.id").collect()
    assert(real.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 10L)))
    // multi-array form ZIPS positionally (ClickHouse's parallel arrays):
    // bare first column replaced, AS second rides alongside
    Seq((1L, Seq("a", "b"), Seq(10L, 20L)), (2L, Seq("c"), Seq(30L)))
      .toDF("id", "ks", "vs").createOrReplaceTempView("aj_zip")
    val zip = spark.sql(
      "SELECT id, ks, v FROM aj_zip ARRAY JOIN ks, vs AS v ORDER BY id, ks")
      .collect()
    assert(zip.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "c", 30L)),
      "row i must carry (ks[i], vs[i])")
    // a duplicate array column is loud
    intercept[Exception] {
      spark.sql("SELECT id FROM aj_src ARRAY JOIN arr, arr").collect()
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

  test("LIMIT n BY followed by a plain LIMIT applies both (ClickHouse order)") {
    import spark.implicits._
    Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L), ("c", 5L))
      .toDF("g", "id").createOrReplaceTempView("lb_fl")
    val rows = spark.sql(
      "SELECT g, id FROM lb_fl ORDER BY g, id LIMIT 1 BY g LIMIT 2").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 3L),
      "one per group, then the first two groups overall")
  }

  test("DISTINCT ON folds to LIMIT 1 BY: first row per group, deterministic") {
    import spark.implicits._
    Seq(("a", 3L, 30L), ("a", 1L, 10L), ("b", 2L, 20L), ("b", 4L, 40L),
        ("c", 5L, 50L))
      .toDF("g", "id", "v").createOrReplaceTempView("don_src")
    val rows = spark.sql(
      "SELECT DISTINCT ON (g) g, id, v FROM don_src ORDER BY g, id").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 2L), ("c", 5L)))
    // DESC pick: highest id per group
    val hi = spark.sql(
      "SELECT DISTINCT ON (g) g, id FROM don_src ORDER BY g, id DESC").collect()
    assert(hi.map(_.getLong(1)).toSeq == Seq(3L, 4L, 5L))
    // trailing plain LIMIT applies AFTER the per-group pick
    val lim = spark.sql(
      "SELECT DISTINCT ON (g) g, id FROM don_src ORDER BY g, id LIMIT 2")
      .collect()
    assert(lim.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    // no ORDER BY → loud refusal (nondeterministic pick)
    intercept[Exception] {
      spark.sql("SELECT DISTINCT ON (g) g, id FROM don_src").collect()
    }
    // plain SELECT DISTINCT stays standard Spark
    assert(spark.sql("SELECT DISTINCT g FROM don_src").count() == 3)
    // composes as a subquery: the inner DISTINCT ON re-enters the parser
    val sub = spark.sql(
      """SELECT count(*) AS c FROM (
        |  SELECT DISTINCT ON (g) g, id FROM don_src ORDER BY g, id)""".stripMargin)
      .collect().head.getLong(0)
    assert(sub == 3L)
  }
}
