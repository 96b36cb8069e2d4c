package graft

import graft.functions.GraftFunctions
import graft.sources.ChCreateTable
import org.scalatest.funsuite.AnyFunSuite

/** The round-16 second-wave SQL dialect surfaces: parametric aggregates
  * (`f(params)(args)`), quoted datetime units, and ClickHouse-native
  * CREATE TABLE DDL (ChCreateTable).
  */
class ChSqlDialectSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.session
    GraftFunctions.register(s)
    s
  }

  test("parametric quantile/quantiles rewrite to percentile") {
    import spark.implicits._
    (1 to 9).map(_.toLong).toDF("v").createOrReplaceTempView("pq_t")
    val r = spark.sql(
      """SELECT quantile(0.5)(v) AS p50,
        |  quantileExact(0.25)(v) AS p25,
        |  array_join(transform(quantiles(0.25, 0.75)(v),
        |    e -> CAST(e AS STRING)), ',') AS qs
        |FROM pq_t""".stripMargin).collect().head
    assert(r.getAs[Double]("p50") == 5.0)
    assert(r.getAs[Double]("p25") == 3.0)
    assert(r.getAs[String]("qs") == "3.0,7.0")
    // the approximate family goes to percentile_approx — exact here, and
    // (like ClickHouse's quantileExact) it returns an ACTUAL element, so
    // the result keeps the input's type
    val td = spark.sql("SELECT quantileTDigest(0.5)(v) AS p FROM pq_t")
      .collect().head
    assert(td.getLong(0) == 5L)
  }

  test("parametric topK/topKWeighted slice the SpaceSaving sketch") {
    import spark.implicits._
    (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c"))
      .toDF("s").createOrReplaceTempView("pt_t")
    val r = spark.sql(
      """SELECT array_join(topK(2)(s), ',') AS t2,
        |  array_join(topKWeighted(2)(s, 10), ',') AS tw
        |FROM pt_t""".stripMargin).collect().head
    assert(r.getAs[String]("t2") == "a,b")
    assert(r.getAs[String]("tw") == "a,b")
    val err = intercept[Exception] {
      spark.sql("SELECT topK(99)(s) FROM pt_t").collect()
    }
    assert(err.getMessage.contains("out of [1, 50]"))
  }

  test("parametric uniqUpTo saturates at n+1; groupArray(n) slices") {
    import spark.implicits._
    (1 to 30).map(i => (s"v${i % 12}", i)).toDF("s", "i")
      .createOrReplaceTempView("pu_t")
    val r = spark.sql(
      """SELECT uniqUpTo(20)(s) AS u20, uniqUpTo(5)(s) AS u5,
        |  size(groupArray(7)(s)) AS ga7,
        |  size(groupUniqArray(3)(s)) AS gu3
        |FROM pu_t""".stripMargin).collect().head
    assert(r.getAs[Long]("u20") == 12L) // exact below the cap
    assert(r.getAs[Long]("u5") == 6L)   // saturated at n+1
    assert(r.getAs[Int]("ga7") == 7 && r.getAs[Int]("gu3") == 3)
  }

  test("parametric names inside string literals are data") {
    val r = spark.sql("SELECT 'quantile(0.5)(x)' AS s").collect().head
    assert(r.getString(0) == "quantile(0.5)(x)")
  }

  test("quoted datetime units unquote for dateDiff/dateAdd; data stays") {
    val r = spark.sql(
      """SELECT dateDiff('day', DATE'2024-01-03', DATE'2024-01-10') AS dd,
        |  dateDiff('hour', TIMESTAMP'2024-01-01 00:00:00',
        |           TIMESTAMP'2024-01-01 06:30:00') AS dh,
        |  dateAdd('month', 2, TIMESTAMP'2024-01-15 00:00:00') AS dm,
        |  date_add('2024-01-01', 3) AS plain
        |FROM (SELECT 1)""".stripMargin).collect().head
    assert(r.getAs[Long]("dd") == 7L && r.getAs[Long]("dh") == 6L)
    assert(r.getAs[java.sql.Timestamp]("dm").toString.startsWith("2024-03-15"))
    assert(r.getAs[java.sql.Date]("plain").toString == "2024-01-04")
  }

  test("LIMIT n WITH TIES keeps the n-th row's whole tie group") {
    import spark.implicits._
    Seq(1, 2, 2, 2, 3, 3).map(v => (v, s"r$v")).toDF("v", "s")
      .createOrReplaceTempView("lwt_t")
    val got = spark.sql("SELECT v FROM lwt_t ORDER BY v LIMIT 2 WITH TIES")
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 2, 2, 2), s"rank<=2 keeps all the 2s: $got")
    val one = spark.sql("SELECT v FROM lwt_t ORDER BY v DESC LIMIT 1 WITH TIES")
      .collect().map(_.getInt(0)).toSeq
    assert(one == Seq(3, 3))
    // plain LIMIT (no TIES) keeps Spark semantics
    assert(spark.sql("SELECT v FROM lwt_t ORDER BY v LIMIT 2").count() == 2)
  }

  test("statement-end clauses compose inside subqueries") {
    import spark.implicits._
    Seq((0L, 5L), (2L, 7L), (5L, 1L)).toDF("b", "v")
      .createOrReplaceTempView("sub_fill_t")
    // WITH FILL inside FROM (…): the grid lands, the outer aggregates it
    val n = spark.sql(
      """SELECT count(*) AS n, sum(v) AS s FROM (
        |  SELECT b, v FROM sub_fill_t ORDER BY b WITH FILL FROM 0 TO 10
        |) g""".stripMargin).collect().head
    assert(n.getLong(0) == 10L, s"10-point grid inside the subquery: $n")
    assert(n.getLong(1) == 13L) // fill rows carry the type default 0
    // two fill subqueries JOIN on the grid key
    val j = spark.sql(
      """SELECT count(*) AS n FROM
        |  (SELECT b FROM sub_fill_t ORDER BY b WITH FILL FROM 0 TO 6) a
        |JOIN
        |  (SELECT b FROM sub_fill_t ORDER BY b WITH FILL FROM 3 TO 9) c
        |ON a.b = c.b""".stripMargin).collect().head.getLong(0)
    // a = grid {0..5}; c = grid {3..8} PLUS the off-grid originals 0 and 2
    // (original rows off the grid survive — the documented contract), so
    // the join meets on {0, 2, 3, 4, 5}
    assert(j == 5L, s"grid ∩ (grid + off-grid originals): $j")
    // LIMIT BY and LIMIT WITH TIES inside subqueries
    Seq(("g1", 1), ("g1", 2), ("g1", 3), ("g2", 1), ("g2", 2))
      .toDF("g", "v").createOrReplaceTempView("sub_lb_t")
    val lb = spark.sql(
      """SELECT count(*) AS n FROM (
        |  SELECT g, v FROM sub_lb_t ORDER BY g, v DESC LIMIT 2 BY g
        |) s""".stripMargin).collect().head.getLong(0)
    assert(lb == 4L)
    val wt = spark.sql(
      """SELECT count(*) AS n FROM (
        |  SELECT v FROM sub_lb_t ORDER BY v LIMIT 3 WITH TIES
        |) s""".stripMargin).collect().head.getLong(0)
    assert(wt == 4L) // sorted 1,1,2,2,3: the 3rd row's tie group survives
    // plain parenthesized expressions and IN (...) subqueries untouched
    val ok = spark.sql(
      "SELECT (1 + 2) AS a, 3 IN (SELECT v FROM sub_lb_t) AS b")
      .collect().head
    assert(ok.getInt(0) == 3 && ok.getBoolean(1))
  }

  test("ClickHouse type mapping") {
    assert(ChCreateTable.chTypeToSpark("UInt64") == "BIGINT")
    assert(ChCreateTable.chTypeToSpark("Nullable(Float32)") == "FLOAT")
    assert(ChCreateTable.chTypeToSpark("LowCardinality(String)") == "STRING")
    assert(ChCreateTable.chTypeToSpark("Array(Nullable(UInt8))") == "ARRAY<SMALLINT>")
    assert(ChCreateTable.chTypeToSpark("Map(String, UInt32)") == "MAP<STRING, BIGINT>")
    assert(ChCreateTable.chTypeToSpark("Tuple(a UInt8, b String)") ==
      "STRUCT<a: SMALLINT, b: STRING>")
    assert(ChCreateTable.chTypeToSpark("Decimal(10, 2)") == "DECIMAL(10, 2)")
    assert(ChCreateTable.chTypeToSpark("Decimal64(4)") == "DECIMAL(18, 4)")
    assert(ChCreateTable.chTypeToSpark("DateTime64(3)") == "TIMESTAMP")
    assert(ChCreateTable.chTypeToSpark("Enum8('a' = 1, 'b' = 2)") == "STRING")
    assert(ChCreateTable.chTypeToSpark("FixedString(16)") == "STRING")
    intercept[IllegalArgumentException](ChCreateTable.chTypeToSpark("Int128"))
    intercept[IllegalArgumentException](
      ChCreateTable.chTypeToSpark("Tuple(UInt8, String)")) // positional
    intercept[IllegalArgumentException](
      ChCreateTable.chTypeToSpark("AggregateFunction(sum, UInt64)"))
  }

  test("ChCreateTable.rewrite: the full clause set") {
    val ddl = ChCreateTable.rewrite(
      """CREATE TABLE IF NOT EXISTS graft.ns.t ON CLUSTER main (
        |  id UInt64,
        |  s  LowCardinality(String) CODEC(ZSTD) COMMENT 'tag',
        |  d  Date,
        |  v  Nullable(Float64) DEFAULT 0,
        |  n  Int32 NOT NULL
        |) ENGINE = ReplacingMergeTree(id)
        |PARTITION BY toYYYYMM(d)
        |PRIMARY KEY id
        |ORDER BY (id, d)
        |SAMPLE BY id
        |TTL d + INTERVAL 90 DAY DELETE
        |SETTINGS index_granularity = 8192, storage_policy = 'hot'""".stripMargin).get
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS graft.ns.t"))
    assert(ddl.contains("USING mergetree"))
    assert(ddl.contains("`id` BIGINT"))
    assert(ddl.contains("`s` STRING COMMENT 'tag'"))
    assert(ddl.contains("`v` DOUBLE"))
    assert(ddl.contains("`n` INT NOT NULL"))
    assert(ddl.contains("orderBy 'id,d'"))
    assert(ddl.contains("mode 'replacing'"))
    assert(ddl.contains("keys 'id,d'"))
    assert(ddl.contains("version 'id'"))
    assert(ddl.contains("partitionBy 'toYYYYMM(d)'"))
    assert(ddl.contains("sampleBy 'id'"))
    assert(ddl.contains("ttl '(d + INTERVAL 90 DAY) <= current_timestamp()'"))
  }

  test("ChCreateTable.rewrite: engines, defaults, refusals") {
    def rw(s: String) = ChCreateTable.rewrite(s)
    // not ClickHouse DDL → None (standard Spark DDL untouched)
    assert(rw("CREATE TABLE t (a BIGINT) USING parquet").isEmpty)
    assert(rw("SELECT 'ENGINE = MergeTree()'").isEmpty)
    // SummingMergeTree with no args sums every numeric non-key column
    val sum = rw(
      """CREATE TABLE t (k UInt64, a Int64, b Float64, s String)
        |ENGINE = SummingMergeTree() ORDER BY k
        |LOCATION '/tmp/x'""".stripMargin).get
    assert(sum.contains("mode 'summing'") && sum.contains("sums 'a,b'"))
    // VersionedCollapsing → collapsing + sign + version
    val vc = rw(
      """CREATE TABLE graft.ns.c (k UInt64, sign Int8, ver UInt64)
        |ENGINE = VersionedCollapsingMergeTree(sign, ver) ORDER BY k""".stripMargin).get
    assert(vc.contains("mode 'collapsing'") && vc.contains("sign 'sign'") &&
      vc.contains("version 'ver'"))
    // refusals, each loud
    def refuses(s: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](rw(s))
      assert(e.getMessage.contains(frag), s"wanted '$frag' in: ${e.getMessage}")
    }
    refuses("CREATE TABLE t (k UInt64) ENGINE = Memory ORDER BY k LOCATION '/tmp/x'",
      "unsupported ENGINE")
    refuses("CREATE TABLE t (k UInt64) ENGINE = AggregatingMergeTree() ORDER BY k LOCATION '/tmp/x'",
      "options face")
    refuses("CREATE TABLE t (k UInt64) ENGINE = MergeTree ORDER BY tuple() LOCATION '/tmp/x'",
      "tuple()")
    refuses("CREATE TABLE t (k UInt64, v UInt64 MATERIALIZED k + 1) ENGINE = MergeTree ORDER BY k LOCATION '/tmp/x'",
      "MATERIALIZED")
    refuses("CREATE TABLE t (k UInt64) ENGINE = MergeTree ORDER BY k TTL d TO DISK 'x' LOCATION '/tmp/x'",
      "TO DISK")
    refuses("CREATE TABLE t (k UInt64) ENGINE = MergeTree ORDER BY k SETTINGS join_use_nulls = 1 LOCATION '/tmp/x'",
      "could change table semantics")
    refuses("CREATE TABLE t (k UInt64) ENGINE = MergeTree ORDER BY k",
      "LOCATION")
    refuses("CREATE TABLE t (k UInt64, d Date) ENGINE = MergeTree PRIMARY KEY d ORDER BY (k, d) LOCATION '/tmp/x'",
      "prefix")
  }

  test("in-list INDEX declarations map to skip-index options; PROJECTION refuses") {
    val ddl = ChCreateTable.rewrite(
      """CREATE TABLE graft.ns.ix (
        |  k UInt64,
        |  body String,
        |  lang LowCardinality(String),
        |  INDEX idx_body body TYPE tokenbf_v1(32768, 3, 0) GRANULARITY 4,
        |  INDEX idx_lang lang TYPE set(100),
        |  INDEX idx_k k TYPE minmax
        |) ENGINE = MergeTree ORDER BY k""".stripMargin).get
    assert(ddl.contains("tokenBloomColumns 'body'"))
    assert(ddl.contains("setIndexColumns 'lang'"))
    assert(ddl.contains("minmaxColumns 'k'"))
    assert(!ddl.contains("INDEX"), "index entries must leave the column list")
    val e = intercept[IllegalArgumentException](ChCreateTable.rewrite(
      """CREATE TABLE graft.ns.p (k UInt64,
        |  PROJECTION p1 (SELECT k ORDER BY k)
        |) ENGINE = MergeTree ORDER BY k""".stripMargin))
    assert(e.getMessage.contains("projections 'name:cols'"))
  }

  test("show_create round-trips: rewrite(showCreate(dir)) reproduces the options") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ch_showcreate_").toString
    spark.sql(
      s"""CREATE TABLE ch_sc_rt (
         |  k UInt64, ver UInt64, body String, d Date,
         |  INDEX ib body TYPE ngrambf_v1(3, 32768, 3, 0)
         |) ENGINE = ReplacingMergeTree(ver)
         |PARTITION BY k % 4
         |ORDER BY (k, d)
         |SAMPLE BY k
         |TTL d + INTERVAL 90 DAY
         |LOCATION '$dir/t'""".stripMargin)
    try {
      val stmt = spark.sql(s"SELECT create_table_query FROM show_create('$dir/t')")
        .collect().head.getString(0)
      assert(stmt.contains("ReplacingMergeTree(ver)"))
      assert(stmt.contains("ORDER BY (k, d)"))
      assert(stmt.contains("PARTITION BY k % 4"))
      assert(stmt.contains("SAMPLE BY k"))
      assert(stmt.contains("TTL d + INTERVAL 90 DAY"))
      assert(stmt.contains("INDEX idx_body `body` TYPE ngrambf_v1"))
      // the inverse: the emitted ClickHouse DDL parses back to the SAME
      // option set (modulo the lost unsigned widths, documented)
      val back = ChCreateTable.rewrite(
        stmt.replace(s"CREATE TABLE `$dir/t`",
          s"CREATE TABLE rt2 ") + s"\nLOCATION '$dir/t2'").get
      Seq("orderBy 'k,d'", "mode 'replacing'", "version 'ver'",
        "partitionBy 'k % 4'", "sampleBy 'k'",
        "ngramBloomColumns 'body'",
        "ttl '(d + INTERVAL 90 DAY) <= current_timestamp()'")
        .foreach(frag => assert(back.contains(frag), s"missing $frag in: $back"))
    } finally spark.sql("DROP TABLE IF EXISTS ch_sc_rt")
  }

  test("ClickHouse CREATE TABLE end-to-end: create, insert, FINAL read") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ch_ddl_e2e_").toString
    spark.sql(
      s"""CREATE TABLE ch_ddl_e2e (
         |  k UInt64, ver UInt64, v Float64
         |) ENGINE = ReplacingMergeTree(ver) ORDER BY k
         |SETTINGS index_granularity = 8192
         |LOCATION '$dir/t'""".stripMargin)
    try {
      Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("k", "ver", "v")
        .createOrReplaceTempView("ch_e2e_in1")
      Seq((1L, 2L, 11.0), (3L, 1L, 30.0)).toDF("k", "ver", "v")
        .createOrReplaceTempView("ch_e2e_in2")
      spark.sql("INSERT INTO ch_ddl_e2e SELECT * FROM ch_e2e_in1")
      spark.sql("INSERT INTO ch_ddl_e2e SELECT * FROM ch_e2e_in2")
      val fin = spark.sql("SELECT k, ver, v FROM ch_ddl_e2e FINAL ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(fin == Seq((1L, 2L, 11.0), (2L, 1L, 20.0), (3L, 1L, 30.0)))
    } finally spark.sql("DROP TABLE IF EXISTS ch_ddl_e2e")
  }

  test("numbers() table function: both arities, aliases, numbers_mt") {
    val one = spark.sql("SELECT number FROM numbers(5)")
      .collect().map(_.getLong(0)).toSeq
    assert(one == Seq(0L, 1L, 2L, 3L, 4L))
    // two-arg = offset, count; explicit alias; clause keyword right after
    // the call must NOT be eaten as an alias
    val two = spark.sql(
      "SELECT n.number FROM numbers(10, 3) AS n WHERE n.number > 10")
      .collect().map(_.getLong(0)).toSeq
    assert(two == Seq(11L, 12L))
    val filtered = spark.sql(
      "SELECT number FROM numbers_mt(100) WHERE number % 25 = 0 ORDER BY number")
      .collect().map(_.getLong(0)).toSeq
    assert(filtered == Seq(0L, 25L, 50L, 75L))
    // the implicit alias is `numbers`, exactly ClickHouse's table name
    val qualified = spark.sql(
      "SELECT numbers.number FROM numbers(3) ORDER BY numbers.number DESC")
      .collect().map(_.getLong(0)).toSeq
    assert(qualified == Seq(2L, 1L, 0L))
    // a string literal containing the call shape is NOT rewritten
    val lit = spark.sql("SELECT 'FROM numbers(3)' AS s").collect().head
    assert(lit.getString(0) == "FROM numbers(3)")
  }

  test("star REPLACE keeps column position; composes with EXCEPT") {
    import spark.implicits._
    Seq((1L, 2L, 3L), (4L, 5L, 6L)).toDF("a", "b", "c")
      .createOrReplaceTempView("sr_t")
    val df = spark.sql("SELECT * REPLACE (b * 10 AS b) FROM sr_t ORDER BY a")
    assert(df.columns.toSeq == Seq("a", "b", "c"), "b stays IN PLACE")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((1L, 20L, 3L), (4L, 50L, 6L)))
    // EXCEPT + REPLACE combined (Spark parses neither combined form)
    val both = spark.sql(
      "SELECT * EXCEPT (c) REPLACE (a + 100 AS a) FROM sr_t ORDER BY b")
    assert(both.columns.toSeq == Seq("a", "b"))
    assert(both.collect().map(_.getLong(0)).toSeq == Seq(101L, 104L))
    // qualified star; plain * EXCEPT stays Spark-native
    val qual = spark.sql(
      "SELECT t.* REPLACE (c - 1 AS c) FROM sr_t t ORDER BY a")
    assert(qual.collect().map(_.getLong(2)).toSeq == Seq(2L, 5L))
    assert(spark.sql("SELECT * EXCEPT (a) FROM sr_t").columns.toSeq ==
      Seq("b", "c"))
    // unknown replaced column is loud
    intercept[Exception] {
      spark.sql("SELECT * REPLACE (1 AS nope) FROM sr_t").collect()
    }
    // a string literal carrying the shape is data
    val lit = spark.sql("SELECT '* REPLACE (x AS y)' AS s FROM sr_t LIMIT 1")
      .collect().head.getString(0)
    assert(lit == "* REPLACE (x AS y)")
  }

  test("COLUMNS('regex') expands matching columns, also as function args") {
    import spark.implicits._
    Seq((1L, 2L, 3L, "x")).toDF("k_a", "k_b", "v", "s")
      .createOrReplaceTempView("cols_t")
    val df = spark.sql("SELECT COLUMNS('^k_') FROM cols_t")
    assert(df.columns.toSeq == Seq("k_a", "k_b"))
    // function-argument expansion — ClickHouse's other COLUMNS use
    val sum2 = spark.sql(
      "SELECT k_a + k_b AS manual, hash(COLUMNS('^k_')) AS h FROM cols_t")
    assert(sum2.columns.toSeq == Seq("manual", "h"))
    // alongside ordinary items
    val mixed = spark.sql("SELECT s, COLUMNS('^k_') FROM cols_t")
    assert(mixed.columns.toSeq == Seq("s", "k_a", "k_b"))
  }

  test("WITH expression macros: constants, row exprs, scalar subqueries") {
    import spark.implicits._
    Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 30.0), ("b", 4L, 40.0))
      .toDF("g", "id", "v").createOrReplaceTempView("wm_t")
    // constant + per-row expression macro, used inside an aggregate
    val r = spark.sql(
      """WITH 2 AS cap, v * 10 AS v10
        |SELECT g, sum(v10) AS s FROM wm_t WHERE id <= cap
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(r.map(x => (x.getString(0), x.getDouble(1))).toSeq ==
      Seq(("a", 300.0)))
    // scalar-subquery macro in WHERE arithmetic
    val sc = spark.sql(
      """WITH (SELECT max(id) FROM wm_t) AS top
        |SELECT id FROM wm_t WHERE id > top - 2 ORDER BY id""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(sc == Seq(3L, 4L))
    // macro referencing an EARLIER macro; mixing with a standard CTE
    val mixed = spark.sql(
      """WITH 5 AS base, base * 2 AS dbl,
        |  big AS (SELECT id FROM wm_t WHERE id >= 3)
        |SELECT id + dbl AS x FROM big ORDER BY x""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(mixed == Seq(13L, 14L))
    // standard-only WITH is untouched; the macro name as a literal is data
    assert(spark.sql(
      "WITH c AS (SELECT count(*) AS n FROM wm_t) SELECT n FROM c")
      .collect().head.getLong(0) == 4L)
    val lit = spark.sql(
      "WITH 9 AS k SELECT 'k keeps k' AS s, k FROM wm_t WHERE id = k - 8")
      .collect().head
    assert(lit.getString(0) == "k keeps k" && lit.getInt(1) == 9)
  }

  test("collection literals: [..] arrays and {k: v} maps; subscripts stay") {
    import spark.implicits._
    val r = spark.sql("SELECT [1, 2, 3] AS a, [1, 2][0] AS first").collect().head
    assert(r.getSeq[Int](0) == Seq(1, 2, 3))
    assert(r.getInt(1) == 1, "subscript on a literal still subscripts")
    // nested arrays; literal as function argument (ClickHouse has())
    val n = spark.sql(
      "SELECT [[1], [2, 3]] AS nested, array_contains([5, 6], 6) AS has6")
      .collect().head
    assert(n.getSeq[Seq[Int]](0) == Seq(Seq(1), Seq(2, 3)) && n.getBoolean(1))
    // subscript on a column reference is untouched
    Seq((Seq(10, 20), 1)).toDF("arr", "i").createOrReplaceTempView("cl_t")
    assert(spark.sql("SELECT arr[1] FROM cl_t").collect().head.getInt(0) == 20)
    // map literal, array inside a map value, string keys with colons
    val m = spark.sql(
      "SELECT {'a': 1, 'b': 2}['b'] AS b, {'k:x': [7, 8]} AS km").collect().head
    assert(m.getInt(0) == 2)
    assert(m.getMap[String, scala.collection.Seq[Int]](1)("k:x").toSeq ==
      Seq(7, 8))
    // literals inside strings are data
    val s = spark.sql("SELECT '[1,2] and {3: 4}' AS s").collect().head
    assert(s.getString(0) == "[1,2] and {3: 4}")
  }

  test("ternary cond ? a : b maps to if(); nesting and AND-binding hold") {
    import spark.implicits._
    Seq((1L, 5.0), (2L, 15.0), (3L, 25.0)).toDF("id", "v")
      .createOrReplaceTempView("tern_t")
    val r = spark.sql(
      "SELECT id, v > 10 ? 'big' : 'small' AS size FROM tern_t ORDER BY id")
      .collect().map(_.getString(1)).toSeq
    assert(r == Seq("small", "big", "big"))
    // nested ternary in the else branch (ClickHouse chains them)
    val n = spark.sql(
      """SELECT id, v > 20 ? 'xl' : v > 10 ? 'l' : 's' AS size
        |FROM tern_t ORDER BY id""".stripMargin)
      .collect().map(_.getString(1)).toSeq
    assert(n == Seq("s", "l", "xl"))
    // AND binds tighter than ?: — (id > 1 AND v < 20) ? … ; and the
    // ternary composes inside a function argument and with GROUP BY after
    val a = spark.sql(
      "SELECT sum(id > 1 AND v < 20 ? 10 : 1) AS s FROM tern_t")
      .collect().head.getLong(0)
    assert(a == 12L, "rows: id1 -> 1, id2 -> 10, id3 -> 1")
    // '?' in a string literal is data
    val lit = spark.sql("SELECT 'a ? b : c' AS s FROM tern_t LIMIT 1")
      .collect().head.getString(0)
    assert(lit == "a ? b : c")
  }

  test("ClickHouse EXPLAIN verbs and system.one / system.numbers") {
    val ex = spark.sql("EXPLAIN PIPELINE SELECT 1 AS x").collect().head
      .getString(0)
    assert(ex.contains("Physical Plan"), "EXPLAIN PIPELINE -> FORMATTED")
    assert(spark.sql("EXPLAIN SYNTAX SELECT 1 AS x").collect().head
      .getString(0).nonEmpty)
    // system.one: the 1-row dummy relation
    val one = spark.sql("SELECT 42 AS v FROM system.one").collect()
    assert(one.length == 1 && one.head.getInt(0) == 42)
    // system.numbers is unbounded but lazy — LIMIT stops it
    val nums = spark.sql("SELECT number FROM system.numbers LIMIT 5")
      .collect().map(_.getLong(0)).toSeq
    assert(nums == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("INSERT FORMAT Values / JSONEachRow; SELECT INTO OUTFILE") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ch_ins_").toString
    spark.sql(
      s"""CREATE TABLE ch_ins_t (k UInt64, s String) ENGINE = MergeTree
         |ORDER BY k LOCATION '$dir/t'""".stripMargin)
    try {
      spark.sql("INSERT INTO ch_ins_t FORMAT Values (1, 'a'), (2, 'b')")
      spark.sql(
        """INSERT INTO ch_ins_t FORMAT JSONEachRow
          |{"k": 3, "s": "c"} {"k": 4, "s": "d, with {braces}"}""".stripMargin)
      val rows = spark.sql("SELECT k, s FROM ch_ins_t ORDER BY k").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
      assert(rows.last.getString(1) == "d, with {braces}")
      // INTO OUTFILE: one file at the exact path; refuses to overwrite
      val out = s"$dir/export.csv"
      val n = spark.sql(
        s"""SELECT k, s FROM ch_ins_t ORDER BY k
           |INTO OUTFILE '$out' FORMAT CSVWithNames""".stripMargin)
        .collect().head.getLong(0)
      assert(n == 4L)
      val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(out))
      assert(lines.size == 5 && lines.get(0) == "k,s" &&
        lines.get(1) == "1,a")
      intercept[Exception] {
        spark.sql(s"SELECT k FROM ch_ins_t INTO OUTFILE '$out'").collect()
      }
      // TRUNCATE overwrites; default format is TabSeparated
      spark.sql(
        s"SELECT k, s FROM ch_ins_t ORDER BY k INTO OUTFILE '$out' TRUNCATE")
        .collect()
      val tsv = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(out))
      assert(tsv.size == 4 && tsv.get(0) == "1\ta")
    } finally spark.sql("DROP TABLE IF EXISTS ch_ins_t")
  }

  test("QUALIFY filters window results; tail clauses stay outside the wrap") {
    import spark.implicits._
    Seq(("a", 1L, 30L), ("a", 2L, 20L), ("b", 3L, 50L), ("b", 4L, 40L),
        ("c", 5L, 10L))
      .toDF("g", "id", "v").createOrReplaceTempView("ql_t")
    // the idiomatic top-1-per-group via alias reference
    val top = spark.sql(
      """SELECT g, id, v,
        |  row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rn
        |FROM ql_t QUALIFY rn = 1 ORDER BY g""".stripMargin).collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(1L, 3L, 5L))
    // ORDER BY + LIMIT after QUALIFY apply to the filtered result
    val lim = spark.sql(
      """SELECT g, v, rank() OVER (ORDER BY v DESC) AS rk
        |FROM ql_t QUALIFY rk <= 3 ORDER BY v DESC LIMIT 2""".stripMargin)
      .collect()
    assert(lim.map(_.getLong(1)).toSeq == Seq(50L, 40L))
    // 'QUALIFY' inside a string literal is data
    val lit = spark.sql("SELECT 'no QUALIFY here' AS s").collect().head
    assert(lit.getString(0) == "no QUALIFY here")
  }

  test("arrayJoin() in function position expands rows like explode") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT number, arrayJoin(sequence(1L, number)) AS x
        |FROM numbers(1, 3) ORDER BY number, x""".stripMargin)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSeq
    assert(r == Seq((1L, 1L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L),
      (3L, 3L)))
    // empty arrays drop the row — ClickHouse's arrayJoin contract
    val empty = spark.sql(
      "SELECT arrayJoin(array()) AS x FROM numbers(2)").collect()
    assert(empty.isEmpty)
  }
}
