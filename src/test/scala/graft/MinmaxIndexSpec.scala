package graft

import graft.mergetree._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Part-level minmax skip index (ClickHouse `minmax`, lifted from granule
  * to part): declared non-key columns carry manifest bounds written from
  * the part's own footers; scanWhere prunes driver-side and stays exact.
  */
class MinmaxIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def mkTable(dir: String, minmax: Seq[String]): ColumnarMergeTree = {
    val schema = Seq((1L, 1L, 1.0, "a")).toDF("k", "ts", "score", "tag").schema
    ColumnarMergeTree.create(spark, dir, schema, orderBy = Seq("k"),
      config = MergeTreeConfig(minmaxColumns = minmax))
  }

  private def batch(ks: Range, tsBase: Long, scoreBase: Double, tag: String) =
    ks.map(k => (k.toLong, tsBase + k, scoreBase + k, s"$tag$k"))
      .toDF("k", "ts", "score", "tag")

  test("scanWhere prunes parts by long/double/string bounds and stays exact") {
    val dir = Files.createTempDirectory("cmt_minmax_").toString
    val t = mkTable(dir, Seq("ts", "score", "tag"))
    // three parts with disjoint ts/score ranges but overlapping keys
    t.insertBatch(batch(0 until 100, 1000L, 0.5, "a"))
    t.insertBatch(batch(0 until 100, 5000L, 500.5, "b"))
    t.insertBatch(batch(0 until 100, 9000L, 900.5, "c"))

    val hit = t.scanWhere("ts", 5010L, 5020L)
    assert(t.lastPruning == (1, 3), s"ts range hits one part: ${t.lastPruning}")
    assert(hit.count() == 11)

    val byScore = t.scanWhere("score", 950.0, 1500.0)
    assert(t.lastPruning == (1, 3), s"score range hits one part: ${t.lastPruning}")
    assert(byScore.count() == 50)

    // lexicographic [b50, b59] over tags b0..b99: exactly b50..b59
    // (b5 sorts before b50; b6 sorts after b59)
    val byTag = t.scanWhere("tag", "b50", "b59")
    assert(t.lastPruning == (1, 3), s"tag range hits one part: ${t.lastPruning}")
    assert(byTag.count() == 10)

    val none = t.scanWhere("ts", 100000L, 200000L)
    assert(t.lastPruning == (0, 3))
    assert(none.count() == 0)
  }

  test("physical-encoded types (timestamp/decimal/date) record no bounds and never prune") {
    // Parquet stats for these types are the PHYSICAL encoding (epoch
    // micros, unscaled ints) — bounds built from them would compare against
    // logical predicate values and prune parts the predicate matches, so
    // eligibility is decided by the schema type: they get no entry at all.
    val dir = Files.createTempDirectory("cmt_minmax_enc_").toString
    val df = spark.range(100).select(
      col("id").as("k"),
      expr("timestamp_micros(1700000000000000 + id * 1000000)").as("ts"),
      col("id").cast("decimal(10,2)").as("price"),
      expr("date_add(date'2024-01-01', cast(id as int))").as("d"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"),
      config = MergeTreeConfig(minmaxColumns = Seq("ts", "price", "d")))
    t.insertBatch(df.filter(col("k") < 50))
    t.insertBatch(df.filter(col("k") >= 50))
    assert(t.parts.forall(_.colStats.isEmpty),
      "no minmax entry may be recorded for physical-encoded types")
    // scanWhere stays correct — unpruned, never crashing on a cast
    val hit = t.scanWhere("price",
      new java.math.BigDecimal("10.00"), new java.math.BigDecimal("19.00"))
    assert(t.lastPruning == (2, 2), "unsupported type must scan all parts")
    assert(hit.count() == 10)
  }

  test("results equal an unindexed filter (pruning is only an optimization)") {
    val dir = Files.createTempDirectory("cmt_minmax_eq_").toString
    val t = mkTable(dir, Seq("ts"))
    t.insertBatch(batch(0 until 50, 1000L, 0.0, "x"))
    t.insertBatch(batch(50 until 100, 1025L, 0.0, "y")) // ts ranges overlap
    val idx = t.scanWhere("ts", 1040L, 1080L).orderBy("k", "ts").collect()
    val raw = t.scan().filter(col("ts").between(1040L, 1080L))
      .orderBy("k", "ts").collect()
    assert(idx.toSeq == raw.toSeq)
  }

  test("a NaN in a double column never causes pruning of real in-range rows") {
    // NaN poisons math.min/max folds (min(x, NaN) = NaN) and orders above
    // +Inf under Double.compare, so a NaN-tainted bound would prune a part
    // for ANY upper-bounded predicate — silently dropping the part's real
    // in-range rows. The part must stay unbounded (read) instead.
    val dir = Files.createTempDirectory("cmt_minmax_nan_").toString
    val t = mkTable(dir, Seq("score"))
    // one part mixing a NaN with genuinely in-range scores
    t.insertBatch(Seq(
      (1L, 1000L, 10.0, "n1"),
      (2L, 1001L, Double.NaN, "n2"),
      (3L, 1002L, 20.0, "n3")).toDF("k", "ts", "score", "tag"))
    // and one far-away part that legitimately prunes
    t.insertBatch(batch(100 until 110, 2000L, 5000.0, "far"))

    val hit = t.scanWhere("score", 0.0, 100.0) // upper-bounded range
    assert(hit.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L),
      "real in-range rows in the NaN part must survive")
    assert(t.lastPruning._1 >= 1, s"NaN part was read: ${t.lastPruning}")
  }

  test("pre-index parts are never pruned; config persists across reopen") {
    val dir = Files.createTempDirectory("cmt_minmax_pre_").toString
    val schema = Seq((1L, 1L, 1.0, "a")).toDF("k", "ts", "score", "tag").schema
    // created WITHOUT the index: this part carries no bounds
    val t0 = ColumnarMergeTree.create(spark, dir, schema, orderBy = Seq("k"))
    t0.insertBatch(batch(0 until 10, 1000L, 0.0, "p"))

    // declare the index by reopening with config (simulating an upgraded
    // opener writing to a shared table whose tabledef predates the field)
    val t1 = ColumnarMergeTree.open(spark, dir, schema, Seq("k"),
      MergeTreeConfig(minmaxColumns = Seq("ts")))
    t1.insertBatch(batch(0 until 10, 99000L, 0.0, "q"))

    val out = t1.scanWhere("ts", 1000L, 1005L)
    assert(t1.lastPruning == (1, 2),
      s"stat-less part always read, far part pruned: ${t1.lastPruning}")
    assert(out.count() == 6)

    // self-describing reopen of a table CREATED with the index keeps it
    val dir2 = Files.createTempDirectory("cmt_minmax_reopen_").toString
    val t2 = mkTable(dir2, Seq("ts"))
    t2.insertBatch(batch(0 until 10, 1000L, 0.0, "r"))
    val t3 = ColumnarMergeTree.open(spark, dir2)
    t3.insertBatch(batch(0 until 10, 99000L, 0.0, "s"))
    t3.scanWhere("ts", 99000L, 99009L)
    assert(t3.lastPruning == (1, 2),
      s"reopened table still writes + prunes bounds: ${t3.lastPruning}")
  }

  test("SQL face: minmaxColumns DDL option persists into the tabledef") {
    val dir = Files.createTempDirectory("cmt_minmax_sql_").toString
    spark.sql(s"""CREATE TABLE mmx_t (k BIGINT, ts BIGINT, v DOUBLE)
      USING mergetree
      OPTIONS (orderBy 'k', minmaxColumns 'ts')
      LOCATION '$dir'""")
    try {
      spark.sql("INSERT INTO mmx_t SELECT id, id + 1000, id * 0.5 FROM range(100)")
      spark.sql("INSERT INTO mmx_t SELECT id, id + 90000, id * 0.5 FROM range(100)")
      val t = ColumnarMergeTree.open(spark, dir)
      t.scanWhere("ts", 90000L, 90010L)
      assert(t.lastPruning == (1, 2),
        s"SQL-inserted parts carry minmax bounds: ${t.lastPruning}")
    } finally spark.sql("DROP TABLE mmx_t")
  }

  test("SQL WHERE on a minmax column prunes parts through the connector") {
    import graft.sources.GenericMergeTreeScan
    val dir = Files.createTempDirectory("cmt_minmax_sql2_").toString
    spark.sql(s"""CREATE TABLE mmx_sql (k BIGINT, ts BIGINT, v DOUBLE)
      USING mergetree
      OPTIONS (orderBy 'k', minmaxColumns 'ts,v')
      LOCATION '$dir'""")
    try {
      // three parts, overlapping k but disjoint ts/v ranges
      spark.sql("INSERT INTO mmx_sql SELECT id, id + 1000,  id * 1.0 FROM range(100)")
      spark.sql("INSERT INTO mmx_sql SELECT id, id + 50000, id * 1.0 + 1000 FROM range(100)")
      spark.sql("INSERT INTO mmx_sql SELECT id, id + 90000, id * 1.0 + 2000 FROM range(100)")

      val byTs = spark.sql(
        "SELECT k, ts FROM mmx_sql WHERE ts BETWEEN 50010 AND 50020").collect()
      assert(byTs.length == 11)
      assert(GenericMergeTreeScan.lastPruning.get() == ((1, 3)),
        s"ts predicate prunes to 1/3 parts: ${GenericMergeTreeScan.lastPruning.get()}")

      val byV = spark.sql(
        "SELECT k FROM mmx_sql WHERE v >= 2050.0").collect()
      assert(byV.length == 50)
      assert(GenericMergeTreeScan.lastPruning.get() == ((1, 3)),
        s"one-sided double predicate prunes: ${GenericMergeTreeScan.lastPruning.get()}")

      val none = spark.sql(
        "SELECT k FROM mmx_sql WHERE ts > 200000").collect()
      assert(none.isEmpty)
      assert(GenericMergeTreeScan.lastPruning.get() == ((0, 3)))

      // key predicate still prunes via the primary path, composed with minmax
      val both = spark.sql(
        "SELECT k FROM mmx_sql WHERE k <= 200 AND ts BETWEEN 1000 AND 1099").collect()
      assert(both.length == 100)
      assert(GenericMergeTreeScan.lastPruning.get() == ((1, 3)))
    } finally spark.sql("DROP TABLE mmx_sql")
  }

  test("merges recompute bounds for the compacted part") {
    val dir = Files.createTempDirectory("cmt_minmax_opt_").toString
    val t = mkTable(dir, Seq("ts"))
    t.insertBatch(batch(0 until 50, 1000L, 0.0, "m"))
    t.insertBatch(batch(50 until 100, 8000L, 0.0, "n"))
    t.optimizeFinal()
    t.refresh()
    assert(t.partCount == 1)
    t.scanWhere("ts", 1000L, 1010L)
    assert(t.lastPruning == (1, 1), "merged part carries merged bounds")
    t.scanWhere("ts", 500000L, 600000L)
    assert(t.lastPruning == (0, 1), s"out-of-range prunes the merged part: ${t.lastPruning}")
  }
}
