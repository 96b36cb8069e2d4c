package graft

import graft.functions.HllSketch
import graft.mergetree._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Per-part HLL `uniq` sketches: 2 KB sidecars at part write, table-wide
  * approximate distinct folded driver-side — the metadata answer to
  * count(DISTINCT) at scale.
  */
class HllSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def tolerance(exact: Long): Double = math.max(0.08 * exact, 8.0)

  test("raw sketch tracks exact cardinalities across magnitudes") {
    for (n <- Seq(10, 1000, 100000)) {
      val regs = HllSketch.empty
      // xxhash-free deterministic 64-bit mix (splitmix64) as the hash source
      var i = 0L
      while (i < n) {
        var z = i + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        HllSketch.add(regs, z ^ (z >>> 31))
        i += 1
      }
      val e = HllSketch.estimate(regs)
      assert(math.abs(e - n) <= tolerance(n), s"n=$n estimate=$e")
    }
  }

  test("approxDistinct folds part sidecars; merges rebuild them") {
    val dir = Files.createTempDirectory("hll_cmt_").toString
    val df = (0 until 4000).map(i => (i.toLong, s"u${i % 997}", i * 0.5))
      .toDF("id", "user", "v")
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("id"),
      config = MergeTreeConfig(hllColumns = Seq("user", "id")))
    // 4 separate inserts → 4 parts, each with its own sidecars
    (0 until 4).foreach { k =>
      t.insertBatch(df.filter(col("id") % 4 === k))
    }
    t.refresh()
    assert(t.partsDf.count() == 4)
    t.parts.map(_.partId).foreach { pid =>
      assert(Files.exists(Paths.get(dir, s"part_$pid", "_hll_user")), s"part $pid sidecar")
    }
    val eUser = t.approxDistinct("user")
    assert(math.abs(eUser - 997) <= tolerance(997), s"user estimate $eUser")
    val eId = t.approxDistinct("id")
    assert(math.abs(eId - 4000) <= tolerance(4000), s"id estimate $eId")
    // compaction rewrites parts through the same path → sidecars rebuilt,
    // estimate unchanged within tolerance (same value set)
    t.optimizeFinal()
    val eAfter = t.approxDistinct("user")
    assert(math.abs(eAfter - 997) <= tolerance(997), s"post-optimize $eAfter")
    assert(t.partsDf.count() == 1)
  }

  test("sidecar-less parts are sketched on the fly, then heal on merge") {
    val dir = Files.createTempDirectory("hll_heal_").toString
    val df = (0 until 1000).map(i => (i.toLong, s"k${i % 321}")).toDF("id", "k")
    // created WITHOUT the sketch: parts carry no sidecars
    val t0 = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("id"))
    t0.insertBatch(df)
    // reopen with the sketch declared (simulates declaring the index later)
    val t = ColumnarMergeTree.open(spark, dir,
      MergeTreeConfig(hllColumns = Seq("k")))
    val e = t.approxDistinct("k") // no sidecar anywhere → on-the-fly path
    assert(math.abs(e - 321) <= tolerance(321), s"fallback estimate $e")
    t.insertBatch(df.limit(10)) // new part written WITH a sidecar
    t.optimizeFinal()           // rewrite → single part, sidecar present
    t.refresh()
    t.parts.map(_.partId).foreach { pid =>
      assert(Files.exists(Paths.get(dir, s"part_$pid", "_hll_k")))
    }
    val e2 = t.approxDistinct("k")
    assert(math.abs(e2 - 321) <= tolerance(321), s"healed estimate $e2")
  }

  test("hllColumns persists through tabledef; SQL-born parts carry sidecars") {
    val dir = Files.createTempDirectory("hll_sql_").toString
    spark.sql(
      s"""CREATE TABLE hll_sql_t (id BIGINT, tag STRING) USING mergetree
         |OPTIONS (orderBy 'id', hllColumns 'tag')
         |LOCATION '$dir'""".stripMargin)
    try {
      spark.sql(
        "INSERT INTO hll_sql_t SELECT id, concat('t', CAST(id % 57 AS STRING)) FROM range(2000)")
      val t = ColumnarMergeTree.open(spark, dir)
      t.refresh()
      t.parts.map(_.partId).foreach { pid =>
        assert(Files.exists(Paths.get(dir, s"part_$pid", "_hll_tag")),
          s"SQL-written part $pid must carry the declared sketch")
      }
      val e = t.approxDistinct("tag")
      assert(math.abs(e - 57) <= tolerance(57), s"estimate $e")
    } finally spark.sql("DROP TABLE hll_sql_t")
  }

  test("system 'uniq' serves the folded estimates as a SQL relation") {
    val dir = Files.createTempDirectory("hll_sys_").toString
    val df = (0 until 3000).map(i => (i.toLong, s"v${i % 444}")).toDF("id", "tag")
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("id"),
      config = MergeTreeConfig(hllColumns = Seq("tag")))
    (0 until 3).foreach(k => t.insertBatch(df.filter(col("id") % 3 === k)))
    val rows = spark.read.format("mergetree").option("system", "uniq").load(dir)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "tag")
    assert(math.abs(r.getLong(1) - 444) <= tolerance(444), s"estimate ${r.getLong(1)}")
    assert(r.getLong(2) == 3 && r.getLong(3) == 3, "all parts covered")
  }

  test("uniq_meta/topk_meta/quantiles_meta: the sketch folds from pure SQL over a catalog ident") {
    val wh = Files.createTempDirectory("meta_fn_wh_").toString
    spark.conf.set("spark.sql.catalog.gmeta",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmeta.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmeta.ns")
    spark.sql(
      """CREATE TABLE gmeta.ns.m (id BIGINT, tag STRING, cat STRING, v DOUBLE)
        |USING mergetree
        |OPTIONS (orderBy 'id', hllColumns 'tag', topKColumns 'cat',
        |  quantileColumns 'v')""".stripMargin)
    try {
      // two parts, so the functions exercise the cross-part merge
      spark.sql(
        """INSERT INTO gmeta.ns.m SELECT id, concat('t', id % 400),
          |concat('c', id % 7), CAST(id % 1000 AS DOUBLE) FROM range(5000)""".stripMargin)
      spark.sql(
        """INSERT INTO gmeta.ns.m SELECT id, concat('t', id % 400),
          |concat('c', id % 7), CAST(id % 1000 AS DOUBLE)
          |FROM range(5000, 10000)""".stripMargin)
      val u = spark.sql("SELECT * FROM uniq_meta('gmeta.ns.m')").collect()
      assert(u.length == 1 && u.head.getString(0) == "tag")
      assert(math.abs(u.head.getLong(1) - 400) <= tolerance(400),
        s"estimate ${u.head.getLong(1)}")
      assert(u.head.getLong(2) == 2 && u.head.getLong(3) == 2, "both parts covered")
      // 7 categories of ~1429 each, counts exact in the no-eviction regime
      val tk = spark.sql(
        "SELECT term, cnt FROM topk_meta('gmeta.ns.m') WHERE rank <= 7 ORDER BY term")
        .collect()
      assert(tk.length == 7 && tk.map(_.getLong(1)).sum == 10000)
      val q = spark.sql("SELECT p50, p90, p99 FROM quantiles_meta('gmeta.ns.m')")
        .collect().head
      assert(math.abs(q.getDouble(0) - 500.0) <= 25, s"p50 ${q.getDouble(0)}")
      assert(math.abs(q.getDouble(1) - 900.0) <= 25, s"p90 ${q.getDouble(1)}")
      // the directory-path spelling resolves to the same table
      val byPath = spark.sql(
        s"SELECT approx_distinct FROM uniq_meta('$wh/ns/m')").collect().head
      assert(byPath.getLong(0) == u.head.getLong(1), "path and ident forms agree")
      // metadata-only discipline: the folds run at analysis, no scan of data
      val plan = spark.sql("SELECT * FROM uniq_meta('gmeta.ns.m')")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("FileScan") && !plan.contains("BatchScan"),
        s"meta function must not scan data:\n$plan")
    } finally spark.sql("DROP TABLE gmeta.ns.m")
  }

  test("undeclared column is rejected loudly") {
    val dir = Files.createTempDirectory("hll_rej_").toString
    val df = Seq((1L, "a")).toDF("id", "k")
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("id"),
      config = MergeTreeConfig(hllColumns = Seq("k")))
    t.insertBatch(df)
    intercept[IllegalArgumentException](t.approxDistinct("id"))
  }
}
