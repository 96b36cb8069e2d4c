package graft

import graft.mergetree.{ColumnarMergeTree, MergeTreeConfig, MergeTreeTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** ClickHouse `SAMPLE k`: deterministic storage-level sampling. Pins
  * (a) slice semantics — nested, key-consistent, equal between the Scala
  * face and the SQL rewrite; (b) the pruning contract — with SAMPLE BY
  * leading the ORDER BY on a hash-clustered table, the slice prunes whole
  * parts driver-side; (c) non-graft SQL stays untouched.
  */
class SampleClauseSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  test("sampleBy-led table: slice prunes parts, nests, and matches the explicit predicate") {
    val dir = Files.createTempDirectory("sample_spec_").toString
    import spark.implicits._
    // smp uniform on [0, 2^32); four inserts CLUSTERED by smp quartile so
    // each part covers one quarter of the hash space
    def batch(q: Int) = spark.createDataset(0 until 20000)
      .map(i => (q * 1073741824L + (i.toLong * 53687L) % 1073741824L, s"u${q}_$i", i))
      .toDF("smp", "user", "v")
    val t = ColumnarMergeTree.create(spark, dir, batch(0).schema,
      orderBy = Seq("smp", "user"), sampleBy = Some("smp"))
    try {
      (0 to 3).foreach(q => t.insertBatch(batch(q)))
      val s25 = t.sampleScan(0.25)
      val n25 = s25.count()
      // pruning: only the first quartile's part survives the manifest
      assert(t.lastPruning == (1, 4),
        s"SAMPLE 0.25 on a hash-clustered table must prune to 1/4 parts, got ${t.lastPruning}")
      assert(n25 == 20000, s"quartile slice must be exactly one insert, got $n25")
      // equality with the explicit predicate
      val explicit = t.scan().filter(col("smp") < 1073741824L).count()
      assert(n25 == explicit)
      // nesting: SAMPLE 0.1 subset of SAMPLE 0.25
      val keys10 = t.sampleScan(0.1).select("user").collect().map(_.getString(0)).toSet
      val keys25 = s25.select("user").collect().map(_.getString(0)).toSet
      assert(keys10.subsetOf(keys25), "samples must nest")
      // determinism: re-run identical
      assert(t.sampleScan(0.1).count() == keys10.size)
      // OFFSET: disjoint slices that together cover the table (train/test)
      val train = t.sampleScan(0.75)
      val test = t.sampleScan(0.25, offset = 0.75)
      assert(t.lastPruning._1 == 1, "offset slice must prune to its own quartile")
      val trainKeys = train.select("user").collect().map(_.getString(0)).toSet
      val testKeys = test.select("user").collect().map(_.getString(0)).toSet
      assert(trainKeys.intersect(testKeys).isEmpty, "offset slices must be disjoint")
      assert(trainKeys.size + testKeys.size == 80000, "slices must cover the table")
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("no sampleBy: md5 lead-key slice is deterministic and key-consistent") {
    val dir = Files.createTempDirectory("sample_md5_").toString
    import spark.implicits._
    // several rows per key: a sampled key must bring ALL its rows
    val df = spark.createDataset(0 until 3000)
      .map(i => (s"k${i % 500}", i)).toDF("k", "v")
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    try {
      t.insertBatch(df)
      val s = t.sampleScan(0.5).collect()
      val s2 = t.sampleScan(0.5).collect()
      assert(s.sortBy(_.getInt(1)).toSeq == s2.sortBy(_.getInt(1)).toSeq, "must be deterministic")
      val sampledKeys = s.map(_.getString(0)).toSet
      // key-consistency: every sampled key contributes all 6 of its rows
      assert(s.length == sampledKeys.size * 6,
        s"rows of a sampling key must land in or out together (${s.length} rows, ${sampledKeys.size} keys)")
      // roughly half the keys (binomial: 500 keys, p=.5 — 5 sigma ≈ 56)
      assert(math.abs(sampledKeys.size - 250) < 60, s"got ${sampledKeys.size} of 500 keys")
      // top-of-hash-space slices (offset + k == 1): the upper bound is
      // 2^32, which must be DROPPED, not hex-formatted to 9 chars —
      // regression: SAMPLE 1 kept ~1/16 of rows, SAMPLE 0.5 OFFSET 0.5
      // returned empty
      assert(t.sampleScan(1.0).count() == 3000, "SAMPLE 1 must return every row")
      val hiHalf = t.sampleScan(0.5, offset = 0.5).select("k")
        .collect().map(_.getString(0)).toSet
      assert(hiHalf.nonEmpty, "SAMPLE 0.5 OFFSET 0.5 must be non-empty")
      assert(sampledKeys.intersect(hiHalf).isEmpty, "complementary slices must be disjoint")
      assert(sampledKeys.size + hiHalf.size == 500,
        s"slices must cover all keys (${sampledKeys.size} + ${hiHalf.size})")
      val tiny = t.sampleScan(0.1, offset = 0.9).select("k")
        .collect().map(_.getString(0)).toSet
      assert(tiny.nonEmpty && tiny.subsetOf(hiHalf), "OFFSET 0.9 slice nests in the top half")
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }

  test("FROM t FINAL collapses per statement; FINAL SAMPLE samples the collapsed rows") {
    val wh = Files.createTempDirectory("final_sql_wh_").toString
    spark.conf.set("spark.sql.catalog.gfin", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfin.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gfin.ns.r (smp BIGINT, ver BIGINT, x BIGINT) " +
        "USING mergetree OPTIONS (orderBy 'smp', mode 'replacing', " +
        "keys 'smp', version 'ver', sampleBy 'smp')")
      // two versions of every key, in different parts
      spark.range(1000).selectExpr(
        "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16, 10) AS BIGINT) AS smp",
        "1L AS ver", "id AS x").createOrReplaceTempView("fin_v1")
      spark.sql("INSERT INTO gfin.ns.r SELECT * FROM fin_v1")
      spark.sql("INSERT INTO gfin.ns.r SELECT smp, 2L AS ver, x + 1000 AS x FROM fin_v1")
      val raw = spark.sql("SELECT count(*) FROM gfin.ns.r").collect().head.getLong(0)
      assert(raw == 2000, "plain SELECT reads raw stored rows (ClickHouse without FINAL)")
      val fin = spark.sql("SELECT ver, count(*) AS n FROM gfin.ns.r FINAL GROUP BY ver")
        .collect()
      assert(fin.length == 1 && fin.head.getLong(0) == 2 && fin.head.getLong(1) == 1000,
        "FINAL collapses to the latest version of every key")
      // FINAL SAMPLE: sampled subset OF THE COLLAPSED rows
      val fs = spark.sql(
        "SELECT count(*) FROM gfin.ns.r FINAL SAMPLE 0.5").collect().head.getLong(0)
      val fs2 = spark.sql(
        "SELECT count(*) FROM gfin.ns.r FINAL SAMPLE 0.5 OFFSET 0.5").collect().head.getLong(0)
      assert(fs + fs2 == 1000, s"FINAL SAMPLE slices must partition the collapsed rows ($fs + $fs2)")
      // FINAL on a JOIN target collapses too (ClickHouse allows FINAL on
      // any table expression): raw left (2 versions/key) x collapsed right
      // (1/key) joins to 2000; without FINAL it would be 4000
      val j = spark.sql(
        "SELECT count(*) FROM gfin.ns.r a JOIN gfin.ns.r FINAL ON a.smp = r.smp")
        .collect().head.getLong(0)
      assert(j == 2000, s"JOIN target FINAL must collapse the right side, got $j")
    } finally {
      spark.conf.unset("spark.sql.catalog.gfin")
      graft.mergetree.MergeTreeTable.deleteRecursively(Paths.get(wh))
    }
  }

  test("SAMPLE n absolute rows, quote-aware rewrites, parse purity, AS final alias") {
    val wh = Files.createTempDirectory("sample_abs_wh_").toString
    spark.conf.set("spark.sql.catalog.gabs", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gabs.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gabs.ns.t (smp BIGINT, v BIGINT) USING mergetree " +
        "OPTIONS (orderBy 'smp,v', sampleBy 'smp')")
      spark.range(10000).selectExpr(
        "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16, 10) AS BIGINT) AS smp",
        "id AS v").createOrReplaceTempView("abs_src")
      spark.sql("INSERT INTO gabs.ns.t SELECT smp, v FROM abs_src")
      // SAMPLE n (ClickHouse's absolute form): ≈n rows, deterministic,
      // nested inside a larger n — the fraction derives from the manifest
      def sampled(n: Int): Set[Long] = spark.sql(
        s"SELECT v FROM gabs.ns.t SAMPLE $n").collect().map(_.getLong(0)).toSet
      val n1k = sampled(1000)
      assert(math.abs(n1k.size - 1000) < 150, s"SAMPLE 1000 yielded ${n1k.size} rows")
      val n3k = sampled(3000)
      assert(math.abs(n3k.size - 3000) < 300, s"SAMPLE 3000 yielded ${n3k.size} rows")
      assert(n1k.subsetOf(n3k), "absolute samples must nest like fractional ones")
      assert(sampled(1000) == n1k, "SAMPLE n must be deterministic")
      assert(spark.sql("SELECT count(*) FROM gabs.ns.t SAMPLE 50000")
        .collect().head.getLong(0) == 10000,
        "n at or above the table size degenerates to the full scan")
      // quote-awareness: SAMPLE/FINAL/PREWHERE text inside a string
      // literal is DATA — returned verbatim, never rewritten (this
      // statement also carries a real SAMPLE clause to rewrite)
      val lit = spark.sql("SELECT 'FROM gabs.ns.t SAMPLE 0.5 FINAL PREWHERE' AS s " +
        "FROM gabs.ns.t SAMPLE 1000 LIMIT 1").collect()
      assert(lit.head.getString(0) == "FROM gabs.ns.t SAMPLE 0.5 FINAL PREWHERE",
        "literal text must survive the clause rewrites verbatim")
      // parse purity: parsing (without executing) a FINAL or SAMPLE
      // statement must not register views or touch the session catalog
      val parser = spark.sessionState.sqlParser
      val before = spark.catalog.listTables().collect().map(_.name).toSet
      parser.parsePlan("SELECT count(*) FROM gabs.ns.t FINAL")
      parser.parsePlan("SELECT count(*) FROM gabs.ns.t SAMPLE 0.5")
      val after = spark.catalog.listTables().collect().map(_.name).toSet
      assert(before == after, s"parsePlan mutated the catalog: ${after -- before}")
      // `AS final` is the alias escape hatch (bare FINAL is the modifier,
      // as in ClickHouse)
      val aliased = spark.sql(
        "SELECT final.v FROM gabs.ns.t AS final WHERE final.v = 7").collect()
      assert(aliased.map(_.getLong(0)).toSeq == Seq(7L))
    } finally {
      spark.conf.unset("spark.sql.catalog.gabs")
      MergeTreeTable.deleteRecursively(Paths.get(wh))
    }
  }

  test("SQL face equals the Scala face; non-graft SAMPLE text is untouched") {
    val wh = Files.createTempDirectory("sample_sql_wh_").toString
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.gsmp", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsmp.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gsmp.ns.t (smp BIGINT, v BIGINT) USING mergetree " +
        "OPTIONS (orderBy 'smp,v', sampleBy 'smp')")
      spark.range(10000).selectExpr(
        "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16, 10) AS BIGINT) AS smp",
        "id AS v").createOrReplaceTempView("smp_src")
      spark.sql("INSERT INTO gsmp.ns.t SELECT smp, v FROM smp_src")
      val viaSql = spark.sql("SELECT count(*) FROM gsmp.ns.t SAMPLE 0.2")
        .collect().head.getLong(0)
      val viaScala = ColumnarMergeTree.open(spark,
        s"$wh/ns/t").sampleScan(0.2).count()
      assert(viaSql == viaScala && viaSql > 0 && viaSql < 10000,
        s"SQL SAMPLE ($viaSql) must equal sampleScan ($viaScala)")
      // a WHERE after SAMPLE composes
      val composed = spark.sql(
        "SELECT count(*) FROM gsmp.ns.t SAMPLE 0.2 WHERE v % 2 = 0").collect().head.getLong(0)
      assert(composed > 0 && composed < viaSql)
      // SQL OFFSET face: complementary slices partition the table
      val a = spark.sql("SELECT count(*) FROM gsmp.ns.t SAMPLE 0.5")
        .collect().head.getLong(0)
      val b = spark.sql("SELECT count(*) FROM gsmp.ns.t SAMPLE 0.5 OFFSET 0.5")
        .collect().head.getLong(0)
      assert(a + b == 10000, s"SAMPLE 0.5 ($a) + SAMPLE 0.5 OFFSET 0.5 ($b) must partition")
      // SAMPLE on a JOIN target: the right side reads its slice (v is
      // unique, so the join count equals the slice size)
      val js = spark.sql(
        "SELECT count(*) FROM gsmp.ns.t a JOIN gsmp.ns.t SAMPLE 0.5 ON a.v = t.v")
        .collect().head.getLong(0)
      assert(js == a, s"JOIN target SAMPLE must read the slice ($js vs $a)")
      // non-graft target: the clause is left for Spark, which rejects it —
      // no silent reinterpretation of standard-ish SQL
      Seq(1, 2).toDF("x").createOrReplaceTempView("plain_view")
      intercept[Exception] {
        spark.sql("SELECT * FROM plain_view SAMPLE 0.5").collect()
      }
      // …and SAMPLE as an ordinary alias still parses
      assert(spark.sql("SELECT 1 AS sample").collect().head.getInt(0) == 1)
    } finally {
      spark.conf.unset("spark.sql.catalog.gsmp")
      MergeTreeTable.deleteRecursively(Paths.get(wh))
    }
  }
}
