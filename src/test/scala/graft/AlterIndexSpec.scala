package graft

import graft.mergetree.{ColumnarMergeTree, MergeTreeConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** ClickHouse `ALTER TABLE … ADD/DROP/MATERIALIZE INDEX` — index evolution
  * on a LIVE table: the tabledef update is metadata-only, parts written
  * after the ADD carry the sidecar, pre-existing parts stay readable
  * (merely unprunable) until MATERIALIZE INDEX retrofits them, and every
  * state in between answers queries identically (the sidecars only ever
  * change how much is READ, never what is returned).
  */
class AlterIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  /** Disjoint token ranges per part (the TokenBloomSpec corpus) so pruning
    * is pinned, but created WITHOUT any index — the ALTER adds it.
    */
  private def build(): (String, ColumnarMergeTree) = {
    val dir = Files.createTempDirectory("mt_alteridx_").toString
    val df = spark.range(4000).select(
      col("id").as("k"),
      concat(lit("common text tok"), col("id").cast("string")).as("body"),
      (col("id") % 5).cast("string").as("lang"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    (0 until 2).foreach { i =>
      t.insertBatch(df.filter(col("k") >= i * 1000 && col("k") < (i + 1) * 1000))
    }
    (dir, t)
  }

  test("ADD INDEX: new parts carry the sidecar, old parts stay readable") {
    val (dir, t0) = build()
    val t1 = t0.addIndexColumn("tokenbf_v1(32768, 3, 0)", "body")
    // two more parts AFTER the ALTER
    val df = spark.range(4000).select(
      col("id").as("k"),
      concat(lit("common text tok"), col("id").cast("string")).as("body"),
      (col("id") % 5).cast("string").as("lang"))
    (2 until 4).foreach { i =>
      t1.insertBatch(df.filter(col("k") >= i * 1000 && col("k") < (i + 1) * 1000))
    }
    val withSidecar = t1.parts.count(p =>
      Files.exists(Paths.get(dir, s"part_${p.partId}", "_tokenbf_body")))
    assert(withSidecar == 2, s"only post-ALTER parts carry sidecars: $withSidecar")
    // correctness unchanged: the probe answers exactly, old parts are
    // simply kept (unprunable)
    val hit = t1.scanHasToken("body", "tok2500")
    assert(hit.count() == 1L && hit.select("k").first().getLong(0) == 2500L)
    val (planned, total) = t1.lastPruning
    assert(total == 4 && planned >= 2 && planned <= 3,
      s"old parts kept, new non-matching part pruned: planned=$planned of $total")
  }

  test("MATERIALIZE INDEX retrofits pre-existing parts; pruning tightens") {
    val (dir, t0) = build()
    val t1 = t0.addIndexColumn("tokenbf", "body")
    assert(t1.materializeIndex("body") == 2) // both old parts gain sidecars
    assert(t1.materializeIndex("body") == 0) // idempotent
    t1.parts.foreach(p => assert(
      Files.exists(Paths.get(dir, s"part_${p.partId}", "_tokenbf_body"))))
    val hit = t1.scanHasToken("body", "tok1500")
    assert(hit.count() == 1L)
    val (planned, total) = t1.lastPruning
    assert(total == 2 && planned == 1,
      s"retrofit sidecars must prune: planned=$planned of $total")
  }

  test("ADD INDEX set + MATERIALIZE: scanIn prunes retrofitted parts") {
    val dir = Files.createTempDirectory("mt_alterset_").toString
    val df = spark.range(1000).select(
      col("id").as("k"), (col("id") < 500).cast("string").as("half"))
    val t0 = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    t0.insertBatch(df.filter(col("k") < 500))   // half = "true" only
    t0.insertBatch(df.filter(col("k") >= 500))  // half = "false" only
    val t1 = t0.addIndexColumn("set(100)", "half")
    assert(t1.materializeIndex("half") == 2)
    val hit = t1.scanIn("half", Seq("false"))
    assert(hit.count() == 500L)
    val (planned, total) = t1.lastPruning
    assert(total == 2 && planned == 1, s"set sidecars prune: $planned/$total")
  }

  test("DROP INDEX: metadata removed, further parts build no sidecar; loud when absent") {
    val (dir, t0) = build()
    val t1 = t0.addIndexColumn("ngrambf_v1", "body")
    val t2 = t1.dropIndexColumn("body")
    val df = spark.range(4000, 5000).select(
      col("id").as("k"), lit("fresh").as("body"), lit("x").as("lang"))
    t2.insertBatch(df)
    val newest = t2.parts.maxBy(_.partId)
    assert(!Files.exists(Paths.get(dir, s"part_${newest.partId}", "_ngrambf_body")))
    intercept[IllegalArgumentException](t2.dropIndexColumn("body"))
    intercept[IllegalArgumentException](t2.materializeIndex("lang"))
  }

  test("refusals: unknown column, unknown kind, float set, footer-backed materialize") {
    val (_, t0) = build()
    intercept[IllegalArgumentException](t0.addIndexColumn("minmax", "nope"))
    intercept[IllegalArgumentException](t0.addIndexColumn("fulltext", "body"))
    val t1 = t0.addIndexColumn("minmax", "k")
    val e = intercept[IllegalArgumentException](t1.materializeIndex("k"))
    assert(e.getMessage.contains("OPTIMIZE"))
  }

  test("SQL face: ADD INDEX / MATERIALIZE INDEX / DROP INDEX verbs") {
    val (dir, t0) = build()
    spark.sql(s"ALTER TABLE '$dir' ADD INDEX idx_body body " +
      "TYPE tokenbf_v1(32768, 3, 0) GRANULARITY 4")
    val n = spark.sql(s"ALTER TABLE '$dir' MATERIALIZE INDEX body")
      .collect().head.getLong(0)
    assert(n == 2L)
    val t1 = ColumnarMergeTree.open(spark, dir)
    val hit = t1.scanHasToken("body", "tok500")
    assert(hit.count() == 1L)
    assert(t1.lastPruning == ((1, 2)))
    spark.sql(s"ALTER TABLE '$dir' DROP INDEX body")
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE '$dir' DROP INDEX body"))
    assert(e.getMessage.contains("not indexed"))
  }
}
