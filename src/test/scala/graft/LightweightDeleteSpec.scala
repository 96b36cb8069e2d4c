package graft

import graft.mergetree.{ColumnarMergeTree, MergeMode}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Lightweight DELETE (ClickHouse `DELETE FROM`): O(manifest) — rows hide
  * from every read immediately via per-part stored predicates; the next
  * part rewrite materializes them. Covers visibility across the API and
  * SQL faces, the per-part as-of semantics (inserts after the delete stay
  * visible), accumulation and NULL handling, materialization through
  * optimize/optimizeFinal/deleteWhere/updateWhere, snapshot time travel,
  * the maintenance-CAS race guard, and the refusal/validation paths.
  */
class LightweightDeleteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def dataFiles(dir: String): Set[(String, Long)] = {
    val s = Files.walk(Paths.get(dir))
    try s.iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(p => (p.toString, Files.getLastModifiedTime(p).toMillis)).toSet
    finally s.close()
  }

  private def mkTable(): (String, ColumnarMergeTree) = {
    val dir = Files.createTempDirectory("lwdel_").toString
    val df = spark.range(100).select(col("id").as("k"),
      (col("id") % 4).cast("long").as("grp"), (col("id") * 2.0).as("v"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    t.insertBatch(df.filter(col("k") < 50))
    t.insertBatch(df.filter(col("k") >= 50))
    (dir, t)
  }

  test("rows hide immediately from every face; no data file is touched") {
    val (dir, t) = mkTable()
    val before = dataFiles(dir)
    t.deleteLightweight(col("grp") === 1)
    assert(dataFiles(dir) == before, "lightweight delete is manifest-only")
    assert(t.parts.forall(_.muts.nonEmpty), "every live part is tagged")
    // API face
    assert(t.scan().count() == 75)
    assert(t.rangeScan(0L, 20L).count() == 21 - 5) // grp1 in [0,20]: 1,5,9,13,17
    // SQL face (DSv2 + the resolution rule)
    val sql = spark.read.format("mergetree").load(dir)
    assert(sql.count() == 75)
    assert(sql.filter(col("grp") === 1).count() == 0)
    // sketch/sample faces compose (sampleScan is scan + predicate)
    assert(t.sampleScan(1, 1).count() == 75)
  }

  test("per-part as-of semantics: inserts after the delete stay visible") {
    val (_, t) = mkTable()
    t.deleteLightweight(col("grp") === 1)
    val more = spark.range(100, 110).select(col("id").as("k"),
      lit(1L).as("grp"), (col("id") * 2.0).as("v"))
    t.insertBatch(more)
    assert(t.scan().filter(col("grp") === 1).count() == 10,
      "rows inserted after the DELETE are not subject to it")
    assert(t.scan().count() == 85)
  }

  test("deletes accumulate (OR); NULL predicate evaluations keep the row") {
    val dir = Files.createTempDirectory("lwdel_null_").toString
    val df = spark.range(10).select(col("id").as("k"),
      when(col("id") < 5, col("id")).cast("long").as("g"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    t.insertBatch(df)
    t.deleteLightweight(col("g") === 1) // NULL g rows: kept
    t.deleteLightweight(col("g") === 2)
    val left = t.scan().collect().map(_.getLong(0)).toSet
    assert(left == Set(0L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
  }

  test("optimizeFinal materializes: physical rows gone, tags and marker cleared") {
    val (dir, t) = mkTable()
    t.deleteLightweight(col("grp") === 1)
    assert(ColumnarMergeTree.hasLwMarker(dir))
    t.optimizeFinal()
    assert(t.parts.forall(_.muts.isEmpty), "materialized parts carry no tags")
    assert(!ColumnarMergeTree.hasLwMarker(dir), "marker cleared once clean")
    // physically gone: read the part files directly, no engine filter
    val raw = spark.read.parquet(
      t.parts.map(p => s"$dir/${p.dir}"): _*)
    assert(raw.count() == 75 && raw.filter(col("grp") === 1).count() == 0)
    assert(t.scan().count() == 75, "the answer never changes")
  }

  test("compaction (optimize) materializes merged bins") {
    val dir = Files.createTempDirectory("lwdel_opt_").toString
    val df = spark.range(120).select(col("id").as("k"), (col("id") % 3).as("grp"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"),
      config = graft.mergetree.MergeTreeConfig(maxParts = 2))
    (0 until 6).foreach(b => t.insertBatch(
      df.filter(col("k") >= b * 20 && col("k") < (b + 1) * 20)))
    t.deleteLightweight(col("grp") === 2)
    t.optimize() // 6 parts > maxParts 2 -> bins merge
    assert(t.parts.forall(_.muts.isEmpty))
    val raw = spark.read.parquet(t.parts.map(p => s"$dir/${p.dir}"): _*)
    assert(raw.filter(col("grp") === 2).count() == 0)
    assert(t.scan().count() == 80)
  }

  test("deleteWhere/updateWhere fold pending tags; counts see visible rows only") {
    val (_, t) = mkTable()
    t.deleteLightweight(col("grp") === 1)
    // grp1 rows are hidden: a predicate matching grp 1 and 2 removes only
    // the VISIBLE grp-2 rows; the hidden ones go too (materialized), and
    // neither ever resurrects.
    val removed = t.deleteWhere(col("grp") === 2)
    assert(removed == 25, "count is of visible rows")
    assert(t.parts.forall(_.muts.isEmpty))
    assert(t.scan().count() == 50)
    assert(t.scan().filter(col("grp").isin(1, 2)).count() == 0)
  }

  test("updateWhere sees and rewrites visible rows only; hidden parts stay tagged") {
    val dir = Files.createTempDirectory("lwdel_upd_").toString
    val df = spark.range(20).select(col("id").as("k"), (col("id") / 10).cast("long").as("grp"),
      lit(1.0).as("v"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    t.insertBatch(df.filter(col("grp") === 0))
    t.insertBatch(df.filter(col("grp") === 1))
    t.deleteLightweight(col("grp") === 1) // hides one whole part
    val updated = t.updateWhere(col("k") >= 0, Map("v" -> lit(9.0)))
    assert(updated == 10, "only visible rows update")
    // The all-hidden part has zero visible hits: the mutation correctly
    // leaves it alone — still tagged, its rows still hidden, the next
    // merge materializes it. The touched part's rewrite cleared its tag.
    assert(t.parts.size == 2)
    assert(t.parts.count(_.muts.nonEmpty) == 1)
    assert(t.scan().count() == 10 &&
      t.scan().filter(col("v") === 9.0).count() == 10)
    t.optimizeFinal()
    assert(t.parts.forall(_.muts.isEmpty) && t.scan().count() == 10)
  }

  test("snapshot time travel is as-of: pre-delete snapshots still see the rows") {
    val (_, t) = mkTable()
    val preDelete = t.snapshots.last
    t.deleteLightweight(col("grp") === 1)
    val postDelete = t.snapshots.last
    assert(t.scanAt(preDelete).count() == 100)
    assert(t.scanAt(postDelete).count() == 75)
  }

  test("maintenance CAS refuses outputs computed before a concurrent tag") {
    val (_, t) = mkTable()
    val preTagMetas = t.parts // as a maintenance op would have read them
    t.deleteLightweight(col("grp") === 1)
    // The op's outputs predate the tag: swapping them in would resurrect
    // the deleted rows — the (partId, preds) CAS must refuse.
    assert(!t.swapParts(preTagMetas, preTagMetas, Nil))
    assert(t.scan().count() == 75, "the delete survived the stale swap attempt")
  }

  test("SQL DELETE FROM routes lightweight under the session conf") {
    val dir = Files.createTempDirectory("lwdel_sql_").toString
    spark.sql(s"""CREATE TABLE lwdel_sql (k BIGINT, grp BIGINT, v DOUBLE)
      USING mergetree OPTIONS (orderBy 'k') LOCATION '$dir'""")
    try {
      spark.sql("INSERT INTO lwdel_sql SELECT id, id % 4, id * 1.0 FROM range(100)")
      val before = dataFiles(dir)
      spark.conf.set("spark.graft.lightweightDelete", "true")
      spark.sql("DELETE FROM lwdel_sql WHERE grp = 3")
      assert(dataFiles(dir) == before, "conf-routed DELETE is manifest-only")
      assert(spark.sql("SELECT count(*) FROM lwdel_sql").head().getLong(0) == 75)
      // default routing still rewrites physically
      spark.conf.unset("spark.graft.lightweightDelete")
      spark.sql("DELETE FROM lwdel_sql WHERE grp = 2")
      assert(dataFiles(dir) != before, "default DELETE rewrites parts")
      assert(spark.sql("SELECT count(*) FROM lwdel_sql").head().getLong(0) == 50)
    } finally {
      spark.conf.unset("spark.graft.lightweightDelete")
      spark.sql("DROP TABLE IF EXISTS lwdel_sql")
    }
  }

  test("FINAL collapse composes: the mask applies before the collapse") {
    val dir = Files.createTempDirectory("lwdel_fin_").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, ver BIGINT, v STRING")
    val t = ColumnarMergeTree.create(spark, dir, schema, orderBy = Seq("k"),
      mode = MergeMode.Replacing(Seq("k"), "ver"))
    import spark.implicits._
    t.insertBatch(Seq((1L, 1L, "old"), (2L, 1L, "two")).toDF("k", "ver", "v"))
    t.insertBatch(Seq((1L, 2L, "new")).toDF("k", "ver", "v"))
    // hide the NEWEST version of k=1: FINAL then serves the older one —
    // the ClickHouse _row_exists-mask interaction
    t.deleteLightweight(col("ver") === 2)
    val rows = t.scan().orderBy("k").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(rows.toSeq == Seq((1L, "old"), (2L, "two")))
  }

  test("refusals: projections, nondeterminism, unknown columns, the cap") {
    val (dirP, tp) = mkTable()
    tp.addProjection("byg", Seq("grp"))
    val e1 = intercept[IllegalArgumentException](
      tp.deleteLightweight(col("grp") === 1))
    assert(e1.getMessage.contains("projection"))

    val (_, t) = mkTable()
    val e2 = intercept[IllegalArgumentException](
      t.deleteLightweight(rand() > 0.5))
    assert(e2.getMessage.contains("deterministic"))
    intercept[org.apache.spark.sql.AnalysisException](
      t.deleteLightweight(col("nope") === 1))

    val (_, tc) = mkTable()
    (0 until graft.mergetree.ColumnarMergeTree.MaxLwMutsPerPart).foreach(i =>
      tc.deleteLightweight(col("k") === (1000L + i)))
    val e3 = intercept[IllegalArgumentException](
      tc.deleteLightweight(col("k") === 9999L))
    assert(e3.getMessage.contains("materialize"))
    tc.optimizeFinal() // materializing resets the budget
    tc.deleteLightweight(col("k") === 9999L)
  }

  test("q138 registry entry: oracle-shaped result, file-untouched self-enforced") {
    val rows = SparkEntry.queries("q138_lightweight_delete")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(!rows.map(_.getString(0)).contains("click"))
  }
}
