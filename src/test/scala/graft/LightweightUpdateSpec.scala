package graft

import graft.mergetree.{ColumnarMergeTree, MergeTreeConfig}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Lightweight UPDATE (ClickHouse patch-part semantics): O(manifest) —
  * matching rows patch at read via per-part stored (predicate, SET)
  * entries; the next part rewrite bakes them in. Covers read-time
  * patching on every face, simultaneous assignment, ORDERED interleaving
  * with lightweight DELETEs, type stability, materialization, the CAS
  * guard, as-of inserts, the SQL verb routing, and the pruning-column
  * refusals.
  */
class LightweightUpdateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def dataFiles(dir: String): Set[(String, Long)] = {
    val s = Files.walk(Paths.get(dir))
    try s.iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(p => (p.toString, Files.getLastModifiedTime(p).toMillis)).toSet
    finally s.close()
  }

  private def mkTable(): (String, ColumnarMergeTree) = {
    val dir = Files.createTempDirectory("lwupd_").toString
    val df = spark.range(100).select(col("id").as("k"),
      (col("id") % 4).cast("long").as("grp"), (col("id") * 1.0).as("v"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    t.insertBatch(df.filter(col("k") < 50))
    t.insertBatch(df.filter(col("k") >= 50))
    (dir, t)
  }

  test("rows patch at read on every face; no data file is touched") {
    val (dir, t) = mkTable()
    val before = dataFiles(dir)
    t.updateLightweight(col("grp") === 1, Map("v" -> (col("v") * 100)))
    assert(dataFiles(dir) == before, "lightweight update is manifest-only")
    assert(t.parts.forall(_.muts.exists(_.kind == "upd")))
    // API face: grp-1 values scaled, others untouched
    assert(t.scan().filter(col("grp") === 1 && col("v") === col("k") * 100.0)
      .count() === 25)
    assert(t.scan().filter(col("grp") =!= 1 && col("v") === col("k") * 1.0)
      .count() === 75)
    // SQL face through the resolution rule
    val sql = spark.read.format("mergetree").load(dir)
    assert(sql.filter(col("grp") === 1).agg(sum("v")).head().getDouble(0) ==
      (0 until 100).filter(_ % 4 == 1).map(_ * 100.0).sum)
  }

  test("simultaneous assignment: SET a = b, b = a swaps against the OLD row") {
    val dir = Files.createTempDirectory("lwupd_swap_").toString
    val df = spark.range(10).select(col("id").as("k"),
      (col("id") * 1.0).as("a"), (col("id") * 10.0).as("b"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    t.insertBatch(df)
    t.updateLightweight(col("k") < 5, Map("a" -> col("b"), "b" -> col("a")))
    val r = t.scan().filter(col("k") === 2).head()
    assert(r.getDouble(1) == 20.0 && r.getDouble(2) == 2.0, "swap, not alias")
  }

  test("ordering with DELETE is preserved: update-then-delete != delete-then-update") {
    // Case A: UPDATE moves rows INTO the deleted set -> they vanish.
    val (_, ta) = mkTable()
    ta.updateLightweight(col("k") === 7, Map("grp" -> lit(99L)))
    ta.deleteLightweight(col("grp") === 99)
    assert(ta.scan().filter(col("k") === 7).count() == 0,
      "patched row must be seen by the LATER delete")
    // Case B: DELETE first — the later UPDATE's predicate never sees the
    // hidden rows, and un-matching rows patched later survive.
    val (_, tb) = mkTable()
    tb.deleteLightweight(col("grp") === 99) // nothing matches yet
    tb.updateLightweight(col("k") === 7, Map("grp" -> lit(99L)))
    assert(tb.scan().filter(col("k") === 7).count() == 1,
      "the EARLIER delete must not apply to the later patch")
    assert(tb.scan().filter(col("k") === 7).head().getLong(1) == 99L)
  }

  test("patched values are what later statements and counts see") {
    val (_, t) = mkTable()
    t.updateLightweight(col("k") === 3, Map("v" -> lit(1000.0)))
    // deleteWhere's predicate evaluates on PATCHED values
    val removed = t.deleteWhere(col("v") === 1000.0)
    assert(removed == 1)
    assert(t.scan().filter(col("k") === 3).count() == 0)
    // only the HIT part was rewritten (and its tag materialized); the
    // unhit part correctly keeps its pending patch for the next merge
    assert(t.parts.count(_.muts.isEmpty) == 1)
    t.optimizeFinal()
    assert(t.parts.forall(_.muts.isEmpty))
  }

  test("type stability: a patch casts back to the column's own type") {
    val dir = Files.createTempDirectory("lwupd_type_").toString
    val df = spark.range(10).select(col("id").as("k"), (col("id") % 5).as("n"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    t.insertBatch(df)
    t.updateLightweight(col("k") < 3, Map("n" -> (col("n") + 0.9))) // double expr
    assert(t.scan().schema("n").dataType ==
      org.apache.spark.sql.types.LongType, "schema never drifts")
    assert(t.scan().filter(col("k") === 2).head().getLong(1) == 2L) // 2+0.9 cast long
    t.optimizeFinal()
    assert(t.scan().schema("n").dataType == org.apache.spark.sql.types.LongType)
  }

  test("as-of semantics and materialization through optimizeFinal") {
    val (dir, t) = mkTable()
    t.updateLightweight(col("grp") === 1, Map("v" -> lit(-1.0)))
    t.insertBatch(spark.range(100, 104).select(col("id").as("k"),
      lit(1L).as("grp"), lit(5.0).as("v")))
    assert(t.scan().filter(col("grp") === 1 && col("v") === 5.0).count() == 4,
      "rows inserted after the UPDATE are not patched")
    t.optimizeFinal()
    assert(t.parts.forall(_.muts.isEmpty) && !ColumnarMergeTree.hasLwMarker(dir))
    val raw = spark.read.parquet(t.parts.map(p => s"$dir/${p.dir}"): _*)
    assert(raw.filter(col("grp") === 1 && col("v") === -1.0).count() == 25,
      "patch baked in physically")
  }

  test("maintenance CAS covers update tags too") {
    val (_, t) = mkTable()
    val preTag = t.parts
    t.updateLightweight(col("k") === 1, Map("v" -> lit(7.0)))
    assert(!t.swapParts(preTag, preTag, Nil),
      "outputs computed before the patch must be refused")
    assert(t.scan().filter(col("k") === 1).head().getDouble(2) == 7.0)
  }

  test("SQL ALTER TABLE ... UPDATE routes lightweight under the session conf") {
    val dir = Files.createTempDirectory("lwupd_sql_").toString
    spark.sql(s"""CREATE TABLE lwupd_sql (k BIGINT, grp BIGINT, v DOUBLE)
      USING mergetree OPTIONS (orderBy 'k') LOCATION '$dir'""")
    try {
      spark.sql("INSERT INTO lwupd_sql SELECT id, id % 4, id * 1.0 FROM range(100)")
      val before = dataFiles(dir)
      spark.conf.set("spark.graft.lightweightUpdate", "true")
      spark.sql(s"ALTER TABLE '$dir' UPDATE v = v + 1000 WHERE grp = 2")
      assert(dataFiles(dir) == before, "conf-routed UPDATE is manifest-only")
      assert(spark.sql("SELECT count(*) FROM lwupd_sql WHERE v >= 1000").head()
        .getLong(0) == 25)
    } finally {
      spark.conf.unset("spark.graft.lightweightUpdate")
      spark.sql("DROP TABLE IF EXISTS lwupd_sql")
    }
  }

  test("refusals: pruning columns, ORDER BY, nondeterminism, unknown column") {
    val dir = Files.createTempDirectory("lwupd_ref_").toString
    val df = spark.range(10).select(col("id").as("k"), (col("id") % 3).as("band"),
      (col("id") * 1.0).as("v"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"),
      config = MergeTreeConfig(minmaxColumns = Seq("band")))
    t.insertBatch(df)
    val e1 = intercept[IllegalArgumentException](
      t.updateLightweight(col("k") < 5, Map("band" -> lit(9L))))
    assert(e1.getMessage.contains("pruning"))
    val e2 = intercept[IllegalArgumentException](
      t.updateLightweight(col("v") > 0, Map("k" -> lit(0L))))
    assert(e2.getMessage.contains("pruning"))
    intercept[IllegalArgumentException](
      t.updateLightweight(col("k") < 5, Map("v" -> rand())))
    intercept[Exception](
      t.updateLightweight(col("k") < 5, Map("nope" -> lit(1.0))))
    // a valid patch still lands after the refusals
    t.updateLightweight(col("k") < 5, Map("v" -> lit(0.5)))
    assert(t.scan().filter(col("v") === 0.5).count() == 5)
  }
}
