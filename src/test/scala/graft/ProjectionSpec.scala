package graft

import graft.mergetree._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ClickHouse-style projections: an alternate physical sort order stored as
  * an identity-MV copy, kept in sync on inserts (MV machinery) and
  * mutations (explicit propagation), with range queries routed to whichever
  * copy can prune parts on the queried column.
  */
class ProjectionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def df = spark.range(10000).select(
    col("id").as("k"),
    (lit(9999) - col("id")).as("rev"),
    (col("id") % 100).cast("long").as("v"))

  private def build(): ColumnarMergeTree = {
    val t = ColumnarMergeTree.create(spark,
      Files.createTempDirectory("cmt_proj_").toString, df.schema,
      orderBy = Seq("k"), MergeTreeConfig(maxParts = 100))
    t.insertBatch(df.filter(col("k") < 5000))
    t.addProjection("by_rev", Seq("rev"))
    t.insertBatch(df.filter(col("k") >= 5000)) // post-creation inserts flow in
    t
  }

  test("projection is populated, synced on insert, and prunes on its own key") {
    val t = build()
    assert(t.projections == Seq("by_rev" -> Seq("rev")))
    // the projection copy holds ALL rows (populate + MV inserts)
    val proj = t.materializedViewTarget("__proj_by_rev")
    assert(proj.totalRows == 10000)
    // routed range scan on the non-primary column returns the right rows...
    val got = t.rangeScanAuto("rev", 100L, 199L)
      .collect().map(_.getLong(0)).sorted.toList
    assert(got == (9800L to 9899L).toList)
    // ...and actually pruned parts on the projection's manifest
    assert(proj.lastPruning._1 < proj.lastPruning._2,
      s"projection must prune: ${proj.lastPruning}")
    // primary-key route still serves from the base
    assert(t.rangeScanAuto("k", 10L, 19L).count() == 10)
    // un-projected column falls back to a filtered full scan, still correct
    assert(t.rangeScanAuto("v", 0L, 0L).count() == 100)
  }

  test("mutations propagate: deleteWhere and updateWhere keep the copy honest") {
    val t = build()
    t.deleteWhere(col("v") === 7L)
    assert(t.rangeScanAuto("rev", 0L, 9999L).count() == 9900)
    t.updateWhere(col("v") === 8L, Map("v" -> lit(800L)))
    val viaProj = t.rangeScanAuto("rev", 0L, 9999L)
      .filter(col("v") === 800L).count()
    assert(viaProj == 100, s"projection must see the update: $viaProj")
    // a SET touching the projection's own sort key rebuilds the copy
    t.updateWhere(col("v") === 800L, Map("rev" -> (col("rev") + 100000L)))
    val high = t.rangeScanAuto("rev", 100000L, 200000L).count()
    assert(high == 100, s"rebuilt projection must reflect new sort keys: $high")
  }

  test("overwriteBatch replaces the projection copy too (no stale routed reads)") {
    val t = build() // 10000 rows, projection by_rev
    val replacement = spark.range(500).select(
      col("id").as("k"), (lit(499) - col("id")).as("rev"),
      lit(0L).as("v"))
    t.overwriteBatch(replacement)
    val proj = t.materializedViewTarget("__proj_by_rev")
    assert(proj.totalRows == 500,
      s"projection copy must be overwritten too: ${proj.totalRows}")
    // the routed read serves the NEW rows — before the sync fix it served
    // the 10000 pre-overwrite rows silently
    val got = t.rangeScanAuto("rev", 0L, 499L).count()
    assert(got == 500, s"routed scan after overwrite: $got")
    assert(t.rangeScanAuto("rev", 500L, 9999L).count() == 0,
      "pre-overwrite rows must be gone from the routed path")
    // an empty overwrite (truncate) empties the copy as well
    t.overwriteBatch(replacement.filter(col("k") < 0))
    assert(t.scan().count() == 0 && t.rangeScanAuto("rev", 0L, 9999L).count() == 0)
  }

  test("projections are refused on mode/partitioned/TTL tables; dropProjection detaches") {
    val base = spark.range(10).select(col("id").as("k"), col("id").as("ver"))
    val t1 = ColumnarMergeTree.create(spark,
      Files.createTempDirectory("cmt_projmode_").toString, base.schema,
      orderBy = Seq("k"), mode = MergeMode.Replacing(Seq("k"), "ver"))
    intercept[IllegalArgumentException](t1.addProjection("p", Seq("ver")))
    // TTL tables refuse projections: base TTL-compaction would drop rows the
    // copy still holds, and a routed scan must never see different rows
    val t2 = ColumnarMergeTree.create(spark,
      Files.createTempDirectory("cmt_projttl_").toString, base.schema,
      orderBy = Seq("k"), ttl = Some("ver < 0"))
    intercept[IllegalArgumentException](t2.addProjection("p", Seq("ver")))
    val t = build()
    t.dropProjection("by_rev")
    assert(t.projections.isEmpty)
  }

  test("schema evolution propagates to projections: routed reads never diverge") {
    val t0 = build() // base ordered by k, projection by_rev on rev, 10000 rows
    // ADD COLUMN: the copy gains it too, and post-ALTER inserts carry values
    // into BOTH — a routed read must serve them, not null-fill
    val t = t0.addColumn("n", org.apache.spark.sql.types.IntegerType)
    val extra = spark.range(10000, 10100).select(
      col("id").as("k"), (lit(9999) - col("id")).as("rev"),
      (col("id") % 100).cast("long").as("v"), lit(7).cast("int").as("n"))
    t.insertBatch(extra)
    val routed = t.rangeScanAuto("rev", -101L, -1L).orderBy("k").collect()
    assert(routed.length == 100 && routed.forall(_.getInt(3) == 7),
      "routed scan must serve post-ALTER column values from the copy")
    // dropping the projection's sort key is refused; a plain column drops
    // everywhere in lockstep
    intercept[IllegalArgumentException](t.dropColumn("rev"))
    val t2 = t.dropColumn("v")
    assert(t2.rangeScanAuto("rev", 0L, 9999L).columns.toSeq == Seq("k", "rev", "n"))
    // MODIFY COLUMN widening reaches the copy's definition too: the routed
    // read serves int parts written before the widen AND long parts after
    val t3 = t2.widenColumn("n", org.apache.spark.sql.types.LongType)
    t3.insertBatch(spark.range(20000, 20010).select(
      col("id").as("k"), (lit(9999) - col("id")).as("rev"), lit(900L).as("n")))
    val wide = t3.rangeScanAuto("rev", -10011L, -10001L)
    assert(wide.schema("n").dataType == org.apache.spark.sql.types.LongType)
    assert(wide.count() == 10 && wide.collect().forall(_.getLong(2) == 900L))
    assert(t3.rangeScanAuto("rev", -101L, -1L).collect().forall(_.getLong(2) == 7L),
      "pre-widen int values must up-convert through the routed read")
  }

  test("DDL face: projections option declares + backfills; SQL range scans route") {
    val dir = Files.createTempDirectory("cmt_projddl_").toString
    val t0 = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), MergeTreeConfig(maxParts = 100))
    t0.insertBatch(df.filter(col("k") < 5000))
    spark.sql("DROP TABLE IF EXISTS g_proj")
    spark.sql(
      s"CREATE TABLE g_proj USING mergetree OPTIONS (projections 'by_rev:rev') LOCATION '$dir'")
    // getTable (where the attach runs) fires on the first statement touching
    // the table; replay on every later statement is idempotent
    spark.sql("SELECT count(*) FROM g_proj").collect()
    assert(t0.projections == Seq("by_rev" -> Seq("rev")))
    // a post-attach insert flows into the copy as its own part (MV sync), so
    // the projection holds 2 parts with disjoint rev ranges — prunable
    t0.insertBatch(df.filter(col("k") >= 5000))
    // SQL range predicate on the NON-primary column routes to the projection:
    // part pruning bites where a base scan would keep every part
    val got = spark.sql("SELECT k FROM g_proj WHERE rev >= 100 AND rev <= 199")
      .collect().map(_.getLong(0)).sorted.toList
    assert(got == (9800L to 9899L).toList)
    val (planned, total) = graft.sources.GenericMergeTreeScan.lastPruning.get()
    assert(planned < total, s"routed scan must prune projection parts: $planned/$total")
    // primary-key predicates still serve from the base, pruned as before
    assert(spark.sql("SELECT k FROM g_proj WHERE k >= 10 AND k <= 19").count() == 10)
    // a conflicting re-declaration fails loudly (read option reaches the
    // same attach path as CREATE TABLE options)
    val e = intercept[IllegalArgumentException](
      spark.read.format("mergetree").option("projections", "by_rev:v").load(dir))
    assert(e.getMessage.contains("already exists"))
    spark.sql("DROP TABLE g_proj")
  }
}
