package graft

import graft.mergetree._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ClickHouse-style AGGREGATE projections: a pre-aggregated copy of the
  * table (per-batch partial aggregates via the MV trigger, collapsed by the
  * target's Aggregating merges), with aggregate queries routed to it by
  * aggScanAuto — including COARSER rollups, which re-aggregate the stored
  * partials. Both routes must be row-identical; only the bytes read differ.
  */
class AggProjectionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def df = spark.range(10000).select(
    col("id").as("k"),
    (col("id") % 7).cast("long").as("u"),
    concat(lit("t"), (col("id") % 3).cast("string")).as("ty"),
    (col("id") % 100).cast("long").as("v"))

  private val asked = Seq("sum" -> "v", "count" -> "*", "max" -> "k", "min" -> "v")

  private def build(): ColumnarMergeTree = {
    val t = ColumnarMergeTree.create(spark,
      Files.createTempDirectory("cmt_aggproj_").toString, df.schema,
      orderBy = Seq("k"), MergeTreeConfig(maxParts = 100))
    t.insertBatch(df.filter(col("k") < 5000))
    t.addAggProjection("by_u_ty", Seq("u", "ty"), asked)
    t.insertBatch(df.filter(col("k") >= 5000)) // post-creation inserts flow in
    t
  }

  /** The fallback path IS the ground truth (a direct aggregate of the base
    * scan); comparing routed vs truth on sorted rows proves the projection
    * partials merged correctly.
    */
  private def sortedRows(d: DataFrame): List[String] =
    d.collect().map(_.mkString("|")).sorted.toList

  private def truth(t: ColumnarMergeTree, gb: Seq[String]): DataFrame = {
    val base = t.scan()
    val direct = Seq(sum(col("v")).as("sum_v"), count(lit(1)).as("count_all"),
      max(col("k")).as("max_k"), min(col("v")).as("min_v"))
    base.groupBy(gb.map(col): _*).agg(direct.head, direct.tail: _*)
  }

  test("exact-key route matches the direct aggregate and reads only the projection") {
    val t = build()
    assert(t.aggProjections.map(p => (p._1, p._2)) == Seq("by_u_ty" -> Seq("u", "ty")))
    val routed = t.aggScanAuto(Seq("u", "ty"), asked)
    assert(t.aggProjectionFor(Seq("u", "ty"), asked).nonEmpty, "must route")
    assert(sortedRows(routed) == sortedRows(truth(t, Seq("u", "ty"))))
    // dtypes are identical on both routes, so callers can't tell them apart
    assert(routed.dtypes.toList == truth(t, Seq("u", "ty"))
      .select(routed.columns.map(col): _*).dtypes.toList)
    // the routed plan reads aggproj files, never a base part (base parts
    // are <path>/part_N; projection parts <path>/aggproj_x/part_N)
    val scanned = routed.queryExecution.executedPlan.toString()
    assert(scanned.contains("aggproj_by_u_ty"), "must scan the projection copy")
    assert(!scanned.replace(s"${t.path}/aggproj_by_u_ty", "")
      .contains(s"${t.path}/part_"), "must not scan base parts")
  }

  test("coarser rollup re-aggregates the projection; global aggregate too") {
    val t = build()
    assert(t.aggProjectionFor(Seq("ty"), asked).nonEmpty, "subset keys must route")
    assert(sortedRows(t.aggScanAuto(Seq("ty"), asked)) ==
      sortedRows(truth(t, Seq("ty"))))
    assert(sortedRows(t.aggScanAuto(Nil, asked)) == sortedRows(truth(t, Nil)))
  }

  test("routing survives target compaction (partials collapsed in merges)") {
    val t = build()
    val proj = t.materializedViewTarget(s"${ColumnarMergeTree.AggProjPrefix}by_u_ty")
    proj.optimizeFinal()
    assert(sortedRows(t.aggScanAuto(Seq("u"), asked)) == sortedRows(truth(t, Seq("u"))))
  }

  test("uncovered aggregate or keys fall back to the base, still correct") {
    val t = build()
    // min_k was never declared
    assert(t.aggProjectionFor(Seq("u"), Seq("min" -> "k")).isEmpty)
    val fb = t.aggScanAuto(Seq("u"), Seq("min" -> "k"))
    assert(sortedRows(fb) == sortedRows(
      t.scan().groupBy(col("u")).agg(min(col("k")).as("min_k"))))
    // a key outside the projection's GROUP BY
    assert(t.aggProjectionFor(Seq("u", "v"), Seq("count" -> "*")).isEmpty)
    assert(t.aggScanAuto(Seq("u", "v"), Seq("count" -> "*")).count() == 700)
  }

  test("mutations rebuild the partials: delete, update, dedup") {
    val t = build()
    t.deleteWhere(col("v") === 7L)
    assert(sortedRows(t.aggScanAuto(Seq("u", "ty"), asked)) ==
      sortedRows(truth(t, Seq("u", "ty"))))
    t.updateWhere(col("v") === 8L, Map("v" -> lit(800L)))
    assert(sortedRows(t.aggScanAuto(Seq("ty"), asked)) ==
      sortedRows(truth(t, Seq("ty"))))
    // OPTIMIZE … DEDUPLICATE drops re-inserted duplicate rows everywhere
    t.insertBatch(df.filter(col("k") < 100))
    t.optimizeFinal(deduplicate = true)
    assert(sortedRows(t.aggScanAuto(Seq("u", "ty"), asked)) ==
      sortedRows(truth(t, Seq("u", "ty"))))
  }

  test("drop detaches routing; reopen from disk preserves it") {
    val t = build()
    val expected = sortedRows(truth(t, Seq("u", "ty")))
    val reopened = ColumnarMergeTree.open(spark, t.path)
    assert(reopened.aggProjectionFor(Seq("u", "ty"), asked).nonEmpty,
      "projection must survive reopen (mvdefs + tabledef are the registry)")
    assert(sortedRows(reopened.aggScanAuto(Seq("u", "ty"), asked)) == expected)
    t.dropAggProjection("by_u_ty")
    assert(t.aggProjectionFor(Seq("u", "ty"), asked).isEmpty)
    assert(sortedRows(t.aggScanAuto(Seq("u", "ty"), asked)) == expected)
  }

  test("declaration guards: bad func, bad column, non-Plain table") {
    val t = build()
    intercept[IllegalArgumentException] {
      t.addAggProjection("bad", Seq("u"), Seq("avg" -> "v"))
    }
    intercept[IllegalArgumentException] {
      t.addAggProjection("bad", Seq("u"), Seq("sum" -> "nope"))
    }
    val r = ColumnarMergeTree.create(spark,
      Files.createTempDirectory("cmt_aggproj_r_").toString, df.schema,
      orderBy = Seq("k"), MergeTreeConfig(),
      mode = MergeMode.Replacing(Seq("k"), "v"))
    intercept[IllegalArgumentException] {
      r.addAggProjection("p", Seq("u"), Seq("count" -> "*"))
    }
  }
}
