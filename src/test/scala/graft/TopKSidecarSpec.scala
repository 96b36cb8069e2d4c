package graft

import graft.mergetree._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Per-part SpaceSaving top-K sidecars: heavy hitters from metadata. In the
  * no-eviction regime (per-part distinct ≤ capacity) the merged result is
  * EXACT, so assertions here are strict equalities against a computed
  * ground truth; the eviction-regime guarantees are pinned on the shared
  * aggregator in GraftFunctionsSpec.
  */
class TopKSidecarSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  // Zipf-ish skew: term t_j gets ~ N/(j+1) rows — distinct count (40) stays
  // far below capacity, so every count is exact.
  private def skewed(n: Int): Seq[(Long, String)] =
    (0 until n).map(i => (i.toLong, s"t${i % ((i % 40) + 1)}"))

  test("approxTopK merges part sidecars exactly in the no-eviction regime") {
    val dir = Files.createTempDirectory("topk_cmt_").toString
    val df = skewed(6000).toDF("id", "term")
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("id"),
      config = MergeTreeConfig(topKColumns = Seq("term")))
    (0 until 3).foreach(k => t.insertBatch(df.filter(col("id") % 3 === k)))
    t.refresh()
    t.parts.map(_.partId).foreach { pid =>
      assert(Files.exists(Paths.get(dir, s"part_$pid", "_topk_term")))
    }
    val exact = df.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (t0, c) => (-c, t0) }.take(10).toSeq
    assert(t.approxTopK("term", 10) == exact)
    // merge rewrites through the same path: sidecar present, result stable
    t.optimizeFinal()
    t.refresh()
    assert(t.partCount == 1)
    assert(t.approxTopK("term", 10) == exact)
  }

  test("sidecar-less parts are summarized on the fly") {
    val dir = Files.createTempDirectory("topk_heal_").toString
    val df = skewed(2000).toDF("id", "term")
    ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("id"))
      .insertBatch(df)
    val t = ColumnarMergeTree.open(spark, dir,
      MergeTreeConfig(topKColumns = Seq("term")))
    val exact = df.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (t0, c) => (-c, t0) }.take(5).toSeq
    assert(t.approxTopK("term", 5) == exact)
  }

  test("system 'topk' serves ranked heavy hitters as a SQL relation") {
    val dir = Files.createTempDirectory("topk_sys_").toString
    val df = skewed(3000).toDF("id", "term")
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("id"),
      config = MergeTreeConfig(topKColumns = Seq("term")))
    (0 until 2).foreach(k => t.insertBatch(df.filter(col("id") % 2 === k)))
    val rows = spark.read.format("mergetree").option("system", "topk").load(dir)
      .orderBy("rank").collect()
    assert(rows.length == 40, "40 distinct terms, all under the k=50 cut")
    assert(rows.head.getString(0) == "term" && rows.head.getLong(1) == 1L)
    val exactTop = df.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (t0, c) => (-c, t0) }.head
    assert((rows.head.getString(2), rows.head.getLong(3)) == exactTop)
    assert(rows.head.getLong(4) == 2 && rows.head.getLong(5) == 2, "coverage 2/2")
  }

  test("undeclared column is rejected loudly") {
    val dir = Files.createTempDirectory("topk_rej_").toString
    val df = Seq((1L, "a")).toDF("id", "term")
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("id"),
      config = MergeTreeConfig(topKColumns = Seq("term")))
    t.insertBatch(df)
    intercept[IllegalArgumentException](t.approxTopK("id", 5))
  }
}
