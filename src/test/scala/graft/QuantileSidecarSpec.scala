package graft

import graft.mergetree._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Per-part quantile summary sidecars: table-wide percentiles from pooled
  * order-statistic knots. Data is uniform over [0, n) so value ≈ rank and
  * tolerances can be stated as a fraction of the range.
  */
class QuantileSidecarSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("approxQuantiles pools part knots; merges rebuild sidecars") {
    val n = 40000
    val dir = Files.createTempDirectory("quant_cmt_").toString
    val df = (0 until n).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("id"),
      config = MergeTreeConfig(quantileColumns = Seq("v")))
    (0 until 4).foreach(k => t.insertBatch(df.filter(col("id") % 4 === k)))
    t.refresh()
    t.parts.map(_.partId).foreach { pid =>
      assert(Files.exists(Paths.get(dir, s"part_$pid", "_quant_v")))
    }
    val Seq(p50, p90, p99) = t.approxQuantiles("v", Seq(0.5, 0.9, 0.99))
    val tol = 0.02 * n // 2% of the range; knot spacing alone is 1/256
    assert(math.abs(p50 - 0.50 * n) <= tol, s"p50=$p50")
    assert(math.abs(p90 - 0.90 * n) <= tol, s"p90=$p90")
    assert(math.abs(p99 - 0.99 * n) <= tol, s"p99=$p99")
    t.optimizeFinal()
    t.refresh()
    assert(t.partCount == 1)
    val Seq(q50b) = t.approxQuantiles("v", Seq(0.5))
    assert(math.abs(q50b - 0.50 * n) <= tol, s"post-merge p50=$q50b")
  }

  test("rank error stays bounded on a skewed (heavy-tailed) distribution") {
    // lognormal-ish: v = exp(z/2000) spreads over ~e^10 — value-space
    // tolerances are meaningless here, so assert in RANK space: the
    // empirical CDF at the estimate must sit within 2% of the requested p.
    val n = 30000
    val dir = Files.createTempDirectory("quant_skew_").toString
    val df = (0 until n).map { i =>
      val z = ((i * 2654435761L) % n + n) % n // deterministic shuffle
      (i.toLong, math.exp(z.toDouble / 2000.0))
    }.toDF("id", "v")
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("id"),
      config = MergeTreeConfig(quantileColumns = Seq("v")))
    (0 until 3).foreach(k => t.insertBatch(df.filter(col("id") % 3 === k)))
    val values = df.select("v").collect().map(_.getDouble(0)).sorted
    for (p <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val Seq(est) = t.approxQuantiles("v", Seq(p))
      val rank = values.count(_ <= est).toDouble / n
      assert(math.abs(rank - p) <= 0.02, s"p=$p est=$est lands at rank $rank")
    }
  }

  test("sidecar-less parts are summarized on the fly") {
    val n = 10000
    val dir = Files.createTempDirectory("quant_heal_").toString
    val df = (0 until n).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("id"))
      .insertBatch(df)
    val t = ColumnarMergeTree.open(spark, dir,
      MergeTreeConfig(quantileColumns = Seq("v")))
    val Seq(p90) = t.approxQuantiles("v", Seq(0.9))
    assert(math.abs(p90 - 0.9 * n) <= 0.02 * n, s"fallback p90=$p90")
  }

  test("system 'quantiles' serves pooled percentiles as a SQL relation") {
    val n = 20000
    val dir = Files.createTempDirectory("quant_sys_").toString
    val df = (0 until n).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("id"),
      config = MergeTreeConfig(quantileColumns = Seq("v")))
    (0 until 2).foreach(k => t.insertBatch(df.filter(col("id") % 2 === k)))
    val r = spark.read.format("mergetree").option("system", "quantiles").load(dir)
      .collect().head
    assert(r.getString(0) == "v")
    assert(math.abs(r.getDouble(1) - 0.5 * n) <= 0.02 * n, s"p50=${r.getDouble(1)}")
    assert(math.abs(r.getDouble(3) - 0.99 * n) <= 0.02 * n, s"p99=${r.getDouble(3)}")
    assert(r.getLong(4) == 2 && r.getLong(5) == 2, "coverage 2/2")
  }

  test("all-null and undeclared columns fail loudly") {
    val dir = Files.createTempDirectory("quant_rej_").toString
    val df = Seq((1L, Option.empty[Double])).toDF("id", "v")
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("id"),
      config = MergeTreeConfig(quantileColumns = Seq("v")))
    t.insertBatch(df)
    intercept[IllegalArgumentException](t.approxQuantiles("id", Seq(0.5)))
    intercept[IllegalArgumentException](t.approxQuantiles("v", Seq(0.5)))
  }
}
