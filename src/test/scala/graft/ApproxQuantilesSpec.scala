package graft

import graft.queries.AnalyticQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Q77 has no SQL oracle (quantile sketches are engine-specific); this
  * bounds the sketch against the exact quantiles instead — the same
  * posture as q17b's rsd-bounded HLL. With accuracy=10000 and groups of
  * ~2k rows the sketch's rank error is ≤ 1/accuracy, so the approximate
  * quantile must land within a handful of order-statistics of the exact
  * one; we assert the much looser "within 5% of the exact value or one
  * element away in rank space" on every group × percentile.
  */
class ApproxQuantilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val dir = "/root/testdata/sf0.01"

  test("q77 approximate quantiles track exact quantiles per group") {
    val approx = AnalyticQueries.q77ApproxQuantiles(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("event_type")
      .agg(expr("percentile(value, array(0.5, 0.9, 0.99))").as("qs"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Double](1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((g, (p50, p90, p99)) <- approx) {
      val Seq(e50, e90, e99) = exact(g).toSeq
      for ((a, e, tag) <- Seq((p50, e50, "p50"), (p90, e90, "p90"), (p99, e99, "p99")))
        assert(math.abs(a - e) <= math.max(0.05 * math.abs(e), 1.0),
          s"$g/$tag: approx $a vs exact $e")
    }
  }
}
