package graft

import graft.operators.ProductQuantizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization (Jégou et al. 2011): train/encode determinism,
  * compression-accuracy sanity, and the property that actually matters —
  * ADC shortlist + exact re-rank recovers the exact top-k with high
  * recall on the real embedding testdata.
  */
class ProductQuantizerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val sf = "/root/testdata/sf0.01"

  private def vectors: DataFrame =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Exact brute-force cosine top-k — the q23 shape, the recall oracle. */
  private def exactTopK(vecs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("double") / 1e6
    val scored = vecs.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        r6(call_function("cosine_similarity", col("qv"), col("v"))).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("sim"))
      .orderBy(col("qid"), col("rnk"))
  }

  private lazy val cb = ProductQuantizer.train(vectors, m = 8, k = 16, iters = 3)

  test("codebooks are dense, correctly shaped, and training is deterministic") {
    assert(cb.m == 8 && cb.k == 16 && cb.dsub == 8)
    assert(cb.cb.size == 8 && cb.cb.forall(_.size == 16))
    assert(cb.cb.forall(_.forall(_.size == 8)))
    val cb2 = ProductQuantizer.train(vectors, m = 8, k = 16, iters = 3)
    assert(cb == cb2, "same data + params must train identical codebooks")
  }

  test("encode is deterministic, in-range, and 32x smaller than the vector") {
    val codes = ProductQuantizer.encode(vectors, cb)
    assert(codes.count() == vectors.count())
    val bad = codes.filter(
      size(col("code")) =!= 8 ||
        exists(col("code"), c => c < 0 || c >= 16)).count()
    assert(bad == 0, "every code must be 8 subspace ids in [0,16)")
    val again = ProductQuantizer.encode(vectors, cb)
      .withColumnRenamed("code", "code2")
    assert(codes.join(again, "vec_id")
      .filter(col("code") =!= col("code2")).count() == 0)
  }

  test("encode plan is map-side: no shuffle, no join") {
    val plan = ProductQuantizer.encode(vectors, cb)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"encode must not join:\n$plan")
  }

  test("ADC + exact re-rank: recall@10 >= 0.8 vs exact brute force") {
    val queries = vectors.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val codes = ProductQuantizer.encode(vectors, cb)
    val got = ProductQuantizer
      .adcSearch(queries, codes, vectors, cb, k = 10, shortlist = 100)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = exactTopK(vectors, queries, 10)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@10 = $recall (hits ${(got & exact).size}/${exact.size})")
    // survivors carry EXACT similarities: every returned pair that is in
    // the exact set must rank consistently (sanity via count parity)
    assert(got.size == exact.size)
  }

  test("full-corpus shortlist degenerates to the exact result") {
    val q2 = vectors.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val codes = ProductQuantizer.encode(vectors, cb)
    val n = vectors.count().toInt
    val viaPq = ProductQuantizer
      .adcSearch(q2, codes, vectors, cb, k = 10, shortlist = n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toList
    val exact = exactTopK(vectors, q2, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toList
    assert(viaPq == exact,
      "shortlist = corpus means re-rank sees everything: must equal exact")
  }
}
