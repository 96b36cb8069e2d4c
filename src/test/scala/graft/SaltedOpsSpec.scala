package graft

import graft.operators.SaltedOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted skew operators: exact agreement with the direct formulations on a
  * deliberately skewed key distribution (one key carries ~90% of rows).
  */
class SaltedOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private lazy val skewed = spark.range(100000).map { i =>
    val k = if (i % 10 != 0) "hot" else s"cold_${i % 50}"
    (k, (i % 1000).toDouble)
  }.toDF("k", "v")

  test("salted aggregation equals direct groupBy on skewed keys") {
    val direct = skewed.groupBy(col("k"))
      .agg(count(lit(1)).cast("long").as("cnt"), sum(col("v")).as("sum"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    val salted = SaltedOps.saltedAgg(skewed, col("k"), col("v"), salts = 16)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("salted broadcast join equals the plain join, row for row") {
    val dim = Seq(("hot", "H"), ("cold_0", "C0"), ("cold_10", "C10"))
      .toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).groupBy("k", "label")
      .agg(count(lit(1)).as("n")).orderBy("k").collect().toSeq
    val salted = SaltedOps.saltedBroadcastJoin(skewed, dim, "k", salts = 16)
      .groupBy("k", "label").agg(count(lit(1)).as("n")).orderBy("k").collect().toSeq
    assert(salted == plain)
  }
}
