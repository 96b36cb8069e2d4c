package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing of the current suspect pipeline
  * (round 9: the q109 PQ phases).
  */
object QProfile {
  def t(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-qprofile")
    import graft.operators.ProductQuantizer
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.select(col("vec_id").as("qid"), col("v").as("qv"))
      .filter(col("qid") < 5)
    var cb: ProductQuantizer.PqCodebooks = null
    t("train(2 iters)") { cb = ProductQuantizer.train(e, m = 8, k = 16, iters = 2) }
    val codes = ProductQuantizer.encode(e, cb)
    t("encode (1st)")(codes.write.format("noop").mode("overwrite").save())
    t("encode (2nd)")(codes.write.format("noop").mode("overwrite").save())
    var n = 0L
    t("count") { n = e.count() }
    val res = ProductQuantizer.adcSearch(q, codes, e, cb, k = 10,
      shortlist = math.max(50L, n / 5).toInt)
    t("adcSearch (1st)")(res.write.format("noop").mode("overwrite").save())
    t("adcSearch (2nd)")(res.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
