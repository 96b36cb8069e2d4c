package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing of the q25 pipeline. */
object QProfile {
  def t(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-qprofile")
    val sh = graft.queries.PipelineQueries.shingles // the one shared definition
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
    t("scan+count")(docsDf.write.format("noop").mode("overwrite").save())
    val exploded = docsDf.select(col("doc_id"), explode(sh).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    t("explode+hash")(exploded.write.format("noop").mode("overwrite").save())
    val dsh = exploded.distinct().persist()
    t("distinct+persist")(dsh.write.format("noop").mode("overwrite").save())
    println("DSH rows = " + dsh.count())
    val sigAggs = (0 until 96).map(i => min(xxhash64(col("h"), lit(i))).as(s"h$i"))
    val sigs = dsh.groupBy(col("doc_id")).agg(sigAggs.head, sigAggs.tail: _*)
    t("sigs-96min (1st)")(sigs.write.format("noop").mode("overwrite").save())
    t("sigs-96min (2nd)")(sigs.write.format("noop").mode("overwrite").save())
    val bandCols = (0 until 24).map { b =>
      val hs = (0 until 4).map(r => col(s"h${b * 4 + r}"))
      struct(lit(b).as("band"), xxhash64(hs: _*).as("sig"))
    }
    val banded = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val cand = banded.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
      .join(banded.select(col("doc_id").as("doc_b"), col("band"), col("sig")),
        Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    t("band-join+cand")(cand.write.format("noop").mode("overwrite").save())
    val sets = dsh.groupBy(col("doc_id")).agg(collect_set(col("h")).as("sh"))
    t("sets-collect")(sets.write.format("noop").mode("overwrite").save())
    val withSets = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sha")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("shb")), Seq("doc_b"))
    val inter = size(array_intersect(col("sha"), col("shb"))).cast("double")
    val j = inter / (size(col("sha")) + size(col("shb")) - inter).cast("double")
    val out = withSets
      .select(col("doc_a"), col("doc_b"),
        (floor(j * lit(1000000.0) + lit(0.5)).cast("double") / 1000000.0).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy(col("doc_a"), col("doc_b"))
    t("verify+sort")(out.write.format("noop").mode("overwrite").save())
    t("full-q25")(graft.queries.PipelineQueries.q25MinhashLsh(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
