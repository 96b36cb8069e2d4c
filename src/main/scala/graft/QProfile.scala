package graft

import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing of the current suspect pipeline
  * (round 15: the q117 composition's seven stages).
  */
object QProfile {
  def t(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-qprofile")
    if (args.contains("edges")) {
      // round-16 suspect: the shared near-dup edge machinery's phases
      graft.queries.PipelineQueries.profileEdgePhases(spark, dir)
      spark.stop(); return
    }
    if (args.contains("q140")) {
      graft.queries.PipelineQueries.profileQ140Phases(spark, dir)
      spark.stop(); return
    }
    // warm: one full run untimed
    t("q117 full (cold)") {
      graft.queries.PipelineQueries.q117PipelineCompose(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    t("q117 full (warm)") {
      graft.queries.PipelineQueries.q117PipelineCompose(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // staged: materialize each persisted frame in order, then the output
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val (out, persisted) = graft.queries.PipelineQueries.q117Build(spark, dir)
      println(f"PROF build(edges eager) rep$rep   ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      try {
        persisted.zipWithIndex.foreach { case (df, i) =>
          t(s"stage frame $i count rep$rep")(df.count())
        }
        t(s"accounting collect rep$rep")(out.collect())
      } finally persisted.foreach(_.unpersist())
    }
    spark.stop()
  }
}
