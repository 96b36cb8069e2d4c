package graft

import java.nio.file.{Files, Paths}

/** Dev scratch: dump `explain("formatted")` for named registry entries to
  * files — the plan evidence the optimization rounds commit under
  * plans/r<n>/. Usage: runMain graft.QExplain <outDir> <suffix> <name>...
  * (suffix = "before" | "after"). Plans are captured LAZILY (no execution)
  * except entries whose builder itself materializes (driver-collect
  * entries): those capture the plan of the returned frame, which for a
  * collected LocalRelation is the point — the upstream work is in the
  * builder, and the committed file says so.
  */
object QExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (outDir, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.local("graft-qexplain")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), plan)
      println(s"QEXPLAIN wrote $outDir/${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
