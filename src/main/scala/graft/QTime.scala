package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time a named subset of SparkEntry.queries at a given SF dir.
  * Usage: runMain graft.QTime q25_minhash_lsh q26_jaccard_exact
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_REPS (default 2 — report the min to damp host noise).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    // shared factory: a hand-rolled builder here once missed nanosAsLong and
    // crashed every events-backed query (round-3 verdict bug #5)
    val spark = GraftSession.local("graft-qtime")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // Optional bench-context repro: run the demo-mirror workloads first, the
    // way Bench does before its sweep (they were the round-11 contamination
    // suspect for early-sweep entries).
    if (sys.env.get("SPARK_GRAFT_PRE_WORKLOAD").contains("1")) {
      (1 to 3).foreach { _ => Bench.mtRowWorkload(spark, 50000) }
      (1 to 3).foreach { _ => Bench.mtWorkload(spark, 1000000, 50) }
      println("QTIME pre-workload done")
    }
    // warm-up: first query pays codegen/JIT; run the first name once untimed
    names.headOption.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    names.foreach { n =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME $n%-24s min=${ts.min}%8.3f s  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
