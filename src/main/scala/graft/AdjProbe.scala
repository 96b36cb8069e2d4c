package graft

/** Iso-floor adjudication probe: measures the steady-state floors of a
  * handful of flagged registry entries plus the contract 50k workload,
  * using exactly the Bench `_iso` discipline (build+warm untimed, then
  * per-rep [re-warm, clearCache, gc, timed]), and prints ONE `ADJ {...}`
  * JSON line. Compiled into two TREES (the current one and an unchanged
  * older commit in a git worktree) and run ALTERNATELY, the per-tree MIN
  * separates host drift from plan regressions — the only comparison this
  * host's neighbor contention permits (see Bench notes).
  *
  * Args: entry names to probe (default: the r15 verdict's flagged pair).
  */
object AdjProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val entries: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq("q101_incremental_dedup", "q115_ivfadc")
    val reps = sys.env.getOrElse("ADJ_REPS", "5").toInt
    val spark = GraftSession.local("graft-adj")
    def runEntry(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).write.format("noop")
        .mode("overwrite").save()
    def timeSec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // build + warm pass, untimed (indexes/tables construct here)
    entries.foreach(runEntry)
    val runs = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    (1 to reps).foreach { _ =>
      entries.foreach { name =>
        runEntry(name) // re-warm: hot-state measurement despite interleaving
        spark.catalog.clearCache(); System.gc(); Thread.sleep(50)
        runs(name) = runs.getOrElse(name, Vector()) :+ timeSec(runEntry(name))
      }
    }
    // the contract 50k workload (ingest is tree-comparable; the scan's
    // SHAPE changed in r15 — reported for context, not comparison)
    val wl = (1 to reps).map(_ => Bench.mtRowWorkload(spark, 50000))
    def arr(vs: Seq[Double]): String =
      f"[${vs.min}%.3f,${vs.sorted.apply(vs.size / 2)}%.3f,${vs.max}%.3f]"
    val parts = runs.toSeq.map { case (n, vs) => s""""$n":${arr(vs)}""" } ++ Seq(
      s""""mt_ingest_50k":${arr(wl.map(_._1))}""",
      s""""mt_scan_50k":${arr(wl.map(_._2))}""")
    println("ADJ " + parts.mkString("{", ",", "}"))
    spark.stop()
  }
}
