package graft

/** Dev scratch: dump a SUBSET of the registry for a local oracle-parity
  * check (the full Verify sweep costs minutes; iterating on one query
  * shouldn't). Usage: runMain graft.QCheck <sfDir> <outDir> <name>...
  */
object QCheck {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = GraftSession.local("graft-qcheck", defaultCpus = "4")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"QCHECK $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    // Dump the requested names' oracle SQL so tools/oracle_check.py can
    // compare a QCheck subset directly — through Verify's writer, so the
    // subset artifact is byte-compatible with the driver's full sweep.
    Verify.writeOracleSql(outDir, Some(names))
    spark.stop()
  }
}
