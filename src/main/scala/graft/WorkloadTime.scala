package graft

/** Dev utility: repeat the contract demo-mirror workloads and print
  * per-rep (ingest, scan) seconds — the quiet-host probe for
  * mt_ingest/mt_scan drift adjudication.
  * Usage: runMain graft.WorkloadTime [reps] [n50k] [n1m]
  */
object WorkloadTime {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val n50 = args.lift(1).map(_.toInt).getOrElse(50000)
    val n1m = args.lift(2).map(_.toInt).getOrElse(0)
    val spark = GraftSession.local("graft-workload-time")
    (1 to reps).foreach { r =>
      val (i, s) = Bench.mtRowWorkload(spark, n50)
      println(f"WORKLOAD row n=$n50 rep=$r ingest=$i%.3f s scan=${s * 1000}%.2f ms")
    }
    // GC-hypothesis probe: same workload with a forced GC between ingest
    // and scan — isolates allocation debt from the scan's own cost
    (1 to reps).foreach { r =>
      import graft.mergetree.{MergeTreeConfig, MergeTreeTable}
      val dir = java.nio.file.Files.createTempDirectory("mt_gcprobe_").toString
      val t = MergeTreeTable.create(spark, dir,
        MergeTreeConfig(memtableFlushThreshold = 1000, maxParts = 10,
          enableBackgroundMerge = true, mergeIntervalSeconds = 5))
      val rnd = new scala.util.Random(42)
      (0 until n50).foreach(i => t.insert(s"key_${rnd.nextInt(10000) + 1}", s"value_$i", i.toLong))
      t.flush()
      System.gc()
      val t0 = System.nanoTime()
      val n = t.queryRows("key_1000", "key_2000").size
      println(f"WORKLOAD gc-probe rep=$r rows=$n scan=${(System.nanoTime() - t0) / 1e6}%.2f ms")
      t.shutdown()
      MergeTreeTable.deleteRecursively(java.nio.file.Paths.get(dir))
    }
    // steady-state scan floor: one table, repeated queryRows
    locally {
      import graft.mergetree.{MergeTreeConfig, MergeTreeTable}
      val dir = java.nio.file.Files.createTempDirectory("mt_scan_floor_").toString
      val t = MergeTreeTable.create(spark, dir,
        MergeTreeConfig(memtableFlushThreshold = 1000, maxParts = 10))
      val rnd = new scala.util.Random(42)
      (0 until n50).foreach(i => t.insert(s"key_${rnd.nextInt(10000) + 1}", s"value_$i", i.toLong))
      t.flush()
      val ts = (1 to 20).map { _ =>
        val t0 = System.nanoTime()
        val n = t.queryRows("key_1000", "key_2000").size
        ((System.nanoTime() - t0) / 1e6, n)
      }
      println(f"WORKLOAD steady scan rows=${ts.head._2} min=${ts.map(_._1).min}%.2f ms " +
        s"all=${ts.map(x => f"${x._1}%.1f").mkString(",")}")
      t.shutdown()
      MergeTreeTable.deleteRecursively(java.nio.file.Paths.get(dir))
    }
    if (n1m > 0) (1 to reps).foreach { r =>
      val (i, s) = Bench.mtWorkload(spark, n1m, 50)
      println(f"WORKLOAD batch n=$n1m rep=$r ingest=$i%.3f s scan=${s * 1000}%.2f ms")
    }
    spark.stop()
  }
}
