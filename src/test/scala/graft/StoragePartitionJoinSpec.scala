package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Storage-partitioned joins (SPARK-37375): two mergetree tables
  * PARTITION BY the same bare column report KeyGroupedPartitioning, so a
  * join on that column plans with NO shuffle on either side — the
  * co-located-join shape at 100 TB. Gated behind Spark's own
  * `spark.sql.sources.v2.bucketing.enabled` AND the source-side
  * `spark.graft.preserveDataGrouping` opt-in (default false — Iceberg's
  * preserve-data-grouping pattern): grouped splits trade scan parallelism
  * for shuffle-free joins, so nothing changes for existing plans unless
  * the user asks for the trade.
  */
class StoragePartitionJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def mkTables(): (String, String) = {
    val dirA = Files.createTempDirectory("spj_a_").toString
    val dirB = Files.createTempDirectory("spj_b_").toString
    spark.sql(s"""CREATE TABLE spj_a (grp BIGINT, k BIGINT, v DOUBLE)
      USING mergetree OPTIONS (orderBy 'k', partitionBy 'grp')
      LOCATION '$dirA'""")
    spark.sql(s"""CREATE TABLE spj_b (grp BIGINT, k BIGINT, w DOUBLE)
      USING mergetree OPTIONS (orderBy 'k', partitionBy 'grp')
      LOCATION '$dirB'""")
    spark.sql("INSERT INTO spj_a SELECT id % 4, id, id * 1.0 FROM range(200)")
    spark.sql("INSERT INTO spj_b SELECT id % 4, id, id * 2.0 FROM range(100)")
    (dirA, dirB)
  }

  test("co-partitioned tables join with no shuffle when SPJ is enabled") {
    mkTables()
    try {
      // Disable broadcast so the planner must pick a clustered join —
      // the case SPJ exists for (at 100 TB neither side broadcasts).
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = "SELECT a.grp, a.k, b.k AS bk FROM spj_a a JOIN spj_b b " +
        "ON a.grp = b.grp"
      // Expected rows from first principles: per group, 50 x 25 pairs.
      val expect = (0 until 200).flatMap(i => (0 until 100)
        .filter(_ % 4 == i % 4).map(j => (i % 4, i, j))).toSet

      // Default (conf off): plans shuffle exchanges, stays correct.
      val off = spark.sql(q)
      val offRows = off.collect()
        .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt)).toSet
      assert(offRows == expect)
      assert(off.queryExecution.executedPlan.toString.contains("Exchange"),
        "without the preserve-data-grouping opt-in the join shuffles as before")

      spark.conf.set("spark.graft.preserveDataGrouping", "true")
      val on = spark.sql(q)
      val onRows = on.collect()
        .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt)).toSet
      assert(onRows == expect, "SPJ must not change the answer")
      val p = on.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"co-partitioned join must plan with ZERO exchanges:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"a real join must still be planned:\n$p")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.graft.preserveDataGrouping")
      spark.sql("DROP TABLE IF EXISTS spj_a")
      spark.sql("DROP TABLE IF EXISTS spj_b")
    }
  }

  test("partition pruning and single-table reads are unchanged under SPJ") {
    mkTables()
    try {
      spark.conf.set("spark.graft.preserveDataGrouping", "true")
      // A plain filtered read still prunes partitions and returns the
      // same rows (the grouped splits chain each value's part files).
      val one = spark.sql("SELECT k FROM spj_a WHERE grp = 2 ORDER BY k")
        .collect().map(_.getLong(0)).toSeq
      assert(one == (0 until 200).filter(_ % 4 == 2).map(_.toLong).toSeq)
      // Aggregate over the partition column: correct totals per group.
      val agg = spark.sql(
        "SELECT grp, count(*) AS n FROM spj_a GROUP BY grp ORDER BY grp")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(agg == Seq((0L, 50L), (1L, 50L), (2L, 50L), (3L, 50L)))
    } finally {
      spark.conf.unset("spark.graft.preserveDataGrouping")
      spark.sql("DROP TABLE IF EXISTS spj_a")
      spark.sql("DROP TABLE IF EXISTS spj_b")
    }
  }
}
