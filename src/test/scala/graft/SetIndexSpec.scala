package graft

import graft.mergetree._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Part-level set(N) skip index (ClickHouse `set`): declared
  * low-cardinality columns persist their per-part distinct-value set as a
  * `_set_<col>` sidecar; equality/IN probes prune parts driver-side and
  * stay exact. Saturated (> cap distinct) and sidecar-less parts are
  * always read — the index accelerates, never filters.
  */
class SetIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def mkTable(dir: String): ColumnarMergeTree = {
    val schema = Seq((1L, "a", 1L)).toDF("k", "status", "n").schema
    ColumnarMergeTree.create(spark, dir, schema, orderBy = Seq("k"),
      config = MergeTreeConfig(setIndexColumns = Seq("status")))
  }

  private def batch(ks: Range, statuses: Seq[String]) =
    ks.map(k => (k.toLong, statuses(k % statuses.size), k.toLong))
      .toDF("k", "status", "n")

  test("scanIn prunes parts by per-part value sets and stays exact") {
    val dir = Files.createTempDirectory("cmt_set_").toString
    val t = mkTable(dir)
    // Three parts with overlapping k (minmax on k can't help) but
    // disjoint status sets — the exact shape the set index exists for.
    t.insertBatch(batch(0 until 100, Seq("a", "b")))
    t.insertBatch(batch(0 until 100, Seq("c")))
    t.insertBatch(batch(0 until 100, Seq("d", "e")))

    val one = t.scanIn("status", Seq("c"))
    assert(t.lastPruning == (1, 3), s"single value: ${t.lastPruning}")
    assert(one.count() == 100)

    val two = t.scanIn("status", Seq("a", "d"))
    assert(t.lastPruning == (2, 3), s"IN across two parts: ${t.lastPruning}")
    assert(two.count() == 100) // 50 a's + 50 d's

    val none = t.scanIn("status", Seq("zz"))
    assert(t.lastPruning == (0, 3), s"absent value: ${t.lastPruning}")
    assert(none.count() == 0)

    // Results identical to the unindexed predicate, not just counts.
    val viaIndex = t.scanIn("status", Seq("a", "d"))
      .collect().map(_.toSeq).toSet
    val direct = t.scan().filter(col("status").isin("a", "d"))
      .collect().map(_.toSeq).toSet
    assert(viaIndex == direct)
  }

  test("NULL-only parts prune for every probe; equality never matches NULL anyway") {
    val dir = Files.createTempDirectory("cmt_set_null_").toString
    val t = mkTable(dir)
    t.insertBatch(batch(0 until 10, Seq("a")))
    t.insertBatch(Seq((100L, null.asInstanceOf[String], 1L),
      (101L, null.asInstanceOf[String], 2L)).toDF("k", "status", "n"))
    val out = t.scanIn("status", Seq("a"))
    assert(t.lastPruning == (1, 2),
      s"the all-NULL part holds no matchable value: ${t.lastPruning}")
    assert(out.count() == 10)
  }

  test("saturated sidecar (> cap distinct) never prunes; results stay exact") {
    val dir = Files.createTempDirectory("cmt_set_sat_").toString
    val t = mkTable(dir)
    // One part with cap+50 distinct statuses -> saturated sidecar.
    val many = (0 until (ColumnarMergeTree.SetIndexMaxValues + 50))
      .map(i => (i.toLong, s"s$i", i.toLong)).toDF("k", "status", "n")
    t.insertBatch(many)
    t.insertBatch(batch(1000 until 1010, Seq("x")))

    t.scanIn("status", Seq("x"))
    assert(t.lastPruning == (2, 2),
      s"saturated part must be kept even for a value it holds: ${t.lastPruning}")
    val hit = t.scanIn("status", Seq("s7"))
    assert(t.lastPruning == (1, 2),
      s"the x-part prunes, the saturated one is read: ${t.lastPruning}")
    assert(hit.count() == 1)
    val miss = t.scanIn("status", Seq("absent"))
    assert(t.lastPruning == (1, 2),
      s"saturated part kept even for absent values: ${t.lastPruning}")
    assert(miss.count() == 0)
  }

  test("sidecar-less parts are always read; merges rebuild the sidecar") {
    val dir = Files.createTempDirectory("cmt_set_less_").toString
    val t = mkTable(dir)
    t.insertBatch(batch(0 until 10, Seq("a")))
    t.insertBatch(batch(10 until 20, Seq("b")))
    // Simulate a part written before the index was declared.
    val aPart = t.scanIn("status", Seq("a")) // locate via pruning
    assert(t.lastPruning == (1, 2))
    val partDirs = Files.list(Paths.get(dir)).iterator()
    var removed = 0
    partDirs.forEachRemaining { p =>
      val f = p.resolve("_set_status")
      if (Files.exists(f)) { Files.delete(f); removed += 1 }
    }
    assert(removed == 2)
    t.scanIn("status", Seq("a"))
    assert(t.lastPruning == (2, 2),
      s"sidecar-less parts must always be read: ${t.lastPruning}")

    // A full compaction rewrites through the same staging path -> the
    // merged part carries a rebuilt sidecar.
    t.optimizeFinal()
    val after = t.scanIn("status", Seq("zz"))
    assert(t.lastPruning == (0, 1),
      s"merged part must carry a rebuilt sidecar: ${t.lastPruning}")
    assert(after.count() == 0)
    assert(t.scanIn("status", Seq("a", "b")).count() == 20)
  }

  test("float columns are ineligible (ambiguous string form) and never prune") {
    val dir = Files.createTempDirectory("cmt_set_float_").toString
    val schema = Seq((1L, 1.5)).toDF("k", "score").schema
    val t = ColumnarMergeTree.create(spark, dir, schema, orderBy = Seq("k"),
      config = MergeTreeConfig(setIndexColumns = Seq("score")))
    t.insertBatch(Seq((1L, 1.5), (2L, 2.5)).toDF("k", "score"))
    t.insertBatch(Seq((3L, 3.5)).toDF("k", "score"))
    val out = t.scanIn("score", Seq(2.5))
    assert(t.lastPruning == (2, 2),
      s"no sidecar for a float column, everything read: ${t.lastPruning}")
    assert(out.count() == 1)
  }

  test("SQL face: setIndexColumns DDL persists; = and IN prune through the connector") {
    import graft.sources.GenericMergeTreeScan
    val dir = Files.createTempDirectory("cmt_set_sql_").toString
    spark.sql(s"""CREATE TABLE set_sql (k BIGINT, status STRING, n BIGINT)
      USING mergetree
      OPTIONS (orderBy 'k', setIndexColumns 'status')
      LOCATION '$dir'""")
    try {
      spark.sql("INSERT INTO set_sql SELECT id, 'a', id FROM range(100)")
      spark.sql("INSERT INTO set_sql SELECT id, 'b', id FROM range(100)")
      spark.sql("INSERT INTO set_sql SELECT id, 'c', id FROM range(100)")

      val eq = spark.sql("SELECT k FROM set_sql WHERE status = 'b'").collect()
      assert(eq.length == 100)
      assert(GenericMergeTreeScan.lastPruning.get() == ((1, 3)),
        s"= prunes to 1/3 parts: ${GenericMergeTreeScan.lastPruning.get()}")

      val in = spark.sql(
        "SELECT k FROM set_sql WHERE status IN ('a', 'c')").collect()
      assert(in.length == 200)
      assert(GenericMergeTreeScan.lastPruning.get() == ((2, 3)),
        s"IN prunes to 2/3 parts: ${GenericMergeTreeScan.lastPruning.get()}")

      val none = spark.sql("SELECT k FROM set_sql WHERE status = 'zz'").collect()
      assert(none.isEmpty)
      assert(GenericMergeTreeScan.lastPruning.get() == ((0, 3)))

      // Conjunct intersection: = 'a' AND IN ('a','b') probes only {'a'}.
      val both = spark.sql(
        "SELECT k FROM set_sql WHERE status = 'a' AND status IN ('a', 'b')").collect()
      assert(both.length == 100)
      assert(GenericMergeTreeScan.lastPruning.get() == ((1, 3)))

      // Reopen via the Scala API sees the persisted index config too.
      val t = ColumnarMergeTree.open(spark, dir)
      t.scanIn("status", Seq("c"))
      assert(t.lastPruning == (1, 3))
    } finally spark.sql("DROP TABLE set_sql")
  }
}
