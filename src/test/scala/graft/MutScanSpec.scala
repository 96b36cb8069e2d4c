package graft

import graft.mergetree.{ColumnarMergeTree, MergeTreeConfig}
import graft.sources.GenericMergeTreeScan

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The DSv2 scan applies pending lightweight mutations ITSELF (MutProgram):
  * correctness never depends on the analyzer rule, the `_lw_deletes`
  * marker, or any cross-instance marker lifecycle. These are the
  * regression tests for the holes a marker-gated rewrite had: quarantine
  * (detach→materialize→attach) round trips, post-delete snapshot time
  * travel, marker races, and value-derived pruning vs pending UPDATEs —
  * plus the new benefit, part pruning SURVIVING pending deletes.
  */
class MutScanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("quarantine round trip: detach -> materialize -> attach keeps rows hidden") {
    val dir = Files.createTempDirectory("mutscan_attach_").toString
    val df = spark.range(100).select(col("id").as("k"),
      (col("id") % 4).cast("long").as("grp"), (col("id") * 2.0).as("v"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema,
      orderBy = Seq("k"), partitionBy = Some("grp"))
    t.insertBatch(df)
    t.deleteLightweight(col("k") % 2 === 0) // tags every partition's parts
    assert(t.scan().count() == 50)
    // Partition 2 holds k ≡ 2 (mod 4): every one of its rows is deleted —
    // the resurrection scenario. Detach it tagged, materialize the rest.
    t.detachPartition("2")
    // Materialize the LIVE parts: their tags clear, but the detached part
    // still carries its predicate — the advisory marker must survive
    // (clearLwMarkerIfClean counts detached parts).
    t.optimizeFinal()
    assert(ColumnarMergeTree.hasLwMarker(dir),
      "marker stays while a detached part carries tags")
    t.attachPartition("2")
    assert(ColumnarMergeTree.hasLwMarker(dir))
    // The re-attached part's rows stay masked on BOTH faces — the DSv2
    // scan reads the tags from the manifest, no marker/rule dependency.
    assert(t.scan().count() == 50)
    val sql = spark.read.format("mergetree").load(dir)
    assert(sql.count() == 50)
    assert(sql.filter(col("grp") === 2).count() == 0,
      "deleted rows must not resurrect through the quarantine round trip")
  }

  test("post-delete snapshot time travel hides the rows on the DSv2 face") {
    val dir = Files.createTempDirectory("mutscan_snap_").toString
    val df = spark.range(100).select(col("id").as("k"),
      (col("id") % 4).cast("long").as("grp"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    t.insertBatch(df)
    val preDelete = t.snapshots.last
    t.deleteLightweight(col("grp") === 1)
    val postDelete = t.snapshots.last
    // Materialize live parts and clear the marker: the post-delete
    // snapshot's manifest still carries the tags, and the scan must apply
    // them WITHOUT any live-marker hint (the round-13 hole).
    t.optimizeFinal()
    assert(!ColumnarMergeTree.hasLwMarker(dir))
    def at(seq: Long) =
      spark.read.format("mergetree").option("snapshot", seq.toString).load(dir)
    assert(at(preDelete).count() == 100, "pre-delete snapshot sees all rows")
    assert(at(postDelete).count() == 75,
      "post-delete snapshot applies the snapshot manifest's tags")
    assert(at(postDelete).filter(col("grp") === 1).count() == 0)
  }

  test("no rewrite, no marker dependency: scan stays native and still prunes parts") {
    val dir = Files.createTempDirectory("mutscan_prune_").toString
    val df = spark.range(100).select(col("id").as("k"),
      (col("id") % 4).cast("long").as("grp"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    t.insertBatch(df.filter(col("k") < 50))
    t.insertBatch(df.filter(col("k") >= 50))
    t.deleteLightweight(col("grp") === 1)
    // Delete the ADVISORY marker outright: the answer must not change
    // (this is exactly the state the round-13 marker races could reach).
    Files.deleteIfExists(ColumnarMergeTree.lwMarkerPath(dir))
    val sql = spark.read.format("mergetree").load(dir)
    assert(sql.count() == 75)
    assert(sql.filter(col("grp") === 1).count() == 0)
    // The plan is still the connector's own scan (no parquet-union
    // rewrite)...
    val q = sql.filter(col("k") >= 50)
    assert(q.queryExecution.executedPlan.toString.contains("BatchScan"),
      "tagged tables keep the native DSv2 scan")
    // ...and manifest part pruning SURVIVES pending deletes (the rewrite
    // path used to read every part).
    assert(q.count() == 38) // k in [50,100) minus the 12 rows with k % 4 == 1
    assert(GenericMergeTreeScan.lastPruning.get() == (1, 2),
      "leading-key pruning still applies while deletes are pending")
  }

  test("value-derived pruning stays sound under pending mutations") {
    // The invariant the scan's pruning layers rest on: a lightweight
    // UPDATE may never patch a column whose per-part statistics feed
    // pruning (ORDER BY, PARTITION BY refs, every skip-index column) —
    // tags don't recompute stats, so a patch there would make bounds lie.
    val dir = Files.createTempDirectory("mutscan_upd_prune_").toString
    val df = spark.range(100).select(col("id").as("k"),
      (col("id") * 1.0).as("v"), (col("id") * 10.0).as("w"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"),
      config = MergeTreeConfig(minmaxColumns = Seq("v")))
    t.insertBatch(df.filter(col("k") < 50))   // v in [0, 49]
    t.insertBatch(df.filter(col("k") >= 50))  // v in [50, 99]
    val refused = intercept[IllegalArgumentException] {
      t.updateLightweight(col("k") === 5, Map("v" -> lit(999.0)))
    }
    assert(refused.getMessage.contains("pruning columns"))
    // A NON-pruning column patches fine, and minmax pruning on v still
    // bites while that patch (and a delete) are pending.
    t.updateLightweight(col("k") === 90, Map("w" -> lit(-1.0)))
    t.deleteLightweight(col("k") === 60)
    val pruned = spark.read.format("mergetree").load(dir)
      .filter(col("v") >= 90.0 && col("v") <= 95.0)
    assert(pruned.select("w").collect().map(_.getDouble(0)).sorted.toSeq ==
      Seq(-1.0, 910.0, 920.0, 930.0, 940.0, 950.0))
    assert(GenericMergeTreeScan.lastPruning.get() == (1, 2),
      "pending tags keep minmax part pruning")
  }

  test("SPJ grouping yields to pending mutations; the join stays correct") {
    val dirA = Files.createTempDirectory("mutscan_spj_a_").toString
    val dirB = Files.createTempDirectory("mutscan_spj_b_").toString
    val dfA = spark.range(80).select((col("id") % 4).cast("long").as("grp"),
      col("id").as("k"))
    val a = ColumnarMergeTree.create(spark, dirA, dfA.schema,
      orderBy = Seq("k"), partitionBy = Some("grp"))
    a.insertBatch(dfA)
    val b = ColumnarMergeTree.create(spark, dirB, dfA.schema,
      orderBy = Seq("k"), partitionBy = Some("grp"))
    b.insertBatch(dfA.filter(col("k") < 40))
    a.deleteLightweight(col("k") >= 60)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.graft.preserveDataGrouping", "true")
      val left = spark.read.format("mergetree").load(dirA).as("a")
      val right = spark.read.format("mergetree").load(dirB).as("b")
      val joined = left.join(right, "grp")
      // 60 visible left rows x 10 right rows per group (15 x 10 x 4).
      assert(joined.count() == 600,
        "the co-partitioned join over a tagged table answers exactly")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.graft.preserveDataGrouping")
    }
  }

  test("column pruning composes: a mut predicate may test pruned-away columns") {
    val dir = Files.createTempDirectory("mutscan_prunecols_").toString
    val df = spark.range(100).select(col("id").as("k"),
      (col("id") % 4).cast("long").as("grp"), (col("id") * 2.0).as("v"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"))
    t.insertBatch(df)
    t.deleteLightweight(col("grp") === 1)
    t.updateLightweight(col("grp") === 2, Map("v" -> (col("v") + lit(0.5))))
    val sql = spark.read.format("mergetree").load(dir)
    // Projects ONLY k: the delete's grp predicate and the update's v
    // expression run on the widened read schema, invisible to the query.
    assert(sql.select("k").count() == 75)
    // Projects ONLY v: patched values visible without selecting grp.
    val patched = sql.select("v").collect().map(_.getDouble(0))
      .count(x => x != math.floor(x))
    assert(patched == 25, "every grp==2 row reads its patched value")
    // count(*) shape (empty required schema) still masks deleted rows.
    assert(sql.count() == 75)
  }
}
