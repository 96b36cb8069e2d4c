package graft

import graft.mergetree.{KVRow, KeyOrder, KeySample, MergeTreeConfig, MergeTreeTable}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Property-style workload test for the sampling-free range exchange:
  * random multi-script keys (ASCII, 2/3-byte UTF-8, supplementary-plane
  * emoji — the UTF-16 vs UTF-8 order trap), random batch ingest, random
  * inclusive ranges — results must equal an in-memory model that dedups
  * (key,ts) keeping max(value) and sorts in UTF-8 byte order, INCLUDING
  * row order. `localScanMaxRows = 0` forces every scan through the
  * distributed path, so the bounds math and the custom exchange carry
  * every assertion. A final case deletes a part's key sample to pin the
  * granule-bounds fallback.
  */
class BoundedRangePropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  private val alphabet = Vector("a", "b", "z", "K", "0", "9", "_",
    "é", "ß", "中", "文", "ツ", "😀", "🚀", "�", "Ω")

  private def genKey(rnd: scala.util.Random): String =
    (0 until 1 + rnd.nextInt(5)).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString

  private def model(rows: Seq[KVRow]): Seq[KVRow] = {
    val best = new scala.collection.mutable.HashMap[(String, Long), String]()
    rows.foreach { r =>
      best.updateWith((r.key, r.timestamp)) {
        case Some(v) => Some(if (KeyOrder.lt(v, r.value)) r.value else v)
        case None    => Some(r.value)
      }
    }
    best.toSeq.map { case ((k, ts), v) => KVRow(k, v, ts) }
      .sortBy(r => (r.key, r.timestamp))(Ordering.Tuple2(KeyOrder.ordering, Ordering.Long))
  }

  test("distributed scans match the model across seeds, scripts, and ranges") {
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919)
      val dir = Files.createTempDirectory(s"brp_${seed}_").toString
      val t = MergeTreeTable.create(spark, dir, MergeTreeConfig(
        memtableFlushThreshold = 1000000, maxParts = 100,
        localScanMaxRows = 0, granuleSize = 64))
      try {
        import spark.implicits._
        val all = scala.collection.mutable.ArrayBuffer[KVRow]()
        (0 until 2 + rnd.nextInt(3)).foreach { _ =>
          val batch = (0 until 300 + rnd.nextInt(1500)).map(_ =>
            KVRow(genKey(rnd), genKey(rnd), rnd.nextInt(4).toLong))
          all ++= batch
          t.insertBatch(spark.createDataset(batch.toSeq), partitions = 1 + rnd.nextInt(2))
        }
        val m = model(all.toSeq)
        assert(t.fullScan().collect().toSeq == m, s"fullScan mismatch (seed $seed)")
        assert(!t.lastScanLocal, "localScanMaxRows=0 must force the distributed path")
        (1 to 4).foreach { _ =>
          val a = all(rnd.nextInt(all.size)).key
          val b = all(rnd.nextInt(all.size)).key
          val (lo, hi) = (KeyOrder.min(a, b), KeyOrder.max(a, b))
          val got = t.query(lo, hi).collect().toSeq
          val want = m.filter(r => !KeyOrder.lt(r.key, lo) && !KeyOrder.gt(r.key, hi))
          assert(got == want, s"range [$lo,$hi] mismatch (seed $seed)")
        }
        // point query on an existing key
        val pk = all(rnd.nextInt(all.size)).key
        assert(t.queryKey(pk).collect().toSeq == m.filter(_.key == pk))
      } finally {
        t.shutdown()
        MergeTreeTable.deleteRecursively(Paths.get(dir))
      }
    }
  }

  test("a part without a key sample falls back to granule bounds, same results") {
    val dir = Files.createTempDirectory("brp_fallback_").toString
    val t = MergeTreeTable.create(spark, dir, MergeTreeConfig(
      memtableFlushThreshold = 1000000, maxParts = 100,
      localScanMaxRows = 0, granuleSize = 64))
    try {
      import spark.implicits._
      val rnd = new scala.util.Random(42)
      val rows = (0 until 3000).map(i => KVRow(genKey(rnd), s"v$i", i.toLong))
      t.insertBatch(spark.createDataset(rows.take(1500)), partitions = 1)
      t.insertBatch(spark.createDataset(rows.drop(1500)), partitions = 2)
      val before = t.fullScan().collect().toSeq
      // strip ONE part's sample: mixed sample/sampleless part sets must
      // still produce correct (if less balanced) bounds
      val samples = Files.list(Paths.get(dir)).toArray.map(_.toString)
        .filter(_.split('/').last.startsWith("part_"))
        .map(p => Paths.get(p, KeySample.FileName)).filter(Files.exists(_))
      assert(samples.nonEmpty, "expected persisted key samples")
      Files.delete(samples.head)
      val t2 = MergeTreeTable.open(spark, dir, MergeTreeConfig(
        localScanMaxRows = 0, granuleSize = 64))
      assert(t2.fullScan().collect().toSeq == before)
      t2.shutdown()
    } finally {
      t.shutdown()
      MergeTreeTable.deleteRecursively(Paths.get(dir))
    }
  }
}
