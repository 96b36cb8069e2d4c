package graft

import graft.mergetree._
import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Property-based testing (SURVEY §5.3): random workloads of interleaved
  * insert / flush / optimize / reopen checked against a 20-line in-memory
  * model of the reference semantics (§2.1): versions accumulate per
  * (key, timestamp); exact collisions keep max(value); queries are
  * inclusive-lexicographic ordered by (key, timestamp).
  *
  * Seeded Gen sampling keeps runs reproducible; workload count is small
  * because each op costs Spark jobs.
  */
class MergeTreePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  // ---- the in-memory reference model
  private final class Model {
    val data = scala.collection.mutable.Map.empty[(String, Long), String]
    def insert(r: KVRow): Unit = {
      val k = (r.key, r.timestamp)
      data.get(k) match {
        case Some(v) if v >= r.value => ()
        case _                       => data(k) = r.value
      }
    }
    def query(s: String, e: String): List[KVRow] =
      data.iterator
        .collect { case ((k, ts), v) if k >= s && k <= e => KVRow(k, v, ts) }
        .toList.sortBy(r => (r.key, r.timestamp))
    def all: List[KVRow] =
      data.iterator.map { case ((k, ts), v) => KVRow(k, v, ts) }
        .toList.sortBy(r => (r.key, r.timestamp))
  }

  // ---- workload generator: small alphabets force collisions and dedup
  private sealed trait Op
  private case class Insert(rows: List[KVRow]) extends Op
  private case object Flush extends Op
  private case object Optimize extends Op
  private case object Reopen extends Op

  private val genRow: Gen[KVRow] = for {
    k <- Gen.chooseNum(0, 9).map(i => s"k$i")
    ts <- Gen.chooseNum(0L, 5L)
    v <- Gen.alphaLowerChar.map(_.toString)
  } yield KVRow(k, v, ts)

  private val genOp: Gen[Op] = Gen.frequency(
    6 -> Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, genRow).map(Insert)),
    2 -> Gen.const(Flush),
    1 -> Gen.const(Optimize),
    1 -> Gen.const(Reopen))

  private val genWorkload: Gen[List[Op]] =
    Gen.chooseNum(6, 14).flatMap(n => Gen.listOfN(n, genOp))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  test("random workloads match the in-memory model across flush/optimize/reopen") {
    (1L to 6L).foreach { seed =>
      val ops = sample(genWorkload, seed)
      val path = Files.createTempDirectory(s"mt_prop_$seed").toString
      val config = MergeTreeConfig(memtableFlushThreshold = 20, maxParts = 3)
      var t = MergeTreeTable.create(spark, path, config)
      val model = new Model
      ops.foreach {
        case Insert(rows) =>
          t.insertAll(rows)
          rows.foreach(model.insert)
        case Flush => t.flush()
        case Optimize =>
          val before = model.all
          t.optimize()
          assert(t.partCount <= config.maxParts,
            s"seed=$seed: optimize left ${t.partCount} parts")
          // merge must never change query results (Q4 generalized)
          assert(t.fullScan().collect().toList == before, s"seed=$seed optimize")
        case Reopen =>
          t.flush() // durability boundary
          t.shutdown()
          t = MergeTreeTable.open(spark, path, config)
      }
      // final full + range agreement
      assert(t.fullScan().collect().toList == model.all, s"seed=$seed full")
      val got = t.query("k2", "k7").collect().toList
      assert(got == model.query("k2", "k7"), s"seed=$seed range")
      // totalRows is a RAW metadata count (src/merge_tree.cpp:129-131):
      // exact dups across parts each count until a merge collapses them.
      assert(t.totalRows >= model.all.size, s"seed=$seed meta count")
      t.shutdown()
    }
  }
}
