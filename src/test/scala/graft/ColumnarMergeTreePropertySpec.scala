package graft

import graft.mergetree._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.collection.mutable.ArrayBuffer

/** Property-based testing of the schema-generic table across all four
  * merge modes: random interleavings of insertBatch / optimize /
  * deleteWhere / self-describing reopen, checked against an in-memory
  * model. Collapsing workloads mix fresh state rows (sign=+1, carried in
  * `amt`) with cancel rows (sign=-1) aimed at currently-net-positive
  * (key, version) groups — the streaming-update idiom the mode exists for.
  *
  * Delete predicates are KEY-level only (drop whole keys): for
  * Replacing/Summing, a VALUE-level delete observes the collapse state
  * (deleting amt=1 before a merge that sums it into amt=3 differs from
  * deleting after — true of ClickHouse ALTER DELETE too), so only
  * key-level deletes have a history-independent model. Scan-time collapse
  * correctness across arbitrary part boundaries is exactly what this
  * hardens: a key's versions scattered over un-merged parts must collapse
  * at read identically to fully-compacted state.
  */
/** Model row for ColumnarMergeTreePropertySpec (top-level: Spark encoders
  * cannot instantiate suite-inner case classes).
  */
case class CmtPropRow(k: Long, ver: Long, payload: String, amt: Long)

class ColumnarMergeTreePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private type R = CmtPropRow
  private val R = CmtPropRow

  private def collapsed(mode: MergeMode, raw: Seq[R]): List[(Long, Long, String, Long)] =
    (mode match {
      case MergeMode.Plain => raw
      case MergeMode.Replacing(_, _) =>
        raw.groupBy(_.k).values.map(_.maxBy(_.ver)).toSeq
      case MergeMode.Summing(_, _) =>
        raw.groupBy(_.k).map { case (k, rs) =>
          R(k, rs.map(_.ver).max, rs.map(_.payload).max, rs.map(_.amt).sum)
        }.toSeq
      case MergeMode.Collapsing(_, _, _) =>
        raw.groupBy(r => (r.k, r.ver)).collect {
          case ((k, v), rs) if rs.map(_.amt).sum > 0 =>
            R(k, v, rs.map(_.payload).max, 1L) // net>0 → ONE sign=1 row
        }.toSeq
      case MergeMode.Aggregating(_, _) => // ver:max, amt:sum, payload "other"→max
        raw.groupBy(_.k).map { case (k, rs) =>
          R(k, rs.map(_.ver).max, rs.map(_.payload).max, rs.map(_.amt).sum)
        }.toSeq
    }).map(r => (r.k, r.ver, r.payload, r.amt))
      .toList.sorted

  private def scanned(t: ColumnarMergeTree): List[(Long, Long, String, Long)] =
    t.scan().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toList.sorted

  test("random workloads match the model in all five merge modes") {
    val schema = Seq.empty[R].toDF("k", "ver", "payload", "amt").schema
    val modes: Seq[(String, MergeMode)] = Seq(
      "plain" -> MergeMode.Plain,
      "replacing" -> MergeMode.Replacing(Seq("k"), "ver"),
      "summing" -> MergeMode.Summing(Seq("k"), Seq("amt")),
      "collapsing" -> MergeMode.Collapsing(Seq("k"), "amt", "ver"),
      "aggregating" -> MergeMode.Aggregating(Seq("k"),
        Seq("ver" -> "max", "amt" -> "sum")))
    for ((tag, mode) <- modes; seed <- 1L to 2L) {
      val rnd = new scala.util.Random(seed * 31 + tag.hashCode)
      val path = Files.createTempDirectory(s"cmt_prop_$tag").toString
      val config = MergeTreeConfig(maxParts = 3)
      var t = ColumnarMergeTree.create(spark, path, schema,
        orderBy = Seq("k"), config, mode)
      val model = ArrayBuffer.empty[R]
      var nextVer = 0L // unique versions: Replacing determinism contract
      (0 until 8).foreach { _ =>
        rnd.nextInt(10) match {
          case d if d < 5 => // insertBatch
            val states = (0 until 5 + rnd.nextInt(20)).map { _ =>
              nextVer += 1
              R(rnd.nextInt(20).toLong, nextVer,
                ('a' + rnd.nextInt(4)).toChar.toString,
                if (tag == "collapsing") 1L else 1L + rnd.nextInt(9))
            }
            // collapsing: also cancel a few currently-net-positive groups
            val cancels = if (tag != "collapsing") Nil else {
              val live = model.groupBy(r => (r.k, r.ver))
                .filter(_._2.map(_.amt).sum > 0).toSeq
              rnd.shuffle(live).take(rnd.nextInt(4)).map { case ((k, v), rs) =>
                R(k, v, rs.map(_.payload).max, -1L)
              }
            }
            val rows = states ++ cancels
            t.insertBatch(rows.toDF("k", "ver", "payload", "amt"))
            model ++= rows
          case d if d < 7 => // optimize: bounded parts, unchanged reads
            val before = collapsed(mode, model.toSeq)
            t.optimize()
            assert(t.partCount <= config.maxParts, s"$tag/$seed optimize parts")
            assert(scanned(t) == before, s"$tag/$seed optimize changed scan")
          case d if d < 9 => // deleteWhere on a key predicate
            val m = 2 + rnd.nextInt(3)
            val r = rnd.nextInt(m)
            t.deleteWhere(col("k") % m === r.toLong)
            val keep = model.filterNot(x => x.k % m == r)
            model.clear(); model ++= keep
          case _ => // reopen self-describing (schema/orderBy/mode from tabledef)
            t = ColumnarMergeTree.open(spark, path)
            assert(t.schema.fieldNames.toSeq == schema.fieldNames.toSeq)
        }
      }
      assert(scanned(t) == collapsed(mode, model.toSeq), s"$tag/$seed final scan")
      // pruned range scan agrees with the model restricted to the range
      val got = t.rangeScan(5L, 12L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toList.sorted
      assert(got == collapsed(mode, model.filter(x => x.k >= 5 && x.k <= 12).toSeq),
        s"$tag/$seed range scan")
    }
  }
}
