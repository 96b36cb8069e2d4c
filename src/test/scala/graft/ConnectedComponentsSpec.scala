package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the large-star/small-star closure against a driver-side union-find
  * ground truth on adversarial shapes (long chains — worst case for label
  * propagation — plus random graphs), and the structural invariants q93
  * depends on (cluster id = component minimum, full node coverage).
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // Canonicalise to component minimum (find() roots are already minima
    // because unions always point the larger root at the smaller).
    nodes.map(x => x -> find(x)).toMap
  }

  /** threshold 0 forces the DISTRIBUTED large-star/small-star path — the
    * algorithm under test here; the driver fast path is checked against it
    * separately.
    */
  private def ccResult(edges: Seq[(Long, Long)], threshold: Long = 0L): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(edges.toDF("u", "v"), smallGraphThreshold = threshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain of 200 nodes collapses to one component rooted at the minimum") {
    val edges = (0L until 199L).map(i => (i, i + 1))
    val got = ccResult(edges)
    assert(got.size == 200)
    assert(got.values.toSet == Set(0L), "every node must label to the chain minimum")
  }

  test("random graphs match driver-side union-find exactly") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 60 + trial * 30
      val edges = (0 until n).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      val expect = unionFind(n, edges)
      val got = ccResult(edges)
      assert(got == expect, s"trial $trial: distributed CC diverged from union-find")
    }
  }

  test("duplicate, reversed, and self-loop edges are tolerated") {
    // node 7 has ONLY a self-loop: it must still label as its own singleton
    // component (the "covers every node that appears in any edge" contract)
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (2L, 3L), (9L, 8L), (7L, 7L))
    val got = ccResult(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 8L, 9L -> 8L, 7L -> 7L))
  }

  test("already-star input is a fixed point (converges immediately)") {
    val edges = (1L to 50L).map(i => (0L, i))
    val got = ccResult(edges)
    assert(got.size == 51 && got.values.toSet == Set(0L))
  }

  test("driver fast path agrees with the distributed rounds") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 300).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)) :+ (200L, 200L)
    val viaDriver = ccResult(edges, threshold = 1L << 22)
    val viaRounds = ccResult(edges, threshold = 0L)
    assert(viaDriver == viaRounds,
      "small-graph union-find must produce the identical labelling")
  }

  test("non-Long edge ids skip the driver fast paths and keep their type") {
    // r16 ADVICE: the Long-returning fast path must not silently change an
    // Int-id edge frame's output schema (or throw) — it falls through to
    // the distributed rounds, which preserve the input column type.
    import spark.implicits._
    val edges = Seq((1, 2), (2, 3), (10, 11)).toDF("u", "v")
    val out = ConnectedComponents.run(edges) // default (driver) threshold
    assert(out.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.IntegerType),
      "Int-id input must keep Int node/component columns")
    val got = out.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got == Map(1 -> 1, 2 -> 1, 3 -> 1, 10 -> 10, 11 -> 10))
  }
}
