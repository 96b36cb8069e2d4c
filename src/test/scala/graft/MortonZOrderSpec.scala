package graft

import graft.functions.{GraftFunctions, MortonCodec}
import graft.mergetree.{ColumnarMergeTree, MergeTreeConfig}
import graft.sources.GenericMergeTreeScan

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Morton (Z-order) encoding — the codec, the SQL-callable codegen
  * expressions, and the layout payoff: a table sorted by the interleaved
  * code prunes parts on BOTH source dimensions where a lexicographic sort
  * prunes only its leading column.
  */
class MortonZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("codec: hand-computed values and bit placement") {
    assert(MortonCodec.encode(0L, 0L) == 0L)
    assert(MortonCodec.encode(1L, 0L) == 1L) // x bit 0 -> code bit 0
    assert(MortonCodec.encode(0L, 1L) == 2L) // y bit 0 -> code bit 1
    assert(MortonCodec.encode(1L, 1L) == 3L)
    // x=5 (101), y=3 (011): bits 0,1,3,4 -> 27
    assert(MortonCodec.encode(5L, 3L) == 27L)
    // top coordinate bits land at code bits 62/63
    assert(MortonCodec.encode(1L << 31, 0L) == (1L << 62))
    assert(MortonCodec.encode(0L, 1L << 31) == (1L << 63))
  }

  test("codec: decode inverts encode across the range (deterministic sweep)") {
    val rnd = new scala.util.Random(42)
    val coords = Seq(0L, 1L, 2L, 3L, 0xFFFFFFFFL, 0x7FFFFFFFL, 12345L) ++
      Seq.fill(500)(rnd.nextLong() & 0xFFFFFFFFL)
    for (x <- coords.take(40); y <- coords.take(40)) {
      val c = MortonCodec.encode(x, y)
      assert(MortonCodec.decodeX(c) == x && MortonCodec.decodeY(c) == y,
        s"round-trip failed for ($x, $y)")
    }
    coords.foreach { x =>
      val c = MortonCodec.encode(x, coords.last)
      assert(MortonCodec.decodeX(c) == x)
    }
  }

  test("codec: out-of-range coordinates fail loudly") {
    intercept[IllegalArgumentException](MortonCodec.encode(1L << 32, 0L))
    intercept[IllegalArgumentException](MortonCodec.encode(0L, -1L))
  }

  test("codec: n-ary hand-computed values, 2-ary equivalence, round trip, range") {
    // 3-D bit placement: bit j of coord i -> code bit 3j+i.
    // x=1 -> bit 0; y=1 -> bit 1; z=1 -> bit 2.
    assert(MortonCodec.encodeN(Array(1L, 0L, 0L)) == 1L)
    assert(MortonCodec.encodeN(Array(0L, 1L, 0L)) == 2L)
    assert(MortonCodec.encodeN(Array(0L, 0L, 1L)) == 4L)
    assert(MortonCodec.encodeN(Array(1L, 1L, 1L)) == 7L)
    // x=5 (101), y=3 (011), z=1 (001):
    // x: bits 0,6; y: bits 1,4; z: bit 2 -> 1+64+2+16+4 = 87
    assert(MortonCodec.encodeN(Array(5L, 3L, 1L)) == 87L)
    // n=2 routes through the magic-number fast path, bit for bit
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val x = rnd.nextLong() & 0xFFFFFFFFL; val y = rnd.nextLong() & 0xFFFFFFFFL
      assert(MortonCodec.encodeN(Array(x, y)) == MortonCodec.encode(x, y))
    }
    // round trip at every arity, including each arity's extreme values
    (2 to 8).foreach { n =>
      val bits = MortonCodec.bitsPerCoord(n)
      val mx = (1L << bits) - 1L
      val samples = Seq.fill(50)(Array.fill(n)(rnd.nextLong() & mx)) :+
        Array.fill(n)(mx) :+ Array.fill(n)(0L)
      samples.foreach { cs =>
        assert(MortonCodec.decodeN(n, MortonCodec.encodeN(cs)).toSeq == cs.toSeq,
          s"round-trip failed at n=$n for ${cs.mkString(",")}")
      }
      // one coordinate past the arity's budget fails loudly
      intercept[IllegalArgumentException](
        MortonCodec.encodeN(Array.fill(n)(0L).updated(n - 1, mx + 1L)))
    }
  }

  test("SQL expressions: 3-D encode/decode, codegen sweep, arity checks") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT morton_encode(5, 3, 1) AS c, morton_decode(3, 87) AS d, " +
        "morton_encode(1, 2, 3, CAST(NULL AS INT)) AS n").head()
    assert(r.getLong(0) == 87L)
    assert(r.getSeq[Long](1) == Seq(5L, 3L, 1L))
    assert(r.isNullAt(2))
    // codegen agrees with the driver codec at n=3 on a column sweep
    val rows = spark.range(500)
      .selectExpr("id % 1000 AS x", "id * 7 % 997 AS y", "id * 13 % 991 AS z")
      .selectExpr("x", "y", "z", "morton_encode(x, y, z) AS c").collect()
    rows.foreach(r => assert(r.getLong(3) ==
      MortonCodec.encodeN(Array(r.getLong(0), r.getLong(1), r.getLong(2)))))
    intercept[Exception](spark.sql("SELECT morton_encode(1)").collect())
    intercept[Exception](
      spark.sql("SELECT morton_encode(1,2,3,4,5,6,7,8,9)").collect())
    intercept[Exception](spark.sql("SELECT morton_decode(9, 0)").collect())
  }

  test("3-D z-layout prunes rectangles on every dimension") {
    GraftFunctions.register(spark)
    val dir = Files.createTempDirectory("zorder3d_").toString
    // a 32x32x32 cube, z-sorted into 16 contiguous code ranges
    val src = spark.range(32L * 32L * 32L).select(
      (col("id") % 32).as("x"),
      (col("id") / 32 % 32).cast("long").as("y"),
      (col("id") / 1024).cast("long").as("z"))
      .withColumn("zval",
        call_function("morton_encode", col("x"), col("y"), col("z")))
    val cached = src.persist()
    try {
      val uppers = cached.repartitionByRange(16, col("zval"))
        .select(col("zval"), spark_partition_id().as("pid"))
        .groupBy(col("pid")).agg(max(col("zval")).as("hi"))
        .collect().map(_.getLong(1)).distinct.sorted
      val t = ColumnarMergeTree.create(spark, dir, src.schema,
        orderBy = Seq("zval"),
        config = MergeTreeConfig(minmaxColumns = Seq("x", "y", "z")))
      uppers.foldLeft(Long.MinValue) { (lo, hi) =>
        t.insertBatch(cached.filter(col("zval") > lo && col("zval") <= hi))
        hi
      }
    } finally cached.unpersist()
    val t = spark.read.format("mergetree").load(dir)
    // The aligned first octant: 1/8 of the volume, few z-ranges. Inclusive
    // bounds (between), matching the pushdown's conservative contract — a
    // strict `< 16` pushes the INCLUSIVE bound 16 and keeps min==16 parts.
    val oct = t.filter(col("x").between(0, 15) && col("y").between(0, 15) &&
      col("z").between(0, 15))
    assert(oct.count() == 16L * 16L * 16L)
    val p1 = GenericMergeTreeScan.lastPruning.get()._1
    assert(p1 <= 6, s"an aligned octant must touch few z-ranges (scanned $p1/16)")
    // a z-only slab: prunes without touching x or y
    val slab = t.filter(col("z").between(8, 15))
    assert(slab.count() == 32L * 32L * 8L)
    val p2 = GenericMergeTreeScan.lastPruning.get()._1
    assert(p2 < 16, s"a z-only slab must prune (scanned $p2/16)")
  }

  test("SQL expressions: codegen values, implicit int cast, null, decode") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT morton_encode(5, 3) AS c, morton_decode(27) AS d, " +
        "morton_encode(CAST(NULL AS BIGINT), 1) AS n").head()
    assert(r.getLong(0) == 27L)
    assert(r.getSeq[Long](1) == Seq(5L, 3L))
    assert(r.isNullAt(2))
    // expression (codegen) agrees with the driver codec on a column sweep
    val rows = spark.range(1000)
      .select(col("id"), (col("id") * 7 % 997).as("y"))
      .selectExpr("id", "y", "morton_encode(id, y) AS c").collect()
    rows.foreach(r =>
      assert(r.getLong(2) == MortonCodec.encode(r.getLong(0), r.getLong(1))))
    // a bad value surfaces the codec's own error through the expression
    val e = intercept[Exception](
      spark.sql("SELECT morton_encode(4294967296, 0)").collect())
    assert(e.getMessage.contains("unsigned 32 bits") ||
      Option(e.getCause).exists(_.getMessage.contains("unsigned 32 bits")))
  }

  /** Build a 16-part table over a 64x64 grid, sorted by `sortCol`. */
  private def mkGrid(sortCol: String): String = {
    val dir = Files.createTempDirectory(s"zorder_${sortCol}_").toString
    GraftFunctions.register(spark)
    val src = spark.range(64L * 64L).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
      .withColumn("zval", call_function("morton_encode", col("x"), col("y")))
    val sorted = src.withColumn("b",
      ((row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col(sortCol), col("x"), col("y"))).cast("long") - 1L)
        * 16L / (64L * 64L)).cast("int")).persist()
    try {
      val t = ColumnarMergeTree.create(spark, dir, src.schema,
        orderBy = Seq(sortCol),
        config = MergeTreeConfig(minmaxColumns =
          Seq("x", "y", "zval").filterNot(_ == sortCol)))
      (0 until 16).foreach(b => t.insertBatch(sorted.filter(col("b") === b).drop("b")))
    } finally sorted.unpersist()
    dir
  }

  test("z-layout prunes on both dimensions; lexicographic only on its leading") {
    val zdir = mkGrid("zval")
    val xdir = mkGrid("x") // lexicographic: x is the sort, y scattered
    def scanned(dir: String, loX: Int, hiX: Int, loY: Int, hiY: Int): (Long, Int) = {
      val t = spark.read.format("mergetree").load(dir)
      val n = t.filter(col("x").between(loX, hiX) && col("y").between(loY, hiY))
        .count()
      (n, GenericMergeTreeScan.lastPruning.get()._1)
    }
    // an aligned 16x16 quadrant: 1/16 of the area
    val (nz, pz) = scanned(zdir, 16, 31, 16, 31)
    val (nx, px) = scanned(xdir, 16, 31, 16, 31)
    assert(nz == 256 && nx == 256, "both layouts return the same rows")
    assert(pz <= 4, s"z-order: a quadrant touches few z-ranges (scanned $pz/16)")
    // a y-only rectangle: the lexicographic x-sort cannot prune at all
    val (nzy, pzy) = scanned(zdir, 0, 63, 16, 31)
    val (nxy, pxy) = scanned(xdir, 0, 63, 16, 31)
    assert(nzy == 64 * 16 && nxy == 64 * 16)
    assert(pxy == 16, "x-sorted layout scans everything for a y predicate")
    assert(pzy < 16, s"z-layout still prunes on y alone (scanned $pzy/16)")
  }

  test("q137 registry entry: oracle-shaped result, self-enforced pruning") {
    val rows = SparkEntry.queries("q137_zorder_scan")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
    assert(rows.map(_.getLong(1)).sum > 0)
  }
}
