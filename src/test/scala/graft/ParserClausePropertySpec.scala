package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property-style workload tests for the round-15 parser clauses: random
  * data, random bounds/steps/limits — the SQL result must equal a plain
  * Scala model of the documented semantics.
  */
class ParserClausePropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  test("WITH FILL matches the model across random grids, steps, and gaps") {
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed * 104729)
      // sparse random buckets, possibly duplicated, possibly off-grid
      val data = (0 until 5 + rnd.nextInt(40))
        .map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(100).toLong))
      data.toDF("b", "v").createOrReplaceTempView(s"wfp_$seed")
      val from = rnd.nextInt(50).toLong
      val to = from + 1 + rnd.nextInt(150)
      val step = 1L + rnd.nextInt(5)
      val rows = spark.sql(
        s"SELECT b, v FROM wfp_$seed ORDER BY b WITH FILL FROM $from TO $to STEP $step")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // model: originals + grid points absent from the originals' b-set
      val present = data.map(_._1).toSet
      val grid = (from until to by step).filterNot(present)
      val expect = (data ++ grid.map(g => (g, 0L))).sortBy(_._1)
      assert(rows.sorted == expect.sorted, s"seed $seed: WITH FILL mismatch")
      assert(rows.map(_._1) == rows.map(_._1).sorted, s"seed $seed: output unsorted")
      // INTERPOLATE: filled rows carry the last real value before them
      val rowsI = spark.sql(
        s"SELECT b, v FROM wfp_$seed ORDER BY b " +
          s"WITH FILL FROM $from TO $to STEP $step INTERPOLATE (v)")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val maxPerB = data.groupBy(_._1) // ties: any real row is "a real value"
      val realVs = data.map(_._2).toSet + 0L
      grid.foreach { g =>
        val prior = data.filter(_._1 <= g)
        val carried = rowsI.filter(_._1 == g).map(_._2)
        assert(carried.size == 1)
        if (prior.isEmpty) assert(carried.head == 0L, s"seed $seed: fill before first must default")
        else {
          val lastB = prior.map(_._1).max
          val candidates = maxPerB(lastB).map(_._2).toSet
          assert(candidates.contains(carried.head),
            s"seed $seed: fill at $g must carry a value from the last real bucket $lastB")
        }
        assert(realVs.contains(carried.head))
      }
    }
  }

  test("LIMIT n BY matches the model across random groups and limits") {
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919)
      val data = (0 until 20 + rnd.nextInt(100)).map(i =>
        (rnd.nextInt(6).toLong, i.toLong, rnd.nextInt(1000).toLong))
      data.toDF("g", "id", "v").createOrReplaceTempView(s"lbp_$seed")
      val n = 1 + rnd.nextInt(4)
      val rows = spark.sql(
        s"SELECT g, id, v FROM lbp_$seed ORDER BY g, v DESC, id LIMIT $n BY g")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val expect = data.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(n)
      }.sortBy(r => (r._1, -r._3, r._2))
      assert(rows == expect, s"seed $seed: LIMIT $n BY mismatch")
      // offset form: skip each group's first o rows, then take n
      val o = rnd.nextInt(3)
      val paged = spark.sql(
        s"SELECT g, id, v FROM lbp_$seed ORDER BY g, v DESC, id LIMIT $o, $n BY g")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val expectPaged = data.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._3, r._2)).slice(o, o + n)
      }.sortBy(r => (r._1, -r._3, r._2))
      assert(paged == expectPaged, s"seed $seed: LIMIT $o, $n BY mismatch")
    }
  }

  test("DESC WITH FILL matches the model across random grids and negative steps") {
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed * 15485863)
      val data = (0 until 5 + rnd.nextInt(40))
        .map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(100).toLong))
      data.toDF("b", "v").createOrReplaceTempView(s"wfd_$seed")
      val to = rnd.nextInt(50).toLong
      val from = to + 1 + rnd.nextInt(150) // FROM above TO, TO exclusive
      val step = -(1L + rnd.nextInt(5))
      val rows = spark.sql(
        s"SELECT b, v FROM wfd_$seed ORDER BY b DESC WITH FILL FROM $from TO $to STEP $step")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val present = data.map(_._1).toSet
      val grid = (from until to by step).filterNot(present)
      val expect = (data ++ grid.map(g => (g, 0L))).sortBy(-_._1)
      assert(rows.sorted == expect.sorted, s"seed $seed: DESC WITH FILL mismatch")
      assert(rows.map(_._1) == rows.map(_._1).sorted.reverse,
        s"seed $seed: output not descending")
    }
  }

  test("multi-column WITH FILL matches the cross-product model") {
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed * 2147483)
      val data = (0 until 3 + rnd.nextInt(25))
        .map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(8).toLong, rnd.nextInt(100).toLong))
        .distinct
      data.toDF("x", "y", "v").createOrReplaceTempView(s"wfm_$seed")
      val (xFrom, xTo) = (rnd.nextInt(4).toLong, 5L + rnd.nextInt(8))
      val (yFrom, yTo) = (rnd.nextInt(3).toLong, 4L + rnd.nextInt(5))
      val rows = spark.sql(
        s"SELECT x, y, v FROM wfm_$seed ORDER BY x WITH FILL FROM $xFrom TO $xTo, " +
          s"y WITH FILL FROM $yFrom TO $yTo")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      // model: originals + cross-product tuples whose (x, y) is absent
      val present = data.map(d => (d._1, d._2)).toSet
      val grid = for {
        x <- xFrom until xTo
        y <- yFrom until yTo
        if !present((x, y))
      } yield (x, y, 0L)
      val expect = data ++ grid
      assert(rows.sorted == expect.sorted, s"seed $seed: multi-fill mismatch")
      assert(rows.map(r => (r._1, r._2)) == rows.map(r => (r._1, r._2)).sorted,
        s"seed $seed: output not sorted by the fill key tuple")
    }
  }

  test("ternary chains match the model across random values and depths") {
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed * 31337)
      val data = (0 until 30 + rnd.nextInt(50))
        .map(i => (i.toLong, rnd.nextInt(100).toLong))
      data.toDF("id", "v").createOrReplaceTempView(s"tp_$seed")
      val (t1, t2) = (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong)
      // a 2-deep right-chained ternary, the ClickHouse bucketing idiom
      val rows = spark.sql(
        s"""SELECT id, v > $t1 ? 'hi' : v > $t2 ? 'mid' : 'lo' AS b
           |FROM tp_$seed ORDER BY id""".stripMargin)
        .collect().map(_.getString(1)).toSeq
      val expect = data.map { case (_, v) =>
        if (v > t1) "hi" else if (v > t2) "mid" else "lo"
      }
      assert(rows == expect, s"seed $seed: ternary chain mismatch")
      // ternary inside a function argument with arithmetic operands
      val s = spark.sql(
        s"SELECT sum(v % 2 = 0 ? v * 2 : v) AS s FROM tp_$seed")
        .collect().head.getLong(0)
      val sExpect = data.map { case (_, v) =>
        if (v % 2 == 0) v * 2 else v }.sum
      assert(s == sExpect, s"seed $seed: ternary-in-aggregate mismatch")
    }
  }

  test("collection literals match the model across random shapes") {
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed * 48611)
      val xs = (0 until 1 + rnd.nextInt(8)).map(_ => rnd.nextInt(50))
      val probe = rnd.nextInt(50)
      val lit = xs.mkString("[", ", ", "]")
      val r = spark.sql(
        s"""SELECT size($lit) AS n, array_contains($lit, $probe) AS has,
           |  {'k': $lit}['k'][0] AS first""".stripMargin).collect().head
      assert(r.getInt(0) == xs.size, s"seed $seed: size mismatch")
      assert(r.getBoolean(1) == xs.contains(probe), s"seed $seed: contains")
      assert(r.getInt(2) == xs.head, s"seed $seed: map-of-array first")
    }
  }

  test("DISTINCT ON matches the first-per-group model across random data") {
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed * 86243)
      val data = (0 until 20 + rnd.nextInt(60)).map(i =>
        (rnd.nextInt(8).toLong, i.toLong, rnd.nextInt(500).toLong))
      data.toDF("g", "id", "v").createOrReplaceTempView(s"dop_$seed")
      val desc = rnd.nextBoolean()
      val ord = if (desc) "v DESC, id" else "v, id"
      val rows = spark.sql(
        s"SELECT DISTINCT ON (g) g, id, v FROM dop_$seed ORDER BY g, $ord")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expect = data.groupBy(_._1).toSeq.map { case (g, rs) =>
        val pick = rs.sortBy(r => (if (desc) -r._3 else r._3, r._2)).head
        (g, pick._2)
      }.sortBy(_._1)
      assert(rows == expect, s"seed $seed: DISTINCT ON mismatch")
    }
  }

  test("star REPLACE matches the in-place model across random column picks") {
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed * 27779)
      Seq((1L, 2L, 3L, 4L)).toDF("a", "b", "c", "d")
        .createOrReplaceTempView(s"srp_$seed")
      val cols = Seq("a", "b", "c", "d")
      val replaced = rnd.shuffle(cols).take(1 + rnd.nextInt(3))
      val mult = 1 + rnd.nextInt(9)
      val items = replaced.map(c => s"$c * $mult AS $c").mkString(", ")
      val df = spark.sql(s"SELECT * REPLACE ($items) FROM srp_$seed")
      assert(df.columns.toSeq == cols, s"seed $seed: column order must " +
        "be unchanged (in-place replacement)")
      val row = df.collect().head
      cols.zipWithIndex.foreach { case (c, i) =>
        val base = i + 1L
        val expect = if (replaced.contains(c)) base * mult else base
        assert(row.getLong(i) == expect, s"seed $seed: $c")
      }
    }
  }

  test("WITH macros substitute like the model across random expressions") {
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed * 15073)
      val data = (0 until 20 + rnd.nextInt(40))
        .map(i => (i.toLong, rnd.nextInt(1000).toLong))
      data.toDF("id", "v").createOrReplaceTempView(s"wmp_$seed")
      val k = 1 + rnd.nextInt(9)
      val rows = spark.sql(
        s"""WITH $k AS mult, v * mult AS scaled
           |SELECT id, scaled FROM wmp_$seed WHERE scaled >= ${k * 100}
           |ORDER BY id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expect = data.map { case (id, v) => (id, v * k) }
        .filter(_._2 >= k * 100)
      assert(rows == expect, s"seed $seed: WITH macro mismatch")
    }
  }
}
