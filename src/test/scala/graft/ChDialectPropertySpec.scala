package graft

import graft.functions.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

/** Property-style workload tests for the round-16 second-wave dialect:
  * random data and random parameters — the SQL result must equal either a
  * plain Scala model of the documented semantics or Spark's own spelling
  * of the same computation (for the pure aliases, the Spark spelling IS
  * the contract).
  */
class ChDialectPropertySpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.session
    GraftFunctions.register(s)
    s
  }

  test("parametric quantile/uniqUpTo/groupArray match plain models on random data") {
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919)
      val n = 50 + rnd.nextInt(400)
      val card = 1 + rnd.nextInt(40)
      val data = (0 until n).map(_ => (rnd.nextInt(1000).toLong,
        s"g${rnd.nextInt(card)}"))
      data.toDF("v", "g").createOrReplaceTempView(s"chp_$seed")
      // quantile at a dyadic level over integers: exact in both engines
      val p = Seq(0.25, 0.5, 0.75)(rnd.nextInt(3))
      val got = spark.sql(
        s"SELECT quantile($p)(v) AS q FROM chp_$seed").collect().head.getDouble(0)
      val sorted = data.map(_._1).sorted
      val pos = p * (sorted.size - 1)
      val (lo, hi) = (sorted(pos.toInt), sorted(math.ceil(pos).toInt))
      val model = lo + (hi - lo) * (pos - pos.toInt)
      assert(got == model, s"seed $seed: quantile($p) $got != $model")
      // uniqUpTo: exact below the cap, n+1 at saturation
      val cap = 1 + rnd.nextInt(12)
      val gotU = spark.sql(
        s"SELECT uniqUpTo($cap)(g) AS u FROM chp_$seed").collect().head.getLong(0)
      val distinct = data.map(_._2).distinct.size
      val modelU = if (distinct <= cap) distinct.toLong else cap + 1L
      assert(gotU == modelU, s"seed $seed: uniqUpTo($cap) $gotU != $modelU")
      // groupArray(k): a k-slice of the group's values (content-checked
      // via sort — collection order is not part of the contract)
      val k = 1 + rnd.nextInt(n)
      val gotG = spark.sql(
        s"SELECT size(groupArray($k)(g)) AS s FROM chp_$seed").collect().head.getInt(0)
      assert(gotG == math.min(k, n), s"seed $seed: groupArray($k) size")
    }
  }

  test("lambda-first array functions equal Spark's own spellings on random arrays") {
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed * 104729)
      val arrs = (0 until 30).map { i =>
        (i.toLong, (0 until rnd.nextInt(12)).map(_ => rnd.nextInt(100) - 50))
      }
      arrs.toDF("id", "a").createOrReplaceTempView(s"chh_$seed")
      val rows = spark.sql(
        s"""SELECT
           |  arrayMap(x -> x * 3 + 1, a) = transform(a, x -> x * 3 + 1) AS m,
           |  arrayFilter(x -> x % 2 = 0, a) = filter(a, x -> x % 2 = 0) AS f,
           |  arrayExists(x -> x > 40, a) = exists(a, x -> x > 40) AS e,
           |  arrayAll(x -> x > -60, a) = forall(a, x -> x > -60) AS fa,
           |  arrayCount(x -> x < 0, a) = size(filter(a, x -> x < 0)) AS c,
           |  arraySum(a) = aggregate(a, 0L, (acc, x) -> acc + x) AS s,
           |  arraySort(a) = array_sort(a) AS so,
           |  arrayReverseSort(a) = reverse(array_sort(a)) AS rs,
           |  arrayFirstIndex(x -> x > 25, a) =
           |    array_position(transform(a, x -> x > 25), true) AS fi
           |FROM chh_$seed""".stripMargin).collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        (0 until r.length).foreach { j =>
          assert(r.getBoolean(j), s"seed $seed row $i field $j diverged")
        }
      }
    }
  }

  test("ASOF JOIN matches a plain Scala model on random trades/quotes") {
    import spark.implicits._
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed * 31337)
      val syms = (0 until 4).map(i => s"s$i")
      val trades = (0 until 40).map(i =>
        (i.toLong, syms(rnd.nextInt(4)), rnd.nextInt(100).toLong))
      // UNIQUE quote times per sym so the top-1 pick is deterministic
      val quotes = syms.flatMap { s =>
        rnd.shuffle((0 until 100).toList).take(10 + rnd.nextInt(20))
          .map(t => (s, t.toLong, rnd.nextInt(1000).toLong))
      }
      trades.toDF("tid", "sym", "t").createOrReplaceTempView(s"asp_t_$seed")
      quotes.toDF("sym", "qt", "px").createOrReplaceTempView(s"asp_q_$seed")
      val got = spark.sql(
        s"""SELECT tr.tid, q.qt, q.px FROM asp_t_$seed tr
           |ASOF LEFT JOIN asp_q_$seed q
           |  ON tr.sym = q.sym AND q.qt <= tr.t
           |ORDER BY tr.tid""".stripMargin).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
        .toSeq
      val bySym = quotes.groupBy(_._1)
      val model = trades.sortBy(_._1).map { case (tid, sym, t) =>
        val cands = bySym.getOrElse(sym, Nil).filter(_._2 <= t)
        (tid, if (cands.isEmpty) None
              else Some(cands.maxBy(_._2)).map(c => (c._2, c._3)))
      }
      assert(got == model, s"seed $seed: ASOF LEFT JOIN diverged from model")
    }
  }

  test("LIMIT WITH TIES matches the rank model on random multisets") {
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed * 65537)
      val data = (0 until 30 + rnd.nextInt(100)).map(_ => rnd.nextInt(15))
      data.map(v => Tuple1(v)).toDF("v").createOrReplaceTempView(s"lwt_$seed")
      val n = 1 + rnd.nextInt(data.size)
      val got = spark.sql(
        s"SELECT v FROM lwt_$seed ORDER BY v LIMIT $n WITH TIES")
        .collect().map(_.getInt(0)).toSeq
      val sorted = data.sorted
      val cutoff = sorted(n - 1) // keep everything <= the n-th value
      val model = sorted.takeWhile(_ <= cutoff)
      assert(got == model, s"seed $seed: WITH TIES $got != $model")
    }
  }
}
