package graft

import graft.functions.{ClickHouseNames, GraftFunctions}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The second ClickHouse name family (ClickHouseNames): every alias must
  * equal its spelled-out Spark form on the same data — these are pure
  * renames, so the test IS the contract.
  */
class ClickHouseNamesSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.session
    GraftFunctions.register(s)
    s
  }

  private def one(sql: String): Row = spark.sql(sql).collect().head

  /** Spark 4 returns array columns as mutable ArraySeq — normalize. */
  private implicit class RowSeqOps(r: Row) {
    def seqOf[T](name: String): Seq[T] =
      r.getAs[scala.collection.Seq[T]](name).toSeq
  }

  test("aggregate names match their Spark spellings") {
    import spark.implicits._
    Seq((1L, "a", 10.0, 2.0), (2L, "b", 30.0, 1.0), (3L, "a", 20.0, 3.0),
      (4L, "c", 20.0, 0.0))
      .toDF("k", "g", "v", "w").createOrReplaceTempView("chn_agg")
    val r = one(
      """SELECT argMax(g, v) AS am, argMin(g, v) AS an,
        |  uniqExact(g) AS ue, uniqExact(g, v) AS ue2,
        |  sort_array(groupArray(g)) AS ga, sort_array(groupUniqArray(g)) AS gu,
        |  stddevPop(v) AS sp, varSamp(v) AS vs, covarPop(v, w) AS cp,
        |  avgWeighted(v, w) AS aw
        |FROM chn_agg""".stripMargin)
    assert(r.getAs[String]("am") == "b")
    assert(r.getAs[String]("an") == "a")
    assert(r.getAs[Long]("ue") == 3L)
    assert(r.getAs[Long]("ue2") == 4L)
    assert(r.seqOf[String]("ga") == Seq("a", "a", "b", "c"))
    assert(r.seqOf[String]("gu") == Seq("a", "b", "c"))
    val exp = one(
      """SELECT stddev_pop(v) AS sp, var_samp(v) AS vs, covar_pop(v, w) AS cp,
        |  sum(v * w) / sum(w) AS aw FROM chn_agg""".stripMargin)
    assert(math.abs(r.getAs[Double]("sp") - exp.getAs[Double]("sp")) < 1e-12)
    assert(math.abs(r.getAs[Double]("vs") - exp.getAs[Double]("vs")) < 1e-12)
    assert(math.abs(r.getAs[Double]("cp") - exp.getAs[Double]("cp")) < 1e-12)
    assert(math.abs(r.getAs[Double]("aw") - exp.getAs[Double]("aw")) < 1e-12)
  }

  test("uniq family estimates agree with approx_count_distinct") {
    import spark.implicits._
    (1 to 500).map(i => s"u${i % 137}").toDF("s")
      .createOrReplaceTempView("chn_uniq")
    val r = one(
      """SELECT uniq(s) AS u, uniqCombined(s) AS uc, uniqHLL12(s) AS uh,
        |  approx_count_distinct(s) AS ref FROM chn_uniq""".stripMargin)
    val ref = r.getAs[Long]("ref")
    assert(r.getAs[Long]("u") == ref && r.getAs[Long]("uc") == ref &&
      r.getAs[Long]("uh") == ref)
  }

  test("anyLast picks the last value of an ordered single partition") {
    import spark.implicits._
    val df = Seq(1 -> "first", 2 -> "mid", 3 -> "last").toDF("i", "s")
      .coalesce(1).sortWithinPartitions("i")
    df.createOrReplaceTempView("chn_any")
    assert(one("SELECT anyLast(s) AS l FROM chn_any").getAs[String]("l") == "last")
  }

  test("lambda-first higher-order array functions") {
    val r = one(
      """SELECT
        |  arrayMap(x -> x * 2, array(1, 2, 3)) AS m,
        |  arrayMap((x, y) -> x + y, array(1, 2), array(10, 20)) AS z,
        |  arrayFilter(x -> x % 2 = 0, array(1, 2, 3, 4)) AS f,
        |  arrayExists(x -> x > 3, array(1, 2)) AS e1,
        |  arrayExists(array(0, 0, 5)) AS e2,
        |  arrayAll(x -> x > 0, array(1, 2)) AS a1,
        |  arrayAll(array(1, 0)) AS a2,
        |  arrayCount(x -> x > 1, array(1, 2, 3)) AS c1,
        |  arrayCount(x -> x IS NOT NULL, array(1, NULL, 3)) AS cn,
        |  arrayCount(array(0, 7, 0, 9)) AS c2,
        |  arrayFirst(x -> x > 1, array(1, 2, 3)) AS fst,
        |  arrayFirst(x -> x > 9, array(1, 2, 3)) AS fst0,
        |  arrayFirstIndex(x -> x > 1, array(1, 2, 3)) AS fi,
        |  arrayFirstIndex(x -> x > 9, array(1, 2, 3)) AS fi0""".stripMargin)
    assert(r.seqOf[Int]("m") == Seq(2, 4, 6))
    assert(r.seqOf[Int]("z") == Seq(11, 22))
    assert(r.seqOf[Int]("f") == Seq(2, 4))
    assert(r.getAs[Boolean]("e1") == false && r.getAs[Boolean]("e2") == true)
    assert(r.getAs[Boolean]("a1") == true && r.getAs[Boolean]("a2") == false)
    assert(r.getAs[Long]("c1") == 2L && r.getAs[Long]("cn") == 2L &&
      r.getAs[Int]("c2") == 2)
    assert(r.getAs[Int]("fst") == 2 && r.isNullAt(r.fieldIndex("fst0")))
    assert(r.getAs[Long]("fi") == 2L && r.getAs[Long]("fi0") == 0L)
  }

  test("arraySum/arrayAvg/arrayMin/arrayMax, typed and lambda forms") {
    val r = one(
      """SELECT
        |  arraySum(array(1, 2, 3)) AS si,
        |  arraySum(array(1.5D, 2.5D)) AS sd,
        |  arraySum(x -> x * x, array(1, 2, 3)) AS sl,
        |  arrayAvg(array(1, 2, 3, 6)) AS av,
        |  arrayAvg(x -> x * 2, array(1, 2, 3)) AS avl,
        |  arrayMin(array(3, 1, 2)) AS mn,
        |  arrayMin(x -> x % 10, array(31, 12, 23)) AS mnl,
        |  arrayMax(x -> -x, array(3, 1, 2)) AS mx""".stripMargin)
    assert(r.getAs[Long]("si") == 6L) // integral stays integral
    assert(math.abs(r.getAs[Double]("sd") - 4.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("sl") - 14.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("av") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("avl") - 4.0) < 1e-12)
    assert(r.getAs[Int]("mn") == 1)
    assert(r.getAs[Double]("mnl") == 1.0) // λ forms reduce in Float64
    assert(r.getAs[Double]("mx") == -1.0)
  }

  test("arraySort with a key lambda (Schwartzian struct) and reverse sort") {
    val r = one(
      """SELECT
        |  arraySort(array(3, 1, 2)) AS s0,
        |  arraySort(x -> -x, array(3, 1, 2)) AS s1,
        |  arrayReverseSort(array(3, 1, 2)) AS r0,
        |  arrayReverseSort(x -> x % 10, array(31, 12, 23)) AS r1""".stripMargin)
    assert(r.seqOf[Int]("s0") == Seq(1, 2, 3))
    assert(r.seqOf[Int]("s1") == Seq(3, 2, 1))
    assert(r.seqOf[Int]("r0") == Seq(3, 2, 1))
    assert(r.seqOf[Int]("r1") == Seq(23, 12, 31)) // by last digit desc
  }

  test("plain array names: concat/distinct/uniq/slice/zip/push/pop/enumerate/difference/has") {
    val r = one(
      """SELECT
        |  arrayConcat(array(1, 2), array(3)) AS cc,
        |  arrayDistinct(array(1, 2, 1)) AS dd,
        |  arrayUniq(array(1, 2, 1, 3)) AS uq,
        |  arrayReverse(array(1, 2, 3)) AS rv,
        |  arrayFlatten(array(array(1), array(2, 3))) AS fl,
        |  arrayIntersect(array(1, 2, 3), array(2, 3, 4)) AS ix,
        |  arraySlice(array(1, 2, 3, 4), 2) AS sl2,
        |  arraySlice(array(1, 2, 3, 4), 2, 2) AS sl3,
        |  arrayPushBack(array(1, 2), 9) AS pb,
        |  arrayPushFront(array(1, 2), 9) AS pf,
        |  arrayPopBack(array(1, 2, 3)) AS qb,
        |  arrayPopFront(array(1, 2, 3)) AS qf,
        |  arrayEnumerate(array(7, 8, 9)) AS en,
        |  arrayEnumerate(array()) AS en0,
        |  arrayDifference(array(1, 4, 9)) AS df,
        |  hasAll(array(1, 2, 3), array(1, 3)) AS ha,
        |  hasAll(array(1, 2), array(1, 9)) AS ha0,
        |  hasAny(array(1, 2), array(2, 9)) AS hy""".stripMargin)
    assert(r.seqOf[Int]("cc") == Seq(1, 2, 3))
    assert(r.seqOf[Int]("dd") == Seq(1, 2))
    assert(r.getAs[Int]("uq") == 3)
    assert(r.seqOf[Int]("rv") == Seq(3, 2, 1))
    assert(r.seqOf[Int]("fl") == Seq(1, 2, 3))
    assert(r.seqOf[Int]("ix").sorted == Seq(2, 3))
    assert(r.seqOf[Int]("sl2") == Seq(2, 3, 4))
    assert(r.seqOf[Int]("sl3") == Seq(2, 3))
    assert(r.seqOf[Int]("pb") == Seq(1, 2, 9))
    assert(r.seqOf[Int]("pf") == Seq(9, 1, 2))
    assert(r.seqOf[Int]("qb") == Seq(1, 2))
    assert(r.seqOf[Int]("qf") == Seq(2, 3))
    assert(r.seqOf[Int]("en") == Seq(1, 2, 3))
    assert(r.seqOf[Int]("en0") == Seq.empty)
    assert(r.seqOf[Int]("df") == Seq(0, 3, 5))
    assert(r.getAs[Boolean]("ha") && !r.getAs[Boolean]("ha0") &&
      r.getAs[Boolean]("hy"))
  }

  test("arrayJoin is the explode generator") {
    val rows = spark.sql("SELECT arrayJoin(array(1, 2, 3)) AS x")
      .collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(1, 2, 3))
  }

  test("string names") {
    val r = one(
      """SELECT
        |  positionUTF8('Hello world', 'world') AS p,
        |  positionUTF8('Hello world', 'zzz') AS p0,
        |  positionCaseInsensitive('Hello World', 'WORLD') AS pc,
        |  match('abc123', '^[a-z]+[0-9]+$') AS m1,
        |  match('abc', '^[0-9]+$') AS m0,
        |  replaceAll('a-b-c', '-', '+') AS ra,
        |  replaceOne('a-b-c', '-', '+') AS r1,
        |  replaceOne('abc', 'z', '+') AS rz,
        |  replaceRegexpAll('a1b22c', '[0-9]+', '#') AS rr,
        |  lowerUTF8('AbC') AS lo, upperUTF8('AbC') AS up,
        |  lengthUTF8('héllo') AS ln,
        |  substringUTF8('hello', 2, 3) AS s3,
        |  substringUTF8('hello', 3) AS s2,
        |  trimBoth('  x  ') AS tb, trimLeft('  x  ') AS tl, trimRight('  x  ') AS tr,
        |  leftPad('7', 3, '0') AS lp, rightPad('7', 3) AS rp,
        |  empty('') AS e1, empty('x') AS e2, empty(array()) AS e3,
        |  notEmpty(array(1)) AS e4""".stripMargin)
    assert(r.getAs[Int]("p") == 7 && r.getAs[Int]("p0") == 0)
    assert(r.getAs[Int]("pc") == 7)
    assert(r.getAs[Boolean]("m1") && !r.getAs[Boolean]("m0"))
    assert(r.getAs[String]("ra") == "a+b+c")
    assert(r.getAs[String]("r1") == "a+b-c")
    assert(r.getAs[String]("rz") == "abc")
    assert(r.getAs[String]("rr") == "a#b#c")
    assert(r.getAs[String]("lo") == "abc" && r.getAs[String]("up") == "ABC")
    assert(r.getAs[Int]("ln") == 5)
    assert(r.getAs[String]("s3") == "ell" && r.getAs[String]("s2") == "llo")
    assert(r.getAs[String]("tb") == "x" && r.getAs[String]("tl") == "x  " &&
      r.getAs[String]("tr") == "  x")
    assert(r.getAs[String]("lp") == "007" && r.getAs[String]("rp") == "7  ")
    assert(r.getAs[Boolean]("e1") && !r.getAs[Boolean]("e2") &&
      r.getAs[Boolean]("e3") && r.getAs[Boolean]("e4"))
  }

  test("arithmetic names") {
    val r = one(
      """SELECT
        |  plus(2, 3) AS pl, minus(2, 3) AS mi, multiply(4, 5) AS mu,
        |  divide(7, 2) AS dv, negate(5) AS ng,
        |  intDiv(7, 2) AS id, intDivOrZero(7, 0) AS iz,
        |  modulo(7, 3) AS mo, moduloOrZero(7, 0) AS mz,
        |  roundBankers(2.5D) AS rb, roundBankers(3.5D) AS rb2,
        |  roundBankers(2.345D, 2) AS rb3,
        |  toTypeName(1L) AS tn""".stripMargin)
    assert(r.getAs[Int]("pl") == 5 && r.getAs[Int]("mi") == -1 &&
      r.getAs[Int]("mu") == 20)
    assert(math.abs(r.getAs[Double]("dv") - 3.5) < 1e-12) // always Float64
    assert(r.getAs[Int]("ng") == -5)
    assert(r.getAs[Long]("id") == 3L && r.getAs[Long]("iz") == 0L)
    assert(r.getAs[Int]("mo") == 1 && r.getAs[Long]("mz") == 0L)
    assert(r.getAs[Double]("rb") == 2.0 && r.getAs[Double]("rb2") == 4.0)
    assert(math.abs(r.getAs[Double]("rb3") - 2.34) < 1e-12)
    assert(r.getAs[String]("tn") == "BIGINT")
  }

  test("date arithmetic: type-directed add/subtract, dateDiff both arities") {
    val r = one(
      """SELECT
        |  addDays(DATE'2024-01-30', 3) AS d1,
        |  subtractDays(DATE'2024-01-02', 3) AS d2,
        |  addDays(TIMESTAMP'2024-01-01 10:00:00', 1) AS t1,
        |  subtractHours(TIMESTAMP'2024-01-01 10:00:00', 2) AS t2,
        |  addMonths(DATE'2024-01-31', 1) AS m1,
        |  subtractYears(DATE'2024-02-29', 1) AS y1,
        |  addMinutes(TIMESTAMP'2024-01-01 00:00:00', 90) AS mi,
        |  dateDiff(DATE'2024-01-10', DATE'2024-01-03') AS dd2,
        |  dateDiff(day, DATE'2024-01-03', DATE'2024-01-10') AS dd3,
        |  dateDiff(hour, TIMESTAMP'2024-01-01 00:00:00',
        |           TIMESTAMP'2024-01-02 06:00:00') AS ddh,
        |  toMonday(DATE'2024-08-15') AS mon,
        |  toYYYYMM(DATE'2024-08-15') AS ym,
        |  toYYYYMMDD(DATE'2024-08-15') AS ymd,
        |  yesterday() = date_sub(current_date(), 1) AS yd""".stripMargin)
    assert(r.getAs[java.sql.Date]("d1").toString == "2024-02-02")
    assert(r.getAs[java.sql.Date]("d2").toString == "2023-12-30")
    assert(r.getAs[java.sql.Timestamp]("t1").toString.startsWith("2024-01-02 10:00"))
    assert(r.getAs[java.sql.Timestamp]("t2").toString.startsWith("2024-01-01 08:00"))
    assert(r.getAs[java.sql.Date]("m1").toString == "2024-02-29")
    assert(r.getAs[java.sql.Date]("y1").toString == "2023-02-28")
    assert(r.getAs[java.sql.Timestamp]("mi").toString.startsWith("2024-01-01 01:30"))
    assert(r.getAs[Int]("dd2") == 7 && r.getAs[Long]("dd3") == 7L)
    assert(r.getAs[Long]("ddh") == 30L)
    assert(r.getAs[java.sql.Date]("mon").toString == "2024-08-12")
    assert(r.getAs[Int]("ym") == 202408 && r.getAs[Int]("ymd") == 20240815)
    assert(r.getAs[Boolean]("yd"))
  }

  test("formatDateTime translates %-tokens; unknown tokens refuse") {
    val r = one(
      """SELECT
        |  formatDateTime(TIMESTAMP'2024-08-15 09:05:07', '%Y-%m-%d %H:%i:%S') AS a,
        |  formatDateTime(DATE'2024-08-15', 'day %d of %m, %Y') AS b,
        |  formatDateTime(TIMESTAMP'2024-08-15 09:05:07', '%F %T') AS c,
        |  formatDateTime(TIMESTAMP'2024-08-15 09:05:07', '100%%') AS d""".stripMargin)
    assert(r.getAs[String]("a") == "2024-08-15 09:05:07")
    assert(r.getAs[String]("b") == "day 15 of 08, 2024")
    assert(r.getAs[String]("c") == "2024-08-15 09:05:07")
    assert(r.getAs[String]("d") == "100%")
    val err = intercept[Exception] {
      spark.sql("SELECT formatDateTime(now(), '%Q')").collect()
    }
    assert(err.getMessage.contains("no faithful Java translation"))
  }

  test("OrNull/OrZero conversions") {
    val r = one(
      """SELECT
        |  toInt64OrNull('42') AS a, toInt64OrNull('4x2') AS b,
        |  toInt64OrZero('4x2') AS c, toFloat64OrNull('1.5') AS d,
        |  toFloat64OrZero('nope') AS e,
        |  toDateOrNull('2024-08-15') AS f, toDateOrNull('nope') AS g,
        |  toDateOrZero('nope') AS h,
        |  toDateTimeOrNull('nope') AS i,
        |  parseDateTimeBestEffort('2024-08-15 10:00:00') AS j,
        |  parseDateTimeBestEffortOrNull('garbage') AS k""".stripMargin)
    assert(r.getAs[Long]("a") == 42L && r.isNullAt(r.fieldIndex("b")))
    assert(r.getAs[Long]("c") == 0L)
    assert(r.getAs[Double]("d") == 1.5 && r.getAs[Double]("e") == 0.0)
    assert(r.getAs[java.sql.Date]("f").toString == "2024-08-15")
    assert(r.isNullAt(r.fieldIndex("g")))
    assert(r.getAs[java.sql.Date]("h").toString == "1970-01-01")
    assert(r.isNullAt(r.fieldIndex("i")))
    assert(r.getAs[java.sql.Timestamp]("j").toString.startsWith("2024-08-15 10:00"))
    assert(r.isNullAt(r.fieldIndex("k")))
  }

  test("JSON extraction family over get_json_object paths") {
    val r = one(
      """SELECT
        |  JSONExtractString('{"a": "x", "b": {"c": "y"}}', 'a') AS s1,
        |  JSONExtractString('{"a": "x", "b": {"c": "y"}}', 'b', 'c') AS s2,
        |  JSONExtractInt('{"n": 42}', 'n') AS i1,
        |  JSONExtractInt('{"n": "zz"}', 'n') AS i0,
        |  JSONExtractFloat('{"f": 1.5}', 'f') AS f1,
        |  JSONExtractBool('{"b": true}', 'b') AS b1,
        |  JSONExtractBool('{"b": "no"}', 'b') AS b0,
        |  JSONExtractString('{"arr": ["p", "q"]}', 'arr', 2) AS ax,
        |  JSONExtractRaw('{"b": {"c": 1}}', 'b') AS raw,
        |  JSONHas('{"a": 1}', 'a') AS h1,
        |  JSONHas('{"a": 1}', 'z') AS h0""".stripMargin)
    assert(r.getAs[String]("s1") == "x" && r.getAs[String]("s2") == "y")
    assert(r.getAs[Long]("i1") == 42L && r.getAs[Long]("i0") == 0L)
    assert(r.getAs[Double]("f1") == 1.5)
    assert(r.getAs[Boolean]("b1") && !r.getAs[Boolean]("b0"))
    assert(r.getAs[String]("ax") == "q") // ClickHouse 1-based index
    assert(r.getAs[String]("raw") == """{"c":1}""")
    assert(r.getAs[Boolean]("h1") && !r.getAs[Boolean]("h0"))
    val err = intercept[Exception](
      spark.sql("SELECT JSONExtractString('{}', 'a', -1)").collect())
    assert(err.getMessage.contains("1-based"))
  }

  test("bit/map/tuple/split/regexp names") {
    val r = one(
      """SELECT
        |  bitAnd(12, 10) AS ba, bitOr(12, 10) AS bo, bitXor(12, 10) AS bx,
        |  bitNot(0) AS bn, bitShiftLeft(1, 4) AS bl, bitShiftRight(16, 2) AS br,
        |  mapKeys(map('a', 1, 'b', 2)) AS mk,
        |  mapValues(map('a', 1, 'b', 2)) AS mv,
        |  mapContains(map('a', 1), 'a') AS mc1,
        |  mapContains(map('a', 1), 'z') AS mc0,
        |  tupleElement(named_struct('x', 7, 'y', 'q'), 2) AS t2,
        |  tupleElement(named_struct('x', 7, 'y', 'q'), 'x') AS tx,
        |  array_join(splitByString('--', 'a--b--c'), ',') AS sbs,
        |  array_join(splitByRegexp('[0-9]+', 'a1b22c'), ',') AS sbr,
        |  array_join(extractAll('k=1, k=22', 'k=([0-9]+)'), ',') AS xa,
        |  array_join(extractAll('ab cd', '[a-z]+'), ',') AS xw,
        |  countMatches('a1b22c333', '[0-9]+') AS cm,
        |  assumeNotNull(5) AS an,
        |  CAST(toStartOfWeek(DATE'2024-08-15') AS STRING) AS sw,
        |  CAST(toStartOfWeek(DATE'2024-08-11') AS STRING) AS sw2""".stripMargin)
    def num(n: String): Long = r.getAs[Number](n).longValue
    assert(num("ba") == 8L && num("bo") == 14L && num("bx") == 6L)
    assert(num("bn") == -1L)
    assert(num("bl") == 16L && num("br") == 4L)
    assert(r.seqOf[String]("mk") == Seq("a", "b"))
    assert(r.seqOf[Int]("mv") == Seq(1, 2))
    assert(r.getAs[Boolean]("mc1") && !r.getAs[Boolean]("mc0"))
    assert(r.getAs[String]("t2") == "q" && r.getAs[Int]("tx") == 7)
    assert(r.getAs[String]("sbs") == "a,b,c")
    assert(r.getAs[String]("sbr") == "a,b,c")
    assert(r.getAs[String]("xa") == "1,22") // first capture group
    assert(r.getAs[String]("xw") == "ab,cd") // whole matches, no group
    assert(r.getAs[Number]("cm").longValue == 3L)
    assert(r.getAs[Int]("an") == 5)
    // 2024-08-15 is a Thursday -> Sunday 2024-08-11; a Sunday maps to itself
    assert(r.getAs[String]("sw") == "2024-08-11")
    assert(r.getAs[String]("sw2") == "2024-08-11")
  }

  test("-State/-Merge: two-stage aggregation equals single-stage") {
    import spark.implicits._
    (1 to 400).map(i => (s"g${i % 3}", s"s${i % 5}", i.toLong, i * 1.5))
      .toDF("g", "s", "k", "v").createOrReplaceTempView("st_t")
    val two = spark.sql(
      """SELECT g, CAST(uniqMerge(u) AS BIGINT) AS uq,
        |  sumMerge(sm) AS sm, CAST(countMerge(c) AS BIGINT) AS c,
        |  minMerge(mn) AS mn, maxMerge(mx) AS mx
        |FROM (SELECT g, s, uniqState(k) AS u, sumState(k) AS sm,
        |        countState(k) AS c, minState(v) AS mn, maxState(v) AS mx
        |      FROM st_t GROUP BY g, s)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    val one = spark.sql(
      """SELECT g, count(DISTINCT k) AS uq, sum(k) AS sm, count(k) AS c,
        |  min(v) AS mn, max(v) AS mx
        |FROM st_t GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(two.map(_.toSeq).toSeq == one.map(_.toSeq).toSeq,
      "merge-of-states equals the single-stage aggregate (exact at this " +
        "cardinality: the HLL sketch still holds coupons)")
    // the sketch state is a real binary blob, not a value
    val st = spark.sql("SELECT uniqState(k) AS u FROM st_t").schema.head
    assert(st.dataType == org.apache.spark.sql.types.BinaryType)
    // avgState is deliberately absent (non-scalar state) — loud
    intercept[Exception] {
      spark.sql("SELECT avgState(v) FROM st_t").collect()
    }
  }

  test("windows & readability: lagInFrame, bar, formatReadable*, ngrams, tokens") {
    import spark.implicits._
    Seq((1L, 10.0), (2L, 30.0), (3L, 20.0)).toDF("id", "v")
      .createOrReplaceTempView("wr_t")
    val lag = spark.sql(
      """SELECT id, lagInFrame(v) OVER (ORDER BY id) AS pv,
        |  leadInFrame(v, 1, -1.0) OVER (ORDER BY id) AS nv
        |FROM wr_t ORDER BY id""".stripMargin).collect()
    assert(lag.map(r => Option(r.get(1))).toSeq ==
      Seq(None, Some(10.0), Some(30.0)))
    assert(lag.map(_.getDouble(2)).toSeq == Seq(30.0, 20.0, -1.0))
    // window functions refuse bare use (no OVER) — loud
    intercept[Exception] {
      spark.sql("SELECT lagInFrame(v) FROM wr_t").collect()
    }
    val r = spark.sql(
      """SELECT bar(5, 0, 10, 8) AS b, bar(99, 0, 10, 8) AS bmax,
        |  bar(-1, 0, 10, 8) AS bmin,
        |  formatReadableSize(1536) AS ks,
        |  formatReadableSize(3 * 1024 * 1024) AS ms,
        |  formatReadableQuantity(1234567) AS q,
        |  array_join(ngrams('abcd', 3), ',') AS tri,
        |  ngrams('ab', 3) AS none,
        |  array_join(tokens('foo, bar-baz!'), '|') AS toks""".stripMargin)
      .collect().head
    assert(r.getString(0) == "████")
    assert(r.getString(1) == "████████", "clamped to width")
    assert(r.getString(2) == "", "clamped to zero")
    assert(r.getString(3) == "1.50 KiB")
    assert(r.getString(4) == "3.00 MiB")
    assert(r.getString(5) == "1.23 million")
    assert(r.getString(6) == "abc,bcd")
    assert(r.getSeq[String](7).isEmpty)
    assert(r.getString(8) == "foo|bar|baz")
  }

  test("arrayCumSum single-pass running sums; arrayCompact consecutive dedup") {
    val r = spark.sql(
      """SELECT array_join(transform(arrayCumSum(array(1, 2, 3, 4)),
        |    x -> CAST(x AS STRING)), ',') AS cs,
        |  array_join(transform(arrayCompact(array(1, 1, 2, 2, 2, 1, 3)),
        |    x -> CAST(x AS STRING)), ',') AS cp,
        |  size(arrayCumSum(array())) AS z
        |""".stripMargin.stripLineEnd).collect().head
    assert(r.getString(0) == "1.0,3.0,6.0,10.0")
    assert(r.getString(1) == "1,2,1,3", "consecutive dups collapse, " +
      "non-consecutive repeats survive")
    assert(r.getInt(2) == 0)
    // quantileTiming parametric maps to the same exact percentile
    import spark.implicits._
    (1 to 9).map(_.toLong).toDF("v").createOrReplaceTempView("qt_t")
    assert(spark.sql("SELECT quantileTiming(0.5)(v) AS p FROM qt_t")
      .collect().head.getDouble(0) == 5.0)
  }

  test("no alias shadows a Spark builtin") {
    val builtin = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
    val shadowed = ClickHouseNames.all.map(_._1.funcName)
      .filter(n => builtin.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n.toLowerCase)))
    assert(shadowed.isEmpty, s"aliases shadow Spark builtins: $shadowed")
  }
}
