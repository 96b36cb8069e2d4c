package graft

import graft.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom-function tier (SURVEY §2.2 UDF/UDAF row): the native codegen
  * cosine Expression agrees bit-for-bit with the interpreted HOF
  * formulation, survives both eval paths, registers via SQL, and the typed
  * Aggregator matches built-in aggregates.
  */
class GraftFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("simhash64 expression matches the 64-aggregate formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text with other words entirely"),
      (4L, "a"), (5L, ""), (6L, "repeat repeat repeat repeat")
    ).toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val fast = docs.select(col("doc_id"),
      call_function("simhash64", toks).as("sig"))
    // the former q27 spelling: explode → 64 conditional sums → sign bits
    val tok = docs.select(col("doc_id"), explode(toks).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitAggs = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val scored = tok.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))
    val slow = scored.select(col("doc_id"), sig.as("sig"))
    assert(fast.orderBy("doc_id").collect().toSeq ==
      slow.orderBy("doc_id").collect().toSeq)
    // interpreted eval path agrees with codegen
    val row = fast.filter(col("doc_id") === 1L).collect().head
    val interp = graft.functions.SimHash64.compute(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        "the quick brown fox jumps over the lazy dog".split(" ")
          .map(org.apache.spark.unsafe.types.UTF8String.fromString)))
    assert(row.getLong(1) == interp)
  }

  test("minhash_band_sigs matches MinHashStore.bandSignatures bit-for-bit") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val docs = (1L to 40L).map { id =>
      (id, (0 until rnd.nextInt(60) + 1).map(_ => rnd.nextLong()).distinct)
    }
    val docsH = docs.toDF("doc_id", "hs")
    val fast = docsH.select(col("doc_id"),
        posexplode(call_function("minhash_band_sigs", col("hs"))))
      .toDF("doc_id", "band", "sig")
    val dsh = docsH.select(col("doc_id"), explode(col("hs")).as("h"))
    val slow = graft.operators.MinHashStore.bandSignatures(dsh)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(1), r.getLong(2))
    assert(fast.collect().map(key).sortBy(identity).toSeq ==
      slow.collect().map(key).sortBy(identity).toSeq)
  }

  test("simhash64 and minhash_band_sigs return NULL for an empty array") {
    // The aggregate faces emit NO row for a doc with no tokens/shingles;
    // a signature here would make every empty doc band-collide (r16
    // ADVICE). Null propagates to "no row" through explode.
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT simhash64(CAST(array() AS ARRAY<STRING>)) AS s, " +
        "minhash_band_sigs(CAST(array() AS ARRAY<BIGINT>)) AS m").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    // non-empty stays non-null
    val r2 = spark.sql("SELECT simhash64(array('a')) AS s, " +
      "minhash_band_sigs(array(1L)) AS m").collect().head
    assert(!r2.isNullAt(0) && !r2.isNullAt(1))
  }

  test("top_bigram_run matches the HOF aggregate formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "", "yy")
    val docs = (1L to 60L).map { id =>
      // lengths 0..30, with repetition-heavy docs mixed in
      val n = rnd.nextInt(31)
      val ws = (0 until n).map(_ =>
        if (rnd.nextBoolean()) vocab(rnd.nextInt(vocab.size))
        else vocab(rnd.nextInt(2)))
      (id, ws)
    }
    val df = docs.toDF("doc_id", "ws")
    val fast = df.select(col("doc_id"),
      call_function("top_bigram_run", col("ws")).as("tb"))
    // the former PipelineQueries.topBigramRun spelling over the
    // signalCols bigram construction
    val ws = col("ws")
    val bigrams = transform(
      sequence(lit(1), greatest(lit(1), size(ws) - lit(1))),
      i => concat_ws(" ", slice(ws, i, lit(2))))
    val hof = aggregate(
      array_sort(transform(bigrams, b => xxhash64(b))),
      struct(lit(null).cast("long").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + lit(1L))
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val slow = df.select(col("doc_id"), hof.as("tb"))
    assert(fast.orderBy("doc_id").collect().toSeq ==
      slow.orderBy("doc_id").collect().toSeq)
    // interpreted eval agrees with codegen on a repetition-heavy doc
    val interp = graft.functions.TopBigramRun.compute(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        "a b a b a b c".split(" ")
          .map(org.apache.spark.unsafe.types.UTF8String.fromString)))
    assert(interp == 3L) // "a b" occurs 3 times
  }

  test("mixed_tokens matches the HOF formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    val asciiVocab = Vector("alpha", "be", "gamma9", "Delta", "x!y", "a-b-c")
    val fixtures = Seq(
      "", " ", "abc", "ab", "ABC def!GHIJ", "mixed 中文 text",
      "中文字符串没有空格", "中", "中a文", "汉字two汉字", "日本語 かな 中間",
      "İstanbul DİŞLİ straße ÄÖÜ", "a中b文c", "中 文", "ab中文cd ef",
      "𪚥𪚥e") ++ // supplementary Han (U+2A6A5) pair
      (1 to 40).map(_ => (0 until rnd.nextInt(12)).map(_ =>
        asciiVocab(rnd.nextInt(asciiVocab.size))).mkString(" "))
    val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val fast = df.select(col("id"),
      call_function("mixed_tokens", col("text")).as("ws"))
    val slow = df.select(col("id"),
      graft.operators.InvertedIndex.mixedTokensHof(col("text")).as("ws"))
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getSeq[String](1))
    assert(fast.collect().map(key).sortBy(_._1).toSeq ==
      slow.collect().map(key).sortBy(_._1).toSeq)
    // latin_tokens == the latin HOF spelling on the same fixtures
    val fastL = df.select(col("id"),
      call_function("latin_tokens", col("text")).as("ws"))
    val slowL = df.select(col("id"),
      filter(split(lower(col("text")), "[^a-z]+"), t => length(t) >= 3).as("ws"))
    assert(fastL.collect().map(key).sortBy(_._1).toSeq ==
      slowL.collect().map(key).sortBy(_._1).toSeq)
  }

  test("window_hashes matches the HOF shingle/window spellings bit-for-bit") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.graft.ColumnBridge
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "", "yy", "zz中")
    val docs = (1L to 60L).map { id =>
      val n = rnd.nextInt(40) // 0..39: short docs exercise both geometries
      (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))))
    }
    val df = docs.toDF("doc_id", "ws")
    val ws = col("ws")
    def fused(k: Int, atLeastOne: Boolean) = ColumnBridge.column(
      graft.functions.WindowHashesExpr(ColumnBridge.expression(ws), k, atLeastOne))
    // shingle geometry (k=5, at least one window — short docs truncate)
    val shingleHof = transform(
      sequence(lit(1), greatest(lit(1), size(ws) - lit(4))),
      i => xxhash64(concat_ws(" ", slice(ws, i, lit(5)))))
    val a = df.select(col("doc_id"), fused(5, atLeastOne = true).as("hs")).collect()
    val b = df.select(col("doc_id"), shingleHof.as("hs")).collect()
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getSeq[Long](1))
    assert(a.map(key).sortBy(_._1).toSeq == b.map(key).sortBy(_._1).toSeq)
    // span geometry (k=15, no window for short docs)
    val nw = size(ws) - lit(15) + 1
    val spanHof = when(nw >= 1, transform(sequence(lit(1), nw),
        i => xxhash64(concat_ws(" ", slice(ws, i, lit(15))))))
      .otherwise(array().cast("array<bigint>"))
    val c = df.select(col("doc_id"), fused(15, atLeastOne = false).as("hs")).collect()
    val d = df.select(col("doc_id"), spanHof.as("hs")).collect()
    assert(c.map(key).sortBy(_._1).toSeq == d.map(key).sortBy(_._1).toSeq)
  }

  test("token_gram_hashes matches the hash-then-slice HOF spelling bit-for-bit") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.graft.ColumnBridge
    val rnd = new scala.util.Random(19)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "")
    val docs = (1L to 50L).map { id =>
      val n = rnd.nextInt(30) // 0..29: includes sub-13-token docs
      (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))))
    }
    val df = docs.toDF("doc_id", "ws")
    val ws = col("ws")
    val fused = ColumnBridge.column(
      graft.functions.TokenGramHashesExpr(ColumnBridge.expression(ws), 13))
    val th = transform(ws, t => xxhash64(t))
    val hof = when(size(th) >= 13,
      transform(sequence(lit(1), size(th) - lit(12)),
        i => xxhash64(slice(th, i, lit(13)))))
      .otherwise(array().cast("array<bigint>"))
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getSeq[Long](1))
    assert(df.select(col("doc_id"), fused.as("g")).collect().map(key).sortBy(_._1).toSeq ==
      df.select(col("doc_id"), hof.as("g")).collect().map(key).sortBy(_._1).toSeq)
  }

  test("chunk_digests matches hashing/measuring the chunks10 strings bit-for-bit") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.graft.ColumnBridge
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "", "中文", "汉")
    val docs = (1L to 50L).map { id =>
      val n = rnd.nextInt(45) // 0..44: partial trailing chunks exercised
      (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))))
    }
    val df = docs.toDF("doc_id", "ws")
    val ws = col("ws")
    val fused = df.select(col("doc_id"),
        explode(ColumnBridge.column(graft.functions.ChunkDigestsExpr(
          ColumnBridge.expression(ws), 10))).as("cd"))
      .select(col("doc_id"), col("cd.h").as("h"), col("cd.clen").as("clen"))
    val nch = (size(ws) / lit(10)).cast("int")
    val chunks = when(nch >= 1,
      transform(sequence(lit(1), nch),
        i => concat_ws(" ", slice(ws, (i - lit(1)) * lit(10) + lit(1), lit(10)))))
      .otherwise(array())
    val hof = df.select(col("doc_id"), explode(chunks).as("c"))
      .select(col("doc_id"), xxhash64(col("c")).as("h"),
        length(col("c")).cast("long").as("clen"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(fused.collect().map(key).sortBy(identity).toSeq ==
      hof.collect().map(key).sortBy(identity).toSeq)
  }

  test("collect_capped equals collect_list below the cap and saturates at it") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.graft.ColumnBridge
    def capped(limit: Int) = ColumnBridge.column(
      graft.functions.CollectCappedLong(
        ColumnBridge.expression(col("v")), limit).toAggregateExpression())
    val df = Seq.tabulate(100)(i => (i % 7L, i.toLong)).toDF("k", "v")
      .repartition(8, col("k") + col("v") % 3) // multiple partial paths
    // below the cap: same multiset as collect_list per key
    val full = df.groupBy("k").agg(collect_list(col("v")).as("ds"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    val cap = df.groupBy("k").agg(capped(50).as("ds"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    assert(cap == full)
    // above the cap: exactly limit elements retained, all from the key
    val sat = df.groupBy("k").agg(capped(5).as("ds"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sat.values.forall(_.size == 5))
    assert(sat.forall { case (k, ds) => ds.forall(v => full(k).contains(v)) })
  }

  test("ClickHouse name aliases: conversions, date parts, arrays, -If combinators") {
    GraftFunctions.register(spark)
    val conv = spark.sql(
      "SELECT toString(42) AS s, toInt64('7') AS i, toUInt8(200) AS u, " +
        "toFloat64('2.5') AS f, toDate('2024-03-05') AS d").collect().head
    assert(conv.getString(0) == "42" && conv.getLong(1) == 7L &&
      conv.getShort(2) == 200 && conv.getDouble(3) == 2.5 &&
      conv.getDate(4).toString == "2024-03-05")
    // 2024-03-04 is a Monday: ClickHouse toDayOfWeek = 1
    val dp = spark.sql(
      "SELECT toYear(DATE'2024-03-05') AS y, toMonth(DATE'2024-03-05') AS m, " +
        "toDayOfMonth(DATE'2024-03-05') AS dm, toDayOfWeek(DATE'2024-03-04') AS dw, " +
        "toQuarter(DATE'2024-05-05') AS q, " +
        "CAST(toStartOfMonth(DATE'2024-03-05') AS STRING) AS som, " +
        "CAST(toStartOfDay(TIMESTAMP'2024-03-05 13:45:10') AS STRING) AS sod")
      .collect().head
    assert(dp.getInt(0) == 2024 && dp.getInt(1) == 3 && dp.getInt(2) == 5 &&
      dp.getInt(3) == 1 && dp.getInt(4) == 2 &&
      dp.getString(5) == "2024-03-01" && dp.getString(6) == "2024-03-05 00:00:00")
    // unix round trip (session TZ is UTC)
    val ut = spark.sql(
      "SELECT toUnixTimestamp(TIMESTAMP'1970-01-01 00:01:40') AS u, " +
        "CAST(fromUnixTimestamp(100) AS STRING) AS t").collect().head
    assert(ut.getLong(0) == 100L && ut.getString(1) == "1970-01-01 00:01:40")
    assert(spark.sql("SELECT today()").collect().head.getDate(0) != null)
    // arrays
    val ar = spark.sql(
      "SELECT has(array(1, 2), 2) AS h, indexOf(array('a','b'), 'b') AS p, " +
        "arrayStringConcat(array('a','b'), '-') AS j, " +
        "splitByChar(',', 'a,b,c') AS sp, splitByChar('.', 'x.y') AS spd")
      .collect().head
    assert(ar.getBoolean(0) && ar.getLong(1) == 2L && ar.getString(2) == "a-b")
    assert(ar.getSeq[String](3) == Seq("a", "b", "c"))
    assert(ar.getSeq[String](4) == Seq("x", "y"), "separator must be regex-quoted")
    // -If combinators: only condition-true rows aggregate
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .createOrReplaceTempView("chfa")
    val agg = spark.sql(
      "SELECT countIf(v > 10) AS c, sumIf(v, v > 10) AS s, avgIf(v, v > 10) AS a, " +
        "minIf(v, v > 10) AS mn, maxIf(v, v > 10) AS mx FROM chfa").collect().head
    assert(agg.getLong(0) == 2L && agg.getLong(1) == 50L &&
      agg.getDouble(2) == 25.0 && agg.getLong(3) == 20L && agg.getLong(4) == 30L)
    // grouped combinators keep map-side partial aggregation semantics
    val g = spark.sql("SELECT k % 2 AS g, countIf(v >= 20) AS c FROM chfa " +
      "GROUP BY k % 2 ORDER BY g").collect()
    assert(g.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1L), (1L, 1L)))
  }

  test("pq expressions fail safe: zero vectors, shape mismatches, bounds") {
    GraftFunctions.register(spark)
    // m=2 subspaces, k=4 centroids, dsub=2 -> vectors of dim 4
    val cb = Seq.tabulate(2)(mi => Seq.tabulate(4)(j =>
      Seq.tabulate(2)(t => 0.1 * (j + 1) + 0.01 * mi + 0.001 * t)))
    val df = Seq((1L, Seq(0.0, 0.0, 0.0, 0.0)),
      (2L, Seq(1.0, 2.0, 3.0, 4.0))).toDF("id", "v")
    // zero vector encodes DETERMINISTICALLY (inv=0 path), never via
    // NaN-distance comparisons; all codes stay in [0, k)
    val enc = df.select(call_function("pq_encode", col("v"), typedLit(cb)).as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(enc.forall(_.forall(c => c >= 0 && c < 4)))
    // a zero QUERY yields an all-zero LUT -> ADC 0.0, not NaN (NaN would
    // rank FIRST under ORDER BY ... DESC)
    val lutRow = spark.range(1).select(
      call_function("pq_lut", typedLit(Seq(0.0, 0.0, 0.0, 0.0)), typedLit(cb)).as("lut"),
      typedLit(Seq(0, 0)).as("code"))
    val sc = lutRow.select(call_function("pq_adc", col("code"), col("lut")))
      .head.getDouble(0)
    assert(!sc.isNaN && sc == 0.0, s"zero-query ADC must be 0.0, got $sc")
    // wrong-length vectors fail LOUDLY instead of reading out of bounds
    intercept[Exception](spark.range(1)
      .select(call_function("pq_encode", typedLit(Seq(1.0, 2.0)), typedLit(cb)))
      .collect())
    intercept[Exception](spark.range(1)
      .select(call_function("pq_lut", typedLit(Seq(1.0, 2.0)), typedLit(cb)))
      .collect())
    // code/lut shape and id-range mismatches fail loudly too
    intercept[Exception](lutRow
      .select(call_function("pq_adc", typedLit(Seq(0, 0, 0)), col("lut"))).collect())
    intercept[Exception](lutRow
      .select(call_function("pq_adc", typedLit(Seq(9, 0)), col("lut"))).collect())
  }

  test("native cosine equals the higher-order-function formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val df = spark.range(200).map { i =>
      val rnd = new scala.util.Random(i)
      (i, Array.fill(64)(rnd.nextDouble() - 0.5), Array.fill(64)(rnd.nextDouble() - 0.5))
    }.toDF("id", "a", "b")
    val hof = df.select(col("id"),
      (aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, x) => s + x) /
        (sqrt(aggregate(col("a"), lit(0.0), (s, x) => s + x * x)) *
         sqrt(aggregate(col("b"), lit(0.0), (s, x) => s + x * x)))).as("sim"))
    val native = df.select(col("id"),
      call_function("cosine_similarity", col("a"), col("b")).as("sim"))
    val h = hof.orderBy("id").collect().map(_.getDouble(1))
    val n = native.orderBy("id").collect().map(_.getDouble(1))
    assert(h.toSeq == n.toSeq) // exact double equality, not approximate
  }

  test("native cosine works from SQL and in interpreted (non-codegen) eval") {
    GraftFunctions.register(spark)
    Seq((Array(1.0, 0.0), Array(1.0, 0.0)), (Array(1.0, 0.0), Array(0.0, 1.0)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val sims = spark.sql("SELECT cosine_similarity(a, b) FROM vecs")
      .collect().map(_.getDouble(0)).toSeq
    assert(sims == Seq(1.0, 0.0))
    // interpreted path: eval via filter on literal arrays inside a CASE that
    // codegen may constant-fold; also call nullSafeEval directly
    val e = ArrayCosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0, 4.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0, 4.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(math.abs(e.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("extensions class injects the function at session-build time") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; wiring is shared with register()
  }

  test("typed Aggregator summary matches built-in aggregates") {
    GraftFunctions.register(spark)
    val df = spark.range(1000).map(i => (s"g${i % 3}", (i % 97).toDouble))
      .toDF("g", "v")
    df.createOrReplaceTempView("agg_in")
    val got = spark.sql(
      """SELECT g, s.n AS n, s.sum AS sum, s.min AS min, s.max AS max
        |FROM (SELECT g, num_summary(v) AS s FROM agg_in GROUP BY g) t
        |ORDER BY g""".stripMargin).collect()
    val exp = df.groupBy("g")
      .agg(count("v"), sum("v"), min("v"), max("v")).orderBy("g").collect()
    got.zip(exp).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1))
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-9)
      assert(a.getDouble(3) == b.getDouble(3) && a.getDouble(4) == b.getDouble(4))
    }
  }

  test("topK sketch is exact below capacity, under any partitioning") {
    GraftFunctions.register(spark)
    // 40 distinct terms, zipf-ish counts, scattered over many partitions
    val df = spark.range(20000).repartition(17)
      .map(i => s"t${i % 40}").toDF("term")
    val got = df.agg(expr("topk_approx(term)").as("tk"))
      .select(explode(col("tk")).as("tc"))
      .select(col("tc.term"), col("tc.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    val exp = df.groupBy("term").count()
      .orderBy(col("count").desc, col("term")).limit(50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got == exp, "below capacity the sketch must equal the exact top-k")
  }

  test("topKWeighted: weighted counts exact below capacity; never undercounts over it") {
    GraftFunctions.register(spark)
    val df = spark.range(6000).repartition(11)
      .map(i => (s"t${i % 30}", i % 5 + 1)).toDF("term", "w")
    val got = df.agg(expr("topk_weighted(term, w)").as("tk"))
      .select(explode(col("tk")).as("tc"))
      .select(col("tc.term"), col("tc.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    val exp = df.groupBy("term").agg(sum("w").as("wc"))
      .orderBy(col("wc").desc, col("term")).limit(50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got == exp, "below capacity the weighted sketch is the exact weighted top-k")
    // eviction regime: heavy weighted terms survive, never undercounted
    val agg = new TopKWeightedAggregator(3, 6)
    val stream = new scala.util.Random(7).shuffle(
      (0 until 3).flatMap(h => Seq.fill(100)(TermWeight(s"head$h", Some(10L)))) ++
        (0 until 80).flatMap(t => Seq.fill(2)(TermWeight(s"tail$t", Some(1L)))))
    val states = stream.grouped(120).map(_.foldLeft(agg.zero)(agg.reduce)).toList
    val top = agg.finish(states.reduce(agg.merge))
    assert(top.map(_.term).toSet == Set("head0", "head1", "head2"))
    top.foreach(tc => assert(tc.cnt >= 1000L, s"never undercount: $tc"))
    // NULL weights are ignored, not a deserialization crash
    val withNull = Seq(("a", Some(2L)), ("a", None), ("b", Some(1L)))
      .toDF("term", "w")
    val nw = withNull.agg(expr("topk_weighted(term, w)").as("tk"))
      .select(explode(col("tk")).as("tc"))
      .select(col("tc.term"), col("tc.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(nw == List(("a", 2L), ("b", 1L)), s"got $nw")
  }

  test("uniqUpTo: exact at the cap, saturates one past it, merge keeps saturation") {
    val agg = new UniqUpToAggregator(8)
    def run(xs: Seq[String]): Long =
      agg.finish(xs.grouped(3).map(_.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge))
    assert(run((1 to 8).map(i => s"v$i")) == 8L, "exactly N distinct stays exact")
    assert(run((1 to 9).map(i => s"v$i")) == 9L, "N+1 distinct saturates to N+1")
    assert(run((1 to 100).map(i => s"v${i % 4}")) == 4L, "repeats don't inflate")
    assert(run((1 to 500).map(i => s"v$i")) == 9L, "saturation is monotone under merges")
    // the SQL face computes both regimes per group
    GraftFunctions.register(spark)
    val df = spark.range(1000).repartition(9)
      .map(i => (s"g${i % 2}", s"x${i % (if (i % 2 == 0) 5 else 50)}"))
      .toDF("g", "x")
    val got = df.groupBy("g").agg(expr("uniq_up_to_8(x)").as("u"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got == List(("g0", 5L), ("g1", 9L)), s"got $got")
  }

  test("topK sketch over capacity: heavy hitters survive, estimates never undercount") {
    // capacity 8, k 5; one dominant head of 5 terms + a 200-term tail.
    // SpaceSaving guarantee: any term with freq > N/capacity is kept, and
    // per-term estimates only overcount (evictee inheritance).
    val agg = new TopKAggregator(5, 8)
    val heads = (0 until 5).flatMap(h => Seq.fill(500)(s"head$h"))
    val tail = (0 until 200).flatMap(t => Seq.fill(3)(s"tail$t"))
    val rnd = new scala.util.Random(42)
    val stream = rnd.shuffle(heads ++ tail)
    // split into 8 "partitions", reduce each, then merge in a random order
    val states = stream.grouped((stream.size + 7) / 8)
      .map(_.foldLeft(agg.zero)(agg.reduce)).toList
    val merged = rnd.shuffle(states).reduce(agg.merge)
    val top = agg.finish(merged)
    assert(top.map(_.term).toSet == (0 until 5).map(h => s"head$h").toSet,
      s"all heavy hitters must be in the top-5: $top")
    top.foreach(tc => assert(tc.cnt >= 500, s"estimates must never undercount: $tc"))
  }
}
