package graft

import graft.operators.BpeTokenizer
import graft.operators.BpeTokenizer.{EndOfWord, Merges}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE tokenizer: training pinned on the canonical Sennrich-2016 hand
  * example, the native expression pinned against the driver
  * implementation, determinism, and the lossless round-trip.
  */
class BpeTokenizerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  // The paper's worked dictionary: low x5, lower x2, newest x6, widest x3.
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("training reproduces the canonical hand-computed merge sequence") {
    val m = BpeTokenizer.trainOnCounts(sennrich, numMerges = 5)
    // Round 1: (e,s) 6+3=9. Round 2: (es,t) 9. Round 3: (est,</w>) 9.
    // Round 4: (l,o) and (o,w) tie at 7 -> lexicographic tie-break picks
    // (l,o). Round 5: (lo,w) 7.
    assert(m.pairs == IndexedSeq(
      ("e", "s"), ("es", "t"), ("est", EndOfWord), ("l", "o"), ("lo", "w")),
      s"got ${m.pairs}")
  }

  test("greedy encoding applies merges lowest-rank-first; round-trip is lossless") {
    val m = BpeTokenizer.trainOnCounts(sennrich, numMerges = 5)
    // The paper's showcase: an UNSEEN word segments into learned units.
    assert(BpeTokenizer.encodeWord("lowest", m).toSeq ==
      Seq("low", "est" + EndOfWord))
    assert(BpeTokenizer.encodeWord("low", m).toSeq == Seq("low", EndOfWord))
    assert(BpeTokenizer.encodeWord("slow", m).toSeq ==
      Seq("s", "low", EndOfWord))
    // Round-trip: concatenating tokens and stripping the marker restores
    // the word exactly, for every dictionary word and an unseen one.
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "xyzzy")) {
      val back = BpeTokenizer.encodeWord(w, m).mkString.replace(EndOfWord, "")
      assert(back == w, s"round-trip broke for $w: $back")
    }
    // No-merge degenerate cases.
    assert(BpeTokenizer.encodeWord("", m).isEmpty)
    assert(BpeTokenizer.encodeWord("a", Merges(IndexedSeq.empty)).toSeq ==
      Seq("a", EndOfWord))
  }

  test("training stops when no pair repeats (never memorizes singletons)") {
    val m = BpeTokenizer.trainOnCounts(Seq(("ab", 1L), ("cd", 1L)), numMerges = 50)
    assert(m.pairs.isEmpty, s"singleton pairs must not merge: ${m.pairs}")
  }

  test("bpe_encode expression == driver implementation on the corpus; deterministic") {
    graft.functions.GraftFunctions.register(spark)
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val m = BpeTokenizer.train(d, numMerges = 100)
    assert(m.pairs.size == 100, s"corpus supports 100 merges: ${m.pairs.size}")
    // Determinism: a second training pass is bit-identical.
    assert(BpeTokenizer.train(d, numMerges = 100).pairs == m.pairs)

    val viaExpr = d.orderBy("doc_id").limit(20)
      .select(col("doc_id"), col("text"),
        call_function("bpe_encode", col("text"), typedLit(m.encoded)).as("toks"))
      .collect()
    viaExpr.foreach { r =>
      val expect = BpeTokenizer.encodeText(r.getString(1), m).toSeq
      assert(r.getSeq[String](2) == expect,
        s"expression drifted from driver impl on doc ${r.getLong(0)}")
      // Tokens reconstruct the lowercase word stream losslessly.
      val back = expect.mkString.replace(EndOfWord, " ").trim
      val words = r.getString(1).toLowerCase.split("[^a-z]+")
        .filter(_.nonEmpty).mkString(" ")
      assert(back == words, s"round-trip broke on doc ${r.getLong(0)}")
    }
    // The wire form survives the literal round-trip (plan serialization).
    assert(Merges.decode(m.encoded).pairs == m.pairs)
  }

  test("q130 per-lang stats: payload conserved exactly, stable across runs") {
    val a = graft.queries.PipelineQueries.q130BpeTokenize(spark, dir).collect()
    val b = graft.queries.PipelineQueries.q130BpeTokenize(spark, dir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "unstable output")
    assert(a.nonEmpty)
    a.foreach(r => assert(r.getLong(1) > 0 && r.getLong(2) > 0 && r.getLong(3) > 0))
    // Lossless round-trip at the CORPUS level: the marker-stripped payload
    // chars per lang must equal the corpus's own latin-word chars — a
    // tokenizer-independent conservation law (any split/merge choice that
    // gained or lost a character would break it). Recomputed from raw
    // text, no BPE involved.
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val expect = d.select(col("lang"),
        explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("lang").agg(sum(length(col("w")).cast("long")).as("chars"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    a.foreach { r =>
      val payload = r.getLong(4) * r.getLong(2) / 1000000L // ppm x tokens ~ payload
      val exact = expect(r.getString(0))
      // ppm floor loses < 1 char per token of precision; compare within it.
      assert(math.abs(payload - exact) <= r.getLong(2),
        s"payload not conserved for ${r.getString(0)}: ~$payload vs $exact")
    }
  }

  test("byte table is the GPT-2 bijection: 256 distinct chars, visible " +
    "latin-1 maps to itself") {
    val t = BpeTokenizer.ByteChar
    assert(t.length == 256 && t.distinct.length == 256)
    assert(t('a'.toInt) == 'a' && t('Z'.toInt) == 'Z' && t('#'.toInt) == '#')
    assert(t(0xC3) == 0xC3.toChar, "visible latin-1 bytes stay themselves")
    assert(t(' '.toInt) != ' ', "space must shift (symbols stay space-free)")
    assert(t(0) >= 0x100.toChar, "control bytes shift into U+0100..")
  }

  test("byte-level BPE segments every script and round-trips CJK exactly") {
    val mixed = Seq(
      ("机器学习", 6L), ("机器翻译", 4L), ("данные", 5L), ("qualität", 3L))
    val m = BpeTokenizer.trainOnCountsByteLevel(mixed, numMerges = 12)
    assert(m.byteLevel && m.pairs.nonEmpty)
    // The shared 机器 prefix must yield a shared LEARNED leading unit in
    // both CJK words (count-10 pairs dominate training), and merging must
    // actually compress (unmerged = 12 byte symbols + marker = 13).
    val a = BpeTokenizer.encodeWord("机器学习", m)
    val b = BpeTokenizer.encodeWord("机器翻译", m)
    assert(a.head == b.head && BpeTokenizer.bytesOf(a.head).length >= 2,
      s"shared CJK prefix must merge: ${a.toSeq} vs ${b.toSeq}")
    assert(a.length < 13 && b.length < 13, "merges must compress CJK words")
    // Lossless round-trip for every script, including an UNSEEN CJK word.
    for (w <- Seq("机器学习", "机器智能", "данные", "qualität", "plain")) {
      val toks = BpeTokenizer.encodeWord(w, m)
      assert(BpeTokenizer.decodeTokens(toks.toSeq, m) == w,
        s"byte-level round-trip broke for $w: ${toks.toSeq}")
    }
    // Mixed-script text: the word split keeps all scripts; decode restores
    // the normalized word stream.
    val text = "Qualität 机器学习 data 123"
    assert(BpeTokenizer.decodeTokens(
      BpeTokenizer.encodeText(text, m).toSeq, m) ==
      "qualität 机器学习 data 123")
    // The latin-only char-level tokenizer drops all of the CJK — the gap
    // this mode closes.
    assert(BpeTokenizer.encodeText("中文分词",
      BpeTokenizer.trainOnCounts(sennrich, 5)).isEmpty)
    assert(BpeTokenizer.encodeText("中文分词", m).nonEmpty)
  }

  test("byte-level wire form round-trips through the expression literal " +
    "and stays backward compatible") {
    val m = BpeTokenizer.trainOnCountsByteLevel(
      Seq(("机器学习", 6L), ("机器翻译", 4L)), numMerges = 8)
    val back = Merges.decode(m.encoded)
    assert(back == m, "wire round-trip must preserve mode and pairs")
    // A pre-existing char-level wire (no header) decodes unchanged.
    val charM = BpeTokenizer.trainOnCounts(sennrich, 5)
    assert(!Merges.decode(charM.encoded).byteLevel)
    assert(Merges.decode(charM.encoded).pairs == charM.pairs)
    // The expression applies byte-level merges identically to the driver.
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq("机器学习 and qualität", "机器智能 data")
      .toDF("text")
      .select(call_function("bpe_encode", col("text"),
        typedLit(m.encoded)).as("toks"))
      .collect().map(_.getSeq[String](0))
    val expect = Seq("机器学习 and qualität", "机器智能 data")
      .map(t => BpeTokenizer.encodeText(t, m).toSeq)
    assert(rows.toSeq == expect, "expression drifted from driver impl")
  }

  test("save/open: encode-after-reopen is bit-exact; train == retrain; " +
    "corrupt artifact fails loudly") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val m = BpeTokenizer.trainByteLevel(d, numMerges = 60)
    assert(m.byteLevel && m.pairs.size == 60)
    // Determinism: retraining the same corpus is bit-identical.
    assert(BpeTokenizer.trainByteLevel(d, numMerges = 60) == m)

    val art = java.nio.file.Files.createTempDirectory("bpe_save_").toString
    BpeTokenizer.save(m, art)
    val opened = BpeTokenizer.open(art)
    assert(opened == m, "open(save(m)) must be bit-exact")
    val sample = "Müller trains 机器学习 tokenizers"
    assert(BpeTokenizer.encodeText(sample, opened).toSeq ==
      BpeTokenizer.encodeText(sample, m).toSeq)
    // Char-level artifacts persist their mode too.
    val cm = BpeTokenizer.trainOnCounts(sennrich, 5)
    val art2 = java.nio.file.Files.createTempDirectory("bpe_save2_").toString
    BpeTokenizer.save(cm, art2)
    assert(BpeTokenizer.open(art2) == cm)
    // Missing / corrupt artifacts fail loudly, never return garbage.
    intercept[IllegalArgumentException](BpeTokenizer.open(
      java.nio.file.Files.createTempDirectory("bpe_none_").toString))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(art, BpeTokenizer.MergesFile), "{\"version\":9}")
    intercept[Exception](BpeTokenizer.open(art))
  }

  test("bpe_encode_dir: pure SQL encodes with a persisted tokenizer " +
    "another session trained") {
    graft.functions.GraftFunctions.register(spark)
    val m = BpeTokenizer.trainOnCountsByteLevel(
      Seq(("机器学习", 6L), ("机器翻译", 4L), ("data", 5L)), numMerges = 10)
    val art = java.nio.file.Files.createTempDirectory("bpe_sql_").toString
    BpeTokenizer.save(m, art)
    val got = spark.sql(
        s"SELECT bpe_encode_dir('$art', '机器学习 processes data') AS toks")
      .collect()(0).getSeq[String](0)
    assert(got == BpeTokenizer.encodeText("机器学习 processes data", m).toSeq,
      s"SQL face drifted from the driver encode: $got")
    // A directory with no artifact fails at analysis, loudly.
    intercept[Exception](spark.sql(
      s"SELECT bpe_encode_dir('${art}_nope', 'x')").collect())
    // A non-literal directory fails at analysis (the artifact must load
    // once, not per row).
    intercept[Exception](spark.sql(
      s"SELECT bpe_encode_dir(CAST(rand() AS STRING), 'x')").collect())
  }

  test("q132 serves from the persisted artifact: per-lang stats stable, " +
    "zh tokenizes (the latin q130 gap)") {
    val a = graft.queries.PipelineQueries.q132BpePersisted(spark, dir).collect()
    val b = graft.queries.PipelineQueries.q132BpePersisted(spark, dir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "unstable output")
    assert(a.nonEmpty)
    // EVERY lang — including zh — now has tokens and vocabulary.
    a.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0 && r.getLong(3) > 0,
        s"lang ${r.getString(0)} must tokenize under byte-level BPE: $r")
    }
    // Byte-payload conservation per lang: tokens' byte payload must equal
    // the corpus's own UTF-8 word bytes (tokenizer-independent law).
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val expect = d.select(col("lang"),
        explode(split(lower(col("text")), "(?U)[^\\p{L}\\p{N}]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("lang")
      .agg(sum(length(encode(col("w"), "UTF-8")).cast("long")).as("bytes"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    a.foreach { r =>
      val payload = r.getLong(4) * r.getLong(2) / 1000000L
      val exact = expect(r.getString(0))
      assert(math.abs(payload - exact) <= r.getLong(2),
        s"byte payload not conserved for ${r.getString(0)}: ~$payload vs $exact")
    }
  }
}
