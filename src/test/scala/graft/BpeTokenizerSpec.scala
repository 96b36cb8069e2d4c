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
}
