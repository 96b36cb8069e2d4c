package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich/Haddow/Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the REAL
  * subword tokenizer a training-data engine needs next to the whitespace /
  * regex counters (q31): merge rules are TRAINED on the corpus, then every
  * document tokenizes into subword units with a deterministic greedy
  * application of those rules.
  *
  * Scale shape: the corpus-sized work is ONE word-frequency aggregate
  * (explode map-side → groupBy(word) — vocabulary-sized output, the q127
  * LM-table economics); the classic BPE training loop then runs DRIVER-side
  * over that word-frequency dictionary (exactly how the reference
  * implementation trains — pair counts are weighted by word frequency, so
  * the corpus itself is never re-read per merge). Encoding is a native
  * Catalyst expression (`bpe_encode`, graft.functions) — per-row greedy
  * merges against the broadcast rank table, inside whole-stage codegen.
  *
  * Determinism: pair selection breaks count-ties lexicographically and the
  * word table is frequency-then-word ordered before the driver loop, so
  * the same corpus always trains the same merge list — across runs,
  * partitionings, and engines.
  */
object BpeTokenizer {

  /** An ordered merge list; rank = position (lower merges first). */
  final case class Merges(pairs: IndexedSeq[(String, String)]) {
    @transient lazy val rank: Map[(String, String), Int] = pairs.zipWithIndex.toMap
    /** Wire form for the expression's literal child: "left right" strings
      * in rank order (symbols never contain spaces — they come from a
      * non-space alphabet plus the `</w>` marker).
      */
    def encoded: Seq[String] = pairs.map { case (a, b) => s"$a $b" }
  }

  object Merges {
    def decode(wire: Seq[String]): Merges = Merges(wire.toIndexedSeq.map { s =>
      val i = s.indexOf(' ')
      require(i > 0, s"bad merge entry '$s'")
      (s.substring(0, i), s.substring(i + 1))
    })
  }

  /** The word end marker — distinguishes "est" inside a word from "est"
    * ending one (the paper's `</w>`).
    */
  val EndOfWord = "</w>"

  /** Train `numMerges` merge rules on a corpus (lowercase latin words, the
    * shared q78 corpus tokenizer's alphabet): one distributed
    * word-frequency aggregate bounded to the `maxWords` most frequent
    * words (the training dictionary — rare-tail words contribute ~nothing
    * to pair counts), then the driver loop. Training stops early when no
    * pair occurs twice (merging singletons would memorize the dictionary).
    */
  def train(docs: DataFrame, numMerges: Int, maxWords: Int = 50000): Merges = {
    val words = docs
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainOnCounts(words.toSeq, numMerges)
  }

  /** The driver loop over a (word, count) dictionary — exposed so specs
    * can pin the canonical hand example without a SparkSession.
    */
  def trainOnCounts(words: Seq[(String, Long)], numMerges: Int): Merges = {
    // Each dictionary word as its symbol sequence (chars + </w>).
    var vocab: Array[(Array[String], Long)] = words.toArray.map { case (w, n) =>
      (w.map(_.toString).toArray :+ EndOfWord, n)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      // Stop when no pair repeats; break count-ties lexicographically so
      // training is a pure function of the dictionary.
      val best = counts.filter(_._2 >= 2).toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case None => round = numMerges
        case Some((pair, _)) =>
          merges += pair
          vocab = vocab.map { case (syms, n) => (mergeOnce(syms, pair), n) }
          round += 1
      }
    }
    Merges(merges.toIndexedSeq)
  }

  private def mergeOnce(syms: Array[String], p: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += (p._1 + p._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Greedy BPE inference for one word (no `</w>` in the input): repeatedly
    * merge the LOWEST-RANK adjacent pair — the standard application order,
    * which reproduces training exactly on in-dictionary words. Called
    * per word from the `bpe_encode` expression (interpreted AND generated
    * code paths — one implementation, no drift).
    */
  def encodeWord(word: String, m: Merges): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = (word.map(_.toString) :+ EndOfWord).toArray
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        m.rank.get((syms(i), syms(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestAt = i
          case _ => ()
        }
        i += 1
      }
      if (bestAt < 0) done = true
      else syms = mergeOnce(syms, (syms(bestAt), syms(bestAt + 1)))
    }
    syms
  }

  /** Tokenize a whole text: the shared corpus word-split (lowercase,
    * `[^a-z]+`), each word BPE-encoded, token streams concatenated in
    * order. The row-level entry point the expression calls.
    */
  def encodeText(text: String, m: Merges): Array[String] = {
    val words = text.toLowerCase.split("[^a-z]+")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) out ++= encodeWord(words(i), m)
      i += 1
    }
    out.toArray
  }
}
