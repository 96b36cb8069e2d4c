package graft

import graft.operators.{InvertedIndex, IvfIndex, MinHashStore}
import graft.mergetree.ColumnarMergeTree
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Delete-from-index: corpus deletions (deleteWhere / TTL / opt-out) must
  * propagate into every persisted index, and the contract is exact —
  * search after delete equals a from-scratch rebuild over the surviving
  * corpus. Without this, a decontamination DELETE leaves the inverted
  * index serving expunged text, the ANN index returning expunged
  * embeddings, and the MinHash store colliding new batches with ghosts.
  */
class IndexDeleteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  private def corpus: DataFrame = spark.read.parquet(s"$sf/documents.parquet")

  // Delete ids that actually occupy top BM25/ANN ranks, so an index that
  // failed to drop them would visibly change the assertion, not pass by
  // luck on untouched ranks.
  private val Gone: Seq[Long] = Seq(1L, 2L, 5L, 12L, 17L, 33L, 82L)

  test("inverted index: delete == rebuild from the surviving corpus (BM25, phrase, totals)") {
    val terms = Seq("dup", "vector", "merge")
    val path = Files.createTempDirectory("inv_del_").toString
    val idx = InvertedIndex.build(spark, corpus, path, nbuckets = 8)
    val before = idx.search(terms, k = 15).collect().toSeq
    idx.delete(Gone)

    val rebuiltPath = Files.createTempDirectory("inv_del_rebuild_").toString
    val survivors = corpus.filter(!col("doc_id").isInCollection(Gone))
    val rebuilt = InvertedIndex.build(spark, survivors, rebuiltPath, nbuckets = 8)

    val a = idx.search(terms, k = 15).collect().toSeq
    val b = rebuilt.search(terms, k = 15).collect().toSeq
    assert(a == b, s"post-delete search must equal rebuild:\n$a\nvs\n$b")
    assert(a != before, "deleting ranked docs must actually change the top-k")
    assert(!a.exists(r => Gone.contains(r.getLong(1))),
      "expunged docs must never be served")

    // Stronger than ranking equality: the derived-stat inputs themselves.
    val sa = InvertedIndex.readStats(path)
    val sb = InvertedIndex.readStats(rebuiltPath)
    assert((sa.n_docs, sa.n_dl_docs, sa.total_dl) ==
      ((sb.n_docs, sb.n_dl_docs, sb.total_dl)),
      s"totals after delete must equal rebuild totals: $sa vs $sb")

    // Phrase search reads the same posting rows positionally.
    val pa = idx.phraseSearch(Seq("table", "scan", "merge"), k = 10).collect().toSeq
    val pb = rebuilt.phraseSearch(Seq("table", "scan", "merge"), k = 10).collect().toSeq
    assert(pa == pb)

    // Round-trip: appending the deleted docs back restores the original
    // ranking bit for bit (delete and append are exact inverses because
    // df/avgdl/nDocs are derived, never frozen into rows).
    idx.append(corpus.filter(col("doc_id").isInCollection(Gone)))
    val restored = idx.search(terms, k = 15).collect().toSeq
    assert(restored == before, s"delete+append must restore: $restored vs $before")
    idx.table.shutdown(); rebuilt.table.shutdown()
  }

  test("IVF and IVFADC: delete == rebuild when every cluster is probed") {
    graft.functions.GraftFunctions.register(spark)
    val vectors = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = vectors.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val goneV = Seq(12L, 17L, 225L) // the pinned top-3 neighbours of vec 0

    val path = Files.createTempDirectory("ivf_del_").toString
    val idx = IvfIndex.buildAdc(spark, vectors, path, nlist = 8)
    val before = idx.search(queries, k = 3, nprobe = 8).collect().toSeq
    idx.delete(goneV)

    val rebuiltPath = Files.createTempDirectory("ivf_del_rebuild_").toString
    val survivors = vectors.filter(!col("vec_id").isInCollection(goneV))
    val rebuilt = IvfIndex.buildAdc(spark, survivors, rebuiltPath, nlist = 8)

    // nprobe = nlist probes every cluster, so both sides are exact
    // brute-force over their row sets — centroid drift between the two
    // quantizers cannot move the answer.
    val a = idx.search(queries, k = 3, nprobe = 8).collect().toSeq
    val b = rebuilt.search(queries, k = 3, nprobe = 8).collect().toSeq
    assert(a == b, s"post-delete IVF search must equal rebuild:\n$a\nvs\n$b")
    assert(a != before, "deleting the top neighbours must change the top-k")
    assert(!a.exists(r => goneV.contains(r.getLong(2))),
      "expunged vectors must never be served")

    // ADC path: a corpus-sized shortlist makes the exact re-rank total,
    // so codebook drift between the builds cannot move the answer either.
    val aa = idx.searchAdc(queries, k = 3, nprobe = 8, shortlist = 1000)
      .collect().toSeq
    val bb = rebuilt.searchAdc(queries, k = 3, nprobe = 8, shortlist = 1000)
      .collect().toSeq
    assert(aa == bb, s"post-delete ADC search must equal rebuild:\n$aa\nvs\n$bb")
    idx.table.shutdown(); rebuilt.table.shutdown()
  }

  test("MinHash store: delete == rebuild from surviving shingle hashes") {
    def dsh(df: DataFrame) = {
      val ws = split(col("text"), " ")
      val sh = transform(sequence(lit(1), greatest(lit(1), size(ws) - lit(4))),
        i => concat_ws(" ", slice(ws, i, lit(5))))
      df.select(col("doc_id"), explode(sh).as("s"))
        .select(col("doc_id"), xxhash64(col("s")).as("h")).distinct()
    }
    val path = Files.createTempDirectory("mh_del_").toString + "/store"
    val store = MinHashStore.create(spark, path, dsh(corpus))
    store.delete(Gone)

    val rebuiltPath = Files.createTempDirectory("mh_del_rebuild_").toString + "/store"
    val rebuilt = MinHashStore.create(spark, rebuiltPath,
      dsh(corpus.filter(!col("doc_id").isInCollection(Gone))))

    def sigSet(s: MinHashStore) = s.signatures.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(sigSet(store) == sigSet(rebuilt),
      "surviving signatures must equal a rebuild exactly")
    assert(!sigSet(store).exists(t => Gone.contains(t._1)))

    // And the operational face: a batch that near-dups ONLY deleted docs
    // must produce zero candidates against the store.
    val ghostBatch = dsh(corpus.filter(col("doc_id").isInCollection(Gone)))
    val cands = store.candidatePairs(MinHashStore.bandSignatures(ghostBatch))
    assert(cands.filter(col("store_id").isInCollection(Gone)).count() == 0,
      "expunged docs must stop generating candidate pairs")
  }

  test("composed flow: SQL ALTER TABLE DELETE on the corpus, then index.delete of the same ids") {
    // The q47-style decontamination flow end to end: the corpus lives in a
    // MergeTree table, the DELETE arrives as SQL, and the captured id set
    // drives the index mutation. Search afterwards equals an index built
    // from the post-delete corpus read back from the table itself.
    val tableDir = Files.createTempDirectory("del_corpus_").toString
    val t = ColumnarMergeTree.create(spark, tableDir,
      corpus.select(col("doc_id"), col("lang"), col("text")).schema,
      orderBy = Seq("doc_id"))
    t.insertBatch(corpus.select(col("doc_id"), col("lang"), col("text")))

    val idxPath = Files.createTempDirectory("del_idx_").toString
    val idx = InvertedIndex.build(spark, t.scan(), idxPath, nbuckets = 8)

    // Capture the doomed ids BEFORE the delete (the index stores doc_id
    // but not the predicate's columns).
    val pred = "doc_id % 10 = 2"
    val doomed = t.scan().filter(expr(pred))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(doomed.nonEmpty)
    val removed = spark.sql(s"ALTER TABLE '$tableDir' DELETE WHERE $pred")
      .first().getLong(0)
    assert(removed == doomed.size)
    idx.delete(doomed)

    val rebuiltPath = Files.createTempDirectory("del_idx_rebuild_").toString
    val rebuilt = InvertedIndex.build(spark,
      ColumnarMergeTree.open(spark, tableDir).scan(), rebuiltPath, nbuckets = 8)
    val terms = Seq("dup", "vector", "merge")
    val a = idx.search(terms, k = 15).collect().toSeq
    val b = rebuilt.search(terms, k = 15).collect().toSeq
    assert(a == b, s"SQL-delete flow must equal rebuild:\n$a\nvs\n$b")
    assert(!a.exists(r => doomed.contains(r.getLong(1))))
    idx.table.shutdown(); rebuilt.table.shutdown(); t.shutdown()
  }
}
