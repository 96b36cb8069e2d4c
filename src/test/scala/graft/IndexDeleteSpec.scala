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

  test("inverted index: update (re-indexed text) == rebuild over the edited corpus") {
    import spark.implicits._
    val terms = Seq("dup", "vector", "merge")
    val path = Files.createTempDirectory("inv_upd_").toString
    val idx = InvertedIndex.build(spark, corpus, path, nbuckets = 8)
    val before = idx.search(terms, k = 15).collect().toSeq

    // New text that MUST shoot the edited ids to the top of this ranking —
    // an index that silently kept the old postings fails loudly.
    val editedIds = Seq(200L, 201L)
    val newText = "dup vector merge dup vector merge dup vector merge"
    val edited = editedIds.map(id => (id, newText)).toDF("doc_id", "text")
    idx.update(edited)

    val editedCorpus = corpus.withColumn("text",
      when(col("doc_id").isInCollection(editedIds), lit(newText))
        .otherwise(col("text")))
    val rebuiltPath = Files.createTempDirectory("inv_upd_rebuild_").toString
    val rebuilt = InvertedIndex.build(spark, editedCorpus, rebuiltPath, nbuckets = 8)

    val a = idx.search(terms, k = 15).collect().toSeq
    val b = rebuilt.search(terms, k = 15).collect().toSeq
    assert(a == b, s"post-update search must equal rebuild:\n$a\nvs\n$b")
    assert(a != before, "re-indexing all-query-term docs must change the top-k")
    assert(editedIds.forall(id => a.exists(_.getLong(1) == id)),
      s"the edited docs must now rank in the top-k: $a")

    val sa = InvertedIndex.readStats(path)
    val sb = InvertedIndex.readStats(rebuiltPath)
    assert((sa.n_docs, sa.n_dl_docs, sa.total_dl) ==
      ((sb.n_docs, sb.n_dl_docs, sb.total_dl)),
      s"totals after update must equal rebuild totals: $sa vs $sb")

    // The new text is phrase-searchable and the old text's phrases are gone.
    val pa = idx.phraseSearch(Seq("dup", "vector", "merge"), k = 10).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(editedIds.forall(id => pa.get(id).contains(3L)),
      s"updated docs must carry the new positional postings: $pa")
    idx.table.shutdown(); rebuilt.table.shutdown()
  }

  test("IVF/ADC and MinHash store: update == rebuild over the edited rows") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val vectors = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = vectors.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))

    // Re-embed the pinned top neighbours of vec 0 to their NEGATION —
    // cosine flips sign, so a stale index keeps serving them and fails.
    val editedV = Seq(12L, 17L, 225L)
    val newVecs = vectors.filter(col("vec_id").isInCollection(editedV))
      .select(col("vec_id"), transform(col("v"), x => -x).as("v"))
    val path = Files.createTempDirectory("ivf_upd_").toString
    val idx = IvfIndex.buildAdc(spark, vectors, path, nlist = 8)
    val before = idx.search(queries, k = 3, nprobe = 8).collect().toSeq
    idx.update(newVecs)

    val editedVectors = vectors.filter(!col("vec_id").isInCollection(editedV))
      .unionByName(newVecs)
    val rebuiltPath = Files.createTempDirectory("ivf_upd_rebuild_").toString
    val rebuilt = IvfIndex.buildAdc(spark, editedVectors, rebuiltPath, nlist = 8)
    val a = idx.search(queries, k = 3, nprobe = 8).collect().toSeq
    val b = rebuilt.search(queries, k = 3, nprobe = 8).collect().toSeq
    assert(a == b, s"post-update IVF search must equal rebuild:\n$a\nvs\n$b")
    assert(a != before, "negating the top neighbours must change the top-k")
    idx.table.shutdown(); rebuilt.table.shutdown()

    // MinHash store: re-signed docs must match a rebuild exactly.
    def dsh(df: DataFrame) = {
      val ws = split(col("text"), " ")
      val sh = transform(sequence(lit(1), greatest(lit(1), size(ws) - lit(4))),
        i => concat_ws(" ", slice(ws, i, lit(5))))
      df.select(col("doc_id"), explode(sh).as("s"))
        .select(col("doc_id"), xxhash64(col("s")).as("h")).distinct()
    }
    val storePath = Files.createTempDirectory("mh_upd_").toString + "/store"
    val store = MinHashStore.create(spark, storePath, dsh(corpus))
    val editedIds = Seq(200L, 201L)
    val newText = "entirely new rewritten content with fresh shingle material here"
    val editedDocs = editedIds.map(id => (id, newText)).toDF("doc_id", "text")
    store.update(dsh(editedDocs))

    val editedCorpus = corpus.withColumn("text",
      when(col("doc_id").isInCollection(editedIds), lit(newText))
        .otherwise(col("text")))
    val rebuiltStore = MinHashStore.create(spark,
      Files.createTempDirectory("mh_upd_rebuild_").toString + "/store",
      dsh(editedCorpus))
    def sigSet(s: MinHashStore) = s.signatures.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(sigSet(store) == sigSet(rebuiltStore),
      "updated signatures must equal a rebuild over the edited corpus")
  }

  test("a torn ANN update (crash between its two commits) fails open() loudly") {
    graft.functions.GraftFunctions.register(spark)
    val vectors = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val path = Files.createTempDirectory("ivf_torn_").toString
    val idx = IvfIndex.build(spark, vectors, path, nlist = 8)
    idx.table.shutdown()
    // Simulate the crash window: the intent written, the append never
    // landed. The index now silently misses the updated ids — open()
    // must refuse rather than serve wrong neighbours forever.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, IvfIndex.UpdateIntentFile), "12,17")
    val e = intercept[IllegalStateException](IvfIndex.open(spark, path))
    assert(e.getMessage.contains("torn update") && e.getMessage.contains("12,17"))
    // Clearing the marker (the documented repair) restores service.
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(path, IvfIndex.UpdateIntentFile))
    val reopened = IvfIndex.open(spark, path)
    assert(reopened.table.scan().count() == 500)
    reopened.table.shutdown()
  }

  test("TTL lifecycle: corpus applyTtl + index.delete of the expired ids == rebuild") {
    // The retention flow end to end: the corpus table declares a TTL, the
    // eager pass expires rows, and the SAME id set the table expired
    // drives the index mutation — afterwards the index serves exactly
    // what an index built from the post-TTL corpus would.
    val tableDir = Files.createTempDirectory("ttl_corpus_").toString
    val t = ColumnarMergeTree.create(spark, tableDir,
      corpus.select(col("doc_id"), col("lang"), col("text")).schema,
      orderBy = Seq("doc_id"), ttl = Some("doc_id % 10 = 3"))
    t.insertBatch(corpus.select(col("doc_id"), col("lang"), col("text")))

    val idxPath = Files.createTempDirectory("ttl_idx_").toString
    val idx = InvertedIndex.build(spark, t.scan(), idxPath, nbuckets = 8)

    // Capture the expiring ids BEFORE the eager pass (after it they are
    // unreadable — the same order of operations a retention job uses).
    val expiring = t.scan().filter(expr("doc_id % 10 = 3"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(expiring.nonEmpty)
    val removed = t.applyTtl()
    assert(removed == expiring.size,
      s"applyTtl removed $removed rows, captured ${expiring.size} ids")
    idx.delete(expiring)

    val rebuiltPath = Files.createTempDirectory("ttl_idx_rebuild_").toString
    val rebuilt = InvertedIndex.build(spark,
      ColumnarMergeTree.open(spark, tableDir).scan(), rebuiltPath, nbuckets = 8)
    val terms = Seq("dup", "vector", "merge")
    val a = idx.search(terms, k = 15).collect().toSeq
    val b = rebuilt.search(terms, k = 15).collect().toSeq
    assert(a == b, s"TTL flow must equal rebuild:\n$a\nvs\n$b")
    assert(!a.exists(r => expiring.contains(r.getLong(1))),
      "expired docs must never be served")
    idx.table.shutdown(); rebuilt.table.shutdown(); t.shutdown()
  }

  test("update faces cap their driver-side id collect (over-cap fails with " +
    "rebuild guidance; under-cap unchanged; index left intact)") {
    import spark.implicits._
    val path = Files.createTempDirectory("inv_cap_").toString
    val idx = InvertedIndex.build(spark, corpus, path, nbuckets = 8)
    val terms = Seq("dup", "vector", "merge")
    val before = idx.search(terms, k = 15).collect().toSeq

    // 7 edited docs against a cap of 3: the collect itself must refuse —
    // BEFORE any posting row moves — with the rebuild message.
    val edited = (200L to 206L).map(id => (id, "dup vector merge"))
      .toDF("doc_id", "text")
    spark.conf.set(graft.operators.BoundedIds.MaxIdsConf, "3")
    try {
      val e = intercept[IllegalArgumentException](idx.update(edited))
      assert(e.getMessage.contains("rebuild the index"), e.getMessage)
      assert(idx.search(terms, k = 15).collect().toSeq == before,
        "an over-cap update must leave the index untouched")
      // Same discipline on the ANN and MinHash faces.
      graft.functions.GraftFunctions.register(spark)
      val vectors = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val ivfPath = Files.createTempDirectory("ivf_cap_").toString
      val ivf = IvfIndex.build(spark, vectors, ivfPath, nlist = 8)
      val e2 = intercept[IllegalArgumentException](
        ivf.update(vectors.filter(col("vec_id") < 7)))
      assert(e2.getMessage.contains("rebuild the index"), e2.getMessage)
      assert(!Files.exists(java.nio.file.Paths.get(ivfPath, "_update_intent")),
        "an over-cap ANN update must refuse before writing the intent")
      ivf.table.shutdown()

      def dsh(df: DataFrame) =
        df.select(col("doc_id"), xxhash64(col("text")).as("h"))
      val store = MinHashStore.create(spark,
        Files.createTempDirectory("mh_cap_").toString + "/store", dsh(corpus))
      val e3 = intercept[IllegalArgumentException](store.update(
        dsh((200L to 206L).map(id => (id, "x")).toDF("doc_id", "text"))))
      assert(e3.getMessage.contains("rebuild the index"), e3.getMessage)
    } finally spark.conf.unset(graft.operators.BoundedIds.MaxIdsConf)

    // Under the (restored default) cap the same update applies normally.
    idx.update(edited)
    assert(idx.search(terms, k = 15).collect().toSeq != before,
      "an under-cap update of all-query-term docs must change the top-k")
    idx.table.shutdown()
  }

  test("ANN update validates the replacement frame BEFORE the intent/delete " +
    "(a caller error must not leave a torn index)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val vectors = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val path = Files.createTempDirectory("ivf_val_").toString
    val idx = IvfIndex.build(spark, vectors, path, nlist = 8)
    val queries = vectors.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val before = idx.search(queries, k = 3, nprobe = 8).collect().toSeq

    // Wrong dimension: must fail while the index is still intact — no
    // intent marker, ids still present, open() still serves.
    val wrongDim = Seq((12L, Seq(1.0, 2.0))).toDF("vec_id", "v")
    val e = intercept[IllegalArgumentException](idx.update(wrongDim))
    assert(e.getMessage.contains("dimension"), e.getMessage)
    // Missing column: same posture.
    val noV = Seq((12L, "oops")).toDF("vec_id", "w")
    val e2 = intercept[IllegalArgumentException](idx.update(noV))
    assert(e2.getMessage.contains("vec_id, v"), e2.getMessage)

    assert(!Files.exists(java.nio.file.Paths.get(path, "_update_intent")),
      "a validation failure must never write the update intent")
    val reopened = IvfIndex.open(spark, path)
    assert(reopened.search(queries, k = 3, nprobe = 8).collect().toSeq == before,
      "the index must be untouched after a rejected update")
    idx.table.shutdown()
  }
}
