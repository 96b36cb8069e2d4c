package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted banded-MinHash signature store for CROSS-SNAPSHOT near-duplicate
  * deduplication — the operator a crawl pipeline actually runs: each new
  * batch must be deduped against EVERYTHING ingested before it, and
  * recomputing signatures for the historical corpus per batch is infeasible
  * at 100 TB. The store persists each document's banded signatures
  * (`doc_id, band, sig` — [[NumBands]] rows per document) once, at ingest
  * time; a new batch then costs:
  *
  *   1. shingle-hash + signature ONLY the new batch (map-side, corpus never
  *      re-read),
  *   2. one equi-join of the batch's signatures against the store on
  *      `(band, sig)` — the store side is ~[[NumBands]] rows × 8 bytes per
  *      historical document, orders of magnitude smaller than the corpus
  *      text it summarizes, and the join is a plain shuffled hash join that
  *      scales out (no all-pairs step anywhere),
  *   3. exact Jaccard verification of the (tiny) candidate pair set, for
  *      which the caller re-reads original text for CANDIDATE historical
  *      docs only (semi-join on the candidate ids),
  *   4. `append` of the batch's signatures, so the store grows with the
  *      corpus and the next batch sees this one.
  *
  * The signature math is shared verbatim with the single-snapshot LSH dedup
  * (q25, `queries/PipelineQueries.scala`) via [[bandSignatures]], so the
  * two paths can never drift: b bands of r rows with (b, r) = (24, 4) give
  * the standard S-curve with ~50% collision at J ≈ (1/b)^(1/r) ≈ 0.45 —
  * near-complete recall at the J ≥ 0.8 dedup threshold (Broder's MinHash;
  * Leskovec/Rajaraman/Ullman ch. 3 banding analysis).
  *
  * Storage is plain parquet: the store is itself just a table, so it can be
  * read, compacted, or partition-pruned like any other. `append` lands each
  * batch as new files under SINGLE-WRITER semantics (the only usage in this
  * repo — one ingest feed owns a store): Spark commits parquet appends as
  * per-file renames, not one directory-level swap, so a reader planning a
  * scan mid-append could list a partially-committed batch. Concurrent
  * multi-reader/writer consistency would need a manifest/commit protocol
  * like the MergeTree tables' (mergetree/ColumnarMergeTree manifest CAS).
  */
final class MinHashStore private (val path: String, spark: SparkSession) {

  /** The persisted `(doc_id, band, sig)` relation. */
  def signatures: DataFrame = spark.read.parquet(path)

  /** Append a batch's signatures (input: distinct `(doc_id, h)` shingle
    * hashes of the NEW documents only). Run AFTER deduping the batch, so
    * the next batch dedups against this one too.
    */
  def append(batchShingleHashes: DataFrame): Unit =
    MinHashStore.bandSignatures(batchShingleHashes)
      .write.mode("append").parquet(path)

  /** Append PRE-COMPUTED band signatures (a [[MinHashStore.bandSignatures]]
    * output). The streaming path already holds the batch's signatures
    * persisted — re-running the 96-min-hash aggregate inside [[append]]
    * would double the dominant per-batch cost.
    */
  def appendSignatures(sigs: DataFrame): Unit =
    sigs.write.mode("append").parquet(path)

  /** Remove documents' signatures from the store — the corpus-deletion
    * mirror of [[append]] (a deleted doc must stop generating candidate
    * pairs, or the dedup pipeline keeps "colliding" new batches with
    * expunged text). Signatures are per-document and deterministic, so
    * dropping a doc's 24 band rows IS a rebuild from the surviving corpus,
    * exactly (spec-pinned).
    *
    * Same SINGLE-WRITER semantics as append (one ingest feed owns a
    * store): survivors are written to a staging dir, then the store
    * directory is swapped via two renames. A crash between the renames
    * leaves the old store at `<path>.delete-old` and the survivors at
    * either location — both complete and recoverable by hand; a
    * mid-rename torn state cannot occur (dir renames are atomic on one
    * filesystem). Multi-writer stores need the MergeTree manifest
    * protocol, as documented on the class.
    */
  def delete(docIds: Seq[Long]): Unit = {
    require(docIds.nonEmpty, "empty delete: pass the removed doc ids")
    swapStore(signatures.filter(!col("doc_id").isInCollection(docIds.distinct)))
  }

  /** Replace the whole store with `next` via stage + two-rename swap — the
    * one commit point delete and update share. A crash between the renames
    * leaves the old store at `<path>.delete-old` and the survivors at
    * either location — both complete and recoverable by hand; a mid-rename
    * torn state cannot occur (dir renames are atomic on one filesystem).
    */
  private def swapStore(next: DataFrame): Unit = {
    import java.nio.file.{Files, Paths}
    val staged = path + ".delete-tmp"
    val old = path + ".delete-old"
    next.write.mode("overwrite").parquet(staged)
    graft.mergetree.MergeTreeTable.deleteRecursively(Paths.get(old))
    Files.move(Paths.get(path), Paths.get(old))
    Files.move(Paths.get(staged), Paths.get(path))
    graft.mergetree.MergeTreeTable.deleteRecursively(Paths.get(old))
  }

  /** Re-sign CHANGED documents (a corpus edit changes a doc's shingle set,
    * so its persisted signatures are stale — candidate pairs would keep
    * reflecting the pre-edit text): survivors minus the edited ids UNION
    * the new texts' signatures, committed through the SAME single
    * stage+swap as [[delete]] — one atomic commit, so no crash point can
    * leave the edited docs signature-less (a separate delete-then-append
    * would). Signatures are per-document and deterministic, so the result
    * IS a rebuild over the edited corpus, exactly (spec-pinned). Same
    * single-writer semantics as append.
    */
  def update(batchShingleHashes: DataFrame): Unit = {
    val ids = BoundedIds.collect(batchShingleHashes, "doc_id", "MinHashStore.update")
    require(ids.nonEmpty, "empty update: pass the re-written docs' shingle hashes")
    swapStore(
      signatures.filter(!col("doc_id").isInCollection(ids))
        .unionByName(MinHashStore.bandSignatures(batchShingleHashes)))
  }

  /** LSH candidate pairs of a new batch against the store: distinct
    * `(store_id, batch_id)` colliding in at least one band. Self-pairs are
    * excluded so a batch can be safely re-checked after its own `append`.
    */
  def candidatePairs(batchSignatures: DataFrame): DataFrame =
    signatures.select(col("doc_id").as("store_id"), col("band"), col("sig"))
      .join(batchSignatures.select(col("doc_id").as("batch_id"), col("band"), col("sig")),
        Seq("band", "sig"))
      .filter(col("store_id") =!= col("batch_id"))
      .select(col("store_id"), col("batch_id"))
      .distinct()
}

object MinHashStore {

  /** Signature geometry — shared with q25 so the persisted store and the
    * in-memory single-snapshot dedup agree bit-for-bit.
    */
  val NumHashes = 96
  val BandRows = 4
  val NumBands: Int = NumHashes / BandRows // 24

  /** Banded signatures from distinct `(doc_id, h)` shingle hashes: 96
    * min-hashes per document (one hash-aggregate, fully codegen'd), banded
    * 4-at-a-time into 24 `(doc_id, band, sig)` rows.
    */
  def bandSignatures(shingleHashes: DataFrame): DataFrame = {
    val sigAggs = (0 until NumHashes).map(i =>
      min(xxhash64(col("h"), lit(i))).as(s"h$i"))
    val sigs = shingleHashes.groupBy(col("doc_id")).agg(sigAggs.head, sigAggs.tail: _*)
    val bandCols = (0 until NumBands).map { b =>
      val hs = (0 until BandRows).map(r => col(s"h${b * BandRows + r}"))
      struct(lit(b).as("band"), xxhash64(hs: _*).as("sig"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Build a store at `path` from the corpus's distinct `(doc_id, h)`
    * shingle hashes — the one-time historical backfill.
    */
  def create(spark: SparkSession, path: String, shingleHashes: DataFrame): MinHashStore = {
    bandSignatures(shingleHashes).write.mode("overwrite").parquet(path)
    new MinHashStore(path, spark)
  }

  /** Open an existing store. */
  def open(spark: SparkSession, path: String): MinHashStore =
    new MinHashStore(path, spark)
}
