package graft.operators

import graft.mergetree.{ColumnarMergeTree, MergeTreeConfig}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructField, StructType}

/** A PERSISTED full-text inverted index with BM25 ranking, stored as a
  * MergeTree table — the text twin of [[IvfIndex]] (same marriage of the
  * engine's two halves: the inverted lists ARE the storage engine's parts).
  *
  * q110 demonstrates BM25 semantics by scanning the corpus per query; a
  * 100 TB corpus tokenizes ONCE — and this class stores the postings so a
  * query touches only the lists of its own terms:
  *
  *   - build: tokenize (the q78 tokenizer — lowercase, split on
  *     non-letters, length ≥ 3), aggregate per-(doc,term) term frequencies,
  *     DENORMALIZE each document's token count `dl` into its posting rows
  *     (killing the query-time join against a corpus-sized doc-length
  *     table — the classic posting-list layout), hash every term into one
  *     of `nbuckets` lists, and land ONE PART PER BUCKET of a
  *     ColumnarMergeTree ordered by bucket id. Corpus constants
  *     (document count, average document length) persist as a one-row
  *     parquet sidecar under the table dir (`_stats/`).
  *   - search: the query's terms hash to ≤ |terms| buckets; each
  *     `rangeScan(b, b)` prunes to that bucket's own part(s) via the
  *     manifest — the engine reads |query buckets|/nbuckets of the index
  *     from disk — and the `term IN (…)` filter pushes into the parquet
  *     scan below that. Scoring is pure map-side (tf, dl AND df are all
  *     denormalized into the posting row at build time — like nDocs and
  *     avgdl, df is frozen until a rebuild); the only shuffle is the
  *     per-document score sum. No corpus access at all.
  *   - phrase search: postings are POSITIONAL (each carries its term's
  *     sorted in-document positions), so exact phrase queries resolve by
  *     folding position-list intersections — see [[phraseSearch]].
  *
  * BM25 (Robertson/Spärck Jones; the Lucene-style non-negative idf):
  *   idf(t)  = ln((N - df + 0.5)/(df + 0.5) + 1)
  *   s(d,t)  = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * Per-(doc,term) contributions are rounded to integer micro-units BEFORE
  * the per-document sum (integer addition is order-independent, so the
  * score is reproducible across partitionings and engines — the q20/q78
  * float discipline applied to an order-sensitive sum).
  *
  * Scale posture: the index table partitions/compacts/recovers like any
  * other MergeTree table; appends land new per-bucket parts that normal
  * compaction re-bins (df/avgdl then come from the merged lists); a query
  * never shuffles anything bigger than the matched postings.
  */
final class InvertedIndex private (
    val spark: SparkSession,
    val table: ColumnarMergeTree,
    val path: String) {

  import InvertedIndex._

  private lazy val stats: (Long, Double, Int) = {
    val r = spark.read.parquet(s"$path/_stats")
      .select(col("n_docs"), col("avgdl"), col("nbuckets")).first()
    (r.getLong(0), r.getDouble(1), r.getInt(2))
  }

  /** Bucket count the build hashed with (persisted — it can NOT be
    * re-derived from occupied buckets: an empty top bucket would shrink
    * the modulus and re-hash every query term wrong).
    */
  def nbuckets: Int = stats._3

  /** BM25 top-k documents for `terms`. Output: (rk, doc_id, n_terms,
    * score) — n_terms is the number of distinct query terms the document
    * matched; score is the micro-unit integer BM25 sum.
    */
  def search(terms: Seq[String], k: Int,
             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (nDocs, avgdl, nb) = stats
    // The query's buckets: ≤ |terms| values, computed driver-side with the
    // same hash the build used (bounded by the query, never the corpus).
    val buckets = terms.map(t => bucketOf(spark, t, nb)).distinct.sorted
    val postings = buckets.map(bk => table.rangeScan(bk, bk))
      .reduceOption(_ unionByName _)
      .getOrElse(table.scan().limit(0))
      .filter(col("term").isin(terms: _*))
    // tf, dl AND df all ride inside the posting row — scoring is pure
    // map-side; the only shuffle in the whole query is the per-document
    // score sum below.
    val contrib = postings
      .select(col("doc_id"),
        bm25Micro(col("tf"), col("df"), col("dl"), nDocs, avgdl, k1, b).as("c"))
    val scored = contrib.groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("c")).as("score"))
    // Distributed top-k (TakeOrderedAndProject) BEFORE the rank window:
    // the window then numbers k rows, never a global single partition of
    // every matched document.
    val top = scored.orderBy(col("score").desc, col("doc_id")).limit(k)
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    top.withColumn("rk", row_number().over(w).cast("long"))
      .select(col("rk"), col("doc_id"), col("n_terms"), col("score"))
      .orderBy(col("rk"))
  }

  /** Exact PHRASE search from the positional postings: top-k documents by
    * occurrence count of `phrase` as CONSECUTIVE tokens (raw-split-array
    * adjacency — equals text adjacency, since the split eats every
    * non-letter run whole). Output: (rk, doc_id, n_occ).
    *
    * Shape: each phrase term's posting list arrives bucket-pruned exactly
    * like [[search]]; term i+1's positions fold into the accumulator via
    * `array_intersect(positions_so_far + 1, positions_i)` — after the
    * fold the accumulator holds the phrase END positions, so n_occ is its
    * size. The per-term lists meet in doc_id equi-joins sized by the
    * phrase's own posting lists (the classic positional-query cost),
    * never by the corpus; the corpus text is never read.
    */
  def phraseSearch(phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val nb = stats._3
    val buckets = phrase.distinct.map(t => bucketOf(spark, t, nb)).distinct.sorted
    val postings = buckets.map(bk => table.rangeScan(bk, bk))
      .reduceOption(_ unionByName _)
      .getOrElse(table.scan().limit(0))
      .filter(col("term").isin(phrase.distinct: _*))
    val byTerm = phrase.zipWithIndex.map { case (t, i) =>
      postings.filter(col("term") === t)
        .select(col("doc_id"), col("positions").as(s"p$i"))
    }
    val folded = byTerm.zipWithIndex.tail.foldLeft(
        byTerm.head.select(col("doc_id"), col("p0").as("occ"))) {
      case (acc, (next, i)) =>
        acc.join(next, "doc_id")
          .select(col("doc_id"),
            array_intersect(transform(col("occ"), _ + 1), col(s"p$i")).as("occ"))
    }
    val counted = folded
      .select(col("doc_id"), size(col("occ")).cast("long").as("n_occ"))
      .filter(col("n_occ") > 0)
    val top = counted.orderBy(col("n_occ").desc, col("doc_id")).limit(k)
    val w = Window.orderBy(col("n_occ").desc, col("doc_id"))
    top.withColumn("rk", row_number().over(w).cast("long"))
      .select(col("rk"), col("doc_id"), col("n_occ"))
      .orderBy(col("rk"))
  }

  /** (planned, total) parts at the last probed scan — pruning visibility. */
  def lastPruning: (Int, Int) = table.lastPruning
}

object InvertedIndex {

  /** Default bucket count for a V-term vocabulary: smallest power of two
    * ≥ √V/4, floored at 8 (the [[IvfIndex.autoNlist]] rule — per-query
    * cost is ~|terms| probed lists of size |postings|/nbuckets, so buckets
    * must grow with the vocabulary or each list stops being small).
    */
  def autoNbuckets(vocab: Long): Int = IvfIndex.autoNlist(vocab)

  /** The q78 corpus tokenizer — the one contract build and every oracle
    * share: lowercase, split on non-letters, keep length ≥ 3.
    */
  def tokenize(docs: DataFrame): DataFrame =
    tokenizeWithPos(docs).select(col("doc_id"), col("term"))

  /** [[tokenize]] plus each surviving term's position in the RAW split
    * array (0-based, before the length filter) — token-space adjacency
    * equals text adjacency, which is what phrase matching needs.
    */
  def tokenizeWithPos(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(lower(col("text")), "[^a-z]+")).as(Seq("pos", "term")))
      .filter(length(col("term")) >= 3)

  /** Per-(doc,term) BM25 contribution in integer micro-units. Spelled
    * operation-for-operation like the q110 oracle SQL so both engines walk
    * the identical IEEE-double expression tree before the rounding.
    */
  private[graft] def bm25Micro(tf: Column, df: Column, dl: Column,
      nDocs: Long, avgdl: Double, k1: Double, b: Double): Column = {
    val idf = log((lit(nDocs) - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
    val denom = tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dl / lit(avgdl))
    floor(idf * (tf * lit(k1 + 1.0)) / denom * lit(1e6) + lit(0.5)).cast("long")
  }

  private def bucketOf(spark: SparkSession, term: String, nb: Int): Long =
    spark.range(1).select(pmod(xxhash64(lit(term)), lit(nb.toLong)))
      .first().getLong(0)

  private val indexSchema = StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("term", StringType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("dl", LongType, nullable = false),
    StructField("df", LongType, nullable = false),
    StructField("positions", ArrayType(IntegerType), nullable = true)))

  /** Build the index at `path` from (doc_id, text) documents. `nbuckets`
    * ≤ 0 (the default) auto-sizes from the distinct-term count via
    * [[autoNbuckets]] (one count job at build time).
    */
  def build(spark: SparkSession, docs: DataFrame, path: String,
            nbuckets: Int = 0): InvertedIndex = {
    val terms = tokenizeWithPos(docs)
    // Positional postings (the Lucene prox layout): each posting carries
    // its term's sorted in-document positions, so tf = |positions| and
    // phrase queries resolve adjacency without touching the corpus. A
    // pathologically repeated term makes a long list — the classic
    // positional-index cost, bounded by that document's own length.
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"),
      sort_array(collect_list(col("pos"))).as("positions"))
    // Build-time only: the dl and df joins re-shuffle once per build;
    // queries never pay them again (both ride inside every posting row —
    // the posting-list denormalization that makes search one shuffle).
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nb = if (nbuckets > 0) nbuckets
      else autoNbuckets(dfc.count())
    val postings = tf.join(dl, "doc_id").join(dfc, "term")
      .select(pmod(xxhash64(col("term")), lit(nb.toLong)).as("bucket"),
        col("term"), col("doc_id"), col("tf"), col("dl"), col("df"),
        col("positions"))
      .persist()
    try {
      val t = ColumnarMergeTree.create(spark, path, indexSchema,
        orderBy = Seq("bucket"), MergeTreeConfig(maxParts = 2 * nb))
      // One part per occupied bucket: a part's [minKey, maxKey] is one
      // bucket id, so a probe's rangeScan(b, b) prunes to exactly it.
      val occupied = postings.select(col("bucket")).distinct()
        .collect().map(_.getLong(0)).sorted
      occupied.foreach(bk => t.insertBatch(postings.filter(col("bucket") === bk)))
      // avg(dl): a ratio of exact integers, so both engines (and any
      // partitioning) reproduce the identical double.
      val nDocs = docs.select(countDistinct(col("doc_id"))).first().getLong(0)
      dl.agg(avg(col("dl")).as("avgdl"))
        .select(lit(nDocs).as("n_docs"), col("avgdl"), lit(nb).as("nbuckets"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$path/_stats")
      new InvertedIndex(spark, t, path)
    } finally postings.unpersist()
  }

  /** Reopen a built index (table self-describes via tabledef.json). */
  def open(spark: SparkSession, path: String): InvertedIndex =
    new InvertedIndex(spark, ColumnarMergeTree.open(spark, path), path)
}
