package graft

import graft.operators.IvfIndex
import graft.queries.PipelineQueries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Chunk-level vectors in the hybrid serve (q140): chunk embeddings keyed
  * doc_id·64 + chunk_idx in a persisted IvfIndex. Pins the degenerate
  * equality (one chunk per doc ⇒ chunk-ANN IS doc-ANN), the headline
  * capability (a doc whose semantic evidence lives ONLY in its 2nd chunk
  * is found, with the chunk attributed), and the 100 TB serve path the
  * oracle-checked entry trades away for exactness (autoNprobe cluster
  * pruning with bounded recall loss).
  */
class ChunkVecSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val Span = 64L

  /** Hand corpus: doc texts with the given token counts, deterministic
    * unit-ish embeddings of dimension `dim`.
    */
  private def handDocs(nTokens: Seq[Int]): DataFrame = {
    import spark.implicits._
    nTokens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(t => s"w${i}_$t").mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def handEmb(vecs: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    vecs.toDF("vec_id", "v")
  }

  test("one chunk per doc: chunk-ANN equals doc-ANN (keys = doc_id * span)") {
    val rnd = new scala.util.Random(11)
    val docs = handDocs(Seq.fill(20)(10)) // 10 tokens < W=16 -> 1 chunk each
    val emb = handEmb((0 until 20).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextDouble() - 0.5))))
    val cv = PipelineQueries.chunkVecsFrom(docs, emb).collect()
    assert(cv.length == 20 && cv.forall(_.getLong(2) == 0L),
      "every doc must yield exactly chunk 0")
    // chunk 0's vector is the doc vector EXACTLY (shift by 0)
    val byDoc = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    cv.foreach(r => assert(r.getSeq[Double](3) == byDoc(r.getLong(1))))
    val chunkIdx = IvfIndex.build(spark,
      PipelineQueries.chunkVecsFrom(docs, emb)
        .select(col("key").as("vec_id"), col("cv").as("v")),
      Files.createTempDirectory("ivf_cs_chunk_").toString)
    val docIdx = IvfIndex.build(spark,
      emb.select(col("vec_id"), col("v")),
      Files.createTempDirectory("ivf_cs_doc_").toString)
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    def rows(idx: IvfIndex, chunkKeys: Boolean) =
      idx.search(q, k = 5, nprobe = idx.nlist, excludeSelf = false)
        .filter((if (chunkKeys) expr(s"vec_id div $Span") else col("vec_id"))
          =!= col("qid"))
        .collect().map(r => (r.getLong(0), r.getInt(1),
          if (chunkKeys) r.getLong(2) / Span else r.getLong(2),
          r.getDouble(3)))
    assert(rows(chunkIdx, chunkKeys = true).toSeq ==
      rows(docIdx, chunkKeys = false).toSeq,
      "a one-chunk corpus must make chunk-ANN and doc-ANN identical")
  }

  test("a doc retrievable ONLY via its 2nd chunk's vector is found, chunk attributed") {
    // dim 4. Query = e1. Doc 1: embedding e2 — doc-level cosine(q, d1) = 0;
    // its chunk 1 is the cyclic shift of e2 by 1 = e1 — cosine 1. Doc 2 is
    // a doc-level near-match (control), docs 3..6 are noise.
    val docs = handDocs(Seq(10, 20, 10, 10, 10, 10, 10)) // doc 1 -> 2 chunks
    val emb = handEmb(Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),    // the query doc
      (1L, Seq(0.0, 1.0, 0.0, 0.0)),    // orthogonal at doc level
      (2L, Seq(0.9, 0.1, 0.0, 0.0)),    // doc-level near-match
      (3L, Seq(0.0, 0.0, 1.0, 0.0)),
      (4L, Seq(0.0, 0.0, 0.0, 1.0)),
      (5L, Seq(0.0, 0.0, 0.7, 0.7)),
      (6L, Seq(0.5, 0.5, 0.5, 0.5))))
    val idx = IvfIndex.build(spark,
      PipelineQueries.chunkVecsFrom(docs, emb)
        .select(col("key").as("vec_id"), col("cv").as("v")),
      Files.createTempDirectory("ivf_cs_2nd_").toString)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val hits = idx.search(q, k = 10, nprobe = idx.nlist, excludeSelf = false)
      .filter(expr(s"vec_id div $Span") =!= col("qid"))
      .collect().map(r => (r.getLong(2) / Span, r.getLong(2) % Span, r.getDouble(3)))
    // doc 1 is found AT THE TOP via chunk 1 (cosine 1.0 — the shifted e2
    // aligns with the query exactly), outranking the doc-level near-match.
    assert(hits.head == ((1L, 1L, 1.0)),
      s"expected doc 1 via chunk 1 at cosine 1.0 first, got ${hits.head}")
    // doc-level ANN cannot see it: cosine(q, d1) = 0 ranks below both the
    // near-match and the diagonal noise doc.
    val docSims = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        expr("aggregate(zip_with(v, array(1.0D, 0.0D, 0.0D, 0.0D), (a, b) -> a * b), 0D, (s, x) -> s + x)").as("dot"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(docSims(1L) == 0.0, "doc 1 is invisible at doc granularity")
  }

  test("autoNprobe cluster pruning keeps recall >= 0.8 @10 at chunk granularity") {
    val dir = "/root/testdata/sf0.001"
    val (idx, _) = PipelineQueries.chunkIvfOf(spark, dir)
    val q = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
      .filter(col("qid") < 5)
    def top10(nprobe: Int): Map[Long, Seq[Long]] =
      idx.search(q, k = 10, nprobe = nprobe, excludeSelf = false)
        .collect().groupBy(_.getLong(0))
        .map { case (k, rs) => k -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    val exact = top10(idx.nlist)
    val pruned = top10(IvfIndex.autoNprobe(idx.nlist))
    val recall = exact.keys.toSeq.map { qid =>
      pruned(qid).toSet.intersect(exact(qid).toSet).size / 10.0
    }.sum / exact.size
    assert(recall >= 0.8, s"chunk-level IVF recall@10 = $recall < 0.8")
    val (planned, total) = idx.lastPruning
    assert(planned < total, s"autoNprobe must prune cluster parts ($planned/$total)")
  }
}
