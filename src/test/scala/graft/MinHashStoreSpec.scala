package graft

import graft.operators.MinHashStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-snapshot incremental dedup: the persisted signature store must give
  * the SAME answer as a from-scratch exact computation, both on first build
  * and — the part that matters — after `append` grows it batch by batch.
  */
class MinHashStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private def docsDf: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private def shingleExpr = {
    val ws = split(col("text"), " ")
    transform(
      sequence(lit(1), greatest(lit(1), size(ws) - lit(4))),
      i => concat_ws(" ", slice(ws, i, lit(5))))
  }

  private def dshOf(df: DataFrame): DataFrame = df
    .select(col("doc_id"), explode(shingleExpr).as("shingle"))
    .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    .distinct()

  /** Exact J ≥ 0.8 pairs between two doc-id sets, via the shingle equi-join
    * ground truth (the same construction q26 pins against DuckDB).
    */
  private def exactCrossPairs(left: DataFrame, right: DataFrame): Set[(Long, Long)] = {
    val l = dshOf(left).select(col("doc_id").as("a"), col("h"))
    val r = dshOf(right).select(col("doc_id").as("b"), col("h"))
    val cl = l.groupBy("a").agg(count(lit(1)).as("na"))
    val cr = r.groupBy("b").agg(count(lit(1)).as("nb"))
    val shared = l.join(r, "h").filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("s"))
    val j = col("s").cast("double") / (col("na") + col("nb") - col("s")).cast("double")
    shared.join(cl, "a").join(cr, "b").filter(j >= 0.8)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
  }

  private def storeDedup(store: MinHashStore, batch: DataFrame): Set[(Long, Long)] = {
    val batchDsh = dshOf(batch)
    val cand = store.candidatePairs(MinHashStore.bandSignatures(batchDsh))
    // verify exactly, joining sets for candidates only (mirrors q101)
    val all = dshOf(docsDf)
    val sets = all.groupBy("doc_id").agg(collect_set(col("h")).as("sh"))
    val ws = cand
      .join(sets.select(col("doc_id").as("store_id"), col("sh").as("so")), "store_id")
      .join(sets.select(col("doc_id").as("batch_id"), col("sh").as("sn")), "batch_id")
    val inter = size(array_intersect(col("so"), col("sn"))).cast("double")
    val j = inter / (size(col("so")) + size(col("sn")) - inter).cast("double")
    ws.filter(j >= 0.8).select("store_id", "batch_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("batch dedup against the store matches the exact cross-slice answer") {
    val hist = docsDf.filter(col("doc_id") % 10 =!= 0)
    val batch = docsDf.filter(col("doc_id") % 10 === 0)
    val p = java.nio.file.Files.createTempDirectory("mhs_spec1_").toString
    val store = MinHashStore.create(spark, p, dshOf(hist))
    val got = storeDedup(store, batch)
    val want = exactCrossPairs(hist, batch)
    assert(got == want)
    assert(got.nonEmpty, "sf0.001 corpus is known to contain cross-slice near-dups")
  }

  test("append path equals rebuild path: batch2 vs (hist + batch1)") {
    val hist = docsDf.filter(col("doc_id") % 3 === 0)
    val batch1 = docsDf.filter(col("doc_id") % 3 === 1)
    val batch2 = docsDf.filter(col("doc_id") % 3 === 2)

    val pInc = java.nio.file.Files.createTempDirectory("mhs_spec2a_").toString
    val incStore = MinHashStore.create(spark, pInc, dshOf(hist))
    incStore.append(dshOf(batch1)) // batch1 ingested: store grows in place

    val pFull = java.nio.file.Files.createTempDirectory("mhs_spec2b_").toString
    val fullStore = MinHashStore.create(spark, pFull,
      dshOf(docsDf.filter(col("doc_id") % 3 =!= 2)))

    assert(storeDedup(incStore, batch2) == storeDedup(fullStore, batch2))
    assert(incStore.signatures.count() == fullStore.signatures.count())
  }

  test("reopen from disk serves the same signatures and candidates") {
    val hist = docsDf.filter(col("doc_id") % 10 =!= 0)
    val batch = docsDf.filter(col("doc_id") % 10 === 0)
    val p = java.nio.file.Files.createTempDirectory("mhs_spec3_").toString
    val created = MinHashStore.create(spark, p, dshOf(hist))
    val reopened = MinHashStore.open(spark, p)
    assert(reopened.signatures.count() == created.signatures.count())
    assert(storeDedup(reopened, batch) == storeDedup(created, batch))
  }
}
