package graft

import graft.mergetree.{ColumnarMergeTree, MergeTreeConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** tokenbf skip index: sidecar lifecycle, part pruning on a
  * disjoint-vocabulary corpus (the real testdata's 31-word vocabulary puts
  * every token in every part, so pruning must be pinned synthetically), the
  * no-sidecar fallback, and has_token SQL agreement with the pruned scan.
  */
class TokenBloomSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  /** 4 parts, each with its own token range: part i holds docs with tokens
    * "tok<i*1000>".."tok<i*1000+999>" plus the shared word "common".
    */
  private def build(): (String, ColumnarMergeTree) = {
    val dir = Files.createTempDirectory("mt_tokbf_").toString
    val df = spark.range(4000).select(
      col("id").as("k"),
      concat(lit("common text tok"), col("id").cast("string"),
        lit(" tail-"), (col("id") % 17).cast("string")).as("body"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"),
      MergeTreeConfig(tokenBloomColumns = Seq("body")))
    (0 until 4).foreach { i =>
      t.insertBatch(df.filter(col("k") >= i * 1000 && col("k") < (i + 1) * 1000))
    }
    (dir, t)
  }

  test("every part carries a sidecar; a rare token prunes to one part") {
    val (dir, t) = build()
    (t.parts.map(_.partId)).foreach { id =>
      assert(Files.exists(Paths.get(dir, s"part_$id", "_tokenbf_body")),
        s"part $id must carry the tokenbf sidecar")
    }
    val hit = t.scanHasToken("body", "tok2500")
    assert(hit.count() == 1L)
    assert(hit.select("k").first().getLong(0) == 2500L)
    val (planned, total) = t.lastPruning
    assert(total == 4 && planned <= 2,
      s"bloom must exclude parts without the token: planned=$planned of $total")
  }

  test("a shared token keeps all parts; an absent token launches no tasks") {
    val (_, t) = build()
    assert(t.scanHasToken("body", "common").count() == 4000L)
    assert(t.lastPruning == (4, 4))
    assert(t.scanHasToken("body", "tok99999").count() == 0L)
    val (planned, _) = t.lastPruning
    assert(planned <= 1, s"absent token should probe out (almost) everywhere: $planned")
  }

  test("token-boundary semantics: substrings and hyphen-split halves do not match") {
    val (_, t) = build()
    // 'tok' is a strict PREFIX of every 'tok<n>' token, never a whole
    // token -> zero matches (the thing a substring contains() could not
    // promise, and why contains() must not consult this index)
    assert(t.scanHasToken("body", "tok").count() == 0L)
    // hyphen splits: 'tail-3' is two tokens, so the compound never matches
    assert(t.scanHasToken("body", "tail").count() == 4000L)
    // and a substring that never forms a whole token matches nothing
    assert(t.scanHasToken("body", "ommon").count() == 0L)
    // non-single-token probes are rejected loudly
    intercept[IllegalArgumentException] { t.scanHasToken("body", "tok 2500") }
  }

  test("parts without a sidecar are kept (index accelerates, never filters)") {
    val (dir, t) = build()
    val firstId = t.parts.map(_.partId).min
    Files.delete(Paths.get(dir, s"part_$firstId", "_tokenbf_body"))
    // token lives in the LAST part; the sidecar-less first part must
    // survive the probe (unprunable), and results stay exact.
    assert(t.scanHasToken("body", "tok3999").count() == 1L)
    val (planned, total) = t.lastPruning
    assert(total == 4 && planned >= 2,
      s"sidecar-less part must be kept: planned=$planned")
  }

  test("has_token SQL function agrees with the pruned scan, and merges rebuild sidecars") {
    val (dir, t) = build()
    graft.functions.GraftFunctions.register(spark)
    spark.read.format("mergetree").load(dir).createOrReplaceTempView("tokbf_v")
    val viaSql = spark.sql(
      "SELECT count(*) FROM tokbf_v WHERE has_token(body, 'tok123')").first().getLong(0)
    assert(viaSql == t.scanHasToken("body", "tok123").count())
    // a full merge rewrites everything into one part — which must carry a
    // freshly-built sidecar that still answers probes
    t.optimizeFinal()
    t.refresh()
    val ids = t.parts.map(_.partId)
    assert(ids.size == 1)
    assert(Files.exists(Paths.get(dir, s"part_${ids.head}", "_tokenbf_body")),
      "merged part must rebuild its tokenbf sidecar")
    assert(t.scanHasToken("body", "tok2500").count() == 1L)
  }
}
