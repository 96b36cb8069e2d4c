package graft

import graft.mergetree._
import org.apache.spark.sql.SparkSession

/** Runnable demo of the MergeTree table API, mirroring the reference's
  * examples/demo.cpp scenarios (basic ops, flush, merge, persistence).
  * `sbt "runMain graft.Demo"` — prints each scenario's observable output.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-demo", defaultCpus = "4")
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("mt_demo_").toString
    val t = MergeTreeTable.create(spark, dir,
      MergeTreeConfig(memtableFlushThreshold = 5, maxParts = 2))

    // basic ops (demo.cpp:9-38): versions accumulate, read-your-writes
    t.insert("key1", "value1", 1000L)
    t.insert("key2", "value2", 2000L)
    t.insert("key1", "updated_value1", 4000L)
    println("== point lookup key1 (unflushed, read-your-writes):")
    t.queryKey("key1").show(false)

    // flush at threshold (demo.cpp:40-64)
    (0 until 20).foreach(i => t.insert(f"key$i%02d", s"v$i", i.toLong))
    println(s"== after 20 inserts: parts=${t.partCount} memtable=${t.memtableSize} totalRows=${t.totalRows}")

    // merge (demo.cpp:66-98)
    t.optimize()
    println(s"== after optimize: parts=${t.partCount} totalRows=${t.totalRows}")
    println("== range query [key05,key08]:")
    t.query("key05", "key08").show(false)

    println("== inverted range (start>end) → empty:")
    println("rows=" + t.query("zzz", "aaa").count())
    println("== empty fresh table query:")
    val e = MergeTreeTable.create(spark,
      java.nio.file.Files.createTempDirectory("mt_demo_empty_").toString)
    println("rows=" + e.query("a", "z").count())

    // persistence (demo.cpp:155-190)
    t.shutdown()
    val t2 = MergeTreeTable.open(spark, dir)
    println(s"== reopened: totalRows=${t2.totalRows} parts=${t2.partCount}")
    t2.queryKey("key1").show(false)

    println("== compat reader over C++-written fixture data/test_basic:")
    RefFormatReader.readTable(spark, "/root/reference/data/test_basic").show(false)
    t2.shutdown()

    // SQL access through the DSv2 connector (round 2)
    println("== SQL over the same table via format(\"mergetree\"):")
    spark.read.format("mergetree").load(dir).createOrReplaceTempView("mt_demo")
    spark.sql(
      """SELECT key, max(value) AS value, timestamp FROM mt_demo
        |WHERE key BETWEEN 'key05' AND 'key08'
        |GROUP BY key, timestamp ORDER BY key, timestamp""".stripMargin).show(false)

    // LLM-pipeline operators over the driver testdata (round 2)
    val sf = "/root/testdata/sf0.001"
    println("== cosine top-3 neighbours of vec_id 0 (native codegen expression):")
    queries.PipelineQueries.q23CosineTopK(spark, sf)
      .filter("qid = 0 AND rnk <= 3").show(false)
    println("== near-duplicate document pairs (MinHash+LSH, exact-verified):")
    queries.PipelineQueries.q25MinhashLsh(spark, sf).show(5, truncate = false)
    println("== per-language corpus stats:")
    queries.PipelineQueries.q24TextStats(spark, sf).show(false)

    // Persisted ANN index (round 4): inverted lists stored as cluster-keyed
    // MergeTree parts; a probe is manifest part pruning.
    println("== persisted IVF index: top-3 for vec_id 0, probing 3/8 clusters:")
    import org.apache.spark.sql.functions.{col, lit}
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val idx = operators.IvfIndex.build(spark, vecs,
      java.nio.file.Files.createTempDirectory("ivf_demo_").toString, nlist = 8)
    val q0 = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    idx.search(q0, k = 3, nprobe = 3).show(false)
    println(s"== index parts probed (planned/total): ${idx.lastPruning._1}/${idx.lastPruning._2}")
    idx.table.shutdown()

    // Round 7: materialized view into an Aggregating target + SQL FINAL.
    println("== materialized view: 2 ingest batches -> partial-agg parts -> FINAL SQL:")
    val mvDf = spark.range(100).select(
      col("id").as("k"), (col("id") % 3).cast("long").as("grp"), lit(1L).as("n"))
    val mvSrc = ColumnarMergeTree.create(spark,
      java.nio.file.Files.createTempDirectory("mv_demo_src_").toString,
      mvDf.schema, orderBy = Seq("k"))
    val mvTgt = mvSrc.createMaterializedView("by_grp",
      java.nio.file.Files.createTempDirectory("mv_demo_tgt_").toString,
      s"SELECT grp, sum(n) AS n FROM ${ColumnarMergeTree.MvInput} GROUP BY grp",
      targetOrderBy = Seq("grp"),
      targetMode = MergeMode.Summing(Seq("grp"), Seq("n")))
    mvSrc.insertBatch(mvDf.filter(col("k") < 50))
    mvSrc.insertBatch(mvDf.filter(col("k") >= 50))
    spark.sql("DROP TABLE IF EXISTS mv_demo_final")
    spark.sql("CREATE TABLE mv_demo_final USING mergetree OPTIONS (`final` 'true') " +
      s"LOCATION '${mvTgt.path}'")
    println(s"== MV target parts=${mvTgt.partCount} (one partial per batch); FINAL-collapsed:")
    spark.sql("SELECT grp, n FROM mv_demo_final ORDER BY grp").show(false)
    spark.sql("DROP TABLE mv_demo_final")

    // Round 8: per-part sketch family — distinct counts, heavy hitters, and
    // percentiles answered from part sidecars (metadata only, no scan).
    println("== per-part sketches: uniq / topK / quantiles from metadata:")
    val hllDf = spark.range(5000).select(
      col("id").as("k"), (col("id") % 1234).cast("string").as("user"),
      (col("id") % 97).cast("double").as("v"))
    val hllT = ColumnarMergeTree.create(spark,
      java.nio.file.Files.createTempDirectory("hll_demo_").toString,
      hllDf.schema, orderBy = Seq("k"),
      config = MergeTreeConfig(hllColumns = Seq("user"),
        topKColumns = Seq("user"), quantileColumns = Seq("v")))
    (0 until 3).foreach(i => hllT.insertBatch(hllDf.filter(col("k") % 3 === i)))
    println(s"== approxDistinct(user) = ${hllT.approxDistinct("user")} (exact 1234, " +
      s"${hllT.partCount} part sidecars folded driver-side)")
    println(s"== approxTopK(user, 3) = ${hllT.approxTopK("user", 3).mkString(", ")}")
    println(s"== approxQuantiles(v, p50/p90) = " +
      hllT.approxQuantiles("v", Seq(0.5, 0.9)).map(q => f"$q%.1f").mkString(", "))
    // Round 9: the same folds from pure SQL via the injected table functions.
    val sqlUniq = spark.sql(
      s"SELECT approx_distinct FROM uniq_meta('${hllT.path}')").head.getLong(0)
    println(s"== SQL face: SELECT approx_distinct FROM uniq_meta(dir) = $sqlUniq")

    // Round 8: cross-snapshot incremental dedup via the signature store.
    println("== MinHash signature store: new batch deduped against history:")
    import org.apache.spark.sql.functions.{explode, xxhash64}
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    def dsh(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), explode(queries.PipelineQueries.shingles).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h")).distinct()
    val store = operators.MinHashStore.create(spark,
      java.nio.file.Files.createTempDirectory("mhs_demo_").toString,
      dsh(corpus.filter(col("doc_id") % 10 =!= 0)))
    val newBatch = dsh(corpus.filter(col("doc_id") % 10 === 0))
    val candidates = store.candidatePairs(operators.MinHashStore.bandSignatures(newBatch))
    println(s"== store holds ${store.signatures.count()} signature rows; " +
      s"batch candidates vs history: ${candidates.count()} pairs")

    // Round 9: full-text search from a persisted positional inverted index.
    println("== inverted index: BM25 top-3 for 'dup vector merge' + phrase search:")
    val inv = operators.InvertedIndex.build(spark, corpus,
      java.nio.file.Files.createTempDirectory("inv_demo_").toString)
    inv.search(Seq("dup", "vector", "merge"), k = 3).show(false)
    println(s"== last probed bucket's parts (planned/total): " +
      s"${inv.lastPruning._1}/${inv.lastPruning._2}")
    val phr = inv.phraseSearch(Seq("table", "scan", "merge"), k = 3)
    println(s"== docs containing the exact phrase 'table scan merge': " +
      s"${phr.count()} (top by occurrences)")
    phr.show(false)

    // Round 10: IVFADC — probe prunes which parts are read, PQ codes
    // shrink what each read row costs, exact cosines only on the shortlist.
    println("== IVFADC index: top-3 for vec_id 0 (ADC scan of probed lists):")
    val adcIdx = operators.IvfIndex.buildAdc(spark, vecs,
      java.nio.file.Files.createTempDirectory("ivfadc_demo_").toString, nlist = 8)
    adcIdx.searchAdc(q0, k = 3, nprobe = 3, shortlist = 100).show(false)
    println(s"== ADC parts probed (planned/total): " +
      s"${adcIdx.lastPruning._1}/${adcIdx.lastPruning._2}")
    adcIdx.table.shutdown()

    // Round 10: CJK-aware index — Han character bigrams per run, raw-string
    // query faces.
    println("== multilingual index: CJK BM25 + phrase over mixed-script docs:")
    import spark.implicits._
    val cjk = Seq((1L, "中文分词是检索的基础"), (2L, "我们做分词处理"),
      (3L, "中文 分词"), (4L, "latin only text here"))
      .toDF("doc_id", "text")
    val minv = operators.InvertedIndex.build(spark, cjk,
      java.nio.file.Files.createTempDirectory("inv_cjk_demo_").toString,
      tokenizer = operators.InvertedIndex.Mixed)
    minv.searchText("中文分词", k = 4).show(false)
    println(s"== docs with the exact CJK phrase 中文分词 (run-bounded): " +
      s"${minv.phraseSearchText("中文分词", k = 4).count()}")

    // Round 12: hybrid retrieval — RRF fusion of both persisted indexes
    // from pure SQL (text query against the inverted index, vec 0's
    // embedding against the ADC index).
    println("== hybrid_search: RRF fusion of BM25 + ANN from SQL, top-5:")
    val qvLit = q0.collect()(0).getSeq[Double](1)
      .map(d => s"${d}D").mkString("array(", ", ", ")")
    spark.sql(s"SELECT * FROM hybrid_search('${inv.path}', '${adcIdx.path}', " +
      s"'dup vector merge', $qvLit, 5)").show(false)

    // Round 12: set(N) skip index — equality pruning minmax can't give a
    // low-cardinality column whose values interleave across every part.
    println("== set(N) skip index: per-type ingest batches, scanIn prunes:")
    val setT = mergetree.ColumnarMergeTree.create(spark,
      java.nio.file.Files.createTempDirectory("set_demo_").toString,
      corpus.select(col("doc_id"), col("lang"), col("n_chars")).schema,
      orderBy = Seq("doc_id"),
      config = mergetree.MergeTreeConfig(setIndexColumns = Seq("lang")))
    Seq("en", "de", "fr", "es", "zh").foreach(l =>
      setT.insertBatch(corpus.select(col("doc_id"), col("lang"), col("n_chars"))
        .filter(col("lang") === l)))
    val zhRows = setT.scanIn("lang", Seq("zh")).count()
    println(s"== scanIn(lang = 'zh'): ${setT.lastPruning._1}/" +
      s"${setT.lastPruning._2} parts read, $zhRows rows")
    setT.shutdown()

    // Round 12: trained BPE subword tokenizer — corpus-trained merges,
    // native codegen encode expression.
    println("== BPE tokenizer: 100 corpus-trained merges, sample encoding:")
    val bpe = operators.BpeTokenizer.train(corpus, numMerges = 100)
    // "vectorization" is out-of-dictionary — it must SEGMENT into learned
    // subword units, while the frequent words encode whole.
    val sample = Seq((1L, "the merge table vectorization")).toDF("doc_id", "text")
    sample.select(org.apache.spark.sql.functions.call_function("bpe_encode",
        col("text"), org.apache.spark.sql.functions.typedLit(bpe.encoded))
        .as("tokens")).show(false)

    // Round 13: PERSISTED byte-level BPE — one merge list tokenizes every
    // script (GPT-2 byte bijection), saved and reopened as an artifact.
    println("== byte-level BPE: persisted artifact, CJK sample reopens + encodes:")
    val bbpe = operators.BpeTokenizer.trainByteLevel(corpus, numMerges = 100)
    val bpeDir = java.nio.file.Files.createTempDirectory("bpe_demo_").toString
    operators.BpeTokenizer.save(bbpe, bpeDir)
    val reopenedBpe = operators.BpeTokenizer.open(bpeDir)
    val cjkSample = "merge 中文分词 vectorization"
    println(s"== encode('$cjkSample') after reopen: " +
      operators.BpeTokenizer.encodeText(cjkSample, reopenedBpe)
        .mkString("[", ", ", "]"))

    // Round 13: CHUNK-granular hybrid retrieval — the q129 chunks indexed
    // as index documents, served from SQL with the evidence chunk.
    println("== chunk_hybrid_search: per-doc max-chunk BM25 + ANN, evidence chunk:")
    val spanD = 64L
    val chunksD = graft.queries.PipelineQueries
      .ragChunksText(corpus.select(col("doc_id"), col("text")), 16, 4)
      .select((col("doc_id") * spanD + col("chunk_idx")).as("doc_id"),
        col("txt").as("text"))
    val cinv = operators.InvertedIndex.build(spark, chunksD,
      java.nio.file.Files.createTempDirectory("inv_chunks_demo_").toString)
    spark.sql(s"SELECT * FROM chunk_hybrid_search('${cinv.path}', " +
      s"'${adcIdx.path}', 'dup vector merge', $qvLit, 5)").show(false)
    cinv.table.shutdown()

    // Round 13: storage-partitioned join over the bucket(N, col) transform
    // — two bucket-co-partitioned tables fact-join with ZERO exchanges
    // through the catalog (FunctionCatalog resolves the transform).
    println("== bucket(8, k) SPJ: co-partitioned join plans with no exchange:")
    val wh = java.nio.file.Files.createTempDirectory("spj_demo_wh_").toString
    spark.conf.set("spark.sql.catalog.demo_spj", classOf[sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.demo_spj.warehouse", wh)
    val aDf = (0 until 200).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
    val bDf = (0 until 100).map(i => (i.toLong, i * 2.0)).toDF("k", "w")
    mergetree.ColumnarMergeTree.create(spark, s"$wh/ba", aDf.schema,
      orderBy = Seq("k"), partitionBy = Some("bucket(8, k)")).insertBatch(aDf)
    mergetree.ColumnarMergeTree.create(spark, s"$wh/bb", bDf.schema,
      orderBy = Seq("k"), partitionBy = Some("bucket(8, k)")).insertBatch(bDf)
    spark.conf.set("spark.graft.preserveDataGrouping", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val spjJoin = spark.sql(
      "SELECT a.k FROM demo_spj.ba a JOIN demo_spj.bb b ON a.k = b.k")
    // Execute FIRST: under AQE the final (exchange-free) plan only exists
    // after the query ran.
    val pairs = spjJoin.collect().length
    val noExchange = !spjJoin.queryExecution.executedPlan.toString.contains("Exchange")
    println(s"== pairs = $pairs, zero-exchange plan = $noExchange")
    spark.conf.unset("spark.graft.preserveDataGrouping")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    // Round 13: runtime part pruning from a join (DSv2 dynamic filtering)
    // — the dim side's join keys prune the fact scan's partitions before
    // any task launches.
    println("== runtime filter: dim join keys prune the fact scan's parts:")
    val rtDir = java.nio.file.Files.createTempDirectory("demo_rtf_").toString
    val rtDf = spark.range(400).select((col("id") % 8).as("grp"),
      col("id").as("k"), (col("id") * 2.0).as("v"))
    val rtT = mergetree.ColumnarMergeTree.create(spark, rtDir, rtDf.schema,
      orderBy = Seq("k"), partitionBy = Some("grp"))
    rtT.insertBatch(rtDf)
    val rtDim = spark.range(8).select(col("id").as("dgrp"))
      .filter(col("dgrp") % 4 === 1) // grp 1 and 5
    val rtOut = spark.read.format("mergetree").load(rtDir)
      .join(org.apache.spark.sql.functions.broadcast(rtDim), col("grp") === col("dgrp")).count()
    val (rtPlanned, rtTotal) = sources.GenericMergeTreeScan.lastPruning.get()
    println(s"== joined rows = $rtOut, fact parts scanned = $rtPlanned/$rtTotal")

    // Round 13: Z-order clustering — one sort order, both dimensions prune.
    println("== z-order: morton_encode sort, rectangle prunes on x AND y:")
    functions.GraftFunctions.register(spark)
    val zc = spark.sql("SELECT morton_encode(5, 3) AS c, morton_decode(27) AS d").head()
    println(s"== morton_encode(5, 3) = ${zc.getLong(0)}, " +
      s"morton_decode(27) = ${zc.getSeq[Long](1).mkString("[", ",", "]")}")

    // Round 13: lightweight DELETE — O(manifest) row hiding, merge
    // materializes.
    println("== lightweight DELETE: rows hide with no part rewritten:")
    val lwDir = java.nio.file.Files.createTempDirectory("demo_lw_").toString
    val lwDf = spark.range(100).select(col("id").as("k"), (col("id") % 4).as("grp"))
    val lwT = mergetree.ColumnarMergeTree.create(spark, lwDir, lwDf.schema,
      orderBy = Seq("k"))
    lwT.insertBatch(lwDf)
    lwT.deleteLightweight(col("grp") === 1)
    val lwVisible = lwT.scan().count()
    lwT.optimizeFinal()
    println(s"== visible after DELETE = $lwVisible (of 100); " +
      s"after OPTIMIZE FINAL parts carry " +
      s"${lwT.parts.map(_.muts.size).sum} pending mutations, " +
      s"rows = ${lwT.scan().count()}")

    // Round 14: operational verbs — FREEZE (zero-copy backup), SYSTEM
    // STOP/START MERGES, system.mutations, MODIFY TTL.
    println("== FREEZE + mutations + STOP MERGES + MODIFY TTL:")
    spark.sql(s"SYSTEM STOP MERGES '$lwDir'").collect()
    lwT.deleteLightweight(col("grp") === 2)
    val pend = spark.sql(s"SELECT kind FROM mutations_meta('$lwDir')").count()
    val (bk, bparts) = lwT.freeze(Some("demo"))
    val bkRows = mergetree.ColumnarMergeTree.open(spark, bk).scan().count()
    spark.sql(s"SYSTEM START MERGES '$lwDir'").collect()
    spark.sql(s"ALTER TABLE '$lwDir' MODIFY TTL 'grp = 0'").collect()
    spark.sql(s"ALTER TABLE '$lwDir' MATERIALIZE TTL").collect()
    val afterTtl = mergetree.ColumnarMergeTree.open(spark, lwDir).scan().count()
    println(s"== pending mutations = $pend; backup '$bk' parts = $bparts " +
      s"rows = $bkRows (grp=2 stays hidden); rows after MODIFY+MATERIALIZE " +
      s"TTL = $afterTtl")

    // Round 15: the ClickHouse SELECT clauses — SAMPLE [BY] (prunable
    // deterministic slices), FROM t FINAL (per-statement collapse),
    // WITH FILL [INTERPOLATE] (gap filling), LIMIT n BY (top-n per key),
    // PREWHERE — all through the parser, over one catalog table.
    println("== SELECT clauses: SAMPLE / FINAL / WITH FILL / LIMIT BY / PREWHERE:")
    val clWh = java.nio.file.Files.createTempDirectory("demo_clauses_wh_").toString
    spark.conf.set("spark.sql.catalog.gdemo",
      classOf[sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdemo.warehouse", clWh)
    spark.sql("CREATE TABLE gdemo.ns.m (smp BIGINT, k BIGINT, ver BIGINT, v BIGINT) " +
      "USING mergetree OPTIONS (orderBy 'smp,k', mode 'replacing', " +
      "keys 'smp', version 'ver', sampleBy 'smp')")
    spark.range(400).selectExpr(
      "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16, 10) AS BIGINT) AS smp",
      "id AS k", "1L AS ver", "id AS v").createOrReplaceTempView("demo_cl_src")
    spark.sql("INSERT INTO gdemo.ns.m SELECT * FROM demo_cl_src")
    spark.sql("INSERT INTO gdemo.ns.m SELECT smp, k, 2L, v + 1000 FROM demo_cl_src")
    val clRaw = spark.sql("SELECT count(*) FROM gdemo.ns.m").collect().head.getLong(0)
    val clFin = spark.sql("SELECT count(*) FROM gdemo.ns.m FINAL").collect().head.getLong(0)
    val clS = spark.sql("SELECT count(*) FROM gdemo.ns.m FINAL SAMPLE 0.5")
      .collect().head.getLong(0)
    val clS2 = spark.sql("SELECT count(*) FROM gdemo.ns.m FINAL SAMPLE 0.5 OFFSET 0.5")
      .collect().head.getLong(0)
    val clFill = spark.sql("SELECT bucket, count(*) AS n FROM " +
        "(SELECT k % 977 AS bucket FROM gdemo.ns.m PREWHERE k < 100) " +
        "GROUP BY bucket ORDER BY bucket WITH FILL FROM 0 TO 120").count()
    val clTop = spark.sql("SELECT k % 4 AS g, k, v FROM gdemo.ns.m " +
        "ORDER BY g, v DESC, k LIMIT 2 BY g").count()
    println(s"== raw = $clRaw, FINAL = $clFin (latest versions); FINAL SAMPLE " +
      s"halves = $clS + $clS2 (disjoint, sum = FINAL); WITH FILL grid rows = " +
      s"$clFill; LIMIT 2 BY over 4 groups = $clTop rows")
    // Round 16: PREWHERE+WHERE AND-merge, SAMPLE n (absolute rows), FINAL
    // on a JOIN target, multi-column WITH FILL (cross-product grid).
    val clBoth = spark.sql("SELECT count(*) FROM gdemo.ns.m " +
        "PREWHERE k < 100 WHERE k % 2 = 0 OR k % 3 = 0").collect().head.getLong(0)
    val clAbs = spark.sql("SELECT count(*) FROM gdemo.ns.m SAMPLE 100")
      .collect().head.getLong(0)
    val clJoinFin = spark.sql("SELECT count(*) FROM gdemo.ns.m a " +
        "JOIN gdemo.ns.m FINAL ON a.smp = m.smp").collect().head.getLong(0)
    val clGrid = spark.sql("SELECT k % 3 AS g1, k % 2 AS g2, count(*) AS n " +
        "FROM gdemo.ns.m PREWHERE k < 2 GROUP BY g1, g2 " +
        "ORDER BY g1 WITH FILL FROM 0 TO 3, g2 WITH FILL FROM 0 TO 2").count()
    println(s"== PREWHERE+WHERE merged rows = $clBoth; SAMPLE 100 ~= " +
      s"$clAbs rows of 800; JOIN ... FINAL = $clJoinFin (raw x collapsed); " +
      s"multi-fill (3 x 2) grid rows = $clGrid")
    // Round 16, second wave: parametric aggregates (f(params)(args)),
    // ClickHouse aggregate/array-HOF name aliases, ClickHouse-native
    // CREATE TABLE DDL, and ALTER TABLE ADD/MATERIALIZE INDEX.
    println("== ClickHouse dialect, second wave: parametrics / aliases / DDL / ADD INDEX:")
    val para = spark.sql(
      """SELECT quantile(0.5)(v) AS p50, array_join(topK(2)(CAST(k % 3 AS STRING)), ',') AS top2,
        |  uniqUpTo(5)(CAST(k % 10 AS STRING)) AS usat,
        |  argMax(v, (k * 10 + ver) * 1000000.0 + v) AS am,
        |  CAST(arraySum(arrayMap(x -> x * 2, array(1, 2, 3))) AS BIGINT) AS s6
        |FROM gdemo.ns.m""".stripMargin).collect().head
    println(s"== quantile(0.5)(v) = ${para.get(0)}, topK(2) = ${para.get(1)}, " +
      s"uniqUpTo(5) over 10 distinct = ${para.get(2)} (saturated), " +
      s"argMax = ${para.get(3)}, arraySum(arrayMap(x -> x*2, [1,2,3])) = ${para.get(4)}")
    val chDir = java.nio.file.Files.createTempDirectory("demo_chddl_").toString
    spark.sql(
      s"""CREATE TABLE demo_ch_ddl (k UInt64, ver UInt64,
         |  cat LowCardinality(String), v Nullable(Float64))
         |ENGINE = ReplacingMergeTree(ver) ORDER BY k
         |SETTINGS index_granularity = 8192
         |LOCATION '$chDir/t'""".stripMargin)
    // two inserts split on cat → two parts with disjoint cat values, so
    // the retrofitted set sidecars have something to prune
    spark.sql("INSERT INTO demo_ch_ddl SELECT k, ver, CAST(k < 200 AS STRING), " +
      "CAST(v AS DOUBLE) FROM gdemo.ns.m WHERE k < 200")
    spark.sql("INSERT INTO demo_ch_ddl SELECT k, ver, CAST(k < 200 AS STRING), " +
      "CAST(v AS DOUBLE) FROM gdemo.ns.m WHERE k >= 200")
    val chFin = spark.sql("SELECT count(*) FROM demo_ch_ddl FINAL")
      .collect().head.getLong(0)
    spark.sql(s"ALTER TABLE '$chDir/t' ADD INDEX idx_cat cat TYPE set(100)")
    val chMat = spark.sql(s"ALTER TABLE '$chDir/t' MATERIALIZE INDEX cat")
      .collect().head.getLong(0)
    val chT = mergetree.ColumnarMergeTree.open(spark, s"$chDir/t")
    val chIn = chT.scanIn("cat", Seq("true")).count()
    println(s"== CH CREATE TABLE (ReplacingMergeTree DDL): FINAL rows = $chFin; " +
      s"ADD INDEX set + MATERIALIZE built $chMat sidecars; " +
      s"scanIn(cat='true') = $chIn rows reading ${chT.lastPruning._1}/${chT.lastPruning._2} parts")

    // Round 16, later waves: numbers()/DISTINCT ON/star mods/WITH macros/
    // collection literals/ternary/-State-Merge/INTO OUTFILE — the pasted
    // ClickHouse SELECT vocabulary end to end.
    println("== ClickHouse dialect, later waves: clauses / literals / combinators:")
    val don = spark.sql("SELECT DISTINCT ON (g) g, number FROM " +
        "(SELECT number % 5 AS g, number FROM numbers(40)) " +
        "ORDER BY g, number DESC LIMIT 3").count()
    val star = spark.sql("SELECT COLUMNS('^(k|v)$'), ver FROM " +
        "(SELECT * REPLACE (v * 2 AS v) FROM gdemo.ns.m) LIMIT 1").columns.toSeq
    val mac = spark.sql(
      """WITH 3 AS lim, number * 10 AS tens
        |SELECT CAST(sum(number % 2 = 0 ? tens : [1, 2][0]) AS BIGINT) AS s
        |FROM numbers(10) WHERE number < lim""".stripMargin)
      .collect().head.getLong(0)
    val sm = spark.sql(
      """SELECT CAST(uniqMerge(u) AS BIGINT) AS uq FROM
        |  (SELECT number % 4 AS g, uniqState(number % 50) AS u
        |   FROM numbers(200) GROUP BY number % 4)""".stripMargin)
      .collect().head.getLong(0)
    val ofPath = java.nio.file.Files.createTempDirectory("demo_of_").toString + "/x.csv"
    val ofN = spark.sql("SELECT number, bar(number, 0, 10, 5) AS b " +
        s"FROM numbers(4) INTO OUTFILE '$ofPath' FORMAT CSVWithNames")
      .collect().head.getLong(0)
    println(s"== DISTINCT ON picks = $don (3 after LIMIT); star mods columns = " +
      s"${star.mkString(",")}; WITH-macro ternary sum = $mac " +
      s"(0?10:1 + 1 + 2?20:1 over number<3); uniqMerge of 4 states = $sm; " +
      s"INTO OUTFILE wrote $ofN rows to one file = " +
      s"${java.nio.file.Files.exists(java.nio.file.Paths.get(ofPath))}")

    // Round 14: system.query_log — every action above landed in the
    // session's execution ring; read it back from pure SQL.
    println("== system.query_log: the session's own executions from SQL:")
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    while (sources.QueryLog.entries.isEmpty && System.nanoTime() < deadline)
      Thread.sleep(20) // the listener is async
    val ql = spark.sql(
      """SELECT status, count(*) AS n, cast(sum(duration_ms) AS bigint) AS ms
        |FROM query_log() GROUP BY status ORDER BY status""".stripMargin).collect()
    println(s"== query_log: " + ql.map(r =>
      s"${r.getString(0)}=${r.getLong(1)} (${r.getLong(2)} ms)").mkString(", "))
    spark.stop()
  }
}
