package graft

import graft.mergetree._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Insert-triggered materialized views (ClickHouse MV semantics): each
  * inserted batch is transformed by the MV SQL and landed in the target
  * table; with a Summing/Aggregating target the per-batch partial
  * aggregates collapse at merge/read — the AggregatingMergeTree-MV pattern.
  */
class MaterializedViewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def sourceDf = spark.range(200).select(
    col("id").as("k"),
    (col("id") % 4).cast("long").as("grp"),
    (col("id") % 10).cast("double").as("v"))

  private def newSource(): ColumnarMergeTree =
    ColumnarMergeTree.create(spark,
      Files.createTempDirectory("mv_src_").toString,
      sourceDf.schema, orderBy = Seq("k"))

  private val mvSql =
    s"""SELECT grp, count(*) AS n, sum(v) AS sum_v
       |FROM ${ColumnarMergeTree.MvInput} GROUP BY grp""".stripMargin

  private def summingTarget(src: ColumnarMergeTree,
                            populate: Boolean = false): ColumnarMergeTree =
    src.createMaterializedView("by_grp",
      Files.createTempDirectory("mv_tgt_").toString, mvSql,
      targetOrderBy = Seq("grp"),
      targetMode = MergeMode.Summing(Seq("grp"), Seq("n", "sum_v")),
      populate = populate)

  private def collapsed(t: ColumnarMergeTree): List[(Long, Long, Double)] =
    t.scan().orderBy("grp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList

  private val fullAnswer: List[(Long, Long, Double)] =
    sourceDf.groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .orderBy("grp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList

  test("each inserted batch lands one partial-aggregate part; target collapses to the full answer") {
    val src = newSource()
    val tgt = summingTarget(src)
    src.insertBatch(sourceDf.filter(col("k") < 100))
    src.insertBatch(sourceDf.filter(col("k") >= 100))
    assert(src.partCount == 2)
    assert(tgt.partCount == 2, "one partial-agg part per source batch")
    assert(collapsed(tgt) == fullAnswer)
    tgt.optimize() // collapse-in-merge agrees with merge-on-read
    assert(collapsed(tgt) == fullAnswer)
  }

  test("POPULATE backfills rows inserted before the MV existed") {
    val src = newSource()
    src.insertBatch(sourceDf.filter(col("k") < 100))
    val tgt = summingTarget(src, populate = true)
    src.insertBatch(sourceDf.filter(col("k") >= 100))
    assert(collapsed(tgt) == fullAnswer)
  }

  test("without POPULATE, pre-existing rows do not flow in (ClickHouse semantics)") {
    val src = newSource()
    src.insertBatch(sourceDf.filter(col("k") < 100))
    val tgt = summingTarget(src)
    src.insertBatch(sourceDf.filter(col("k") >= 100))
    val expect = sourceDf.filter(col("k") >= 100)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .orderBy("grp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(collapsed(tgt) == expect)
  }

  test("MV definitions persist: a reopened source instance still triggers the MV") {
    val src = newSource()
    val tgt = summingTarget(src)
    src.insertBatch(sourceDf.filter(col("k") < 100))
    val reopened = ColumnarMergeTree.open(spark, src.path)
    assert(reopened.materializedViews == Seq("by_grp"))
    reopened.insertBatch(sourceDf.filter(col("k") >= 100))
    // both instances' targets read the same storage
    reopened.materializedViewTarget("by_grp").refresh()
    assert(collapsed(reopened.materializedViewTarget("by_grp")) == fullAnswer)
    tgt.refresh()
    assert(collapsed(tgt) == fullAnswer)
  }

  test("dropMaterializedView detaches: later inserts stop flowing") {
    val src = newSource()
    val tgt = summingTarget(src)
    src.insertBatch(sourceDf.filter(col("k") < 100))
    src.dropMaterializedView("by_grp")
    assert(src.materializedViews.isEmpty)
    src.insertBatch(sourceDf.filter(col("k") >= 100))
    tgt.refresh()
    assert(tgt.totalRows == 4, "only the first batch's 4 partial rows")
  }

  test("POPULATE id fence: a batch takes exactly one route (snapshot XOR trigger)") {
    val src = newSource()
    src.insertBatch(sourceDf.filter(col("k") < 100))
    val tgt = summingTarget(src, populate = true)
    // The def is fenced at the next part id, stamped under the same lock
    // acquisition as the populate snapshot.
    val d = ColumnarMergeTree.MvRegistry.load(src.path).head
    val fence = d.sinceVersion.getOrElse(fail("def must carry an id fence"))
    assert(src.parts.forall(_.partId < fence),
      "pre-populate parts sit below the fence")
    // A part at/past the fence flows via the trigger (and only there)
    src.insertBatch(sourceDf.filter(col("k") >= 100))
    assert(src.parts.exists(_.partId >= fence))
    assert(collapsed(tgt) == fullAnswer)
    // A def fenced ABOVE a batch's part ids must NOT fire for it when the
    // def carries no snapshot set (legacy fence-only form): this is the
    // populate-covered route — simulate the interleaving by raising the
    // persisted fence past all future ids, then inserting.
    ColumnarMergeTree.MvRegistry.update(src.path)(
      _.map(x => x.copy(sinceVersion = Some(Long.MaxValue), populatedIds = None)))
    src.insertBatch(sourceDf.filter(col("k") < 100))
    tgt.refresh()
    assert(collapsed(tgt) == fullAnswer,
      "a batch below the def's fence must not double-flow via the trigger")
    // The IN-FLIGHT route (round 10): a part below the fence but ABSENT
    // from the def's recorded populate snapshot was being written while
    // the MV was created — it must STILL flow, or the batch is lost from
    // the target forever.
    ColumnarMergeTree.MvRegistry.update(src.path)(
      _.map(x => x.copy(sinceVersion = Some(Long.MaxValue),
        populatedIds = Some(src.parts.map(_.partId).toList))))
    val beforeInflight = { tgt.refresh(); tgt.totalRows }
    src.insertBatch(sourceDf.filter(col("k") >= 100))
    tgt.refresh()
    assert(tgt.totalRows > beforeInflight,
      "an in-flight (below-fence, not-in-snapshot) batch must trigger")
    // Legacy defs (no fence persisted) keep the old always-fire behavior
    ColumnarMergeTree.MvRegistry.update(src.path)(
      _.map(x => x.copy(sinceVersion = None)))
    src.insertBatch(sourceDf.filter(col("k") >= 100))
    tgt.refresh()
    assert(tgt.totalRows > 8, "fence-less def fires on every batch")
  }

  test("fence invariant under concurrent ingest: POPULATE mid-stream never double-counts or loses a batch") {
    // 4 writer threads race 3 batches each against a createMaterializedView
    // (populate = true) issued mid-stream. Whatever the interleaving, every
    // row must reach the target exactly once — via the populate snapshot
    // XOR the per-batch trigger. Before the id fence this failed both ways
    // (double-count when a batch landed between the registry commit and
    // the populate scan; lost when it landed after the scan with stale
    // defs). The assertion is interleaving-independent.
    val src = newSource()
    val piece = sourceDf.count() / 12 // 200 rows / (4 writers x 3 batches)
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        (0 until 3).foreach { b =>
          val lo = (t * 3 + b) * piece
          src.insertBatch(sourceDf.filter(col("k") >= lo && col("k") < lo + piece))
          Thread.sleep(5)
        }
      })
    }
    threads.foreach(_.start())
    Thread.sleep(20) // land somewhere in the middle of the stream
    val tgt = summingTarget(src, populate = true)
    threads.foreach(_.join())
    src.refresh(); tgt.refresh()
    // 12 equal slices of 200/12=16 rows — the 8-row remainder is never
    // inserted, so the expected answer aggregates exactly the slices.
    val inserted = sourceDf.filter(col("k") < 12 * piece)
    assert(src.totalRows == 12 * piece)
    val expect = inserted
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .orderBy("grp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(collapsed(tgt) == expect,
      "target must hold each batch exactly once (populate XOR trigger)")
  }

  test("drop-and-recreate with a new target path routes batches to the NEW target") {
    val src = newSource()
    val oldTgt = summingTarget(src)
    src.insertBatch(sourceDf.filter(col("k") < 100))
    src.dropMaterializedView("by_grp")
    val newTgt = summingTarget(src) // same name, fresh temp targetPath
    assert(newTgt.path != oldTgt.path)
    src.insertBatch(sourceDf.filter(col("k") >= 100))
    newTgt.refresh(); oldTgt.refresh()
    assert(newTgt.totalRows == 4,
      s"recreated MV's target must receive the batch: ${newTgt.totalRows}")
    assert(oldTgt.totalRows == 4,
      s"orphaned old target must stop receiving: ${oldTgt.totalRows}")
  }

  test("dropColumn refuses while a non-projection MV reads the column") {
    val src = newSource()
    summingTarget(src) // mvSql reads grp and v
    val e = intercept[IllegalArgumentException](src.dropColumn("v"))
    assert(e.getMessage.contains("by_grp"),
      s"error must name the referencing view: ${e.getMessage}")
    // after dropping the view the column drops fine
    src.dropMaterializedView("by_grp")
    val slim = src.dropColumn("v")
    assert(!slim.scan().columns.contains("v"))
  }

  test("chained MVs: the target's own MV fires on MV inserts") {
    val src = newSource()
    val tgt = summingTarget(src)
    // second hop: global totals over the per-grp partials
    val hop2 = tgt.createMaterializedView("totals",
      Files.createTempDirectory("mv_tgt2_").toString,
      s"SELECT CAST(0 AS BIGINT) AS one, sum(n) AS n FROM ${ColumnarMergeTree.MvInput} GROUP BY 1",
      targetOrderBy = Seq("one"),
      targetMode = MergeMode.Summing(Seq("one"), Seq("n")))
    src.insertBatch(sourceDf.filter(col("k") < 100))
    src.insertBatch(sourceDf.filter(col("k") >= 100))
    val total = hop2.scan().collect().map(r => r.getLong(1)).sum
    assert(total == 200L, s"chained MV must see all rows, got $total")
  }
}
