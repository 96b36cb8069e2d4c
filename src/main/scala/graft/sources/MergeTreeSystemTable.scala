package graft.sources

import graft.mergetree.ColumnarMergeTree
import graft.mergetree.ColumnarMergeTree.{GManifest, SnapshotLog}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.nio.file.{Files, Paths}

/** ClickHouse's `system.*` observability tables as a SQL face: the
  * `system 'parts'|'snapshots'` read option on the mergetree format serves
  * manifest metadata as a relation — `partsDf`/`snapshots` for users who
  * address the engine from SQL. One row per part (or snapshot), computed
  * driver-side from the manifest (LocalScan: zero executors, zero data
  * I/O — the same "metadata-only introspection" contract as
  * ColumnarMergeTree.stats, O24).
  *
  *   SELECT partition, sum(bytes) FROM mergetree.`dir` (system 'parts') …
  */
class MergeTreeSystemTable(path: String, kind: String) extends Table with SupportsRead {
  import MergeTreeSystemTable.{schemaFor, utf8}

  private val tableSchema: StructType = schemaFor(kind)

  override def name(): String = s"mergetree:$path!system.$kind"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = tableSchema
        override def rows(): Array[InternalRow] =
          MergeTreeSystemTable.rowsFor(path, kind)
        override def description(): String = s"mergetree-system $path $kind"
      }
    }
}

/** Row/schema builders shared by the DSv2 `system '<kind>'` relations above
  * and the SQL table functions (`uniq_meta('t')` etc., GraftExtensions) —
  * ONE implementation of every metadata fold.
  */
object MergeTreeSystemTable {

  def schemaFor(kind: String): StructType = kind match {
    case "parts" => StructType.fromDDL(
      "part_id BIGINT, partition STRING, rows BIGINT, granules BIGINT, " +
        "bytes BIGINT, min_key STRING, max_key STRING, created_ms BIGINT")
    case "snapshots" => StructType.fromDDL(
      "seq BIGINT, parts BIGINT, rows BIGINT, readable BOOLEAN")
    case "uniq" => StructType.fromDDL(
      "column STRING, approx_distinct BIGINT, covered_parts BIGINT, parts BIGINT")
    case "topk" => StructType.fromDDL(
      "column STRING, rank BIGINT, term STRING, cnt BIGINT, " +
        "covered_parts BIGINT, parts BIGINT")
    case "quantiles" => StructType.fromDDL(
      "column STRING, p50 DOUBLE, p90 DOUBLE, p99 DOUBLE, " +
        "covered_parts BIGINT, parts BIGINT")
    case "columns" => StructType.fromDDL(
      "position INT, name STRING, type STRING, is_order_by BOOLEAN, " +
        "is_partition BOOLEAN, indexes STRING")
    case "mutations" => StructType.fromDDL(
      "part_id BIGINT, ord INT, kind STRING, predicate STRING, sets STRING")
    case "create" => StructType.fromDDL("create_table_query STRING")
    case other => throw new IllegalArgumentException(
      s"mergetree: unknown system table '$other' " +
        "(expected parts | snapshots | columns | mutations | uniq | topk | quantiles | create)")
  }

  def rowsFor(path: String, kind: String): Array[InternalRow] = kind match {
    case "parts"     => partRows(path)
    case "uniq"      => uniqRows(path)
    case "topk"      => topkRows(path)
    case "quantiles" => quantileRows(path)
    case "columns"   => columnRows(path)
    case "mutations" => mutationRows(path)
    // ClickHouse system.tables.create_table_query: the table's OWN DDL in
    // the ClickHouse dialect (ChCreateTable.showCreate — rewrite's inverse)
    case "create"    => Array[InternalRow](
      new GenericInternalRow(Array[Any](utf8(ChCreateTable.showCreate(path)))))
    case _           => snapshotRows(path)
  }

  /** `system 'mutations'` (ClickHouse system.mutations): one row per
    * PENDING lightweight mutation per live part, in application order —
    * the operational view of "what will the next merge materialize" (and
    * how close each part is to the per-part tag cap). Empty == no
    * mutation debt.
    */
  private def mutationRows(path: String): Array[InternalRow] = {
    val m = ColumnarMergeTree.GManifest.load(path).getOrElse(
      throw new IllegalArgumentException(s"no mergetree manifest at $path"))
    m.parts.toArray.flatMap { p =>
      p.muts.zipWithIndex.map { case (mut, i) =>
        val sets = mut.set.map(_.map(kv => kv.mkString(" = ")).mkString(", ")).orNull
        val kind = mut.kind match { // stored short, presented ClickHouse-style
          case "del" => "delete"
          case "upd" => "update"
          case other => other
        }
        new GenericInternalRow(Array[Any](p.partId, i, utf8(kind),
          utf8(mut.cond), utf8(sets))): InternalRow
      }
    }
  }

  /** `system 'columns'` (ClickHouse system.columns): one row per schema
    * column with its ORDER BY / PARTITION BY membership and every
    * skip-index / sketch family it participates in — the first question
    * about an unfamiliar table ("what can this table prune on?"),
    * answered from the tabledef alone.
    */
  private def columnRows(path: String): Array[InternalRow] = {
    val d = ColumnarMergeTree.TableDef.load(path).getOrElse(
      throw new IllegalArgumentException(s"no table definition at $path"))
    val schema = StructType.fromDDL(d.schemaDdl)
    val families: Seq[(String, Option[List[String]])] = Seq(
      "bloom" -> d.bloomFilterColumns, "minmax" -> d.minmaxColumns,
      "tokenbf" -> d.tokenBloomColumns, "ngrambf" -> d.ngramBloomColumns,
      "set" -> d.setIndexColumns, "hll" -> d.hllColumns,
      "topk" -> d.topKColumns, "quantiles" -> d.quantileColumns)
    schema.fields.zipWithIndex.map { case (f, i) =>
      val inIdx = families.collect {
        case (n, Some(cs)) if cs.contains(f.name) => n
      }
      new GenericInternalRow(Array[Any](i, utf8(f.name),
        utf8(f.dataType.simpleString), d.orderBy.contains(f.name),
        d.partitionBy.contains(f.name),
        utf8(inIdx.mkString(",")))): InternalRow
    }
  }

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  private def partRows(path: String): Array[InternalRow] =
    GManifest.load(path).map(_.parts).getOrElse(Nil).map { p =>
      new GenericInternalRow(Array[Any](p.partId, utf8(p.partition.orNull),
        p.rowCount, p.granuleCount, p.diskSize, utf8(p.minKey), utf8(p.maxKey),
        p.creationTime)): InternalRow
    }.toArray

  /** A snapshot is `readable` while every part it lists is still on disk —
    * live or retired-within-grace (the time-travel horizon, observable).
    */
  private def snapshotRows(path: String): Array[InternalRow] =
    SnapshotLog.list(path).flatMap(seq => SnapshotLog.load(path, seq).map { m =>
      val readable = m.parts.forall(p =>
        Files.isDirectory(Paths.get(path, p.dir)))
      new GenericInternalRow(Array[Any](
        seq, m.parts.size.toLong, m.parts.map(_.rowCount).sum, readable)): InternalRow
    }).toArray

  /** `system 'uniq'`: the per-part HLL sidecars folded into table-wide
    * distinct estimates, one row per declared hllColumn. Strictly
    * metadata-only (LocalScan discipline: no Spark job may launch), so
    * parts written before the sketch was declared contribute nothing —
    * `covered_parts` vs `parts` makes partial coverage explicit; the API
    * (`approxDistinct`) is the face that scans stragglers on the fly.
    */
  private def uniqRows(path: String): Array[InternalRow] = {
    val cols = ColumnarMergeTree.TableDef.load(path)
      .flatMap(_.hllColumns).getOrElse(Nil)
    val parts = GManifest.load(path).map(_.parts).getOrElse(Nil)
    cols.map { c =>
      val regs = graft.functions.HllSketch.empty
      var covered = 0L
      parts.foreach { p =>
        val f = Paths.get(path, p.dir, s"_hll_$c")
        if (Files.exists(f)) {
          graft.functions.HllSketch.mergeInto(regs, Files.readAllBytes(f))
          covered += 1
        }
      }
      new GenericInternalRow(Array[Any](utf8(c),
        graft.functions.HllSketch.estimate(regs), covered,
        parts.size.toLong)): InternalRow
    }.toArray
  }

  /** `system 'topk'`: the per-part SpaceSaving sidecars merged into
    * table-wide top-50 heavy hitters per declared column. Same
    * metadata-only discipline (and coverage columns) as `uniq`.
    */
  private def topkRows(path: String): Array[InternalRow] = {
    import org.json4s.DefaultFormats
    import org.json4s.jackson.JsonMethods
    implicit val fmts: org.json4s.Formats = DefaultFormats
    val cols = ColumnarMergeTree.TableDef.load(path)
      .flatMap(_.topKColumns).getOrElse(Nil)
    val parts = GManifest.load(path).map(_.parts).getOrElse(Nil)
    cols.flatMap { c =>
      val agg = new graft.functions.TopKAggregator(
        50, ColumnarMergeTree.TopKSidecarCapacity)
      var state = agg.zero
      var covered = 0L
      parts.foreach { p =>
        val f = Paths.get(path, p.dir, s"_topk_$c")
        if (Files.exists(f)) {
          val m = JsonMethods.parse(new String(Files.readAllBytes(f), "UTF-8"))
            .extract[Map[String, Long]]
          state = agg.merge(state, graft.functions.TopKState(m))
          covered += 1
        }
      }
      agg.finish(state).zipWithIndex.map { case (tc, i) =>
        new GenericInternalRow(Array[Any](utf8(c), (i + 1).toLong,
          utf8(tc.term), tc.cnt, covered, parts.size.toLong)): InternalRow
      }
    }.toArray
  }

  /** `system 'quantiles'`: the per-part knot sidecars pooled into
    * table-wide p50/p90/p99 per declared column. Same metadata-only
    * discipline (and coverage columns) as `uniq`/`topk`.
    */
  private def quantileRows(path: String): Array[InternalRow] = {
    import org.json4s.DefaultFormats
    import org.json4s.jackson.JsonMethods
    implicit val fmts: org.json4s.Formats = DefaultFormats
    val cols = ColumnarMergeTree.TableDef.load(path)
      .flatMap(_.quantileColumns).getOrElse(Nil)
    val parts = GManifest.load(path).map(_.parts).getOrElse(Nil)
    cols.map { c =>
      val pooled = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      var covered = 0L
      parts.foreach { p =>
        val f = Paths.get(path, p.dir, s"_quant_$c")
        if (Files.exists(f)) {
          val j = JsonMethods.parse(new String(Files.readAllBytes(f), "UTF-8"))
          val n = (j \ "n").extract[Long]
          val qs = (j \ "qs").extract[Seq[Double]]
          if (n > 0 && qs.nonEmpty) pooled ++= qs.map(v => v -> n.toDouble / qs.length)
          covered += 1
        }
      }
      def q(p: Double): Any =
        if (pooled.isEmpty) null
        else {
          val sorted = pooled.sortBy(_._1)
          val target = p * sorted.iterator.map(_._2).sum
          var cum = 0.0
          var i = 0
          while (i < sorted.length - 1 && cum + sorted(i)._2 < target) {
            cum += sorted(i)._2; i += 1
          }
          sorted(i)._1
        }
      new GenericInternalRow(Array[Any](utf8(c), q(0.5), q(0.9), q(0.99),
        covered, parts.size.toLong)): InternalRow
    }.toArray
  }
}
