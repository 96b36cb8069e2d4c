package graft.sources

import graft.mergetree.{KeyOrder, Manifest, MergeTreeTable}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicReference
import scala.jdk.CollectionConverters._

/** DataSource V2 connector for MergeTree tables (SURVEY §7 Phase 3):
  * `spark.read.format("mergetree").load(tablePath)` — the SQL-addressable
  * face of the reference's public query surface
  * (/root/reference/src/merge_tree.h:47-71).
  *
  * Pushdown, mirroring the reference's two pruning layers:
  *   - part pruning (O8, src/part.cpp:201-203): key-range filters are
  *     compared against manifest min/max ON THE DRIVER before any file is
  *     listed — at 100 TB whole directories are skipped, not row groups;
  *   - granule pruning (O7, src/sparse_index.cpp:17-27): the same range is
  *     compiled to a parquet FilterPredicate, so parquet-mr skips row groups
  *     ( == granules, row groups are capped at granuleSize rows) via footer
  *     min/max statistics.
  *   - column pruning (SupportsPushDownRequiredColumns): readers materialize
  *     only the requested columns — the per-column `.bin` selective read of
  *     the reference (src/serialization.cpp:8-29) for free via parquet.
  *
  * All range filters are ALSO left in the Spark plan (pruning here is
  * block-level and conservative), so correctness never depends on the
  * pushdown. Reads see the durable table state — flushed parts, not another
  * process's memtable — exactly like reopening the table (O23).
  *
  * Scan is row-based (parquet-mr GroupReadSupport): simple and
  * codegen-friendly downstream; the hot analytic paths go through
  * MergeTreeTable.query which uses Spark's vectorized parquet scan.
  */
class MergeTreeTableProvider extends TableProvider with DataSourceRegister {
  import graft.mergetree.ColumnarMergeTree.TableDef

  override def shortName(): String = "mergetree"

  /** CREATE TABLE with explicit columns (the DDL face that declares
    * orderBy/partitionBy/ttl) hands the user schema to getTable; reads of
    * existing tables still self-describe via inferSchema.
    */
  override def supportsExternalMetadata(): Boolean = true

  /** A path with a persisted tabledef.json (written by
    * ColumnarMergeTree.create) is a schema-generic table and self-describes;
    * anything else is the fixed-schema KV compatibility table.
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Option(options.get("path"))
      .map(MergeTreeTableProvider.localPath)
      .flatMap(TableDef.load)
      .map(d => StructType.fromDDL(d.schemaDdl))
      .getOrElse(MergeTreeTable.schema)

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = MergeTreeTableProvider.localPath(Option(opts.get("path"))
      .getOrElse(throw new IllegalArgumentException("mergetree: path required")))
    val finalRead = opts.getBoolean("final", false)
    // `snapshot 'N'` read option: time travel — plan against the manifest
    // committed at snapshot N (SQL face of ColumnarMergeTree.scanAt).
    val snapshotSeq = Option(opts.get("snapshot")).map(_.toLong)
    // `sample 'num/den'` / `sample 'N rows'` read option: ClickHouse
    // SELECT … SAMPLE, fractional and absolute forms (SQL faces of
    // ColumnarMergeTree.sampleScan / sampleScanRows). The rows form
    // resolves to a fraction against the CURRENT manifest row count —
    // metadata only, re-resolved per statement because the catalog
    // replays getTable on every statement touching the table.
    val sampleFrac = Option(opts.get("sample"))
      .map(MergeTreeTableProvider.parseSampleOption(_, path))
    // `system 'parts'|'snapshots'` read option: the observability tables
    // (ClickHouse system.parts) as SQL relations — manifest metadata only,
    // zero data I/O, served driver-locally.
    val system = Option(opts.get("system"))
    if (system.isDefined) return new MergeTreeSystemTable(path, system.get)
    TableDef.load(path) match {
      case Some(d) =>
        // mv options attach here too (idempotently): the target LOCATION
        // may already hold a tabledef (API-born target, or a re-run CREATE
        // after a catalog DROP — the dir persists), and a CREATE that
        // silently skipped registration would leave the MV dead.
        MergeTreeTableProvider.attachMvIfRequested(path, opts)
        MergeTreeTableProvider.attachProjectionsIfRequested(path, opts)
        new GenericMergeTreeV2Table(path, StructType.fromDDL(d.schemaDdl),
          d.orderBy, finalRead, snapshotSeq, sampleFrac)
      case None if opts.containsKey("orderBy") =>
        // SQL DDL face of ColumnarMergeTree.create: `CREATE TABLE t (cols…)
        // USING mergetree OPTIONS (orderBy 'a,b' [, mode/keys/version/sums/
        // sign] [, partitionBy 'expr'] [, ttl 'expr']) LOCATION dir`
        // persists the same tabledef.json the Scala API writes, so DDL-born
        // tables are indistinguishable from API-born ones — PARTITION BY and
        // TTL included (a ClickHouse user's first CREATE TABLE declares both).
        require(schema.nonEmpty,
          "mergetree: CREATE TABLE with orderBy needs explicit columns")
        val d = MergeTreeTableProvider.tableDefFromOptions(schema, opts)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
        TableDef.store(path, d)
        MergeTreeTableProvider.attachMvIfRequested(path, opts)
        MergeTreeTableProvider.attachProjectionsIfRequested(path, opts)
        new GenericMergeTreeV2Table(path, schema, d.orderBy, finalRead, snapshotSeq,
          sampleFrac)
      case None => new MergeTreeV2Table(path)
    }
  }
}

object MergeTreeTableProvider {
  import graft.mergetree.ColumnarMergeTree.TableDef
  import graft.mergetree.MergeMode

  /** Catalog LOCATIONs arrive as `file:` URIs; the engine works on local
    * filesystem paths — normalize once at the provider boundary.
    */
  private[sources] def localPath(p: String): String =
    if (p.startsWith("file:")) java.nio.file.Paths.get(java.net.URI.create(p)).toString
    else p

  /** Parse the `sample` read option — fractional `'n/d'` or absolute
    * `'N rows'` (resolved to a fraction against the CURRENT manifest row
    * count: metadata only, re-resolved per statement). ONE parser for the
    * path face's getTable and the catalog face's per-read options, so the
    * two can never drift.
    */
  private[sources] def parseSampleOption(s: String, path: String): (Long, Long) = {
    val rowsForm = "(?i)^\\s*(\\d+)\\s+rows\\s*$".r
    s match {
      case rowsForm(n) =>
        val total = graft.mergetree.ColumnarMergeTree.GManifest.load(path)
          .map(_.parts.map(_.rowCount).sum).getOrElse(0L)
        val want = n.toLong
        if (total == 0L || want >= total) (1L, 1L)
        else {
          // BigInt: want * den overflows Long past ~8.8e12 rows.
          val den = 1L << 20
          (math.max(1L, (BigInt(want) * den / total).toLong), den)
        }
      case _ => s.split('/') match {
        case Array(n, d) if n.trim.forall(_.isDigit) && d.trim.forall(_.isDigit) =>
          (n.trim.toLong, d.trim.toLong)
        case _ => throw new IllegalArgumentException(
          s"mergetree: sample must be 'num/den' (e.g. '1/4') or 'N rows', got '$s'")
      }
    }
  }

  /** Parse the CREATE TABLE options into the persisted table definition.
    * Column lists are comma-separated; mode defaults to plain.
    */
  private[sources] def tableDefFromOptions(
      schema: StructType, opts: CaseInsensitiveStringMap): TableDef = {
    def list(key: String): List[String] =
      Option(opts.get(key)).map(_.split(",").map(_.trim).filter(_.nonEmpty).toList)
        .getOrElse(Nil)
    val orderBy = list("orderBy")
    require(orderBy.nonEmpty && orderBy.forall(schema.fieldNames.contains),
      s"mergetree: orderBy ${orderBy.mkString(",")} must name table columns")
    val mode = Option(opts.get("mode")).map(_.toLowerCase).getOrElse("plain") match {
      case "plain"     => MergeMode.Plain
      case "replacing" => MergeMode.Replacing(list("keys"), opts.get("version"))
      case "summing"   => MergeMode.Summing(list("keys"), list("sums"))
      case "collapsing" =>
        MergeMode.Collapsing(list("keys"), opts.get("sign"), opts.get("version"))
      case "aggregating" =>
        // `aggs 'col:fn,col:fn'` — fn in sum|min|max (validated by the table)
        val aggs = list("aggs").map { s =>
          s.split(":", 2) match {
            case Array(c, f) => (c.trim, f.trim.toLowerCase)
            case _ => throw new IllegalArgumentException(
              s"mergetree: bad aggs entry '$s' (want col:fn)")
          }
        }
        MergeMode.Aggregating(list("keys"), aggs)
      case other => throw new IllegalArgumentException(
        s"mergetree: unknown mode '$other' (plain|replacing|summing|collapsing|aggregating)")
    }
    val sampleBy = Option(opts.get("sampleBy")).map(_.trim).filter(_.nonEmpty)
    sampleBy.foreach(c => require(schema.fieldNames.contains(c),
      s"mergetree: sampleBy '$c' must name a table column"))
    TableDef(schema.toDDL, orderBy, TableDef.encodeMode(mode),
      Option(opts.get("partitionBy")), Option(opts.get("ttl")),
      Option(opts.get("gcGraceSeconds")).map(_.toInt),
      Some(list("bloomFilterColumns")).filter(_.nonEmpty),
      Some(list("minmaxColumns")).filter(_.nonEmpty),
      Some(list("tokenBloomColumns")).filter(_.nonEmpty),
      Some(list("ngramBloomColumns")).filter(_.nonEmpty),
      Some(list("hllColumns")).filter(_.nonEmpty),
      Some(list("topKColumns")).filter(_.nonEmpty),
      Some(list("quantileColumns")).filter(_.nonEmpty),
      Some(list("setIndexColumns")).filter(_.nonEmpty),
      sampleBy)
  }

  /** CREATE MATERIALIZED VIEW, the DDL-options way: a CREATE TABLE carrying
    * `mvSource 'dir'` + `mvSql 'SELECT … FROM __INPUT__ …'` both creates
    * the target table AND registers the MV definition on the SOURCE table's
    * mvdefs.json — from then on every insert into the source (SQL, API, or
    * streaming) lands its transform here. `mvName` defaults to the target
    * directory name.
    */
  private[sources] def attachMvIfRequested(
      targetPath: String, opts: CaseInsensitiveStringMap): Unit =
    Option(opts.get("mvSource")).foreach { src0 =>
      import graft.mergetree.ColumnarMergeTree.{GManifest, MvDef, MvRegistry, MvInput}
      val src = localPath(src0)
      val sql = Option(opts.get("mvSql")).getOrElse(throw new IllegalArgumentException(
        "mergetree: mvSource requires mvSql"))
      require(sql.contains(MvInput), s"mergetree: mvSql must read FROM $MvInput")
      val name = Option(opts.get("mvName")).getOrElse(
        java.nio.file.Paths.get(targetPath).getFileName.toString)
      graft.mergetree.ColumnarMergeTree.requireNoMvCycle(src, targetPath)
      // Idempotent: getTable runs on EVERY statement touching the catalog
      // table (the catalog replays the CREATE options), so re-seeing the
      // identical definition is a no-op (compared field-wise — the
      // sinceVersion fence stamped at first attach must not make the
      // replay look like a conflicting def); a DIFFERENT def under the
      // same name is a real conflict. No populate here, so the fence just
      // pins "batches from now on" explicitly.
      MvRegistry.update(src) { cur =>
        cur.find(_.name == name) match {
          case Some(d) if d.sameDefinition(MvDef(name, targetPath, sql)) => cur
          case Some(_) => throw new IllegalArgumentException(
            s"mergetree: materialized view '$name' already exists on $src with a different definition")
          case None =>
            val man = GManifest.load(src).getOrElse(GManifest(0L, Nil))
            cur :+ MvDef(name, targetPath, sql, Some(GManifest.nextIdOf(man)))
        }
      }
    }

  /** DDL face of ALTER TABLE … ADD PROJECTION: `projections 'name:col1,col2
    * [; name2:…]'` as a CREATE TABLE option declares (and backfills)
    * alternate sort orders. Idempotent like attachMvIfRequested: the catalog
    * replays CREATE options on every statement, so an identical declaration
    * is a no-op and a conflicting one fails loudly.
    */
  private[sources] def attachProjectionsIfRequested(
      path: String, opts: CaseInsensitiveStringMap): Unit =
    Option(opts.get("projections")).foreach { spec =>
      val t = graft.mergetree.ColumnarMergeTree.open(
        org.apache.spark.sql.SparkSession.active, path)
      val existing = t.projections.toMap
      spec.split(';').map(_.trim).filter(_.nonEmpty).foreach { one =>
        one.split(':') match {
          case Array(name0, cols0) =>
            val name = name0.trim
            val cols = cols0.split(',').map(_.trim).filter(_.nonEmpty).toSeq
            existing.get(name) match {
              case Some(ob) if ob == cols => // identical replay — no-op
              case Some(ob) => throw new IllegalArgumentException(
                s"mergetree: projection '$name' already exists on $path " +
                  s"with ORDER BY ${ob.mkString(",")}")
              case None => t.addProjection(name, cols)
            }
          case _ => throw new IllegalArgumentException(
            s"mergetree: projections must be 'name:col1,col2[; …]', got '$one'")
        }
      }
    }
}

class MergeTreeV2Table(path: String) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"mergetree:$path"
  override def schema(): StructType = MergeTreeTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MergeTreeScanBuilder(path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(info.schema().fieldNames.toSeq == MergeTreeTable.schema.fieldNames.toSeq,
      s"mergetree write requires columns ${MergeTreeTable.schema.fieldNames.mkString(",")}, " +
        s"got ${info.schema().fieldNames.mkString(",")}")
    new MergeTreeWriteBuilder(path)
  }
}

class MergeTreeScanBuilder(path: String)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = MergeTreeTable.schema
  private var lo: Option[String] = None
  private var hi: Option[String] = None
  private var pushed: Array[Filter] = Array.empty

  /** Extract an inclusive key range from catalyst filters; conservative —
    * anything not understood is simply not used for pruning. Bounds combine
    * in UTF-8 byte order (KeyOrder) — Spark's string comparison semantics —
    * so tightening two bounds can never widen past either.
    */
  private def collect(f: Filter): Boolean = f match {
    case EqualTo("key", v: String) =>
      lo = Some(lo.fold(v)(KeyOrder.max(v, _)))
      hi = Some(hi.fold(v)(KeyOrder.min(v, _))); true
    case GreaterThanOrEqual("key", v: String) =>
      lo = Some(lo.fold(v)(KeyOrder.max(v, _))); true
    case GreaterThan("key", v: String) => // inclusive bound is conservative
      lo = Some(lo.fold(v)(KeyOrder.max(v, _))); true
    case LessThanOrEqual("key", v: String) =>
      hi = Some(hi.fold(v)(KeyOrder.min(v, _))); true
    case LessThan("key", v: String) =>
      hi = Some(hi.fold(v)(KeyOrder.min(v, _))); true
    case And(a, b) =>
      val ca = collect(a); val cb = collect(b); ca || cb
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(collect)
    filters // block-level pruning only: Spark re-evaluates every filter
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new MergeTreeScan(path, required, lo, hi)
}

/** Test/diagnostic instrumentation: parts planned vs total at the last
  * planInputPartitions call (driver-side only).
  */
object MergeTreeScan {
  val lastPruning: AtomicReference[(Int, Int)] = new AtomicReference((0, 0))
}

class MergeTreeScan(
    path: String,
    required: StructType,
    lo: Option[String],
    hi: Option[String])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Manifest-derived statistics for the pruned scan, so Catalyst can size
    * joins (broadcast vs shuffle) over mergetree tables without listing
    * files — the metadata-only stats path of O24.
    */
  override def estimateStatistics(): Statistics = {
    val manifest = Manifest.load(path).getOrElse(Manifest(0L, Nil))
    val surviving = (lo, hi) match {
      case (None, None) => manifest.parts
      case _ => manifest.parts.filter(p =>
        p.overlapsRange(lo.getOrElse(p.minKey), hi.getOrElse(p.maxKey)))
    }
    val bytes = surviving.map(_.diskSize).sum
    val rows = surviving.map(_.rowCount).sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
    }
  }

  override def description(): String = {
    val range = (lo, hi) match {
      case (None, None) => "full"
      case _            => s"[${lo.getOrElse("-inf")}, ${hi.getOrElse("+inf")}]"
    }
    s"mergetree $path range=$range cols=${required.fieldNames.mkString(",")}"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val manifest = Manifest.load(path).getOrElse(Manifest(0L, Nil))
    val live = manifest.parts
    // O8: driver-side part pruning from manifest min/max.
    val surviving = (lo, hi) match {
      case (None, None) => live
      case _ => live.filter(p =>
        p.overlapsRange(lo.getOrElse(p.minKey), hi.getOrElse(p.maxKey)))
    }
    MergeTreeScan.lastPruning.set((surviving.size, live.size))
    surviving.flatMap { p =>
      val dir = Paths.get(path, s"part_${p.partId}")
      if (!Files.isDirectory(dir)) Nil
      else {
        val s = Files.list(dir)
        try s.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(f => MergeTreePartition(f.toString): InputPartition).toList
        finally s.close()
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MergeTreeReaderFactory(required, lo, hi)
}

case class MergeTreePartition(file: String) extends InputPartition

/** One storage partition VALUE's whole file set as a single split, carrying
  * its typed key for Spark's storage-partitioned join (HasPartitionKey).
  */
case class MergeTreeGroupedPartition(
    files: Array[String],
    key: org.apache.spark.sql.catalyst.InternalRow)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): org.apache.spark.sql.catalyst.InternalRow = key
}

class MergeTreeReaderFactory(
    required: StructType,
    lo: Option[String],
    hi: Option[String])
    extends PartitionReaderFactory {

  private def rangePredicate: Option[FilterPredicate] = {
    val loP = lo.map(v => FilterApi.gtEq(FilterApi.binaryColumn("key"), Binary.fromString(v)))
    val hiP = hi.map(v => FilterApi.ltEq(FilterApi.binaryColumn("key"), Binary.fromString(v)))
    (loP, hiP) match {
      case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
      case (a, b)             => a.orElse(b)
    }
  }

  /** Vectorized scan (Spark's own parquet reader → ColumnarBatch →
    * whole-stage codegen); the row reader below survives as the
    * no-batch-support fallback path.
    */
  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new ParquetColumnarReader(
      partition.asInstanceOf[MergeTreePartition].file, required, rangePredicate)

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MergeTreeRowReader(
      partition.asInstanceOf[MergeTreePartition].file, required, lo, hi)
}

/** Row reader over one parquet file via parquet-mr, with the key range
  * compiled to a FilterPredicate (row-group pruning == O7 granule pruning).
  */
class MergeTreeRowReader(
    file: String,
    required: StructType,
    lo: Option[String],
    hi: Option[String])
    extends PartitionReader[InternalRow] {

  private val conf = new Configuration()
  // Column pruning: request only the needed fields (parquet projection).
  // An empty projection (count(*)) still needs one column to drive the
  // record iterator — use the cheap fixed-width timestamp.
  private val fields: Array[String] =
    if (required.fields.isEmpty) Array("timestamp") else required.fieldNames
  locally {
    // Repetition (required/optional) must match the file exactly, and it
    // varies with how the part was written (encoder-derived schemas mark
    // strings optional) — so project by copying field types from the footer.
    val fileSchema = {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new HPath(file), conf))
      try r.getFooter.getFileMetaData.getSchema finally r.close()
    }
    val projection = new org.apache.parquet.schema.MessageType(
      fileSchema.getName,
      fields.map(f => fileSchema.getType(fileSchema.getFieldIndex(f))): _*)
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
  }

  private val filter: Option[FilterPredicate] = {
    val loP = lo.map(v => FilterApi.gtEq(FilterApi.binaryColumn("key"), Binary.fromString(v)))
    val hiP = hi.map(v => FilterApi.ltEq(FilterApi.binaryColumn("key"), Binary.fromString(v)))
    (loP, hiP) match {
      case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
      case (Some(a), None)    => Some(a)
      case (None, Some(b))    => Some(b)
      case (None, None)       => None
    }
  }

  private val reader: ParquetReader[Group] = {
    val b = ParquetReader
      .builder[Group](new GroupReadSupport(), new HPath(file))
      .withConf(conf)
    filter.fold(b)(p => b.withFilter(FilterCompat.get(p))).build()
  }

  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(required.length)
    var i = 0
    while (i < required.length) {
      val f = required.fields(i)
      if (f.dataType == LongType) row.setLong(i, current.getLong(f.name, 0))
      else row.update(i, UTF8String.fromString(current.getString(f.name, 0)))
      i += 1
    }
    row
  }

  override def close(): Unit = reader.close()
}

// --------------------------------------------------------------- write path

/** DSv2 write: `df.write.format("mergetree").mode("append").save(path)`
  * appends ONE new part per job — the SQL-addressable twin of
  * MergeTreeTable.insertBatch.
  *
  * RequiresDistributionAndOrdering makes Spark range-partition and locally
  * sort the incoming rows on (key, timestamp) BEFORE the write (exactly what
  * the programmatic part write does), so every task emits one sorted parquet
  * file and the part's footer statistics stay pruning-sharp. Tasks stage
  * files under a job-unique staging dir; commit moves them into
  * `part_<id>/`, reads footer stats, and appends to the manifest atomically
  * (tmp + rename) — abort just deletes the staging dir, so failures never
  * corrupt the table.
  */
class MergeTreeWriteBuilder(path: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder {
  import org.apache.spark.sql.connector.write._

  override def build(): Write = new Write with RequiresDistributionAndOrdering {
    import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}

    private val sortOrder: Array[SortOrder] = Array(
      Expressions.sort(Expressions.column("key"), SortDirection.ASCENDING),
      Expressions.sort(Expressions.column("timestamp"), SortDirection.ASCENDING))

    override def requiredDistribution(): Distribution = Distributions.ordered(sortOrder)
    override def requiredOrdering(): Array[SortOrder] = sortOrder

    override def toBatch: BatchWrite = new MergeTreeBatchWrite(path)
  }
}

case class MergeTreeTaskCommit(stagedFile: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

class MergeTreeBatchWrite(path: String)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  private val stagingDir = s"$path/.staging_${java.util.UUID.randomUUID().toString}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MergeTreeWriterFactory(stagingDir)

  /** Commit = promote the staging dir to `part_<id>` + append to the
    * manifest, both inside Manifest.register's per-path lock: id allocation,
    * the directory-name claim, and the manifest append are one atomic step,
    * so a live MergeTreeTable instance writing the same table concurrently
    * can neither reuse our part id nor clobber our manifest entry (and vice
    * versa — its stores are read-merge under the same lock).
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case MergeTreeTaskCommit(f) if f.nonEmpty => f }
    val staging = Paths.get(stagingDir)
    if (files.isEmpty) { MergeTreeTable.deleteRecursively(staging); return }
    // Promote ONLY the files of COMMITTED tasks: a task attempt that died
    // after writing (before its abort could clean up) or a speculative
    // duplicate leaves extra parquet files in the staging dir — moving
    // the whole dir would register the orphan's rows as table data and
    // double-count the batch.
    val committed = files.map(f => Paths.get(f).getFileName.toString).toSet
    val s = Files.list(staging)
    try s.iterator().asScala
      .filter(f => f.toString.endsWith(".parquet") &&
        !committed(f.getFileName.toString))
      .foreach(Files.deleteIfExists(_))
    finally s.close()
    val stats = graft.mergetree.PartStats.readDir(new Configuration(), stagingDir)
    val size = MergeTreeTable.dirSize(staging)
    val now = System.currentTimeMillis()
    Manifest.register(path, staging, append = true) { partId =>
      graft.mergetree.PartMetadata(
        partId = partId,
        minKey = stats.minKey, maxKey = stats.maxKey,
        minTimestamp = stats.minTs, maxTimestamp = stats.maxTs,
        rowCount = stats.rows, granuleCount = stats.rowGroups,
        diskSize = size,
        creationTime = now)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    MergeTreeTable.deleteRecursively(Paths.get(stagingDir))
}

class MergeTreeWriterFactory(stagingDir: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new MergeTreeDataWriter(stagingDir, partitionId, taskId)
}

/** Task-side parquet writer (parquet-mr example API, 8192-row row groups
  * via the granule cap). Rows arrive already sorted by (key, timestamp).
  */
class MergeTreeDataWriter(stagingDir: String, partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
  import org.apache.parquet.schema.MessageTypeParser

  private val schema = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  required binary key (UTF8);
      |  required binary value (UTF8);
      |  required int64 timestamp;
      |}""".stripMargin)
  private val file = s"$stagingDir/part-$partitionId-$taskId.parquet"
  private val conf = new Configuration()
  locally {
    Files.createDirectories(Paths.get(stagingDir))
    GroupWriteSupport.setSchema(schema, conf)
  }
  private val writer = ExampleParquetWriter.builder(new HPath(file))
    .withConf(conf)
    .withRowGroupRowCountLimit(8192) // granule cap, src/granule.h:10
    .build()
  private val factory = new SimpleGroupFactory(schema)
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    g.append("key", row.getUTF8String(0).toString)
    g.append("value", row.getUTF8String(1).toString)
    g.append("timestamp", row.getLong(2))
    writer.write(g)
    rows += 1
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    writer.close()
    if (rows == 0L) { Files.deleteIfExists(Paths.get(file)); MergeTreeTaskCommit("") }
    else MergeTreeTaskCommit(file)
  }

  override def abort(): Unit = {
    writer.close()
    Files.deleteIfExists(Paths.get(file))
  }

  override def close(): Unit = ()
}
