package graft.sources

import graft.mergetree.ColumnarMergeTree
import graft.mergetree.ColumnarMergeTree.GMut

import org.apache.parquet.filter2.predicate.FilterPredicate
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{BindReferences, Expression, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import scala.jdk.CollectionConverters._

/** One executor-side step of a compiled lightweight-mutation program: a
  * row-level keep-predicate (a pending DELETE) or a row rewrite (a pending
  * UPDATE's staged assignments, or the final projection back to the scan's
  * required columns). Expressions are RESOLVED AND BOUND on the driver —
  * executors only `eval`, never parse or analyze.
  */
private[sources] sealed trait MutStage extends Serializable
private[sources] final case class MutFilter(cond: Expression) extends MutStage
private[sources] final case class MutProject(exprs: Seq[Expression]) extends MutStage

/** Compiles a part's pending lightweight mutations (ClickHouse
  * `DELETE FROM` masks / patch-part UPDATEs, stored as resolved SQL in the
  * manifest) into a serializable row program the DSv2 scan applies ITSELF.
  *
  * This makes the connector's reads correct WITHOUT the analyzer-rule
  * rewrite: `format("mergetree")` standalone, snapshot time-travel of a
  * tagged manifest, and detach→attach round trips of tagged parts all hide
  * deleted rows because the muts travel with the part metadata the scan
  * plans from — the `_lw_deletes` marker file is an advisory hint, never a
  * correctness gate.
  *
  * The compiler reuses [[ColumnarMergeTree.applyMuts]] — the SAME
  * DataFrame-level implementation the engine face reads through — on an
  * empty probe relation, then lowers the analyzed Project/Filter chain to
  * bound expressions. One compilation per DISTINCT pending-mutation list
  * per scan (almost always one), never per file or per row.
  */
private[sources] object MutProgram {

  /** Column names referenced by the muts' stored SQL (for read-schema
    * widening: a DELETE's predicate may test columns the query pruned).
    */
  private def referencedCols(spark: SparkSession, muts: Seq[GMut]): Seq[String] = {
    def refs(sql: String): Seq[String] =
      spark.sessionState.sqlParser.parseExpression(sql).collect {
        case a: UnresolvedAttribute => a.nameParts.head
      }
    muts.flatMap { m =>
      refs(m.cond) ++ m.set.getOrElse(Nil).flatMap {
        case List(_, e) => refs(e)
        case _          => Nil
      }
    }
  }

  /** (read schema, bound stages): rows read with the widened schema, run
    * through the stages in order, come out as the scan's `required` rows
    * with every pending mutation applied. Driver-side only.
    */
  def compile(spark: SparkSession, tableSchema: StructType,
      required: StructType, muts: Seq[GMut]): (StructType, Seq[MutStage]) = {
    if (muts.isEmpty)
      return (required, Nil)
    val wanted = {
      val referenced = referencedCols(spark, muts).map(_.toLowerCase).toSet
      val kept = required.fieldNames.map(_.toLowerCase).toSet
      tableSchema.fields.filter(f =>
        kept(f.name.toLowerCase) || referenced(f.name.toLowerCase))
    }
    val readSchema = StructType(wanted)
    val probe = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], readSchema)
    val out = ColumnarMergeTree.applyMuts(probe, muts)
      .select(required.fieldNames.map(col).toIndexedSeq: _*)
    // The ANALYZED plan (not optimized: ConvertToLocalRelation would
    // collapse the empty probe and lose the expression chain).
    (readSchema, toStages(out.queryExecution.analyzed))
  }

  /** Lower a linear Project/Filter chain to bound stages, leaf-first. */
  private def toStages(plan: LogicalPlan): List[MutStage] = plan match {
    case p: Project =>
      toStages(p.child) :+ MutProject(p.projectList.map(e =>
        BindReferences.bindReference[Expression](e, p.child.output)))
    case f: Filter =>
      toStages(f.child) :+ MutFilter(
        BindReferences.bindReference(f.condition, f.child.output))
    case a: SubqueryAlias => toStages(a.child)
    case _: LeafNode => Nil
    case other => throw new IllegalStateException(
      "lightweight-mutation compile produced an unexpected operator: " +
        other.nodeName)
  }
}

/** One parquet file of a part that may carry pending lightweight mutations.
  * `stages` empty = untagged part (still row-based: Spark forbids mixing
  * columnar and row partitions in one scan, so the presence of ANY tagged
  * part makes the whole scan row-based until a merge materializes).
  */
case class MergeTreeMutPartition(
    file: String,
    readSchema: StructType,
    stages: Seq[MutStage]) extends InputPartition

/** Row reader applying a compiled mutation program: the vectorized parquet
  * reader underneath (row-group skip intact — the pushed range predicate is
  * on the leading ORDER BY key, which lightweight UPDATE refuses to patch),
  * interpreted expression eval per row on top. Interpreted, not codegen:
  * this path only exists while mutations are pending, and the next merge
  * returns the table to the columnar fast path.
  */
private[sources] class MutRowReader(
    file: String,
    readSchema: StructType,
    filter: Option[FilterPredicate],
    stages: Seq[MutStage],
    outSchema: StructType)
    extends PartitionReader[InternalRow] {

  private val inner = new ParquetColumnarReader(file, readSchema, filter)
  private val toUnsafe = UnsafeProjection.create(outSchema.fields.map(_.dataType))
  private var rows: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _
  private var done = false

  /** null = row deleted by a pending predicate. */
  private def applyStages(in: InternalRow): InternalRow = {
    var row = in
    val it = stages.iterator
    while (it.hasNext) it.next() match {
      case MutFilter(cond) =>
        if (cond.eval(row) != true) return null
      case MutProject(exprs) =>
        val arr = new Array[Any](exprs.length)
        var j = 0
        while (j < exprs.length) { arr(j) = exprs(j).eval(row); j += 1 }
        row = new GenericInternalRow(arr)
    }
    row
  }

  override def next(): Boolean = {
    while (!done) {
      if (rows.hasNext) {
        val out = applyStages(rows.next())
        if (out != null) { current = toUnsafe(out); return true }
      } else if (inner.next()) {
        rows = inner.get().rowIterator().asScala
      } else {
        done = true
      }
    }
    false
  }

  override def get(): InternalRow = current

  override def close(): Unit = inner.close()
}
