package graft.plans

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, RangePartitioning, SinglePartition}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.unsafe.types.UTF8String

/** Range exchange with DRIVER-SUPPLIED split bounds — no sampling job.
  *
  * `Dataset.repartitionByRange` builds its `RangePartitioner` by SAMPLING
  * the child RDD, which re-executes the whole upstream plan once before the
  * real pass: on a parquet-backed scan that is a second full read of every
  * surviving row group (measured ~40% of the MergeTree range-query wall
  * clock at 1M rows; at 100 TB it is a second 100 TB scan). A storage
  * engine already knows the key distribution from its own metadata — the
  * sparse index's per-row-group key bounds — so the bounds can be computed
  * driver-side from footer stats (zero data I/O) and handed to the
  * exchange directly.
  *
  * Semantics: partition `i` receives keys `k` with
  * `bounds(i-1) < k <= bounds(i)` in the KEY TYPE's own order (strings as
  * unsigned UTF-8 bytes — Spark's collation — integrals/date/timestamp as
  * longs, float/double as doubles; see
  * [[BoundedRangeRepartitionExec.supports]]), nulls first, partition
  * `bounds.size` the tail — i.e. a genuine ascending range partitioning,
  * reported as [[RangePartitioning]] so downstream clustering
  * requirements (`groupBy(key, …)`) are satisfied with NO further
  * exchange and a partition-local sort restores global order.
  *
  * Bounds travel as CANONICAL STRINGS of real key values (the tables
  * derive them from persisted per-part key samples or row-group lead
  * stats — see KeySample) and decode per the key column's type.
  *
  * Rows are shuffled as `UnsafeRow` (Externalizable writes the raw bytes —
  * no object-graph serialization) keyed by the precomputed partition id.
  */
case class BoundedRangeRepartition(
    keyName: String,
    bounds: Seq[String],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): BoundedRangeRepartition =
    copy(child = newChild)
}

case class BoundedRangeRepartitionExec(
    keyName: String,
    bounds: Array[String],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  private def keyAttr: Attribute = child.output.find(_.name == keyName).getOrElse(
    throw new IllegalArgumentException(
      s"BoundedRangeRepartition: no column '$keyName' in ${child.output.map(_.name)}"))

  override def outputPartitioning: Partitioning =
    if (bounds.isEmpty) SinglePartition
    else RangePartitioning(Seq(SortOrder(keyAttr, Ascending)), bounds.length + 1)

  override protected def doExecute(): RDD[InternalRow] = {
    val out = child.output
    val keyIdx = out.indexWhere(_.name == keyName)
    val n = bounds.length + 1
    // The id function runs inside the native exchange write path (see
    // ShuffleBridge): UnsafeRowSerializer relocates, so the writer
    // serializes each record on insert and the reused codegen row buffer
    // needs no defensive copy.
    val rows = child.execute().mapPartitions({ iter =>
      lazy val proj = UnsafeProjection.create(out, out)
      iter.map {
        case ur: org.apache.spark.sql.catalyst.expressions.UnsafeRow => ur
        case other => proj(other)
      }
    }, preservesPartitioning = true)
    org.apache.spark.sql.graft.ShuffleBridge.shuffleByPrecomputedId(
      rows.asInstanceOf[RDD[InternalRow]], out.length, n,
      BoundedRangeRepartitionExec.idFunction(keyAttr.dataType, bounds, keyIdx))
  }

  override protected def withNewChildInternal(newChild: SparkPlan): BoundedRangeRepartitionExec =
    copy(child = newChild)
}

object BoundedRangeRepartitionExec {

  /** Data types the exchange can route: the bound list travels as
    * CANONICAL STRINGS (a TreeNode-friendly, explain-readable encoding)
    * and decodes per type here.
    */
  def supports(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.StringType => true
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.DateType | org.apache.spark.sql.types.TimestampType => true
    case org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType => true
    case _ => false
  }

  /** Map-side partition-id function: binary search over the decoded
    * bounds in the KEY TYPE's own order (keys equal to a bound go low,
    * like RangePartitioner). Nulls route to partition 0 — NULLS FIRST,
    * Spark's default ascending order. The type dispatch happens ONCE
    * here; the returned closure captures the decoded bounds (UTF8String
    * and primitives are closure-serializable) and runs a tight loop.
    */
  private[plans] def idFunction(dt: org.apache.spark.sql.types.DataType,
      bounds: Array[String], keyIdx: Int): InternalRow => Int = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType =>
        val b: Array[UTF8String] = bounds.map(UTF8String.fromString)
        row =>
          if (row.isNullAt(keyIdx)) 0
          else {
            val key = row.getUTF8String(keyIdx)
            var lo = 0
            var hi = b.length
            while (lo < hi) {
              val m = (lo + hi) >>> 1
              if (b(m).compareTo(key) < 0) lo = m + 1 else hi = m
            }
            lo
          }
      case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType =>
        val b = bounds.map(_.toLong)
        val get: (InternalRow, Int) => Long = dt match {
          case ByteType               => (r, i) => r.getByte(i).toLong
          case ShortType              => (r, i) => r.getShort(i).toLong
          case IntegerType | DateType => (r, i) => r.getInt(i).toLong
          case _                      => (r, i) => r.getLong(i)
        }
        row =>
          if (row.isNullAt(keyIdx)) 0
          else {
            val key = get(row, keyIdx)
            var lo = 0
            var hi = b.length
            while (lo < hi) {
              val m = (lo + hi) >>> 1
              if (b(m) < key) lo = m + 1 else hi = m
            }
            lo
          }
      case FloatType | DoubleType =>
        val b = bounds.map(_.toDouble)
        val isFloat = dt == FloatType
        row =>
          if (row.isNullAt(keyIdx)) 0
          else {
            val key = if (isFloat) row.getFloat(keyIdx).toDouble else row.getDouble(keyIdx)
            var lo = 0
            var hi = b.length
            while (lo < hi) {
              val m = (lo + hi) >>> 1
              if (java.lang.Double.compare(b(m), key) < 0) lo = m + 1 else hi = m
            }
            lo
          }
      case other => throw new IllegalArgumentException(
        s"BoundedRangeRepartition: unsupported key type $other")
    }
  }
}

object BoundedRangeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BoundedRangeRepartition(key, bounds, child) =>
      BoundedRangeRepartitionExec(key, bounds.toArray, planLater(child)) :: Nil
    case _ => Nil
  }

  /** Idempotent imperative registration — the table engine installs the
    * strategy at `create`/`open` so the exchange works in sessions without
    * `spark.sql.extensions` configured.
    */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(BoundedRangeStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ BoundedRangeStrategy
  }
}
