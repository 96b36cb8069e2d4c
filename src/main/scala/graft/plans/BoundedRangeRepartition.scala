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
  * `bounds(i-1) < k <= bounds(i)` in unsigned-byte order (the collation
  * Spark compares strings by), partition `bounds.size` the tail — i.e. a
  * genuine ascending range partitioning, reported as
  * [[RangePartitioning]] so downstream clustering requirements
  * (`groupBy(key, …)`) are satisfied with NO further exchange and a
  * partition-local sort restores global order.
  *
  * Bounds are real key strings (the table derives them from persisted
  * per-part key samples — see KeySample); they compare as UTF-8 bytes.
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
    // Ship raw bytes; rebuild UTF8String per task (cheap, avoids depending
    // on UTF8String's own serialization in the closure).
    val boundBytes: Array[Array[Byte]] =
      bounds.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
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
    val bs: Array[UTF8String] = boundBytes.map(UTF8String.fromBytes)
    org.apache.spark.sql.graft.ShuffleBridge.shuffleByPrecomputedId(
      rows.asInstanceOf[RDD[InternalRow]], out.length, n,
      row => {
        val key = row.getUTF8String(keyIdx)
        // first bound >= key → that bucket (keys equal to a bound go low,
        // like RangePartitioner's binary search)
        var lo = 0
        var hi = bs.length
        while (lo < hi) {
          val m = (lo + hi) >>> 1
          if (bs(m).compareTo(key) < 0) lo = m + 1 else hi = m
        }
        lo
      })
  }

  override protected def withNewChildInternal(newChild: SparkPlan): BoundedRangeRepartitionExec =
    copy(child = newChild)
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
