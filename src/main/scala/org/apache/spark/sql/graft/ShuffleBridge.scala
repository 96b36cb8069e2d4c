package org.apache.spark.sql.graft

import org.apache.spark.{PartitionIdPassthrough, ShuffleDependency}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.{ShuffledRowRDD, UnsafeRowSerializer}
import org.apache.spark.sql.execution.metric.SQLShuffleReadMetricsReporter
import org.apache.spark.util.MutablePair

/** Bridge to Spark's native row-shuffle machinery (`ShuffledRowRDD`,
  * `PartitionIdPassthrough` — both `private[spark]`/`private[sql]`). Same
  * pattern and rationale as [[ColumnBridge]]/[[PlanBridge]]: lives in the
  * `org.apache.spark.sql` namespace solely to satisfy the access
  * qualifiers; nothing is modified or shadowed.
  *
  * `shuffleByPrecomputedId` is `ShuffleExchangeExec.prepareShuffleDependency`
  * minus the partitioner construction: the caller supplies the partition-id
  * function (e.g. binary search over driver-computed range bounds — no
  * sampling job), rows travel as `UnsafeRow` bytes through
  * `UnsafeRowSerializer` (which supports relocation, so the writer
  * serializes each record on insert — zero per-row copies, the exact
  * native-exchange write path), and the read side yields rows directly
  * (no pair materialization). A generic `RDD.partitionBy` detour measured
  * ~15% slower end-to-end from the per-row `Tuple2`/boxing/copy traffic.
  */
object ShuffleBridge {

  def shuffleByPrecomputedId(
      child: RDD[InternalRow],
      numFields: Int,
      numPartitions: Int,
      idOf: InternalRow => Int): RDD[InternalRow] = {
    val withIds: RDD[Product2[Int, InternalRow]] =
      child.mapPartitions({ iter =>
        val pair = new MutablePair[Int, InternalRow]()
        iter.map(row => pair.update(idOf(row), row))
      }, preservesPartitioning = true)
    val dep = new ShuffleDependency[Int, InternalRow, InternalRow](
      withIds,
      new PartitionIdPassthrough(numPartitions),
      new UnsafeRowSerializer(numFields))
    new ShuffledRowRDD(
      dep, SQLShuffleReadMetricsReporter.createShuffleReadMetrics(child.sparkContext))
  }
}
