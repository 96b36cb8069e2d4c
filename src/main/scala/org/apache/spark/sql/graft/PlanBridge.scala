package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge to `classic.Dataset.ofRows` (Spark 4 moved DataFrame
  * construction from a LogicalPlan behind the connect/classic split).
  * Same pattern and rationale as [[ColumnBridge]]: lives in the
  * `org.apache.spark.sql` namespace solely to satisfy the access
  * qualifier; no Spark internals are modified or shadowed. Used by
  * graft.plans to compose custom physical operators (e.g. the
  * sampling-free bounded range exchange) with stock DataFrame transforms.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
