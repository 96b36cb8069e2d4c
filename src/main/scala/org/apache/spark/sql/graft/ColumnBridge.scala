package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ⇄ Expression converters (Spark
  * 4 moved Column construction behind the connect/classic split). Lives in
  * the `org.apache.spark.sql` namespace solely to satisfy the access
  * qualifier — the standard connector-library pattern; no Spark internals
  * are modified or shadowed. Used by graft.functions to wrap native
  * codegen expressions (e.g. the dictionary map probe) as Columns without
  * routing through a UDF.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
