package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Namespace bridge (same technique as [[PlanBridge]]): `sessionUUID` is
  * `private[sql]`, but it is the only stable per-session identity Spark
  * exposes — the query log keys entries by it so one session's history is
  * distinguishable from another's in a shared driver.
  */
object SessionBridge {
  def uuid(s: SparkSession): String = s match {
    case c: org.apache.spark.sql.classic.SparkSession => c.sessionUUID
    case other => s"cls-${System.identityHashCode(other)}" // non-classic impls: stable-enough fallback
  }
}
