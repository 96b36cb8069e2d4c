package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Registry layout:
  *   Q1–Q8   storage semantics through the MergeTree table path
  *           (graft.queries.StorageQueries)
  *   Q9–Q22  analytic SQL surface over the testdata parquet
  *           (graft.queries.AnalyticQueries)
  */
object SparkEntry {

  private def registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    StorageQueries.all ++ AnalyticQueries.all ++ PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AnalyticQueries.q9Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (n, _, Some(s)) => n -> s }.toMap
}
