package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory; each inventory row is one entry in `queries` plus (where
  * SQL-expressible) a DuckDB oracle in `oracleSql`. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Knowledge.kbPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ AnalyticsExt.queries ++ Sketches.queries ++
      Knowledge.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracle ++ AnalyticsExt.oracle ++ Sketches.oracle ++
      Knowledge.oracle ++ TextAnalysis.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ Multimodal.oracle
}
