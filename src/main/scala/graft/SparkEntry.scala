package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Index.invertedIndex(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Index.queries ++ operators.Analytics.queries ++
      operators.TextAnalysis.queries ++ operators.Dedup.queries ++
      operators.Similarity.queries ++ operators.Multimodal.queries ++
      operators.Pipeline.queries ++ operators.Query.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    operators.Index.oracles ++ operators.Analytics.oracles ++
      operators.TextAnalysis.oracles ++ operators.Dedup.oracles ++
      operators.Similarity.oracles ++ operators.Multimodal.oracles ++
      operators.Pipeline.oracles ++ operators.Query.oracles
}
