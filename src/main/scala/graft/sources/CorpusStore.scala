package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Language-partitioned corpus persistence — the sink side of a
  * cleaning pipeline. Documents land under `lang=<code>/` directories
  * so the dominant downstream access pattern (per-language training
  * mixes, per-language quality sweeps) prunes partitions at planning
  * time instead of scanning the corpus; within a partition, rows are
  * source-clustered so parquet row-group min/max statistics prune
  * source-scoped reads too (the same two-level layout the term-
  * bucketed [[IndexStore]] uses for postings).
  *
  * At 100 TB the layout IS the optimization: a `lang = 'de'` read
  * touches only that directory, and repartitioning by the partition
  * column before the write keeps one file per language per shuffle
  * partition instead of |tasks| × |languages| small files.
  */
object CorpusStore {

  def save(docs: DataFrame, path: String): Unit =
    docs
      .repartition(col("lang"))
      .sortWithinPartitions("lang", "source", "doc_id")
      .write.mode("overwrite")
      .partitionBy("lang")
      .parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Partition-pruned single-language read. */
  def loadLang(spark: SparkSession, path: String, lang: String): DataFrame =
    load(spark, path).filter(col("lang") === lang)
}
