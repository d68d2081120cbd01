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

  /** Small-files compaction: coalesce an accumulation of per-batch
    * document directories (the `batch=<id>` landing dirs the
    * streaming gates emit — correct for exactly-once replay, wrong as
    * a long-term layout: a month of micro-batches is 100k+ tiny
    * files whose open/footer cost dominates any later scan) into the
    * canonical [[save]] layout. Read-then-rewrite is the right shape
    * at any scale — the read is one planning pass over the file
    * listing, the write re-clusters by language exactly like a fresh
    * save, and the swap into place is the caller's move (write to a
    * fresh dir, then repoint — same two-rename discipline as
    * IndexStore's swap). Idempotent: re-running compaction over the
    * same input produces the same output layout.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String): Unit =
    save(spark.read.parquet(inPath), outPath)
}
