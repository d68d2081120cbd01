package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hash-bucketed TABLE layout — pre-shuffled persistence for the
  * joins a warehouse runs every day. Writing both sides of a
  * recurring join bucketed (and sorted) on the join key stores each
  * side already partitioned by that key's hash, so every later join
  * of the two tables plans WITHOUT a shuffle exchange: bucket i joins
  * bucket i, executor-local. This is the table-granularity sibling of
  * [[IndexStore]]'s term buckets (the reference pins the same idea at
  * job granularity with its hash-on-word partitioner +
  * num-reducers knob, App.scala:126–282), and the layout that turns a
  * nightly 100 TB fact-fact join from the cluster's biggest shuffle
  * into a map-side zip of bucket pairs.
  *
  * Mechanics: Spark persists bucketing metadata in the session
  * catalog (`bucketBy` requires `saveAsTable`; the explicit `path`
  * option keeps the data in a caller-owned directory rather than the
  * warehouse root). Both sides must agree on the bucket COUNT — same
  * contract the index store enforces with its `_nbuckets` marker —
  * or Spark falls back to shuffling the mismatched side only.
  * SourcesSpec asserts the exchange-free plan shape.
  */
object BucketedStore {

  /** Write `df` as a bucketed+sorted parquet table rooted at `path`,
    * registered as `table` in the session catalog (replacing any
    * previous registration). Sorting within buckets defaults to the
    * bucket key, keeping row groups key-clustered for min/max
    * pruning.
    */
  def save(df: DataFrame, table: String, path: String, key: String,
      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val sorts = if (sortCols.nonEmpty) sortCols else Seq(key)
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }

  /** The registered bucketed table (bucket metadata intact — reading
    * the parquet path directly would lose it and reintroduce the
    * shuffle).
    */
  def load(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
