package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The batch-keyed tombstone discipline SHARED by every content store
  * (r14): a GDPR/DMCA takedown must purge a document EVERYWHERE its
  * content lives — postings ([[IndexStore]]), raw text
  * ([[CorpusStore]]), embeddings (the streaming embed store) — so the
  * deletion contract is one implementation, not one per store. A
  * store's tombstones live in an underscore-prefixed `_tombstones`
  * dir INSIDE it (invisible to parquet data listings; travels with
  * the store through the rename swaps):
  *
  *  - [[append]] — the one-shot operational form: each call appends
  *    one O(|ids|) parquet batch, however large the store;
  *  - [[landBatch]] — the streaming form: a micro-batch's ids land as
  *    ONE `src_batch=<id>` subdir that a replay REPLACES
  *    (exactly-once at batch granularity), stamped with an
  *    `_applied_upto_<id>` horizon marker. A landing BELOW the
  *    horizon FAILS LOUDLY: batch ids within one query only move
  *    forward, so a lower id means a fresh-checkpoint restart over
  *    outstanding landings — overwriting an earlier batch's dir would
  *    silently un-delete its takedowns. An id EQUAL to the horizon is
  *    the legitimate replay of the last uncommitted batch.
  *  - [[setOf]] — the accumulated distinct key set readers anti-join
  *    out; a file-less tree (crash between mkdir and file commit)
  *    reads as None instead of bricking every load with a
  *    schema-inference error.
  *
  *  Folding tombstones away for real is each store's own compaction
  *  move: the rewrite reads through the store's (anti-joined) reader
  *  and the `_tombstones` dir simply does not travel into the new
  *  layout. After a fold the horizon is gone WITH the landings — a
  *  fresh checkpoint over a just-folded store is legitimate because
  *  there is nothing left to clobber.
  */
object Tombstones {
  private val Dir = "_tombstones"
  private val AppliedUpToPrefix = "_applied_upto_"

  private def dirOf(path: String) = new org.apache.hadoop.fs.Path(path, Dir)

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True when `dir` holds at least one visible data FILE at any
    * depth (horizon markers and dot-prefixed leftovers don't count).
    */
  private def hasDataFilesUnder(fs: org.apache.hadoop.fs.FileSystem,
                                dir: org.apache.hadoop.fs.Path): Boolean = {
    if (!fs.exists(dir)) return false
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val n = it.next().getPath.getName
      if (!n.startsWith(".") && !n.startsWith("_")) return true
    }
    false
  }

  /** Whether the store at `path` carries any tombstone DATA. */
  def hasAny(spark: SparkSession, path: String): Boolean = {
    val p = dirOf(path)
    hasDataFilesUnder(fsOf(spark, p), p)
  }

  /** How many batch-keyed landings the store carries — the streaming
    * takedown loop's fold trigger. One driver-side listing, no job.
    */
  def batchCount(spark: SparkSession, path: String): Int = {
    val p = dirOf(path)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(s =>
      s.isDirectory && s.getPath.getName.startsWith("src_batch="))
  }

  /** The tombstone set's applied horizon: the highest batch id whose
    * [[landBatch]] committed. Markers are the source of truth; a store
    * written before the marker scheme falls back to its max
    * `src_batch=` dir id (those ARE batch ids). -1 when no landing is
    * outstanding — including right after a fold removed the dir.
    */
  def horizon(spark: SparkSession, path: String): Long = {
    val p = dirOf(path)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return -1L
    val names = fs.listStatus(p).map(_.getPath.getName)
    val marks = names.filter(_.startsWith(AppliedUpToPrefix))
      .map(_.stripPrefix(AppliedUpToPrefix).toLong)
    if (marks.nonEmpty) marks.max
    else names.filter(_.startsWith("src_batch="))
      .map(_.stripPrefix("src_batch=").toLong).maxOption.getOrElse(-1L)
  }

  /** One-shot tombstone append (see object doc). `key` names the
    * store's content key column (doc_id, vec_id, ...).
    */
  def append(spark: SparkSession, path: String, ids: Seq[Long],
             key: String = "doc_id"): Unit = {
    require(ids.nonEmpty, "append needs at least one id")
    import spark.implicits._
    ids.toDF(key).coalesce(1).write.mode("append")
      .parquet(dirOf(path).toString)
  }

  /** Batch-keyed streaming landing (see object doc). `ids` must carry
    * the store's key column; an empty batch lands nothing and
    * advances no horizon. Returns whether a landing happened.
    */
  def landBatch(ids: DataFrame, path: String, srcBatch: Long,
                key: String = "doc_id"): Boolean = {
    val spark = ids.sparkSession
    val upto = horizon(spark, path)
    require(srcBatch >= upto,
      s"takedown batch $srcBatch is below the applied horizon $upto of " +
        s"store $path: the stream was restarted with a fresh checkpoint " +
        "over outstanding tombstone landings — overwriting batch " +
        s"$srcBatch's earlier landing would silently un-delete its " +
        "takedowns. Restart from the original checkpoint, or fold the " +
        "store before re-pointing a fresh stream at it")
    val dels = ids.select(col(key)).distinct()
    if (dels.isEmpty) return false
    val tomb = dirOf(path)
    dels.coalesce(1).write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(tomb, s"src_batch=$srcBatch").toString)
    // stamp the horizon AFTER the landing (a crash in between replays
    // the same batch, which the >= guard admits and the overwrite
    // makes idempotent), then drop older markers — subsumed by the max
    val fs = fsOf(spark, tomb)
    fs.create(new org.apache.hadoop.fs.Path(tomb, AppliedUpToPrefix + srcBatch),
      true).close()
    fs.listStatus(tomb).map(_.getPath)
      .filter(p => p.getName.startsWith(AppliedUpToPrefix) &&
        p.getName.stripPrefix(AppliedUpToPrefix).toLong < srcBatch)
      .foreach(fs.delete(_, false))
    true
  }

  /** The store's accumulated tombstone set (distinct keys across all
    * landings); None when nothing was ever deleted — or when the tree
    * holds no data file yet (crash leftover). The recursive read
    * skips partition inference so [[append]] files at the dir root
    * and [[landBatch]] `src_batch=` subdirs mix freely.
    */
  def setOf(spark: SparkSession, path: String,
            key: String = "doc_id"): Option[DataFrame] =
    if (hasAny(spark, path))
      Some(spark.read.option("recursiveFileLookup", "true")
        .parquet(dirOf(path).toString)
        .withColumnRenamed("doc_id", key) // pre-r14 landings stored doc_id
        .select(col(key)).distinct())
    else None
}
