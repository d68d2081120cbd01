package graft.operators

import graft.functions.{HashFns, TextFns}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-assembly operators a training-data pipeline runs after
  * cleaning/dedup: deterministic splits, stratified sampling, and the
  * corpus statistics that land on a dataset card. All are narrow maps
  * or single partial-agg shuffles — scan-speed at 100 TB — and all are
  * content-deterministic (hash-based, never rand()), so reruns and the
  * oracle agree bit-for-bit.
  */
object Pipeline {

  /** Deterministic 90/10 train/holdout assignment by rolling-hash of
    * the doc id — stable under reruns, resharding, and engine moves
    * (the property rand(seed)-based splits lack).
    */
  def trainTestSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        (HashFns.rollingHash(col("doc_id").cast("string")) % 100).as("h"))
      .select(col("doc_id"),
        when(col("h") < 90, "train").otherwise("holdout").as("split"))
      .orderBy("doc_id")

  /** Stratified deterministic sample: ~25% of documents per language,
    * selected by hash threshold within each stratum.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(HashFns.rollingHash(col("doc_id").cast("string")) % 100 < 25)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** Corpus statistics per (source, lang): docs, tokens, chars —
    * the dataset-card rollup. One partial-agg shuffle.
    */
  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("lang"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_chr"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chr")).as("n_chars"))
      .orderBy("source", "lang")

  // ---- wiring ----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "train_test_split" -> trainTestSplit,
    "stratified_sample" -> stratifiedSample,
    "corpus_stats" -> corpusStats)

  private def hashPct(e: String): String =
    s"${OracleSql.roll(e, HashFns.P)} % 100"

  val oracles: Map[String, String] = Map(
    "train_test_split" ->
      s"""SELECT doc_id,
         |  CASE WHEN ${hashPct("doc_id::VARCHAR")} < 90 THEN 'train' ELSE 'holdout' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    "stratified_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${hashPct("doc_id::VARCHAR")} < 25 ORDER BY doc_id""".stripMargin,
    "corpus_stats" ->
      """SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars
        |FROM documents GROUP BY source, lang ORDER BY source, lang""".stripMargin)
}
