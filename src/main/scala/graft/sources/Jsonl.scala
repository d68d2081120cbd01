package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines corpus reader — the interchange format crawl/pipeline
  * corpora actually arrive in (one JSON object per line).
  *
  * The schema is EXPLICIT, never inferred: schema inference is a full
  * extra pass over the data (prohibitive at 100 TB) and silently
  * widens types on dirty input. Lines that fail to parse land in a
  * `_corrupt` column instead of failing the job — [[readDocuments]]
  * drops them, [[readCorrupt]] surfaces them for a quarantine sink
  * (at scale you always route bad lines somewhere inspectable).
  * JSONL is splittable like the TSV source: executors read byte
  * ranges, parsing is narrow per-line compute.
  */
object Jsonl {

  /** The documents-table schema ([[Tables.documents]] contract). */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt", StringType)))

  private def raw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(DocumentsSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** (doc_id, text, lang, source) — parse-clean rows only. */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    raw(spark, path)
      .filter(col("_corrupt").isNull && col("doc_id").isNotNull)
      .drop("_corrupt")

  /** The quarantine stream: raw text of every line that failed to
    * parse (or parsed without the mandatory doc_id).
    */
  def readCorrupt(spark: SparkSession, path: String): DataFrame =
    raw(spark, path)
      .filter(col("_corrupt").isNotNull || col("doc_id").isNull)
      .select(coalesce(col("_corrupt"), to_json(struct(col("doc_id"),
        col("text"), col("lang"), col("source")))).as("line"))

  /** The writer side of the interchange contract: one JSON object per
    * line, round-trippable through [[readDocuments]]'s explicit
    * schema. `shards > 0` fixes the output file count (the training-
    * loader contract: consumers address shard k of n, so the fan-out
    * is an interface, not an accident of the upstream partitioning);
    * `shards = 0` keeps the input partitioning — no extra shuffle for
    * a corpus that is already laid out. Uncompressed by design: a
    * gzip'd JSONL file is not byte-splittable, which silently
    * serializes every downstream scan of a shard.
    */
  def writeDocuments(docs: DataFrame, path: String, shards: Int = 0): Unit = {
    val d = if (shards > 0) docs.repartition(shards) else docs
    d.write.mode("overwrite").option("compression", "none").json(path)
  }
}
