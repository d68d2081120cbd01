package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV corpus reader — the export format spreadsheets and warehouses
  * hand a pipeline. Same discipline as [[Jsonl]]: EXPLICIT schema
  * (inference is a full extra pass at 100 TB and silently widens
  * types on dirty input), PERMISSIVE parsing with malformed lines
  * routed to a `_corrupt` column instead of failing the job, and a
  * quarantine stream so bad rows land somewhere inspectable. Quoted
  * fields (embedded commas/newlines in `text`) are handled by
  * Spark's CSV parser; `multiLine` stays OFF by default because a
  * multi-line CSV is NOT byte-splittable — the 100 TB posture wants
  * one-record-per-line exports (embedded newlines escaped), and a
  * caller who truly needs multiline passes `multiLine = true`
  * knowing each file then parses on one executor.
  */
object Csv {

  /** The documents-table schema ([[Tables.documents]] contract). */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt", StringType)))

  private def raw(spark: SparkSession, path: String, multiLine: Boolean): DataFrame =
    spark.read
      .schema(DocumentsSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("multiLine", multiLine.toString)
      .csv(path)

  /** (doc_id, text, lang, source) — parse-clean rows only. */
  def readDocuments(spark: SparkSession, path: String,
      multiLine: Boolean = false): DataFrame =
    raw(spark, path, multiLine)
      .filter(col("_corrupt").isNull && col("doc_id").isNotNull)
      .drop("_corrupt")

  /** The quarantine stream: raw text of every line that failed to
    * parse (or parsed without the mandatory doc_id).
    */
  def readCorrupt(spark: SparkSession, path: String,
      multiLine: Boolean = false): DataFrame =
    raw(spark, path, multiLine)
      .filter(col("_corrupt").isNotNull || col("doc_id").isNull)
      .select(coalesce(col("_corrupt"), concat_ws(",", col("doc_id"),
        col("text"), col("lang"), col("source"))).as("line"))
}
