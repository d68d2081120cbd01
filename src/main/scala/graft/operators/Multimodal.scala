package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.E): media payloads as opaque
  * `binary` columns with typed metadata, and a per-partition batch
  * feature-extraction stage.
  *
  * The test corpus has no real image/audio bytes, so the media payload
  * is derived deterministically (UTF-8 bytes of `text`) — the DECODE
  * step is the stub; everything Spark-side (binary schema, metadata
  * extraction, partition-batched processing, column pruning) is the
  * real 100 TB shape: metadata extraction is a narrow codegen'd map,
  * and feature extraction amortizes per-partition setup (a codec
  * handle, a model session) across rows exactly like an image pipeline
  * would.
  */
object Multimodal {

  /** documents with an opaque binary `media` column. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))

  /** Typed metadata over the opaque payload: byte length, content
    * hash, magic prefix. Narrow, codegen'd, never decodes.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("media_md5"),
        substring(hex(col("media")), 1, 8).as("magic"))
      .orderBy("doc_id")

  /** Batch feature extraction via mapPartitions: a 16-bucket byte
    * histogram stands in for the decoded-media feature vector. The
    * decode call is the deliberate stub — a real pipeline opens a codec
    * once per partition where `it =>` begins and maps frames to
    * features; the partitioning, batch shape, and schema here are what
    * that pipeline runs on. Rows-only gate (no SQL oracle for the
    * stubbed codec path).
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        // per-partition setup would open the codec / model session here
        it.map { case (docId, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8) // stub decode
          val hist = new Array[Long](16)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 4) += 1; i += 1 }
          (docId, bytes.length.toLong, hist.mkString(","))
        }
      }
      .toDF("doc_id", "n_bytes", "byte_hist")
      .orderBy("doc_id")
  }

  // ---- wiring ----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_meta" -> mediaMeta,
    "media_features" -> mediaFeatures)

  /** media_features is rows-only: its decode stage is a stub. */
  val oracles: Map[String, String] = Map(
    "media_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS media_md5,
        |  substring(hex(encode(text)), 1, 8) AS magic
        |FROM documents ORDER BY doc_id""".stripMargin)
}
