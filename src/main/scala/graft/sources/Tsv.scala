package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader for the reference engine's input format: one document per
  * line as `title \t body` (the reference mapper splits each line on
  * its first tab and tokenizes the body —
  * /root/reference/src/main/scala/test/App.scala:150-180). Blank
  * lines are dropped; a line with no tab is a title with an empty
  * body, matching the reference's lenient split.
  *
  * The text source is splittable, so at 100 TB each executor reads its
  * own byte ranges; the split/regex work is narrow, codegen'd
  * per-line compute.
  */
object Tsv {
  /** (title, text) — the reference keys documents by title. */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(length(col("value")) > 0)
      .select(split(col("value"), "\t", 2).as("p"))
      .select(
        element_at(col("p"), 1).as("title"),
        // try_: a tab-less line has no second element (ANSI element_at throws)
        coalesce(try_element_at(col("p"), lit(2)), lit("")).as("text"))
}
