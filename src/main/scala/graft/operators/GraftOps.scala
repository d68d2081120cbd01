package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable whole-operator APIs of the engine, generic over input
  * frames (the gate queries are instantiations of these).
  */
object GraftOps {

  /** Generic as-of join: for every left row, the latest right `value`
    * (by right time, then value as tie-break) among right rows of the
    * same key with time at-or-before the left row's time.
    *
    * Union+window formulation: ONE shuffle on the key, no per-key
    * range explosion — at 100 TB a join+filter+argmax would first
    * materialize |left| × |right-rows-per-key| pairs; this streams
    * both sides through a single running-last window.
    *
    * Output: all left columns + `asCol` (null when no right row
    * precedes the left row).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               leftTime: Column, rightTime: Column,
               value: Column, asCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left.select(
      leftKey.as("__k"), leftTime.as("__t"), lit(1L).as("__kind"),
      lit(null).cast(right.select(value).schema.head.dataType).as("__v"),
      struct(leftCols.map(col): _*).as("__payload"))
    val r = right.select(
      rightKey.as("__k"), rightTime.as("__t"), lit(0L).as("__kind"),
      value.as("__v"), lit(null).cast(l.schema("__payload").dataType).as("__payload"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__kind"), col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__last", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .select(leftCols.map(c => col(s"__payload.$c").as(c)) :+ col("__last").as(asCol): _*)
  }
}
