package graft.operators

import graft.plans.TopKPerGroup
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable whole-operator APIs of the engine, generic over input
  * frames (the gate queries are instantiations of these).
  */
object GraftOps {

  /** Per-group top-k via the custom [[graft.plans.TopKPerGroup]]
    * operator (map-side partial bounded heaps → shuffle on group →
    * final bounded heaps; nothing larger than k rows per group is
    * ever sorted). `orderCols` should end in a unique tie-break so
    * the order is total; plain columns sort ascending.
    */
  def topKPerGroup(df: DataFrame, k: Int, group: Column, orderCols: Column*): DataFrame = {
    // eager conversion: the lazy Column wrapper embeds non-serializable
    // sql.internal nodes that would ride into the task closure
    val sortOrders = orderCols.map(GraftBridge.eagerExpression(df.sparkSession, _)).map {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    }
    GraftBridge.ofRows(df.sparkSession,
      TopKPerGroup(k, GraftBridge.eagerExpression(df.sparkSession, group), sortOrders,
        GraftBridge.logicalPlan(df)))
  }

  /** Connected components of an undirected graph given as an edge
    * frame with two long columns: returns (node, component) where
    * component = the smallest node id reachable.
    *
    * Pregel-style min-label propagation with path halving (each round
    * a node adopts the min of its neighbors' labels AND its label's
    * label), so chains collapse in O(log diameter) rounds. Every round
    * localCheckpoints — constant-size plans, no lineage blowup — and
    * the symmetrized edge list is partitioned by join key ONCE so the
    * per-round join only shuffles the (much smaller) label table.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).localCheckpoint()
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("dst"))
      .localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()
    var converged = false
    while (!converged) {
      val nbrMin = sym.join(labels.select(col("node").as("dst"), col("lbl")), "dst")
        .groupBy(col("src").as("node")).agg(min(col("lbl")).as("nlbl"))
      val stepped = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("lbl"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("l1"))
      val jumped = stepped.join(
          labels.select(col("node").as("l1"), col("lbl").as("l2")), Seq("l1"), "left")
        .select(col("node"), col("lbl"),
          least(col("l1"), coalesce(col("l2"), col("l1"))).as("new_lbl"))
        .localCheckpoint()
      converged = jumped.filter(col("new_lbl") < col("lbl")).isEmpty
      labels = jumped.select(col("node"), col("new_lbl").as("lbl"))
    }
    labels.select(col("node"), col("lbl").as("component"))
  }

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
