package graft.plans

import java.util.{Comparator, PriorityQueue}

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Logical per-group top-k: keep each group's first `k` rows under
  * `order` (which must be a TOTAL order — include a unique tie-break).
  *
  * This is the whole-operator escalation path: the window formulation
  * (`row_number().over(...)` then filter) must shuffle and SORT every
  * group's full row set; this operator keeps bounded per-group heaps,
  * runs a map-side PARTIAL pass before the shuffle (a per-partition
  * top-k is a superset of the global top-k), and never sorts more
  * than k rows per (partition, group). At 100 TB with hot groups the
  * shuffle shrinks from |rows| to ≤ k·|partitions| per group.
  *
  * Memory contract: each task holds k rows per DISTINCT group in its
  * partition on-heap with no spill path — right for hot/bounded group
  * cardinality (the skew case windows handle worst). For extreme
  * per-partition group cardinality prefer the window formulation,
  * whose external sort spills.
  */
case class TopKPerGroup(k: Int, group: Expression, order: Seq[SortOrder],
                        child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

/** Plans [[TopKPerGroup]] as partial exec → (shuffle on group) → final
  * exec; the Exchange appears because the final node requires
  * ClusteredDistribution on the group key.
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, group, order, child) =>
      val partial = TopKPerGroupExec(k, group, order, partial = true, planLater(child))
      TopKPerGroupExec(k, group, order, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Physical per-group top-k: one pass per partition over bounded
  * per-group heaps (head = currently-worst kept row).
  */
case class TopKPerGroupExec(k: Int, group: Expression, order: Seq[SortOrder],
                            partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(Seq(group)) :: Nil

  // Memory observability for the documented no-spill contract: on-heap
  // usage is k rows × the task's distinct-group count. A size metric
  // reports min/med/max across tasks — the max is the pressure gauge a
  // caller checks before trusting this node on a new group key.
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "peakGroups" -> SQLMetrics.createSizeMetric(sparkContext,
      "distinct groups held per task"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupExprs = Seq(group)
    val orderLocal = order
    val childOutput = child.output
    val peakGroups = longMetric("peakGroups")
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ord = GenerateOrdering.generate(orderLocal, childOutput)
      // head of each heap = the WORST kept row (reverse of `ord`)
      val worstFirst = new Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps = mutable.HashMap.empty[UnsafeRow, PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = new PriorityQueue[InternalRow](kLocal + 1, worstFirst)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      peakGroups.add(heaps.size)
      heaps.valuesIterator.flatMap { h =>
        Iterator.continually(h.poll()).takeWhile(_ != null)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}
