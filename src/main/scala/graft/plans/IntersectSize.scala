package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Distinct-intersection cardinality of two long arrays without
  * materializing the intersection: |distinct(a) ∩ distinct(b)|,
  * the exact cardinality `size(array_intersect(a, b))` returns.
  * Open-addressing long hash set over the smaller side; elements are
  * removed as matched so duplicates in either input count once.
  */
object IntersectImpl {
  def size(a: ArrayData, b: ArrayData): Int = {
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = small.numElements()
    if (n == 0) return 0
    var cap = 8
    while (cap < n * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    // separate matched flag: clearing `used` on a match would break
    // the linear-probe chains of keys inserted past that slot
    val matched = new Array[Boolean](cap)
    val mask = cap - 1

    def slotOf(v: Long): Int = {
      var s = (java.lang.Long.hashCode(v * -7046029254386353131L) & mask)
      while (used(s) && keys(s) != v) s = (s + 1) & mask
      s
    }

    var i = 0
    while (i < n) {
      val s = slotOf(small.getLong(i))
      if (!used(s)) { used(s) = true; keys(s) = small.getLong(i) }
      i += 1
    }
    var count = 0
    val m = large.numElements()
    i = 0
    while (i < m) {
      val v = large.getLong(i)
      val s = slotOf(v)
      if (used(s) && keys(s) == v && !matched(s)) { matched(s) = true; count += 1 }
      i += 1
    }
    count
  }
}

/** Codegen'd `size(array_intersect(a, b))` for non-null long arrays. */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectImpl.size(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.IntersectImpl.size($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectSize =
    copy(left = l, right = r)
  override def prettyName: String = "intersect_size"
}

/** Optimizer rule: `size(array_intersect(a, b))` over non-null long
  * arrays computes only the cardinality, so planning the generic
  * ArrayIntersect (which builds the intersection array per row, then
  * counts it) wastes the allocation on every verification pair. The
  * rewrite is exact: same distinct-match cardinality, same null
  * behavior (both children non-nullable-element arrays). Installed by
  * [[graft.GraftExtensions]].
  */
object IntersectSizeRule extends Rule[LogicalPlan] {
  private def longArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), legacy)
          if longArray(a) && longArray(b) && !legacy =>
        IntersectSize(a, b)
    }
}
