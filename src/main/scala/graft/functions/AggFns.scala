package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash UNION as a first-class Catalyst aggregate: the signature of
  * a union of shingle sets is the element-wise min of the per-set
  * signatures, so this aggregate rolls a whole group's MinHash up with
  * one pass — partial-aggregated map-side and merged like any min
  * (sketch mergeability as an engine primitive, not a 16-column
  * idiom). A DeclarativeAggregate: update/merge/evaluate are Catalyst
  * expression trees (zip_with/least/transform), so the whole
  * aggregation stays in generated code.
  *
  * Empty-set sentinel signatures (all −1, what
  * [[graft.functions.MinHashSig]] emits for a doc with no shingles)
  * are the merge IDENTITY: −1 components are mapped to Long.MaxValue
  * on update and back to −1 at evaluation, so a group of only empty
  * docs unions to the empty signature.
  *
  * Sentinel collision (accepted): a group whose GENUINE componentwise
  * minimum hash equals Long.MaxValue would be emitted as −1 (empty).
  * That requires every doc in the group to hash a component to
  * exactly 2⁶³−1 — probability ≈ 2⁻⁶⁴ per component per doc under
  * the rolling hash's near-uniform output, i.e. never over any real
  * corpus; documented rather than guarded so update/merge stay a
  * bare zip_with/least with no per-element branch.
  */
case class MinHashUnion(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  // containsNull = false required: a null element would leak through
  // the min-merge into the declared non-null result array, and a
  // codegen consumer trusting containsNull=false would read garbage
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_union expects array<bigint> with non-null elements, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // a group with no non-null inputs
  override def prettyName: String = "minhash_union"

  private def lam1(f: NamedLambdaVariable => Expression): LambdaFunction = {
    val x = NamedLambdaVariable("x", LongType, nullable = true)
    LambdaFunction(f(x), Seq(x))
  }

  private def mins(a: Expression, b: Expression): Expression = {
    val x = NamedLambdaVariable("x", LongType, nullable = true)
    val y = NamedLambdaVariable("y", LongType, nullable = true)
    ZipWith(a, b, LambdaFunction(Least(Seq(x, y)), Seq(x, y)))
  }

  // null buffer until the first input fixes the signature length —
  // the aggregate works for any k, not just the engine's 16
  private lazy val sig = AttributeReference("sig",
    ArrayType(LongType, containsNull = false), nullable = true)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(sig)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, ArrayType(LongType, containsNull = false)))

  private def sanitized(e: Expression): Expression =
    ArrayTransform(e,
      lam1(x => If(EqualTo(x, Literal(-1L)), Literal(Long.MaxValue), x)))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), sig,
      If(IsNull(sig), sanitized(child), mins(sig, sanitized(child)))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(sig.left), sig.right,
      If(IsNull(sig.right), sig.left, mins(sig.left, sig.right))))

  override lazy val evaluateExpression: Expression =
    ArrayTransform(sig,
      lam1(x => If(EqualTo(x, Literal(Long.MaxValue)), Literal(-1L), x)))

  override protected def withNewChildInternal(c: Expression): MinHashUnion =
    copy(child = c)
}

object AggFns {
  /** Column form of [[MinHashUnion]] for the DataFrame API. */
  def minhashUnion(sig: Column): Column =
    GraftBridge.column(
      MinHashUnion(GraftBridge.expression(sig)).toAggregateExpression())
}
