package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Delta-gap codec for positional postings — the storage form every
  * compressed positional index uses (the cost model `postings_compress`
  * prices; this is the codec [[graft.sources.IndexStore]] applies on
  * write and undoes on read). Encode/decode are codegen'd kernels, so
  * the index write path (every posting of the corpus) stays inside
  * whole-stage codegen instead of an interpreted zip_with lambda.
  */
object PostingsImpl {
  /** Sorted absolute positions → (first, gap, gap, ...). */
  def deltaEncode(ps: ArrayData): ArrayData = {
    val n = ps.numElements()
    val out = new Array[Long](n)
    var prev = 0L
    var i = 0
    while (i < n) {
      val v = ps.getLong(i)
      out(i) = if (i == 0) v else v - prev
      prev = v
      i += 1
    }
    new GenericArrayData(out)
  }

  /** (first, gap, gap, ...) → sorted absolute positions. */
  def deltaDecode(gs: ArrayData): ArrayData = {
    val n = gs.numElements()
    val out = new Array[Long](n)
    var acc = 0L
    var i = 0
    while (i < n) { acc += gs.getLong(i); out(i) = acc; i += 1 }
    new GenericArrayData(out)
  }
}

case class DeltaGapEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    PostingsImpl.deltaEncode(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PostingsImpl.deltaEncode($a)")
  override protected def withNewChildInternal(c: Expression): DeltaGapEncode =
    copy(child = c)
  override def prettyName: String = "delta_gap_encode"
}

case class DeltaGapDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    PostingsImpl.deltaDecode(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PostingsImpl.deltaDecode($a)")
  override protected def withNewChildInternal(c: Expression): DeltaGapDecode =
    copy(child = c)
  override def prettyName: String = "delta_gap_decode"
}

object PostingsFns {
  def deltaEncode(c: Column): Column =
    GraftBridge.column(DeltaGapEncode(GraftBridge.expression(c)))
  def deltaDecode(c: Column): Column =
    GraftBridge.column(DeltaGapDecode(GraftBridge.expression(c)))
}
