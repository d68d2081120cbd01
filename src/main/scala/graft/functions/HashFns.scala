package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared hash kernels, callable from both interpreted eval and
  * generated Java (Scala objects emit static forwarders).
  */
object HashImpl {
  /** Polynomial rolling hash over unicode codepoints:
    * h = (h * 31 + cp) mod m. Matches the DuckDB-SQL oracle form
    * `list_reduce(list_prepend(0, list_transform(string_split(s,''),
    * c -> unicode(c))), (a,x) -> (a*31+x) % m)` exactly, so hashes
    * are cross-engine comparable.
    */
  def roll(s: UTF8String, mod: Long): Long = {
    val js = s.toString
    var h = 0L
    var i = 0
    while (i < js.length) {
      val cp = js.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 31L + cp) % mod
    }
    h
  }
}

/** Catalyst-native rolling hash (codegen'd; no Scala UDF on the hot
  * path). The reference engine hashed terms reducer-side
  * (/root/reference/src/main/scala/test/App.scala:185 hash
  * partitioner on word); here term hashing is a narrow, codegen'd
  * map stage feeding MinHash/SimHash/fingerprints.
  */
case class RollingHash(child: Expression, mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashImpl.roll(v.asInstanceOf[UTF8String], mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.roll($c, ${mod}L)")
  override protected def withNewChildInternal(c: Expression): RollingHash =
    copy(child = c)
  override def prettyName: String = "rolling_hash"
}

object HashFns {
  /** Prime modulus for term/shingle hashing (fits 31*m + cp in i64). */
  val P: Long = 1000000007L
  /** 2^32 modulus for SimHash bit material. */
  val M32: Long = 4294967296L

  /** MinHash universal-hash parameters: sig_i = min over shingles of
    * (A(i)*h + B(i)) mod P. Deterministic literals so the DuckDB
    * oracle can embed the same constants.
    */
  val MinhashA: Seq[Long] = Seq(
    722159L, 919583L, 299737L, 474431L, 843917L, 123457L, 655357L, 201563L,
    377911L, 542743L, 760841L, 111949L, 888887L, 432197L, 598687L, 314159L)
  val MinhashB: Seq[Long] = Seq(
    463L, 9377L, 24551L, 3767L, 86243L, 52391L, 12893L, 70921L,
    31517L, 64601L, 9241L, 77471L, 20201L, 55313L, 41141L, 68111L)

  def rollingHash(c: Column, mod: Long = P): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(c), mod))
}
