package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst extension point: registers the engine's native expressions
  * in the SQL function registry, so `spark.sql("SELECT
  * rolling_hash(term), cosine_sim(a, b) ...")` plans the same
  * codegen'd kernels as the Column API. Installed via
  * `spark.sql.extensions=graft.GraftExtensions`
  * (see [[GraftSession.builder]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def foldLong(e: Expression, fn: String): Long = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn expects a foldable integer modulus, got non-foldable $e")
    e.eval() match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"$fn expects a foldable integer modulus, got $other")
    }
  }

  private def reg(ext: SparkSessionExtensions, name: String,
                  build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo("graft", name), build))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.IntersectSizeRule)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    reg(ext, "rolling_hash", {
      case Seq(s)    => RollingHash(s, HashFns.P)
      case Seq(s, m) => RollingHash(s, foldLong(m, "rolling_hash"))
      case args => throw new IllegalArgumentException(
        s"rolling_hash(str[, mod]) got ${args.length} args")
    })
    reg(ext, "shingle_hash", {
      case Seq(a)    => ShingleHash(a, HashFns.P)
      case Seq(a, m) => ShingleHash(a, foldLong(m, "shingle_hash"))
      case args => throw new IllegalArgumentException(
        s"shingle_hash(tokens[, mod]) got ${args.length} args")
    })
    reg(ext, "minhash_sig", {
      case Seq(a) => MinHashSig(a, HashFns.MinhashA.toArray, HashFns.MinhashB.toArray, HashFns.P)
      case args => throw new IllegalArgumentException(
        s"minhash_sig(hashes) got ${args.length} args")
    })
    reg(ext, "cosine_sim", {
      case Seq(a, b) => CosineSim(a, b)
      case args => throw new IllegalArgumentException(
        s"cosine_sim(a, b) got ${args.length} args")
    })
    reg(ext, "dot_product", {
      case Seq(a, b) => DotProduct(a, b)
      case args => throw new IllegalArgumentException(
        s"dot_product(a, b) got ${args.length} args")
    })
    reg(ext, "norm2", {
      case Seq(a) => Norm2(a)
      case args => throw new IllegalArgumentException(
        s"norm2(a) got ${args.length} args")
    })
    // aggregate: the analyzer wraps a returned AggregateFunction in an
    // AggregateExpression, so this registers like any SQL aggregate
    reg(ext, "minhash_union", {
      case Seq(a) => MinHashUnion(a)
      case args => throw new IllegalArgumentException(
        s"minhash_union(sig) got ${args.length} args")
    })
  }
}
