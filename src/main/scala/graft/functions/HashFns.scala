package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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

  private def rollInto(h0: Long, js: String, mod: Long): Long = {
    var h = h0
    var i = 0
    while (i < js.length) {
      val cp = js.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 31L + cp) % mod
    }
    h
  }

  /** Rolling hashes of every 3-token shingle (tokens joined by single
    * spaces), identical to hashing the concatenated shingle string
    * with [[roll]] — the polynomial fold is sequential, so folding
    * token-by-token with a literal space (cp 32) between them yields
    * the same value without materializing shingle strings. One tight
    * JVM loop per document instead of per-element interpreted
    * `transform` lambdas.
    */
  def shingleHashes(toks: ArrayData, mod: Long): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val js = new Array[String](n)
    var i = 0
    while (i < n) { js(i) = toks.getUTF8String(i).toString; i += 1 }
    val out = new Array[Long](n - 2)
    i = 0
    while (i < n - 2) {
      var h = rollInto(0L, js(i), mod)
      h = (h * 31L + 32L) % mod
      h = rollInto(h, js(i + 1), mod)
      h = (h * 31L + 32L) % mod
      out(i) = rollInto(h, js(i + 2), mod)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All character n-grams of a string, codepoint-correct (matches
    * DuckDB substr semantics for non-BMP input). One kernel pass —
    * an inline `transform(sequence(...), i -> substr(...))` would
    * re-evaluate its child expression per element, interpreted.
    */
  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    if (cps.length < n) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](cps.length - n + 1)
    var i = 0
    while (i <= cps.length - n) {
      out(i) = UTF8String.fromString(new String(cps, i, n))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit SimHash straight from the token array: per token a rolling
    * hash mod 2^32 votes ±1 on each bit; bits with a positive total
    * are set. Summing ±1 per token OCCURRENCE equals the (doc, term)
    * tf-weighted formulation (sum_t tf(t)·s(t) = sum over instances),
    * so this narrow kernel replaces a groupBy(doc, term) shuffle while
    * producing the identical integer.
    */
  def simhash32(toks: ArrayData, mod: Long): Long = {
    val votes = new Array[Long](32)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h = roll(toks.getUTF8String(i), mod)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** k-wide MinHash signature in one pass over the shingle-hash array:
    * sig_i = min over h of (A(i)*h + B(i)) mod P, -1 for an empty
    * array — same arithmetic as the per-permutation
    * `array_min(transform(...))` formulation and the DuckDB oracle's
    * `coalesce(list_min(list_transform(...)), -1)`.
    */
  def minhashSig(hs: ArrayData, a: Array[Long], b: Array[Long], mod: Long): ArrayData = {
    val k = a.length
    val out = Array.fill[Long](k)(-1L)
    val n = hs.numElements()
    if (n > 0) {
      var j = 0
      while (j < k) { out(j) = Long.MaxValue; j += 1 }
      var i = 0
      while (i < n) {
        val h = hs.getLong(i)
        j = 0
        while (j < k) {
          val v = (a(j) * h + b(j)) % mod
          if (v < out(j)) out(j) = v
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out)
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

/** Codegen'd token-array → 3-gram shingle rolling hashes: one JVM
  * kernel call per document (vs interpreted per-shingle `transform`
  * lambdas — higher-order functions never enter whole-stage codegen).
  */
case class ShingleHash(child: Expression, mod: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashImpl.shingleHashes(v.asInstanceOf[ArrayData], mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.shingleHashes($c, ${mod}L)")
  override protected def withNewChildInternal(c: Expression): ShingleHash =
    copy(child = c)
  override def prettyName: String = "shingle_hash"
}

/** Codegen'd shingle-hash array → k-wide MinHash signature array in a
  * single pass (the per-permutation `array_min(transform(...))`
  * formulation evaluates k interpreted lambdas per document).
  */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long], mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashImpl.minhashSig(v.asInstanceOf[ArrayData], a, b, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashImpl.minhashSig($c, $aRef, $bRef, ${mod}L)")
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** Codegen'd character n-gram extraction (see [[HashImpl.charNgrams]]). */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashImpl.charNgrams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.charNgrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): CharNgrams =
    copy(child = c)
  override def prettyName: String = "char_ngrams"
}

/** Codegen'd token-array → 32-bit SimHash (see [[HashImpl.simhash32]]). */
case class SimHash32(child: Expression, mod: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashImpl.simhash32(v.asInstanceOf[ArrayData], mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.simhash32($c, ${mod}L)")
  override protected def withNewChildInternal(c: Expression): SimHash32 =
    copy(child = c)
  override def prettyName: String = "simhash32"
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

  /** 3-gram shingle rolling hashes straight from a token array. */
  def shingleHash(toks: Column, mod: Long = P): Column =
    GraftBridge.column(ShingleHash(GraftBridge.expression(toks), mod))

  /** All character n-grams of a string column. */
  def charNgrams(c: Column, n: Int): Column =
    GraftBridge.column(CharNgrams(GraftBridge.expression(c), n))

  /** 32-bit SimHash from a token array. */
  def simhash32(toks: Column): Column =
    GraftBridge.column(SimHash32(GraftBridge.expression(toks), M32))

  /** k=16 MinHash signature (array<long>) from a shingle-hash array. */
  def minhashSig(hs: Column): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(hs),
      MinhashA.toArray, MinhashB.toArray, P))
}
