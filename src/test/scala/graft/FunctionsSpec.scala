package graft

import graft.functions.{HashFns, HashImpl, TextFns, VectorFns, VectorImpl}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Kernel-level parity tests. The literal expected values were
  * cross-checked against DuckDB's equivalent fold expressions, so these
  * pin the cross-engine contract the oracle gate depends on.
  */
class FunctionsSpec extends SparkSpec {

  private def roll(s: String, mod: Long = HashFns.P): Long =
    HashImpl.roll(UTF8String.fromString(s), mod)

  test("rolling hash matches the DuckDB fold contract") {
    // duckdb: list_reduce(list_prepend(0, [unicode per char]), (a,x)->(a*31+x)%P)
    assert(roll("ab") === 3105L)            // 97*31 + 98
    assert(roll("") === 0L)
    assert(roll("的") === 30340L)           // single BMP codepoint
    // minhash fold over ['a b c','b c d'] with (A0,B0) — duckdb gives 354927082
    val m = Seq("a b c", "b c d")
      .map(s => (722159L * roll(s) + 463L) % HashFns.P).min
    assert(m === 354927082L)
  }

  test("RollingHash expression evaluates through codegen") {
    val got = spark.range(1)
      .select(HashFns.rollingHash(lit("ab")).as("h"),
        HashFns.rollingHash(lit("ab"), HashFns.M32).as("h32"))
      .head()
    assert(got.getLong(0) === 3105L)
    assert(got.getLong(1) === 3105L)
  }

  // the exact double the oracle's fold SQL also produces: sequential
  // dot, then dot / (sqrt(n2a) * sqrt(n2b))
  private val CosAB = 8.0 / (math.sqrt(5.0) * math.sqrt(13.0))

  test("cosine matches the sequential-fold contract") {
    val a = ArrayData.toArrayData(Array(1f, 2f))
    val b = ArrayData.toArrayData(Array(2f, 3f))
    assert(VectorImpl.cosine(a, b) === CosAB)
    assert(math.abs(VectorImpl.cosine(a, a) - 1.0) < 1e-15)
    val z = ArrayData.toArrayData(Array(0f, 0f))
    assert(VectorImpl.cosine(a, z) === 0.0)
  }

  test("CosineSim expression evaluates through codegen") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f), Array(2f, 3f))).toDF("a", "b")
    val got = df.select(VectorFns.cosineSim(col("a"), col("b"))).head().getDouble(0)
    assert(got === CosAB)
  }

  test("kernels match their naive formulations (seeded property check)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "的", "x1", "zz9", "héllo")
    (0 until 100).foreach { _ =>
      val toks = Vector.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])

      // shingleHashes == roll of the space-joined shingle strings
      val naiveShingles =
        if (toks.size < 3) Seq.empty
        else toks.sliding(3).map(w => roll(w.mkString(" "))).toSeq
      val got = HashImpl.shingleHashes(arr, HashFns.P)
      assert((0 until got.numElements()).map(got.getLong) === naiveShingles)

      // minhashSig == per-permutation min over hashes (or -1)
      val hs = new GenericArrayData(naiveShingles.toArray)
      val sig = HashImpl.minhashSig(hs, HashFns.MinhashA.toArray,
        HashFns.MinhashB.toArray, HashFns.P)
      val naiveSig = HashFns.MinhashA.zip(HashFns.MinhashB).map { case (a, b) =>
        if (naiveShingles.isEmpty) -1L
        else naiveShingles.map(h => (a * h + b) % HashFns.P).min
      }
      assert((0 until 16).map(sig.getLong) === naiveSig)

      // simhash32 == tf-weighted per-term bit votes
      val tf = toks.groupBy(identity).map { case (t, g) => (roll(t, HashFns.M32), g.size.toLong) }
      val naiveSim = (0 until 32).map { b =>
        val v = tf.map { case (h, n) => if (((h >> b) & 1L) == 1L) n else -n }.sum
        if (v > 0) 1L << b else 0L
      }.sum
      assert(HashImpl.simhash32(arr, HashFns.M32) === naiveSim)

      // charNgrams == codepoint sliding windows
      val s = toks.mkString(" ")
      val cps = s.codePoints().toArray
      val naiveGrams = if (cps.length < 3) Seq.empty
        else cps.sliding(3).map(w => new String(w, 0, 3)).toSeq
      val grams = HashImpl.charNgrams(UTF8String.fromString(s), 3)
      assert((0 until grams.numElements()).map(i => grams.getUTF8String(i).toString)
        === naiveGrams)
    }
  }

  test("IntersectSizeRule rewrites size(array_intersect) and matches semantics") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 2L, 3L), Seq(2L, 3L, 3L, 4L)), // dups count once -> 2
      (Seq.empty[Long], Seq(1L, 2L)),             // empty -> 0
      (Seq(5L, 6L), Seq(7L, 8L)))                 // disjoint -> 0
      .toDF("a", "b")
    val sized = df.select(size(array_intersect(col("a"), col("b"))).as("n"))
    assert(sized.collect().map(_.getInt(0)).toSeq === Seq(2, 0, 0))
    // literal inputs constant-fold away — assert the rewrite on a
    // file-sourced plan, where it must survive into the optimized plan
    val hs = graft.operators.Dedup.shingleHashes(
      graft.sources.Tables.documents(spark, sfDir))
    val filePlan = hs.select(size(array_intersect(col("hs"), col("hs"))).as("n"))
    assert(filePlan.queryExecution.optimizedPlan.toString.contains("intersect_size"))
    // large-side/small-side symmetry with collisions in the open table
    val big = (0L until 1000L).toArray
    val df2 = Seq((big.toSeq, big.filter(_ % 3 == 0).toSeq)).toDF("a", "b")
    assert(df2.select(size(array_intersect(col("a"), col("b"))))
      .head().getInt(0) === 334)
    // seeded randomized parity with Set intersection (dense tables,
    // duplicates, crossing probe chains)
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val a = Array.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong)
      val b = Array.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong)
      val want = a.toSet.intersect(b.toSet).size
      val got = graft.plans.IntersectImpl.size(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(b))
      assert(got === want, s"a=${a.toSeq} b=${b.toSeq}")
    }
  }

  test("minhash_union: element-wise-min aggregate with empty-sig identity") {
    import spark.implicits._
    val docs = Seq(
      ("s0", "alpha beta gamma delta"),
      ("s0", "epsilon zeta eta theta"),
      ("s1", "xx"), // < 3 tokens -> all -1 sentinel signature
      ("s1", "alpha beta gamma delta")).toDF("source", "text")
    docs.createOrReplaceTempView("mu_docs")
    val got = spark.sql(
      """SELECT source, minhash_union(minhash_sig(shingle_hash(
        |  filter(split(text, '\\s+'), t -> length(t) > 0)))) AS ms
        |FROM mu_docs GROUP BY source ORDER BY source""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // s0: min over two real signatures, componentwise
    val sigs = spark.sql(
      """SELECT minhash_sig(shingle_hash(
        |  filter(split(text, '\\s+'), t -> length(t) > 0))) AS s
        |FROM mu_docs WHERE source = 's0'""".stripMargin)
      .collect().map(_.getSeq[Long](0))
    val want = sigs(0).zip(sigs(1)).map { case (a, b) => math.min(a, b) }
    assert(got("s0") === want)
    // s1: the empty signature is the identity -> equals the real doc's sig
    val real = spark.sql(
      """SELECT minhash_sig(shingle_hash(
        |  filter(split(text, '\\s+'), t -> length(t) > 0))) AS s
        |FROM mu_docs WHERE text LIKE 'alpha%' LIMIT 1""".stripMargin)
      .head().getSeq[Long](0)
    assert(got("s1") === real)
    // all-empty group unions to the empty signature
    val empt = spark.sql(
      "SELECT minhash_union(array(-1L, -1L)) FROM range(3)").head().getSeq[Long](0)
    assert(empt === Seq(-1L, -1L))
  }

  test("delta-gap codec: encode/decode round-trips any sorted position list") {
    import graft.functions.PostingsImpl
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val ps = Array.fill(rnd.nextInt(40))(rnd.nextInt(100000).toLong)
        .distinct.sorted
      val enc = PostingsImpl.deltaEncode(new GenericArrayData(ps))
      val dec = PostingsImpl.deltaDecode(enc).toLongArray()
      assert(dec.toSeq === ps.toSeq)
      // gaps after the first are strictly positive for distinct sorted input
      val gaps = enc.toLongArray()
      assert(gaps.drop(1).forall(_ > 0L))
    }
  }

  test("minhash_union algebra: union sig == componentwise min over member sigs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0 until 40).map { i =>
      (i / 8, (0 until 5 + rnd.nextInt(10)).map(_ => s"w${rnd.nextInt(30)}").mkString(" "))
    }.toDF("grp", "text")
    docs.createOrReplaceTempView("mu_alg")
    val union = spark.sql(
      """SELECT grp, minhash_union(minhash_sig(shingle_hash(
        |  filter(split(text, '\\s+'), t -> length(t) > 0)))) AS ms
        |FROM mu_alg GROUP BY grp""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val members = spark.sql(
      """SELECT grp, minhash_sig(shingle_hash(
        |  filter(split(text, '\\s+'), t -> length(t) > 0))) AS s
        |FROM mu_alg""".stripMargin)
      .collect().groupBy(_.getInt(0))
      .map { case (g, rs) => g -> rs.map(_.getSeq[Long](1)) }
    members.foreach { case (g, sigs) =>
      val want = sigs.reduce((a, b) => a.zip(b).map { case (x, y) =>
        // -1 (empty set) is the identity on each component
        if (x == -1L) y else if (y == -1L) x else math.min(x, y)
      })
      assert(union(g) === want, s"group $g")
    }
  }

  test("tokens drops empties; shingles and norm behave") {
    import spark.implicits._
    val df = Seq("  a  b c d ", "x y", "Héllo,  World!").toDF("text")
    val rows = df.select(
      TextFns.tokens(col("text")).as("tk"),
      TextFns.shingles3(TextFns.tokens(col("text"))).as("sh"),
      TextFns.normText(col("text")).as("nt")).collect()
    assert(rows(0).getSeq[String](0) === Seq("a", "b", "c", "d"))
    assert(rows(0).getSeq[String](1) === Seq("a b c", "b c d"))
    assert(rows(1).getSeq[String](1) === Seq.empty)
    assert(rows(2).getString(2) === "hllo world")
  }
}
