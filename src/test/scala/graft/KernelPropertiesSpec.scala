package graft

import graft.functions.{HashFns, HashImpl, PostingsImpl, VectorImpl}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks (scalacheck) of the pure JVM kernels behind
  * the codegen'd Catalyst expressions — the algebraic laws the
  * engine's DISTRIBUTED correctness rests on, checked over arbitrary
  * inputs rather than the gate corpus:
  *
  *  - the shingle kernel's concatenation identity (what lets it skip
  *    materializing shingle strings),
  *  - MinHash's merge law (what makes `minhash_union` a valid
  *    partial aggregate: sketch of a union = componentwise min),
  *  - SimHash's order-independence (what makes it shuffle-safe),
  *  - the delta-gap codec's roundtrip (what makes a saved index
  *    readable),
  *  - the float-vector folds' exact symmetry/self-similarity.
  *
  * No SparkSession: these target the kernels the expressions call
  * from both interpreted eval and generated Java.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  // GRAFT_PROP_N scales the per-property case count for adversarial
  // soak runs (e.g. 20000 — the depth at which the r12 compatibleBatch
  // self-merge bug surfaced under the uniform generator); CI default
  // stays 300 so `sbt test` wall time is unchanged.
  private def check(prop: Prop): Unit = {
    val n = sys.env.get("GRAFT_PROP_N").map(_.toInt).getOrElse(300)
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // -- generators ---------------------------------------------------------

  /** Unicode codepoints incl. astral plane (surrogates excluded). */
  private val genCp: Gen[Int] = Gen.frequency(
    8 -> Gen.choose(32, 126),
    2 -> Gen.choose(0x80, 0xD7FF),
    1 -> Gen.choose(0x10000, 0x10FFFF))
  private val genStr: Gen[String] =
    Gen.listOf(genCp).map(cps => new String(cps.toArray, 0, cps.length))
  private val genToks: Gen[List[String]] = Gen.listOf(genStr)

  private def sArr(ts: Seq[String]) =
    new GenericArrayData(ts.map(s => UTF8String.fromString(s): Any).toArray)
  private def lArr(ls: Seq[Long]) = new GenericArrayData(ls.toArray[Long])
  private def fArr(fs: Seq[Float]) = new GenericArrayData(fs.toArray[Float])

  /** The documented recurrence, folded independently of the kernel. */
  private def refRoll(s: String, mod: Long): Long = {
    var h = 0L
    s.codePoints().toArray.foreach(cp => h = (h * 31L + cp) % mod)
    h
  }

  // -- rolling hash -------------------------------------------------------

  test("roll: matches the documented codepoint fold; range [0, mod)") {
    check(Prop.forAll(genStr) { s =>
      val h = HashImpl.roll(UTF8String.fromString(s), HashFns.P)
      h == refRoll(s, HashFns.P) && h >= 0L && h < HashFns.P
    })
  }

  test("shingleHashes: equals roll of the space-joined 3-token shingle") {
    check(Prop.forAll(genToks) { toks =>
      val got = { val a = HashImpl.shingleHashes(sArr(toks), HashFns.P); a.toLongArray.toSeq }
      val want =
        if (toks.length < 3) Seq.empty[Long]
        else toks.sliding(3).map(sh => refRoll(sh.mkString(" "), HashFns.P)).toSeq
      got == want
    })
  }

  // -- MinHash ------------------------------------------------------------

  /** −1 is the empty-set sentinel; the merge identity maps it to
    * Long.MaxValue (see [[graft.functions.AggFns]]).
    */
  private def m(v: Long): Long = if (v == -1L) Long.MaxValue else v

  test("minhashSig: sketch of a concatenation = componentwise merge-min (the minhash_union law)") {
    val genHs = Gen.listOf(Gen.choose(0L, HashFns.P - 1))
    check(Prop.forAll(genHs, genHs) { (xs, ys) =>
      val sx = HashImpl.minhashSig(lArr(xs), HashFns.MinhashA.toArray, HashFns.MinhashB.toArray, HashFns.P).toLongArray
      val sy = HashImpl.minhashSig(lArr(ys), HashFns.MinhashA.toArray, HashFns.MinhashB.toArray, HashFns.P).toLongArray
      val su = HashImpl.minhashSig(lArr(xs ++ ys), HashFns.MinhashA.toArray, HashFns.MinhashB.toArray, HashFns.P).toLongArray
      su.indices.forall(i => m(su(i)) == math.min(m(sx(i)), m(sy(i))))
    })
  }

  test("minhashSig: permutation-invariant; empty input is all sentinels") {
    val genHs = Gen.nonEmptyListOf(Gen.choose(0L, HashFns.P - 1))
    check(Prop.forAll(genHs) { xs =>
      val a = HashImpl.minhashSig(lArr(xs), HashFns.MinhashA.toArray, HashFns.MinhashB.toArray, HashFns.P).toLongArray.toSeq
      val b = HashImpl.minhashSig(lArr(xs.reverse), HashFns.MinhashA.toArray, HashFns.MinhashB.toArray, HashFns.P).toLongArray.toSeq
      a == b
    })
    assert(HashImpl.minhashSig(lArr(Nil), HashFns.MinhashA.toArray,
      HashFns.MinhashB.toArray, HashFns.P).toLongArray.forall(_ == -1L))
  }

  // -- SimHash ------------------------------------------------------------

  private def refSimhashTf(toks: Seq[String]): Long = {
    val votes = new Array[Long](32)
    toks.groupBy(identity).foreach { case (t, os) =>
      val tf = os.size.toLong
      val h = refRoll(t, HashFns.M32)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) votes(b) += tf else votes(b) -= tf
        b += 1
      }
    }
    (0 until 32).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
  }

  test("simhash32: order-independent, 32-bit, equals the tf-weighted formulation") {
    check(Prop.forAll(genToks) { toks =>
      val h = HashImpl.simhash32(sArr(toks), HashFns.M32)
      h == HashImpl.simhash32(sArr(toks.reverse), HashFns.M32) &&
        h >= 0L && h < HashFns.M32 &&
        h == refSimhashTf(toks)
    })
  }

  // -- char n-grams -------------------------------------------------------

  test("charNgrams: count, width, and sliding-window reconstruction (astral-safe)") {
    check(Prop.forAll(genStr, Gen.choose(1, 5)) { (s, n) =>
      val grams = {
        val a = HashImpl.charNgrams(UTF8String.fromString(s), n)
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      }
      val cps = s.codePoints().toArray
      grams.length == math.max(0, cps.length - n + 1) &&
        grams.forall(_.codePoints().count() == n) &&
        grams == cps.sliding(n).filter(_.length == n)
          .map(w => new String(w, 0, w.length)).toSeq
    })
  }

  // -- delta-gap codec ----------------------------------------------------

  test("delta codec: decode∘encode is the identity on sorted positions") {
    val genPos = Gen.listOf(Gen.choose(0L, 1L << 40)).map(_.sorted)
    check(Prop.forAll(genPos) { ps =>
      PostingsImpl.deltaDecode(PostingsImpl.deltaEncode(lArr(ps))).toLongArray.toSeq == ps
    })
  }

  // -- vector folds -------------------------------------------------------

  private val genVec: Gen[List[Float]] =
    Gen.listOf(Gen.choose(-100.0f, 100.0f))

  test("dot: exactly symmetric (same fold order, commutative products)") {
    check(Prop.forAll(genVec, genVec) { (a, b) =>
      VectorImpl.dot(fArr(a), fArr(b)) == VectorImpl.dot(fArr(b), fArr(a))
    })
  }

  test("cosine: self-similarity 1 for nonzero vectors, 0 for zero; |cos| <= 1+eps") {
    check(Prop.forAll(genVec, genVec) { (a, b) =>
      val c = VectorImpl.cosine(fArr(a), fArr(b))
      val self = VectorImpl.cosine(fArr(a), fArr(a))
      val zero = a.forall(_ == 0.0f)
      math.abs(c) <= 1.0 + 1e-9 &&
        (if (zero) self == 0.0 else math.abs(self - 1.0) < 1e-12)
    })
  }

  test("simhash32: invariant under corpus duplication (2x tokens, same sign votes)") {
    check(Prop.forAll(genToks) { toks =>
      HashImpl.simhash32(sArr(toks ++ toks), HashFns.M32) ==
        HashImpl.simhash32(sArr(toks), HashFns.M32)
    })
  }

  test("lshBucket: invariant under exact power-of-two scaling; nBits-bounded") {
    check(Prop.forAll(genVec) { v =>
      val b1 = VectorImpl.lshBucket(fArr(v), 4)
      val b2 = VectorImpl.lshBucket(fArr(v.map(_ * 4.0f)), 4)
      b1 == b2 && b1 >= 0L && b1 < 16L
    })
  }

  test("value-graph reachability law: Hamming<=1 components over values == over docs") {
    // The law Dedup.neardupComponents rests on: computing connected
    // components of the doc-level Hamming<=1 graph on the
    // DISTINCT-VALUE graph (same-value docs = one supernode with the
    // min doc as canonical; cross-value edges = single bit flips)
    // yields the exact doc-level component map. Values are drawn from
    // a pool built by <=2 bit flips off 3 random seeds, forcing both
    // same-value supernodes and hamming-1/2 cross-value structure
    // (distance-2 pairs must NOT link directly but may via a bridge).
    def docLevel(docs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val inGraph = scala.collection.mutable.HashSet[Long]()
      for { (da, va) <- docs; (db, vb) <- docs if da < db
            if java.lang.Long.bitCount(va ^ vb) <= 1 } {
        union(da, db); inGraph += da; inGraph += db
      }
      inGraph.iterator.map(d => d -> find(d)).toMap
    }
    def valueLevel(docs: Seq[(Long, Long)]): Map[Long, Long] = {
      val groups = docs.groupBy(_._2).map { case (v, ds) =>
        v -> (ds.map(_._1).min, ds.size) }
      val parent = scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val linked = scala.collection.mutable.HashSet[Long]()
      for { (v, (canon, _)) <- groups; b <- 0 until 32
            v2 = v ^ (1L << b); g2 <- groups.get(v2) } {
        union(canon, g2._1); linked += v; linked += v2
      }
      docs.iterator.collect { case (d, v)
        if groups(v)._2 >= 2 || linked(v) =>
        d -> find(groups(v)._1)
      }.toMap
    }
    val genSeed = Gen.choose(Long.MinValue, Long.MaxValue).map(_ & 0xFFFFFFFFL)
    val genCase = for {
      seeds <- Gen.listOfN(3, genSeed)
      pool = seeds.flatMap { s =>
        s :: (0 until 32 by 5).map(b => s ^ (1L << b)).toList :::
          List(s ^ 3L, s ^ 5L) // some distance-2 values
      }
      n <- Gen.choose(1, 60)
      vals <- Gen.listOfN(n, Gen.oneOf(pool))
    } yield vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    check(Prop.forAll(genCase) { docs => docLevel(docs) == valueLevel(docs) })
  }

  test("sq8Dequant: reconstruction error bounded by half a quantization step") {
    // per-dimension (mn, mx) envelopes with x inside them
    val genDim = for {
      mn <- Gen.choose(-50.0f, 50.0f)
      w <- Gen.choose(1e-3f, 100.0f)
      t <- Gen.choose(0.0f, 1.0f)
    } yield (mn, mn + w, mn + t * w)
    check(Prop.forAll(Gen.listOf(genDim)) { dims =>
      val (mns, mxs, xs) = (dims.map(_._1), dims.map(_._2), dims.map(_._3))
      val out = VectorImpl.sq8Dequant(fArr(xs), fArr(mns), fArr(mxs))
      (0 until out.numElements()).forall { i =>
        val step = (mxs(i) - mns(i)).toDouble / 255.0
        // the kernel's contract is FLOAT output (bitwise cross-engine
        // collapse), so the true bound is the double-decode half-step
        // PLUS the final cast's half-ulp: a narrow envelope at large
        // magnitude (w ~ 1e-3 at mn ~ 50) has step/2 ~ 2e-9 while
        // ulp(50f)/2 ~ 1.9e-6 — the 20k-case soak caught the old
        // tolerance omitting exactly that term (error model bug in
        // the LAW; the kernel is correct)
        math.abs(out.getFloat(i).toDouble - xs(i).toDouble) <=
          step * 0.5 + step * 1e-3 +
            0.5 * math.ulp(out.getFloat(i)).toDouble + 1e-6
      }
    })
  }

  test("compatibleBatch: batched BPE == one-at-a-time BPE on random word tables") {
    // The sequence-equivalence LAW behind the batched trainer
    // (operators.TextAnalysis.bpeBatchedLoop): per scan, the accepted
    // prefix of (freq DESC, l, r)-sorted candidates — symbol-disjoint,
    // strictly dominating anything a merge could create — applied in
    // ONE greedy map-lookup fold must reproduce the one-merge-per-
    // round trainer merge-for-merge, ties and degenerate tails
    // included. Checked with a PURE local simulator (no Spark) that
    // mirrors the driver/fold split exactly, against the same
    // reference trainer the crafted-corpus specs use.
    type Word = (Vector[String], Long)
    def pairCounts(words: Seq[Word]): Map[(String, String), Long] = {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      pc.toMap
    }
    def applyMerges(words: Seq[Word], mp: Map[(String, String), String]): Seq[Word] =
      words.map { case (syms, c) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        syms.foreach { x =>
          if (out.nonEmpty && mp.contains((out.last, x)))
            out(out.length - 1) = mp((out.last, x))
          else out += x
        }
        (out.toVector, c)
      }
    def sequential(words0: Seq[Word], k: Int): Seq[(String, String, Long)] = {
      var words = words0
      val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
      var done = false
      while (out.size < k && !done) {
        val pc = pairCounts(words)
        if (pc.isEmpty) done = true
        else {
          val ((l, r), f) = pc.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.head
          out += ((l, r, f))
          words = applyMerges(words, Map((l, r) -> (l + r)))
        }
      }
      out.toSeq
    }
    def batched(words0: Seq[Word], k: Int): Seq[(String, String, Long)] = {
      var words = words0
      val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
      var done = false
      while (out.size < k && !done) {
        val top = pairCounts(words).toSeq
          .map { case ((l, r), f) => (l, r, f) }
          .sortBy { case (l, r, f) => (-f, l, r) }
          .take(operators.TextAnalysis.BpeBatchMax + 1)
        if (top.isEmpty) done = true
        else {
          val batch = operators.TextAnalysis.compatibleBatch(top, k - out.size)
          out ++= batch
          words = applyMerges(words,
            batch.map { case (l, r, _) => (l, r) -> (l + r) }.toMap)
        }
      }
      out.toSeq
    }
    val genWord = for {
      len <- Gen.choose(1, 10)
      cs <- Gen.listOfN(len, Gen.oneOf("abcdef".toSeq))
      cnt <- Gen.choose(1L, 9L)
    } yield (cs.map(_.toString).toVector, cnt)
    val genTable = Gen.choose(3, 20).flatMap(n => Gen.listOfN(n, genWord))
      .map(_.groupBy(_._1).map { case (syms, g) => (syms, g.map(_._2).sum) }.toSeq)
    check(Prop.forAll(genTable, Gen.choose(1, 25)) { (table, k) =>
      batched(table, k) == sequential(table, k)
    })

    // Deterministic regression tables for the SELF-MERGE creation case
    // the uniform generator only hits ~0.05% of the time: a self-merge
    // (a,a)→aa on runs of ≥3 identical symbols CREATES (aa,a)/(aa,aa)
    // pairs with counts up to ⌊f/2⌋, which must dominate-truncate any
    // later same-batch candidate at or below that count.
    def W(s: String, c: Long): Word = (s.split(" ").toVector, c)
    val regressionTables: Seq[Seq[Word]] = Seq(
      // freq(a,a)=18; created (aa,a)=9 > freq(c,d)=5 — the batch must
      // NOT commit (c,d) ahead of (aa,a)
      Seq(W("a a a", 9), W("c d", 5)),
      // created count exactly EQUAL to the competitor: ⌊16/2⌋=8=(c,d)
      Seq(W("a a a", 8), W("c d", 8)),
      // runs of 4: (a,a)=12, created (aa,aa)=4 vs (c,d)=3
      Seq(W("a a a a", 4), W("c d", 3)),
      // two self-merges in one window
      Seq(W("a a a", 6), W("b b b", 5), W("c d", 4)),
      // odd/even mixed runs with boundary symbols
      Seq(W("x a a a a a y", 5), W("c d", 4), W("e f", 2)),
      // self-merge output chains: aa then (aa,a) then (aaa,*)
      Seq(W("a a a a a a a", 3), W("c d", 2))
    )
    for (table <- regressionTables; k <- 1 to 6) {
      assert(batched(table, k) == sequential(table, k),
        s"self-merge regression: table=$table k=$k " +
          s"batched=${batched(table, k)} sequential=${sequential(table, k)}")
    }

    // and a generator BIASED toward runs of identical symbols, where
    // the uniform-letters generator almost never lands
    val genRunWord = for {
      nRuns <- Gen.choose(1, 4)
      runs <- Gen.listOfN(nRuns, for {
        c <- Gen.oneOf("abc".toSeq)
        len <- Gen.choose(1, 7)
      } yield List.fill(len)(c.toString))
      cnt <- Gen.choose(1L, 9L)
    } yield (runs.flatten.toVector, cnt)
    val genRunTable = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, genRunWord))
      .map(_.groupBy(_._1).map { case (syms, g) => (syms, g.map(_._2).sum) }.toSeq)
    check(Prop.forAll(genRunTable, Gen.choose(1, 25)) { (table, k) =>
      batched(table, k) == sequential(table, k)
    })
  }

  test("hotSliceKernel: hot-slice trainer == one-at-a-time BPE across windows, caps, and fallback") {
    // The sequence-equivalence LAW behind the incremental hot-slice
    // trainer (operators.TextAnalysis.bpeHotSliceLoop): per
    // super-round, pull the top-W candidate window + every word
    // containing a window pair, run EXACT sequential BPE locally
    // (sound against un-pulled pairs via the window's tail bound —
    // un-windowed counts only ever DECREASE, created pairs involve a
    // just-merged symbol and are tracked exactly), write back words
    // and pair deltas. The simulator below mirrors the cluster
    // orchestration exactly — including the INCREMENTAL pair frame
    // (base + deltas, never re-aggregated) and the slice-cap fallback
    // to the batched loop — so a delta bug cannot hide behind a
    // recount.
    type Word = (Vector[String], Long)
    def pairCounts(words: Seq[Word]): Map[(String, String), Long] = {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      pc.toMap
    }
    def applyMerges(words: Seq[Word], mp: Map[(String, String), String]): Seq[Word] =
      words.map { case (syms, c) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        syms.foreach { x =>
          if (out.nonEmpty && mp.contains((out.last, x)))
            out(out.length - 1) = mp((out.last, x))
          else out += x
        }
        (out.toVector, c)
      }
    def sequential(words0: Seq[Word], k: Int): Seq[(String, String, Long)] = {
      var words = words0
      val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
      var done = false
      while (out.size < k && !done) {
        val pc = pairCounts(words)
        if (pc.isEmpty) done = true
        else {
          val ((l, r), f) = pc.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.head
          out += ((l, r, f))
          words = applyMerges(words, Map((l, r) -> (l + r)))
        }
      }
      out.toSeq
    }
    def batched(words0: Seq[Word], k: Int): Seq[(String, String, Long)] = {
      var words = words0
      val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
      var done = false
      while (out.size < k && !done) {
        val top = pairCounts(words).toSeq
          .map { case ((l, r), f) => (l, r, f) }
          .sortBy { case (l, r, f) => (-f, l, r) }
          .take(operators.TextAnalysis.BpeBatchMax + 1)
        if (top.isEmpty) done = true
        else {
          val batch = operators.TextAnalysis.compatibleBatch(top, k - out.size)
          out ++= batch
          words = applyMerges(words,
            batch.map { case (l, r, _) => (l, r) -> (l + r) }.toMap)
        }
      }
      out.toSeq
    }
    def hot(words0: Seq[Word], k: Int, w: Int, cap: Int): Seq[(String, String, Long)] = {
      var words: Map[String, Word] =
        words0.map(t => (t._1.mkString(""), t)).toMap
      var pairs: Map[(String, String), Long] = pairCounts(words.values.toSeq)
      val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
      var exhausted = false
      var fell = false
      while (out.size < k && !exhausted && !fell) {
        val top = pairs.toSeq.map { case ((l, r), f) => (l, r, f) }
          .sortBy { case (l, r, f) => (-f, l, r) }.take(w + 1)
        if (top.isEmpty) exhausted = true
        else {
          val window = top.take(w)
          val tail = if (top.size > w) top.last._3 else -1L
          val wset = window.map { case (l, r, _) => (l, r) }.toSet
          val slice = words.filter { case (_, (s, _)) =>
            s.zip(s.drop(1)).exists(wset) }
          if (slice.size > cap) {
            fell = true
            out ++= batched(words.values.toSeq, k - out.size)
          } else {
            val (got, changed, deltas) = operators.TextAnalysis.hotSliceKernel(
              slice, window, tail, k - out.size)
            out ++= got
            words = words ++ changed.map { case (t, s) => t -> ((s, words(t)._2)) }
            pairs = (pairs.keySet ++ deltas.keySet).iterator.map { p =>
              p -> (pairs.getOrElse(p, 0L) + deltas.getOrElse(p, 0L))
            }.filter(_._2 > 0).toMap
          }
        }
      }
      out.toSeq
    }
    val genWord = for {
      len <- Gen.choose(1, 10)
      cs <- Gen.listOfN(len, Gen.oneOf("abcdef".toSeq))
      cnt <- Gen.choose(1L, 9L)
    } yield (cs.map(_.toString).toVector, cnt)
    val genTable = Gen.choose(3, 20).flatMap(n => Gen.listOfN(n, genWord))
      .map(_.groupBy(_._1).map { case (syms, g) => (syms, g.map(_._2).sum) }.toSeq)
    // windows down to 1 force the tail-bound stop on nearly every
    // merge (max super-round churn); 64 usually holds every live pair
    check(Prop.forAll(genTable, Gen.choose(1, 25), Gen.oneOf(1, 2, 3, 8, 64)) {
      (table, k, w) => hot(table, k, w, Int.MaxValue) == sequential(table, k)
    })
    // forced slice-cap fallback mid-run (cap 0 falls back on round 1;
    // small caps fall back once the slice grows past them)
    check(Prop.forAll(genTable, Gen.choose(1, 25), Gen.oneOf(0, 1, 3)) {
      (table, k, cap) => hot(table, k, 4, cap) == sequential(table, k)
    })
    // runs of identical symbols: self-merge creation chains
    // ((a,a)→aa, then (aa,a)/(aa,aa)) under tight windows
    val genRunWord = for {
      nRuns <- Gen.choose(1, 4)
      runs <- Gen.listOfN(nRuns, for {
        c <- Gen.oneOf("abc".toSeq)
        len <- Gen.choose(1, 7)
      } yield List.fill(len)(c.toString))
      cnt <- Gen.choose(1L, 9L)
    } yield (runs.flatten.toVector, cnt)
    val genRunTable = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, genRunWord))
      .map(_.groupBy(_._1).map { case (syms, g) => (syms, g.map(_._2).sum) }.toSeq)
    check(Prop.forAll(genRunTable, Gen.choose(1, 25), Gen.oneOf(1, 2, 8)) {
      (table, k, w) => hot(table, k, w, Int.MaxValue) == sequential(table, k)
    })
    // the deterministic self-merge regression tables, at every window
    def W(s: String, c: Long): Word = (s.split(" ").toVector, c)
    val regressionTables: Seq[Seq[Word]] = Seq(
      Seq(W("a a a", 9), W("c d", 5)),
      Seq(W("a a a", 8), W("c d", 8)),
      Seq(W("a a a a", 4), W("c d", 3)),
      Seq(W("a a a", 6), W("b b b", 5), W("c d", 4)),
      Seq(W("x a a a a a y", 5), W("c d", 4), W("e f", 2)),
      Seq(W("a a a a a a a", 3), W("c d", 2))
    )
    for (table <- regressionTables; k <- 1 to 6; w <- Seq(1, 2, 8)) {
      assert(hot(table, k, w, Int.MaxValue) == sequential(table, k),
        s"hot-slice regression: table=$table k=$k w=$w " +
          s"hot=${hot(table, k, w, Int.MaxValue)} sequential=${sequential(table, k)}")
    }
  }
}
