package graft

import graft.operators.Folds
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, row_number}

/** The bitwise-vs-production contract of [[graft.operators.Folds]]:
  * the gate's sorted-fold plans and the 100 TB plain-partial-agg
  * plans must agree to 1e-9 on every operator that routes through
  * `Folds.groupSums`, and the production plans must not carry a
  * `collect_list` buffer anywhere.
  */
class FoldsSpec extends SparkSpec {

  /** Every §2 key whose floating sums route through Folds (the PQ
    * family shares adcDistances — knn_pq and knn_ivf_pq cover it).
    */
  val foldKeys = Seq("embedding_stats", "embedding_pca", "qlm_topk",
    "neardup_pagerank", "source_kl", "zipf_fit", "perplexity_doc",
    "term_entropy", "keyword_textrank", "knn_ivf_trained",
    "knn_pq", "knn_ivf_pq", "embedding_outliers", "mlt_topk",
    "mix_temperature", "events_twap", "hashing_vectorize",
    "ivf_elbow", "ivf_retrain", "char_entropy")

  private def withMode[A](bitwise: Boolean)(body: => A): A = {
    spark.conf.set(Folds.ConfKey, bitwise.toString)
    try body finally spark.conf.set(Folds.ConfKey, "true")
  }

  private def assertClose(key: String, a: Row, b: Row): Unit = {
    assert(a.length == b.length, s"$key: arity ${a.length} vs ${b.length}")
    (0 until a.length).foreach { i =>
      (a.get(i), b.get(i)) match {
        case (x: Double, y: Double) =>
          assert(math.abs(x - y) <= 1e-9, s"$key col $i: $x vs $y")
        case (x, y) => assert(x == y, s"$key col $i: $x vs $y")
      }
    }
  }

  test("production (plain-sum) mode matches bitwise mode within 1e-9") {
    foldKeys.foreach { key =>
      val q = SparkEntry.queries(key)
      val bit = withMode(bitwise = true)(q(spark, sfDir).collect())
      val prod = withMode(bitwise = false)(q(spark, sfDir).collect())
      assert(bit.length == prod.length, s"$key: ${bit.length} vs ${prod.length} rows")
      bit.zip(prod).foreach { case (a, b) => assertClose(key, a, b) }
    }
  }

  test("production mode plans have no collect_list buffer") {
    // the ANN keys keep one DIMENSION-bounded collect_list: the
    // centroid/codebook vector reassembly (d rows -> one array<float>,
    // never corpus-sized) — only the corpus-sized fold buffers must go
    val vectorRebuildKeys = Set("knn_ivf_trained", "knn_pq", "knn_ivf_pq",
      "ivf_retrain")
    foldKeys.filterNot(vectorRebuildKeys).foreach { key =>
      val plan = withMode(bitwise = false) {
        SparkEntry.queries(key)(spark, sfDir).queryExecution.executedPlan.toString
      }
      assert(!plan.contains("collect_list"), s"$key production plan still folds a list")
    }
  }

  test("groupSums bitwise fold equals a sequential ord-ascending sum exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(500)(i =>
      (rnd.nextInt(8).toLong, i.toLong, rnd.nextDouble() * 2 - 1))
    val df = rows.toDF("k", "ord", "x").repartition(7) // force multi-partition agg
    import org.apache.spark.sql.functions.{col => c}
    def run(bitwise: Boolean): Map[Long, Double] = withMode(bitwise) {
      Folds.groupSums(df, Seq("k"), c("ord"), Seq("s" -> c("x")))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    // reference: left-to-right double additions in ord order per key
    val want = rows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.sortBy(_._2).map(_._3).foldLeft(0.0)(_ + _) }
    val bit = run(bitwise = true)
    assert(bit.keySet === want.keySet)
    bit.foreach { case (k, v) => assert(v == want(k), s"key $k: $v != ${want(k)}") }
    val prod = run(bitwise = false)
    prod.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) <= 1e-9, s"key $k prod drift") }
  }

  test("bitwise mode is the default (oracle gate unchanged)") {
    assert(spark.conf.get(Folds.ConfKey, "true").toBoolean)
    val plan = SparkEntry.queries("zipf_fit")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("collect_list"))
  }

  test("revenue_gini production rank is EXACTLY the gate's global-window rank") {
    // the range-partitioned two-phase rank must preserve the global
    // (x, custkey) order, so the whole output row — not just the
    // rounded gini — is identical between modes
    val gate = operators.Analytics.revenueGini(spark, sfDir).collect()
    spark.conf.set(Folds.ConfKey, "false")
    try {
      val prodDf = operators.Analytics.revenueGini(spark, sfDir)
      val prod = prodDf.collect()
      assert(gate.length === 1 && prod.length === 1)
      assert(gate.head === prod.head)
      // and the production plan really ranks inside range buckets
      val plan = prodDf.queryExecution.executedPlan.toString
      assert(plan.contains("__bk"),
        "production mode must rank per range bucket, not in one global window")
    } finally spark.conf.set(Folds.ConfKey, "true")
  }

  test("pareto/rfm production tiles EXACTLY equal the gate's NTILE windows") {
    // rangeRank + the NTILE arithmetic must reproduce every decile
    // and every RFM score bit-for-bit, row-for-row
    val gateP = operators.Analytics.revenuePareto(spark, sfDir).collect().toSeq
    val gateR = operators.Analytics.rfmSegments(spark, sfDir).collect().toSeq
    spark.conf.set(Folds.ConfKey, "false")
    try {
      val prodP = operators.Analytics.revenuePareto(spark, sfDir).collect().toSeq
      val prodR = operators.Analytics.rfmSegments(spark, sfDir).collect().toSeq
      assert(prodP === gateP)
      assert(prodR === gateR)
      assert(gateR.nonEmpty && gateP.nonEmpty)
    } finally spark.conf.set(Folds.ConfKey, "true")
  }

  test("curriculum_order production rank-lookup boundaries EXACTLY equal the gate's percentile") {
    // the rangeRank boundary route must reproduce the exact
    // interpolated quartiles (no sketch drift at any cardinality)
    val gate = operators.Pipeline.curriculumOrder(spark, sfDir).collect().toSeq
    spark.conf.set(Folds.ConfKey, "false")
    try {
      val prod = operators.Pipeline.curriculumOrder(spark, sfDir).collect().toSeq
      assert(prod === gate && gate.length === 4)
    } finally spark.conf.set(Folds.ConfKey, "true")
  }

  test("rangeRankMulti: every pass equals the global row_number, incl. ties and skew") {
    import spark.implicits._
    // adversarial frame: heavy value ties (so bucket boundaries cut
    // through tie runs), skewed magnitudes, and a negated descending
    // pass — every rank must still be EXACTLY the global window's
    val rows = (1L to 2000L).map { i =>
      (i, (i % 7) * 100L, math.pow(-1, i % 3).toLong * (i % 13), (i * 2654435761L) % 1000)
    }
    val df = rows.toDF("id", "a", "b", "c")
    val multi = operators.GraftOps.rangeRankMulti(df,
        Seq("ra" -> col("a"), "rb" -> -col("b"), "rc" -> col("c")), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1).toSeq
    def winRank(v: org.apache.spark.sql.Column) =
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(v, col("id"))).cast("long")
    val want = df
      .withColumn("ra", winRank(col("a")))
      .withColumn("rb", winRank(-col("b")))
      .withColumn("rc", winRank(col("c")))
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1).toSeq
    assert(multi === want)
    // and the single-pass wrapper agrees with its own multi path
    val one = operators.GraftOps.rangeRank(df, col("a"), col("id"))
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(one === want.map(t => (t._1, t._2)))
  }

  test("epoch_shuffle production composite rangeRank EXACTLY equals per-epoch windows") {
    val gate = operators.Pipeline.epochShuffle(spark, sfDir).collect().toSeq
    spark.conf.set(Folds.ConfKey, "false")
    try {
      val prodDf = operators.Pipeline.epochShuffle(spark, sfDir)
      val prod = prodDf.collect().toSeq
      assert(prod === gate && gate.nonEmpty)
      // every epoch is a PERMUTATION: positions 1..n, all docs present
      val n = gate.length / 3
      (0L to 2L).foreach { e =>
        val ep = gate.filter(_.getLong(0) == e)
        assert(ep.map(_.getLong(1)).sorted.toSeq === (1L to n).toSeq)
      }
      // and epochs are decorrelated (doc at pos 1 differs somewhere)
      assert(gate.filter(_.getLong(1) == 1L).map(_.getLong(2)).distinct.length > 1)
      assert(prodDf.queryExecution.executedPlan.toString.contains("__bk"))
    } finally spark.conf.set(Folds.ConfKey, "true")
  }

  test("ppl_bucket_mix production tercile cutoffs EXACTLY equal the gate's") {
    val gate = operators.TextAnalysis.pplBucketMix(spark, sfDir).collect().toSeq
    spark.conf.set(Folds.ConfKey, "false")
    try {
      val prod = operators.TextAnalysis.pplBucketMix(spark, sfDir).collect().toSeq
      assert(prod === gate && gate.nonEmpty)
      // terciles actually split: more than one bucket appears
      assert(gate.map(_.getString(1)).distinct.length > 1)
    } finally spark.conf.set(Folds.ConfKey, "true")
  }

  test("rfm_migration production half-segmentations EXACTLY equal the gate's") {
    val gate = operators.Analytics.rfmMigration(spark, sfDir).collect().toSeq
    spark.conf.set(Folds.ConfKey, "false")
    try {
      val prod = operators.Analytics.rfmMigration(spark, sfDir).collect().toSeq
      assert(prod === gate && gate.nonEmpty)
      // both absorbing states occur on the gate corpus
      val froms = gate.map(_.getString(0)).toSet
      val tos = gate.map(_.getString(1)).toSet
      assert(froms.contains("new") && tos.contains("churned"))
    } finally spark.conf.set(Folds.ConfKey, "true")
  }

  test("abc production rank+prefix EXACTLY equals the gate's global window") {
    val gate = operators.Analytics.ordersAbcClass(spark, sfDir).collect().toSeq
    spark.conf.set(Folds.ConfKey, "false")
    try {
      val prod = operators.Analytics.ordersAbcClass(spark, sfDir).collect().toSeq
      assert(prod === gate && gate.nonEmpty)
    } finally spark.conf.set(Folds.ConfKey, "true")
  }
}
