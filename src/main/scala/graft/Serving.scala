package graft

import org.apache.spark.sql.DataFrame

/** Shared serving-workload driver: the mixed query load every serving
  * claim is measured against (r12 VERDICT items 1/5/8). One workload
  * definition, three consumers — [[IndexScaleStress]] (500k-doc store,
  * sequential AND concurrent rows), [[Bench]] (per-round `serve:*`
  * regression entries), and specs.
  *
  * The mix is 4 shapes round-robin over an n-query run, terms drawn
  * from the index's 60 highest-df entries so the workload hits real
  * postings: single-term lookup, boolean AND through the query
  * grammar, exact phrase, and BM25-ranked top-10 — the ranked leg runs
  * the REAL index-served ranker ([[operators.Query.searchRankedIndex]]:
  * bucket-pruned leaf fetch + persisted stats side table), not a
  * tf-ordered lookup stand-in (the r12 gap: the measured serving story
  * didn't cover the engine's own headline ranker).
  *
  * `threads` > 1 submits queries from a fixed pool of caller threads
  * against the one SparkSession (the supported concurrency model —
  * Spark schedules the resulting jobs concurrently); latency stays
  * per-query wall clock, so p50/p95 under overlap are directly
  * comparable to the sequential row.
  */
object Serving {

  final case class MixResult(latencies: Map[String, Vector[Double]],
                             unpruned: Int,
                             shapes: Seq[String] =
                               Seq("term", "bool", "phrase", "ranked")) {
    def all: Vector[Double] = shapes.flatMap(latencies.getOrElse(_, Vector.empty)).toVector
    def p(shape: String, q: Double): Double =
      pct(if (shape == "all") all else latencies.getOrElse(shape, Vector.empty), q)
  }

  def pct(xs: Seq[Double], p: Double): Double =
    if (xs.isEmpty) -1.0
    else {
      val s = xs.sorted
      s(math.min(s.size - 1, (p * s.size).toInt))
    }

  /** The index's top-`n` terms by document frequency — the term pool
    * the workload draws from. One index pass, done once per mix setup
    * (a serving deployment's warm dictionary, not a per-query cost).
    */
  def vocabOf(spark: org.apache.spark.sql.SparkSession, idxPath: String,
              n: Int = 60): Array[String] = {
    import org.apache.spark.sql.functions.{col, count, lit}
    sources.IndexStore.load(spark, idxPath)
      .groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term")).limit(n)
      .collect().map(_.getString(0))
  }

  /** `langs` non-empty widens the 4-shape mix with the two r14
    * serving surfaces: `fielded` (`lang:<l> AND term` — `_meta` side
    * table must exist at `idxPath`) and `fuzzy` (`term~1` — served
    * via the `_fuzzy` SymSpell probe when that table exists, else
    * the full-dictionary levenshtein scan; exempt from the pruning
    * counter because the scan fallback cannot bucket-prune by
    * design).
    */
  def mix(spark: org.apache.spark.sql.SparkSession, idxPath: String,
          nBuckets: Int, vocab: Array[String], nQueries: Int = 100,
          threads: Int = 1, prepared: Boolean = false,
          langs: Array[String] = Array.empty): MixResult = {
    // fielded queries interpolate lang values into the query grammar —
    // restrict them to the grammar's token charset (r15): a metadata
    // value carrying whitespace/':'/'~'/parens from a real corpus made
    // parse throw and abort the whole serve block through the catch-all
    val safeLangs = langs.filter(l =>
      l.nonEmpty && l.forall(c => c.isLetterOrDigit || c == '_' || c == '-'))
    val shapes =
      if (safeLangs.isEmpty) Array("term", "bool", "phrase", "ranked")
      else Array("term", "bool", "phrase", "ranked", "fielded", "fuzzy")
    // prepared = the serving-session shape (r13 verdict item 7): ONE
    // IndexStore.open pins the resolved index relation + side tables,
    // every query plans against the held frames (`*On` variants)
    // instead of re-listing the store — the per-query planning floor.
    // Results are parity-specced identical; only latency may differ.
    val oi = if (prepared) Some(sources.IndexStore.open(spark, idxPath, nBuckets))
             else None
    // with the `_fuzzy` SymSpell table present, the fuzzy shape's
    // candidate-probe postings fetch must bucket-prune like any term
    // lookup — only the table-less dictionary-scan fallback earns the
    // pruning-counter exemption
    val fuzzyScans = !sources.IndexStore.hasFuzzy(spark, idxPath)
    def mkQuery(i: Int): (String, () => DataFrame) = {
      val t1 = vocab(i % vocab.length)
      val t2 = vocab((i * 7 + 3) % vocab.length)
      val shape = shapes(i % shapes.length)
      shape -> (shape match {
        case "term" => () => oi match {
          case Some(h) => sources.IndexStore.lookupOn(h, t1)
          case None => sources.IndexStore.lookup(spark, idxPath, t1, nBuckets)
        }
        case "bool" => () => oi match {
          case Some(h) => operators.Query.searchIndexOn(h, s"$t1 AND $t2")
          case None =>
            operators.Query.searchIndex(spark, idxPath, s"$t1 AND $t2", nBuckets)
        }
        case "phrase" => () => oi match {
          case Some(h) => operators.Query.searchIndexOn(h, "\"" + t1 + " " + t2 + "\"")
          case None =>
            operators.Query.searchIndex(spark, idxPath, "\"" + t1 + " " + t2 + "\"", nBuckets)
        }
        case "ranked" => () => oi match {
          case Some(h) => operators.Query.searchRankedIndexOn(h, s"$t1 OR $t2", k = 10)
          case None =>
            operators.Query.searchRankedIndex(spark, idxPath, s"$t1 OR $t2",
              k = 10, nBuckets = nBuckets)
        }
        case "fielded" =>
          val q = s"lang:${safeLangs(i % safeLangs.length)} AND $t1"
          () => oi match {
            case Some(h) => operators.Query.searchIndexOn(h, q)
            case None => operators.Query.searchIndex(spark, idxPath, q, nBuckets)
          }
        case "fuzzy" =>
          val q = s"$t1~1"
          () => oi match {
            case Some(h) => operators.Query.searchIndexOn(h, q)
            case None => operators.Query.searchIndex(spark, idxPath, q, nBuckets)
          }
      })
    }
    val unpruned = new java.util.concurrent.atomic.AtomicInteger(0)
    def run(i: Int): (String, Double) = {
      val (shape, mk) = mkQuery(i)
      val t0 = System.nanoTime()
      val df = mk()
      df.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      // pruned = either a planning-time-pruned layout scan
      // (PartitionFilters — the single-pass branch and every other
      // shape) or NO layout scan at all (the MaxScore branch reads its
      // checkpointed fetch; pruning is audited on the fetch subtree —
      // `searchranked_fetch`). A term_bucket scan WITHOUT
      // PartitionFilters is the regression this counter exists for.
      // the table-less fuzzy fallback is exempt: its dictionary scan
      // reads every bucket BY CONTRACT (an edit can land in any
      // bucket), so an unpruned term_bucket scan is its correct plan
      val plan = df.queryExecution.executedPlan.toString
      val ok = (shape == "fuzzy" && fuzzyScans) ||
        plan.contains("PartitionFilters") || !plan.contains("term_bucket")
      if (!ok) unpruned.incrementAndGet()
      shape -> dt
    }
    val results: Seq[(String, Double)] =
      if (threads <= 1) (0 until nQueries).map(run)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        try {
          val fs = (0 until nQueries).map(i => scala.concurrent.Future(run(i)))
          scala.concurrent.Await.result(
            scala.concurrent.Future.sequence(fs),
            scala.concurrent.duration.Duration(30, "min"))
        } finally pool.shutdown()
      }
    MixResult(
      results.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toVector },
      unpruned.get(), shapes.toSeq)
  }
}
