package graft.operators

import graft.functions.TextFns
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Search-engine core: positional inverted index + retrieval/ranking.
  *
  * Re-expresses the reference's capability surface
  * (/root/reference/src/main/scala/test/App.scala — mapper emits
  * (word, title) → positions, reducer builds word → [(title,
  * positions)]) as declarative Spark plans:
  *
  *  - tokenize+posexplode is a narrow map stage (the "mapper");
  *  - groupBy(term, doc) with count/collect is partial-aggregated
  *    map-side (the reference's in-mapper combiner, App.scala:163-168);
  *  - the final groupBy(term) shuffle is term-partitioned, mirroring
  *    the reference's hash-on-word partitioner intent (App.scala:185).
  *
  * At 100 TB: one wide shuffle keyed on (term, doc) then term; AQE
  * absorbs stopword skew; scans push down the two-column projection
  * (doc_id, text).
  */
object Index {

  /** (id, term, pos) exploded token stream over any document frame —
    * the shared narrow stage every index/search operator builds on.
    * Generic over the id column so TSV-sourced corpora (string titles,
    * like the reference's) index identically to the parquet tables.
    */
  def tokenStreamOf(docs: DataFrame, id: String = "doc_id", text: String = "text",
                    tokenizer: Column => Column = TextFns.tokens): DataFrame =
    docs
      .select(col(id), posexplode(tokenizer(col(text))).as(Seq("pos", "term")))
      .select(col(id), col("term"), col("pos").cast("long").as("pos"))

  def tokenStream(spark: SparkSession, dir: String): DataFrame =
    tokenStreamOf(Tables.documents(spark, dir))

  /** Fielded positional token stream (r15 — per-field text search):
    * one stream per named text field, tagged by a `field` column,
    * positions counted WITHIN each field. `fields` maps a field name
    * to the COLUMN holding its text — derived columns welcome (the
    * gate synthesizes `title` as the first [[TitleTokens]] body
    * tokens, since the corpus carries no separate title text; the
    * machinery itself takes any real title/abstract/anchor column).
    * `body` is the grammar's DEFAULT field: plain term/phrase/NEAR
    * leaves match it alone, `title:term` leaves pick their own.
    */
  def fieldedTokenStreamOf(docs: DataFrame, fields: Map[String, Column],
                           id: String = "doc_id"): DataFrame = {
    require(fields.nonEmpty, "fielded stream needs at least one field")
    fields.toSeq.sortBy(_._1).map { case (f, c) =>
      docs.select(col(id), posexplode(TextFns.tokens(c)).as(Seq("pos", "term")))
        .select(col(id), lit(f).as("field"), col("term"),
          col("pos").cast("long").as("pos"))
    }.reduce(_ unionByName _)
  }

  /** Per-field positional postings — the fielded index layout
    * (field, term, doc, tf, positions). [[graft.sources.IndexStore]]
    * buckets by TERM, so a field-scoped lookup prunes to exactly the
    * same one bucket as a plain term lookup and reads its postings
    * plus a narrow field tag — field never multiplies the bucket
    * count or breaks pruning (spec-audited).
    */
  def fieldedInvertedIndexOf(docs: DataFrame, fields: Map[String, Column],
                             id: String = "doc_id"): DataFrame =
    fieldedTokenStreamOf(docs, fields, id)
      .groupBy(col("field"), col("term"), col(id))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .orderBy(col("field"), col("term"), col(id))

  /** The synthesized `title` field of the gate corpus: its first
    * [[TitleTokens]] body tokens (re-joined, so the field column is
    * real text that round-trips the tokenizer — the DuckDB twin is
    * `pos < TitleTokens` over the shared tok CTE).
    */
  val TitleTokens = 3

  private[operators] def gateFields: Map[String, Column] = Map(
    "body" -> col("text"),
    "title" -> concat_ws(" ",
      slice(TextFns.tokens(col("text")), 1, TitleTokens)))

  /** Positional postings over any document frame (see [[invertedIndex]]). */
  def invertedIndexOf(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    tokenStreamOf(docs, id, text)
      .groupBy(col("term"), col(id))
      .agg(count(lit(1)).as("tf"), sort_array(collect_list(col("pos"))).as("positions"))
      .orderBy(col("term"), col(id))

  // ---- operators -------------------------------------------------------

  def wordcount(spark: SparkSession, dir: String): DataFrame =
    tokenStream(spark, dir)
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .orderBy("term")

  /** [[wordcount]] with an explicit two-stage salted aggregation:
    * stage 1 groups on (term, salt) so a stopword's rows spread over
    * 16 reducers, stage 2 sums the 16 partials. Identical result —
    * this is the manual skew treatment for when a single key exceeds
    * one executor even after map-side partial aggregation (AQE's
    * skew-join handling doesn't split aggregation keys).
    */
  def wordcountSalted(spark: SparkSession, dir: String): DataFrame =
    tokenStream(spark, dir)
      .withColumn("salt", pmod(col("doc_id"), lit(16)))
      .groupBy("term", "salt").agg(count(lit(1)).as("pf"))
      .groupBy("term").agg(sum(col("pf")).as("freq"))
      .orderBy("term")

  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    invertedIndexOf(Tables.documents(spark, dir))

  /** Oracle-comparable projection of [[invertedIndex]]: the positions
    * array is emitted as a comma-joined string (the gate's comparator
    * cannot hash raw array cells).
    */
  def invertedIndexFlat(spark: SparkSession, dir: String): DataFrame =
    invertedIndex(spark, dir)
      .withColumn("positions", array_join(col("positions").cast("array<string>"), ","))

  /** [[wordcount]] under the Unicode tokenizer
    * ([[TextFns.tokensUnicode]]) — the multilingual-corpus variant:
    * punctuation-adjacent and non-Latin words count correctly where
    * the reference's whitespace split (App.scala:162) would not. Same
    * one-shuffle shape as [[wordcount]].
    */
  def wordcountUnicode(spark: SparkSession, dir: String): DataFrame =
    Index.tokenStreamOf(Tables.documents(spark, dir),
        tokenizer = TextFns.tokensUnicode)
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .orderBy("term")

  /** The reference's EXACT position payload: cumulative CHARACTER
    * offsets (App.scala:160 — `position += w.length`, whitespace not
    * counted), next to the engine's token-ordinal postings
    * ([[invertedIndexOf]], which are strictly better for phrase/NEAR
    * and remain the index's native payload; SURVEY §1 documents the
    * divergence this variant closes). offset(i) = Σ len(token_j) for
    * j < i, computed as a doc-keyed window prefix sum — distributed
    * per document, never a global window.
    */
  def invertedIndexCharsOf(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    tokenStreamOf(docs)
      .withColumn("off",
        coalesce(sum(length(col("term"))).over(w), lit(0L)).cast("long"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("off"))).as("positions_chars"))
      .withColumn("positions_chars",
        array_join(col("positions_chars").cast("array<string>"), ","))
      .orderBy("term", "doc_id")
  }

  def invertedIndexChars(spark: SparkSession, dir: String): DataFrame =
    invertedIndexCharsOf(Tables.documents(spark, dir))

  def postingsStats(spark: SparkSession, dir: String): DataFrame =
    tokenStream(spark, dir)
      .groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("total_tf"))
      .orderBy("term")

  /** Index-size vs df-pruning trade-off curve: for df thresholds at
    * 10/25/50/75/90/99% of the corpus size, the index that remains
    * after dropping terms below the threshold — terms kept, postings
    * kept, total tf kept, and the postings share. The thresholds are
    * corpus-RELATIVE (df·100 ≥ pct·N, all-integer — exact at every
    * boundary and meaningful at every SF), because an absolute df
    * cutoff tuned at sf0.01 would be vacuous at 100 TB. The pruning
    * decision runs on the per-term frame (|vocab| rows) against two
    * 1-row broadcasts — the postings themselves are touched once, in
    * the initial (term, doc) rollup.
    */
  def indexPruneCurve(spark: SparkSession, dir: String): DataFrame = {
    val per = tokenStream(spark, dir)
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("ttf"))
    val nd = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val tp = per.agg(sum(col("df")).as("totp"))
    per.crossJoin(broadcast(nd)).crossJoin(broadcast(tp))
      .withColumn("pct_min", explode(array(Seq(10, 25, 50, 75, 90, 99).map(lit): _*)))
      .filter(col("df") * lit(100) >= col("pct_min") * col("n_docs"))
      .groupBy("pct_min")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("df")).as("n_postings"),
        sum(col("ttf")).as("total_tf"),
        round(sum(col("df")).cast("double") /
          first(col("totp")).cast("double"), 6).as("kept_share"))
      .orderBy("pct_min")
  }

  /** Champion lists (impact-ordered index): for every term, only the
    * r = 5 highest-impact postings (tf desc, doc_id tie-break), the
    * standard top-tier structure query-time scoring hits before
    * falling back to the full postings list. At 100 TB the full list
    * for a common term is millions of postings; the champion tier is
    * O(r·|vocab|) and replaces the full scan for most top-k queries.
    * One (term, doc) rollup then a term-partitioned window on it —
    * no shuffle beyond the rollup's own.
    */
  def championLists(spark: SparkSession, dir: String): DataFrame = {
    val per = tokenStream(spark, dir)
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    per.withColumn("rank", row_number().over(
        Window.partitionBy("term").orderBy(col("tf").desc, col("doc_id"))))
      .filter(col("rank") <= 5)
      .select(col("term"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("tf"))
      .orderBy("term", "rank")
  }

  /** All-pairs document similarity by TF-IDF cosine. Terms with
    * df = N carry idf 0 and are dropped up front, leaving a BOUNDED
    * dictionary W of discriminative terms; each document then becomes
    * a dense |W|-dim weight vector (term → index via a broadcast
    * dictionary; one doc-keyed rollup) and the pair computation is
    * the same broadcast nested-loop + codegen'd dot kernel as
    * `embed_neardup` — 12.5M pairs of short dense vectors beat a
    * term-keyed self-join here because a tiny vocabulary gives the
    * join only |W| keys (maximal skew, |corpus|²-sized skewed
    * partitions). With an UNBOUNDED vocabulary the right shape flips
    * to the Bayardo term-keyed index join with prefix filtering —
    * which is exactly the plan `minhash_lsh_pairs`/`simhash_pairs`
    * instantiate for the sketch families. Cosine is rounded to 4dp
    * before the final ordering, the [[tfidfScoredOf]] contract.
    */
  /** Feature-hashing (hashing-trick) TF-IDF vectorizer — Weinberger
    * et al.'s fixed-width text embedding: every term's TF-IDF weight
    * lands in dimension rollingHash(term) mod 16 with the sign bit
    * (rollingHash div 16) mod 2 de-biasing collisions, so EVERY
    * document becomes a 16-dim vector with NO dictionary at all.
    * This is the unbounded-vocabulary answer to the dictionary the
    * [[tfidfCosineDense]] audit twin builds: at 100 TB a dictionary
    * doesn't fit anywhere, but the hashed projection needs zero
    * coordination — each row maps independently at scan speed, and
    * the result feeds the same dense-vector kernels as real
    * embeddings. Emitted exploded as (doc_id, dim, w) rows; the
    * per-(doc, dim) collision sums route through [[Folds]]
    * (term-sorted folds under the gate's bitwise contract, plain
    * partial-agg sums in production).
    */
  def hashingVectorize(spark: SparkSession, dir: String): DataFrame = {
    val base = tokenStream(spark, dir)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfs = base.groupBy("term").agg(count(lit(1)).as("df"))
    val nn = Tables.documents(spark, dir).agg(count(lit(1)).as("n"))
    val w = base.join(dfs, "term").crossJoin(broadcast(nn))
      .withColumn("rh", graft.functions.HashFns.rollingHash(col("term")))
      .select(col("doc_id"), col("term"), (col("rh") % 16).as("dim"),
        (col("tf").cast("double") * log(col("n") / col("df")) *
          when(expr("(rh div 16) % 2") === 0, 1.0).otherwise(-1.0)).as("sw"))
    Folds.groupSums(w, Seq("doc_id", "dim"), col("term"), Seq("wsum" -> col("sw")))
      .select(col("doc_id"), col("dim"), round(col("wsum"), 6).as("w"))
      .orderBy("doc_id", "dim")
  }

  /** Rare-feature blocking fraction for [[tfidfCosinePairs]]: two docs
    * become a candidate pair iff they share a term present in at most
    * this fraction of the corpus. 5% is the standard rare-token
    * blocking bound (entity-resolution practice); it caps the
    * candidate join at Σ_{df≤0.05n} df² while the ubiquitous terms
    * that drive the naive inverted join's d² blowup never key a pair.
    */
  val RareDfFrac = 0.05

  /** Top-20 all-pairs TF-IDF cosine via rare-term blocking + exact
    * rescoring: every join in the plan is TERM-keyed, never doc×doc.
    * Candidates are pairs sharing at least one term with
    * df ≤ [[RareDfFrac]]·n (the blocking key); each candidate then
    * gets the full sparse dot over ALL its shared terms (a term-keyed
    * equijoin — so scores are true corpus-idf cosines, only the
    * candidate RELATION is recall-bounded). This is the same
    * sketch-plus-exact-verify contract as the MinHash/SimHash
    * families: the blocked relation can miss a pair that shares only
    * ubiquitous terms, and the dense-dictionary formulation survives
    * as the sample-bounded audit twin [[tfidfCosineDense]] that
    * prices exactly that recall. (A lossless All-Pairs/PPJoin prefix
    * filter was measured first: on this corpus's deliberately tiny
    * homogeneous vocabulary the suffix bounds prune nothing and it
    * degrades to the quadratic join — 114s at sf0.1 vs ~1s blocked.)
    * At 100 TB the candidate stream is bounded by the rare-posting
    * mass, the dictionary is never materialized, and no broadcast
    * grows with the corpus.
    *
    * DEGENERATE-REGIME GUARD: run the two companions alongside —
    * [[tfidfBlockingCoverage]] (`tfidf_blocking_coverage`, the cheap
    * necessary-condition check) and [[tfidfBlockingRecall]]
    * (`tfidf_blocking_recall`, the decisive sampled recall audit vs
    * exact truth). `regime = 'degenerate'` on either means this
    * top-20 is recall-unbounded on this corpus and a MinHash/winnow
    * candidate set should drive pairing instead.
    */
  def tfidfCosinePairs(spark: SparkSession, dir: String): DataFrame =
    tfidfCosinePairsOf(Tables.documents(spark, dir))

  def tfidfCosinePairsOf(docs: DataFrame): DataFrame = {
    val base = tokenStreamOf(docs).groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val nDf = docs.agg(count(lit(1)).cast("double").as("n"))
    val df = base.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val w = base.join(df, "term").crossJoin(broadcast(nDf))
      .filter(col("df") < col("n"))
      .select(col("doc_id"), col("term"), col("df"), col("n"),
        (col("tf") * log(col("n") / col("df"))).as("w"))
    val rare = w.filter(col("df") <= col("n") * RareDfFrac)
      .select("doc_id", "term")
    val cand = rare.select(col("doc_id").as("doc_a"), col("term"))
      .join(rare.select(col("doc_id").as("doc_b"), col("term")), "term")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    rescoredTop20(cand, docVecsOf(w), extra = Nil)
  }

  /** Per-doc sparse tf-idf vector as a term-sorted map plus its norm —
    * ONE doc-keyed aggregation feeding the pair rescoring (r15, guide
    * §2.3 "aggregate before you shuffle"/§8 "move small rows"). The
    * previous rescore joined each candidate pair with the exploded
    * (doc, term, w) frame — |pairs|·|terms-per-doc| rows through a
    * (doc_b, term)-keyed exchange plus a pair-keyed aggregation
    * (measured sf0.1: 110M rows, 7.3s inside `tfidf_cosine_guarded`).
    * Attaching the map moves the same bytes in |pairs| rows, keyed by
    * doc id only, and the dot collapses to a per-row codegen'd
    * map_zip_with fold — no pair-level aggregation at all.
    */
  private[graft] def docVecsOf(w: DataFrame): DataFrame =
    w.groupBy("doc_id").agg(
      sort_array(collect_list(struct(col("term"), col("w")))).as("tw"),
      sqrt(sum(col("w") * col("w"))).as("nrm"))

  /** Sparse dot of two term-sorted vectors — the codegen'd merge-walk
    * kernel [[graft.functions.VectorFns.sparseDotW]]. Accumulation
    * order is ascending term: DETERMINISTIC, where the previous
    * groupBy sum depended on shuffle arrival order (the oracle already
    * matched that at 4 decimals, so a fixed order is strictly safer).
    * An interpreted `map_zip_with`+`aggregate` spelling was measured
    * first and REJECTED: higher-order functions don't codegen, and the
    * audit leg ran 3.8× slower than the join it replaced.
    */
  private[graft] def mapDot(ta: Column, tb: Column): Column =
    graft.functions.VectorFns.sparseDotW(ta, tb)

  /** Shared tail of the cosine-pair operators: attach each side's
    * vector+norm (doc-keyed joins), per-row map dot, keep positive
    * dots only (dot > 0 ⇔ the pair shares ≥ 1 term, since every w is
    * strictly positive — exactly the pairs the old term-keyed inner
    * join produced), top-20 presentation.
    */
  private def rescoredTop20(cand: DataFrame, dv: DataFrame,
                            extra: Seq[Column]): DataFrame =
    cand
      .join(dv.select(col("doc_id").as("doc_a"), col("tw").as("ta"),
        col("nrm").as("na")), "doc_a")
      .join(dv.select(col("doc_id").as("doc_b"), col("tw").as("tb"),
        col("nrm").as("nb")), "doc_b")
      .withColumn("dot", mapDot(col("ta"), col("tb")))
      .filter(col("dot") > 0.0)
      .select(Seq(col("doc_a"), col("doc_b"),
        round(col("dot") / (col("na") * col("nb")), 4).as("cosine")) ++ extra: _*)
      .orderBy(col("cosine").desc, col("doc_a"), col("doc_b"))
      .limit(20)

  /** The GUARDED composition of [[tfidfCosinePairs]] (r12 VERDICT
    * item 2): the two guard keys measure the blocking regime but a
    * pipeline running only `tfidf_cosine_pairs` still got a silently
    * near-empty top-20 in the degenerate regime — this operator ACTS
    * on the guard. It runs the decisive sampled recall audit
    * ([[tfidfBlockingRecallOf]] — coverage alone is necessary-only:
    * the 100× clone corpus reads coverage 'ok' with true recall
    * 0.000), then drives the candidate relation by the verdict:
    *
    *  - regime 'ok' → the rare-term blocked relation (the 100 TB
    *    shape, unchanged);
    *  - regime 'degenerate' → the UNION of the winnow fingerprint
    *    relation ([[Dedup.winnowCandidatesOf]] — positional ≥8-token
    *    run evidence for textual near-dups, no Zipfian vocabulary
    *    needed) and the dense profile-space rung
    *    ([[profileIvfCandidatesOf]] — r13: in a degenerate vocabulary
    *    similarity can be a pure PROFILE property with no shared rare
    *    term and no shared n-gram run, which only the engine's
    *    dense-ANN shape can see). Both bucket-keyed, never doc×doc.
    *
    * Rescoring is identical either way (full shared-term dot under
    * corpus idf weights), so scores are true cosines and only the
    * candidate relation switches; the `regime` column tells the
    * reader which relation produced the ranking. The branch reads the
    * guard's ONE-row verdict on the driver (a bounded collect, like
    * the trained-model frames): the audit is sample-bounded (~1k docs)
    * at any corpus scale, and planning both relations declaratively
    * would execute the loser too. The audit runs on the SAME
    * checkpointed tf-idf frame the rescoring uses (r14 — one corpus
    * pass where r13 paid two), via [[tfidfBlockingRecallOfW]].
    */
  def tfidfCosineGuarded(spark: SparkSession, dir: String): DataFrame =
    tfidfCosineGuardedOf(Tables.documents(spark, dir))

  def tfidfCosineGuardedOf(docs: DataFrame): DataFrame = {
    val base = tokenStreamOf(docs).groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val nDf = docs.agg(count(lit(1)).cast("double").as("n"))
    val df = base.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    // ONE weighted frame feeds the recall audit, the blocked relation,
    // the norms, the profile rung and the exact rescoring (r13 ran the
    // audit's own token/df build AND this one — two full corpus passes
    // per invocation, and Bench pays the audit a third time as the
    // standalone tfidf_blocking_recall key). localCheckpoint because
    // the audit's verdict is collected eagerly below and the rescoring
    // replays the frame afterwards.
    val w = base.join(df, "term").crossJoin(broadcast(nDf))
      .filter(col("df") < col("n"))
      .select(col("doc_id"), col("term"), col("df"), col("n"),
        (col("tf") * log(col("n") / col("df"))).as("w"))
      .localCheckpoint()
    val regime = tfidfBlockingRecallOfW(w)
      .select("regime").head().getString(0)
    val rare = w.filter(col("df") <= col("n") * RareDfFrac)
      .select("doc_id", "term")
    val blocked = rare.select(col("doc_id").as("doc_a"), col("term"))
      .join(rare.select(col("doc_id").as("doc_b"), col("term")), "term")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val cand =
      if (regime == "ok") blocked
      else
        // the degenerate branch UNIONS the blocked relation in rather
        // than replacing it (r13): a degenerate-vocabulary corpus can
        // still carry partial rare-term structure (measured: the
        // two-generation clone corpus's root-family frame, where the
        // top pairs share an INHERITED low-df suffix token that
        // textual runs and profiles both miss — blocked-only evidence;
        // 0.60 → ~1.0 recall there for the cost of the cheap relation
        // the 'ok' branch runs anyway). Union is monotone: recall can
        // only rise in every frame.
        Dedup.winnowCandidatesOf(docs).select("doc_a", "doc_b")
          .unionByName(profileIvfCandidatesOf(w))
          .unionByName(blocked)
          .distinct()
    rescoredTop20(cand, docVecsOf(w), extra = Seq(lit(regime).as("regime")))
  }

  /** Profile-space fallback dimensions/cells/probes (r13). Constants,
    * not knobs: the DuckDB oracle replays the exact same values.
    *
    * Why cells do NOT scale with the corpus (measured, r13): an
    * adaptive-cells variant (max(16, ⌈n/64⌉), probes fixed) was built,
    * oracle-gated and measured — it cut the sf0.1 bench 40s → 23s but
    * collapsed the committed 100×-clone recall (τ=0.5 0.994 → 0.686,
    * top-50 1.000 → 0.700): on a degenerate corpus co-probe recall
    * tracks the PROBE-MASS FRACTION (probes/cells — the r12 diagnosis
    * ladder's own probe-2-of-16 row reads 0.41), and holding that
    * fraction while growing cells is quadratic again. r14 replaced the
    * other lever instead: the co-probe relation still spans Θ(n²/16)
    * CHEAP 32-dim profile dots, but only each doc's top-[[ProfileCap]]
    * profile neighbors (union-kNN) proceed to the expensive term-keyed
    * exact rescoring — co-probe structure (and so the measured recall
    * floors) unchanged, candidate mass contract-bounded. A production
    * deployment at real scale still tunes cells/probes against its own
    * recall audit (`tfidf_blocking_recall` + `ann_probe_curve` are
    * exactly that tooling) or TRAINS centroids (`ivf_retrain`); the
    * gate pins the 16×4×cap-128 point the committed measurements used.
    */
  val ProfileDims = 32
  val ProfileCells = 16
  val ProfileProbes = 4

  /** Per-doc candidate budget of the profile rung (r14): each doc
    * keeps only its [[ProfileCap]] most PROFILE-similar co-probed
    * neighbors (union-kNN sparsification — the `neardup_pagerank`
    * cap=64 discipline applied to the dense rung), so the candidate
    * mass entering the EXPENSIVE term-keyed exact rescoring is
    * ≤ [[ProfileCap]]·N pairs at ANY duplicate density — a contract,
    * where r13's uncapped co-probe relation carried Θ(n²/cells)
    * by declared design.
    *
    * 384, from a measured cap sweep (r14, CosineRecallStress frames,
    * caps 128/192/256/384): in a saturated-profile regime (clone
    * corpora project onto near-identical profiles) the in-cell
    * similarity RANKING carries little signal beyond co-probe itself,
    * so recall@τ tracks kept-fraction almost linearly — 128 halved
    * the 10× τ=0.5 relation (0.922 → 0.447) and cut the 100×
    * root-family top-50 to 0.80. 384 = ~3× the largest committed
    * clone family (100) and ≥ the ~1k-doc recall frames' typical cell
    * occupancy: measured top-50 1.000 / 0.96 / 0.96 on the three
    * clone frames (= the uncapped values), 100× τ=0.5 0.976-0.977
    * (uncapped 0.981-0.985), 10× τ=0.5 0.856 (uncapped 0.922 — the
    * honest residual; that τ frame is candidate-mass-bound for ANY
    * sub-quadratic generator, see SURVEY §6's honesty note).
    */
  val ProfileCap = 384

  /** The DENSE-REGIME candidate rung of [[tfidfCosineGuardedOf]] (r13):
    * when the vocabulary is degenerate, similarity is a PROFILE
    * property — near-proportional tf-idf weights over the COMMON terms
    * — so truly-similar pairs can share no rare term AND no n-gram run
    * (measured: the 10× clone corpus's top-50 exact-cosine pairs are
    * kept 0.08 / 0.00 by the blocked and winnow relations). The tool
    * for that regime is the engine's own dense-ANN shape
    * (`knn_ivf` / `semantic_dedup`): project each doc onto the corpus's
    * top-[[ProfileDims]]-df terms (exactly the terms rare-term blocking
    * ignores), assign to [[ProfileCells]] deterministic centroids (the
    * [[ProfileCells]] lowest-doc_id profiles — `saveCentroids`' own
    * first-k convention, no training pass), probe the top-
    * [[ProfileProbes]] cells by cosine, and emit each doc's
    * top-[[ProfileCap]] most profile-similar co-probed neighbors
    * (union-kNN — r14; a pair survives when either endpoint keeps the
    * other). Measured on the clone corpora (CosineRecallStress):
    * top-50 recall 1.000 / 0.92, τ=0.3 recall 0.89 / 0.96 — where
    * every textual generator reads ≈ 0.
    *
    * Scale shape: one broadcast [[ProfileDims]]-term dictionary, a
    * vocab-profile rollup, a narrow broadcast-centroid assignment, a
    * cid-keyed pair join whose per-pair work is one codegen'd 32-dim
    * dot, and a per-doc top-cap window — so the candidate relation
    * handed to the term-keyed rescoring is ≤ [[ProfileCap]]·N however
    * dense the corpus ([[ProfileCap]]'s scaladoc prices the cap).
    * All arithmetic is the bitwise cross-engine float→double fold
    * ([[graft.functions.VectorFns.dot]] ↔ OracleSql.dot), so both
    * engines assign identical cells and identical kNN ranks.
    *
    * CONTRACT (r15/r16): the returned relation is normalized
    * (doc_a < doc_b) but MAY CONTAIN DUPLICATES — a pair co-probed in
    * several cells emits once per cell (and the fat-cell block path
    * emits both union-kNN directions). Callers must `.distinct()`
    * after unioning it with their other candidate rungs; the ≤
    * [[ProfileCap]]·N bound holds for the DISTINCT'd relation.
    */
  private[graft] def profileIvfCandidatesOf(w: DataFrame,
                                            cap: Int = ProfileCap): DataFrame = {
    import graft.functions.VectorFns
    val dWin = Window.orderBy(col("df").desc, col("term"))
    val topIdx = w.groupBy("term").agg(max(col("df")).as("df"))
      .orderBy(col("df").desc, col("term")).limit(ProfileDims)
      .select(col("term"), (row_number().over(dWin) - 1).as("idx"))
    val prof = w.join(broadcast(topIdx), "term")
      .groupBy("doc_id")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("idx"), col("w"))))).as("m"))
      .select(col("doc_id"), expr(
        s"transform(sequence(0, ${ProfileDims - 1}), " +
          "i -> cast(coalesce(try_element_at(m, i), 0.0d) as float))").as("emb"))
      .localCheckpoint() // feeds centroid pick + assignment
    // Probe assignment as a NARROW per-row expression (r15): the
    // centroid frame is ≤ [[ProfileCells]] rows BY CONSTANT CONTRACT,
    // so it collects to the driver (the engine's bounded-collect
    // discipline) and each doc's top-[[ProfileProbes]] cells come from
    // sorting a 16-element literal-centroid sim array inside codegen.
    // The previous crossJoin(broadcast)+row_number spelling paid a
    // cells×N-row exchange + sort for the window, and the membership
    // frame then re-joined prof by doc_id for the embedding this
    // projection already has in hand — three exchanges of rung latency
    // for a result the planner can compute in the prof scan itself.
    // sort_array ascending on struct(-sim, cid) IS the window's
    // (sim desc, cid asc) total order: sims are ≥ 0 (weights are
    // strictly positive), so negation introduces no -0.0/0.0 mix, and
    // the centroid self-dots constant-fold at plan time.
    val centRows = prof.orderBy("doc_id").limit(ProfileCells)
      .select(col("doc_id"), col("emb")).collect()
    val simCols = centRows.map { r =>
      val ce = typedLit(r.getSeq[Float](1).toArray)
      struct(
        (-(VectorFns.dot(col("emb"), ce) /
          (sqrt(VectorFns.dot(col("emb"), col("emb"))) *
            sqrt(VectorFns.dot(ce, ce)) + lit(1e-12)))).as("ns"),
        lit(r.getLong(0)).as("cid"))
    }.toSeq
    // union-kNN sparsification (r14; r15 spread the fat-cell compute):
    // inside each probed cell, each doc keeps only its
    // top-[[ProfileCap]] most profile-similar neighbors (sim = the
    // bitwise float→double cosine fold both engines replay; ties by
    // doc id — a total order, so both engines keep identical sets),
    // and a pair survives when EITHER endpoint keeps the other. The
    // declarative twin (co-probe join + distinct + window) was
    // measured 12× slower at sf0.1 because it shuffles the quadratic
    // relation twice; instead the kNN runs as primitive-array kernels
    // over grouped membership rows, in two size regimes:
    //
    //  - cells ≤ `spark.graft.knnCellBlock` members (default 4096):
    //    ONE flatMapGroups task per cell — ≤ blockSize² dots, bounded
    //    memory (one cell's ids + ProfileDims floats per group).
    //  - FAT cells (the r14 verdict's one `weak`: a 100×-degenerate
    //    34k-member cell ran ~10⁹ dots in ONE task, and a bigger one
    //    is a multi-hour task): the cell splits into ⌈m/blockSize⌉
    //    doc_id-ordered blocks; every UNORDERED block pair (bi ≤ bj)
    //    is its own task computing both directions' per-doc
    //    top-[[cap]] PARTIALS (block-nested-loop kNN), and a per-doc
    //    window merges partials to the global top-cap. Any globally
    //    kept neighbor is in its own block's top-cap, so the merged
    //    set is EXACTLY the one-task result (same sims, same
    //    (sim desc, id asc) total order — the oracle is unchanged).
    //    Costs: compute ≤ blockSize² dots per task however fat the
    //    cell; shuffle = rows replicated ⌈m/blockSize⌉× (the standard
    //    block-nested-loop replication) + ≤ nb·cap partials per doc.
    val spark = w.sparkSession
    import spark.implicits._
    val blockSize = spark.conf.get("spark.graft.knnCellBlock", "4096").toInt
    require(blockSize > 0, "spark.graft.knnCellBlock must be positive")
    if (centRows.isEmpty)
      // empty corpus: no cells, no candidates (schema preserved)
      return prof.select(col("doc_id").as("doc_a"),
        col("doc_id").as("doc_b")).limit(0)
    val m0 = prof.select(col("doc_id"), col("emb"),
        explode(slice(sort_array(array(simCols: _*)), 1, ProfileProbes)).as("sc"))
      .select(col("sc.cid").as("cid"), col("doc_id"), col("emb"))
    val csize = m0.groupBy("cid").agg(count(lit(1)).as("csz"))
    val withSz = m0.join(broadcast(csize), "cid") // |cells| rows: broadcast
    def dotf(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var k = 0
      val n = math.min(a.length, b.length)
      while (k < n) { s += a(k).toDouble * b(k).toDouble; k += 1 }
      s
    }
    // per-query bounded-heap kNN of `qs` against `ds`: the heap's root
    // is the WORST kept neighbor under (sim desc, id asc); `same`
    // skips the self pair. Primitive parallel-array heap (r15): the
    // boxed PriorityQueue[(Double, Long)] allocated a tuple per
    // CANDIDATE (25M at sf0.1) — measured 5.1s for a kernel whose
    // arithmetic is ~0.8G flops; the sift loops below keep the kept
    // set bit-identical (same sims, same strict total order).
    def knnPartial(qs: Array[(Long, Array[Float])],
                   ds: Array[(Long, Array[Float])],
                   same: Boolean): Iterator[(Long, Array[Long], Array[Double])] = {
      val qn = qs.map(q => math.sqrt(dotf(q._2, q._2)))
      val dn = if (same) qn else ds.map(d => math.sqrt(dotf(d._2, d._2)))
      // worse(a, b): a ranks strictly below b under (sim desc, id asc)
      @inline def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
        s1 < s2 || (s1 == s2 && i1 > i2)
      qs.indices.iterator.map { i =>
        val qe = qs(i)._2; val qid = qs(i)._1; val qnn = qn(i)
        val hs = new Array[Double](cap)
        val hid = new Array[Long](cap)
        var n = 0
        def siftUp(k0: Int): Unit = {
          var k = k0
          while (k > 0) {
            val p = (k - 1) >> 1
            if (worse(hs(k), hid(k), hs(p), hid(p))) {
              val ts = hs(k); val ti = hid(k)
              hs(k) = hs(p); hid(k) = hid(p); hs(p) = ts; hid(p) = ti
              k = p
            } else return
          }
        }
        def siftDown(): Unit = {
          var k = 0
          while (true) {
            val l = 2 * k + 1; val r = l + 1
            var m = k
            if (l < n && worse(hs(l), hid(l), hs(m), hid(m))) m = l
            if (r < n && worse(hs(r), hid(r), hs(m), hid(m))) m = r
            if (m == k) return
            val ts = hs(k); val ti = hid(k)
            hs(k) = hs(m); hid(k) = hid(m); hs(m) = ts; hid(m) = ti
            k = m
          }
        }
        var j = 0
        while (j < ds.length) {
          if (!(same && j == i)) {
            val s = dotf(qe, ds(j)._2) / (qnn * dn(j) + 1e-12)
            if (n < cap) {
              hs(n) = s; hid(n) = ds(j)._1; n += 1; siftUp(n - 1)
            } else if (worse(hs(0), hid(0), s, ds(j)._1)) {
              hs(0) = s; hid(0) = ds(j)._1; siftDown()
            }
          }
          j += 1
        }
        // ONE object row per query — (qid, kept ids, kept sims) — not
        // one per kept PAIR (r15): the per-pair tuple stream paid the
        // object→Tungsten encoder 7.7M times at sf0.1; the array row
        // pays it once per query and a codegen'd explode unpacks it.
        (qid, java.util.Arrays.copyOf(hid, n), java.util.Arrays.copyOf(hs, n))
      }
    }
    // Per-cell LOCAL dedup before emission (r16, guide §2.3 "shuffle
    // fewer bytes"): union-kNN emits a pair from BOTH endpoints' kept
    // sets, and every caller re-dedupes the union — the callers'
    // distinct was measured re-aggregating 7.7M oriented rows (~3.5s
    // of `tfidf_cosine_guarded` at sf0.1) of which roughly half are
    // the both-direction twins. Each small-path task holds its WHOLE
    // cell's kept sets, so the surviving normalized pair set
    // {(lo, hi) : hi ∈ kept(lo) ∨ lo ∈ kept(hi)} is computable
    // locally: pack each normalized pair as (loRank<<32 | hiRank)
    // over the cell's id-sorted member ranks (m ≤ blockSize < 2³¹),
    // sort the packed array, emit each pair once grouped by lo —
    // primitive-array work only (the r15 kernel discipline).
    // Cross-CELL duplicates still exist; callers must still distinct
    // (operator contract below).
    val small = withSz.filter(col("csz") <= blockSize)
      .select(col("cid"), col("doc_id"), col("emb"))
      .as[(Long, Long, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray
        val m = rows.length
        val sortedIds = rows.map(_._2)
        java.util.Arrays.sort(sortedIds)
        if (m - 1 <= cap) {
          // every in-cell neighbor survives the cap: the kept set is
          // the whole cell — emit each unordered pair exactly once,
          // already normalized (lo < hi by id)
          (0 until m - 1).iterator.map { k =>
            (sortedIds(k), java.util.Arrays.copyOfRange(sortedIds, k + 1, m))
          }
        } else {
          val members = rows.map(r => (r._2, r._3))
          val packed = new scala.collection.mutable.ArrayBuilder.ofLong
          knnPartial(members, members, same = true).foreach { case (qid, nids, _) =>
            val qr = java.util.Arrays.binarySearch(sortedIds, qid).toLong
            var j = 0
            while (j < nids.length) {
              val nr = java.util.Arrays.binarySearch(sortedIds, nids(j)).toLong
              packed += (if (qr < nr) (qr << 32) | nr else (nr << 32) | qr)
              j += 1
            }
          }
          val arr = packed.result()
          java.util.Arrays.sort(arr)
          // sorted packed pairs: duplicates adjacent, groups share lo
          new Iterator[(Long, Array[Long])] {
            private var k = 0
            def hasNext: Boolean = k < arr.length
            def next(): (Long, Array[Long]) = {
              val lo = (arr(k) >>> 32).toInt
              val buf = new scala.collection.mutable.ArrayBuilder.ofLong
              var prev = -1L
              while (k < arr.length && (arr(k) >>> 32).toInt == lo) {
                if (arr(k) != prev)
                  buf += sortedIds((arr(k) & 0xffffffffL).toInt)
                prev = arr(k); k += 1
              }
              (sortedIds(lo), buf.result())
            }
          }
        }
      }.toDF("doc_a", "nbrs")
      .select(col("doc_a"), explode(col("nbrs")).as("doc_b"))
    val wBlk = Window.partitionBy("cid").orderBy("doc_id")
    val repl = withSz.filter(col("csz") > blockSize)
      .withColumn("bid",
        ((row_number().over(wBlk) - 1) / lit(blockSize)).cast("long"))
      .select(col("cid"), col("doc_id"), col("emb"), col("bid"),
        explode(expr(
          s"sequence(0L, (csz + ${blockSize - 1}) div $blockSize - 1)")).as("pb"))
      .select(col("cid"), col("doc_id"), col("emb"), col("bid"),
        least(col("bid"), col("pb")).as("bi"),
        greatest(col("bid"), col("pb")).as("bj"))
      .as[(Long, Long, Array[Float], Long, Long, Long)]
    val partials = repl.groupByKey(r => (r._1, r._5, r._6))
      .flatMapGroups { (key: (Long, Long, Long), it: Iterator[(Long, Long, Array[Float], Long, Long, Long)]) =>
        val (cid, bi, bj) = key
        val rows = it.toArray // ≤ 2·blockSize members per group
        val a = rows.filter(_._4 == bi).map(r => (r._2, r._3))
        val ps = if (bi == bj) knnPartial(a, a, same = true)
        else {
          val b = rows.filter(_._4 == bj).map(r => (r._2, r._3))
          knnPartial(a, b, same = false) ++ knnPartial(b, a, same = false)
        }
        ps.map(t => (cid, t._1, t._2, t._3))
      }.toDF("cid", "qid", "nids", "sims")
      .select(col("cid"), col("qid"),
        explode(arrays_zip(col("nids"), col("sims"))).as("z"))
      .select(col("cid"), col("qid"),
        col("z.nids").as("nid"), col("z.sims").as("sim"))
    // merge partials PER CELL (r16 fix): the window was partitioned by
    // qid alone, so a query co-probing several fat cells merged all
    // its cells' partials into ONE top-cap — and a neighbor sharing
    // k > 1 fat cells contributed k duplicate rows that ate the
    // rk ≤ cap budget (a crafted 4-shared-fat-cell corpus kept 3
    // copies of one neighbor instead of the top 3 neighbors). The
    // declared contract is "merged ≡ the per-cell one-task result":
    // keyed by (cid, qid) each cell's merge sees exactly one partial
    // row per (q, n) — blk(q)×blk(n) is a single group — so row_number
    // ranks distinct neighbors, identically to the small path.
    val wMerge = Window.partitionBy("cid", "qid")
      .orderBy(col("sim").desc, col("nid"))
    val fat = partials
      .withColumn("rk", row_number().over(wMerge))
      .filter(col("rk") <= cap)
      .select(col("qid").as("doc_a"), col("nid").as("doc_b"))
    // normalized but NOT globally distinct'd (r15/r16): every caller
    // unions this relation with the textual rungs and distincts the
    // union — an inner global distinct would be a second full
    // exchange+agg of the pair stream (measured ~4.6s at sf0.1)
    // deduping rows the outer distinct dedupes again. The small path
    // is per-cell-unique (dedup above); the fat path and CROSS-cell
    // co-probes still emit duplicates.
    small.unionByName(fat)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
  }

  /** Coverage floor below which [[tfidfBlockingCoverage]] declares the
    * rare-term blocking regime DEGENERATE. The two measured regimes sit
    * far apart (coverage 1.000 on Zipfian corpora vs ~0.000 on the
    * 31-word clone corpora — CosineRecallStress), so any mid threshold
    * separates them; 0.5 reads as "most docs can't even enter the
    * candidate relation".
    */
  val BlockingCoverageFloor = 0.5

  /** Blocking-coverage guard for [[tfidfCosinePairs]] — the cheap
    * full-corpus NECESSARY-condition check (coverage ~0 ⇒ blocking
    * cannot work; the 10× clone corpus reads 0.05 → 'degenerate').
    * Coverage is NOT sufficient — rare terms can exist yet join the
    * wrong docs (the 100× clone corpus reads coverage 0.905 while
    * true recall is 0.000) — so the DECISIVE guard is the sampled
    * recall audit [[tfidfBlockingRecall]]; run both. The blocked
    * top-20 is contract-correct but RECALL-BLIND when the corpus has
    * no shared rare terms (df ≤ [[RareDfFrac]]·n): candidates need a
    * shared blocking term, and on a tiny homogeneous vocabulary almost
    * no doc contributes one, so the operator silently returns a
    * near-empty ranking (measured: blocking recall 1.000 on Zipfian
    * 50k/500k-doc corpora vs 0.003/0.000 on the 10×/100× clone
    * corpora). This companion prices the precondition ON the corpus,
    * in one term-keyed pass (no doc×doc anywhere):
    *
    *  - `covered_docs` / `coverage`: docs holding ≥1 BLOCK-ELIGIBLE
    *    term (2 ≤ df ≤ 0.05·n — a df=1 term can never key a pair);
    *    coverage is the share of the corpus that can enter the
    *    candidate relation at all.
    *  - `candidate_mass`: Σ df·(df−1)/2 over eligible terms — the
    *    upper bound on the blocked pair relation the join will emit.
    *  - `regime`: 'ok' when coverage ≥ [[BlockingCoverageFloor]],
    *    'degenerate' otherwise — the signal that the top-20 must be
    *    read as recall-unbounded and a MinHash/winnow candidate set
    *    (`neardup_eval` prices that path) should drive pairing
    *    instead.
    *
    * Run it beside every `tfidf_cosine_pairs` production invocation;
    * at 100 TB it costs one tf/df rollup — the same frames the main
    * operator builds anyway.
    */
  def tfidfBlockingCoverage(spark: SparkSession, dir: String): DataFrame =
    tfidfBlockingCoverageOf(Tables.documents(spark, dir))

  /** [[tfidfBlockingCoverage]] over an arbitrary (doc_id, text) frame —
    * the form CosineRecallStress runs against its synthetic corpora so
    * the guard is measured in exactly the regimes the recall audit
    * measures.
    */
  def tfidfBlockingCoverageOf(docs: DataFrame): DataFrame = {
    val base = tokenStreamOf(docs).groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val nDf = docs.agg(count(lit(1)).as("n_docs"))
    val df = base.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val eligible = df.crossJoin(broadcast(nDf))
      .filter(col("df") >= 2.0 && col("df") <= col("n_docs") * RareDfFrac)
    val massTerms = eligible.agg(
      count(lit(1)).as("n_block_terms"),
      coalesce(sum(col("df") * (col("df") - 1.0) / 2.0), lit(0.0)).as("candidate_mass"))
    val covered = base.join(eligible.select("term"), "term")
      .agg(count_distinct(col("doc_id")).as("covered_docs"))
    broadcast(nDf).crossJoin(broadcast(massTerms)).crossJoin(broadcast(covered))
      .select(col("n_docs"), col("n_block_terms"), col("covered_docs"),
        round(col("covered_docs").cast("double") /
          col("n_docs").cast("double"), 6).as("coverage"),
        col("candidate_mass"),
        when(col("covered_docs").cast("double") >=
            col("n_docs").cast("double") * BlockingCoverageFloor, lit("ok"))
          .otherwise(lit("degenerate")).as("regime"))
  }

  /** Top-k depth and recall floor for [[tfidfBlockingRecall]]. */
  val BlockingRecallK = 50
  val BlockingRecallFloor = 0.8

  /** Sampled blocking-RECALL audit for [[tfidfCosinePairs]] — the
    * decisive guard, `neardup_eval`'s sketch-vs-truth contract applied
    * to the rare-term blocking. [[tfidfBlockingCoverage]] prices a
    * NECESSARY condition and catches the 10× clone corpus (coverage
    * 0.05), but coverage alone is not sufficient: on the 100× clone
    * corpus every doc carries a block-eligible per-clone suffix token
    * (coverage 0.905) yet those tokens join docs that are NOT similar
    * while the truly-similar clone families share only ubiquitous
    * terms — measured recall 0.000 with coverage 'ok'. Recall against
    * exact truth is the only signal that closes that gap, so this
    * operator measures it on a bounded deterministic sample:
    *
    *  - sample: docs with doc_id ≡ 0 (mod ⌈n/1024⌉) — ~1k docs at any
    *    corpus scale, so the exact side is ≤ ~0.5M pairs forever;
    *  - truth: the top-[[BlockingRecallK]] in-sample pairs by EXACT
    *    cosine under FULL-corpus tf-idf weights (the quantity
    *    `tfidf_cosine_pairs` is supposed to surface);
    *  - kept: how many of those the rare-term blocking retains;
    *  - regime: 'ok' iff recall ≥ [[BlockingRecallFloor]].
    *
    * At 100 TB: one corpus pass for weights (shared shape with the
    * main operator), then everything runs on the fixed-size sample.
    */
  def tfidfBlockingRecall(spark: SparkSession, dir: String): DataFrame =
    tfidfBlockingRecallOf(Tables.documents(spark, dir))

  def tfidfBlockingRecallOf(docs: DataFrame): DataFrame = {
    val base = tokenStreamOf(docs).groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val nDf = docs.agg(count(lit(1)).cast("double").as("n"))
    val df = base.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    tfidfBlockingRecallOfW(base.join(df, "term").crossJoin(broadcast(nDf))
      .filter(col("df") < col("n"))
      .select(col("doc_id"), col("term"), col("df"), col("n"),
        (col("tf") * log(col("n") / col("df"))).as("w")))
  }

  /** [[tfidfBlockingRecallOf]] over a PREBUILT (doc_id, term, df, n, w)
    * tf-idf frame — the form [[tfidfCosineGuardedOf]] calls so the
    * guard and the rescoring share one corpus pass instead of each
    * rebuilding the token/df rollup (r13 paid the build twice per
    * guarded invocation).
    */
  private[graft] def tfidfBlockingRecallOfW(w: DataFrame): DataFrame = {
    // deterministic ~1k-doc sample; ceil(double) is a long on both
    // engines after the oracle's explicit cast
    val wS = w.filter(col("doc_id") % ceil(col("n") / 1024.0) === 0)
    val sampleN = wS.select("doc_id").distinct()
      .agg(count(lit(1)).as("n_sample"))
    // exact truth via the per-doc vector maps (r15): the sample is
    // ≤ ~1k docs BY CONTRACT, so its vector frame broadcasts and the
    // ≤ ~0.5M ordered pairs stream through a broadcast nested loop
    // with a per-row codegen'd map dot — where the term-keyed
    // self-join materialized |pairs|·|shared terms| rows (15M at
    // sf0.1, 3.1s) through a pair-keyed aggregation. dot > 0 keeps
    // exactly the pairs that share ≥ 1 term (every w > 0), the same
    // relation the term equijoin produced.
    val dvS = docVecsOf(wS)
    val exact = dvS.select(col("doc_id").as("doc_a"), col("tw").as("ta"),
        col("nrm").as("na"))
      .crossJoin(broadcast(dvS.select(col("doc_id").as("doc_b"),
        col("tw").as("tb"), col("nrm").as("nb"))))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("dot", mapDot(col("ta"), col("tb")))
      .filter(col("dot") > 0.0)
      .select(col("doc_a"), col("doc_b"),
        round(col("dot") / (col("na") * col("nb")), 4).as("cosine"))
    val top = exact
      .orderBy(col("cosine").desc, col("doc_a"), col("doc_b"))
      .limit(BlockingRecallK)
    val rareS = wS.filter(col("df") <= col("n") * RareDfFrac)
      .select("doc_id", "term")
    val blocked = rareS.select(col("doc_id").as("doc_a"), col("term"))
      .join(rareS.select(col("doc_id").as("doc_b"), col("term")), "term")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val agg = top
      .join(blocked.withColumn("b", lit(1L)), Seq("doc_a", "doc_b"), "left")
      .agg(count(lit(1)).as("n_true"),
        coalesce(sum(col("b")), lit(0L)).as("n_kept"))
    broadcast(sampleN).crossJoin(broadcast(agg))
      .select(col("n_sample"), lit(BlockingRecallK.toLong).as("k"),
        col("n_true"), col("n_kept"),
        when(col("n_true") === 0L, lit(1.0))
          .otherwise(round(col("n_kept").cast("double") /
            col("n_true").cast("double"), 6)).as("recall"),
        when(col("n_true") === 0L ||
            col("n_kept").cast("double") >=
              col("n_true").cast("double") * BlockingRecallFloor, lit("ok"))
          .otherwise(lit("degenerate")).as("regime"))
  }

  /** The dense-dictionary cosine formulation [[tfidfCosinePairs]] used
    * to run corpus-wide, kept as an explicitly SAMPLE-BOUNDED audit
    * twin (doc_id < 100): materialize |W|-dim vectors over the
    * sample's vocabulary and score every pair with a broadcast loop.
    * The bound is the declared contract — the dense path exists to
    * cross-check the prefix-filtered operator's arithmetic on a slice,
    * exactly like `knn_bruteforce` prices the ANN ladder; it is never
    * the production path.
    */
  def tfidfCosineDense(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 100)
    val base = tokenStreamOf(docs).groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val nDf = docs.agg(count(lit(1)).cast("double").as("n"))
    val df = base.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val w = base.join(broadcast(df), "term").crossJoin(broadcast(nDf))
      .filter(col("df") < col("n"))
      .select(col("doc_id"), col("term"),
        (col("tf") * log(col("n") / col("df"))).as("w"))
    val dict = w.select("term").distinct()
      .withColumn("idx", row_number().over(Window.orderBy("term")))
    val tdim = dict.agg(max(col("idx")).as("tdim"))
    val vec = w.join(broadcast(dict), "term")
      .groupBy("doc_id")
      .agg(map_from_entries(sort_array(collect_list(struct(col("idx"), col("w"))))).as("m"))
      .crossJoin(broadcast(tdim))
      .select(col("doc_id"),
        transform(sequence(lit(1), col("tdim")),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorFns.norm2D(col("v"))))
    vec.select(col("doc_id").as("doc_a"), col("v").as("va"), col("nrm").as("na"))
      .join(broadcast(vec.select(col("doc_id").as("doc_b"), col("v").as("vb"),
        col("nrm").as("nb"))), col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(graft.functions.VectorFns.dotD(col("va"), col("vb")) /
          (col("na") * col("nb")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  def docStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("tk"), col("text"))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("tk")).cast("long").as("n_tokens"),
        size(array_distinct(col("tk"))).cast("long").as("n_distinct"))
      .orderBy("doc_id")

  /** Single-term lookup ranked by tf over any corpus — the
    * parameterized form the `term_search` gate entry instantiates.
    */
  def termSearchOf(docs: DataFrame, term: String,
                   id: String = "doc_id", text: String = "text"): DataFrame =
    tokenStreamOf(docs, id, text)
      .filter(col("term") === term)
      .groupBy(id).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col(id))

  def termSearch(spark: SparkSession, dir: String): DataFrame =
    termSearchOf(Tables.documents(spark, dir), "spark")

  /** Conjunctive boolean retrieval: documents containing ALL `terms`. */
  def boolAndSearchOf(docs: DataFrame, terms: Seq[String],
                      id: String = "doc_id", text: String = "text"): DataFrame =
    tokenStreamOf(docs, id, text)
      .filter(col("term").isin(terms: _*))
      .groupBy(id)
      .agg(countDistinct(col("term")).as("n_hit"))
      .filter(col("n_hit") === terms.distinct.size)
      .select(id)
      .orderBy(id)

  def boolAndSearch(spark: SparkSession, dir: String): DataFrame =
    boolAndSearchOf(Tables.documents(spark, dir), Seq("spark", "join"))

  /** Disjunctive boolean retrieval: per-doc hit count over `terms`. */
  def boolOrSearchOf(docs: DataFrame, terms: Seq[String],
                     id: String = "doc_id", text: String = "text"): DataFrame =
    tokenStreamOf(docs, id, text)
      .filter(col("term").isin(terms: _*))
      .groupBy(id)
      .agg(countDistinct(col("term")).as("n_hit"), count(lit(1)).as("total_tf"))
      .orderBy(id)

  def boolOrSearch(spark: SparkSession, dir: String): DataFrame =
    boolOrSearchOf(Tables.documents(spark, dir), Seq("spark", "filter"))

  /** n-word phrase query via the positional adjacency chain (one
    * doc+offset-keyed join per extra word) — the capability the
    * reference's positional postings exist for. Every word's postings
    * are filtered BEFORE joining.
    */
  def phraseSearchOf(docs: DataFrame, words: Seq[String],
                     id: String = "doc_id", text: String = "text"): DataFrame = {
    require(words.size >= 2, s"phrase needs at least 2 words, got $words")
    val tok = tokenStreamOf(docs, id, text)
    val anchor = tok.filter(col("term") === words.head)
      .select(col(id).as("id0"), col("pos").as("p0"))
    val joined = words.tail.zipWithIndex.foldLeft(anchor) { case (acc, (w, i)) =>
      val f = tok.filter(col("term") === w)
        .select(col(id).as(s"id${i + 1}"), col("pos").as(s"p${i + 1}"))
      acc.join(f, col("id0") === col(s"id${i + 1}") &&
        col(s"p${i + 1}") === col("p0") + (i + 1))
    }
    joined.groupBy(col("id0").as(id))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(id)
  }

  def phraseSearch(spark: SparkSession, dir: String): DataFrame =
    phraseSearchOf(Tables.documents(spark, dir), Seq("key", "order"))

  /** Phrase-prefix retrieval (Lucene's match_phrase_prefix): word at
    * position p, any term with the given prefix at p + 1 — the
    * search-as-you-type phrase operator. Both postings lists filter
    * BEFORE the doc-keyed positional join (the [[phraseSearchOf]]
    * shape; the prefix leg is a pushdown-friendly StartsWith), so at
    * 100 TB the cost is the two filtered postings, never the corpus.
    * Reports match count and how many distinct completions matched.
    */
  def phrasePrefixSearchOf(docs: DataFrame, word: String,
      prefix: String): DataFrame = {
    val tok = tokenStreamOf(docs)
    val a = tok.filter(col("term") === word)
      .select(col("doc_id").as("ida"), col("pos").as("pa"))
    val b = tok.filter(col("term").startsWith(prefix))
      .select(col("doc_id").as("idb"), col("pos").as("pb"),
        col("term").as("completion"))
    a.join(b, col("ida") === col("idb") && col("pb") === col("pa") + 1)
      .groupBy(col("ida").as("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        countDistinct(col("completion")).as("n_completions"))
      .orderBy("doc_id")
  }

  def phrasePrefixSearch(spark: SparkSession, dir: String): DataFrame =
    phrasePrefixSearchOf(Tables.documents(spark, dir), "key", "or")

  private val QueryTerms = Seq("spark", "query", "join")

  /** (doc_id, term, tf) — the per-document term-frequency base both
    * ranking queries derive every statistic from. df/dl/tf branches
    * built on the SAME frame share its scan + tokenize + first shuffle
    * via exchange reuse, instead of re-exploding the corpus per
    * statistic.
    */
  private def tfBaseOf(docs: DataFrame): DataFrame =
    tokenStreamOf(docs)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** (doc_id, score) — TF-IDF score (4dp) of `terms` over any corpus;
    * shared by [[tfidfTopk]] and [[rrfFusion]]. Scores are rounded
    * BEFORE any ordering: a multi-term double sum is addition-order-
    * sensitive at the ulp level, so ranks must come off the rounded
    * value to be cross-engine stable.
    */
  def tfidfScoredOf(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val base = tfBaseOf(docs)
    // Corpus size as a broadcast 1-row aggregate, not a driver action:
    // keeps the plan lazy and the scalar join a BroadcastNestedLoop of 1 row.
    val nDf = docs.agg(count(lit(1)).cast("double").as("n"))
    val df = base.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    // query-term tf goes straight off the token stream: the isin filter
    // is cheap pre-shuffle, and the tiny filtered agg beats routing the
    // query terms through the full corpus-wide base aggregation
    val tf = tokenStreamOf(docs).filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf"))
    tfidfScoredCore(tf, df, nDf)
  }

  /** The TF-IDF scoring formula over prebuilt (tf, df, n) frames — the
    * single definition [[tfidfScoredOf]] and [[rankerEval]] share, so
    * the shared-base evaluation path cannot drift from the standalone
    * ranker the oracle gates.
    */
  private def tfidfScoredCore(tf: DataFrame, df: DataFrame,
      nDf: DataFrame): DataFrame =
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(nDf))
      .withColumn("w", col("tf") * log(col("n") / col("df")))
      .groupBy("doc_id").agg(round(sum(col("w")), 4).as("score"))

  def tfidfTopkOf(docs: DataFrame, terms: Seq[String], k: Int = 20): DataFrame =
    tfidfScoredOf(docs, terms)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  def tfidfTopk(spark: SparkSession, dir: String): DataFrame =
    tfidfTopkOf(Tables.documents(spark, dir), QueryTerms)

  /** (doc_id, score) — BM25 score (4dp, k1=1.2, b=0.75) of `terms`
    * over any corpus; shared by [[bm25Topk]] and [[rrfFusion]]
    * (rounded before ordering, see [[tfidfScoredOf]]).
    */
  def bm25ScoredOf(docs: DataFrame, terms: Seq[String]): DataFrame =
    bm25WeightsOf(docs, terms)
      .groupBy("doc_id").agg(round(sum(col("w")), 4).as("score"))

  /** (doc_id, term, w) — the per-(doc, query-term) BM25 weight frame
    * (k1=1.2, b=0.75) every BM25-family ranker aggregates: candidate
    * docs are exactly those holding ≥1 query term, so the frame is
    * bounded by the query terms' posting lists, never the corpus.
    * Shared by [[bm25ScoredOf]] and the [[wandTopkOf]] pruning ladder.
    */
  def bm25WeightsOf(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val base = tfBaseOf(docs)
    val nDf = docs.agg(count(lit(1)).cast("double").as("n"))
    val dl = base.groupBy("doc_id").agg(sum(col("tf")).cast("double").as("dl"))
    val df = base.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val tf = tokenStreamOf(docs).filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf"))
    bm25WeightsCore(tf, df, dl, nDf)
  }

  /** The BM25 weight formula (k1=1.2, b=0.75) over prebuilt (tf, df,
    * dl, n) frames — single definition shared by [[bm25WeightsOf]]
    * and [[rankerEval]]'s shared-base path (avgdl derives from dl, so
    * feeders agree on it by construction).
    */
  private def bm25WeightsCore(tf: DataFrame, df: DataFrame, dl: DataFrame,
      nDf: DataFrame): DataFrame = {
    val (k1, b) = (1.2, 0.75)
    val avgdlDf = dl.agg(avg(col("dl")).as("avgdl"))
    tf.join(broadcast(df), "term").join(dl, "doc_id")
      .crossJoin(broadcast(nDf)).crossJoin(broadcast(avgdlDf))
      .withColumn("idf", log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("w",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .select("doc_id", "term", "w")
  }

  def bm25TopkOf(docs: DataFrame, terms: Seq[String], k: Int = 20): DataFrame =
    bm25ScoredOf(docs, terms)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  def bm25Topk(spark: SparkSession, dir: String): DataFrame =
    bm25TopkOf(Tables.documents(spark, dir), Seq("spark", "join"))

  /** Query terms of the WAND keys — three mid-df terms so the
    * upper-bound pruning has something to prune.
    */
  private val WandTerms = Seq("vector", "merge", "stream")

  /** The WAND/MaxScore frames (Broder et al. CIKM'03; Turtle & Flood's
    * MaxScore), re-expressed SET-at-a-time for Spark: per-term maximum
    * contribution UB_t = max_d w(t,d) bounds any doc's score by the sum
    * of UB_t over the query terms it contains, so the exact top-k only
    * ever needs full scoring of docs whose bound reaches the running
    * threshold. Document-at-a-time pointer movement doesn't map to a
    * declarative plan, but the same pruning algebra does, in two
    * phases: (1) exactly score the k docs with the HIGHEST bounds —
    * their minimum exact score is the threshold θ; (2) score only docs
    * with bound ≥ θ. Any skipped doc has rounded score ≤ rounded bound
    * < θ (round is monotone), so the result is EXACTLY the full BM25
    * top-k — the oracle asserts that equality, not an approximation.
    * Returns (w, docUb, theta, pruned): the weight frame, per-doc
    * bounds, 1-row threshold, and the pruned doc set.
    *
    * Scale shape: w is bounded by the query terms' posting lists (never
    * the corpus); UB is a |terms|-row broadcast; seed selection is a
    * bounded TakeOrdered heap; θ is a 1-row broadcast. Sums fold in
    * sorted term order through [[Folds.groupSums]] so the multi-term
    * double addition is cross-engine deterministic.
    */
  private def wandFrames(docs: DataFrame, terms: Seq[String], k: Int):
      (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // one materialization feeds the UB branch, the seed scoring and the
    // final scoring (three consumers of the same posting-bounded frame)
    val w = bm25WeightsOf(docs, terms).localCheckpoint()
    val ub = w.groupBy("term").agg(max(col("w")).as("ubt"))
    val docUb = Folds.groupSums(w.join(broadcast(ub), "term"),
        Seq("doc_id"), col("term"), Seq("ub" -> col("ubt")))
      .select(col("doc_id"), round(col("ub"), 4).as("ub"))
    val seed = docUb.orderBy(col("ub").desc, col("doc_id")).limit(k)
    val theta = Folds.groupSums(w.join(seed.select("doc_id"), "doc_id"),
        Seq("doc_id"), col("term"), Seq("s" -> col("w")))
      .select(round(col("s"), 4).as("score"))
      .agg(min(col("score")).as("theta"))
    val pruned = docUb.crossJoin(broadcast(theta))
      .filter(col("ub") >= col("theta")).select("doc_id")
    (w, docUb, theta, pruned)
  }

  def wandTopkOf(docs: DataFrame, terms: Seq[String], k: Int = 20): DataFrame = {
    val (w, _, _, pruned) = wandFrames(docs, terms, k)
    Folds.groupSums(w.join(pruned, "doc_id"),
        Seq("doc_id"), col("term"), Seq("s" -> col("w")))
      .select(col("doc_id"), round(col("s"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Exact BM25 top-20 through the MaxScore pruning ladder — the
    * oracle is the UNPRUNED exact ranking, so correctness of the
    * bound-and-verify algebra itself is what the gate asserts.
    */
  def wandTopk(spark: SparkSession, dir: String): DataFrame =
    wandTopkOf(Tables.documents(spark, dir), WandTerms)

  /** Ranker evaluation harness — the IR-metric sibling of the ANN
    * family's `ann_recall*` audits: nDCG@10 and MRR of the BM25,
    * TF-IDF and query-likelihood rankers for one query, against a
    * graded pseudo-qrel (the BM25 top-20 with grade 21−rank — so the
    * bm25 row is the fixed point ndcg=1, mrr=1 that validates the
    * metric pipeline, and the other rows price each cheaper ranker's
    * agreement with it). DCG sums fold in rank order through
    * [[Folds.groupSums]] (10 doubles — addition order must be pinned
    * cross-engine); every ranker list and the qrel are bounded
    * TakeOrdered frames.
    *
    * All three rankers (and the qrel's 4th run) evaluate off ONE
    * materialized (doc_id, term, tf) base: each standalone ranker
    * pipeline re-tokenizes the corpus for its df/dl/tf statistics (22
    * Generate nodes, 33 scans in the naive 4-ranker plan — Catalyst
    * does not dedupe the identical subtrees across the union), so the
    * base is checkpointed once and every statistic derives from it
    * through the same `*Core` scoring definitions the standalone
    * oracle-gated rankers use — shared-base evaluation cannot drift
    * from the rankers it evaluates.
    */
  def rankerEval(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val terms = Seq("spark", "join")
    val base = tfBaseOf(docs).localCheckpoint() // one tokenize, 8 consumers
    val nDf = docs.agg(count(lit(1)).cast("double").as("n"))
    val df = base.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val dl = base.groupBy("doc_id").agg(sum(col("tf")).cast("double").as("dl"))
    val cDf = base.agg(sum(col("tf")).cast("double").as("c"))
    val cf = base.filter(col("term").isin(terms: _*))
      .groupBy("term").agg(sum(col("tf")).cast("double").as("cf"))
    val tf = base.filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"), col("tf").cast("double").as("tf"))
    val bm25Scored = bm25WeightsCore(tf, df, dl, nDf)
      .groupBy("doc_id").agg(round(sum(col("w")), 4).as("score"))
    def topk(scored: DataFrame, k: Int): DataFrame =
      scored.orderBy(col("score").desc, col("doc_id")).limit(k)
    val wS = Window.orderBy(col("score").desc, col("doc_id"))
    val truth = topk(bm25Scored, 20)
      .withColumn("rt", row_number().over(wS).cast("long"))
      .select(col("doc_id"), (lit(21L) - col("rt")).as("rel"))
      .localCheckpoint() // read by idcg + all three ranker joins
    val idcg = Folds.groupSums(
      truth.orderBy(col("rel").desc).limit(10)
        .withColumn("i", row_number().over(Window.orderBy(col("rel").desc)).cast("long"))
        .withColumn("g", col("rel").cast("double") /
          (log(col("i").cast("double") + 1.0) / log(lit(2.0)))),
      Seq(), col("i"), Seq("idcg" -> col("g")))
    def ranked(df: DataFrame): DataFrame =
      df.withColumn("ri", row_number().over(wS).cast("long"))
        .select("doc_id", "ri")
    val m = Seq(
      "bm25" -> ranked(topk(bm25Scored, 10)),
      "tfidf" -> ranked(topk(tfidfScoredCore(tf, df, nDf), 10)),
      "qlm" -> ranked(topk(qlmScoredCore(tf, dl, cf, cDf), 10)))
      .map { case (nm, r) =>
        r.join(truth, Seq("doc_id"), "left")
          .select(lit(nm).as("ranker"), col("ri"),
            coalesce(col("rel"), lit(0L)).cast("double").as("rel"))
      }.reduce(_ unionByName _)
    val dcg = Folds.groupSums(
      m.withColumn("g", col("rel") /
        (log(col("ri").cast("double") + 1.0) / log(lit(2.0)))),
      Seq("ranker"), col("ri"), Seq("dcg" -> col("g")))
    val mrr = m.groupBy("ranker")
      .agg(min(when(col("rel") > 0, col("ri"))).as("fr"))
    dcg.join(mrr, "ranker").crossJoin(broadcast(idcg))
      .select(col("ranker"),
        round(col("dcg") / col("idcg"), 6).as("ndcg10"),
        round(coalesce(lit(1.0) / col("fr"), lit(0.0)), 6).as("mrr"))
      .orderBy("ranker")
  }

  /** The pruning diagnostic next to [[wandTopk]]: candidate docs
    * (≥1 query term), docs surviving the bound ≥ θ filter (the only
    * ones phase 2 scores), and θ itself — the numbers that say how
    * much posting-list work MaxScore skips on this corpus before
    * trusting it at 100 TB.
    */
  def wandPruneStats(spark: SparkSession, dir: String): DataFrame = {
    val (_, docUb, theta, pruned) = wandFrames(
      Tables.documents(spark, dir), WandTerms, 20)
    docUb.agg(count(lit(1)).as("n_candidates"))
      .crossJoin(broadcast(pruned.agg(count(lit(1)).as("n_scored"))))
      .crossJoin(broadcast(theta))
  }

  /** Query-likelihood ranking with Dirichlet smoothing (Zhai & Lafferty
    * SIGIR'01) — the LM-based alternative to BM25:
    * score(q,d) = Σ_t ln((tf + μ·cf(t)/|C|) / (dl + μ)), μ=100. The
    * candidate set is docs containing ≥1 query term (everything else
    * ties at the background score); a missing term still contributes
    * its smoothed background mass via the left join's tf=0 branch.
    * Collection stats (cf, |C|) are 1-to-few-row broadcast aggregates;
    * the per-doc sum routes through [[Folds]] (term-sorted fold under
    * the gate's bitwise contract, plain partial-agg sum in
    * production mode).
    */
  def qlmTopkOf(docs: DataFrame, qterms: Seq[String], k: Int = 20): DataFrame = {
    val base = tfBaseOf(docs)
    val dl = base.groupBy("doc_id").agg(sum(col("tf")).cast("double").as("dl"))
    val cDf = base.agg(sum(col("tf")).cast("double").as("c"))
    val cf = base.filter(col("term").isin(qterms: _*))
      .groupBy("term").agg(sum(col("tf")).cast("double").as("cf"))
    val tf = tokenStreamOf(docs).filter(col("term").isin(qterms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf"))
    qlmScoredCore(tf, dl, cf, cDf)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** The Dirichlet-smoothed QL scoring formula (μ=100) over prebuilt
    * (tf, dl, cf, c) frames — single definition shared by
    * [[qlmTopkOf]] and [[rankerEval]]'s shared-base path.
    */
  private def qlmScoredCore(tf: DataFrame, dl: DataFrame, cf: DataFrame,
      cDf: DataFrame): DataFrame = {
    val mu = 100.0
    val scored = tf.select("doc_id").distinct()
      .crossJoin(broadcast(cf.crossJoin(cDf)))
      .join(tf, Seq("doc_id", "term"), "left")
      .join(dl, "doc_id")
      .withColumn("w",
        log((coalesce(col("tf"), lit(0.0)) + lit(mu) * col("cf") / col("c")) /
          (col("dl") + lit(mu))))
    Folds.groupSums(scored, Seq("doc_id"), col("term"), Seq("wsum" -> col("w")))
      .select(col("doc_id"), round(col("wsum"), 4).as("score"))
  }

  def qlmTopk(spark: SparkSession, dir: String): DataFrame =
    qlmTopkOf(Tables.documents(spark, dir), Seq("spark", "join"))

  /** Hybrid rank fusion: reciprocal rank fusion (RRF, Cormack et al.
    * SIGIR'09) of the BM25 and TF-IDF rankings —
    * rrf = Σ_r 1/(60 + rank_r), a doc missing from a ranker's
    * top-200 contributes 0 for that ranker. Each leg is a TakeOrdered
    * top-200 heap BEFORE rank assignment, so the single-partition rank
    * window only ever sees 200 rows regardless of how common the query
    * terms are; fusion is one full-outer join of the two ≤200-row
    * lists. The score is a fixed two-term expression of integer
    * ranks — bitwise cross-engine.
    */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    // each ranker leg is candidate-bounded BEFORE rank assignment: the
    // top-200 heap (TakeOrdered, same discipline as hybrid_search) caps
    // what the single-partition rank window ever sees at 200 rows — a
    // stopword-ish query term can no longer drag a corpus-sized frame
    // through one task (oracle mirrors the same LIMIT 200)
    def ranked(scored: DataFrame, rankCol: String): DataFrame =
      scored.orderBy(col("score").desc, col("doc_id")).limit(200)
        .withColumn(rankCol,
          row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col(rankCol))
    val docs = Tables.documents(spark, dir)
    val rb = ranked(bm25ScoredOf(docs, Seq("spark", "join")), "rank_bm25")
    val rt = ranked(tfidfScoredOf(docs, QueryTerms), "rank_tfidf")
    rb.join(rt, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60.0) + col("rank_bm25")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("rank_tfidf")), lit(0.0)), 6))
      // rank 0 = "not in this ranker's candidate set": nullable int
      // columns degrade to float64 in the gate's pandas comparator
      .select(col("doc_id"), coalesce(col("rank_bm25"), lit(0L)).as("rank_bm25"),
        coalesce(col("rank_tfidf"), lit(0L)).as("rank_tfidf"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  /** Dictionary prefix lookup: vocabulary terms starting with "s" with
    * their document and collection frequencies — the wildcard/prefix
    * query surface of a term dictionary. Runs over the aggregated
    * vocabulary (tiny), and the StartsWith predicate is
    * pushdown-eligible when the dictionary is stored term-sorted
    * ([[graft.sources.IndexStore]]).
    */
  def prefixSearchOf(docs: DataFrame, prefix: String): DataFrame =
    tokenStreamOf(docs)
      .filter(col("term").startsWith(prefix))
      .groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("total_tf"))
      .orderBy("term")

  def prefixSearch(spark: SparkSession, dir: String): DataFrame =
    prefixSearchOf(Tables.documents(spark, dir), "s")

  /** n-term NEAR/k: documents where ALL `terms` co-occur inside a
    * `window`-position span, with the number of qualifying position
    * tuples and the tightest span — the ranked proximity operator
    * positional postings exist for (phrase search is the
    * window = n−1, ordered special case). Every postings list is
    * filtered BEFORE the join chain, so each join is tiny-on-tiny,
    * and all joins are doc-keyed — at 100 TB the cost is the terms'
    * postings, never the corpus.
    */
  def proximitySearchOf(docs: DataFrame, terms: Seq[String], window: Int,
                        id: String = "doc_id", text: String = "text"): DataFrame = {
    require(terms.size >= 2, s"NEAR needs at least 2 terms, got $terms")
    val tok = tokenStreamOf(docs, id, text)
    val frames = terms.zipWithIndex.map { case (t, i) =>
      tok.filter(col("term") === t)
        .select(col(id).as(s"id$i"), col("pos").as(s"p$i"))
    }
    val joined = frames.tail.zipWithIndex.foldLeft(frames.head) {
      case (acc, (f, i)) => acc.join(f, col("id0") === col(s"id${i + 1}"))
    }
    val ps = terms.indices.map(i => col(s"p$i"))
    val span = greatest(ps: _*) - least(ps: _*)
    joined.filter(span <= window)
      .groupBy(col("id0").as(id))
      .agg(count(lit(1)).as("n_matches"), min(span).as("min_span"))
      .orderBy(id)
  }

  /** Proximity search gate entry: "spark" NEAR/5 "join" — the 2-term
    * instantiation of [[proximitySearchOf]] (span of a pair = their
    * absolute distance).
    */
  def proximitySearch(spark: SparkSession, dir: String): DataFrame =
    proximitySearchOf(Tables.documents(spark, dir), Seq("spark", "join"), 5)
      .withColumnRenamed("n_matches", "n_pairs")
      .withColumnRenamed("min_span", "min_dist")

  /** 3-term NEAR/5 gate entry: the >2-term positional plan
    * ([[proximitySearchOf]] chains one doc-keyed join per extra term).
    */
  def proximity3Search(spark: SparkSession, dir: String): DataFrame =
    proximitySearchOf(Tables.documents(spark, dir), Seq("spark", "join", "filter"), 5)

  def topTermsPerDoc(spark: SparkSession, dir: String): DataFrame = {
    val tf = tokenStream(spark, dir)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("term"))
    tf.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .orderBy("doc_id", "rk")
  }

  /** Per-bucket index BALANCE report for an nBuckets choice (8 here)
    * — the operational check behind the reference's num-reducers knob
    * (App.scala:185 hash-on-word partitioner): distinct terms,
    * posting rows and total tf per term bucket, with the bucket
    * computed by the SAME rolling-hash kernel the IndexStore layout
    * partitions on. A skewed bucket here is a hot reducer there —
    * this is the report that justifies (or resizes) the fan-out
    * before a 100 TB index build.
    */
  def indexStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashFns
    invertedIndex(spark, dir)
      .withColumn("bucket", HashFns.rollingHash(col("term")) % 8)
      .groupBy("bucket")
      .agg(countDistinct(col("term")).as("n_terms"),
        count(lit(1)).as("n_postings"),
        sum(col("tf")).as("total_tf"))
      .orderBy("bucket")
  }

  /** "More like this" — doc-to-doc retrieval, Lucene's MLT shape:
    * each target document (doc_id < 5) is summarized to its top-5
    * TF-IDF terms, and ONLY those terms' posting weights are scored
    * (sum of the candidate's tf·ln(N/df) over the shared query
    * terms), top-10 per target. Cost is bounded by the expanded
    * query (≤ targets × 5 posting lists joined term-keyed), never
    * doc × doc — the related-documents surface at any corpus size.
    * The multi-term score sum routes through [[Folds]] (term-sorted
    * under the gate's bitwise contract — a 5-term plain sum would be
    * association-order-sensitive — plain partial agg in production).
    */
  def mltTopk(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = tfBaseOf(docs)
    val nDf = docs.agg(count(lit(1)).cast("double").as("n"))
    val dfT = base.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val weights = base.join(broadcast(dfT), "term").crossJoin(broadcast(nDf))
      .withColumn("w", col("tf").cast("double") * log(col("n") / col("df")))
    val wq = Window.partitionBy("doc_id").orderBy(col("w").desc, col("term"))
    val qterms = weights.filter(col("doc_id") < 5)
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= 5)
      .select(col("doc_id").as("target_doc"), col("term"))
    val cand = weights.join(broadcast(qterms), "term")
      .filter(col("doc_id") =!= col("target_doc"))
    val wr = Window.partitionBy("target_doc")
      .orderBy(col("score").desc, col("doc_id"))
    Folds.groupSums(cand, Seq("target_doc", "doc_id"), col("term"),
        Seq("s" -> col("w")))
      .withColumn("score", round(col("s"), 4))
      .withColumn("rk", row_number().over(wr).cast("long"))
      .filter(col("rk") <= 10)
      .select(col("target_doc"), col("rk"), col("doc_id"), col("score"))
      .orderBy("target_doc", "rk")
  }

  /** Pseudo-relevance-feedback query expansion (Rocchio's selection
    * step, counts-only): run the seed query ('spark join') through
    * BM25, take the top-10 docs as the FEEDBACK SET, and surface the
    * terms that best characterize it — ranked by feedback document
    * frequency (desc: in how many of the 10 the term appears), then
    * GLOBAL df (asc: rarer = more discriminative, the ln(N/df) factor
    * ordinalized so the report stays integer-exact), then term. The
    * feedback set is 10 ids broadcast into the token scan — cost is
    * one pass over ≤10 documents' tokens plus the vocabulary df
    * rollup the ranking ops already share; nothing scales with corpus
    * size beyond the index itself (reference's word-count reduce,
    * App.scala:163-168, composed behind a first-pass ranking).
    */
  def prfExpand(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val fb = bm25ScoredOf(docs, QueryTerms)
      .orderBy(col("score").desc, col("doc_id")).limit(10)
      .select("doc_id")
    val base = tfBaseOf(docs)
    val dfT = base.groupBy("term").agg(count(lit(1)).as("df"))
    base.join(broadcast(fb), "doc_id")
      .filter(!col("term").isin(QueryTerms: _*))
      .groupBy("term").agg(count(lit(1)).as("fb_df"))
      .join(dfT, "term")
      .select(col("term"), col("fb_df"), col("df"))
      .orderBy(col("fb_df").desc, col("df").asc, col("term"))
      .limit(20)
  }

  /** Spelling-correction candidates, SymSpell's selection heuristic:
    * every vocabulary term within edit distance 2 of a top-100
    * dictionary term AND strictly rarer than it (a misspelling is an
    * infrequent neighbor of a frequent word; without the frequency
    * gate every inflection pair would surface). The dictionary is 100
    * rows broadcast into a nested-loop join over the VOCABULARY (not
    * the token stream), with the |len difference| ≤ 2 band checked
    * before the levenshtein call so codegen skips the O(len²) DP for
    * most pairs — at any corpus size the cost is |vocab|×100 cheap
    * comparisons after one aggregation the ranking ops already share
    * ([[fuzzyTermOf]] is the single-query probe; this is the
    * whole-dictionary sweep).
    */
  def spellCandidates(spark: SparkSession, dir: String): DataFrame = {
    val vocab = tokenStreamOf(Tables.documents(spark, dir))
      .groupBy("term").agg(count(lit(1)).as("freq"))
    val dict = vocab.orderBy(col("freq").desc, col("term")).limit(100)
      .select(col("term").as("dict_term"), col("freq").as("dict_freq"))
    vocab.join(broadcast(dict),
        col("term") =!= col("dict_term") &&
        abs(length(col("term")) - length(col("dict_term"))) <= 2 &&
        levenshtein(col("term"), col("dict_term")) <= 2 &&
        col("freq") < col("dict_freq"))
      .select(col("term"), col("freq"), col("dict_term"), col("dict_freq"),
        levenshtein(col("term"), col("dict_term")).cast("long").as("dist"))
      .orderBy("term", "dict_term")
  }

  /** Whole-query spelling correction — the serving-side consumer of
    * [[spellCandidates]]' dictionary sweep: each query term maps to
    * its best vocabulary term by (edit distance ≤ 2, then collection
    * frequency desc, then alpha) — the SymSpell lookup direction, one
    * argmin per query term. An in-vocabulary term corrects to itself
    * at distance 0 (freq ties cannot demote an exact hit). The
    * distance scan is |vocab| × |query| against the aggregated
    * vocabulary (never the token stream), query side broadcast.
    */
  def spellCorrectOf(docs: DataFrame, query: Seq[String]): DataFrame = {
    val vocab = tokenStreamOf(docs)
      .groupBy("term").agg(count(lit(1)).as("freq"))
    val qdf = docs.sparkSession.range(1)
      .select(explode(array(query.map(lit): _*)).as("q"))
    val wQ = Window.partitionBy("q")
      .orderBy(col("dist"), col("freq").desc, col("term"))
    vocab.join(broadcast(qdf),
        abs(length(col("q")) - length(col("term"))) <= 2 &&
        levenshtein(col("q"), col("term")) <= 2)
      .withColumn("dist", levenshtein(col("q"), col("term")).cast("long"))
      .withColumn("rn", row_number().over(wQ))
      .filter(col("rn") === 1)
      .select(col("q").as("query_term"), col("term").as("corrected"),
        col("dist"), col("freq"))
      .orderBy("query_term")
  }

  def spellCorrect(spark: SparkSession, dir: String): DataFrame =
    spellCorrectOf(Tables.documents(spark, dir), Seq("spak", "jion", "merge"))

  /** Faceted search — the result-page sidebar every search engine
    * renders beside the hit list: for the documents matching a term,
    * hit counts per (facet, value) over the metadata fields (lang,
    * source). One narrow `array_contains` filter (no explode — the
    * match test runs inside the scan stage) and one |facets×values|
    * rollup; at 100 TB the aggregate is metadata-cardinality-sized,
    * never corpus-sized.
    */
  def facetCountsOf(docs: DataFrame, term: String): DataFrame =
    docs.filter(array_contains(TextFns.tokens(col("text")), term))
      .select(explode(array(
        struct(lit("lang").as("facet"), col("lang").as("value")),
        struct(lit("source").as("facet"), col("source").as("value")))).as("f"))
      .groupBy(col("f.facet").as("facet"), col("f.value").as("value"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("facet", "value")

  def facetCounts(spark: SparkSession, dir: String): DataFrame =
    facetCountsOf(Tables.documents(spark, dir), "spark")

  /** Fuzzy term lookup: vocabulary terms within edit distance 1 of the
    * query, with their collection frequency — "did you mean". The
    * distance runs over the (tiny, aggregated) vocabulary, never the
    * token stream.
    */
  def fuzzyTermOf(docs: DataFrame, query: String, maxDist: Int = 1): DataFrame =
    tokenStreamOf(docs)
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .withColumn("dist", levenshtein(col("term"), lit(query)).cast("long"))
      .filter(col("dist") <= maxDist)
      .orderBy("dist", "term")

  def fuzzyTerm(spark: SparkSession, dir: String): DataFrame =
    fuzzyTermOf(Tables.documents(spark, dir), "spark")

  /** Regex retrieval: documents matching a pattern, with match count
    * per doc — grep over the corpus, pushdown-friendly (the rlike
    * filter runs in the scan stage).
    */
  def regexSearchOf(docs: DataFrame, pattern: String): DataFrame =
    docs
      .filter(col("text").rlike(pattern))
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(pattern), lit(0))).cast("long").as("n_matches"))
      .orderBy("doc_id")

  def regexSearch(spark: SparkSession, dir: String): DataFrame =
    regexSearchOf(Tables.documents(spark, dir), "qu[ae]ry")

  /** Keyword-in-context: every occurrence of the query term with a
    * ±2-token window — the user-facing payoff of *positional*
    * postings (the reference stores positions for exactly this).
    * Narrow stage: posexplode with the token array retained, context
    * sliced from the same array.
    */
  def kwic(spark: SparkSession, dir: String): DataFrame =
    kwicOf(Tables.documents(spark, dir), "spark")

  def kwicOf(docs: DataFrame, term: String): DataFrame =
    docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"), posexplode(col("tk")).as(Seq("pos", "term")))
      .filter(col("term") === term)
      .withColumn("start1", greatest(col("pos") - 1, lit(1)))
      .withColumn("end1", least(col("pos") + 3, size(col("tk"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        array_join(slice(col("tk"), col("start1"),
          col("end1") - col("start1") + 1), " ").as("context"))
      .orderBy("doc_id", "pos")

  /** Bigram collocations by pointwise mutual information:
    * pmi = ln(f_ab * N / (f_a * f_b)) over exact integer counts
    * (products stay under 2^53, so the double is exact and the log is
    * bitwise cross-engine). min f_ab >= 5, top 20.
    */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
    val uni = toks.select(explode(col("tk")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("f"))
    val nTotal = uni.agg(sum(col("f")).cast("double").as("n"))
    // adjacent-pair zip of tk[0..n-2] with tk[1..n-1]: slice+arrays_zip
    // are codegen'd expressions, vs the transform(sequence(...)) lambda
    // formulation which interprets per element (size guard: slice
    // throws on negative length for 0/1-token docs)
    val bi = toks
      .select(explode(when(size(col("tk")) >= 2,
        arrays_zip(slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1)))
        .otherwise(array().cast("array<struct<`0`:string,`1`:string>>"))).as("bg"))
      .select(col("bg.0").as("term_a"), col("bg.1").as("term_b"))
      .groupBy("term_a", "term_b").agg(count(lit(1)).as("f_ab"))
      .filter(col("f_ab") >= 5)
    bi.join(broadcast(uni.select(col("term").as("term_a"), col("f").as("fa"))), "term_a")
      .join(broadcast(uni.select(col("term").as("term_b"), col("f").as("fb"))), "term_b")
      .crossJoin(broadcast(nTotal))
      .select(col("term_a"), col("term_b"), col("f_ab"),
        round(log(col("f_ab").cast("double") * col("n") /
          (col("fa").cast("double") * col("fb").cast("double"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("term_a"), col("term_b"))
      .limit(20)
  }

  /** Result-page snippet: for each matching document, the FIRST
    * occurrence of the query term rendered as
    * "… left context [term] right context …" (±3 tokens, ellipses
    * only where text continues) — the human-facing layer over the
    * positional postings [[kwic]] exposes raw. One narrow pass:
    * the first-occurrence argmin folds into the same groupBy that
    * carries the token array, so no second scan or join.
    */
  def snippetExtract(spark: SparkSession, dir: String): DataFrame =
    snippetExtractOf(Tables.documents(spark, dir), "spark")

  def snippetExtractOf(docs: DataFrame, term: String, win: Int = 3): DataFrame = {
    docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
      .withColumn("pos", array_position(col("tk"), term)) // 1-based, 0 = absent
      .filter(col("pos") > 0)
      .withColumn("s", greatest(col("pos") - win, lit(1L)))
      .withColumn("e", least(col("pos") + win, size(col("tk")).cast("long")))
      .select(col("doc_id"), (col("pos") - 1).as("pos"),
        concat(
          when(col("s") > 1, lit("… ")).otherwise(lit("")),
          array_join(slice(col("tk"), col("s").cast("int"), (col("pos") - col("s")).cast("int")), " "),
          when(col("pos") > col("s"), lit(" ")).otherwise(lit("")),
          lit("["), lit(term), lit("]"),
          when(col("e") > col("pos"), lit(" ")).otherwise(lit("")),
          array_join(slice(col("tk"), (col("pos") + 1).cast("int"), (col("e") - col("pos")).cast("int")), " "),
          when(col("e") < size(col("tk")), lit(" …")).otherwise(lit(""))).as("snippet"))
      .orderBy("doc_id")
  }

  /** Index-size engineering: per-term postings cost under delta-gap
    * encoding — positions stored as (first, gap, gap, ...), each gap
    * costing its binary length in bits (the core of every compressed
    * positional index: VByte/PForDelta refine exactly this quantity).
    * `gap_bits / raw_bits` is the compression headroom a term's
    * postings have; dense/stopword terms compress hardest. Bit cost =
    * length of the base-2 string — exact integer arithmetic both
    * engines share (a floor(log2) would ride on double rounding at
    * power-of-two boundaries). One shuffle: the postings build itself.
    */
  def postingsCompress(spark: SparkSession, dir: String): DataFrame = {
    val idx = invertedIndex(spark, dir) // (term, doc_id, tf, positions sorted)
    val gaps = concat(
      slice(col("positions"), 1, 1), // first position absolute
      zip_with(
        slice(col("positions"), lit(2), size(col("positions")) - 1),
        slice(col("positions"), lit(1), size(col("positions")) - 1),
        (a, b) => a - b))
    idx
      .withColumn("gaps", gaps) // size-1 lists: both slices are empty, gaps = [first]
      .withColumn("posting_bits",
        aggregate(col("gaps"), lit(0L),
          (acc, g) => acc + length(conv(greatest(g, lit(1L)), 10, 2)).cast("long")))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum(size(col("positions"))).cast("long").as("n_positions"),
        sum(col("posting_bits")).as("gap_bits"),
        (sum(size(col("positions"))) * 64L).cast("long").as("raw_bits"))
      .withColumn("ratio",
        round(col("gap_bits").cast("double") / col("raw_bits"), 4))
      .orderBy("term")
  }

  /** Windowed co-occurrence PMI: term pairs co-occurring within +3
    * token positions (ordered — (a,b) at distance d means b follows a
    * within d), scored by pointwise mutual information over the
    * co-occurrence matrix marginals — the association statistic
    * word-vector models (GloVe et al.) factorize, and the general form
    * [[collocations]]' adjacent-bigram PMI specializes (window = 1).
    * The position-banded self-join is doc-keyed — linear in corpus ×
    * window, never O(n²) — and all counts are exact integers whose
    * products stay under 2^53, so the log is bitwise cross-engine.
    */
  def cooccurPmi(spark: SparkSession, dir: String): DataFrame = {
    val tok = tokenStream(spark, dir)
    val pairs = tok.as("a").join(tok.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") > col("a.pos") && col("b.pos") <= col("a.pos") + 3)
      .select(col("a.term").as("term_a"), col("b.term").as("term_b"))
      .groupBy("term_a", "term_b").agg(count(lit(1)).as("n_ab"))
    val tot = pairs.agg(sum(col("n_ab")).cast("double").as("n"))
    val ca = pairs.groupBy("term_a").agg(sum(col("n_ab")).as("ca"))
    val cb = pairs.groupBy("term_b").agg(sum(col("n_ab")).as("cb"))
    pairs.filter(col("n_ab") >= 5)
      .join(broadcast(ca), "term_a")
      .join(broadcast(cb), "term_b")
      .crossJoin(broadcast(tot))
      .select(col("term_a"), col("term_b"), col("n_ab"),
        round(log(col("n_ab").cast("double") * col("n") /
          (col("ca").cast("double") * col("cb").cast("double"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("term_a"), col("term_b"))
      .limit(20)
  }

  /** Corpus-driven stopword induction: terms whose document frequency
    * exceeds half the corpus — the data-derived version of the
    * hardcoded stopword lists quality scoring uses (real pipelines
    * induce per-corpus lists exactly this way; a legal corpus's
    * "plaintiff" is a stopword, a web crawl's isn't). Runs over the
    * aggregated vocabulary; the corpus size is a broadcast 1-row
    * aggregate.
    */
  def stopwordInduction(spark: SparkSession, dir: String): DataFrame = {
    val df = tokenStream(spark, dir)
      .groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val n = Tables.documents(spark, dir).agg(count(lit(1)).cast("double").as("n"))
    df.crossJoin(broadcast(n))
      .withColumn("df_ratio", round(col("df") / col("n"), 4))
      .filter(col("df") / col("n") > 0.5)
      .select("term", "df", "df_ratio")
      .orderBy(col("df").desc, col("term"))
  }

  // ---- wiring ----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stopword_induction" -> stopwordInduction,
    "wordcount" -> wordcount,
    "wordcount_unicode" -> wordcountUnicode,
    "wordcount_salted" -> wordcountSalted,
    "inverted_index" -> invertedIndexFlat,
    "inverted_index_chars" -> invertedIndexChars,
    "index_stats" -> indexStats,
    "postings_stats" -> postingsStats,
    "index_prune_curve" -> indexPruneCurve,
    "champion_lists" -> championLists,
    "tfidf_cosine_pairs" -> tfidfCosinePairs,
    "tfidf_blocking_coverage" -> tfidfBlockingCoverage,
    "tfidf_blocking_recall" -> tfidfBlockingRecall,
    "tfidf_cosine_dense" -> tfidfCosineDense,
    "tfidf_cosine_guarded" -> tfidfCosineGuarded,
    "doc_stats" -> docStats,
    "term_search" -> termSearch,
    "bool_and_search" -> boolAndSearch,
    "bool_or_search" -> boolOrSearch,
    "phrase_search" -> phraseSearch,
    "tfidf_topk" -> tfidfTopk,
    "hashing_vectorize" -> hashingVectorize,
    "bm25_topk" -> bm25Topk,
    "wand_topk" -> wandTopk,
    "wand_prune_stats" -> wandPruneStats,
    "ranker_eval" -> rankerEval,
    "mlt_topk" -> mltTopk,
    "prf_expand" -> prfExpand,
    "spell_candidates" -> spellCandidates,
    "spell_correct" -> spellCorrect,
    "phrase_prefix_search" -> phrasePrefixSearch,
    "facet_counts" -> facetCounts,
    "qlm_topk" -> qlmTopk,
    "top_terms_per_doc" -> topTermsPerDoc,
    "kwic" -> kwic,
    "collocations" -> collocations,
    "fuzzy_term" -> fuzzyTerm,
    "regex_search" -> regexSearch,
    "prefix_search" -> prefixSearch,
    "proximity_search" -> proximitySearch,
    "proximity3_search" -> proximity3Search,
    "rrf_fusion" -> rrfFusion,
    "postings_compress" -> postingsCompress,
    "snippet_extract" -> snippetExtract,
    "cooccur_pmi" -> cooccurPmi)

  /** Shared DuckDB CTE: identical tokenization contract to
    * [[TextFns.tokens]] (split \s+, drop empties; 0-based positions).
    */
  val TokSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0) AS tk
      |  FROM documents
      |), tok AS (
      |  SELECT doc_id, unnest(tk) AS term, unnest(range(len(tk))) AS pos FROM toks
      |)""".stripMargin

  /** Shared DuckDB CTE for the WAND keys: the (doc_id, term, w)
    * BM25-weight frame of [[bm25WeightsOf]] over [[WandTerms]],
    * formula-identical to the bm25_topk oracle.
    */
  private val WandWSql: String =
    s"""$TokSql, n AS (SELECT count(*)::DOUBLE AS n FROM documents),
       |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
       |avgdl AS (SELECT avg(dl) AS avgdl FROM dl),
       |df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok GROUP BY term),
       |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
       |       WHERE term IN ('vector', 'merge', 'stream') GROUP BY doc_id, term),
       |w AS (
       |  SELECT tf.doc_id AS doc_id, tf.term AS term,
       |    ln((n.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
       |      * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl.avgdl)) AS w
       |  FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id, n, avgdl
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "stopword_induction" ->
      s"""$TokSql, v AS (
         |  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
         |), n AS (SELECT count(*)::DOUBLE AS n FROM documents)
         |SELECT term, CAST(df AS BIGINT) AS df, round(df / n.n, 4) AS df_ratio
         |FROM v, n WHERE df / n.n > 0.5
         |ORDER BY df DESC, term""".stripMargin,
    "wordcount" ->
      s"$TokSql SELECT term, count(*) AS freq FROM tok GROUP BY term ORDER BY term",
    "index_prune_curve" ->
      s"""$TokSql, base AS (
         |  SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2
         |), per AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS ttf
         |  FROM base GROUP BY term
         |), nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |tp AS (SELECT CAST(sum(df) AS BIGINT) AS totp FROM per),
         |th AS (SELECT unnest([10, 25, 50, 75, 90, 99]) AS pct_min)
         |SELECT pct_min,
         |  CAST(count(*) AS BIGINT) AS n_terms,
         |  CAST(sum(df) AS BIGINT) AS n_postings,
         |  CAST(sum(ttf) AS BIGINT) AS total_tf,
         |  round(sum(df)::DOUBLE / tp.totp::DOUBLE, 6) AS kept_share
         |FROM per, nd, tp, th
         |WHERE df * 100 >= pct_min * n_docs
         |GROUP BY pct_min, tp.totp
         |ORDER BY pct_min""".stripMargin,
    "hashing_vectorize" ->
      s"""$TokSql, base AS (
         |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
         |), dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM base GROUP BY term),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |w AS (
         |  SELECT doc_id, base.term,
         |    (${OracleSql.roll("base.term", graft.functions.HashFns.P)}) % 16 AS dim,
         |    tf::DOUBLE * ln(n::DOUBLE / df::DOUBLE) *
         |      (CASE WHEN ((${OracleSql.roll("base.term", graft.functions.HashFns.P)}) // 16) % 2 = 0
         |        THEN 1.0 ELSE -1.0 END) AS sw
         |  FROM base JOIN dfs ON base.term = dfs.term, nn
         |), g AS (
         |  SELECT doc_id, dim, list_sort(list(struct_pack(term := term, sw := sw))) AS xs
         |  FROM w GROUP BY doc_id, dim
         |)
         |SELECT doc_id, dim,
         |  round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(xs, s -> s['sw'])),
         |    (a, v) -> a + v), 6) AS w
         |FROM g ORDER BY doc_id, dim""".stripMargin,
    "tfidf_cosine_pairs" ->
      s"""$TokSql, base AS (
         |  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
         |), n AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |df AS (SELECT term, count(*)::DOUBLE AS df FROM base GROUP BY term),
         |w AS (
         |  SELECT doc_id, base.term, df.df AS df, n.n AS n, tf * ln(n.n / df.df) AS w
         |  FROM base JOIN df USING (term), n WHERE df.df < n.n
         |), nrm AS (
         |  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
         |  WHERE a.df <= a.n * 0.05
         |), dots AS (
         |  SELECT c.doc_a, c.doc_b, sum(a.w * b.w) AS dot
         |  FROM cand c
         |  JOIN w a ON a.doc_id = c.doc_a
         |  JOIN w b ON b.doc_id = c.doc_b AND b.term = a.term
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b,
         |  round(dot / (na.nrm * nb.nrm), 4) AS cosine
         |FROM dots
         |JOIN nrm na ON na.doc_id = doc_a
         |JOIN nrm nb ON nb.doc_id = doc_b
         |ORDER BY cosine DESC, doc_a, doc_b LIMIT 20""".stripMargin,
    // guarded cosine: the recall-guard CTEs decide the regime scalar,
    // then ONE of the two candidate relations feeds the shared exact
    // rescoring — mirrored by the Spark side's driver branch (the
    // regime is deterministic per corpus, so both engines take the
    // same branch; the WHERE-on-scalar keeps it one SQL statement)
    "tfidf_cosine_guarded" ->
      s"""$TokSql, base AS (
         |  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
         |), n AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |df AS (SELECT term, count(*)::DOUBLE AS df FROM base GROUP BY term),
         |w AS (
         |  SELECT doc_id, base.term, df.df AS df, n.n AS n, tf * ln(n.n / df.df) AS w
         |  FROM base JOIN df USING (term), n WHERE df.df < n.n
         |), nrm AS (
         |  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id
         |), ws AS (
         |  SELECT * FROM w WHERE doc_id % CAST(ceil(n / 1024.0) AS BIGINT) = 0
         |), rnrm AS (
         |  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM ws GROUP BY doc_id
         |), rexact AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
         |  FROM ws a JOIN ws b ON a.term = b.term AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), rtop AS (
         |  SELECT e.doc_a, e.doc_b,
         |    round(e.dot / (na.nrm * nb.nrm), 4) AS cosine
         |  FROM rexact e
         |  JOIN rnrm na ON na.doc_id = e.doc_a
         |  JOIN rnrm nb ON nb.doc_id = e.doc_b
         |  ORDER BY cosine DESC, e.doc_a, e.doc_b LIMIT ${BlockingRecallK}
         |), rblocked AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM ws a JOIN ws b ON a.term = b.term AND a.doc_id < b.doc_id
         |  WHERE a.df <= a.n * $RareDfFrac
         |), ragg AS (
         |  SELECT count(*) AS n_true,
         |    coalesce(sum(CASE WHEN bl.doc_a IS NOT NULL THEN 1 END), 0) AS n_kept
         |  FROM rtop t LEFT JOIN rblocked bl
         |    ON bl.doc_a = t.doc_a AND bl.doc_b = t.doc_b
         |), regime AS (
         |  SELECT CASE WHEN n_true = 0 OR
         |      n_kept::DOUBLE >= n_true::DOUBLE * $BlockingRecallFloor
         |    THEN 'ok' ELSE 'degenerate' END AS r FROM ragg
         |), rare_cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
         |  WHERE a.df <= a.n * $RareDfFrac
         |), ${graft.operators.Dedup.winnowChainCte},
         |fp AS (
         |  SELECT DISTINCT doc_id, h[p+1] AS fh
         |  FROM selw, unnest(sel) AS u(p)
         |), win_cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM fp a JOIN fp b ON a.fh = b.fh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= 3
         |), pidx AS (
         |  SELECT term, CAST(rn - 1 AS INT) AS idx FROM (
         |    SELECT term, row_number() OVER (ORDER BY df DESC, term) AS rn
         |    FROM (SELECT term, max(df) AS df FROM w GROUP BY term))
         |  WHERE rn <= $ProfileDims
         |), pv AS (
         |  SELECT w.doc_id, p.idx, CAST(w.w AS FLOAT) AS v
         |  FROM w JOIN pidx p USING (term)
         |), slots AS (
         |  SELECT d.doc_id, r.i AS idx
         |  FROM (SELECT DISTINCT doc_id FROM pv) d, range($ProfileDims) r(i)
         |), prof AS (
         |  SELECT doc_id, list(v ORDER BY idx) AS emb FROM (
         |    SELECT s.doc_id, s.idx, coalesce(max(p.v), CAST(0.0 AS FLOAT)) AS v
         |    FROM slots s LEFT JOIN pv p ON p.doc_id = s.doc_id AND p.idx = s.idx
         |    GROUP BY s.doc_id, s.idx)
         |  GROUP BY doc_id
         |), pcents AS (
         |  SELECT doc_id AS cid, emb AS ce FROM prof ORDER BY doc_id
         |  LIMIT $ProfileCells
         |), pasg AS (
         |  SELECT doc_id, cid FROM (
         |    SELECT p.doc_id, c.cid, row_number() OVER (PARTITION BY p.doc_id
         |      ORDER BY (${OracleSql.dot("p.emb", "c.ce")} /
         |        (sqrt(${OracleSql.dot("p.emb", "p.emb")}) *
         |         sqrt(${OracleSql.dot("c.ce", "c.ce")}) + 1e-12)) DESC, c.cid) AS rk
         |    FROM prof p, pcents c)
         |  WHERE rk <= $ProfileProbes
         |), pnrm AS (
         |  SELECT doc_id, sqrt(${OracleSql.dot("emb", "emb")}) AS nrm FROM prof
         |), pnn AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, row_number() OVER (
         |      PARTITION BY a.cid, a.doc_id
         |      ORDER BY (${OracleSql.dot("pa.emb", "pb.emb")} /
         |        (na.nrm * nb.nrm + 1e-12)) DESC, b.doc_id) AS rk
         |    FROM pasg a JOIN pasg b ON a.cid = b.cid AND a.doc_id <> b.doc_id
         |    JOIN prof pa ON pa.doc_id = a.doc_id
         |    JOIN prof pb ON pb.doc_id = b.doc_id
         |    JOIN pnrm na ON na.doc_id = a.doc_id
         |    JOIN pnrm nb ON nb.doc_id = b.doc_id)
         |  WHERE rk <= $ProfileCap
         |), prof_cand AS (
         |  SELECT DISTINCT least(doc_a, doc_b) AS doc_a,
         |    greatest(doc_a, doc_b) AS doc_b
         |  FROM pnn
         |), cand AS (
         |  SELECT doc_a, doc_b FROM rare_cand WHERE (SELECT r FROM regime) = 'ok'
         |  UNION ALL
         |  SELECT doc_a, doc_b FROM (
         |    SELECT doc_a, doc_b FROM win_cand
         |    UNION
         |    SELECT doc_a, doc_b FROM prof_cand
         |    UNION
         |    SELECT doc_a, doc_b FROM rare_cand
         |  ) WHERE (SELECT r FROM regime) = 'degenerate'
         |), dots AS (
         |  SELECT c.doc_a, c.doc_b, sum(a.w * b.w) AS dot
         |  FROM cand c
         |  JOIN w a ON a.doc_id = c.doc_a
         |  JOIN w b ON b.doc_id = c.doc_b AND b.term = a.term
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b,
         |  round(dot / (na.nrm * nb.nrm), 4) AS cosine,
         |  (SELECT r FROM regime) AS regime
         |FROM dots
         |JOIN nrm na ON na.doc_id = doc_a
         |JOIN nrm nb ON nb.doc_id = doc_b
         |ORDER BY cosine DESC, doc_a, doc_b LIMIT 20""".stripMargin,
    "tfidf_blocking_coverage" ->
      s"""$TokSql, base AS (
         |  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
         |), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |df AS (SELECT term, count(*)::DOUBLE AS df FROM base GROUP BY term),
         |elig AS (
         |  SELECT term, df FROM df, n
         |  WHERE df >= 2.0 AND df <= n_docs::DOUBLE * 0.05
         |), mass AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_block_terms,
         |    coalesce(sum(df * (df - 1.0) / 2.0), 0.0)::DOUBLE AS candidate_mass
         |  FROM elig
         |), cov AS (
         |  SELECT CAST(count(DISTINCT b.doc_id) AS BIGINT) AS covered_docs
         |  FROM base b JOIN elig e USING (term)
         |)
         |SELECT n_docs, n_block_terms, covered_docs,
         |  round(covered_docs::DOUBLE / n_docs::DOUBLE, 6) AS coverage,
         |  candidate_mass,
         |  CASE WHEN covered_docs::DOUBLE >= n_docs::DOUBLE * 0.5
         |    THEN 'ok' ELSE 'degenerate' END AS regime
         |FROM n, mass, cov""".stripMargin,
    "tfidf_blocking_recall" ->
      s"""$TokSql, base AS (
         |  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
         |), n AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |df AS (SELECT term, count(*)::DOUBLE AS df FROM base GROUP BY term),
         |w AS (
         |  SELECT doc_id, base.term, df.df AS df, n.n AS n, tf * ln(n.n / df.df) AS w
         |  FROM base JOIN df USING (term), n WHERE df.df < n.n
         |), ws AS (
         |  SELECT * FROM w WHERE doc_id % CAST(ceil(n / 1024.0) AS BIGINT) = 0
         |), nrm AS (
         |  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM ws GROUP BY doc_id
         |), samp AS (
         |  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_sample FROM ws
         |), exact AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
         |  FROM ws a JOIN ws b ON a.term = b.term AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), top AS (
         |  SELECT e.doc_a, e.doc_b,
         |    round(e.dot / (na.nrm * nb.nrm), 4) AS cosine
         |  FROM exact e
         |  JOIN nrm na ON na.doc_id = e.doc_a
         |  JOIN nrm nb ON nb.doc_id = e.doc_b
         |  ORDER BY cosine DESC, e.doc_a, e.doc_b LIMIT 50
         |), blocked AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM ws a JOIN ws b ON a.term = b.term AND a.doc_id < b.doc_id
         |  WHERE a.df <= a.n * 0.05
         |), agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_true,
         |    CAST(coalesce(sum(CASE WHEN bl.doc_a IS NOT NULL THEN 1 END), 0)
         |      AS BIGINT) AS n_kept
         |  FROM top t LEFT JOIN blocked bl
         |    ON bl.doc_a = t.doc_a AND bl.doc_b = t.doc_b
         |)
         |SELECT n_sample, CAST(50 AS BIGINT) AS k, n_true, n_kept,
         |  CASE WHEN n_true = 0 THEN 1.0
         |    ELSE round(n_kept::DOUBLE / n_true::DOUBLE, 6) END AS recall,
         |  CASE WHEN n_true = 0 OR n_kept::DOUBLE >= n_true::DOUBLE * 0.8
         |    THEN 'ok' ELSE 'degenerate' END AS regime
         |FROM samp, agg""".stripMargin,
    // the dense audit twin's oracle is the same sparse SQL restricted to
    // the declared doc_id < 100 sample (a zero dot can't enter the top-20
    // while >= 20 sample pairs share a term, which every sf satisfies)
    "tfidf_cosine_dense" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0) AS tk
         |  FROM documents WHERE doc_id < 100
         |), tok AS (
         |  SELECT doc_id, unnest(tk) AS term FROM toks
         |), base AS (
         |  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
         |), n AS (SELECT count(*)::DOUBLE AS n FROM toks),
         |df AS (SELECT term, count(*)::DOUBLE AS df FROM base GROUP BY term),
         |w AS (
         |  SELECT doc_id, base.term, tf * ln(n.n / df.df) AS w
         |  FROM base JOIN df USING (term), n WHERE df.df < n.n
         |), nrm AS (
         |  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id
         |), dots AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
         |  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b,
         |  round(dot / (na.nrm * nb.nrm), 4) AS cosine
         |FROM dots
         |JOIN nrm na ON na.doc_id = doc_a
         |JOIN nrm nb ON nb.doc_id = doc_b
         |ORDER BY cosine DESC, doc_a, doc_b LIMIT 20""".stripMargin,
    "champion_lists" ->
      s"""$TokSql, base AS (
         |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY 1, 2
         |), rk AS (
         |  SELECT term, doc_id, tf,
         |    CAST(row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS BIGINT) AS rank
         |  FROM base
         |)
         |SELECT term, rank, doc_id, tf FROM rk
         |WHERE rank <= 5 ORDER BY term, rank""".stripMargin,
    "index_stats" -> {
      val bucket = s"(${OracleSql.roll("term", graft.functions.HashFns.P)}) % 8"
      s"""$TokSql, base AS (
         |  SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id
         |)
         |SELECT $bucket AS bucket, count(DISTINCT term) AS n_terms,
         |  count(*) AS n_postings, CAST(sum(tf) AS BIGINT) AS total_tf
         |FROM base GROUP BY bucket ORDER BY bucket""".stripMargin
    },
    "mlt_topk" ->
      s"""$TokSql, base AS (
         |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
         |), nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |dfs AS (SELECT term, count(*)::DOUBLE AS df FROM base GROUP BY term),
         |wts AS (
         |  SELECT doc_id, base.term, tf::DOUBLE * ln(n / df) AS w
         |  FROM base JOIN dfs ON base.term = dfs.term, nn
         |), qt AS (
         |  SELECT doc_id AS target_doc, term FROM (
         |    SELECT doc_id, term,
         |      row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, term) AS trk
         |    FROM wts WHERE doc_id < 5) WHERE trk <= 5
         |), cand AS (
         |  SELECT target_doc, w.doc_id, w.term, w.w
         |  FROM wts w JOIN qt ON w.term = qt.term AND w.doc_id != qt.target_doc
         |), sc AS (
         |  SELECT target_doc, doc_id,
         |    round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(
         |      list_sort(list(struct_pack(t := term, v := w))), s -> s['v'])),
         |      (a, v) -> a + v), 4) AS score
         |  FROM cand GROUP BY target_doc, doc_id
         |), r AS (
         |  SELECT target_doc, doc_id, score,
         |    CAST(row_number() OVER (PARTITION BY target_doc
         |      ORDER BY score DESC, doc_id) AS BIGINT) AS rk
         |  FROM sc
         |)
         |SELECT target_doc, rk, doc_id, score FROM r WHERE rk <= 10
         |ORDER BY target_doc, rk""".stripMargin,
    "wordcount_unicode" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[^\p{L}\p{N}]+'), t -> len(t) > 0) AS tk
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(tk) AS term FROM toks
        |)
        |SELECT term, count(*) AS freq FROM tok GROUP BY term ORDER BY term""".stripMargin,
    "inverted_index_chars" ->
      s"""$TokSql, offs AS (
         |  SELECT doc_id, term,
         |    coalesce(sum(len(term)) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM tok
         |)
         |SELECT term, doc_id, count(*) AS tf,
         |  array_to_string(list_sort(list(off)), ',') AS positions_chars
         |FROM offs GROUP BY term, doc_id ORDER BY term, doc_id""".stripMargin,
    "wordcount_salted" ->
      s"$TokSql SELECT term, count(*) AS freq FROM tok GROUP BY term ORDER BY term",
    "inverted_index" ->
      s"""$TokSql SELECT term, doc_id, count(*) AS tf,
         |  array_to_string(list_sort(list(pos)), ',') AS positions
         |FROM tok GROUP BY term, doc_id ORDER BY term, doc_id""".stripMargin,
    "postings_stats" ->
      s"""$TokSql SELECT term, count(DISTINCT doc_id) AS df, count(*) AS total_tf
         |FROM tok GROUP BY term ORDER BY term""".stripMargin,
    "doc_stats" ->
      """SELECT doc_id, length(text) AS n_chars,
        |  len(list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0)) AS n_tokens,
        |  len(list_distinct(list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0))) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin,
    "term_search" ->
      s"""$TokSql SELECT doc_id, count(*) AS tf FROM tok WHERE term = 'spark'
         |GROUP BY doc_id ORDER BY tf DESC, doc_id""".stripMargin,
    "bool_and_search" ->
      s"""$TokSql SELECT doc_id FROM tok WHERE term IN ('spark', 'join')
         |GROUP BY doc_id HAVING count(DISTINCT term) = 2 ORDER BY doc_id""".stripMargin,
    "bool_or_search" ->
      s"""$TokSql SELECT doc_id, count(DISTINCT term) AS n_hit, count(*) AS total_tf
         |FROM tok WHERE term IN ('spark', 'filter') GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "phrase_search" ->
      s"""$TokSql SELECT a.doc_id AS doc_id, count(*) AS n_matches
         |FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |WHERE a.term = 'key' AND b.term = 'order'
         |GROUP BY a.doc_id ORDER BY doc_id""".stripMargin,
    "phrase_prefix_search" ->
      s"""$TokSql SELECT a.doc_id AS doc_id, count(*) AS n_matches,
         |  count(DISTINCT b.term) AS n_completions
         |FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |WHERE a.term = 'key' AND b.term LIKE 'or%'
         |GROUP BY a.doc_id ORDER BY doc_id""".stripMargin,
    "facet_counts" ->
      """WITH hits AS (
        |  SELECT lang, source FROM documents
        |  WHERE list_contains(list_filter(regexp_split_to_array(text, '\s+'),
        |    t -> len(t) > 0), 'spark')
        |), f AS (
        |  SELECT 'lang' AS facet, lang AS value FROM hits
        |  UNION ALL
        |  SELECT 'source' AS facet, source AS value FROM hits
        |)
        |SELECT facet, value, count(*) AS n_docs
        |FROM f GROUP BY facet, value ORDER BY facet, value""".stripMargin,
    "spell_correct" ->
      s"""$TokSql, vocab AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY term
         |), q AS (
         |  SELECT unnest(['spak', 'jion', 'merge']) AS q
         |), c AS (
         |  SELECT q.q, vocab.term, CAST(levenshtein(q.q, vocab.term) AS BIGINT) AS dist,
         |    vocab.freq
         |  FROM q JOIN vocab ON abs(length(q.q) - length(vocab.term)) <= 2
         |    AND levenshtein(q.q, vocab.term) <= 2
         |)
         |SELECT q AS query_term, term AS corrected, dist, freq FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q
         |    ORDER BY dist, freq DESC, term) AS rn
         |  FROM c) WHERE rn = 1 ORDER BY query_term""".stripMargin,
    "tfidf_topk" ->
      s"""$TokSql, n AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
         |       WHERE term IN ('spark', 'query', 'join') GROUP BY doc_id, term)
         |SELECT doc_id, round(sum(tf * ln(n.n / df.df)), 4) AS score
         |FROM tf JOIN df USING (term), n
         |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "qlm_topk" ->
      s"""$TokSql, c AS (SELECT count(*)::DOUBLE AS c FROM tok),
         |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
         |cf AS (SELECT term, count(*)::DOUBLE AS cf FROM tok
         |       WHERE term IN ('spark', 'join') GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
         |       WHERE term IN ('spark', 'join') GROUP BY doc_id, term),
         |cand AS (SELECT DISTINCT doc_id FROM tf),
         |w AS (
         |  SELECT cand.doc_id, cf.term,
         |    ln((coalesce(tf.tf, 0.0) + 100.0 * cf.cf / c.c) / (dl.dl + 100.0)) AS w
         |  FROM cand CROSS JOIN cf CROSS JOIN c
         |  LEFT JOIN tf ON tf.doc_id = cand.doc_id AND tf.term = cf.term
         |  JOIN dl ON dl.doc_id = cand.doc_id
         |)
         |SELECT doc_id,
         |  round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(
         |    list_sort(list(struct_pack(term := term, w := w))), s -> s['w'])),
         |    (a, x) -> a + x), 4) AS score
         |FROM w GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "prf_expand" ->
      s"""$TokSql, n AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
         |avgdl AS (SELECT avg(dl) AS avgdl FROM dl),
         |dfd AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
         |       WHERE term IN ('spark', 'query', 'join') GROUP BY doc_id, term),
         |fb AS (
         |  SELECT tf.doc_id AS doc_id,
         |    round(sum(ln((n.n - dfd.df + 0.5) / (dfd.df + 0.5) + 1.0)
         |      * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl.avgdl))), 4) AS score
         |  FROM tf JOIN dfd USING (term) JOIN dl ON tf.doc_id = dl.doc_id, n, avgdl
         |  GROUP BY tf.doc_id ORDER BY score DESC, doc_id LIMIT 10
         |), gdf AS (
         |  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY term
         |), fbdf AS (
         |  SELECT t.term, CAST(count(DISTINCT t.doc_id) AS BIGINT) AS fb_df
         |  FROM tok t JOIN fb ON t.doc_id = fb.doc_id
         |  WHERE t.term NOT IN ('spark', 'query', 'join')
         |  GROUP BY t.term
         |)
         |SELECT f.term AS term, f.fb_df AS fb_df, g.df AS df
         |FROM fbdf f JOIN gdf g ON f.term = g.term
         |ORDER BY fb_df DESC, df ASC, term LIMIT 20""".stripMargin,
    "spell_candidates" ->
      s"""$TokSql, v AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY term
         |), d AS (
         |  SELECT term AS dict_term, freq AS dict_freq FROM v
         |  ORDER BY freq DESC, term LIMIT 100
         |)
         |SELECT v.term AS term, v.freq AS freq, d.dict_term AS dict_term,
         |  d.dict_freq AS dict_freq,
         |  CAST(levenshtein(v.term, d.dict_term) AS BIGINT) AS dist
         |FROM v, d
         |WHERE v.term <> d.dict_term
         |  AND abs(len(v.term) - len(d.dict_term)) <= 2
         |  AND levenshtein(v.term, d.dict_term) <= 2
         |  AND v.freq < d.dict_freq
         |ORDER BY term, dict_term""".stripMargin,
    "bm25_topk" ->
      s"""$TokSql, n AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
         |avgdl AS (SELECT avg(dl) AS avgdl FROM dl),
         |df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok GROUP BY term),
         |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
         |       WHERE term IN ('spark', 'join') GROUP BY doc_id, term)
         |SELECT tf.doc_id AS doc_id,
         |  round(sum(ln((n.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
         |    * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl.avgdl))), 4) AS score
         |FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id, n, avgdl
         |GROUP BY tf.doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // the three rankers' score formulas are verbatim copies of their
    // own oracles (bm25_topk / tfidf_topk / qlm_topk) at the shared
    // 2-term query; DCG folds sort by rank so the 10-double sum is
    // order-pinned on both engines
    "ranker_eval" ->
      s"""$TokSql, n AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
         |avgdl AS (SELECT avg(dl) AS avgdl FROM dl),
         |dfq AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok GROUP BY term),
         |tfq AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
         |        WHERE term IN ('spark', 'join') GROUP BY doc_id, term),
         |bscore AS MATERIALIZED (
         |  SELECT tfq.doc_id AS doc_id,
         |    round(sum(ln((n.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
         |      * (tfq.tf * 2.2) / (tfq.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl.avgdl))), 4) AS score
         |  FROM tfq JOIN dfq USING (term) JOIN dl ON tfq.doc_id = dl.doc_id, n, avgdl
         |  GROUP BY tfq.doc_id),
         |truth AS MATERIALIZED (
         |  SELECT doc_id, 21 - rn AS rel FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rn
         |    FROM bscore ORDER BY score DESC, doc_id LIMIT 20)),
         |idcg AS (
         |  SELECT list_reduce(list_prepend(0.0::DOUBLE, list_transform(
         |    list_sort(list(struct_pack(i := i, g := g))), s -> s['g'])),
         |    (a, x) -> a + x) AS idcg
         |  FROM (SELECT i, rel / (ln(i + 1.0) / ln(2.0)) AS g FROM (
         |    SELECT rel, row_number() OVER (ORDER BY rel DESC) AS i
         |    FROM truth ORDER BY rel DESC LIMIT 10))),
         |b10 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS ri
         |        FROM bscore ORDER BY score DESC, doc_id LIMIT 10),
         |tscore AS (
         |  SELECT doc_id, round(sum(tf * ln(n.n / dfq.df)), 4) AS score
         |  FROM tfq JOIN dfq USING (term), n GROUP BY doc_id),
         |t10 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS ri
         |        FROM tscore ORDER BY score DESC, doc_id LIMIT 10),
         |c AS (SELECT count(*)::DOUBLE AS c FROM tok),
         |cfq AS (SELECT term, count(*)::DOUBLE AS cf FROM tok
         |        WHERE term IN ('spark', 'join') GROUP BY term),
         |qcand AS (SELECT DISTINCT doc_id FROM tfq),
         |qw AS (
         |  SELECT qcand.doc_id AS doc_id, cfq.term AS term,
         |    ln((coalesce(tfq.tf, 0.0) + 100.0 * cfq.cf / c.c) / (dl.dl + 100.0)) AS w
         |  FROM qcand CROSS JOIN cfq CROSS JOIN c
         |  LEFT JOIN tfq ON tfq.doc_id = qcand.doc_id AND tfq.term = cfq.term
         |  JOIN dl ON dl.doc_id = qcand.doc_id),
         |qscore AS (
         |  SELECT doc_id, round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(
         |    list_sort(list(struct_pack(term := term, w := w))), s -> s['w'])),
         |    (a, x) -> a + x), 4) AS score
         |  FROM qw GROUP BY doc_id),
         |q10 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS ri
         |        FROM qscore ORDER BY score DESC, doc_id LIMIT 10),
         |m AS (
         |  SELECT 'bm25' AS ranker, b10.ri AS ri, coalesce(truth.rel, 0)::DOUBLE AS rel
         |  FROM b10 LEFT JOIN truth USING (doc_id)
         |  UNION ALL
         |  SELECT 'tfidf', t10.ri, coalesce(truth.rel, 0)::DOUBLE
         |  FROM t10 LEFT JOIN truth USING (doc_id)
         |  UNION ALL
         |  SELECT 'qlm', q10.ri, coalesce(truth.rel, 0)::DOUBLE
         |  FROM q10 LEFT JOIN truth USING (doc_id))
         |SELECT ranker,
         |  round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(
         |    list_sort(list(struct_pack(i := ri, g := rel / (ln(ri + 1.0) / ln(2.0))))),
         |    s -> s['g'])), (a, x) -> a + x) / (SELECT idcg FROM idcg), 6) AS ndcg10,
         |  round(coalesce(1.0 / min(CASE WHEN rel > 0 THEN ri END), 0.0), 6) AS mrr
         |FROM m GROUP BY ranker ORDER BY ranker""".stripMargin,
    // the WAND oracle is the UNPRUNED exact BM25 ranking (sorted-fold
    // sum: 3 terms, so addition order must be pinned on both engines) —
    // equality here proves the pruning skipped nothing
    "wand_topk" ->
      s"""$WandWSql
         |SELECT doc_id,
         |  round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(
         |    list_sort(list(struct_pack(term := term, w := w))), s -> s['w'])),
         |    (a, x) -> a + x), 4) AS score
         |FROM w GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "wand_prune_stats" ->
      s"""$WandWSql,
         |ub AS (SELECT term, max(w) AS ubt FROM w GROUP BY term),
         |du AS (
         |  SELECT w.doc_id AS doc_id,
         |    round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(
         |      list_sort(list(struct_pack(term := w.term, w := ub.ubt))), s -> s['w'])),
         |      (a, x) -> a + x), 4) AS ub
         |  FROM w JOIN ub USING (term) GROUP BY w.doc_id
         |), seed AS (SELECT doc_id FROM du ORDER BY ub DESC, doc_id LIMIT 20),
         |ss AS (
         |  SELECT w.doc_id AS doc_id,
         |    round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(
         |      list_sort(list(struct_pack(term := term, w := w))), s -> s['w'])),
         |      (a, x) -> a + x), 4) AS score
         |  FROM w JOIN seed USING (doc_id) GROUP BY w.doc_id
         |), th AS (SELECT min(score) AS theta FROM ss)
         |SELECT (SELECT count(*) FROM du) AS n_candidates,
         |  (SELECT count(*) FROM du, th WHERE du.ub >= th.theta) AS n_scored,
         |  (SELECT theta FROM th) AS theta""".stripMargin,
    "top_terms_per_doc" ->
      s"""$TokSql, tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term)
         |SELECT doc_id, term, tf, rk FROM (
         |  SELECT doc_id, term, tf,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS rk
         |  FROM tf) WHERE rk <= 5 ORDER BY doc_id, rk""".stripMargin,
    "fuzzy_term" ->
      s"""$TokSql SELECT term, count(*) AS freq,
         |  CAST(levenshtein(term, 'spark') AS BIGINT) AS dist
         |FROM tok GROUP BY term HAVING levenshtein(term, 'spark') <= 1
         |ORDER BY dist, term""".stripMargin,
    "regex_search" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, 'qu[ae]ry')) AS BIGINT) AS n_matches
        |FROM documents WHERE regexp_matches(text, 'qu[ae]ry')
        |ORDER BY doc_id""".stripMargin,
    "kwic" ->
      s"""$TokSql
         |SELECT t.doc_id AS doc_id, t.pos AS pos,
         |  array_to_string(x.tk[greatest(t.pos - 1, 1):least(t.pos + 3, len(x.tk))], ' ')
         |    AS context
         |FROM tok t JOIN toks x ON t.doc_id = x.doc_id
         |WHERE t.term = 'spark' ORDER BY doc_id, pos""".stripMargin,
    "prefix_search" ->
      s"""$TokSql SELECT term, count(DISTINCT doc_id) AS df, count(*) AS total_tf
         |FROM tok WHERE term LIKE 's%' GROUP BY term ORDER BY term""".stripMargin,
    "snippet_extract" ->
      s"""${OracleSql.ToksCte}
         |, p AS (
         |  -- duckdb list_position: 0 when absent (not NULL)
         |  SELECT doc_id, tk, list_position(tk, 'spark') AS pos FROM toks
         |  WHERE coalesce(list_position(tk, 'spark'), 0) > 0
         |), b AS (
         |  SELECT doc_id, tk, pos, greatest(pos - 3, 1) AS s,
         |    least(pos + 3, len(tk)) AS e
         |  FROM p
         |)
         |SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos,
         |  -- coalesce: an empty slice (term at a text edge) is NULL in
         |  -- duckdb and || would null the whole snippet
         |  (CASE WHEN s > 1 THEN '… ' ELSE '' END) ||
         |  coalesce(array_to_string(tk[s : pos - 1], ' '), '') ||
         |  (CASE WHEN pos > s THEN ' ' ELSE '' END) ||
         |  '[spark]' ||
         |  (CASE WHEN e > pos THEN ' ' ELSE '' END) ||
         |  coalesce(array_to_string(tk[pos + 1 : e], ' '), '') ||
         |  (CASE WHEN e < len(tk) THEN ' …' ELSE '' END) AS snippet
         |FROM b ORDER BY doc_id""".stripMargin,
    "postings_compress" ->
      s"""$TokSql, idx AS (
         |  SELECT term, doc_id, list_sort(list(pos)) AS positions
         |  FROM tok GROUP BY term, doc_id
         |), g AS (
         |  SELECT term, len(positions) AS np,
         |    list_concat(positions[1:1],
         |      list_transform(range(1, len(positions)), i -> positions[i+1] - positions[i])) AS gaps
         |  FROM idx
         |), pb AS (
         |  SELECT term, np,
         |    list_reduce(list_prepend(0::BIGINT,
         |      list_transform(gaps, x -> length(bin(greatest(x, 1)))::BIGINT)),
         |      (a, b) -> a + b) AS posting_bits
         |  FROM g
         |)
         |SELECT term, count(*) AS df,
         |  CAST(sum(np) AS BIGINT) AS n_positions,
         |  CAST(sum(posting_bits) AS BIGINT) AS gap_bits,
         |  CAST(sum(np) * 64 AS BIGINT) AS raw_bits,
         |  round(sum(posting_bits)::DOUBLE / (sum(np) * 64)::DOUBLE, 4) AS ratio
         |FROM pb GROUP BY term ORDER BY term""".stripMargin,
    "proximity_search" ->
      s"""$TokSql SELECT a.doc_id AS doc_id, count(*) AS n_pairs,
         |  min(abs(b.pos - a.pos)) AS min_dist
         |FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND abs(b.pos - a.pos) <= 5
         |WHERE a.term = 'spark' AND b.term = 'join'
         |GROUP BY a.doc_id ORDER BY doc_id""".stripMargin,
    "proximity3_search" ->
      s"""$TokSql SELECT a.doc_id AS doc_id, count(*) AS n_matches,
         |  min(greatest(a.pos, b.pos, c.pos) - least(a.pos, b.pos, c.pos)) AS min_span
         |FROM tok a JOIN tok b ON a.doc_id = b.doc_id
         |  JOIN tok c ON a.doc_id = c.doc_id
         |WHERE a.term = 'spark' AND b.term = 'join' AND c.term = 'filter'
         |  AND greatest(a.pos, b.pos, c.pos) - least(a.pos, b.pos, c.pos) <= 5
         |GROUP BY a.doc_id ORDER BY doc_id""".stripMargin,
    "rrf_fusion" ->
      s"""$TokSql, n AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok GROUP BY term),
         |bdl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
         |avgdl AS (SELECT avg(dl) AS avgdl FROM bdl),
         |btf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
         |        WHERE term IN ('spark', 'join') GROUP BY doc_id, term),
         |bscore AS (
         |  SELECT btf.doc_id AS doc_id,
         |    round(sum(ln((n.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
         |      * (btf.tf * 2.2) / (btf.tf + 1.2 * (1.0 - 0.75 + 0.75 * bdl.dl / avgdl.avgdl))), 4) AS score
         |  FROM btf JOIN df USING (term) JOIN bdl ON btf.doc_id = bdl.doc_id, n, avgdl
         |  GROUP BY btf.doc_id),
         |brank AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_bm25
         |  FROM (SELECT * FROM bscore ORDER BY score DESC, doc_id LIMIT 200)),
         |ttf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
         |        WHERE term IN ('spark', 'query', 'join') GROUP BY doc_id, term),
         |tscore AS (
         |  SELECT doc_id, round(sum(tf * ln(n.n / df.df)), 4) AS score
         |  FROM ttf JOIN df USING (term), n GROUP BY doc_id),
         |trank AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_tfidf
         |  FROM (SELECT * FROM tscore ORDER BY score DESC, doc_id LIMIT 200))
         |SELECT coalesce(b.doc_id, t.doc_id) AS doc_id,
         |  coalesce(b.rank_bm25, 0) AS rank_bm25,
         |  coalesce(t.rank_tfidf, 0) AS rank_tfidf,
         |  round(coalesce(1.0 / (60.0 + b.rank_bm25), 0.0)
         |    + coalesce(1.0 / (60.0 + t.rank_tfidf), 0.0), 6) AS rrf
         |FROM brank b FULL OUTER JOIN trank t ON b.doc_id = t.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    "collocations" ->
      s"""$TokSql, uni AS (
         |  SELECT term, count(*) AS f FROM tok GROUP BY term
         |), n AS (SELECT sum(f)::DOUBLE AS n FROM uni),
         |bi AS (
         |  SELECT tk[i+1] AS term_a, tk[i+2] AS term_b
         |  FROM toks, unnest(range(greatest(len(tk) - 1, 0))) AS u(i)
         |), bic AS (
         |  SELECT term_a, term_b, count(*) AS f_ab FROM bi
         |  GROUP BY term_a, term_b HAVING count(*) >= 5
         |)
         |SELECT term_a, term_b, f_ab,
         |  round(ln(f_ab::DOUBLE * n.n / (a.f::DOUBLE * b.f::DOUBLE)), 4) AS pmi
         |FROM bic JOIN uni a ON term_a = a.term JOIN uni b ON term_b = b.term, n
         |ORDER BY pmi DESC, term_a, term_b LIMIT 20""".stripMargin,
    "cooccur_pmi" ->
      s"""$TokSql, pr AS (
         |  SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_ab
         |  FROM tok a JOIN tok b
         |    ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + 3
         |  GROUP BY a.term, b.term
         |), n AS (SELECT sum(n_ab)::DOUBLE AS n FROM pr),
         |ca AS (SELECT term_a, CAST(sum(n_ab) AS BIGINT) AS ca FROM pr GROUP BY term_a),
         |cb AS (SELECT term_b, CAST(sum(n_ab) AS BIGINT) AS cb FROM pr GROUP BY term_b)
         |SELECT p.term_a, p.term_b, p.n_ab,
         |  round(ln(p.n_ab::DOUBLE * n.n / (ca.ca::DOUBLE * cb.cb::DOUBLE)), 4) AS pmi
         |FROM pr p JOIN ca USING (term_a) JOIN cb USING (term_b), n
         |WHERE p.n_ab >= 5
         |ORDER BY pmi DESC, term_a, term_b LIMIT 20""".stripMargin)
}
