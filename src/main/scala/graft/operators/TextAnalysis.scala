package graft.operators

import graft.functions.{HashFns, TextFns}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis pipeline operators (SURVEY §2.B): language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All four are narrow, codegen'd per-row maps over the documents
  * scan — no shuffle at all (the `orderBy` is presentation-only for
  * the correctness gate). At 100 TB these run at scan speed with
  * column pruning down to (doc_id, text[, lang]).
  *
  * Capability lineage: the reference tokenizes on whitespace in its
  * mapper (/root/reference/src/main/scala/test/App.scala:162); these
  * operators reuse that exact tokenization contract via
  * [[TextFns.tokens]].
  */
object TextAnalysis {

  // ---- lang_id ---------------------------------------------------------

  /** Stopword-marker language ID: score each language by the number of
    * its marker tokens in the document, predict the argmax with
    * alphabetical tie-break. Deterministic, so oracle-comparable.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val langs = TextFns.LangMarkers
    val scored = Tables.documents(spark, dir)
      .select(Seq(col("doc_id"), col("lang"), TextFns.tokens(col("text")).as("tk")): _*)
      .select(Seq(col("doc_id"), col("lang")) ++
        langs.map { case (l, m) => TextFns.markerScore(col("tk"), m).cast("long").as(s"s_$l") }: _*)
    val g = greatest(langs.map { case (l, _) => col(s"s_$l") }: _*)
    val pred = langs.tail.foldLeft(when(col(s"s_${langs.head._1}") === g, langs.head._1)) {
      case (acc, (l, _)) => acc.when(col(s"s_$l") === g, l)
    }
    scored
      .withColumn("pred_lang", pred)
      .withColumn("correct", when(col("pred_lang") === col("lang"), 1L).otherwise(0L))
      .select("doc_id", "lang", "pred_lang", "correct")
      .orderBy("doc_id")
  }

  // ---- quality_score ---------------------------------------------------

  /** Quality features: token/char counts, punctuation ratio, stopword
    * ratio, average token length, and a composite score. All ratios are
    * plain IEEE double divisions so they are bit-identical to the
    * DuckDB oracle; only the emitted columns are rounded.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val nChars = length(col("text")).cast("long")
    val nTokens = size(TextFns.tokens(col("text"))).cast("long")
    val nTokChars = length(regexp_replace(col("text"), "\\s", "")).cast("long")
    val nPunct = length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")).cast("long")
    val nStop = size(filter(TextFns.tokens(col("text")),
      t => t.isInCollection(TextFns.Stopwords))).cast("long")
    Tables.documents(spark, dir)
      .select(col("doc_id"), nChars.as("n_chars"), nTokens.as("n_tokens"),
        nTokChars.as("ntc"), nPunct.as("np"), nStop.as("ns"))
      .select(
        col("doc_id"), col("n_chars"), col("n_tokens"),
        round(col("ntc").cast("double") / greatest(col("n_tokens"), lit(1L)), 4).as("avg_token_len"),
        round(col("np").cast("double") / greatest(col("n_chars"), lit(1L)), 4).as("punct_ratio"),
        round(col("ns").cast("double") / greatest(col("n_tokens"), lit(1L)), 4).as("stopword_ratio"),
        round(least(col("n_tokens").cast("double") / 100.0, lit(1.0)) *
          (lit(1.0) - col("np").cast("double") / greatest(col("n_chars"), lit(1L))), 4).as("quality"))
      .orderBy("doc_id")
  }

  // ---- token_stats -----------------------------------------------------

  /** BPE-ish pre-tokenization regex: alpha runs, digit runs, single
    * other non-space chars — the classic byte-pair-encoding
    * pre-splitter shape.
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    val bpe = regexp_extract_all(col("text"), lit(BpePattern), lit(0))
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("ws"), bpe.as("bpe"))
      .select(
        col("doc_id"),
        size(col("ws")).cast("long").as("n_ws"),
        size(col("bpe")).cast("long").as("n_bpe"),
        size(filter(col("bpe"), t => t.rlike("^[A-Za-z]+$"))).cast("long").as("n_alpha"),
        size(filter(col("bpe"), t => t.rlike("^[0-9]+$"))).cast("long").as("n_num"))
      .orderBy("doc_id")
  }

  // ---- doc_fingerprint -------------------------------------------------

  /** Polynomial rolling-hash fingerprint of the normalized text —
    * codegen'd Catalyst expression ([[graft.functions.RollingHash]]),
    * cross-engine reproducible per [[graft.functions.HashImpl.roll]].
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        HashFns.rollingHash(TextFns.normText(col("text"))).as("fp"))
      .orderBy("doc_id")

  // ---- char_ngrams -----------------------------------------------------

  /** Corpus-level character-trigram profile over normalized text —
    * the n-gram tables language-ID models train on. Narrow per-doc
    * explode, one partial-agg shuffle, top-30.
    */
  def charNgrams(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(HashFns.charNgrams(TextFns.normText(col("text")), 3)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("gram"))
      .limit(30)

  // ---- term_entropy ----------------------------------------------------

  /** Per-document Shannon entropy of the term distribution,
    * H = ln(n) - Σ tf·ln(tf) / n, folded over the SORTED per-term
    * count list so the floating-point addition order is fixed —
    * identical doubles cross-engine (an agg-ordered sum would not be).
    */
  def termEntropy(spark: SparkSession, dir: String): DataFrame =
    Index.tokenStream(spark, dir)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("tf"))).as("cs"),
        sum(col("tf")).cast("double").as("n"))
      .select(col("doc_id"),
        round(log(col("n")) -
          aggregate(col("cs"), lit(0.0),
            (acc, c) => acc + c.cast("double") * log(c.cast("double"))) / col("n"),
          6).as("entropy"))
      .orderBy("doc_id")

  // ---- vocab_growth ----------------------------------------------------

  /** Vocabulary growth (Heaps-law) curve: for each doc_id that
    * introduces at least one never-before-seen term (in doc_id order),
    * the number of new terms and the cumulative vocabulary size.
    * Distributed formulation: first occurrence = min(doc_id) per term
    * (one partial-agg shuffle over the token stream), then a running
    * sum over the ≤|vocab| introduction points — the window is over
    * the aggregated curve, never the corpus, so the single-partition
    * running sum is bounded by vocabulary size, not 100 TB of tokens.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame =
    Index.tokenStream(spark, dir)
      .groupBy("term").agg(min(col("doc_id")).as("first_doc"))
      .groupBy("first_doc").agg(count(lit(1)).as("new_terms"))
      .withColumn("vocab_size",
        sum(col("new_terms")).over(Window.orderBy("first_doc")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("first_doc")

  // ---- wiring ----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lang_id" -> langId,
    "quality_score" -> qualityScore,
    "token_stats" -> tokenStats,
    "doc_fingerprint" -> docFingerprint,
    "char_ngrams" -> charNgrams,
    "term_entropy" -> termEntropy,
    "vocab_growth" -> vocabGrowth)

  private def inList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("(", ", ", ")")

  private val langIdSql: String = {
    val langs = TextFns.LangMarkers
    val scores = langs.map { case (l, m) =>
      s"CAST(len(list_filter(tk, t -> t IN ${inList(m)})) AS BIGINT) AS s_$l"
    }.mkString(",\n    ")
    val g = langs.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
    val pred = langs.map { case (l, _) => s"WHEN s_$l = g THEN '$l'" }.mkString(" ")
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0) AS tk
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, lang,
       |    $scores
       |  FROM toks
       |), p AS (
       |  SELECT doc_id, lang, CASE $pred END AS pred_lang
       |  FROM (SELECT *, $g AS g FROM s)
       |)
       |SELECT doc_id, lang, pred_lang,
       |  CAST(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END AS BIGINT) AS correct
       |FROM p ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "lang_id" -> langIdSql,
    "quality_score" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0)) AS BIGINT) AS n_tokens,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS ntc,
         |    CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS np,
         |    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t IN ${inList(TextFns.Stopwords)})) AS BIGINT) AS ns
         |  FROM documents)
         |SELECT doc_id, n_chars, n_tokens,
         |  round(ntc::DOUBLE / greatest(n_tokens, 1), 4) AS avg_token_len,
         |  round(np::DOUBLE / greatest(n_chars, 1), 4) AS punct_ratio,
         |  round(ns::DOUBLE / greatest(n_tokens, 1), 4) AS stopword_ratio,
         |  round(least(n_tokens::DOUBLE / 100.0, 1.0) * (1.0 - np::DOUBLE / greatest(n_chars, 1)), 4) AS quality
         |FROM q ORDER BY doc_id""".stripMargin,
    "token_stats" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0) AS ws,
         |    regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]') AS bpe
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(ws) AS BIGINT) AS n_ws,
         |  CAST(len(bpe) AS BIGINT) AS n_bpe,
         |  CAST(len(list_filter(bpe, t -> regexp_full_match(t, '[A-Za-z]+'))) AS BIGINT) AS n_alpha,
         |  CAST(len(list_filter(bpe, t -> regexp_full_match(t, '[0-9]+'))) AS BIGINT) AS n_num
         |FROM b ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      s"""WITH n AS (SELECT doc_id, ${OracleSql.Norm} AS nt FROM documents)
         |SELECT doc_id, ${OracleSql.roll("nt", HashFns.P)} AS fp
         |FROM n ORDER BY doc_id""".stripMargin,
    "char_ngrams" ->
      s"""WITH n AS (SELECT ${OracleSql.Norm} AS nt FROM documents),
         |g AS (
         |  SELECT unnest(list_transform(range(1, greatest(length(nt) - 2, 0) + 1),
         |    i -> substr(nt, i, 3))) AS gram
         |  FROM n)
         |SELECT gram, count(*) AS freq FROM g GROUP BY gram
         |ORDER BY freq DESC, gram LIMIT 30""".stripMargin,
    "term_entropy" ->
      s"""${Index.TokSql}, tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
         |), agg AS (
         |  SELECT doc_id, list_sort(list(tf)) AS cs, sum(tf)::DOUBLE AS n
         |  FROM tf GROUP BY doc_id
         |)
         |SELECT doc_id,
         |  round(ln(n) - list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(cs, c -> c::DOUBLE * ln(c::DOUBLE))), (a, x) -> a + x) / n,
         |    6) AS entropy
         |FROM agg ORDER BY doc_id""".stripMargin,
    "vocab_growth" ->
      s"""${Index.TokSql}, fd AS (
         |  SELECT term, min(doc_id) AS first_doc FROM tok GROUP BY term
         |), g AS (
         |  SELECT first_doc, count(*) AS new_terms FROM fd GROUP BY first_doc
         |)
         |SELECT first_doc, new_terms,
         |  CAST(sum(new_terms) OVER (ORDER BY first_doc
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_size
         |FROM g ORDER BY first_doc""".stripMargin)
}
