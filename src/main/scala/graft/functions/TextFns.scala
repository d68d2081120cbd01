package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text columns built purely from `org.apache.spark.sql.functions._`
  * (codegen'd / Catalyst-optimizable; no UDFs).
  *
  * Tokenization contract (shared with the DuckDB oracle): split on
  * `\s+`, drop empty tokens. This mirrors the reference mapper's
  * `line(1).split("\\s")` (/root/reference/src/main/scala/test/App.scala:162)
  * minus its empty-token artifacts.
  */
object TextFns {
  /** Whitespace tokens, empties removed. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > lit(0))

  /** Let-binding guard: evaluates `x` ONCE per row and hands it to
    * `body` as a lambda variable. Catalyst's CollapseProject inlines a
    * projected column into every one of its use sites; when the use
    * sites sit INSIDE a higher-order function's lambda, the inlined
    * subtree re-evaluates per array ELEMENT — e.g. [[shinglesK]]
    * pre-fix re-ran the whole tokenizer once per shingle (~50× per
    * document, measured 10× wall on the span-dedup family). A lambda
    * variable cannot be substituted, so `transform(array(x), …)` is
    * the Column-API spelling of `let`.
    */
  def bind(x: Column, body: Column => Column): Column =
    element_at(transform(array(x), v => body(v)), 1)

  /** Unicode-aware tokens: maximal runs of letters/digits in ANY
    * script (the `\p{L}\p{N}` classes) — punctuation and symbols are
    * separators, so accented ("déjà") and non-Latin ("東京") words
    * survive intact where the whitespace tokenizer would glue them to
    * adjacent punctuation. No-space scripts (CJK) remain unsegmented
    * runs, the honest limit of any regex tokenizer. Java regex and
    * DuckDB's RE2 agree on these classes, so the oracle contract
    * holds (`wordcount_unicode`).
    */
  def tokensUnicode(c: Column): Column =
    filter(split(c, "[^\\p{L}\\p{N}]+"), t => length(t) > lit(0))

  /** 3-token shingles joined by single spaces; empty array when the
    * document has fewer than 3 tokens.
    */
  def shingles3(toks: Column): Column =
    bind(toks, tk =>
      when(size(tk) >= 3,
        transform(sequence(lit(0), size(tk) - 3),
          i => concat_ws(" ",
            element_at(tk, i + 1), element_at(tk, i + 2), element_at(tk, i + 3))))
        .otherwise(array().cast("array<string>")))

  /** k-token shingles joined by single spaces; empty array when the
    * document has fewer than k tokens. The token array is [[bind]]-let
    * so a collapsed-in tokenizer evaluates once per row, never per
    * shingle.
    */
  def shinglesK(toks: Column, k: Int): Column =
    bind(toks, tk =>
      when(size(tk) >= k,
        transform(sequence(lit(0), size(tk) - k),
          i => array_join(slice(tk, i + 1, lit(k)), " ")))
        .otherwise(array().cast("array<string>")))

  /** Normalization for near-dup dedup: lowercase, strip non [a-z0-9 ],
    * squeeze runs of spaces, trim.
    */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** Stopword list used by quality scoring (vocabulary-appropriate). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "in", "to")

  /** Language marker tokens for the n-gram/stopword language-ID
    * heuristic; argmax with alphabetical tie-break.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "los", "las", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def markerScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))
}
