package graft.operators

import graft.functions.HashFns

/** Shared DuckDB-SQL fragments for the oracle side of the correctness
  * gate. Every fragment mirrors, operation-for-operation and in the
  * same evaluation order, the corresponding Spark kernel so that
  * integer hashes are equal and floating-point results are bitwise
  * identical (no tolerance windows anywhere in the gate).
  */
object OracleSql {

  /** Rolling hash of a string expression — same fold as
    * [[graft.functions.HashImpl.roll]]: left fold of
    * (a*31 + codepoint) mod m over codepoints.
    */
  def roll(e: String, mod: Long): String =
    s"CASE WHEN $e = '' THEN 0 ELSE list_reduce(list_prepend(0::BIGINT, " +
      s"list_transform(string_split($e, ''), c -> unicode(c)::BIGINT)), " +
      s"(a, x) -> (a * 31 + x) % $mod) END"

  /** Normalized text — mirrors [[graft.functions.TextFns.normText]]. */
  val Norm: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  /** `WITH toks AS (...)` — the tokenized-documents CTE alone, for
    * oracles that build straight on the token arrays (identical
    * tokenization contract to [[graft.functions.TextFns.tokens]]).
    */
  val ToksCte: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0) AS tk
      |  FROM documents
      |)""".stripMargin

  /** CTE chain `toks` → `shl` → `hs`: whitespace tokens, 3-token
    * shingles, per-shingle rolling hashes — mirrors
    * [[graft.functions.TextFns.shingles3]] + [[Dedup.shingleHashes]].
    */
  val ShingleHashCte: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0) AS tk
       |  FROM documents
       |), shl AS (
       |  SELECT doc_id,
       |    CASE WHEN len(tk) >= 3
       |      THEN list_transform(range(len(tk) - 2), i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])
       |      ELSE CAST([] AS VARCHAR[]) END AS sh
       |  FROM toks
       |), hs AS (
       |  SELECT doc_id, list_transform(sh, s -> ${roll("s", HashFns.P)}) AS h
       |  FROM shl
       |)""".stripMargin

  /** [[ShingleHashCte]] at any shingle width (the contamination
    * family's n-gram knob): same tokenizer, same hash of the
    * space-joined n-gram. Width 3 stays on the shared constant above
    * so every existing oracle's SQL is byte-identical.
    */
  def shingleHashCteN(n: Int): String =
    if (n == 3) ShingleHashCte
    else
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0) AS tk
         |  FROM documents
         |), shl AS (
         |  SELECT doc_id,
         |    CASE WHEN len(tk) >= $n
         |      THEN list_transform(range(len(tk) - ${n - 1}), i -> array_to_string(tk[i+1:i+$n], ' '))
         |      ELSE CAST([] AS VARCHAR[]) END AS sh
         |  FROM toks
         |), hs AS (
         |  SELECT doc_id, list_transform(sh, s -> ${roll("s", graft.functions.HashFns.P)}) AS h
         |  FROM shl
         |)""".stripMargin

  /** `sig` CTE on top of [[ShingleHashCte]]: 16 MinHash signature
    * columns s0..s15 from the same (A, B) constants as
    * [[graft.functions.HashFns.MinhashA]]/B.
    */
  val MinhashSigCte: String = {
    val cols = HashFns.MinhashA.zip(HashFns.MinhashB).zipWithIndex.map { case ((a, b), i) =>
      s"coalesce(list_min(list_transform(h, x -> ($a * x + $b) % ${HashFns.P})), -1) AS s$i"
    }.mkString(",\n    ")
    s""", sig AS (
       |  SELECT doc_id,
       |    $cols
       |  FROM hs
       |)""".stripMargin
  }

  private def foldSum(list: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, $list), (a, x) -> a + x)"

  /** Sequential-order dot product of two float-list expressions —
    * mirrors [[graft.functions.VectorImpl.dot]] (float→double exact,
    * left-to-right accumulation).
    */
  def dot(a: String, b: String): String =
    foldSum(s"list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE)")

  /** Squared L2 norm — mirrors [[graft.functions.VectorImpl.norm2]]. */
  def norm2(a: String): String =
    foldSum(s"list_transform($a, v -> v::DOUBLE * v::DOUBLE)")

  /** Cosine similarity `dot / (sqrt(n2a) * sqrt(n2b))` — mirrors
    * [[graft.functions.VectorImpl.cosine]] exactly (same operation
    * order, so bitwise-identical doubles).
    */
  def cosine(a: String, b: String): String =
    s"(${dot(a, b)} / (sqrt(${norm2(a)}) * sqrt(${norm2(b)})))"

  /** `nrm` CTE: per-vector precomputed sqrt(norm2) — pair-wise cosine
    * then only folds the dot product once per pair.
    */
  val NormCte: String =
    s"""WITH nrm AS (
       |  SELECT vec_id, embedding, sqrt(${norm2("embedding")}) AS nm
       |  FROM embeddings
       |)""".stripMargin

  /** Cosine given precomputed norms (same doubles as [[cosine]]). */
  def cosineN(a: String, b: String, na: String, nb: String): String =
    s"(${dot(a, b)} / ($na * $nb))"
}
