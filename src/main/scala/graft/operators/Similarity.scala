package graft.operators

import graft.functions.VectorFns
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (SURVEY §2.D).
  *
  * `knn_bruteforce` is the exact baseline: broadcast the (tiny) query
  * set against the full vector scan — one narrow pass, cosine inside
  * whole-stage codegen, per-query top-k via window.
  *
  * `knn_ivf` is the scale path (IVF, nprobe=1): broadcast 16 seed
  * centroids, assign every vector to its nearest centroid (narrow),
  * then search only the query's bucket. At 100 TB the assignment is a
  * scan-speed map and the search shuffle touches 1/16th of the data
  * per query instead of all of it.
  */
object Similarity {

  /** Deterministic query set: the first [[NQueries]] vec_ids. */
  val NQueries = 5
  /** Deterministic seed centroids: the first [[NCentroids]] vec_ids. */
  val NCentroids = 16
  val TopK = 10

  /** embeddings with a precomputed norm — per-pair cosine is then just
    * `dot / (nmA * nmB)`, the same doubles as [[VectorFns.cosineSim]]
    * at a third of the flops.
    */
  private[operators] def withNorm(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("embedding"),
      sqrt(VectorFns.norm2(col("embedding"))).as("nm"))

  def knnBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nm").as("qnm"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        VectorFns.dot(col("qe"), col("embedding")) / (col("qnm") * col("nm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk"), col("vec_id"), round(col("cos"), 6).as("cosine"))
      .orderBy("query_id", "rk")
  }

  /** (vec_id, embedding, nm, bucket) — nearest-centroid assignment,
    * ties broken toward the lower centroid id. Narrow per-row argmax
    * over the broadcast centroid array (no shuffle).
    */
  def ivfAssign(e: DataFrame): DataFrame = {
    val en = withNorm(e)
    val cent = en.filter(col("vec_id") < NCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nm").as("cnm"))
    val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))
    en.crossJoin(broadcast(cent))
      .withColumn("ccos",
        VectorFns.dot(col("embedding"), col("ce")) / (col("nm") * col("cnm")))
      .withColumn("crn", row_number().over(w))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("embedding"), col("nm"), col("cid").as("bucket"))
  }

  /** Shared bucketed-ANN search body: broadcast the query rows of an
    * assignment frame (vec_id, embedding, nm, bucket), join on bucket,
    * exact cosine re-rank inside the bucket.
    */
  private def bucketedKnn(assigned: DataFrame): DataFrame = {
    val q = assigned.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nm").as("qnm"), col("bucket"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    assigned
      .join(broadcast(q), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        VectorFns.dot(col("qe"), col("embedding")) / (col("qnm") * col("nm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk"), col("vec_id"),
        round(col("cos"), 6).as("cosine"), col("bucket"))
      .orderBy("query_id", "rk")
  }

  def knnIvf(spark: SparkSession, dir: String): DataFrame =
    bucketedKnn(ivfAssign(Tables.embeddings(spark, dir)))

  /** Sign-LSH bits: 4 deterministic pseudo-random hyperplanes with
    * rational components r(b,j) = ((709b + 1013j) mod 97 - 48) / 48 —
    * exact integers before one division, so both engines derive
    * bit-identical doubles. Cosine-preserving buckets (Charikar's
    * random-hyperplane LSH), 2^4 = 16 of them.
    */
  val NBits = 4

  private def planeDot(emb: Column, b: Int): Column =
    // empty guard: sequence(0, -1) DESCENDS and element_at would throw;
    // an empty vector dots to 0 (bucket 0), like the oracle's empty range
    when(size(emb) > 0,
      aggregate(sequence(lit(0), size(emb) - 1), lit(0.0),
        (acc, j) => acc + ((lit(b) * 709 + j * 1013) % 97 - 48).cast("double") / 48.0 *
          element_at(emb, j + 1).cast("double")))
      .otherwise(lit(0.0))

  private def lshBucket(emb: Column): Column =
    (0 until NBits).map(b =>
      when(planeDot(emb, b) > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)

  /** (vec_id, embedding, nm, bucket) — narrow hyperplane-sign
    * assignment; no shuffle, no training pass (vs IVF's centroids).
    */
  def lshAssign(e: DataFrame): DataFrame =
    withNorm(e).withColumn("bucket", lshBucket(col("embedding")))

  /** LSH-bucketed ANN: search only the query's sign bucket, exact
    * cosine re-rank inside it. Same shuffle shape as [[knnIvf]] —
    * broadcast queries, join on bucket — but assignment is pure
    * per-row compute, the right trade at 100 TB when a centroid pass
    * is too expensive.
    */
  def knnLsh(spark: SparkSession, dir: String): DataFrame =
    bucketedKnn(lshAssign(Tables.embeddings(spark, dir)))

  // ---- wiring ----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_bruteforce" -> knnBruteforce,
    "knn_ivf" -> knnIvf,
    "knn_lsh" -> knnLsh)

  /** `asg` CTE on top of [[OracleSql.NormCte]]: the IVF bucket
    * assignment (argmax cosine over the 16 seed centroids).
    */
  private val AssignCte: String =
    s""", ac AS (
       |  SELECT v.vec_id, v.embedding, v.nm,
       |    c.vec_id AS cid,
       |    ${OracleSql.cosineN("v.embedding", "c.embedding", "v.nm", "c.nm")} AS ccos
       |  FROM nrm v JOIN nrm c ON c.vec_id < $NCentroids
       |), asg AS (
       |  SELECT vec_id, embedding, nm, cid AS bucket FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crn
       |    FROM ac) WHERE crn = 1
       |)""".stripMargin

  /** DuckDB twin of [[planeDot]]/[[lshBucket]]: identical fold order. */
  private val LshAssignCte: String = {
    def pd(b: Int): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(len(embedding)), " +
        s"j -> (($b * 709 + j * 1013) % 97 - 48)::DOUBLE / 48.0 * embedding[j+1]::DOUBLE)), " +
        "(a, x) -> a + x)"
    val bucket = (0 until NBits)
      .map(b => s"(CASE WHEN ${pd(b)} > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s""", lasg AS (
       |  SELECT vec_id, embedding, nm, CAST($bucket AS BIGINT) AS bucket FROM nrm
       |)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "knn_lsh" ->
      s"""${OracleSql.NormCte}$LshAssignCte, p AS (
         |  SELECT q.vec_id AS query_id, b.vec_id AS vec_id, b.bucket,
         |    ${OracleSql.cosineN("q.embedding", "b.embedding", "q.nm", "b.nm")} AS c
         |  FROM lasg q JOIN lasg b ON q.vec_id < $NQueries
         |    AND b.bucket = q.bucket AND b.vec_id != q.vec_id
         |), r AS (
         |  SELECT query_id, vec_id, bucket, c,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS BIGINT) AS rk
         |  FROM p
         |)
         |SELECT query_id, rk, vec_id, round(c, 6) AS cosine, bucket
         |FROM r WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin,
    "knn_bruteforce" ->
      s"""${OracleSql.NormCte}, p AS (
         |  SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
         |    ${OracleSql.cosineN("q.embedding", "b.embedding", "q.nm", "b.nm")} AS c
         |  FROM nrm q JOIN nrm b ON q.vec_id < $NQueries AND b.vec_id != q.vec_id
         |), r AS (
         |  SELECT query_id, vec_id, c,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS BIGINT) AS rk
         |  FROM p
         |)
         |SELECT query_id, rk, vec_id, round(c, 6) AS cosine
         |FROM r WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin,
    "knn_ivf" ->
      s"""${OracleSql.NormCte}$AssignCte, p AS (
         |  SELECT q.vec_id AS query_id, b.vec_id AS vec_id, b.bucket,
         |    ${OracleSql.cosineN("q.embedding", "b.embedding", "q.nm", "b.nm")} AS c
         |  FROM asg q JOIN asg b ON q.vec_id < $NQueries
         |    AND b.bucket = q.bucket AND b.vec_id != q.vec_id
         |), r AS (
         |  SELECT query_id, vec_id, bucket, c,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS BIGINT) AS rk
         |  FROM p
         |)
         |SELECT query_id, rk, vec_id, round(c, 6) AS cosine, bucket
         |FROM r WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin)
}
