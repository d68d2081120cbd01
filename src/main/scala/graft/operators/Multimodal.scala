package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.E): media payloads as opaque
  * `binary` columns with typed metadata, and a per-partition batch
  * feature-extraction stage.
  *
  * The test corpus has no real image/audio bytes, so the media payload
  * is derived deterministically (UTF-8 bytes of `text`) — the DECODE
  * step is the stub; everything Spark-side (binary schema, metadata
  * extraction, partition-batched processing, column pruning) is the
  * real 100 TB shape: metadata extraction is a narrow codegen'd map,
  * and feature extraction amortizes per-partition setup (a codec
  * handle, a model session) across rows exactly like an image pipeline
  * would.
  */
object Multimodal {

  /** documents with an opaque binary `media` column. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))

  /** Per-source media storage accounting: payload count, total bytes,
    * bytes after within-source exact dedup, and the savings
    * percentage — the report that decides whether media dedup is
    * worth running on a source (at 100 TB the answer funds the
    * pipeline). Digests only: payloads never shuffle (the
    * [[mediaDedup]] discipline) — two digest-keyed partial-agg
    * rollups and a |sources|-row join.
    */
  def mediaSizeReport(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.documents(spark, dir)
      .select(col("source"),
        length(encode(col("text"), "UTF-8")).cast("long").as("nb"),
        md5(encode(col("text"), "UTF-8")).as("h"))
    val per = m.groupBy("source")
      .agg(count(lit(1)).as("n_media"), sum(col("nb")).as("total_bytes"))
    val uniq = m.groupBy(col("source"), col("h"))
      .agg(min(col("nb")).as("nb"))
      .groupBy("source").agg(sum(col("nb")).as("uniq_bytes"))
    per.join(uniq, "source")
      .select(col("source"), col("n_media"), col("total_bytes"), col("uniq_bytes"),
        round(lit(100.0) * (col("total_bytes") - col("uniq_bytes")).cast("double") /
          col("total_bytes").cast("double"), 4).as("dedup_savings_pct"))
      .orderBy("source")
  }

  /** Typed metadata over the opaque payload: byte length, content
    * hash, magic prefix. Narrow, codegen'd, never decodes.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("media_md5"),
        substring(hex(col("media")), 1, 8).as("magic"))
      .orderBy("doc_id")

  /** Batch feature extraction via mapPartitions — TWO feature
    * families sharing one per-partition batch pass, the shape a real
    * media pipeline runs (codec/model session opened once where
    * `it =>` begins, every feature computed off the one decode):
    *
    *  1. a 16-bucket byte histogram (the "global feature vector"),
    *  2. strided-frame Shannon entropy: the payload split into
    *     [[FrameBytes]] frames, every [[FrameStride]]-th sampled (the
    *     keyframe discipline of [[mediaFrames]]), and the byte-value
    *     entropy of the SAMPLED frames — the cheap "is this content
    *     compressible/synthetic?" signal a filter stage gates on.
    *
    * The decode call is the deliberate stub (deterministic UTF-8
    * bytes), so BOTH families are cross-engine checkable and the
    * mapPartitions path runs under the full rows+schema+hash gate.
    * Entropy is emitted as round-half-up micro-bits (BIGINT) — the
    * term order of its float fold is pinned to ascending byte value on
    * both engines, so the double is shared IEEE work, and the integer
    * scaling closes the round()-tie channel.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    mediaFeaturesOf(Tables.documents(spark, dir))

  /** [[mediaFeatures]] over any (doc_id, text) frame. */
  def mediaFeaturesOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ln2 = math.log(2.0)
    docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        // per-partition setup would open the codec / model session here
        it.map { case (docId, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8) // stub decode
          val hist = new Array[Long](16)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 4) += 1; i += 1 }
          val counts = new Array[Long](256)
          var total = 0L
          var sampled = 0L
          val frames = bytes.grouped(FrameBytes).zipWithIndex
          frames.foreach { case (f, fno) =>
            if (fno % FrameStride == 0) {
              sampled += 1
              var j = 0
              while (j < f.length) { counts(f(j) & 0xFF) += 1; total += 1; j += 1 }
            }
          }
          // ascending byte value = the oracle's list_sort fold order;
          // term shape -(p·ln p / ln 2) mirrored exactly
          var ent = 0.0
          var v = 0
          while (v < 256) {
            val c = counts(v)
            if (c > 0) { val p = c.toDouble / total; ent += -(p * math.log(p) / ln2) }
            v += 1
          }
          (docId, bytes.length.toLong, hist.mkString(","), sampled,
            math.floor(ent * 1e6 + 0.5).toLong)
        }
      }
      .toDF("doc_id", "n_bytes", "byte_hist", "frames_sampled", "frame_entropy_e6")
      .orderBy("doc_id")
  }

  /** Batched media RESIZE — the missing rung between decode and
    * feature-extract in a real pipeline (downscale before you embed):
    * stub decode → 2:1 box downsample (each output byte the floor
    * mean of an adjacent input pair — an audio half-rate resample /
    * 1-D image pyramid step), re-encoded and content-addressed. Runs
    * on [[mediaFeaturesOf]]'s mapPartitions batch path (the resampler
    * kernel would initialize where `it =>` begins); the emitted
    * columns are the downstream contract: new payload digest, in/out
    * sizes, and the mean output byte as an exact integer ratio. The
    * deterministic stub keeps the whole path under the
    * rows+schema+hash gate; payloads shuffle only as the resized hex
    * (half the input) and the digest.
    */
  def mediaResize(spark: SparkSession, dir: String): DataFrame =
    mediaResizeOf(Tables.documents(spark, dir))

  def mediaResizeOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hexDigits = "0123456789ABCDEF".toCharArray
    docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        // per-partition setup would open the resampler here
        it.map { case (docId, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8) // stub decode
          val n = bytes.length / 2
          val sb = new java.lang.StringBuilder(n * 2)
          var sum = 0L
          var i = 0
          while (i < n) {
            val v = ((bytes(2 * i) & 0xFF) + (bytes(2 * i + 1) & 0xFF)) / 2
            sum += v
            sb.append(hexDigits(v >> 4)).append(hexDigits(v & 0xF))
            i += 1
          }
          (docId, bytes.length.toLong, n.toLong, sb.toString, sum)
        }
      }
      .toDF("doc_id", "in_bytes", "out_bytes", "out_hex", "sum")
      .select(col("doc_id"), col("in_bytes"), col("out_bytes"),
        md5(col("out_hex")).as("out_md5"),
        // exact mean in milli-units: sum·1000 div n (0 for empty output)
        when(col("out_bytes") > 0,
          expr("cast((sum * 1000) div out_bytes as double) / 1000"))
          .otherwise(lit(0.0)).as("mean_byte"))
      .orderBy("doc_id")
  }

  /** Frame sampling over the opaque payload: fixed 256-byte frames,
    * every 4th sampled (a video pipeline's keyframe stride), each
    * emitted with its checksum. The explode is narrow — frame count
    * derives from the byte length — and at 100 TB the sampled-frame
    * stream is what the decode/feature stages consume, 1/4 the bytes
    * of the source.
    */
  val FrameBytes = 256
  val FrameStride = 4

  def mediaFrames(spark: SparkSession, dir: String): DataFrame = {
    val hexLen = FrameBytes * 2
    mediaTable(spark, dir)
      // frames are sliced on the hex encoding (2 chars/byte): the
      // oracle engine cannot slice raw blobs, and checksumming the hex
      // frame is byte-equivalent plumbing
      .select(col("doc_id"), hex(col("media")).as("h"))
      .withColumn("n_frames",
        ceil(length(col("h")).cast("double") / hexLen).cast("int"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_no"))
      .filter(col("frame_no") % FrameStride === 0)
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        expr(s"substring(h, frame_no * $hexLen + 1, $hexLen)").as("fh"))
      .select(col("doc_id"), col("frame_no"),
        (length(col("fh")) / 2).cast("long").as("frame_bytes"),
        md5(col("fh")).as("frame_md5"))
      .orderBy("doc_id", "frame_no")
  }

  /** Exact payload dedup over the opaque binary column — the
    * multimodal twin of [[Dedup.dedupExact]]: one hash-groupBy on the
    * content digest, canonical (min doc_id) member kept. The digest is
    * computed in the scan stage, so at 100 TB the shuffle carries
    * 16-byte hashes + ids, never payloads.
    */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .groupBy(md5(col("media")).as("media_md5"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_doc"))
      .orderBy("media_md5")

  /** Near-dup media pairs by frame-fingerprint Jaccard ≥ 0.5: each
    * payload becomes its SET of 256-byte frame checksums, candidate
    * pairs come from a join on shared checksums (hash-keyed — never
    * all-pairs), and the overlap count verifies the Jaccard exactly.
    * This is perceptual-dedup plumbing with the codec stubbed: swap
    * the frame checksum for a real pHash and the plan is unchanged.
    * Shuffles carry 32-char digests + ids, never payloads.
    */
  def mediaNeardup(spark: SparkSession, dir: String): DataFrame =
    mediaNeardupOf(mediaTable(spark, dir))

  /** (doc_a < doc_b, ov, na, nb): the frame-set overlap relation both
    * perceptual detectors score — candidates from a join on shared
    * frame checksums (digest-keyed, never all-pairs), overlap counted
    * exactly, set sizes joined back.
    */
  private def framePairsOf(media: DataFrame): DataFrame = {
    val hexLen = FrameBytes * 2
    val fr = media
      .select(col("doc_id"), hex(col("media")).as("h"))
      .withColumn("n_frames",
        ceil(length(col("h")).cast("double") / hexLen).cast("int"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("fno"))
      .select(col("doc_id"),
        md5(expr(s"substring(h, fno * $hexLen + 1, $hexLen)")).as("fmd5"))
      .distinct()
    val sizes = fr.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    fr.as("a").join(fr.as("b"),
        col("a.fmd5") === col("b.fmd5") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("ov"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("nf").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nf").as("nb")), "doc_b")
  }

  /** [[mediaNeardup]] over any (doc_id, media binary) frame. */
  def mediaNeardupOf(media: DataFrame): DataFrame =
    framePairsOf(media)
      .withColumn("jraw",
        col("ov").cast("double") /
          (col("na") + col("nb") - col("ov")).cast("double"))
      // filter on the RAW ratio (what the oracle filters on), round
      // only for output — a value rounding up across 0.5 must not
      // change membership on one engine only
      .filter(col("jraw") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("ov"),
        round(col("jraw"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  /** Directional frame containment — the clip-inside-video detector
    * Jaccard CANNOT express: a 10-frame clip embedded in a
    * 1000-frame video scores ov/min = 1.0 here but Jaccard ≈ 0.01 at
    * [[mediaNeardup]], so symmetric near-dup misses exactly the
    * republished-excerpt case takedown pipelines care about. clip =
    * the smaller frame set (id tie-break), containment =
    * ov / nf_clip, kept at ≥ 0.8 on the RAW ratio (same
    * membership-before-rounding discipline as the Jaccard twin).
    * Shares [[framePairsOf]]'s digest-keyed candidate relation —
    * payloads never shuffle.
    */
  def mediaContainment(spark: SparkSession, dir: String): DataFrame =
    mediaContainmentOf(mediaTable(spark, dir))

  def mediaContainmentOf(media: DataFrame): DataFrame =
    framePairsOf(media)
      .withColumn("craw",
        col("ov").cast("double") / least(col("na"), col("nb")).cast("double"))
      .filter(col("craw") >= 0.8)
      .select(
        when(col("na") <= col("nb"), col("doc_a")).otherwise(col("doc_b"))
          .as("clip_doc"),
        when(col("na") <= col("nb"), col("doc_b")).otherwise(col("doc_a"))
          .as("host_doc"),
        col("ov"), least(col("na"), col("nb")).as("nf_clip"),
        round(col("craw"), 6).as("containment"))
      .orderBy("clip_doc", "host_doc")

  /** The apply half of [[mediaDedup]]: only canonical payload owners
    * (min doc_id per content digest) survive, each carrying how many
    * copies it absorbed — the media twin of the text pipeline's
    * `dedup_apply`, and the frame the storage savings of
    * [[mediaSizeReport]] are realized from. One digest-keyed rollup;
    * payloads never shuffle.
    */
  def mediaDedupApply(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .groupBy(md5(col("media")).as("media_md5"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("media_md5"), col("n_copies"),
        (col("n_copies") - 1).as("n_dropped"))
      .orderBy("doc_id")

  /** Connected components over the [[mediaNeardup]] ≥0.5-Jaccard pair
    * relation — perceptual near-dup media grouped into families with
    * a min-id canonical, completing the detect → cluster → apply
    * ladder the text side has ([[Dedup.dedupClusters]]). Same CC
    * machinery: distributed pointer-jump contraction, bounded local
    * finish ([[GraftOps.connectedComponents]]).
    */
  def mediaNeardupClusters(spark: SparkSession, dir: String): DataFrame =
    GraftOps.connectedComponents(
        mediaNeardup(spark, dir).select(col("doc_a"), col("doc_b")),
        srcCol = "doc_a", dstCol = "doc_b")
      .select(col("node").as("doc_id"), col("component").as("cluster_id"))
      .orderBy("doc_id")

  /** Token budget of one assembled training sequence and the fixed
    * slot cost of one media anchor inside it (a vision encoder's
    * patch-token count — 16 for the stub). */
  val SeqBudget = 256L
  val MediaSlotTokens = 16L

  /** MMC4-style doc↔media interleaved sequence assembly — the
    * multimodal training-sample packer that completes §2.E beyond
    * detect/dedup/resize: each document becomes an ordered segment
    * list (non-overlapping 32-token text chunks, plus ONE media
    * anchor — its digest, never its payload — inserted after chunk
    * `n_bytes mod n_chunks`, the stub for an alignment model's
    * placement choice), and the corpus-ordered segment stream packs
    * into [[SeqBudget]]-token sequences. Segments are ATOMIC (a media
    * anchor cannot straddle two sequences), so a segment belongs to
    * the pack where its cumulative offset STARTS and a pack can run
    * over budget by at most max(31, [[MediaSlotTokens]]−1) tokens —
    * the bounded-overflow contract real packers trade against
    * padding. Positions come from [[GraftOps.runningTotal]]'s
    * two-phase prefix sum (order = (doc_id, ord) struct, doc-bucketed)
    * — no corpus-wide window; the per-pack manifest carries the media
    * digests in sequence order, which is all a trainer's data loader
    * needs to fetch payloads (digests shuffle, payloads never do —
    * the §2.E discipline).
    */
  def mediaInterleave(spark: SparkSession, dir: String): DataFrame =
    mediaInterleaveOf(Tables.documents(spark, dir))

  def mediaInterleaveOf(docs: DataFrame): DataFrame = {
    val cum = GraftOps.runningTotal(interleaveSegmentsOf(docs),
        order = struct(col("doc_id"), col("ord")),
        value = col("cost"), bucket = expr("doc_id div 64"))
      .withColumn("cb", col("running") - col("cost"))
    interleavePackRollup(cum).orderBy("pack_id")
  }

  /** The (doc_id, ord, cost, mref) interleaved segment stream of a
    * document frame — [[mediaInterleave]]'s first stage, shared with
    * the streaming maintainer ([[graft.streaming.Stream.interleaveMaintenance]]).
    */
  private[graft] def interleaveSegmentsOf(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("tk"),
        length(encode(col("text"), "UTF-8")).cast("long").as("nb"),
        md5(encode(col("text"), "UTF-8")).as("mref"))
      .withColumn("n", size(col("tk")).cast("long"))
      .filter(col("n") > 0L)
      .withColumn("nchunks", expr("(n + 31) div 32"))
    // text chunk i sits at even ord 2i+2; the media anchor after chunk
    // k at odd ord 2k+3 — interleaved, unique within the doc
    val text = base
      .select(col("doc_id"), col("n"),
        explode(sequence(lit(0L), col("n") - 1L, lit(32L))).as("s"))
      .select(col("doc_id"),
        (expr("s div 32") * 2L + 2L).as("ord"),
        least(lit(32L), col("n") - col("s")).as("cost"),
        lit(null).cast("string").as("mref"))
    val media = base
      .select(col("doc_id"),
        (pmod(col("nb"), col("nchunks")) * 2L + 3L).as("ord"),
        lit(MediaSlotTokens).as("cost"), col("mref"))
    text.unionByName(media)
  }

  /** Per-pack manifest rollup over a positioned segment frame (needs
    * doc_id, ord, cost, mref, cb) — [[mediaInterleave]]'s second
    * stage, shared with the streaming maintainer's per-batch delta.
    */
  private[graft] def interleavePackRollup(cum: DataFrame): DataFrame =
    cum
      .groupBy(expr(s"cb div $SeqBudget").as("pack_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("mref").isNull, 1L).otherwise(0L)).as("n_text_segs"),
        sum(when(col("mref").isNotNull, 1L).otherwise(0L)).as("n_media_segs"),
        sum(col("cost")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        array_join(transform(
          sort_array(collect_list(when(col("mref").isNotNull,
            struct(col("doc_id"), col("ord"), col("mref"))))),
          x => x.getField("mref")), ",").as("media_refs"))

  /** Packing-efficiency rollup over [[mediaInterleave]] — the
    * multimodal twin of `pack_efficiency_report`: sequence count,
    * token fill rate against [[SeqBudget]], the media anchors' share
    * of the token budget (the compute a trainer spends on vision
    * slots), and the worst bounded-overflow actually realized. One
    * aggregate over the already-rollup-sized pack frame.
    */
  def mediaPackReport(spark: SparkSession, dir: String): DataFrame =
    mediaInterleave(spark, dir).agg(
      count(lit(1)).as("n_seqs"),
      sum(col("n_tokens")).as("total_tokens"),
      sum(col("n_media_segs")).as("n_anchors"),
      round(sum(col("n_media_segs")).cast("double") * MediaSlotTokens /
        sum(col("n_tokens")).cast("double"), 6).as("media_token_share"),
      round(sum(col("n_tokens")).cast("double") /
        (count(lit(1)) * lit(SeqBudget)).cast("double"), 6).as("fill_rate"),
      (max(col("n_tokens")) - lit(SeqBudget)).as("max_overflow"))

  // ---- wiring ----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_interleave" -> mediaInterleave,
    "media_pack_report" -> mediaPackReport,
    "media_neardup" -> mediaNeardup,
    "media_containment" -> mediaContainment,
    "media_resize" -> mediaResize,
    "media_size_report" -> mediaSizeReport,
    "media_meta" -> mediaMeta,
    "media_features" -> mediaFeatures,
    "media_frames" -> mediaFrames,
    "media_dedup" -> mediaDedup,
    "media_dedup_apply" -> mediaDedupApply,
    "media_neardup_clusters" -> mediaNeardupClusters)

  private def mediaInterleaveSql: String =
    s"""$mediaInterleaveChainSql
       |$mediaInterleavePackSelect
       |ORDER BY pack_id""".stripMargin

  private def mediaPackReportSql: String =
    s"""$mediaInterleaveChainSql, packs AS (
       |$mediaInterleavePackSelect
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_seqs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(sum(n_media_segs) AS BIGINT) AS n_anchors,
       |  round(sum(n_media_segs)::DOUBLE * ${MediaSlotTokens} /
       |    sum(n_tokens)::DOUBLE, 6) AS media_token_share,
       |  round(sum(n_tokens)::DOUBLE /
       |    (count(*) * ${SeqBudget})::DOUBLE, 6) AS fill_rate,
       |  CAST(max(n_tokens) - ${SeqBudget} AS BIGINT) AS max_overflow
       |FROM packs""".stripMargin

  private def mediaInterleavePackSelect: String =
    s"""SELECT CAST(cb // ${SeqBudget} AS BIGINT) AS pack_id,
       |  CAST(count(*) AS BIGINT) AS n_segs,
       |  CAST(count(*) FILTER (WHERE mref IS NULL) AS BIGINT) AS n_text_segs,
       |  CAST(count(*) FILTER (WHERE mref IS NOT NULL) AS BIGINT) AS n_media_segs,
       |  CAST(sum(cost) AS BIGINT) AS n_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       |  coalesce(string_agg(mref, ',' ORDER BY doc_id, ord)
       |    FILTER (WHERE mref IS NOT NULL), '') AS media_refs
       |FROM cum GROUP BY 1""".stripMargin

  private def mediaInterleaveChainSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0) AS tk,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS nb, md5(text) AS mref
       |  FROM documents
       |), b AS (
       |  SELECT doc_id, nb, mref, CAST(len(tk) AS BIGINT) AS n,
       |    CAST((len(tk) + 31) // 32 AS BIGINT) AS nchunks
       |  FROM toks WHERE len(tk) > 0
       |), t AS (
       |  SELECT doc_id, CAST((s // 32) * 2 + 2 AS BIGINT) AS ord,
       |    CAST(least(32, n - s) AS BIGINT) AS cost, NULL::VARCHAR AS mref
       |  FROM (SELECT doc_id, n, unnest(range(0, n, 32)) AS s FROM b)
       |), m AS (
       |  SELECT doc_id, CAST((nb % nchunks) * 2 + 3 AS BIGINT) AS ord,
       |    CAST(${MediaSlotTokens} AS BIGINT) AS cost, mref FROM b
       |), segs AS (
       |  SELECT * FROM t UNION ALL SELECT * FROM m
       |), cum AS (
       |  SELECT doc_id, ord, cost, mref,
       |    CAST(sum(cost) OVER (ORDER BY doc_id, ord) - cost AS BIGINT) AS cb
       |  FROM segs
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "media_pack_report" -> mediaPackReportSql,
    "media_interleave" -> mediaInterleaveSql,
    "media_size_report" ->
      """WITH m AS (
        |  SELECT source,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS nb,
        |    md5(text) AS h
        |  FROM documents
        |), per AS (
        |  SELECT source, count(*) AS n_media,
        |    CAST(sum(nb) AS BIGINT) AS total_bytes
        |  FROM m GROUP BY source
        |), u AS (
        |  SELECT source, CAST(sum(nb) AS BIGINT) AS uniq_bytes FROM (
        |    SELECT source, h, min(nb) AS nb FROM m GROUP BY source, h
        |  ) GROUP BY source
        |)
        |SELECT source, n_media, total_bytes, uniq_bytes,
        |  round(100.0 * CAST(total_bytes - uniq_bytes AS DOUBLE) /
        |    CAST(total_bytes AS DOUBLE), 4) AS dedup_savings_pct
        |FROM per JOIN u USING (source) ORDER BY source""".stripMargin,
    "media_features" ->
      s"""WITH m AS (
         |  SELECT doc_id, hex(encode(text)) AS h FROM documents
         |), g AS (
         |  SELECT doc_id,
         |    strpos('0123456789ABCDEF', substring(h, 2 * i::INT + 1, 1)) - 1 AS bucket
         |  FROM m, unnest(range(length(h) // 2)) AS u(i)
         |), gc AS (
         |  SELECT doc_id, bucket, count(*) AS n FROM g GROUP BY doc_id, bucket
         |), fl AS (
         |  SELECT m.doc_id, r.bucket FROM m, (SELECT unnest(range(16)) AS bucket) r
         |), j AS (
         |  SELECT fl.doc_id, fl.bucket, coalesce(gc.n, 0) AS n
         |  FROM fl LEFT JOIN gc USING (doc_id, bucket)
         |), hist AS (
         |  SELECT doc_id,
         |    array_to_string(list_transform(
         |      list_sort(list(struct_pack(b := bucket, n := n))),
         |      x -> x['n']::VARCHAR), ',') AS byte_hist
         |  FROM j GROUP BY doc_id
         |), sf AS (
         |  SELECT doc_id, substring(h, fno::INT * ${FrameBytes * 2} + 1, ${FrameBytes * 2}) AS f
         |  FROM (SELECT doc_id, h,
         |          unnest(range(CAST(ceil(length(h)::DOUBLE / ${FrameBytes * 2}) AS INT))) AS fno
         |        FROM m WHERE length(h) > 0)
         |  WHERE fno % $FrameStride = 0
         |), ns AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS frames_sampled FROM sf GROUP BY doc_id
         |), by AS (
         |  SELECT doc_id,
         |    16 * (strpos('0123456789ABCDEF', substring(f, 2 * i::INT + 1, 1)) - 1)
         |      + (strpos('0123456789ABCDEF', substring(f, 2 * i::INT + 2, 1)) - 1) AS b
         |  FROM sf, unnest(range(length(f) // 2)) AS u(i)
         |), bc AS (
         |  SELECT doc_id, b, count(*)::DOUBLE AS c FROM by GROUP BY doc_id, b
         |), bt AS (SELECT doc_id, sum(c) AS t FROM bc GROUP BY doc_id),
         |terms AS (
         |  SELECT bc.doc_id, bc.b, -((bc.c / bt.t) * ln(bc.c / bt.t) / ln(2.0)) AS x
         |  FROM bc JOIN bt USING (doc_id)
         |), ef AS (
         |  SELECT doc_id, CAST(floor(
         |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(
         |      list_sort(list(struct_pack(b := b, x := x))), p -> p['x'])),
         |      (a, v) -> a + v) * 1e6 + 0.5) AS BIGINT) AS frame_entropy_e6
         |  FROM terms GROUP BY doc_id
         |)
         |SELECT m.doc_id, CAST(length(m.h) // 2 AS BIGINT) AS n_bytes, hist.byte_hist,
         |  coalesce(ns.frames_sampled, 0) AS frames_sampled,
         |  coalesce(ef.frame_entropy_e6, 0) AS frame_entropy_e6
         |FROM m JOIN hist USING (doc_id)
         |  LEFT JOIN ns USING (doc_id) LEFT JOIN ef USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "media_neardup" ->
      s"""WITH m AS (
         |  SELECT doc_id, hex(encode(text)) AS h,
         |    CAST(ceil(length(hex(encode(text)))::DOUBLE / ${FrameBytes * 2}) AS INT) AS n_frames
         |  FROM documents
         |), fr AS (
         |  SELECT DISTINCT doc_id,
         |    md5(substring(h, fno::INT * ${FrameBytes * 2} + 1, ${FrameBytes * 2})) AS fmd5
         |  FROM (SELECT doc_id, h, unnest(range(n_frames)) AS fno FROM m WHERE n_frames > 0)
         |), sz AS (
         |  SELECT doc_id, count(*) AS nf FROM fr GROUP BY doc_id
         |), ov AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ov
         |  FROM fr a JOIN fr b ON a.fmd5 = b.fmd5 AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b, ov,
         |  round(ov::DOUBLE / (sa.nf + sb.nf - ov)::DOUBLE, 6) AS jaccard
         |FROM ov JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
         |WHERE ov::DOUBLE / (sa.nf + sb.nf - ov)::DOUBLE >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "media_resize" ->
      """WITH m AS (
        |  SELECT doc_id, hex(encode(text)) AS h FROM documents
        |), vs AS (
        |  SELECT doc_id, CAST(length(h) // 2 AS BIGINT) AS in_bytes,
        |    list_transform(range(length(h) // 4), i ->
        |      ((16 * (strpos('0123456789ABCDEF', substring(h, 4 * i::INT + 1, 1)) - 1)
        |        + (strpos('0123456789ABCDEF', substring(h, 4 * i::INT + 2, 1)) - 1))
        |       + (16 * (strpos('0123456789ABCDEF', substring(h, 4 * i::INT + 3, 1)) - 1)
        |        + (strpos('0123456789ABCDEF', substring(h, 4 * i::INT + 4, 1)) - 1))) // 2)
        |      AS v
        |  FROM m
        |)
        |SELECT doc_id, in_bytes, CAST(len(v) AS BIGINT) AS out_bytes,
        |  md5(array_to_string(list_transform(v, x -> format('{:02X}', x)), ''))
        |    AS out_md5,
        |  CASE WHEN len(v) > 0 THEN
        |    CAST((list_reduce(list_prepend(0::BIGINT, v), (a, x) -> a + x) * 1000)
        |      // len(v) AS DOUBLE) / 1000
        |  ELSE 0.0 END AS mean_byte
        |FROM vs ORDER BY doc_id""".stripMargin,
    "media_containment" ->
      s"""WITH m AS (
         |  SELECT doc_id, hex(encode(text)) AS h,
         |    CAST(ceil(length(hex(encode(text)))::DOUBLE / ${FrameBytes * 2}) AS INT) AS n_frames
         |  FROM documents
         |), fr AS (
         |  SELECT DISTINCT doc_id,
         |    md5(substring(h, fno::INT * ${FrameBytes * 2} + 1, ${FrameBytes * 2})) AS fmd5
         |  FROM (SELECT doc_id, h, unnest(range(n_frames)) AS fno FROM m WHERE n_frames > 0)
         |), sz AS (
         |  SELECT doc_id, count(*) AS nf FROM fr GROUP BY doc_id
         |), ov AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ov
         |  FROM fr a JOIN fr b ON a.fmd5 = b.fmd5 AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), pr AS (
         |  SELECT doc_a, doc_b, ov, sa.nf AS na, sb.nf AS nb
         |  FROM ov JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
         |)
         |SELECT
         |  CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS clip_doc,
         |  CASE WHEN na <= nb THEN doc_b ELSE doc_a END AS host_doc,
         |  ov, least(na, nb) AS nf_clip,
         |  round(ov::DOUBLE / least(na, nb)::DOUBLE, 6) AS containment
         |FROM pr WHERE ov::DOUBLE / least(na, nb)::DOUBLE >= 0.8
         |ORDER BY clip_doc, host_doc""".stripMargin,
    "media_dedup_apply" ->
      """WITH m AS (
        |  SELECT doc_id, md5(text) AS h FROM documents
        |), g AS (
        |  SELECT h, min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
        |  FROM m GROUP BY h
        |)
        |SELECT doc_id, h AS media_md5, n_copies, n_copies - 1 AS n_dropped
        |FROM g ORDER BY doc_id""".stripMargin,
    "media_neardup_clusters" ->
      s"""WITH RECURSIVE m AS (
         |  SELECT doc_id, hex(encode(text)) AS h,
         |    CAST(ceil(length(hex(encode(text)))::DOUBLE / ${FrameBytes * 2}) AS INT) AS n_frames
         |  FROM documents
         |), fr AS (
         |  SELECT DISTINCT doc_id,
         |    md5(substring(h, fno::INT * ${FrameBytes * 2} + 1, ${FrameBytes * 2})) AS fmd5
         |  FROM (SELECT doc_id, h, unnest(range(n_frames)) AS fno FROM m WHERE n_frames > 0)
         |), sz AS (
         |  SELECT doc_id, count(*) AS nf FROM fr GROUP BY doc_id
         |), ov AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ov
         |  FROM fr a JOIN fr b ON a.fmd5 = b.fmd5 AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), prs AS (
         |  SELECT doc_a, doc_b FROM ov
         |  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
         |  WHERE ov::DOUBLE / (sa.nf + sb.nf - ov)::DOUBLE >= 0.5
         |), sym AS (
         |  SELECT doc_a AS a, doc_b AS b FROM prs
         |  UNION ALL SELECT doc_b, doc_a FROM prs
         |), reach AS (
         |  SELECT a, b FROM sym
         |  UNION
         |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
         |)
         |SELECT a AS doc_id, least(a, min(b)) AS cluster_id
         |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin,
    "media_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS media_md5,
        |  substring(hex(encode(text)), 1, 8) AS magic
        |FROM documents ORDER BY doc_id""".stripMargin,
    "media_frames" ->
      s"""WITH m AS (
         |  SELECT doc_id, hex(encode(text)) AS h,
         |    CAST(ceil(length(hex(encode(text)))::DOUBLE / ${FrameBytes * 2}) AS INT) AS n_frames
         |  FROM documents
         |), f AS (
         |  SELECT doc_id, h, unnest(range(n_frames)) AS frame_no FROM m WHERE n_frames > 0
         |)
         |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
         |  CAST(length(substring(h, frame_no::INT * ${FrameBytes * 2} + 1, ${FrameBytes * 2})) // 2 AS BIGINT)
         |    AS frame_bytes,
         |  md5(substring(h, frame_no::INT * ${FrameBytes * 2} + 1, ${FrameBytes * 2})) AS frame_md5
         |FROM f WHERE frame_no % $FrameStride = 0
         |ORDER BY doc_id, frame_no""".stripMargin,
    "media_dedup" ->
      """SELECT md5(text) AS media_md5, count(*) AS n_copies,
        |  min(doc_id) AS canonical_doc
        |FROM documents GROUP BY media_md5 ORDER BY media_md5""".stripMargin)
}
