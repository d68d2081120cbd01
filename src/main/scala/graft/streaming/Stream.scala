package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Structured Streaming operators (SURVEY §2.G): the streaming
  * re-expression of the batch `window_tumbling` and `sessionize`
  * analytics. Verified by ScalaTest specs over MemoryStream (no DuckDB
  * oracle — the gate's oracle is batch-only).
  *
  * Scale posture: both are single-shuffle stateful aggregations keyed
  * on (window, type) / user — state is bounded by the watermark, so a
  * 1000-executor cluster holds only the open windows/sessions, not
  * history.
  */
object Stream {

  case class Ev(user_id: Long, ts: Timestamp, event_type: String)
  case class Session(user_id: Long, n_events: Long, start_us: Long, end_us: Long)
  case class SessState(n: Long, startUs: Long, endUs: Long)

  /** Streaming exact dedup — the streaming twin of
    * `Dedup.dedupExact`: drop documents whose md5(text) was already
    * seen within the watermark. State is the set of hashes inside the
    * watermark horizon only, so a 100 TB/day firehose holds hours of
    * fingerprints (16 bytes each), not history.
    */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_md5", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_md5")

  /** [[sessionize]] plus watermark-driven closing: an idle session
    * also emits once the event-time watermark passes its gap deadline
    * (EventTimeTimeout), not only when a later event for the same user
    * happens to arrive — the production behavior for users who simply
    * leave. State per user is one open session; the watermark bounds
    * how long it can live.
    */
  def sessionizeWithTimeout(events: Dataset[Ev], gapMinutes: Long = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def tsUs(t: Timestamp): Long = t.getTime * 1000L

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.n, s.startUs, s.endUs))
          } else {
            val sorted = evs.toSeq.sortBy(e => tsUs(e.ts))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = tsUs(e.ts)
              cur match {
                // within gap of the open interval on EITHER side: an
                // out-of-order (but in-watermark) event may precede the
                // session start, so the start is lowered too
                case Some(s) if t >= s.startUs - gapUs && t - s.endUs <= gapUs =>
                  cur = Some(SessState(s.n + 1, math.min(s.startUs, t), math.max(s.endUs, t)))
                case Some(s) =>
                  closed += Session(userId, s.n, s.startUs, s.endUs)
                  cur = Some(SessState(1L, t, t))
                case None =>
                  cur = Some(SessState(1L, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endUs / 1000L + gapMinutes * 60000L)
            }
            closed.result().iterator
          }
      }
  }

  case class VecIn(vec_id: Long, embedding: Array[Double])
  case class KcSnap(n_seen: Long, n_centers: Long, radius: Double,
      centers: Seq[Long])
  case class KcState(centers: List[(Long, Array[Double])], radius: Double,
      seen: Long)

  /** Streaming k-center coreset maintenance — the online companion of
    * `Similarity.kcenterSelect` via the incremental DOUBLING algorithm
    * (Charikar-Chekuri-Feder-Motwani STOC'97): keep ≤ k centers and a
    * working radius r; a new point farther than 2r (cosine distance)
    * from every center becomes a center, and on overflow r doubles
    * (seeded at the centers' min pairwise distance) and centers within
    * 2r of an earlier-id center merge away. State is O(k·dim) however
    * long the stream runs — the bounded-state shape that makes a
    * coreset maintainable over an unbounded embedding firehose; each
    * batch appends one (n_seen, n_centers, radius, centers) snapshot.
    * Points apply in vec_id order within a batch so replays are
    * deterministic. Single global key by the same contract as
    * [[skylineStream]]: the state is a global O(k) summary, and at
    * scale a per-partition pre-filter against a broadcast of the
    * current centers drops already-covered points before this key.
    */
  def kcenterStream(vecs: Dataset[VecIn], k: Int = 8): Dataset[KcSnap] = {
    import vecs.sparkSession.implicits._

    def dist(a: Array[Double], b: Array[Double]): Double = {
      var (dot, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }

    def minDist(p: Array[Double], cs: List[(Long, Array[Double])]): Double =
      cs.map(c => dist(p, c._2)).min

    // drop centers within 2r of an earlier-id kept center
    def merge(cs: List[(Long, Array[Double])], r: Double): List[(Long, Array[Double])] =
      cs.sortBy(_._1).foldLeft(List.empty[(Long, Array[Double])]) { (kept, c) =>
        if (kept.isEmpty || kept.map(kc => dist(c._2, kc._2)).min > 2 * r) kept :+ c
        else kept
      }

    vecs
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[KcState, KcSnap](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (_, points: Iterator[VecIn], state: GroupState[KcState]) =>
          var s = state.getOption.getOrElse(KcState(Nil, 0.0, 0L))
          points.toSeq.sortBy(_.vec_id).foreach { p =>
            s = s.copy(seen = s.seen + 1)
            if (s.centers.size < k) {
              // the first k distinct points seed the center set
              if (s.centers.isEmpty || minDist(p.embedding, s.centers) > 0)
                s = s.copy(centers = s.centers :+ (p.vec_id -> p.embedding))
            } else if (minDist(p.embedding, s.centers) > 2 * s.radius) {
              var cs = s.centers :+ (p.vec_id -> p.embedding)
              var r = s.radius
              while (cs.size > k) {
                r = if (r == 0.0)
                  cs.combinations(2).map(x => dist(x(0)._2, x(1)._2)).min
                else 2 * r
                cs = merge(cs, r)
              }
              s = s.copy(centers = cs, radius = r)
            }
          }
          state.update(s)
          Iterator(KcSnap(s.seen, s.centers.size.toLong, s.radius,
            s.centers.map(_._1)))
      }
  }

  case class EvA(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class AttrSession(user_id: Long, touch_type: String, n_events: Long,
      sess_value: Double, start_us: Long)
  case class AttrState(firstUs: Long, firstType: String, n: Long,
      value: Double, startUs: Long, endUs: Long)

  /** Streaming first-touch attribution — the streaming twin of
    * `Analytics.attributionFirstTouch`: each closed session (same
    * 30-minute gap + EventTimeTimeout discipline as
    * [[sessionizeWithTimeout]]) emits its total value mass credited to
    * its FIRST event_type. An out-of-order (but in-watermark) event
    * that precedes the open session's start RE-CREDITS the session
    * (the first touch is whatever the earliest event turns out to be,
    * ties at the same instant broken by event_type — the stream has no
    * event_id, so the tie-break is the lexicographic type). State per
    * user is one open credited session; the watermark bounds its
    * lifetime, so a 100 TB/day firehose holds open sessions only.
    * Downstream the per-touch rollup is an ordinary streaming agg on
    * this append output.
    */
  def attributionStream(events: Dataset[EvA], gapMinutes: Long = 30): Dataset[AttrSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def tsUs(t: Timestamp): Long = t.getTime * 1000L

    def close(userId: Long, s: AttrState): AttrSession =
      AttrSession(userId, s.firstType, s.n, s.value, s.startUs)

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, AttrSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[EvA], state: GroupState[AttrState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(close(userId, s))
          } else {
            // (ts, type) order so replays apply a micro-batch identically
            val sorted = evs.toSeq.sortBy(e => (tsUs(e.ts), e.event_type))
            var cur = state.getOption
            val closed = Seq.newBuilder[AttrSession]
            sorted.foreach { e =>
              val t = tsUs(e.ts)
              cur match {
                case Some(s) if t >= s.startUs - gapUs && t - s.endUs <= gapUs =>
                  val (fu, ft) =
                    if (t < s.firstUs || (t == s.firstUs && e.event_type < s.firstType))
                      (t, e.event_type)
                    else (s.firstUs, s.firstType)
                  cur = Some(AttrState(fu, ft, s.n + 1, s.value + e.value,
                    math.min(s.startUs, t), math.max(s.endUs, t)))
                case Some(s) =>
                  closed += close(userId, s)
                  cur = Some(AttrState(t, e.event_type, 1L, e.value, t, t))
                case None =>
                  cur = Some(AttrState(t, e.event_type, 1L, e.value, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endUs / 1000L + gapMinutes * 60000L)
            }
            closed.result().iterator
          }
      }
  }

  case class Throttled(user_id: Long, event_type: String, ts_us: Long)

  case class SkyIn(id: Long, price_cents: Long, ts: Timestamp)
  case class SkyOut(id: Long, price_cents: Long, ts_us: Long)

  /** Online skyline: emit every point that is Pareto-optimal on
    * (min price, max recency) AGAINST EVERYTHING SEEN BEFORE IT — the
    * streaming sibling of [[graft.operators.Analytics.skylineOrders]]
    * with arrival-time semantics (a later point never retracts an
    * earlier emission, so the output is Append-clean; the batch
    * operator gives the retrospective frontier). State is the current
    * frontier only — O(ln n) points in expectation for random arrivals
    * — under one global key, which is inherent to a GLOBAL frontier
    * and cheap because only frontier comparisons reach it; at scale a
    * local per-partition frontier pass pre-filters candidates before
    * this key (same two-phase discipline as the batch operator's
    * buckets). Within a micro-batch, points apply in id order so
    * replays are deterministic.
    */
  def skylineStream(points: Dataset[SkyIn]): Dataset[SkyOut] = {
    import points.sparkSession.implicits._
    points.groupByKey(_ => 0)
      .flatMapGroupsWithState[List[(Long, Long, Long)], SkyOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        case (_, pts, state) =>
          var frontier = state.getOption.getOrElse(Nil) // (id, price, dateUs)
          val out = List.newBuilder[SkyOut]
          pts.toSeq.sortBy(_.id).foreach { p =>
            val d = p.ts.getTime * 1000L
            val dominated = frontier.exists { case (_, fp, fd) =>
              fp <= p.price_cents && fd >= d && (fp < p.price_cents || fd > d)
            }
            if (!dominated) {
              frontier = (p.id, p.price_cents, d) ::
                frontier.filterNot { case (_, fp, fd) =>
                  p.price_cents <= fp && d >= fd && (p.price_cents < fp || d > fd)
                }
              out += SkyOut(p.id, p.price_cents, d)
            }
          }
          state.update(frontier)
          out.result().iterator
      }
  }

  /** Streaming event throttle — GREEDY debounce: per (user, type),
    * emit an event only when ≥ `windowMinutes` passed since the last
    * EMITTED event of that key (the notification/alerting rule: first
    * event fires immediately, the storm after it is suppressed).
    * Batch sibling: `Analytics.windowThrottle` keeps the
    * lag-expressible gap rule (distance to predecessor); the two
    * differ exactly when suppressed events chain — greedy measures
    * from the last kept, so a steady sub-window drip stays suppressed
    * forever here but re-fires under the gap rule.
    *
    * State per key is ONE long (the last emitted microsecond), evicted
    * by EventTimeTimeout once the watermark passes last + window: any
    * later in-watermark event is ≥ window away and emits regardless,
    * so eviction can't change results — bounded state with no
    * correctness loss.
    */
  def throttle(events: Dataset[Ev], windowMinutes: Long = 10,
      watermark: String = "1 hour"): Dataset[Throttled] = {
    import events.sparkSession.implicits._
    val wUs = windowMinutes * 60L * 1000000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Long, Throttled](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        case ((uid, etype), evs, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var last = state.getOption
            val out = Seq.newBuilder[Throttled]
            sorted.foreach { e =>
              val t = e.ts.getTime * 1000L
              if (last.forall(l => t - l >= wUs)) {
                out += Throttled(uid, etype, t)
                last = Some(t)
              }
            }
            last.foreach { l =>
              state.update(l)
              state.setTimeoutTimestamp(l / 1000L + windowMinutes * 60000L)
            }
            out.result().iterator
          }
      }
  }

  /** Continuous index maintenance: a document stream keeps a saved
    * [[graft.sources.IndexStore]] index fresh — each micro-batch
    * builds the positional postings of its documents
    * ([[graft.operators.Index.invertedIndexOf]]) and lands them as
    * ONE SEGMENT of a segmented store
    * ([[graft.sources.IndexStore.saveSegment]]): the per-batch write
    * is DELTA-SIZED however large the store grows (r10 VERDICT item
    * 3 — the old path re-merged and rewrote the whole store every
    * batch, an O(|store|) write that is a real ceiling at a 100 TB
    * index). Document granularity is preserved at READ time
    * (last-writer-wins across segments: a re-crawled doc's old
    * postings disappear), and [[graft.sources.IndexStore
    * .compactSegments]] folds the store whenever the segment count
    * reaches `compactEvery`, bounding read amplification. This is the
    * streaming completion of the reference's batch-only indexer: the
    * same index artifact, kept current instead of rebuilt.
    *
    * foreachBatch is the right tool (vs a streaming agg sink): the
    * landing is an arbitrary batch job — a bucketed index build —
    * not an incremental aggregation. Exactly-once = IDEMPOTENT BY
    * CONTENT, exactly like the old full-merge path (and unlike the
    * marker-keyed pack store): segments take monotonically increasing
    * ids, so a replayed (or fresh-query-re-fed) batch lands a
    * DUPLICATE segment — harmless, because doc-granular
    * last-writer-wins resolves it to the identical postings, and the
    * next compaction sweeps it. Compaction keeps the two-rename swap
    * (never a moment with zero store copies on disk), repaired by the
    * recovery step at the next batch. State lives in the store, not
    * executor memory, so a 100 TB index streams through.
    */
  // the crash-safe swap protocol lives in sources.StoreSwap (shared
  // with the segmented stores' compaction); these aliases keep every
  // sink's call sites readable
  private def mustRename(fs: org.apache.hadoop.fs.FileSystem,
                         from: org.apache.hadoop.fs.Path,
                         to: org.apache.hadoop.fs.Path): Unit =
    graft.sources.StoreSwap.mustRename(fs, from, to)

  private def recoverStore(fs: org.apache.hadoop.fs.FileSystem,
                           base: org.apache.hadoop.fs.Path): Unit =
    graft.sources.StoreSwap.recover(fs, base)

  private def swapStore(fs: org.apache.hadoop.fs.FileSystem,
                        base: org.apache.hadoop.fs.Path, merged: String): Unit =
    graft.sources.StoreSwap.swap(fs, base, merged)

  def indexMaintenance(docs: DataFrame, indexPath: String,
                       nBuckets: Int = 8, compactEvery: Int = 16): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val basePath = new org.apache.hadoop.fs.Path(indexPath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath) // a compaction may have died mid-swap
        val delta = graft.operators.Index.invertedIndexOf(batch)
        val existing = graft.sources.IndexStore.segmentIds(spark, indexPath)
        val segId = existing.lastOption.getOrElse(-1L) + 1L
        graft.sources.IndexStore.saveSegment(delta, indexPath, segId, nBuckets)
        if (existing.size + 1 >= compactEvery)
          graft.sources.IndexStore.compactSegments(spark, indexPath)
        () // foreachBatch wants (Dataset, Long) => Unit, not => Boolean
      }

  /** Continuous takedown processing — the DELETION twin of
    * [[indexMaintenance]] (r13): a doc_id stream (the GDPR /
    * DMCA / redaction queue every serving deployment carries) keeps a
    * saved index's tombstones current. Per micro-batch:
    *
    *   - the batch's ids land as ONE batch-keyed tombstone dir
    *     ([[graft.sources.IndexStore.deleteBatch]] —
    *     `_tombstones/src_batch=<id>`, an O(|batch|) write however
    *     large the index); a REPLAYED batch overwrites its own
    *     landing, so the write is exactly-once at batch granularity
    *     and the file count never grows on replay;
    *   - readers need nothing: [[graft.sources.IndexStore.load]]
    *     anti-joins the accumulated set, so the takedown is visible
    *     to term/phrase/ranked serving at the NEXT query with no
    *     index rewrite;
    *   - when the landing count reaches `compactEvery`, the loop
    *     folds tombstones into the index FOR REAL
    *     ([[graft.sources.IndexStore.compactSegments]], which r13
    *     generalized to fold a plain or one-segment store too) —
    *     deleted postings leave disk, the anti-join list resets to
    *     empty, and the serving-stats side table refreshes inside the
    *     same crash-safe two-rename swap.
    *
    * Deletion state lives in the store (not the checkpoint), and the
    * store family's fresh-checkpoint contract applies: a restart from
    * a FRESH checkpoint restarts batch ids at 0, and a landing below
    * the tombstone set's applied horizon FAILS LOUDLY
    * ([[graft.sources.IndexStore.deleteBatch]]'s horizon guard) —
    * silently overwriting `src_batch=0` would un-delete that batch's
    * earlier takedowns. Restart from the original checkpoint, or fold
    * the store first: after a fold the landings (and the horizon) are
    * gone because every takedown left disk for real, so a fresh
    * checkpoint over a just-folded store is legitimate.
    * Single-writer discipline is the store family's usual contract:
    * run the takedown loop in the same driver as (sequenced with) the
    * index-maintenance loop, not concurrently against one store.
    *
    * CROSS-STORE takedown (r14 — the r13 verdict's gap #3: tombstones
    * purged only the index, while the document's content also lives
    * in the corpus store and the embedding store): `corpusPath` /
    * `embedPath` extend the SAME batch-keyed discipline
    * ([[graft.sources.Tombstones]]) to those stores — per batch the
    * ids land in each store's own `_tombstones` (each with its own
    * horizon guard), every reader ([[graft.sources.CorpusStore.load]]/
    * `loadLang`, [[loadEmbedStore]] and therefore [[knnServe]] and
    * [[hybridServe]]'s dense leg) anti-joins them live, and each
    * store folds independently at its own `compactEvery` trigger so
    * the content leaves disk for real. The embed store keys by
    * `vec_id` under the deployment convention vec_id == doc_id (a
    * document's embedding row carries its doc id); a deployment with
    * a doc→vec mapping expands ids upstream of this sink. PACK /
    * interleave stores are NOT tombstone-covered by design: a pack
    * concatenates many documents into one training row, so in-place
    * excision would rewrite every straddling pack — the documented
    * contract is REBUILD-ON-TAKEDOWN (re-run packing from the
    * already-purged corpus store; `pack_tokens`/`media_interleave`
    * are one-pass rebuilds), and the r15 TRIPWIRE makes staleness
    * loud: stores stamped with the corpus takedown epoch
    * ([[stampCorpusEpoch]]) refuse to load once the corpus processed
    * a takedown past the stamp ([[requirePackFresh]]).
    */
  def takedownMaintenance(ids: DataFrame, indexPath: String,
                          compactEvery: Int = 16,
                          corpusPath: Option[String] = None,
                          embedPath: Option[String] = None): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    ids.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val basePath = new org.apache.hadoop.fs.Path(indexPath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath) // a fold may have died mid-swap
        graft.sources.IndexStore.deleteBatch(batch, indexPath, batchId)
        if (graft.sources.IndexStore.tombstoneBatchCount(spark, indexPath) >= compactEvery)
          graft.sources.IndexStore.compactSegments(spark, indexPath)
        corpusPath.foreach { cp =>
          val root = new org.apache.hadoop.fs.Path(cp)
          recoverStore(root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
          graft.sources.CorpusStore.deleteBatch(batch, cp, batchId)
          if (graft.sources.CorpusStore.tombstoneBatchCount(spark, cp) >= compactEvery)
            graft.sources.CorpusStore.foldTombstones(spark, cp)
        }
        embedPath.foreach { ep =>
          val root = new org.apache.hadoop.fs.Path(ep)
          recoverStore(root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
          graft.sources.Tombstones.landBatch(
            batch.select(col("doc_id").as("vec_id")), ep, batchId, key = "vec_id")
          if (graft.sources.Tombstones.batchCount(spark, ep) >= compactEvery)
            compactEmbedStore(spark, ep)
        }
        ()
      }

  /** Continuous ANN-index maintenance — the embedding twin of
    * [[indexMaintenance]]: an embedding stream keeps a saved
    * bucket-partitioned IVF assignment store fresh. Per micro-batch:
    * norm the batch, assign each vector to its nearest centroid from
    * a SAVED centroid table ([[graft.operators.Similarity
    * .saveCentroids]] — the coarse quantizer is trained once and
    * fixed, so bucket ids stay stable across batches), then merge at
    * VECTOR granularity (a re-embedded vec_id's old assignment
    * disappears — the re-crawled-document rule applied to vectors)
    * and rewrite the store partitioned by bucket, so query-time
    * bucket reads prune directories exactly like the term-bucketed
    * IndexStore. Exactly-once by idempotent replay + the same
    * two-rename crash-safe swap.
    */
  def embedIndexMaintenance(vecs: DataFrame, centroidPath: String,
                            storePath: String, compactEvery: Int = 16): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val basePath = new org.apache.hadoop.fs.Path(storePath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath) // a compaction may have died mid-swap
        val cent = spark.read.parquet(centroidPath)
        val assigned = graft.operators.Similarity
          .ivfAssignTo(graft.operators.Similarity.withNormOf(batch), cent)
          .select(col("vec_id"), col("embedding"), col("nm"), col("bucket"))
        // delta-sized landing (r10 VERDICT item 3): each batch's
        // assignments land as seg=<id>/bucket=<b> (bucket partitioning
        // INSIDE the segment keeps serve-side directory pruning);
        // vector granularity is resolved last-writer-wins at read
        // ([[loadEmbedStore]]) — a re-embedded vec_id's newest segment
        // wins even when its bucket changed. Ids are monotonic, so a
        // replayed batch lands a duplicate segment that resolves
        // identically (content-idempotent, like [[indexMaintenance]]).
        val segId = segmentIdsAt(fs, basePath).lastOption.getOrElse(-1L) + 1L
        landSegment(assigned, storePath, segId, fs, partitionCol = Some("bucket"))
        if (segmentIdsAt(fs, basePath).size >= compactEvery)
          compactEmbedStore(spark, storePath)
        ()
      }

  /** Read an [[embedIndexMaintenance]] store with vector-granular
    * last-writer-wins resolution: a vec_id's rows from any segment
    * older than its newest are dropped (one column-pruned (vec_id,
    * seg) scan + a left-semi join — ids are ~100× narrower than the
    * embedding payload the old full-rewrite path copied every batch).
    * Bucket predicates still prune each segment's `bucket=` dirs and
    * push through the semi-join's streamed side. A plain
    * (pre-segment or compacted single-segment) store passes through.
    *
    * The read is PINNED to one FS listing: the segment dirs listed up
    * front are exactly the paths handed to the scan, so the
    * single-segment fast path and the data it reads can never
    * disagree. (Deriving the fast path from a listing but the scan
    * from a later root re-list was a TOCTOU under concurrent
    * serve+maintain: a segment landing between the two made the
    * reader skip resolution yet scan both the stale and fresh rows of
    * a re-embedded vec_id.) A segment landed after the listing is
    * simply not part of this read's snapshot.
    */
  def loadEmbedStore(spark: SparkSession, storePath: String): DataFrame = {
    val base = new org.apache.hadoop.fs.Path(storePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = segmentIdsAt(fs, base)
    // a compacted (or single-landing) store needs NO resolution: skip
    // the full-store vecMax scan so a serve batch reads only its
    // probed buckets — the resolver's O(|store| ids) pass is paid
    // only while multiple segments are outstanding
    val resolved =
      if (segs.isEmpty) spark.read.parquet(storePath)
      else if (segs.size == 1)
        // reading the one segment dir directly discovers its bucket=
        // partitions and yields no seg column — nothing to resolve
        spark.read.parquet(s"$storePath/seg=${segs.head}")
      else {
        val raw = spark.read.option("basePath", storePath)
          .parquet(segs.map(id => s"$storePath/seg=$id"): _*)
        val vecMax = raw.select(col("vec_id"), col("seg").cast("long").as("seg"))
          .groupBy("vec_id").agg(max(col("seg")).as("seg"))
        raw.withColumn("seg", col("seg").cast("long"))
          .join(vecMax, Seq("vec_id", "seg"), "left_semi")
          .drop("seg")
      }
    // takedowns anti-join out at read time (r14 — the IndexStore
    // contract applied to embeddings: a deleted document's vector
    // must not serve from knnServe/hybridServe between folds). Bucket
    // predicates still push through the anti-join's streamed side.
    graft.sources.Tombstones.setOf(spark, storePath, key = "vec_id") match {
      case Some(t) => resolved.join(t, Seq("vec_id"), "left_anti")
      case None => resolved
    }
  }

  /** Fold every segment of the embed store into one (`seg=<max>`,
    * bucket-partitioned) via the crash-safe swap — tombstoned vectors
    * leave disk (the rewrite reads through [[loadEmbedStore]]'s
    * anti-join and `_tombstones` does not travel through the swap).
    * No-op below two segments unless tombstones are pending (the
    * r13 compactSegments generalization, applied here).
    */
  def compactEmbedStore(spark: SparkSession, storePath: String): Unit = {
    val base = new org.apache.hadoop.fs.Path(storePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (segmentIdsAt(fs, base).size < 2 &&
        !graft.sources.Tombstones.hasAny(spark, storePath)) return
    foldSegments(spark, storePath, loadEmbedStore(spark, storePath),
      partitionCol = Some("bucket"),
      force = graft.sources.Tombstones.hasAny(spark, storePath))
  }

  /** Streaming ANN serving — the query side of [[embedIndexMaintenance]]:
    * each micro-batch of query vectors is assigned to its IVF bucket
    * against the saved centroid table, joined against ONLY that bucket
    * of the saved assignment store (the `bucket` equality prunes the
    * partitioned store's directories at planning time, exactly like a
    * term lookup on the IndexStore), exact-cosine top-k re-ranked, and
    * landed per batch (idempotent replay, like [[qualityGate]]). At
    * 100 TB the per-batch read is |buckets hit| / |buckets| of the
    * store, never a full scan.
    *
    * Concurrent serve + maintain: a segment LANDING is one atomic
    * rename (no window at all); only [[compactEmbedStore]]'s
    * two-rename swap has an instant (base→backup, merged→base) where
    * the base path briefly does not exist, so a serve micro-batch
    * planned in that instant fails — transiently and replayably (the
    * next trigger re-plans against the swapped store; no partial
    * state is ever visible because each rename is atomic on a real
    * filesystem). Deployments pairing both loops accept that retry
    * or point serving at a snapshot the maintainer publishes by
    * versioned directory + pointer file; single-writer single-reader
    * sequential use (the spec's shape) never observes the gap.
    */
  def knnServe(queries: DataFrame, centroidPath: String, storePath: String,
               outPath: String, k: Int = 5): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    queries.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        knnBatchOf(batch, spark.read.parquet(centroidPath),
            loadEmbedStore(spark, storePath), k)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }

  /** The ANN retrieval kernel [[knnServe]] lands per micro-batch and
    * [[knnServeOn]] serves per request: IVF-assign the query vectors
    * against `cent`, join ONLY their buckets of `store` (the bucket
    * equality prunes the partitioned store's directories at planning
    * time), exact-cosine re-rank, top-`k` per query.
    */
  def knnBatchOf(batch: DataFrame, cent: DataFrame, store: DataFrame,
                 k: Int): DataFrame = {
    // the assignment frame is consumed TWICE — [[prunedToBuckets]]
    // collects its probed buckets, then the probe join broadcasts it —
    // so materialize it once (r15): uncached, the centroid read +
    // per-vector assignment executed twice per micro-batch/request
    val q = graft.operators.Similarity
      .ivfAssignTo(graft.operators.Similarity.withNormOf(batch), cent)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nm").as("qnm"), col("bucket"))
      .localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    prunedToBuckets(store, q).join(broadcast(q), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", graft.functions.VectorFns.dot(col("qe"), col("embedding")) /
        (col("qnm") * col("nm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Restrict `store` to the bucket set its probes (`assigned` — an
    * already-IVF-assigned frame with a `bucket` column) actually hit,
    * as a LITERAL planning-time partition filter. The broadcast
    * bucket equi-join alone leaves directory pruning to runtime
    * dynamic partition pruning, whose cost heuristics may ELIDE it
    * (observed: `dynamicpruningexpression(true)` on the store scan) —
    * a full store scan per probe at 100 TB. The probed bucket list is
    * one bounded collect (≤ |batch| ids, ≤ the centroid count
    * distinct — the collect a serving loop legitimately makes, like
    * the hybrid path's term list), and the literal IN prunes like a
    * term lookup. Literals are cast to the store column's own type so
    * partition-dir inference (int dirs vs the assignment's long cid)
    * never blocks static pruning behind a cast.
    */
  private def prunedToBuckets(store: DataFrame, assigned: DataFrame): DataFrame = {
    val bids = assigned.select("bucket").distinct()
      .collect().map(_.getLong(0)).toSeq
    val bt = store.schema("bucket").dataType
    val pred =
      if (bids.isEmpty) lit(false)
      else bids.map(b => col("bucket") === lit(b).cast(bt)).reduce(_ || _)
    store.filter(pred)
  }

  /** A pinned DENSE serving session — the embed-store analogue of
    * [[graft.sources.IndexStore.OpenIndex]] (r14's prepared sparse
    * sessions, applied to the ANN path): one segment-resolved,
    * tombstone-anti-joined store read ([[loadEmbedStore]]) and one
    * centroid read held for the session, so each query pays only its
    * own bucket-pruned probe instead of re-listing the store and
    * re-reading centroids. Snapshot semantics are the handle family's:
    * takedowns or segments landed after [[openEmbedStore]] need a
    * re-open; the streaming [[knnServe]] loop stays read-latest
    * per batch.
    */
  final case class OpenEmbedStore(store: DataFrame, cent: DataFrame,
                                  sq8: Option[(DataFrame, DataFrame)] = None)

  def openEmbedStore(spark: SparkSession, storePath: String,
                     centroidPath: String): OpenEmbedStore =
    OpenEmbedStore(loadEmbedStore(spark, storePath),
      spark.read.parquet(centroidPath))

  /** Per-request ANN top-`k` against a pinned [[OpenEmbedStore]] —
    * identical rows to a [[knnServe]] micro-batch over the same store
    * state (spec-asserted), as a DataFrame the caller materializes.
    */
  def knnServeOn(oes: OpenEmbedStore, queries: DataFrame,
                 k: Int = 5): DataFrame =
    knnBatchOf(queries, oes.cent, oes.store, k)

  // ---- SQ8 quantized dense serving layout (r15 — VERDICT item 3) ----
  //
  // The embed store serves raw fp32 vectors, and at 100 TB of vectors
  // the store IS the memory/IO wall. The engine already owns the
  // quantization ladder as OPERATORS (`knn_sq8`, `knn_pq_rerank`,
  // `ann_memory_report` prices 4–16×); this persists the FAISS-shaped
  // serving form of it: byte codes (+ per-dimension levels) land as a
  // `_sq8` side layout inside the store (underscore-prefixed, rides
  // the swaps), and serving runs ADC-style — a bucket-pruned
  // shortlist over the 4×-smaller codes, then an EXACT rerank that
  // touches raw vectors only for the ≤ k·mult shortlist ids. The
  // first-pass read drops ~4× (1 byte/dim vs 4), and the result is
  // row-identical to raw serving whenever the true top-k survives the
  // shortlist (spec-asserted recall floor; the decode is bit-equal to
  // `sq8Embeddings`' dequant, so `ann_recall_sq8` prices exactly this
  // layout's first pass).

  private val Sq8Dir = "_sq8"

  /** Recursive file-name fingerprint of the store's DATA (underscore
    * and dot entries — `_sq8`, `_tombstones`, markers, temp dirs —
    * excluded at every depth): the provenance key the quantized
    * layout stamps. Segments landing or folding flip it; takedowns
    * do NOT (the codes reader anti-joins tombstones live, so a
    * takedown needs no requantize).
    */
  private def embedDataFingerprint(spark: SparkSession,
                                   storePath: String): String = {
    val base = new org.apache.hadoop.fs.Path(storePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return "absent"
    val baseStr = base.toUri.getPath
    val names = scala.collection.mutable.ArrayBuffer[String]()
    val it = fs.listFiles(base, true)
    while (it.hasNext) {
      val rel = it.next().getPath.toUri.getPath.stripPrefix(baseStr)
      if (!rel.split("/").exists(s => s.startsWith("_") || s.startsWith(".")))
        names += rel
    }
    names.sorted.mkString(",")
  }

  /** Build (or refresh) the `_sq8` quantized serving layout from the
    * store's resolved content: per-dimension (mn, mx) levels (one
    * tiny agg) and a bucket-partitioned codes table (vec_id, nm of
    * the DEQUANTIZED vector, 1-byte-per-dim code). One store pass at
    * deploy time — the cost `saveStats` pays for ranked text serving,
    * paid here for dense serving. Atomic tmp + rename landing;
    * stamped with the store's data fingerprint so a later segment
    * landing/fold makes [[openEmbedStoreQuantized]] fail loudly
    * instead of silently missing the new vectors.
    */
  def quantizeEmbedStore(spark: SparkSession, storePath: String): Unit = {
    val resolved = loadEmbedStore(spark, storePath)
    val base = new org.apache.hadoop.fs.Path(storePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(storePath, s".$Sq8Dir-tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val stats = resolved.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    stats.agg(
        transform(sort_array(collect_list(struct(col("i"), col("mn")))),
          s => s("mn")).as("mns"),
        transform(sort_array(collect_list(struct(col("i"), col("mx")))),
          s => s("mx")).as("mxs"))
      .coalesce(1).write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(tmp, "levels").toString)
    val lv = spark.read.parquet(
      new org.apache.hadoop.fs.Path(tmp, "levels").toString)
    resolved.crossJoin(broadcast(lv))
      .select(col("vec_id"), col("bucket"),
        graft.functions.VectorFns.sq8Encode(
          col("embedding"), col("mns"), col("mxs")).as("code"),
        sqrt(graft.functions.VectorFns.norm2(
          graft.functions.VectorFns.sq8Dequant(
            col("embedding"), col("mns"), col("mxs")))).as("nm"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(new org.apache.hadoop.fs.Path(tmp, "codes").toString)
    val prov = fs.create(new org.apache.hadoop.fs.Path(tmp, "_provenance"), true)
    try prov.write(embedDataFingerprint(spark, storePath).getBytes("UTF-8"))
    finally prov.close()
    val dest = new org.apache.hadoop.fs.Path(storePath, Sq8Dir)
    if (fs.exists(dest)) fs.delete(dest, true)
    graft.sources.StoreSwap.mustRename(fs, tmp, dest)
  }

  /** Whether the `_sq8` layout exists AND still matches the store
    * data it was built from. Jobless (one listing + one file read).
    */
  def embedQuantFresh(spark: SparkSession, storePath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(storePath, Sq8Dir), "_provenance")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val in = fs.open(p)
    val stamped = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    stamped == embedDataFingerprint(spark, storePath)
  }

  /** [[openEmbedStore]] plus the pinned `_sq8` frames for
    * [[knnServeQuantized]]. Fails loudly when the quantized layout is
    * absent or STALE (segments landed/folded after the quantize) —
    * serving a code table that silently misses vectors is the failure
    * mode the provenance stamp exists to prevent. Takedowns do not
    * stale the layout: codes anti-join the live tombstone set here,
    * exactly like the raw reader.
    */
  def openEmbedStoreQuantized(spark: SparkSession, storePath: String,
                              centroidPath: String): OpenEmbedStore = {
    require(embedQuantFresh(spark, storePath),
      s"embed store at $storePath has no current $Sq8Dir layout — run " +
        "Stream.quantizeEmbedStore(spark, storePath) after the last " +
        "segment landing/fold (takedowns alone need no requantize)")
    val codesRaw = spark.read.parquet(
      new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(storePath, Sq8Dir), "codes").toString)
    val codes = graft.sources.Tombstones.setOf(spark, storePath,
        key = "vec_id") match {
      case Some(t) => codesRaw.join(t, Seq("vec_id"), "left_anti")
      case None => codesRaw
    }
    val levels = spark.read.parquet(
      new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(storePath, Sq8Dir), "levels").toString)
    OpenEmbedStore(loadEmbedStore(spark, storePath),
      spark.read.parquet(centroidPath), Some((codes, levels)))
  }

  /** ADC-style quantized top-`k`: bucket-pruned shortlist of
    * `k·shortlistMult` per query over the byte codes (approx cosine
    * in the dequantized space — `knn_sq8`'s exact ranking), then an
    * EXACT rerank reading raw vectors ONLY for the shortlist ids.
    * Output schema and cosine values match [[knnServeOn]]; rows match
    * whenever the true top-k survives the shortlist (the spec
    * measures that recall floor; `ann_recall_sq8` prices the
    * first-pass ranking corpus-wide).
    */
  def knnServeQuantized(oes: OpenEmbedStore, queries: DataFrame,
                        k: Int = 5, shortlistMult: Int = 4): DataFrame = {
    require(oes.sq8.nonEmpty,
      "knnServeQuantized needs a handle from openEmbedStoreQuantized")
    val (codes, lv) = oes.sq8.get
    val q = graft.operators.Similarity
      .ivfAssignTo(graft.operators.Similarity.withNormOf(queries), oes.cent)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nm").as("qnm"), col("bucket"))
      .localCheckpoint() // consumed by two pruned scans + two joins
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("acos").desc, col("vec_id"))
    val short = prunedToBuckets(codes, q).join(broadcast(q), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .crossJoin(broadcast(lv))
      .withColumn("acos",
        graft.functions.VectorFns.dot(col("qe"),
          graft.functions.VectorFns.sq8Decode(
            col("code"), col("mns"), col("mxs"))) /
          (col("qnm") * col("nm")))
      .withColumn("srk", row_number().over(wS))
      .filter(col("srk") <= k * shortlistMult)
      .select(col("query_id"), col("vec_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    prunedToBuckets(oes.store, q).join(broadcast(q), "bucket")
      .join(broadcast(short), Seq("query_id", "vec_id"), "left_semi")
      .withColumn("cos",
        graft.functions.VectorFns.dot(col("qe"), col("embedding")) /
          (col("qnm") * col("nm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"),
        round(col("cos"), 6).as("cosine"))
  }

  // ---- rebuild-on-takedown tripwire (r15 — VERDICT r14 missing #4) ----
  //
  // Pack/interleave stores are NOT tombstone-covered by design (a
  // pack concatenates many documents into one training row; in-place
  // excision would rewrite every straddling pack) — the contract is
  // REBUILD-ON-TAKEDOWN. But nothing recorded WHICH corpus takedown
  // state a pack store was built at, so a pipeline could keep serving
  // packs containing taken-down text with no loud signal. The
  // tripwire: each landing stamps the corpus store's monotonic
  // takedown EPOCH ([[graft.sources.Tombstones.epoch]] — landings
  // bump it, folds carry it, so it never resets) into the pack store;
  // loaders compare the stamp against the corpus's CURRENT epoch and
  // fail loudly on mismatch, naming the rebuild.

  private val CorpusEpochStamp = "_corpus_epoch"

  /** Stamp the corpus store's current takedown epoch into a
    * rebuild-on-takedown store. The maintenance sinks call this per
    * landing (pass `corpusPath` to [[packMaintenance]]/
    * [[interleaveMaintenance]]); a batch rebuild calls it once after
    * writing the store from the purged corpus.
    */
  def stampCorpusEpoch(spark: SparkSession, storePath: String,
                       corpusPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(storePath, CorpusEpochStamp)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(graft.sources.Tombstones.epoch(spark, corpusPath)
      .toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Whether the store's stamped corpus epoch matches the corpus's
    * current one. A store with NO stamp is fresh only while the
    * corpus never processed a takedown (epoch 0) — conservative: an
    * unstamped store against a takedown-bearing corpus is
    * indistinguishable from a stale one.
    */
  def packFresh(spark: SparkSession, storePath: String,
                corpusPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(storePath, CorpusEpochStamp)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamped =
      if (!fs.exists(p)) 0L
      else {
        val in = fs.open(p)
        try new String(in.readAllBytes(), "UTF-8").trim.toLong
        finally in.close()
      }
    stamped == graft.sources.Tombstones.epoch(spark, corpusPath)
  }

  /** Loud form of [[packFresh]] — the check the pack-store loaders
    * run when handed a `corpusPath`.
    */
  def requirePackFresh(spark: SparkSession, storePath: String,
                       corpusPath: String): Unit =
    require(packFresh(spark, storePath, corpusPath),
      s"pack store at $storePath was built before the corpus at " +
        s"$corpusPath processed a takedown (stamped corpus epoch != " +
        "current) — its packs may contain taken-down text. Rebuild the " +
        "store from the purged corpus (re-run packing, then " +
        "stampCorpusEpoch) before serving it")

  /** Streaming sequence packing — [[graft.operators.Pipeline
    * .packChunksOf]] kept current over a document stream: each
    * micro-batch's token counts extend the global token line from the
    * stored offset (state-in-store: the pack table itself carries the
    * running total as Σ n_tokens), new pack contributions merge with
    * the stored table at PACK granularity (a boundary-straddling pack's
    * partial rows sum, first/last docs min/max), and the two-rename
    * swap lands it crash-safe — so a training run can consume packs
    * while the corpus is still arriving. The token line is laid out in
    * ARRIVAL order (batch by batch, doc_id within a batch): when
    * documents arrive in doc_id order the result equals the batch
    * [[graft.operators.Pipeline.packChunksOf]] exactly (spec-asserted);
    * out-of-order arrival packs in stream order — the only order a
    * stream can honor. Within a batch the prefix sum is the distributed
    * two-phase [[graft.operators.GraftOps.runningTotal]] — no global
    * window.
    *
    * Unlike the doc-granular index merges, summing partial pack rows
    * is NOT naturally replay-idempotent — so each landing stamps the
    * store's APPLIED HORIZON (`_applied_upto_<batchId>` inside the
    * new segment, one atomic rename with the data) and a batch the
    * horizon already covers no-ops. A batch BELOW the horizon fails
    * loudly: that is a fresh checkpoint restarted over an existing
    * store, which would double-count every replayed pack.
    */
  def packMaintenance(docs: DataFrame, storePath: String,
                      budget: Long = 256L,
                      corpusPath: Option[String] = None): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val basePath = new org.apache.hadoop.fs.Path(storePath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath) // a compaction may have died mid-swap
        val upto = appliedUpTo(fs, basePath)
        requireBatchInHorizon(batchId, upto, storePath)
        if (batchId > upto) { // == upto: replayed batch, already landed → no-op
          val counts = batch
            .select(col("doc_id"),
              size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n"))
            .filter(col("n") > 0L)
          // Σ n_tokens is additive across the partial pack rows, so the
          // offset needs one column-pruned scan of the segments
          val offset: Long =
            if (storeHasData(fs, basePath))
              spark.read.parquet(storePath)
                .agg(coalesce(sum(col("n_tokens")), lit(0L))).head().getLong(0)
            else 0L
          val cum = graft.operators.GraftOps.runningTotal(counts,
              order = col("doc_id"), value = col("n"), bucket = expr("doc_id div 64"))
            .withColumn("cb", col("running") - col("n") + lit(offset))
          val delta = cum
            .select(col("doc_id"), col("n"), col("cb"),
              explode(sequence(expr(s"cb div $budget"),
                expr(s"(cb + n - 1) div $budget"))).as("pack_id"))
            .groupBy("pack_id")
            .agg(count(lit(1)).as("n_docs"),
              sum(least(col("cb") + col("n"), (col("pack_id") + 1L) * budget) -
                greatest(col("cb"), col("pack_id") * budget)).as("n_tokens"),
              min(col("doc_id")).as("first_doc"),
              max(col("doc_id")).as("last_doc"))
          // delta-sized segment landing (r11); the pack-granular sums
          // fold at read time ([[loadChunkStore]]) and compaction
          // bounds the merge width — the old path rewrote the whole
          // pack table every batch
          landBatchSegment(delta, storePath, batchId, fs)
          // takedown tripwire: record which corpus takedown state
          // this landing reflects ([[stampCorpusEpoch]])
          corpusPath.foreach(cp => stampCorpusEpoch(spark, storePath, cp))
          if (segmentIdsAt(fs, basePath).size >= 16)
            compactChunkStore(spark, storePath)
        }
        ()
      }

  /** Read a [[packMaintenance]] chunk-pack store with its
    * pack-granular merge applied (counts/tokens sum, first/last docs
    * min/max across segments); a plain or compacted store passes
    * through. Column order matches the pack_chunks batch schema.
    */
  def loadChunkStore(spark: SparkSession, storePath: String,
                     corpusPath: Option[String] = None): DataFrame = {
    // takedown tripwire: refuse a store whose stamped corpus epoch
    // lags the corpus's current one ([[requirePackFresh]])
    corpusPath.foreach(cp => requirePackFresh(spark, storePath, cp))
    val raw = spark.read.parquet(storePath)
    if (!raw.columns.contains("seg")) raw
    else raw.groupBy("pack_id")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("first_doc")).as("first_doc"),
        max(col("last_doc")).as("last_doc"))
      .select("pack_id", "n_docs", "n_tokens", "first_doc", "last_doc")
  }

  /** Fold every segment of a chunk-pack store into one (`seg=<max>`)
    * via the crash-safe swap. No-op below two segments.
    */
  def compactChunkStore(spark: SparkSession, storePath: String): Unit =
    foldSegments(spark, storePath, loadChunkStore(spark, storePath))

  /** Streaming MMC4-style sequence assembly — `media_interleave`'s
    * streaming twin, completing the multimodal family's §G rung: each
    * micro-batch expands its documents through the SHARED
    * [[graft.operators.Multimodal.interleaveSegmentsOf]] stage
    * (atomic 32-token text chunks + the fixed-slot media anchor), lays
    * the segments on the global token line from the stored offset
    * (state-in-store: Σ n_tokens of the pack table, ONE column-pruned
    * scan), and lands its pack delta as a `seg=<batchId>` partition of
    * the SEGMENTED pack store — a delta-sized write however large the
    * store grows (r10 VERDICT item 3; the old path re-merged and
    * rewrote the whole pack table every batch). Pack-granular merge
    * happens at READ time ([[loadPackStore]]): counts sum, first/last
    * docs min/max, and a boundary-straddling pack's media-ref
    * manifests CONCATENATE in segment order, which is position order
    * because the token line only ever extends (append-only stream ⇒
    * every new segment's offset exceeds every stored one) —
    * [[compactPackStore]] folds segments when the count reaches
    * `compactEvery`. Segment ids are monotonic and the applied
    * horizon rides inside each landing's atomic rename
    * ([[landBatchSegment]]): replay no-ops, and a fresh checkpoint
    * restarted over an existing store fails loudly instead of landing
    * lower-ordered segments that would silently invert the media_refs
    * concatenation. When documents arrive in doc_id order the
    * resolved store equals the batch operator exactly (spec-asserted,
    * restart drill included).
    */
  def interleaveMaintenance(docs: DataFrame, storePath: String,
                            compactEvery: Int = 16,
                            corpusPath: Option[String] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val basePath = new org.apache.hadoop.fs.Path(storePath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath) // a compaction may have died mid-swap
        val upto = appliedUpTo(fs, basePath)
        requireBatchInHorizon(batchId, upto, storePath)
        if (batchId > upto) { // == upto: replayed batch, already landed → no-op
          val segs = graft.operators.Multimodal.interleaveSegmentsOf(
            batch.select(col("doc_id"), col("text")))
          // the offset needs only Σ n_tokens across segments (sums are
          // additive across the partial pack rows) — a column-pruned
          // scan, never a full-store materialization
          val offset: Long =
            if (storeHasData(fs, basePath))
              spark.read.parquet(storePath)
                .agg(coalesce(sum(col("n_tokens")), lit(0L))).head().getLong(0)
            else 0L
          val cum = graft.operators.GraftOps.runningTotal(segs,
              order = struct(col("doc_id"), col("ord")),
              value = col("cost"), bucket = expr("doc_id div 64"))
            .withColumn("cb", col("running") - col("cost") + lit(offset))
          val delta = graft.operators.Multimodal.interleavePackRollup(cum)
          landBatchSegment(delta, storePath, batchId, fs)
          // takedown tripwire stamp, like [[packMaintenance]]'s
          corpusPath.foreach(cp => stampCorpusEpoch(spark, storePath, cp))
          if (segmentIdsAt(fs, basePath).size >= compactEvery)
            compactPackStore(spark, storePath)
        }
        ()
      }

  /** Segment ids of a segmented pack store (empty when the store is
    * absent or a plain single layout).
    */
  private def segmentIdsAt(fs: org.apache.hadoop.fs.FileSystem,
                           base: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).map(_.getPath.getName)
      .filter(_.startsWith("seg=")).map(_.stripPrefix("seg=").toLong)
      .sorted.toSeq

  /** True when the store directory exists AND holds at least one
    * VISIBLE entry (a dot-prefixed dead tmp build or a bare mkdir is
    * not data). The sinks gate their prior-state reads on this, not
    * bare `fs.exists` — a first-batch crash inside a landing leaves
    * the root with only an invisible tmp dir, and a raw parquet read
    * of that would throw on every replay, bricking the stream.
    * (Empty SEGMENTS can't arise: [[landSegment]] refuses to land a
    * delta whose write emitted no data files.)
    */
  private def storeHasData(fs: org.apache.hadoop.fs.FileSystem,
                           base: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(base) && fs.listStatus(base).exists { st =>
      val n = st.getPath.getName
      !n.startsWith(".") && !n.startsWith("_")
    }

  /** True when `dir` holds at least one visible data FILE at any
    * depth (`_SUCCESS`, applied markers, and dot-prefixed leftovers
    * don't count). This is the "did the write emit any rows" test the
    * landing gate needs: `partitionBy` on an empty frame writes no
    * partition dirs at all, so an empty delta landed blindly would
    * become a data-less segment that fails schema inference on every
    * later whole-store read — a replay-loop brick.
    */
  private def hasDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                           dir: org.apache.hadoop.fs.Path): Boolean = {
    if (!fs.exists(dir)) return false
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val n = it.next().getPath.getName
      if (!n.startsWith(".") && !n.startsWith("_")) return true
    }
    false
  }

  /** Name prefix of the applied-horizon marker a batch-keyed landing
    * leaves INSIDE its segment dir (underscore prefix: invisible to
    * parquet readers). The marker travels with the segment through
    * the one atomic rename, so "the segment is visible" and "batch
    * `<id>` is recorded as applied" can never disagree — the failure
    * the old root-level marker schemes had a window for.
    */
  private val AppliedUpToPrefix = "_applied_upto_"

  /** Highest batchId recorded by an [[AppliedUpToPrefix]] marker in
    * any segment of the store; None when no segment carries one.
    */
  private def markerUpTo(fs: org.apache.hadoop.fs.FileSystem,
                         base: org.apache.hadoop.fs.Path): Option[Long] = {
    if (!fs.exists(base)) return None
    val marks = fs.listStatus(base).map(_.getPath)
      .filter(_.getName.startsWith("seg="))
      .flatMap(seg => fs.listStatus(seg).map(_.getPath.getName)
        .filter(_.startsWith(AppliedUpToPrefix))
        .map(_.stripPrefix(AppliedUpToPrefix).toLong))
    if (marks.isEmpty) None else Some(marks.max)
  }

  /** The store's APPLIED HORIZON: the highest batchId whose landing
    * committed. Markers are the source of truth; a store written
    * before the marker scheme falls back to its max segment id (those
    * stores' segment ids WERE batch ids, so the two schemes agree at
    * the upgrade boundary). -1 for an absent or segment-less store.
    */
  private def appliedUpTo(fs: org.apache.hadoop.fs.FileSystem,
                          base: org.apache.hadoop.fs.Path): Long =
    markerUpTo(fs, base)
      .getOrElse(segmentIdsAt(fs, base).lastOption.getOrElse(-1L))

  /** Fail LOUDLY when `batchId` sits below the store's applied
    * horizon. Batch ids within one query only move forward, so a
    * lower id means the stream was restarted with a FRESH checkpoint
    * over an existing store — out of contract for every batch-keyed
    * store, and previously a SILENT corruption (double-applied sums,
    * inverted media_refs segment order) instead of an error. An id
    * EQUAL to the horizon is the legitimate replay of the last
    * uncommitted batch: callers recompute their idempotent outputs
    * and [[landBatchSegment]] no-ops the landing.
    */
  private def requireBatchInHorizon(batchId: Long, upto: Long,
                                    storePath: String): Unit =
    require(batchId >= upto,
      s"batch $batchId is below the applied horizon $upto of store " +
        s"$storePath: the stream was restarted with a fresh checkpoint " +
        "over an existing store. Restart from the original checkpoint, " +
        "or point the stream at a fresh store path")

  /** Applied horizon of a whole-rewrite SWAP store (the bounded-state
    * ledgers: day counts, source mix, CMS cells): one
    * `_applied_upto_<id>` marker at the store ROOT, written into each
    * rewrite's tmp dir so the two-rename swap carries data + horizon
    * atomically (old markers vanish with the replaced dir — exactly
    * one marker exists). -1 for an absent or pre-upgrade store; the
    * guard then activates on the first post-upgrade rewrite. These
    * stores' sum-merge rows are keyed by src_batch, so a fresh
    * checkpoint re-feeding old batch ids would silently REPLACE
    * earlier batches' ledger rows — same corruption class the
    * segmented stores' horizon closes.
    */
  private def swapAppliedUpTo(fs: org.apache.hadoop.fs.FileSystem,
                              base: org.apache.hadoop.fs.Path): Long =
    if (!fs.exists(base)) -1L
    else fs.listStatus(base).map(_.getPath.getName)
      .filter(_.startsWith(AppliedUpToPrefix))
      .map(_.stripPrefix(AppliedUpToPrefix).toLong)
      .maxOption.getOrElse(-1L)

  /** Write `merged` + the horizon marker to a tmp dir and swap it in
    * as the new store content — the shared tail of every swap-store
    * sink, now horizon-stamped.
    */
  private def swapInMerged(merged: DataFrame, storePath: String,
                           batchId: Long,
                           fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val base = new org.apache.hadoop.fs.Path(storePath)
    val tmp = s"$storePath.merged-$batchId"
    merged.write.mode("overwrite").parquet(tmp)
    fs.create(new org.apache.hadoop.fs.Path(tmp, AppliedUpToPrefix + batchId),
      true).close()
    if (fs.exists(base)) swapStore(fs, base, tmp)
    else mustRename(fs, new org.apache.hadoop.fs.Path(tmp), base)
  }

  /** Land `delta` as the NEXT monotonic segment of a batch-keyed
    * store, stamping `_applied_upto_<batchId>` inside the segment so
    * the landing and the horizon record commit in one atomic rename.
    * No-op (false) when the horizon already covers `batchId` — the
    * replayed-batch case. Monotonic ids (not `seg=<batchId>`) keep
    * segment order equal to application order even across a
    * compaction, which the pack stores' media_refs concatenation and
    * every last-writer-wins read depend on.
    */
  private def landBatchSegment(delta: DataFrame, storePath: String,
                               batchId: Long,
                               fs: org.apache.hadoop.fs.FileSystem,
                               partitionCol: Option[String] = None): Boolean = {
    val base = new org.apache.hadoop.fs.Path(storePath)
    if (appliedUpTo(fs, base) >= batchId) return false
    val segId = segmentIdsAt(fs, base).lastOption.getOrElse(-1L) + 1L
    landSegment(delta, storePath, segId, fs, partitionCol,
      marker = Some(AppliedUpToPrefix + batchId))
  }

  /** Land `delta` as `seg=<segId>` of a segmented store (build in a
    * dot-prefixed temp dir, one atomic rename — the landing IS the
    * applied marker). Returns false when the segment already exists
    * (replayed batch → no-op). Refuses a root holding a PLAIN
    * (pre-segment) layout — landing beside it would corrupt partition
    * discovery with mixed directory depths; adopt an old store by
    * rewriting it into `seg=<id>` form offline first (the same guard
    * IndexStore.saveSegment applies).
    */
  private def landSegment(delta: DataFrame, storePath: String,
                          segId: Long,
                          fs: org.apache.hadoop.fs.FileSystem,
                          partitionCol: Option[String] = None,
                          marker: Option[String] = None): Boolean = {
    val base = new org.apache.hadoop.fs.Path(storePath)
    val seg = new org.apache.hadoop.fs.Path(storePath, s"seg=$segId")
    if (fs.exists(seg)) return false
    if (fs.exists(base))
      require(fs.listStatus(base).forall { st =>
        val n = st.getPath.getName
        n.startsWith("seg=") || n.startsWith(".") || n.startsWith("_")
      }, s"$storePath holds a plain (pre-segment) layout; rewrite it " +
        "into seg=<id> form before landing segments")
    val tmp = new org.apache.hadoop.fs.Path(storePath, s".seg-tmp-$segId")
    if (fs.exists(tmp)) fs.delete(tmp, true) // dead-build leftover
    partitionCol match {
      case Some(c) => delta.repartition(col(c))
        .write.mode("overwrite").partitionBy(c).parquet(tmp.toString)
      case None => delta.write.mode("overwrite").parquet(tmp.toString)
    }
    // an EMPTY delta must not land: partitionBy writes no partition
    // dirs for an empty frame (a data-less segment then fails schema
    // inference on every later whole-store read — a replay-loop
    // brick), and a plain write of one emits a single zero-row file
    // (harmless but junk that accumulates one segment per idle
    // batch). Checking the WRITTEN tmp — file presence, then a
    // limit-1 read of the one tiny output — costs no re-execution of
    // the delta plan. Skipping is replay-safe: the caller's recompute
    // is deterministic, so a replayed empty batch skips again.
    val wroteRows = hasDataFiles(fs, tmp) &&
      !delta.sparkSession.read.parquet(tmp.toString).isEmpty
    if (!wroteRows) { fs.delete(tmp, true); return false }
    marker.foreach(m => fs.create(new org.apache.hadoop.fs.Path(tmp, m), true).close())
    mustRename(fs, tmp, seg)
    true
  }

  /** Shared crash-safe segment fold: write `resolved` as the single
    * `seg=<max>` of a fresh root (optionally partitioned), then the
    * two-rename swap. No-op below two segments — every compaction
    * (set / pack / embed) is this routine plus its own resolve step.
    */
  private def foldSegments(spark: SparkSession, storePath: String,
                           resolved: => DataFrame,
                           partitionCol: Option[String] = None,
                           force: Boolean = false): Unit = {
    val base = new org.apache.hadoop.fs.Path(storePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = segmentIdsAt(fs, base)
    // `force` folds a ONE-segment store too — the takedown loop's
    // pending-tombstones case (r13's compactSegments generalization):
    // the fold is what makes deleted rows leave disk
    if (segs.isEmpty || (segs.size < 2 && !force)) return
    // the applied horizon must survive the fold: segment ids are
    // monotonic, NOT batch ids, so without re-stamping the max marker
    // the post-fold fallback would misread the horizon
    val carried = markerUpTo(fs, base)
    val tmpRoot = storePath + ".compacting"
    if (fs.exists(new org.apache.hadoop.fs.Path(tmpRoot)))
      fs.delete(new org.apache.hadoop.fs.Path(tmpRoot), true)
    val out = s"$tmpRoot/seg=${segs.max}"
    partitionCol match {
      case Some(c) => resolved.repartition(col(c))
        .write.mode("overwrite").partitionBy(c).parquet(out)
      case None => resolved.write.mode("overwrite").parquet(out)
    }
    carried.foreach(u => fs.create(new org.apache.hadoop.fs.Path(
      out, AppliedUpToPrefix + u), true).close())
    // takedown epoch + corpus-epoch stamp survive the swap (r15):
    // both are root-level marker files that would otherwise vanish
    // with the replaced root
    graft.sources.Tombstones.carryEpoch(spark, storePath, tmpRoot)
    val stamp = new org.apache.hadoop.fs.Path(base, CorpusEpochStamp)
    if (fs.exists(stamp)) {
      val in = fs.open(stamp)
      val bytes = try in.readAllBytes() finally in.close()
      val o = fs.create(
        new org.apache.hadoop.fs.Path(tmpRoot, CorpusEpochStamp), true)
      try o.write(bytes) finally o.close()
    }
    swapStore(fs, base, tmpRoot)
  }

  /** Fold a segmented SET store (rows are facts, no merge semantics —
    * the md5/fingerprint/semantic screens) into one `seg=<max>`.
    */
  private def compactSetStore(spark: SparkSession, storePath: String,
                              partitionCol: Option[String] = None): Unit =
    foldSegments(spark, storePath,
      spark.read.parquet(storePath).drop("seg"), partitionCol)

  /** Read a [[interleaveMaintenance]] pack store with its pack-granular
    * merge applied: rows of the same pack_id across segments fold —
    * counts sum, first/last docs min/max, media-ref manifests join in
    * SEGMENT order (= token-line order; see the sink's scaladoc). A
    * plain (already-compacted or single-layout) store passes through.
    * Column order matches `media_interleave`'s batch schema exactly.
    */
  def loadPackStore(spark: SparkSession, storePath: String,
                    corpusPath: Option[String] = None): DataFrame = {
    // takedown tripwire ([[requirePackFresh]], like [[loadChunkStore]])
    corpusPath.foreach(cp => requirePackFresh(spark, storePath, cp))
    val raw = spark.read.parquet(storePath)
    if (!raw.columns.contains("seg")) raw
    else raw
      .groupBy("pack_id")
      .agg(sum(col("n_segs")).as("n_segs"),
        sum(col("n_text_segs")).as("n_text_segs"),
        sum(col("n_media_segs")).as("n_media_segs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("first_doc")).as("first_doc"),
        max(col("last_doc")).as("last_doc"),
        array_join(filter(transform(
          sort_array(collect_list(struct(col("seg").cast("long").as("s"),
            col("media_refs").as("r")))),
          x => x.getField("r")), s => length(s) > 0), ",").as("media_refs"))
      .select("pack_id", "n_segs", "n_text_segs", "n_media_segs",
        "n_tokens", "first_doc", "last_doc", "media_refs")
  }

  /** Fold every segment of a pack store into one (`seg=<max>`) via the
    * crash-safe two-rename swap — bounds the per-read merge width the
    * same way [[graft.sources.IndexStore.compactSegments]] does for
    * the index. No-op below two segments.
    */
  def compactPackStore(spark: SparkSession, storePath: String): Unit =
    foldSegments(spark, storePath, loadPackStore(spark, storePath))

  /** Streaming uniform k-sample per source — `sample_k`'s streaming
    * twin: each micro-batch salts doc keys with the same md5 as the
    * batch operator and the store keeps the k SMALLEST hashes per
    * source, so at every instant the store is an exact uniform
    * without-replacement sample of EVERYTHING ingested so far
    * (bottom-k by a fixed hash is a mergeable sketch:
    * bottomk(A ∪ B) = bottomk(bottomk(A) ∪ B), so per-batch folding
    * loses nothing). Replay-idempotent with NO batch markers — the
    * merge dedups on the doc key before re-ranking, so re-folding a
    * replayed batch rewrites the identical store. Store size is
    * ≤ k·|sources| rows regardless of ingest volume; the rank window
    * partitions by source over that bounded frame, and the crash-safe
    * swap is the shared store protocol.
    */
  def reservoirMaintenance(docs: DataFrame, storePath: String,
                           k: Int = 100): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val basePath = new org.apache.hadoop.fs.Path(storePath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath)
        val delta = batch.select(col("source"), col("doc_id"),
          md5(concat(lit("sample:"), col("doc_id").cast("string"))).as("h"))
        val all =
          if (fs.exists(basePath))
            spark.read.parquet(storePath).unionByName(delta)
          else delta
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("h"), col("doc_id"))
        val merged = all.dropDuplicates("source", "doc_id")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= k)
          .drop("rk")
        val tmp = s"$storePath.merged-$batchId"
        merged.write.mode("overwrite").parquet(tmp)
        if (fs.exists(basePath)) swapStore(fs, basePath, tmp)
        else mustRename(fs, new org.apache.hadoop.fs.Path(tmp), basePath)
        ()
      }

  /** Streaming exact dedup with an UNBOUNDED horizon — the
    * state-in-store twin of [[dedupStream]]: that operator's state is
    * executor memory bounded by the watermark (hours of fingerprints),
    * this one screens each micro-batch against a SAVED md5 fingerprint
    * store, so a document seen last month (or before a restart) still
    * dedups. Per batch: in-batch dedup (first doc_id per fingerprint),
    * one anti-join against the store, survivors land in their own
    * `batch=<id>` dir, and their fingerprints merge into the store via
    * the crash-safe swap. Replay-idempotent WITHOUT markers, by
    * BATCH-GRANULAR REPLACE (the index-merge rule applied to
    * fingerprints): the store keys every fingerprint by its source
    * batch, screening ignores the current batch's own rows and the
    * merge replaces them — so a replayed batch recomputes the identical
    * survivor set and rewrites the identical store.
    */
  def dedupGate(docs: DataFrame, storePath: String,
                outPath: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val basePath = new org.apache.hadoop.fs.Path(storePath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath)
        requireBatchInHorizon(batchId, appliedUpTo(fs, basePath), storePath)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("text_md5").orderBy("doc_id")
        val batchCanon = batch.withColumn("text_md5", md5(col("text")))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val prior =
          if (storeHasData(fs, basePath))
            spark.read.parquet(storePath).filter(col("src_batch") =!= batchId)
          else spark.emptyDataFrame.select(lit("").as("text_md5"), lit(0L).as("src_batch")).limit(0)
        val fresh = batchCanon
          .join(prior.select("text_md5"), Seq("text_md5"), "left_anti")
        fresh.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        // the md5 set grows with the corpus: land the batch's NEW
        // fingerprints as a delta-sized segment (r11), never a
        // full-store rewrite; compaction bounds the read width
        landBatchSegment(fresh.select(col("text_md5"),
          lit(batchId).as("src_batch")), storePath, batchId, fs)
        if (segmentIdsAt(fs, basePath).size >= 16)
          compactSetStore(spark, storePath)
        ()
      }

  /** Streaming NEAR-dup gate with an UNBOUNDED horizon — [[dedupGate]]
    * upgraded from exact md5 equality to SimHash Hamming ≤
    * `maxHamming`: a document near-duplicating anything accepted in
    * ANY earlier batch — including before a restart — is dropped. No
    * executor state; the store holds one (doc_id, simhash, src_batch)
    * row per accepted document. Per batch: in-batch near-dedup keeps
    * the smaller doc_id of every banded pair
    * ([[graft.operators.Dedup.simhashPairsOf]]), survivors are
    * screened against the saved fingerprints by the same lossless
    * pigeonhole band equi-join ([[graft.operators.Dedup.simhashBandsOf]]
    * — the shuffle carries (band, value) keys, never all pairs, so
    * the screen scales with matches, not store × batch), and
    * surviving fingerprints merge into the store via the crash-safe
    * swap. Replay-idempotent by the same batch-granular replace as
    * [[dedupGate]]: fingerprints are keyed by source batch, the
    * screen ignores the current batch's own stored rows, and the
    * merge replaces them.
    */
  def neardupGate(docs: DataFrame, storePath: String, outPath: String,
                  maxHamming: Int = 6): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val basePath = new org.apache.hadoop.fs.Path(storePath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath)
        requireBatchInHorizon(batchId, appliedUpTo(fs, basePath), storePath)
        val Dedup = graft.operators.Dedup
        // in-batch near-dedup: doc_b of every pair has the larger id
        val inDups = Dedup.simhashPairsOf(batch, maxHamming)
          .select(col("doc_b").as("doc_id")).distinct()
        val survivorsFp = Dedup.simhashDf(batch)
          .join(inDups, Seq("doc_id"), "left_anti")
        val prior =
          if (storeHasData(fs, basePath))
            spark.read.parquet(storePath).filter(col("src_batch") =!= batchId)
          else spark.emptyDataFrame.select(lit(0L).as("doc_id"),
            lit(0L).as("simhash"), lit(0L).as("src_batch")).limit(0)
        val matched = Dedup.simhashBandsOf(survivorsFp, "doc_id", maxHamming)
          .join(Dedup.simhashBandsOf(prior, "doc_id", maxHamming)
              .select(col("band"), col("v"), col("simhash").as("ps")),
            Seq("band", "v"))
          .filter(expr("bit_count(simhash ^ ps)") <= maxHamming)
          .select("doc_id").distinct()
        val freshFp = survivorsFp.join(matched, Seq("doc_id"), "left_anti")
        batch.join(freshFp.select("doc_id"), Seq("doc_id"), "left_semi")
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        // fingerprint set grows with the corpus: delta-sized segment
        // landing + compaction (r11), never a full-store rewrite
        landBatchSegment(freshFp.select(col("doc_id"), col("simhash"),
          lit(batchId).as("src_batch")), storePath, batchId, fs)
        if (segmentIdsAt(fs, basePath).size >= 16)
          compactSetStore(spark, storePath)
        ()
      }

  /** Streaming SEMANTIC dedup gate — the embedding member of the gate
    * family ([[dedupGate]] = exact md5, [[neardupGate]] = SimHash,
    * this = cosine): each micro-batch of vectors is IVF-assigned
    * against the SAVED centroid table (bucket ids stable across
    * batches — the [[embedIndexMaintenance]] invariant), in-batch
    * semantic dups dropped greedily (smaller vec_id wins), survivors
    * screened against ONLY their bucket of the saved vector store by
    * exact cosine ≥ `threshold` (the [[knnServe]] read shape:
    * bucket-keyed join, other buckets' payloads never read), and
    * surviving vectors merged into the bucket-partitioned store via
    * the crash-safe swap. A semantic duplicate of a vector accepted
    * before a restart is still dropped. Replay-idempotent by
    * batch-granular replace, like its two siblings.
    */
  def semdedupGate(vecs: DataFrame, centroidPath: String, storePath: String,
                   outPath: String, threshold: Double = 0.95)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val Sim = graft.operators.Similarity
        val basePath = new org.apache.hadoop.fs.Path(storePath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath)
        requireBatchInHorizon(batchId, appliedUpTo(fs, basePath), storePath)
        val cent = spark.read.parquet(centroidPath)
        val a = Sim.ivfAssignTo(Sim.withNormOf(batch), cent)
          .select(col("vec_id"), col("embedding"), col("nm"), col("bucket"))
        val inDups = a.as("x").join(a.as("y"),
            col("x.bucket") === col("y.bucket") &&
              col("x.vec_id") < col("y.vec_id") &&
              graft.functions.VectorFns.dot(col("x.embedding"), col("y.embedding")) /
                (col("x.nm") * col("y.nm")) >= threshold)
          .select(col("y.vec_id").as("vec_id")).distinct()
        val surv = a.join(inDups, Seq("vec_id"), "left_anti")
        val prior =
          if (storeHasData(fs, basePath))
            spark.read.parquet(storePath).filter(col("src_batch") =!= batchId)
              .select(col("vec_id"), col("embedding"), col("nm"),
                col("bucket").cast("long").as("bucket"), col("src_batch"))
          else spark.emptyDataFrame.select(lit(0L).as("vec_id"),
            lit(null).cast("array<float>").as("embedding"), lit(0.0).as("nm"),
            lit(0L).as("bucket"), lit(0L).as("src_batch")).limit(0)
        val matched = surv.join(prior
              .select(col("bucket"), col("embedding").as("pe"), col("nm").as("pnm")),
            Seq("bucket"))
          .filter(graft.functions.VectorFns.dot(col("embedding"), col("pe")) /
            (col("nm") * col("pnm")) >= threshold)
          .select("vec_id").distinct()
        val fresh = surv.join(matched, Seq("vec_id"), "left_anti")
        batch.join(fresh.select("vec_id"), Seq("vec_id"), "left_semi")
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        // the semantic fingerprint set grows with the corpus: land the
        // batch's fresh vectors as a bucket-partitioned delta segment
        // (r11), never a full-store rewrite
        landBatchSegment(fresh.withColumn("src_batch", lit(batchId)),
          storePath, batchId, fs, partitionCol = Some("bucket"))
        if (segmentIdsAt(fs, basePath).size >= 16)
          compactSetStore(spark, storePath, partitionCol = Some("bucket"))
        ()
      }

  /** Streaming vocabulary drift monitor — the online twin of the
    * batch `vocab_growth`/`vocab_coverage_curve` pair: every
    * micro-batch is tokenized and compared against a SAVED vocabulary
    * store, emitting one drift report row per batch (batch terms,
    * terms never seen in ANY earlier batch — including before a
    * restart — and the token share those new terms carry). A rising
    * new-term share is the first signal a crawl started pulling a new
    * language/domain, before quality metrics move. The store holds one
    * (term, src_batch) row per first sighting; the screen is one
    * left_anti join on term (shuffle keyed by term, bounded by the
    * batch vocabulary, never the corpus). Replay-idempotent by
    * batch-granular replace: screening ignores the current batch's own
    * stored rows, the merge replaces them, and the report lands in its
    * own `batch=<id>` dir.
    */
  def vocabDriftGate(docs: DataFrame, storePath: String, outPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val basePath = new org.apache.hadoop.fs.Path(storePath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath)
        requireBatchInHorizon(batchId, appliedUpTo(fs, basePath), storePath)
        val bt = batch
          .select(explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
          .groupBy("term").agg(count(lit(1)).as("freq"))
        val prior =
          if (storeHasData(fs, basePath))
            spark.read.parquet(storePath).filter(col("src_batch") =!= batchId)
          else spark.emptyDataFrame
            .select(lit("").as("term"), lit(0L).as("src_batch")).limit(0)
        val novel = bt.join(prior.select("term"), Seq("term"), "left_anti")
        val report = bt.agg(
            count(lit(1)).as("n_batch_terms"),
            sum(col("freq")).as("n_batch_tokens"))
          .crossJoin(novel.agg(
            count(lit(1)).as("n_new_terms"),
            coalesce(sum(col("freq")), lit(0L)).as("new_term_tokens")))
          .select(lit(batchId).as("batch_id"),
            col("n_batch_terms"), col("n_new_terms"),
            col("n_batch_tokens"), col("new_term_tokens"),
            round(col("new_term_tokens").cast("double") /
              col("n_batch_tokens").cast("double"), 6).as("new_token_share"))
        report.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        // the vocabulary set grows with the corpus (heavy-tail): land
        // only the batch's NOVEL terms as a delta segment (r11)
        landBatchSegment(novel.select(col("term"), lit(batchId).as("src_batch")),
          storePath, batchId, fs)
        if (segmentIdsAt(fs, basePath).size >= 16)
          compactSetStore(spark, storePath)
        ()
      }

  /** Streaming source-mix monitor — the online twin of the batch
    * `sampling_weights`/`token_budget_allocation` pair: every
    * micro-batch's per-source token counts merge into a SAVED
    * (source, n_tokens, src_batch) ledger, and the batch's report row
    * set carries each source's batch tokens, cumulative tokens, and
    * cumulative mix share — the dashboard a continuously-ingesting
    * pipeline watches to catch one crawl starving the others. The
    * ledger is |sources| × |batches| rows (tiny); the only
    * corpus-sized stage is the per-batch token rollup. Replay-
    * idempotent by the same batch-granular replace as the other
    * store-backed gates: cumulative sums ignore the current batch's
    * own ledger rows, and the merge replaces them.
    */
  def sourceMixMonitor(docs: DataFrame, storePath: String, outPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val basePath = new org.apache.hadoop.fs.Path(storePath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath)
        requireBatchInHorizon(batchId, swapAppliedUpTo(fs, basePath), storePath)
        val bt = batch
          .select(col("source"),
            size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("t"))
          .groupBy("source").agg(sum(col("t")).as("n_tokens"))
        val prior =
          if (fs.exists(basePath))
            spark.read.parquet(storePath).filter(col("src_batch") =!= batchId)
          else spark.emptyDataFrame.select(lit("").as("source"),
            lit(0L).as("n_tokens"), lit(0L).as("src_batch")).limit(0)
        val cum = prior.select(col("source"), col("n_tokens"))
          .unionByName(bt)
          .groupBy("source").agg(sum(col("n_tokens")).as("cum_tokens"))
        val tot = cum.agg(sum(col("cum_tokens")).as("total"))
        val report = cum
          .join(bt.select(col("source"), col("n_tokens").as("batch_tokens")),
            Seq("source"), "left")
          .crossJoin(broadcast(tot))
          .select(lit(batchId).as("batch_id"), col("source"),
            coalesce(col("batch_tokens"), lit(0L)).as("batch_tokens"),
            col("cum_tokens"),
            round(col("cum_tokens").cast("double") /
              col("total").cast("double"), 6).as("cum_share"))
        report.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        swapInMerged(prior.unionByName(bt.withColumn("src_batch", lit(batchId))),
          storePath, batchId, fs)
        ()
      }

  /** Streaming Naive Bayes language router — the batch
    * [[graft.operators.TextAnalysis.nbLangid]] trained CONTINUOUSLY:
    * every micro-batch is scored against the model accumulated from
    * all PRIOR batches (prequential test-then-train evaluation — each
    * doc is scored by a model that has never seen it), then the
    * batch's own (term, lang) token counts and per-lang doc counts
    * merge into the saved counts ledger. The first batch, with no
    * model yet, routes unscored (null prediction) rather than
    * guessing. Scoring reuses
    * [[graft.operators.TextAnalysis.nbScoreAgainst]] verbatim, so the
    * online router and the oracle-gated batch classifier share one
    * arithmetic definition. The ledger is vocab × langs + |langs|
    * rows (tiny, model-sized — never corpus-sized); the only
    * corpus-scaled stage is the batch's own token rollup.
    * Replay-idempotent by the same batch-granular replace as the
    * other store-backed gates: a replayed batch's ledger rows are
    * dropped before scoring, so it is re-scored by the same
    * prior-model state and re-merged without double counting.
    */
  def nbRouterGate(docs: DataFrame, storePath: String, outPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val basePath = new org.apache.hadoop.fs.Path(storePath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath)
        requireBatchInHorizon(batchId, appliedUpTo(fs, basePath), storePath)
        val prior =
          if (storeHasData(fs, basePath))
            spark.read.parquet(storePath).filter(col("src_batch") =!= batchId)
          else spark.emptyDataFrame.select(lit("").as("kind"),
            lit("").as("term"), lit("").as("lang"), lit(0L).as("c"),
            lit(0L).as("src_batch")).limit(0)
        val ctl = prior.filter(col("kind") === "tl")
          .groupBy("term", "lang").agg(sum(col("c")).as("c"))
        val priorDocs = prior.filter(col("kind") === "dl")
          .groupBy("lang").agg(sum(col("c")).as("nd"))
        val preds =
          if (priorDocs.isEmpty)
            batch.select(col("doc_id"), col("lang"),
              lit(null).cast("string").as("pred_lang"),
              lit(null).cast("long").as("correct"))
          else
            graft.operators.TextAnalysis.nbScoreAgainst(batch, ctl, priorDocs)
        preds.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        val btl = batch
          .select(col("lang"), explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
          .groupBy("term", "lang").agg(count(lit(1)).as("c"))
          .select(lit("tl").as("kind"), col("term"), col("lang"), col("c"))
        val bdl = batch.groupBy("lang").agg(count(lit(1)).as("c"))
          .select(lit("dl").as("kind"), lit(null).cast("string").as("term"),
            col("lang"), col("c"))
        // the model ledger is an append-only set of per-batch count
        // rows (consumers re-aggregate): land the batch's rows as a
        // delta segment (r11) — the model is vocab-sized and the old
        // path rewrote all of it every batch
        landBatchSegment(btl.unionByName(bdl).withColumn("src_batch", lit(batchId)),
          storePath, batchId, fs)
        if (segmentIdsAt(fs, basePath).size >= 16)
          compactSetStore(spark, storePath)
        ()
      }

  /** Streaming boilerplate scrub against an UNBOUNDED sentence-df
    * ledger — the batch `boilerplate_scrub` as a continuous gate:
    * each micro-batch's documents are split into trimmed sentences
    * ([[graft.operators.TextAnalysis.sentencesOf]] — the same frame
    * as the batch twin), a sentence whose cross-document reach
    * (saved ledger + this batch) is ≥ `minDocs` distinct docs is
    * boilerplate, and the batch lands with those sentences removed
    * in original order. Chrome that only becomes detectable over
    * time ("accept all cookies" seen once per batch for a week) is
    * caught the moment its cumulative reach crosses the threshold —
    * including across restarts, because the ledger lives in the
    * store, not executor state. The ledger holds DISTINCT
    * (sent_md5, doc_id) pairs attributed to their first-seen batch —
    * sentences shuffle as 32-char digests, never full text — so reach
    * is a TRUE distinct-doc count: a doc replayed by the source or
    * split across micro-batches can never inflate a sentence's reach
    * (the r7 ledger summed per-batch countDistincts and relied on a
    * documented no-recurrence assumption). Replay-idempotent by the
    * same batch-granular replace as the other store-backed gates:
    * a replayed batch's own rows are dropped before the anti-join, so
    * pairs keep their original attribution.
    */
  def boilerplateGate(docs: DataFrame, storePath: String, outPath: String,
                      minDocs: Long = 2)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val basePath = new org.apache.hadoop.fs.Path(storePath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath)
        requireBatchInHorizon(batchId, appliedUpTo(fs, basePath), storePath)
        val sents = graft.operators.TextAnalysis.sentencesOf(batch)
          .withColumn("sh", md5(col("sent")))
        val pairs = sents.select(col("sh"), col("doc_id")).distinct()
        val prior =
          if (storeHasData(fs, basePath)) {
            val saved = spark.read.parquet(storePath)
            // the ledger format changed from per-batch (sh, n_docs,
            // src_batch) counts to distinct (sh, doc_id, src_batch)
            // pairs; legacy counts can't be migrated to pairs (the doc
            // identities are gone), so fail loud with the remedy
            // instead of an AnalysisException mid-plan on first batch
            require(saved.columns.contains("doc_id"),
              s"boilerplate ledger at $storePath is in the legacy " +
                "(sh, n_docs, src_batch) format, which cannot express " +
                "distinct-doc reach; delete the store and replay the " +
                "stream from a fresh checkpoint to rebuild it")
            saved.filter(col("src_batch") =!= batchId)
          }
          else spark.emptyDataFrame.select(lit("").as("sh"),
            lit(0L).as("doc_id"), lit(0L).as("src_batch")).limit(0)
        // pairs not yet in the ledger: the union below is then a
        // distinct pair relation, so the per-sentence count is an
        // exact distinct-doc reach even under source replay
        val fresh = pairs.join(prior, Seq("sh", "doc_id"), "left_anti")
        val bp = prior.select(col("sh"), col("doc_id")).unionByName(fresh)
          .groupBy("sh").agg(count(lit(1)).as("cnd"))
          .filter(col("cnd") >= minDocs)
          .select(col("sh"), lit(true).as("is_bp"))
        // same ordered re-assembly as the batch twin — shared code, so
        // the two scrubs can never drift; the left join from the batch
        // keeps sentence-less docs (row parity, like the batch twin)
        val assembled = graft.operators.TextAnalysis.scrubAssembly(
          sents.join(bp, Seq("sh"), "left")
            .withColumn("keep", col("is_bp").isNull))
        val scrubbed = batch.select(col("doc_id")).join(assembled, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_sents"), lit(0L)).as("n_sents"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
            coalesce(col("kept_text"), lit("")).as("kept_text"))
        scrubbed.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        // the sentence-pair ledger grows with the corpus: land only
        // the batch's FRESH pairs as a delta segment (r11)
        landBatchSegment(fresh.withColumn("src_batch", lit(batchId)),
          storePath, batchId, fs)
        if (segmentIdsAt(fs, basePath).size >= 16)
          compactSetStore(spark, storePath)
        ()
      }

  /** The COMPOSED streaming cleaning funnel — the batch
    * `pipeline_clean` as a continuous gate: every micro-batch runs
    * quality rules → exact-dup screen → near-dup screen, each stage
    * the SAME code as its standalone gate ([[qualityGate]]'s rules via
    * [[graft.operators.TextAnalysis.qualityFlagsOf]], [[dedupGate]]'s
    * saved md5 store, [[neardupGate]]'s saved fingerprint store and
    * banded screen), so the funnel and its parts can never disagree.
    * Survivors land under `clean/batch=<id>`; a one-row per-stage
    * count report (the funnel chart) lands under `report/batch=<id>`.
    * BOTH stores update batch-granularly, so replay is idempotent
    * end-to-end. Store semantics: md5 fingerprints are recorded for
    * every exact-stage survivor (a later copy of a doc that the
    * NEAR-dup stage then dropped is still a copy of something seen —
    * it dies at the exact stage), near-dup fingerprints only for
    * landed docs. At 100 TB/day each screen shuffles only
    * (hash/band)-keyed matches — never store × batch — and the
    * quality stage is a scan-speed row map.
    */
  def pipelineGate(docs: DataFrame, md5StorePath: String, fpStorePath: String,
      outPath: String, maxHamming: Int = 6)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val md5Base = new org.apache.hadoop.fs.Path(md5StorePath)
        val fpBase = new org.apache.hadoop.fs.Path(fpStorePath)
        val fs = md5Base.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, md5Base)
        recoverStore(fs, fpBase)
        requireBatchInHorizon(batchId, appliedUpTo(fs, md5Base), md5StorePath)
        requireBatchInHorizon(batchId, appliedUpTo(fs, fpBase), fpStorePath)
        val Dedup = graft.operators.Dedup
        val nIn = batch.count()
        // stage 1: quality rules (shared code with qualityGate)
        val q = graft.operators.TextAnalysis.qualityFlagsOf(batch)
          .filter(col("keep") === 1L)
          .select(batch.columns.map(col): _*).persist()
        val nQuality = q.count()
        // stage 2: in-batch exact canon + saved md5 screen
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("text_md5").orderBy("doc_id")
        val canon = q.withColumn("text_md5", md5(col("text")))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val md5Prior =
          if (storeHasData(fs, md5Base))
            spark.read.parquet(md5StorePath).filter(col("src_batch") =!= batchId)
          else spark.emptyDataFrame.select(lit("").as("text_md5"),
            lit(0L).as("src_batch")).limit(0)
        val exactFresh = canon
          .join(md5Prior.select("text_md5"), Seq("text_md5"), "left_anti").persist()
        val nExact = exactFresh.count()
        // stage 3: in-batch near-dedup + saved fingerprint screen
        val inDups = Dedup.simhashPairsOf(exactFresh, maxHamming)
          .select(col("doc_b").as("doc_id")).distinct()
        val survivorsFp = Dedup.simhashDf(exactFresh)
          .join(inDups, Seq("doc_id"), "left_anti")
        val fpPrior =
          if (storeHasData(fs, fpBase))
            spark.read.parquet(fpStorePath).filter(col("src_batch") =!= batchId)
          else spark.emptyDataFrame.select(lit(0L).as("doc_id"),
            lit(0L).as("simhash"), lit(0L).as("src_batch")).limit(0)
        val matched = Dedup.simhashBandsOf(survivorsFp, "doc_id", maxHamming)
          .join(Dedup.simhashBandsOf(fpPrior, "doc_id", maxHamming)
              .select(col("band"), col("v"), col("simhash").as("ps")),
            Seq("band", "v"))
          .filter(expr("bit_count(simhash ^ ps)") <= maxHamming)
          .select("doc_id").distinct()
        val freshFp = survivorsFp.join(matched, Seq("doc_id"), "left_anti").persist()
        val clean = exactFresh
          .join(freshFp.select("doc_id"), Seq("doc_id"), "left_semi")
          .drop("text_md5")
        clean.write.mode("overwrite").parquet(s"$outPath/clean/batch=$batchId")
        val nClean = freshFp.count()
        spark.range(1)
          .select(lit(batchId).as("batch_id"), lit(nIn).as("n_in"),
            lit(nQuality).as("n_quality"), lit(nExact).as("n_exact"),
            lit(nClean).as("n_clean"))
          .write.mode("overwrite").parquet(s"$outPath/report/batch=$batchId")
        // store updates: md5 for every exact-stage survivor, simhash
        // fingerprints only for landed docs. Both stores are
        // append-only SETS, so each batch lands as a delta-sized
        // monotonic segment (r10 VERDICT item 3 — the old path unioned
        // and rewrote the WHOLE store every batch); the src_batch
        // column still keys replay exclusion in the prior reads (a
        // crash between the two landings replays with one store
        // already holding this batch's rows), and periodic compaction
        // bounds the file count
        landBatchSegment(exactFresh.select(col("text_md5"),
          lit(batchId).as("src_batch")), md5StorePath, batchId, fs)
        landBatchSegment(freshFp.select(col("doc_id"), col("simhash"),
          lit(batchId).as("src_batch")), fpStorePath, batchId, fs)
        // each store triggers on its OWN count: a crash between the
        // two folds must not let the second store outrun the bound
        if (segmentIdsAt(fs, md5Base).size >= 16)
          compactSetStore(spark, md5StorePath)
        if (segmentIdsAt(fs, fpBase).size >= 16)
          compactSetStore(spark, fpStorePath)
        q.unpersist()
        exactFresh.unpersist()
        freshFp.unpersist()
        ()
      }

  /** Streaming heavy hitters over a PERSISTED Count-Min sketch — the
    * streaming twin of the batch `heavy_hitters_cms`, and the reason
    * the CMS exists at all: the counter ledger stores the d = 4 ×
    * w = 64 cells keyed by source batch (batch-granular replace →
    * idempotent replay), so cumulative term-frequency estimates
    * survive restarts in 256 rows of state NO MATTER how many
    * distinct terms the stream has carried — the exact running
    * wordcount (`stream_topk`) holds one state row per term and
    * cannot bound that at 100 TB/day. Each batch's report ranks the
    * batch's OWN terms by their cumulative estimate (the "trending
    * now" view); estimates of unseen terms remain queryable offline
    * from the same saved sketch. Hashing is shared code with the
    * batch operator ([[graft.operators.TextAnalysis.cmsHashedOf]]),
    * so stream and batch can never drift.
    */
  def heavyHittersMonitor(docs: DataFrame, storePath: String, outPath: String,
      topK: Int = 10)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val basePath = new org.apache.hadoop.fs.Path(storePath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath)
        requireBatchInHorizon(batchId, swapAppliedUpTo(fs, basePath), storePath)
        val cnt = batch
          .select(explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
          .groupBy("term").agg(count(lit(1)).as("tf"))
          .withColumn("rh", graft.functions.HashFns.rollingHash(col("term")))
        val hashed = graft.operators.TextAnalysis.cmsHashedOf(cnt, 64L)
        val bt = hashed.groupBy("row", "bucket").agg(sum(col("tf")).as("n"))
        val prior =
          if (fs.exists(basePath))
            spark.read.parquet(storePath).filter(col("src_batch") =!= batchId)
          else spark.emptyDataFrame.select(lit(0).as("row"),
            lit(0L).as("bucket"), lit(0L).as("n"), lit(0L).as("src_batch")).limit(0)
        val cum = prior.select(col("row"), col("bucket"), col("n"))
          .unionByName(bt)
          .groupBy("row", "bucket").agg(sum(col("n")).as("c"))
        val report = hashed.join(broadcast(cum), Seq("row", "bucket"))
          .groupBy("term")
          .agg(max(col("tf")).as("batch_tf"), min(col("c")).as("cms_est"))
          .orderBy(col("cms_est").desc, col("term"))
          .limit(topK)
          .select(lit(batchId).as("batch_id"), col("term"),
            col("batch_tf"), col("cms_est"))
        report.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        swapInMerged(prior.unionByName(bt.withColumn("src_batch", lit(batchId))),
          storePath, batchId, fs)
        ()
      }

  /** Hybrid (sparse + dense) retrieval SERVING from the two saved
    * stores — the streaming composition of
    * [[graft.operators.Similarity.hybridSearch]]: each query batch
    * carries (query_id, term, embedding); the term side reads ONLY
    * its terms' buckets from the saved doc_id-keyed
    * [[graft.sources.IndexStore]] index (planning-time pruning, tf
    * ranking), the vector side reads only the assigned IVF buckets of
    * the saved embedding store (the [[knnServe]] path), and the two
    * candidate-bounded rankings RRF-fuse per query into
    * `outPath/batch=<id>` (idempotent replay). The one driver-side
    * collect is the batch's distinct term list — bounded by the query
    * batch, the collect a serving loop legitimately makes. Both
    * stores stay partition-pruned however large the corpus is; the
    * fusion frames are ≤ 4k rows per query.
    */
  def hybridServe(queries: DataFrame, indexPath: String, centroidPath: String,
      storePath: String, outPath: String, k: Int = 5,
      nBuckets: Int = graft.sources.IndexStore.DefaultBuckets)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    queries.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val terms = batch.select("term").distinct()
          .collect().map(_.getString(0)).toSeq
        if (terms.nonEmpty) {
          hybridBatchOf(batch,
              graft.sources.IndexStore.lookupTerms(spark, indexPath, terms, nBuckets),
              spark.read.parquet(centroidPath), loadEmbedStore(spark, storePath), k)
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        }
        ()
      }

  /** The hybrid retrieval kernel [[hybridServe]] lands per micro-batch
    * and [[hybridServeOn]] serves per request: tf-ranked sparse
    * candidates from the batch's term postings (`post` — already
    * bucket-pruned by the caller's fetch), bucket-pruned exact-cosine
    * dense candidates from `store`, RRF-fused top-`k` per query.
    * Both candidate lists are bounded at `k * 4` before the fusion
    * join, so the fusion frames stay small however large the corpus.
    */
  def hybridBatchOf(batch: DataFrame, post: DataFrame, cent: DataFrame,
                    store: DataFrame, k: Int): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val ws = W.partitionBy("query_id").orderBy(col("tf").desc, col("doc_id"))
    val sparse = post
      .join(broadcast(batch.select(col("query_id"), col("term"))), "term")
      // a multi-term query yields one posting row per matched term:
      // collapse to one candidate per (query, doc) — summed tf, the
      // same accumulation the batch twin's BM25 leg does — so a
      // two-term match occupies one rank slot, not two.
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("tf")).as("tf"))
      .withColumn("rank_sparse", row_number().over(ws).cast("long"))
      .filter(col("rank_sparse") <= k * 4)
      .select(col("query_id"), col("doc_id"), col("rank_sparse"))
    // one (query_id, term) row per term ⇒ the embedding repeats per
    // term row; dedupe before assignment or each query probes (and
    // ranks) once per term.
    val qv = graft.operators.Similarity.ivfAssignTo(
        graft.operators.Similarity.withNormOf(
          batch.select(col("query_id").as("vec_id"), col("embedding"))
            .dropDuplicates("vec_id")), cent)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nm").as("qnm"), col("bucket"))
      // consumed twice (bucket collect + probe join) — see knnBatchOf
      .localCheckpoint()
    val wd = W.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    val dense = prunedToBuckets(store, qv).join(broadcast(qv), "bucket")
      .withColumn("cos",
        graft.functions.VectorFns.dot(col("qe"), col("embedding")) /
          (col("qnm") * col("nm")))
      .withColumn("rank_dense", row_number().over(wd).cast("long"))
      .filter(col("rank_dense") <= k * 4)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rank_dense"))
    val wf = W.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60.0) + col("rank_sparse")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("rank_dense")), lit(0.0)), 6))
      .withColumn("rk", row_number().over(wf).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("doc_id"),
        coalesce(col("rank_sparse"), lit(0L)).as("rank_sparse"),
        coalesce(col("rank_dense"), lit(0L)).as("rank_dense"), col("rrf"))
  }

  /** Per-request hybrid top-`k` against a pinned sparse session
    * ([[graft.sources.IndexStore.OpenIndex]]) and a pinned dense
    * session ([[OpenEmbedStore]]) — identical rows to a
    * [[hybridServe]] micro-batch over the same store states
    * (spec-asserted). The one driver-side collect is the request's
    * distinct term list, the collect a serving loop legitimately
    * makes. Snapshot semantics are both handles': takedowns or
    * segments landed after either open need a re-open of that handle.
    */
  def hybridServeOn(oi: graft.sources.IndexStore.OpenIndex,
                    oes: OpenEmbedStore, queries: DataFrame,
                    k: Int = 5): DataFrame = {
    val terms = queries.select("term").distinct()
      .collect().map(_.getString(0)).toSeq
    require(terms.nonEmpty, "hybridServeOn needs at least one query term")
    hybridBatchOf(queries, graft.sources.IndexStore.lookupTermsOn(oi, terms),
      oes.cent, oes.store, k)
  }

  /** Continuous weighted reservoir: a document stream keeps the
    * global top-k Efraimidis–Spirakis sample fresh — each micro-batch
    * scores its docs with the SAME salted-hash E-S key as the batch
    * operator ([[graft.operators.Pipeline.esKeysOf]], so batch and
    * streaming draws agree on any prefix of the corpus), unions the
    * saved reservoir, and keeps the global top-k. A weighted sample
    * is exactly mergeable this way (each doc's key is independent of
    * every other doc), so the store IS the correct sample of
    * everything ever streamed. src_batch tagging + the prior filter
    * make replay idempotent; the store swap is crash-recovered like
    * every other persisted artifact here. State = k rows, total.
    */
  def weightedReservoir(docs: DataFrame, storePath: String, k: Int = 100)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val basePath = new org.apache.hadoop.fs.Path(storePath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath)
        val scored = graft.operators.Pipeline.esKeysOf(batch)
          .withColumn("src_batch", lit(batchId))
        val prior =
          if (fs.exists(basePath))
            spark.read.parquet(storePath).filter(col("src_batch") =!= batchId)
          else scored.limit(0)
        val merged = prior.unionByName(scored)
          .orderBy(col("es_key").desc, col("doc_id"))
          .limit(k)
        val tmp = s"$storePath.merged-$batchId"
        merged.write.mode("overwrite").parquet(tmp)
        if (fs.exists(basePath)) swapStore(fs, basePath, tmp)
        else mustRename(fs, new org.apache.hadoop.fs.Path(tmp), basePath)
        ()
      }

  /** Streaming ingestion-anomaly monitor — the streaming twin of the
    * batch `events_anomaly`: each micro-batch's daily event counts
    * merge into a saved (day, n_events, src_batch) ledger
    * (batch-granular replace → idempotent replay), and the batch's
    * report scores the days it touched against the FULL ledger's
    * exact integer moments (n, Σx, Σx²) — the alert baseline tightens
    * as history accrues, and a restart loses nothing because the
    * ledger, not executor state, carries the history. The anomaly
    * rule matches the batch operator: |z| ≥ 2 on the sample-variance
    * z-score; with fewer than 2 days of history, or zero variance,
    * z is defined as 0 — no alerting before a baseline exists. At
    * 100 TB/day the ledger is one row per calendar day: the merge
    * rewrite is a few KB regardless of stream volume, and the per-day
    * batch rollup is the only work that scales with input.
    */
  /** Shared scaffold of the day-ledger monitors ([[anomalyMonitor]],
    * [[forecastMonitor]], [[changepointMonitor]]): merge the batch's
    * per-day counts into the saved (day, n_events, src_batch) ledger,
    * hand `report` the cumulative (day, c) history plus the batch
    * rollup, land the report, and commit the ledger via the
    * crash-safe swap. The replay-idempotency discipline (src_batch
    * filter + batch-granular replace) lives HERE once, so a fix to
    * the swap or replay path can never leave a sibling monitor stale.
    */
  private def dayLedgerMonitor(events: DataFrame, storePath: String,
      outPath: String)(report: (DataFrame, DataFrame, Long) => DataFrame)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val basePath = new org.apache.hadoop.fs.Path(storePath)
        val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverStore(fs, basePath)
        requireBatchInHorizon(batchId, swapAppliedUpTo(fs, basePath), storePath)
        val bt = batch
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("day").agg(count(lit(1)).as("n_events"))
        val prior =
          if (fs.exists(basePath))
            spark.read.parquet(storePath).filter(col("src_batch") =!= batchId)
          else spark.emptyDataFrame.select(lit(0L).as("day"),
            lit(0L).as("n_events"), lit(0L).as("src_batch")).limit(0)
        val cum = prior.select(col("day"), col("n_events"))
          .unionByName(bt)
          .groupBy("day").agg(sum(col("n_events")).as("c"))
        report(cum, bt, batchId)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        swapInMerged(prior.unionByName(bt.withColumn("src_batch", lit(batchId))),
          storePath, batchId, fs)
        ()
      }

  def anomalyMonitor(events: DataFrame, storePath: String, outPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    dayLedgerMonitor(events, storePath, outPath) { (cum, bt, batchId) =>
      val m = cum.agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
        sum(col("c") * col("c")).as("sxx"))
      val scored = cum.crossJoin(broadcast(m))
        .withColumn("mean", col("sx").cast("double") / col("n"))
        .withColumn("sd", sqrt(
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
            (col("n").cast("double") * (col("n") - 1L).cast("double"))))
        .withColumn("z", when(col("n") > 1L && col("sd") > 0.0,
          round((col("c") - col("mean")) / col("sd"), 4)).otherwise(0.0))
      bt.select(col("day"), col("n_events").as("batch_events"))
        .join(scored, Seq("day"))
        .select(lit(batchId).as("batch_id"), col("day"), col("batch_events"),
          col("c").as("cum_events"), round(col("mean"), 4).as("mean"),
          col("z"),
          when(abs(col("z")) >= 2.0, 1L).otherwise(0L).as("is_anomaly"))
    }

  /** Continuous Holt forecast over a saved per-day ledger — the batch
    * [[graft.operators.Analytics.eventsHolt]] as a monitor: each
    * micro-batch merges its per-day counts into the ledger
    * (day, n_events, src_batch) and REPLAYS the exact Holt fold
    * ([[graft.operators.Analytics.holtOf]] — shared code) over the
    * complete day-ordered history, publishing the latest level /
    * trend / next-day forecast. Replaying the ledger instead of
    * carrying (l, b) in executor state is what makes late and
    * out-of-order days EXACT: a late event revises history and every
    * smoothed value downstream of it, which no forward-only state
    * could do — and the ledger is |days|-bounded (calendar), so the
    * replay is a rounding error next to the batch's own rollup at any
    * corpus size. Restart-safe and replay-idempotent by the standard
    * batch-granular ledger replace.
    */
  def forecastMonitor(events: DataFrame, storePath: String, outPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    dayLedgerMonitor(events, storePath, outPath) { (cum, _, batchId) =>
      // n_days from the LEDGER, not from h: counting through holtOf
      // would replay the whole fold a second time per batch
      graft.operators.Analytics.holtOf(cum)
        .orderBy(col("day").desc).limit(1)
        .select(lit(batchId).as("batch_id"), col("day").as("latest_day"),
          col("level"), col("trend"), col("forecast"))
        .crossJoin(broadcast(cum.agg(count(lit(1)).as("n_days"))))
    }

  /** Continuous Holt-Winters forecast — [[forecastMonitor]] with the
    * period-7 seasonal register: each batch merges its day counts and
    * replays [[graft.operators.Analytics.holtWintersOf]] (shared
    * fold — the monitor and the oracle-gated batch key can never
    * drift) over the complete ledger, publishing the latest state and
    * the NEXT-day projection level + trend + s_{t−6} (the register
    * entry that comes due tomorrow, read off the published seasonal
    * column 7 rows back). Emits nothing until the ledger holds the
    * 8 days the seed week needs; late/replayed days are exact by the
    * ledger replay, same as the Holt monitor.
    */
  def hwForecastMonitor(events: DataFrame, storePath: String, outPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    dayLedgerMonitor(events, storePath, outPath) { (cum, _, batchId) =>
      val hw = graft.operators.Analytics.holtWintersOf(cum)
      val last = hw.orderBy(col("day").desc).limit(1)
      val sNext = hw.orderBy(col("day").desc).limit(7)
        .orderBy(col("day").asc).limit(1)
        .select(col("seasonal").as("s_next"))
      last.crossJoin(broadcast(sNext))
        .select(lit(batchId).as("batch_id"), col("day").as("latest_day"),
          col("level"), col("trend"), col("seasonal"),
          round(col("level") + col("trend") + col("s_next"), 6)
            .as("next_forecast"))
        .crossJoin(broadcast(cum.agg(count(lit(1)).as("n_days"))))
    }

  /** Continuous seasonality-aware anomaly monitor — the batch
    * [[graft.operators.Analytics.eventsStlAnomaly]] replayed over the
    * day ledger (shared `eventsStlAnomalyOf` — decomposition and
    * medians can never drift from the oracle-gated batch key): each
    * batch publishes the LATEST decomposable day's residual, the
    * robust 3×MAD verdict, and the flagged-day count over the whole
    * history. Because trend is a CENTERED 7-day MA, the newest 3 days
    * are never decomposable yet — the published day trails the ledger
    * head by 3, the price of a symmetric window (the Holt-Winters
    * monitor is the zero-lag alternative). Late days revise the whole
    * decomposition exactly, same ledger discipline as the others.
    */
  def stlAnomalyMonitor(events: DataFrame, storePath: String, outPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    dayLedgerMonitor(events, storePath, outPath) { (cum, _, batchId) =>
      val a = graft.operators.Analytics.eventsStlAnomalyOf(cum)
      a.orderBy(col("day").desc).limit(1)
        .select(lit(batchId).as("batch_id"), col("day").as("latest_scored_day"),
          col("n_events"), col("resid"), col("med"), col("mad"),
          col("is_anomaly"))
        .crossJoin(broadcast(
          a.agg(sum(col("is_anomaly")).as("n_flagged"),
            count(lit(1)).as("n_scored_days"))))
    }

  /** Continuous change-point monitor — [[forecastMonitor]]'s sibling
    * over the same ledger discipline: each micro-batch merges its
    * per-day counts and replays the EXACT integer binary-segmentation
    * argmin ([[graft.operators.Analytics.changepointOf]], shared
    * code) over the complete history, publishing the split day and
    * its gain. The all-integer argmin means the published split can
    * never flap from float noise — it moves only when the data moves
    * — and the ledger replay makes late days exact, same as the
    * forecast monitor. Needs ≥2 observed days (emits nothing before).
    */
  def changepointMonitor(events: DataFrame, storePath: String, outPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    dayLedgerMonitor(events, storePath, outPath) { (cum, _, batchId) =>
      graft.operators.Analytics.changepointOf(cum)
        .select(lit(batchId).as("batch_id"), col("n_days"), col("split_day"),
          col("cost_micro"), col("baseline_micro"), col("gain_micro"))
    }

  /** Streaming corpus triage: every micro-batch is scored by the
    * batch quality rules ([[graft.operators.TextAnalysis.qualityFlagsOf]]
    * — the SAME rule code, so batch and stream can never drift) and
    * routed to a clean or quarantine corpus, one directory per batch
    * id. Exactly-once by idempotent replay: a restarted batch
    * overwrites its own `batch=<id>` directory, so duplicate landing
    * is impossible without a transactional sink. The flags frame is
    * computed once per batch (persist) and both routes stream from
    * it; rejected docs keep their rule flags for quarantine triage.
    */
  def qualityGate(docs: DataFrame, cleanPath: String, quarantinePath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val flagged = graft.operators.TextAnalysis.qualityFlagsOf(batch).persist()
        try {
          flagged.filter(col("keep") === 1L)
            .drop("n_tokens", "r_len", "r_wordlen", "r_stop", "r_ttr", "keep")
            .write.mode("overwrite").parquet(s"$cleanPath/batch=$batchId")
          flagged.filter(col("keep") === 0L)
            .write.mode("overwrite").parquet(s"$quarantinePath/batch=$batchId")
        } finally flagged.unpersist()
        ()
      }

  /** Streaming DSIR importance gate: every micro-batch's documents
    * are scored against a SAVED 64-row bucket-LLR table
    * ([[graft.operators.Pipeline.saveDsirLm]] — the batch-side
    * target-vs-raw LM fit), and routed to a keep corpus
    * (target-like, logweight > 0) or a drop corpus per batch — the
    * streaming half of [[graft.operators.Pipeline.dsirWeights]], with
    * the model in the store instead of executor state (the
    * contaminationGate pattern). Batch-keyed output directories make
    * replay idempotent; the LLR table is 64 rows, so the scoring join
    * broadcasts and the only shuffle is the per-doc bucket rollup.
    * Zero-token documents have no feature mass and land in neither
    * corpus (same contract as the batch operator's output).
    */
  def importanceGate(docs: DataFrame, lmPath: String, keepPath: String,
                     dropPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val llr = spark.read.parquet(lmPath)
        val scored = graft.operators.Pipeline.dsirScoreOf(batch, llr)
        val routed = batch.join(scored, "doc_id").persist()
        try {
          routed.filter(col("keep") === 1L).drop("keep")
            .write.mode("overwrite").parquet(s"$keepPath/batch=$batchId")
          routed.filter(col("keep") === 0L).drop("keep")
            .write.mode("overwrite").parquet(s"$dropPath/batch=$batchId")
        } finally routed.unpersist()
        ()
      }

  /** Streaming benchmark-contamination screen: every micro-batch's
    * documents are shingled (the same kernel the batch
    * `contamination_check` uses) and joined against a SAVED train-
    * shingle set ([[graft.operators.Pipeline.saveShingleSet]]);
    * documents sharing any shingle land in a quarantine directory per
    * batch (idempotent replay, like [[qualityGate]]) with their
    * overlap count. State lives in the store, not executor memory —
    * the indexMaintenance pattern — so the screen handles any train
    * corpus size; a production deployment swaps the join for a bloom
    * filter broadcast when the shingle set fits one.
    */
  def contaminationGate(docs: DataFrame, trainShinglePath: String,
                        quarantinePath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val train = spark.read.parquet(trainShinglePath)
        val hits = graft.operators.Dedup.shingleHashes(batch)
          .select(col("doc_id"), explode(array_distinct(col("hs"))).as("hh"))
          .join(train, "hh")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shared_shingles"))
        batch.join(hits, "doc_id")
          .write.mode("overwrite").parquet(s"$quarantinePath/batch=$batchId")
        ()
      }

  /** Watermarked tumbling 1-hour counts per event type — streaming
    * twin of `Analytics.windowTumbling`.
    */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"))

  /** Live OHLC bars — the streaming twin of the batch `events_ohlc`:
    * hourly open/high/low/close per event type. open/close ride
    * `min_by`/`max_by` on event time (declarative aggregates, so the
    * whole thing stays a PURE streaming aggregation — the batch
    * operator's row_number windows would need unbounded sort state).
    * Watermark bounds state to the open bars; high/low/count merge
    * partially like any agg.
    */
  def ohlcBars(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("open"), col("high"), col("low"), col("close"))

  /** Running global term frequencies over a document stream in Update
    * mode — the streaming twin of the batch `wordcount` (and the live
    * "trending terms" surface a search deployment watches). A pure
    * streaming aggregation: partial counts merge into state per
    * micro-batch, and Update mode emits only the changed rows — the
    * consumer (a top-k dashboard) keeps its own bounded view, so
    * nothing unbounded leaves the query. State is one row per
    * distinct term.
    */
  def runningWordcount(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term")
      .agg(count(lit(1)).as("freq"))

  /** Stream–stream interval join: each event enriched with orders of
    * the same user placed within the hour BEFORE the event. Both sides
    * carry watermarks and the join condition bounds event time on both
    * ends, so state eviction is watermark-driven — the 100 TB/day
    * requirement for an unbounded join to hold only an hour of each
    * side.
    */
  def enrichWithOrders(events: DataFrame, orders: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .join(orders.withWatermark("ots", "1 hour"),
        expr("""user_id = o_custkey AND
                ots BETWEEN ts - INTERVAL 1 HOUR AND ts"""))
      .select(col("user_id"), col("ts"), col("o_orderkey"))

}
