package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming longevity soak (SURVEY §6; r10 VERDICT item 4): drives
  * the three production sinks — `stream_index` (segmented
  * IndexStore), `stream_interleave` (segmented pack store) and
  * `stream_pipeline` (md5 + fingerprint screens) — through N
  * micro-batches of equal-sized document slices, recording per-batch
  * wall time and the store's recursive file count, then compacts and
  * reports the fold. The claims this evidences: per-batch cost stays
  * FLAT (the segmented sinks write deltas, and compaction keeps the
  * read side bounded), and file counts stay BOUNDED (auto-compaction
  * every `compactEvery` batches folds the landings).
  *
  * Usage: `runMain graft.SoakStress [nBatches] [sfDir] [sinks]`
  * (default 100 batches over sf0.01, all five sinks; `sinks` is a
  * comma list for targeted long soaks, e.g. `1000 ... stream_pipeline`
  * — the r12 VERDICT item 4 run). Prints `SOAK sink=... batch=K
  * t=...s files=N` every 10th batch plus a summary per sink.
  */
object SoakStress {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(100)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val sinks: String => Boolean =
      if (args.length > 2) args(2).split(',').toSet else _ => true
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // equal-sized slices, cycling if nBatches * slice > |docs|; doc ids
    // offset per cycle so every batch is NEW documents (append regime)
    val sliceSz = math.max(1, docs.length / math.min(nBatches, docs.length))
    def slice(b: Int): Seq[(Long, String)] = {
      val off = (b * sliceSz) % docs.length
      val cyc = (b * sliceSz) / docs.length
      docs.slice(off, off + sliceSz).toIndexedSeq
        .map { case (id, t) => (id + cyc * 1000000L, t) }
    }

    val base = java.nio.file.Files.createTempDirectory("graft-soak").toString
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(p: String): Int = {
      val path = new org.apache.hadoop.fs.Path(p)
      if (!fs.exists(path)) 0
      else {
        val it = fs.listFiles(path, true)
        var n = 0
        while (it.hasNext) { it.next(); n += 1 }
        n
      }
    }
    def report(sink: String, times: Seq[Double], fileCounts: Seq[Int]): Unit = {
      def median(xs: Seq[Double]): Double = {
        val s = xs.sorted
        s(s.size / 2)
      }
      // window medians when the soak is long enough; whole-run median
      // otherwise (a short smoke run must still print its summary)
      val early = if (times.size >= 12) median(times.slice(2, 12)) else median(times)
      val late = if (times.size >= 12) median(times.takeRight(10)) else median(times)
      println(f"SOAK-SUMMARY sink=$sink%-18s batches=${times.size} " +
        f"median(3-12)=$early%.2fs median(last10)=$late%.2fs " +
        f"ratio=${late / early}%.2f maxFiles=${fileCounts.max} lastFiles=${fileCounts.last}")
    }

    def drive(sink: String, storePaths: Seq[String],
              start: org.apache.spark.sql.DataFrame => org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row]): Unit = {
      val in = MemoryStream[(Long, String)]
      val q = start(in.toDF().toDF("doc_id", "text")).start()
      val times = Seq.newBuilder[Double]
      val counts = Seq.newBuilder[Int]
      try {
        (0 until nBatches).foreach { b =>
          val t0 = System.nanoTime()
          in.addData(slice(b): _*)
          q.processAllAvailable()
          val dt = (System.nanoTime() - t0) / 1e9
          val nf = storePaths.map(files).sum
          times += dt
          counts += nf
          if (b % 10 == 9) println(f"SOAK sink=$sink%-18s batch=${b + 1}%3d t=$dt%6.2fs files=$nf")
        }
      } finally q.stop()
      report(sink, times.result(), counts.result())
    }

    // vector twin of `drive` for the embedding-keyed sinks (r11
    // VERDICT item 3: the embed IVF store and the semantic screen got
    // their segment landings after the r11 soak ran — soak them too)
    val vecs = sources.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    // the vector soaks (and the centroid save below) need a non-empty
    // embeddings table; fail loudly up front instead of an
    // ArithmeticException out of the slice arithmetic
    require(vecs.nonEmpty,
      s"SoakStress: embeddings table at $sfDir is empty — vector soaks need at least one vector")
    val vSliceSz = math.max(1, vecs.length / math.min(nBatches, vecs.length))
    def vSlice(b: Int): Seq[(Long, Array[Float])] = {
      val off = (b * vSliceSz) % vecs.length
      val cyc = (b * vSliceSz) / vecs.length
      vecs.slice(off, off + vSliceSz).toIndexedSeq
        .map { case (id, e) => (id + cyc * 1000000L, e) }
    }
    def driveVec(sink: String, storePaths: Seq[String],
                 start: org.apache.spark.sql.DataFrame => org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row]): Unit = {
      val in = MemoryStream[(Long, Array[Float])]
      val q = start(in.toDF().toDF("vec_id", "embedding")).start()
      val times = Seq.newBuilder[Double]
      val counts = Seq.newBuilder[Int]
      try {
        (0 until nBatches).foreach { b =>
          val t0 = System.nanoTime()
          in.addData(vSlice(b): _*)
          q.processAllAvailable()
          val dt = (System.nanoTime() - t0) / 1e9
          val nf = storePaths.map(files).sum
          times += dt
          counts += nf
          if (b % 10 == 9) println(f"SOAK sink=$sink%-18s batch=${b + 1}%3d t=$dt%6.2fs files=$nf")
        }
      } finally q.stop()
      report(sink, times.result(), counts.result())
    }

    // shared coarse quantizer: the first 8 corpus vectors as centroids
    val centPath = s"$base/centroids"
    import org.apache.spark.sql.functions.col
    operators.Similarity.saveCentroids(
      sources.Tables.embeddings(spark, sfDir)
        .orderBy("vec_id").limit(8)
        .select((org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
          .cast("long").as("vec_id"), col("embedding")),
      centPath)

    if (sinks("stream_index"))
      drive("stream_index", Seq(s"$base/index"),
        df => streaming.Stream.indexMaintenance(df, s"$base/index", nBuckets = 8, compactEvery = 16))
    if (sinks("stream_interleave"))
      drive("stream_interleave", Seq(s"$base/packs"),
        df => streaming.Stream.interleaveMaintenance(df, s"$base/packs", compactEvery = 16))
    if (sinks("stream_pipeline"))
      drive("stream_pipeline", Seq(s"$base/md5", s"$base/fp"),
        df => streaming.Stream.pipelineGate(df, s"$base/md5", s"$base/fp", s"$base/out"))
    if (sinks("stream_embed_index"))
      driveVec("stream_embed_index", Seq(s"$base/vecstore"),
        df => streaming.Stream.embedIndexMaintenance(df, centPath, s"$base/vecstore", compactEvery = 16))
    if (sinks("stream_semantic_store"))
      driveVec("stream_semantic_store", Seq(s"$base/semstore"),
        df => streaming.Stream.semdedupGate(df, centPath, s"$base/semstore", s"$base/semout"))

    if (sinks("stream_embed_index")) {
    // content exactness across a compaction: the resolved embed store
    // folds to one segment with IDENTICAL (vec_id, bucket) content
    val preFold = streaming.Stream.loadEmbedStore(spark, s"$base/vecstore")
      .select(col("vec_id"), col("bucket").cast("long").as("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    streaming.Stream.compactEmbedStore(spark, s"$base/vecstore")
    val postFold = streaming.Stream.loadEmbedStore(spark, s"$base/vecstore")
      .select(col("vec_id"), col("bucket").cast("long").as("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    println(s"SOAK-COMPACT stream_embed_index: rows=${postFold.size} " +
      s"files=${files(s"$base/vecstore")} exact=${preFold == postFold}")
    }
    if (sinks("stream_semantic_store")) {
    // the semantic store's membership must equal the landed survivors
    val landedVecs = spark.read.parquet(s"$base/semout")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val storeVecs = spark.read.parquet(s"$base/semstore")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    println(s"SOAK-CHECK stream_semantic_store: survivors=${landedVecs.size} " +
      s"store=${storeVecs.size} consistent=${landedVecs == storeVecs}")
    }
    if (sinks("stream_pipeline")) {
    // the pipeline gate's clean landing accumulates batch=<id> dirs by
    // design; CorpusStore.compact (save under the hood) folds them —
    // the soak slices carry no lang/source, so stamp the canonical
    // layout's partition columns before the fold
    val cleanFiles = files(s"$base/out/clean")
    import org.apache.spark.sql.functions.lit
    val landed = spark.read.parquet(s"$base/out/clean")
      .withColumn("lang", lit("en")).withColumn("source", lit("soak"))
    val n = landed.count()
    sources.CorpusStore.save(landed, s"$base/out/clean_compacted")
    println(f"SOAK-COMPACT stream_pipeline clean: $cleanFiles files -> " +
      f"${files(s"$base/out/clean_compacted")} files, $n docs preserved=" +
      s"${spark.read.parquet(s"$base/out/clean_compacted").count() == n}")
    }
    spark.stop()
  }
}
