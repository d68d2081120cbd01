package graft

/** Plan audit: prints the formatted physical plan of selected queries
  * so scan pushdown (PushedFilters/ReadSchema), broadcast choices and
  * WholeStageCodegen spans can be inspected per round.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q1_agg", "q3_topk", "term_search", "semi_join",
                  "asof_join", "inverted_index", "knn_ivf", "minhash_lsh_pairs",
                  "rrf_fusion", "funnel_steps", "salted_join", "sample_k",
                  "postings_compress", "ngram_jaccard", "knn_pq",
                  "contamination_check", "concurrency_peak", "cooccur_pmi",
                  "skew_report", "pipeline_clean")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None =>
          println(s"unknown query '$n'; valid names:\n  " +
            SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      }
    }
    spark.stop()
  }
}
