package graft

/** Scale-stress runner behind SURVEY §6's 10× study: times a set of
  * keys against two data dirs (sf0.1 and the `tools/make_stress10x.py`
  * clone corpus) under BOTH fold modes — the gate's bitwise
  * deterministic folds and the production plain partial-agg path — so
  * each key's cost can be attributed to its input measure rather than
  * the fold kernels. Shares Bench's honest-materialization contract
  * (`queryExecution.toRdd`, min-of-2).
  *
  * Usage: `runMain graft.StressBench [key,key,...]` (defaults to the
  * round's heaviest audit keys); dirs via SPARK_GRAFT_STRESS_DIRS
  * (comma-separated, default sf0.1 + /tmp/stress10x).
  */
/** Rounds-vs-time curve for the BPE trainer (SURVEY §6; r10 VERDICT
  * item 2): times `bpe_train` at production round counts via the
  * [[graft.operators.TextAnalysis.BpeRoundsConfKey]] knob. Usage:
  * `runMain graft.BpeStress [rounds,rounds,...]` (default 8,64,256);
  * dirs via SPARK_GRAFT_STRESS_DIRS (default sf0.1).
  */
object BpeStress {
  def main(args: Array[String]): Unit = {
    val rounds =
      if (args.nonEmpty) args(0).split(',').toSeq.map(_.toInt)
      else Seq(8, 64, 256)
    val dirs = sys.env.getOrElse("SPARK_GRAFT_STRESS_DIRS",
      "/root/testdata/sf0.1").split(',').toSeq
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).count() // warm codegen/readers/shuffle
    for (dir <- dirs; r <- rounds) {
      spark.conf.set(operators.TextAnalysis.BpeRoundsConfKey, r.toString)
      val t0 = System.nanoTime()
      val merges = operators.TextAnalysis
        .bpeTrainOf(sources.Tables.documents(spark, dir))
        .queryExecution.toRdd.count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"BPESTRESS dir=$dir%-24s rounds=$r%-4d merges=$merges%-4d $t%8.2fs")
    }
    spark.conf.unset(operators.TextAnalysis.BpeRoundsConfKey)
    spark.stop()
  }
}

object StressBench {
  def main(args: Array[String]): Unit = {
    val keys =
      if (args.nonEmpty) args(0).split(',').toSeq
      else Seq("neardup_eval", "source_dup_matrix", "dedup_span_ranges",
               "doc_lang_mismatch", "simhash_pairs")
    val dirs = sys.env.getOrElse("SPARK_GRAFT_STRESS_DIRS",
      "/root/testdata/sf0.1,/tmp/stress10x").split(',').toSeq
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).count() // warm codegen/readers/shuffle
    for (dir <- dirs; mode <- Seq("true", "false")) {
      spark.conf.set(operators.Folds.ConfKey, mode)
      keys.foreach { k =>
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(k)(spark, dir).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"STRESS dir=$dir%-24s folds=$mode%-5s $k%-20s $t%8.2fs")
      }
    }
    spark.conf.set(operators.Folds.ConfKey, "true")
    spark.stop()
  }
}
