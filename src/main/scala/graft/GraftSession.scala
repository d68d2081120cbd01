package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession construction for the engine's entry points
  * (Verify, Bench, tests). Centralizes the confs every graft plan
  * assumes so no operator needs session-mutating side effects:
  *
  *  - `nanosAsLong`: the events table is parquet TIMESTAMP(NANOS),
  *    which Spark only reads as a long via this legacy conf;
  *  - shuffle partitions sized to the local core count (the 100 TB
  *    deployment overrides this per-cluster; AQE coalesces down);
  *  - UTC so date/timestamp formatting matches the DuckDB oracle.
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession =
    builder(cores).getOrCreate()
}
