package graft

import org.apache.spark.sql.SparkSession

/** The library's session entry point: one place that encodes every
  * config the engine's semantics depend on, so embedding applications
  * (and this repo's own mains/specs) can't drift apart.
  *
  * Required by the engine:
  *   - UTC session timezone — every date/timestamp oracle + test is
  *     pinned UTC (SURVEY.md §7.5).
  *   - `nanosAsLong` — Spark 4 rejects TIMESTAMP(NANOS) parquet
  *     outright without it; [[T.events]] then converts to µs.
  * Scale defaults (overridable after build):
  *   - shuffle partitions sized to the core count, not the 200 default
  *     (right for local/small-cluster; raise to ~2-3× total cores on a
  *     real cluster).
  *   - AQE is left ON (Spark 4 default): runtime coalescing, skew-join
  *     splitting (evidence in ScaleSpec), dynamic join re-planning.
  */
object GraftSession {

  /** Preconfigured builder; callers may adjust before `getOrCreate`. */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Build-and-quiet: the form the mains use. */
  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
