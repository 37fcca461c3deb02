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
      // maxPartitionBytes stays at the 128 MB default DELIBERATELY
      // (r12, measured): shrinking it to 2 MB to "parallelize" the
      // single-file fixture scans made every probed key SLOWER
      // (fn_cast 1.70 → 2.13 s, scan_pruned 0.40 → 0.52 s min-of-5,
      // same conditions) — the parquet ROW GROUP is the decode unit,
      // so sub-row-group splits re-decode instead of parallelizing,
      // and the extra tasks are pure overhead. Per-row-EXPENSIVE
      // stages over small scans are parallelized the other way:
      // T.spread at the specific operator (the §7.6 r2 note).
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
