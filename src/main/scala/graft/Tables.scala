package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loaders + determinism helpers shared by every operator.
  *
  * Determinism rules (SURVEY.md §7.5) applied engine-wide:
  *   - SUMs of money-scale doubles go through [[T.dec]] (DECIMAL(18,4))
  *     so the aggregate is exact and independent of partition order —
  *     a raw double sum at sf0.1 magnitudes can differ between engines
  *     by more than a 4-dp rounding step.
  *   - Every declared query ends in a total-order sort on a unique key.
  *   - `events.ts` arrives in whatever precision the fixture generator
  *     last used (ns-as-LongType, µs TIMESTAMP_NTZ, or TIMESTAMP);
  *     [[T.events]] normalizes all three to a session-zone TIMESTAMP,
  *     so downstream code sees one dtype regardless of fixture vintage.
  *     Still second-truncate / string-format before comparing or
  *     emitting (DuckDB may keep finer precision than Spark).
  */
object T {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String)     = t(s, d, "region")
  def nation(s: SparkSession, d: String)     = t(s, d, "nation")
  def customer(s: SparkSession, d: String)   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String)   = t(s, d, "supplier")
  def part(s: SparkSession, d: String)       = t(s, d, "part")
  def orders(s: SparkSession, d: String)     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String)   = t(s, d, "lineitem")

  /** Schema-adaptive `events` loader. The fixture generator has shipped
    * `ts` in three shapes across rounds, so branch on the LOADED dtype
    * rather than assuming one:
    *   - parquet TIMESTAMP(NANOS): Spark 4's reader rejects it
    *     ([PARQUET_TYPE_ILLEGAL]) unless
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (set here
    *     defensively), which surfaces epoch-nanos as LongType → convert
    *     via integer `div` (double division loses precision above 2^53;
    *     epoch-nanos ≈ 1.7e18).
    *   - timestamp[us] → TIMESTAMP_NTZ: cast to session-zone TIMESTAMP.
    *     The session is pinned UTC engine-wide, so the naive wall-clock
    *     value is preserved bit-for-bit (same trick join_nearest uses
    *     for o_orderdate).
    *   - TIMESTAMP: pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(s, d, "events"))
  }

  /** Normalize a `ts` column of any fixture vintage to TIMESTAMP.
    * Exposed separately from [[events]] so streaming reads (which go
    * through `readStream`, not this loader) apply the identical
    * branching.
    */
  def normalizeTs(raw: DataFrame, colName: String = "ts"): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema(colName).dataType match {
      case LongType =>
        raw.withColumn(colName, expr(s"timestamp_micros($colName div 1000)"))
      case TimestampNTZType =>
        raw.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"$colName has unsupported dtype $other — extend T.normalizeTs for this fixture shape")
    }
  }

  def documents(s: SparkSession, d: String)  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = t(s, d, "embeddings")

  /** Exact-arithmetic cast for money-scale aggregation inputs. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Fan a small single-file table out across the cluster before
    * per-row-expensive work (shingling, hashing, dot products). The
    * testdata tables arrive as ONE parquet file → one input partition
    * → the whole map stage runs on one core; at real scale inputs span
    * many files and `spark.sql.files.maxPartitionBytes` does this job,
    * so the repartition is a no-op-equivalent there, not a crutch.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Final-projection form of a decimal aggregate: rounded, cast to
    * double. The driver's pandas-based comparator canonicalizes DECIMAL
    * inconsistently between Spark and DuckDB outputs (round-1 verdict:
    * all six hash failures were exactly the decimal-emitting queries),
    * so the house rule is: aggregate exactly in DECIMAL, but never let
    * a DECIMAL (or array/map/struct) reach the final projection.
    * Oracle-side mirror: `CAST(round(<expr>, 2) AS DOUBLE)`.
    */
  def money(c: Column): Column = round(c, 2).cast("double")

  /** Timestamp → 'yyyy-MM-dd' string (date-grain output). */
  def dstr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Timestamp → 'yyyy-MM-dd HH:mm:ss' string (second-grain output). */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Write-once content-checked fixture file, atomically. The fixture
    * paths are fixed so the driver's DuckDB pass reads the identical
    * bytes, which means another JVM (a concurrent sbt run, the driver)
    * can be reading while we write — so never write in place: stage to
    * a temp file in the same directory and ATOMIC_MOVE it over, so a
    * reader observes either the old or the new content, never a
    * partial file.
    */
  def ensureFile(path: String, content: String): String = {
    val p = java.nio.file.Paths.get(path)
    val current =
      if (java.nio.file.Files.exists(p))
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      else ""
    if (current != content) {
      val tmp = java.nio.file.Files.createTempFile(
        p.getParent, "." + p.getFileName.toString, ".tmp")
      java.nio.file.Files.write(tmp, content.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    path
  }
}
