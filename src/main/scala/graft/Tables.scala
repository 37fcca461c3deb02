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
  *   - `events.ts` is ns-precision parquet (Spark truncates to µs,
  *     DuckDB keeps ns): always second-truncate / string-format before
  *     comparing or emitting.
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
  def events(s: SparkSession, d: String)     = t(s, d, "events")
  def documents(s: SparkSession, d: String)  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = t(s, d, "embeddings")

  /** Exact-arithmetic cast for money-scale aggregation inputs. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Timestamp → 'yyyy-MM-dd' string (date-grain output). */
  def dstr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Timestamp → 'yyyy-MM-dd HH:mm:ss' string (second-grain output). */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
