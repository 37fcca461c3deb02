package graft.operators

import graft.T
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** §2.1 Z-order (Morton) layout — multi-dimensional data clustering for
  * min/max pruning, the write-side complement to [[graft.sources.Sinks
  * .writeSorted]]. No reference analogue; this is the layout weapon a
  * 100 TB lake table wants when queries filter on MORE THAN ONE column:
  * a single-column sort gives disjoint row-group ranges on that column
  * and useless full-span ranges on every other, while z-ordering
  * interleaves the bits of several columns' rank-buckets so rows close
  * in ANY dimension land close in the file order — per-file/row-group
  * min/max stay narrow on ALL interleaved dimensions at once
  * (ZOrderSpec measures exactly this on real files).
  *
  * Everything is codegen'd column math: per-column buckets are linear
  * min/max scaling against a broadcast one-row stats frame (the same
  * one-row crossJoin pattern as text_tfidf's corpus totals — constant
  * side, no data-sized shuffle), and the Morton interleave is the
  * classic magic-number bit spread (4 shift/mask steps per column, no
  * loops, no UDF). Deterministic: z-values depend only on column values
  * and the global min/max.
  *
  * At scale: bucket resolution is 8 bits/dim (256 ranks) — enough to
  * order files and row groups, coarse enough that the bucket boundaries
  * (from one tiny agg) are the only global state. Skewed columns get
  * skewed buckets under linear scaling; production systems switch the
  * bucket fn to quantile boundaries (approx_percentile literals) — same
  * interleave, different rank map.
  */
object ZOrder {
  type Q = (SparkSession, String) => DataFrame

  /** Spread the low 8 bits of `x` to the even bit positions of a
    * 16-bit value (Morton "part1by1"): 0b abcdefgh →
    * 0b 0a0b0c0d0e0f0g0h. Constant-shift form — 4 codegen'd ops.
    */
  private[operators] def part1by1(x: Column): Column = {
    val a = x.bitwiseAND(lit(255L))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x3333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x5555L))
  }

  /** 16-bit Morton code of two 8-bit bucket ids: y's bits interleave
    * above x's (z = y7 x7 y6 x6 … y0 x0).
    */
  def interleave2(xb: Column, yb: Column): Column =
    part1by1(xb).bitwiseOR(shiftleft(part1by1(yb), 1))

  /** Linear min/max rank bucket in [0, 255]. `mn`/`mx` are columns from
    * the broadcast stats row, so the whole bucket expression stays
    * inside the row's projection. The formula text is mirrored by the
    * oracle (same parenthesization → same IEEE doubles → same floor).
    */
  def bucket(c: Column, mn: Column, mx: Column): Column =
    // constant column (mx == mn): 0/0 = NaN would silently bucket as 0
    // on the Spark side and fail the cast in a DuckDB replay — make the
    // degenerate case an explicit single bucket. Non-constant inputs
    // (every oracled use) take the otherwise-branch: formula unchanged.
    when(mx === mn, lit(0L))
      .otherwise(least(floor(((c - mn) / (mx - mn)) * 256.0), lit(255L)))

  /** z-value over two numeric dims, with bucket bounds taken from a
    * one-row broadcast stats frame computed over `df` itself.
    */
  def withZValue(df: DataFrame, xCol: String, yCol: String,
      zName: String = "zval"): DataFrame = {
    val stats = df.agg(
      min(col(xCol).cast("double")).as("__mnx"),
      max(col(xCol).cast("double")).as("__mxx"),
      min(col(yCol).cast("double")).as("__mny"),
      max(col(yCol).cast("double")).as("__mxy"))
    df.crossJoin(broadcast(stats))
      .withColumn(zName, interleave2(
        bucket(col(xCol).cast("double"), col("__mnx"), col("__mxx")),
        bucket(col(yCol).cast("double"), col("__mny"), col("__mxy"))))
      .drop("__mnx", "__mxx", "__mny", "__mxy")
  }

  /** Quantile bucket boundaries for one column: the skew-proof rank
    * map. Linear min/max scaling ([[bucket]]) puts a heavy-tailed
    * column's mass into a few buckets — the z-curve then degenerates
    * toward a single-dim sort on the OTHER column. Boundaries come from
    * ONE `approx_percentile` pass (GK sketch, model-sized driver
    * literal, same class as the IVF centroids); by construction each
    * bucket holds ~1/nBuckets of the rows whatever the distribution.
    */
  private def pctExpr(c: String, nBuckets: Int): Column = {
    val ps = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    expr(s"approx_percentile(CAST($c AS DOUBLE), " +
      s"array(${ps.mkString("D,")}D), 10000)")
  }

  def quantileBounds(df: DataFrame, c: String,
      nBuckets: Int = 256): Array[Double] =
    df.agg(pctExpr(c, nBuckets)).head.getSeq[Double](0).toArray

  /** Rank bucket from precomputed quantile boundaries: the count of
    * boundaries ≤ v, folded over the literal boundary array. The fold
    * is an interpreted higher-order expression — acceptable because
    * this is the WRITE path, evaluated once per layout job, not a
    * query-time hot loop.
    */
  def bucketQuantile(c: Column, bounds: Array[Double]): Column =
    aggregate(typedlit(bounds.toSeq), lit(0),
      (acc, b) => acc + when(b <= c.cast("double"), 1).otherwise(0))
      .cast("long")

  /** z-value over two numeric dims with QUANTILE rank maps — the
    * skew-robust form of [[withZValue]].
    */
  def withZValueQuantile(df: DataFrame, xCol: String, yCol: String,
      zName: String = "zval"): DataFrame = {
    // BOTH boundary arrays from ONE aggregate — two quantileBounds
    // calls would scan the full input twice for two driver literals.
    val row = df.agg(pctExpr(xCol, 256).as("bx"), pctExpr(yCol, 256).as("by"))
      .head
    val (bx, by) = (row.getSeq[Double](0).toArray, row.getSeq[Double](1).toArray)
    df.withColumn(zName, interleave2(
      bucketQuantile(col(xCol), bx), bucketQuantile(col(yCol), by)))
  }

  /** Z-ordered parquet write: range-partition by z-value into `nFiles`
    * contiguous z-ranges, sort within each, drop the helper column.
    * Files (and row groups inside them) then carry narrow min/max on
    * BOTH dims — a filter on either one skips most of the layout.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
      nFiles: Int): Unit =
    withZValue(df, xCol, yCol, "__z")
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  val queries: Map[String, Q] = Map(
    // The z-value computation surfaced as an oracled key: Morton codes
    // for orders on (o_custkey, o_totalprice). The write path reuses
    // exactly this column (ZOrderSpec covers the file layout).
    "zorder_key" -> ((s, d) =>
      withZValue(T.orders(s, d), "o_custkey", "o_totalprice")
        .select(col("o_orderkey"), col("zval"))
        .orderBy("o_orderkey"))
  )

  /** DuckDB replay: identical bucket formula (same parenthesization —
    * IEEE doubles agree, so floor agrees) and the same magic-number
    * interleave, expanded to plain integer ops.
    */
  private def duckPart1by1(x: String): String = {
    val a = s"($x & 255)"
    val b = s"(($a | ($a << 4)) & 3855)"
    val c = s"(($b | ($b << 2)) & 13107)"
    s"(($c | ($c << 1)) & 21845)"
  }
  private def duckBucket(c: String, mn: String, mx: String): String =
    s"least(CAST(floor((($c - $mn) / ($mx - $mn)) * 256.0) AS BIGINT), 255)"

  val oracle: Map[String, String] = Map(
    "zorder_key" -> {
      val xb = duckBucket("CAST(o_custkey AS DOUBLE)", "mnx", "mxx")
      val yb = duckBucket("o_totalprice", "mny", "mxy")
      s"""WITH s AS (
        |  SELECT min(CAST(o_custkey AS DOUBLE)) AS mnx,
        |         max(CAST(o_custkey AS DOUBLE)) AS mxx,
        |         min(o_totalprice) AS mny, max(o_totalprice) AS mxy
        |  FROM orders),
        |b AS (
        |  SELECT o_orderkey, $xb AS xbk, $yb AS ybk FROM orders, s)
        |SELECT o_orderkey,
        |  (${duckPart1by1("xbk")} | (${duckPart1by1("ybk")} << 1)) AS zval
        |FROM b ORDER BY o_orderkey""".stripMargin
    }
  )
}
