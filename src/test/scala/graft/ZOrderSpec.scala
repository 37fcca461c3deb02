package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** Z-order layout (operators/ZOrder.scala): Morton-code correctness on
  * known values, and the layout claim measured on real parquet files —
  * z-ordered files carry narrow min/max on BOTH interleaved dims, while
  * a single-column sort leaves the other dim full-span in every file.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton interleave matches known codes") {
    val rows = Seq(
      (0L, 0L),    // -> 0
      (3L, 0L),    // x=0b11          -> 0b0101 = 5
      (0L, 3L),    // y=0b11 (<<1)    -> 0b1010 = 10
      (255L, 255L) // all 16 bits set -> 65535
    ).toDF("x", "y")
    val got = rows.select(ZOrder.interleave2(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 5L, 10L, 65535L), got)
  }

  test("bucket maps min->0, max->255, clamped") {
    val df = Seq(0.0, 50.0, 100.0).toDF("v")
    val got = df.select(
      ZOrder.bucket(col("v"), lit(0.0), lit(100.0)).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 128L, 255L), got)
  }

  /** Avg per-file normalized (max-min) span of `c` across the files of
    * a written dataset — 1.0 means every file spans the whole range.
    */
  private def avgFileSpan(path: String, c: String): Double = {
    val df = spark.read.parquet(path)
      .withColumn("f", input_file_name())
      .withColumn("v", col(c).cast("double"))
    val tot = df.agg(max("v") - min("v")).head.getDouble(0)
    df.groupBy("f").agg(((max("v") - min("v")) / tot).as("span"))
      .agg(avg("span")).head.getDouble(0)
  }

  test("z-ordered files are narrow on BOTH dims; single-dim sort is not") {
    val orders = T.orders(spark, sf)
    val zPath = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString + "/z"
    val lPath = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString + "/linear"
    ZOrder.zorderWrite(orders, "o_custkey", "o_totalprice", zPath, 16)
    // the single-dim strawman: same file count, sorted by o_custkey only
    orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(lPath)

    val (zx, zy) = (avgFileSpan(zPath, "o_custkey"),
      avgFileSpan(zPath, "o_totalprice"))
    val (lx, ly) = (avgFileSpan(lPath, "o_custkey"),
      avgFileSpan(lPath, "o_totalprice"))
    // linear sort: first dim tightly clustered, second dim full-span
    assert(lx < 0.3, s"linear x span $lx")
    assert(ly > 0.9, s"linear y span $ly — expected ~full range")
    // z-order: BOTH dims substantially narrower than full-span — that's
    // the min/max pruning surface a filter on either dim uses
    assert(zx < 0.6, s"zorder x span $zx")
    assert(zy < 0.6, s"zorder y span $zy")
  }

  test("bucket: constant column is one explicit bucket, not NaN fallout") {
    val df = Seq(5.0, 5.0, 5.0).toDF("v")
    val got = df.select(ZOrder.bucket(col("v"), lit(5.0), lit(5.0)).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 0L, 0L), got)
  }

  test("withZValueQuantile: one pass, 16-bit z-values, skew-balanced") {
    val n = 4096
    val df = (0 until n).map(i => (i.toLong, math.exp(i / 300.0), i.toDouble))
      .toDF("id", "skewed", "uniform")
    val z = ZOrder.withZValueQuantile(df, "skewed", "uniform")
    val vals = z.select("zval").collect().map(_.getLong(0))
    assert(vals.forall(v => v >= 0 && v <= 0xFFFFL), "z out of 16-bit range")
    // skewed dim still contributes: restricting to low z must restrict
    // BOTH dims (the degenerate linear form would leave `skewed`
    // unconstrained because all its mass buckets to 0)
    val low = z.filter(col("zval") < 0x4000L)
      .agg(max("skewed"), max("uniform")).head
    val (mx, my) = (low.getDouble(0), low.getDouble(1))
    val (fx, fy) = (math.exp((n - 1) / 300.0), (n - 1).toDouble)
    assert(mx < fx * 0.9, s"skewed dim unconstrained in low-z slice: $mx of $fx")
    assert(my < fy * 0.9, s"uniform dim unconstrained in low-z slice: $my of $fy")
  }

  test("quantile buckets stay balanced under heavy skew; linear buckets do not") {
    // exponential column: linear min/max scaling crams almost all rows
    // into bucket 0 (the max dominates the range), which would
    // degenerate the z-curve to a single-dim sort on the other column.
    val n = 8192
    val df = (0 until n).map(i => (i.toLong, math.exp(i / 400.0)))
      .toDF("id", "v")
    val linMax = df.select(ZOrder.bucket(col("v"), lit(1.0),
        lit(math.exp((n - 1) / 400.0))).as("b"))
      .groupBy("b").count().agg(max("count")).head.getLong(0)
    val bounds = ZOrder.quantileBounds(df, "v")
    val qMax = df.select(ZOrder.bucketQuantile(col("v"), bounds).as("b"))
      .groupBy("b").count().agg(max("count")).head.getLong(0)
    // perfectly balanced would be n/256 = 32 per bucket
    assert(linMax > n / 2, s"expected linear pile-up, max bucket $linMax")
    assert(qMax <= 3 * n / 256, s"quantile bucket too heavy: $qMax")
  }

  test("zorder_key matches a local morton replay") {
    val got = SparkEntry.queries("zorder_key")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val o = T.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey").cast("double"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val (mnx, mxx) = (o.map(_._2).min, o.map(_._2).max)
    val (mny, mxy) = (o.map(_._3).min, o.map(_._3).max)
    def bkt(v: Double, mn: Double, mx: Double): Long =
      math.min(math.floor(((v - mn) / (mx - mn)) * 256.0).toLong, 255L)
    def p1(x0: Long): Long = {
      val a = x0 & 255L
      val b = (a | (a << 4)) & 0x0F0FL
      val c = (b | (b << 2)) & 0x3333L
      (c | (c << 1)) & 0x5555L
    }
    o.foreach { case (k, x, y) =>
      val want = p1(bkt(x, mnx, mxx)) | (p1(bkt(y, mny, mxy)) << 1)
      assert(got(k) == want, s"order $k: got ${got(k)}, want $want")
    }
  }
}
