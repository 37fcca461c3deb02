package graft

import graft.operators.RangeBin
import org.apache.spark.sql.functions._

/** [[RangeBin.binnedRangeJoin]] semantics: exact equality with the
  * naive cross+filter form on crafted corners (boundary inclusion,
  * intervals spanning many bins, degenerate lo>hi, overlapping
  * intervals), no duplicate pairs by construction, and the plan shape
  * that is the operator's whole point — an equi-join on the bin, never
  * a nested loop.
  */
class RangeBinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: Seq[(Long, Long)],
      ivs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (pid, v) <- points
      (iid, lo, hi) <- ivs
      if v >= lo && v <= hi
    } yield (pid, iid)).toSet

  private def binned(points: Seq[(Long, Long)],
      ivs: Seq[(Long, Long, Long)], w: Long): Seq[(Long, Long)] = {
    val p = points.toDF("pid", "v")
    val i = ivs.toDF("iid", "lo", "hi")
    RangeBin.binnedRangeJoin(p, "v", i, "lo", "hi", w)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
  }

  test("matches naive cross+filter incl. boundaries and multi-bin spans") {
    // bins of width 10; interval B spans 4 bins, C is a single point
    // [30,30] on a bin edge, D is degenerate (lo > hi → empty)
    val ivs = Seq((1L, 5L, 9L), (2L, 8L, 41L), (3L, 30L, 30L),
      (4L, 50L, 40L))
    // points at interval edges (5, 9, 8, 41, 30), just outside (4, 10,
    // 42, 29, 31), mid-bin (25), and far away (99)
    val pts = Seq(5L, 9L, 8L, 41L, 30L, 4L, 10L, 42L, 29L, 31L, 25L, 99L)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val got = binned(pts, ivs, 10L)
    assert(got.toSet == naive(pts, ivs))
    assert(got.size == got.toSet.size,
      "a (point, interval) pair must meet in exactly one bin — no dups")
  }

  test("overlapping intervals each match; width choice is answer-invariant") {
    val ivs = Seq((1L, 0L, 100L), (2L, 20L, 30L), (3L, 25L, 27L))
    val pts = (0L to 110L by 5).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val want = naive(pts, ivs)
    for (w <- Seq(1L, 7L, 10L, 64L, 1000L)) {
      val got = binned(pts, ivs, w)
      assert(got.toSet == want && got.size == want.size, s"width $w")
    }
  }

  private def intervalNaive(as: Seq[(Long, Long, Long)],
      bs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (aid, alo, ahi) <- as
      (bid, blo, bhi) <- bs
      if alo <= bhi && blo <= ahi
    } yield (aid, bid)).toSet

  private def binnedIv(as: Seq[(Long, Long, Long)],
      bs: Seq[(Long, Long, Long)], w: Long): Seq[(Long, Long)] = {
    val a = as.toDF("aid", "alo", "ahi")
    val b = bs.toDF("bid", "blo", "bhi")
    RangeBin.binnedIntervalJoin(a, "alo", "ahi", b, "blo", "bhi", w)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
  }

  test("interval join matches naive incl. touch/containment; no dups; width-invariant") {
    // touch at a point (ahi == blo), full containment, identical
    // intervals, long multi-bin span vs short one, disjoint pair
    val as = Seq((1L, 0L, 10L), (2L, 5L, 100L), (3L, 20L, 20L),
      (4L, 200L, 210L))
    val bs = Seq((1L, 10L, 15L), (2L, 0L, 300L), (3L, 20L, 20L),
      (4L, 101L, 150L), (5L, 211L, 220L))
    val want = intervalNaive(as, bs)
    for (w <- Seq(1L, 7L, 10L, 64L, 1000L)) {
      val got = binnedIv(as, bs, w)
      assert(got.toSet == want, s"width $w")
      assert(got.size == want.size,
        s"width $w: a pair must meet only in max(lo)'s bin — no dups")
    }
  }

  test("driver key join_interval_bin: matches a cross+filter replay") {
    val e = T.events(spark, sf)
      .select(col("event_id"), expr("unix_seconds(ts)").as("es"),
        col("event_type"), col("value"))
    val a = e.filter(col("event_type") === "error" && col("value") >= 100)
      .select(col("event_id").as("aid"), col("es").as("alo"),
        (col("es") + 1800L).as("ahi"))
    val b = e.filter(col("event_type") === "signup" && col("value") >= 100)
      .select(col("event_id").as("bid"), (col("es") - 900L).as("blo"),
        (col("es") + 900L).as("bhi"))
    val want = a.crossJoin(b)
      .filter(col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    val got = RangeBin.queries("join_interval_bin")(spark, sf)
      .select("alert_id", "signup_id").as[(Long, Long)].collect()
    assert(got.toSet == want && got.length == want.size)
  }

  test("plan: equi-join on the bin, never nested-loop or cartesian") {
    val p = RangeBin.queries("join_range_bin")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"pure-range join must quantize to an equi-join: $p")
    assert(p.contains("__bin"), s"join key must be the bin column: $p")
  }

  test("driver key: incident attribution matches a window-free replay") {
    // replay the key's semantics directly over the sf0.001 events
    val e = T.events(spark, sf)
      .select(col("event_id"), expr("unix_seconds(ts)").as("es"),
        col("event_type"), col("value"))
    val inc = e.filter(col("event_type") === "error" && col("value") >= 250)
      .select(col("event_id").as("iid"), col("es").as("lo"))
    val want = e.select("event_id", "es").crossJoin(inc)
      .filter(col("es") >= col("lo") && col("es") <= col("lo") + 600L)
      .select("iid", "event_id")
      .as[(Long, Long)].collect().toSet
    val got = RangeBin.queries("join_range_bin")(spark, sf)
      .select("incident_id", "event_id")
      .as[(Long, Long)].collect()
    assert(got.toSet == want && got.length == want.size)
  }
}
