package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

/** [[TimeSeries]] resample semantics: the grid is dense per entity
  * (one row per step over that entity's own span — never the global
  * span), gap rows zero-fill counts but keep the value NULL, and the
  * carried column forward-fills the last observed value across gaps.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("crafted gaps: dense grid, zero-filled counts, forward-filled value") {
    // user 1 observed on days 0 and 3 (of a 0..3 span → 4 grid rows),
    // user 2 on day 10 only (1 grid row) — spans are PER USER.
    val day = 86400L
    val daily = Seq(
      (1L, 0L * day, 2L, 5.0),
      (1L, 3L * day, 1L, 9.0),
      (2L, 10L * day, 4L, 7.0))
      .toDF("user_id", "day_s", "n_events", "day_v")
    val grid = TimeSeries.denseGrid(daily, "user_id", "day_s", day)
      .join(daily, Seq("user_id", "day_s"), "left")
      .select(col("user_id"), col("day_s"),
        coalesce(col("n_events"), lit(0L)).as("n"),
        col("day_v"),
        last(col("day_v"), ignoreNulls = true).over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")
            .orderBy("day_s").rowsBetween(Long.MinValue, 0)).as("carried"))
      .orderBy("user_id", "day_s")
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(grid == Seq(
      (1L, 0L * day, 2L, Some(5.0), Some(5.0)),
      (1L, 1L * day, 0L, None, Some(5.0)),      // gap: count 0, carried 5
      (1L, 2L * day, 0L, None, Some(5.0)),
      (1L, 3L * day, 1L, Some(9.0), Some(9.0)),
      (2L, 10L * day, 4L, Some(7.0), Some(7.0))))
  }

  test("driver key ts_resample: accounting invariants over the sf events") {
    val out = SparkEntry.queries("ts_resample")(spark, sf)
    val rows = out.collect()
    val e = T.events(spark, sf)
    // total zero-filled counts reconcile with the raw event count
    assert(rows.map(_.getLong(3)).sum == e.count())
    // grid density: rows per user == span days + 1, days are dense
    val byUser = rows.groupBy(_.getLong(0))
    for ((_, rs) <- byUser) {
      val ds = rs.map(_.getLong(1)).sorted.toSeq
      assert(ds == (ds.head to ds.last by 86400L).toSeq,
        "per-user grid must be dense at day grain")
      // carried is never null after the first row (first day observed
      // by construction: the span starts at an observed bucket)
      assert(rs.forall(r => !r.isNullAt(5)))
    }
    // gap rows exist (the corpus has silent user-days) and carry NULL
    // day_v but a non-null carried value
    val gaps = rows.filter(_.getLong(3) == 0L)
    assert(gaps.nonEmpty && gaps.forall(r => r.isNullAt(4) && !r.isNullAt(5)))
  }
}
