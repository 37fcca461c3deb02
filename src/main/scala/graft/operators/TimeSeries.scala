package graft.operators

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization — the resample / gap-fill / forward-fill
  * family every metrics store and feature pipeline needs before
  * windowed math is meaningful: irregular event streams have NO row
  * for silent periods, so a naive moving average over observed rows
  * silently skips gaps ("last 7 rows" ≠ "last 7 days").
  *
  * Shape at 100 TB:
  *   - The dense grid is generated per entity from that entity's own
  *     [min, max] span — `explode(sequence(lo, hi, step))` off a ONE
  *     row-per-entity aggregate. Grid size is span/step × entities,
  *     bounded by calendar time, NOT by event volume — resampling a
  *     100 TB year of events to daily grain emits 365 rows per entity.
  *   - The observed side pre-aggregates to the same grain FIRST (one
  *     two-phase hash aggregate), so the gap-fill join matches two
  *     grain-sized frames on (entity, bucket) — an ordinary equi-join,
  *     broadcast-able when the grid is small, never event-volume ×
  *     grid.
  *   - Forward-fill is `last(value, ignoreNulls) OVER (PARTITION BY
  *     entity ORDER BY bucket)` — one shuffle on the entity, the same
  *     partitioning the join just produced (no extra exchange under
  *     AQE's exchange reuse), and carries observations across gap rows
  *     without a self-join.
  *
  * Epoch-second integer bucket math on both engines (the
  * [[RangeBin]] convention): day bucket = floor-epoch of
  * `date_trunc('day')`, grid step 86400 — UTC session, no DST steps.
  */
object TimeSeries {

  /** Dense per-entity grid at `stepSec` grain over each entity's own
    * observed [min, max] span of `bucketCol` (epoch seconds).
    */
  def denseGrid(perBucket: DataFrame, entityCol: String,
      bucketCol: String, stepSec: Long): DataFrame =
    perBucket.groupBy(entityCol)
      .agg(min(bucketCol).as("__lo"), max(bucketCol).as("__hi"))
      .select(col(entityCol),
        explode(sequence(col("__lo"), col("__hi"), lit(stepSec)))
          .as(bucketCol))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Daily resample per user over `events`: count + exact-decimal
    // value sum per observed day, zero-filled counts on gap days, and
    // a forward-filled "last observed daily sum" (the carried metric a
    // dashboard draws through silent days). day_v stays NULL on gap
    // days — the filled column is `carried`, so the output separates
    // "no data" from "filled".
    "ts_resample" -> ((s, d) => {
      val e = T.events(s, d).select(col("user_id"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day_s"),
        col("value"))
      val daily = e.groupBy("user_id", "day_s")
        .agg(count(lit(1)).as("n_events"),
          T.money(sum(T.dec(col("value")))).as("day_v"))
      val w = Window.partitionBy("user_id").orderBy("day_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      denseGrid(daily, "user_id", "day_s", 86400L)
        .join(daily, Seq("user_id", "day_s"), "left")
        .select(col("user_id"), col("day_s"),
          date_format(timestamp_seconds(col("day_s")), "yyyy-MM-dd")
            .as("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          col("day_v"),
          last(col("day_v"), ignoreNulls = true).over(w).as("carried"))
        .orderBy("user_id", "day_s")
    }),

    // Linear interpolation through gaps (r8): ts_resample's carried
    // value draws a STEP through silent days; sensors, prices, and
    // rate metrics want the straight line between the flanking
    // observations instead. Same grid + join; then one backward
    // (last-observed value AND its day) and one forward (next-observed)
    // ignore-nulls window — both on the user_id partitioning the join
    // just produced, so still one event-sized shuffle end-to-end.
    // Every gap row sits strictly BETWEEN observations (the grid spans
    // each user's own [min, max]), so both flanks always exist and
    // ns > ps — no divide-by-zero edge. interp_v is emitted UNROUNDED:
    // both engines evaluate the identical IEEE expression tree on
    // identical inputs, so the doubles are bit-equal; rounding could
    // only introduce tie-breaking divergence, not remove it.
    "ts_interp" -> ((s, d) => {
      val e = T.events(s, d).select(col("user_id"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day_s"),
        col("value"))
      val daily = e.groupBy("user_id", "day_s")
        .agg(T.money(sum(T.dec(col("value")))).as("day_v"))
      val back = Window.partitionBy("user_id").orderBy("day_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = Window.partitionBy("user_id").orderBy("day_s")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsDay = when(col("day_v").isNotNull, col("day_s"))
      denseGrid(daily, "user_id", "day_s", 86400L)
        .join(daily, Seq("user_id", "day_s"), "left")
        .withColumn("pv", last(col("day_v"), ignoreNulls = true).over(back))
        .withColumn("ps", last(obsDay, ignoreNulls = true).over(back))
        .withColumn("nv", first(col("day_v"), ignoreNulls = true).over(fwd))
        .withColumn("ns", first(obsDay, ignoreNulls = true).over(fwd))
        .select(col("user_id"), col("day_s"),
          date_format(timestamp_seconds(col("day_s")), "yyyy-MM-dd")
            .as("day"),
          col("day_v"),
          when(col("day_v").isNotNull, col("day_v"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((col("day_s") - col("ps")).cast("double") /
                (col("ns") - col("ps")).cast("double")))
            .as("interp_v"))
        .orderBy("user_id", "day_s")
    })
  )

  val oracle: Map[String, String] = Map(
    // make_timestamp(µs) keeps the rendered day tz-naive (DuckDB's
    // to_timestamp returns TIMESTAMPTZ, whose strftime would shift
    // with the host tz); IGNORE NULLS mirrors Spark's last(_, true).
    "ts_resample" ->
      """WITH e AS (
        |  SELECT user_id,
        |         CAST(floor(extract(epoch FROM date_trunc('day', ts)))
        |              AS BIGINT) AS day_s,
        |         value
        |  FROM events),
        |daily AS (
        |  SELECT user_id, day_s, count(*) AS n_events,
        |         CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2)
        |              AS DOUBLE) AS day_v
        |  FROM e GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id,
        |         unnest(generate_series(min(day_s), max(day_s), 86400))
        |           AS day_s
        |  FROM daily GROUP BY user_id)
        |SELECT g.user_id, g.day_s,
        |       strftime(make_timestamp(g.day_s * 1000000), '%Y-%m-%d')
        |         AS day,
        |       coalesce(d.n_events, 0) AS n_events,
        |       d.day_v,
        |       last_value(d.day_v IGNORE NULLS)
        |         OVER (PARTITION BY g.user_id ORDER BY g.day_s
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS carried
        |FROM grid g LEFT JOIN daily d
        |  ON g.user_id = d.user_id AND g.day_s = d.day_s
        |ORDER BY 1, 2""".stripMargin,

    // Same flanking-observation windows; the CASE guard keeps the
    // division unevaluated on observed rows in both engines.
    "ts_interp" ->
      """WITH e AS (
        |  SELECT user_id,
        |         CAST(floor(extract(epoch FROM date_trunc('day', ts)))
        |              AS BIGINT) AS day_s,
        |         value
        |  FROM events),
        |daily AS (
        |  SELECT user_id, day_s,
        |         CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2)
        |              AS DOUBLE) AS day_v
        |  FROM e GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id,
        |         unnest(generate_series(min(day_s), max(day_s), 86400))
        |           AS day_s
        |  FROM daily GROUP BY user_id),
        |j AS (
        |  SELECT g.user_id, g.day_s, d.day_v
        |  FROM grid g LEFT JOIN daily d
        |    ON g.user_id = d.user_id AND g.day_s = d.day_s),
        |f AS (
        |  SELECT *,
        |    last_value(day_v IGNORE NULLS) OVER wb AS pv,
        |    last_value(CASE WHEN day_v IS NOT NULL THEN day_s END
        |               IGNORE NULLS) OVER wb AS ps,
        |    first_value(day_v IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN day_v IS NOT NULL THEN day_s END
        |                IGNORE NULLS) OVER wf AS ns
        |  FROM j
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY day_s
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY user_id ORDER BY day_s
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day_s,
        |       strftime(make_timestamp(day_s * 1000000), '%Y-%m-%d') AS day,
        |       day_v,
        |       CASE WHEN day_v IS NOT NULL THEN day_v
        |            ELSE pv + (nv - pv) *
        |                 (CAST(day_s - ps AS DOUBLE) /
        |                  CAST(ns - ps AS DOUBLE)) END AS interp_v
        |FROM f ORDER BY 1, 2""".stripMargin
  )
}
