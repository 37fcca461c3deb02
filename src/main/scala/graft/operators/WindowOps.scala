package graft.operators

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.5 Window functions. The reference implements latest-revision-wins
  * and top-k imperatively [R: genesapi/storage.py — UNVERIFIED]; the
  * engine expresses them as ranked/framed windows: one shuffle on the
  * partition key, in-partition sort only — the scalable shape.
  *
  * Determinism rules:
  *   - every window ORDER BY ends in a unique tiebreak column, so
  *     row_number/ntile/lag are well-defined;
  *   - event-time ordering uses second-truncated ts + event_id — the
  *     parquet stores ns, Spark truncates to µs, DuckDB keeps ns, so
  *     ordering on raw ts could disagree between engines on sub-second
  *     neighbors; second-grain + unique id is representation-free;
  *   - running/framed SUMs aggregate DECIMAL (exact, association-free)
  *     and emit rounded DOUBLE (T.money).
  */
object WindowOps {
  type Q = (SparkSession, String) => DataFrame

  // Second-truncated event time: identical in both engines (§7.5).
  private def tsec = date_trunc("second", col("ts"))

  val queries: Map[String, Q] = Map(
    // Equal-depth bucketing (quartiles within each priority class) —
    // ntile's definition (first buckets take the remainder) is
    // identical in DuckDB; the unique tiebreak makes assignment total.
    "win_ntile" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(asc("o_totalprice"), asc("o_orderkey"))
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast("int").as("quartile"))
        .orderBy("o_orderkey")
    }),

    // Ranking family. rank/dense_rank are tie-stable under any tie
    // order; row_number gets a unique tiebreak.
    "win_rank" -> ((s, d) => {
      val byPrice = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"))
      val unique = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      T.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          rank().over(byPrice).cast("long").as("rnk"),
          dense_rank().over(byPrice).cast("long").as("drnk"),
          row_number().over(unique).cast("long").as("rn"))
        .orderBy("o_custkey", "rn")
    }),

    // Running aggregate, row frame pinned to a unique order. The
    // running sum rides a plain-LONG cents buffer (r18 — AggOps.
    // agg_group's scaled-long rationale, per-frame form): the
    // DECIMAL(28,4) window buffer paid a BigDecimal round-trip per
    // row; a per-customer lifetime total in cents sits ~6 orders of
    // magnitude under 2^63 at any sane corpus. Exact, then descaled
    // at the emit.
    "win_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          T.dstr(col("o_orderdate")).as("order_date"),
          T.moneyLong(
            sum(T.scaledLong(col("o_totalprice"), 2, "o_totalprice")).over(w),
            2).as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // lag/lead analytics over event time.
    "win_lag" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(tsec.asc, col("event_id").asc)
      T.events(s, d)
        .select(col("user_id"), col("event_id"), T.tstr(col("ts")).as("event_ts"),
          round(col("value") - lag(col("value"), 1).over(w), 6).as("delta_prev"),
          round(lead(col("value"), 1).over(w) - col("value"), 6).as("delta_next"))
        .orderBy("user_id", "event_id")
    }),

    // RANGE frame over integer epoch seconds: 1-day trailing sum per
    // user. Integer ordering keys → identical frame membership in both
    // engines (DuckDB's epoch() is fractional, floored in the oracle).
    "win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("epoch_s"))
        .rangeBetween(-86400, 0)
      T.events(s, d)
        .withColumn("epoch_s", unix_timestamp(col("ts")))
        .select(col("user_id"), col("event_id"),
          col("epoch_s"),
          // Long cents in the frame buffer (r18 — win_running's note).
          T.moneyLong(
            sum(T.scaledLong(col("value"), 4, "value")).over(w), 4)
            .as("trailing_1d"))
        .orderBy("user_id", "event_id")
    }),

    // Distribution family; ntile depends on row order → unique order.
    "win_dist" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(asc("o_totalprice"), asc("o_orderkey"))
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("o_orderkey")
    }),

    // BATCH sessionization — the lag + running-sum idiom: a session
    // starts at the first event or after a >30 min gap; the session id
    // is the running count of starts. Two windows on the SAME
    // (user, time, id) ordering → one shuffle, both sorts reuse it.
    // stream_session is the streaming-native form of this key; the
    // batch form is what a backfill over stored events runs.
    "win_session" -> ((s, d) => {
      val ord = Seq(tsec.asc, col("event_id").asc)
      val wOrd = Window.partitionBy("user_id").orderBy(ord: _*)
      val wRun = Window.partitionBy("user_id").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val es = unix_timestamp(tsec)
      T.events(s, d)
        .withColumn("ns", when(lag(es, 1).over(wOrd).isNull ||
          es - lag(es, 1).over(wOrd) > 1800, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("ns")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          T.tstr(min(tsec)).as("start_ts"),
          T.tstr(max(tsec)).as("end_ts"))
        .orderBy("user_id", "session_id")
    }),

    // Gaps-and-islands (r8): maximal runs of CONSECUTIVE active days
    // per user — retention streaks, sensor-uptime spans, contiguous
    // coverage audit. The classic trick: within a user, day −
    // row_number() is CONSTANT exactly while days are consecutive, so
    // that difference IS the island id — pure integer math, no
    // iteration, no self-join. Two shuffles total at any scale: the
    // (user, day) distinct agg, then the user-partitioned window (the
    // island groupBy reuses the window's user partitioning clustered
    // one level finer — hashpartitioning(user, grp) — Spark re-shuffles
    // subtotal-sized island rows, not events).
    "win_islands" -> ((s, d) =>
      islands(T.events(s, d)
        .groupBy(col("user_id"), to_date(tsec).as("day")).agg(count(lit(1)))
        .select(col("user_id"),
          datediff(col("day"), lit("1970-01-01").cast("date"))
            .cast("long").as("idx")))
        .select(col("user_id"),
          T.dstr(expr("date_add(date '1970-01-01', cast(start_idx as int))"))
            .as("streak_start"),
          T.dstr(expr("date_add(date '1970-01-01', cast(end_idx as int))"))
            .as("streak_end"),
          col("len").as("len_days"))
        .orderBy("user_id", "streak_start")),

    // Ordered conversion funnel (r8): how far does each user get
    // through view → click → purchase, with ORDER enforced (a click
    // before the first view doesn't count — the funnel is a sequence,
    // not a set; that's what separates this from three filters) and a
    // per-step conversion window (1 day — without one, any long-lived
    // user eventually completes and the funnel degenerates; with it
    // the sf fixture splits 90/35/25 across stages). The sequential
    // dependency chains through window passes: t1 = first view, t2 =
    // first click in (t1, t1+1d], t3 = first purchase in (t2, t2+1d]
    // — each min(when) references the previous pass's column. All
    // three windows and the per-user collapse share one user_id
    // partitioning: ONE event-sized shuffle at any scale, then a
    // stage-count agg over user-sized rows. Null comparisons do the
    // stage gating for free (es > null → null → min skips it).
    "win_funnel" -> ((s, d) =>
      funnelTimes(
        T.events(s, d).select(col("user_id"), col("event_type"),
          unix_timestamp(tsec).as("es")),
        Seq("view", "click", "purchase"), windowSec = 86400L)
        .select(
          when(col("t3").isNotNull, 3L).when(col("t2").isNotNull, 2L)
            .when(col("t1").isNotNull, 1L).otherwise(0L).as("stage"),
          (col("t3") - col("t1")).as("secs"))
        .groupBy("stage")
        .agg(count(lit(1)).as("n_users"),
          round(avg(col("secs")), 2).as("avg_secs_view_to_purchase"))
        .orderBy("stage")),

    // Cohort retention (r8): the product-analytics triangle — users
    // bucketed by their FIRST active week (the cohort), counted at
    // each later week they return. Week index is pure integer math
    // (days since the Monday 1970-01-05, `div 7`) so both engines
    // bucket identically with no locale/week-start semantics in play.
    // Shape mirrors win_islands: a (user, week) distinct agg, then a
    // user-partitioned window for the per-user min — two shuffles at
    // any scale, and the final (cohort, offset) agg runs over rows
    // already unique per (user, week), so a plain count IS the
    // distinct-user count (no count-distinct shuffle).
    "win_retention" -> ((s, d) =>
      retentionTriangle(T.events(s, d)
        .groupBy(col("user_id"),
          expr("datediff(to_date(date_trunc('second', ts)), " +
            "date '1970-01-05') div 7").cast("long").as("week"))
        .agg(count(lit(1))).select("user_id", "week"))
        .orderBy("cohort_week", "week_offset")),

    // first/last/nth over the FULL partition frame (default frame stops
    // at currentRow, which silently breaks last_value).
    "win_firstlast" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(tsec.asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.events(s, d)
        .select(col("user_id"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type"),
          nth_value(col("event_type"), 2).over(w).as("second_type"))
        .distinct()
        .orderBy("user_id")
    }),

    // Event-sequence pattern matching (r9) — the MATCH_RECOGNIZE
    // shape: encode each user's ordered event history as a compact
    // symbol string (one char per event), then count regex motifs.
    // The regex IS the pattern automaton: `v[^e]*?p` = a view that
    // converts to a purchase with no error between (lazy `*?` keeps
    // matches non-overlapping-minimal — both engines scan
    // leftmost-non-overlapping); `e+` = error bursts (a run counts
    // once, however long). Sequence-per-entity is bounded by that
    // entity's event count — at 100 TB sessionize first (win_session)
    // so the collected string is session-bounded, the same
    // contract as agg_collect; the regex scan itself is narrow
    // per-row column work after ONE user_id shuffle.
    "win_pattern" -> ((s, d) => {
      val seqs = T.events(s, d)
        .groupBy("user_id")
        .agg(array_join(transform(
          sort_array(collect_list(struct(col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("c")))),
          x => x.getField("c")), "").as("seq"))
      seqs.select(col("user_id"),
          length(col("seq")).cast("long").as("n_events"),
          size(regexp_extract_all(col("seq"), lit("v[^e]*?p"), lit(0)))
            .cast("long").as("n_conversions"),
          size(regexp_extract_all(col("seq"), lit("e+"), lit(0)))
            .cast("long").as("n_error_bursts"),
          substring(col("seq"), 1, 5).as("head5"))
        .orderBy("user_id")
    }),

    // Markov transition matrix (r13): which event follows which, and
    // how fast — counts and mean gap per (from, to) pair of
    // CONSECUTIVE events within a user's (ts, event_id)-ordered
    // stream. The empirical transition matrix behind session-flow
    // dashboards and the sanity check before any sequence model; the
    // mean gap separates "click→purchase in seconds" from
    // "signup→purchase in days". One user-window lag pass + one
    // (from, to) aggregate; the gap sum rides exact DECIMAL
    // microseconds (BIGINT sums would be HUGEINT in the oracle, and
    // at 100 TB a µs sum genuinely outgrows int64), and the mean is
    // one division of their double images.
    "win_transitions" -> ((s, d) =>
      transitionMatrix(T.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type")))
        .orderBy("from_type", "to_type"))
  )

  /** Empirical transition matrix over per-entity event streams
    * `(user_id, event_id, ts, event_type)`: for every ordered pair of
    * consecutive events within a user (consecutive in the
    * (ts, event_id) total order), one output row
    * (from_type, to_type, n, avg_gap_s) — the transition count and
    * the mean inter-event gap in seconds, rounded to 6. One window
    * shuffle on the entity (lag of type and of the second-truncated
    * epoch — the house (tsec, event_id) total order that sidesteps
    * the fixture's sub-second dtype drift), one aggregate on the
    * pair; gap sums are exact DECIMAL(19,0) seconds (a BIGINT sum
    * would be HUGEINT in the oracle, and at 100 TB a gap sum
    * genuinely outgrows int64), and the mean is one division of the
    * double images — correctly rounded, cross-engine bit-equal.
    * First events per user have no predecessor and contribute
    * nothing.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(tsec.asc, col("event_id").asc)
    val es = unix_timestamp(tsec)
    events
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap_s", es - lag(es, 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("gap_s").cast(
          org.apache.spark.sql.types.DecimalType(19, 0))).as("g"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("g").cast("double") / col("n").cast("double"), 6)
          .as("avg_gap_s"))
  }

  /** Gaps-and-islands over DISTINCT `(user_id, idx)` activity rows:
    * maximal runs of CONSECUTIVE integer indices per entity, via the
    * `idx − row_number()` constant-while-consecutive trick — island id
    * from pure integer math, no iteration or self-join; one entity
    * shuffle (the island groupBy reuses the window's clustering one
    * level finer). Returns (user_id, start_idx, end_idx, len).
    * ≡-to-reference spec'd in PropertySpec.
    */
  def islands(activity: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("idx").asc)
    activity
      .withColumn("grp", col("idx") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(min("idx").as("start_idx"), max("idx").as("end_idx"),
        count(lit(1)).as("len"))
      .drop("grp")
  }

  /** Cohort retention triangle over DISTINCT `(user_id, week)`
    * activity rows: users bucketed by their first active week (the
    * cohort), counted at each later week-offset they return. Input
    * must be unique per (user, week) — then a plain count IS the
    * distinct-user count (no count-distinct shuffle). One user window
    * + one (cohort, offset) aggregate. ≡-to-reference spec'd in
    * PropertySpec.
    */
  def retentionTriangle(activity: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    activity
      .withColumn("cohort", min(col("week")).over(w))
      .groupBy(col("cohort").as("cohort_week"),
        (col("week") - col("cohort")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered funnel stage times over `(user_id, event_type, es)`: one
    * row per user with `t1..tN`, where `t1` = first step-1 event and
    * `t_k` = first step-k event STRICTLY after `t_{k-1}` and within
    * `windowSec` of it (order AND recency enforced — the funnel is a
    * sequence, not a set; a user stalls at the last non-null stage).
    * All N window passes + the collapse share ONE user_id shuffle;
    * null comparisons gate later stages for free (`es > null` → null →
    * min skips). ≡-to-reference-fold spec'd in PropertySpec.
    */
  def funnelTimes(events: DataFrame, steps: Seq[String],
      windowSec: Long): DataFrame = {
    require(steps.nonEmpty)
    val w = Window.partitionBy("user_id")
    val withT = steps.zipWithIndex.foldLeft(events) { case (df, (st, i)) =>
      val cond =
        if (i == 0) col("event_type") === st
        else col("event_type") === st &&
          col("es") > col(s"t$i") && col("es") <= col(s"t$i") + windowSec
      df.withColumn(s"t${i + 1}", min(when(cond, col("es"))).over(w))
    }
    val aggs = steps.indices.map(i => min(s"t${i + 1}").as(s"t${i + 1}"))
    withT.groupBy("user_id").agg(aggs.head, aggs.tail: _*)
  }

  val oracle: Map[String, String] = Map(
    "win_ntile" ->
      """SELECT o_orderkey, o_orderpriority,
        |  ntile(4) OVER (PARTITION BY o_orderpriority
        |                 ORDER BY o_totalprice, o_orderkey) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "win_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
        |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,
    "win_running" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
        |    AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_lag" ->
      """SELECT user_id, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
        |  round(value - lag(value, 1) OVER w, 6) AS delta_prev,
        |  round(lead(value, 1) OVER w - value, 6) AS delta_next
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY date_trunc('second', ts) ASC, event_id ASC)
        |ORDER BY user_id, event_id""".stripMargin,
    "win_range_frame" ->
      """SELECT user_id, event_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,4))) OVER (
        |    PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |    RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
        |    AS trailing_1d
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "win_dist" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice ASC, o_orderkey ASC)
        |ORDER BY o_orderkey""".stripMargin,
    // DuckDB sum(int) is HUGEINT — cast the running session id back to
    // BIGINT so the schema matches Spark's long.
    // Same day − row_number() island id; datediff pins both engines
    // to integer day arithmetic.
    "win_islands" ->
      """WITH d AS (
        |  SELECT user_id, CAST(date_trunc('second', ts) AS DATE) AS day
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, day,
        |    datediff('day', DATE '1970-01-01', day)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM d)
        |SELECT user_id,
        |       strftime(min(day), '%Y-%m-%d') AS streak_start,
        |       strftime(max(day), '%Y-%m-%d') AS streak_end,
        |       count(*) AS len_days
        |FROM r GROUP BY user_id, grp
        |ORDER BY user_id, streak_start""".stripMargin,
    // Same chained window-min funnel; avg(BIGINT) is DOUBLE in both
    // engines, secs is only ever non-null at stage 3.
    "win_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS es
        |  FROM events),
        |w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN es END)
        |         OVER (PARTITION BY user_id) AS t1 FROM e),
        |w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND es > t1
        |                          AND es <= t1 + 86400 THEN es END)
        |         OVER (PARTITION BY user_id) AS t2 FROM w1),
        |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND es > t2
        |                          AND es <= t2 + 86400 THEN es END)
        |         OVER (PARTITION BY user_id) AS t3 FROM w2),
        |u AS (SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
        |      FROM w3 GROUP BY 1),
        |st AS (SELECT user_id,
        |         CAST(CASE WHEN t3 IS NOT NULL THEN 3
        |                   WHEN t2 IS NOT NULL THEN 2
        |                   WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
        |              AS BIGINT) AS stage,
        |         t3 - t1 AS secs
        |       FROM u)
        |SELECT stage, count(*) AS n_users,
        |       CAST(round(avg(secs), 2) AS DOUBLE)
        |         AS avg_secs_view_to_purchase
        |FROM st GROUP BY stage ORDER BY stage""".stripMargin,
    // Same integer week bucketing (days since a fixed Monday, integer
    // div); rows are unique per (user, week) so count(*) = users.
    "win_retention" ->
      """WITH uw AS (
        |  SELECT user_id,
        |    datediff('day', DATE '1970-01-05',
        |      CAST(date_trunc('second', ts) AS DATE)) // 7 AS week
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT user_id, week,
        |    min(week) OVER (PARTITION BY user_id) AS cohort
        |  FROM uw)
        |SELECT cohort AS cohort_week, week - cohort AS week_offset,
        |       count(*) AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
    "win_session" ->
      """WITH e AS (
        |  SELECT user_id, event_id, date_trunc('second', ts) AS tsec,
        |    CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS es
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, tsec, es,
        |    CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800
        |         THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)),
        |g AS (
        |  SELECT user_id, tsec,
        |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY tsec, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM f)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  strftime(min(tsec), '%Y-%m-%d %H:%M:%S') AS start_ts,
        |  strftime(max(tsec), '%Y-%m-%d %H:%M:%S') AS end_ts
        |FROM g GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "win_firstlast" ->
      """SELECT DISTINCT user_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type,
        |  nth_value(event_type, 2) OVER w AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY date_trunc('second', ts) ASC, event_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id""".stripMargin,
    // string_agg(... ORDER BY) builds the identical symbol string; RE2
    // and Java regex agree on leftmost-non-overlapping lazy matching
    // for these patterns (no backtracking-only constructs).
    "win_pattern" ->
      """WITH seqs AS (
        |  SELECT user_id,
        |         string_agg(substr(event_type, 1, 1), ''
        |                    ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |       length(seq) AS n_events,
        |       len(regexp_extract_all(seq, 'v[^e]*?p')) AS n_conversions,
        |       len(regexp_extract_all(seq, 'e+')) AS n_error_bursts,
        |       substr(seq, 1, 5) AS head5
        |FROM seqs ORDER BY user_id""".stripMargin,

    // Same (tsec, event_id) lag order, same exact-DECIMAL second
    // sums, same single division on the double images.
    "win_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    date_trunc('second', ts) AS tsec,
        |    CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS es
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER w AS from_type,
        |    es - lag(es) OVER w AS gap_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)),
        |m AS (
        |  SELECT from_type, event_type AS to_type,
        |    count(*) AS n,
        |    sum(CAST(gap_s AS DECIMAL(19,0))) AS g
        |  FROM f WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       round(CAST(g AS DOUBLE) / CAST(n AS DOUBLE), 6) AS avg_gap_s
        |FROM m ORDER BY from_type, to_type""".stripMargin
  )
}
