package graft.operators

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binned pure-range join — §2.4's missing shape: a join whose ONLY
  * predicate is a range containment (`point BETWEEN lo AND hi`), no
  * equi key at all. Catalyst compiles that to BroadcastNestedLoopJoin
  * (or CartesianProduct when neither side broadcasts) — per-row × per-
  * interval work that dies the moment the interval side outgrows one
  * executor's memory. The classic fix, used by every warehouse's
  * range-join optimization: quantize the domain into fixed-width bins,
  * replicate each interval to every bin it overlaps, map each point to
  * its single home bin, and equi-join on the bin with the original
  * containment as a residual filter.
  *
  * Properties that make this the 100 TB shape:
  *   - The join is a plain equi-join on `__bin` — hash-partitionable,
  *     AQE-planable, broadcast-able when the exploded interval side is
  *     small, sort-merge-able when it isn't. Never nested-loop (the
  *     engine-wide PlanSpec sweep enforces this for the key).
  *   - NO duplicate pairs by construction: a point lives in exactly
  *     one bin, so a (point, interval) pair can only meet there — no
  *     post-join distinct (which would be a second shuffle).
  *   - Replication factor = `span/binWidth + 1` per interval. The
  *     knob trades shuffle volume against per-bin fan-in exactly like
  *     a salted join's `salt`; pick `binWidth` ≈ the typical interval
  *     span so most intervals copy to ≤ 2 bins.
  *   - Degenerate intervals (`lo > hi`) self-eliminate: `sequence`
  *     would emit descending bins, but the residual containment can
  *     never hold, so no row survives.
  *
  * Skew note: a hot bin (many intervals overlapping one bin, e.g. a
  * flash-sale minute) is an ordinary hot join key afterwards — AQE
  * skew-join splitting or [[Skew.saltedJoin]] composes on top, which
  * is the point of reducing the problem to an equi-join.
  */
object RangeBin {

  /** Join `points` to `intervals` on `lo <= point <= hi` via bin
    * quantization. All three columns must be of one numeric/integral
    * type; `binWidth > 0` is in the same unit. Returns the matched
    * pairs with both sides' columns (the internal `__bin` dropped).
    */
  def binnedRangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "input already has a __bin column")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth),
                       floor(col(hiCol) / binWidth))))
    p.join(i, p("__bin") === i("__bin") &&
        p(pointCol) >= i(loCol) && p(pointCol) <= i(hiCol))
      .drop(p("__bin")).drop(i("__bin"))
  }

  /** Keyless interval×interval OVERLAP join (`aLo <= bHi && bLo <=
    * aHi`) via the same bin quantization — the second pure-range shape
    * ([[binnedRangeJoin]] covers point∈interval). BOTH sides replicate
    * to every bin they overlap, so a matching pair now meets in EVERY
    * shared bin; the dedup rule that keeps the join distinct-free is
    * the standard one: count the pair only in the bin that contains
    * `max(aLo, bLo)` — two overlapping intervals both cover the later
    * start, so exactly one shared bin qualifies, by construction.
    * The predicate is column math in the join condition (codegen'd),
    * not a post-join `distinct` (which would be a second shuffle over
    * the matched-pair volume).
    *
    * Replication factor per side = `span/binWidth + 1`; pick
    * `binWidth` ≈ the typical interval span, same knob as
    * [[binnedRangeJoin]]. Inputs' column sets must be disjoint.
    */
  def binnedIntervalJoin(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!left.columns.contains("__bin") &&
      !right.columns.contains("__bin"),
      "input already has a __bin column")
    val l = left.withColumn("__bin",
      explode(sequence(floor(col(lLo) / binWidth),
                       floor(col(lHi) / binWidth))))
    val r = right.withColumn("__bin",
      explode(sequence(floor(col(rLo) / binWidth),
                       floor(col(rHi) / binWidth))))
    l.join(r, l("__bin") === r("__bin") &&
        l(lLo) <= r(rHi) && r(rLo) <= l(lHi) &&
        l("__bin") === floor(greatest(l(lLo), r(rLo)) / binWidth))
      .drop(l("__bin")).drop(r("__bin"))
  }

  /** Incident-window attribution over `events`: every event that falls
    * inside the 10-minute window opened by any high-value error event
    * (value ≥ 250, ~0.1% of rows) — across ALL users, so there is
    * genuinely no equi key. Epoch-second integer math on both engines:
    * Spark's `unix_seconds` floor-divides the internal µs long; the
    * oracle floors DuckDB's double `epoch` (events carry no sub-µs
    * digits, so the nearest-double error ~1e-7 s can't cross a second
    * boundary ≥ 3 µs away).
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_range_bin" -> ((s, d) => {
      val e = T.events(s, d)
        .select(col("event_id"), expr("unix_seconds(ts)").as("es"),
                col("event_type"), col("value"))
      val incidents = e
        .filter(col("event_type") === "error" && col("value") >= 250)
        .select(col("event_id").as("incident_id"), col("es").as("lo"),
                (col("es") + 600L).as("hi"))
      binnedRangeJoin(e.select("event_id", "es"), "es",
          incidents, "lo", "hi", binWidth = 600L)
        .select("incident_id", "event_id")
        .orderBy("incident_id", "event_id")
    }),

    // Keyless interval×interval overlap: error-alert windows (30 min
    // after any error with value ≥ 100) against signup-activity
    // windows (±15 min around any signup with value ≥ 100), across
    // ALL users — "which alerts coincided with signup activity",
    // genuinely no equi key. 86 pairs at sf0.01. Same epoch-second
    // integer math as join_range_bin.
    "join_interval_bin" -> ((s, d) => {
      val e = T.events(s, d)
        .select(col("event_id"), expr("unix_seconds(ts)").as("es"),
                col("event_type"), col("value"))
      val alerts = e
        .filter(col("event_type") === "error" && col("value") >= 100)
        .select(col("event_id").as("alert_id"), col("es").as("a_lo"),
                (col("es") + 1800L).as("a_hi"))
      val signups = e
        .filter(col("event_type") === "signup" && col("value") >= 100)
        .select(col("event_id").as("signup_id"),
                (col("es") - 900L).as("s_lo"), (col("es") + 900L).as("s_hi"))
      binnedIntervalJoin(alerts, "a_lo", "a_hi",
          signups, "s_lo", "s_hi", binWidth = 1800L)
        .select("alert_id", "signup_id")
        .orderBy("alert_id", "signup_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "join_range_bin" ->
      """WITH e AS (
        |  SELECT event_id,
        |         CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS es,
        |         event_type, value
        |  FROM events),
        |i AS (
        |  SELECT event_id AS incident_id, es AS lo, es + 600 AS hi
        |  FROM e WHERE event_type = 'error' AND value >= 250)
        |SELECT i.incident_id, e.event_id
        |FROM e JOIN i ON e.es BETWEEN i.lo AND i.hi
        |ORDER BY incident_id, event_id""".stripMargin,
    "join_interval_bin" ->
      """WITH e AS (
        |  SELECT event_id,
        |         CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS es,
        |         event_type, value
        |  FROM events),
        |a AS (
        |  SELECT event_id AS alert_id, es AS a_lo, es + 1800 AS a_hi
        |  FROM e WHERE event_type = 'error' AND value >= 100),
        |s AS (
        |  SELECT event_id AS signup_id, es - 900 AS s_lo,
        |         es + 900 AS s_hi
        |  FROM e WHERE event_type = 'signup' AND value >= 100)
        |SELECT a.alert_id, s.signup_id
        |FROM a JOIN s ON a.a_lo <= s.s_hi AND s.s_lo <= a.a_hi
        |ORDER BY alert_id, signup_id""".stripMargin
  )
}
