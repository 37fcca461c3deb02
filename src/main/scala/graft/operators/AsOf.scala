package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composable as-of join — the library API behind the `join_asof` /
  * `join_asof_left` keys (reference analogue: match a fact to the
  * latest cube revision at/before its time
  * [R: genesapi/storage.py — UNVERIFIED]). Spark has no native as-of
  * join; this is the scale-correct emulation, packaged.
  *
  * Semantics (SURVEY §7.4.3, pinned): for every left row, the right
  * row with the greatest `rightTime <= leftTime` among rows sharing
  * the key; ties at equal time break to the greatest `rightTieBreak`.
  * `keepUnmatched = true` keeps left rows with no qualifying right row
  * (right columns NULL) — the LEFT form; `false` drops them (inner).
  *
  * Shape (the 100 TB argument, re-derived r15): UNION the two sides
  * into one (key, time)-tagged stream and take a running
  * `last(payload, ignoreNulls)` over a key-partitioned window — ONE
  * shuffle of |left| + |right| rows and a LINEAR per-key merge scan.
  * The previous shape (r2–r14) was the equi-join on the key with the
  * time bound as residual + a map-side-combining `max(struct(time,
  * tieBreak, payload))` — already far better than a ranked window
  * over the join output (11.9 s → 1.2 s at sf0.1, round 2), but its
  * per-key CPU is the JOIN FANOUT, |left_k|·|right_k| struct builds
  * and compares, which goes QUADRATIC on a hub key (one user with
  * 10k events × 10k orders = 100M candidate rows where the union
  * form sorts 20k). The union form's worst key costs
  * (|left_k|+|right_k|)·log — skew-robust by construction, the same
  * reason merge-based as-of beats binary-search-per-probe in every
  * columnar engine. Measured at sf0.1: join_asof 1.53 → ~0.7 s. The
  * join-agg form survives as [[asofJoinViaJoinAgg]], the reference
  * implementation the equivalence specs replay (and the better pick
  * only when the right side is tiny enough to broadcast AND the left
  * is pre-partitioned — no sort, no exchange of the left).
  *
  * Ordering inside a key: rows sort by (time, side-tag, tieBreak)
  * with right rows (tag 0) before left rows (tag 1) at equal time —
  * at-or-before is inclusive; among right rows at equal time the
  * largest `rightTieBreak` sorts last and wins, matching the old
  * max(struct) exactly. NULL right keys/times are filtered (they can
  * never match in the join form either); a NULL left time sorts
  * before every right row and correctly matches nothing.
  *
  * Contract: left and right column names must be disjoint (the output
  * carries both sides verbatim), and `rightTieBreak` should be unique
  * per (key, time) — every sane revision/order key is; with duplicate
  * (key, time, tieBreak) right rows the survivor among the duplicates
  * is unspecified (the old form compared payload bytes, equally
  * arbitrary).
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: String, keepUnmatched: Boolean = false): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, both have: " +
        overlap.mkString(", "))
    require(right.columns.contains(rightTieBreak),
      s"tie-break column $rightTieBreak not in right side")
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val rowType = right.schema
    val tbType = right.schema(rightTieBreak).dataType
    // Both times ride ONE sort column as timestamp — the same
    // coercion Spark applies to a date-vs-timestamp `<=` (dates
    // become midnight), so the union form orders exactly like the
    // join form compared. The null filter runs on the CAST value
    // (r15 advice): a non-null time that casts to NULL (an
    // unparseable string under try-cast semantics) would otherwise
    // survive, sort nulls-first ahead of the left rows, and become a
    // spurious match the join form (whose `<=` is NULL there) never
    // produced.
    val rT = col(rightTime).cast("timestamp")
    val rPart = right
      .filter(col(rightKey).isNotNull && rT.isNotNull)
      .select(Seq(
        col(rightKey).as("__k"),
        rT.as("__t"),
        lit(0).as("__tag"),
        col(rightTieBreak).as("__tb"),
        struct(rCols.map(col): _*).as("__row")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lPart = left.select(Seq(
        col(leftKey).as("__k"),
        col(leftTime).cast("timestamp").as("__t"),
        lit(1).as("__tag"),
        lit(null).cast(tbType).as("__tb"),
        lit(null).cast(rowType).as("__row")) ++ lCols.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__k")
      .orderBy(col("__t").asc_nulls_first, col("__tag"), col("__tb"))
      .rowsBetween(Long.MinValue, 0)
    val scanned = lPart.unionByName(rPart)
      .withColumn("__best", last(col("__row"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val kept =
      if (keepUnmatched) scanned else scanned.filter(col("__best").isNotNull)
    kept.select(lCols.map(col) ++
      rCols.map(c => col(s"__best.$c").as(c)): _*)
  }

  /** FORWARD as-of join (r15): for every left row, the right row with
    * the SMALLEST `rightTime >= leftTime` among rows sharing the key —
    * pandas `merge_asof(direction="forward")`, the "next event at-or-
    * after" lookup (next delivery after the order, next error after
    * the deploy). Ties at equal time break to the SMALLEST
    * `rightTieBreak` (the first in order — the natural dual of the
    * backward join's latest-revision-wins largest-tieBreak rule).
    * Same union-merge shape and cost as [[asofJoin]], scanned
    * time-DESCENDING with right rows first at equal time so
    * at-or-after is inclusive; `__tb` descending makes the running
    * `last` land on the minimum tieBreak. NULL handling mirrors
    * [[asofJoin]].
    */
  def asofJoinForward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: String, keepUnmatched: Boolean = false): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, both have: " +
        overlap.mkString(", "))
    require(right.columns.contains(rightTieBreak),
      s"tie-break column $rightTieBreak not in right side")
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val rowType = right.schema
    val tbType = right.schema(rightTieBreak).dataType
    // Null filter on the CAST time, same rationale as [[asofJoin]].
    val rT = col(rightTime).cast("timestamp")
    val rPart = right
      .filter(col(rightKey).isNotNull && rT.isNotNull)
      .select(Seq(
        col(rightKey).as("__k"),
        rT.as("__t"),
        lit(0).as("__tag"),
        col(rightTieBreak).as("__tb"),
        struct(rCols.map(col): _*).as("__row")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lPart = left.select(Seq(
        col(leftKey).as("__k"),
        col(leftTime).cast("timestamp").as("__t"),
        lit(1).as("__tag"),
        lit(null).cast(tbType).as("__tb"),
        lit(null).cast(rowType).as("__row")) ++ lCols.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__k")
      .orderBy(col("__t").desc_nulls_first, col("__tag").asc,
        col("__tb").desc)
      .rowsBetween(Long.MinValue, 0)
    val scanned = lPart.unionByName(rPart)
      .withColumn("__best", last(col("__row"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val kept =
      if (keepUnmatched) scanned else scanned.filter(col("__best").isNotNull)
    kept.select(lCols.map(col) ++
      rCols.map(c => col(s"__best.$c").as(c)): _*)
  }

  /** Join-agg reference for [[asofJoinForward]] (equivalence specs
    * only): key equi-join with `rightTime >= leftTime` residual +
    * map-side `min(struct(time, tieBreak, payload))`.
    */
  private[graft] def asofJoinForwardViaJoinAgg(left: DataFrame,
      right: DataFrame, leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: String, keepUnmatched: Boolean = false): DataFrame = {
    val payload = struct(right.columns.map(col): _*).alias("row")
    val joined = left.join(right,
      col(leftKey) === col(rightKey) && col(rightTime) >= col(leftTime),
      if (keepUnmatched) "left" else "inner")
    joined
      .groupBy(left.columns.map(col): _*)
      .agg(min(struct(col(rightTime), col(rightTieBreak), payload))
        .as("__best"))
      .select(left.columns.map(col) ++
        right.columns.map(c => col(s"__best.row.$c").as(c)): _*)
  }

  /** The r2–r14 join-then-aggregate as-of — kept as the REFERENCE
    * implementation for the equivalence specs and as the documented
    * alternative shape: equi-join on the key with the time bound as
    * residual, then a map-side-combining `max(struct(time, tieBreak,
    * payload))` per left row. Prefer [[asofJoin]]: this form's per-key
    * CPU is the join fanout |left_k|·|right_k| (quadratic on hub
    * keys); it wins only when the right side broadcasts AND the left
    * side's existing partitioning must be preserved (no sort/exchange
    * of the left). The group-by key is ALL left columns, so
    * byte-identical duplicate left rows collapse here — the window
    * form keeps them.
    */
  private[graft] def asofJoinViaJoinAgg(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: String, keepUnmatched: Boolean = false): DataFrame = {
    val payload = struct(right.columns.map(col): _*).alias("row")
    val joined = left.join(right,
      col(leftKey) === col(rightKey) && col(rightTime) <= col(leftTime),
      if (keepUnmatched) "left" else "inner")
    joined
      .groupBy(left.columns.map(col): _*)
      .agg(max(struct(col(rightTime), col(rightTieBreak), payload))
        .as("__best"))
      .select(left.columns.map(col) ++
        right.columns.map(c => col(s"__best.row.$c").as(c)): _*)
  }

  /** Nearest-neighbor-in-time join — the BIDIRECTIONAL as-of: for
    * every left row, the right row minimizing `|rightTime − leftTime|`
    * among rows sharing the key, either direction ("closest reading
    * to the incident", "order nearest the session"). Pinned ties:
    * equidistant candidates break to the EARLIER right time, then the
    * smallest `rightTieBreak` — min(struct) lexicographic, total.
    *
    * Same shape as [[asofJoin]] and the same 100 TB argument: equi-
    * join on the key, then a map-side-combining `min(struct(dist,
    * time, tieBreak, payload))` — never a ranked window over the join
    * output. Times order and measure at MICROSECOND precision (r15
    * advice: the old epoch-seconds cast truncated sub-second
    * timestamps BEFORE ordering, so a tie that was not a true tie
    * fell to the tieBreak): both sides go through
    * `unix_micros(cast(t as timestamp))` — exact integer math, full
    * timestamp resolution, and epoch-seconds longs / dates coerce the
    * same way they did before (×1e6 is order-preserving).
    */
  def nearestJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: String, keepUnmatched: Boolean = false): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, both have: " +
        overlap.mkString(", "))
    require(right.columns.contains(rightTieBreak),
      s"tie-break column $rightTieBreak not in right side")
    // r15: same union-merge rewrite as [[asofJoin]], run as TWO window
    // scans over ONE union — a backward pass (latest at-or-before) and
    // a forward pass (earliest strictly-after), then a column-math
    // pick of the closer candidate. One key exchange, two linear
    // per-key sort scans — the join-fanout form (kept below as
    // [[nearestJoinViaJoinAgg]]) paid |L_k|·|R_k| per key. Tie rules
    // preserved exactly: equidistant candidates break to the EARLIER
    // time — always the backward one, since back.t ≤ T < fwd.t — and
    // same-time candidates to the SMALLEST tieBreak, which is why
    // both scans order `__tb` DESCENDING (the running `last` then
    // lands on the minimum). The forward scan runs time-descending
    // with LEFT rows first at equal time, so an exactly-at-T right
    // row is credited only to the backward pass (distance 0), never
    // double-counted. NULL right keys/times are filtered (a row with
    // no time is never "nearest"); a NULL left time matches nothing.
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val rowType = right.schema
    val tbType = right.schema(rightTieBreak).dataType
    // Null filter on the CAST time (r15 advice, same as [[asofJoin]]).
    val rT = unix_micros(col(rightTime).cast("timestamp"))
    val rPart = right
      .filter(col(rightKey).isNotNull && rT.isNotNull)
      .select(Seq(
        col(rightKey).as("__k"),
        rT.as("__t"),
        lit(0).as("__tag"),
        col(rightTieBreak).as("__tb"),
        struct(rCols.map(col): _*).as("__row")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lPart = left.select(Seq(
        col(leftKey).as("__k"),
        unix_micros(col(leftTime).cast("timestamp")).as("__t"),
        lit(1).as("__tag"),
        lit(null).cast(tbType).as("__tb"),
        lit(null).cast(rowType).as("__row")) ++ lCols.map(col): _*)
    val win = org.apache.spark.sql.expressions.Window.partitionBy("__k")
    val wBack = win
      .orderBy(col("__t").asc_nulls_first, col("__tag").asc, col("__tb").desc)
      .rowsBetween(Long.MinValue, 0)
    val wFwd = win
      .orderBy(col("__t").desc_nulls_first, col("__tag").desc, col("__tb").desc)
      .rowsBetween(Long.MinValue, 0)
    // Right-only candidate (NULL on left rows, so ignoreNulls skips
    // them); carries the pieces the final pick compares.
    val cand = when(col("__tag") === 0,
      struct(col("__t").as("t"), col("__row").as("row")))
    val scanned = lPart.unionByName(rPart)
      .withColumn("__b", last(cand, ignoreNulls = true).over(wBack))
      .withColumn("__f", last(cand, ignoreNulls = true).over(wFwd))
      .filter(col("__tag") === 1)
    val dBack = col("__t") - col("__b.t")
    val dFwd = col("__f.t") - col("__t")
    val best = when(col("__b").isNotNull &&
        (col("__f").isNull || dBack <= dFwd), col("__b"))
      .otherwise(col("__f"))
    val withBest = scanned.withColumn("__best", best)
    val kept =
      if (keepUnmatched) withBest
      else withBest.filter(col("__best").isNotNull)
    kept.select(lCols.map(col) ++
      rCols.map(c => col(s"__best.row.$c").as(c)): _*)
  }

  /** The r8–r14 join-then-aggregate nearest join — the reference
    * implementation for the equivalence spec ([[nearestJoin]]'s
    * rationale): plain key equi-join + map-side `min(struct(|Δt|,
    * time, tieBreak, payload))`, per-key CPU = the join fanout.
    * Times in µs, matching [[nearestJoin]]'s precision contract.
    */
  private[graft] def nearestJoinViaJoinAgg(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: String, keepUnmatched: Boolean = false): DataFrame = {
    val payload = struct(right.columns.map(col): _*).alias("row")
    val rT = unix_micros(col(rightTime).cast("timestamp"))
    val lT = unix_micros(col(leftTime).cast("timestamp"))
    left.join(right, col(leftKey) === col(rightKey),
        if (keepUnmatched) "left" else "inner")
      .groupBy(left.columns.map(col): _*)
      .agg(min(struct(abs(rT - lT).as("d"), rT.as("t"),
          col(rightTieBreak).as("tb"), payload)).as("__best"))
      .select(left.columns.map(col) ++
        right.columns.map(c => col(s"__best.row.$c").as(c)): _*)
  }
}
