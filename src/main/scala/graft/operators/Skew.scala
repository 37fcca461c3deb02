package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tools (SURVEY.md §7.6): AQE's skew-join splitting covers joins,
  * but a pathologically hot GROUP BY key still funnels into one
  * reducer. Salting splits each key into `salt` subkeys for the
  * partial aggregate and re-combines — two shuffles, both balanced.
  * Worth it ONLY for skewed keys; for uniform keys Spark's map-side
  * partial aggregation already bounds the shuffle.
  */
object Skew {

  /** Deterministic content-derived salt: hash of EVERY input column,
    * mod `salt`. The r7 form (`spark_partition_id() +
    * monotonically_increasing_id()`) was nondeterministic under
    * recomputation — on a stage retry (fetch failure, executor loss)
    * the re-executed map attempt re-salts rows differently than the
    * original, and a shuffle keyed on a nondeterministic column can
    * silently drop or duplicate rows (the SPARK-23207 hazard — exactly
    * the cluster-scale failure these operators exist for; a single-JVM
    * spec can never catch it). A content hash re-salts identically on
    * every recomputation. Spread caveat, documented not hidden: rows
    * whose WHOLE projected row is identical share a salt bucket, so a
    * hot key of byte-identical rows would not spread — real fact rows
    * carry a unique id/measure mix, which is what the hash eats.
    */
  private def contentSalt(df: DataFrame, salt: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salt.toLong))

  /** Salted equivalent of `df.groupBy(key).agg(sum(value) as "sum_v",
    * count(*) as "n")`, safe under arbitrary key skew.
    *
    * Helper columns live in a fresh 2-column projection, so they can
    * never collide with caller columns regardless of the input schema;
    * only the output names (key, "sum_v", "n") are claimed.
    *
    * The salt is [[contentSalt]] — deterministic under stage retry AND
    * partitioning-invariant, so for exact value types (integral,
    * DECIMAL — what the `agg_skew_salted` key uses) the recombined
    * answer is reproducible bit-for-bit (OperatorSemanticsSpec asserts
    * salted == plain under two different repartitionings;
    * DeterminismSpec sweeps the key). A DOUBLE-sum caller still sees
    * salt-DEPENDENT last-ulp rounding vs the unsalted plan (float
    * addition reassociates across subgroups), but the same salt gives
    * the same answer on every run and every recomputation.
    */
  def saltedSumCount(df: DataFrame, key: String, value: Column,
      salt: Int): DataFrame = {
    require(key != "sum_v" && key != "n",
      s"key '$key' collides with an output column name")
    val kv = df.select(col(key).as("k"), value.as("v"),
      contentSalt(df, salt).as("s"))
    val salted = kv
      .groupBy(col("k"), col("s"))
      .agg(sum(col("v")).as("ps"), count(lit(1)).as("pn"))
    salted.groupBy(col("k"))
      .agg(sum(col("ps")).as("sum_v"), sum(col("pn")).as("n"))
      .withColumnRenamed("k", key)
  }

  /** Salted skew JOIN — the join-side counterpart of
    * [[saltedSumCount]]: `big ⋈ small` on `bigKey = smallKey`, safe
    * when a handful of big-side key values dominate. Each big row salts
    * into one of `salt` subkeys; the small side is replicated `salt`×
    * (one copy per subkey) so every (key, salt) bucket finds its match.
    * The join runs on (key, salt), spreading a hot key's rows over
    * `salt` reducers instead of funneling them into one.
    *
    * Result is EXACTLY the plain join no matter how rows are salted:
    * each matching (big, small) pair meets in precisely one bucket —
    * the big row's — because the small side carries every salt value
    * once. The salt is still [[contentSalt]] (deterministic under
    * stage retry): result-set invariance makes a nondeterministic salt
    * LOOK harmless, but a retried map stage re-salting rows into
    * different buckets than the committed original can drop/duplicate
    * join rows at the shuffle layer (SPARK-23207) — determinism here
    * is about exactly-once row delivery, not about which answer the
    * arithmetic gives.
    *
    * Cost model at 100 TB: the small side's shuffle volume multiplies
    * by `salt` — use for a MODEST small side (too big to broadcast,
    * cheap to replicate) against a skewed big side, with `salt` ≈ the
    * number of partitions the hottest key should spread over. AQE's
    * skew-join split covers the same ground reactively when stats
    * catch it; explicit salting is the author-knows-best form, same as
    * [[graft.operators.BloomJoin]] vs the runtime bloom filter.
    */
  def saltedJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, salt: Int): DataFrame = {
    require(!big.columns.contains("__salt") &&
      !small.columns.contains("__salt"),
      "input already has a __salt column")
    val b = big.withColumn("__salt", contentSalt(big, salt))
    val s = small.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    b.join(s, b(bigKey) === s(smallKey) && b("__salt") === s("__salt"))
      .drop(b("__salt")).drop(s("__salt"))
  }
}
