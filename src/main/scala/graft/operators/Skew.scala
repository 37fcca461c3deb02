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

  /** Salted equivalent of `df.groupBy(key).agg(sum(value) as "sum_v",
    * count(*) as "n")`, safe under arbitrary key skew.
    *
    * Helper columns live in a fresh 2-column projection, so they can
    * never collide with caller columns regardless of the input schema;
    * only the output names (key, "sum_v", "n") are claimed.
    *
    * Library-API caveat: the salt comes from `spark_partition_id() +
    * monotonically_increasing_id()`, so WHICH subgroup a row lands in
    * changes with the physical partitioning. For exact value types
    * (integral, DECIMAL — what the `agg_skew_salted` key uses) the
    * recombined answer is partitioning-invariant regardless
    * (OperatorSemanticsSpec asserts salted == plain under two
    * different repartitionings; DeterminismSpec sweeps the key). A
    * DOUBLE-sum caller, however, would see partitioning-DEPENDENT
    * last-ulp rounding, because the salt reshuffles float addition
    * order run to run. If bit-stable double sums matter, salt
    * deterministically from row content instead:
    * `pmod(xxhash64(<unique id col>), salt)`.
    */
  def saltedSumCount(df: DataFrame, key: String, value: Column,
      salt: Int): DataFrame = {
    require(key != "sum_v" && key != "n",
      s"key '$key' collides with an output column name")
    val kv = df.select(col(key).as("k"), value.as("v"))
    val salted = kv
      .withColumn("s", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
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
    * once. So the nondeterministic partition-id salt is harmless here
    * (unlike the double-sum caveat on [[saltedSumCount]]: no arithmetic
    * happens across salt groups, rows just relocate).
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
    val b = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val s = small.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    b.join(s, b(bigKey) === s(smallKey) && b("__salt") === s("__salt"))
      .drop(b("__salt")).drop(s("__salt"))
  }
}
