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
    */
  def saltedSumCount(df: DataFrame, key: String, value: Column,
      salt: Int): DataFrame = {
    val salted = df
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(value).as("__s"), count(lit(1)).as("__n"))
    salted.groupBy(col(key))
      .agg(sum(col("__s")).as("sum_v"), sum(col("__n")).as("n"))
  }
}
