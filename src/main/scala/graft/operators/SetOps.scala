package graft.operators

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.7 Set operations. Reference analogue: merging/reconciling code
  * lists across catalog revisions [R: genesapi/schema.py — UNVERIFIED].
  * Spark plans INTERSECT/EXCEPT as left-semi/anti joins after distinct
  * — one shuffle each, partial-agg-compressed.
  */
object SetOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // UNION + DISTINCT; unionByName keeps the columns aligned by name.
    "set_union" -> ((s, d) =>
      T.orders(s, d).select(col("o_custkey").as("ck"))
        .unionByName(T.customer(s, d).select(col("c_custkey").as("ck")))
        .distinct()
        .orderBy("ck")),

    "set_intersect" -> ((s, d) =>
      T.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(T.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    "set_except" -> ((s, d) =>
      T.customer(s, d).filter(col("c_acctbal") > 9900)
        .select(col("c_nationkey").as("nk"))
        .except(T.supplier(s, d).filter(col("s_acctbal") > 9000)
          .select(col("s_nationkey").as("nk")))
        .orderBy("nk"))
  )

  val oracle: Map[String, String] = Map(
    "set_union" ->
      """SELECT o_custkey AS ck FROM orders
        |UNION
        |SELECT c_custkey AS ck FROM customer
        |ORDER BY ck""".stripMargin,
    "set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "set_except" ->
      """SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9900
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9000
        |ORDER BY nk""".stripMargin
  )
}
