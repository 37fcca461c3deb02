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
        .orderBy("nk")),

    // BAG semantics (r9): EXCEPT ALL subtracts multiplicities
    // (max(m_left − m_right, 0) copies survive) — the reconciliation
    // shape when duplicates are DATA (ledger entries, repeated
    // measurements), where distinct-set EXCEPT silently conflates
    // them. Spark plans exceptAll as a counted anti-form: aggregate
    // both sides to (row, ±count), sum, re-generate — one shuffle on
    // the row key, never row×row.
    "set_except_all" -> ((s, d) =>
      T.orders(s, d).select(col("o_custkey").as("ck"))
        .exceptAll(T.orders(s, d)
          .filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("ck")))
        .groupBy("ck").agg(count(lit(1)).as("n_residual"))
        .orderBy("ck")),

    // INTERSECT ALL keeps min(m_left, m_right) copies — the "how many
    // matched on BOTH sides, counting repeats" reconciliation query.
    "set_intersect_all" -> ((s, d) =>
      T.orders(s, d).select(col("o_custkey").as("ck"))
        .intersectAll(T.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("ck")))
        .groupBy("ck").agg(count(lit(1)).as("n_matched"))
        .orderBy("ck"))
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
        |ORDER BY nk""".stripMargin,
    // The grouped count over the surviving bag collapses any
    // engine-side row-emission order difference.
    "set_except_all" ->
      """SELECT ck, count(*) AS n_residual FROM (
        |  SELECT o_custkey AS ck FROM orders
        |  EXCEPT ALL
        |  SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O')
        |GROUP BY ck ORDER BY ck""".stripMargin,
    "set_intersect_all" ->
      """SELECT ck, count(*) AS n_matched FROM (
        |  SELECT o_custkey AS ck FROM orders
        |  INTERSECT ALL
        |  SELECT o_custkey AS ck FROM orders
        |  WHERE o_orderpriority = '1-URGENT')
        |GROUP BY ck ORDER BY ck""".stripMargin
  )
}
