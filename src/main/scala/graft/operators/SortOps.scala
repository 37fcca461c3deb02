package graft.operators

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.6 Sorts / limits / top-k. Global top-k compiles to
  * TakeOrderedAndProject (per-partition heap + driver merge — no full
  * sort, no shuffle of non-winners; exactly what you want at 100 TB).
  * Per-group top-k is a ranked window, which shuffles once on the
  * partition key and sorts within partitions only.
  */
object SortOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "sort_multi" -> ((s, d) =>
      T.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(asc_nulls_first("o_orderstatus"), desc("o_totalprice"),
                 asc("o_orderkey"))),

    "topk_global" -> ((s, d) =>
      T.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(20)),

    // Per-group top-k ≡ the reference's latest-revision-wins pattern
    // [R: genesapi/storage.py — UNVERIFIED] generalized to k>1.
    "topk_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      T.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    })
  )

  val oracle: Map[String, String] = Map(
    "sort_multi" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_totalprice DESC,
        |         o_orderkey ASC""".stripMargin,
    "topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "topk_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin
  )
}
