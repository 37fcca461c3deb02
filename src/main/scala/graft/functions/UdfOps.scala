package graft.functions

import graft.T
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** §2.11 User-defined function surface. Reference analogue: AGS-prefix
  * extraction / quality-flag normalization helpers
  * [R: genesapi/util.py — UNVERIFIED].
  *
  * House position (SURVEY.md §4): UDFs exist to prove the extension
  * surface — they block predicate pushdown and fall out of
  * WholeStageCodegen, so production operators prefer built-in Column
  * expressions; a custom Catalyst Expression with doGenCode is the
  * next rung if a built-in is missing. The typed Aggregator, by
  * contrast, IS the right tool for custom aggregation: it runs
  * partial+final like any native agg and carries no driver state.
  */
object UdfOps {
  type Q = (SparkSession, String) => DataFrame

  /** Weighted mean with exact decimal sums (partition-order-free). */
  final case class WBuf(num: BigDecimal, den: BigDecimal)

  val weightedMean: Aggregator[(Double, Double), WBuf, Double] =
    new Aggregator[(Double, Double), WBuf, Double] {
      override def zero: WBuf = WBuf(BigDecimal(0), BigDecimal(0))
      override def reduce(b: WBuf, in: (Double, Double)): WBuf = {
        val (x, w) = in
        WBuf(b.num + BigDecimal(x) * BigDecimal(w), b.den + BigDecimal(w))
      }
      override def merge(a: WBuf, b: WBuf): WBuf =
        WBuf(a.num + b.num, a.den + b.den)
      override def finish(b: WBuf): Double =
        if (b.den == 0) 0.0
        else (b.num / b.den).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      override def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  val queries: Map[String, Q] = Map(
    // Scalar UDF: price-tier bucketing. Deterministic, null-safe.
    "udf_scalar" -> ((s, d) => {
      val tier = udf((p: Double) =>
        if (p < 50000) "bronze"
        else if (p < 150000) "silver"
        else if (p < 300000) "gold"
        else "platinum")
      T.orders(s, d)
        .select(col("o_orderkey"), tier(col("o_totalprice")).as("tier"))
        .orderBy("o_orderkey")
    }),

    // Typed UDAF via Aggregator + functions.udaf: discount weighted by
    // quantity per returnflag. Decimal buffer → exact partial+final.
    "udaf_typed" -> ((s, d) => {
      val wmean = udaf(weightedMean)
      T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(wmean(col("l_discount"), col("l_quantity")).as("w_avg_disc"))
        .orderBy("l_returnflag")
    }),

    // Table function / generator: one row per token with position.
    // posexplode is the built-in Generator; 1-based to match SQL.
    "udtf_explode" -> ((s, d) =>
      T.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos0", "token")))
        .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("token"))
        .orderBy("doc_id", "pos")),

    // SQL UDF (r15, Spark 4 surface): CREATE TEMPORARY FUNCTION with a
    // RETURN expression body — the declarative alternative to
    // udf_scalar's JVM closure, and the form that does NOT pay the UDF
    // tax: the body INLINES into the calling plan at analysis time, so
    // whole-stage codegen and optimizer rewrites survive where a
    // ScalaUDF is an opaque black box (PlanSpec pins no ScalaUDF node
    // and the inlined CASE in both the projection and the filter).
    // Same tier semantics as udf_scalar ON PURPOSE — the pair
    // demonstrates the two rungs of the reuse ladder; the filter on
    // the UDF output is the part a JVM UDF would force to evaluate
    // opaquely twice.
    "udf_sql" -> ((s, d) => {
      s.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION graft_price_tier(p DOUBLE)
          |RETURNS STRING
          |RETURN CASE WHEN p < 50000 THEN 'bronze'
          |            WHEN p < 150000 THEN 'silver'
          |            WHEN p < 300000 THEN 'gold'
          |            ELSE 'platinum' END""".stripMargin)
      s.sql(
        s"""SELECT o_orderkey, graft_price_tier(o_totalprice) AS tier
           |FROM parquet.`$d/orders.parquet`
           |WHERE graft_price_tier(o_totalprice) <> 'platinum'
           |ORDER BY o_orderkey""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(
    "udf_scalar" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 50000 THEN 'bronze'
        |       WHEN o_totalprice < 150000 THEN 'silver'
        |       WHEN o_totalprice < 300000 THEN 'gold'
        |       ELSE 'platinum' END AS tier
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "udaf_typed" ->
      """SELECT l_returnflag,
        |  CAST(round(sum(CAST(l_discount AS DECIMAL(18,6)) *
        |             CAST(l_quantity AS DECIMAL(18,6)))
        |         / sum(CAST(l_quantity AS DECIMAL(18,6))), 6) AS DOUBLE)
        |    AS w_avg_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "udtf_explode" ->
      """SELECT doc_id,
        |  generate_subscripts(string_split(text, ' '), 1) AS pos,
        |  unnest(string_split(text, ' ')) AS token
        |FROM documents ORDER BY doc_id, pos""".stripMargin,
    // The oracle replays the INLINED body — which is exactly the SQL
    // UDF's semantics (analysis-time macro expansion).
    "udf_sql" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 50000 THEN 'bronze'
        |       WHEN o_totalprice < 150000 THEN 'silver'
        |       WHEN o_totalprice < 300000 THEN 'gold'
        |       ELSE 'platinum' END AS tier
        |FROM orders
        |WHERE CASE WHEN o_totalprice < 50000 THEN 'bronze'
        |           WHEN o_totalprice < 150000 THEN 'silver'
        |           WHEN o_totalprice < 300000 THEN 'gold'
        |           ELSE 'platinum' END <> 'platinum'
        |ORDER BY o_orderkey""".stripMargin
  )
}
