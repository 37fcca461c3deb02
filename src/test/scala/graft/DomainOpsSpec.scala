package graft

import graft.operators.DomainOps

/** §2.9 domain operators — semantics at sf0.001, incl. the facts_nest
  * JSON golden shape (no DuckDB oracle for that key).
  */
class DomainOpsSpec extends SparkSpec {

  test("facts_nest emits one sorted-deterministic JSON doc per customer") {
    val rows = DomainOps.queries("facts_nest")(spark, sf).collect()
    assert(rows.nonEmpty)
    val doc = rows.head.getString(1)
    // Shape: {"customer":<k>,"n_orders":N,"by_status":{...}}
    assert(doc.startsWith("{\"customer\":"))
    assert(doc.contains("\"n_orders\":"))
    assert(doc.contains("\"by_status\":{"))
    // Deterministic across runs (sorted map entries).
    val again = DomainOps.queries("facts_nest")(spark, sf).collect()
    assert(rows.map(_.getString(1)).toSeq == again.map(_.getString(1)).toSeq)
    // n_orders in the doc equals the sum of by_status counts.
    val m = """"n_orders":(\d+)""".r.findFirstMatchIn(doc).get.group(1).toInt
    val statusCounts = """:(\d+)[,}]""".r.findAllMatchIn(
      doc.substring(doc.indexOf("by_status"))).map(_.group(1).toInt).toSeq
    assert(statusCounts.sum == m)
  }

  test("pivot_wide: row per user, explicit column per event type") {
    val df = DomainOps.queries("pivot_wide")(spark, sf)
    assert(df.columns.toSeq ==
      Seq("user_id", "click", "error", "purchase", "signup", "view"))
    val users = T.events(spark, sf).select("user_id").distinct().count()
    assert(df.count() == users)
  }

  test("dedup_version keeps exactly one newest event per user") {
    val out = DomainOps.queries("dedup_version")(spark, sf)
    val users = T.events(spark, sf).select("user_id").distinct().count()
    assert(out.count() == users)
    assert(out.select("user_id").distinct().count() == users)
  }
}
