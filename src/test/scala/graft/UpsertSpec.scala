package graft

import graft.operators.DomainOps
import org.apache.spark.sql.functions._

/** scd1_upsert — the keyed batch MERGE write path: op semantics on a
  * hand fixture, the full write→read-back cycle on plain parquet (the
  * staged atomic-rename pattern standing in for a transactional MERGE
  * target), and idempotency (re-applying the same delta must change
  * nothing — the property MERGE pipelines rely on for safe retries).
  */
class UpsertSpec extends SparkSpec {

  test("scd1Upsert: all four ops on a hand fixture") {
    import spark.implicits._
    val target = Seq((1L, 10L, 5.0), (2L, 20L, 7.0), (4L, 40L, 9.0))
      .toDF("k", "ref", "bal")
    val delta = Seq((2L, 20L, 7.0), (4L, 41L, 9.0), (6L, 60L, 1.0))
      .toDF("k", "ref", "bal")
    val got = DomainOps.scd1Upsert(target, delta, "k")
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getString(3))).toSeq
    assert(got == Seq(
      (1L, 10L, 5.0, "carried"),    // only in target
      (2L, 20L, 7.0, "unchanged"),  // present, identical
      (4L, 41L, 9.0, "updated"),    // ref differs — delta wins
      (6L, 60L, 1.0, "inserted")),  // only in delta
      s"op semantics: $got")
  }

  test("scd1Upsert: 'updated' is null-safe on both sides") {
    import spark.implicits._
    val target = Seq((1L, Some(5.0)), (2L, None: Option[Double]))
      .toDF("k", "bal")
    val delta = Seq((1L, None: Option[Double]), (2L, None: Option[Double]))
      .toDF("k", "bal")
    val got = DomainOps.scd1Upsert(target, delta, "k")
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    // k=1: 5.0 → NULL is an update (null-safe inequality, and coalesce
    // keeps the old value only because the NEW one is NULL — the op
    // tag must still say updated); k=2: NULL → NULL is unchanged.
    assert(got == Seq((1L, "updated"), (2L, "unchanged")),
      s"null-safe updated: $got")
  }

  test("write → read-back → re-apply: the parquet MERGE cycle is " +
    "idempotent") {
    // The plain-parquet "commit": write the upserted result to a fresh
    // dir, atomically rename over the old version, read back. A second
    // application of the SAME delta onto the new version must produce
    // zero inserted/updated rows (MERGE retry safety).
    val target = DomainOps.stagedScd1Target(spark, sf)
    val delta = T.orders(spark, sf)
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val v2rows = DomainOps.scd1Upsert(target, delta, "o_orderkey")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_upsert_v2").toString
    v2rows.drop("op").write.mode("overwrite").parquet(dir)
    val v2 = spark.read.parquet(dir)
    assert(v2.count() == v2rows.count())
    val again = DomainOps.scd1Upsert(v2, delta, "o_orderkey")
    val badOps = again.groupBy("op").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(badOps.getOrElse("inserted", 0L) == 0L &&
      badOps.getOrElse("updated", 0L) == 0L,
      s"re-applying the same delta must be a no-op: $badOps")
    // And the delta keys are exactly the non-carried rows.
    val nDelta = delta.count()
    assert(badOps.getOrElse("unchanged", 0L) == nDelta, s"$badOps vs $nDelta")
  }
}
