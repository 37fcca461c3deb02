package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction (operators/BloomJoin.scala):
  * membership semantics, the no-false-negative guarantee the join's
  * exactness rests on, a bounded false-positive rate at the textbook
  * sizing, and the plan shape (predicate below the join, no cartesian).
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every member key passes mightContain") {
    val keys = (0L until 500L).toDF("k")
    val words = BloomJoin.buildBloom(keys, col("k"), numBits = 1024,
      numHashes = 5)
    val pass = keys.filter(BloomJoin.mightContain(col("k"), words, 1024, 5))
      .count()
    assert(pass == 500, s"dropped ${500 - pass} true members")
  }

  test("false-positive rate is bounded at textbook sizing") {
    // n=100 keys into m=1024 bits, k=5 → theoretical FP ≈
    // (1 - e^{-kn/m})^k ≈ 1%; assert an order-of-magnitude bound so the
    // test survives hash-family quirks without going vacuous.
    val members = (0L until 100L).toDF("k")
    val words = BloomJoin.buildBloom(members, col("k"), numBits = 1024,
      numHashes = 5)
    val nonMembers = (1000000L until 1010000L).toDF("k")
    val fp = nonMembers
      .filter(BloomJoin.mightContain(col("k"), words, 1024, 5)).count()
    assert(fp < 500, s"FP rate ${fp / 10000.0} >= 5%")
  }

  test("reduceProbe keeps a superset of matching rows, strictly smaller than the probe") {
    val probe = T.lineitem(spark, sf)
    val build = T.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
    val reduced = BloomJoin.reduceProbe(probe, "l_orderkey", build,
      "o_orderkey")
    val trueKeys = probe
      .join(build, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber")
    // exactness: every actually-matching row survives the bloom stage
    val dropped = trueKeys.except(
      reduced.select("l_orderkey", "l_linenumber")).count()
    assert(dropped == 0, s"bloom dropped $dropped matching rows")
    // usefulness: the filter actually thins the probe side
    val (p, r) = (probe.count(), reduced.count())
    assert(r < p, s"no reduction: $r of $p survived")
  }

  test("reduceProbe skips a saturated filter: probe returned unchanged") {
    // 500 distinct keys into 64 bits at k=5 saturates the bitset far
    // past maxFillRatio — the r7 API would still pay a 5-hash per-row
    // predicate that filters essentially nothing; the guard must hand
    // back the probe frame itself (semantically safe: the reduction is
    // invisible to the real join that follows).
    import spark.implicits._
    val build = (0L until 500L).toDF("k")
    val words = BloomJoin.buildBloom(build, col("k"), numBits = 64,
      numHashes = 5)
    assert(BloomJoin.fillRatio(words) > BloomJoin.maxFillRatio,
      s"fixture not saturated: fill ${BloomJoin.fillRatio(words)}")
    val probe = (0L until 100L).toDF("k")
    val reduced = BloomJoin.reduceProbe(probe, "k", build, "k",
      numBits = 64, numHashes = 5)
    assert(reduced eq probe,
      "saturated bloom must return the probe frame unchanged")
    // and a healthy sizing still filters (guard doesn't trip spuriously)
    val healthy = BloomJoin.reduceProbe(probe, "k", build, "k",
      numBits = 8192, numHashes = 5)
    assert(!(healthy eq probe), "healthy bloom should install the filter")
  }

  test("join_bloom plan: bloom predicate sits on the probe scan below the join") {
    val p = SparkEntry.queries("join_bloom")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("shiftrightunsigned"),
      "bloom membership predicate missing from the physical plan: " + p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // the membership filter must be BELOW the join in the tree (further
    // indented / later lines), i.e. evaluated before rows reach it
    val joinLine = p.linesIterator.indexWhere(l => l.contains("HashJoin") ||
      l.contains("SortMergeJoin"))
    val filterLine = p.linesIterator.indexWhere(_.contains("shiftrightunsigned"))
    assert(joinLine >= 0 && filterLine > joinLine,
      s"bloom filter (line $filterLine) not below join (line $joinLine):\n$p")
  }
}
