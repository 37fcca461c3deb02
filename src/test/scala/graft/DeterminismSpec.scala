package graft

/** Engine-wide determinism sweep (SURVEY.md §7.5 house rule): every
  * declared query must emit IDENTICAL rows in IDENTICAL order no matter
  * how the data is partitioned. Re-running under a different
  * `spark.sql.shuffle.partitions` genuinely perturbs shuffle order and
  * tie placement, so this catches:
  *   - sorts that are not total orders (ties land differently),
  *   - partition-order-dependent aggregation (e.g. float sums emitted
  *     unrounded),
  *   - `limit` cutting across ties.
  * Runs at sf0.001 — shape coverage, not volume.
  */
class DeterminismSpec extends SparkSpec {

  private val tiny = "/root/testdata/sf0.001"

  test("every query emits identical ordered output under different shuffle partitioning") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val bad = scala.collection.mutable.ListBuffer[String]()
    try {
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        val a = fn(spark, tiny).collect().map(_.toString).toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        val b = fn(spark, tiny).collect().map(_.toString).toSeq
        if (a != b) {
          val i = a.zip(b).indexWhere { case (x, y) => x != y }
          bad += s"$name (first diff at row $i of ${a.size}: " +
            s"${a.lift(i)} vs ${b.lift(i)})"
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(bad.isEmpty, s"partitioning-dependent queries:\n${bad.mkString("\n")}")
  }
}
