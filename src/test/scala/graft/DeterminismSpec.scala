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

  test("sampled PQ codebook training (fitFraction < 1) is " +
    "partitioning-invariant") {
    // r13 verdict #7: the fitFraction sampling knob landed with one
    // recall pin but no invariance proof. Membership is
    // xxhash64(vec_id)-only — a pure function of the row id — and the
    // Lloyd update sums in exact DECIMAL(28,10), so the trained book
    // must be bit-identical no matter how the input is partitioned.
    // (If a sampled default were ever adopted for the oracled PQ keys
    // — knn_ivf_pq, knn_pq_recall, knn_rerank — they would stay
    // oracle-able for exactly this reason: DuckDB cannot replay
    // xxhash64, so the SAMPLE SET would need the portable md5 family
    // first; see SURVEY §2.12.)
    import org.apache.spark.sql.functions._
    val sub = spark.read.parquet(s"$tiny/embeddings.parquet")
      .select(col("vec_id"), slice(col("embedding"), 1, 16).as("sub"))
    val a = graft.llm.LlmVector.pqCodebook(sub.repartition(32), 4, 2, 0.5)
    val b = graft.llm.LlmVector.pqCodebook(
      sub.repartition(3, col("vec_id")), 4, 2, 0.5)
    assert(a == b, s"sampled codebook varies with partitioning:\n$a\nvs\n$b")
    // And the sample is a real subset: a 0.5 book differs from full.
    val full = graft.llm.LlmVector.pqCodebook(sub.repartition(32), 4, 2, 1.0)
    assert(a != full, "fitFraction=0.5 trained on the full corpus?")
  }
}
