package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted}
import graft.operators.SubqueryOps

/** EXECUTION-count pins — SparkListener measurements of what actually
  * ran, not plan strings (r13 verdict #1: the sub_recursive PlanSpec
  * plan-string pin passed while every UnionLoop iteration re-executed
  * the 4-way fact join — 51 stages for one run. A plan string cannot
  * see execution counts; only a listener can).
  */
class ExecCountSpec extends SparkSpec {

  /** Stages submitted + parquet input bytes read for one execution.
    * The listener bus is async: poll until both counters are stable.
    */
  private def measure(run: () => Unit): (Int, Long) = {
    @volatile var stages = 0
    @volatile var bytes = 0L
    val l = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        bytes += s.stageInfo.taskMetrics.inputMetrics.bytesRead
    }
    spark.sparkContext.addSparkListener(l)
    try {
      run()
      var prev = (-1, -1L); var waited = 0
      while ((stages, bytes) != prev && waited < 15000) {
        prev = (stages, bytes); Thread.sleep(300); waited += 300
      }
    } finally spark.sparkContext.removeSparkListener(l)
    (stages, bytes)
  }

  private def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  test("sub_recursive executes the fact join ONCE: materialized form " +
    "beats the inline-CTE form on stages AND bytes read") {
    // Spark inlines non-recursive CTEs, so the single-text form (still
    // what the DuckDB oracle runs) re-executes the trade/seed pipeline
    // on every UnionLoop iteration. The shipped key materializes the
    // ≤25²-row edge table once; this spec proves the ONCE by measuring
    // a real execution of both forms. Measured at sf0.001 this round:
    // materialized 31 stages / 52 KB read vs inline 57 stages / 91 KB
    // (one full pass over the 5 tables' needed columns ≈ 52 KB).
    // Relative bounds are self-calibrating against data regen; the
    // absolute stage cap catches a regression even if the inline
    // baseline drifts.
    val inlineTxt = SubqueryOps.oracle("sub_recursive")
      .replaceAll("\\b(lineitem|orders|customer|supplier|nation)\\b",
        s"parquet.`$sf/$$1.parquet`")
    // Result parity first: the materialized fragment composition must
    // produce byte-identical rows to Spark executing the oracle's
    // single inline text (guards the view/fragment wiring, not just
    // the execution counts).
    val got = SubqueryOps.queries("sub_recursive")(spark, sf).collect().toSeq
    val exp = spark.sql(inlineTxt).collect().toSeq
    assert(got == exp, s"materialized != inline: $got vs $exp")
    val (sNew, bNew) =
      measure(() => noop(SubqueryOps.queries("sub_recursive")(spark, sf)))
    val (sOld, bOld) = measure(() => noop(spark.sql(inlineTxt)))
    assert(sNew <= 40, s"materialized sub_recursive submitted $sNew stages " +
      s"(> 40): the loop is re-executing pre-loop work again")
    assert(sNew < sOld,
      s"materialized ($sNew stages) must beat inline ($sOld stages)")
    assert(bNew <= (bOld * 0.75).toLong,
      s"materialized read $bNew bytes vs inline $bOld — the fact join is " +
        s"being re-executed (one pass should be ~55% of the inline cost)")
  }
}
