package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt)
    // Untimed warm-up pass: JVM/codegen/session init otherwise lands on
    // whichever query happens to run first (~10 s of noise in round 1).
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
    }
    // Sorted order: stable round-over-round per-query comparisons.
    // Two timed runs, min reported: single-run times are bimodal under
    // ambient load (same query measured 3 s and 10.7 s minutes apart);
    // min-of-2 is the standard noise-robust point estimate. When the
    // two runs still disagree >2× (ambient spike hit both), one extra
    // run arbitrates — bounded cost, and it stops a 48 s noise spike
    // masquerading as a 1.7 s query's time (measured on this box).
    var errors = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case _: Throwable =>
            if (!errors.contains(name)) errors ::= name
            return -1.0 // broken ≠ fast: never report time-to-throw
        }
        (System.nanoTime() - t0) / 1e9
      }
      val two = Seq(once(), once()).filter(_ >= 0)
      val best =
        if (two.isEmpty) -1.0
        else if (two.size == 2 && two.max > 2 * two.min && two.max > 1.0)
          (once() +: two).filter(_ >= 0).min
        else two.min
      name -> best
    }
    // 4-decimal times: sub-0.1 ms precision is noise, and the shorter
    // line keeps the full JSON inside log-tail captures.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errs = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
