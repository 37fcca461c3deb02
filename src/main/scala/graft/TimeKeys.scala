package graft

/** Hand-timing harness for a SUBSET of keys — the interactive
  * complement to [[Bench]] (which sweeps everything): warm the session,
  * then min-of-5 per named key. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.TimeKeys corpus_curate dedup_cluster"
  *
  * Trust the MIN, not the first number: this box carries heavy ambient
  * load (see the bench notes in .claude/skills/verify/SKILL.md), so
  * single runs are bimodal. For cross-load comparisons, time a fixed
  * reference key (e.g. scan_parquet) in the same invocation and compare
  * ratios.
  */
object TimeKeys {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    val keys = args.toSeq
    require(keys.nonEmpty, "pass one or more SparkEntry.queries key names")
    val unknown = keys.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown keys: $unknown")
    // -Dgraft.jobs.debug: print every scheduled job's duration plus the
    // driver-side GAP since the last job END — gaps are where
    // analysis/optimization/codegen hide, and for iterative keys they
    // routinely dwarf execution (the r9/r10 loop-economics findings).
    // Jobs CAN overlap (AQE schedules broadcast/stage jobs
    // concurrently): a negative gap is printed as such and means
    // "started while another job ran" — only positive gaps are idle
    // driver time. Diagnostics only, never used by the timing itself.
    if (sys.props.contains("graft.jobs.debug"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          @volatile private var lastEnd = 0L
          private val starts =
            new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            starts.put(js.jobId, js.time)
            val gap = if (lastEnd == 0) 0.0 else (js.time - lastEnd) / 1e3
            val desc = Option(js.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse("").replaceAll("\\s+", " ").take(80)
            println(f"JOB ${js.jobId}%3d start gap=$gap%.3fs $desc")
          }
          override def onJobEnd(
              je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            lastEnd = je.time
            val started = starts.remove(je.jobId)
            val dur = (je.time - (if (started == 0L) je.time else started)) / 1e3
            println(f"JOB ${je.jobId}%3d end   dur=$dur%.3fs")
          }
        })
    // noop sink, same as Bench: count() would let the optimizer prune
    // the final projection and sort — the work many keys exist to do.
    // Pins cleared after every run (r11): a pin some OTHER key (or the
    // warm-up pass) left live taxes this key's planning via the
    // CacheManager canonicalization walk — the timing must be the
    // key's own cost, fresh-session honest.
    def run(k: String): Unit =
      try SparkEntry.queries(k)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      finally Pins.clearAll()
    // warm up the session on one untimed pass of each key
    keys.foreach(run)
    for (k <- keys) {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        run(k)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMING $k min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
