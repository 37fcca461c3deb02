package graft.tmp

/** Scratch timing harness (delete before committing): min-of-5 for the
  * named keys on a quiet box.
  */
object TimeKeys {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus.toInt)
    val keys = args.toSeq
    // warm up the session on one cheap pass of each key
    keys.foreach(k => graft.SparkEntry.queries(k)(spark, sfDir).count())
    for (k <- keys) {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(k)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMING $k min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
