package graft

/** Scratch harness: dump every key's plan fingerprint to a file so two
  * separate JVM runs can be diffed — empirical proof that the
  * BENCH_DETAIL min-merge fingerprints are cross-session stable.
  */
object FpDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val out = args.headOption.getOrElse("/tmp/fp_dump.txt")
    val spark = GraftSession.local(8)
    val keys =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    val w = new java.io.PrintWriter(out)
    keys.sorted.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (args.length > 1) {
        // full normalized plan text for diffing
        val txt = try fn(spark, sfDir).queryExecution.optimizedPlan
          .canonicalized.toString
          .replaceAll("#\\d+", "#x")
          .replaceAll("@[0-9a-fA-F]{4,}", "@x")
        catch { case e: Throwable => s"ERR:$e" }
        w.println(s"==== $name\n$txt")
      } else {
        val fp =
          try Bench.planFingerprint(fn(spark, sfDir))
          catch { case e: Throwable => s"ERR:${e.getClass.getSimpleName}" }
        w.println(s"$name $fp")
      }
      Pins.clearAll()
    }
    w.close()
    spark.stop()
  }
}
