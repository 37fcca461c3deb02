package graft

/** Scratch harness: dump every key's plan fingerprint to a file so two
  * separate runs — different JVMs AND different environments (core
  * count, CWD, tmpdir) — can be diffed: empirical proof that the
  * BENCH_DETAIL min-merge fingerprints are cross-ENVIRONMENT stable,
  * not merely cross-JVM (r16 verdict #1: 20 keys' fingerprints
  * differed between the builder's JVM and the driver's, so the
  * driver's loaded re-run discarded their quiet committed minima).
  *
  * Modes:
  *   - no key args: one `name fingerprint w:widthhash` line per key
  *     (diff two runs). The second hash is [[Bench.widthFingerprint]]
  *     — partition widths left IN (r17 advice #1): it differs across
  *     environments by construction (it embeds the core count), but in
  *     a same-environment diff across code versions it exposes a
  *     deliberate repartition-width change that the merge fingerprint
  *     deliberately masks. Diff the first column for merge decisions,
  *     the second for width forensics.
  *   - key args: the FULL normalized plan text per named key — exactly
  *     [[Bench.normalizedPlanText]], the string the fingerprint hashes
  *     (r16 advice #4: this mode used to normalize `.canonicalized`
  *     text with a different replacement set, so it could not explain
  *     a fingerprint diff).
  *
  * Env knobs mirror Bench so a driver-like environment is simulable:
  * `SPARK_GRAFT_CPUS` (default 8 here) and `SPARK_GRAFT_SF_DIR`.
  */
object FpDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val out = args.headOption.getOrElse("/tmp/fp_dump.txt")
    val spark = GraftSession.local(cpus)
    val keys =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    val w = new java.io.PrintWriter(out)
    keys.sorted.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (args.length > 1) {
        // Full normalized plan text for diffing — the EXACT string the
        // fingerprint hashes, via the shared normalizer.
        val txt = try Bench.normalizedPlanText(fn(spark, sfDir))
        catch { case e: Throwable => s"ERR:$e" }
        w.println(s"==== $name\n$txt")
      } else {
        val fp =
          try {
            val df = fn(spark, sfDir)
            val shape = Bench.planTextShapeViolations(
              Bench.normalizedPlanText(df))
            Bench.planFingerprint(df) +
              s" w:${Bench.widthFingerprint(df)}" +
              (if (shape.isEmpty) "" else shape.mkString(" SHAPE[", "; ", "]"))
          } catch { case e: Throwable => s"ERR:${e.getClass.getSimpleName}" }
        w.println(s"$name $fp")
      }
      Pins.clearAll()
    }
    w.close()
    spark.stop()
  }
}
