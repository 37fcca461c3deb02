package graft

/** Closing-sweep coverage guard (r15 — driver round 12 — from the driver-r11 post-mortem): five
  * keys landed AFTER the round's last full bench sweep, shipped
  * untimed, and one of them (multimodal_neardup) hung the driver's
  * bench — the round closed with no performance evidence at all. This
  * lint makes "every registered key was swept at sf0.1" mechanical:
  * it diffs the NEWEST committed BENCH_DETAIL_r*.json's per-query key
  * set against `SparkEntry.queries` and exits non-zero on any drift
  * (missing key, stale leftover key, no detail file, or an errored
  * −1 reading). Run it after the closing `runMain graft.Bench`; the
  * verify skill carries it as the round-close step. No SparkSession —
  * a plain file scan, so it runs in milliseconds.
  */
object LintBench {
  def main(args: Array[String]): Unit = {
    val dirs = Seq(new java.io.File("."), new java.io.File("/root/repo"))
    val details = dirs.flatMap(d => Option(d.listFiles()).toSeq.flatten)
      .filter(_.getName.matches("BENCH_DETAIL_r\\d+\\.json")).distinct
    if (details.isEmpty) {
      System.err.println("LINT_BENCH FAIL: no BENCH_DETAIL_r*.json found")
      sys.exit(1)
    }
    val newest = details.maxBy(f =>
      f.getName.stripPrefix("BENCH_DETAIL_r").stripSuffix(".json")
        .toIntOption.getOrElse(0))
    val txt = scala.io.Source.fromFile(newest).mkString
    // Same minimal scrape as Bench.crossRoundMins: every "name":number
    // pair inside the queries map (summary fields like "value" are not
    // query names and drop out in the set diff).
    val pair = """"([A-Za-z0-9_]+)":(-?[0-9]+(?:\.[0-9]+)?)""".r
    val swept = pair.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val declared = SparkEntry.queries.keySet
    val missing = (declared -- swept.keySet).toSeq.sorted
    val errored = declared.toSeq.filter(k => swept.get(k).exists(_ < 0)).sorted
    val stale = (swept.keySet -- declared).toSeq.sorted
      .filterNot(Set("value", "nqueries", "timed", "loadavg_before",
        "loadavg_after")) // summary numerics embedded in the same file
    if (missing.nonEmpty || errored.nonEmpty || stale.nonEmpty) {
      System.err.println(s"LINT_BENCH FAIL (${newest.getName}): " +
        s"missing=${missing.mkString(",")} errored=${errored.mkString(",")} " +
        s"stale=${stale.mkString(",")}")
      sys.exit(1)
    }
    println(s"LINT_BENCH OK: ${newest.getName} covers all " +
      s"${declared.size} registered keys, none errored")
  }
}
