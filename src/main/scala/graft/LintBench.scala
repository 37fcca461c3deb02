package graft

/** Closing-sweep coverage + drift guard (r15 — driver round 12 — from
  * the driver-r11 post-mortem; drift trigger added r16 = driver round
  * 13 per the r12 verdict). Five keys once landed AFTER the round's
  * last full bench sweep, shipped untimed, and one of them
  * (multimodal_neardup) hung the driver's bench — the round closed
  * with no performance evidence at all. Separately, a key regressed
  * 1.38 → 1.93 s across two rounds and the hand-kept SURVEY watch
  * list went stale. This lint makes both checks mechanical, on the
  * NEWEST committed BENCH_DETAIL_r*.json:
  *
  *   - coverage: per-query key set == `SparkEntry.queries` (missing
  *     key, stale leftover key, no detail file, errored −1 reading);
  *   - budget: any reading over the 2 s per-query budget fails;
  *   - drift: a key whose last TWO rounds' readings both sit more
  *     than 0.3 s above its older cross-round minimum fails — one
  *     high reading is ambient load, two consecutive is a regression
  *     (quiet-run spread on this box is ±0.2 s; the retry passes in
  *     [[Bench]] already arbitrate single-round spikes).
  *
  * Run it after the closing `runMain graft.Bench`; the verify skill
  * carries it as the round-close step. No SparkSession — a plain file
  * scan, so it runs in milliseconds. Core is [[lint]] so LintBenchSpec
  * can drive it over planted fixture files.
  */
object LintBench {

  /** Per-query budget (seconds) — the repo-wide 2 s line. */
  val budgetSec = 2.0

  /** Drift slack over the older cross-round minimum (seconds). */
  val driftSlackSec = 0.3

  private val pair = """"([A-Za-z0-9_]+)":(-?[0-9]+(?:\.[0-9]+)?)""".r

  /** Same minimal scrape as Bench.crossRoundMins: every "name":number
    * pair in the file; summary numerics are excluded via the shared
    * [[Bench.summaryNumericFields]] constant (the summary line is
    * embedded in the detail artifact).
    */
  private def scrape(f: java.io.File): Map[String, Double] = {
    val txt = scala.io.Source.fromFile(f).mkString
    pair.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
      .filterNot { case (k, _) => Bench.summaryNumericFields(k) }
  }

  private def roundOf(f: java.io.File): Int =
    f.getName.stripPrefix("BENCH_DETAIL_r").stripSuffix(".json")
      .toIntOption.getOrElse(0)

  /** All failure messages for `details` (BENCH_DETAIL files, any
    * order) against the `declared` key set; empty = clean.
    */
  def lint(details: Seq[java.io.File], declared: Set[String]): Seq[String] = {
    if (details.isEmpty)
      return Seq("no BENCH_DETAIL_r*.json found")
    val byRound = details.map(f => roundOf(f) -> scrape(f)).sortBy(_._1)
    val (newestRound, swept) = byRound.last
    val missing = (declared -- swept.keySet).toSeq.sorted
    val errored = declared.toSeq.filter(k => swept.get(k).exists(_ < 0)).sorted
    val stale = (swept.keySet -- declared).toSeq.sorted
    val over = declared.toSeq
      .filter(k => swept.get(k).exists(v => v > budgetSec)).sorted
    // Drift: reading > (older min + slack) in BOTH of the two newest
    // rounds that timed the key. Needs at least one round of history
    // BEFORE those two for the baseline, so keys added in the last
    // two rounds can't trip it.
    val drift = declared.toSeq.sorted.flatMap { k =>
      val hist = byRound.flatMap { case (r, m) =>
        m.get(k).filter(_ >= 0).map(r -> _)
      }
      if (hist.size < 3) None
      else {
        val base = hist.dropRight(2).map(_._2).min
        val last2 = hist.takeRight(2)
        if (last2.forall(_._2 > base + driftSlackSec))
          Some(f"$k: ${last2.map(t => f"r${t._1}=${t._2}%.2f").mkString(",")} " +
            f"both > min $base%.2f + $driftSlackSec")
        else None
      }
    }
    Seq(
      if (missing.nonEmpty) Seq(s"missing=${missing.mkString(",")}") else Nil,
      if (errored.nonEmpty) Seq(s"errored=${errored.mkString(",")}") else Nil,
      if (stale.nonEmpty) Seq(s"stale=${stale.mkString(",")}") else Nil,
      if (over.nonEmpty)
        Seq(s"over-budget(>${budgetSec}s)=${over.map(k => f"$k=${swept(k)}%.2f").mkString(",")}")
      else Nil,
      if (drift.nonEmpty) Seq(s"drift: ${drift.mkString("; ")}") else Nil
    ).flatten.map(m => s"[r$newestRound] $m")
  }

  def main(args: Array[String]): Unit = {
    val details = Bench.benchFiles("BENCH_DETAIL_r\\d+\\.json")
    val failures = lint(details, SparkEntry.queries.keySet)
    if (failures.nonEmpty) {
      failures.foreach(m => System.err.println(s"LINT_BENCH FAIL: $m"))
      sys.exit(1)
    }
    println(s"LINT_BENCH OK: newest detail covers all " +
      s"${SparkEntry.queries.size} registered keys, none errored, " +
      s"none over ${budgetSec}s, no two-round drift")
  }
}
