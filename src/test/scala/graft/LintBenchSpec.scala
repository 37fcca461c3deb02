package graft

import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture drive of [[LintBench.lint]] (r16 = driver round 13,
  * r12 verdict #4): each failure mode is demonstrated on a fixture
  * built to trip exactly it, plus a clean set that must pass — the
  * drift trigger in particular is pinned to "BOTH of the last two
  * rounds above older-min + 0.3 s", with negative controls for a
  * single spike and for a key too new to have a baseline.
  */
class LintBenchSpec extends AnyFunSuite with SparkSpec {

  private def plant(dir: java.nio.file.Path, round: Int,
      entries: (String, Double)*): java.io.File = {
    val qs = entries.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    // Summary embedded exactly the way Bench.main writes it — the lint
    // must exclude its numeric fields via Bench.summaryNumericFields.
    val summary = s"""{"metric":"total","value":9.9,"unit":"sec",""" +
      s""""nqueries":${entries.size},"timed":${entries.size},""" +
      s""""errors":[],"retried":[],"loadavg_before":0.5,""" +
      s""""loadavg_after":0.6,"sf":"x"}"""
    val f = dir.resolve(s"BENCH_DETAIL_r$round.json").toFile
    val w = new java.io.PrintWriter(f)
    try w.println(s"""{"queries":$qs,"summary":$summary}""") finally w.close()
    f
  }

  private def fresh() = java.nio.file.Files.createTempDirectory("lintbench")

  test("clean history passes; embedded summary numerics are not stale keys") {
    val d = fresh()
    val files = Seq(
      plant(d, 1, "a" -> 0.5, "b" -> 0.5),
      plant(d, 2, "a" -> 0.55, "b" -> 0.62),
      plant(d, 3, "a" -> 0.6, "b" -> 0.5))
    assert(LintBench.lint(files, Set("a", "b")).isEmpty)
  }

  test("missing / errored / stale keys fail against the newest detail") {
    val d = fresh()
    val files = Seq(plant(d, 1, "a" -> 0.5, "b" -> -1.0, "zombie" -> 0.3))
    val msgs = LintBench.lint(files, Set("a", "b", "c")).mkString("\n")
    assert(msgs.contains("missing=c"), msgs)
    assert(msgs.contains("errored=b"), msgs)
    assert(msgs.contains("stale=zombie"), msgs)
  }

  test("a reading over the 2 s budget fails even with no history") {
    val d = fresh()
    val files = Seq(plant(d, 1, "a" -> 2.5, "b" -> 0.5))
    val msgs = LintBench.lint(files, Set("a", "b")).mkString("\n")
    assert(msgs.contains("over-budget") && msgs.contains("a=2.50"), msgs)
  }

  test("drift: two consecutive rounds above older-min + 0.3 fail; " +
    "a single spike or a two-round-old key do not") {
    val d = fresh()
    // a regresses 1.0 → 1.4 → 1.45 (both last rounds over 1.3) = drift;
    // b spikes once then recovers = clean; n has only 2 rounds = clean.
    val files = Seq(
      plant(d, 1, "a" -> 1.0, "b" -> 1.0),
      plant(d, 2, "a" -> 1.4, "b" -> 1.9, "n" -> 1.0),
      plant(d, 3, "a" -> 1.45, "b" -> 1.05, "n" -> 1.9))
    val msgs = LintBench.lint(files, Set("a", "b", "n"))
    assert(msgs.size == 1 && msgs.head.contains("drift") &&
      msgs.head.contains("a:"), msgs.mkString("\n"))
    assert(!msgs.head.contains("b:") && !msgs.head.contains("n:"),
      msgs.mkString("\n"))
  }

  test("no detail file at all fails") {
    assert(LintBench.lint(Seq.empty, Set("a")).nonEmpty)
  }

  test("min-merge: a prior reading survives only under a matching plan " +
    "fingerprint (r15 verdict #3 — stale-prior invalidation)") {
    // Prior file: both keys timed fast, fingerprints committed.
    val priorTxt =
      """{"queries":{"a":0.40,"b":0.50,"c":0.30},""" +
        """"plans":{"a":"aaaa11","b":"bbbb22","c":"cccc33"},""" +
        """"summary":{"metric":"total","value":1.2}}"""
    // This run: a unchanged (same fingerprint) but slower — prior min
    // survives; b re-implemented mid-round (fingerprint changed) —
    // prior reading is evidence for dead code and must be dropped;
    // c errored this run — the -1 sentinel always wins the merge.
    val current = Seq("a" -> 0.55, "b" -> 0.80, "c" -> -1.0)
    val plans = Map("a" -> "aaaa11", "b" -> "ffff99", "c" -> "cccc33")
    val merged = Bench.mergeDetail(current, plans, priorTxt,
      Set("a", "b", "c")).toMap
    assert(merged("a") == 0.40, "matching fingerprint: min-merge applies")
    assert(merged("b") == 0.80, "changed fingerprint: prior invalidated")
    assert(merged("c") == -1.0, "current error sentinel always wins")
  }

  test("cross-round seed (r17 verdict #1): the previous round's reading " +
    "survives only under a matching fingerprint; a changed plan rejects " +
    "the carry and the error sentinel still always wins") {
    // Same-round prior: both keys re-ran this round already.
    val sameRound =
      """{"queries":{"a":0.50,"b":0.45},""" +
        """"plans":{"a":"aaaa11","b":"bbbb22"},""" +
        """"summary":{"metric":"total","value":0.95}}"""
    // Previous round's board: quieter readings for all three keys —
    // but b's plan changed between rounds (its r-1 fingerprint is for
    // code that no longer exists) and c errors THIS run.
    val prevRound =
      """{"queries":{"a":0.40,"b":0.30,"c":0.20},""" +
        """"plans":{"a":"aaaa11","b":"ffff99","c":"cccc33"},""" +
        """"summary":{"metric":"total","value":0.90}}"""
    val current = Seq("a" -> 0.55, "b" -> 0.60, "c" -> -1.0)
    val plans = Map("a" -> "aaaa11", "b" -> "bbbb22", "c" -> "cccc33")
    val merged = Bench.seedFromPriors(current, plans,
      Seq(sameRound, prevRound), Set("a", "b", "c")).toMap
    assert(merged("a") == 0.40,
      "unchanged fingerprint: the prior round's quiet minimum seeds the board")
    assert(merged("b") == 0.45,
      "changed fingerprint: the cross-round carry is rejected but the " +
        "matching same-round prior still min-merges")
    assert(merged("c") == -1.0, "current error sentinel always wins")
  }

  test("min-merge: an old-format prior file (no plans section) cannot " +
    "prove what it measured — all prior readings are dropped") {
    val priorTxt = """{"queries":{"a":0.40},""" +
      """"summary":{"metric":"total","value":0.4}}"""
    val merged = Bench.mergeDetail(Seq("a" -> 0.55),
      Map("a" -> "aaaa11"), priorTxt, Set("a")).toMap
    assert(merged("a") == 0.55)
  }

  test("plan fingerprints are stable across plan rebuilds for the same " +
    "code and differ across plans") {
    import spark.implicits._
    def build() = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .filter(org.apache.spark.sql.functions.col("id") > 0)
      .groupBy("v").count()
    val a1 = Bench.planFingerprint(build())
    val a2 = Bench.planFingerprint(build()) // rebuild → fresh exprIds
    assert(a1 == a2, "exprId churn must not change the fingerprint")
    val other = Bench.planFingerprint(
      Seq((1L, "x")).toDF("id", "v").groupBy("id").count())
    assert(other != a1, "a different plan must fingerprint differently")
  }

  test("fingerprints are core-count independent: an env-derived " +
    "repartition width must not split fingerprints across environments") {
    // r16 verdict #1: the builder's and the driver's JVMs run
    // different local[N]; T.spread-style repartition(defaultParallelism)
    // put that N into the plan text and 20 keys' committed quiet minima
    // were discarded by the driver's loaded re-run. The normalizer now
    // masks partition WIDTHS (the plan SHAPE still fingerprints).
    import spark.implicits._
    def build(n: Int) = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .repartition(n)
      .filter(org.apache.spark.sql.functions.col("id") > 0)
    assert(Bench.planFingerprint(build(8)) == Bench.planFingerprint(build(32)),
      "8-core and 32-core spreads must fingerprint identically")
    val noSpread = Seq((1L, "x")).toDF("id", "v")
      .filter(org.apache.spark.sql.functions.col("id") > 0)
    assert(Bench.planFingerprint(build(8)) != Bench.planFingerprint(noSpread),
      "masking the width must not erase the Repartition node itself")
    // The width-SENSITIVE secondary hash (r17 advice #1) sees exactly
    // what the merge fingerprint masks: a width change — so a
    // same-environment FpDump diff across code versions can name a
    // deliberate repartition-count change.
    assert(Bench.widthFingerprint(build(8)) != Bench.widthFingerprint(build(32)),
      "the width hash must expose a repartition-width change")
    assert(Bench.widthFingerprint(build(8)) == Bench.widthFingerprint(build(8)),
      "same width, same code: the width hash is stable")
  }

  test("plan-text shape lint flags env-variant residue classes") {
    assert(Bench.planTextShapeViolations("Filter (id#x > 0)").isEmpty)
    assert(Bench.planTextShapeViolations("Repartition 32, true").nonEmpty,
      "unmasked core count must be flagged")
    assert(Bench.planTextShapeViolations(
      "Exchange RoundRobinPartitioning(8), REPARTITION_BY_NUM").nonEmpty)
    assert(Bench.planTextShapeViolations(
      "Exchange hashpartitioning(k#x, 32)").nonEmpty,
      "a cached shuffle fragment's partition count must be flagged " +
        "so it gets normalized, not silently split fingerprints")
    assert(Bench.planTextShapeViolations(
      "Location: InMemoryFileIndex[file:/tmp/graft_stage_x]").nonEmpty,
      "tmpdir scratch paths are env-variant")
    assert(Bench.planTextShapeViolations(
      "Location: InMemoryFileIndex[file:/root/testdata/sf0.1/x.parquet]")
      .isEmpty, "input fixture paths are the contract, allowed")
    assert(Bench.planTextShapeViolations(
      "genesis-cube(/tmp/graft_cube_12411_mini.csv)").isEmpty,
      "the cube DataSource's deterministic staged fixtures are allowed")
    assert(Bench.planTextShapeViolations("Filter (id#1 > 0)").nonEmpty,
      "raw exprIds mean the text was never normalized")
  }

  test("an accepted-floor re-pin clears an adjudicated regression; " +
    "readings above the re-pinned floor + slack still drift") {
    val d = fresh()
    // a's floor legitimately rose 1.0 → ~1.45 (adjudicated): without a
    // re-pin this history fails every round forever (r13 advice).
    val files = Seq(
      plant(d, 1, "a" -> 1.0),
      plant(d, 2, "a" -> 1.4),
      plant(d, 3, "a" -> 1.45))
    assert(LintBench.lint(files, Set("a"), Map.empty).nonEmpty,
      "control: without the re-pin this history must drift-fail")
    assert(LintBench.lint(files, Set("a"), Map("a" -> 1.45)).isEmpty,
      "re-pinned floor 1.45 clears readings within slack of it")
    // But the re-pin is a floor, not a waiver: one round above
    // floor + slack is a spike (clean); two consecutive fail again.
    val spike = files :+ plant(d, 4, "a" -> 1.8)
    assert(LintBench.lint(spike, Set("a"), Map("a" -> 1.45)).isEmpty,
      "one round over the accepted floor + slack is still a spike")
    val regressed = spike :+ plant(d, 5, "a" -> 1.82)
    assert(LintBench.lint(regressed, Set("a"), Map("a" -> 1.45)).nonEmpty,
      "two rounds > accepted floor + slack must still fail")
  }
}
