package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The library's front door — one documented entry point re-exporting
  * every reusable operator so a caller never has to know the module
  * layout. Each member is an alias (a `val` bound to the implementing
  * method): zero indirection at runtime, and the Scaladoc on the
  * implementing object stays the single source of truth.
  *
  * Grouped the way a user asks for them:
  *
  * Aliases are eta-expanded FUNCTION VALUES, so arguments are
  * positional and complete (no names/defaults — the tradeoff for the
  * implementing object keeping the one Scaladoc source of truth; call
  * the implementing method directly when defaults matter):
  *
  * {{{
  * import graft.Graft
  * val spark = Graft.session(8)
  *
  * // temporal join: latest quote at-or-before each trade, per symbol
  * Graft.asofJoin(trades, quotes, "sym", "sym", "t", "qt", "px", false)
  *
  * // skew survival: lineitem ⋈ supplier on a hot key, salt 8
  * Graft.saltedJoin(big, "l_suppkey", dim, "s_suppkey", 8)
  *
  * // corpus curation: quality ≥ 1.0, near-dup Jaccard 0.35, no df cap
  * val kept  = Graft.curate(docs, 1.0, 0.35, None)
  * val clean = Graft.decontaminate(kept, benchmark, 5)
  * val bins  = Graft.packSequences(clean, 512, 8)
  *
  * // similarity search: top-10 over 16 IVF cells
  * Graft.knnIvf(embeddings, 10, 16)
  * }}}
  *
  * The driver-facing query catalog (the 244 `SparkEntry.queries` keys)
  * sits one level up and is built FROM these pieces — this object is
  * the programmatic surface.
  */
object Graft {

  /** Tuned local session: UTC, ns-parquet compat, core-sized shuffle
    * partitions (see [[GraftSession]]). */
  def session(cores: Int): SparkSession = GraftSession.local(cores)

  // ---- table & determinism helpers ---------------------------------
  /** Exact-arithmetic cast for money-scale aggregation ([[T.dec]]). */
  def dec(c: Column): Column = T.dec(c)
  /** Rounded-double emit form of a decimal aggregate ([[T.money]]). */
  def money(c: Column): Column = T.money(c)
  /** Normalize an events-style `ts` of any fixture vintage
    * ([[T.normalizeTs]]). */
  def normalizeTs(df: DataFrame, col: String = "ts"): DataFrame =
    T.normalizeTs(df, col)

  // ---- temporal joins ----------------------------------------------
  /** As-of join: latest right row at-or-before each left timestamp
    * ([[operators.AsOf.asofJoin]]). */
  val asofJoin = operators.AsOf.asofJoin _
  /** Nearest-in-time join, either direction, pinned ties
    * ([[operators.AsOf.nearestJoin]]). */
  val nearestJoin = operators.AsOf.nearestJoin _

  /** Blocked fuzzy best-match within an edit distance
    * ([[operators.JoinOps.fuzzyMatch]]). */
  val fuzzyMatch = operators.JoinOps.fuzzyMatch _
  /** Binned range join: points ∈ intervals without a BNLJ
    * ([[operators.RangeBin.binnedRangeJoin]]). */
  val binnedRangeJoin = operators.RangeBin.binnedRangeJoin _
  /** Binned interval-overlap join ([[operators.RangeBin.binnedIntervalJoin]]). */
  val binnedIntervalJoin = operators.RangeBin.binnedIntervalJoin _

  // ---- skew survival -----------------------------------------------
  /** Salted two-stage aggregation ([[operators.Skew.saltedSumCount]]). */
  val saltedSumCount = operators.Skew.saltedSumCount _
  /** Salted big⋈small join ([[operators.Skew.saltedJoin]]). */
  val saltedJoin = operators.Skew.saltedJoin _

  // ---- time series -------------------------------------------------
  /** Dense per-entity time grid ([[operators.TimeSeries.denseGrid]]). */
  val denseGrid = operators.TimeSeries.denseGrid _
  /** Exact capped EWMA smoothing ([[operators.TimeSeries.ewmaCapped]]). */
  val ewma = operators.TimeSeries.ewmaCapped _

  /** N-step ordered conversion funnel
    * ([[operators.WindowOps.funnelTimes]]). */
  val funnelTimes = operators.WindowOps.funnelTimes _
  /** Cohort retention triangle
    * ([[operators.WindowOps.retentionTriangle]]). */
  val retentionTriangle = operators.WindowOps.retentionTriangle _
  /** Gaps-and-islands consecutive runs ([[operators.WindowOps.islands]]). */
  val islands = operators.WindowOps.islands _
  /** Markov transition counts + mean gaps between consecutive events
    * ([[operators.WindowOps.transitionMatrix]]). */
  val transitionMatrix = operators.WindowOps.transitionMatrix _
  /** SCD Type-2 change-history compression
    * ([[operators.DomainOps.scd2Compress]]). */
  val scd2Compress = operators.DomainOps.scd2Compress _
  /** Point-in-time fact⋈dimension-version lookup
    * ([[operators.DomainOps.pitLookup]]). */
  val pitLookup = operators.DomainOps.pitLookup _
  /** Exact mergeable bitmap distinct counts
    * ([[operators.AggOps.bitmapDistinct]]). */
  val bitmapDistinct = operators.AggOps.bitmapDistinct _
  /** Per-group OLS fit from exact decimal moments
    * ([[operators.AggOps.linregFit]]). */
  val linregFit = operators.AggOps.linregFit _
  /** One-pass pairwise Pearson correlation matrix
    * ([[operators.AggOps.corrMatrix]]). */
  val corrMatrix = operators.AggOps.corrMatrix _
  /** One-way ANOVA F from one-pass conditional moments
    * ([[operators.AggOps.oneWayF]]). */
  val oneWayF = operators.AggOps.oneWayF _
  /** Exact rank-formula Gini concentration per group
    * ([[operators.AggOps.giniIndex]]). */
  val giniIndex = operators.AggOps.giniIndex _
  /** Chi-squared independence test over a contingency table
    * ([[operators.AggOps.chiSquare]]). */
  val chiSquare = operators.AggOps.chiSquare _
  /** Per-group skewness/kurtosis from staged exact moments
    * ([[operators.AggOps.momentStats]]). */
  val momentStats = operators.AggOps.momentStats _
  /** Per-entity lag-k autocorrelation battery
    * ([[operators.TimeSeries.autocorr]]). */
  val autocorr = operators.TimeSeries.autocorr _
  /** Trailing exact median/min/max band
    * ([[operators.TimeSeries.rollingBand]]). */
  def rollingBand(df: DataFrame,
      w: org.apache.spark.sql.expressions.WindowSpec,
      width: Int = 7): DataFrame =
    operators.TimeSeries.rollingBand(df, w, width)
  /** Holt level+trend smoothing state per series
    * ([[operators.TimeSeries.holtSmooth]]). */
  val holtSmooth = operators.TimeSeries.holtSmooth _
  /** Hour-bucketed lagged cross-correlation between two streams
    * ([[operators.TimeSeries.crossCorr]]). */
  val crossCorr = operators.TimeSeries.crossCorr _
  /** Wald–Wolfowitz runs test per entity
    * ([[operators.TimeSeries.runsTest]]). */
  val runsTest = operators.TimeSeries.runsTest _
  /** CUSUM drift excursions via the windowed prefix-sum identity
    * ([[operators.TimeSeries.cusumExcursions]]). */
  val cusumExcursions = operators.TimeSeries.cusumExcursions _
  /** One-step-ahead EWMA forecast backtest (MAE/bias/RMSE)
    * ([[operators.TimeSeries.forecastEval]]). */
  val forecastEval = operators.TimeSeries.forecastEval _

  // ---- data quality ------------------------------------------------
  /** Per-column completeness/cardinality/range profile
    * ([[operators.DomainOps.dqProfile]]). */
  val dqProfile = operators.DomainOps.dqProfile _
  /** Declarative rule → violation-count checks
    * ([[operators.DomainOps.dqChecks]]). */
  def dqChecks(df: DataFrame, rules: Seq[(String, Column)],
      uniqueKey: Option[(String, Column)] = None): DataFrame =
    operators.DomainOps.dqChecks(df, rules, uniqueKey)
  /** Two-revision cube cell diff ([[plans.CubeOps.cellDiff]]). */
  val cellDiff = plans.CubeOps.cellDiff _
  /** Cross-table referential-integrity audit
    * ([[operators.DomainOps.fkCheck]]). */
  val fkCheck = operators.DomainOps.fkCheck _

  // ---- graph analytics ---------------------------------------------
  /** Integer-scaled PageRank ([[llm.LlmGraph.pagerank]]). */
  val pagerank = llm.LlmGraph.pagerank _
  /** Min-label connected components ([[llm.LlmGraph.components]]). */
  def components(edges: DataFrame, maxRounds: Int = 25): DataFrame =
    llm.LlmGraph.components(edges, maxRounds)
  /** Degree-oriented triangle counts ([[llm.LlmGraph.triangleCounts]]). */
  val triangleCounts = llm.LlmGraph.triangleCounts _
  /** Fixed-round deterministic label-propagation communities
    * ([[llm.LlmGraph.labelPropagation]]). */
  def labelPropagation(edges: DataFrame, rounds: Int,
      assumeSimple: Boolean = false): DataFrame =
    llm.LlmGraph.labelPropagation(edges, rounds, assumeSimple)
  /** Capped-depth min-hop distance from a seed set
    * ([[llm.LlmGraph.seedDistance]]). */
  def seedDistance(edges: DataFrame, isSeed: Column, depth: Int,
      assumeSimple: Boolean = false): DataFrame =
    llm.LlmGraph.seedDistance(edges, isSeed, depth, assumeSimple)
  /** Wedge-bounded neighborhood Jaccard similarity
    * ([[llm.LlmGraph.jaccardPairs]]). */
  val jaccardPairs = llm.LlmGraph.jaccardPairs _
  /** Fixed-round k-core peel ([[llm.LlmGraph.kcorePeel]]). */
  val kcorePeel = llm.LlmGraph.kcorePeel _
  /** Degree assortativity over mirrored endpoint degrees
    * ([[llm.LlmGraph.degreeAssortativity]]). */
  val degreeAssortativity = llm.LlmGraph.degreeAssortativity _
  /** Per-node local clustering coefficient
    * ([[llm.LlmGraph.clusteringCoeff]]). */
  val clusteringCoeff = llm.LlmGraph.clusteringCoeff _
  /** Log2-bucketed degree histogram
    * ([[llm.LlmGraph.degreeHistogram]]). */
  val degreeHistogram = llm.LlmGraph.degreeHistogram _

  // ---- dedup family ------------------------------------------------
  /** Shingle-Jaccard near-dup pairs ([[llm.LlmDedup.ngramPairs]]). */
  val ngramPairs = llm.LlmDedup.ngramPairs _
  /** Banded-LSH MinHash pairs ([[llm.LlmDedup.minhashPairs]]). */
  val minhashPairs = llm.LlmDedup.minhashPairs _
  /** SimHash band pairs ([[llm.LlmDedup.simhashPairs]]). */
  val simhashPairs = llm.LlmDedup.simhashPairs _
  /** Pair list → duplicate clusters
    * ([[llm.LlmDedup.connectedComponents]]). */
  val dedupClusters = llm.LlmDedup.connectedComponents _
  /** Streaming exact dedup ([[llm.LlmDedup.streamingExactDedup]]). */
  val streamingExactDedup = llm.LlmDedup.streamingExactDedup _
  /** URL-canonicalization dedup ([[llm.LlmDedup.urlDedup]]). */
  val urlDedup = llm.LlmDedup.urlDedup _
  /** Chunk-level keep-one-copy passage dedup
    * ([[llm.LlmDedup.chunkDedup]]). */
  val chunkDedup = llm.LlmDedup.chunkDedup _
  /** Embedding-cosine near-dup pairs ([[llm.LlmVector.embedDupPairs]]). */
  val embedDupPairs = llm.LlmVector.embedDupPairs _
  /** Streaming near-dup membership over first-seen LSH bucket owners
    * ([[streaming.StreamOps.nearDupFlags]] batch form;
    * [[streaming.StreamOps.nearDupPostingHits]] is the readStream
    * hop). */
  val nearDupFlags = streaming.StreamOps.nearDupFlags _

  // ---- tokenization ------------------------------------------------
  /** Learned top-10 char-pair merge table ([[llm.LlmText.bpeMergeTable]]). */
  val bpeMergeTable = llm.LlmText.bpeMergeTable _
  /** Greedy sequential BPE encode under a ranked merge table
    * ([[llm.LlmText.bpeEncode]]). */
  val bpeEncode = llm.LlmText.bpeEncode _

  // ---- similarity search -------------------------------------------
  /** Brute-force cosine top-k, blocked ([[llm.LlmVector.knnBrute]]). */
  val knnBrute = llm.LlmVector.knnBrute _
  /** Sign-LSH bucketed ANN ([[llm.LlmVector.knnLsh]]). */
  val knnLsh = llm.LlmVector.knnLsh _
  /** IVF cell-probed ANN ([[llm.LlmVector.knnIvf]]). */
  def knnIvf(emb: DataFrame, k: Int, nCells: Int): DataFrame =
    llm.LlmVector.knnIvf(emb, k, nCells)
  /** Multi-probe IVF ([[llm.LlmVector.knnIvfProbe]]). */
  val knnIvfProbe = llm.LlmVector.knnIvfProbe _
  /** IVF + product-quantization ADC search over a built index
    * ([[llm.LlmVector.knnIvfPqSearch]]). */
  val knnIvfPqSearch = llm.LlmVector.knnIvfPqSearch _
  /** Two-stage PQ-shortlist → exact-rerank serving
    * ([[llm.LlmVector.knnRerank]]). */
  val knnRerank = llm.LlmVector.knnRerank _

  // ---- corpus pipeline ---------------------------------------------
  /** Quality gate → dedup → near-dup drop → accounting
    * ([[llm.CorpusPipeline.curate]]). */
  val curate = llm.CorpusPipeline.curate _
  /** Benchmark decontamination ([[llm.CorpusPipeline.decontaminate]]). */
  val decontaminate = llm.CorpusPipeline.decontaminate _
  /** Target-proportion corpus mixing ([[llm.CorpusPipeline.corpusMix]]). */
  val corpusMix = llm.CorpusPipeline.corpusMix _
  /** Deterministic train/val/test split
    * ([[llm.CorpusPipeline.trainValTestSplit]]). */
  val trainValTestSplit = llm.CorpusPipeline.trainValTestSplit _
  /** Greedy token-budget sequence packing
    * ([[llm.CorpusPipeline.packSequences]]). */
  val packSequences = llm.CorpusPipeline.packSequences _
  /** Weight-proportional (PPS) Bernoulli sampling
    * ([[llm.CorpusPipeline.ppsSample]]). */
  val ppsSample = llm.CorpusPipeline.ppsSample _
  /** Class-balanced exact downsample by md5 rank
    * ([[llm.CorpusPipeline.balancedSample]]). */
  val balancedSample = llm.CorpusPipeline.balancedSample _
  /** Benchmark-side contamination audit
    * ([[llm.CorpusPipeline.contaminationReport]]). */
  val contaminationReport = llm.CorpusPipeline.contaminationReport _
  /** Banded perceptual-hash 1-NN near-dup for media assets
    * ([[llm.Multimodal.phashNearDup]]). */
  val phashNearDup = llm.Multimodal.phashNearDup _
  /** Directed shingle-containment (quotation/excerpt) pairs
    * ([[llm.LlmDedup.containmentPairs]]). */
  val containmentPairs = llm.LlmDedup.containmentPairs _
  /** Banded candidate signature pairs over distinct phash signatures
    * ([[llm.Multimodal.phashSigPairs]]). */
  val phashSigPairs = llm.Multimodal.phashSigPairs _
  /** Association rules (support/confidence/lift) over item baskets
    * ([[llm.LlmGraph.assocRules]]). */
  val assocRules = llm.LlmGraph.assocRules _
  /** Budgeted quality-ranked corpus selection
    * ([[llm.CorpusPipeline.selectBudget]]). */
  val selectBudget = llm.CorpusPipeline.selectBudget _
  /** Time-decayed counts per group ([[operators.AggOps.decayedCounts]]). */
  val decayedCounts = operators.AggOps.decayedCounts _
  /** Per-year national market share, the Q8 snowflake macro
    * ([[operators.AggOps.marketShare]]). */
  val marketShare = operators.AggOps.marketShare _
  /** Streaming-shaped curation: gate → first-seen exact → near-dup
    * drop ([[streaming.StreamOps.curateStream]]). */
  val curateStream = streaming.StreamOps.curateStream _
  /** PSI distribution drift between two populations
    * ([[operators.DomainOps.psiDrift]]). */
  val psiDrift = operators.DomainOps.psiDrift _

  // ---- streaming state ---------------------------------------------
  /** Cross-batch running counts ([[streaming.StreamOps.runningCountsTWS]]). */
  val runningCounts = streaming.StreamOps.runningCountsTWS _
  /** Cross-batch CDC upsert state ([[streaming.StreamOps.cdcState]]). */
  val cdcState = streaming.StreamOps.cdcState _
  /** Cross-batch consecutive-event transition stream
    * ([[streaming.StreamOps.transitionStream]]). */
  val transitionStream = streaming.StreamOps.transitionStream _

  // ---- write-side layout -------------------------------------------
  /** Partitioned parquet with skew file-splitting
    * ([[sources.Sinks.writePartitioned]]). */
  val writePartitioned = sources.Sinks.writePartitioned _
  /** Sorted-within-files layout for range pruning
    * ([[sources.Sinks.writeSorted]]). */
  val writeSorted = sources.Sinks.writeSorted _
  /** Bucketed table for shuffle-free joins
    * ([[sources.Sinks.writeBucketed]]). */
  val writeBucketed = sources.Sinks.writeBucketed _
  /** Checkpointed exactly-once streaming parquet sink
    * ([[sources.Sinks.streamToParquet]]). */
  val streamToParquet = sources.Sinks.streamToParquet _
}
