package graft.llm

import graft.T
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.12 Similarity search over embedding columns (Array[Float]).
  *
  * Two tiers, same output shape:
  *   - `knn_cosine`: exact brute-force top-k, label-blocked — the
  *     quadratic-per-block baseline; dot products use the native
  *     codegen'd [[graft.functions.DotProduct]] expression.
  *   - `knn_ann`: sign-LSH (axis hyperplanes over the leading dims)
  *     bucketing, then exact scoring within buckets — the scale path:
  *     candidate generation is an equi-join on the bucket code, never
  *     all-pairs. Identical vectors always share a bucket, so
  *     exact-duplicate retrieval has recall 1 by construction
  *     (asserted in LlmSpec).
  *
  * At 100 TB: block/bucket cardinality is the tuning knob; both plans
  * are (read → narrow map → one equi-join shuffle → window) with no
  * driver-side state.
  */
object LlmVector {
  type Q = (SparkSession, String) => DataFrame

  // Codegen'd native expression (graft.functions.DotProduct): the dot
  // product is the innermost per-candidate-pair loop — the one place a
  // higher-order `aggregate(zip_with(...))` (interpreted, per-lambda
  // dispatch) measurably hurts. Same left-to-right double accumulation
  // → bit-identical results to the higher-order form (asserted in
  // VectorExprSpec).
  private def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Exact top-k cosine neighbors within same-`block` groups. */
  def knnBrute(emb: DataFrame, k: Int, block: String): DataFrame = {
    graft.functions.VectorExpressions.register(emb.sparkSession)
    val withNorm = graft.T.spread(emb).withColumn("nrm", norm(col("embedding")))
    val l = withNorm.select(col(block).as("blk"), col("vec_id").as("v1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val r = withNorm.select(col(block).as("blk"), col("vec_id").as("v2"),
      col("embedding").as("e2"), col("nrm").as("n2"))
    val w = Window.partitionBy("v1").orderBy(desc("cos"), asc("v2"))
    l.join(r, Seq("blk")).filter(col("v1") =!= col("v2"))
      .withColumn("cos",
        round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("v1", "v2", "cos", "rank")
      .orderBy("v1", "rank")
  }

  /** Radius (range) similarity search: EVERY neighbor within
    * round-6 cosine ≥ `minCos` inside the block — the range query
    * next to [[knnBrute]]'s top-k (dedup sweeps and "find ALL near
    * matches" audits want every in-threshold neighbor, not a fixed
    * k). Same block equi-join candidate shape — never all-pairs;
    * output is threshold-bounded, and the gate compares the SAME
    * round-6 doubles both engines build, so the boundary is exact.
    * Returns (v1, v2, cos), both directions, ordered (v1, v2).
    */
  def knnRadius(emb: DataFrame, minCos: Double, block: String): DataFrame = {
    graft.functions.VectorExpressions.register(emb.sparkSession)
    val withNorm = graft.T.spread(emb)
      .withColumn("nrm", norm(col("embedding")))
    val l = withNorm.select(col(block).as("blk"), col("vec_id").as("v1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val r = withNorm.select(col(block).as("blk"), col("vec_id").as("v2"),
      col("embedding").as("e2"), col("nrm").as("n2"))
    l.join(r, Seq("blk")).filter(col("v1") =!= col("v2"))
      .withColumn("cos",
        round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
      .filter(col("cos") >= minCos)
      .select("v1", "v2", "cos")
      .orderBy("v1", "v2")
  }

  /** Sign-LSH bucket code over the first `nBits` dimensions. */
  private def signCode(e: Column, nBits: Int): Column =
    (0 until nBits).map { i =>
      when(element_at(e, i + 1) >= 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** Approximate top-k: exact scoring restricted to shared-bucket pairs. */
  def knnLsh(emb: DataFrame, k: Int, nBits: Int): DataFrame = {
    graft.functions.VectorExpressions.register(emb.sparkSession)
    val coded = graft.T.spread(emb)
      .withColumn("bucket", signCode(col("embedding"), nBits))
      .withColumn("nrm", norm(col("embedding")))
    val l = coded.select(col("bucket"), col("vec_id").as("v1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val r = coded.select(col("bucket"), col("vec_id").as("v2"),
      col("embedding").as("e2"), col("nrm").as("n2"))
    val w = Window.partitionBy("v1").orderBy(desc("cos"), asc("v2"))
    l.join(r, Seq("bucket")).filter(col("v1") =!= col("v2"))
      .withColumn("cos",
        round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("v1", "v2", "cos", "rank")
      .orderBy("v1", "rank")
  }

  /** Assign every vector to its best (max-cosine) centroid; ties break
    * on the lower centroid id.
    *
    * The centroid table is compiled INTO the plan as literals: one
    * codegen'd struct(csim, -cid) per centroid, argmax'd by
    * `array_max` (struct ordering = csim desc via max, then lowest cid
    * via the negated id). Assignment is therefore a NARROW projection —
    * no crossJoin, no exchange, no per-row lambda dispatch — which is
    * both the local-latency win (three passes share zero shuffles) and
    * the 100 TB shape (a broadcast join against a 16-row table only
    * adds an exchange-side hash probe for the same math). For very
    * large centroid counts (≫10³) the literal expression would
    * outgrow codegen — at that point switch to the broadcast-join
    * form; nCells here is the IVF coarse-quantizer knob, small by
    * design.
    */
  private def assign(emb: DataFrame, cents: Seq[(Long, Seq[Float])]): DataFrame = {
    val cand = cents.sortBy(_._1).map { case (cid, ce) =>
      // driver-side norm uses the same left-to-right double accumulation
      // as graft_dot(ce, ce) — bit-identical to the engine's own norm.
      val cnrm = math.sqrt(ce.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      struct(
        (dot(col("embedding"), lit(ce.toArray)) / (col("nrm") * lit(cnrm)))
          .as("csim"),
        lit(-cid).as("negcid"))
    }
    emb.withColumn("m", array_max(array(cand: _*)))
      .select((-col("m.negcid")).as("cell"), col("vec_id"),
        col("embedding"), col("nrm"))
  }

  /** Multi-probe variant of [[assign]]: emit each vector's top-`nprobe`
    * cells (sorted by the same (csim, -cid) order), one output row per
    * probed cell, with the probe rank `pr` attached (pr = 0 is the
    * argmax cell — identical to [[assign]]'s answer, so a rank-0
    * filter of this frame IS the home assignment). The query side of
    * an IVF search probes several nearby cells to recover neighbors
    * that fell just across a cell boundary — the standard IVF recall
    * knob.
    */
  private def probe(emb: DataFrame, cents: Seq[(Long, Seq[Float])],
      nprobe: Int): DataFrame = {
    val cand = cents.sortBy(_._1).map { case (cid, ce) =>
      val cnrm = math.sqrt(ce.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      struct(
        (dot(col("embedding"), lit(ce.toArray)) / (col("nrm") * lit(cnrm)))
          .as("csim"),
        lit(-cid).as("negcid"))
    }
    emb.select(col("vec_id"), col("embedding"), col("nrm"),
        posexplode(slice(reverse(array_sort(array(cand: _*))), 1, nprobe))
          .as(Seq("pr", "m")))
      .select((-col("m.negcid")).as("cell"), col("vec_id"),
        col("embedding"), col("nrm"), col("pr"))
  }

  /** IVF top-k with multi-probe: data vectors live in their single home
    * cell ([[assign]]); each QUERY vector probes its `nprobe` nearest
    * cells, and exact scoring runs over (probed cell = home cell)
    * candidate pairs. A pair can meet in at most one cell (the data
    * vector's home), so no distinct is needed. `nprobe = 1` is
    * [[knnIvf]]'s behavior; `nprobe = nCells` probes everything and is
    * EXACTLY brute force (asserted in LlmSpec) — recall interpolates
    * monotonically in between, at candidate cost ∝ nprobe/nCells of
    * the corpus.
    */
  def knnIvfProbe(emb: DataFrame, k: Int, nCells: Int, nprobe: Int,
      kmeansIters: Int = 2, fitFraction: Double = 1.0): DataFrame = {
    graft.functions.VectorExpressions.register(emb.sparkSession)
    val e = prepared(emb)
    searchIvfProbe(e, kMeansOn(e, nCells, kmeansIters, fitFraction),
      k, nprobe)
  }

  /** Search half of [[knnIvfProbe]], over an already-built index
    * (prepared frame + trained centroids).
    */
  /** Recall of `approx`'s (v1, v2) pairs against `truth`'s — one row
    * (n_pairs, n_hit, recall_at_3); shared by the two eval keys.
    *
    * `queryFrac < 1` evaluates on a deterministic hash-SAMPLE of query
    * vectors (the sample_* md5 contract: keep a query iff its 60-bit
    * md5 prefix clears the fraction, so the draw replays anywhere).
    * This is the 100 TB posture (r16 verdict residual (b)): exhaustive
    * ground truth is affordable per SAMPLED query but is a corpus
    * self-join if computed for EVERY query — a production recall
    * monitor samples ~10³-10⁴ queries and the estimate's error is
    * O(1/√n) regardless of corpus size. At a real deployment the
    * sample filter belongs UPSTREAM of the truth/approx searches
    * (both sides prune to sampled queries before any join); here
    * truth is filtered and the join prunes approx, which keeps the
    * driver-facing sf-scale keys exhaustive (queryFrac = 1, the
    * number the oracle replays) while the sampled estimator and its
    * proximity to full recall are spec'd in LlmSpec.
    */
  private[graft] def recallOf(truth: DataFrame, approx: DataFrame,
      queryFrac: Double = 1.0, seed: Int = 17): DataFrame = {
    require(queryFrac > 0.0 && queryFrac <= 1.0,
      s"queryFrac must be in (0, 1]: $queryFrac")
    val t =
      if (queryFrac >= 1.0) truth
      else {
        val two60 = BigInt(1) << 60
        val th =
          (BigInt(math.round(queryFrac * 1e6)) * two60 / 1000000).toLong
        truth.filter(concat(lit("0"),
          substring(md5(concat_ws(":", col("v1"), lit(seed))), 1, 15))
          < lit(f"$th%016x"))
      }
    t
      // shuffle_hash build on the approx side (guide §3.1): both sides
      // are k-bounded per query (≤ 3·|queries| rows of three longs), so
      // a per-partition hash build is safe at any scale and skips the
      // SMJ's per-side sort of both 3k-row frames.
      .join(approx.select(col("v1"), col("v2"), lit(1L).as("hit"))
          .hint("shuffle_hash"),
        Seq("v1", "v2"), "left")
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("n_pairs"), col("n_hit"),
        round(col("n_hit").cast("double") /
          col("n_pairs").cast("double"), 6).as("recall_at_3"))
      .orderBy("n_pairs")
  }

  /** The knn_recall evaluation as a library call with the sampled
    * posture exposed: recall@3 of the nprobe=1 IVF search against the
    * provably-brute-force nprobe=nCells ground truth, over all queries
    * (`queryFrac = 1`, the driver key) or a deterministic query sample
    * (the 100 TB monitoring form). */
  def ivfRecall(s: SparkSession, d: String,
      queryFrac: Double = 1.0): DataFrame = {
    val (e, cents) = ivfIndex(s, d, nCells = 16, iters = 2)
    recallOf(searchIvfProbe(e, cents, k = 3, nprobe = 16),
      searchIvf(e, cents, k = 3), queryFrac)
  }

  private def searchIvfProbe(e: DataFrame, cents: Seq[(Long, Seq[Float])],
      k: Int, nprobe: Int): DataFrame = {
    // ONE pass of the centroid battery instead of two: [[probe]]'s
    // exploded top-nprobe frame already CONTAINS the home assignment —
    // probe rank 0 is exactly [[assign]]'s argmax (same (csim, -cid)
    // order). So materialize the probed frame once and filter the data
    // side to rank 0, rather than running the 16-centroid projection
    // over the corpus separately per side (measured ~0.4 s at sf0.1).
    // Pins.repin, not bare persist: this is per-QUERY search product,
    // not index state — a bare persist leaked its entry and let later
    // identical calls silently read the warm cache, so Bench timed a
    // cache scan instead of the probe projection (r7 advice). The
    // deliberate cross-call cache is [[ivfIndex]]'s prepared corpus +
    // centroids only.
    val probed = graft.Pins.repin("llm.searchIvfProbe",
      probe(e, cents, nprobe))
    val l = probed.select(col("cell"), col("vec_id").as("v1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val r = probed.filter(col("pr") === 0).select(col("cell"),
      col("vec_id").as("v2"), col("embedding").as("e2"), col("nrm").as("n2"))
    val w = Window.partitionBy("v1").orderBy(desc("cos"), asc("v2"))
    l.join(r, Seq("cell")).filter(col("v1") =!= col("v2"))
      .withColumn("cos",
        round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("v1", "v2", "cos", "rank")
      .orderBy("v1", "rank")
  }

  /** Spread + norm + cache: every k-means pass re-reads this frame, so
    * pin it once. Lazy persist, not localCheckpoint: the first pass
    * populates the cache as a side effect (no dedicated materialization
    * job — measured ~0.5 s of pure job latency at sf0.1). At 100 TB
    * the same role is persist(DISK_ONLY) or write-and-reread —
    * iterating over a scan is the one pattern Lloyd can't avoid.
    */
  private def prepared(emb: DataFrame): DataFrame =
    graft.T.spread(emb).withColumn("nrm", norm(col("embedding")))
      .persist()

  /** Deterministic Lloyd k-means centroids, returned as a local table
    * (cid = seed vec_id, components float).
    *
    * Deliberate design points, all in service of engine-independent
    * determinism AND scale:
    *   - Seeds are the `nCells` lowest-id vectors (deterministic; a
    *     production variant would seed from a hash-ordered sample —
    *     same plan, different ORDER BY).
    *   - Each iteration re-assigns (the literal argmax projection of
    *     [[assign]] — a narrow linear pass, never all-pairs) and
    *     recomputes centroids as the
    *     per-position SUM of member vectors in DECIMAL(28,10): exact,
    *     so partition/merge order cannot perturb the result the way a
    *     double sum would. A sum-centroid is a positive scaling of the
    *     mean-centroid, and cosine is scale-invariant — so skipping
    *     the division sidesteps cross-engine decimal-division scale
    *     rules entirely.
    *   - Per-iteration driver materialization is nCells×dim cells
    *     (tiny, the broadcast table itself) — NOT data-sized; this is
    *     the legitimate driver-side use, like the cube header collect.
    *   - A cell that captures no vectors simply drops out (classic
    *     Lloyd); callers get ≤ nCells centroids.
    * `nIters = 0` returns the raw seeds — the coarse-quantization stub
    * and the baseline the k-means recall spec compares against.
    */
  def kMeansCentroids(emb: DataFrame, nCells: Int, nIters: Int,
      fitFraction: Double = 1.0): Seq[(Long, Seq[Float])] = {
    graft.functions.VectorExpressions.register(emb.sparkSession)
    kMeansOn(prepared(emb), nCells, nIters, fitFraction)
  }

  /** Lloyd loop over an already-prepared (vec_id, embedding, nrm)
    * frame. `fitFraction < 1` trains the centroids on a deterministic
    * hash-Bernoulli sample (a vector's membership depends only on its
    * own id — partitioning-invariant, same trick as
    * [[CorpusPipeline.stratifiedSample]]): centroid QUALITY needs a
    * representative sample, not the corpus, so at 100 TB the Lloyd
    * iterations run over fitFraction of the data and only the single
    * final assignment touches everything — the standard IVF training
    * recipe. 1.0 (the oracled keys' setting) fits on everything.
    */
  private def kMeansOn(e0: DataFrame, nCells: Int, nIters: Int,
      fitFraction: Double = 1.0): Seq[(Long, Seq[Float])] = {
    val e =
      if (fitFraction >= 1.0) e0
      else e0.filter(pmod(xxhash64(col("vec_id")), lit(1000000L))
        .cast("double") / 1000000.0 < fitFraction)
    // bounded-collect: IVF centroid seeds — exactly nCells rows (limit).
    var cents: Seq[(Long, Seq[Float])] = e.orderBy("vec_id").limit(nCells)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    for (_ <- 1 to nIters) {
      val sums = assign(e, cents)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        // explicit float→double→decimal ladder: both engines take the
        // identical widening path, so the rounded decimal agrees.
        // bounded-collect: centroid sums — nCells × dims post-agg rows.
        .agg(sum(col("x").cast("double")
          .cast(org.apache.spark.sql.types.DecimalType(28, 10))).as("sx"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDecimal(2)))
      cents = sums.groupBy(_._1).toSeq.sortBy(_._1).map { case (cid, ps) =>
        cid -> ps.sortBy(_._2).map(_._3.doubleValue.toFloat).toSeq
      }
    }
    cents
  }


  /** IVF-style approximate top-k: coarse-quantize every vector to its
    * nearest of ≤ `nCells` k-means centroids ([[kMeansCentroids]] —
    * exact-decimal Lloyd iterations, materialized before scoring), then
    * score exactly within cells (nprobe = 1). Assignment is the narrow
    * literal-argmax projection of [[assign]]; the candidate join is an
    * equi-join on cell id — never all-pairs.
    */
  def knnIvf(emb: DataFrame, k: Int, nCells: Int, kmeansIters: Int = 2,
      fitFraction: Double = 1.0): DataFrame = {
    graft.functions.VectorExpressions.register(emb.sparkSession)
    // one cached spread+norm frame feeds the Lloyd passes AND the
    // final assignment — without it each pass re-derives the scan.
    val e = prepared(emb)
    searchIvf(e, kMeansOn(e, nCells, kmeansIters, fitFraction), k)
  }

  /** Search half of [[knnIvf]], over an already-built index. */
  private def searchIvf(e: DataFrame, cents: Seq[(Long, Seq[Float])],
      k: Int): DataFrame = {
    // the final assignment feeds BOTH sides of the cell self-join;
    // pinned, the join probes one materialized narrow table instead of
    // running the argmax projection twice (measured ~2× on the join).
    // Pins.repin for the same reason as [[searchIvfProbe]]: per-query
    // product — bounded lifecycle, cold per invocation.
    val assigned = graft.Pins.repin("llm.searchIvf", assign(e, cents))
    val l = assigned.select(col("cell"), col("vec_id").as("v1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val r = assigned.select(col("cell"), col("vec_id").as("v2"),
      col("embedding").as("e2"), col("nrm").as("n2"))
    val w = Window.partitionBy("v1").orderBy(desc("cos"), asc("v2"))
    l.join(r, Seq("cell")).filter(col("v1") =!= col("v2"))
      .withColumn("cos",
        round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("v1", "v2", "cos", "rank")
      .orderBy("v1", "rank")
  }

  /** Deterministic L2 sub-quantizer codebook for one PQ subspace —
    * Lloyd over `sub(vec_id, sub)` with the same engine-independent
    * determinism ladder as [[kMeansOn]], except centroids are MEANS,
    * not sums: PQ reconstructs vectors from codebook entries, so the
    * entry's MAGNITUDE matters (a sum-centroid would scale each
    * subspace by its cell population and wreck the reconstruction;
    * cosine-only consumers never cared). The mean still dodges the
    * cross-engine decimal-division trap: the exact DECIMAL(28,10)
    * component sum casts to DOUBLE and divides by the integer member
    * count — double division is exactly rounded on both engines, so
    * the replay stays bit-identical.
    *
    * Assignment is argmin of `dot(c,c) − 2·dot(x,c)` (the L2 distance
    * minus the per-row constant ‖x‖², which cannot change the argmin
    * and — dropped on BOTH sides — cannot perturb float ties either),
    * ties to the smaller seed id. Returned centroids are ordered by
    * seed id; the POSITION in the returned seq is the PQ code.
    */
  private[graft] def pqCodebook(sub: DataFrame, nSub: Int,
      iters: Int, fitFraction: Double = 1.0): Seq[Seq[Float]] = {
    graft.functions.VectorExpressions.register(sub.sparkSession)
    // 100 TB training posture (r16, [[kMeansOn]]'s recipe brought to
    // the PQ tier): codebook QUALITY needs a representative sample,
    // not the corpus — `fitFraction < 1` trains each sub-quantizer on
    // a deterministic hash-Bernoulli subset (membership depends only
    // on vec_id: partitioning-invariant) and only code ASSIGNMENT
    // later touches every vector. Default 1.0 keeps the oracled keys
    // bit-identical; the sampled-vs-full recall property lives in
    // LlmSpec.
    val s0 =
      if (fitFraction >= 1.0) sub
      else sub.filter(pmod(xxhash64(col("vec_id")), lit(1000000L))
        .cast("double") / 1000000.0 < fitFraction)
    // bounded-collect: PQ codebook seeds — exactly nSub rows (limit).
    var cents: Seq[(Long, Seq[Float])] = s0.orderBy("vec_id").limit(nSub)
      .select("vec_id", "sub")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    // r13 advice: a sample smaller than the codebook silently yields a
    // SHRUNKEN code space (fewer seeds than codes) — refuse loudly; the
    // caller must raise fitFraction or shrink the codebook.
    require(cents.size == nSub,
      s"pqCodebook: training sample has ${cents.size} rows < nSub=$nSub " +
        s"centroids (fitFraction=$fitFraction too small for this corpus)")
    for (_ <- 1 to iters) {
      val cand = cents.sortBy(_._1).map { case (cid, ce) =>
        val cc = ce.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
        struct((lit(cc) - lit(2.0) * dot(col("sub"), lit(ce.toArray)))
          .as("d2"), lit(cid).as("cid"))
      }
      val sums = s0.withColumn("mm", array_min(array(cand: _*)))
        .select(col("mm.cid").as("cid"),
          posexplode(col("sub")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(sum(col("x").cast("double")
            .cast(org.apache.spark.sql.types.DecimalType(28, 10))).as("sx"),
          count(lit(1)).as("n"))
        // bounded-collect: codebook sums — nSub × sub-dims post-agg rows.
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDecimal(2), r.getLong(3)))
      // Carry the PREVIOUS centroid forward for a cell that attracted
      // zero points this iteration (r13 advice: dropping it shrank the
      // code space with no error — sampling raises the odds). With
      // every cell populated (the fitFraction=1.0 oracle fixtures)
      // this is byte-identical to the old rebuild-from-sums path.
      val updated = sums.groupBy(_._1).map { case (cid, ps) =>
        cid -> ps.sortBy(_._2)
          .map(p => (p._3.doubleValue / p._4).toFloat).toSeq
      }
      cents = cents.sortBy(_._1).map { case (cid, old) =>
        cid -> updated.getOrElse(cid, old)
      }
    }
    cents.sortBy(_._1).map(_._2)
  }

  /** PQ code (0-based position into `book`) for one subspace — the
    * same argmin/tiebreak as [[pqCodebook]]'s training assignment
    * (book position order IS seed-id order, so tie-to-smaller-j ≡
    * tie-to-smaller-cid). A narrow literal battery like [[assign]]:
    * no join, no exchange.
    */
  private[graft] def pqCode(subCol: Column, book: Seq[Seq[Float]]): Column =
    array_min(array(book.zipWithIndex.map { case (ce, j) =>
      val cc = ce.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      struct((lit(cc) - lit(2.0) * dot(subCol, lit(ce.toArray))).as("d2"),
        lit(j).as("j"))
    }: _*)).getField("j")

  /** Per-(session, dataset, params) PQ codebooks — cached for the same
    * reason as [[ivfIndex]]: codebook training is index BUILD, search
    * is the per-query product (FAISS trains once, serves many).
    */
  private val pqCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Seq[Seq[Seq[Float]]]]()

  private[graft] def pqBooks(s: SparkSession, d: String, e: DataFrame, m: Int,
      nSub: Int, iters: Int, fitFraction: Double = 1.0): Seq[Seq[Seq[Float]]] = {
    pqCache.keySet.removeIf { case (sess, _) => sess.sparkContext.isStopped }
    pqCache.computeIfAbsent((s, s"$d|$m|$nSub|$iters|$fitFraction"), _ => {
      val dim = 64
      val w = dim / m
      (0 until m).map { si =>
        pqCodebook(e.select(col("vec_id"),
          slice(col("embedding"), si * w + 1, w).as("sub")), nSub, iters,
          fitFraction)
      }
    })
  }

  /** IVF + product quantization — the canonical billion-scale ANN
    * memory layout (FAISS IVFPQ): the coarse quantizer bounds WHICH
    * vectors are candidates (home-cell equi-join, the [[knnIvf]]
    * economics) and PQ bounds WHAT the scan reads per candidate — a
    * few bytes of codes instead of the full vector (m sub-codes here;
    * at 100 TB the decisive difference between an in-memory index and
    * re-reading the corpus per query). Scoring is asymmetric (ADC):
    * the QUERY keeps its exact vector, each candidate is replaced by
    * its reconstruction — codebook entries concatenated by code — and
    * est_cos = dot(q, recon) / (‖q‖·‖recon‖). Everything after
    * training is narrow literal-battery column math + the one cell
    * equi-join; training is [[pqCodebook]]'s deterministic mean-Lloyd
    * per subspace.
    */
  def knnIvfPqSearch(e: DataFrame, cents: Seq[(Long, Seq[Float])],
      books: Seq[Seq[Seq[Float]]], k: Int): DataFrame = {
    val m = books.size
    val w = 64 / m
    def bookLookup(si: Int, code: Column) =
      element_at(array(books(si).map(ce => lit(ce.toArray)): _*),
        (code + 1).cast("int"))
    // Codes + the reconstruction norm are computed BEFORE the join;
    // the reconstruction itself AFTER it: the candidate side of the
    // cell shuffle then carries m small code ints + one double per
    // vector instead of the 64-float reconstruction — which is the
    // entire point of PQ (at 100 TB the in-cell scan streams codes,
    // not vectors; the codebooks ride along as plan literals exactly
    // like [[assign]]'s centroid battery).
    val recon = concat((0 until m).map(si =>
      bookLookup(si, col(s"c$si"))): _*)
    // One materialized frame feeds both join sides (the searchIvf
    // rationale — cold per invocation via Pins.repin); the query side
    // reads the exact vector columns, the candidate side the codes.
    val assigned = graft.Pins.repin("llm.searchIvfPq",
      assign(e, cents)
        .withColumns((0 until m).map(si => s"c$si" ->
          pqCode(slice(col("embedding"), si * w + 1, w), books(si))).toMap)
        .withColumn("rnrm", sqrt(dot(recon, recon))))
    val l = assigned.select(col("cell"), col("vec_id").as("v1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val r = assigned.select(col("cell") +: col("vec_id").as("v2") +:
      col("rnrm").as("n2") +: (0 until m).map(si => col(s"c$si")): _*)
    val wnd = Window.partitionBy("v1").orderBy(desc("est_cos"), asc("v2"))
    l.join(r, Seq("cell")).filter(col("v1") =!= col("v2"))
      .withColumn("est_cos",
        round(dot(col("e1"), recon) / (col("n1") * col("n2")), 6))
      .withColumn("rank", row_number().over(wnd))
      .filter(col("rank") <= k)
      .select("v1", "v2", "est_cos", "rank")
      .orderBy("v1", "rank")
  }

  /** Two-stage ANN serving (r12): PQ SHORTLIST → EXACT RERANK — the
    * pattern every production vector store runs (FAISS + refine): the
    * cheap scan ranks candidates by the PQ estimate
    * ([[knnIvfPqSearch]], codes only through the shuffle), then the
    * top-`kCand` shortlist per query — and ONLY the shortlist —
    * fetches exact vectors by id and reranks by true cosine to the
    * final `k`. At 100 TB the exact vectors are touched for
    * corpus×kCand rows instead of every candidate pair, which is what
    * makes exact answers affordable over a compressed index; recall
    * is bounded by the shortlist (a true neighbor the PQ estimate
    * pushes below rank kCand is lost — the standard knob, grow kCand
    * to buy recall).
    */
  def knnRerank(e: DataFrame, cents: Seq[(Long, Seq[Float])],
      books: Seq[Seq[Seq[Float]]], kCand: Int, k: Int): DataFrame = {
    val shortlist = knnIvfPqSearch(e, cents, books, kCand)
      .select("v1", "v2")
    val ve = e.select(col("vec_id"), col("embedding"), col("nrm"))
    val wnd = Window.partitionBy("v1").orderBy(desc("cos"), asc("v2"))
    shortlist
      .join(ve.select(col("vec_id").as("v1"), col("embedding").as("e1"),
        col("nrm").as("n1")), Seq("v1"))
      .join(ve.select(col("vec_id").as("v2"), col("embedding").as("e2"),
        col("nrm").as("n2")), Seq("v2"))
      .withColumn("cos",
        round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
      .withColumn("rank", row_number().over(wnd))
      .filter(col("rank") <= k)
      .select("v1", "v2", "cos", "rank")
      .orderBy("v1", "rank")
  }

  /** Near-duplicate vector pairs: shared-bucket candidates, exact
    * cosine verification at `threshold`.
    */
  def embedDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    graft.functions.VectorExpressions.register(emb.sparkSession)
    val coded = graft.T.spread(emb)
      .withColumn("bucket", signCode(col("embedding"), 4))
      .withColumn("nrm", norm(col("embedding")))
    val l = coded.select(col("bucket"), col("vec_id").as("v1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val r = coded.select(col("bucket"), col("vec_id").as("v2"),
      col("embedding").as("e2"), col("nrm").as("n2"))
    l.join(r, Seq("bucket")).filter(col("v1") < col("v2"))
      .withColumn("cos",
        round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
      .filter(col("cos") >= threshold)
      .select("v1", "v2", "cos")
      .orderBy("v1", "v2")
  }

  /** Per-(dir, nCells, iters) IVF INDEX — the prepared (spread+norm,
    * persisted) corpus frame plus its trained centroids, built once per
    * JVM and shared by every query against the same data. This is the
    * index-build/search split every ANN system has (FAISS trains the
    * quantizer once; Delta writes the layout once): the quantizer is a
    * DATA ARTIFACT, not per-query work, so the driver-facing keys —
    * called repeatedly by Bench — measure SEARCH over a built index.
    * Deterministic either way: the Lloyd pipeline is exact-decimal, so
    * cached and fresh centroids are identical (the oracle replays the
    * full build + search and still matches). The library API
    * ([[knnIvf]]/[[knnIvfProbe]]) stays self-contained and un-cached.
    */
  private val ivfCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, Seq[(Long, Seq[Float])])]()
  private def ivfIndex(s: SparkSession, d: String, nCells: Int,
      iters: Int): (DataFrame, Seq[(Long, Seq[Float])]) = {
    // Evict entries whose session has STOPPED before doing anything
    // else: the strong session reference in the key is what makes
    // identity safe (it can't be recycled the way an identityHashCode
    // could after GC), but without eviction it also pins every stopped
    // session and its persisted corpus frame for the JVM lifetime —
    // each ScalaTest suite's local() session would leak its cache
    // entry. Dead entries' blocks died with their session's block
    // manager, so dropping the map entry is the whole cleanup.
    ivfCache.keySet.removeIf { case (sess, _) =>
      sess.sparkContext.isStopped
    }
    // Keyed by the SESSION OBJECT itself (reference equality): the
    // cached frame is persisted in the session that built it, so a
    // later session in the same JVM must rebuild (and re-register the
    // native expressions) rather than touch a plan bound to a
    // possibly-stopped session. Live entries are bounded by live
    // sessions-per-JVM × datasets (few).
    ivfCache.computeIfAbsent((s, s"$d|$nCells|$iters"), _ => {
      graft.functions.VectorExpressions.register(s)
      val e = prepared(T.embeddings(s, d))
      (e, kMeansOn(e, nCells, iters))
    })
  }

  val queries: Map[String, Q] = Map(
    "knn_cosine" -> ((s, d) =>
      knnBrute(T.embeddings(s, d), k = 3, block = "label")),

    "knn_ann" -> ((s, d) =>
      knnLsh(T.embeddings(s, d), k = 3, nBits = 4)),

    // Range (radius) similarity search (r15): every in-threshold
    // neighbor, not a fixed k — the query shape dedup sweeps and
    // "find ALL near matches" audits need (top-k under-reports dense
    // neighborhoods and pads sparse ones). τ = 0.35 is
    // fixture-calibrated: the synthetic embeddings are near-orthogonal
    // random vectors (cos ≥ 0.5 yields 2 pairs corpus-wide), so the
    // gate sits where the distribution has mass; real embedding
    // spaces run the same operator at 0.9+.
    "knn_radius" -> ((s, d) =>
      knnRadius(T.embeddings(s, d), minCos = 0.35, block = "label")),

    // IVF coarse-quantization variant of ANN: nprobe=1, 16 cells,
    // centroids from two exact-decimal Lloyd k-means iterations —
    // trained once per dataset ([[ivfIndex]]), searched per query.
    "knn_ivf" -> ((s, d) => {
      val (e, cents) = ivfIndex(s, d, nCells = 16, iters = 2)
      searchIvf(e, cents, k = 3)
    }),

    // Multi-probe IVF: each query vector probes its 2 nearest cells —
    // the recall/latency knob an ANN user turns first (nprobe=1 IS
    // knn_ivf; nprobe=nCells is provably brute force — both spec'd in
    // LlmSpec). Data vectors stay in their single home cell, so the
    // candidate join is still a cell equi-join at nprobe/nCells of the
    // corpus per probe — never all-pairs. Shares [[ivfIndex]]'s
    // quantizer with knn_ivf (same dataset, same build).
    "knn_ivf_probe" -> ((s, d) => {
      val (e, cents) = ivfIndex(s, d, nCells = 16, iters = 2)
      searchIvfProbe(e, cents, k = 3, nprobe = 2)
    }),

    // ANN quality evaluation (r14): recall@3 of the nprobe=1 IVF
    // search against the TRUE global top-3 — the one number an ANN
    // deployment monitors before trading probes for latency, and the
    // measurement loop the knn family was missing. Ground truth is
    // searchIvfProbe at nprobe = nCells, which is PROVABLY brute
    // force (every query probes every cell — the LlmSpec identity)
    // while keeping the cell-equi-join shape: even the exhaustive
    // pass is never a cartesian plan. One left join on the (v1, v2)
    // pair then a single scalar aggregate.
    "knn_recall" -> ((s, d) => ivfRecall(s, d)),

    // PQ-tier quality evaluation (r14): the same recall@3 readout for
    // the product-quantized (ADC) search — quantization loss on top
    // of the cell loss knn_recall isolates; together the two numbers
    // tell an ANN owner WHICH approximation (coarse cells vs 8-bit
    // codes) is costing recall before they spend memory on either.
    "knn_pq_recall" -> ((s, d) => {
      val (e, cents) = ivfIndex(s, d, nCells = 16, iters = 2)
      recallOf(searchIvfProbe(e, cents, k = 3, nprobe = 16),
        knnIvfPqSearch(e, cents,
          pqBooks(s, d, e, m = 4, nSub = 8, iters = 1), k = 3))
    }),

    // Embedding-cosine near-dup: vector pairs above a cosine threshold,
    // via the same sign-LSH candidate path (identical/near-identical
    // vectors share buckets; never all-pairs). Planted-dup recall is
    // asserted in LlmSpec; the oracle replays bucket+threshold in SQL.
    // IVF-PQ (r12): the FAISS-IVFPQ layout — coarse cells bound the
    // candidates (shared [[ivfIndex]] quantizer: same dataset, same
    // build as knn_ivf), 4×16-dim PQ codebooks of 8 mean-centroids
    // bound the per-candidate bytes; asymmetric (ADC) scoring against
    // reconstructions. Training is deterministic mean-Lloyd
    // ([[pqCodebook]]), so the full run — coarse k-means, sub-k-means,
    // codes, reconstruction, est-cosine ranking — replays in DuckDB.
    "knn_ivf_pq" -> ((s, d) => {
      val (e, cents) = ivfIndex(s, d, nCells = 16, iters = 2)
      knnIvfPqSearch(e, cents,
        pqBooks(s, d, e, m = 4, nSub = 8, iters = 1), k = 3)
    }),

    // Two-stage serving (r12): top-10 PQ shortlist per query, exact
    // cosine rerank to top-3 — shares the cached coarse quantizer and
    // PQ codebooks with knn_ivf_pq (same dataset, same build).
    "knn_rerank" -> ((s, d) => {
      val (e, cents) = ivfIndex(s, d, nCells = 16, iters = 2)
      knnRerank(e, cents,
        pqBooks(s, d, e, m = 4, nSub = 8, iters = 1), kCand = 10, k = 3)
    }),

    "dedup_embed" -> ((s, d) => embedDupPairs(T.embeddings(s, d), 0.95)),

    // Multimodal row: text + vector + metadata joined into one frame,
    // projecting typed stats from each modality.
    "multimodal_join" -> ((s, d) => {
      graft.functions.VectorExpressions.register(s)
      T.documents(s, d)
        .join(T.embeddings(s, d), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(col("embedding")).cast("long").as("dim"),
          round(norm(col("embedding")), 4).as("emb_norm"))
        .orderBy("doc_id")
    }),

    // Int8 scalar quantization (r9): the vector-store compression step
    // — per-vector min/max scale, 8-bit codes, 4× smaller than
    // float32 (the storage/bandwidth knob every ANN deployment turns
    // before anything else). Emitted as audit scalars, not arrays
    // (house rule): the code checksum pins every code exactly; the max
    // reconstruction error bounds the quantization loss (≤ half a
    // step = (mx−mn)/510 + float noise). Pure narrow column math —
    // lambda transforms over the vector compile to codegen'd loops,
    // zero exchanges before the terminal sort. All math in DOUBLE on
    // BOTH engines: the float elements cast up exactly, and the
    // identical expression tree on identical inputs is bit-equal
    // (§7.5), so even round-at-.5 code boundaries agree.
    "embed_quantize" -> ((s, d) => {
      val emb = transform(col("embedding"), x => x.cast("double"))
      T.embeddings(s, d)
        .select(col("vec_id"), emb.as("e"))
        .select(col("vec_id"),
          array_min(col("e")).as("mn"), array_max(col("e")).as("mx"),
          col("e"))
        .select(col("vec_id"), col("mn"), col("mx"),
          // Zero-range guard: a constant vector has mx = mn and would
          // quantize through 0/0 → NaN; all-zero codes (every value at
          // the range floor) is the guarded encoding on BOTH engines.
          transform(col("e"), x =>
            when(col("mx") === col("mn"), lit(0L)).otherwise(
              round((x - col("mn")) / (col("mx") - col("mn")) * 255, 0)
                .cast("long"))).as("codes"),
          col("e"))
        .select(col("vec_id"),
          round(col("mn"), 6).as("mn_r"), round(col("mx"), 6).as("mx_r"),
          aggregate(col("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
          round(array_max(
            zip_with(col("e"), col("codes"), (x, c) =>
              abs(x - (col("mn") + c.cast("double") / 255.0 *
                (col("mx") - col("mn")))))), 6).as("max_err"))
        .orderBy("vec_id")
    })
  )

  // Oracle dialect note: `list_reduce(list, (a,b) -> a+b)` folds LEFT
  // TO RIGHT, exactly like [[graft.functions.DotProduct]]'s accumulator
  // (and list_reduce's no-init fold starts at x1 = 0.0 + x1) — so the
  // doubles are bit-identical between engines and round(·, 6) agrees.
  // A list_sum / list_cosine_similarity formulation would NOT carry
  // that guarantee (unspecified summation order/precision).
  private def duckNormOf(c: String) =
    s"sqrt(list_reduce(list_transform($c, x -> x::DOUBLE * x::DOUBLE), (a,b) -> a+b))"
  private val duckNorm = duckNormOf("embedding")
  private def duckDotCols(a: String, b: String) =
    s"list_reduce(list_transform(list_zip($a, $b), " +
      "z -> z[1]::DOUBLE * z[2]::DOUBLE), (x,y) -> x+y)"
  private def duckDot(l: String, r: String) =
    duckDotCols(s"$l.embedding", s"$r.embedding")
  /** One Lloyd step in DuckDB: assign to `cin`, then per-cell exact
    * decimal component sums rebuilt as float lists — mirrors
    * [[kMeansCentroids]] (same double→decimal→double→float ladder).
    */
  private def duckLloyd(cin: String, out: String) =
    s"""a_$out AS (
       |  SELECT e.vec_id, e.embedding, c.cid,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      (${duckDotCols("e.embedding", "c.ce")} / (e.nrm * c.cnrm))
       |      DESC, c.cid) AS crn
       |  FROM e CROSS JOIN $cin c),
       |g_$out AS (SELECT cid AS cell, vec_id, embedding FROM a_$out WHERE crn = 1),
       |x_$out AS (SELECT cell, generate_subscripts(embedding, 1) AS i,
       |                  unnest(embedding) AS x FROM g_$out),
       |$out AS (
       |  SELECT cid, ce, ${duckNormOf("ce")} AS cnrm FROM (
       |    SELECT cell AS cid, list(CAST(CAST(sx AS DOUBLE) AS FLOAT) ORDER BY i) AS ce
       |    FROM (SELECT cell, i, sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,10))) AS sx
       |          FROM x_$out GROUP BY cell, i)
       |    GROUP BY cell))""".stripMargin
  /** One PQ subspace replay (r12): slice `embedding[lo:hi]` → 8
    * lowest-id seed sub-centroids → one mean-Lloyd step (assign by
    * `dot(c,c) − 2·dot(x,c)` with ties to the smaller seed id — the
    * ‖x‖² term is dropped on BOTH engines, see [[pqCodebook]]; means
    * via the exact-decimal-sum → double-division ladder) → encode
    * every sub-vector against the trained codebook, emitting its
    * chosen entry as `recon`. Mirrors [[pqCodebook]]/[[pqCode]] step
    * for step.
    */
  private def duckPq(si: Int, lo: Int, hi: Int) = {
    val cc = "list_reduce(list_transform(c.ce, x -> x::DOUBLE * x::DOUBLE)" +
      ", (a,b) -> a+b)"
    val dxc = duckDotCols("v.sub", "c.ce")
    s"""s_$si AS (SELECT vec_id, embedding[$lo:$hi] AS sub FROM e),
       |c0_$si AS (SELECT vec_id AS cid, sub AS ce FROM s_$si
       |           ORDER BY vec_id LIMIT 8),
       |aa_$si AS (
       |  SELECT v.vec_id, v.sub, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      ($cc - 2 * $dxc), c.cid) AS crn
       |  FROM s_$si v CROSS JOIN c0_$si c),
       |gx_$si AS (SELECT cid, generate_subscripts(sub, 1) AS i,
       |                  unnest(sub) AS x
       |           FROM aa_$si WHERE crn = 1),
       |cb_$si AS (
       |  SELECT cid, list(CAST(CAST(sx AS DOUBLE) / n AS FLOAT)
       |                   ORDER BY i) AS ce
       |  FROM (SELECT cid, i,
       |               sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,10))) AS sx,
       |               count(*) AS n
       |        FROM gx_$si GROUP BY cid, i)
       |  GROUP BY cid),
       |enc_$si AS (
       |  SELECT vec_id, ce AS recon FROM (
       |    SELECT v.vec_id, c.ce,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |        ($cc - 2 * $dxc), c.cid) AS crn
       |    FROM s_$si v CROSS JOIN cb_$si c) WHERE crn = 1)""".stripMargin
  }

  /** The full IVF-PQ replay chain up to the est-cosine ranking `rk`
    * (exclusive of the final k cut) — shared verbatim by knn_ivf_pq
    * (cut at 3) and knn_rerank (shortlist at 10 → exact rerank):
    * knn_ivf's coarse chain (seeds → two decimal Lloyd steps → home
    * cells) + four [[duckPq]] subspace chains, then concatenated
    * reconstructions scored asymmetrically inside home cells.
    */
  private lazy val duckIvfPqChain: String =
    s"""e AS (
      |  SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
      |c0 AS (
      |  SELECT vec_id AS cid, embedding AS ce, nrm AS cnrm FROM e
      |  ORDER BY vec_id LIMIT 16),
      |${duckLloyd("c0", "c1")},
      |${duckLloyd("c1", "c2")},
      |af AS (
      |  SELECT e.vec_id, e.embedding, e.nrm, c.cid,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      (${duckDotCols("e.embedding", "c.ce")} / (e.nrm * c.cnrm))
      |      DESC, c.cid) AS crn
      |  FROM e CROSS JOIN c2 c),
      |asg AS (SELECT cid AS cell, vec_id, embedding, nrm FROM af WHERE crn = 1),
      |${duckPq(0, 1, 16)},
      |${duckPq(1, 17, 32)},
      |${duckPq(2, 33, 48)},
      |${duckPq(3, 49, 64)},
      |rec AS (
      |  SELECT vec_id,
      |    enc_0.recon || enc_1.recon || enc_2.recon || enc_3.recon AS recon
      |  FROM enc_0 JOIN enc_1 USING (vec_id) JOIN enc_2 USING (vec_id)
      |       JOIN enc_3 USING (vec_id)),
      |rn0 AS (SELECT vec_id, recon, ${duckNormOf("recon")} AS rnrm
      |        FROM rec),
      |p AS (
      |  SELECT l.vec_id AS v1, r.vec_id AS v2,
      |    round(${duckDotCols("l.embedding", "r.recon")}
      |          / (l.nrm * r.rnrm), 6) AS est_cos
      |  FROM asg l JOIN (SELECT a.cell, a.vec_id, q.recon, q.rnrm
      |                   FROM asg a JOIN rn0 q USING (vec_id)) r
      |    ON l.cell = r.cell AND l.vec_id <> r.vec_id),
      |rk AS (
      |  SELECT v1, v2, est_cos, row_number() OVER (
      |    PARTITION BY v1 ORDER BY est_cos DESC, v2) AS "rank" FROM p)""".stripMargin

  // Sign-LSH bucket over the first 4 dims — mirrors signCode(e, 4).
  private val duckBucket =
    """(CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
      | + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
      | + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
      | + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)""".stripMargin

  val oracle: Map[String, String] = Map(
    // Same block equi-join and round-6 cosine; the ≥ τ gate compares
    // identical round-6 doubles, so the boundary is exact.
    "knn_radius" ->
      s"""WITH e AS (
        |  SELECT vec_id, label, embedding, $duckNorm AS nrm FROM embeddings)
        |SELECT l.vec_id AS v1, r.vec_id AS v2,
        |  round(${duckDot("l", "r")} / (l.nrm * r.nrm), 6) AS cos
        |FROM e l JOIN e r ON l.label = r.label AND l.vec_id <> r.vec_id
        |WHERE round(${duckDot("l", "r")} / (l.nrm * r.nrm), 6) >= 0.35
        |ORDER BY v1, v2""".stripMargin,

    "knn_cosine" ->
      s"""WITH e AS (
        |  SELECT vec_id, label, embedding, $duckNorm AS nrm FROM embeddings),
        |p AS (
        |  SELECT l.vec_id AS v1, r.vec_id AS v2,
        |    round(${duckDot("l", "r")} / (l.nrm * r.nrm), 6) AS cos
        |  FROM e l JOIN e r ON l.label = r.label AND l.vec_id <> r.vec_id),
        |rk AS (
        |  SELECT v1, v2, cos, row_number() OVER (
        |    PARTITION BY v1 ORDER BY cos DESC, v2) AS "rank" FROM p)
        |SELECT v1, v2, cos, "rank" FROM rk WHERE "rank" <= 3
        |ORDER BY v1, "rank"""".stripMargin,
    "knn_ann" ->
      s"""WITH e AS (
        |  SELECT vec_id, $duckBucket AS bucket, embedding, $duckNorm AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT l.vec_id AS v1, r.vec_id AS v2,
        |    round(${duckDot("l", "r")} / (l.nrm * r.nrm), 6) AS cos
        |  FROM e l JOIN e r ON l.bucket = r.bucket AND l.vec_id <> r.vec_id),
        |rk AS (
        |  SELECT v1, v2, cos, row_number() OVER (
        |    PARTITION BY v1 ORDER BY cos DESC, v2) AS "rank" FROM p)
        |SELECT v1, v2, cos, "rank" FROM rk WHERE "rank" <= 3
        |ORDER BY v1, "rank"""".stripMargin,
    // Replays the full deterministic pipeline: seed centroids → two
    // exact-decimal Lloyd steps → final assignment → in-cell exact
    // scoring. Float/double ladders mirror the Spark side step for
    // step, so doubles stay bit-identical through all three passes.
    "knn_ivf" ->
      s"""WITH e AS (
        |  SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
        |c0 AS (
        |  SELECT vec_id AS cid, embedding AS ce, nrm AS cnrm FROM e
        |  ORDER BY vec_id LIMIT 16),
        |${duckLloyd("c0", "c1")},
        |${duckLloyd("c1", "c2")},
        |af AS (
        |  SELECT e.vec_id, e.embedding, e.nrm, c.cid,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      (${duckDotCols("e.embedding", "c.ce")} / (e.nrm * c.cnrm))
        |      DESC, c.cid) AS crn
        |  FROM e CROSS JOIN c2 c),
        |asg AS (SELECT cid AS cell, vec_id, embedding, nrm FROM af WHERE crn = 1),
        |p AS (
        |  SELECT l.vec_id AS v1, r.vec_id AS v2,
        |    round(${duckDot("l", "r")} / (l.nrm * r.nrm), 6) AS cos
        |  FROM asg l JOIN asg r ON l.cell = r.cell AND l.vec_id <> r.vec_id),
        |rk AS (
        |  SELECT v1, v2, cos, row_number() OVER (
        |    PARTITION BY v1 ORDER BY cos DESC, v2) AS "rank" FROM p)
        |SELECT v1, v2, cos, "rank" FROM rk WHERE "rank" <= 3
        |ORDER BY v1, "rank"""".stripMargin,
    // knn_ivf's replay plus the probe side: `prb` takes each vector's
    // top-2 cells (crn <= 2) while the data side `asg` keeps homes
    // only (crn = 1) — a pair can meet in at most one cell (the data
    // vector's home), so no DISTINCT is needed, exactly like the Spark
    // plan. Probe order (csim DESC, cid) mirrors probe()'s
    // reverse(array_sort(struct(csim, -cid))) slice.
    "knn_ivf_probe" ->
      s"""WITH e AS (
        |  SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
        |c0 AS (
        |  SELECT vec_id AS cid, embedding AS ce, nrm AS cnrm FROM e
        |  ORDER BY vec_id LIMIT 16),
        |${duckLloyd("c0", "c1")},
        |${duckLloyd("c1", "c2")},
        |af AS (
        |  SELECT e.vec_id, e.embedding, e.nrm, c.cid,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      (${duckDotCols("e.embedding", "c.ce")} / (e.nrm * c.cnrm))
        |      DESC, c.cid) AS crn
        |  FROM e CROSS JOIN c2 c),
        |asg AS (SELECT cid AS cell, vec_id, embedding, nrm FROM af WHERE crn = 1),
        |prb AS (SELECT cid AS cell, vec_id, embedding, nrm FROM af WHERE crn <= 2),
        |p AS (
        |  SELECT l.vec_id AS v1, r.vec_id AS v2,
        |    round(${duckDot("l", "r")} / (l.nrm * r.nrm), 6) AS cos
        |  FROM prb l JOIN asg r ON l.cell = r.cell AND l.vec_id <> r.vec_id),
        |rk AS (
        |  SELECT v1, v2, cos, row_number() OVER (
        |    PARTITION BY v1 ORDER BY cos DESC, v2) AS "rank" FROM p)
        |SELECT v1, v2, cos, "rank" FROM rk WHERE "rank" <= 3
        |ORDER BY v1, "rank"""".stripMargin,

    // Ground truth as literal all-pairs (DuckDB is the oracle — it
    // may pay the n² the engine never does), approx as the knn_ivf
    // chain; both rank the ROUNDED cosine with the v2 tiebreak, the
    // searchIvf* contract.
    "knn_recall" ->
      s"""WITH e AS (
        |  SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
        |c0 AS (
        |  SELECT vec_id AS cid, embedding AS ce, nrm AS cnrm FROM e
        |  ORDER BY vec_id LIMIT 16),
        |${duckLloyd("c0", "c1")},
        |${duckLloyd("c1", "c2")},
        |af AS (
        |  SELECT e.vec_id, e.embedding, e.nrm, c.cid,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      (${duckDotCols("e.embedding", "c.ce")} / (e.nrm * c.cnrm))
        |      DESC, c.cid) AS crn
        |  FROM e CROSS JOIN c2 c),
        |asg AS (SELECT cid AS cell, vec_id, embedding, nrm FROM af WHERE crn = 1),
        |pa AS (
        |  SELECT l.vec_id AS v1, r.vec_id AS v2,
        |    round(${duckDot("l", "r")} / (l.nrm * r.nrm), 6) AS cos
        |  FROM asg l JOIN asg r ON l.cell = r.cell AND l.vec_id <> r.vec_id),
        |ra AS (
        |  SELECT v1, v2 FROM (
        |    SELECT v1, v2, row_number() OVER (
        |      PARTITION BY v1 ORDER BY cos DESC, v2) AS rk FROM pa)
        |  WHERE rk <= 3),
        |pt AS (
        |  SELECT l.vec_id AS v1, r.vec_id AS v2,
        |    round(${duckDot("l", "r")} / (l.nrm * r.nrm), 6) AS cos
        |  FROM e l JOIN e r ON l.vec_id <> r.vec_id),
        |rt AS (
        |  SELECT v1, v2 FROM (
        |    SELECT v1, v2, row_number() OVER (
        |      PARTITION BY v1 ORDER BY cos DESC, v2) AS rk FROM pt)
        |  WHERE rk <= 3)
        |SELECT count(*) AS n_pairs,
        |       CAST(sum(CASE WHEN ra.v2 IS NOT NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_hit,
        |       round(CAST(sum(CASE WHEN ra.v2 IS NOT NULL
        |                           THEN 1 ELSE 0 END) AS DOUBLE) /
        |             CAST(count(*) AS DOUBLE), 6) AS recall_at_3
        |FROM rt LEFT JOIN ra ON rt.v1 = ra.v1 AND rt.v2 = ra.v2
        |ORDER BY n_pairs""".stripMargin,
    // Full IVF-PQ replay: knn_ivf's coarse chain (seeds → two decimal
    // Lloyd steps → home cells) + four [[duckPq]] subspace chains
    // (seed sub-centroids → one mean-Lloyd step → encode), then the
    // concatenated reconstructions scored asymmetrically inside home
    // cells — every double along the way the identical expression
    // tree on identical inputs.
    "knn_ivf_pq" ->
      s"""WITH $duckIvfPqChain
        |SELECT v1, v2, est_cos, "rank" FROM rk WHERE "rank" <= 3
        |ORDER BY v1, "rank"""".stripMargin,

    // The PQ chain's top-3 against literal all-pairs ground truth —
    // the knn_recall recipe pointed at the ADC ranking.
    "knn_pq_recall" ->
      s"""WITH $duckIvfPqChain,
        |ra AS (SELECT v1, v2 FROM rk WHERE "rank" <= 3),
        |pt AS (
        |  SELECT l.vec_id AS v1, r.vec_id AS v2,
        |    round(${duckDot("l", "r")} / (l.nrm * r.nrm), 6) AS cos
        |  FROM e l JOIN e r ON l.vec_id <> r.vec_id),
        |rt AS (
        |  SELECT v1, v2 FROM (
        |    SELECT v1, v2, row_number() OVER (
        |      PARTITION BY v1 ORDER BY cos DESC, v2) AS rk2 FROM pt)
        |  WHERE rk2 <= 3)
        |SELECT count(*) AS n_pairs,
        |       CAST(sum(CASE WHEN ra.v2 IS NOT NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_hit,
        |       round(CAST(sum(CASE WHEN ra.v2 IS NOT NULL
        |                           THEN 1 ELSE 0 END) AS DOUBLE) /
        |             CAST(count(*) AS DOUBLE), 6) AS recall_at_3
        |FROM rt LEFT JOIN ra ON rt.v1 = ra.v1 AND rt.v2 = ra.v2
        |ORDER BY n_pairs""".stripMargin,

    // Two-stage rerank: the SAME PQ chain ranks the shortlist
    // (rank ≤ 10), then exact cosine over shortlist pairs only —
    // joined back to `e` by id, mirroring the operator's
    // fetch-exact-vectors-for-the-shortlist shape — reranks to the
    // final top-3.
    "knn_rerank" ->
      s"""WITH $duckIvfPqChain,
        |sl AS (SELECT v1, v2 FROM rk WHERE "rank" <= 10),
        |px AS (
        |  SELECT sl.v1, sl.v2,
        |    round(${duckDotCols("a.embedding", "b.embedding")}
        |          / (a.nrm * b.nrm), 6) AS cos
        |  FROM sl JOIN e a ON sl.v1 = a.vec_id
        |          JOIN e b ON sl.v2 = b.vec_id),
        |rr AS (
        |  SELECT v1, v2, cos, row_number() OVER (
        |    PARTITION BY v1 ORDER BY cos DESC, v2) AS "rank" FROM px)
        |SELECT v1, v2, cos, "rank" FROM rr WHERE "rank" <= 3
        |ORDER BY v1, "rank"""".stripMargin,

    "dedup_embed" ->
      s"""WITH e AS (
        |  SELECT vec_id, $duckBucket AS bucket, embedding, $duckNorm AS nrm
        |  FROM embeddings)
        |SELECT l.vec_id AS v1, r.vec_id AS v2,
        |  round(${duckDot("l", "r")} / (l.nrm * r.nrm), 6) AS cos
        |FROM e l JOIN e r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
        |WHERE cos >= 0.95
        |ORDER BY v1, v2""".stripMargin,
    "multimodal_join" ->
      """SELECT doc_id, lang, n_chars,
        |  len(embedding) AS dim,
        |  round(sqrt(list_sum(list_transform(embedding,
        |    x -> x::DOUBLE * x::DOUBLE))), 4) AS emb_norm
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id""".stripMargin,
    // All-double math, identical expression tree; round() ties (codes
    // at exact .5) go away-from-zero in both engines; list_sum off
    // HUGEINT.
    "embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |m AS (SELECT vec_id, e, list_min(e) AS mn, list_max(e) AS mx
        |      FROM e),
        |c AS (
        |  SELECT vec_id, mn, mx, e,
        |         list_transform(e, x -> CASE WHEN mx = mn THEN 0
        |           ELSE CAST(round((x - mn) / (mx - mn) * 255, 0) AS BIGINT)
        |           END) AS codes
        |  FROM m)
        |SELECT vec_id, round(mn, 6) AS mn_r, round(mx, 6) AS mx_r,
        |       CAST(list_sum(codes) AS BIGINT) AS code_sum,
        |       round(list_max(list_transform(list_zip(e, codes), p ->
        |         abs(p[1] - (mn + CAST(p[2] AS DOUBLE) / 255.0
        |                     * (mx - mn))))), 6) AS max_err
        |FROM c ORDER BY vec_id""".stripMargin
  )
}
