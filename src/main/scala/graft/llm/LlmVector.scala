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

  /** IVF-style approximate top-k: coarse-quantize every vector to its
    * nearest of `nCells` centroid vectors (here: deterministically the
    * lowest-id vectors — at scale, k-means centroids slot in without
    * changing the plan), then score exactly within cells (nprobe = 1).
    * The centroid table broadcasts; assignment is a linear pass; the
    * candidate join is an equi-join on cell id — never all-pairs.
    */
  def knnIvf(emb: DataFrame, k: Int, nCells: Int): DataFrame = {
    graft.functions.VectorExpressions.register(emb.sparkSession)
    val spreadEmb = graft.T.spread(emb).withColumn("nrm", norm(col("embedding")))
    val centroids = emb.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .withColumn("cnrm", norm(col("ce")))
    val wAssign = Window.partitionBy("vec_id").orderBy(desc("csim"), asc("cid"))
    val assigned = spreadEmb.crossJoin(broadcast(centroids))
      .withColumn("csim", dot(col("embedding"), col("ce")) /
        (col("nrm") * col("cnrm")))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("cid").as("cell"), col("vec_id"), col("embedding"), col("nrm"))
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

  val queries: Map[String, Q] = Map(
    "knn_cosine" -> ((s, d) =>
      knnBrute(T.embeddings(s, d), k = 3, block = "label")),

    "knn_ann" -> ((s, d) =>
      knnLsh(T.embeddings(s, d), k = 3, nBits = 4)),

    // IVF coarse-quantization variant of ANN (nprobe=1, 16 cells).
    "knn_ivf" -> ((s, d) =>
      knnIvf(T.embeddings(s, d), k = 3, nCells = 16)),

    // Embedding-cosine near-dup: vector pairs above a cosine threshold,
    // via the same sign-LSH candidate path (identical/near-identical
    // vectors share buckets; never all-pairs). Planted-dup recall is
    // asserted in LlmSpec; the oracle replays bucket+threshold in SQL.
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
    })
  )

  // Oracle dialect note: `list_reduce(list, (a,b) -> a+b)` folds LEFT
  // TO RIGHT, exactly like [[graft.functions.DotProduct]]'s accumulator
  // (and list_reduce's no-init fold starts at x1 = 0.0 + x1) — so the
  // doubles are bit-identical between engines and round(·, 6) agrees.
  // A list_sum / list_cosine_similarity formulation would NOT carry
  // that guarantee (unspecified summation order/precision).
  private val duckNorm =
    "sqrt(list_reduce(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), (a,b) -> a+b))"
  private def duckDot(l: String, r: String) =
    s"list_reduce(list_transform(list_zip($l.embedding, $r.embedding), " +
      "z -> z[1]::DOUBLE * z[2]::DOUBLE), (x,y) -> x+y)"
  // Sign-LSH bucket over the first 4 dims — mirrors signCode(e, 4).
  private val duckBucket =
    """(CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
      | + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
      | + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
      | + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)""".stripMargin

  val oracle: Map[String, String] = Map(
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
    "knn_ivf" ->
      s"""WITH e AS (
        |  SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
        |c AS (
        |  SELECT vec_id AS cid, embedding, nrm AS cnrm FROM e
        |  ORDER BY vec_id LIMIT 16),
        |a AS (
        |  SELECT e.vec_id, e.embedding, e.nrm, c.cid,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      (${duckDot("e", "c")} / (e.nrm * c.cnrm)) DESC, c.cid) AS crn
        |  FROM e CROSS JOIN c),
        |asg AS (SELECT cid AS cell, vec_id, embedding, nrm FROM a WHERE crn = 1),
        |p AS (
        |  SELECT l.vec_id AS v1, r.vec_id AS v2,
        |    round(${duckDot("l", "r")} / (l.nrm * r.nrm), 6) AS cos
        |  FROM asg l JOIN asg r ON l.cell = r.cell AND l.vec_id <> r.vec_id),
        |rk AS (
        |  SELECT v1, v2, cos, row_number() OVER (
        |    PARTITION BY v1 ORDER BY cos DESC, v2) AS "rank" FROM p)
        |SELECT v1, v2, cos, "rank" FROM rk WHERE "rank" <= 3
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
        |ORDER BY doc_id""".stripMargin
  )
}
