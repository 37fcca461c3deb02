package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-corpus curation composed from the §2.12 operators — the
  * shape of a real pretraining-data pipeline over a (doc_id, text)
  * corpus:
  *
  *   1. quality gate   ([[LlmText.qualityScore]] ≥ threshold)
  *   2. exact dedup    (content digest, lowest doc_id survives)
  *   3. near-dup drop  (MinHash+LSH pairs from [[LlmDedup.minhashPairs]];
  *                      greedy survivor = drop the higher id of each
  *                      pair — the standard linear-pass approximation
  *                      of connected-component dedup, documented bias:
  *                      a chain a~b~c keeps a AND c if a≁c)
  *   4. accounting     (tokens kept, per-stage drop counts)
  *
  * Every stage is shuffle-bounded column work — no driver state, no
  * all-pairs — so the composition inherits the 100 TB properties of
  * its parts.
  */
object CorpusPipeline {

  /** Curate a (doc_id, text, …) corpus. Returns surviving rows plus
    * `quality` and `n_tokens`. */
  def curate(docs: DataFrame, minQuality: Double,
      nearDupJaccard: Double): DataFrame = {
    // 1. quality gate
    val scored = docs
      .withColumn("quality", round(LlmText.qualityScore(col("text")), 4))
      .filter(col("quality") >= minQuality)
    // 2. exact dedup: lowest doc_id per normalized-content digest
    val w = Window.partitionBy("digest").orderBy("doc_id")
    val exact = scored
      .withColumn("digest", md5(lower(trim(col("text")))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "digest")
    // 3. near-dup drop: any doc appearing as the higher id of a
    //    verified near-dup pair goes
    val drops = LlmDedup.minhashPairs(exact, nearDupJaccard)
      .select(col("d2").as("doc_id")).distinct()
    val kept = exact.join(drops, Seq("doc_id"), "left_anti")
    // 4. accounting columns
    kept
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .orderBy("doc_id")
  }

  /** Per-stage retention report for a curation run (one row). */
  def report(docs: DataFrame, minQuality: Double,
      nearDupJaccard: Double): DataFrame = {
    val total = docs.count()
    val kept = curate(docs, minQuality, nearDupJaccard)
    kept.agg(
      lit(total).as("n_input"),
      count(lit(1)).as("n_kept"),
      sum(col("n_tokens")).as("tokens_kept"),
      round(count(lit(1)).cast("double") / total, 4).as("retention"))
  }
}
