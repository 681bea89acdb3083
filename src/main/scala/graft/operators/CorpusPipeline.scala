package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition the individual operators
  * exist for, as one lazy chain:
  *
  *   quality filter (fused TextProfile scan)
  *     → exact dedup (first-5-words key, min-id survivor)
  *       → near-dup removal (exact n-gram Jaccard pairs → connected
  *         components → min-id survivor per cluster)
  *         → token-budget selection (distributed prefix sum)
  *
  * Every stage is itself oracled/spec'd; `q_corpus_pipeline` hash-matches
  * the whole composition against one assembled DuckDB query, so stage
  * ORDERING and interface semantics are verified too, not just the parts.
  * Output: (doc_id, n_tok) of the curated set. */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 30,
      minPunct: Int = 0,
      ngram: Int = 3,
      jaccardThreshold: Double = 0.2,
      tokenBudget: Long = 10000L)

  def curate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val prof = docs.withColumn("__p", TextAnalysis.profile(col("text")))
    val quality = prof
      .filter(col("__p.n_tokens") >= cfg.minTokens &&
        col("__p.n_punct") >= cfg.minPunct)
      .withColumn("n_tok", col("__p.n_bpeish").cast("long"))
      .withColumn("key5",
        array_join(slice(split(trim(lower(col("text"))), "\\s+"), 1, 5), " "))
    // Materialize the filtered+deduped set once: three consumers (pair
    // derivation, survivor join, budget input) would otherwise each rerun
    // the profile scan and dedup window.
    val exactKept = Dedup.exactDedup(quality, Seq("key5"), "doc_id")
      .localCheckpoint()
    val pairs = Dedup.ngramJaccardPairs(
      exactKept.select(col("doc_id"), col("text")), "doc_id", "text",
      n = cfg.ngram, threshold = cfg.jaccardThreshold)
    val survivors = Dedup.nearDupSurvivors(
      exactKept.select(col("doc_id"), col("n_tok"), col("text")), "doc_id", pairs)
    PrefixSum.selectWithinBudget(
      survivors.select(col("doc_id"), col("n_tok")),
      "doc_id", "n_tok", cfg.tokenBudget)
  }
}
