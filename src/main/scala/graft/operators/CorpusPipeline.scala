package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition the individual operators
  * exist for, as one lazy chain:
  *
  *   URL + content-hash dedup (when a URL column exists — the cheap
  *   web-corpus first pass, before anything touches text similarity)
  *     → quality filter (fused TextProfile scan)
  *       → exact dedup (first-5-words key, min-id survivor)
  *         → near-dup removal (exact n-gram Jaccard pairs → connected
  *           components → min-id survivor per cluster)
  *           → token-budget selection (distributed prefix sum)
  *
  * Every stage is itself oracled/spec'd; `q_corpus_pipeline` hash-matches
  * the whole composition against one assembled DuckDB query, so stage
  * ORDERING and interface semantics are verified too, not just the parts.
  * The URL stage is provably absorbed by the later exact dedup whenever
  * min-id survivors are used (a (url, md5(text)) group is a subset of the
  * identical-text set, which shares the first-5-words key — so the
  * key5-minimum doc is also the minimum of its URL group and survives both
  * stages); the capstone oracle therefore stays byte-identical with the
  * stage on, which `q_corpus_pipeline` verifies end to end. At 100 TB the
  * stage still pays for itself: it halves the corpus BEFORE the profile
  * scan and shingle explode instead of after.
  * Output: (doc_id, n_tok) of the curated set. */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 30,
      minPunct: Int = 0,
      ngram: Int = 3,
      jaccardThreshold: Double = 0.2,
      tokenBudget: Long = 10000L,
      urlCol: Option[String] = None)

  def curate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val base = cfg.urlCol match {
      case Some(u) =>
        Dedup.exactDedup(
          docs.withColumn("__url_key", Dedup.normalizeUrl(col(u)))
            .withColumn("__cmd5", md5(col("text"))),
          Seq("__url_key", "__cmd5"), "doc_id")
          .drop("__url_key", "__cmd5")
      case None => docs
    }
    val prof = base.withColumn("__p", TextAnalysis.profile(col("text")))
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
