package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The v2 capstone ladder (URL → exact → substring removal → re-filter →
  * fuzzy → semantic → budget) on a corpus crafted so EVERY stage has a
  * casualty — the harness query proves cross-engine equivalence on real
  * data, this spec proves each stage actually fires and the interfaces
  * between them carry (ids survive, counts reconcile, removal feeds the
  * next stage's tokenizer). */
class CorpusPipelineV2Spec extends SparkSpec {

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  private val boiler = "alpha beta gamma delta" // the repeated 4-gram

  // Ten shared triples with per-doc separators: doc6/doc7 share exactly
  // ten trigram shingles (one per triple) and NO 4-gram, so the fuzzy
  // stage sees them and the substring stage does not.
  // jaccard = 10 / (38 + 38 - 10) = 0.1515…
  private def tripled(sep: String): String =
    (1 to 10).map(k => s"s${k}a s${k}b s${k}c").zipAll(
      (1 to 9).map(j => s"$sep$j"), "", "").flatMap {
      case (t, s) => Seq(t, s).filter(_.nonEmpty)
    }.mkString(" ")

  private val corpus: Seq[(Long, String, String)] = {
    val key5 = "start key words here same"
    Seq(
      // URL + exact dups of doc 0
      (0L, s"$key5 ${words("w0x", 35).mkString(" ")}", "https://www.a.com/p?utm=1"),
      (1L, s"$key5 ${words("w0x", 35).mkString(" ")}", "https://www.a.com/p?utm=1"),
      (2L, s"$key5 ${words("w2x", 30).mkString(" ")}", "https://b.com/q"),
      // repeated-substring trio: doc 3 holds the canonical occurrence,
      // doc 4 loses 4 tokens, doc 5 is gutted below the 30-token floor
      (3L, s"${words("w3a", 5).mkString(" ")} $boiler ${words("w3b", 25).mkString(" ")}", "https://c.com/3"),
      (4L, s"${words("w4a", 6).mkString(" ")} $boiler ${words("w4b", 26).mkString(" ")}", "https://c.com/4"),
      (5L, s"${words("w5a", 28).mkString(" ")} $boiler", "https://c.com/5"),
      // fuzzy pair (trigram jaccard 0.1515 ≥ the spec threshold 0.12)
      (6L, tripled("u6q"), "https://d.com/6"),
      (7L, tripled("u7q"), "https://d.com/7"),
      // semantic pair: unrelated text, identical embeddings
      (8L, words("w8x", 30).mkString(" "), "https://e.com/8"),
      (9L, words("w9x", 31).mkString(" "), "https://e.com/9"),
      // no embedding row — must pass through the semantic stage
      (10L, words("wax", 33).mkString(" "), "https://f.com/10"),
      // survives everything; cut by the token budget
      (11L, words("wbx", 30).mkString(" "), "https://g.com/11"))
  }

  private def oneHot(i: Int): Array[Float] =
    Array.tabulate(16)(j => if (j == i) 1f else 0f)

  // doc 9 shares doc 8's vector; doc 10 has no row at all
  private val embs: Seq[(Long, Array[Float])] =
    Seq(0L -> oneHot(0), 1L -> oneHot(1), 2L -> oneHot(2), 3L -> oneHot(3),
      4L -> oneHot(4), 5L -> oneHot(5), 6L -> oneHot(6), 7L -> oneHot(7),
      8L -> oneHot(14), 9L -> oneHot(14), 11L -> oneHot(11))

  private val cfg = CorpusPipeline.Config(urlCol = Some("url"),
    substringK = 4, jaccardThreshold = 0.12, semanticThreshold = 0.4,
    tokenBudget = 208L) // = Σ n_tok of survivors 0,3,4,6,8,10 — doc 11 crosses

  test("curateV2: every ladder stage fires and the interfaces carry") {
    val s = spark; import s.implicits._
    val docs = corpus.toDF("doc_id", "text", "url")
    val emb = embs.toDF("vec_id", "embedding")
    val out = CorpusPipeline.curateV2(docs, emb, cfg)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1 (URL+exact dup), 2 (key5 dup), 5 (gutted by removal), 7
    // (fuzzy), 9 (semantic) and 11 (budget) are gone; doc 4 carries the
    // substring-stage audit and its n_tok counts the CLEANED text.
    assert(out === Seq(
      (0L, 40L, 0L), (3L, 34L, 0L), (4L, 32L, 4L),
      (6L, 39L, 0L), (8L, 30L, 0L), (10L, 33L, 0L)))
  }

  test("curateV2: LSH semantic scale path only ever misses pairs (survivor superset)") {
    val s = spark; import s.implicits._
    val docs = corpus.toDF("doc_id", "text", "url")
    val emb = embs.toDF("vec_id", "embedding")
    val unbounded = cfg.copy(tokenBudget = Long.MaxValue)
    val exact = CorpusPipeline.curateV2(docs, emb, unbounded)
      .select("doc_id").as[Long].collect().toSet
    val lsh = CorpusPipeline.curateV2(docs, emb,
        unbounded.copy(semanticExact = false))
      .select("doc_id").as[Long].collect().toSet
    assert(exact.subsetOf(lsh),
      s"LSH path lost survivors the exact path kept: ${exact -- lsh}")
    // identical vectors always share every band bucket, so THIS corpus's
    // one semantic pair is found by both paths and the results coincide
    assert(lsh === exact)
  }

  test("curateV2 on real data: survivor ids nest along the ladder stages") {
    val sf = testDataDir()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = CorpusPipeline.Config(substringK = 4, semanticThreshold = 0.4,
      tokenBudget = Long.MaxValue)
    val full = CorpusPipeline.curateV2(docs, emb, base)
    // reconciliation: curated ids join back to the corpus (none invented),
    // n_tok is the CLEANED-text bpe-ish count (never more than the raw
    // count), and the removal stage did real work on this data
    val raw = docs.withColumn("__p", TextAnalysis.profile(col("text")))
      .select(col("doc_id"), col("__p.n_bpeish").cast("long").as("raw_tok"))
    val joined = full.join(raw, "doc_id").collect()
    assert(joined.nonEmpty && joined.length === full.count())
    assert(joined.forall(r => r.getLong(1) <= r.getLong(3)),
      "cleaned n_tok exceeded the raw token count")
    assert(joined.map(_.getLong(2)).sum > 0,
      "substring removal fired on no surviving doc at k=4")
  }
}
