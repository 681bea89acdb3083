package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SentencePiece-style unigram-LM subword tokenizer (Kudo, ACL'18) — the
  * second production tokenizer family next to [[BpeTokenizer]]: BPE builds
  * tokens bottom-up from a merge list; unigram scores a VOCABULARY of
  * pieces with log-probabilities and segments each word by Viterbi
  * (minimum total cost). Most large-model tokenizers ship one of these
  * two as a frozen artifact.
  *
  * Frozen-artifact discipline (the [[BpeTokenizer.frozenMerges]] idiom):
  * the vocabulary is a pure function of the in-code seed word table —
  * candidate substrings utility-ranked, one EM round (Viterbi E-step over
  * the seed corpus, count-re-estimate M-step), integer milli-nat costs —
  * so the oracle literalizes the same (piece → cost) map and replays the
  * Viterbi as a recursive CTE; token streams hash-match exactly.
  *
  * Scale shape: tokenization is a pure per-row function (split →
  * per-word Viterbi over ≤ MaxPieceLen·|word| substring lookups in a
  * broadcast-sized map) — zero shuffle, embarrassingly parallel, the
  * same plan at 100 TB.
  */
object UnigramTokenizer {

  /** Longest piece considered — SentencePiece's default neighborhood is
    * similarly small; bounds the per-char Viterbi fan-in. */
  val MaxPieceLen = 6

  /** Cost charged for a character absent from the vocabulary (robustness
    * fallback; the frozen vocab guarantees [[RequiredChars]] coverage, so
    * this only fires on input outside that alphabet). */
  val UnknownCostMilli = 20000L

  /** Required character coverage (SentencePiece's `required_chars`): the
    * alphabet the artifact must segment regardless of what the seed
    * corpus happens to contain — without it, a seed of English function
    * words ships no 'g'/'j'/'k'/'q' and Viterbi has no path through
    * "join". Every required char enters the vocabulary with smoothing
    * count 1 even when the seed never uses it. */
  val RequiredChars: String = "abcdefghijklmnopqrstuvwxyz0123456789"

  /** Candidate pieces: every substring (length 2..MaxPieceLen) of the
    * seed words, ranked by freq·(len−1) — the Viterbi-savings utility (a
    * piece of length L saves L−1 boundaries each time it is used) — top
    * `keep`, plus every single seed char (the segmentability floor). */
  def candidatePieces(seed: Seq[(String, Long)], keep: Int): Seq[String] = {
    val sub = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    seed.foreach { case (w, c) =>
      var l = 2
      while (l <= math.min(MaxPieceLen, w.length)) {
        var i = 0
        while (i + l <= w.length) { sub(w.substring(i, i + l)) += c; i += 1 }
        l += 1
      }
    }
    val multi = sub.toSeq
      .sortBy { case (p, c) => (-(c * (p.length - 1)), p) }
      .take(keep).map(_._1)
    val chars = (seed.flatMap(_._1.map(_.toString)) ++
      RequiredChars.map(_.toString)).distinct.sorted
    (chars ++ multi).distinct
  }

  private def countOcc(w: String, p: String): Long = {
    var n = 0L
    var i = w.indexOf(p)
    while (i >= 0) { n += 1; i = w.indexOf(p, i + 1) }
    n
  }

  /** Train the frozen vocabulary: initial piece probabilities from
    * freq-weighted occurrence counts, ONE EM round — Viterbi E-step
    * segments every seed word under cost₀ = round(−1000·ln p₀), the
    * M-step re-estimates from the pieces those segmentations actually
    * used (multi-char pieces that lose every Viterbi die, SentencePiece's
    * prune; chars get +1 smoothing so the alphabet never leaves) — then
    * final integer cost_milli = round(−1000·ln(c/total)). StrictMath.log
    * keeps the artifact bit-stable across JVMs. Sorted by piece. */
  def trainFrozen(seed: Seq[(String, Long)], keep: Int): Seq[(String, Long)] = {
    val cands = candidatePieces(seed, keep)
    val occ = cands.map { p =>
      p -> math.max(seed.map { case (w, f) => f * countOcc(w, p) }.sum, 1L)
    }
    val tot0 = occ.map(_._2).sum.toDouble
    val cost0 = occ.map { case (p, c) =>
      p -> math.round(-1000.0 * StrictMath.log(c / tot0))
    }.toMap
    val used = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    seed.foreach { case (w, f) =>
      viterbi(w, cost0).foreach { case (piece, _) => used(piece) += f }
    }
    (seed.flatMap(_._1.map(_.toString)) ++ RequiredChars.map(_.toString))
      .distinct.foreach(c => used(c) += 1L)
    val tot1 = used.values.sum.toDouble
    used.toSeq.map { case (p, c) =>
      p -> math.round(-1000.0 * StrictMath.log(c / tot1))
    }.sortBy(_._1)
  }

  /** The shipped artifact: trained once from [[BpeTokenizer.seedWordCounts]]
    * (the same constant mini-corpus the frozen BPE merges come from). */
  lazy val frozenVocab: Seq[(String, Long)] =
    trainFrozen(BpeTokenizer.seedWordCounts, keep = 48)

  /** Viterbi segmentation: minimize total cost_milli over pieces; equal
    * cost prefers the LONGER last piece (deterministic, and the exact
    * tie order the oracle's struct-min replays). Returns (piece, cost)
    * left to right. */
  def viterbi(word: String, cost: Map[String, Long]): Seq[(String, Long)] = {
    val n = word.length
    if (n == 0) return Nil
    val best = Array.fill(n + 1)(Long.MaxValue)
    val bp = new Array[Int](n + 1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var l = 1
      val maxL = math.min(MaxPieceLen, i)
      while (l <= maxL) {
        val pc = cost.get(word.substring(i - l, i)) match {
          case Some(c) => c
          case None if l == 1 => UnknownCostMilli
          case None => Long.MaxValue
        }
        if (pc != Long.MaxValue && best(i - l) != Long.MaxValue) {
          val c = best(i - l) + pc
          if (c < best(i) || (c == best(i) && l > bp(i))) {
            best(i) = c; bp(i) = l
          }
        }
        l += 1
      }
      i += 1
    }
    var out = List.empty[(String, Long)]
    var j = n
    while (j > 0) {
      val l = bp(j)
      val piece = word.substring(j - l, j)
      out = (piece, cost.getOrElse(piece, UnknownCostMilli)) :: out
      j -= l
    }
    out
  }

  /** Tokenize a text column under a (piece → cost_milli) vocabulary:
    * (id, widx, pidx, piece, score_milli) — word index within the
    * document, piece index within the word. Split + per-word Viterbi,
    * all narrow. */
  def tokenizeWith(df: DataFrame, idCol: String, textCol: String,
                   vocab: Seq[(String, Long)]): DataFrame = {
    val costMap = vocab.toMap
    val segUdf = udf { (w: String) => viterbi(w, costMap) }
    df.select(col(idCol),
        posexplode(filter(split(col(textCol), " "), x => length(x) > 0))
          .as(Seq("widx", "__w")))
      .select(col(idCol), col("widx").cast("long").as("widx"),
        posexplode(segUdf(col("__w"))).as(Seq("pidx", "__p")))
      .select(col(idCol), col("widx"), col("pidx").cast("long").as("pidx"),
        col("__p._1").as("piece"), col("__p._2").as("score_milli"))
  }

  /** Per-document LM cost under the unigram model — the quality signal
    * the tokenizer buys for free: sum of piece costs IS the document's
    * negative log-likelihood in milli-nats (mean per piece ≈ log
    * perplexity), the classic LM-filter score for corpus curation, here
    * integer-exact. One narrow tokenize pass + one doc-keyed combining
    * aggregate. Emits (id, n_pieces, sum_cost_milli, mean_cost_milli). */
  def lmCost(df: DataFrame, idCol: String, textCol: String,
             vocab: Seq[(String, Long)]): DataFrame =
    tokenizeWith(df, idCol, textCol, vocab)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pieces"),
        sum(col("score_milli")).as("sum_cost_milli"))
      .withColumn("mean_cost_milli",
        expr("sum_cost_milli div n_pieces"))

  // ------------------------------------------------------- persistence

  /** Persist a vocabulary as plain parquet (piece, cost_milli): strings
    * and longs round-trip parquet bit-exactly, so load ∘ save = identity. */
  def saveVocab(spark: SparkSession, vocab: Seq[(String, Long)],
                path: String): Unit = {
    import spark.implicits._
    vocab.toDF("piece", "cost_milli").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Reload a persisted vocabulary (sorted by piece — the canonical
    * order [[trainFrozen]] emits). */
  def loadVocab(spark: SparkSession, path: String): Seq[(String, Long)] =
    spark.read.parquet(path).select(col("piece"), col("cost_milli"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
}
