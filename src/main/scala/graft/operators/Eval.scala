package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed classifier evaluation: tie-aware ROC-AUC and calibration
  * bins, in pure INTEGER arithmetic so every figure is exactly
  * reproducible cross-engine (no float summation-order drift).
  *
  * AUC via the Mann–Whitney rank-sum identity, NOT a per-row global sort:
  * rows collapse to one row per (group, score) with positive/total counts
  * — one map-side-combining shuffle — and the rank walk runs as a window
  * over that GROUPED frame, whose size is the number of DISTINCT scores
  * per group, not the number of rows. With average ranks for ties, twice
  * the positive rank-sum is the integer p·(2·cum + c + 1) summed over
  * score groups, so the statistic is exact.
  *
  * Scale shape: the window partitions by group and walks distinct scores,
  * so the per-partition frame is |score domain|, not |rows| — feed it
  * QUANTIZED integer scores (class probabilities → fixed-point buckets),
  * which is also what makes ties well-defined. Overflow bound: the
  * rank-sum reaches n_pos·2n, so u2 stays in BIGINT up to ~2·10⁹ rows per
  * group — holdout-set scale; shard the group key first if you ever
  * exceed it.
  */
object Eval {

  /** Per-group tie-aware AUC: (grp, n_pos, n_neg, u2, auc_ppm) where
    * u2 = 2·U (integer even under ties) and auc_ppm = AUC in
    * parts-per-million via integer division; NULL when the group lacks
    * both classes (AUC undefined). */
  def aucByGroup(df: DataFrame, groupCol: String, score: Column,
                 label: Column): DataFrame =
    aucFromCounts(df
      .select(col(groupCol).cast("string").as("grp"),
        score.cast("long").as("__s"), label.cast("boolean").as("__l"))
      .filter(col("__s").isNotNull && col("__l").isNotNull)
      .groupBy(col("grp"), col("__s"))
      .agg(sum(when(col("__l"), 1L).otherwise(0L)).as("__p"),
        count(lit(1)).as("__c")))

  /** The rank-walk + U-statistic derivation from a (grp, __s, __p, __c)
    * grouped-counts frame. Split out because the STREAMING twin
    * materializes the same counts from its state store and must derive
    * the identical output — counts are exact sums (mergeable across
    * micro-batches), so stream ≡ batch EXACTLY and the twin shares this
    * code rather than re-implementing it. */
  def aucFromCounts(g: DataFrame): DataFrame = {
    // ranks 1..n within the group: a tie block of c rows starting after
    // cum rows has average rank cum + (c+1)/2, so twice the block's
    // positive rank-sum is the exact integer p·(2·cum + c + 1)
    val w = Window.partitionBy(col("grp")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = g.withColumn("__cum", coalesce(sum(col("__c")).over(w), lit(0L)))
    r.groupBy(col("grp"))
      .agg(sum(col("__p")).as("n_pos"),
        (sum(col("__c")) - sum(col("__p"))).as("n_neg"),
        (sum(col("__p") * (col("__cum") * 2 + col("__c") + 1)))
          .as("__r2"))
      .select(col("grp"), col("n_pos"), col("n_neg"),
        (col("__r2") - col("n_pos") * (col("n_pos") + 1)).as("u2"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("(1000000 * (__r2 - n_pos * (n_pos + 1))) div (2 * n_pos * n_neg)"))
          .as("auc_ppm"))
  }

  /** Fixed-width calibration (reliability) table: integer scores in
    * [lo, hi) → `nBins` equal bins (out-of-range clamps to the edge
    * bins), per (group, bin): row count, positive count, and the exact
    * integer score sum — mean predicted score vs observed positive rate
    * without a single float. One map-side-combining shuffle on
    * (group, bin); bin count bounds the result size. */
  def calibrationBins(df: DataFrame, groupCol: String, score: Column,
                      label: Column, nBins: Int, lo: Long,
                      hi: Long): DataFrame = {
    require(nBins > 0 && hi > lo, s"need nBins>0 and hi>lo, got $nBins, [$lo,$hi)")
    df.select(col(groupCol).cast("string").as("grp"),
        score.cast("long").as("__s"), label.cast("boolean").as("__l"))
      .filter(col("__s").isNotNull && col("__l").isNotNull)
      .withColumn("__raw", (col("__s") - lit(lo)) * lit(nBins.toLong))
      // `div` and the oracle's `//` both truncate toward zero (measured),
      // so the bin index agrees everywhere; the greatest(0) clamp would
      // additionally absorb any negative-quotient divergence (score < lo)
      .withColumn("__bin", least(greatest(expr(s"__raw div ${hi - lo}"),
        lit(0L)), lit(nBins.toLong - 1L)))
      .groupBy(col("grp"), col("__bin").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__l"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("__s")).as("score_sum"))
  }

  /** Fixed-point nDCG discount table: discount(rank r) = 1/log2(r+1) in
    * parts-per-million, rounded half-up ONCE and frozen as literals so
    * both engines (and the oracle SQL, which embeds the same constants)
    * use bit-identical discounts — the ranking metric becomes pure
    * integer arithmetic, immune to log/float last-ulp drift. Extend the
    * table if a caller ever needs k > 10. */
  val NdcgDiscountPpm: Seq[Long] = Seq(1000000L, 630930L, 500000L,
    430677L, 386853L, 356207L, 333333L, 315465L, 301030L, 289065L)

  /** Per-query nDCG@k over an ALREADY-RANKED candidate frame
    * (queryCol, rankCol in 1..k, relCol integer gain ≥ 0):
    * (query, n_ranked, dcg_ppm, idcg_ppm, ndcg_ppm).
    *
    * DCG is the rel-weighted sum of the literal ppm discounts at the
    * system ranks; the IDEAL ranks come from a row_number window that
    * re-sorts the SAME ≤k candidates by (rel desc, rank asc) — nDCG's
    * standard "ideal ordering of the retrieved set" form, whose window
    * frame is k rows per query, never corpus-sized, so the metric adds
    * one bounded window + one combining shuffle regardless of corpus
    * scale. ndcg_ppm = ⌊10⁶·DCG/IDCG⌋ by integer division (NULL when
    * every candidate is irrelevant ⇒ IDCG = 0). */
  def ndcgAtK(ranked: DataFrame, queryCol: String, rankCol: String,
              relCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= NdcgDiscountPpm.size,
      s"k must be in [1, ${NdcgDiscountPpm.size}], got $k")
    val disc = array(NdcgDiscountPpm.take(k).map(lit): _*)
    val w = Window.partitionBy(col("query"))
      .orderBy(col("__rel").desc, col("__r").asc)
    ranked
      .select(col(queryCol).as("query"), col(rankCol).cast("int").as("__r"),
        col(relCol).cast("long").as("__rel"))
      .filter(col("__r").between(1, k) && col("__rel").isNotNull)
      .withColumn("__ir", row_number().over(w))
      .groupBy(col("query"))
      .agg(count(lit(1)).as("n_ranked"),
        sum(col("__rel") * element_at(disc, col("__r"))).as("dcg_ppm"),
        sum(col("__rel") * element_at(disc, col("__ir"))).as("idcg_ppm"))
      .select(col("query"), col("n_ranked"), col("dcg_ppm"), col("idcg_ppm"),
        when(col("idcg_ppm") > 0,
          expr("(1000000 * dcg_ppm) div idcg_ppm")).as("ndcg_ppm"))
  }

  /** Fixed-point average precision @ k over the same ranked frame:
    * per query, AP = mean over RELEVANT ranks r_i of precision@r_i,
    * normalized by the CORPUS-side relevant total (the standard "MAP"
    * denominator — misses below k count against you). The fixed-point
    * contract (documented like [[NdcgDiscountPpm]]): each hit's
    * precision term is floored to ppm FIRST — (10⁶·hits_so_far) div
    * rank — then the term sum is divided by n_rel, so every engine
    * reproduces the figure bit-for-bit with no rational arithmetic.
    * One cumulative window over ≤k rows per query + one combining
    * aggregate; NULL when n_rel is 0 or unknown. */
  def apAtK(ranked: DataFrame, queryCol: String, rankCol: String,
            relCol: String, k: Int, totalRel: DataFrame): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val w = Window.partitionBy(col("query")).orderBy(col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .select(col(queryCol).as("query"), col(rankCol).cast("int").as("__r"),
        (col(relCol).cast("long") > 0).as("__hit"))
      .filter(col("__r").between(1, k))
      .withColumn("__cum", sum(when(col("__hit"), 1L).otherwise(0L)).over(w))
      .withColumn("__term",
        when(col("__hit"), expr("(1000000 * __cum) div __r")).otherwise(0L))
      .groupBy(col("query"))
      .agg(sum(col("__term")).as("__tsum"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("hits"))
      .join(totalRel.select(col("query"), col("n_rel").cast("long").as("n_rel")),
        Seq("query"), "left")
      .select(col("query"), col("hits"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        when(coalesce(col("n_rel"), lit(0L)) > 0,
          expr("__tsum div n_rel")).as("ap_ppm"))
  }

  /** The binary rank-metric family over the same ranked frame as
    * [[ndcgAtK]] (rel > 0 counts as relevant): per query —
    * `hits` (relevant retrieved in the top k), `first_rel_rank`,
    * `rr_ppm` = ⌊10⁶/first_rel_rank⌋ (reciprocal rank; NULL when nothing
    * relevant was retrieved), `p_at_k_ppm` = ⌊10⁶·hits/k⌋, and
    * `recall_ppm` = ⌊10⁶·hits/n_rel⌋ against `totalRel`
    * (query, n_rel) — the corpus-side relevant count, which only the
    * caller can know (NULL recall when n_rel is 0 or the query is
    * missing from `totalRel`). One combining aggregate; the `totalRel`
    * join is per-QUERY-sized, broadcastable at any corpus scale. */
  def rankMetricsAtK(ranked: DataFrame, queryCol: String, rankCol: String,
                     relCol: String, k: Int, totalRel: DataFrame): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    ranked
      .select(col(queryCol).as("query"), col(rankCol).cast("int").as("__r"),
        (col(relCol).cast("long") > 0).as("__hit"))
      .filter(col("__r").between(1, k))
      .groupBy(col("query"))
      .agg(count(lit(1)).as("n_ranked"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("hits"),
        min(when(col("__hit"), col("__r"))).cast("long").as("first_rel_rank"))
      .join(totalRel.select(col("query"), col("n_rel").cast("long").as("n_rel")),
        Seq("query"), "left")
      .select(col("query"), col("n_ranked"), col("hits"),
        col("first_rel_rank"),
        expr("1000000 div first_rel_rank").as("rr_ppm"),
        expr(s"(1000000 * hits) div ${k}L").as("p_at_k_ppm"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        when(coalesce(col("n_rel"), lit(0L)) > 0,
          expr("(1000000 * hits) div n_rel")).as("recall_ppm"))
  }

  /** Sentence BLEU (n = 1..4) over (candidate, reference) token-array
    * columns — generation eval, the complement of the IR metrics above.
    * Per pair: lengths, clipped/total n-gram counts (pure integers from
    * the per-row [[graft.expr.BleuStats]] expression — zero shuffle),
    * per-n modified precisions floored to ppm, and `bleu_milli` =
    * ⌊(10¹²·∏aₙ/∏bₙ)^¼⌋ — the BLEU-4 geometric mean as an EXACT integer
    * 4th root (3-digit fixed point; 0 when any aₙ = 0, the unsmoothed
    * zero). The brevity penalty is exp(1−r/c) — transcendental, so it is
    * emitted as the exact INGREDIENTS (len_c, len_r) rather than baked
    * into the integer score; the oracled fixture pins BP ≡ 1 by
    * construction (candidate strictly longer than reference). */
  def bleuUpTo4(df: DataFrame, idCol: String, candCol: String,
                refCol: String): DataFrame = {
    val b = col("__b")
    df.select(col(idCol),
        size(col(candCol)).cast("long").as("len_c"),
        size(col(refCol)).cast("long").as("len_r"),
        graft.expr.GenEvalExpressions.bleu_stats(col(candCol), col(refCol))
          .as("__b"))
      .select(Seq(col(idCol), col("len_c"), col("len_r")) ++
        (1 to 4).flatMap(n => Seq(
          b.getField(s"a$n").as(s"a$n"), b.getField(s"b$n").as(s"b$n"))) :+
        b.getField("bleu_milli").as("bleu_milli"): _*)
      .select(Seq(col(idCol), col("len_c"), col("len_r")) ++
        (1 to 4).flatMap(n => Seq(col(s"a$n"), col(s"b$n"),
          when(col(s"b$n") > 0, expr(s"(1000000 * a$n) div b$n"))
            .as(s"p${n}_ppm"))) :+
        col("bleu_milli"): _*)
  }

  /** chrF (β = 2) over (candidate, reference) STRING columns — the third
    * standard generation metric, completing BLEU's word-precision view
    * with character-level recall (robust to tokenization and morphology).
    * Character n-grams n = 1..6 on whitespace-stripped text, clipped
    * multiset matches; the fixed-point contract (documented in
    * [[graft.expr.GenEvalOps.chrfStats]]): per-n P/R ppm-floored FIRST,
    * integer-averaged over the n included on both sides, one more floor
    * division for F — every figure integer-exact cross-engine. Emits the
    * per-n triples (m, c, r) so any β or n-range can be re-derived. */
  def chrF(df: DataFrame, idCol: String, candCol: String,
           refCol: String): DataFrame = {
    val s = col("__s")
    df.select(col(idCol),
        graft.expr.GenEvalExpressions.chrf_stats(col(candCol), col(refCol))
          .as("__s"))
      .select(Seq(col(idCol)) ++
        (1 to 6).flatMap(n => Seq(s.getField(s"m$n").as(s"m$n"),
          s.getField(s"c$n").as(s"c$n"), s.getField(s"r$n").as(s"r$n"))) :+
        when(s.getField("chrf_ppm") >= 0, s.getField("chrf_ppm"))
          .as("chrf_ppm"): _*)
  }

  /** Token-level F1 (the SQuAD/QA answer-overlap metric) over
    * (candidate, reference) token-array columns: overlap = CLIPPED
    * unigram matches (multiset intersection — the BLEU n=1 statistic,
    * reused from the same codegen expression), P = o/|c|, R = o/|r|,
    * F₁ = 2o/(|c|+|r|) — exactly rational like ROUGE-L, three ppm
    * floors, NULL on an empty side (undefined). Zero shuffle. */
  def tokenF1(df: DataFrame, idCol: String, candCol: String,
              refCol: String): DataFrame =
    df.select(col(idCol),
        size(col(candCol)).cast("long").as("len_c"),
        size(col(refCol)).cast("long").as("len_r"),
        graft.expr.GenEvalExpressions.bleu_stats(col(candCol), col(refCol))
          .getField("a1").as("overlap"))
      .select(col(idCol), col("len_c"), col("len_r"), col("overlap"),
        when(col("len_c") > 0, expr("(1000000 * overlap) div len_c"))
          .as("f1_p_ppm"),
        when(col("len_r") > 0, expr("(1000000 * overlap) div len_r"))
          .as("f1_r_ppm"),
        when(col("len_c") + col("len_r") > 0,
          expr("(2000000 * overlap) div (len_c + len_r)")).as("f1_ppm"))

  /** ROUGE-N recall (n = 1, 2) over (candidate, reference) token-array
    * columns — the n-gram-recall half of the summarization pair (ROUGE-L
    * covers subsequence recall): clipped n-gram matches (the BLEU aₙ
    * statistics, same codegen expression) over the REFERENCE n-gram
    * totals |r|−n+1, ppm-floored. NULL when the reference has no n-gram
    * of that order. */
  def rougeN(df: DataFrame, idCol: String, candCol: String,
             refCol: String): DataFrame = {
    val b = graft.expr.GenEvalExpressions.bleu_stats(col(candCol), col(refCol))
    df.select(col(idCol),
        size(col(refCol)).cast("long").as("len_r"),
        b.getField("a1").as("a1"), b.getField("a2").as("a2"))
      .select(col(idCol), col("a1"),
        greatest(col("len_r"), lit(0L)).as("t1"),
        col("a2"),
        greatest(col("len_r") - 1, lit(0L)).as("t2"))
      .select(col(idCol), col("a1"), col("t1"),
        when(col("t1") > 0, expr("(1000000 * a1) div t1")).as("rouge1_r_ppm"),
        col("a2"), col("t2"),
        when(col("t2") > 0, expr("(1000000 * a2) div t2")).as("rouge2_r_ppm"))
  }

  /** Word error rate over (candidate, reference) token-array columns —
    * the ASR/translation workhorse: WER = editDistance(cand, ref) /
    * |ref|, unit-cost Levenshtein over tokens (per-row rolling DP via
    * [[graft.expr.TokenEditDistance]], zero shuffle). Exactly rational ⇒
    * one floor division to ppm; NULL on an empty reference (undefined —
    * note WER may exceed 1e6 ppm when the candidate is much longer than
    * the reference, which is standard). */
  def wer(df: DataFrame, idCol: String, candCol: String,
          refCol: String): DataFrame =
    df.select(col(idCol),
        size(col(candCol)).cast("long").as("len_c"),
        size(col(refCol)).cast("long").as("len_r"),
        graft.expr.GenEvalExpressions.token_edit_distance(col(candCol),
          col(refCol)).cast("long").as("edit_dist"))
      .select(col(idCol), col("len_c"), col("len_r"), col("edit_dist"),
        when(col("len_r") > 0, expr("(1000000 * edit_dist) div len_r"))
          .as("wer_ppm"))

  /** Character error rate over (candidate, reference) STRING columns:
    * CER = levenshtein(cand, ref) / chars(ref), the tokenization-free
    * twin of [[wer]] — Spark's builtin codegen'd `levenshtein` does the
    * per-row DP. NULL on an empty reference. */
  def cer(df: DataFrame, idCol: String, candCol: String,
          refCol: String): DataFrame =
    df.select(col(idCol),
        length(col(candCol)).cast("long").as("len_c"),
        length(col(refCol)).cast("long").as("len_r"),
        levenshtein(col(candCol), col(refCol)).cast("long").as("edit_dist"))
      .select(col(idCol), col("len_c"), col("len_r"), col("edit_dist"),
        when(col("len_r") > 0, expr("(1000000 * edit_dist) div len_r"))
          .as("cer_ppm"))

  /** ROUGE-L over the same (candidate, reference) token-array columns.
    * ROUGE-L is EXACTLY rational — P = L/c, R = L/r, and the β=1
    * F-measure collapses to 2L/(c+r) — so unlike BLEU the whole metric
    * is three floor divisions to ppm over the per-row LCS length
    * ([[graft.expr.LcsLength]], rolling-row DP, zero shuffle). NULL ppm
    * on empty sides (undefined, not zero). */
  def rougeL(df: DataFrame, idCol: String, candCol: String,
             refCol: String): DataFrame =
    df.select(col(idCol),
        size(col(candCol)).cast("long").as("len_c"),
        size(col(refCol)).cast("long").as("len_r"),
        graft.expr.GenEvalExpressions.lcs_length(col(candCol), col(refCol))
          .cast("long").as("lcs"))
      .select(col(idCol), col("len_c"), col("len_r"), col("lcs"),
        when(col("len_c") > 0, expr("(1000000 * lcs) div len_c"))
          .as("rouge_p_ppm"),
        when(col("len_r") > 0, expr("(1000000 * lcs) div len_r"))
          .as("rouge_r_ppm"),
        when(col("len_c") + col("len_r") > 0,
          expr("(2000000 * lcs) div (len_c + len_r)")).as("rouge_f_ppm"))
}
