package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-substring detection across a corpus — the dedup mode of
  * Lee et al., "Deduplicating Training Data Makes Language Models Better"
  * (ACL'22): find every maximal span of >= k tokens that occurs more than
  * once ANYWHERE in the corpus (other docs or the same doc), at arbitrary
  * boundaries. Winnowing finds document/passage pairs and chunk dedup
  * finds exact chunk collisions; neither sees a repeated span that
  * straddles chunk boundaries or is shorter than a passage.
  *
  * Lee et al. build a suffix array — inherently sequential over a single
  * in-memory corpus. The distributed equivalent here: every k-token
  * "anchor gram" (position i covers tokens [i, i+k-1]) is emitted once,
  * grouped, and kept iff it occurs >= minOccurrences times; a span of
  * length L >= k is repeated iff ALL of its L-k+1 anchors are, so merging
  * each doc's surviving anchor positions into maximal runs of CONSECUTIVE
  * positions (`pos == prev + 1` — a gap of even one anchor means some
  * k-window inside the union is NOT repeated, so merging across any gap
  * would claim a span that never occurs twice) reconstructs exactly the
  * maximal repeated spans — no pairwise doc comparison ever happens.
  * Spans from different consecutive runs may OVERLAP (anchors 0 and 3 at
  * k=8 → maximal repeated spans [0,7] and [3,10]); that is correct — each
  * is repeated, their union is not.
  *
  * Scale shape: the gram explode is k× the token count but flows straight
  * into a map-side-combined groupBy whose key space shrinks to the
  * distinct-gram count; the island merge is one window over (doc, pos) —
  * one shuffle keyed by doc_id, bounded per-doc state. At 100 TB the gram
  * STRING is the shuffle cost — `hashKeys = true` swaps it for two
  * independent xxhash64 salts (128 collision bits: a false merge needs a
  * simultaneous collision in both, ~2^-128 per gram pair) and shuffles 16
  * bytes per anchor regardless of k. The string form is the exact-oracle
  * contract the driver hashes; the spec asserts the two paths agree on
  * real data.
  */
object SubstringDedup {

  /** Tokenization shared with the rest of the engine — the one
    * empty-filtered definition in [[Dedup.cleanTokens]]. */
  private def tokens(text: org.apache.spark.sql.Column) =
    Dedup.cleanTokens(text)

  /** Maximal repeated >= k-token spans per document:
    * (doc_id, start_tok, end_tok, span_tokens), token offsets 0-based
    * inclusive. `minOccurrences` counts corpus-wide anchor occurrences
    * (2 = "appears anywhere else, including elsewhere in the same doc"). */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 8, minOccurrences: Int = 2,
                    hashKeys: Boolean = false): DataFrame = {
    require(k >= 2, s"anchor gram needs k >= 2 tokens, got $k")
    // anchors: one row per k-gram start position (0-based)
    val grams = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= k)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("__tk")) - k),
          i => array_join(slice(col("__tk"), i + 1, lit(k)), " ")))
          .as(Seq("pos", "gram")))
    // the occurrence-count key: the gram text itself (exact, what the
    // oracle re-derives) or its 128-bit double-hash (the at-scale shuffle)
    val keyed =
      if (hashKeys)
        grams.select(col("doc_id"), col("pos"),
          xxhash64(col("gram")).as("__g1"),
          xxhash64(col("gram"), lit(1)).as("__g2"))
      else
        grams.select(col("doc_id"), col("pos"),
          col("gram").as("__g1"), lit(0L).as("__g2"))
    val repeated = keyed
      .groupBy(col("__g1"), col("__g2"))
      .agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") >= minOccurrences)
      .select(col("__g1"), col("__g2"))
    // island merge: only CONSECUTIVE surviving anchors extend one repeated
    // span (see scaladoc — any gap breaks the all-anchors-repeated proof)
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    keyed.join(repeated, Seq("__g1", "__g2"))
      .select(col("doc_id"), col("pos"))
      .withColumn("__prev", lag(col("pos"), 1).over(wOrd))
      .withColumn("__new",
        when(col("__prev").isNull || col("pos") > col("__prev") + 1, 1).otherwise(0))
      .withColumn("__isl", sum(col("__new")).over(wOrd))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("pos")).cast("long").as("start_tok"),
        (max(col("pos")) + k - 1).cast("long").as("end_tok"))
      .select(col("doc_id"), col("start_tok"), col("end_tok"),
        (col("end_tok") - col("start_tok") + 1).as("span_tokens"))
  }

  /** The removal half of Lee et al.: rewrite each document with every
    * repeated span occurrence dropped EXCEPT one corpus-wide canonical
    * copy (the occurrence with the smallest (doc_id, start) — the same
    * keep-first rule as every other dedup mode here). Occurrences are
    * grouped by their exact span TEXT, so only identical maximal islands
    * collapse; partially-overlapping repeats survive (conservative, like
    * the paper's own suffix-array cut).
    *
    * Output: (doc_id, clean_text, n_removed) for EVERY input doc —
    * untouched docs pass through with n_removed = 0.
    *
    * Scale shape: adds two shuffles to [[repeatedSpans]] — one keyed by
    * span text (canonical election; spans are rare, this frame is tiny
    * relative to the corpus) and one doc-keyed removal-list aggregation
    * whose per-doc state is bounded by islands-per-doc. The rewrite
    * itself is pure per-row HOFs (filter positions against the removal
    * intervals, re-join) — no extra shuffle, stays in codegen. The
    * doc_id·2^20+start composite min is the [[Dedup.chunkDups]] idiom:
    * one decomposable aggregate instead of a struct-min, range-guarded
    * in-expression. */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          k: Int = 8, minOccurrences: Int = 2,
                          hashKeys: Boolean = false): DataFrame = {
    val spans = repeatedSpans(df, idCol, textCol, k, minOccurrences, hashKeys)
    val toks = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__tk"))
    // composite (doc, start) key — guarded like chunkDups: the guard lives
    // inside the used expression so it cannot be pruned
    def composite = when(
      col("start_tok") < 1048576L && col("doc_id").between(0L, (1L << 43) - 1),
      col("doc_id") * 1048576L + col("start_tok"))
      .otherwise(raise_error(lit(
        "removeRepeatedSpans: start_tok >= 2^20 or doc_id outside [0, 2^43)")))
    val withText = spans.join(toks, Seq("doc_id"))
      .select(col("doc_id"), col("start_tok"), col("end_tok"),
        array_join(slice(col("__tk"), (col("start_tok") + 1).cast("int"),
          (col("end_tok") - col("start_tok") + 1).cast("int")), " ").as("span_text"))
    val canon = withText.groupBy(col("span_text")).agg(min(composite).as("__ck"))
    val removals = withText.join(canon, Seq("span_text"))
      .filter(composite =!= col("__ck"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("start_tok").as("s"), col("end_tok").as("e")))
        .as("__rms"),
        sum(col("end_tok") - col("start_tok") + 1).as("__nrm"))
    toks.join(removals, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__rms").isNull, array_join(col("__tk"), " "))
          .otherwise(array_join(transform(
            filter(sequence(lit(0), size(col("__tk")) - 1),
              i => !exists(col("__rms"),
                s => i >= s.getField("s") && i <= s.getField("e"))),
            i => element_at(col("__tk"), (i + 1).cast("int"))), " "))
          .as("clean_text"),
        coalesce(col("__nrm"), lit(0L)).cast("long").as("n_removed"))
  }
}
