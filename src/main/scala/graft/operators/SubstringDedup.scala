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
  * length L >= k is repeated iff all of its L-k+1 anchors are, so merging
  * each doc's surviving anchor positions into maximal intervals
  * reconstructs exactly the maximal repeated spans — no pairwise doc
  * comparison ever happens.
  *
  * Scale shape: the gram explode is k× the token count but flows straight
  * into a map-side-combined groupBy whose key space shrinks to the
  * distinct-gram count; the island merge is one window over (doc, pos) —
  * one shuffle keyed by doc_id, bounded per-doc state. At 100 TB the gram
  * STRING is the shuffle cost — production swaps it for two independent
  * xxhash64 salts (128 collision bits) and shuffles 16 bytes per anchor;
  * the string form here is the exact-oracle contract the driver hashes.
  */
object SubstringDedup {

  /** Tokenization shared with [[Dedup]]: lower, trim, whitespace split,
    * empty tokens dropped (Spark `split` keeps trailing ""s that Java
    * split drops — the filter makes both agree on every whitespace edge). */
  private def tokens(text: org.apache.spark.sql.Column) =
    filter(split(trim(lower(text)), "\\s+"), t => t =!= "")

  /** Maximal repeated >= k-token spans per document:
    * (doc_id, start_tok, end_tok, span_tokens), token offsets 0-based
    * inclusive. `minOccurrences` counts corpus-wide anchor occurrences
    * (2 = "appears anywhere else, including elsewhere in the same doc"). */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 8, minOccurrences: Int = 2): DataFrame = {
    require(k >= 2, s"anchor gram needs k >= 2 tokens, got $k")
    // anchors: one row per k-gram start position (0-based)
    val grams = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= k)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("__tk")) - k),
          i => array_join(slice(col("__tk"), i + 1, lit(k)), " ")))
          .as(Seq("pos", "gram")))
    val repeated = grams
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") >= minOccurrences)
      .select(col("gram"))
    // island merge: consecutive surviving anchors whose spans overlap or
    // touch (gap <= k) belong to one maximal repeated interval
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    grams.join(repeated, Seq("gram"))
      .select(col("doc_id"), col("pos"))
      .withColumn("__prev", lag(col("pos"), 1).over(wOrd))
      .withColumn("__new",
        when(col("__prev").isNull || col("pos") > col("__prev") + k, 1).otherwise(0))
      .withColumn("__isl", sum(col("__new")).over(wOrd))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("pos")).cast("long").as("start_tok"),
        (max(col("pos")) + k - 1).cast("long").as("end_tok"))
      .select(col("doc_id"), col("start_tok"), col("end_tok"),
        (col("end_tok") - col("start_tok") + 1).as("span_tokens"))
  }
}
