package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction over a document corpus — the classic
  * "characterize each document by its most distinctive terms" operator of a
  * training-data pipeline (topic tagging, near-dup explanation, quality
  * triage). Beyond-reference extension (SURVEY.md §7.1.9).
  *
  * Spark-first shape, three exchanges total, each on a natural key:
  *   1. flatMap tokens → groupBy (doc, term) count        [shuffle: doc+term]
  *   2. groupBy term → document frequency                 [shuffle: term]
  *   3. join tf × broadcast(df) → window top-k per doc    [shuffle: doc]
  * The document-frequency table is VOCABULARY-sized (≪ corpus) and joins
  * back broadcast, so the only big-data shuffles key on (doc, term) — even
  * at 100 TB the heavy side never shuffles on the skewed bare `term` key.
  * Stop-term skew therefore can't produce a hot reduce partition on the
  * corpus side; the term-keyed aggregation sees at most |vocab| groups.
  *
  * Determinism: scores are ranked on ROUND(tfidf, 6) with term as the
  * tie-break, so ranking never depends on sub-ulp log() differences between
  * engines (the DuckDB oracle reproduces the same rounding).
  */
object TfIdf {

  /** Whitespace tokens of lower(trim(text)) — the corpus-standard basis
    * shared with the shingle/dedup operators. */
  private def tokens(textCol: Column): Column =
    split(trim(lower(textCol)), "\\s+")

  /** Top-`k` terms per document by tf·idf with idf = ln(N / df(term)).
    * Output: (idCol, term, rank, tfidf) where tfidf is rounded to 6 dp.
    * Documents with no tokens yield no rows. */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    val docTerm = df
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val tf = docTerm.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // document frequency: distinct docs per term. Vocabulary-sized output.
    val docFreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val n = df.select(col(idCol)).distinct().count()
    val scored = tf.join(broadcast(docFreq), "term")
      .withColumn("tfidf",
        round(col("tf").cast("double") * log(lit(n.toDouble) / col("df")), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("rank").cast("long").as("rank"),
        col("tfidf"))
  }
}
