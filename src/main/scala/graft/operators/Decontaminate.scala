package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share word
  * n-grams with an evaluation/benchmark set. Beyond-reference extension
  * (SURVEY.md §7.1.9): the standard pre-training hygiene step (GPT-3 §5 /
  * PaLM-style 8-gram overlap checks).
  *
  * Scale design (100 TB posture): the corpus side is the 100 TB table and
  * the eval side is a benchmark suite — KBs to low GBs. The eval shingle
  * set is therefore BROADCAST: the corpus is scanned once, shingled
  * narrowly (per-row UDF, no shuffle), probed against the broadcast set
  * (BroadcastHashJoin — still no shuffle), and only the surviving hits are
  * aggregated on doc id (the single shuffle, sized by contamination rate,
  * not corpus size). A shuffle join here would repartition the whole
  * corpus by shingle — the classic scale-killer this operator avoids.
  *
  * Optionally a driver-built Bloom filter over the eval shingles
  * ([[org.apache.spark.sql.DataFrameStatFunctions.bloomFilter]]) prunes
  * the exploded corpus shingle stream BEFORE the broadcast probe: at a 1%
  * false-positive rate the filter is ~1.2 bytes/shingle, an order of
  * magnitude smaller than the broadcast hash relation, and drops the
  * probe volume to (contamination + 1%) of the corpus shingles. False
  * positives are removed by the exact join that follows, so the output is
  * identical with the filter on or off (spec-asserted).
  */
object Decontaminate {

  /** Per-document contamination report: (idCol, n_hits) for every corpus
    * document sharing at least one distinct word n-gram with `eval`;
    * clean documents are absent. `n_hits` counts DISTINCT shared shingles
    * ([[Dedup.shingles]] emits a per-document set).
    */
  def contaminationReport(corpus: DataFrame, eval: DataFrame, idCol: String,
                          textCol: String, n: Int = 5,
                          bloomPrefilter: Boolean = false): DataFrame = {
    val evalShingles = eval
      .select(explode(Dedup.shingles(col(textCol), n)).as("__s")).distinct()
    val corpusShingles = corpus
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("__s"))
    val probed =
      if (!bloomPrefilter) corpusShingles
      else {
        // Driver-bounded by construction: the eval set is the small side.
        val nEval = evalShingles.count()
        val bf = evalShingles.stat.bloomFilter("__s", math.max(nEval, 1L), 0.01)
        val mightContain = udf((s: String) => s != null && bf.mightContain(s))
        corpusShingles.filter(mightContain(col("__s")))
      }
    probed
      .join(broadcast(evalShingles), "__s")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_hits"))
  }
}
