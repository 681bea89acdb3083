package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-corpus analysis operators for large-scale training-data pipelines —
  * beyond-reference extensions (SURVEY.md §7.1.9), all expressed as narrow
  * per-row projections over built-in codegen'd functions (no UDFs in the hot
  * path, no shuffles), so they scale linearly with input splits at 100 TB.
  */
object TextAnalysis {

  /** Whitespace token count: number of `\S+` runs. */
  def tokenCount(text: Column): Column =
    when(trim(text) === "" || text.isNull, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: word pieces + standalone punctuation, the classic
    * pre-tokenizer regex shape. Uses codegen'd regexp_count. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"))

  private val punctRe = "[^.,;:!?]"
  private val stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "from", "that", "this")

  /** Quality-scoring columns: length, token counts, punctuation density,
    * stopword ratio, mean token length — the standard heuristic filters for
    * web-scale corpus cleaning. One projection, codegen end-to-end. */
  def withQualityColumns(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokenCount(t)
    val stopPattern = "(?i)\\b(" + stopwords.mkString("|") + ")\\b"
    df.withColumn("n_chars_actual", length(t))
      .withColumn("n_tokens", toks)
      .withColumn("n_punct", length(regexp_replace(t, punctRe, "")))
      .withColumn("n_stopwords", regexp_count(t, lit(stopPattern)))
      .withColumn("mean_token_len",
        when(toks > 0,
          (length(regexp_replace(t, "\\s+", "")).cast("double") / toks))
          .otherwise(lit(0.0)))
  }

  /** Stopword tables for the n-gram language-ID heuristic. Tiny, broadcast
    * as literals inside the expression (no join). */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "que", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Heuristic language ID: score = marker-word hit count per language,
    * argmax with deterministic lexicographic tie-break. Pure expression —
    * a `greatest`/`when` cascade, no UDF. */
  def withLangId(df: DataFrame, textCol: String = "text",
                 out: String = "lang_pred"): DataFrame = {
    val t = col(textCol)
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val pat = "(?i)\\b(" + words.mkString("|") + ")\\b"
      lang -> regexp_count(t, lit(pat))
    }
    // argmax by (score, reversed-lang) so ties pick the alphabetically first
    val best = scores.map { case (lang, s) =>
      struct(s.as("score"), lit(lang).as("lang"))
    }.reduce((a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a))
    df.withColumn(out, best.getField("lang"))
  }

  /** Canonical form the fingerprint hashes: lowercased, trimmed, whitespace
    * runs collapsed to single spaces. Exposed separately because the
    * normalization IS ANSI-expressible (DuckDB-oracled via
    * `q_text_fingerprint`) while the 64-bit hash of it is engine-specific
    * (xxhash64 — determinism/stability spec-checked in OperatorsSpec). */
  def fingerprintNormalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** 64-bit document fingerprint: polynomial rolling hash over the
    * whitespace-normalized text (content-defined, order-sensitive). Built
    * from Spark's codegen'd xxhash64 over the normalized form — one shuffle-
    * free projection. */
  def fingerprint(text: Column): Column = xxhash64(fingerprintNormalized(text))

  def withFingerprint(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("fingerprint", fingerprint(col(textCol)))
}
