package graft.expr

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Equivalence oracle for the fused single-pass [[TextProfile]] expression:
  * every field must equal the regexp-built column it replaced, over inputs
  * chosen to hit the gnarly boundary semantics — Spark's space-only trim vs
  * Java's \s class (tab/VT/FF edges), split(limit=-1) leading/trailing empty
  * elements, supplementary code points, CJK markers flanked by ASCII word
  * chars (the "\b的\b" case), stopword alternation order. */
class TextExprPropsSpec extends SparkSpec {

  private val stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "from", "that", "this")
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "que", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  private def randomStrings: Seq[String] = {
    val rnd = new scala.util.Random(20260812)
    val atoms = Seq(
      "the", "The", "THE", "a", "an", "and", "der", "und", "la", "les", "que",
      "theory", "android", "wither", "x_1", "42", "_",
      "的", "是", "了", "在", "我", "汉字文本", "a的b", "x的", "的y", "的",
      "😀", "👍🏽", "naïve", "café", "Ωμέγα",
      "a٣b", "a­b", "áb", "a①b", "_the_", "thé", "́the",
      ".", ",", ";", ":", "!", "?", "...", "?!", "--", "'", "\"",
      " ", "  ", "\t", "\n", "\r", "", "\f", "\r\n")
    val fixed = Seq(
      "", " ", "  ", "\t", "\tfoo", "foo\t", "\tfoo\t", " \t foo \t ",
      "", "ab", "the the the", "a.b,c;d:e!f?g",
      "a的b c的d", "的的的", "ab的", "的ab", "the和and",
      "😀 the 😀", "x".*(50), ("w ".*(30)).trim)
    fixed ++ (0 until 300).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => atoms(rnd.nextInt(atoms.length)))
        .mkString("")
    }
  }

  test("fused profile fields equal the regex-built columns on 320 adversarial strings") {
    import spark.implicits._
    val t = col("text")
    val stopPattern = "(?i)\\b(" + stopwords.mkString("|") + ")\\b"
    val tokensRe = when(trim(t) === "" || t.isNull, lit(0))
      .otherwise(size(split(trim(t), "\\s+")))
    val langScores = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val pat = "(?i)\\b(" + words.mkString("|") + ")\\b"
      lang -> regexp_count(t, lit(pat))
    }
    val langRe = langScores.map { case (lang, s) =>
      struct(s.as("score"), lit(lang).as("lang"))
    }.reduce((a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a))
      .getField("lang")

    val df = randomStrings.toDF("text")
      .withColumn("p", TextExpressions.text_profile(t))
      .select(t,
        col("p.n_chars"), length(t).as("e_chars"),
        col("p.n_tokens"), tokensRe.as("e_tokens"),
        col("p.n_bpeish"),
        regexp_count(t, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]")).as("e_bpeish"),
        col("p.n_punct"),
        length(regexp_replace(t, "[^.,;:!?]", "")).as("e_punct"),
        col("p.n_stopwords"), regexp_count(t, lit(stopPattern)).as("e_stop"),
        col("p.n_nonspace"),
        length(regexp_replace(t, "\\s+", "")).as("e_nonspace"),
        col("p.lang"), langRe.as("e_lang"))
    df.collect().foreach { r =>
      val txt = r.getString(0)
      def show = txt.map(c => f"\\u${c.toInt}%04x").mkString
      assert(r.getInt(1) == r.getInt(2), s"n_chars on [$show]")
      assert(r.getInt(3) == r.getInt(4), s"n_tokens on [$show]")
      assert(r.getInt(5) == r.getInt(6), s"n_bpeish on [$show]")
      assert(r.getInt(7) == r.getInt(8), s"n_punct on [$show]")
      assert(r.getInt(9) == r.getInt(10), s"n_stopwords on [$show]")
      assert(r.getInt(11) == r.getInt(12), s"n_nonspace on [$show]")
      assert(r.getString(13) == r.getString(14), s"lang on [$show]")
    }
  }

  test("null text: struct null, coalesced operator columns match old semantics") {
    import spark.implicits._
    val df = Seq(Some("a b"), None).toDF("text")
    val q = graft.operators.TextAnalysis.withQualityColumns(df)
      .select("n_chars_actual", "n_tokens", "mean_token_len").collect()
    assert(q(1).isNullAt(0) && q(1).getInt(1) == 0 && q(1).getDouble(2) == 0.0)
    val l = graft.operators.TextAnalysis.withLangId(df).select("lang_pred").collect()
    assert(l(1).getString(0) == "de")
  }
}
