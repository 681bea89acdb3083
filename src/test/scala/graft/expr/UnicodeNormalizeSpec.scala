package graft.expr

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TextAnalysis

/** Every non-ASCII literal in this spec is a backslash-u escape on
  * purpose: a precomposed e-acute and a decomposed one RENDER
  * identically, so spelled-out escapes are the only reviewable form. */
class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val preCafe = "Caf\u00e9" // precomposed
  private val decCafe = "Cafe\u0301" // e + combining acute

  private def norm(s: String, lower: Boolean = false,
                   stripMarks: Boolean = false): String =
    UnicodeNormalizeCodegen.normalize(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      lower, stripMarks).toString

  test("NFC makes precomposed and decomposed spellings dedup-equal") {
    // THE use case: the same word from two sources, one precomposed
    // (U+00E9), one decomposed (e + U+0301) - unequal raw, equal NFC'd
    assert(preCafe != decCafe)
    assert(norm(preCafe) == norm(decCafe) && norm(decCafe) == preCafe)
    assert(norm("E\u0301cole") == "\u00c9cole")
    assert(norm("no\u0308el") == "n\u00f6el")
    // idempotent, and a no-op on already-NFC text
    assert(norm(norm(decCafe)) == norm(decCafe))
    assert(norm("ascii only") == "ascii only")
  }

  test("case fold and accent strip compose in the documented order") {
    assert(norm("\u00c9cole", lower = true) == "\u00e9cole")
    assert(norm("\u00c9cole", lower = true, stripMarks = true) == "ecole")
    assert(norm("CAF\u00c9", lower = true, stripMarks = true) == "cafe")
    // sharp s: no accent to strip, no ROOT-locale fold surprise
    assert(norm("\u00dfTRASSE", lower = true, stripMarks = true) == "\u00dftrasse")
    // strip without fold keeps case
    assert(norm("\u00c9cole", stripMarks = true) == "Ecole")
  }

  test("column expression matches the codegen entry point, nulls pass through") {
    val rows = Seq(Some(decCafe + " x"), Some("no\u0308el"), None,
      Some("CAF\u00c9"))
    val out = rows.toDF("t")
      .select(col("t"),
        TextAnalysis.normalizeUnicode(col("t")).as("n"),
        TextAnalysis.normalizeUnicode(col("t"), lower = true,
          stripMarks = true).as("f"))
      .collect()
    rows.zip(out).foreach {
      case (Some(s), r) =>
        assert(r.getString(1) == norm(s) && r.getString(2) == norm(s, true, true))
      case (None, r) => assert(r.isNullAt(1) && r.isNullAt(2))
    }
  }

  test("exact dedup over mixed-form corpus: keys collide only after NFC") {
    val docs = Seq((1L, preCafe + " menu"), (2L, decCafe + " menu"),
      (3L, "other doc")).toDF("id", "t")
    val rawGroups = docs.groupBy(col("t")).count().count()
    val nfcGroups = docs
      .groupBy(TextAnalysis.normalizeUnicode(col("t"))).count().count()
    assert(rawGroups == 3 && nfcGroups == 2,
      "un-normalized dedup must miss the cross-form duplicate; NFC finds it")
  }
}
