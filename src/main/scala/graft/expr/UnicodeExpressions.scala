package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen entry point for Unicode text canonicalization (static
  * forwarder — generated Java calls it directly). */
object UnicodeNormalizeCodegen {
  import java.text.Normalizer

  /** NFC-normalize, then optionally case-fold (root locale) and strip
    * combining marks (NFD → drop Mn/Me/Mc → NFC). The mark strip runs
    * AFTER the case fold so folded uppercase precomposed characters
    * (É → é → e) strip identically to their decomposed spellings. */
  def normalize(s: UTF8String, lower: Boolean, stripMarks: Boolean): UTF8String = {
    var t = Normalizer.normalize(s.toString, Normalizer.Form.NFC)
    if (lower) t = t.toLowerCase(java.util.Locale.ROOT)
    if (stripMarks) {
      val d = Normalizer.normalize(t, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var i = 0
      while (i < d.length) {
        val cp = d.codePointAt(i)
        val tpe = Character.getType(cp)
        if (tpe != Character.NON_SPACING_MARK &&
            tpe != Character.ENCLOSING_MARK &&
            tpe != Character.COMBINING_SPACING_MARK)
          sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      t = Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
    }
    UTF8String.fromString(t)
  }
}

/** Unicode canonicalization for dedup/fingerprint keys:
  * `unicode_normalize(text, lower, stripMarks)` = NFC → optional root
  * case fold → optional accent strip.
  *
  * Why it's first-class in a multilingual corpus pipeline: the SAME word
  * arrives both precomposed (U+00E9 é) and decomposed (e + U+0301) from
  * different sources, so exact/MinHash/substring dedup silently treats
  * equal text as distinct until keys are NFC'd; the fold/strip variants
  * are the looser canonical forms query-side matching and language-ID
  * want. A native expression keeps the (per-row, allocation-heavy) JDK
  * normalizer call inside whole-stage codegen — a Scala UDF here would
  * split the ingest stage exactly like the date parser's would
  * ([[ParseDateStruct]]).
  *
  * Cross-engine contract: JDK `java.text.Normalizer` (Unicode NFC/NFD
  * data) must agree with DuckDB's utf8proc (`nfc_normalize`, `lower`,
  * `strip_accents`) — the harness query pins that agreement over
  * combining-mark fixtures; both implement the same Unicode tables, and
  * the hash gate is what holds them to it. */
case class UnicodeNormalize(child: Expression, lower: Boolean,
                            stripMarks: Boolean) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeCodegen.normalize(input.asInstanceOf[UTF8String],
      lower, stripMarks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.UnicodeNormalizeCodegen.normalize($a, $lower, $stripMarks);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
