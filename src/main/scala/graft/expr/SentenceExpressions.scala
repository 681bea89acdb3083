package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rule-based sentence segmentation — the unit between documents and
  * tokens that chunking, per-sentence dedup, and context packing all
  * want (fixed-size chunks split mid-sentence; sentence-bounded chunks
  * don't). Beyond-reference extension next to
  * [[graft.operators.TextAnalysis.chunkDocuments]].
  *
  * DETERMINISTIC rules, chosen over a learned segmenter on purpose —
  * the output must be a pure function of the text so it can be
  * hash-oracled and reproduced anywhere:
  *  - a boundary is a run of `.` / `!` / `?` followed by whitespace and
  *    then an uppercase letter or a digit (or end of text);
  *  - a SINGLE period does NOT end a sentence when the word before it
  *    is a known abbreviation (dr, mr, mrs, ms, prof, sr, jr, st, no,
  *    vs, etc, eg, ie, fig, al) — the classic "dr. smith" trap; `..` /
  *    `!?` runs always end (ellipses are hard stops here);
  *  - text after the last terminator is the final sentence;
  *  - sentences keep their terminators, outer whitespace trimmed.
  * Per-row codegen, zero shuffle.
  */
object SentenceOps {

  private val Abbrev: Set[String] = Set("dr", "mr", "mrs", "ms", "prof",
    "sr", "jr", "st", "no", "vs", "etc", "eg", "ie", "fig", "al")

  @inline private def isTerm(c: Char): Boolean =
    c == '.' || c == '!' || c == '?'

  /** The word (letters only, lowercased) immediately before index `i`. */
  private def wordBefore(s: String, i: Int): String = {
    var e = i
    val sb = new java.lang.StringBuilder(8)
    while (e > 0 && Character.isLetter(s.charAt(e - 1)) && sb.length < 8) {
      sb.append(Character.toLowerCase(s.charAt(e - 1)))
      e -= 1
    }
    sb.reverse.toString
  }

  def split(text: String): Seq[String] = {
    if (text == null) return Nil
    val n = text.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i < n) {
      if (isTerm(text.charAt(i))) {
        val runStart = i
        while (i < n && isTerm(text.charAt(i))) i += 1
        val singlePeriod = i - runStart == 1 && text.charAt(runStart) == '.'
        val abbrevGuard = singlePeriod && Abbrev.contains(wordBefore(text, runStart))
        // look past whitespace for the capital/digit that confirms a boundary
        var j = i
        while (j < n && Character.isWhitespace(text.charAt(j))) j += 1
        val confirms = j >= n ||
          Character.isUpperCase(text.charAt(j)) || Character.isDigit(text.charAt(j))
        if (!abbrevGuard && confirms && j > i) {
          val s = text.substring(start, i).trim
          if (s.nonEmpty) out += s
          start = j
          i = j
        } else if (!abbrevGuard && j >= n) {
          val s = text.substring(start, i).trim
          if (s.nonEmpty) out += s
          start = n
          i = n
        }
      } else i += 1
    }
    if (start < n) {
      val s = text.substring(start, n).trim
      if (s.nonEmpty) out += s
    }
    out.toSeq
  }

  def eval(text: UTF8String): GenericArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    new GenericArrayData(
      split(text.toString).map(s => UTF8String.fromString(s): Any).toArray)
  }
}

/** `split_sentences(text)` — codegen rule-based sentence segmentation. */
case class SplitSentences(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "split_sentences"

  override def nullSafeEval(input: Any): Any =
    SentenceOps.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.SentenceOps.eval($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SentenceExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def split_sentences(text: Column): Column =
    ColumnBridge.column(SplitSentences(ColumnBridge.expression(text)))
}
