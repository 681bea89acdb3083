package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text profiling — the replacement for the 7 separate
  * regexp_count/regexp_replace scans the text-quality and language-ID
  * operators would otherwise run per row. At corpus scale (the 100 TB hot
  * path: every byte of every document) one fused scan is the difference
  * between being IO-bound and regex-bound.
  *
  * The scan reproduces the REGEX semantics exactly (property-tested against
  * the regexp-built columns in TextExprPropsSpec):
  *  - `n_tokens`    = size(split(trim(text), "\s+")) with Spark's limit=-1
  *                    split (leading/trailing NON-SPACE whitespace after the
  *                    space-only trim contributes empty elements) and the
  *                    empty/null→0 guard;
  *  - `n_bpeish`    = regexp_count("[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"):
  *                    ASCII-word runs + isolated non-word non-space chars
  *                    (counted per code point, not per byte);
  *  - `n_punct`     = count of . , ; : ! ? anywhere;
  *  - `n_stopwords` = "(?i)\b(the|a|...)\b" hits == case-insensitive
  *                    ASCII-word-run set membership (equivalent because every
  *                    stopword is word-chars-only, so \b forces exactly the
  *                    run boundaries);
  *  - `n_nonspace`  = length(regexp_replace(text, "\s+", "")) — code points
  *                    outside Java's ASCII \s class;
  *  - stopword and lang-marker counts reproduce Java's UNICODE-aware \b
  *    (word char = '_' or Character.isLetterOrDigit — CJK included — and a
  *    non-spacing mark attaches to its base character's wordness, per
  *    java.util.regex.Pattern$Bound/hasBaseCharacter): "\bw\b" matches
  *    exactly when a MAXIMAL boundary-word run equals w, which also makes
  *    the CJK single-char markers fall out of the same run comparison.
  */
object TextOps {

  val Stopwords: Set[String] = Set(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "from", "that", "this")

  /** (lang, marker runs) in the argmax tie-break order (alphabetical). */
  val LangMarkers: Seq[(String, Set[String])] = Seq(
    ("de", Set("der", "die", "das", "und", "ist")),
    ("en", Set("the", "and", "of", "to", "is")),
    ("es", Set("el", "la", "los", "que", "es")),
    ("fr", Set("le", "la", "les", "et", "est")),
    ("zh", Set("的", "是", "了", "在", "我")))

  private val nLangs = LangMarkers.length
  private val langNames = LangMarkers.map(t => UTF8String.fromString(t._1)).toArray

  @inline private def isAsciiWord(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
      (cp >= '0' && cp <= '9') || cp == '_'
  /** Java regex \s (no UNICODE_CHARACTER_CLASS): [ \t\n\x0B\f\r]. */
  @inline private def isJavaSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' || cp == '\r'
  @inline private def isPunct(cp: Int): Boolean =
    cp == '.' || cp == ',' || cp == ';' || cp == ':' || cp == '!' || cp == '?'
  @inline private def lowerAscii(cp: Int): Int =
    if (cp >= 'A' && cp <= 'Z') cp + 32 else cp

  /** Java-\b word char: '_' or any Unicode letter/digit; non-spacing marks
    * (Mn) take the wordness of the nearest preceding non-Mn char's
    * letter-or-digit-ness (Pattern.hasBaseCharacter semantics). */
  @inline private def isBoundaryWord(cp: Int, lastBaseLetterOrDigit: Boolean): Boolean =
    if (Character.getType(cp) == Character.NON_SPACING_MARK) lastBaseLetterOrDigit
    else cp == '_' || Character.isLetterOrDigit(cp)

  /** One pass over the code points; returns the profile struct row.
    * Field order: n_chars, n_tokens, n_bpeish, n_punct, n_stopwords,
    * n_nonspace, lang, lang_scores. */
  def profile(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    var nChars = 0; var runs = 0; var nBpeish = 0; var nPunct = 0
    var nStop = 0; var nNonspace = 0
    val scores = new Array[Int](nLangs)
    var inToken = false
    var inAsciiWord = false        // ASCII [A-Za-z0-9_]+ runs (n_bpeish)
    var inBoundaryRun = false      // Java-\b word runs (stopwords/markers)
    val runBuf = new java.lang.StringBuilder(24)
    var runOverflow = false
    var lastBaseLetterOrDigit = false
    // Spark's trim() strips ' ' only; find the first/last non-space chars to
    // reproduce split(limit=-1)'s leading/trailing empty elements.
    var firstNonSpace = -1; var lastNonSpace = -1

    def finishBoundaryRun(): Unit = {
      if (inBoundaryRun && !runOverflow) {
        val w = runBuf.toString
        if (Stopwords.contains(w)) nStop += 1
        var l = 0
        while (l < nLangs) {
          if (LangMarkers(l)._2.contains(w)) scores(l) += 1
          l += 1
        }
      }
      inBoundaryRun = false; runOverflow = false; runBuf.setLength(0)
    }

    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      nChars += 1
      val sp = isJavaSpace(cp)
      val aw = isAsciiWord(cp)
      val bw = isBoundaryWord(cp, lastBaseLetterOrDigit)
      if (cp != ' ') {
        if (firstNonSpace == -1) firstNonSpace = cp
        lastNonSpace = cp
      }
      if (!sp) {
        nNonspace += 1
        if (!inToken) { runs += 1; inToken = true }
      } else inToken = false
      if (aw) {
        if (!inAsciiWord) { nBpeish += 1; inAsciiWord = true }
      } else {
        inAsciiWord = false
        if (!sp) {
          nBpeish += 1
          if (isPunct(cp)) nPunct += 1
        }
      }
      if (bw) {
        inBoundaryRun = true
        if (runBuf.length() < 24) runBuf.appendCodePoint(lowerAscii(cp))
        else runOverflow = true
      } else finishBoundaryRun()
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        lastBaseLetterOrDigit = Character.isLetterOrDigit(cp)
      i += Character.charCount(cp)
    }
    finishBoundaryRun()

    // n_tokens emulates size(split(trim(text), "\s+")) with limit=-1:
    // empty-after-space-trim → 0; else runs + leading/trailing empties from
    // non-space whitespace surviving the space-only trim.
    val nTokens =
      if (firstNonSpace == -1) 0
      else runs +
        (if (isJavaSpace(firstNonSpace)) 1 else 0) +
        (if (isJavaSpace(lastNonSpace)) 1 else 0)

    // argmax, strictly-greater replacement over alphabetical order ==
    // earliest language wins ties (the regex fold's exact behavior)
    var best = 0
    var l = 1
    while (l < nLangs) { if (scores(l) > scores(best)) best = l; l += 1 }

    InternalRow(nChars, nTokens, nBpeish, nPunct, nStop, nNonspace,
      langNames(best), new GenericArrayData(scores.map(x => x: Any)))
  }

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_bpeish", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false),
    StructField("n_nonspace", IntegerType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("lang_scores", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
}

/** 64-bit POLYNOMIAL ROLLING hash over a string's code points:
  * h = Σ cp_i · B^(n-1-i) mod 2^64 (B = 1000003, Horner evaluation) —
  * a genuine rolling hash: the hash of a window can be slid in O(1)
  * (h' = (h - cp_out·B^(w-1))·B + cp_in), which is what content-defined
  * chunking and winnowing-style fingerprint schemes need, unlike a
  * one-shot digest. Empty/zero-length input hashes to the seed. */
object RollingHash {
  val Base = 1000003L
  val Seed = 0x9e3779b97f4a7c15L
  def hash(s: String): Long = {
    var h = Seed
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = h * Base + cp
      i += Character.charCount(cp)
    }
    h
  }
}

case class PolyRollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.RollingHash.hash($a.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** zlib DEFLATE length — the Gopher-style compression-ratio signal: text
  * whose level-6 deflate collapses far below its raw size is machine-
  * repetitive (keyword stuffing, tag soup, generated boilerplate) in a
  * way token statistics can miss. Only the LENGTH is exposed, never the
  * bytes: fixed level 6, default strategy, one-shot over the UTF-8
  * encoding — a pure JVM-deterministic function of the text (the same
  * determinism contract as the in-tree PNG Inflater path), cheap enough
  * for the per-row hot path and embarrassingly parallel. */
object DeflateOps {
  def deflateLen(text: UTF8String): Int = {
    val bytes = text.getBytes
    val d = new java.util.zip.Deflater(6)
    d.setInput(bytes)
    d.finish()
    var total = 0
    val buf = new Array[Byte](4096)
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }
}

/** `deflate_len(text)` — codegen zlib level-6 deflate byte length. */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateOps.deflateLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.DeflateOps.deflateLen($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Expression wrapper: stays inside whole-stage codegen (the generated code
  * calls the static [[TextOps.profile]] — no UDF boxing, no Row encoding). */
case class TextProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextOps.schema
  override def prettyName: String = "text_profile"

  override def nullSafeEval(input: Any): Any =
    TextOps.profile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.TextOps.profile($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def text_profile(text: Column): Column =
    ColumnBridge.column(TextProfile(ColumnBridge.expression(text)))

  def poly_rolling_hash(text: Column): Column =
    ColumnBridge.column(PolyRollingHash(ColumnBridge.expression(text)))

  def deflate_len(text: Column): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(text)))
}
