package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Generation-eval primitives (BLEU n-gram stats, ROUGE-L LCS) as per-row
  * codegen expressions — zero shuffle, the right shape for scoring a
  * model-output column against a reference column at corpus scale (the
  * declarative alternative, 4 explode/groupBy/join rounds per n-gram
  * order, would pay 8 shuffles for what is a 30-token-per-row loop).
  *
  * Frozen fixed-point discipline (the [[graft.operators.Eval]] contract):
  * everything emitted is exact integer arithmetic —
  *  - BLEU clipped/total n-gram counts are integers by nature;
  *  - the BLEU-4 geometric mean is the exact integer 4th root
  *    ⌊(10¹²·A/B)^¼⌋ (A = ∏clipped, B = ∏totals) = "bleu_milli", 3-digit
  *    fixed point, with per-n ppm precisions alongside for full
  *    resolution (A ≤ 13·12·11·10 on ≤13-token candidates keeps
  *    10¹²·A inside Long; callers with longer candidates get the same
  *    bound because A/B ≤ 1 ⇒ the root ≤ 1000 — overflow would need
  *    B > Long.Max/10¹², i.e. ~75-token candidates, guarded);
  *  - ROUGE-L is exactly rational: F₁ = 2L/(c+r), so p/r/f are single
  *    floor divisions to ppm.
  */
object GenEvalOps {

  /** Exact ⌊√n⌋ for n ≥ 0: float seed + integer correction loop. */
  def isqrt(n: Long): Long = {
    if (n < 0) throw new IllegalArgumentException(s"isqrt of negative $n")
    if (n == 0) return 0L
    var s = math.sqrt(n.toDouble).toLong
    while (s > 0 && s > n / s) s -= 1 // s*s > n, without overflow
    while ((s + 1) <= n / (s + 1)) s += 1
    s
  }

  /** Exact ⌊n^¼⌋. */
  def iroot4(n: Long): Long = isqrt(isqrt(n))

  private def toks(a: ArrayData): Array[String] = {
    val n = a.numElements()
    val out = new Array[String](n)
    var i = 0
    while (i < n) { out(i) = a.getUTF8String(i).toString; i += 1 }
    out
  }

  /** BLEU stats for n = 1..4 over token arrays: InternalRow of
    * (a1..a4, b1..b4) — clipped match counts and candidate n-gram totals.
    * Null array → empty sequence. One pass per n with open-addressing-free
    * HashMaps; O(len·4) per row. */
  def bleuStats(cand: ArrayData, ref: ArrayData): InternalRow = {
    val c = if (cand == null) Array.empty[String] else toks(cand)
    val r = if (ref == null) Array.empty[String] else toks(ref)
    val out = new Array[Any](9)
    var n = 1
    while (n <= 4) {
      val total = math.max(c.length - n + 1, 0)
      var clipped = 0L
      if (total > 0 && r.length - n + 1 > 0) {
        val refCounts = new java.util.HashMap[String, Int]()
        var j = 0
        while (j <= r.length - n) {
          val g = gram(r, j, n)
          refCounts.merge(g, 1, Integer.sum)
          j += 1
        }
        val used = new java.util.HashMap[String, Int]()
        var i = 0
        while (i <= c.length - n) {
          val g = gram(c, i, n)
          val avail = refCounts.getOrDefault(g, 0)
          val u = used.getOrDefault(g, 0)
          if (u < avail) { clipped += 1; used.put(g, u + 1) }
          i += 1
        }
      }
      out(n - 1) = clipped
      out(n + 3) = total.toLong
      n += 1
    }
    out(8) = bleuMilli(out(0).asInstanceOf[Long], out(1).asInstanceOf[Long],
      out(2).asInstanceOf[Long], out(3).asInstanceOf[Long],
      out(4).asInstanceOf[Long], out(5).asInstanceOf[Long],
      out(6).asInstanceOf[Long], out(7).asInstanceOf[Long])
    InternalRow(out: _*)
  }

  private def gram(w: Array[String], start: Int, n: Int): String = {
    if (n == 1) return w(start)
    val sb = new java.lang.StringBuilder(w(start))
    var k = 1
    while (k < n) { sb.append(' '); sb.append(w(start + k)); k += 1 }
    sb.toString
  }

  val bleuSchema: StructType = StructType(
    (1 to 4).map(n => StructField(s"a$n", LongType, nullable = false)) ++
      (1 to 4).map(n => StructField(s"b$n", LongType, nullable = false)) :+
      StructField("bleu_milli", LongType, nullable = false))

  /** bleu_milli = ⌊(10¹²·∏aₙ / ∏bₙ)^¼⌋ ∈ [0, 1000]; 0 when any aₙ = 0 or
    * any bₙ = 0 (the unsmoothed sentence-BLEU zero). Callers apply the
    * brevity penalty separately (the oracled fixture pins BP ≡ 1 by
    * construction: candidate strictly longer than reference). */
  def bleuMilli(a1: Long, a2: Long, a3: Long, a4: Long,
                b1: Long, b2: Long, b3: Long, b4: Long): Long = {
    if (a1 == 0 || a2 == 0 || a3 == 0 || a4 == 0) return 0L
    val aProd = a1 * a2 * a3 * a4
    val bProd = b1 * b2 * b3 * b4
    require(aProd <= Long.MaxValue / 1000000000000L,
      s"bleuMilli overflow: clipped-count product $aProd too large (cap candidates at ~75 tokens)")
    iroot4(aProd * 1000000000000L / bProd)
  }

  /** chrF (Popović, WMT'15) stats over STRINGS: character n-grams for
    * n = 1..6 on the whitespace-stripped text (sacrebleu's default),
    * clipped multiset matches like BLEU. Returns InternalRow of
    * (m1..m6, c1..c6, r1..r6, chrf_ppm) — matches, candidate-gram and
    * reference-gram totals per n, plus the β=2 F-score in ppm under the
    * frozen fixed-point contract: per-n precision/recall are ppm-floored
    * FIRST, averaged over the n where BOTH sides have grams (integer
    * division by the included count), and F = (1+β²)·P·R / (β²·P + R) is
    * one more floor division. P = R = 0 (disjoint strings) scores 0 —
    * defined total dissimilarity; the −1 sentinel (surfaced as NULL by
    * the operator) means UNDEFINED: no n had grams on both sides. */
  def chrfStats(cand: UTF8String, ref: UTF8String): InternalRow = {
    val c = stripWs(cand)
    val r = stripWs(ref)
    val out = new Array[Any](19)
    var pSumPpm = 0L
    var rSumPpm = 0L
    var included = 0
    var n = 1
    while (n <= 6) {
      val cTotal = math.max(c.length - n + 1, 0)
      val rTotal = math.max(r.length - n + 1, 0)
      var m = 0L
      if (cTotal > 0 && rTotal > 0) {
        val refCounts = new java.util.HashMap[String, Int]()
        var j = 0
        while (j <= r.length - n) {
          refCounts.merge(r.substring(j, j + n), 1, Integer.sum); j += 1
        }
        val used = new java.util.HashMap[String, Int]()
        var i = 0
        while (i <= c.length - n) {
          val g = c.substring(i, i + n)
          val avail = refCounts.getOrDefault(g, 0)
          val u = used.getOrDefault(g, 0)
          if (u < avail) { m += 1; used.put(g, u + 1) }
          i += 1
        }
        pSumPpm += m * 1000000L / cTotal
        rSumPpm += m * 1000000L / rTotal
        included += 1
      }
      out(n - 1) = m
      out(n + 5) = cTotal.toLong
      out(n + 11) = rTotal.toLong
      n += 1
    }
    out(18) =
      if (included == 0) -1L
      else {
        val p = pSumPpm / included
        val q = rSumPpm / included
        if (p + q == 0) 0L else (5L * p * q) / (4L * p + q)
      }
    InternalRow(out: _*)
  }

  private def stripWs(s: UTF8String): String = {
    if (s == null) return ""
    val t = s.toString
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      val ch = t.charAt(i)
      if (!Character.isWhitespace(ch)) sb.append(ch)
      i += 1
    }
    sb.toString
  }

  val chrfSchema: StructType = StructType(
    (1 to 6).map(n => StructField(s"m$n", LongType, nullable = false)) ++
      (1 to 6).map(n => StructField(s"c$n", LongType, nullable = false)) ++
      (1 to 6).map(n => StructField(s"r$n", LongType, nullable = false)) :+
      StructField("chrf_ppm", LongType, nullable = false))

  /** Unit-cost Levenshtein distance between two token arrays — the WER
    * numerator (substitutions + insertions + deletions to turn candidate
    * into reference). Rolling single-row DP like [[lcsLength]]:
    * O(|c|·|r|) time, O(|r|) space; null arrays are empty (distance =
    * the other side's length). */
  def tokenEditDistance(cand: ArrayData, ref: ArrayData): Int = {
    val c = if (cand == null) Array.empty[String] else toks(cand)
    val r = if (ref == null) Array.empty[String] else toks(ref)
    if (c.isEmpty) return r.length
    if (r.isEmpty) return c.length
    val row = new Array[Int](r.length + 1)
    var j = 0
    while (j <= r.length) { row(j) = j; j += 1 }
    var i = 1
    while (i <= c.length) {
      var diag = row(0) // dp[i-1][j-1]
      row(0) = i
      j = 1
      while (j <= r.length) {
        val up = row(j) // dp[i-1][j]
        val cost = if (c(i - 1) == r(j - 1)) 0 else 1
        var v = diag + cost
        if (up + 1 < v) v = up + 1
        if (row(j - 1) + 1 < v) v = row(j - 1) + 1
        row(j) = v
        diag = up
        j += 1
      }
      i += 1
    }
    row(r.length)
  }

  /** Longest common subsequence LENGTH between two token arrays — the
    * ROUGE-L core. Rolling single-row DP, O(|c|·|r|) time, O(|r|) space;
    * null arrays are empty. */
  def lcsLength(cand: ArrayData, ref: ArrayData): Int = {
    val c = if (cand == null) Array.empty[String] else toks(cand)
    val r = if (ref == null) Array.empty[String] else toks(ref)
    if (c.isEmpty || r.isEmpty) return 0
    val row = new Array[Int](r.length + 1)
    var i = 1
    while (i <= c.length) {
      var diag = 0 // dp[i-1][j-1]
      var j = 1
      while (j <= r.length) {
        val up = row(j) // dp[i-1][j]
        row(j) =
          if (c(i - 1) == r(j - 1)) diag + 1
          else math.max(up, row(j - 1))
        diag = up
        j += 1
      }
      i += 1
    }
    row(r.length)
  }
}

/** `bleu_stats(cand, ref)` — struct(a1..a4, b1..b4). */
case class BleuStats(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = GenEvalOps.bleuSchema
  override def nullable: Boolean = false
  override def prettyName: String = "bleu_stats"

  override def eval(input: InternalRow): Any =
    GenEvalOps.bleuStats(left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        InternalRow ${ev.value} = graft.expr.GenEvalOps.bleuStats(
          ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** `chrf_stats(cand, ref)` — struct(m1..m6, c1..c6, r1..r6, chrf_ppm). */
case class ChrfStats(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = GenEvalOps.chrfSchema
  override def nullable: Boolean = false
  override def prettyName: String = "chrf_stats"

  override def eval(input: InternalRow): Any =
    GenEvalOps.chrfStats(left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        InternalRow ${ev.value} = graft.expr.GenEvalOps.chrfStats(
          ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** `lcs_length(cand, ref)` — ROUGE-L's LCS as an int. */
case class LcsLength(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "lcs_length"

  override def eval(input: InternalRow): Any =
    GenEvalOps.lcsLength(left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        int ${ev.value} = graft.expr.GenEvalOps.lcsLength(
          ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** `token_edit_distance(cand, ref)` — WER's unit-cost Levenshtein over
  * token arrays. */
case class TokenEditDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "token_edit_distance"

  override def eval(input: InternalRow): Any =
    GenEvalOps.tokenEditDistance(left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        int ${ev.value} = graft.expr.GenEvalOps.tokenEditDistance(
          ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object GenEvalExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def token_edit_distance(cand: Column, ref: Column): Column =
    ColumnBridge.column(TokenEditDistance(ColumnBridge.expression(cand),
      ColumnBridge.expression(ref)))

  def bleu_stats(cand: Column, ref: Column): Column =
    ColumnBridge.column(BleuStats(ColumnBridge.expression(cand),
      ColumnBridge.expression(ref)))

  def lcs_length(cand: Column, ref: Column): Column =
    ColumnBridge.column(LcsLength(ColumnBridge.expression(cand),
      ColumnBridge.expression(ref)))

  def chrf_stats(cand: Column, ref: Column): Column =
    ColumnBridge.column(ChrfStats(ColumnBridge.expression(cand),
      ColumnBridge.expression(ref)))
}
