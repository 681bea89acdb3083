package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 §2.2.3 rule-path matching — the wildcard half the plain
  * prefix gate was missing: crawlers MUST support `*` (matches any run
  * of characters, including none) and a trailing `$` (anchors the rule
  * at end-of-path). Real robots.txt lean on both (`Disallow: /\*?sid=`,
  * `Disallow: /\*.pdf$` — backslashes here only to keep the Scaladoc
  * well-formed), so a prefix-only matcher silently under-blocks
  * exactly the session-id and document-dump patterns sites most want
  * closed. A rule WITHOUT the anchor matches any prefix of the path —
  * equivalent to globbing `rule + "*"` over the whole path; `$` anywhere
  * but the end is a literal character (the RFC reserves only the
  * end-anchor form).
  *
  * Iterative two-pointer glob with single-star backtracking — O(|path|
  * × stars) worst case, zero allocation, no regex compilation (and none
  * of regex's pathological-pattern exposure on attacker-authored
  * robots.txt). Per-row codegen; the gate's URL stream stays
  * shuffle-free.
  */
object RobotsMatchOps {

  def matches(path: UTF8String, rule: UTF8String): Boolean = {
    if (path == null || rule == null) return false
    val r = rule.toString
    val anchored = r.nonEmpty && r.charAt(r.length - 1) == '$'
    glob(if (anchored) r.substring(0, r.length - 1) else r,
      anchored, path.toString)
  }

  private def glob(p: String, anchored: Boolean, s: String): Boolean = {
    val pn = p.length
    val sn = s.length
    if (!anchored && pn == 0) return true
    var pi = 0
    var si = 0
    var star = -1
    var ss = 0
    while (si < sn) {
      if (!anchored && pi == pn) return true // rule consumed: prefix matched
      if (pi < pn && p.charAt(pi) == '*') { star = pi; pi += 1; ss = si }
      else if (pi < pn && p.charAt(pi) == s.charAt(si)) { pi += 1; si += 1 }
      else if (star >= 0) { ss += 1; si = ss; pi = star + 1 }
      else return false
    }
    while (pi < pn && p.charAt(pi) == '*') pi += 1
    pi == pn
  }
}

/** `robots_match(path, rule)` — codegen RFC 9309 wildcard rule match. */
case class RobotsPathMatch(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_match"

  override def nullSafeEval(path: Any, rule: Any): Any =
    RobotsMatchOps.matches(path.asInstanceOf[UTF8String],
      rule.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.RobotsMatchOps.matches($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RobotsExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def robots_match(path: Column, rule: Column): Column =
    ColumnBridge.column(RobotsPathMatch(
      ColumnBridge.expression(path), ColumnBridge.expression(rule)))
}
