package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the dedup key normalizer every crawl needs
  * BEFORE url-keyed dedup, frontier accounting, or recrawl planning:
  * the same resource arrives spelled a dozen ways (case-shifted hosts,
  * default ports, dot-segments, stray fragments, tracking parameters,
  * unsorted queries, over-percent-encoding), and un-normalized keys
  * fragment every per-URL aggregate. Beyond-reference extension
  * composing with [[graft.operators.WebCuration]] (domain keys) and the
  * WARC front. RFC 3986 §6 normalization plus the standard crawl
  * conventions (fragment strip, tracking-param strip, query sort,
  * duplicate-slash collapse — each documented at its step).
  *
  * Pure per-row function, codegen'd like [[HtmlExpressions]] — zero
  * shuffle, the same plan at 100 TB.
  */
object UrlOps {

  /** Query parameters dropped outright: click-tracking identifiers that
    * never change the resource (the C4/RefinedWeb convention). `utm_*`
    * by prefix plus the fixed well-known set. */
  private val TrackingExact: Set[String] =
    Set("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "igshid")

  private def isTracking(key: String): Boolean = {
    val k = key.toLowerCase(java.util.Locale.ROOT)
    k.startsWith("utm_") || TrackingExact.contains(k)
  }

  @inline private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  @inline private def hex(c: Char): Int = Character.digit(c, 16)

  /** RFC 3986 §6.2.2.2: decode %XX only when the octet is unreserved;
    * uppercase the hex digits of every escape that stays. Malformed
    * escapes pass through verbatim (crawl tolerance). */
  private def normalizePercent(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n && hex(s.charAt(i + 1)) >= 0 &&
          hex(s.charAt(i + 2)) >= 0) {
        val v = hex(s.charAt(i + 1)) * 16 + hex(s.charAt(i + 2))
        if (v < 128 && isUnreserved(v.toChar)) sb.append(v.toChar)
        else {
          sb.append('%')
            .append(Character.toUpperCase(s.charAt(i + 1)))
            .append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over a slash-collapsed path
    * (consecutive slashes collapse first — the crawl convention; server
    * path routing treats them as one). Leading-".." segments that would
    * escape the root are dropped. */
  private def normalizePath(path: String): String = {
    if (path.isEmpty) return "/"
    val segs = path.split("/", -1).filter(_.nonEmpty) // collapses "//"
    val out = new scala.collection.mutable.ArrayBuffer[String](segs.length)
    segs.foreach {
      case "." => ()
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case s => out += normalizePercent(s)
    }
    val trailingSlash = path.endsWith("/") || path.endsWith("/.") ||
      path.endsWith("/..") || out.isEmpty
    "/" + out.mkString("/") + (if (trailingSlash && out.nonEmpty) "/" else "")
  }

  /** Drop tracking params, normalize each key/value's escapes, STABLE
    * sort by key (duplicate keys keep their relative order — their
    * semantics may be positional), re-join. Empty result drops the '?'
    * entirely. */
  private def normalizeQuery(query: String): String = {
    if (query.isEmpty) return ""
    val kept = query.split("&", -1).filter(_.nonEmpty).flatMap { p =>
      val eq = p.indexOf('=')
      val key = if (eq < 0) p else p.substring(0, eq)
      if (isTracking(key)) None
      else Some((normalizePercent(key),
        if (eq < 0) null else normalizePercent(p.substring(eq + 1))))
    }
    if (kept.isEmpty) ""
    else "?" + kept.sortBy(_._1).map { case (k, v) =>
      if (v == null) k else s"$k=$v"
    }.mkString("&")
  }

  /** Canonicalize one URL; null/blank and non-http(s) inputs come back
    * unchanged apart from trimming (mailto:, javascript:, data: links in
    * crawled anchors are not ours to rewrite). */
  def canonicalize(url: String): String = {
    if (url == null) return null
    val u = url.trim
    val schemeEnd = u.indexOf("://")
    if (schemeEnd <= 0) return u
    val scheme = u.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    if (scheme != "http" && scheme != "https") return u
    var rest = u.substring(schemeEnd + 3)
    // fragment: never part of the resource a crawler fetches
    val hashAt = rest.indexOf('#')
    if (hashAt >= 0) rest = rest.substring(0, hashAt)
    val pathAt = rest.indexOf('/')
    val qAt = rest.indexOf('?')
    val authEnd =
      if (pathAt < 0 && qAt < 0) rest.length
      else if (pathAt < 0) qAt
      else if (qAt < 0) pathAt
      else math.min(pathAt, qAt)
    var authority = rest.substring(0, authEnd).toLowerCase(java.util.Locale.ROOT)
    // default ports add nothing
    if (scheme == "http" && authority.endsWith(":80"))
      authority = authority.dropRight(3)
    if (scheme == "https" && authority.endsWith(":443"))
      authority = authority.dropRight(4)
    val afterAuth = rest.substring(authEnd)
    val (rawPath, rawQuery) = {
      val q = afterAuth.indexOf('?')
      if (q < 0) (afterAuth, "")
      else (afterAuth.substring(0, q), afterAuth.substring(q + 1))
    }
    scheme + "://" + authority + normalizePath(rawPath) +
      normalizeQuery(rawQuery)
  }

  /** RFC 3986 §5 reference resolution, the crawler subset — what turns
    * an extracted `href` into a fetchable URL: absolute refs (any
    * scheme, incl. mailto:/javascript:) pass through minus any
    * `#fragment`; `//host/...` takes
    * the base scheme; `/rooted`, `?query-only`, `#fragment-only`, and
    * relative paths resolve against the base's authority/path with
    * dot-segment removal (§5.2.4 — empty segments collapse like
    * [[normalizePath]], the documented house divergence; the composed
    * [[canonicalize]] collapses them anyway). Fragments never survive
    * (a crawler fetches resources, not positions). A base without
    * `scheme://` can't anchor anything — the ref comes back unchanged
    * except for its fragment (tolerant, never null; fragments never
    * survive on ANY branch). */
  def resolve(base: String, ref0: String): String = {
    // "fragments never survive" applies to EVERY branch that returns a
    // ref: absolute and protocol-relative refs used to return verbatim,
    // and the null/unresolvable-base fallbacks did too — a dedup or
    // frontier key built on resolve alone (without the composed
    // canonicalize) would otherwise retain '#...' only when a base
    // happened to be missing, minting two keys for one resource
    def stripFragment(s: String): String = {
      val h = s.indexOf('#')
      if (h < 0) s else s.substring(0, h)
    }
    if (ref0 == null) return base
    val ref = ref0.trim
    if (base == null) return stripFragment(ref)
    // absolute reference: scheme ':' before any '/', '?' or '#'
    var k = 0
    while (k < ref.length && (Character.isLetterOrDigit(ref.charAt(k)) ||
      "+.-".indexOf(ref.charAt(k)) >= 0)) k += 1
    if (k > 0 && k < ref.length && ref.charAt(k) == ':' &&
      Character.isLetter(ref.charAt(0))) return stripFragment(ref)
    val schemeEnd = base.indexOf("://")
    if (schemeEnd <= 0) return stripFragment(ref)
    val scheme = base.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    var rest = base.substring(schemeEnd + 3)
    val hashAt = rest.indexOf('#')
    if (hashAt >= 0) rest = rest.substring(0, hashAt)
    val pathAt = rest.indexOf('/')
    val qAt = rest.indexOf('?')
    val authEnd =
      if (pathAt < 0 && qAt < 0) rest.length
      else if (pathAt < 0) qAt
      else if (qAt < 0) pathAt
      else math.min(pathAt, qAt)
    val authority = rest.substring(0, authEnd)
    val afterAuth = rest.substring(authEnd)
    val basePath = {
      val q = afterAuth.indexOf('?')
      if (q < 0) afterAuth else afterAuth.substring(0, q)
    }
    if (ref.isEmpty) return scheme + "://" + authority + basePath
    if (ref.startsWith("//")) return scheme + ":" + stripFragment(ref)
    if (ref.startsWith("#")) return scheme + "://" + authority + basePath
    val (rpath, rquery) = {
      val h = ref.indexOf('#')
      val noFrag = if (h < 0) ref else ref.substring(0, h)
      val q = noFrag.indexOf('?')
      if (q < 0) (noFrag, "") else (noFrag.substring(0, q), noFrag.substring(q))
    }
    if (rpath.isEmpty) // query-only reference keeps the base path
      return scheme + "://" + authority +
        (if (basePath.isEmpty) "/" else basePath) + rquery
    val merged =
      if (rpath.startsWith("/")) rpath
      else if (basePath.isEmpty) "/" + rpath
      else basePath.substring(0, basePath.lastIndexOf('/') + 1) + rpath
    scheme + "://" + authority + removeRefDotSegments(merged) + rquery
  }

  /** §5.2.4 dot-segment removal for [[resolve]] — percent-escapes kept
    * intact (resolution must not re-encode), empty segments collapsed
    * (the [[normalizePath]] house rule). */
  private def removeRefDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val endsDir = path.endsWith("/") || path.endsWith("/.") ||
      path.endsWith("/..")
    path.split("/", -1).foreach {
      case "" | "." => ()
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case s => out += s
    }
    "/" + out.mkString("/") + (if (endsDir && out.nonEmpty) "/" else "")
  }

  def eval(url: UTF8String): UTF8String =
    if (url == null) null else UTF8String.fromString(canonicalize(url.toString))
}

/** `url_canonicalize(url)` — codegen RFC 3986 + crawl-convention
  * normalization. */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "url_canonicalize"

  override def nullSafeEval(input: Any): Any =
    UrlOps.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.UrlOps.eval($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registrable-domain extraction — the politeness and ownership unit of
  * a crawl: `a.example.com` and `b.example.com` are one SITE (one fetch
  * queue, one rate budget), while `x.co.uk` and `y.co.uk` are two —
  * which is exactly what naive "last two labels" gets wrong. Pure
  * suffix rules over a FROZEN snapshot subset of the public-suffix
  * conventions (publicsuffix.org): the widely-used two-label public
  * suffixes are listed explicitly; everything else treats the last
  * label as the suffix. No network, no state — a per-row codegen
  * projection like [[UrlOps]], same result on every engine and at any
  * scale. */
object RegistrableDomainOps {

  /** Frozen two-label public-suffix subset (country-code second-level
    * registrations a crawler meets constantly). A full PSL sync is a
    * data refresh, not a code change: the rule shape is identical. */
  private val TwoLabelSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "com.cn", "net.cn", "org.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.tw", "com.hk",
    "co.in", "net.in", "org.in", "co.nz", "net.nz", "org.nz",
    "co.kr", "or.kr", "co.za", "org.za", "com.ua", "com.pl")

  /** Registrable domain of a bare lowercase-able host (what
    * [[graft.operators.WebCuration.domainOf]] emits). IPv4 literals and
    * one/two-label hosts come back as themselves; unknown suffixes use
    * the last-label rule. */
  def registrable(host: String): String = {
    if (host == null) return null
    val h = host.trim.toLowerCase(java.util.Locale.ROOT)
    if (h.isEmpty) return h
    // IPv4 literal: politeness keys on the address itself
    if (h.forall(c => (c >= '0' && c <= '9') || c == '.')) return h
    val labels = h.split('.')
    if (labels.length <= 2) return h
    val last2 = labels(labels.length - 2) + "." + labels(labels.length - 1)
    if (TwoLabelSuffixes.contains(last2))
      labels(labels.length - 3) + "." + last2
    else last2
  }

  def eval(host: UTF8String): UTF8String =
    if (host == null) null
    else UTF8String.fromString(registrable(host.toString))
}

/** `registrable_domain(host)` — codegen frozen-PSL-subset suffix rule. */
case class RegistrableDomain(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "registrable_domain"

  override def nullSafeEval(input: Any): Any =
    RegistrableDomainOps.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.RegistrableDomainOps.eval($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `url_resolve(base, ref)` — RFC 3986 §5 reference resolution
  * ([[UrlOps.resolve]]). Null-TOLERANT on both sides (resolve(null, ref)
  * = ref, resolve(base, null) = base — an anchor with a null href must
  * not null the page row), so it evaluates its own children rather than
  * inheriting null-safe shortcuts; CodegenFallback keeps that exact
  * semantics in generated plans (link extraction is archive-side
  * metadata work, not a hot inner loop). */
case class UrlResolve(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "url_resolve"
  override def nullable: Boolean = left.nullable && right.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val b = left.eval(input).asInstanceOf[UTF8String]
    val r = right.eval(input).asInstanceOf[UTF8String]
    val out = UrlOps.resolve(if (b == null) null else b.toString,
      if (r == null) null else r.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object UrlExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def url_canonicalize(url: Column): Column =
    ColumnBridge.column(UrlCanonicalize(ColumnBridge.expression(url)))

  def registrable_domain(host: Column): Column =
    ColumnBridge.column(RegistrableDomain(ColumnBridge.expression(host)))

  def url_resolve(base: Column, ref: Column): Column =
    ColumnBridge.column(UrlResolve(
      ColumnBridge.expression(base), ColumnBridge.expression(ref)))
}
