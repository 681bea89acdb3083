package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlSpec extends SparkSpec {

  private def c(u: String): String = UrlOps.canonicalize(u)

  test("authority case, default ports, fragments") {
    assert(c("HTTPS://WWW.Example.COM/Path") === "https://www.example.com/Path")
    assert(c("http://example.com:80/a") === "http://example.com/a")
    assert(c("https://example.com:443/a") === "https://example.com/a")
    // a NON-default port stays — and the wrong scheme's default stays
    assert(c("https://example.com:80/a") === "https://example.com:80/a")
    assert(c("http://example.com:8080/a") === "http://example.com:8080/a")
    assert(c("https://example.com/a#frag") === "https://example.com/a")
    assert(c("https://example.com#frag") === "https://example.com/")
  }

  test("path: dot segments, duplicate slashes, trailing slash, empty") {
    assert(c("https://e.com/a/./b/../c") === "https://e.com/a/c")
    assert(c("https://e.com/a//b///c/") === "https://e.com/a/b/c/")
    assert(c("https://e.com/../..") === "https://e.com/")
    assert(c("https://e.com") === "https://e.com/")
    assert(c("https://e.com/a/.") === "https://e.com/a/")
  }

  test("percent normalization: unreserved decode, reserved uppercased, malformed kept") {
    assert(c("https://e.com/d%6Fcs/%7Ea") === "https://e.com/docs/~a")
    // reserved %2F must NOT decode (it would change the path structure);
    // its hex uppercases
    assert(c("https://e.com/a%2fb") === "https://e.com/a%2Fb")
    assert(c("https://e.com/a%zzb") === "https://e.com/a%zzb")
  }

  test("query: tracking strip, stable sort, valueless keys, all-dropped") {
    assert(c("https://e.com/p?b=2&a=1") === "https://e.com/p?a=1&b=2")
    assert(c("https://e.com/p?utm_source=x&a=1&fbclid=z&gclid=y")
      === "https://e.com/p?a=1")
    assert(c("https://e.com/p?utm_campaign=x") === "https://e.com/p")
    assert(c("https://e.com/p?flag&a=1") === "https://e.com/p?a=1&flag")
    // duplicate keys keep their relative order (stable sort)
    assert(c("https://e.com/p?k=2&a=0&k=1") === "https://e.com/p?a=0&k=2&k=1")
  }

  test("non-http(s) and null pass through") {
    assert(c("mailto:a@b.com") === "mailto:a@b.com")
    assert(c("javascript:void(0)") === "javascript:void(0)")
    assert(c("ftp://e.com/X") === "ftp://e.com/X")
    assert(c("  https://e.com/a  ") === "https://e.com/a")
    assert(UrlOps.canonicalize(null) === null)
  }

  test("expression path: codegen over a DataFrame, idempotent") {
    import spark.implicits._
    val urls = Seq(
      "HTTPS://E.COM:443/a/../b//c/?utm_source=x&z=1&a=2#f",
      "https://e.com/b/c/?a=2&z=1").toDF("u")
    val got = urls.select(UrlExpressions.url_canonicalize($"u").as("c"))
      .collect().map(_.getString(0))
    assert(got(0) === "https://e.com/b/c/?a=2&z=1")
    assert(got(1) === got(0), "canonical form must be a fixed point")
  }

  test("registrable domain: subdomains fold, two-label suffixes honored") {
    val r = RegistrableDomainOps.registrable _
    assert(r("a.example.com") === "example.com")
    assert(r("b.example.com") === "example.com")
    assert(r("deep.a.b.example.com") === "example.com")
    assert(r("example.com") === "example.com")
    // two-label public suffix: one more label is the site
    assert(r("x.market.co.uk") === "market.co.uk")
    assert(r("deals.co.uk") === "deals.co.uk")
    assert(r("a.shop.com.au") === "shop.com.au")
    // NOT merged across sites under the same public suffix
    assert(r("a.market.co.uk") !== r("a.deals.co.uk"))
    // case/whitespace normalize; edge shapes pass through
    assert(r(" A.Example.COM ") === "example.com")
    assert(r("com") === "com")
    assert(r("192.168.0.1") === "192.168.0.1")
    assert(r(null) === null)
  }

  test("registrable_domain expression path: codegen over a DataFrame") {
    import spark.implicits._
    val got = Seq("a.example.com", "x.market.co.uk").toDF("h")
      .select(UrlExpressions.registrable_domain($"h")).collect()
      .map(_.getString(0))
    assert(got.toSeq === Seq("example.com", "market.co.uk"))
  }

  test("url_resolve: RFC 3986 reference resolution, crawler subset") {
    val base = "https://www.a.com/docs/3/page"
    def r(ref: String): String = UrlOps.resolve(base, ref)
    // absolute refs (any scheme) pass through — minus any fragment
    // (fragments never survive, on EVERY branch)
    assert(r("https://b.com/x") === "https://b.com/x")
    assert(r("https://b.com/x#sec") === "https://b.com/x")
    assert(r("mailto:x@y.z") === "mailto:x@y.z")
    assert(r("javascript:void(0)") === "javascript:void(0)")
    // protocol-relative takes the base scheme
    assert(r("//cdn.a.com/lib.js") === "https://cdn.a.com/lib.js")
    assert(r("//cdn.a.com/lib.js#v2") === "https://cdn.a.com/lib.js")
    // rooted, query-only, fragment-only, empty
    assert(r("/top") === "https://www.a.com/top")
    assert(r("?p=1") === "https://www.a.com/docs/3/page?p=1")
    assert(r("#sec") === "https://www.a.com/docs/3/page")
    assert(r("") === "https://www.a.com/docs/3/page")
    // relative merge replaces the last segment; .. pops; trailing dir kept
    assert(r("sub") === "https://www.a.com/docs/3/sub")
    assert(r("sub/") === "https://www.a.com/docs/3/sub/")
    assert(r("../up") === "https://www.a.com/docs/up")
    assert(r("../../../over") === "https://www.a.com/over")
    assert(r("./here?q=2#frag") === "https://www.a.com/docs/3/here?q=2")
    // base with a trailing slash appends instead of replacing
    assert(UrlOps.resolve("https://a.com/dir/", "leaf")
      === "https://a.com/dir/leaf")
    // pathless base roots the reference
    assert(UrlOps.resolve("https://a.com", "x/y") === "https://a.com/x/y")
    // unresolvable base: the reference comes back unchanged — except
    // its fragment (never-survives holds on EVERY ref-returning branch,
    // so a missing base can't mint a second key for the same resource)
    assert(UrlOps.resolve("not a url", "x/y") === "x/y")
    assert(UrlOps.resolve("not a url", "x/y#frag") === "x/y")
    assert(UrlOps.resolve(null, "x") === "x")
    assert(UrlOps.resolve(null, "https://b.com/x#sec") === "https://b.com/x")
    assert(UrlOps.resolve(base, null) === base)
  }

  test("url_resolve expression: null-tolerant on both sides") {
    import spark.implicits._
    val got = Seq(
      (Option("https://a.com/d/"), Option("x")),
      (Option("https://a.com/d/"), None),
      (None: Option[String], Option("https://b.com/y")))
      .toDF("base", "ref")
      .select(UrlExpressions.url_resolve($"base", $"ref")).collect()
      .map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(Some("https://a.com/d/x"),
      Some("https://a.com/d/"), Some("https://b.com/y")))
  }
}
