package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WebCurationSpec extends SparkSpec {
  import spark.implicits._

  test("domainOf: scheme/www/port/path/query/fragment/case stripped") {
    val urls = Seq(
      "https://www.Example.COM/a/b?q=1#f" -> "example.com",
      "http://example.com:8080/x" -> "example.com",
      "ftp://files.example.org/pub" -> "files.example.org",
      "example.net/path" -> "example.net",
      "www.example.net" -> "example.net",
      " https://sub.domain.io " -> "sub.domain.io")
    val got = urls.map(_._1).toDF("url")
      .select(WebCuration.domainOf(col("url"))).as[String].collect().toSeq
    assert(got === urls.map(_._2))
  }

  test("filterBlocked: any-pattern disjunction; NULL url survives") {
    val df = Seq(Some("https://spam.example.com/x"), Some("https://ok.io/docs/7/y"),
      Some("https://ok.io/fine"), None).toDF("url")
    val kept = WebCuration.filterBlocked(df, "url",
      Seq("spam\\.example\\.com", "/docs/7/")).collect().map(_.getString(0))
    assert(kept.toSeq === Seq("https://ok.io/fine", null))
  }

  test("capPerDomain: best-first, deterministic tie-break, cap respected") {
    val df = Seq(
      (1L, "https://a.com/1", 10L), (2L, "https://a.com/2", 30L),
      (3L, "https://www.a.com/3", 30L), (4L, "https://a.com/4", 5L),
      (5L, "https://b.com/1", 1L))
      .toDF("id", "url", "score")
    val kept = WebCuration.capPerDomain(df, "url", col("score"), "id", cap = 2)
      .select("id", "domain").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // a.com: scores 30(id2), 30(id3 — tie, higher id loses to none: both in top2), 10, 5
    assert(kept.toSeq === Seq((2L, "a.com"), (3L, "a.com"), (5L, "b.com")))
  }

  test("domainProfile: counts, char volume, kept-at-cap clamp") {
    val df = Seq(
      ("https://a.com/1", 100L), ("https://a.com/2", 50L),
      ("https://a.com/3", 25L), ("https://b.com/1", 7L))
      .toDF("url", "chars")
    val got = WebCuration.domainProfile(df, "url", col("chars"), cap = 2)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("a.com", 3L, 175L, 2L), ("b.com", 1L, 7L, 1L)))
  }

  test("anchor texts: self-links dropped, freq/tie ordering, inlink totals") {
    import spark.implicits._
    val links = Seq(
      (1L, 9L, "best page"), (2L, 9L, "best page"), (3L, 9L, "a page"),
      (4L, 9L, "z page"),                     // ties with "a page" at freq 1
      (9L, 9L, "myself"),                     // self-link: dropped
      (1L, 8L, "only one")
    ).toDF("src", "dst", "anchor")
    val got = WebCuration.topAnchors(links, "src", "dst", "anchor", k = 2)
      .orderBy("dst", "rank").collect()
      .map(r => (r.getAs[Long]("dst"), r.getAs[Long]("rank"),
        r.getAs[String]("anchor"), r.getAs[Long]("freq"),
        r.getAs[Long]("n_inlinks")))
    assert(got.toSeq === Seq(
      (8L, 1L, "only one", 1L, 1L),
      (9L, 1L, "best page", 2L, 4L),
      (9L, 2L, "a page", 1L, 4L))) // "a page" beats "z page" on the tie
  }

  test("frontier: crawled targets excluded, inlink priority, bounded ranks") {
    import spark.implicits._
    val links = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L), // 100: 3 inlinks, uncrawled
      (1L, 200L), (2L, 200L),             // 200: 2 inlinks, uncrawled
      (1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L), // 5: crawled -> excluded
      (7L, 300L), (7L, 300L),             // 300: 2 links, 1 distinct src
      (9L, 9L)                            // self-link dropped
    ).toDF("src", "dst")
    val crawled = Seq(1L, 2L, 3L, 4L, 5L, 7L, 9L).toDF("doc_id")
    val got = WebCuration.frontier(links, "src", "dst", crawled, "doc_id",
      limit = 2).orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("dst"),
        r.getAs[Long]("n_inlinks"), r.getAs[Long]("n_srcs")))
    // 100 (3 inlinks) first; the 200-vs-300 tie at 2 inlinks breaks on dst
    assert(got.toSeq === Seq((1L, 100L, 3L, 3L), (2L, 200L, 2L, 2L)))
  }

  test("urlFrontier: spelling variants pool votes, crawled excluded, " +
      "self-links canonical") {
    import spark.implicits._
    val links = Seq(
      // page A linked under four spellings from three distinct sources
      // (s1 twice, under two of ITS own spellings -> 1 distinct src)
      ("https://s1.com/x", "https://www.A.com:443/p/1/"),
      ("HTTPS://S1.COM/x", "https://www.a.com/p/../p/1/?utm_source=z"),
      ("https://s2.com/y", "https://www.a.com//p//1//"),
      ("https://s3.com/z", "https://www.a.com/p/1/#frag"),
      // page B: two links, but crawled under a shifted spelling
      ("https://s1.com/x", "https://www.b.com/p/2/"),
      ("https://s2.com/y", "https://www.b.com/p/2/"),
      // self-link spelled two different ways
      ("https://www.c.com/p/3/", "https://WWW.C.COM:443/p/3/"),
      // page D: one link
      ("https://s3.com/z", "https://www.d.com/p/4/"))
      .toDF("src_url", "dst_url")
    val crawled = Seq("HTTPS://www.B.com:443/p/2/").toDF("url")
    val got = WebCuration.urlFrontier(links, "src_url", "dst_url",
        crawled, "url", limit = 10).orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("url"),
        r.getAs[Long]("n_inlinks"), r.getAs[Long]("n_srcs")))
    assert(got.toSeq === Seq(
      (1L, "https://www.a.com/p/1/", 4L, 3L),
      (2L, "https://www.d.com/p/4/", 1L, 1L)))
  }

  test("resolveRedirects: chains, loops, malformed Location, hop cap") {
    import spark.implicits._
    val rows = Seq(
      ("a", 200, null),       // plain page
      ("b", 301, "c"),        // one hop -> c (200)
      ("c", 200, null),
      ("d", 302, "b"),        // two hops -> c
      ("e", 307, "f"),        // loop e -> f -> e: must NOT resolve
      ("f", 308, "e"),
      ("g", 301, null),       // malformed: 3xx without Location -> itself
      ("h", 303, "missing")   // target never crawled: resolves to it
    ).toDF("url", "status", "location")
    val got = WebCuration.resolveRedirects(rows, "url", "status",
        "location", maxHops = 4)
      .select("url", "final_url", "n_hops", "resolved").collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got("a") === (("a", 0L, true)))
    assert(got("b") === (("c", 1L, true)))
    assert(got("d") === (("c", 2L, true)))
    // the loop burns the hop budget and stays unresolved
    assert(got("e")._3 === false && got("f")._3 === false)
    assert(got("e")._2 === 4L)
    assert(got("g") === (("g", 0L, true)))
    assert(got("h") === (("missing", 1L, true)))
  }

  test("urlTemplate: digits, hex ids, sorted param names, fragment") {
    import spark.implicits._
    val got = Seq(
      "https://www.a1.com/article/123-45",
      "https://www.a1.com/u/deadbeef0042cafe/photo?b=2&a=1",
      "https://www.a1.com/cal/2026/3/9?sid=00000000002a#frag",
      "https://www.a1.com/plain",
      "/relative/42?z=1&a=2",
      // uppercase/mixed-case hex tokens collapse too — a trap that
      // case-shifts its session ids must not mint fresh templates
      "https://www.a1.com/u/DEADBEEF0042CAFE/photo",
      "https://www.a1.com/u/DeadBeef0042CaFe/photo",
      // an uppercase scheme still splits authority from path
      "HTTPS://www.a1.com/article/123-45")
      .toDF("url")
      .select(WebCuration.urlTemplate($"url")).as[String].collect()
    assert(got.toSeq === Seq(
      // authority digits stay (hosts are identities, not patterns)
      "https://www.a1.com/article/#-#",
      "https://www.a1.com/u/*/photo?a&b",
      "https://www.a1.com/cal/#/#/#?sid",
      "https://www.a1.com/plain",
      // schemeless: whole string templatizes as a path
      "/relative/#?a&z",
      "https://www.a1.com/u/*/photo",
      "https://www.a1.com/u/*/photo",
      "HTTPS://www.a1.com/article/#-#"))
  }

  test("crawlTraps: low-diversity template flags, healthy one passes") {
    import spark.implicits._
    // 12 calendar URLs sharing ONE content fingerprint vs 12 articles
    // with unique content vs 3 about pages (below minUrls either way)
    val pages = ((0 until 12).map(i =>
        (s"https://t.com/cal/2026/$i?sid=$i", 7L)) ++
      (0 until 12).map(i => (s"https://t.com/article/$i", 100L + i)) ++
      (0 until 3).map(i => (s"https://t.com/about/$i", 7L)))
      .toDF("url", "fp")
    val got = WebCuration.crawlTraps(pages, "url", $"fp",
        minUrls = 10, maxDiversity = 0.2)
      .collect().map(r => r.getAs[String]("template") ->
        (r.getAs[Long]("n_urls"), r.getAs[Long]("n_content"),
          r.getAs[Boolean]("is_trap"))).toMap
    assert(got("https://t.com/cal/#/#?sid") === ((12L, 1L, true)))
    assert(got("https://t.com/article/#") === ((12L, 12L, false)))
    // too few URLs to call, even at zero diversity
    assert(got("https://t.com/about/#") === ((3L, 1L, false)))
  }
}
