package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SitemapSpec extends SparkSpec {
  import spark.implicits._

  test("parseEntries: urlset, sitemapindex, optional lastmod, junk dropped") {
    val urlset =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc> https://a.com/p1 </loc>
        |    <lastmod>2026-03-05</lastmod>
        |  </url>
        |  <url><loc>https://a.com/p2</loc></url>
        |  <url><lastmod>2026-01-01</lastmod></url>
        |</urlset>""".stripMargin
    val index =
      """<sitemapindex>
        |  <sitemap><loc>https://a.com/s1.xml</loc></sitemap>
        |  <sitemap>
        |    <loc>https://a.com/s2.xml</loc><lastmod>2026-02-02</lastmod>
        |  </sitemap>
        |</sitemapindex>""".stripMargin
    val got = Sitemap.parseEntries(
      Seq(("a.com", urlset), ("a.com", index)).toDF("domain", "xml"), "xml")
      .orderBy("kind", "loc").collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[String]("loc"),
        Option(r.getAs[Date]("lastmod")).map(_.toString)))
    assert(got.toSeq === Seq(
      ("sitemap", "https://a.com/s1.xml", None),
      ("sitemap", "https://a.com/s2.xml", Some("2026-02-02")),
      ("url", "https://a.com/p1", Some("2026-03-05")),
      ("url", "https://a.com/p2", None)))
  }

  test("seeds: crawled anti-joined, newest-first rank, null lastmod last") {
    val entries = Seq(
      ("a.com", "url", "https://a.com/old", Date.valueOf("2026-01-01")),
      ("a.com", "url", "https://a.com/new", Date.valueOf("2026-03-01")),
      ("a.com", "url", "https://a.com/undated", null),
      ("a.com", "url", "https://a.com/crawled", Date.valueOf("2026-02-01")),
      ("b.com", "url", "https://b.com/x", Date.valueOf("2026-01-15")))
      .toDF("domain", "kind", "loc", "lastmod")
    val crawled = Seq("https://a.com/crawled").toDF("url")
    val got = Sitemap.seeds(entries, "domain", crawled, "url")
      .select("domain", "loc", "seed_rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      ("a.com", "https://a.com/new", 1L),
      ("a.com", "https://a.com/old", 2L),
      ("a.com", "https://a.com/undated", 3L),
      ("b.com", "https://b.com/x", 1L)))
  }

  test("recrawlPlan: new / refresh / skip, rank over non-skip only") {
    val entries = Seq(
      ("a.com", "url", "https://a.com/stale", Date.valueOf("2026-03-01")),
      ("a.com", "url", "https://a.com/current", Date.valueOf("2026-01-01")),
      ("a.com", "url", "https://a.com/unseen", Date.valueOf("2026-02-01")),
      ("a.com", "url", "https://a.com/undated-held", null))
      .toDF("domain", "kind", "loc", "lastmod")
    val crawled = Seq(
      ("https://a.com/stale", Date.valueOf("2026-02-15")),
      ("https://a.com/current", Date.valueOf("2026-02-15")),
      ("https://a.com/undated-held", Date.valueOf("2026-02-15")))
      .toDF("url", "fetched_at")
    val got = Sitemap.recrawlPlan(entries, "domain", crawled, "url",
        "fetched_at")
      .select("loc", "action", "fetch_rank").collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(got === Set(
      ("https://a.com/stale", "refresh", Some(1L)),
      ("https://a.com/unseen", "new", Some(2L)),
      ("https://a.com/current", "skip", None),
      ("https://a.com/undated-held", "skip", None)))
  }

  test("parseEntriesBinary: gzip by magic, plain UTF-8, bad gzip drops") {
    def gzip(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close()
      bos.toByteArray
    }
    val xml = "<urlset><url><loc>https://a.com/p1</loc></url></urlset>"
    // gzip magic but truncated stream: the document must vanish, not throw
    val bad = gzip(xml).take(6)
    val docs = Seq(
      ("a.com", gzip(xml)),
      ("b.com", xml.replace("a.com", "b.com").getBytes("UTF-8")),
      ("c.com", bad))
      .toDF("domain", "bytes")
    val got = Sitemap.parseEntriesBinary(docs, "bytes")
      .select("domain", "kind", "loc").as[(String, String, String)]
      .collect().toSet
    assert(got === Set(("a.com", "url", "https://a.com/p1"),
      ("b.com", "url", "https://b.com/p1")))
  }

  test("conditionalPlan: validator pick, new=full, skip dropped") {
    val entries = Seq(
      ("a.com", "url", "https://a.com/etagged", Date.valueOf("2026-03-01")),
      ("a.com", "url", "https://a.com/dated", Date.valueOf("2026-03-01")),
      ("a.com", "url", "https://a.com/unseen", Date.valueOf("2026-02-01")),
      ("a.com", "url", "https://a.com/current", Date.valueOf("2026-01-01")))
      .toDF("domain", "kind", "loc", "lastmod")
    val held = Seq(
      ("https://a.com/etagged", Date.valueOf("2026-02-15"), "W/\"7\""),
      ("https://a.com/dated", Date.valueOf("2026-02-15"), null),
      ("https://a.com/current", Date.valueOf("2026-02-15"), "W/\"9\""))
      .toDF("url", "fetched_at", "etag")
    val plan = Sitemap.recrawlPlan(entries, "domain", held, "url",
      "fetched_at")
    val got = Sitemap.conditionalPlan(plan, held, "url", "etag",
        "fetched_at", "fetched_at")
      .select("loc", "mode", "if_none_match", "if_modified_since")
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.get(3)).map(_.toString))).toSet
    assert(got === Set(
      ("https://a.com/etagged", "conditional_etag", Some("W/\"7\""), None),
      ("https://a.com/dated", "conditional_ims", None, Some("2026-02-15")),
      ("https://a.com/unseen", "full", None, None)))
  }

  test("conditionalPlan: collapsing spellings take the LATEST copy's " +
    "validator pair, never a cross-copy mix") {
    val entries = Seq(
      ("a.com", "url", "https://a.com/page", Date.valueOf("2026-03-01")))
      .toDF("domain", "kind", "loc", "lastmod")
    // three spellings of one resource; the OLDEST copy has the
    // lexicographically-largest etag, so a per-column max would emit
    // (Z-old-etag, 02-20 date) — a pair no copy carried. The latest
    // fetch (02-20, via the :443 spelling) has a NULL etag, so the
    // plan must fall through to If-Modified-Since from that same row.
    val held = Seq(
      ("https://a.com/page", Date.valueOf("2026-01-05"), "Z/\"old\""),
      ("HTTPS://A.COM/page", Date.valueOf("2026-02-01"), "W/\"mid\""),
      ("https://a.com:443/page", Date.valueOf("2026-02-20"),
        null.asInstanceOf[String]))
      .toDF("url", "fetched_at", "etag")
    val plan = Sitemap.recrawlPlan(entries, "domain", held, "url",
      "fetched_at")
    val got = Sitemap.conditionalPlan(plan, held, "url", "etag",
        "fetched_at", "fetched_at")
      .select("loc", "mode", "if_none_match", "if_modified_since")
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.get(3)).map(_.toString)))
    assert(got.toSeq === Seq(
      ("https://a.com/page", "conditional_ims", None, Some("2026-02-20"))))
  }

  test("fetchLedger: modes, 304 count, transferred vs saved bytes") {
    val outcomes = Seq(
      ("a.com", "full", 200, 100L),
      ("a.com", "conditional_etag", 304, 70L),
      ("a.com", "conditional_ims", 200, 30L),
      ("b.com", "conditional_ims", 304, 11L))
      .toDF("domain", "mode", "status", "bytes")
    val got = Sitemap.fetchLedger(outcomes, "domain", "mode", "status",
        "bytes")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(got("a.com") === ((3L, 1L, 2L, 1L, 130L, 70L)))
    assert(got("b.com") === ((1L, 0L, 1L, 1L, 0L, 11L)))
  }
}
