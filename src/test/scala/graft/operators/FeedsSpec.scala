package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FeedsSpec extends SparkSpec {
  import spark.implicits._

  test("RSS items: text link, RFC-822 pubDate, missing fields tolerated") {
    val rss =
      """<rss version="2.0"><channel><title>t</title>
        |  <item>
        |    <title>a</title>
        |    <link> https://d.com/a </link>
        |    <pubDate>Wed, 5 Mar 2026 10:30:00 GMT</pubDate>
        |  </item>
        |  <item><link>https://d.com/b</link></item>
        |  <item><title>no link, dropped</title></item>
        |</channel></rss>""".stripMargin
    val got = Feeds.parseEntries(Seq(("d.com", rss)).toDF("domain", "xml"), "xml")
      .orderBy("link").collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[String]("link"),
        Option(r.getAs[Date]("published")).map(_.toString)))
    assert(got.toSeq === Seq(
      ("rss", "https://d.com/a", Some("2026-03-05")),
      ("rss", "https://d.com/b", None)))
  }

  test("Atom entries: href attribute link, ISO updated") {
    val atom =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |  <entry>
        |    <title>a</title>
        |    <link rel="alternate" type="text/html" href="https://d.com/x"/>
        |    <updated>2026-02-14T08:00:00Z</updated>
        |  </entry>
        |  <entry><link href="https://d.com/y"/></entry>
        |</feed>""".stripMargin
    val got = Feeds.parseEntries(Seq(("d.com", atom)).toDF("domain", "xml"), "xml")
      .orderBy("link").collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[String]("link"),
        Option(r.getAs[Date]("published")).map(_.toString)))
    assert(got.toSeq === Seq(
      ("atom", "https://d.com/x", Some("2026-02-14")),
      ("atom", "https://d.com/y", None)))
  }

  test("line dedup: boilerplate drops, content survives, order kept") {
    val docs = Seq(
      (1L, "alpha one\nshared footer\nbeta two"),
      (2L, "gamma three\nshared footer"),
      (3L, "delta four\nshared footer"),
      (4L, "alpha one\nshared footer")) // "alpha one" in 2 docs: kept at max 3
      .toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "doc_id", "text", maxDocFreq = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) === (("alpha one\nbeta two", 2L, 1L)))
    assert(got(2L) === (("gamma three", 1L, 1L)))
    assert(got(3L) === (("delta four", 1L, 1L)))
    assert(got(4L) === (("alpha one", 1L, 1L)))
  }
}
