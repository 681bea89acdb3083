package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RSS 2.0 / Atom feed ingestion — the third discovery input next to
  * robots.txt and sitemaps, and the FAST one: feeds advertise the
  * newest handful of URLs with publish timestamps, so a crawler polls
  * them between full sitemap sweeps. Beyond-reference extension
  * composing with [[Sitemap.seeds]] (feed entries normalize into the
  * same url-entry shape, so ONE seeds operator serves both inputs).
  *
  * Same declarative playbook as [[Sitemap]]: block extraction via
  * regexp_extract_all + explode, field pulls per row — but the two
  * formats deliberately exercise DIFFERENT extraction shapes: RSS keeps
  * the link in element TEXT (`<link>…</link>`, RFC-822-style pubDate),
  * Atom in an ATTRIBUTE (`<link href="…"/>`, ISO-8601 `<updated>`). No
  * UDFs; feed volume is per-site metadata, broadcast-scale. */
object Feeds {

  /** Parse feed XML documents into entries: one row per RSS `<item>`
    * (kind 'rss') or Atom `<entry>` (kind 'atom'), adding (kind, link,
    * published DATE — null when absent/unparseable). Rows without a
    * link are dropped. All other input columns pass through. */
  def parseEntries(df: DataFrame, xmlCol: String): DataFrame = {
    val passThrough = df.columns.filterNot(_ == xmlCol).map(col).toSeq
    def blocks(kind: String, tag: String) = df
      .select(passThrough :+ explode(regexp_extract_all(col(xmlCol),
        lit(s"(?s)<$tag>(.*?)</$tag>"), lit(1))).as("__blk"): _*)
      .withColumn("kind", lit(kind))
    val rss = blocks("rss", "item")
      .withColumn("link",
        regexp_extract(col("__blk"), "(?s)<link>\\s*(.*?)\\s*</link>", 1))
      .withColumn("__d", regexp_extract(col("__blk"),
        "(?s)<pubDate>\\s*\\w+,\\s*(\\d{1,2} \\w{3} \\d{4})", 1))
      .withColumn("published",
        when(col("__d") === "", lit(null).cast("date"))
          .otherwise(to_date(col("__d"), "d MMM yyyy")))
    val atom = blocks("atom", "entry")
      .withColumn("link", regexp_extract(col("__blk"),
        "(?s)<link[^>]*href=\"([^\"]*)\"", 1))
      .withColumn("__d", regexp_extract(col("__blk"),
        "(?s)<updated>\\s*(\\d{4}-\\d{2}-\\d{2})", 1))
      .withColumn("published",
        when(col("__d") === "", lit(null).cast("date"))
          .otherwise(to_date(col("__d"))))
    rss.unionByName(atom)
      .filter(col("link") =!= "")
      .drop("__blk", "__d")
  }

  /** Deterministic synthetic RSS 2.0 channel for the fixture domains:
    * items for slots `from until until`, link = /docs/((k+i) % 25),
    * pubDate = (k+i) % 28 + 1 March 2026 in RFC-822 dress. */
  def syntheticRss(domain: Column, k: Column, from: Int, until: Int): Column = {
    val items = (from until until).map { i =>
      val slot = (k + lit(i)) % 25
      val day = lpad(((k + lit(i)) % 28 + 1).cast("string"), 2, "0")
      concat(lit("  <item>\n    <title>post "), slot.cast("string"),
        lit("</title>\n    <link>https://www."), domain, lit("/docs/"),
        slot.cast("string"),
        lit("</link>\n    <pubDate>Thu, "), day,
        lit(" Mar 2026 00:00:00 GMT</pubDate>\n  </item>\n"))
    }
    concat(lit("<?xml version=\"1.0\"?>\n<rss version=\"2.0\">\n<channel>\n" +
      "  <title>feed</title>\n") +: items :+ lit("</channel>\n</rss>\n"): _*)
  }

  /** Deterministic synthetic Atom feed, same slot/date rules, link in
    * the href ATTRIBUTE and an ISO-8601 `<updated>`. */
  def syntheticAtom(domain: Column, k: Column, from: Int, until: Int): Column = {
    val entries = (from until until).map { i =>
      val slot = (k + lit(i)) % 25
      val day = lpad(((k + lit(i)) % 28 + 1).cast("string"), 2, "0")
      concat(lit("  <entry>\n    <title>post "), slot.cast("string"),
        lit("</title>\n    <link rel=\"alternate\" href=\"https://www."),
        domain, lit("/docs/"), slot.cast("string"),
        lit("\"/>\n    <updated>2026-03-"), day,
        lit("T00:00:00Z</updated>\n  </entry>\n"))
    }
    concat(lit("<?xml version=\"1.0\"?>\n" +
      "<feed xmlns=\"http://www.w3.org/2005/Atom\">\n" +
      "  <title>feed</title>\n") +: entries :+ lit("</feed>\n"): _*)
  }
}
