package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** sitemaps.org ingestion — the crawl's OTHER discovery input next to
  * robots.txt: sites publish `<urlset>` documents (URL + optional
  * lastmod) and `<sitemapindex>` documents pointing at child sitemaps;
  * a crawler folds both into frontier seeds, newest-content-first.
  * Beyond-reference extension composing with [[WebCuration.frontier]]
  * and [[RobotsTxt]].
  *
  * Everything is declarative Spark: block extraction is
  * `regexp_extract_all` + explode (the sitemap format is flat enough
  * that a regex block walk IS the grammar — entries cannot nest), field
  * pulls are per-row regexp_extract, the index→child hop is one join on
  * the child's own URL, and seed ranking is a per-domain window. No
  * UDFs; XML volume is one document per site — broadcast-scale metadata
  * even for a 100 TB page corpus, like the robots rule table. */
object Sitemap {

  /** Parse sitemap XML documents into typed entries: one row per
    * `<url>` (kind 'url') or `<sitemap>` (kind 'sitemap') block, adding
    * (kind, loc, lastmod DATE, changefreq lowercased token, priority
    * DOUBLE — each null when its optional tag is absent). All other
    * input columns pass through; rows with an empty/missing `<loc>` are
    * dropped (the spec makes loc mandatory). */
  def parseEntries(df: DataFrame, xmlCol: String): DataFrame = {
    val passThrough = df.columns.filterNot(_ == xmlCol).map(col).toSeq
    def blocks(kind: String, tag: String) = df
      .select(passThrough :+ explode(regexp_extract_all(col(xmlCol),
        lit(s"(?s)<$tag>(.*?)</$tag>"), lit(1))).as("__blk"): _*)
      .withColumn("kind", lit(kind))
    val lastmodRaw = regexp_extract(col("__blk"),
      "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>", 1)
    val cfRaw = regexp_extract(col("__blk"),
      "(?s)<changefreq>\\s*(.*?)\\s*</changefreq>", 1)
    val prRaw = regexp_extract(col("__blk"),
      "(?s)<priority>\\s*(.*?)\\s*</priority>", 1)
    blocks("url", "url").unionByName(blocks("sitemap", "sitemap"))
      .withColumn("loc",
        regexp_extract(col("__blk"), "(?s)<loc>\\s*(.*?)\\s*</loc>", 1))
      // lastmod is optional; ANSI to_date('') would throw, so the absent
      // tag (empty extract) becomes a NULL date explicitly
      .withColumn("lastmod",
        when(lastmodRaw === "", lit(null).cast("date"))
          .otherwise(to_date(lastmodRaw)))
      .withColumn("changefreq",
        when(cfRaw === "", lit(null).cast("string")).otherwise(lower(cfRaw)))
      // numeric-guarded cast: a malformed priority is null, not an
      // ANSI cast error mid-crawl
      .withColumn("priority",
        when(prRaw.rlike("^[0-9]*\\.?[0-9]+$"), prRaw.cast("double")))
      .filter(col("loc") =!= "")
      .drop("__blk")
  }

  /** [[parseEntries]] over RAW BYTES — the form a fetcher actually
    * holds: `sitemap.xml.gz` is the common spelling in the wild (and
    * gzip bytes are also served under plain `.xml` names), so the
    * payload routes through [[graft.expr.GzipExpressions.gunzip_text]]
    * — gzip-magic sniffed, never extension-trusted — before the same
    * regex block walk. A payload whose magic says gzip but whose stream
    * is invalid decodes to null and the document vanishes at the block
    * explode — poisoned-row semantics, not a task failure. */
  def parseEntriesBinary(df: DataFrame, bytesCol: String): DataFrame =
    parseEntries(
      df.withColumn("__xml",
        graft.expr.GzipExpressions.gunzip_text(col(bytesCol)))
        .drop(bytesCol),
      "__xml")

  /** Frontier seeds from parsed url-entries: drop locations the crawl
    * already holds (one left-anti join on the URL), then rank per
    * domain newest-first (lastmod DESC NULLS LAST, loc ASC — the
    * deterministic tie-break). Output adds `seed_rank` (1-based).
    *
    * The anti-join keys on the CANONICAL url ([[graft.expr.UrlOps]], both
    * sides): a sitemap's `<loc>` spelling and the warehouse's fetch
    * record routinely disagree on case/port/trailing-slash details, and
    * a raw-string anti-join would re-seed every such already-held page.
    * `loc` in the output is the canonical spelling. */
  def seeds(urlEntries: DataFrame, domainCol: String,
            crawled: DataFrame, crawledUrlCol: String): DataFrame =
    rankSeeds(seedSurvivors(urlEntries, domainCol, crawled, crawledUrlCol),
      domainCol)

  /** The stateless half of [[seeds]]: canonical-key anti-join against
    * the crawled set — per-row parse + broadcast-scale static side, so
    * the STREAMING twin applies it per micro-batch (stream-static, the
    * robots-gate shape) with bit-identical results. */
  def seedSurvivors(urlEntries: DataFrame, domainCol: String,
                    crawled: DataFrame, crawledUrlCol: String): DataFrame = {
    import graft.expr.UrlExpressions.url_canonicalize
    urlEntries.filter(col("kind") === "url")
      .withColumn("loc", url_canonicalize(col("loc")))
      .join(crawled.select(url_canonicalize(col(crawledUrlCol)).as("loc")),
        Seq("loc"), "left_anti")
  }

  /** The ranking half of [[seeds]]: a pure window over whatever
    * survivor set it is given (newest-first, loc tie-break) — arrival-
    * order-invariant by construction, which is what lets the streaming
    * twin share the batch oracle verbatim. */
  def rankSeeds(survivors: DataFrame, domainCol: String): DataFrame = {
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("lastmod").desc_nulls_last, col("loc").asc)
    survivors.withColumn("seed_rank", row_number().over(w).cast("long"))
  }

  /** Recrawl planner — the sitemap's second job after seeding: decide,
    * per advertised URL, whether to fetch at all. `new` = never crawled;
    * `refresh` = crawled but the sitemap's lastmod postdates our fetch;
    * `skip` = our copy is current (or the entry has no lastmod and we
    * hold a copy — no evidence of change; conservative, documented).
    * Non-skip rows get a per-domain `fetch_rank` (newest first, loc
    * tie-break) — the fetcher's work queue. One left join against the
    * crawl warehouse's (url, fetched_at) projection + one bounded
    * window. */
  def recrawlPlan(urlEntries: DataFrame, domainCol: String,
                  crawled: DataFrame, crawledUrlCol: String,
                  fetchedAtCol: String): DataFrame = {
    import graft.expr.UrlExpressions.url_canonicalize
    // canonical keys on both sides, the [[seeds]] discipline: a spelling
    // mismatch here turns every held page into a spurious full re-fetch.
    // Crawled copies whose spellings COLLAPSE under canonicalization
    // fold to their latest fetch (max) — the copy that decides staleness
    // — instead of fanning the plan out one row per spelling.
    val joined = urlEntries.filter(col("kind") === "url")
      .withColumn("loc", url_canonicalize(col("loc")))
      .join(crawled
        .groupBy(url_canonicalize(col(crawledUrlCol)).as("loc"))
        .agg(max(col(fetchedAtCol)).as("__fetched")), Seq("loc"), "left")
      .withColumn("action",
        when(col("__fetched").isNull, "new")
          .when(col("lastmod").isNotNull &&
            col("lastmod") > col("__fetched"), "refresh")
          .otherwise("skip"))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("lastmod").desc_nulls_last, col("loc").asc)
    joined.filter(col("action") =!= "skip")
      .withColumn("fetch_rank", row_number().over(w).cast("long"))
      .unionByName(joined.filter(col("action") === "skip")
        .withColumn("fetch_rank", lit(null).cast("long")))
      .drop("__fetched")
  }

  /** [[recrawlPlan]] with the `<changefreq>` signal folded in — the
    * refinement that unsticks the conservative branch: a held copy with
    * NO newer lastmod previously always skipped; with a changefreq, the
    * advertised revisit period decides instead. Actions: `new` (never
    * crawled), `refresh` (lastmod postdates our fetch — the strongest
    * signal, changefreq ignored), `revisit` (no newer lastmod but the
    * changefreq period has elapsed since our fetch as of `asOf`:
    * always/hourly/daily → 1 day at crawl-batch granularity, weekly 7,
    * monthly 30, yearly 365; `never` and unknown tokens never fire),
    * `skip` otherwise. Non-skip rows rank per domain (lastmod DESC
    * NULLS LAST, loc ASC). Same one-join + one-window shape. */
  def recrawlPlanFreq(urlEntries: DataFrame, domainCol: String,
                      crawled: DataFrame, crawledUrlCol: String,
                      fetchedAtCol: String, asOf: Column): DataFrame = {
    import graft.expr.UrlExpressions.url_canonicalize
    val period =
      when(col("changefreq").isin("always", "hourly", "daily"), 1L)
        .when(col("changefreq") === "weekly", 7L)
        .when(col("changefreq") === "monthly", 30L)
        .when(col("changefreq") === "yearly", 365L)
    val joined = urlEntries.filter(col("kind") === "url")
      .withColumn("loc", url_canonicalize(col("loc")))
      .join(crawled
        .groupBy(url_canonicalize(col(crawledUrlCol)).as("loc"))
        .agg(max(col(fetchedAtCol)).as("__fetched")), Seq("loc"), "left")
      .withColumn("action",
        when(col("__fetched").isNull, "new")
          .when(col("lastmod").isNotNull &&
            col("lastmod") > col("__fetched"), "refresh")
          .when(period.isNotNull &&
            datediff(asOf, col("__fetched")) >= period, "revisit")
          .otherwise("skip"))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("lastmod").desc_nulls_last, col("loc").asc)
    joined.filter(col("action") =!= "skip")
      .withColumn("fetch_rank", row_number().over(w).cast("long"))
      .unionByName(joined.filter(col("action") === "skip")
        .withColumn("fetch_rank", lit(null).cast("long")))
      .drop("__fetched")
  }

  /** Conditional-fetch planner — [[recrawlPlan]]'s HTTP-aware half: a
    * real crawler never blind-refetches a held page; it revalidates with
    * the stored validators (RFC 9110 §13): `If-None-Match` when an ETag
    * was stored, else `If-Modified-Since` from the stored
    * Last-Modified, else an unconditional fetch. Takes the plan's
    * non-skip rows and the warehouse's validator projection; emits the
    * fetch queue with `mode ∈ full | conditional_etag | conditional_ims`
    * plus the header values to send. `new` URLs are always `full` (no
    * held copy to validate). Spellings that collapse under
    * canonicalization fold to ONE validator row, both validators taken
    * from the SAME held copy — the one with the max `fetchedAtCol`
    * (ties broken on the validator pair itself, deterministic): a
    * per-column max could pair one copy's ETag with another copy's
    * Last-Modified, a header combination no copy ever carried, and a
    * string Last-Modified's lexicographic max is not "latest" anyway
    * (RFC 1123 dates don't sort as text). `fetchedAtCol` must be an
    * orderable fetch timestamp (date/timestamp); `lastModCol` may be
    * any type the origin returned — it is carried, never compared.
    * One left join against a warehouse projection that is url-distinct
    * by construction — broadcast-scale next to the page store. */
  def conditionalPlan(plan: DataFrame, held: DataFrame, heldUrlCol: String,
                      etagCol: String, lastModCol: String,
                      fetchedAtCol: String): DataFrame = {
    import graft.expr.UrlExpressions.url_canonicalize
    val v = held.groupBy(url_canonicalize(col(heldUrlCol)).as("loc"))
      .agg(max(struct(col(fetchedAtCol).as("f"), col(etagCol).as("e"),
        col(lastModCol).as("l"))).as("__v"))
      .select(col("loc"), col("__v.e").as("__etag"),
        col("__v.l").as("__lm"))
    plan.filter(col("action") =!= "skip")
      .join(v, Seq("loc"), "left")
      .withColumn("mode",
        when(col("action") === "new", "full")
          .when(col("__etag").isNotNull, "conditional_etag")
          .when(col("__lm").isNotNull, "conditional_ims")
          .otherwise("full"))
      .withColumn("if_none_match",
        when(col("mode") === "conditional_etag", col("__etag")))
      .withColumn("if_modified_since",
        when(col("mode") === "conditional_ims", col("__lm")))
      .drop("__etag", "__lm")
  }

  /** Post-fetch bandwidth ledger — what revalidation bought, per domain:
    * fetch counts by mode, 304 (Not Modified) count, bytes actually
    * transferred (200 responses), and bytes SAVED (the payload size a
    * 304 avoided re-shipping — by convention `bytesCol` carries the
    * would-be payload size on every row, so saved = the 304 rows' sum).
    * The revisit-record WARC writer consumes the 304 rows; this frame is
    * the planning/report surface. One combining aggregate on the domain
    * key — domain-count-sized output. */
  def fetchLedger(outcomes: DataFrame, domainCol: String, modeCol: String,
                  statusCol: String, bytesCol: String): DataFrame =
    outcomes.groupBy(col(domainCol))
      .agg(
        count(lit(1)).as("n_fetches"),
        sum((col(modeCol) === "full").cast("long")).as("n_full"),
        sum(col(modeCol).startsWith("conditional").cast("long"))
          .as("n_conditional"),
        sum((col(statusCol) === 304).cast("long")).as("n_304"),
        sum(when(col(statusCol) === 200, col(bytesCol)).otherwise(0L))
          .cast("long").as("bytes_transferred"),
        sum(when(col(statusCol) === 304, col(bytesCol)).otherwise(0L))
          .cast("long").as("bytes_saved"))

  /** Deterministic synthetic `<urlset>` for the fixture domains: entries
    * for slots `from until until`, loc = /docs/((k + i) % 25) with
    * lastmod 2026-01-((k + i) % 28 + 1), changefreq rotating the six
    * spec tokens by (k + i) % 6 (`never` included so the null-period
    * branch is exercised) and priority 0.((k + i) % 10) — every field
    * SQL-reconstructable from the domain. */
  def syntheticUrlset(domain: Column, k: Column, from: Int, until: Int): Column = {
    val freqs = array(lit("always"), lit("daily"), lit("weekly"),
      lit("monthly"), lit("yearly"), lit("never"))
    val entries = (from until until).map { i =>
      val slot = (k + lit(i)) % 25
      val day = lpad(((k + lit(i)) % 28 + 1).cast("string"), 2, "0")
      concat(lit("  <url>\n    <loc>https://www."), domain, lit("/docs/"),
        slot.cast("string"),
        lit("</loc>\n    <lastmod>2026-01-"), day,
        lit("</lastmod>\n    <changefreq>"),
        element_at(freqs, ((k + lit(i)) % 6).cast("int") + 1),
        lit("</changefreq>\n    <priority>0."),
        ((k + lit(i)) % 10).cast("string"),
        lit("</priority>\n  </url>\n"))
    }
    concat(lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n") +:
      entries :+ lit("</urlset>\n"): _*)
  }

  /** Deterministic synthetic `<sitemapindex>` naming the two child
    * sitemaps [[syntheticUrlset]] fills for odd-k fixture domains. */
  def syntheticIndex(domain: Column): Column =
    concat(lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
      "  <sitemap>\n    <loc>https://www."), domain,
      lit("/sitemap-1.xml</loc>\n  </sitemap>\n" +
        "  <sitemap>\n    <loc>https://www."), domain,
      lit("/sitemap-2.xml</loc>\n    <lastmod>2026-02-01</lastmod>\n" +
        "  </sitemap>\n</sitemapindex>\n"))
}
