package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RobotsTxtSpec extends SparkSpec {
  import spark.implicits._

  test("parser: groups, shared UA lines, comments, case, crawl-delay") {
    val txt = Seq(
      "# top comment",
      "Disallow: /orphan/   # rule before any group: dropped",
      "User-Agent: *",
      "Disallow: /a/",
      "",
      "User-agent: botA",
      "USER-AGENT: botB",
      "Allow: /shared/  # two UA lines share the group",
      "Crawl-Delay: 7",
      "weird-noise-line",
      "Disallow: /b/").mkString("\n")
    val rules = RobotsTxt.parseRules(
      Seq(("d.com", txt)).toDF("domain", "txt"), "domain", "txt")
      .orderBy("agent", "line_no").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getString(3), r.getString(4)))
    assert(rules.toSeq === Seq(
      ("*", 3L, "disallow", "/a/"),
      ("bota", 7L, "allow", "/shared/"),
      ("bota", 8L, "crawl-delay", "7"),
      ("bota", 10L, "disallow", "/b/"),
      ("botb", 7L, "allow", "/shared/"),
      ("botb", 8L, "crawl-delay", "7"),
      ("botb", 10L, "disallow", "/b/")))
  }

  test("gate: longest match wins, Allow beats Disallow on ties, override") {
    val txt = Seq(
      "User-agent: *",
      "Disallow: /",
      "",
      "User-agent: me",
      "Disallow: /x/",
      "Allow: /x/pub/",
      "Allow: /y/",   // same length as the next line: Allow wins the tie
      "Disallow: /y/").mkString("\n")
    val rules = RobotsTxt.parseRules(
      Seq(("d.com", txt)).toDF("domain", "txt"), "domain", "txt")
    val urls = Seq(
      (1L, "https://www.d.com/x/secret.html"),   // /x/ disallow
      (2L, "https://www.d.com/x/pub/ok.html"),   // /x/pub/ allow (longer)
      (3L, "https://www.d.com/y/page"),          // tie -> allow
      (4L, "https://www.d.com/free"),            // no match -> allowed
      (5L, "https://other.com/x/secret")         // no rules for domain
    ).toDF("id", "url")
    val got = RobotsTxt.gate(urls, "url", rules, "ME")
      .orderBy("id")
      .select("id", "allowed", "matched_path").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), Option(r.getString(2))))
    assert(got.toSeq === Seq(
      (1L, false, Some("/x/")),
      (2L, true, Some("/x/pub/")),
      (3L, true, Some("/y/")),
      (4L, true, None),
      (5L, true, None)))
  }

  test("gate: falls back to the * group when the agent has no group") {
    val txt = "User-agent: *\nDisallow: /all/\n"
    val rules = RobotsTxt.parseRules(
      Seq(("d.com", txt)).toDF("domain", "txt"), "domain", "txt")
    val got = RobotsTxt.gate(
      Seq((1L, "http://d.com/all/x"), (2L, "http://d.com/ok")).toDF("id", "url"),
      "url", rules, "stranger").orderBy("id").collect()
    assert(got.map(_.getBoolean(got.head.fieldIndex("allowed"))).toSeq ===
      Seq(false, true))
  }

  test("gate: pathless URL normalizes to '/' so a root Disallow blocks it") {
    val txt = "User-agent: *\nDisallow: /\nAllow: /pub/\n"
    val rules = RobotsTxt.parseRules(
      Seq(("d.com", txt)).toDF("domain", "txt"), "domain", "txt")
    val urls = Seq(
      (1L, "https://d.com"),           // no path at all -> "/" -> blocked
      (2L, "https://d.com/"),          // explicit root -> blocked
      (3L, "https://d.com/pub/x"),     // longer Allow wins
      (4L, "https://nobots.com")       // no rules, no path -> allowed
    ).toDF("id", "url")
    val got = RobotsTxt.gate(urls, "url", rules, "anybot").orderBy("id")
      .select("id", "path", "allowed").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(got.toSeq === Seq(
      (1L, "/", false), (2L, "/", false), (3L, "/pub/x", true),
      (4L, "/", true)))
  }

  test("gate: an exact-agent group with only crawl-delay still shadows *") {
    // RFC 9309: the most specific matching group applies even when it
    // carries no allow/disallow directives — 'me' gets allow-everything,
    // NOT the * group's Disallow.
    val txt = Seq(
      "User-agent: *",
      "Disallow: /",
      "",
      "User-agent: me",
      "Crawl-delay: 3").mkString("\n")
    val rules = RobotsTxt.parseRules(
      Seq(("d.com", txt)).toDF("domain", "txt"), "domain", "txt")
    val urls = Seq((1L, "https://d.com/page"), (2L, "https://d.com"))
      .toDF("id", "url")
    val me = RobotsTxt.gate(urls, "url", rules, "me").orderBy("id").collect()
    assert(me.map(_.getAs[Boolean]("allowed")).toSeq === Seq(true, true))
    // a bot with no group of its own still falls back to * (blocked)
    val other = RobotsTxt.gate(urls, "url", rules, "other").orderBy("id").collect()
    assert(other.map(_.getAs[Boolean]("allowed")).toSeq === Seq(false, false))
  }

  test("synthetic template parses to the 8 expected rule rows per domain") {
    val robots = Seq(("src7.example.com", 7L)).toDF("domain", "k")
      .select(col("domain"),
        RobotsTxt.syntheticRobots(col("domain"), col("k")).as("txt"))
    val rules = RobotsTxt.parseRules(robots, "domain", "txt").collect()
    assert(rules.length === 8)
    assert(rules.count(_.getString(1) == "*") === 4)
    assert(rules.count(_.getString(1) == "graftbot") === 4)
    assert(rules.exists(r => r.getString(4) == "/docs/7/"))
    assert(rules.exists(r =>
      r.getString(1) == "graftbot" && r.getString(3) == "crawl-delay" &&
        r.getString(4) == "2")) // 7 % 3 + 1
  }

  test("synthetic template: k % 5 == 0 domains add the root Disallow") {
    val robots = Seq(("src10.example.com", 10L)).toDF("domain", "k")
      .select(col("domain"),
        RobotsTxt.syntheticRobots(col("domain"), col("k")).as("txt"))
    val rules = RobotsTxt.parseRules(robots, "domain", "txt").collect()
    assert(rules.length === 9)
    assert(rules.exists(r => r.getString(1) == "graftbot" &&
      r.getLong(2) == 12L && r.getString(3) == "disallow" &&
      r.getString(4) == "/"))
  }

  test("sitemap directives: group-independent, URL colon survives, comments") {
    val txt = Seq(
      "# header",
      "Sitemap: https://d.com/a.xml",
      "User-agent: *",
      "Disallow: /x/",
      "SITEMAP: https://d.com/b.xml   # case-insensitive key, comment",
      "Sitemap:").mkString("\n") // empty value dropped
    val got = RobotsTxt.sitemapDirectives(
      Seq(("d.com", txt)).toDF("domain", "txt"), "domain", "txt")
      .orderBy("line_no").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === Seq(
      ("d.com", 1L, "https://d.com/a.xml"),
      ("d.com", 4L, "https://d.com/b.xml")))
    // and parseRules never leaks sitemap lines as access rules
    val rules = RobotsTxt.parseRules(
      Seq(("d.com", txt)).toDF("domain", "txt"), "domain", "txt").collect()
    assert(rules.forall(_.getString(3) != "sitemap"))
    assert(rules.length === 1)
  }

  test("schedule: per-domain queue, delay fallback chain, fetch spacing") {
    val txt = Seq(
      "User-agent: *",
      "crawl-delay: 5",
      "Disallow: /blocked/",
      "",
      "User-agent: me",
      "Allow: /").mkString("\n")
    val rules = RobotsTxt.parseRules(
      Seq(("a.com", txt), ("b.com", "User-agent: *\nAllow: /\n"))
        .toDF("domain", "txt"), "domain", "txt")
    val urls = Seq(
      (1L, "https://a.com/p1"), (2L, "https://a.com/p2"),
      (3L, "https://a.com/p3"), (4L, "https://b.com/q1"),
      (5L, "https://b.com/q2")).toDF("id", "url")
    val got = RobotsTxt.schedule(urls, "url", "id", rules, "me")
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("domain"),
        r.getAs[Long]("delay_ms"), r.getAs[Long]("pos"),
        r.getAs[Long]("fetch_at_ms")))
    // a.com: agent `me` group has no delay -> falls back to *'s 5s;
    // b.com: no crawl-delay anywhere -> default 1s
    assert(got.filter(_._2 == "a.com").forall(_._3 == 5000L))
    assert(got.filter(_._2 == "b.com").forall(_._3 == 1000L))
    // per-domain positions dense from 0; spacing = pos * delay
    for (d <- Seq("a.com", "b.com")) {
      val rows = got.filter(_._2 == d)
      assert(rows.map(_._4).sorted.toSeq === (0L until rows.length).toSeq)
      rows.foreach(r => assert(r._5 === r._4 * r._3))
    }
  }

  test("robots_match: RFC 9309 wildcards, anchors, prefix equivalence") {
    def m(path: String, rule: String): Boolean =
      graft.expr.RobotsMatchOps.matches(
        org.apache.spark.unsafe.types.UTF8String.fromString(path),
        org.apache.spark.unsafe.types.UTF8String.fromString(rule))
    // plain rules keep exact prefix semantics
    assert(m("/docs/3/open", "/docs/"))
    assert(!m("/doc", "/docs/"))
    assert(m("/a", "/"))
    assert(m("/anything", "")) // empty rule matches everything
    // * spans any run, including empty and across segments
    assert(m("/page/7?sid=7", "/*?sid="))
    assert(m("/x?sid=", "/*?sid="))
    assert(!m("/page/7?id=7", "/*?sid="))
    assert(m("/cal/2026/print", "/cal/*/print"))
    assert(m("/cal/2026/printable", "/cal/*/print")) // prefix after glob
    // needs "/cal/" + run + "/print": after "/cal/" nothing yields "/print"
    assert(!m("/cal/print", "/cal/*/print"))
    assert(m("/cal//print", "/cal/*/print")) // the run may be empty
    // trailing $ anchors exactly at end-of-path
    assert(m("/files/r1.pdf", "/*.pdf$"))
    assert(!m("/files/r1.pdfx", "/*.pdf$"))
    assert(m("/docs/17/open", "/docs/*/open$"))
    assert(!m("/docs/17/opened", "/docs/*/open$"))
    // $ elsewhere is a literal character
    assert(m("/a$b/c", "/a$b"))
    assert(!m("/ab/c", "/a$b"))
    // backtracking: the star must find the LAST viable continuation
    assert(m("/axxbxb", "/a*b$"))
    assert(!m("/axxbxc", "/a*b$"))
  }

  test("gate applies wildcard rules with longest-rule precedence") {
    import spark.implicits._
    val rules = RobotsTxt.parseRules(Seq(("w.com",
      Seq("User-agent: me",
        "Disallow: /*?sid=",
        "Disallow: /*.pdf$",
        "Allow: /docs/*/open$",
        "Disallow: /docs/").mkString("\n"))).toDF("domain", "txt"),
      "domain", "txt")
    val urls = Seq(
      (0L, "https://w.com/docs/9/open"),
      (1L, "https://w.com/docs/9/page"),
      (2L, "https://w.com/p?sid=1"),
      (3L, "https://w.com/r.pdf"),
      (4L, "https://w.com/r.pdfx")).toDF("id", "url")
    val got = RobotsTxt.gate(urls, "url", rules, "me").orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Boolean]("allowed"),
        Option(r.getAs[String]("matched_path")))).toSeq
    assert(got === Seq(
      (0L, true, Some("/docs/*/open$")), // anchored Allow out-lengths /docs/
      (1L, false, Some("/docs/")),
      (2L, false, Some("/*?sid=")),
      (3L, false, Some("/*.pdf$")),
      (4L, true, None)))
  }
}
