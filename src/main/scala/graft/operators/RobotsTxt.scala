package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt crawl-politeness gate (RFC 9309) — the step between URL
  * curation and fetching in a crawl pipeline: before a URL may even be
  * read, the origin's robots.txt group for our user agent decides
  * allow/disallow by LONGEST-path-match. Beyond-reference extension,
  * composing with [[WebCuration]] (blocklists/caps) and the WARC front.
  *
  * Everything is declarative Spark — the parser is split + posexplode +
  * one running-count window (a group is one or more User-agent lines
  * followed by rules, so group id = running UA count), the gate is a
  * broadcast join of the bounded per-domain rule table against the URL
  * stream plus one longest-match window. No UDFs; the rule table for a
  * whole crawl is ~rules×domains — broadcast-sized even at 100 TB of
  * documents (robots.txt is per-ORIGIN metadata, not per-document).
  *
  * Match semantics implemented (the classic REP subset of RFC 9309):
  * case-insensitive directive names, `#` comments, path-PREFIX matching
  * against path+query, longest match wins, Allow wins length ties, no
  * match ⇒ allowed, agent group selection = exact agent name if any
  * group has it, else the `*` group.
  */
object RobotsTxt {

  /** Parse robots.txt documents `(domainCol, txtCol)` into the typed rule
    * table: (domain, agent, line_no, rtype ∈ allow|disallow|crawl-delay,
    * value). Group structure per RFC 9309: consecutive `User-agent`
    * lines open a group; every following rule line belongs to all of
    * them — represented by carrying ALL the group's agents forward and
    * exploding rules per agent. */
  def parseRules(df: DataFrame, domainCol: String, txtCol: String): DataFrame = {
    val lines = df.select(col(domainCol).as("domain"),
        posexplode(split(col(txtCol), "\n")).as(Seq("line_no", "raw")))
      // strip comments and whitespace; directive name case-insensitive
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .filter(col("line") =!= "")
      .withColumn("key", lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))))
      .withColumn("value", trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)))
      .filter(col("key").isin("user-agent", "allow", "disallow", "crawl-delay"))
    // group id: a UA line that FOLLOWS a rule line starts a new group;
    // consecutive UA lines share one. Running count of group-opening UA
    // lines gives the id.
    val byLine = Window.partitionBy(col("domain")).orderBy(col("line_no"))
    val grouped = lines
      .withColumn("is_ua", (col("key") === "user-agent").cast("int"))
      .withColumn("prev_ua", lag(col("is_ua"), 1, 0).over(byLine))
      .withColumn("opens", (col("is_ua") === 1 && col("prev_ua") === 0).cast("int"))
      .withColumn("gid", sum(col("opens")).over(
        byLine.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agents = grouped.filter(col("is_ua") === 1)
      .select(col("domain"), col("gid"), lower(col("value")).as("agent"))
    grouped.filter(col("is_ua") === 0 && col("gid") > 0)
      .select(col("domain"), col("gid"), col("line_no").cast("long").as("line_no"),
        col("key").as("rtype"), col("value"))
      .join(agents, Seq("domain", "gid"))
      .select(col("domain"), col("agent"), col("line_no"), col("rtype"),
        col("value"))
  }

  /** Gate a URL frame through a parsed rule table for `userAgent`:
    * emits the input plus (domain, path, allowed, matched_path,
    * matched_allow). Path = everything from the first `/` after the
    * authority, INCLUDING query (the Googlebot convention). Group choice
    * per domain: the exact agent's group when present, else `*`; the
    * winning rule is the longest matching prefix, Allow beating Disallow
    * on equal length; no match (or no rules) ⇒ allowed. `rules` is
    * broadcast — per-origin metadata stays origin-sized. */
  def gate(urls: DataFrame, urlCol: String, rules: DataFrame,
           userAgent: String): DataFrame = {
    val ua = userAgent.toLowerCase
    val dirRules = rules.filter(col("rtype").isin("allow", "disallow") &&
      col("value") =!= "")
    // per domain: does an exact-agent group exist?
    val hasExact = dirRules.groupBy(col("domain"))
      .agg(max((col("agent") === ua).cast("int")).as("__has_ua"))
    val chosen = dirRules.join(hasExact, "domain")
      .filter((col("__has_ua") === 1 && col("agent") === ua) ||
        (col("__has_ua") === 0 && col("agent") === "*"))
      .select(col("domain"), col("rtype"), col("value").as("rule_path"))
    val withPath = urls
      .withColumn("domain", WebCuration.domainOf(col(urlCol)))
      .withColumn("path", regexp_extract(col(urlCol),
        "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?[^/]*(/.*)?$", 1))
    val joined = withPath.join(broadcast(chosen), Seq("domain"), "left")
      .withColumn("__match",
        col("rule_path").isNotNull && col("path").startsWith(col("rule_path")))
    // longest matching prefix wins, Allow beats Disallow on a length tie:
    // ONE combining aggregate — max over the lexicographic struct
    // (len, is_allow, path, type); no-match rows aggregate to NULL =
    // allowed. (Same-length same-type ties fall to the path ordering —
    // deterministic.) The groupBy keys are the caller's row identity, so
    // `urls` rows must be distinct.
    val winner = max(when(col("__match"),
      struct(length(col("rule_path")).as("l"),
        (col("rtype") === "allow").cast("int").as("a"),
        col("rule_path").as("p"), col("rtype").as("t")))).as("__win")
    joined.groupBy(withPath.columns.map(col): _*)
      .agg(winner)
      .select(withPath.columns.map(col) ++ Seq(
        coalesce(col("__win.t") =!= "disallow", lit(true)).as("allowed"),
        col("__win.p").as("matched_path"),
        when(col("__win").isNotNull, col("__win.t") === "allow")
          .as("matched_allow")): _*)
  }

  /** Deterministic synthetic robots.txt for the fixture domains (the
    * synthetic-HTML playbook): a `*` group with constant rules, then a
    * crawler-specific group whose Disallow slot k varies per domain —
    * exercising comments, case-insensitive keys, crawl-delay lines,
    * group override, and the longest-match/Allow-tie ladder. `k` must be
    * SQL-reconstructable from the domain. */
  def syntheticRobots(domain: Column, k: Column): Column =
    concat(
      lit("# robots.txt for "), domain,
      lit("\nUser-Agent: *\nDisallow: /private/\nDisallow: /docs/3/\n" +
        "Allow: /docs/3/open/\ncrawl-delay: 2\n\n" +
        "User-agent: graftbot\nAllow: /docs/\nDisallow: /docs/"),
      k.cast("string"),
      lit("/\nDisallow: /tmp/\n"))
}
