package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expr.HtmlOps

/** HTML→text extraction semantics: the pure parser's edges (entities,
  * comments, skip-subtrees, malformed input, neighbor rule) plus the
  * synthetic-page round-trip the `q_text_extract*` oracles invert. */
class TextExtractSpec extends SparkSpec {
  import spark.implicits._

  private def content(html: String): String =
    Option(HtmlOps.contentText(
      org.apache.spark.unsafe.types.UTF8String.fromString(html),
      HtmlOps.DefaultMinLen, HtmlOps.DefaultMaxLinkDensity)).map(_.toString).orNull

  test("synthetic page round-trips: h1 + text + upper(text), boilerplate dropped") {
    val docs = spark.read.parquet(s"${testDataDir()}/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    val pages = docs.withColumn("html",
      TextExtract.syntheticHtml(col("doc_id"), col("text")))
    val got = TextExtract.fromHtml(pages, "doc_id", "html")
      .join(docs, "doc_id")
      .withColumn("expected", concat(
        lit("Corpus document from the synthetic crawl corpus\n"),
        col("text"), lit("\n"), upper(col("text"))))
    assert(got.filter(col("extracted") =!= col("expected")).count() === 0)
  }

  test("synthetic page blocks: tags, labels, and link densities") {
    val df = Seq((7L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
      .withColumn("html", TextExtract.syntheticHtml(col("doc_id"), col("text")))
    val bs = TextExtract.blocks(df, "doc_id", "html").orderBy("idx").collect()
    assert(bs.map(r => (r.getString(2), r.getString(8))).toSeq === Seq(
      ("title", "boilerplate"),      // short, nothing good before it
      ("nav", "boilerplate"),        // link density 1.0
      ("h1", "content"),
      ("p", "content"),
      ("div", "boilerplate"),        // ad links, density 1.0
      ("blockquote", "content"),
      ("footer", "boilerplate")))    // 12/28 linked > 0.33
    val nav = bs(1)
    assert(nav.getInt(4) === 16 && nav.getInt(5) === 16) // all chars linked
    val footer = bs(6)
    assert(footer.getInt(4) === 28 && footer.getInt(5) === 12)
    assert(footer.getString(3) === "Terms Privacy © 2026 Example Corp")
  }

  test("entities decode; unknown entities stay literal") {
    assert(content("<p>fish &amp; chips &lt;tag&gt; it&apos;s &quot;q&quot; a&nbsp;b more words here</p>")
      === "fish & chips <tag> it's \"q\" a b more words here")
    assert(content("<p>&#65;&#x42;C plus some padding words to pass the length floor</p>")
      === "ABC plus some padding words to pass the length floor")
    assert(content("<p>&bogus; &notanentity stays literal with padding words added</p>")
      === "&bogus; &notanentity stays literal with padding words added")
  }

  test("comments, script/style/noscript subtrees, doctype and PIs are dropped") {
    val html = "<!doctype html><p>keep this sentence of sufficient length" +
      "<!-- <p>not this</p> --><script>var x = '<p>nor this</p>';</script>" +
      "<style>p{}</style><noscript><p>hidden</p></noscript> and keep the tail</p>"
    assert(content(html) === "keep this sentence of sufficient length and keep the tail")
  }

  test("malformed input is total: unterminated comment/tag/subtree, bare <") {
    assert(content("<p>a lone bracket 3 < 5 survives inside enough words here</p>")
      === "a lone bracket 3 < 5 survives inside enough words here")
    assert(content("<p>before the cut there are words aplenty<!-- unterminated")
      === "before the cut there are words aplenty")
    assert(content("<p>before the cut there are words aplenty<script>unterminated")
      === "before the cut there are words aplenty")
    // quote-aware attribute scan: the '>' inside class="a>b" must NOT end
    // the tag — mishandling would leak `b">` into a text block
    assert(content("<p>attribute quote handling works for this long paragraph</p>" +
        "<div class=\"a>b\"><a href=\"x\">Buy</a></div>")
      === "attribute quote handling works for this long paragraph")
    assert(content(null) === null)
  }

  test("neighbor rule: a short block inherits the preceding long classification") {
    val afterContent = "<p>this paragraph is long enough to be content clearly</p>" +
      "<p>tiny tail</p>"
    assert(content(afterContent)
      === "this paragraph is long enough to be content clearly\ntiny tail")
    val afterBoiler = "<div><a href=x>all of this block is one link text</a></div>" +
      "<p>tiny tail</p>"
    assert(content(afterBoiler) === "")
    // link-dense SHORT block is boilerplate by density, not rescued by content
    val denseShort = "<p>this paragraph is long enough to be content clearly</p>" +
      "<div><a href=x>tiny</a></div>"
    assert(content(denseShort) === "this paragraph is long enough to be content clearly")
  }

  test("whitespace normalization collapses runs and trims block edges") {
    assert(content("<p>  spaced\t\tout\n\nwords   collapse to single separators  </p>")
      === "spaced out words collapse to single separators")
  }

  test("tableCells: headers, inline strip, entities, two tables, empties") {
    val html = "<html><body><p>prose outside tables never emits</p>" +
      "<table><tr><th>Idx</th><th> Word </th></tr>" +
      "<tr><td>0</td><td><b>alpha</b> &amp; <i>beta</i></td></tr>" +
      "<tr><td></td><td>x &lt;3</td></tr></table>" +
      "<table><tr><td>total</td><td>2</td></tr></table></body></html>"
    assert(HtmlOps.tableCells(html) === Vector(
      (0, 0, 0, true, "Idx"), (0, 0, 1, true, "Word"),
      (0, 1, 0, false, "0"), (0, 1, 1, false, "alpha & beta"),
      (0, 2, 0, false, ""), (0, 2, 1, false, "x <3"),
      (1, 0, 0, false, "total"), (1, 0, 1, false, "2")))
    // nested tables are opaque: neither their cells nor their text leak
    val nested = "<table><tr><td>outer" +
      "<table><tr><td>inner</td></tr></table></td>" +
      "<td>after</td></tr></table>"
    assert(HtmlOps.tableCells(nested) === Vector(
      (0, 0, 0, false, "outer"), (0, 0, 1, false, "after")))
    // TWO-level nesting: the skip is depth-aware, so the middle table's
    // close must not end the skip early — the outer table's trailing
    // cells still belong to the outer table
    val nested2 = "<table><tr><td>outer" +
      "<table><tr><td>mid<table><tr><td>deep</td></tr></table></td>" +
      "<td>mid2</td></tr></table></td>" +
      "<td>after</td></tr><tr><td>last</td></tr></table>"
    assert(HtmlOps.tableCells(nested2) === Vector(
      (0, 0, 0, false, "outer"), (0, 0, 1, false, "after"),
      (0, 1, 0, false, "last")))
    // tag soup: a cell before any <tr> opens row 0; script content drops
    val soup = "<table><td>loose</td><script>var t = '<td>no</td>'</script>" +
      "<tr><td>rowed</td></tr></table>"
    assert(HtmlOps.tableCells(soup) === Vector(
      (0, 0, 0, false, "loose"), (0, 1, 0, false, "rowed")))
    assert(HtmlOps.tableCells(null) === Vector.empty)
    assert(HtmlOps.tableCells("no tables here at all") === Vector.empty)
  }

  test("tableCells: nested-table skip survives decoy close tags") {
    // a commented-out </table> inside the nested table must not close
    // the outer table early (the depth walk skips comments like the
    // main scanner does)
    val commented = "<table><tr><td>outer" +
      "<table><!-- </table> --><tr><td>inner</td></tr></table></td>" +
      "<td>after</td></tr></table>"
    assert(HtmlOps.tableCells(commented) === Vector(
      (0, 0, 0, false, "outer"), (0, 0, 1, false, "after")))
    // a </table> inside a script subtree of the nested table is data,
    // not markup
    val scripted = "<table><tr><td>outer" +
      "<table><script>document.write('</table>')</script>" +
      "<tr><td>inner</td></tr></table></td>" +
      "<td>after</td></tr></table>"
    assert(HtmlOps.tableCells(scripted) === Vector(
      (0, 0, 0, false, "outer"), (0, 0, 1, false, "after")))
    // a </table> inside a QUOTED attribute value of a tag in the nested
    // region is data too — the walk skips attrs quote-aware
    val quoted = "<table><tr><td>outer" +
      "<table><tr><td><span title=\"</table>\">inner</span></td></tr>" +
      "</table></td><td>after</td></tr></table>"
    assert(HtmlOps.tableCells(quoted) === Vector(
      (0, 0, 0, false, "outer"), (0, 0, 1, false, "after")))
  }

  test("links: hrefs, anchor text, nofollow, attr edges, tag soup") {
    val html = "<html><body>" +
      "<a href=\"https://a.com/x?b=2&amp;a=1\">Read <b>more</b></a>" +
      "<a rel=\"ugc nofollow\" href='/out'>Ad &amp; out</a>" +
      "<a href=unquoted>Bare</a>" +
      "<a name=\"anchor-only\">no href, no link</a>" +
      "<a href=\"/p1\">first<a href=\"/p2\">implicit close</a>" +
      "<a href=\"/s\">keep <script>var x = '<a href=y>no</a>'</script>text</a>" +
      "</body></html>"
    assert(HtmlOps.links(html) === Vector(
      ("https://a.com/x?b=2&a=1", "Read more", false),
      ("/out", "Ad & out", true),
      ("unquoted", "Bare", false),
      ("/p1", "first", false),
      ("/p2", "implicit close", false),
      ("/s", "keep text", false)))
    assert(HtmlOps.links(null) === Vector.empty)
    assert(HtmlOps.links("no anchors at all") === Vector.empty)
    // unterminated <a> still emits (tolerant)
    assert(HtmlOps.links("<a href=\"/tail\">dangling")
      === Vector(("/tail", "dangling", false)))
  }

  test("images: figcaption scope, block captions, attr edges") {
    val html = "<html><body>" +
      // figure with caption AFTER the img: figcaption still wins
      "<figure><img src=\"/a.png\" alt=\"A &amp; a\" title=\"tA\">" +
      "<figcaption>Figure <b>one</b> caption</figcaption></figure>" +
      // figure without a figcaption: caption is ""
      "<figure><img src=\"/b.png\"></figure>" +
      // inline image: surrounding-block text, before AND after the tag
      "<p>Before words <img src=\"c.png\" alt=\"inline\"> after words.</p>" +
      // empty block: caption ""
      "<p><img src=\"//cdn.e.com/d.webp\"></p>" +
      // no src: dropped; script img: dropped
      "<p><img alt=\"no src\"></p>" +
      "<script>var s='<img src=\"x.png\">';</script>" +
      "</body></html>"
    assert(HtmlOps.images(html) === Vector(
      ("/a.png", "A & a", "tA", "Figure one caption"),
      ("/b.png", "", "", ""),
      ("c.png", "inline", "", "Before words after words."),
      ("//cdn.e.com/d.webp", "", "", "")))
    assert(HtmlOps.images(null) === Vector.empty)
    assert(HtmlOps.images("no images") === Vector.empty)
    // unterminated figure at EOF still assigns its caption
    assert(HtmlOps.images(
      "<figure><img src=\"/t.png\"><figcaption>tail cap")
      === Vector(("/t.png", "", "", "tail cap")))
    // block tags inside a figcaption read as whitespace — <br> (and
    // <p>) inside figcaptions are routine and must not freeze the
    // caption early
    assert(HtmlOps.images(
      "<figure><img src=\"/b.png\">" +
        "<figcaption>Line one<br>Line two<p>and three</figcaption></figure>")
      === Vector(("/b.png", "", "", "Line one Line two and three")))
  }

  test("interleaved: img boundaries, jusText labels, slots always kept") {
    val html = "<html><body>" +
      "<p>A long enough opening paragraph about corpora and pixels.</p>" +
      "<img src=\"/i1.png\" alt=\"one\">" +
      // fully-linked run: boilerplate, dropped — but the next image stays
      "<p><a href=\"/nav\">navigation menu links only</a></p>" +
      "<img src=\"/i2.png\">" +
      // short run after boilerplate: inherits boilerplate, dropped
      "<p>Fin.</p>" +
      "<p>Another long closing paragraph with plenty of characters.</p>" +
      "</body></html>"
    assert(HtmlOps.interleaved(html, 20, 0.33) === Vector(
      (0, "text", "A long enough opening paragraph about corpora and pixels.", null, null),
      (1, "image", null, "/i1.png", "one"),
      (2, "image", null, "/i2.png", ""),
      (3, "text", "Another long closing paragraph with plenty of characters.", null, null)))
    // an img splits a run mid-block: both halves classify independently
    val split = "<p>First half long enough to stand as content alone" +
      "<img src=\"/m.png\"> tail</p>" +
      "<p>Second paragraph long enough to be content by itself.</p>"
    assert(HtmlOps.interleaved(split, 20, 0.33) === Vector(
      (0, "text", "First half long enough to stand as content alone", null, null),
      (1, "image", null, "/m.png", ""),
      // "tail" is short and follows a content run -> inherits content
      (2, "text", "tail", null, null),
      (3, "text", "Second paragraph long enough to be content by itself.", null, null)))
    assert(HtmlOps.interleaved(null, 20, 0.33) === Vector.empty)
  }

  test("slidingChunks: windows, overlap, tail, redundancy skip, empties") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map("w" + _).mkString(" ")), // 10 tokens
      (2L, "only three tokens"),                   // shorter than a window
      (3L, "   "),                                 // whitespace-only: no chunks
      (4L, (1 to 13).map("t" + _).mkString(" "))) // 13: starts 0,4,8,12 -> 12 redundant
      .toDF("doc_id", "text")
    val got = TextExtract.slidingChunks(docs, "doc_id", "text",
        chunkSize = 8, overlap = 4)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "start_tok", "n_tok", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got.toSeq === Seq(
      (1L, 0L, 0L, 8L, (1 to 8).map("w" + _).mkString(" ")),
      (1L, 1L, 4L, 6L, (5 to 10).map("w" + _).mkString(" ")),
      (2L, 0L, 0L, 3L, "only three tokens"),
      (4L, 0L, 0L, 8L, (1 to 8).map("t" + _).mkString(" ")),
      (4L, 1L, 4L, 8L, (5 to 12).map("t" + _).mkString(" ")),
      (4L, 2L, 8L, 5L, (9 to 13).map("t" + _).mkString(" "))))
  }

  test("markdown: headings, lists, links, inline marks, pre, images") {
    val html = "<html><body>" +
      "<h2>Title &amp; more</h2>" +
      "<p>Intro with <b>bold</b>, <i>italic</i>, <code>x+1</code> and " +
      "<a href=\"/l?a=1&amp;b=2\">a link</a>.</p>" +
      "<ul><li>alpha</li><li><em>beta</em>" +
      "<ol><li>one</li><li>two</li></ol></li></ul>" +
      "<blockquote>quoted words</blockquote>" +
      "<pre>raw  spaced\n  indented &lt;kept&gt;</pre>" +
      "<p><img src=\"/i.png\" alt=\"pic\"></p>" +
      "<script>var x = '<h1>no</h1>';</script>" +
      "</body></html>"
    assert(HtmlOps.markdown(html) ===
      "## Title & more\n\n" +
        "Intro with **bold**, *italic*, `x+1` and [a link](/l?a=1&b=2).\n\n" +
        "- alpha\n\n" +
        "- *beta*\n\n" +
        "  1. one\n\n" +
        "  2. two\n\n" +
        "> quoted words\n\n" +
        "```\nraw  spaced\n  indented <kept>\n```\n\n" +
        "![pic](/i.png)")
    // tolerance: anchor without href passes text; unclosed <b> leaves
    // its opening marker; null in, null out
    assert(HtmlOps.markdown("<p><a name=x>plain</a> <b>dangling</p>")
      === "plain **dangling")
    assert(HtmlOps.markdown(null) === null)
    // the card-link pattern: an <a> whose content is a block must still
    // emit ONE well-formed [text](url), not stranded fragments
    assert(HtmlOps.markdown(
      "<a href=\"/x\"><div>Title</div></a><p>after</p>")
      === "[Title](/x)\n\nafter")
    // link with text split by a block boundary closes at the boundary
    assert(HtmlOps.markdown("<p><a href=\"/y\">lead</p><p>rest</a></p>")
      === "[lead](/y)\n\nrest")
  }

  test("head: base/canonical first-wins, robots tokens, body ignored") {
    val h = "<html><head><base href=\"/a/\"><base href=\"/b/\">" +
      "<link rel=\"stylesheet canonical\" href=\"/c1\">" +
      "<link rel=\"canonical\" href=\"/c2\">" +
      "<meta name=\"ROBOTS\" content=\"NOINDEX\">" +
      "</head><body><meta name=\"robots\" content=\"nofollow\">" +
      "<base href=\"/body-base/\"></body></html>"
    assert(HtmlOps.head(h) === (("/a/", "/c1", true, false)))
    // none = noindex + nofollow; no head directives at all
    assert(HtmlOps.head("<head><meta name=robots content=none></head>")
      === ((null, null, true, true)))
    assert(HtmlOps.head("<p>plain</p>") === ((null, null, false, false)))
    assert(HtmlOps.head(null) === ((null, null, false, false)))
    // comma/space token split; unrelated meta ignored
    assert(HtmlOps.head("<head><meta name=\"robots\" " +
      "content=\"index, nofollow\"><meta name=\"viewport\" " +
      "content=\"noindex\"></head>")
      === ((null, null, false, true)))
  }

  test("alternates: hreflang pairs in order, rel tokens, body ignored") {
    val h = "<html><head>" +
      "<link rel=\"alternate\" hreflang=\"EN\" href=\"/en\">" +
      "<link rel=\"stylesheet alternate\" hreflang=\"de\" href=\"/de\">" +
      "<link rel=\"alternate\" href=\"/no-lang\">" + // dropped: no hreflang
      "<link rel=\"alternate\" hreflang=\"x-default\" href=\"/\">" +
      "</head><body>" +
      "<link rel=\"alternate\" hreflang=\"fr\" href=\"/fr\"></body></html>"
    assert(HtmlOps.alternates(h) === Vector(
      ("en", "/en"), ("de", "/de"), ("x-default", "/")))
    assert(HtmlOps.alternates(null) === Vector.empty)
    assert(HtmlOps.alternates("<p>none</p>") === Vector.empty)
  }

  test("og: property pairs in order, prefix strip, body/name ignored") {
    val h = "<html><head>" +
      "<meta property=\"og:title\" content=\"A &amp; B\">" +
      "<meta property=\"OG:Type\" content=\"article\">" +
      "<meta property=\"og:empty\" content=\"\">" + // dropped
      "<meta name=\"og:name-not-property\" content=\"x\">" + // dropped
      "<meta property=\"twitter:card\" content=\"y\">" + // not og
      "</head><body>" +
      "<meta property=\"og:late\" content=\"z\"></body></html>"
    assert(HtmlOps.og(h) === Vector(
      ("title", "A & B"), ("type", "article")))
    assert(HtmlOps.og(null) === Vector.empty)
    assert(HtmlOps.og("<p>none</p>") === Vector.empty)
  }

  test("html_table_cells expression explodes to typed cell rows") {
    val df = Seq((7L,
      "<table><tr><th>H</th></tr><tr><td>v&#33;</td></tr></table>"))
      .toDF("id", "html")
    val got = df.select(col("id"),
        explode(graft.expr.HtmlExpressions.html_table_cells(col("html")))
          .as("cell"))
      .select(col("id"), col("cell.t"), col("cell.r"), col("cell.c"),
        col("cell.header"), col("cell.cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getBoolean(4), r.getString(5)))
    assert(got.toSeq === Seq(
      (7L, 0, 0, 0, true, "H"), (7L, 0, 1, 0, false, "v!")))
  }
}
