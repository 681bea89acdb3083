package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{EventTime, GraftFunctions}
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.streaming.StreamingIngest

/** Driver contract — one `queries` entry per operator of SURVEY.md §2 plus
  * the training-data-pipeline extensions, each with a DuckDB oracle where the
  * semantics are ANSI-SQL-expressible (oracle-less entries get the driver's
  * rows-only check and are verified by ScalaTest instead).
  *
  * Determinism rules (SURVEY.md §5.4): every query ends in a total-order
  * sort; aggregates over doubles go through exact decimal arithmetic and are
  * surfaced as doubles; "today" is the fixed literal 1998-12-01; int-typed
  * derived values are cast to long to match DuckDB's BIGINT.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Regression feature frame for the LinearModel queries: predict text
    * LENGTH from token/stopword counts (profile-derived, ONE fused scan)
    * — the fitted weights are interpretable (≈ mean word length, and the
    * chars-shorter-than-average stopword discount). n_punct and n_bpeish
    * are deliberately absent: this corpus has no punctuation, so the
    * former is identically zero (singular column) and the latter equals
    * n_tokens (collinear). Null text filtered on both sides — a null
    * feature row would silently drop out of the moment sums while still
    * counting in n. */
  private def regFeatures(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .withColumn("__p", TextAnalysis.profile(col("text")))
      .select(
        coalesce(col("__p.n_tokens"), lit(0)).cast("double").as("f_tokens"),
        col("__p.n_stopwords").cast("double").as("f_stop"),
        col("__p.n_chars").cast("double").as("y_chars"))

  /** Suffix for scratch paths/tables written by demonstration queries:
    * keyed by the dataset dir (cross-SF runs never interleave) and the
    * process id (concurrent harness/test JVMs never clobber each other
    * mid-read). Stable within one process so bench re-runs reuse a name. */
  private def runTag(dir: String): String = {
    val h = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    s"${h}_p${ProcessHandle.current().pid()}"
  }

  /** Reclaim scratch dirs left by DEAD processes: [[runTag]] names embed
    * `_p<pid>` (possibly followed by a stage suffix like `__upserting`),
    * and a dir whose pid no longer exists is unreachable garbage (its
    * owning JVM — and any in-memory catalog entry — died with it). Live
    * pids — including ours — are never touched, with one precise escape
    * hatch for OS pid recycling: a real owner's process START always
    * precedes every write it makes to its dir, so a "live" pid whose
    * process started AFTER the dir's mtime (plus a minute of clock slack)
    * cannot be the owner and the dir is orphaned. Age alone is NOT a
    * reclaim signal for pid-tagged dirs — write-once-read-many scratch
    * (bucketed tables reused across bench re-runs) goes hours without an
    * mtime update while its owner is still reading it. `legacy` names
    * (the pre-suffix fixed names, which carry no pid to test) are
    * reclaimed only past `legacyGraceMillis`, so a still-running
    * pre-suffix JVM sharing the tmpdir is not raced. Everything is
    * per-entry best-effort — an unparseable pid in the shared tmpdir, a
    * racing sweep, or a permission blip must not fail the query. */
  private[graft] def sweepDeadScratch(parent: java.io.File, prefixes: Seq[String],
                                      legacy: Seq[String] = Nil,
                                      legacyGraceMillis: Long = 6L * 3600 * 1000): Unit = {
    val mine = ProcessHandle.current().pid()
    // NOT end-anchored: crash leftovers like `..._p123__upserting` must
    // still resolve to their owning pid to be reclaimable
    val pidRe = "_p(\\d+)".r
    val now = System.currentTimeMillis()
    Option(parent.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
      scala.util.Try {
        if (legacy.contains(f.getName)) {
          val m = f.lastModified() // 0 = unknown (IO error): never reclaim
          if (m > 0 && now - m > legacyGraceMillis)
            org.apache.commons.io.FileUtils.deleteDirectory(f)
        } else if (prefixes.exists(f.getName.startsWith)) {
          pidRe.findFirstMatchIn(f.getName).map(_.group(1).toLong).foreach { pid =>
            val handle = ProcessHandle.of(pid)
            val dead = !handle.isPresent
            val recycled = !dead && {
              val start = handle.get().info().startInstant()
              val m = f.lastModified()
              start.isPresent && m > 0 &&
                start.get().toEpochMilli > m + 60000L
            }
            if (pid != mine && (dead || recycled))
              org.apache.commons.io.FileUtils.deleteDirectory(f)
          }
        }
      }
    }
  }

  /** The session's warehouse directory as a local file, when it is one. */
  private def warehouseDir(s: SparkSession): Option[java.io.File] =
    scala.util.Try {
      val raw = s.conf.get("spark.sql.warehouse.dir")
      if (raw.startsWith("file:")) new java.io.File(new java.net.URI(raw))
      else new java.io.File(raw)
    }.toOption.filter(_.isDirectory)

  private val asOf: Column = lit("1998-12-01").cast("date")

  /** Write-once-per-process synthetic WARC archives derived from the
    * documents table: 4 buckets keyed by doc_id % 4, bucket 0 gzipped
    * with per-record members, each file led by a warcinfo record, every
    * response carrying the synthetic crawl page ([[operators.TextExtract
    * .syntheticHtml]]) behind a real HTTP/1.1 200 message. Deterministic,
    * so bench re-runs reuse the archives (the `_SUCCESS` marker is
    * written only after a complete build; a crashed partial write has no
    * marker and is rebuilt). */
  private val warcFixtureLock = new Object
  private def warcFixtureDir(s: SparkSession, dir: String): String =
    warcFixtureLock.synchronized {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      sweepDeadScratch(tmp, Seq("graft_warc_"))
      val out = new java.io.File(tmp, s"graft_warc_${runTag(dir)}")
      val marker = new java.io.File(out, "_SUCCESS")
      if (!marker.exists()) {
        val docs = t(s, dir, "documents").select(col("doc_id"),
          concat(lit("https://www."), col("source"), lit(".example.com/docs/"),
            col("doc_id").cast("string")).as("uri"),
          operators.TextExtract.syntheticHtml(col("doc_id"), col("text"))
            .as("body"))
        ingest.WarcIngest.writeSyntheticWarc(s, docs, "doc_id", "uri", "body",
          out.getAbsolutePath, nFiles = 4)
        marker.createNewFile()
      }
      out.getAbsolutePath
    }

  /** Write-once-per-process IMAGE archives: the same WARC framing with
    * `image/png` responses whose bodies are the synthetic pixel PNGs
    * ([[operators.Multimodal.syntheticPngPixelPayload]]) — crawls are
    * mostly binary, and this fixture is what pins the reader's
    * byte-exact `body_bytes` path. */
  private def warcImageFixtureDir(s: SparkSession, dir: String): String =
    warcFixtureLock.synchronized {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      sweepDeadScratch(tmp, Seq("graft_warcimg_"))
      val out = new java.io.File(tmp, s"graft_warcimg_${runTag(dir)}")
      val marker = new java.io.File(out, "_SUCCESS")
      if (!marker.exists()) {
        val png = udf((id: Long) => Multimodal.syntheticPngPixelPayload(id))
        val docs = t(s, dir, "documents").select(col("doc_id"),
          concat(lit("https://img."), col("source"),
            lit(".example.com/png/"), col("doc_id").cast("string"),
            lit(".png")).as("uri"),
          png(col("doc_id")).as("body"))
        ingest.WarcIngest.writeSyntheticWarc(s, docs, "doc_id", "uri", "body",
          out.getAbsolutePath, nFiles = 4, contentType = "image/png")
        marker.createNewFile()
      }
      out.getAbsolutePath
    }

  /** Write-once-per-process PAGE archives whose HTML references the
    * [[warcImageFixtureDir]] pixel PNGs — the image-text JOIN fixture:
    * each page carries one `<figure>` img pointing at its document's
    * synthetic PNG (absolute src on the img. host) plus alt text and a
    * figcaption that names the image's true dimensions, so pair
    * assembly must route extraction, resolution, and the
    * archive-decoded pixels into one frame and the caption/pixel
    * agreement is itself oracle-checkable. */
  private def warcImgPageFixtureDir(s: SparkSession, dir: String): String =
    warcFixtureLock.synchronized {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      sweepDeadScratch(tmp, Seq("graft_warcimgpg_"))
      val out = new java.io.File(tmp, s"graft_warcimgpg_${runTag(dir)}")
      val marker = new java.io.File(out, "_SUCCESS")
      if (!marker.exists()) {
        val docs = t(s, dir, "documents").select(col("doc_id"),
          concat(lit("https://www."), col("source"),
            lit(".example.com/docs/"), col("doc_id").cast("string"))
            .as("uri"),
          concat(
            lit("<html><body><figure><img src=\"https://img."),
            col("source"), lit(".example.com/png/"),
            col("doc_id").cast("string"),
            lit(".png\" alt=\"png "), pmod(col("doc_id"), lit(13)),
            lit("\"><figcaption>Pixel grid "),
            (lit(16) + pmod(col("doc_id"), lit(17))).cast("string"),
            lit(" by "),
            (lit(16) + pmod(col("doc_id") * 3, lit(13))).cast("string"),
            lit("</figcaption></figure></body></html>")).as("body"))
        ingest.WarcIngest.writeSyntheticWarc(s, docs, "doc_id", "uri",
          "body", out.getAbsolutePath, nFiles = 4)
        marker.createNewFile()
      }
      out.getAbsolutePath
    }

  /** The legacy-charset rotation for the charset-sniffing WARC fixture:
    * (java charset name, non-ASCII marker appended to the page text).
    * Every marker is encodable in its charset and survives the charset's
    * encode→decode round-trip bit-exactly; the windows-1252 euro (0x80)
    * and em-dash (0x97) distinguish cp1252 from ISO-8859-1. Shared by
    * the fixture UDF and the oracle's CASE literal (\u escapes because
    * the container's platform charset is US-ASCII). */
  private val CharsetModes: IndexedSeq[(String, String)] = IndexedSeq(
    ("UTF-8", "unicode üñî ✓ probe"),
    ("ISO-8859-1", "café à la carte ±°"),
    ("windows-1252", "€uro café — quote"),
    ("GB2312", "中文编码测试"),
    ("Shift_JIS", "日本語テキスト"),
    ("UTF-16", "Ωmega ±π bom"))

  /** Write-once-per-process LEGACY-CHARSET archives: each document's
    * page re-encoded under the doc_id % 6 rotation and declared three
    * different ways — Content-Type parameter (modes 1/3), `<meta>` in
    * the head (modes 0/2/4: charset attr and http-equiv both), or a
    * UTF-16 BOM (mode 5) — so every branch of
    * [[ingest.WarcIngest.sniffCharset]]'s precedence ladder carries
    * fixture rows. Pages are simple head+h1+p documents (no uppercase
    * twin: non-ASCII case-mapping is locale-lore neither engine should
    * be oracled on). */
  private def warcCharsetFixtureDir(s: SparkSession, dir: String): String =
    warcFixtureLock.synchronized {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      sweepDeadScratch(tmp, Seq("graft_warccs_"))
      val out = new java.io.File(tmp, s"graft_warccs_${runTag(dir)}")
      val marker = new java.io.File(out, "_SUCCESS")
      if (!marker.exists()) {
        val modes = CharsetModes
        val pageBytes = udf { (id: Long, text: String) =>
          val mode = (id % 6).toInt
          val (cs, mk) = modes(mode)
          val meta = mode match {
            case 0 => "<meta charset=\"utf-8\">\n"
            case 2 => "<meta http-equiv=\"Content-Type\" " +
              "content=\"text/html; charset=windows-1252\">\n"
            case 4 => "<meta charset=\"shift_jis\">\n"
            case _ => ""
          }
          val esc = text.replace("&", "&amp;")
            .replace("<", "&lt;").replace(">", "&gt;")
          val page = "<!doctype html>\n<html>\n<head>\n" + meta +
            "<title>Doc " + id + "</title>\n</head>\n<body>\n" +
            "<h1>Charset probe document about encodings</h1>\n<p>" +
            esc + " " + mk + "</p>\n</body>\n</html>\n"
          page.getBytes(java.nio.charset.Charset.forName(cs))
        }
        val ctOf = udf { (id: Long) =>
          (id % 6).toInt match {
            case 1 => "text/html; charset=iso-8859-1"
            case 3 => "text/html; charset=gb2312"
            case 5 => "text/html; charset=utf-16"
            case _ => "text/html"
          }
        }
        val docs = t(s, dir, "documents").select(col("doc_id"),
          concat(lit("https://cs."), col("source"), lit(".example.com/p/"),
            col("doc_id").cast("string")).as("uri"),
          pageBytes(col("doc_id"), col("text")).as("body"),
          ctOf(col("doc_id")).as("ct"))
        ingest.WarcIngest.writeResponsesWarc(s, docs, "doc_id", "uri", "body",
          "ct", out.getAbsolutePath, nFiles = 4)
        marker.createNewFile()
      }
      out.getAbsolutePath
    }

  /** Write-once-per-process WIRE-ENCODING archives: each document's page
    * framed under the doc_id % 5 rotation of HTTP transfer/content
    * codings a Heritrix-style raw capture preserves — identity,
    * chunked (16-byte chunks), gzip, gzip-then-chunked, zlib deflate.
    * The reader must strip the framing before the body reaches the
    * charset/extraction stages; the oracle recomputes the raw payload
    * octets for the SQL-derivable modes (identity head arithmetic and
    * the exact chunk-framing formula). */
  private def warcEncodingsFixtureDir(s: SparkSession, dir: String): String =
    warcFixtureLock.synchronized {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      sweepDeadScratch(tmp, Seq("graft_warcenc_"))
      val out = new java.io.File(tmp, s"graft_warcenc_${runTag(dir)}")
      val marker = new java.io.File(out, "_SUCCESS")
      if (!marker.exists()) {
        val payload = udf { (id: Long, text: String) =>
          val ascii = java.nio.charset.StandardCharsets.UTF_8
          val esc = text.replace("&", "&amp;")
            .replace("<", "&lt;").replace(">", "&gt;")
          val page = ("<html>\n<head>\n<title>E" + id + "</title>\n</head>\n" +
            "<body>\n<h1>Encoding probe document headline</h1>\n<p>" + esc +
            "</p>\n</body>\n</html>\n").getBytes(ascii)
          def gz(b: Array[Byte]) = {
            val bos = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
            val g = new java.util.zip.GZIPOutputStream(bos)
            try { g.write(b); g.finish() } finally g.close()
            bos.toByteArray
          }
          def defl(b: Array[Byte]) = {
            val d = new java.util.zip.Deflater()
            d.setInput(b); d.finish()
            val bos = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
            val buf = new Array[Byte](4096)
            while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
            d.end()
            bos.toByteArray
          }
          def chunk(b: Array[Byte]) = {
            val bos = new java.io.ByteArrayOutputStream(b.length + b.length / 4 + 16)
            var i = 0
            while (i < b.length) {
              val k = math.min(16, b.length - i)
              bos.write((java.lang.Long.toHexString(k.toLong) + "\r\n").getBytes(ascii))
              bos.write(b, i, k)
              bos.write("\r\n".getBytes(ascii))
              i += k
            }
            bos.write("0\r\n\r\n".getBytes(ascii))
            bos.toByteArray
          }
          val (codingHeaders, body) = (id % 5).toInt match {
            case 0 => (s"Content-Length: ${page.length}\r\n", page)
            case 1 => ("Transfer-Encoding: chunked\r\n", chunk(page))
            case 2 =>
              val g = gz(page)
              (s"Content-Encoding: gzip\r\nContent-Length: ${g.length}\r\n", g)
            case 3 =>
              ("Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n",
                chunk(gz(page)))
            case _ =>
              val d = defl(page)
              (s"Content-Encoding: deflate\r\nContent-Length: ${d.length}\r\n", d)
          }
          val head = ("HTTP/1.1 200 OK\r\n" +
            "Content-Type: text/html; charset=utf-8\r\n" +
            codingHeaders + "\r\n").getBytes(ascii)
          head ++ body
        }
        val docs = t(s, dir, "documents").select(col("doc_id"),
          concat(lit("https://enc."), col("source"), lit(".example.com/p/"),
            col("doc_id").cast("string")).as("uri"),
          payload(col("doc_id"), col("text")).as("payload"))
        ingest.WarcIngest.writeHttpResponsesWarc(s, docs, "doc_id", "uri",
          "payload", out.getAbsolutePath, nFiles = 4)
        marker.createNewFile()
      }
      out.getAbsolutePath
    }

  /** Write-once-per-process PDF archives: application/pdf responses
    * whose bodies are the synthetic-invertible PDFs
    * ([[graft.expr.PdfOps.syntheticPdf]]; odd doc_ids FlateDecode-
    * compressed) — the second text modality decoded straight out of the
    * crawl archive, like the PNG fixture pins the binary path. */
  private def warcPdfFixtureDir(s: SparkSession, dir: String): String =
    warcFixtureLock.synchronized {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      sweepDeadScratch(tmp, Seq("graft_warcpdf_"))
      val out = new java.io.File(tmp, s"graft_warcpdf_${runTag(dir)}")
      val marker = new java.io.File(out, "_SUCCESS")
      if (!marker.exists()) {
        val pdf = udf { (id: Long, text: String) =>
          graft.expr.PdfOps.syntheticPdf(id, text, flate = id % 2 == 1)
        }
        val docs = t(s, dir, "documents").select(col("doc_id"),
          concat(lit("https://pdf."), col("source"), lit(".example.com/d/"),
            col("doc_id").cast("string"), lit(".pdf")).as("uri"),
          pdf(col("doc_id"), col("text")).as("body"),
          lit("application/pdf").as("ct"))
        ingest.WarcIngest.writeResponsesWarc(s, docs, "doc_id", "uri", "body",
          "ct", out.getAbsolutePath, nFiles = 4)
        marker.createNewFile()
      }
      out.getAbsolutePath
    }

  /** PDF-extraction oracle, shared verbatim by the direct decode
    * (q_pdf_extract) and the decode-out-of-the-WARC chain (q_warc_pdf):
    * the synthetic page lays `text` out 8 words per line, so extraction
    * must return exactly that regrouping — rebuilt here from the words
    * alone (uncompressed and FlateDecode streams must land identically,
    * and the TJ kerning split must be invisible). */
  private val pdfExtractOracleSql: String =
    """WITH w AS (
      |  SELECT doc_id, i - 1 AS wi, lst[i] AS w
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text, ' '), x -> x <> '') AS lst
      |        FROM documents),
      |       LATERAL (SELECT unnest(range(1, len(lst) + 1)) AS i) r),
      |lines AS (
      |  SELECT doc_id, wi // 8 AS g, string_agg(w, ' ' ORDER BY wi) AS line
      |  FROM w GROUP BY doc_id, wi // 8)
      |SELECT doc_id, string_agg(line, chr(10) ORDER BY g) AS extracted
      |FROM lines GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Crawl-trap ledger oracle, shared verbatim by the exact
    * (q_crawl_traps), sketch (q_crawl_traps_sketch — KMV k=4096 exact
    * regime), and streaming (q_stream_traps) forms: the three fixture
    * shapes collapse to three templates per source by construction, so
    * the ledger rebuilds from per-source counts alone. */
  private val crawlTrapsOracleSql: String =
    """WITH per AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(DISTINCT text) AS BIGINT) AS nt,
      |    CAST(count(DISTINCT doc_id % 40) AS BIGINT) AS np
      |  FROM documents GROUP BY source),
      |t AS (
      |  SELECT 'https://www.' || source || '.example.com/article/#-#'
      |      AS template, n AS n_urls, nt AS n_content FROM per
      |  UNION ALL
      |  SELECT 'https://www.' || source || '.example.com/cal/#/#/#?sid',
      |    n, 1 FROM per
      |  UNION ALL
      |  SELECT 'https://www.' || source || '.example.com/list?page&ref',
      |    n, np FROM per)
      |SELECT template, n_urls, n_content,
      |  CAST(n_content AS DOUBLE) / n_urls AS diversity,
      |  (n_urls >= 10 AND CAST(n_content AS DOUBLE) / n_urls <= 0.2)
      |    AS is_trap
      |FROM t ORDER BY template""".stripMargin

  /** html-links oracle, shared verbatim by the batch extraction
    * and its streaming twin (per-row purity => stream = batch). */
  private val htmlLinksOracleSql: String =
        """WITH u AS (
      |  SELECT doc_id, source,
      |    'https://www.' || source || '.example.com' AS host,
      |    CAST(doc_id % 25 AS VARCHAR) AS slot,
      |    CAST(doc_id AS VARCHAR) AS id,
      |    CAST(doc_id % 7 AS VARCHAR) AS m7,
      |    CAST(doc_id % 5 AS VARCHAR) AS m5,
      |    CAST(doc_id % 4 AS VARCHAR) AS m4,
      |    CAST(doc_id % 3 AS VARCHAR) AS m3,
      |    CAST(doc_id % 6 AS VARCHAR) AS m6,
      |    CAST(doc_id % 2 AS VARCHAR) AS m2
      |  FROM documents),
      |l AS (
      |  SELECT doc_id, 0 AS idx, host || '/article/' || id AS href,
      |    host || '/article/' || id AS resolved,
      |    'Read more' AS anchor, FALSE AS nofollow FROM u
      |  UNION ALL SELECT doc_id, 1, 'sub/page-' || m7,
      |    host || '/docs/' || slot || '/sub/page-' || m7, 'Sub page',
      |    FALSE FROM u
      |  UNION ALL SELECT doc_id, 2, '../up-' || m5,
      |    host || '/docs/up-' || m5, 'Up one', FALSE FROM u
      |  UNION ALL SELECT doc_id, 3, '/top-' || m3, host || '/top-' || m3,
      |    'Top', FALSE FROM u
      |  UNION ALL SELECT doc_id, 4,
      |    '//cdn.' || source || '.example.com/lib-' || m4,
      |    'https://cdn.' || source || '.example.com/lib-' || m4, 'CDN',
      |    FALSE FROM u
      |  UNION ALL SELECT doc_id, 5, '?page=' || m6,
      |    host || '/docs/' || slot || '/?page=' || m6, 'Next', FALSE FROM u
      |  UNION ALL SELECT doc_id, 6, '#sec',
      |    host || '/docs/' || slot || '/', 'Same page', FALSE FROM u
      |  UNION ALL SELECT doc_id, 7,
      |    'mailto:info@' || source || '.example.com',
      |    'mailto:info@' || source || '.example.com', 'Mail', FALSE FROM u
      |  UNION ALL SELECT doc_id, 8, '/out-' || m2, host || '/out-' || m2,
      |    'Ad & out', TRUE FROM u)
      |SELECT doc_id, CAST(idx AS BIGINT) AS idx, href, resolved, anchor,
      |  nofollow
      |FROM l ORDER BY doc_id, idx""".stripMargin

  /** image-text-pairs oracle, shared verbatim by the batch extraction
    * (q_image_text_pairs) and its streaming twin: the three fixture
    * images rebuilt per document, with the figure src routed through
    * the /media/ base on every third document. The trim() mirrors the
    * scanner's whitespace normalization when a document's first-3-words
    * slice comes back empty. */
  private val htmlImagePairsOracleSql: String =
        """WITH u AS (
      |  SELECT doc_id, source,
      |    'https://www.' || source || '.example.com' AS host,
      |    CAST(doc_id % 25 AS VARCHAR) AS slot,
      |    CAST(doc_id AS VARCHAR) AS id,
      |    array_to_string(list_slice(
      |      list_filter(string_split(text, ' '), x -> x <> ''), 1, 3), ' ')
      |      AS w3
      |  FROM documents),
      |l AS (
      |  SELECT doc_id, 0 AS idx, 'img/' || id || '.png' AS src,
      |    CASE WHEN doc_id % 3 = 0
      |      THEN host || '/media/img/' || id || '.png'
      |      ELSE host || '/docs/' || slot || '/img/' || id || '.png'
      |      END AS resolved,
      |    'fig-' || CAST(doc_id % 13 AS VARCHAR) AS alt,
      |    't' || CAST(doc_id % 7 AS VARCHAR) AS title,
      |    trim('Figure ' || slot || ': ' || w3) AS caption
      |  FROM u
      |  UNION ALL SELECT doc_id, 1,
      |    '/abs/' || CAST(doc_id % 9 AS VARCHAR) || '.jpg',
      |    host || '/abs/' || CAST(doc_id % 9 AS VARCHAR) || '.jpg',
      |    'inline-' || CAST(doc_id % 5 AS VARCHAR) || ' & co', '',
      |    'Context before context after.' FROM u
      |  UNION ALL SELECT doc_id, 2,
      |    '//cdn.' || source || '.example.com/c' ||
      |      CAST(doc_id % 4 AS VARCHAR) || '.webp',
      |    'https://cdn.' || source || '.example.com/c' ||
      |      CAST(doc_id % 4 AS VARCHAR) || '.webp',
      |    '', '', '' FROM u)
      |SELECT doc_id, CAST(idx AS BIGINT) AS idx, src, resolved, alt,
      |  title, caption
      |FROM l ORDER BY doc_id, idx""".stripMargin

  /** html-markdown oracle, shared verbatim by the batch rendering and
    * its streaming twin: the rendered string rebuilt character by
    * character. */
  private val htmlMarkdownOracleSql: String =
        """WITH u AS (
      |  SELECT doc_id, CAST(doc_id AS VARCHAR) AS id,
      |    array_to_string(list_slice(
      |      list_filter(string_split(text, ' '), x -> x <> ''), 1, 2),
      |      ' ') AS w2,
      |    array_to_string(list_slice(
      |      list_filter(string_split(text, ' '), x -> x <> ''), 1, 3),
      |      ' ') AS w3
      |  FROM documents)
      |SELECT doc_id,
      |  '# Doc ' || id || chr(10) || chr(10) ||
      |  'Intro **' || w2 || '** and [link ' ||
      |    CAST(doc_id % 5 AS VARCHAR) || '](/l/' ||
      |    CAST(doc_id % 7 AS VARCHAR) || ').' || chr(10) || chr(10) ||
      |  '- item ' || CAST(doc_id % 3 AS VARCHAR) || chr(10) || chr(10) ||
      |  '- item b' || chr(10) || chr(10) ||
      |  '> note ' || w3 || chr(10) || chr(10) ||
      |  '![pic ' || CAST(doc_id % 9 AS VARCHAR) || '](/img/' || id ||
      |    '.png)' AS markdown
      |FROM u ORDER BY doc_id""".stripMargin

  /** image-pair-quality oracle: the alt/caption word and char gates
    * replayed over the pair construction. */
  private val imagePairQualityOracleSql: String =
        """WITH u AS (
      |  SELECT doc_id, source,
      |    CAST(doc_id % 25 AS VARCHAR) AS slot,
      |    array_to_string(list_slice(
      |      list_filter(string_split(text, ' '), x -> x <> ''), 1, 3), ' ')
      |      AS w3
      |  FROM documents),
      |l AS (
      |  SELECT doc_id, 0 AS idx,
      |    'fig-' || CAST(doc_id % 13 AS VARCHAR) AS alt,
      |    trim('Figure ' || slot || ': ' || w3) AS caption
      |  FROM u
      |  UNION ALL SELECT doc_id, 1,
      |    'inline-' || CAST(doc_id % 5 AS VARCHAR) || ' & co',
      |    'Context before context after.' FROM u
      |  UNION ALL SELECT doc_id, 2, '', '' FROM u),
      |q AS (
      |  SELECT doc_id, idx,
      |    len(list_filter(string_split(alt, ' '), x -> x <> '')) AS aw,
      |    length(alt) AS al,
      |    len(list_filter(string_split(caption, ' '), x -> x <> '')) AS cw
      |  FROM l)
      |SELECT doc_id, CAST(idx AS BIGINT) AS idx,
      |  (aw BETWEEN 2 AND 32 AND al BETWEEN 5 AND 200) AS alt_ok,
      |  (cw >= 3) AS caption_ok,
      |  ((aw BETWEEN 2 AND 32 AND al BETWEEN 5 AND 200) OR cw >= 3)
      |    AS keep
      |FROM q ORDER BY doc_id, idx""".stripMargin

  /** interleaved-docs oracle: the four emitted positions per document
    * (content, image, image, content) — the nav run and its short
    * successor must NOT appear at any position. */
  /** The interleaved-page fixture replay (`u` + `l` CTEs) — ONE source
    * of truth for the planted 4-item page shape, shared by all three
    * interleaved oracles (extraction, packing, token packing).
    * `withMedia` adds the src/alt columns only the extraction oracle
    * reads. */
  private def interleavedFixtureCtes(withMedia: Boolean): String = {
    val mediaCols0 =
      if (withMedia) ",\n    CAST(NULL AS VARCHAR) AS src, CAST(NULL AS VARCHAR) AS alt"
      else ""
    val media1 =
      if (withMedia) ",\n    '/img/' || id || '.png',\n    'one-' || CAST(doc_id % 13 AS VARCHAR)"
      else ""
    val media2 =
      if (withMedia) ",\n    '//cdn.' || source || '.example.com/m' ||\n      CAST(doc_id % 7 AS VARCHAR) || '.webp', ''"
      else ""
    val media3 = if (withMedia) ", NULL, NULL" else ""
    s"""u AS (
      |  SELECT doc_id, source, CAST(doc_id AS VARCHAR) AS id,
      |    array_to_string(list_slice(
      |      list_filter(string_split(text, ' '), x -> x <> ''), 1, 5), ' ')
      |      AS w5,
      |    array_to_string(list_slice(
      |      list_filter(string_split(text, ' '), x -> x <> ''), 1, 3), ' ')
      |      AS w3
      |  FROM documents),
      |l AS (
      |  SELECT doc_id, 0 AS pos, 'text' AS kind,
      |    'Opening paragraph for document ' || id || ' about ' || w5 ||
      |      ' with enough length.' AS text$mediaCols0
      |  FROM u
      |  UNION ALL SELECT doc_id, 1, 'image', NULL$media1 FROM u
      |  UNION ALL SELECT doc_id, 2, 'image', NULL$media2 FROM u
      |  UNION ALL SELECT doc_id, 3, 'text',
      |    'Closing paragraph reciting ' || w3 ||
      |      ' once more for position four.'$media3 FROM u)""".stripMargin
  }

  private def interleavedDocsOracleSql: String =
    "WITH " + interleavedFixtureCtes(withMedia = true) + """
      |SELECT doc_id, CAST(pos AS BIGINT) AS pos, kind, text, src, alt
      |FROM l ORDER BY doc_id, pos""".stripMargin

  /** interleaved-packing oracle: the q_interleaved_docs item
    * construction + the cost rule (image → 64, text → whitespace token
    * count) + in-document and cross-document prefix sums + the
    * capacity-512 division — the q_sft_pack chain re-based onto
    * multimodal items. */
  private def interleavedPackOracleSql: String =
    "WITH " + interleavedFixtureCtes(withMedia = false) + """,
      |c AS (
      |  SELECT doc_id, pos, kind,
      |    CAST(CASE WHEN kind = 'image' THEN 64
      |         ELSE len(list_filter(string_split_regex(text, '\s+'),
      |                   x -> x <> ''))
      |    END AS BIGINT) AS n_tok
      |  FROM l),
      |doc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_items,
      |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      |  FROM c GROUP BY doc_id),
      |packed AS (
      |  SELECT doc_id, n_items, n_tokens,
      |    SUM(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |      AS g0,
      |    SUM(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM doc),
      |it AS (
      |  SELECT doc_id, pos, kind, n_tok,
      |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS st
      |  FROM c)
      |SELECT p.doc_id, p.n_items, p.n_tokens,
      |  CAST(p.g0 // 512 AS BIGINT) AS seq_id,
      |  (p.n_tokens > 0 AND (p.cum - 1) // 512 <> p.g0 // 512) AS is_split,
      |  CAST(i.pos AS BIGINT) AS pos, i.kind, i.n_tok,
      |  CAST(p.g0 + i.st AS BIGINT) AS g_start,
      |  CAST(p.g0 + i.st + i.n_tok AS BIGINT) AS g_end
      |FROM packed p JOIN it i USING (doc_id)
      |ORDER BY p.doc_id, i.pos""".stripMargin

  /** warc-image-pairs oracle: the page-side construction (src, alt,
    * figcaption) joined to the direct-decode pixel formula of
    * [[imageDecodeOracleSql]] — extraction, resolution, and the decoded
    * planes must agree in one frame. */
  private val warcImagePairsOracleSql: String =
    """WITH m AS (
      |  SELECT doc_id, source, 16 + doc_id % 17 AS w,
      |    16 + (doc_id * 3) % 13 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, i,
      |    CASE doc_id % 4
      |      WHEN 0 THEN (doc_id * 7 + i * 13) % 251
      |      WHEN 3 THEN (77 * ((doc_id + 3 * i) % 256)
      |        + 150 * (((doc_id + 3 * i) % 256) * 7 % 256)
      |        + 29 * (((doc_id + 3 * i) % 256) * 13 % 256)) // 256
      |      ELSE (77 * ((doc_id + 2 * i) % 256)
      |        + 150 * ((doc_id * 3 + 5 * i) % 256)
      |        + 29 * ((doc_id * 5 + 7 * i) % 256)) // 256
      |    END AS lum
      |  FROM m, LATERAL (SELECT unnest(range(0, w * h)) AS i) r),
      |agg AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pixels,
      |    CAST(SUM(lum) AS BIGINT) AS lum_sum
      |  FROM px GROUP BY doc_id)
      |SELECT m.doc_id,
      |  'https://img.' || m.source || '.example.com/png/' ||
      |    CAST(m.doc_id AS VARCHAR) || '.png' AS img_url,
      |  'png ' || CAST(m.doc_id % 13 AS VARCHAR) AS alt,
      |  'Pixel grid ' || CAST(m.w AS VARCHAR) || ' by ' ||
      |    CAST(m.h AS VARCHAR) AS caption,
      |  CAST(m.w AS BIGINT) AS width, CAST(m.h AS BIGINT) AS height,
      |  a.n_pixels, a.lum_sum
      |FROM m JOIN agg a USING (doc_id) ORDER BY m.doc_id""".stripMargin

  /** sitemap-seeds oracle, shared verbatim by the text-path query
    * (q_sitemap_seeds) and the gzipped/mixed binary path
    * (q_sitemap_gz — codec transparency is the gate). */
  private val sitemapSeedsOracleSql: String =
      """WITH src AS (
        |  SELECT DISTINCT source, source || '.example.com' AS domain,
        |    CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 25 AS k
        |  FROM documents),
        |ent AS (
        |  SELECT s.domain,
        |    'https://www.' || s.domain || '/docs/' ||
        |      CAST((s.k + ii.i) % 25 AS VARCHAR) AS loc,
        |    CAST('2026-01-' ||
        |      lpad(CAST((s.k + ii.i) % 28 + 1 AS VARCHAR), 2, '0') AS DATE)
        |      AS lastmod
        |  FROM src s CROSS JOIN (SELECT unnest(range(10)) AS i) ii),
        |crawled AS (
        |  SELECT DISTINCT 'https://www.' || source || '.example.com/docs/' ||
        |    CAST(doc_id % 25 AS VARCHAR) AS loc
        |  FROM documents),
        |seeds AS (
        |  SELECT e.domain, e.loc, e.lastmod FROM ent e
        |  LEFT JOIN crawled c ON c.loc = e.loc WHERE c.loc IS NULL)
        |SELECT domain, loc, lastmod,
        |  CAST(row_number() OVER (PARTITION BY domain
        |    ORDER BY lastmod DESC, loc ASC) AS BIGINT) AS seed_rank
        |FROM seeds ORDER BY domain, seed_rank""".stripMargin

  /** sft-assembly oracle: the frozen ChatML template's length
    * arithmetic replayed per turn — prefix-sum starts, whole-turn and
    * content-only intervals, assistant-span train flags. The 12/1/11
    * literals are length("<|im_start|>"), the "\n" after the role, and
    * length("<|im_end|>\n") — frozen with the template. */
  private val sftAssembleOracleSql: String =
        """WITH tu AS (
      |  SELECT doc_id // 4 AS conversation_id, doc_id % 4 AS turn_idx,
      |    CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
      |    'Turn ' || CAST(doc_id % 4 AS VARCHAR) || ': ' ||
      |      array_to_string(list_slice(
      |        list_filter(string_split(text, ' '), x -> x <> ''), 1, 4),
      |        ' ') AS t
      |  FROM documents),
      |r AS (
      |  SELECT conversation_id, turn_idx, role,
      |    CAST(length('<|im_start|>' || role || chr(10) || t ||
      |      '<|im_end|>' || chr(10)) AS BIGINT) AS rlen
      |  FROM tu),
      |sp AS (
      |  SELECT conversation_id, turn_idx, role, rlen,
      |    CAST(COALESCE(SUM(rlen) OVER (PARTITION BY conversation_id
      |      ORDER BY turn_idx
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS start_char,
      |    CAST(COUNT(*) OVER (PARTITION BY conversation_id) AS BIGINT)
      |      AS n_turns,
      |    CAST(SUM(rlen) OVER (PARTITION BY conversation_id) AS BIGINT)
      |      AS rendered_len
      |  FROM r)
      |SELECT CAST(conversation_id AS BIGINT) AS conversation_id, n_turns,
      |  rendered_len, CAST(turn_idx AS BIGINT) AS turn_idx, role,
      |  start_char, start_char + rlen AS end_char,
      |  start_char + 12 + length(role) + 1 AS content_start,
      |  start_char + rlen - 11 AS content_end,
      |  role = 'assistant' AS train
      |FROM sp ORDER BY conversation_id, turn_idx""".stripMargin

  /** sft-packing oracle: template lengths → conversation prefix sums →
    * capacity-512 packing division → per-span global offset shifts, all
    * replayed from the shared turn construction. */
  private val sftPackOracleSql: String =
        """WITH tu AS (
      |  SELECT doc_id // 4 AS conversation_id, doc_id % 4 AS turn_idx,
      |    CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
      |    'Turn ' || CAST(doc_id % 4 AS VARCHAR) || ': ' ||
      |      array_to_string(list_slice(
      |        list_filter(string_split(text, ' '), x -> x <> ''), 1, 4),
      |        ' ') AS t
      |  FROM documents),
      |r AS (
      |  SELECT conversation_id, turn_idx, role,
      |    CAST(length('<|im_start|>' || role || chr(10) || t ||
      |      '<|im_end|>' || chr(10)) AS BIGINT) AS rlen
      |  FROM tu),
      |conv AS (
      |  SELECT conversation_id, CAST(SUM(rlen) AS BIGINT) AS n_chars
      |  FROM r GROUP BY conversation_id),
      |packed AS (
      |  SELECT conversation_id, n_chars,
      |    SUM(n_chars) OVER (ORDER BY conversation_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars
      |      AS g0,
      |    SUM(n_chars) OVER (ORDER BY conversation_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM conv),
      |sp AS (
      |  SELECT conversation_id, turn_idx, role, rlen,
      |    CAST(COALESCE(SUM(rlen) OVER (PARTITION BY conversation_id
      |      ORDER BY turn_idx
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS start_char
      |  FROM r)
      |SELECT p.conversation_id, p.n_chars,
      |  CAST(p.g0 // 512 AS BIGINT) AS seq_id,
      |  (p.n_chars > 0 AND (p.cum - 1) // 512 <> p.g0 // 512) AS is_split,
      |  CAST(s.turn_idx AS BIGINT) AS turn_idx, s.role,
      |  CAST(p.g0 + s.start_char AS BIGINT) AS g_start,
      |  CAST(p.g0 + s.start_char + s.rlen AS BIGINT) AS g_end,
      |  CAST(p.g0 + s.start_char + 12 + length(s.role) + 1 AS BIGINT)
      |    AS g_content_start,
      |  CAST(p.g0 + s.start_char + s.rlen - 11 AS BIGINT) AS g_content_end,
      |  s.role = 'assistant' AS train
      |FROM packed p JOIN sp s USING (conversation_id)
      |ORDER BY p.conversation_id, s.turn_idx""".stripMargin

  /** token-exact sft-packing oracle: the frozen-BPE recursive-CTE
    * fixpoint (the q_bpe_tokenize oracle's engine, same literalized
    * merge table) run over the TURN texts for per-turn token counts,
    * composed with the q_sft_pack prefix-sum / packing-division chain
    * in token units. The +5/+3/−2 literals are the frozen ChatML token
    * overhead ([[operators.Sft.TurnOverheadTokens]] and its halves);
    * span_text_ok replays as TRUE — the engine-side cross-path identity
    * (packed token-span width == independent re-tokenization of the
    * char-span substring, detokenization == cleaned words) must hold on
    * every row or the hash fails. */
  /** The literalized frozen-merge VALUES table — one source of truth
    * (the engine's [[operators.BpeTokenizer.frozenMerges]]) shared by
    * every oracle that replays the BPE fixpoint. */
  private def frozenMergeValues: String = {
    def q(s: String): String = s.replace("'", "''")
    operators.BpeTokenizer.frozenMerges.zipWithIndex
      .map { case ((x, y), r) => s"($r, '${q(x)}', '${q(y)}')" }.mkString(", ")
  }

  /** The frozen-BPE WORD-COUNT CTE pair: given `mg(r, x, y)` and a
    * `dw(word)` CTE of distinct words in scope, emits `enc` (the
    * rank-ordered replace-to-fixpoint recursion) and `wtok(word, ntk)`
    * — the per-word token counts every token-budget oracle reuses. */
  private def bpeWordCountCtes: String = {
    val maxRank = operators.BpeTokenizer.frozenMerges.size
    s"""enc AS (
       |  SELECT word,
       |    chr(1) || array_to_string(list_transform(range(1, length(word) + 1),
       |      i -> substring(word, i, 1) ||
       |        CASE WHEN i = length(word) THEN '</w>' ELSE '' END), chr(1))
       |      || chr(1) AS seq,
       |    0 AS r
       |  FROM dw
       |  UNION ALL
       |  SELECT word,
       |    CASE WHEN np <> seq THEN np ELSE seq END,
       |    CASE WHEN np <> seq THEN r ELSE r + 1 END
       |  FROM (
       |    SELECT e.word, e.seq, e.r,
       |      replace(replace(e.seq,
       |        chr(1) || m.x || chr(1) || m.y || chr(1),
       |        chr(1) || m.x || m.y || chr(2)), chr(2), chr(1)) AS np
       |    FROM enc e JOIN mg m ON m.r = e.r) s),
       |wtok AS (
       |  SELECT word,
       |    CAST(len(list_filter(string_split(seq, chr(1)), q -> q <> ''))
       |      AS BIGINT) AS ntk
       |  FROM enc WHERE r = $maxRank)""".stripMargin
  }

  /** Per-turn frozen-BPE token lengths: given `mg` and a
    * `tu(conversation_id, turn_idx, role, t)` CTE in scope, emits
    * `r2(conversation_id, turn_idx, role, rlen)` — rlen = content
    * tokens + the frozen ChatML overhead of 5. Shared by the packing
    * and assembly oracle tails. */
  private def turnTokenLenCtes: String =
    s"""ttk AS (
       |  SELECT conversation_id, turn_idx,
       |    list_filter(string_split_regex(trim(lower(t)), '\\s+'),
       |                x -> x <> '') AS tk
       |  FROM tu),
       |tw AS (
       |  SELECT conversation_id, turn_idx, list_extract(tk, i) AS word
       |  FROM ttk, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) r),
       |dw AS (SELECT DISTINCT word FROM tw),
       |""".stripMargin + bpeWordCountCtes + s""",
       |tn AS (
       |  SELECT conversation_id, turn_idx, CAST(SUM(ntk) AS BIGINT) AS k
       |  FROM tw JOIN wtok USING (word) GROUP BY 1, 2),
       |r2 AS (
       |  SELECT tu.conversation_id, tu.turn_idx, tu.role,
       |    COALESCE(tn.k, 0) + 5 AS rlen
       |  FROM tu LEFT JOIN tn USING (conversation_id, turn_idx))""".stripMargin

  /** Token-space ASSEMBLY oracle tail (no packing): per-conversation
    * span intervals in token units — the q_sft_assemble arithmetic
    * re-based onto [[turnTokenLenCtes]]' rlen. */
  private def tokenAssembleOracleTail: String =
    turnTokenLenCtes + s""",
       |nt AS (
       |  SELECT conversation_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
       |    CAST(SUM(rlen) AS BIGINT) AS n_tokens
       |  FROM r2 GROUP BY conversation_id),
       |sp AS (
       |  SELECT conversation_id, turn_idx, role, rlen,
       |    CAST(COALESCE(SUM(rlen) OVER (PARTITION BY conversation_id
       |      ORDER BY turn_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS start_tok
       |  FROM r2)
       |SELECT CAST(s.conversation_id AS BIGINT) AS conversation_id,
       |  n.n_turns, n.n_tokens,
       |  CAST(s.turn_idx AS BIGINT) AS turn_idx, s.role, s.start_tok,
       |  CAST(s.start_tok + s.rlen AS BIGINT) AS end_tok,
       |  CAST(s.start_tok + 3 AS BIGINT) AS content_start,
       |  CAST(s.start_tok + s.rlen - 2 AS BIGINT) AS content_end,
       |  s.role = 'assistant' AS train
       |FROM sp s JOIN nt n USING (conversation_id)
       |ORDER BY conversation_id, turn_idx""".stripMargin

  /** The shared BPE-fixpoint + ChatML token-PACKING oracle tail: given
    * `mg(r, x, y)` (the frozen merges) and a
    * `tu(conversation_id, turn_idx, role, t)` turn CTE already in
    * scope, tokenizes every turn under the merges (via
    * [[turnTokenLenCtes]]), applies the per-conversation prefix sums
    * and the `capacity` packing division. `extraCols` appends
    * engine-side gate columns (e.g. `, TRUE AS span_text_ok`). Shared
    * verbatim by q_sft_pack_tokens and the q_sft_pipeline capstone. */
  private def tokenPackOracleTail(capacity: Int, extraCols: String): String = {
    turnTokenLenCtes + s""",
       |conv AS (
       |  SELECT conversation_id, CAST(SUM(rlen) AS BIGINT) AS n_tokens
       |  FROM r2 GROUP BY conversation_id),
       |packed AS (
       |  SELECT conversation_id, n_tokens,
       |    SUM(n_tokens) OVER (ORDER BY conversation_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
       |      AS g0,
       |    SUM(n_tokens) OVER (ORDER BY conversation_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM conv),
       |sp AS (
       |  SELECT conversation_id, turn_idx, role, rlen,
       |    CAST(COALESCE(SUM(rlen) OVER (PARTITION BY conversation_id
       |      ORDER BY turn_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS start_tok
       |  FROM r2)
       |SELECT CAST(p.conversation_id AS BIGINT) AS conversation_id,
       |  p.n_tokens,
       |  CAST(p.g0 // $capacity AS BIGINT) AS seq_id,
       |  (p.n_tokens > 0 AND (p.cum - 1) // $capacity <> p.g0 // $capacity)
       |    AS is_split,
       |  CAST(s.turn_idx AS BIGINT) AS turn_idx, s.role,
       |  CAST(p.g0 + s.start_tok AS BIGINT) AS g_start,
       |  CAST(p.g0 + s.start_tok + s.rlen AS BIGINT) AS g_end,
       |  CAST(p.g0 + s.start_tok + 3 AS BIGINT) AS g_content_start,
       |  CAST(p.g0 + s.start_tok + s.rlen - 2 AS BIGINT) AS g_content_end,
       |  s.role = 'assistant' AS train$extraCols
       |FROM packed p JOIN sp s USING (conversation_id)
       |ORDER BY p.conversation_id, s.turn_idx""".stripMargin
  }

  /** bpe-fertility oracle: the frozen-BPE fixpoint per distinct
    * word, token counts joined back to word instances, per-source sums,
    * and the two ppm fixed-point ratios. */
  private def bpeFertilityOracleSql: String = {
    s"""WITH RECURSIVE
       |mg(r, x, y) AS (SELECT * FROM (VALUES $frozenMergeValues) v(r, x, y)),
       |toks AS (
       |  SELECT doc_id, source,
       |    list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |                t -> t <> '') AS tk
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, source, list_extract(tk, i) AS word
       |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) r),
       |dw AS (SELECT DISTINCT word FROM w),
       |""".stripMargin + bpeWordCountCtes + s""",
       |pw AS (
       |  SELECT w.source, CAST(COUNT(*) AS BIGINT) AS n_words,
       |    CAST(SUM(t.ntk) AS BIGINT) AS n_tokens,
       |    CAST(SUM(length(w.word)) AS BIGINT) AS n_chars
       |  FROM w JOIN wtok t USING (word) GROUP BY w.source),
       |nd AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY source)
       |SELECT nd.source, nd.n_docs,
       |  COALESCE(pw.n_words, 0) AS n_words,
       |  COALESCE(pw.n_tokens, 0) AS n_tokens,
       |  COALESCE(pw.n_chars, 0) AS n_chars,
       |  CASE WHEN COALESCE(pw.n_words, 0) = 0 THEN NULL
       |    ELSE CAST((1000000 * pw.n_tokens) // pw.n_words AS BIGINT) END
       |    AS fertility_ppm,
       |  CASE WHEN COALESCE(pw.n_tokens, 0) = 0 THEN NULL
       |    ELSE CAST((1000000 * pw.n_chars) // pw.n_tokens AS BIGINT) END
       |    AS chars_per_token_ppm
       |FROM nd LEFT JOIN pw ON pw.source = nd.source
       |ORDER BY nd.source""".stripMargin
  }

  private def sftPackTokensOracleSql: String =
    s"""WITH RECURSIVE
       |mg(r, x, y) AS (SELECT * FROM (VALUES $frozenMergeValues) v(r, x, y)),
       |tu AS (
       |  SELECT doc_id // 4 AS conversation_id, doc_id % 4 AS turn_idx,
       |    CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       |    'Turn ' || CAST(doc_id % 4 AS VARCHAR) || ': ' ||
       |      array_to_string(list_slice(
       |        list_filter(string_split(text, ' '), x -> x <> ''), 1, 4),
       |        ' ') AS t
       |  FROM documents),
       |""".stripMargin +
      tokenPackOracleTail(256, ",\n  TRUE AS span_text_ok")

  /** token-space assembly oracle: the shared turn fixture fed through
    * [[tokenAssembleOracleTail]] — per-turn token-span intervals, no
    * packing. Shared verbatim by the batch query and its streaming
    * twin. */
  private def sftAssembleTokensOracleSql: String =
    s"""WITH RECURSIVE
       |mg(r, x, y) AS (SELECT * FROM (VALUES $frozenMergeValues) v(r, x, y)),
       |tu AS (
       |  SELECT doc_id // 4 AS conversation_id, doc_id % 4 AS turn_idx,
       |    CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       |    'Turn ' || CAST(doc_id % 4 AS VARCHAR) || ': ' ||
       |      array_to_string(list_slice(
       |        list_filter(string_split(text, ' '), x -> x <> ''), 1, 4),
       |        ' ') AS t
       |  FROM documents),
       |""".stripMargin + tokenAssembleOracleTail

  /** token-exact interleaved-packing oracle: the q_interleaved_pack
    * chain with TEXT costs from the frozen-BPE fixpoint instead of
    * whitespace counts (images keep the constant 64-token placeholder
    * budget). */
  private def interleavedPackTokensOracleSql: String =
    s"""WITH RECURSIVE
      |mg(r, x, y) AS (SELECT * FROM (VALUES $frozenMergeValues) v(r, x, y)),
      |""".stripMargin + interleavedFixtureCtes(withMedia = false) + s""",
      |it0 AS (
      |  SELECT doc_id, pos, kind,
      |    CASE WHEN kind = 'text' THEN
      |      list_filter(string_split_regex(trim(lower(text)), '\\s+'),
      |                  x -> x <> '') END AS tk
      |  FROM l),
      |tw AS (
      |  SELECT doc_id, pos, list_extract(tk, i) AS word
      |  FROM it0, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) r
      |  WHERE tk IS NOT NULL),
      |dw AS (SELECT DISTINCT word FROM tw),
      |""".stripMargin + bpeWordCountCtes + s""",
      |tcost AS (
      |  SELECT doc_id, pos, CAST(SUM(ntk) AS BIGINT) AS c
      |  FROM tw JOIN wtok USING (word) GROUP BY 1, 2),
      |c AS (
      |  SELECT i.doc_id, i.pos, i.kind,
      |    CAST(CASE WHEN i.kind = 'image' THEN 64
      |         ELSE COALESCE(t.c, 0) END AS BIGINT) AS n_tok
      |  FROM it0 i LEFT JOIN tcost t USING (doc_id, pos)),
      |doc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_items,
      |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      |  FROM c GROUP BY doc_id),
      |packed AS (
      |  SELECT doc_id, n_items, n_tokens,
      |    SUM(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |      AS g0,
      |    SUM(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM doc),
      |it AS (
      |  SELECT doc_id, pos, kind, n_tok,
      |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS st
      |  FROM c)
      |SELECT p.doc_id, p.n_items, p.n_tokens,
      |  CAST(p.g0 // 512 AS BIGINT) AS seq_id,
      |  (p.n_tokens > 0 AND (p.cum - 1) // 512 <> p.g0 // 512) AS is_split,
      |  CAST(i.pos AS BIGINT) AS pos, i.kind, i.n_tok,
      |  CAST(p.g0 + i.st AS BIGINT) AS g_start,
      |  CAST(p.g0 + i.st + i.n_tok AS BIGINT) AS g_end
      |FROM packed p JOIN it i USING (doc_id)
      |ORDER BY p.doc_id, i.pos""".stripMargin

  /** ffd-packing oracle: the whole per-shard first-fit-decreasing fold
    * replayed — Knuth shard hash (the q_corpus_shuffle formula), docs
    * ranked (tokens desc, id) per shard, and a recursive CTE whose
    * state is the bin-fills LIST: each step first-fits via
    * list_position over the fills, appending a new bin when nothing
    * (including an oversize doc) can take the item. Every document's
    * bin index and running fill hash-match the engine's fold. */
  private val packFfdOracleSql: String =
        """WITH RECURSIVE
      |toks AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(text, '\s+'),
      |      x -> x <> '')) AS BIGINT) AS n,
      |    ((doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
      |     + (doc_id % 65536) * 2654435761) % 4294967296 % 8 AS shard
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, n, shard,
      |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY n DESC, doc_id)
      |      AS rn
      |  FROM toks),
      |f AS (
      |  SELECT shard, 0 AS rn, CAST(NULL AS BIGINT) AS doc_id,
      |    CAST(NULL AS BIGINT) AS n, CAST(NULL AS BIGINT) AS bin,
      |    CAST(NULL AS BIGINT) AS fill_after,
      |    CAST([] AS BIGINT[]) AS fills
      |  FROM (SELECT DISTINCT shard FROM toks)
      |  UNION ALL
      |  SELECT f.shard, d.rn, d.doc_id, d.n,
      |    CAST(CASE WHEN l.ix IS NULL OR l.ix = 0 THEN len(f.fills)
      |         ELSE l.ix - 1 END AS BIGINT),
      |    CAST(CASE WHEN l.ix IS NULL OR l.ix = 0 THEN d.n
      |         ELSE f.fills[l.ix] + d.n END AS BIGINT),
      |    CASE WHEN l.ix IS NULL OR l.ix = 0 THEN list_append(f.fills, d.n)
      |         ELSE list_transform(range(1, len(f.fills) + 1),
      |                i -> CASE WHEN i = l.ix THEN f.fills[i] + d.n
      |                     ELSE f.fills[i] END) END
      |  FROM f JOIN d ON d.shard = f.shard AND d.rn = f.rn + 1,
      |  LATERAL (SELECT list_position(
      |    list_transform(f.fills, x -> x + d.n <= 256), true) AS ix) l)
      |SELECT doc_id, n AS n_tok, shard, bin, fill_after,
      |  n > 256 AS oversize
      |FROM f WHERE rn > 0 ORDER BY doc_id""".stripMargin

  /** ffd-manifest oracle: the full fold replay grouped per (shard,
    * bin). `packFfdOracleSql` is reused verbatim as a subquery. */
  private def packFfdStatsOracleSql: String =
    s"""SELECT shard, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |  bool_or(oversize) AS oversize,
       |  CAST(CASE WHEN bool_or(oversize) THEN 0
       |       ELSE 256 - SUM(n_tok) END AS BIGINT) AS waste
       |FROM ($packFfdOracleSql) p
       |GROUP BY shard, bin ORDER BY shard, bin""".stripMargin

  /** sft-pipeline capstone oracle: the survivor set replays the planted
    * fixture's structure (the sftDedupFuzzyOracleSql discipline —
    * each stage's OPERATOR is independently hash-gated by
    * q_sft_dedup / q_sft_decontam; the capstone gates their
    * COMPOSITION): per planted group of three conversations, the
    * case-variant copy v1 exact-dedups away (min-id survivor v0), and
    * any group containing a benchmark conversation (cid % 11 == 0)
    * drops whole — group-keyed tokens make its three conversations
    * shingle-overlap the benchmark text and nothing else. Survivors
    * then run the REAL frozen-BPE token assembly + capacity-256 packing
    * tail shared with q_sft_pack_tokens. */
  private def sftPipelineOracleSql: String =
    s"""WITH RECURSIVE
       |mg(r, x, y) AS (SELECT * FROM (VALUES $frozenMergeValues) v(r, x, y)),
       |convs AS (SELECT DISTINCT doc_id // 4 AS cid FROM documents),
       |surv AS (
       |  SELECT cid FROM convs c
       |  WHERE cid % 3 <> 1
       |    AND NOT EXISTS (SELECT 1 FROM convs b
       |                    WHERE b.cid % 11 = 0 AND b.cid // 3 = c.cid // 3)),
       |tu AS (
       |  SELECT doc_id // 4 AS conversation_id, doc_id % 4 AS turn_idx,
       |    CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       |    'sft' || CAST((doc_id // 4) // 3 AS VARCHAR) || 'a sft' ||
       |      CAST((doc_id // 4) // 3 AS VARCHAR) || 'b sft' ||
       |      CAST((doc_id // 4) // 3 AS VARCHAR) || 'c turn' ||
       |      CAST(doc_id % 4 AS VARCHAR) ||
       |      CASE WHEN (doc_id // 4) % 3 = 2 AND doc_id % 4 = 3
       |        THEN ' extra' ELSE '' END AS t
       |  FROM documents JOIN surv ON surv.cid = doc_id // 4),
       |""".stripMargin +
      tokenPackOracleTail(256, "")

  /** best-of-n oracle: rank + lead + min/max windows over the shared
    * candidate construction; top-3 ranks, flat-spread prompts emit
    * nothing, margin_next NULL for each prompt's last scored
    * candidate. */
  private val sftBonOracleSql: String =
        """WITH c AS (
      |  SELECT doc_id // 5 AS prompt_id, doc_id AS cand_id,
      |    'Cand ' || CAST(doc_id % 5 AS VARCHAR) || ': ' ||
      |      array_to_string(list_slice(
      |        list_filter(string_split(text, ' '), x -> x <> ''), 1, 5),
      |        ' ') AS t,
      |    CAST(CASE WHEN (doc_id // 5) % 10 = 0 THEN 50
      |         ELSE (doc_id * 37) % 100 END AS BIGINT) AS s
      |  FROM documents),
      |r AS (
      |  SELECT prompt_id, cand_id, t, s,
      |    row_number() OVER (PARTITION BY prompt_id
      |      ORDER BY s DESC, cand_id DESC) AS rk,
      |    lead(s) OVER (PARTITION BY prompt_id
      |      ORDER BY s DESC, cand_id DESC) AS nxt,
      |    min(s) OVER (PARTITION BY prompt_id) AS smin,
      |    max(s) OVER (PARTITION BY prompt_id) AS smax,
      |    count(*) OVER (PARTITION BY prompt_id) AS n
      |  FROM c)
      |SELECT CAST(prompt_id AS BIGINT) AS prompt_id,
      |  CAST(rk AS BIGINT) AS "rank", cand_id, t AS text, s AS score,
      |  s - nxt AS margin_next, s - smin AS margin_worst,
      |  CAST(n AS BIGINT) AS n_candidates
      |FROM r WHERE rk <= 3 AND smax > smin
      |ORDER BY prompt_id, "rank"""".stripMargin

  /** preference-pairs oracle: argmax/argmin per prompt via rank
    * windows over the candidate construction; flat-spread prompts
    * (every tenth) filtered — they must emit nothing. */
  private val prefPairsOracleSql: String =
        """WITH c AS (
      |  SELECT doc_id // 5 AS prompt_id, doc_id AS cand_id,
      |    'Cand ' || CAST(doc_id % 5 AS VARCHAR) || ': ' ||
      |      array_to_string(list_slice(
      |        list_filter(string_split(text, ' '), x -> x <> ''), 1, 5),
      |        ' ') AS t,
      |    CAST(CASE WHEN (doc_id // 5) % 10 = 0 THEN 50
      |         ELSE (doc_id * 37) % 100 END AS BIGINT) AS s
      |  FROM documents),
      |r AS (
      |  SELECT prompt_id, cand_id, t, s,
      |    row_number() OVER (PARTITION BY prompt_id
      |      ORDER BY s DESC, cand_id DESC) AS rmax,
      |    row_number() OVER (PARTITION BY prompt_id
      |      ORDER BY s ASC, cand_id ASC) AS rmin,
      |    count(*) OVER (PARTITION BY prompt_id) AS n,
      |    max(s) OVER (PARTITION BY prompt_id) AS smax,
      |    min(s) OVER (PARTITION BY prompt_id) AS smin
      |  FROM c)
      |SELECT a.prompt_id, CAST(a.n AS BIGINT) AS n_candidates,
      |  a.cand_id AS chosen_id, a.t AS chosen_text, a.s AS chosen_score,
      |  b.cand_id AS rejected_id, b.t AS rejected_text,
      |  b.s AS rejected_score
      |FROM r a JOIN r b ON a.prompt_id = b.prompt_id
      |WHERE a.rmax = 1 AND b.rmin = 1 AND a.smax > a.smin
      |ORDER BY a.prompt_id""".stripMargin

  /** sft-decontamination oracle: the q_decontaminate shingle chain over
    * each conversation's concatenated (lowercased) assistant turns vs
    * the benchmark slice's shingle set. */
  private val sftDecontamOracleSql: String =
        """WITH tu AS (
      |  SELECT doc_id // 4 AS cid, doc_id % 4 AS k,
      |    array_to_string(list_slice(
      |      list_filter(string_split(text, ' '), x -> x <> ''), 1, 8),
      |      ' ') AS t
      |  FROM documents WHERE doc_id % 2 = 1),
      |conv AS (
      |  SELECT cid, lower(string_agg(t, ' ' ORDER BY k)) AS text
      |  FROM tu GROUP BY cid),
      |ctk AS (
      |  SELECT cid, regexp_split_to_array(trim(text), '\s+') AS tk
      |  FROM conv),
      |csh AS (
      |  SELECT DISTINCT cid,
      |    list_extract(tk, i) || ' ' || list_extract(tk, i+1) || ' ' ||
      |    list_extract(tk, i+2) || ' ' || list_extract(tk, i+3) || ' ' ||
      |    list_extract(tk, i+4) AS s
      |  FROM ctk, LATERAL (SELECT unnest(range(1, len(tk)-3)) AS i) r
      |  WHERE len(tk) >= 5
      |  UNION
      |  SELECT DISTINCT cid, array_to_string(tk, ' ') AS s
      |  FROM ctk WHERE len(tk) < 5),
      |etk AS (
      |  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS tk
      |  FROM documents WHERE doc_id % 97 = 0),
      |esh AS (
      |  SELECT DISTINCT
      |    list_extract(tk, i) || ' ' || list_extract(tk, i+1) || ' ' ||
      |    list_extract(tk, i+2) || ' ' || list_extract(tk, i+3) || ' ' ||
      |    list_extract(tk, i+4) AS s
      |  FROM etk, LATERAL (SELECT unnest(range(1, len(tk)-3)) AS i) r
      |  WHERE len(tk) >= 5
      |  UNION
      |  SELECT DISTINCT array_to_string(tk, ' ') AS s
      |  FROM etk WHERE len(tk) < 5)
      |SELECT cid AS conversation_id, CAST(count(*) AS BIGINT) AS n_hits
      |FROM csh JOIN esh USING (s) GROUP BY 1
      |ORDER BY conversation_id""".stripMargin

  /** png-metadata-strip oracle: decode checksums from the pixel
    * formula, emitted twice and thereby pinned EQUAL (the lossless
    * contract), plus the exact removed-chunk byte arithmetic
    * (3 × 12 framing + the two planted text payloads + tIME's 7). */
  private val imageStripMetaOracleSql: String =
    """WITH m AS (
      |  SELECT doc_id, 16 + doc_id % 17 AS w, 16 + (doc_id * 3) % 13 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id,
      |    CASE doc_id % 4
      |      WHEN 0 THEN (doc_id * 7 + i * 13) % 251
      |      WHEN 3 THEN (77 * ((doc_id + 3 * i) % 256)
      |        + 150 * (((doc_id + 3 * i) % 256) * 7 % 256)
      |        + 29 * (((doc_id + 3 * i) % 256) * 13 % 256)) // 256
      |      ELSE (77 * ((doc_id + 2 * i) % 256)
      |        + 150 * ((doc_id * 3 + 5 * i) % 256)
      |        + 29 * ((doc_id * 5 + 7 * i) % 256)) // 256
      |    END AS lum
      |  FROM m, LATERAL (SELECT unnest(range(0, w * h)) AS i) r),
      |agg AS (
      |  SELECT doc_id, CAST(SUM(lum) AS BIGINT) AS lum
      |  FROM px GROUP BY doc_id)
      |SELECT m.doc_id AS media_id, CAST(m.w AS BIGINT) AS width,
      |  CAST(m.h AS BIGINT) AS height,
      |  a.lum AS lum_before, a.lum AS lum_after,
      |  CAST(3 AS BIGINT) AS n_removed,
      |  CAST(36 + (12 + length(CAST(m.doc_id % 50 AS VARCHAR)))
      |    + (13 + length(CAST(m.doc_id % 180 - 90 AS VARCHAR) || '.0,' ||
      |        CAST(m.doc_id % 360 - 180 AS VARCHAR) || '.0'))
      |    + 7 AS BIGINT) AS bytes_saved,
      |  TRUE AS lossless
      |FROM m JOIN agg a USING (doc_id) ORDER BY media_id""".stripMargin

  /** text-chunks oracle: the same window-start generation, redundancy
    * filter, tail arithmetic, and slice rebuild in SQL. */
  private val textChunksOracleSql: String =
        """WITH tk AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS tk
      |  FROM documents),
      |st AS (
      |  SELECT doc_id, tk, len(tk) AS n,
      |    unnest(range(0, len(tk), 24)) AS s
      |  FROM tk WHERE len(tk) > 0),
      |keep AS (
      |  SELECT doc_id, tk, n, s,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1
      |      AS chunk_id
      |  FROM st WHERE s = 0 OR s - 24 + 32 < n)
      |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      |  CAST(s AS BIGINT) AS start_tok,
      |  CAST(least(32, n - s) AS BIGINT) AS n_tok,
      |  array_to_string(tk[s+1:s+32], ' ') AS chunk_text
      |FROM keep ORDER BY doc_id, chunk_id""".stripMargin

  /** rag-pipeline oracle: the full chain replayed — 32/24 sliding
    * chunks, the fixed-arithmetic hashed embedding (integer components,
    * so the double cosine is bit-identical cross-engine), exact top-10
    * with (cosine desc, neighbor) ties, the key-derived relevance
    * grades, and the frozen-ppm nDCG table. ann_ok replays TRUE — the
    * engine-side IVF-PQ persistence + recall gate must hold or the hash
    * fails. */
  private val ragPipelineOracleSql: String =
        """WITH tk AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS tk
      |  FROM documents),
      |ch AS (
      |  SELECT doc_id, source, CAST(j AS BIGINT) AS chunk_id,
      |    list_transform(
      |      tk[24*j + 1:least(24*j + 32, len(tk))], w -> lower(w)) AS ctk
      |  FROM tk, LATERAL (SELECT unnest(range(0, ((len(tk) - 1) // 24) + 1)) AS j) r
      |  WHERE len(tk) > 0 AND (j = 0 OR 24*j + 8 < len(tk))),
      |emb AS (
      |  SELECT doc_id, source, chunk_id,
      |    doc_id * 4096 + chunk_id AS vec_id,
      |    list_transform(range(0, 16), b ->
      |      list_sum(list_transform(ctk, t ->
      |        CASE WHEN (3*length(t) + 7*unicode(t)
      |                   + 13*unicode(substring(t, length(t), 1))) % 16 = b
      |          THEN CASE WHEN (length(t) + unicode(t)) % 2 = 0
      |               THEN 1.0 ELSE -1.0 END
      |          ELSE 0.0 END))) AS v
      |  FROM ch),
      |scored AS (
      |  SELECT q.vec_id AS query, q.doc_id AS qdoc, q.source AS qsrc,
      |    c.vec_id AS neighbor_id, c.doc_id AS cdoc,
      |    c.chunk_id AS cchunk, c.source AS csrc,
      |    list_sum(list_transform(list_zip(q.v, c.v),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
      |         * sqrt(list_sum(list_transform(c.v, x -> x * x)))) AS cos
      |  FROM emb q JOIN emb c
      |    ON NOT (c.doc_id % 25 = 7 AND c.chunk_id = 0)
      |  WHERE q.doc_id % 25 = 7 AND q.chunk_id = 0
      |    AND list_sum(list_transform(q.v, x -> x * x)) > 0
      |    AND list_sum(list_transform(c.v, x -> x * x)) > 0),
      |ranked AS (
      |  SELECT query, rank, rel FROM (
      |    SELECT query, neighbor_id,
      |      ROW_NUMBER() OVER (PARTITION BY query
      |        ORDER BY cos DESC, neighbor_id) AS rank,
      |      CASE WHEN qdoc = cdoc THEN
      |             (CASE WHEN cchunk = 1 THEN 3 ELSE 2 END)
      |           WHEN qsrc = csrc THEN 1 ELSE 0 END AS rel
      |    FROM scored) t
      |  WHERE rank <= 10),
      |disc(r, d) AS (VALUES (1, 1000000), (2, 630930), (3, 500000),
      |  (4, 430677), (5, 386853), (6, 356207), (7, 333333), (8, 315465),
      |  (9, 301030), (10, 289065)),
      |ideal AS (
      |  SELECT query, rank, rel,
      |    ROW_NUMBER() OVER (PARTITION BY query
      |      ORDER BY rel DESC, rank ASC) AS irank
      |  FROM ranked),
      |agg AS (
      |  SELECT query, COUNT(*) AS n_ranked,
      |    CAST(SUM(rel * ds.d) AS BIGINT) AS dcg_ppm,
      |    CAST(SUM(rel * di.d) AS BIGINT) AS idcg_ppm
      |  FROM ideal JOIN disc ds ON ds.r = rank JOIN disc di ON di.r = irank
      |  GROUP BY query)
      |SELECT query, n_ranked, dcg_ppm, idcg_ppm,
      |  CASE WHEN idcg_ppm > 0
      |    THEN CAST((1000000 * dcg_ppm) // idcg_ppm AS BIGINT)
      |    ELSE NULL END AS ndcg_ppm,
      |  TRUE AS ann_ok
      |FROM agg ORDER BY query""".stripMargin

  /** sft-exact-dedup oracle: rendered conversations rebuilt in SQL and
    * grouped — min-id survivor, copy count, 256-bit fingerprint. */
  private val sftDedupOracleSql: String =
        """WITH tu AS (
      |  SELECT doc_id // 4 AS cid, doc_id % 4 AS k,
      |    CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
      |    'sft' || CAST((doc_id // 4) // 3 AS VARCHAR) || 'a sft' ||
      |      CAST((doc_id // 4) // 3 AS VARCHAR) || 'b sft' ||
      |      CAST((doc_id // 4) // 3 AS VARCHAR) || 'c turn' ||
      |      CAST(doc_id % 4 AS VARCHAR) ||
      |      CASE WHEN (doc_id // 4) % 3 = 2 AND doc_id % 4 = 3
      |        THEN ' extra' ELSE '' END AS t
      |  FROM documents),
      |r AS (
      |  SELECT cid, string_agg('<|im_start|>' || role || chr(10) || t ||
      |    '<|im_end|>' || chr(10), '' ORDER BY k) AS rendered
      |  FROM tu GROUP BY cid)
      |SELECT sha256(rendered) AS fp, CAST(MIN(cid) AS BIGINT)
      |    AS conversation_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_convs
      |FROM r GROUP BY rendered ORDER BY conversation_id""".stripMargin

  /** sft-fuzzy-dedup oracle: within each planted group of three
    * full conversations, the lowercase-identical pair scores 1.0 and
    * the one-token-appended sibling scores 11/12 against each — the
    * banding must surface exactly these pairs and the exact re-score
    * exactly these values. */
  private val sftDedupFuzzyOracleSql: String =
        """WITH convs AS (
      |  SELECT doc_id // 4 AS cid FROM documents
      |  GROUP BY 1 HAVING COUNT(*) = 4),
      |g AS (SELECT cid, cid // 3 AS grp, cid % 3 AS v FROM convs)
      |SELECT a.cid AS idA, b.cid AS idB,
      |  CASE WHEN (a.v = 2) = (b.v = 2) THEN 1.0
      |       ELSE round(11.0 / 12.0, 6) END AS jaccard
      |FROM g a JOIN g b ON a.grp = b.grp AND a.cid < b.cid
      |ORDER BY idA, idB""".stripMargin

  /** html-tables oracle, shared verbatim by the batch extraction and
    * its streaming twin. */
  private val htmlTablesOracleSql: String =
        """WITH d AS (
      |  SELECT doc_id,
      |    least(len(list_filter(string_split(text, ' '), x -> x <> '')),
      |      6) AS nw
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, i - 1 AS wi, lst[i] AS w
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text, ' '), x -> x <> '') AS lst
      |        FROM documents),
      |       LATERAL (SELECT unnest(range(1, least(len(lst), 6) + 1)) AS i) r),
      |cells AS (
      |  SELECT doc_id, 0 AS t, 0 AS r, h.cc AS c, TRUE AS header,
      |    h.cell AS cell
      |  FROM d, (VALUES (0, 'Idx'), (1, 'Word'), (2, 'Len'),
      |           (3, 'Note')) AS h(cc, cell)
      |  UNION ALL
      |  SELECT doc_id, 0, wi + 1, k.cc, FALSE,
      |    CASE k.cc WHEN 0 THEN CAST(wi AS VARCHAR)
      |              WHEN 1 THEN w
      |              WHEN 2 THEN CAST(len(w) AS VARCHAR)
      |              ELSE 'a&b' END
      |  FROM w, (VALUES (0), (1), (2), (3)) AS k(cc)
      |  UNION ALL
      |  SELECT doc_id, 1, 0, k.cc, FALSE,
      |    CASE k.cc WHEN 0 THEN 'total' ELSE CAST(nw AS VARCHAR) END
      |  FROM d, (VALUES (0), (1)) AS k(cc))
      |SELECT doc_id, CAST(t AS BIGINT) AS t, CAST(r AS BIGINT) AS r,
      |  CAST(c AS BIGINT) AS c, header, cell
      |FROM cells ORDER BY doc_id, t, r, c""".stripMargin

  /** Mojibake-fixture suffixes (clean forms): one CP1252-repairable,
    * one Greek (latin-1-fallback path), one symbol pair — shared by the
    * query's corruption/repair chain and the oracle's clean rebuild. */
  private val MojiSuffixes: Seq[String] =
    Seq(" – café «ß»", " αβγδ", " ©2026 ™")

  /** Mojibake oracle: repair must restore the CLEAN construction for
    * every row — corrupted rows (UTF-8 bytes mis-decoded latin-1) must
    * come back exactly, and the uncorrupted control rows (id%5==0) must
    * pass through untouched (the strict-decode false-positive guard). */
  private val mojibakeOracleSql: String =
    s"""SELECT doc_id, text || CASE doc_id % 3
       |    WHEN 0 THEN '${MojiSuffixes(0)}'
       |    WHEN 1 THEN '${MojiSuffixes(1)}'
       |    ELSE '${MojiSuffixes(2)}' END AS fixed
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Font-decoding oracle (q_pdf_unicode): the unicode fixture shows
    * line i through font i%3 (WinAnsi / MacRoman+Differences /
    * Identity-H+ToUnicode) with [[graft.expr.PdfOps.unicodeSuffix]]
    * appended — the expected suffixes are interpolated from the SAME
    * Scala constants the generator encodes through its inverse tables,
    * so engine and oracle agree by construction and any byte the
    * decoder maps wrong breaks the hash. */
  private val pdfUnicodeOracleSql: String = {
    val sfx0 = graft.expr.PdfOps.WinSuffix
    val sfx1 = graft.expr.PdfOps.DiffSuffix
    val sfx2 = graft.expr.PdfOps.CidSuffix
    s"""WITH w AS (
       |  SELECT doc_id, i - 1 AS wi, lst[i] AS w
       |  FROM (SELECT doc_id,
       |          list_filter(string_split(text, ' '), x -> x <> '') AS lst
       |        FROM documents),
       |       LATERAL (SELECT unnest(range(1, len(lst) + 1)) AS i) r),
       |lines AS (
       |  SELECT doc_id, wi // 8 AS g, string_agg(w, ' ' ORDER BY wi) AS line
       |  FROM w GROUP BY doc_id, wi // 8)
       |SELECT doc_id,
       |  string_agg(line || CASE g % 3 WHEN 0 THEN '$sfx0'
       |                                WHEN 1 THEN '$sfx1'
       |                                ELSE '$sfx2' END,
       |             chr(10) ORDER BY g) AS extracted
       |FROM lines GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Write-once-per-process MISLABELED archives: every response's
    * Content-Type header deliberately contradicts its payload (PNG as
    * text/html, PDF as image/png, HTML as octet-stream, WAV as
    * text/plain, plain text as application/pdf) — the real-crawl
    * pathology the magic-byte sniffer exists for. */
  private def warcMimeFixtureDir(s: SparkSession, dir: String): String =
    warcFixtureLock.synchronized {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      sweepDeadScratch(tmp, Seq("graft_warcmime_"))
      val out = new java.io.File(tmp, s"graft_warcmime_${runTag(dir)}")
      val marker = new java.io.File(out, "_SUCCESS")
      if (!marker.exists()) {
        val body = udf { (id: Long, text: String) =>
          (id % 5).toInt match {
            case 0 => Multimodal.syntheticPngPixelPayload(id)
            case 1 => graft.expr.PdfOps.syntheticPdf(id, text, flate = true)
            case 2 => ("<!doctype html>\n<html><body><p>" + text +
              "</p></body></html>\n")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            case 3 => Multimodal.syntheticWavPayload(id)
            case _ => text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          }
        }
        val declared = when(col("doc_id") % 5 === 0, "text/html")
          .when(col("doc_id") % 5 === 1, "image/png")
          .when(col("doc_id") % 5 === 2, "application/octet-stream")
          .when(col("doc_id") % 5 === 3, "text/plain")
          .otherwise("application/pdf")
        val docs = t(s, dir, "documents").select(col("doc_id"),
          concat(lit("https://mm."), col("source"), lit(".example.com/r/"),
            col("doc_id").cast("string")).as("uri"),
          body(col("doc_id"), col("text")).as("body"),
          declared.as("ct"))
        ingest.WarcIngest.writeResponsesWarc(s, docs, "doc_id", "uri", "body",
          "ct", out.getAbsolutePath, nFiles = 4)
        marker.createNewFile()
      }
      out.getAbsolutePath
    }

  /** Write-once-per-process REDIRECT archives: doc_id % 5 == 3 pages
    * respond 301 → the mode-0 page three ids back; mode-4 pages respond
    * 302 → the mode-3 page one id back (a two-hop chain 302→301→200);
    * everything else serves the page. The chain targets live in the
    * same archive — the loop a crawler actually has to resolve. */
  private def warcRedirFixtureDir(s: SparkSession, dir: String): String =
    warcFixtureLock.synchronized {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      sweepDeadScratch(tmp, Seq("graft_warcredir_"))
      val out = new java.io.File(tmp, s"graft_warcredir_${runTag(dir)}")
      val marker = new java.io.File(out, "_SUCCESS")
      if (!marker.exists()) {
        val base = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text"))
        def urlOf(idc: Column, srcc: Column): Column =
          concat(lit("https://www."), srcc, lit(".example.com/docs/"),
            idc.cast("string"))
        val t3 = base.select(col("doc_id").as("t3_id"),
          col("source").as("t3_src"))
        val t1 = base.select(col("doc_id").as("t1_id"),
          col("source").as("t1_src"))
        val payload = udf { (id: Long, text: String, loc3: String,
                             loc1: String) =>
          val ascii = java.nio.charset.StandardCharsets.UTF_8
          def redirect(code: Int, reason: String, loc: String) =
            (s"HTTP/1.1 $code $reason\r\nLocation: $loc\r\n" +
              "Content-Length: 0\r\n\r\n").getBytes(ascii)
          (id % 5).toInt match {
            case 3 if loc3 != null => redirect(301, "Moved Permanently", loc3)
            case 4 if loc1 != null => redirect(302, "Found", loc1)
            case _ =>
              val page = ("<html><body><p>" + text.replace("&", "&amp;")
                .replace("<", "&lt;").replace(">", "&gt;") +
                "</p></body></html>\n").getBytes(ascii)
              (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
                s"Content-Length: ${page.length}\r\n\r\n").getBytes(ascii) ++ page
          }
        }
        val docs = base
          .join(t3, col("doc_id") - 3 === col("t3_id"), "left")
          .join(t1, col("doc_id") - 1 === col("t1_id"), "left")
          .select(col("doc_id"),
            urlOf(col("doc_id"), col("source")).as("uri"),
            payload(col("doc_id"), col("text"),
              urlOf(col("t3_id"), col("t3_src")),
              urlOf(col("t1_id"), col("t1_src"))).as("payload"))
        ingest.WarcIngest.writeHttpResponsesWarc(s, docs, "doc_id", "uri",
          "payload", out.getAbsolutePath, nFiles = 4)
        marker.createNewFile()
      }
      out.getAbsolutePath
    }

  /** The sitemap fixture's parsed url-entries (domain, kind, loc,
    * lastmod), index→child resolution included — shared by the seeds
    * and recrawl-plan queries: even-k domains publish one direct
    * urlset, odd-k domains a sitemapindex whose two children are only
    * reachable through the index join. */
  /** The raw sitemap DOCUMENT frame (domain, url, xml): every domain's
    * /sitemap.xml (even-k: a direct urlset; odd-k: a sitemapindex) plus
    * the odd-k domains' two child urlsets at their own URLs. */
  private def sitemapDocs(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "documents").select(col("source")).distinct()
      .withColumn("domain", concat(col("source"), lit(".example.com")))
      .withColumn("k",
        regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 25)
    val roots = src.select(col("domain"),
      concat(lit("https://www."), col("domain"), lit("/sitemap.xml"))
        .as("url"),
      when(col("k") % 2 === 0,
        operators.Sitemap.syntheticUrlset(col("domain"), col("k"), 0, 10))
        .otherwise(operators.Sitemap.syntheticIndex(col("domain")))
        .as("xml"))
    val children = src.select(col("domain"),
        concat(lit("https://www."), col("domain"), lit("/sitemap-1.xml"))
          .as("url"),
        operators.Sitemap.syntheticUrlset(col("domain"), col("k"), 0, 5)
          .as("xml"))
      .unionByName(src.select(col("domain"),
        concat(lit("https://www."), col("domain"), lit("/sitemap-2.xml"))
          .as("url"),
        operators.Sitemap.syntheticUrlset(col("domain"), col("k"), 5, 10)
          .as("xml")))
      .filter(regexp_extract(col("domain"), "(\\d+)", 1).cast("long")
        % 25 % 2 === 1)
    roots.unionByName(children)
  }

  /** Binary sitemap fixture: the [[sitemapDocs]] documents as BYTES
    * with a deterministic codec mix — roots of k%3!=0 domains and every
    * sitemap-1 child are GZIPPED (so gzipped `<urlset>`, gzipped
    * `<sitemapindex>`, and gzipped children all carry rows), the rest
    * plain UTF-8. Same URLs as the text fixture (no `.gz` suffix —
    * detection must be by magic, the wild serves gzip under plain
    * names), so the index→child join is unchanged and codec
    * transparency is the only variable under test. */
  private def sitemapDocsGz(s: SparkSession, dir: String): DataFrame = {
    val gz = udf { (xml: String, doGz: Boolean) =>
      if (!doGz) xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      else {
        val bos = new java.io.ByteArrayOutputStream(xml.length / 2 + 64)
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(xml.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        g.close()
        bos.toByteArray
      }
    }
    val k = regexp_extract(col("domain"), "(\\d+)", 1).cast("long") % 25
    val doGz = when(col("url").endsWith("/sitemap.xml"), k % 3 =!= 0)
      .when(col("url").endsWith("/sitemap-1.xml"), lit(true))
      .otherwise(lit(false))
    sitemapDocs(s, dir).select(col("domain"), col("url"),
      gz(col("xml"), doGz).as("bytes"))
  }

  /** The fixture's parsed url-entries (domain, kind, loc, lastmod) from
    * a given set of ROOT sitemap documents: index→child resolution via
    * the join on the child's own URL. Shared by seeds / recrawl-plan /
    * the robots-chain query. */
  private def sitemapEntriesFrom(s: SparkSession, dir: String,
                                 roots: DataFrame): DataFrame = {
    val xmls = sitemapDocs(s, dir)
    val rootEntries = operators.Sitemap.parseEntries(roots, "xml")
    val childEntries = operators.Sitemap.parseEntries(
      xmls.join(broadcast(rootEntries.filter(col("kind") === "sitemap")
        .select(col("loc").as("url"))), Seq("url")), "xml")
    rootEntries.filter(col("kind") === "url")
      .select(col("domain"), col("kind"), col("loc"), col("lastmod"),
        col("changefreq"), col("priority"))
      .unionByName(childEntries.filter(col("kind") === "url")
        .select(col("domain"), col("kind"), col("loc"), col("lastmod"),
          col("changefreq"), col("priority")))
  }

  private def sitemapUrlEntries(s: SparkSession, dir: String): DataFrame =
    sitemapEntriesFrom(s, dir, sitemapDocs(s, dir)
      .filter(col("url").endsWith("/sitemap.xml")))

  /** Head-directive fixture page: a `<base>` on every third document,
    * a `rel=canonical` onto a shared /docs/c<id%5> target on evens, a
    * robots `<meta>` rotating noindex+nofollow / nofollow / explicit
    * index,follow / absent by id%4, and a two-anchor body (one rooted,
    * one relative) for the gate's link-vote count. */
  private def headFixtureHtml: Column = {
    val host = concat(lit("https://www."), col("source"),
      lit(".example.com"))
    concat(
      lit("<html><head><title>d</title>"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        lit("<base href=\"/assets/\">")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(2)) === 0,
        concat(lit("<link rel=\"canonical\" href=\""), host,
          lit("/docs/c"), pmod(col("doc_id"), lit(5)), lit("\">")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(4)) === 0,
        lit("<meta name=\"robots\" content=\"noindex, nofollow\">"))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          lit("<meta name=\"robots\" content=\"nofollow\">"))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          lit("<meta name=\"robots\" content=\"index, follow\">"))
        .otherwise(lit("")),
      lit("</head><body><p>Body.</p>" +
        "<a href=\"/l1\">One</a><a href=\"l2\">Two</a></body></html>"))
  }

  /** The q_html_tables computation (fixture page → typed cell rows) as
    * a pure per-row projection over a (doc_id, text) frame — shared
    * verbatim by the batch query and its streaming twin. */
  private val htmlTableRows: DataFrame => DataFrame = docs => {
      val words6 = slice(filter(split(col("text"), " "),
      w => length(w) > 0), 1, 6)
    val dataRows = transform(words6, (w, i) => concat(
      lit("<tr><td>"), i, lit("</td><td><b>"), w,
      lit("</b></td><td>"), length(w),
      lit("</td><td>a&amp;b</td></tr>")))
    val html = concat(
      lit("<html><body><p>intro prose outside any table</p>" +
        "<table><tr><th>Idx</th><th> Word </th><th>Len</th>" +
        "<th>Note</th></tr>"),
      array_join(dataRows, ""),
      lit("</table><table><tr><td>total</td><td>"), size(words6),
      lit("</td></tr></table></body></html>"))
    docs.select(col("doc_id"),
        explode(graft.expr.HtmlExpressions.html_table_cells(html))
          .as("cell"))
      .select(col("doc_id"), col("cell.t").cast("long").as("t"),
        col("cell.r").cast("long").as("r"),
        col("cell.c").cast("long").as("c"),
        col("cell.header").as("header"), col("cell.cell").as("cell"))
  }

  /** The q_html_links computation (fixture page → extracted, resolved,
    * canonicalized link rows) as a pure per-row projection over a
    * (doc_id, source) frame — shared verbatim by the batch query and
    * its streaming twin. */
  private val htmlLinksRows: DataFrame => DataFrame = docs => {
    val slot = pmod(col("doc_id"), lit(25)).cast("string")
    val id = col("doc_id").cast("string")
    val pageUrl = concat(lit("https://www."), col("source"),
      lit(".example.com/docs/"), slot, lit("/"))
    val html = concat(
      lit("<html><body><p>Intro text.</p>"),
      lit("<a href=\"https://www."), col("source"),
      lit(".example.com/article/"), id, lit("\">Read <b>more</b></a>"),
      lit("<a href=\"sub/page-"), pmod(col("doc_id"), lit(7)),
      lit("\">Sub page</a>"),
      lit("<a href=\"../up-"), pmod(col("doc_id"), lit(5)),
      lit("\">Up one</a>"),
      lit("<a href=\"/top-"), pmod(col("doc_id"), lit(3)),
      lit("\">Top</a>"),
      lit("<a href=\"//cdn."), col("source"), lit(".example.com/lib-"),
      pmod(col("doc_id"), lit(4)), lit("\">CDN</a>"),
      lit("<a href=\"?page="), pmod(col("doc_id"), lit(6)),
      lit("\">Next</a>"),
      lit("<a href=\"#sec\">Same page</a>"),
      lit("<a href=\"mailto:info@"), col("source"),
      lit(".example.com\">Mail</a>"),
      lit("<a rel=\"nofollow\" href=\"/out-"), pmod(col("doc_id"), lit(2)),
      lit("\">Ad &amp; out</a>"),
      lit("</body></html>"))
    docs.select(col("doc_id"), pageUrl.as("page_url"),
        posexplode(graft.expr.HtmlExpressions.html_links(html))
          .as(Seq("idx", "l")))
      .select(col("doc_id"), col("idx").cast("long").as("idx"),
        col("l.href").as("href"),
        graft.expr.UrlExpressions.url_canonicalize(
          graft.expr.UrlExpressions.url_resolve(col("page_url"),
            col("l.href"))).as("resolved"),
        col("l.anchor").as("anchor"), col("l.nofollow").as("nofollow"))
  }

  /** The q_image_text_pairs computation (fixture page → extracted,
    * base-resolved, canonicalized image-text pairs) as a pure per-row
    * projection over a (doc_id, source, text) frame — shared verbatim
    * by the batch query and its streaming twin. Three `<img>` shapes
    * per document: a figure image (relative src, figcaption caption),
    * an inline image (rooted src, surrounding-block caption, entity in
    * the alt), and a bare protocol-relative image (no alt/title/text —
    * the empty-signal control). Every third document carries a
    * `<base href="/media/">`, so resolution must route through the
    * head parse, not the page URL alone. */
  private val htmlImageRows: DataFrame => DataFrame = docs => {
    val slot = pmod(col("doc_id"), lit(25)).cast("string")
    val id = col("doc_id").cast("string")
    val pageUrl = concat(lit("https://www."), col("source"),
      lit(".example.com/docs/"), slot, lit("/"))
    val words3 = array_join(slice(filter(split(col("text"), " "),
      w => length(w) > 0), 1, 3), " ")
    val html = concat(
      lit("<html><head>"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        lit("<base href=\"/media/\">")).otherwise(lit("")),
      lit("</head><body>"),
      lit("<figure><img src=\"img/"), id,
      lit(".png\" alt=\"fig-"), pmod(col("doc_id"), lit(13)),
      lit("\" title=\"t"), pmod(col("doc_id"), lit(7)), lit("\">"),
      lit("<figcaption>Figure "), slot, lit(": "), words3,
      lit("</figcaption></figure>"),
      lit("<p>Context before <img src=\"/abs/"),
      pmod(col("doc_id"), lit(9)),
      lit(".jpg\" alt=\"inline-"), pmod(col("doc_id"), lit(5)),
      lit(" &amp; co\"> context after.</p>"),
      lit("<p><img src=\"//cdn."), col("source"),
      lit(".example.com/c"), pmod(col("doc_id"), lit(4)),
      lit(".webp\"></p>"),
      lit("</body></html>"))
    val head = graft.expr.HtmlExpressions.html_head(html).as("h")
    docs.select(col("doc_id"), pageUrl.as("page_url"), head,
        posexplode(graft.expr.HtmlExpressions.html_images(html))
          .as(Seq("idx", "im")))
      .select(col("doc_id"), col("idx").cast("long").as("idx"),
        col("im.src").as("src"),
        graft.expr.UrlExpressions.url_canonicalize(
          graft.expr.UrlExpressions.url_resolve(
            when(col("h.base").isNotNull,
              graft.expr.UrlExpressions.url_resolve(col("page_url"),
                col("h.base"))).otherwise(col("page_url")),
            col("im.src"))).as("resolved"),
        col("im.alt").as("alt"), col("im.title").as("title"),
        col("im.caption").as("caption"))
  }

  /** The q_interleaved_docs computation (fixture page → ordered
    * text/image item sequence) as a pure per-row projection — shared
    * verbatim by the batch query and its streaming twin. The fixture
    * alternates content paragraphs, image slots, a fully-linked nav
    * run (boilerplate — dropped), and a short trailing run that
    * inherits the boilerplate label (dropped), so the emitted sequence
    * exercises every classification branch while staying replayable:
    * positions 0..3 = text, image, image, text. */
  private val htmlInterleavedRows: DataFrame => DataFrame = docs => {
    val id = col("doc_id").cast("string")
    val words5 = array_join(slice(filter(split(col("text"), " "),
      w => length(w) > 0), 1, 5), " ")
    val words3 = array_join(slice(filter(split(col("text"), " "),
      w => length(w) > 0), 1, 3), " ")
    val html = concat(
      lit("<html><body>"),
      lit("<p>Opening paragraph for document "), id, lit(" about "),
      words5, lit(" with enough length.</p>"),
      lit("<img src=\"/img/"), id, lit(".png\" alt=\"one-"),
      pmod(col("doc_id"), lit(13)), lit("\">"),
      lit("<p><a href=\"/nav\">site navigation menu</a></p>"),
      lit("<img src=\"//cdn."), col("source"), lit(".example.com/m"),
      pmod(col("doc_id"), lit(7)), lit(".webp\">"),
      lit("<p>Tail.</p>"),
      lit("<p>Closing paragraph reciting "), words3,
      lit(" once more for position four.</p>"),
      lit("</body></html>"))
    docs.select(col("doc_id"),
        explode(graft.expr.HtmlExpressions.html_interleaved(html))
          .as("it"))
      .select(col("doc_id"), col("it.pos").cast("long").as("pos"),
        col("it.kind").as("kind"), col("it.text").as("text"),
        col("it.src").as("src"), col("it.alt").as("alt"))
  }

  /** The q_html_markdown computation (fixture page → rendered markdown)
    * as a pure per-row projection over a (doc_id, text) frame — shared
    * verbatim by the batch query and its streaming twin. */
  private val htmlMarkdownRows: DataFrame => DataFrame = docs => {
    val id = col("doc_id").cast("string")
    val words2 = array_join(slice(filter(split(col("text"), " "),
      w => length(w) > 0), 1, 2), " ")
    val words3 = array_join(slice(filter(split(col("text"), " "),
      w => length(w) > 0), 1, 3), " ")
    val html = concat(
      lit("<html><body><h1>Doc "), id, lit("</h1>"),
      lit("<p>Intro <b>"), words2, lit("</b> and <a href=\"/l/"),
      pmod(col("doc_id"), lit(7)), lit("\">link "),
      pmod(col("doc_id"), lit(5)), lit("</a>.</p>"),
      lit("<ul><li>item "), pmod(col("doc_id"), lit(3)),
      lit("</li><li>item b</li></ul>"),
      lit("<blockquote>note "), words3, lit("</blockquote>"),
      lit("<p><img src=\"/img/"), id, lit(".png\" alt=\"pic "),
      pmod(col("doc_id"), lit(9)), lit("\"></p>"),
      lit("</body></html>"))
    docs.select(col("doc_id"),
      graft.expr.HtmlExpressions.html_markdown(html).as("markdown"))
  }

  /** SFT-assembly turn fixture: conversations of four turns (doc_id/4),
    * alternating user/assistant roles, turn text from each document's
    * first four words — shared by the assembly query and the packing
    * capstone so the oracle's length arithmetic is derived once. */
  private def sftAssembleTurns(s: SparkSession, dir: String): DataFrame = {
    val words4 = array_join(slice(filter(split(col("text"), " "),
      w => length(w) > 0), 1, 4), " ")
    t(s, dir, "documents").select(
      floor(col("doc_id") / 4).cast("long").as("conv_id"),
      pmod(col("doc_id"), lit(4)).cast("long").as("turn_idx"),
      when(pmod(col("doc_id"), lit(2)) === 0, "user")
        .otherwise("assistant").as("role"),
      concat(lit("Turn "), pmod(col("doc_id"), lit(4)).cast("string"),
        lit(": "), words4).as("text"))
  }

  /** Preference-candidate fixture: five scored candidates per prompt
    * (doc_id/5), candidate text from each document's first five words,
    * score = (doc_id·37) mod 100 — except every tenth prompt, whose
    * candidates all score a FLAT 50 (the no-signal contract probe).
    * Shared by the pair query, its streaming twin, and the best-of-n
    * export so all three provably rank the same candidates. */
  private def prefCandidates(s: SparkSession, dir: String): DataFrame = {
    val words5 = array_join(slice(filter(split(col("text"), " "),
      w => length(w) > 0), 1, 5), " ")
    val promptId = floor(col("doc_id") / 5).cast("long")
    t(s, dir, "documents").select(promptId.as("prompt_id"),
      col("doc_id").as("cand_id"),
      concat(lit("Cand "), pmod(col("doc_id"), lit(5)).cast("string"),
        lit(": "), words5).as("text"),
      when(pmod(promptId, lit(10)) === 0, lit(50L))
        .otherwise(pmod(col("doc_id") * 37, lit(100)))
        .cast("long").as("score"))
  }

  /** The q_sft_assemble computation (turns → per-turn span rows) as a
    * projection over a turn frame — shared verbatim by the batch query
    * and its streaming twin (conversation-complete micro-batches make
    * the per-batch aggregate exact). */
  private val sftAssembleProjected: DataFrame => DataFrame = turns =>
    operators.Sft.assemble(turns, "conv_id", "turn_idx", "role", "text")
      .select(col("conversation_id"), col("n_turns"),
        length(col("rendered")).cast("long").as("rendered_len"),
        explode(col("spans")).as("sp"))
      .select(col("conversation_id"), col("n_turns"), col("rendered_len"),
        col("sp.turn_idx").as("turn_idx"), col("sp.role").as("role"),
        col("sp.start_char").as("start_char"),
        col("sp.end_char").as("end_char"),
        col("sp.content_start").as("content_start"),
        col("sp.content_end").as("content_end"),
        col("sp.train").as("train"))

  /** The q_sft_assemble_tokens computation (turns → per-turn TOKEN-span
    * rows under the frozen BPE) as a projection over a turn frame —
    * shared verbatim by the batch query and its streaming twin (the
    * grouped-runner contract makes the per-batch aggregate exact). */
  private val sftTokenAssembleProjected: DataFrame => DataFrame = turns =>
    operators.Sft.assembleTokenSpans(turns, "conv_id", "turn_idx", "role",
        "text", operators.BpeTokenizer.frozenMerges)
      .select(col("conversation_id"), col("n_turns"), col("n_tokens"),
        explode(col("spans")).as("sp"))
      .select(col("conversation_id"), col("n_turns"), col("n_tokens"),
        col("sp.turn_idx").as("turn_idx"), col("sp.role").as("role"),
        col("sp.start_tok").as("start_tok"),
        col("sp.end_tok").as("end_tok"),
        col("sp.content_start").as("content_start"),
        col("sp.content_end").as("content_end"),
        col("sp.train").as("train"))

  /** SFT-dedup turn fixture: conversations of four turns (doc_id/4),
    * grouped three-by-three (conv_id/3) onto a shared group-keyed token
    * text, so each group plants one dedup cluster: conversations 0 and
    * 1 of the group carry identical words (conversation 1 UPPERCASED
    * when `caseVariant` — the normalization probe), conversation 2
    * appends one trailing token to its last turn (the near-dup probe:
    * 11 of 12 trigram shingles shared). Token streams are group-keyed
    * in every 3-gram window, so cross-group shingle overlap is zero by
    * construction. */
  private def sftDedupTurns(s: SparkSession, dir: String,
                            caseVariant: Boolean): DataFrame = {
    val docs = t(s, dir, "documents")
    val convId = floor(col("doc_id") / 4).cast("long")
    val k = pmod(col("doc_id"), lit(4))
    val grp = floor(convId / 3).cast("long").cast("string")
    val v = pmod(convId, lit(3))
    val base = concat(lit("sft"), grp, lit("a sft"), grp, lit("b sft"),
      grp, lit("c turn"), k.cast("string"),
      when(v === 2 && k === 3, lit(" extra")).otherwise(lit("")))
    val text = if (caseVariant) when(v === 1, upper(base)).otherwise(base)
      else base
    docs.select(convId.as("conv_id"), k.cast("long").as("turn_idx"),
      when(pmod(col("doc_id"), lit(2)) === 0, "user")
        .otherwise("assistant").as("role"),
      text.as("text"))
  }

  /** Hreflang fixture page: en/de alternates on every document, fr on
    * evens, and an x-default naming the cluster representative (the
    * slot page's English variant) — so pages sharing doc_id%25 within a
    * source form one language cluster. */
  private def altFixtureHtml: Column = {
    val host = concat(lit("https://www."), col("source"),
      lit(".example.com"))
    val slot = pmod(col("doc_id"), lit(25)).cast("string")
    concat(
      lit("<html><head>"),
      lit("<link rel=\"alternate\" hreflang=\"en\" href=\""), host,
      lit("/en/"), slot, lit("\">"),
      lit("<link rel=\"alternate\" hreflang=\"de\" href=\""), host,
      lit("/de/"), slot, lit("\">"),
      when(pmod(col("doc_id"), lit(2)) === 0,
        concat(lit("<link rel=\"alternate\" hreflang=\"fr\" href=\""),
          host, lit("/fr/"), slot, lit("\">"))).otherwise(lit("")),
      lit("<link rel=\"alternate\" hreflang=\"x-default\" href=\""), host,
      lit("/en/"), slot, lit("\">"),
      lit("</head><body><p>Body.</p></body></html>"))
  }

  /** Crawl-trap fixture pages — three URL shapes per document on its
    * source's host: a unique-content /article/<id>-<id%97>, an
    * infinite-calendar /cal/2026/<m>/<d>?sid=<hex12> whose content is
    * ONE boilerplate page per source, and a /list?page=<p>&ref=<id>
    * paginator cycling 40 content variants. Pure Column ops so the
    * streaming twin applies it to the document STREAM unchanged. */
  private val trapFixturePages: DataFrame => DataFrame = docs => {
    val host = concat(lit("https://www."), col("source"),
      lit(".example.com"))
    docs.select(explode(array(
        struct(
          concat(host, lit("/article/"), col("doc_id"), lit("-"),
            pmod(col("doc_id"), lit(97))).as("url"),
          xxhash64(col("text")).as("fp")),
        struct(
          concat(host, lit("/cal/2026/"),
            pmod(col("doc_id"), lit(12)) + 1, lit("/"),
            pmod(col("doc_id"), lit(28)) + 1, lit("?sid="),
            lower(lpad(hex(col("doc_id")), 12, "0"))).as("url"),
          xxhash64(concat(col("source"), lit("#cal"))).as("fp")),
        struct(
          concat(host, lit("/list?page="), pmod(col("doc_id"), lit(40)),
            lit("&ref="), col("doc_id")).as("url"),
          xxhash64(concat(col("source"), lit("#page"),
            pmod(col("doc_id"), lit(40)))).as("fp")))).as("p"))
      .select(col("p.url").as("url"), col("p.fp").as("fp"))
  }

  /** Write-once-per-process TWO-CRAWL archives for the revisit story:
    * crawl 1 (c1/) captures every page; crawl 2 (c2/) stores the
    * unchanged third (doc_id % 3 == 0) as payload-free `revisit`
    * records pointing at the c1 capture via WARC-Refers-To, and
    * re-captures the rest with updated content (text + " v2") — the
    * ISO 28500 mechanism consecutive crawls use to avoid re-storing the
    * stable majority of the web. */
  private def warcRevisitFixtureDir(s: SparkSession, dir: String): String =
    warcFixtureLock.synchronized {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      sweepDeadScratch(tmp, Seq("graft_warcrev_"))
      val out = new java.io.File(tmp, s"graft_warcrev_${runTag(dir)}")
      val marker = new java.io.File(out, "_SUCCESS")
      if (!marker.exists()) {
        val docs = t(s, dir, "documents").select(col("doc_id"),
          concat(lit("https://www."), col("source"), lit(".example.com/docs/"),
            col("doc_id").cast("string")).as("uri"),
          col("text"))
        ingest.WarcIngest.writeSyntheticWarc(s,
          docs.select(col("doc_id"), col("uri"),
            operators.TextExtract.syntheticHtml(col("doc_id"), col("text"))
              .as("body")),
          "doc_id", "uri", "body", s"${out.getAbsolutePath}/c1", nFiles = 4)
        val framed = udf { (id: Long, uri: String, html: Array[Byte]) =>
          if (id % 3 == 0)
            ingest.WarcIngest.revisitRecord(id, uri, s"<urn:graft:doc:$id>")
          else ingest.WarcIngest.responseRecord(id, uri, html,
            "text/html; charset=utf-8")
        }
        ingest.WarcIngest.writeFramedWarc(s,
          docs.select(col("doc_id"),
            framed(col("doc_id"), col("uri"),
              operators.TextExtract.syntheticHtml(col("doc_id"),
                concat(col("text"), lit(" v2"))).cast("binary")).as("rec")),
          "doc_id", "rec", s"${out.getAbsolutePath}/c2", nFiles = 4)
        marker.createNewFile()
      }
      out.getAbsolutePath
    }

  /** Exact sum: decimal arithmetic, double surface. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  private val streamCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Entity-resolution fixture: parts < 300 as clean records plus one
    * deliberately corrupted twin each (id + 100000) — one character
    * replaced by '#' at a key-derived position that alternates between
    * the first three and the last three characters, so BOTH blocking
    * passes get exercised while the two-pass completeness bound
    * (EntityResolution object doc) provably covers every planted edit:
    * the corruption never lands on the one central position where the
    * length-7 windows overlap. The oracle replays the same synthesis. */
  /** Shared retrieval-eval fixture: the %25==7 vectors query the rest of
    * the embeddings via exact cosine top-10; graded relevance is label
    * proximity (3 − |Δlabel|, clamped at 0). Feeds both the nDCG and the
    * binary rank-metric queries so the two metric families provably
    * score the SAME ranking. */
  private def retrievalEvalRanked(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val isQ = pmod(col("vec_id"), lit(25)) === 7
    val qLab = emb.filter(isQ).select(col("vec_id").as("query"),
      col("label").cast("long").as("__ql"))
    val cLab = emb.filter(!isQ).select(col("vec_id").as("neighbor_id"),
      col("label").cast("long").as("__cl"))
    Similarity.cosineTopK(emb.filter(isQ), emb.filter(!isQ), k = 10)
      .select(col("query_id").as("query"), col("rank"), col("neighbor_id"))
      .join(broadcast(qLab), "query").join(broadcast(cLab), "neighbor_id")
      .withColumn("rel",
        greatest(lit(0L), lit(3L) - abs(col("__ql") - col("__cl"))))
  }

  /** The rank-shape half of the retrieval contract, shared by the ANN
    * verify siblings and the round-14 headliner folds: scores
    * non-increasing in rank, ranks contiguous AND distinct (min==1 &&
    * max==count alone would pass a duplicate-plus-gap pattern like
    * {1,2,2,4}). Violations frame (query_id, rank, issue). */
  private def rankShapeViolations(res: DataFrame, scoreCol: String): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    val badOrder = res
      .withColumn("__prev", lag(col(scoreCol), 1).over(w))
      .filter(col("__prev").isNotNull && col(scoreCol) > col("__prev"))
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        lit("rank_not_monotone").as("issue"))
    val badSeq = res.groupBy(col("query_id"))
      .agg(count(lit(1)).as("__n"), min(col("rank")).as("__lo"),
        max(col("rank")).as("__hi"), countDistinct(col("rank")).as("__d"))
      .filter(!(col("__lo") === 1 && col("__hi") === col("__n") &&
        col("__d") === col("__n")))
      .select(col("query_id"), lit(null).cast("long").as("rank"),
        lit("rank_gap").as("issue"))
    badOrder.unionByName(badSeq)
  }

  /** Round-14 ANN headliner fold: per query, the result count plus
    * "no contract violation touched this query" — WHICH neighbors the
    * probes reach stays engine-internal (and in the API); what the
    * driver gates is the deterministic retrieval contract. */
  private def annContract(res: DataFrame, viol: DataFrame): DataFrame =
    res.groupBy(col("query_id")).agg(count(lit(1)).as("n_results"))
      .join(viol.select(col("query_id")).distinct()
        .withColumn("__bad", lit(true)), Seq("query_id"), "left")
      .select(col("query_id"), col("n_results"),
        col("__bad").isNull.as("contract_ok"))
      .orderBy(col("query_id"))

  private def erRecords(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").filter(col("p_partkey") < 300)
      .select(col("p_partkey"), col("p_name"))
    val pos = when(pmod(col("p_partkey"), lit(2)) === 0,
        lit(1) + pmod(col("p_partkey"), lit(3)))
      .otherwise(length(col("p_name")) - pmod(col("p_partkey"), lit(3)))
      .cast("int")
    val clean = p.select(col("p_partkey").cast("long").as("rec_id"),
      col("p_name").as("name"))
    val dirty = p.select((col("p_partkey") + 100000L).cast("long").as("rec_id"),
      concat(col("p_name").substr(lit(1), pos - 1), lit("#"),
        col("p_name").substr(pos + 1, lit(64))).as("name"))
    clean.unionAll(dirty)
  }

  // ---- independent recompute paths for the *_verify property queries ----
  // Each approximate query (q_dedup_minhash/_simhash/_embedding,
  // q_sim_topk_ivf) has a sibling that re-derives every emitted pair's
  // EXACT similarity through a different implementation (pure built-in
  // expression HOFs, no graft UDF/expression) and emits only violations —
  // candidates are approximate, the verification property is exact. The
  // DuckDB oracle for such a query is the same-schema EMPTY relation, so a
  // single below-threshold or mis-scored emitted pair turns the driver's
  // row-count compare red.

  /** Tokenization for the jaccard recompute — same rule as
    * [[Dedup.tokens]]: lower/trim/whitespace split. Callers must BIND this
    * to a column (`.withColumn`) before feeding [[builtinNgramJaccard]]:
    * a HOF lambda over the raw split expression re-tokenizes the text for
    * every element access — the O(tokens²) trap measured and fixed in
    * bigramLogProb (12.9s → 1.8s). The alias survives CollapseProject
    * because it is referenced more than once.
    *
    * The empty-token filter inside [[Dedup.cleanTokens]] is load-bearing
    * here: without it, a doc with leading/trailing tab/newline grows a
    * stray "" token, shifts every n-gram, and raises a FALSE verify
    * violation (see cleanTokens' scaladoc for the Spark-vs-Java split
    * semantics). */
  private def builtinTokens(text: Column): Column = Dedup.cleanTokens(text)

  /** Word n-gram jaccard over BOUND token-array columns with built-ins
    * only (sequence/slice/array_join/array_distinct/array_intersect/
    * array_union) — independent of [[Dedup.shingles]]'s UDF and of the
    * hashed-set verify path, but the same semantics: docs shorter than n
    * collapse to one whole-text shingle. */
  private def builtinNgramJaccard(toksA: Column, toksB: Column, n: Int): Column = {
    def grams(toks: Column): Column =
      when(size(toks) < n, array(array_join(toks, " ")))
        .otherwise(array_distinct(transform(
          sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " "))))
    val (ga, gb) = (grams(toksA), grams(toksB))
    size(array_intersect(ga, gb)).cast("double") /
      size(array_union(ga, gb)).cast("double")
  }

  /** Cosine over float-array columns with built-in HOFs (zip_with +
    * aggregate, left-to-right double accumulation — the same order as the
    * native FloatVecDot expression, so results are bit-identical). */
  private def builtinCosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column = aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    def norm(x: Column): Column = sqrt(aggregate(
      transform(x, p => p.cast("double") * p.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    dot(a, b) / (norm(a) * norm(b))
  }

  /** SUB-BLOCK-GROUPED cosine with built-in HOFs — the exact accumulation
    * order of [[operators.ProductQuantize.adcTopK]]'s scorer (flat
    * left-to-right within each dsub block, blocks added in order), so the
    * recompute is bit-identical to the UDF's doubles. A flat whole-vector
    * fold would differ in the last ulp (float addition is non-associative)
    * and flip 6dp rounding on boundary values. */
  private def builtinBlockCosine(a: Column, b: Column, m: Int, dsub: Int): Column = {
    def blockDot(i: Int, x: Column, y: Column): Column = aggregate(
      zip_with(slice(x, i * dsub + 1, dsub), slice(y, i * dsub + 1, dsub),
        (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val num = (0 until m).map(i => blockDot(i, a, b)).reduce(_ + _)
    val qn = (0 until m).map(i => blockDot(i, a, a)).reduce(_ + _)
    val cn = (0 until m).map(i => blockDot(i, b, b)).reduce(_ + _)
    num / (sqrt(qn) * sqrt(cn))
  }

  // ------------------------------------------------------------ query bodies

  private def latestOrderPerCustomer(o: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    o.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
  }

  private def flagship(spark: SparkSession, dir: String): DataFrame = {
    val latest = latestOrderPerCustomer(t(spark, dir, "orders"))
    latest
      .join(broadcast(t(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_3")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("n_name"),
        (year(asOf) - year(col("o_orderdate"))).cast("long").as("age_years"),
        when(datediff(asOf, col("o_orderdate").cast("date")) > 30, true)
          .otherwise(false).as("stale"))
      .orderBy(col("o_custkey"))
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    flagship(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- parity operators (SURVEY.md §2) ----
    "q_w1_latest_order" -> ((s, dir) =>
      latestOrderPerCustomer(t(s, dir, "orders"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .orderBy(col("o_custkey"))),

    "q_a1_distinct" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderstatus").as("status")).distinct()
        .filter(col("status").isNotNull && col("status") =!= "")
        .orderBy(col("status"))),

    "q_u1_union_by_name" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val evens = c.filter(col("c_custkey") % 2 === 0).select(col("c_custkey"), col("c_name"))
      val odds = c.filter(col("c_custkey") % 2 === 1).select(col("c_custkey"), col("c_acctbal"))
      evens.unionByName(odds, allowMissingColumns = true).orderBy(col("c_custkey"))
    }),

    "q_p3_coalesce" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"),
        coalesce(when(col("c_mktsegment") === "BUILDING", lit(null)).otherwise(col("c_mktsegment")),
          col("c_name")).as("resolved"))
        .orderBy(col("c_custkey"))),

    "q_p6_validity_filter" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(when(col("o_orderstatus") === "O", lit(null)).otherwise(col("o_orderstatus")).isNotNull
          && col("o_orderpriority").isNotNull && col("o_orderpriority") =!= "")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))),

    "q_e1_date_roundtrip" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
        // zero-padded formats: an unpadded "7/4/1996" compacts to only 6
        // digits and is (faithfully) invalid under the reference parser
        GraftFunctions.parse_date(date_format(col("o_orderdate"), "MM/dd/yyyy")).as("d_slash"),
        GraftFunctions.parse_date(date_format(col("o_orderdate"), "MM-dd-yyyy")).as("d_dash"),
        GraftFunctions.parse_date(date_format(col("o_orderdate"), "Mddyyyy")).as("d_compact"))
        .orderBy(col("o_orderkey"))),

    // E2: the validation split — deterministically corrupt every 7th date
    // and check both channels (error message + nulled value) of one parse.
    "q_e2_validation_split" -> ((s, dir) => {
      val raw = when(col("o_orderkey") % 7 === 0,
          concat(lit("13"), date_format(col("o_orderdate"), "ddyyyy")))
        .otherwise(date_format(col("o_orderdate"), "MMddyyyy"))
      val parsed = GraftFunctions.parse_date_struct(raw)
      t(s, dir, "orders").select(col("o_orderkey"),
        parsed.getField("error").as("validation_error"),
        parsed.getField("value").as("parsed"))
        .orderBy(col("o_orderkey"))
    }),

    "q_e4_e5_derived" -> ((s, dir) => {
      val consul = when(col("o_orderstatus") === "O", lit(null).cast("date"))
        .otherwise(col("o_orderdate").cast("date"))
      t(s, dir, "orders").select(col("o_orderkey"),
        (year(asOf) - year(col("o_orderdate"))).cast("long").as("age_years"),
        when(datediff(asOf, consul) > 30, true).otherwise(false).as("stale"))
        .orderBy(col("o_orderkey"))
    }),

    "q_agg_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        (dsum(col("l_discount"), 4) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "q_join_nation_revenue" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // Exact interpolated percentiles (SortAggregate path). At 100 TB the
    // right default is approx_percentile's mergeable sketch; the exact form
    // is kept for bounded groups — and because its linear interpolation is
    // bit-identical to DuckDB's quantile_cont, it carries the oracle.
    "q_agg_percentiles" -> ((s, dir) =>
      t(s, dir, "orders").groupBy(col("o_orderpriority"))
        .agg(percentile(col("o_totalprice"), lit(0.5)).as("p50"),
          percentile(col("o_totalprice"), lit(0.95)).as("p95"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))),

    "q_view_flagship" -> ((s, dir) => flagship(s, dir)),

    // ---- training-data-pipeline extensions ----
    "q_dedup_exact" -> ((s, dir) => {
      val key5 = array_join(slice(split(trim(lower(col("text"))), "\\s+"), 1, 5), " ").as("key5")
      Dedup.exactGroups(t(s, dir, "documents").select(key5, col("doc_id")),
        Seq("key5"), "doc_id")
        .orderBy(col("key5"))
    }),

    // URL + content-hash composite dedup — the CommonCrawl-style first
    // pass (URL → exact → fuzzy → semantic). The fixture has no URL
    // column, so a deterministic pseudo-URL is derived from (source,
    // doc_id, lang) IDENTICALLY on both sides — scheme + www + a docs
    // path + a tracking query param, so the normalizer's strip rules are
    // all exercised by the oracle.
    "q_dedup_url" -> ((s, dir) =>
      Dedup.urlContentDedup(
        t(s, dir, "documents").withColumn("url",
          concat(lit("https://www."), col("source"), lit(".example.com/docs/"),
            (col("doc_id") % 25).cast("string"), lit("/?utm_source="), col("lang"))),
        "url", "text", "doc_id")
        .orderBy(col("url_key"), col("content_md5"))),

    // Canonical keys FEEDING url dedup — the collapse proof: every doc
    // is exploded into all EIGHT messy spellings of its resource (the
    // q_url_canonicalize fixture shapes: case-shifted authority, :443,
    // fragment, dot-segments, over-percent-encoding, tracking params +
    // reshuffled query, duplicate slashes), and urlContentDedup's
    // canonicalize-then-normalize key must pull each spelling family
    // back to ONE survivor (n_dups = 8 per (doc, content) group; the
    // raw normalizer alone leaves the :443 / dot-segment / %6F /
    // double-slash spellings as 4 phantom "documents" each). The oracle
    // never re-implements canonicalization: the collapse is BY
    // CONSTRUCTION, so it groups the clean (source, slot, md5) key it
    // built the mess from.
    "q_dedup_url_canon" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val id = col("doc_id").cast("string")
      val slot = (col("doc_id") % 25).cast("string")
      val host = concat(lit("www."), col("source"), lit(".example.com"))
      val canon = concat(lit("https://"), host, lit("/docs/"), slot,
        lit("/?id="), id, lit("&lang="), col("lang"))
      val qs = concat(lit("?id="), id, lit("&lang="), col("lang"))
      val variants = array(
        canon,
        concat(lit("HTTPS://WWW."), upper(col("source")),
          lit(".EXAMPLE.COM/docs/"), slot, lit("/"), qs),
        concat(lit("https://"), host, lit(":443/docs/"), slot, lit("/"), qs),
        concat(canon, lit("#section-2")),
        concat(lit("https://"), host, lit("/docs/../docs/"), slot,
          lit("/./"), qs),
        concat(lit("https://"), host, lit("/d%6Fcs/"), slot,
          lit("/?id="), id, lit("&l%61ng="), col("lang")),
        concat(lit("https://"), host, lit("/docs/"), slot,
          lit("/?utm_source=news&lang="), col("lang"), lit("&id="), id,
          lit("&fbclid=abc123")),
        concat(lit("https://"), host, lit("//docs//"), slot, lit("//"), qs))
      val rows = docs.select(col("doc_id"), col("text"),
          posexplode(variants).as(Seq("v", "url")))
        .select((col("doc_id") * 8 + col("v")).as("row_id"), col("url"),
          col("text"))
      Dedup.urlContentDedup(rows, "url", "text", "row_id")
        .orderBy(col("url_key"), col("content_md5"))
    }),

    // Exact repeated-substring dedup (Lee et al. ACL'22): maximal >=8-token
    // spans occurring >=2x anywhere in the corpus, via anchor k-grams +
    // island merge — no suffix array, no pairwise doc comparison; the
    // oracle re-derives grams, occurrence counts, and the interval merge
    // in pure SQL.
    "q_dedup_substring" -> ((s, dir) =>
      operators.SubstringDedup.repeatedSpans(
        t(s, dir, "documents"), "doc_id", "text", k = 8)
        .orderBy(col("doc_id"), col("start_tok"))),

    // The at-scale variant of the same operator: anchors shuffle as TWO
    // xxhash64 salts (16 bytes/anchor) instead of the k-token gram string.
    // A false span needs a simultaneous collision in both salts (~2^-128
    // per gram pair), so the output is byte-identical to the string path
    // — it carries the SAME oracle, and the bench line measures what the
    // 100-TB shuffle actually pays.
    "q_dedup_substring_hashed" -> ((s, dir) =>
      operators.SubstringDedup.repeatedSpans(
        t(s, dir, "documents"), "doc_id", "text", k = 8, hashKeys = true)
        .orderBy(col("doc_id"), col("start_tok"))),

    // The removal half: gram-level canonical election (each repeated
    // k-gram keeps its (doc,pos)-minimal occurrence), positions covered
    // only by redundant windows dropped; the oracle rebuilds the cleaned
    // text per doc with nested list lambdas.
    "q_dedup_substring_clean" -> ((s, dir) =>
      operators.SubstringDedup.removeRepeatedSpans(
        t(s, dir, "documents"), "doc_id", "text", k = 8)
        .orderBy(col("doc_id"))),

    // All six stats project from ONE fused text_profile scan per row.
    "q_text_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("__p", TextAnalysis.profile(col("text")))
        .select(col("doc_id"),
          col("__p.n_chars").cast("long").as("n_chars_actual"),
          coalesce(col("__p.n_tokens"), lit(0)).cast("long").as("n_tokens"),
          col("__p.n_bpeish").cast("long").as("n_bpeish"),
          col("__p.n_punct").cast("long").as("n_punct"),
          col("__p.n_stopwords").cast("long").as("n_stopwords"),
          when(col("__p.n_tokens") > 0,
            col("__p.n_nonspace").cast("double") / col("__p.n_tokens"))
            .otherwise(lit(0.0)).as("mean_token_len"))
        .orderBy(col("doc_id"))),

    // Self-trained unigram LM score (the CCNet-perplexity proxy): mean
    // rounded token log-prob, decimal-summed — corpus shuffles on
    // doc/term keys only, vocab table broadcast.
    "q_text_unigram_lp" -> ((s, dir) =>
      TextAnalysis.unigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Bigram LM score — conditional log-probs c(w1 w2)/c(w1 ·), the next
    // perplexity proxy up: narrow bigram extraction, (doc, bigram)
    // shuffles only, AQE-sized probability join (bigram vocab is not
    // guaranteed driver-sized like the unigram vocab). Kept as the
    // ablation next to the interpolated trigram model below.
    "q_text_bigram_lp" -> ((s, dir) =>
      TextAnalysis.bigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Interpolated trigram LM score — the CCNet/LLaMA-style quality
    // perplexity: λ70/20/10 mix of trigram/bigram/unigram conditionals,
    // each an IEEE-exact count ratio, ln pinned by the 6dp-round +
    // decimal-sum contract. Narrow n-gram transforms, n-gram-keyed
    // partial aggs, AQE-sized probability joins.
    "q_text_trigram_lp" -> ((s, dir) =>
      TextAnalysis.trigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Persistence twin of q_text_trigram_lp: train the three conditional
    // tables → save to parquet → load → score. Shares the trigram ORACLE
    // verbatim (doubles round-trip parquet bit-exactly), so the reloaded
    // LM must score hash-identically to the train-fresh one.
    "q_text_trigram_reload" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_trigram_model_"))
      val path = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_trigram_model_${runTag(dir)}"
      val docs = t(s, dir, "documents")
      TextAnalysis.saveTrigramLm(TextAnalysis.trainTrigramLm(docs, "text"), path)
      TextAnalysis.scoreTrigramLm(TextAnalysis.loadTrigramLm(s, path),
        docs, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Tokenizer fertility per lang: subword pieces per word + chars per
    // piece in ppm — ONE profile scan, one group-keyed agg, all-integer.
    "q_tokenizer_fertility" -> ((s, dir) =>
      TextAnalysis.tokenizerFertility(t(s, dir, "documents"), "lang", "text")
        .orderBy(col("grp"))),

    // Per-doc 3-gram diversity (distinct-n in ppm): the integer-exact
    // repetition/garbage proxy — one narrow transform + one doc-keyed agg.
    "q_text_diversity" -> ((s, dir) =>
      TextAnalysis.ngramDiversity(t(s, dir, "documents"), "doc_id", "text",
        n = 3)
        .orderBy(col("doc_id"))),

    // CCNet perplexity terciles: head/middle/tail by trigram-LM score,
    // thresholds = exact percentiles over scored docs (ONE-ROW frame
    // crossed back), short docs in an explicit unscored bucket.
    "q_text_ppl_buckets" -> ((s, dir) =>
      TextAnalysis.perplexityBuckets(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // DSIR importance weights (Xie et al. NeurIPS'23): every non-English
    // doc scored by how English-like its hashed unigram+bigram feature
    // distribution is — B-bucket state however big either corpus, the
    // engine-portable md5 bucket, 6dp-pinned lns, exact decimal sums.
    "q_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.DataSelect.dsirWeights(
        docs.filter(col("lang") =!= "en"), docs.filter(col("lang") === "en"),
        "doc_id", "text", buckets = 4096)
        .orderBy(col("doc_id"))
    }),

    // The paper's top-k selection under the TOTAL order (logw DESC,
    // doc_id) — orderBy+limit = TakeOrdered, never a global sort.
    "q_dsir_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.DataSelect.dsirSelect(
        docs.filter(col("lang") =!= "en"), docs.filter(col("lang") === "en"),
        "doc_id", "text", k = 100, buckets = 4096)
    }),

    // Corpus PMI collocations in floor-divided ppm — integer-exact
    // association ranking (exp(PMI)·1e6), no ln-double ever hashed. The
    // (pmi_ppm DESC, c12 DESC, w1, w2) order is total, so the top-100 cut
    // is deterministic cross-engine.
    "q_text_pmi" -> ((s, dir) =>
      TextAnalysis.pmiCollocations(t(s, dir, "documents"), "text",
        minCount = 5, topK = 100)),

    // The same PMI with the pair counts run as streaming state: exact
    // sum-mergeable integers ⇒ stream ≡ batch IDENTICALLY, so this shares
    // the batch oracle verbatim (full hash gate, no tolerance) — the
    // q_stream_anomalies / q_stream_auc pattern.
    "q_stream_pmi" -> ((s, dir) =>
      StreamingIngest.runStreamPmiBounded(s, s"$dir/documents.parquet",
        "text", minCount = 5, topK = 100,
        queryName = s"stream_pmi_${streamCounter.incrementAndGet()}")),

    // Per-class discriminative keywords by add-one-smoothed odds ratio in
    // floor-divided ppm over (lang, term) token counts — integer-exact
    // like the PMI score; per-class top-20 under a total order.
    "q_text_keywords" -> ((s, dir) =>
      TextAnalysis.classKeywords(t(s, dir, "documents"), "lang", "text",
        minCount = 5, topK = 20)
        .orderBy(col("cls"), col("odds_ppm").desc, col("a").desc, col("term"))),

    // The same keyword extraction with the (cls, term) counts as
    // streaming state: exact sum-mergeable integers ⇒ stream ≡ batch
    // identically, sharing the batch oracle verbatim (full hash gate).
    "q_stream_keywords" -> ((s, dir) =>
      StreamingIngest.runStreamKeywordsBounded(s, s"$dir/documents.parquet",
        "lang", "text", minCount = 5, topK = 20,
        queryName = s"stream_kw_${streamCounter.incrementAndGet()}")
        .orderBy(col("cls"), col("odds_ppm").desc, col("a").desc, col("term"))),

    "q_text_langid" -> ((s, dir) =>
      TextAnalysis.withLangId(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang_pred"))
        .orderBy(col("doc_id"))),

    // HTML→text extraction (jusText-lite boilerplate removal) over a
    // synthetic crawl: every document wrapped in a real-page template
    // (head/title + style, link-only nav + ad div, link-heavy footer,
    // script noise, entities) and extracted back. The oracle recomputes
    // the expected content — constant h1 + text + uppercase twin — from
    // the source column directly, so parse/segment/classify/entity-decode
    // is hash-gated end-to-end (the synthetic-PNG playbook for text).
    "q_text_extract" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextExtract.fromHtml(
        docs.select(col("doc_id"),
          operators.TextExtract.syntheticHtml(col("doc_id"), col("text"))
            .as("html")),
        "doc_id", "html")
        .orderBy(col("doc_id"))
    }),

    // STREAMING HTML→text extraction: pages arrive in micro-batches and
    // are boilerplate-stripped on arrival — extraction is a pure per-row
    // function, so the bounded stream shares the batch q_text_extract
    // oracle VERBATIM (full hash gate, no tolerance).
    "q_stream_text_extract" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_tx_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_tx_src_${runTag(dir)}"
      t(s, dir, "documents").select(col("doc_id"), col("text"))
        .repartition(4).write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamTextExtractBounded(s, src, "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Block-level view of the same pages: every segmented block's tag,
    // normalized text, non-ws/link char counts, word count, and
    // jusText-lite label, hash-matched against the template anatomy the
    // oracle reconstructs per document (7 blocks: title/nav/h1/p/div/
    // blockquote/footer). stop_ratio is reported by the operator but
    // not emitted here (stopword tokenization is not worth re-deriving
    // in SQL; the keep rule never consults it).
    "q_text_extract_blocks" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextExtract.blocks(
        docs.select(col("doc_id"),
          operators.TextExtract.syntheticHtml(col("doc_id"), col("text"))
            .as("html")),
        "doc_id", "html")
        .select(col("doc_id"), col("idx").cast("long").as("idx"), col("tag"),
          col("text"), col("n_chars").cast("long").as("n_chars"),
          col("n_link_chars").cast("long").as("n_link_chars"),
          col("n_words").cast("long").as("n_words"), col("label"))
        .orderBy(col("doc_id"), col("idx"))
    }),

    // HTML LINK extraction + RFC 3986 resolution — the crawl loop's
    // real discovery primitive (until now the loop's links came from
    // fixture frames, not from parsing anchors): nine href shapes per
    // document — absolute, relative, ../parent, root-relative,
    // protocol-relative, query-only, fragment-only, mailto:, and a
    // rel=nofollow — extract with anchor text (inline <b> stripped,
    // &amp; decoded) and resolve+canonicalize against the page URL.
    // Every (href, resolved, anchor, nofollow) tuple is pinned literally
    // by the oracle.
    "q_html_links" -> ((s, dir) =>
      htmlLinksRows(t(s, dir, "documents"))
        .orderBy(col("doc_id"), col("idx"))),

    // STREAMING twin of the link extraction — anchors parsed per
    // micro-batch (per-row projection, exploding): stream ≡ batch
    // VERBATIM, so it shares q_html_links' oracle unchanged.
    "q_stream_links" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_lk_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_lk_src_${runTag(dir)}"
      t(s, dir, "documents").select(col("doc_id"), col("source"))
        .repartition(4).write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamRowMapBounded(s, src,
          htmlLinksRows, Seq("doc_id", "idx"))
        .orderBy(col("doc_id"), col("idx"))
    }),

    // IMAGE-TEXT PAIR extraction (the LAION shape) — the multimodal
    // front door: three <img> shapes per page (figure + figcaption,
    // inline + surrounding-block caption, bare protocol-relative), srcs
    // resolved through the page's <base> when one is present (every
    // third document) and canonicalized into joinable keys. Every
    // (src, resolved, alt, title, caption) tuple is pinned literally by
    // the oracle.
    "q_image_text_pairs" -> ((s, dir) =>
      htmlImageRows(t(s, dir, "documents"))
        .orderBy(col("doc_id"), col("idx"))),

    // STREAMING twin of the pair extraction — per-row projection, so
    // stream ≡ batch VERBATIM and it shares q_image_text_pairs' oracle.
    "q_stream_images" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_im_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_im_src_${runTag(dir)}"
      t(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
        .repartition(4).write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamRowMapBounded(s, src,
          htmlImageRows, Seq("doc_id", "idx"))
        .orderBy(col("doc_id"), col("idx"))
    }),

    // PAIR QUALITY GATE (the LAION caption filter): the extracted
    // image-text pairs classified by text-side signal — the one-word
    // figure alt fails the alt gate but its figcaption saves the pair,
    // the inline pair passes both, and the bare CDN image (no alt, no
    // caption) drops. Reason booleans emitted next to the verdict.
    "q_image_pair_quality" -> ((s, dir) =>
      Multimodal.pairQuality(htmlImageRows(t(s, dir, "documents")),
          "alt", "caption")
        .select(col("doc_id"), col("idx"), col("alt_ok"),
          col("caption_ok"), col("keep"))
        .orderBy(col("doc_id"), col("idx"))),

    // INTERLEAVED image-text documents (the mmc4/OBELICS shape): one
    // position-keyed sequence of content text runs and image slots per
    // page — <img> tags split text runs, jusText labels drop the nav
    // run and its short successor, and image slots always survive. The
    // oracle pins all four emitted positions per document.
    "q_interleaved_docs" -> ((s, dir) =>
      htmlInterleavedRows(t(s, dir, "documents"))
        .orderBy(col("doc_id"), col("pos"))),

    // INTERLEAVED MULTIMODAL PACKING — the MMC4/OBELICS trainer step the
    // interleaved extraction feeds: each image slot costs a constant 64
    // placeholder tokens (the vision encoder's patch budget), each text
    // run its whitespace token count; documents pack contiguously into
    // capacity-512 sequences via the distributed prefix sum, every item
    // landing at its GLOBAL token offset, with is_split flagging
    // boundary-crossing documents. The oracle replays the fixture items,
    // the cost rule, and both prefix-sum layers.
    "q_interleaved_pack" -> ((s, dir) =>
      operators.Packing.packInterleaved(
          htmlInterleavedRows(t(s, dir, "documents")),
          "doc_id", "pos", "kind", "text", imageBudget = 64L,
          capacity = 512L)
        .orderBy(col("doc_id"), col("pos"))),

    // FIRST-FIT-DECREASING bin packing — the NO-TRUNCATION loader shape
    // ("sample packing": whole documents only, capacity never crossed),
    // complementing concat-and-split. Knuth-hash sharding (the
    // SQL-replayable corpus-shuffle idiom), exact per-shard FFD fold;
    // the oracle replays the ENTIRE fold per shard with a recursive CTE
    // whose state is the bin-fills list — every document's bin
    // assignment and running fill hash-match, not just summary claims.
    "q_pack_ffd" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"), x => x =!= ""))
          .cast("long").as("n_tok"))
      operators.Packing.ffdPack(docs, "doc_id", "n_tok", capacity = 256L,
          shards = 8)
        .orderBy(col("doc_id"))
    }),

    // STREAMING twin of the FFD manifest — shards are INDEPENDENT by
    // construction (bins never span shards), so a source range-
    // partitioned on the shard key gives shard-complete micro-batches
    // and the per-batch fold equals the global per-shard fold exactly;
    // the grouped runner's batch-id check fails loudly on a split
    // shard. Shares q_pack_ffd_stats' oracle verbatim.
    "q_stream_ffd" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_ffd_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_ffd_src_${runTag(dir)}"
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(filter(split(col("text"), "\\s+"), x => x =!= ""))
            .cast("long").as("n_tok"),
          (operators.Sampling.knuthSlot32(col("doc_id")) % 8)
            .as("shard"))
        .repartitionByRange(4, col("shard"))
        .write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamGroupedBounded(s, src,
          batch => operators.Packing.ffdStats(
            operators.Packing.ffdPack(batch.drop("shard"), "doc_id",
              "n_tok", capacity = 256L, shards = 8), capacity = 256L),
          Seq("shard", "bin"))
        .orderBy(col("shard"), col("bin"))
    }),

    // Per-bin FFD manifest — the loader-facing view of q_pack_ffd:
    // docs/tokens/waste per (shard, bin). The oracle wraps the full
    // FFD fold replay in one GROUP BY.
    "q_pack_ffd_stats" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"), x => x =!= ""))
          .cast("long").as("n_tok"))
      operators.Packing.ffdStats(
          operators.Packing.ffdPack(docs, "doc_id", "n_tok",
            capacity = 256L, shards = 8), capacity = 256L)
        .orderBy(col("shard"), col("bin"))
    }),

    // TOKEN-EXACT interleaved packing — the q_sft_pack_tokens upgrade
    // applied to the multimodal trainer shape: text runs cost their
    // frozen-BPE token counts (computed per item row, before the doc
    // shuffle), images keep the constant 64-token placeholder budget.
    // Same packing arithmetic, caller-supplied cost column.
    "q_interleaved_pack_tokens" -> ((s, dir) => {
      val items = htmlInterleavedRows(t(s, dir, "documents"))
      val cost = when(col("kind") === "image", lit(64L))
        .otherwise(operators.BpeTokenizer.tokenCountColumn(
          operators.BpeTokenizer.frozenMerges,
          coalesce(col("text"), lit(""))).cast("long"))
      operators.Packing.packInterleavedCosted(
          items.withColumn("__cost", cost),
          "doc_id", "pos", "kind", "__cost", capacity = 512L)
        .orderBy(col("doc_id"), col("pos"))
    }),

    // STREAMING twin of the interleaved extraction — per-row
    // projection, so stream ≡ batch VERBATIM and it shares
    // q_interleaved_docs' oracle.
    "q_stream_interleaved" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_il_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_il_src_${runTag(dir)}"
      t(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
        .repartition(4).write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamRowMapBounded(s, src,
          htmlInterleavedRows, Seq("doc_id", "pos"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // SFT ASSEMBLY — the post-training corpus front door: flat
    // (conversation, turn, role, text) rows become rendered ChatML
    // documents with per-span LOSS-MASK offsets (whole-turn interval +
    // the content sub-interval the mask actually covers; train only on
    // assistant spans). The oracle replays the frozen template's length
    // arithmetic per turn — a one-character template drift fails the
    // hash. One shuffle (conversation key), per-row span math.
    "q_sft_assemble" -> ((s, dir) =>
      sftAssembleProjected(sftAssembleTurns(s, dir))
        .orderBy(col("conversation_id"), col("turn_idx"))),

    // STREAMING twin of the assembly — turns arrive in micro-batches
    // whose files are RANGE-partitioned on the conversation key, so
    // every conversation lands whole in one batch and the per-batch
    // aggregation unions to the global result exactly (the
    // group-complete-file contract of runStreamGroupedBounded). Shares
    // q_sft_assemble's oracle verbatim.
    "q_stream_sft" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_sft_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_sft_src_${runTag(dir)}"
      sftAssembleTurns(s, dir).repartitionByRange(4, col("conv_id"))
        .write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamGroupedBounded(s, src,
          sftAssembleProjected, Seq("conversation_id", "turn_idx"))
        .orderBy(col("conversation_id"), col("turn_idx"))
    }),

    // TOKEN-SPACE ASSEMBLY — q_sft_assemble's spans re-based to frozen-
    // BPE token units (the q_sft_pack_tokens front door, exposed as its
    // own surface): per turn the [start_tok, end_tok) interval and the
    // content-token sub-interval, train flags on assistant spans. One
    // conversation-keyed aggregate; token counts computed per turn row
    // BEFORE the shuffle.
    "q_sft_assemble_tokens" -> ((s, dir) =>
      sftTokenAssembleProjected(sftAssembleTurns(s, dir))
        .orderBy(col("conversation_id"), col("turn_idx"))),

    // STREAMING twin of the token-space assembly — same grouped-runner
    // contract as q_stream_sft (conversation-complete micro-batches,
    // batch-id check). Shares q_sft_assemble_tokens' oracle verbatim.
    "q_stream_sft_tokens" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_sftt_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_sftt_src_${runTag(dir)}"
      sftAssembleTurns(s, dir).repartitionByRange(4, col("conv_id"))
        .write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamGroupedBounded(s, src,
          sftTokenAssembleProjected, Seq("conversation_id", "turn_idx"))
        .orderBy(col("conversation_id"), col("turn_idx"))
    }),

    // SFT PACKING — the loss masks made trainer-consumable: assembled
    // conversations pack into capacity-512 sequences via the
    // distributed prefix sum (no global window) and every turn span
    // lands at its GLOBAL offset in the packed character stream, with
    // seq_id/is_split marking boundary-crossing conversations. The
    // oracle replays template lengths → conversation prefix sums →
    // packing division → per-span offset shifts in one chain.
    "q_sft_pack" -> ((s, dir) => {
      val assembled = operators.Sft.assemble(sftAssembleTurns(s, dir),
        "conv_id", "turn_idx", "role", "text")
      operators.Sft.packWithMasks(assembled, capacity = 512L)
        .orderBy(col("conversation_id"), col("turn_idx"))
    }),

    // TOKEN-EXACT SFT packing — the masks land in the space a trainer
    // actually consumes: frozen-BPE token counts (computed per TURN ROW
    // before the conversation shuffle) drive the ChatML span layout
    // ([im_start][role][nl][content…][im_end][nl]) and the capacity-256
    // packing division. The oracle replays the recursive-CTE BPE
    // fixpoint over the turn texts composed with the q_sft_pack prefix
    // sums. span_text_ok is the cross-path identity gate: the packed
    // content span's TOKEN width must equal an independent
    // re-tokenization of the CHAR-space assembly's content substring,
    // and that substring's detokenized tokens must equal its cleaned
    // words — tying token masks, char masks, and the tokenizer
    // round-trip together; one false anywhere fails the hash.
    "q_sft_pack_tokens" -> ((s, dir) => {
      val turns = sftAssembleTurns(s, dir)
      val merges = operators.BpeTokenizer.frozenMerges
      val packed = operators.Sft.packTokensWithMasks(
        operators.Sft.assembleTokenSpans(turns, "conv_id", "turn_idx",
          "role", "text", merges), capacity = 256L)
      val spanText = operators.Sft.assemble(turns, "conv_id", "turn_idx",
          "role", "text")
        .select(col("conversation_id"), col("rendered"),
          explode(col("spans")).as("sp"))
        .select(col("conversation_id"), col("sp.turn_idx").as("turn_idx"),
          col("rendered").substr(
            (col("sp.content_start") + 1L).cast("int"),
            (col("sp.content_end") - col("sp.content_start")).cast("int"))
            .as("__span_text"))
      packed.join(spanText, Seq("conversation_id", "turn_idx"))
        .withColumn("__toks",
          operators.BpeTokenizer.tokensColumn(merges, col("__span_text")))
        .select(col("conversation_id"), col("n_tokens"), col("seq_id"),
          col("is_split"), col("turn_idx"), col("role"), col("g_start"),
          col("g_end"), col("g_content_start"), col("g_content_end"),
          col("train"),
          ((col("g_content_end") - col("g_content_start")) ===
            size(col("__toks")).cast("long") &&
            trim(replace(concat_ws("", col("__toks")),
              lit(operators.BpeTokenizer.EndOfWord), lit(" "))) ===
              concat_ws(" ", operators.Dedup.cleanTokens(col("__span_text"))))
            .as("span_text_ok"))
        .orderBy(col("conversation_id"), col("turn_idx"))
    }),

    // PREFERENCE PAIRS (DPO/RLHF prep): five scored candidates per
    // prompt collapse to one (chosen, rejected) row via struct min/max
    // in a single aggregate — and every tenth prompt carries a FLAT
    // score spread and must emit nothing (a no-signal pair would poison
    // a DPO loss silently). The oracle replays the argmax/argmin with
    // rank windows and the spread filter.
    "q_pref_pairs" -> ((s, dir) =>
      operators.Sft.preferencePairs(prefCandidates(s, dir), "prompt_id",
          "cand_id", "text", "score")
        .orderBy(col("prompt_id"))),

    // STREAMING twin of the preference pairs — candidates arrive in
    // micro-batches RANGE-partitioned on the prompt key, so every
    // prompt's candidate set lands whole in one batch and the per-batch
    // struct-min/max aggregate unions to the global result exactly
    // (runStreamGroupedBounded's batch-id contract check fails loudly
    // otherwise). Shares q_pref_pairs' oracle verbatim.
    "q_stream_pref_pairs" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_pref_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_pref_src_${runTag(dir)}"
      prefCandidates(s, dir).repartitionByRange(4, col("prompt_id"))
        .write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamGroupedBounded(s, src,
          batch => operators.Sft.preferencePairs(batch, "prompt_id",
            "cand_id", "text", "score"), Seq("prompt_id"))
        .orderBy(col("prompt_id"))
    }),

    // STREAMING twin of the best-of-n export — the same grouped-runner
    // contract as q_stream_pref_pairs: prompt-complete micro-batches
    // make the per-batch rank window exact, and the batch-id check
    // fails loudly on a split prompt. Shares q_sft_bon's oracle.
    "q_stream_bon" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_bon_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_bon_src_${runTag(dir)}"
      prefCandidates(s, dir).repartitionByRange(4, col("prompt_id"))
        .write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamGroupedBounded(s, src,
          batch => operators.Sft.bestOfN(batch, "prompt_id", "cand_id",
            "text", "score", k = 3), Seq("prompt_id", "rank"))
        .orderBy(col("prompt_id"), col("rank"))
    }),

    // BEST-OF-N ranking export (reward-model / rejection-sampling prep):
    // the same scored candidates widen from one (chosen, rejected) pair
    // to the top-3 ranked rows per prompt with reward margins — rank 1
    // provably equals q_pref_pairs' chosen (same (score, id) order), and
    // the flat-spread / null-score contracts carry over. One partitioned
    // rank window; the oracle replays rank + lead + min/max windows.
    "q_sft_bon" -> ((s, dir) =>
      operators.Sft.bestOfN(prefCandidates(s, dir), "prompt_id",
          "cand_id", "text", "score", k = 3)
        .orderBy(col("prompt_id"), col("rank"))),

    // SFT PIPELINE CAPSTONE — the post-training front's stages chained
    // the way q_train_pipeline caps pre-training prep: conversation
    // turns → normalized conversation text → EXACT conversation dedup
    // (min-id survivor; the planted case-variant copies drop) →
    // benchmark DECONTAMINATION (5-gram shingles vs the cid%11==0
    // benchmark slice; group-keyed tokens drop whole planted groups) →
    // token-exact ChatML assembly + capacity-256 packing of the
    // survivors under the frozen BPE. Each stage's operator is
    // independently hash-gated (q_sft_dedup / q_sft_decontam /
    // q_sft_pack_tokens); this query gates the COMPOSITION — the
    // oracle replays the survivor set from the fixture's structure and
    // the full BPE/packing tail value-for-value.
    "q_sft_pipeline" -> ((s, dir) => {
      val turns = sftDedupTurns(s, dir, caseVariant = true)
      val norm = operators.Sft.normalizedConvText(turns, "conv_id",
        "turn_idx", "text")
      val kept = operators.Sft.dedupExact(norm, "conversation_id",
        "conv_text").select(col("conversation_id"))
      val bench = norm.filter(pmod(col("conversation_id"), lit(11)) === 0)
        .select(col("conversation_id").as("doc_id"),
          col("conv_text").as("text"))
      val contaminated = operators.Decontaminate.contaminationReport(
          norm.select(col("conversation_id"), col("conv_text").as("text")),
          bench, "conversation_id", "text", n = 5)
        .select(col("conversation_id"))
      val survivors = kept.join(contaminated, Seq("conversation_id"),
          "left_anti")
        .withColumnRenamed("conversation_id", "conv_id")
      val assembled = operators.Sft.assembleTokenSpans(
        turns.join(survivors, Seq("conv_id")),
        "conv_id", "turn_idx", "role", "text",
        operators.BpeTokenizer.frozenMerges)
      operators.Sft.packTokensWithMasks(assembled, capacity = 256L)
        .orderBy(col("conversation_id"), col("turn_idx"))
    }),

    // SFT DECONTAMINATION — the benchmark-leak gate applied to
    // post-training data: each conversation's concatenated ASSISTANT
    // turns (the spans a model would train on) are checked for shared
    // 5-gram shingles against the benchmark slice (doc_id % 97 == 0),
    // reusing the corpus decontamination operator verbatim.
    // Conversations built on a benchmark document surface with their
    // full shingle overlap; clean ones are absent.
    "q_sft_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val words8 = array_join(slice(filter(split(col("text"), " "),
        w => length(w) > 0), 1, 8), " ")
      val turns = docs.select(
        floor(col("doc_id") / 4).cast("long").as("conv_id"),
        pmod(col("doc_id"), lit(4)).cast("long").as("turn_idx"),
        when(pmod(col("doc_id"), lit(2)) === 0, "user")
          .otherwise("assistant").as("role"),
        words8.as("text"))
      val convs = operators.Sft.normalizedConvText(
          turns.filter(col("role") === "assistant"), "conv_id",
          "turn_idx", "text")
        .select(col("conversation_id"), col("conv_text").as("text"))
      operators.Decontaminate.contaminationReport(convs,
          docs.filter(col("doc_id") % 97 === 0), "conversation_id",
          "text", n = 5)
        .orderBy(col("conversation_id"))
    }),

    // PNG METADATA STRIP — the privacy pass a multimodal corpus runs
    // before shipping: planted tEXt author/GPS strings and a tIME
    // timestamp are removed in one chunk walk (kept chunks copied
    // verbatim, CRCs untouched), and the strip must be pixel-LOSSLESS —
    // both decode checksums emitted and pinned equal by the oracle,
    // alongside the exact removed-chunk byte arithmetic.
    "q_image_strip_meta" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val base = Multimodal.syntheticPngPixelPayload(id)
          val ascii = java.nio.charset.StandardCharsets.US_ASCII
          val author = ("Author\u0000user-" + (id % 50)).getBytes(ascii)
          val gps = ("GPS Position\u0000" + (id % 180 - 90) + ".0," +
            (id % 360 - 180) + ".0").getBytes(ascii)
          val time = Array.tabulate[Byte](7)(k => ((id + k) % 100).toByte)
          val tagged = Multimodal.withPngMetadata(base,
            Seq(("tEXt", author), ("tEXt", gps), ("tIME", time)))
          val (stripped, nRemoved, saved) =
            Multimodal.stripPngMetadata(tagged)
          def dec(b: Array[Byte]) = Multimodal.decodePngPixels(b)
            .getOrElse((0, 0, Array.emptyByteArray))
          val (w0, h0, p0) = dec(tagged)
          val (w1, h1, p1) = dec(stripped)
          def lum(p: Array[Byte]): Long = {
            var t = 0L; var i = 0
            while (i < p.length) { t += p(i) & 0xff; i += 1 }
            t
          }
          (id, w1.toLong, h1.toLong, lum(p0), lum(p1), nRemoved.toLong,
            saved, w0 == w1 && h0 == h1 && java.util.Arrays.equals(p0, p1))
        }
        .toDF("media_id", "width", "height", "lum_before", "lum_after",
          "n_removed", "bytes_saved", "lossless")
        .orderBy(col("media_id"))
    }),

    // Sliding-window RAG chunks: 32-token windows advancing by 24
    // (8-token overlap), tail kept as a shorter final chunk, redundant
    // trailing windows skipped — the embedding-prep layout. Original
    // case preserved (chunks get quoted back to users). Per-row
    // higher-order array ops, zero shuffle. (Round-17 rename: this
    // entry used to collide with the chars-based q_text_chunks under
    // ONE duplicated map key, which silently shadowed it out of the
    // whole correctness sweep — Scala Map literals keep the last
    // binding. The names are now distinct and both queries run.)
    "q_rag_chunks" -> ((s, dir) =>
      operators.TextExtract.slidingChunks(
          t(s, dir, "documents").select(col("doc_id"), col("text")),
          "doc_id", "text", chunkSize = 32, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // RAG RETRIEVAL CAPSTONE — the front's pieces chained end-to-end the
    // way q_crawl_pipeline caps the crawl: sliding-window chunks (32/8)
    // → fixed-arithmetic hashed-feature embeddings (dim 16, integer
    // components — SQL-replayable by construction) → EXACT cosine top-10
    // per query chunk (docs %25==7, chunk 0) → graded relevance
    // (same doc: adjacent 3 / other 2; same source 1) → frozen-ppm
    // nDCG@10. The DuckDB oracle replays that whole chain
    // value-for-value. ann_ok folds the SERVING path in: an IVF-PQ index
    // trained on the same chunk embeddings, PERSISTED AND RELOADED, must
    // return 10 results per query with mean recall@10 vs the exact
    // ranking above the spec floor — at 100 TB the brute force is the
    // eval-scale baseline and the cell-pruned two-stage path serves.
    "q_rag_pipeline" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_rag_model_"))
      val modelPath =
        s"${System.getProperty("java.io.tmpdir")}/graft_rag_model_${runTag(dir)}"
      val docs = t(s, dir, "documents")
      // chunk keys pack (doc, chunk) into one numeric total order; the
      // fixture corpus tops out far below 4096 chunks per document
      val emb = operators.TextExtract.slidingChunks(
          docs.select(col("doc_id"), col("text")),
          "doc_id", "text", chunkSize = 32, overlap = 8)
        .select((col("doc_id") * 4096L + col("chunk_id")).as("vec_id"),
          col("doc_id"), col("chunk_id"),
          operators.Similarity.hashedEmbedding(col("chunk_text"), 16)
            .as("embedding"))
        .localCheckpoint() // five consumers: exact, 2×train, index, rerank
      val isQ = pmod(col("doc_id"), lit(25)) === 7 && col("chunk_id") === 0L
      val queries = emb.filter(isQ)
      val corpus = emb.filter(!isQ)
      val exact = operators.Similarity.cosineTopK(queries, corpus, k = 10)
        .localCheckpoint() // feeds ndcg and the recall gate
      val srcs = docs.select(col("doc_id"), col("source"))
      val ranked = exact
        .withColumn("qdoc", expr("query_id div 4096"))
        .withColumn("cdoc", expr("neighbor_id div 4096"))
        .withColumn("cchunk", pmod(col("neighbor_id"), lit(4096L)))
        .join(broadcast(srcs.select(col("doc_id").as("qdoc"),
          col("source").as("qsrc"))), Seq("qdoc"))
        .join(broadcast(srcs.select(col("doc_id").as("cdoc"),
          col("source").as("csrc"))), Seq("cdoc"))
        .withColumn("rel",
          when(col("qdoc") === col("cdoc"),
            when(col("cchunk") === 1L, lit(3L)).otherwise(lit(2L)))
            .when(col("qsrc") === col("csrc"), lit(1L)).otherwise(lit(0L)))
        .select(col("query_id").as("query"), col("rank"), col("rel"))
      val ndcg = operators.Eval.ndcgAtK(ranked, "query", "rank", "rel",
        k = 10)
      // serving path: train → persist → reload → retrieve → recall gate
      val ivf = operators.IvfIndex.train(emb, "vec_id", "embedding", k = 16)
      val pq = operators.ProductQuantize.train(emb, "vec_id", "embedding",
        m = 4, k = 16)
      operators.IvfPq.saveModels(s, modelPath, ivf, pq)
      val (livf, lpq) = operators.IvfPq.loadModels(s, modelPath)
      val ann = operators.IvfPq.topK(queries, corpus, livf, lpq, k = 10,
        nprobe = 4, shortlist = 32).localCheckpoint()
      val annCnt = ann.groupBy(col("query_id")).agg(count(lit(1)).as("__n"))
      val meanOk = exact.select(col("query_id"), col("neighbor_id"))
        .join(ann.select(col("query_id"), col("neighbor_id"),
          lit(1L).as("__hit")), Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("__hit"), lit(0L))).cast("double") /
          count(lit(1)).cast("double")).as("__recall"))
        .agg(avg(col("__recall")).as("__m"))
        .select((col("__m") >= lit(0.5)).as("__mean_ok"))
      ndcg.join(annCnt.withColumnRenamed("query_id", "query"),
          Seq("query"), "left")
        .crossJoin(broadcast(meanOk)) // one-row total, the sanctioned shape
        .select(col("query"), col("n_ranked"), col("dcg_ppm"),
          col("idcg_ppm"), col("ndcg_ppm"),
          (coalesce(col("__n"), lit(0L)) === 10L && col("__mean_ok"))
            .as("ann_ok"))
        .orderBy(col("query"))
    }),

    // CONVERSATION-level EXACT dedup: the fixture mints one canonical
    // conversation per group of three (group-keyed token text, one
    // copy uppercased — rendered bytes still differ, so exact dedup
    // groups only the byte-identical pair), keyed on the 256-bit
    // rendered hash — key-only shuffle, min-id survivor, copy count.
    "q_sft_dedup" -> ((s, dir) => {
      val turns = sftDedupTurns(s, dir, caseVariant = false)
      val convs = operators.Sft.assemble(turns, "conv_id", "turn_idx",
        "role", "text")
      operators.Sft.dedupExact(convs, "conversation_id", "rendered")
        .orderBy(col("conversation_id"))
    }),

    // CONVERSATION-level FUZZY dedup — the Dedup ladder on concatenated
    // NORMALIZED turns: groups of three conversations where two are
    // byte-identical after lowercasing (jaccard 1.0) and the third
    // appends one trailing token (11 of 12 shingles shared). MinHash
    // banding + exact re-score must surface exactly the within-group
    // pairs at exactly those two similarity values.
    "q_sft_dedup_fuzzy" -> ((s, dir) => {
      val turns = sftDedupTurns(s, dir, caseVariant = true)
      val convs = operators.Sft.normalizedConvText(turns, "conv_id",
          "turn_idx", "text")
        .filter(col("n_turns") === 4)
      Dedup.minhashNearDupPairs(convs, "conversation_id", "conv_text",
          n = 3, k = 64, bands = 16, threshold = 0.5)
        .select(col("idA"), col("idB"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("idA"), col("idB"))
    }),

    // HTML → MARKDOWN — the structured-extraction product surface (a
    // modern corpus keeps markdown, not stripped prose: headings,
    // lists, links, and code fences are signal): heading prefix, bold
    // and link inline marks, bullets, a blockquote, and an image line,
    // every rendered character pinned by the oracle's string rebuild.
    "q_html_markdown" -> ((s, dir) =>
      htmlMarkdownRows(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    // STREAMING twin of the markdown rendering — per-row projection,
    // stream ≡ batch VERBATIM, shared oracle.
    "q_stream_markdown" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_md_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_md_src_${runTag(dir)}"
      t(s, dir, "documents").select(col("doc_id"), col("text"))
        .repartition(4).write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamRowMapBounded(s, src,
          htmlMarkdownRows, Seq("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // OPENGRAPH metadata (ogp.me) — the enrichment row a corpus keeps
    // next to the extracted text: og:title from the first three words,
    // og:type/og:url constants, og:image on evens; a non-property
    // description meta and a body-side og tag must both be ignored.
    "q_html_og" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val words3 = array_join(slice(filter(split(col("text"), " "),
        w => length(w) > 0), 1, 3), " ")
      val host = concat(lit("https://www."), col("source"),
        lit(".example.com"))
      val html = concat(
        lit("<html><head>"),
        lit("<meta property=\"og:title\" content=\""), words3, lit("\">"),
        lit("<meta property=\"og:type\" content=\"article\">"),
        lit("<meta property=\"og:url\" content=\""), host, lit("/docs/"),
        col("doc_id").cast("string"), lit("\">"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("<meta property=\"og:image\" content=\""), host,
            lit("/img/"), pmod(col("doc_id"), lit(9)), lit(".png\">")))
          .otherwise(lit("")),
        lit("<meta name=\"description\" content=\"not og\">" +
          "</head><body>" +
          "<meta property=\"og:late\" content=\"ignored\"></body></html>"))
      docs.select(col("doc_id"),
          posexplode(graft.expr.HtmlExpressions.html_og(html))
            .as(Seq("idx", "m")))
        .select(col("doc_id"), col("idx").cast("long").as("idx"),
          col("m.key").as("key"), col("m.value").as("value"))
        .orderBy(col("doc_id"), col("idx"))
    }),

    // HREFLANG alternates — the multilingual-variant clustering signal
    // (the mC4/CCAligned grouping key): each page advertises en/de
    // variants, fr on evens, and an x-default naming the cluster
    // representative; extraction order and every (hreflang, href) pair
    // are pinned literally.
    "q_html_alternates" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"),
          posexplode(graft.expr.HtmlExpressions.html_alternates(
            altFixtureHtml)).as(Seq("idx", "a")))
        .select(col("doc_id"), col("idx").cast("long").as("idx"),
          col("a.hreflang").as("hreflang"), col("a.href").as("href"))
        .orderBy(col("doc_id"), col("idx"))
    }),

    // LANGUAGE-VARIANT clusters: pages sharing one x-default target are
    // one logical document across languages — the unit multilingual
    // dedup and parallel-corpus mining operate on. Cluster ledger:
    // member pages and distinct non-default languages; a cluster has 3
    // langs iff any member page is even (advertises fr).
    "q_lang_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val ex = docs.select(col("doc_id"),
        explode(graft.expr.HtmlExpressions.html_alternates(altFixtureHtml))
          .as("a"))
      val clusterOf = ex.filter(col("a.hreflang") === "x-default")
        .select(col("doc_id"), col("a.href").as("cluster"))
      ex.filter(col("a.hreflang") =!= "x-default")
        .select(col("doc_id"), col("a.hreflang").as("hreflang"))
        .join(clusterOf, Seq("doc_id"))
        .groupBy(col("cluster"))
        .agg(countDistinct(col("doc_id")).as("n_pages"),
          countDistinct(col("hreflang")).as("n_langs"))
        .orderBy(col("cluster"))
    }),

    // FENCED CODE extraction — the code/prose separation a Stack-style
    // pipeline runs on markdown-ish text: documents rebuilt with two
    // fenced blocks (one ```python-tagged, one bare), extraction via
    // regexp_extract_all + per-block pulls (fully declarative — no
    // custom expression needed for a regular grammar), every
    // (idx, lang, code) pinned by the word-slice oracle.
    "q_text_code_fences" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val words = filter(split(col("text"), " "), w => length(w) > 0)
      val doc = concat(
        array_join(slice(words, 1, 4), " "), lit(" ```python\n"),
        array_join(slice(words, 5, 4), " "), lit("\n``` mid ```\n"),
        array_join(slice(words, 9, 4), " "), lit("\n``` tail"))
      docs.select(col("doc_id"),
          posexplode(regexp_extract_all(doc,
            lit("(?s)```[a-z]*\\n.*?\\n```"), lit(0)))
            .as(Seq("idx", "blk")))
        .select(col("doc_id"), col("idx").cast("long").as("idx"),
          regexp_extract(col("blk"), "^```([a-z]*)", 1).as("lang"),
          regexp_extract(col("blk"), "(?s)\\n(.*)\\n```$", 1).as("code"))
        .orderBy(col("doc_id"), col("idx"))
    }),

    // MOJIBAKE repair (the ftfy core, deterministic): four of five
    // documents arrive with their unicode suffix CORRUPTED the way real
    // crawls corrupt it (UTF-8 bytes decoded as latin-1 — "Ã©" for é,
    // "â‚¬"-style C1 salads); fix_mojibake must restore the clean
    // construction bit-exactly via strict encode-back-and-decode, and
    // the uncorrupted control rows (id%5==0) must pass through
    // UNTOUCHED — the strict UTF-8 gate is what keeps legitimate
    // accents safe from false repair.
    "q_text_fix_mojibake" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sfx = element_at(array(MojiSuffixes.map(lit): _*),
        pmod(col("doc_id"), lit(3)).cast("int") + 1)
      val clean = concat(col("text"), sfx)
      val corrupted = decode(encode(clean, "UTF-8"), "ISO-8859-1")
      val input = when(col("doc_id") % 5 === 0, clean).otherwise(corrupted)
      docs.select(col("doc_id"),
          graft.expr.MojibakeExpressions.fix_mojibake(input).as("fixed"))
        .orderBy(col("doc_id"))
    }),

    // PAGE-LEVEL curation directives: <base href> (first wins),
    // <link rel="canonical"> (the author's dedup key), and the robots
    // <meta> (noindex/nofollow/none tokens) — the head-side signals a
    // corpus gate honors before any text is kept. Body-side directives
    // are non-conforming and must be ignored (the scan stops at <body>).
    "q_html_head" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"),
          graft.expr.HtmlExpressions.html_head(headFixtureHtml).as("h"))
        .select(col("doc_id"), col("h.base").as("base"),
          col("h.canonical").as("canonical"),
          col("h.noindex").as("noindex"), col("h.nofollow").as("nofollow"))
        .orderBy(col("doc_id"))
    }),

    // CANONICAL-LINK dedup: pages grouped by their author-declared
    // canonical target (resolved against the page URL, canonicalized;
    // pages without one key on themselves) — the dedup signal that
    // collapses print views, session variants, and mirrors BEFORE any
    // content hashing runs. Even docs share /docs/c<id%5> per source,
    // odds stay singletons; survivor = min doc_id.
    "q_canonical_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val url = concat(lit("https://www."), col("source"),
        lit(".example.com/docs/"), col("doc_id").cast("string"))
      docs.select(col("doc_id"), url.as("url"),
          graft.expr.HtmlExpressions.html_head(headFixtureHtml)
            .getField("canonical").as("canonical"))
        .select(col("doc_id"),
          graft.expr.UrlExpressions.url_canonicalize(
            graft.expr.UrlExpressions.url_resolve(col("url"),
              col("canonical"))).as("canon_key"))
        .groupBy(col("canon_key"))
        .agg(min(col("doc_id")).as("survivor"),
          count(lit(1)).as("n_members"))
        .orderBy(col("canon_key"))
    }),

    // ROBOTS-META gate ledger: noindex pages leave the corpus, links on
    // nofollow pages vote for nothing — per source: pages, kept docs,
    // and surviving link votes (2 anchors per follow page).
    "q_meta_robots_gate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("source"),
          graft.expr.HtmlExpressions.html_head(headFixtureHtml).as("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_pages"),
          sum((!col("h.noindex")).cast("long")).as("n_kept"),
          sum(when(!col("h.nofollow"), 2L).otherwise(0L)).cast("long")
            .as("n_link_votes"))
        .orderBy(col("source"))
    }),

    // HTML TABLE extraction — the structured-data path out of a page:
    // each document renders a header row (<th>, one cell deliberately
    // whitespace-padded), one data row per first-6 word (index / the
    // word wrapped in an inline <b> that must strip / its length / an
    // entity-bearing constant that must decode), and a second one-row
    // totals table (depth-1 table indexing). The oracle rebuilds every
    // (t, r, c, header, cell) tuple from the words alone — any leaked
    // tag, undecoded entity, or mis-indexed cell breaks the hash.
    "q_html_tables" -> ((s, dir) =>
      htmlTableRows(t(s, dir, "documents"))
        .orderBy(col("doc_id"), col("t"), col("r"), col("c"))),

    // STREAMING twin of the table extraction — cells parsed per
    // micro-batch (pure row map): stream ≡ batch verbatim, shares
    // q_html_tables' oracle unchanged.
    "q_stream_tables" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_tb_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_tb_src_${runTag(dir)}"
      t(s, dir, "documents").select(col("doc_id"), col("text"))
        .repartition(4).write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamRowMapBounded(s, src,
          htmlTableRows, Seq("doc_id", "t", "r", "c"))
        .orderBy(col("doc_id"), col("t"), col("r"), col("c"))
    }),

    // URL blocklist gate (the C4/RefinedWeb front filter): drop documents
    // whose synthesized crawl URL matches a blocked-domain or
    // blocked-path regex — codegen'd disjunction, no join, pushes to the
    // scan. Patterns are simple enough that Java and RE2 agree.
    "q_url_blocklist" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("url",
        concat(lit("https://www."), col("source"), lit(".example.com/docs/"),
          (col("doc_id") % 25).cast("string"), lit("/?utm_source="), col("lang")))
      operators.WebCuration.filterBlocked(docs, "url",
          Seq("src1\\.example\\.com", "/docs/7/"))
        .select(col("doc_id"), col("url"))
        .orderBy(col("doc_id"))
    }),

    // Per-domain frequency cap (domain-skew fix): keep the best `cap`
    // docs per domain by (n_chars DESC, doc_id ASC) — a top-k-per-group,
    // one domain-hash shuffle, shuffle rows carry only (domain, rank
    // key). The oracle reconstructs the domain from the synthesis rule
    // and replays the window.
    "q_domain_cap" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("url",
        concat(lit("https://www."), col("source"), lit(".example.com/docs/"),
          (col("doc_id") % 25).cast("string"), lit("/?utm_source="), col("lang")))
      operators.WebCuration.capPerDomain(docs, "url",
          col("n_chars").cast("long"), "doc_id", cap = 15)
        .select(col("doc_id"), col("domain"),
          col("n_chars").cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Sentence segmentation (the unit between documents and tokens):
    // documents re-punctuated into 6-word sentences — first word
    // capitalized, terminator rotating . ! ? with '..' hard stops every
    // fifth and a leading "Dr. " abbreviation trap every fourth (which
    // the single-period guard must NOT split despite the following
    // capital) — then split back by the codegen rule-based segmenter.
    // Round-trip exact: the oracle rebuilds every sentence string from
    // the construction. The construction NEVER ends a sentence with a
    // bare '.' after a guard-listed word (a group whose last word is an
    // abbreviation gets '!' instead): the engine's guard would merge
    // such a sentence into the next while the oracle's rebuild splits
    // them, so at a scale factor whose vocabulary happens to land "no"/
    // "st"/"fig" before a '.' terminator the round-trip would break —
    // agreement is by construction, not by fixture luck.
    "q_text_sentences" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val words = filter(split(col("text"), " "), w => length(w) > 0)
      val caps = transform(words, (w, i) =>
        when(i % 6 === 0,
          concat(upper(substring(w, 1, 1)), substring(w, 2, 100000)))
          .otherwise(w))
      val ng = ((size(words) + lit(5)) / lit(6)).cast("int")
      val guardWords = Seq("dr", "mr", "mrs", "ms", "prof", "sr", "jr",
        "st", "no", "vs", "etc", "eg", "ie", "fig", "al")
      val sentences = transform(sequence(lit(0), ng - 1), g => {
        val lastWord = element_at(caps,
          least((g + 1) * lit(6), size(words)).cast("int"))
        val guardHit = lower(regexp_extract(lastWord, "([A-Za-z]+)$", 1))
          .isin(guardWords: _*)
        concat(
          when(g % 4 === 0, lit("Dr. ")).otherwise(lit("")),
          array_join(slice(caps, g * 6 + 1, lit(6)), " "),
          when(g % 5 === 0, lit(".."))
            .when(pmod(col("doc_id") + g, lit(3)) === 0 && guardHit, lit("!"))
            .otherwise(element_at(array(lit("."), lit("!"), lit("?")),
              pmod(col("doc_id") + g, lit(3)).cast("int") + 1)))
      })
      docs.select(col("doc_id"),
          graft.expr.SentenceExpressions.split_sentences(
            array_join(sentences, " ")).as("__s"))
        .select(col("doc_id"),
          posexplode(col("__s")).as(Seq("sidx", "sentence")))
        .select(col("doc_id"), col("sidx").cast("long").as("sidx"),
          col("sentence"))
        .orderBy(col("doc_id"), col("sidx"))
    }),

    // LINE-level corpus dedup (the C4 boilerplate rule): documents
    // re-lined 8 words per row plus two per-source boilerplate lines
    // (subscribe prompt, copyright footer) that repeat across every doc
    // of the source; lines in ≥ 5 distinct docs drop, content lines —
    // including those shared by planted near-dup pairs — survive, and
    // each document reassembles in order. The oracle replays the lining
    // rule, the distinct-doc frequencies, and the rebuild.
    "q_line_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val words = filter(split(col("text"), " "), w => length(w) > 0)
      val contentLines = transform(
        sequence(lit(0), ((size(words) + lit(7)) / lit(8)).cast("int") - 1),
        i => array_join(slice(words, i * 8 + 1, lit(8)), " "))
      val bp1 = concat(lit("subscribe to "), col("source"),
        lit(" updates today"))
      val bp2 = concat(lit("copyright 2026 "), col("source"),
        lit(" all rights reserved"))
      val lined = docs.select(col("doc_id"),
        array_join(concat(contentLines, array(bp1, bp2)), "\n").as("text"))
      Dedup.lineDedup(lined, "doc_id", "text", maxDocFreq = 5)
        .select(col("doc_id"), col("n_kept"), col("n_dropped"),
          col("clean_text"))
        .orderBy(col("doc_id"))
    }),

    // URL canonicalization (RFC 3986 §6 + crawl conventions) — the key
    // normalizer BEFORE any url-keyed dedup/frontier/recrawl aggregate:
    // eight spellings of the same resource (case-shifted authority,
    // default port, fragment, dot-segments, over-percent-encoding,
    // tracking params + unsorted query, duplicate slashes) must all
    // collapse to ONE canonical fixed point — the invertible-fixture
    // playbook: the mess generator starts FROM the canonical form, so
    // the oracle is the clean construction, not an SQL re-implementation
    // of the algorithm.
    "q_url_canonicalize" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val id = col("doc_id").cast("string")
      val slot = (col("doc_id") % 25).cast("string")
      val host = concat(lit("www."), col("source"), lit(".example.com"))
      val canon = concat(lit("https://"), host, lit("/docs/"), slot,
        lit("/?id="), id, lit("&lang="), col("lang"))
      val qs = concat(lit("?id="), id, lit("&lang="), col("lang"))
      val messy = when(col("doc_id") % 8 === 1,
          concat(lit("HTTPS://WWW."), upper(col("source")),
            lit(".EXAMPLE.COM/docs/"), slot, lit("/"), qs))
        .when(col("doc_id") % 8 === 2,
          concat(lit("https://"), host, lit(":443/docs/"), slot, lit("/"), qs))
        .when(col("doc_id") % 8 === 3,
          concat(canon, lit("#section-2")))
        .when(col("doc_id") % 8 === 4,
          concat(lit("https://"), host, lit("/docs/../docs/"), slot,
            lit("/./"), qs))
        .when(col("doc_id") % 8 === 5,
          concat(lit("https://"), host, lit("/d%6Fcs/"), slot,
            lit("/?id="), id, lit("&l%61ng="), col("lang")))
        .when(col("doc_id") % 8 === 6,
          concat(lit("https://"), host, lit("/docs/"), slot,
            lit("/?utm_source=news&lang="), col("lang"), lit("&id="), id,
            lit("&fbclid=abc123")))
        .when(col("doc_id") % 8 === 7,
          concat(lit("https://"), host, lit("//docs//"), slot, lit("//"), qs))
        .otherwise(canon)
      docs.select(col("doc_id"), messy.as("__raw"),
          graft.expr.UrlExpressions.url_canonicalize(messy).as("url_canon"))
        .select(col("doc_id"), col("url_canon"),
          (col("__raw") =!= col("url_canon")).as("changed"))
        .orderBy(col("doc_id"))
    }),

    // robots.txt parsing (RFC 9309): one synthetic robots document per
    // crawl domain — comments, mixed-case directive names, crawl-delay,
    // a `*` group and a crawler-specific override group — parsed into
    // the typed rule table by pure split/posexplode plus one running-
    // count window (group id = running User-agent count). Hash-matched
    // against the oracle's from-scratch reconstruction of the template's
    // rule rows.
    "q_robots_rules" -> ((s, dir) => {
      val robots = t(s, dir, "documents").select(col("source")).distinct()
        .withColumn("domain", concat(col("source"), lit(".example.com")))
        .withColumn("k",
          regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 25)
        .select(col("domain"),
          operators.RobotsTxt.syntheticRobots(col("domain"), col("k"))
            .as("txt"))
      operators.RobotsTxt.parseRules(robots, "domain", "txt")
        .orderBy(col("domain"), col("agent"), col("line_no"))
    }),

    // RFC 9309 WILDCARD rules — the `*`/`$` forms real sites lean on
    // and a prefix-only matcher silently under-blocks: six URL shapes
    // per document probe a session-id disallow (`/*?sid=`), an anchored
    // extension disallow (`/*.pdf$` — the .pdfx shape proves the anchor
    // does not over-block), an anchored Allow override inside a
    // disallowed subtree (`/docs/*/open$` out-lengths `/docs/`), and a
    // mid-path wildcard (`/cal/*/print`). Every (allowed, matched_path,
    // matched_allow) verdict is pinned by the oracle per shape.
    "q_robots_wildcards" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val robots = docs.select(col("source")).distinct()
        .select(concat(col("source"), lit(".example.com")).as("domain"))
        .withColumn("txt", lit(
          "User-agent: graftbot\n" +
            "Disallow: /*?sid=\n" +
            "Disallow: /*.pdf$\n" +
            "Allow: /docs/*/open$\n" +
            "Disallow: /docs/\n" +
            "Disallow: /cal/*/print\n"))
      val rules = operators.RobotsTxt.parseRules(robots, "domain", "txt")
      val host = concat(lit("https://www."), col("source"),
        lit(".example.com"))
      val slot = (col("doc_id") % 25).cast("string")
      val yr = (col("doc_id") % 30 + 2000).cast("string")
      val id = col("doc_id").cast("string")
      val urls = docs.select(col("doc_id"), posexplode(array(
          concat(host, lit("/docs/"), slot, lit("/open")),
          concat(host, lit("/docs/"), slot, lit("/page")),
          concat(host, lit("/page/"), id, lit("?sid="), id),
          concat(host, lit("/files/report"), id, lit(".pdf")),
          concat(host, lit("/files/report"), id, lit(".pdfx")),
          concat(host, lit("/cal/"), yr, lit("/print"))))
        .as(Seq("shape", "url")))
      operators.RobotsTxt.gate(urls, "url", rules, "graftbot")
        .select(col("doc_id"), col("shape").cast("long").as("shape"),
          col("url"), col("allowed"), col("matched_path"),
          col("matched_allow"))
        .orderBy(col("doc_id"), col("shape"))
    }),

    // The politeness gate itself: every document URL against its
    // domain's parsed rules for agent "graftbot" — group override (the
    // crawler group wins over `*`), longest-prefix match, Allow beating
    // Disallow on ties, all decided by ONE broadcast join + combining
    // struct-max aggregate. Blocked exactly when the doc's path slot
    // equals the domain's Disallow slot. One PATHLESS root URL per domain
    // (negative doc_id = -(domain number)-1) exercises the RFC 9309
    // empty-path normalization: "https://domain" gates as path "/", so
    // the k%5==0 domains' root Disallow blocks it — and only it.
    "q_robots_gate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val robots = docs.select(col("source")).distinct()
        .withColumn("domain", concat(col("source"), lit(".example.com")))
        .withColumn("k",
          regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 25)
        .select(col("domain"),
          operators.RobotsTxt.syntheticRobots(col("domain"), col("k"))
            .as("txt"))
      val rules = operators.RobotsTxt.parseRules(robots, "domain", "txt")
      val rootUrls = docs.select(col("source")).distinct()
        .select((lit(-1L) - regexp_extract(col("source"), "(\\d+)", 1)
            .cast("long")).as("doc_id"),
          concat(lit("https://www."), col("source"), lit(".example.com"))
            .as("url"))
      val urls = docs.select(col("doc_id"),
        concat(lit("https://www."), col("source"), lit(".example.com/docs/"),
          (col("doc_id") % 25).cast("string"), lit("/?utm_source="),
          col("lang")).as("url"))
        .unionByName(rootUrls)
      operators.RobotsTxt.gate(urls, "url", rules, "graftbot")
        .select(col("doc_id"), col("url"), col("domain"), col("path"),
          col("allowed"), col("matched_path"), col("matched_allow"))
        .orderBy(col("doc_id"))
    }),

    // Anchor-text aggregation (the web graph's text signal): a synthetic
    // outlink graph — every doc links to 3 arithmetic targets with its
    // leading trigram as the anchor — aggregated per target into anchor
    // frequencies, inlink totals, and the top-2 anchors by (freq DESC,
    // anchor ASC). One (dst, anchor) combining shuffle + a dst-keyed
    // WindowGroupLimit; the raw link stream never shuffles whole.
    "q_anchor_texts" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val links = docs.select(col("doc_id").as("src"),
          array_join(slice(split(col("text"), " "), 1, 3), " ").as("anchor"),
          explode(array((0 until 3).map(j =>
            (col("doc_id") * 7 + lit(j * 11)) % lit(n)): _*)).as("dst"))
      operators.WebCuration.topAnchors(links, "src", "dst", "anchor", k = 2)
        .select(col("dst"), col("rank"), col("anchor"), col("freq"),
          col("n_srcs"), col("n_inlinks"))
        .orderBy(col("dst"), col("rank"))
    }),

    // The crawl FRONTIER: link targets beyond the crawled id range (the
    // synthetic outlinks run UN-modded, so most targets are undiscovered
    // pages), prioritized by inlink mass — one (dst) combining aggregate,
    // an anti-join against the crawled set, and the distributed top-50
    // (TakeOrdered, no global window; ranks assigned on the bounded
    // result).
    "q_crawl_frontier" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val links = docs.select(col("doc_id").as("src"),
        explode(array((0 until 3).map(j =>
          col("doc_id") * 7 + lit(j * 11)): _*)).as("dst"))
      operators.WebCuration.frontier(links, "src", "dst",
          docs.select(col("doc_id")), "doc_id", limit = 50)
        .select(col("rank"), col("dst"), col("n_inlinks"), col("n_srcs"))
        .orderBy(col("rank"))
    }),

    // CRAWL-TRAP detection: three URL shapes per document on its
    // source's host — an /article/<id>-<id%97> page with unique
    // content, a /cal/2026/<m>/<d>?sid=<hex12> calendar whose content
    // is one boilerplate page per source (the classic infinite-calendar
    // trap), and a /list?page=<p>&ref=<id> paginator whose content
    // cycles over 40 variants (trap only once the corpus outgrows 200
    // URLs per source). urlTemplate must collapse each shape to one
    // template per source (digits→#, the 12-hex sid into the sorted
    // param-name signature), and the per-template (n_urls, n_content,
    // diversity, is_trap) ledger must equal the oracle's replay of the
    // construction — both trap verdicts AND the healthy article rows.
    "q_crawl_traps" -> ((s, dir) => {
      operators.WebCuration.crawlTraps(trapFixturePages(t(s, dir,
          "documents")), "url", col("fp"), minUrls = 10, maxDiversity = 0.2)
        .orderBy(col("template"))
    }),

    // The same ledger over KMV SKETCH state — the mergeable form a
    // 100-TB batch (map-side bounded state instead of the Expand×2
    // exact plan) and the streaming twin both run. k=4096 keeps every
    // fixture template in the exact regime, so this shares the exact
    // ledger's oracle verbatim.
    "q_crawl_traps_sketch" -> ((s, dir) => {
      operators.WebCuration.crawlTrapsSketch(trapFixturePages(t(s, dir,
          "documents")), "url", col("fp"), k = 4096, minUrls = 10,
          maxDiversity = 0.2)
        .orderBy(col("template"))
    }),

    // STREAMING twin: pages micro-batched one file per trigger, the
    // per-template state two bounded k-smallest-hash sets, ledger
    // derivation shared verbatim with the batch sketch form — KMV state
    // is a set function, so stream ≡ batch bit-exactly and the batch
    // oracle gates the stream.
    "q_stream_traps" -> ((s, dir) => {
      StreamingIngest.runStreamTrapLedger(s, s"$dir/documents.parquet",
          trapFixturePages, "url", "fp", k = 4096, minUrls = 10,
          maxDiversity = 0.2,
          queryName = s"stream_traps_${streamCounter.incrementAndGet()}")
        .orderBy(col("template"))
    }),

    // CANONICAL-KEY frontier — spelling variants no longer fragment the
    // vote: pages live on a 200-page synthetic web (canonical url a pure
    // function of the page number), every link spells its endpoint in
    // one of the EIGHT q_url_canonicalize mess shapes, and the crawled
    // set (pages 0-99) is recorded under yet another spelling.
    // urlFrontier must pool each target's inlink mass across spellings
    // (raw keys would split every vote 8 ways and re-queue every crawled
    // page), collapse distinct-src counting onto canonical source pages,
    // drop self-links even when the two ends are spelled differently,
    // and exclude crawled targets whatever their recorded spelling. The
    // oracle replays the frontier over page NUMBERS (the collapse is by
    // construction) and rebuilds the canonical strings only for output
    // and tie-break order.
    "q_frontier_canon" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      def messy(v: Column, k: Column): Column = {
        val kStr = k.cast("string")
        val host = concat(lit("www.w"), (k % 20).cast("string"),
          lit(".example.com"))
        val qs = concat(lit("?id="), kStr)
        when(v === 1, concat(lit("HTTPS://"), upper(host), lit("/p/"), kStr,
            lit("/"), qs))
          .when(v === 2, concat(lit("https://"), host, lit(":443/p/"), kStr,
            lit("/"), qs))
          .when(v === 3, concat(lit("https://"), host, lit("/p/"), kStr,
            lit("/"), qs, lit("#frag")))
          .when(v === 4, concat(lit("https://"), host, lit("/p/../p/"), kStr,
            lit("/./"), qs))
          .when(v === 5, concat(lit("https://"), host, lit("/%70/"), kStr,
            lit("/"), qs))
          .when(v === 6, concat(lit("https://"), host, lit("/p/"), kStr,
            lit("/?utm_source=news&id="), kStr, lit("&fbclid=x")))
          .when(v === 7, concat(lit("https://"), host, lit("//p//"), kStr,
            lit("//"), qs))
          .otherwise(concat(lit("https://"), host, lit("/p/"), kStr,
            lit("/"), qs))
      }
      val links = docs.select(col("doc_id"),
          explode(array((0 until 3).map(j => lit(j)): _*)).as("j"))
        .select(
          messy(pmod(col("doc_id"), lit(8)), pmod(col("doc_id"), lit(100)))
            .as("src_url"),
          messy(pmod(col("doc_id") + col("j"), lit(8)),
            pmod(col("doc_id") * 7 + col("j") * 11, lit(200))).as("dst_url"))
      val crawled = s.range(100).select(
        messy(pmod(col("id"), lit(8)), col("id")).as("url"))
      operators.WebCuration.urlFrontier(links, "src_url", "dst_url",
          crawled, "url", limit = 50)
        .select(col("rank"), col("url"), col("n_inlinks"), col("n_srcs"))
        .orderBy(col("rank"))
    }),

    // STREAMING anchor aggregation: link records arrive in micro-batches
    // and accumulate into the standing link set; anchor frequencies and
    // inlink totals are pure aggregates of that set, so arrival order
    // cannot matter and the bounded stream shares the batch oracle
    // VERBATIM.
    "q_stream_anchor_texts" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_anchor_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_anchor_src_${runTag(dir)}"
      val docs = t(s, dir, "documents")
      val n = docs.count()
      docs.select(col("doc_id").as("src"),
          array_join(slice(split(col("text"), " "), 1, 3), " ").as("anchor"),
          explode(array((0 until 3).map(j =>
            (col("doc_id") * 7 + lit(j * 11)) % lit(n)): _*)).as("dst"))
        .repartition(4).write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamAnchorsBounded(s, src, k = 2)
        .select(col("dst"), col("rank"), col("anchor"), col("freq"),
          col("n_srcs"), col("n_inlinks"))
        .orderBy(col("dst"), col("rank"))
    }),

    // The politeness FETCH SCHEDULE: allowed URLs queue per origin in
    // Knuth-hash order, spaced by the origin's crawl-delay (the graftbot
    // group's own delay here; the `*`-group and default fallbacks are
    // spec-pinned) — fetch_at_ms = pos·delay, the fetcher fleet's plan.
    "q_crawl_schedule" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val robots = docs.select(col("source")).distinct()
        .withColumn("domain", concat(col("source"), lit(".example.com")))
        .withColumn("k",
          regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 25)
        .select(col("domain"),
          operators.RobotsTxt.syntheticRobots(col("domain"), col("k"))
            .as("txt"))
      val rules = operators.RobotsTxt.parseRules(robots, "domain", "txt")
      val urls = docs.select(col("doc_id"),
        concat(lit("https://www."), col("source"), lit(".example.com/docs/"),
          (col("doc_id") % 25).cast("string"), lit("/?utm_source="),
          col("lang")).as("url"))
      operators.RobotsTxt.schedule(urls, "url", "doc_id", rules, "graftbot")
        .select(col("doc_id"), col("domain"), col("delay_ms"), col("pos"),
          col("fetch_at_ms"))
        .orderBy(col("doc_id"))
    }),

    // REGISTRABLE-DOMAIN politeness — subdomains share one queue: the
    // sources are spread over four sites ({source}.market.co.uk /
    // .deals.co.uk / .g2.example / .g3.example by k%4), robots gating
    // and crawl-delay stay per HOST, but the fetch queue keys on the
    // registrable domain (the co.uk pair pins the public-suffix rule —
    // naive last-two-labels would merge market and deals into one
    // phantom "co.uk" site and every pos would shift) and spaces by the
    // most conservative member delay. The oracle replays the gate, the
    // constructed site labels, the max-delay fold and the Knuth-hash
    // queue order.
    "q_crawl_schedule_host" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val k = regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 25
      val hostSuffix = element_at(array(lit(".market.co.uk"),
        lit(".deals.co.uk"), lit(".g2.example"), lit(".g3.example")),
        (k % 4).cast("int") + 1)
      val host = concat(col("source"), hostSuffix)
      val robots = docs.select(col("source")).distinct()
        .select(host.as("domain"),
          operators.RobotsTxt.syntheticRobots(host, k).as("txt"))
      val rules = operators.RobotsTxt.parseRules(robots, "domain", "txt")
      val urls = docs.select(col("doc_id"),
        concat(lit("https://"), host, lit("/docs/"),
          (col("doc_id") % 25).cast("string"), lit("/?utm_source="),
          col("lang")).as("url"))
      operators.RobotsTxt.scheduleByRegistrableDomain(urls, "url", "doc_id",
          rules, "graftbot")
        .select(col("doc_id"), col("domain"), col("reg_domain"),
          col("delay_ms"), col("queue_delay_ms"), col("pos"),
          col("fetch_at_ms"))
        .orderBy(col("doc_id"))
    }),

    // STREAMING politeness gate: URLs arrive in micro-batches, decided
    // on arrival against the static decision table — the gate is a
    // stream-static broadcast join + row-local fold (no state, no
    // stream-side shuffle), so the bounded stream shares the batch
    // q_robots_gate oracle VERBATIM.
    "q_stream_robots_gate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val robots = docs.select(col("source")).distinct()
        .withColumn("domain", concat(col("source"), lit(".example.com")))
        .withColumn("k",
          regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 25)
        .select(col("domain"),
          operators.RobotsTxt.syntheticRobots(col("domain"), col("k"))
            .as("txt"))
      val rules = operators.RobotsTxt.parseRules(robots, "domain", "txt")
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_rg_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_rg_src_${runTag(dir)}"
      docs.select(col("doc_id"),
          concat(lit("https://www."), col("source"), lit(".example.com/docs/"),
            (col("doc_id") % 25).cast("string"), lit("/?utm_source="),
            col("lang")).as("url"))
        .unionByName(docs.select(col("source")).distinct()
          .select((lit(-1L) - regexp_extract(col("source"), "(\\d+)", 1)
              .cast("long")).as("doc_id"),
            concat(lit("https://www."), col("source"), lit(".example.com"))
              .as("url")))
        .repartition(4).write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamRobotsGateBounded(s, src, "doc_id",
          rules, "graftbot")
        .select(col("doc_id"), col("url"), col("domain"), col("path"),
          col("allowed"), col("matched_path"), col("matched_allow"))
        .orderBy(col("doc_id"))
    }),

    // The curator's planning table: per-domain doc count, char volume,
    // and kept-at-cap — one combining aggregate over the domain key.
    "q_domain_profile" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("url",
        concat(lit("https://www."), col("source"), lit(".example.com/docs/"),
          (col("doc_id") % 25).cast("string"), lit("/?utm_source="), col("lang")))
      operators.WebCuration.domainProfile(docs, "url",
          col("n_chars").cast("long"), cap = 15)
        .orderBy(col("domain"))
    }),

    // Extraction feeding the curation ladder: html → extracted text →
    // exact dedup ON THE EXTRACTED TEXT (the constant h1 keeps extraction
    // a pure function of `text`, so exact-dup documents stay exact dups
    // through the HTML round-trip) → fused-profile token count → quality
    // floor → per-lang rollup. One hash-gated chain across the
    // extract→curate interface.
    "q_text_extract_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val ext = docs.select(col("doc_id"), col("lang"),
        graft.expr.HtmlExpressions.html_content_text(
          operators.TextExtract.syntheticHtml(col("doc_id"), col("text")))
          .as("extracted"))
      val deduped = operators.Dedup.exactDedup(ext, Seq("extracted"), "doc_id")
      deduped
        .withColumn("n_tok",
          TextAnalysis.tokenCount(col("extracted")).cast("long"))
        .filter(col("n_tok") >= 32)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"))
        .orderBy(col("lang"))
    }),

    // WARC crawl-archive ingestion, record table: the corpus as it truly
    // arrives at 100 TB (Common Crawl ships .warc/.warc.gz archives).
    // Deterministic synthetic archives — 4 buckets, bucket 0 gzipped with
    // per-record members, warcinfo-led files, real WARC + HTTP/1.1
    // framing — are parsed back by the streaming record iterator (one
    // task per archive, constant memory per record, no shuffle) and every
    // header/length field is hash-matched against the oracle's from-
    // scratch reconstruction of the framing arithmetic (octet lengths of
    // the HTTP head + the full page template rebuilt in SQL).
    "q_warc_records" -> ((s, dir) => {
      val recs = ingest.WarcIngest.readRecords(s, warcFixtureDir(s, dir))
      recs.select(
          when(col("warc_type") === "warcinfo",
            -regexp_extract(col("record_id"), "warcinfo:(\\d+)", 1)
              .cast("long") - 1)
            .otherwise(regexp_extract(col("record_id"), "doc:(\\d+)", 1)
              .cast("long")).as("rec_key"),
          col("warc_type"), col("target_uri"), col("content_length"),
          col("http_status").cast("long").as("http_status"),
          col("http_content_type"),
          octet_length(col("body")).cast("long").as("body_octets"))
        .orderBy(col("rec_key"))
    }),

    // WARC → HTTP body → HTML extraction: the full crawl front chained —
    // archive parse, response/status/content-type gate, boilerplate
    // removal — must land byte-identical to extracting from the pages
    // directly, so this SHARES the q_text_extract oracle verbatim.
    "q_warc_extract" -> ((s, dir) => {
      val recs = ingest.WarcIngest.readRecords(s, warcFixtureDir(s, dir))
      recs.filter(col("warc_type") === "response" &&
          col("http_status") === 200 &&
          col("http_content_type").startsWith("text/html"))
        .select(regexp_extract(col("record_id"), "doc:(\\d+)", 1).cast("long")
            .as("doc_id"),
          graft.expr.HtmlExpressions.html_content_text(col("body"))
            .as("extracted"))
        .orderBy(col("doc_id"))
    }),

    // WARC → HTTP body → LINK DISCOVERY: the crawl loop's real
    // link-extraction chain — archive parse, 200/text-html gate,
    // html_links over the stored page, references resolved against the
    // record's OWN target URI and canonicalized. The synthetic page
    // carries seven constant root-relative anchors, so every
    // (doc_id, idx, resolved, anchor) tuple is literal-by-construction.
    "q_warc_links" -> ((s, dir) => {
      val recs = ingest.WarcIngest.readRecords(s, warcFixtureDir(s, dir))
      recs.filter(col("warc_type") === "response" &&
          col("http_status") === 200 &&
          col("http_content_type").startsWith("text/html"))
        .select(regexp_extract(col("record_id"), "doc:(\\d+)", 1).cast("long")
            .as("doc_id"),
          col("target_uri"),
          posexplode(graft.expr.HtmlExpressions.html_links(col("body")))
            .as(Seq("idx", "l")))
        .select(col("doc_id"), col("idx").cast("long").as("idx"),
          graft.expr.UrlExpressions.url_canonicalize(
            graft.expr.UrlExpressions.url_resolve(col("target_uri"),
              col("l.href"))).as("resolved"),
          col("l.anchor").as("anchor"))
        .orderBy(col("doc_id"), col("idx"))
    }),

    // DISCOVERY CAPSTONE: the frontier built from links the crawler
    // actually EXTRACTED — archive parse → html_links → nofollow filter
    // → resolve against each page's own URI → canonical urlFrontier
    // anti-joined against the crawled set. Until now the loop's
    // frontier ran on fixture link frames; this runs it on parsed
    // anchors end-to-end from storage.
    "q_crawl_discover" -> ((s, dir) => {
      val recs = ingest.WarcIngest.readRecords(s, warcFixtureDir(s, dir))
        .filter(col("warc_type") === "response" &&
          col("http_status") === 200 &&
          col("http_content_type").startsWith("text/html"))
      val links = recs
        .select(col("target_uri"),
          explode(graft.expr.HtmlExpressions.html_links(col("body")))
            .as("l"))
        .filter(!col("l.nofollow"))
        .select(col("target_uri").as("src_url"),
          graft.expr.UrlExpressions.url_resolve(col("target_uri"),
            col("l.href")).as("dst_url"))
      operators.WebCuration.urlFrontier(links, "src_url", "dst_url",
          recs.select(col("target_uri")), "target_uri", limit = 50)
        .orderBy(col("rank"))
    }),

    // Charset-aware body decoding — the largest real-crawl correctness
    // gap a UTF-8-only reader has: pages re-encoded under a 6-charset
    // rotation (UTF-8, ISO-8859-1, windows-1252, GB2312, Shift_JIS,
    // UTF-16) and declared via Content-Type parameter, <meta charset>,
    // http-equiv, or BOM must decode to the EXACT original text —
    // extraction output hash-matched against the oracle's from-scratch
    // page reconstruction, non-ASCII markers included, plus the sniffed
    // charset name itself.
    "q_warc_charset" -> ((s, dir) => {
      val recs = ingest.WarcIngest.readRecords(s, warcCharsetFixtureDir(s, dir))
      recs.filter(col("warc_type") === "response" &&
          col("http_status") === 200)
        .select(regexp_extract(col("record_id"), "doc:(\\d+)", 1).cast("long")
            .as("doc_id"),
          col("charset"),
          graft.expr.HtmlExpressions.html_content_text(col("body"))
            .as("extracted"))
        .orderBy(col("doc_id"))
    }),

    // Wire-format decoding: chunked transfer framing de-chunked and
    // gzip/deflate content codings decompressed before the body reaches
    // extraction — else framing bytes and compressed garbage masquerade
    // as page text. The raw WARC payload octets (the framing truth) are
    // oracled exactly for the SQL-derivable modes (identity arithmetic,
    // the 16-byte chunk formula); decompressed body octets + extraction
    // are oracled for ALL five modes.
    "q_warc_encodings" -> ((s, dir) => {
      val recs = ingest.WarcIngest.readRecords(s, warcEncodingsFixtureDir(s, dir))
      recs.filter(col("warc_type") === "response" &&
          col("http_status") === 200)
        .select(regexp_extract(col("record_id"), "doc:(\\d+)", 1).cast("long")
            .as("doc_id"),
          col("content_length"),
          octet_length(col("body")).cast("long").as("body_octets"),
          graft.expr.HtmlExpressions.html_content_text(col("body"))
            .as("extracted"))
        .withColumn("mode",
          when(col("doc_id") % 5 === 0, "identity")
            .when(col("doc_id") % 5 === 1, "chunked")
            .when(col("doc_id") % 5 === 2, "gzip")
            .when(col("doc_id") % 5 === 3, "gzip+chunked")
            .otherwise("deflate"))
        .withColumn("payload_octets",
          when(col("doc_id") % 5 <= 1, col("content_length")))
        .select(col("doc_id"), col("mode"), col("payload_octets"),
          col("body_octets"), col("extracted"))
        .orderBy(col("doc_id"))
    }),

    // Revisit resolution across CONSECUTIVE crawls (ISO 28500 §6.7.2):
    // crawl 2 stores unchanged pages as payload-free revisit records
    // pointing at crawl 1's captures; the resolver must hand downstream
    // the complete crawl-2 corpus view — original bodies for the
    // unchanged third, the updated "v2" bodies for the rest — via one
    // record_id-keyed join on the revisit subset only.
    "q_warc_revisit" -> ((s, dir) => {
      val base = warcRevisitFixtureDir(s, dir)
      val c1 = ingest.WarcIngest.readRecords(s, s"$base/c1")
      val c2 = ingest.WarcIngest.readRecords(s, s"$base/c2")
      ingest.WarcIngest.resolveRevisits(c2, c1)
        .select(regexp_extract(col("record_id"), "doc:(\\d+)", 1).cast("long")
            .as("doc_id"),
          col("is_revisit"), col("resolved"),
          octet_length(col("body")).cast("long").as("body_octets"))
        .orderBy(col("doc_id"))
    }),

    // Redirect-chain resolution out of the archive: 301/302 responses
    // (Location parsed by the reader) resolved to their landing page by
    // the bounded-hop iterative join — 302→301→200 two-hop chains
    // included — so url-keyed accounting counts every moved page once,
    // at its real home. Every hop count, landing id, and resolved flag
    // recomputed by the oracle from the chain arithmetic.
    "q_warc_redirects" -> ((s, dir) => {
      val recs = ingest.WarcIngest.readRecords(s, warcRedirFixtureDir(s, dir))
        .filter(col("warc_type") === "response")
        .select(regexp_extract(col("record_id"), "doc:(\\d+)", 1).cast("long")
            .as("doc_id"),
          col("target_uri").as("url"),
          col("http_status").as("status"),
          col("http_location").as("location"))
      operators.WebCuration.resolveRedirects(recs, "url", "status",
          "location", maxHops = 4)
        .select(col("doc_id"), col("status").cast("long").as("status"),
          regexp_extract(col("final_url"), "/docs/(\\d+)$", 1).cast("long")
            .as("final_doc"),
          col("n_hops"), col("resolved"))
        .orderBy(col("doc_id"))
    }),

    // Content-type sniffing over a deliberately MISLABELED archive: every
    // response's Content-Type header contradicts its payload; the
    // magic-byte sniffer must recover the true type for all five
    // modalities straight from body_bytes — the routing layer that keeps
    // mislabeled PDFs out of the HTML extractor at crawl scale.
    "q_warc_mime_sniff" -> ((s, dir) => {
      val recs = ingest.WarcIngest.readRecords(s, warcMimeFixtureDir(s, dir))
      recs.filter(col("warc_type") === "response" &&
          col("http_status") === 200)
        .select(regexp_extract(col("record_id"), "doc:(\\d+)", 1).cast("long")
            .as("doc_id"),
          col("http_content_type").as("declared"),
          graft.expr.MimeExpressions.mime_sniff(col("body_bytes"))
            .as("sniffed"))
        .withColumn("mislabeled", col("declared") =!= col("sniffed"))
        .orderBy(col("doc_id"))
    }),

    // PDF text extraction (the crawl's second text modality): synthetic-
    // invertible PDFs — real object/xref structure, Tj/TJ/Td/T* text
    // operators, parens escaped, odd ids FlateDecode-compressed — parsed
    // back by the codegen'd pdf_text expression; the 8-words-per-line
    // layout must reconstruct exactly, kerned TJ splits invisible.
    "q_pdf_extract" -> ((s, dir) => {
      val pdf = udf { (id: Long, text: String) =>
        graft.expr.PdfOps.syntheticPdf(id, text, flate = id % 2 == 1)
      }
      t(s, dir, "documents")
        .select(col("doc_id"), pdf(col("doc_id"), col("text")).as("body"))
        .select(col("doc_id"),
          graft.expr.PdfExpressions.pdf_text(col("body")).as("extracted"))
        .orderBy(col("doc_id"))
    }),

    // PDF SIMPLE-FONT DECODING (PDF 32000-1 §9.6.6/Annex D): the same
    // 8-word layout, but line i is shown through font i%3 — WinAnsi
    // bytes, a MacRoman base with /Differences overrides, and a
    // Type0/Identity-H font whose two-byte codes resolve through a
    // /ToUnicode CMap (bfchar + bfrange) — each line carrying a
    // non-ASCII suffix only that font's tables can decode. The fixture
    // generator encodes through the INVERSE of the decoder's own
    // tables (invertible-fixture playbook), and the oracle interpolates
    // the same suffix constants, so every mojibake or mis-mapped byte
    // breaks the hash. q_pdf_extract / q_warc_pdf stay byte-identical:
    // fonts without encoding info keep the bytes-as-UTF-8 path.
    "q_pdf_unicode" -> ((s, dir) => {
      val pdf = udf { (id: Long, text: String) =>
        graft.expr.PdfOps.syntheticUnicodePdf(id, text, flate = id % 2 == 1)
      }
      t(s, dir, "documents")
        .select(col("doc_id"), pdf(col("doc_id"), col("text")).as("body"))
        .select(col("doc_id"),
          graft.expr.PdfExpressions.pdf_text(col("body")).as("extracted"))
        .orderBy(col("doc_id"))
    }),

    // The same decode chained out of the ARCHIVE: WARC parse →
    // application/pdf + 200 gate → pdf_text over the byte-exact
    // body_bytes — proving binary PDF payloads survive WARC framing and
    // the charset/transfer decoding leaves them untouched. Shares the
    // q_pdf_extract oracle verbatim.
    "q_warc_pdf" -> ((s, dir) => {
      val recs = ingest.WarcIngest.readRecords(s, warcPdfFixtureDir(s, dir))
      recs.filter(col("warc_type") === "response" &&
          col("http_status") === 200 &&
          col("http_content_type") === "application/pdf")
        .select(regexp_extract(col("record_id"), "doc:(\\d+)", 1).cast("long")
            .as("doc_id"),
          graft.expr.PdfExpressions.pdf_text(col("body_bytes")).as("extracted"))
        .orderBy(col("doc_id"))
    }),

    // The crawl LOOP closed: discovery → politeness → fetch → archive →
    // re-ingest, every stage an already-oracled operator. Frontier
    // targets (top-50 undiscovered link dsts by inlink mass) resolve to
    // candidate URLs on their host page's domain (dst % n — the
    // simulated DNS+fetch of the synthetic web), pass the graftbot
    // robots gate, queue on the per-origin crawl-delay schedule, and the
    // first fetch wave (due before t = 5 s) is rendered and written out
    // as fresh WARC archives — which the same reader ingests back, the
    // oracle recomputing every WARC/HTTP framing field of the records
    // the loop must have produced.
    // The crawl loop RUN TWICE against the standing manifest — the
    // convergence step a one-wave capstone leaves open: wave 1 fetches
    // its due frontier slice and lands in the warehouse via
    // ingestIncremental; wave 2 rebuilds the crawled set FROM THE
    // WAREHOUSE (docs ∪ wave-1 fetches, read back out of the record
    // table), so its frontier provably excludes every wave-1 fetch and
    // advances to the next 50 targets; a third ingest pass over wave 2's
    // archives must append nothing (file-granularity idempotence,
    // asserted in-query like q_warc_incremental). The accumulated
    // warehouse must equal the union of both waves' records — the
    // oracle replays frontier→gate→schedule→WARC framing for BOTH
    // waves, the second over the wave-1-reduced candidate set.
    "q_crawl_loop_waves" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val links = docs.select(col("doc_id").as("src"),
        explode(array((0 until 3).map(j =>
          col("doc_id") * 7 + lit(j * 11)): _*)).as("dst"))
      val pages = docs.select(col("doc_id").as("pid"), col("source"),
        col("text"))
      val robots = docs.select(col("source")).distinct()
        .withColumn("domain", concat(col("source"), lit(".example.com")))
        .withColumn("k",
          regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 25)
        .select(col("domain"),
          operators.RobotsTxt.syntheticRobots(col("domain"), col("k"))
            .as("txt"))
      val rules = operators.RobotsTxt.parseRules(robots, "domain", "txt")
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_crawlwaves_"))
      val base =
        s"${System.getProperty("java.io.tmpdir")}/graft_crawlwaves_${runTag(dir)}"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
      val wh = s"$base/warehouse"
      val mf = s"$base/manifest"
      def runWave(crawledIds: DataFrame, outDir: String): Unit = {
        val frontier = operators.WebCuration.frontier(links, "src", "dst",
          crawledIds, "doc_id", limit = 50)
        val cand = frontier.select(col("dst"))
          .withColumn("pid", col("dst") % lit(n))
          .join(pages, "pid")
          .select(col("dst"),
            concat(lit("https://www."), col("source"),
              lit(".example.com/docs/"), (col("dst") % 25).cast("string"),
              lit("/")).as("url"),
            col("text"))
        val due = operators.RobotsTxt
          .schedule(cand, "url", "dst", rules, "graftbot")
          .filter(col("fetch_at_ms") < 5000L)
        val fetched = due.select(col("dst").as("doc_id"), col("url"),
          operators.TextExtract.syntheticHtml(col("dst"), col("text"))
            .as("body"))
        ingest.WarcIngest.writeSyntheticWarc(s, fetched, "doc_id", "url",
          "body", outDir, nFiles = 2)
      }
      runWave(docs.select(col("doc_id")), s"$base/w1")
      val i1 = ingest.WarcIngest.ingestIncremental(s, s"$base/w1", wh, mf)
      val crawled2 = docs.select(col("doc_id")).unionByName(
        s.read.parquet(wh).filter(col("warc_type") === "response")
          .select(regexp_extract(col("record_id"), "doc:(\\d+)", 1)
            .cast("long").as("doc_id")))
      runWave(crawled2, s"$base/w2")
      val i2 = ingest.WarcIngest.ingestIncremental(s, s"$base/w2", wh, mf)
      val i3 = ingest.WarcIngest.ingestIncremental(s, s"$base/w2", wh, mf)
      require(i1.size == 2 && i2.size == 2 && i3.isEmpty,
        s"crawl waves wrong: ${i1.size}/${i2.size}/${i3.size}")
      s.read.parquet(wh).select(
          when(col("file").contains("/w1/"), 1L).otherwise(2L).as("wave"),
          when(col("warc_type") === "warcinfo",
            -regexp_extract(col("record_id"), "warcinfo:(\\d+)", 1)
              .cast("long") - 1)
            .otherwise(regexp_extract(col("record_id"), "doc:(\\d+)", 1)
              .cast("long")).as("rec_key"),
          col("warc_type"), col("target_uri"), col("content_length"),
          col("http_status").cast("long").as("http_status"),
          col("http_content_type"),
          octet_length(col("body")).cast("long").as("body_octets"))
        .orderBy(col("wave"), col("rec_key"))
    }),

    // The POLITE crawl loop — the ledger and the revalidation plan
    // finally composed IN FRONT of scheduling (until now the loop
    // fetched every frontier candidate): wave candidates pass (1) the
    // crawl-trap gate — templates the KMV sketch ledger flagged over
    // the already-fetched corpus are anti-joined away (every planted
    // calendar candidate must die here, require()d in-query), then
    // (2) the recrawl plan — held pages whose advertised lastmod
    // predates our fetch are `skip` and provably absent downstream
    // (require()d), stale ones become `refresh`, unseen ones `new` —
    // and (3) the RFC 9110 conditional-fetch planner assigns each
    // survivor its revalidation mode + header values from the latest
    // held copy. Output: the per-domain ranked polite fetch queue.
    // Scale shape: the ledger and both plan joins are template-/
    // URL-count-sized (broadcast), candidates stream through per-row.
    "q_crawl_loop_polite" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val host = concat(lit("https://www."), col("source"),
        lit(".example.com"))
      val domain = concat(col("source"), lit(".example.com"))
      // next-wave candidates: new articles (fetch), calendar-trap URLs
      // (must die at the ledger gate — same template as the fetched
      // /cal corpus), held-and-fresh slots (skip), held-and-stale docs
      // (refresh + revalidate)
      val aCand = docs.select(domain.as("domain"), lit("url").as("kind"),
        concat(host, lit("/article/new-"), col("doc_id").cast("string"))
          .as("loc"),
        lit(null).cast("date").as("lastmod"))
      val bCand = docs.select(domain.as("domain"), lit("url").as("kind"),
        concat(host, lit("/cal/2027/"),
          (pmod(col("doc_id"), lit(12)) + 1).cast("string"), lit("/"),
          (pmod(col("doc_id"), lit(28)) + 1).cast("string"),
          lit("?sid="), lower(lpad(hex(col("doc_id") * 7919), 16, "0")))
          .as("loc"),
        lit(null).cast("date").as("lastmod"))
      val cCand = docs
        .select(col("source"), pmod(col("doc_id"), lit(25)).as("slot"))
        .distinct()
        .select(concat(col("source"), lit(".example.com")).as("domain"),
          lit("url").as("kind"),
          concat(lit("https://www."), col("source"),
            lit(".example.com/docs/"), col("slot").cast("string")).as("loc"),
          to_date(lit("2026-01-15")).as("lastmod"))
      val dCand = docs
        .select(col("source"), pmod(col("doc_id"), lit(10)).as("sl"))
        .distinct()
        .select(concat(col("source"), lit(".example.com")).as("domain"),
          lit("url").as("kind"),
          concat(lit("https://www."), col("source"),
            lit(".example.com/stale/"), col("sl").cast("string")).as("loc"),
          to_date(lit("2026-02-10")).as("lastmod"))
      val cands = aCand.unionByName(bCand).unionByName(cCand)
        .unionByName(dCand)
      // the crawl warehouse's held projection: fresh /docs copies
      // (fetched after the advertised lastmod), stale /stale copies
      // (fetched before it; ETag stored on even slots)
      val held = docs
        .select(col("source"), pmod(col("doc_id"), lit(25)).as("slot"))
        .distinct()
        .select(concat(lit("https://www."), col("source"),
            lit(".example.com/docs/"), col("slot").cast("string")).as("url"),
          to_date(lit("2026-02-01")).as("fetched_at"),
          lit(null).cast("string").as("etag"))
        .unionByName(docs
          .select(col("source"), pmod(col("doc_id"), lit(10)).as("sl"))
          .distinct()
          .select(concat(lit("https://www."), col("source"),
              lit(".example.com/stale/"), col("sl").cast("string"))
              .as("url"),
            to_date(lit("2026-01-05")).as("fetched_at"),
            when(pmod(col("sl"), lit(2)) === 0,
              concat(lit("W/\""), col("sl").cast("string"), lit("\"")))
              .as("etag")))
      // (1) trap gate: ledger from the ALREADY-FETCHED trap corpus
      val trapped = operators.WebCuration.crawlTrapsSketch(
          trapFixturePages(docs), "url", col("fp"), k = 4096,
          minUrls = 10, maxDiversity = 0.2)
        .filter(col("is_trap")).select(col("template"))
      val keyed = cands.withColumn("template",
        operators.WebCuration.urlTemplate(col("loc")))
      val nDropped = keyed.join(broadcast(trapped), Seq("template")).count()
      require(nDropped == docs.count(),
        s"trap gate dropped $nDropped, expected one calendar candidate " +
          "per document")
      val survivors = keyed
        .join(broadcast(trapped), Seq("template"), "left_anti")
        .drop("template")
      // (2) recrawl plan + (3) conditional revalidation
      val plan = operators.Sitemap.recrawlPlan(survivors, "domain", held,
        "url", "fetched_at")
      val cond = operators.Sitemap.conditionalPlan(plan, held, "url",
        "etag", "fetched_at", "fetched_at")
      val freshLeak = cond
        .join(cCand.select(col("loc")).distinct(), Seq("loc")).count()
      require(freshLeak == 0,
        s"$freshLeak unexpired held pages leaked into the fetch queue")
      cond.select(col("domain"), col("loc"), col("action"), col("mode"),
          col("if_none_match"), col("if_modified_since"), col("fetch_rank"))
        .orderBy(col("domain"), col("fetch_rank"))
    }),

    "q_crawl_loop" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val links = docs.select(col("doc_id").as("src"),
        explode(array((0 until 3).map(j =>
          col("doc_id") * 7 + lit(j * 11)): _*)).as("dst"))
      val frontier = operators.WebCuration.frontier(links, "src", "dst",
        docs.select(col("doc_id")), "doc_id", limit = 50)
      val pages = docs.select(col("doc_id").as("pid"), col("source"),
        col("text"))
      val cand = frontier.select(col("dst"))
        .withColumn("pid", col("dst") % lit(n))
        .join(pages, "pid")
        .select(col("dst"),
          concat(lit("https://www."), col("source"),
            lit(".example.com/docs/"), (col("dst") % 25).cast("string"),
            lit("/")).as("url"),
          col("text"))
      val robots = docs.select(col("source")).distinct()
        .withColumn("domain", concat(col("source"), lit(".example.com")))
        .withColumn("k",
          regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 25)
        .select(col("domain"),
          operators.RobotsTxt.syntheticRobots(col("domain"), col("k"))
            .as("txt"))
      val rules = operators.RobotsTxt.parseRules(robots, "domain", "txt")
      val wave = operators.RobotsTxt
        .schedule(cand, "url", "dst", rules, "graftbot")
        .filter(col("fetch_at_ms") < 5000L)
      val fetched = wave.select(col("dst").as("doc_id"), col("url"),
        operators.TextExtract.syntheticHtml(col("dst"), col("text"))
          .as("body"))
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_crawlloop_"))
      val out =
        s"${System.getProperty("java.io.tmpdir")}/graft_crawlloop_${runTag(dir)}"
      ingest.WarcIngest.writeSyntheticWarc(s, fetched, "doc_id", "url",
        "body", out, nFiles = 2)
      ingest.WarcIngest.readRecords(s, out)
        .select(
          when(col("warc_type") === "warcinfo",
            -regexp_extract(col("record_id"), "warcinfo:(\\d+)", 1)
              .cast("long") - 1)
            .otherwise(regexp_extract(col("record_id"), "doc:(\\d+)", 1)
              .cast("long")).as("rec_key"),
          col("warc_type"), col("target_uri"), col("content_length"),
          col("http_status").cast("long").as("http_status"),
          col("http_content_type"),
          octet_length(col("body")).cast("long").as("body_octets"))
        .orderBy(col("rec_key"))
    }),

    // Rank-aware source weighting — link analysis finally FEEDING
    // curation: the synthetic outlink graph aggregated to source level,
    // 3-iteration integer PageRank over the source graph, isqrt(rank
    // mass) budget weights (the α = 1/2 tempering of q_mix_temperature
    // applied to authority instead of language size), then the same
    // deterministic Knuth-hash take per source. The oracle replays the
    // whole chain: source edges, the BIGINT PR recursion, the
    // float-seeded integer-corrected isqrt ladder, floor-div budgets,
    // and the running-sum window.
    "q_mix_ranked" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast("long")
      val byId = docs.select(col("doc_id"), srcNum.as("sn"))
      val links = docs.select(col("doc_id").as("src"),
        explode(array((0 until 3).map(j =>
          (col("doc_id") * 7 + lit(j * 11)) % lit(n)): _*)).as("dst"))
      val edges = links
        .join(byId.select(col("doc_id").as("src"), col("sn").as("ssn")), "src")
        .join(byId.select(col("doc_id").as("dst"), col("sn").as("dsn")), "dst")
        .filter(col("ssn") =!= col("dsn"))
        .select(col("ssn").as("esrc"), col("dsn").as("edst"))
      val ranks = operators.Graph.pageRank(edges, "esrc", "edst", iters = 3)
        .select(concat(lit("src"), col("node").cast("string")).as("source"),
          col("pr"))
      operators.Sampling.rankWeightedMix(docs, "doc_id", "source",
          size(split(col("text"), " ")).cast("long"), ranks, "source", "pr",
          totalTokenBudget = 15000L)
        .select(col("doc_id"), col("source"), col("n_tok"),
          col("src_budget"), col("running"))
        .orderBy(col("doc_id"))
    }),

    // sitemaps.org discovery — the seed input next to robots.txt:
    // <urlset> documents parsed to (loc, lastmod) entries, odd-k domains
    // publishing a <sitemapindex> whose child sitemaps are reachable
    // ONLY through the index→child join (an index parse failure loses
    // exactly those domains' entries), already-crawled locations
    // anti-joined away, survivors ranked newest-first per domain.
    "q_sitemap_seeds" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val crawled = docs.select(concat(lit("https://www."), col("source"),
        lit(".example.com/docs/"), (col("doc_id") % 25).cast("string"))
        .as("url")).distinct()
      operators.Sitemap.seeds(sitemapUrlEntries(s, dir), "domain",
          crawled, "url")
        .select(col("domain"), col("loc"), col("lastmod"), col("seed_rank"))
        .orderBy(col("domain"), col("seed_rank"))
    }),

    // GZIPPED sitemaps + index recursion over BYTES — the form a
    // fetcher actually holds (sitemap.xml.gz is the common spelling;
    // the wild also serves gzip under plain names, so detection is by
    // MAGIC): a deterministic mix of gzipped/plain urlsets, indexes,
    // and children routes through gunzip_text before the same parse +
    // index→child join + seed ranking — and must produce the IDENTICAL
    // seed table, hash-matched against q_sitemap_seeds' oracle
    // verbatim. The codec-transparency gate, the q_warc_stats pattern.
    "q_sitemap_gz" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val crawled = docs.select(concat(lit("https://www."), col("source"),
        lit(".example.com/docs/"), (col("doc_id") % 25).cast("string"))
        .as("url")).distinct()
      val bs = sitemapDocsGz(s, dir)
      val rootEntries = operators.Sitemap.parseEntriesBinary(
        bs.filter(col("url").endsWith("/sitemap.xml")), "bytes")
      val childEntries = operators.Sitemap.parseEntriesBinary(
        bs.join(broadcast(rootEntries.filter(col("kind") === "sitemap")
          .select(col("loc").as("url"))), Seq("url")), "bytes")
      val entries = rootEntries.filter(col("kind") === "url")
        .select(col("domain"), col("kind"), col("loc"), col("lastmod"),
          col("changefreq"), col("priority"))
        .unionByName(childEntries.filter(col("kind") === "url")
          .select(col("domain"), col("kind"), col("loc"), col("lastmod"),
            col("changefreq"), col("priority")))
      operators.Sitemap.seeds(entries, "domain", crawled, "url")
        .select(col("domain"), col("loc"), col("lastmod"), col("seed_rank"))
        .orderBy(col("domain"), col("seed_rank"))
    }),

    // The discovery chain CLOSED end-to-end: robots.txt's `Sitemap:`
    // directive (group-independent, parsed by its own line walk) names
    // each domain's sitemap; the crawler follows the directive (join on
    // the document's own URL — a directive pointing nowhere yields
    // nothing), resolves index→children where published, and counts the
    // advertised URLs. Every domain must surface exactly its 10 entries,
    // odd-k domains provably THROUGH the index hop.
    "q_robots_sitemaps" -> ((s, dir) => {
      val src = t(s, dir, "documents").select(col("source")).distinct()
        .withColumn("domain", concat(col("source"), lit(".example.com")))
        .withColumn("k",
          regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 25)
      val robots = src.select(col("domain"),
        operators.RobotsTxt.syntheticRobots(col("domain"), col("k"))
          .as("txt"))
      val directives = operators.RobotsTxt.sitemapDirectives(robots,
        "domain", "txt")
      val roots = sitemapDocs(s, dir).drop("domain")
        .join(directives.select(col("domain"),
          col("sitemap_url").as("url")), Seq("url"))
      val viaIndex = operators.Sitemap.parseEntries(roots, "xml")
        .groupBy(col("domain"))
        .agg(max((col("kind") === "sitemap").cast("int")).as("__via"))
      directives.select(col("domain"), col("sitemap_url"))
        .join(sitemapEntriesFrom(s, dir, roots).groupBy(col("domain"))
          .agg(count(lit(1)).as("n_urls")), Seq("domain"))
        .join(viaIndex, Seq("domain"))
        .select(col("domain"), col("sitemap_url"), col("n_urls"),
          (col("__via") === 1).as("via_index"))
        .orderBy(col("domain"))
    }),

    // The FAST discovery input: RSS/Atom feeds, each format exercising
    // a different extraction shape (RSS: link in element text, RFC-822
    // pubDate; Atom: link in the href attribute, ISO-8601 updated),
    // normalized into the sitemap url-entry shape so ONE seeds operator
    // (anti-join + newest-first rank) serves all discovery inputs —
    // feed kind carried through to prove both parsers fed the result.
    "q_feed_seeds" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val src = docs.select(col("source")).distinct()
        .withColumn("domain", concat(col("source"), lit(".example.com")))
        .withColumn("k",
          regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 25)
      val feeds = src.select(col("domain"),
        when(col("k") % 2 === 0,
          operators.Feeds.syntheticRss(col("domain"), col("k"), 0, 6))
          .otherwise(
            operators.Feeds.syntheticAtom(col("domain"), col("k"), 0, 6))
          .as("xml"))
      val entries = operators.Feeds.parseEntries(feeds, "xml")
        .select(col("domain"), col("kind").as("feed_kind"),
          lit("url").as("kind"), col("link").as("loc"),
          col("published").as("lastmod"))
      val crawled = docs.select(concat(lit("https://www."), col("source"),
        lit(".example.com/docs/"), (col("doc_id") % 25).cast("string"))
        .as("url")).distinct()
      operators.Sitemap.seeds(entries, "domain", crawled, "url")
        .select(col("domain"), col("feed_kind"), col("loc"),
          col("lastmod"), col("seed_rank"))
        .orderBy(col("domain"), col("seed_rank"))
    }),

    // STREAMING discovery: the same per-site feed documents arrive in
    // micro-batches; each batch parses per-row and anti-joins the
    // STATIC crawled set on arrival (stream-static, the robots-gate
    // shape — no state store, no stream-side shuffle), and the
    // per-domain seed rank is a pure window over the accumulated
    // survivors, so the bounded stream shares the q_feed_seeds oracle
    // VERBATIM.
    "q_stream_seeds" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val src = docs.select(col("source")).distinct()
        .withColumn("domain", concat(col("source"), lit(".example.com")))
        .withColumn("k",
          regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 25)
      val feeds = src.select(col("domain"),
        when(col("k") % 2 === 0,
          operators.Feeds.syntheticRss(col("domain"), col("k"), 0, 6))
          .otherwise(
            operators.Feeds.syntheticAtom(col("domain"), col("k"), 0, 6))
          .as("xml"))
      val crawled = docs.select(concat(lit("https://www."), col("source"),
        lit(".example.com/docs/"), (col("doc_id") % 25).cast("string"))
        .as("url")).distinct()
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_seeds_src_"))
      val srcPath =
        s"${System.getProperty("java.io.tmpdir")}/graft_seeds_src_${runTag(dir)}"
      feeds.repartition(4).write.mode("overwrite").parquet(srcPath)
      streaming.StreamingIngest.runStreamSeedsBounded(s, srcPath, "xml",
          "domain", crawled, "url")
        .select(col("domain"), col("feed_kind"), col("loc"),
          col("lastmod"), col("seed_rank"))
        .orderBy(col("domain"), col("seed_rank"))
    }),

    // The sitemap's SECOND job: the recrawl plan. Each advertised URL
    // classified against the crawl warehouse — never-crawled slots are
    // 'new', crawled slots whose sitemap lastmod postdates our (slot-
    // derived) fetch date are 'refresh', current copies 'skip' — and the
    // non-skip rows ranked newest-first per domain: the fetcher's work
    // queue, with all three outcomes exercised by the date arithmetic.
    "q_recrawl_plan" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val crawled = docs
        .select(col("source"), (col("doc_id") % 25).as("slot")).distinct()
        .select(concat(lit("https://www."), col("source"),
            lit(".example.com/docs/"), col("slot").cast("string")).as("url"),
          to_date(concat(lit("2026-01-"),
            lpad(((col("slot") * 3) % 28 + 1).cast("string"), 2, "0")))
            .as("fetched_at"))
      operators.Sitemap.recrawlPlan(sitemapUrlEntries(s, dir), "domain",
          crawled, "url", "fetched_at")
        .select(col("domain"), col("loc"), col("action"), col("fetch_rank"))
        .orderBy(col("domain"), col("loc"))
    }),

    // CHANGEFREQ-aware recrawl — unsticking the conservative branch:
    // a held copy with no newer lastmod used to always skip; now the
    // sitemap's advertised revisit period decides (always/daily → 1 day,
    // weekly 7, monthly 30, yearly 365, never/unknown → still skip).
    // As of 2026-02-15 the fixture's fetch dates make monthly split by
    // elapsed days, yearly/never always skip, and the rest revisit —
    // the oracle replays the whole ladder per slot.
    "q_recrawl_changefreq" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val crawled = docs
        .select(col("source"), (col("doc_id") % 25).as("slot")).distinct()
        .select(concat(lit("https://www."), col("source"),
            lit(".example.com/docs/"), col("slot").cast("string")).as("url"),
          to_date(concat(lit("2026-01-"),
            lpad(((col("slot") * 3) % 28 + 1).cast("string"), 2, "0")))
            .as("fetched_at"))
      operators.Sitemap.recrawlPlanFreq(sitemapUrlEntries(s, dir), "domain",
          crawled, "url", "fetched_at", to_date(lit("2026-02-15")))
        .select(col("domain"), col("loc"), col("changefreq"), col("action"),
          col("fetch_rank"))
        .orderBy(col("domain"), col("loc"))
    }),

    // CONDITIONAL refetch (RFC 9110 revalidation) — the recrawl plan's
    // HTTP half and its bandwidth ledger: held copies carry an ETag on
    // slot%3==0 (→ If-None-Match) and always a Last-Modified (→
    // If-Modified-Since), `new` URLs fetch full; the simulated server
    // 304s every even-slot conditional probe. The per-domain ledger
    // (fetch counts by mode, 304s, bytes shipped vs bytes a 304 saved)
    // must equal the oracle's replay of plan → validators → outcomes.
    "q_recrawl_conditional" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val crawled = docs
        .select(col("source"), (col("doc_id") % 25).as("slot")).distinct()
        .select(
          concat(lit("https://www."), col("source"),
            lit(".example.com/docs/"), col("slot").cast("string"))
            .as("url"),
          to_date(concat(lit("2026-01-"),
            lpad(((col("slot") * 3) % 28 + 1).cast("string"), 2, "0")))
            .as("fetched_at"),
          when(col("slot") % 3 === 0,
            concat(lit("W/\""), col("slot").cast("string"), lit("\"")))
            .as("etag"))
      val plan = operators.Sitemap.recrawlPlan(sitemapUrlEntries(s, dir),
        "domain", crawled, "url", "fetched_at")
      val cond = operators.Sitemap.conditionalPlan(plan, crawled, "url",
        "etag", "fetched_at", "fetched_at")
      val slot = regexp_extract(col("loc"), "/docs/(\\d+)$", 1).cast("long")
      val outcomes = cond
        .withColumn("status",
          when(col("mode") === "full", lit(200))
            .when(slot % 2 === 0, lit(304)).otherwise(lit(200)))
        .withColumn("bytes", lit(1000L) + slot * 7)
      operators.Sitemap.fetchLedger(outcomes, "domain", "mode", "status",
          "bytes")
        .orderBy(col("domain"))
    }),

    // Manifest-driven incremental ingest — how the crawl warehouse
    // actually grows: archives arrive in two waves (buckets 0-1, then
    // 2-3), each run parses ONLY the un-ingested delta and appends
    // records + manifest rows; a third run with nothing new must append
    // nothing (file-granularity idempotence, asserted in-query). The
    // accumulated warehouse must equal the one-shot read — the
    // q_warc_records oracle verbatim.
    "q_warc_incremental" -> ((s, dir) => {
      val warc = warcFixtureDir(s, dir)
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_warcinc_"))
      val base =
        s"${System.getProperty("java.io.tmpdir")}/graft_warcinc_${runTag(dir)}"
      val wh = s"$base/warehouse"
      val mf = s"$base/manifest"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
      val w1 = ingest.WarcIngest.ingestIncremental(s, warc, wh, mf,
        glob = "warc-[01].warc*")
      val w2 = ingest.WarcIngest.ingestIncremental(s, warc, wh, mf)
      val w3 = ingest.WarcIngest.ingestIncremental(s, warc, wh, mf)
      require(w1.size == 2 && w2.size == 2 && w3.isEmpty,
        s"incremental waves wrong: ${w1.size}/${w2.size}/${w3.size}")
      s.read.parquet(wh).select(
          when(col("warc_type") === "warcinfo",
            -regexp_extract(col("record_id"), "warcinfo:(\\d+)", 1)
              .cast("long") - 1)
            .otherwise(regexp_extract(col("record_id"), "doc:(\\d+)", 1)
              .cast("long")).as("rec_key"),
          col("warc_type"), col("target_uri"), col("content_length"),
          col("http_status").cast("long").as("http_status"),
          col("http_content_type"),
          octet_length(col("body")).cast("long").as("body_octets"))
        .orderBy(col("rec_key"))
    }),

    // Crash-replay recovery: a crash between the warehouse append and
    // the manifest append re-ingests the delta on retry — the failure
    // mode [[ingest.WarcIngest.ingestIncremental]] documents. The fix it
    // prescribes is exercised here: the delta is deliberately appended
    // TWICE, and dedup on (file, rec_offset) — the archive-native
    // exactly-once key every record carries — restores the clean table,
    // hash-matched against the one-shot q_warc_records oracle verbatim.
    "q_warc_dedup_replay" -> ((s, dir) => {
      val warc = warcFixtureDir(s, dir)
      val files = ingest.WarcIngest.listArchives(s, warc)
      val once = ingest.WarcIngest.readRecordFiles(s, files)
      val replayed = once.unionByName(
        ingest.WarcIngest.readRecordFiles(s, files.take(2)))
      replayed.dropDuplicates("file", "rec_offset")
        .select(
          when(col("warc_type") === "warcinfo",
            -regexp_extract(col("record_id"), "warcinfo:(\\d+)", 1)
              .cast("long") - 1)
            .otherwise(regexp_extract(col("record_id"), "doc:(\\d+)", 1)
              .cast("long")).as("rec_key"),
          col("warc_type"), col("target_uri"), col("content_length"),
          col("http_status").cast("long").as("http_status"),
          col("http_content_type"),
          octet_length(col("body")).cast("long").as("body_octets"))
        .orderBy(col("rec_key"))
    }),

    // The BINARY crawl: image/png responses whose bodies must round-trip
    // the archive BYTE-EXACT (real crawls are mostly binary) — WARC
    // parse → image/png + 200 gate → real PNG pixel decode from
    // body_bytes → plane checksums, hash-matched against the direct-
    // decode formula oracle verbatim.
    "q_warc_image_decode" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      ingest.WarcIngest.readRecords(s, warcImageFixtureDir(s, dir))
        .filter(col("warc_type") === "response" &&
          col("http_status") === 200 &&
          col("http_content_type") === "image/png")
        .select(regexp_extract(col("record_id"), "doc:(\\d+)", 1).cast("long")
            .as("media_id"),
          col("body_bytes"))
        .as[(Long, Array[Byte])]
        .map { case (id, bytes) =>
          val (w, h, plane) = Multimodal.decodePngPixels(bytes)
            .getOrElse((0, 0, Array.emptyByteArray))
          var lsum = 0L; var wsum = 0L; var i = 0
          while (i < plane.length) {
            val l = plane(i) & 0xff
            lsum += l; wsum += l.toLong * (i % 97 + 1); i += 1
          }
          (id, w.toLong, h.toLong, plane.length.toLong, lsum, wsum)
        }
        .toDF("media_id", "width", "height", "n_pixels", "lum_sum", "lum_wsum")
        .orderBy(col("media_id"))
    }),

    // IMAGE-TEXT PAIRS OUT OF THE ARCHIVE — the full multimodal chain
    // the pieces were built for: HTML pages (one WARC) are parsed for
    // <img> tags with alt + figcaption captions, srcs resolve and
    // canonicalize into keys, and the IMAGE archive's byte-exact bodies
    // decode to real PNG pixels — joined on the canonical URL into
    // (page, alt, caption, width, height, pixels, checksum) training
    // pairs. The caption names the true dimensions, so the oracle
    // cross-checks extraction against the decoded planes in one gate.
    // Scale shape: both sides are per-row codegen projections; the one
    // shuffle is the URL-keyed join (sort-merge at corpus scale —
    // neither side is broadcastable at 100 TB, and AQE handles skew).
    "q_warc_image_pairs" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val pages = ingest.WarcIngest
        .readRecords(s, warcImgPageFixtureDir(s, dir))
        .filter(col("warc_type") === "response" &&
          col("http_status") === 200 &&
          col("http_content_type").startsWith("text/html"))
        .select(regexp_extract(col("record_id"), "doc:(\\d+)", 1)
            .cast("long").as("doc_id"),
          col("target_uri"),
          explode(graft.expr.HtmlExpressions.html_images(col("body")))
            .as("im"))
        .select(col("doc_id"),
          graft.expr.UrlExpressions.url_canonicalize(
            graft.expr.UrlExpressions.url_resolve(col("target_uri"),
              col("im.src"))).as("img_url"),
          col("im.alt").as("alt"), col("im.caption").as("caption"))
      val pixels = ingest.WarcIngest
        .readRecords(s, warcImageFixtureDir(s, dir))
        .filter(col("warc_type") === "response" &&
          col("http_status") === 200 &&
          col("http_content_type") === "image/png")
        .select(graft.expr.UrlExpressions.url_canonicalize(
            col("target_uri")).as("img_url"),
          col("body_bytes"))
        .as[(String, Array[Byte])]
        .map { case (u, bytes) =>
          val (w, h, plane) = Multimodal.decodePngPixels(bytes)
            .getOrElse((0, 0, Array.emptyByteArray))
          var lsum = 0L; var i = 0
          while (i < plane.length) { lsum += plane(i) & 0xff; i += 1 }
          (u, w.toLong, h.toLong, plane.length.toLong, lsum)
        }
        .toDF("img_url", "width", "height", "n_pixels", "lum_sum")
      pages.join(pixels, Seq("img_url"))
        .select(col("doc_id"), col("img_url"), col("alt"), col("caption"),
          col("width"), col("height"), col("n_pixels"), col("lum_sum"))
        .orderBy(col("doc_id"))
    }),

    // The WET loop (Common Crawl's extraction OUTPUT format): text-WARC
    // parsed → boilerplate-stripped → written back as WET archives
    // (`conversion` records, bare text/plain payload, bucketed + gz like
    // the input) → re-read. Extraction must survive its own archive
    // round-trip byte-exact, so this shares the q_text_extract oracle
    // VERBATIM — the full WARC-in/WET-out cycle in one gate.
    "q_warc_wet_roundtrip" -> ((s, dir) => {
      val recs = ingest.WarcIngest.readRecords(s, warcFixtureDir(s, dir))
      val extracted = recs.filter(col("warc_type") === "response" &&
          col("http_status") === 200 &&
          col("http_content_type").startsWith("text/html"))
        .select(regexp_extract(col("record_id"), "doc:(\\d+)", 1).cast("long")
            .as("doc_id"),
          col("target_uri").as("uri"),
          graft.expr.HtmlExpressions.html_content_text(col("body"))
            .as("extracted"))
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_wet_"))
      val out =
        s"${System.getProperty("java.io.tmpdir")}/graft_wet_${runTag(dir)}"
      ingest.WarcIngest.writeWet(s, extracted, "doc_id", "uri", "extracted",
        out, nFiles = 4)
      ingest.WarcIngest.readRecords(s, out)
        .filter(col("warc_type") === "conversion")
        .select(regexp_extract(col("record_id"), "doc:(\\d+)", 1).cast("long")
            .as("doc_id"),
          col("body").as("extracted"))
        .orderBy(col("doc_id"))
    }),

    // Per-archive rollup (the crawl operator's manifest view): record/
    // response counts and payload/body octet volumes per bucket file —
    // identical for the gzipped and plain buckets, which is the codec-
    // transparency gate.
    "q_warc_stats" -> ((s, dir) => {
      val recs = ingest.WarcIngest.readRecords(s, warcFixtureDir(s, dir))
      recs.groupBy(regexp_extract(col("file"), "warc-(\\d+)\\.warc", 1)
          .cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_records"),
          sum(when(col("warc_type") === "response", 1L).otherwise(0L))
            .as("n_responses"),
          sum(col("content_length")).as("payload_octets"),
          sum(octet_length(col("body")).cast("long")).as("body_octets"))
        .orderBy(col("bucket"))
    }),

    // Curriculum ordering (easy→hard schedule): documents ranked by the
    // unigram-LM mean piece cost (low perplexity first), cut into 4
    // equal phases by the DISTRIBUTED rank (prefix-sum of ones over the
    // composite key — no single-partition global window), Knuth-shuffled
    // within each phase. The oracle replays rank, phase arithmetic, and
    // the within-phase hash order on top of the shared Viterbi machinery.
    "q_curriculum" -> ((s, dir) => {
      val cost = operators.UnigramTokenizer.lmCost(t(s, dir, "documents"),
        "doc_id", "text", operators.UnigramTokenizer.frozenVocab)
      operators.TrainPipeline.curriculumOrder(cost, "doc_id",
          col("mean_cost_milli"), phases = 4)
        .orderBy(col("doc_id"))
    }),

    // The CRAWL→TRAINER capstone: the entire front of the pipeline in one
    // hash-gated chain — WARC archives parsed (streaming iterator) →
    // HTTP 200 text/html gate → boilerplate-stripped extraction → URL
    // blocklist → exact dedup ON THE EXTRACTED TEXT → token-count
    // quality floor → deterministic JSONL shards for the trainer → read
    // back. Every stage is an already-oracled operator; the composition
    // oracle reconstructs the surviving documents and the exact JSONL
    // lines (to_json's newline escaping included) from the source table.
    "q_crawl_pipeline" -> ((s, dir) => {
      val recs = ingest.WarcIngest.readRecords(s, warcFixtureDir(s, dir))
      val pages = recs.filter(col("warc_type") === "response" &&
          col("http_status") === 200 &&
          col("http_content_type").startsWith("text/html"))
        .select(regexp_extract(col("record_id"), "doc:(\\d+)", 1).cast("long")
            .as("doc_id"),
          col("target_uri").as("url"),
          graft.expr.HtmlExpressions.html_content_text(col("body"))
            .as("extracted"))
      val gated = operators.WebCuration.filterBlocked(pages, "url",
        Seq("src1\\.example\\.com"))
      val curated = operators.Dedup.exactDedup(gated, Seq("extracted"), "doc_id")
        .withColumn("n_tok",
          TextAnalysis.tokenCount(col("extracted")).cast("long"))
        .filter(col("n_tok") >= 32)
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_crawlout_"))
      val out =
        s"${System.getProperty("java.io.tmpdir")}/graft_crawlout_${runTag(dir)}"
      sink.Jsonl.writeShards(curated, out,
        Seq(col("doc_id"), col("n_tok"), col("extracted")),
        shardKey = col("doc_id"), sortCol = col("doc_id"), nShards = 4)
      sink.Jsonl.readShards(s, out)
        .withColumn("doc_id",
          get_json_object(col("value"), "$.doc_id").cast("long"))
        .select(col("doc_id"), col("shard"), col("value").as("line"))
        .orderBy(col("doc_id"))
    }),

    // Temperature-based multilingual mixing (the mT5/XLM-R α-sampling
    // recipe, α = 1/2): per-language token budgets ∝ isqrt(language token
    // total) — upsampling low-resource langs relative to their natural
    // share — then a deterministic Knuth-hash-order take per language
    // until the budget fills. Integer-exact: the exact isqrt, floor-
    // division budgets, running-sum window; the oracle replays all three
    // (its isqrt is the BLEU oracle's float-seeded integer-corrected
    // ladder).
    "q_mix_temperature" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.Sampling.temperatureMix(docs, "doc_id", "lang",
          size(split(col("text"), " ")).cast("long"),
          totalTokenBudget = 15000L)
        .select(col("doc_id"), col("lang"), col("n_tok"),
          col("lang_budget"), col("running"))
        .orderBy(col("doc_id"))
    }),

    // JSONL export→import round-trip (the trainer handoff format): the
    // corpus written as deterministic JSONL shards (one file per shard
    // dir, rows sorted, field order = struct order) and read back as
    // text — every LINE hash-matched against the oracle's character-
    // exact reconstruction of Spark's to_json output, plus the shard
    // assignment recovered from the directory layout.
    "q_jsonl_roundtrip" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_jsonl_"))
      val out =
        s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_${runTag(dir)}"
      val docs = t(s, dir, "documents")
      sink.Jsonl.writeShards(docs, out,
        Seq(col("doc_id"), col("lang"), col("n_chars"), col("text")),
        shardKey = col("doc_id"), sortCol = col("doc_id"), nShards = 4)
      sink.Jsonl.readShards(s, out)
        .withColumn("doc_id",
          get_json_object(col("value"), "$.doc_id").cast("long"))
        .select(col("doc_id"), col("shard"), col("value").as("line"))
        .orderBy(col("doc_id"))
    }),

    // Dirty JSONL ingestion: a dump where every doc_id % 50 == 13 line is
    // TRUNCATED mid-record (the classic interrupted-writer artifact).
    // PERMISSIVE read under the expected schema: malformed lines survive
    // as NULL fields + the raw line in _corrupt_record — never dropped
    // silently, never failing the job — and the oracle reconstructs both
    // the clean rows and the exact truncated raw strings.
    "q_jsonl_source" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_jsonlsrc_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_jsonlsrc_${runTag(dir)}"
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"),
          to_json(struct(col("doc_id"), col("lang"), col("n_chars")))
            .as("value"))
        .select(
          when(col("doc_id") % 50 === 13,
            expr("substring(value, 1, length(value) - 8)"))
            .otherwise(col("value")).as("value"))
        .write.mode("overwrite").text(src)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("lang", "string").add("n_chars", "long")
      sink.Jsonl.readJsonl(s, src, schema)
        .select(
          coalesce(col("doc_id"),
            regexp_extract(col("_corrupt_record"), "\"doc_id\":(\\d+)", 1)
              .cast("long")).as("rec_id"),
          col("doc_id"), col("lang"), col("n_chars"),
          col("_corrupt_record").isNotNull.as("is_corrupt"),
          col("_corrupt_record").as("raw"))
        .orderBy(col("rec_id"))
    }),

    // STREAMING dirty-JSONL ingestion: the same truncated-line dump
    // arrives file by file and is parsed ON THE STREAM by Spark's native
    // JSON file source (PERMISSIVE, corrupt-record capture) — parsing is
    // pure per-row, so the bounded stream shares the batch
    // q_jsonl_source oracle VERBATIM.
    "q_stream_jsonl_source" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_jsonlstr_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_jsonlstr_${runTag(dir)}"
      t(s, dir, "documents").select(col("doc_id"),
          to_json(struct(col("doc_id"), col("lang"), col("n_chars")))
            .as("value"))
        .select(
          when(col("doc_id") % 50 === 13,
            expr("substring(value, 1, length(value) - 8)"))
            .otherwise(col("value")).as("value"))
        .repartition(4)
        .write.mode("overwrite").text(src)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("lang", "string").add("n_chars", "long")
      streaming.StreamingIngest.runStreamJsonlBounded(s, src, schema)
        .select(
          coalesce(col("doc_id"),
            regexp_extract(col("_corrupt_record"), "\"doc_id\":(\\d+)", 1)
              .cast("long")).as("rec_id"),
          col("doc_id"), col("lang"), col("n_chars"),
          col("_corrupt_record").isNotNull.as("is_corrupt"),
          col("_corrupt_record").as("raw"))
        .orderBy(col("rec_id"))
    }),

    // REAL subword tokenization under the FROZEN shipped-artifact merge
    // table (the production tokenizer shape — GPT-2-style BPE applies a
    // fixed published merge list, it never re-learns per corpus): the
    // merges are a constant learned from the in-code seed word table, the
    // Spark side applies them shuffle-free under a broadcast rank map,
    // and the oracle applies the SAME literal merges with a recursive
    // CTE (rank-ordered replace-to-fixpoint, provably equivalent to
    // best-rank greedy because a pair's rank always exceeds the ranks
    // that formed its symbols) — token streams hash-match exactly.
    "q_bpe_tokenize" -> ((s, dir) =>
      operators.BpeTokenizer.tokenizeWith(t(s, dir, "documents"), "doc_id",
        "text", operators.BpeTokenizer.frozenMerges)
        .orderBy(col("doc_id"), col("pos"))),

    // BPE FERTILITY — the tokenizer-evaluation report under the REAL
    // frozen BPE (q_tokenizer_fertility's sibling: that one counts
    // regex "bpe-ish" pieces per LANG; this one counts actual merge-
    // table tokens per SOURCE): tokens-per-word (fertility) and
    // chars-per-token (compression) in exact ppm fixed point. Per-row
    // HOF counting + ONE source-keyed combining aggregate; the oracle
    // replays the BPE fixpoint per distinct word and re-aggregates.
    "q_bpe_fertility" -> ((s, dir) => {
      val toks = operators.Dedup.cleanTokens(col("text"))
      val bpe = operators.BpeTokenizer.tokenCountColumn(
        operators.BpeTokenizer.frozenMerges, col("text"))
      t(s, dir, "documents")
        .select(col("source"), size(toks).cast("long").as("__w"),
          bpe.cast("long").as("__t"),
          aggregate(toks, lit(0L), (a, x) => a + length(x).cast("long"))
            .as("__c"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("n_words"),
          sum(col("__t")).as("n_tokens"), sum(col("__c")).as("n_chars"))
        .select(col("source"), col("n_docs"), col("n_words"),
          col("n_tokens"), col("n_chars"),
          expr("(1000000 * n_tokens) div n_words").as("fertility_ppm"),
          expr("(1000000 * n_chars) div n_tokens")
            .as("chars_per_token_ppm"))
        .orderBy(col("source"))
    }),

    // The SECOND production tokenizer family: SentencePiece-style
    // unigram-LM segmentation (Kudo, ACL'18) under the frozen vocabulary
    // trained (one Viterbi-EM round, integer milli-nat costs, required
    // a-z0-9 coverage) from the same seed table as the BPE merges. The
    // Spark side is a pure per-row Viterbi (zero shuffle); the oracle
    // literalizes the (piece → cost) map and replays the DP as TWO
    // recursive CTEs — forward best/backpointer over DISTINCT words,
    // backward reconstruction — then joins segmentations back to word
    // instances. Token streams hash-match exactly.
    "q_unigram_tokenize" -> ((s, dir) =>
      operators.UnigramTokenizer.tokenizeWith(t(s, dir, "documents"),
        "doc_id", "text", operators.UnigramTokenizer.frozenVocab)
        .orderBy(col("doc_id"), col("widx"), col("pidx"))),

    // The tokenizer's free quality signal: per-document negative
    // log-likelihood under the unigram LM (sum of piece costs,
    // milli-nats; mean per piece ≈ log perplexity) — the classic
    // LM-filter score for corpus curation, integer-exact. One narrow
    // tokenize pass + one doc-keyed combining aggregate; the oracle
    // aggregates its own Viterbi stream.
    "q_unigram_ppl" -> ((s, dir) =>
      operators.UnigramTokenizer.lmCost(t(s, dir, "documents"),
        "doc_id", "text", operators.UnigramTokenizer.frozenVocab)
        .orderBy(col("doc_id"))),

    // Per-language tokenizer diagnostics: fertility (pieces per word —
    // the cross-lingual tokenizer-equity metric; a language with 2×
    // fertility pays 2× the sequence length for the same text) and mean
    // piece length, both exactly-rational ppm. Pieces rebuild each word
    // exactly, so piece chars = non-space chars — no re-tokenization for
    // the char side.
    "q_unigram_fertility" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val perDoc = operators.UnigramTokenizer.lmCost(docs, "doc_id", "text",
        operators.UnigramTokenizer.frozenVocab)
      perDoc.join(docs.select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("__w"),
          length(regexp_replace(col("text"), " ", "")).cast("long")
            .as("__ch")), "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__w")).as("n_words"),
          sum(col("n_pieces")).as("n_pieces"),
          sum(col("__ch")).as("n_piece_chars"))
        .withColumn("fertility_ppm", expr("(1000000 * n_pieces) div n_words"))
        .withColumn("chars_per_piece_ppm",
          expr("(1000000 * n_piece_chars) div n_pieces"))
        .orderBy(col("lang"))
    }),

    // Persistence twin: the vocabulary round-trips a parquet artifact
    // (piece, cost_milli) and the RELOADED model must reproduce the
    // token stream bit-for-bit — same oracle verbatim.
    "q_unigram_reload" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_unigram_"))
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_unigram_${runTag(dir)}"
      operators.UnigramTokenizer.saveVocab(s,
        operators.UnigramTokenizer.frozenVocab, path)
      val reloaded = operators.UnigramTokenizer.loadVocab(s, path)
      operators.UnigramTokenizer.tokenizeWith(t(s, dir, "documents"),
        "doc_id", "text", reloaded)
        .orderBy(col("doc_id"), col("widx"), col("pidx"))
    }),

    // CORPUS-learned BPE (Sennrich ACL'16): merges learned from the input
    // corpus itself. The learned token stream is not ANSI-expressible, so
    // the gated output is the tokenizer's deterministic CLAIM per
    // document: exact char length plus the round-trip identity
    // (detokenize ∘ tokenize = cleaned words) as a boolean — a learning
    // or application regression flips roundtrip_ok (round-14 fold; the
    // raw stream stays in the API, frozen-merge q_bpe_tokenize keeps the
    // full value oracle).
    "q_bpe_learned" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bad = operators.BpeTokenizer.roundTripViolations(docs, "doc_id",
          "text", numMerges = 200)
        .select(col("doc_id")).distinct().withColumn("__bad", lit(true))
      docs.join(bad, Seq("doc_id"), "left")
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
          col("__bad").isNull.as("roundtrip_ok"))
        .orderBy(col("doc_id"))
    }),

    // Round-trip gate: stripping </w> markers from the concatenated
    // tokens must reproduce the cleaned word sequence for EVERY document
    // — an independent builtin-expression path; violations-only output
    // against the empty-relation oracle.
    "q_bpe_learned_verify" -> ((s, dir) =>
      operators.BpeTokenizer.roundTripViolations(
        t(s, dir, "documents"), "doc_id", "text", numMerges = 200)),

    // Persistence gate (train once, score forever): tokenize under the
    // train-fresh learned merges vs under the save→parquet→load copy —
    // any divergent row violates; empty-relation oracle.
    "q_bpe_reload_verify" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_bpe_model_"))
      operators.BpeTokenizer.reloadViolations(
        t(s, dir, "documents"), "doc_id", "text", numMerges = 200,
        s"${System.getProperty("java.io.tmpdir")}/graft_bpe_model_${runTag(dir)}")
    }),

    // Character-entropy quality signal: base64/minified blobs score high,
    // template/padding spam scores low — (doc, char)-keyed exchanges only.
    // Hashed columns are the EXACT integers (n_chars, n_distinct); the
    // LN-derived entropy itself is gated by the tolerance sibling below —
    // hashing it directly lost a round to a libm rounding-boundary tie.
    "q_text_entropy" -> ((s, dir) =>
      TextAnalysis.charEntropy(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_chars"), col("n_distinct"))
        .orderBy(col("doc_id"))),

    // In-engine float gate for the entropy value: range, rounding-drift
    // and nullness violations only; oracle = empty relation.
    "q_text_entropy_verify" -> ((s, dir) =>
      TextAnalysis.charEntropyViolations(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // TRAINED document classifier (multinomial Naive Bayes, add-one
    // smoothing): train on 4/5 of the corpus labeled by `lang`, classify
    // the held-out fifth. The model is a vocab-sized broadcast table; the
    // corpus shuffles only on (doc, ·) keys — the CCNet/LLaMA quality-
    // classifier shape as a first-class oracled operator.
    "q_classify_nb" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.Classify.naiveBayes(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", "lang")
        .orderBy(col("doc_id"))
    }),

    // Persistence twin of q_classify_nb: train → save the model grid to
    // parquet → load it back → score. Shares q_classify_nb's ORACLE
    // verbatim, so the reloaded model must classify hash-identically to
    // the train-fresh one — the "train once, score forever" gate.
    "q_classify_nb_reload" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_nb_model_"))
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_nb_model_${runTag(dir)}"
      val docs = t(s, dir, "documents")
      operators.Classify.saveModel(
        operators.Classify.trainNaiveBayes(
          docs.filter(col("doc_id") % 5 =!= 0), "text", "lang"), path)
      operators.Classify.scoreNaiveBayes(
        operators.Classify.loadModel(s, path),
        docs.filter(col("doc_id") % 5 === 0), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Classifier evaluation, pure integer arithmetic end to end: per-group
    // tie-aware Mann–Whitney AUC over the (group, score)-GROUPED frame —
    // the window walks distinct scores, not rows, so quantized scores keep
    // the frame domain-bounded at any row scale. u2 = 2·U stays integer
    // under average-rank ties; auc_ppm via integer division. Hash-oracled.
    "q_eval_auc" -> ((s, dir) =>
      operators.Eval.aucByGroup(t(s, dir, "lineitem"), "l_linestatus",
        col("l_quantity"), col("l_returnflag") === "R")
        .orderBy(col("grp"))),

    // STREAMING model-quality monitoring: the same tie-aware AUC with the
    // (group, score) count grid as streaming state — exact sums merge
    // across micro-batches, the rank walk runs over the final state via
    // the shared batch code path. Exact integers ⇒ stream ≡ batch
    // IDENTICALLY, so this streaming query is FULLY hash-oracled by the
    // plain batch SQL (like q_stream_anomalies — no tolerance gate).
    "q_stream_auc" -> ((s, dir) =>
      StreamingIngest.runStreamAucBounded(s, s"$dir/events.parquet",
        pmod(col("user_id"), lit(3)), floor(col("value") * 1000),
        col("event_type") === "purchase",
        queryName = s"stream_auc_${streamCounter.incrementAndGet()}")
        .orderBy(col("grp"))),

    // Calibration (reliability) table: fixed-width integer score bins per
    // group — row count, positive count, exact score sum; mean predicted
    // vs observed rate derivable without a single float. One combining
    // shuffle on (group, bin). Hash-oracled.
    "q_eval_calibration" -> ((s, dir) =>
      operators.Eval.calibrationBins(t(s, dir, "documents"), "source",
        col("n_chars"), col("lang") === "en", nBins = 6, lo = 0L, hi = 600L)
        .orderBy(col("grp"), col("bin"))),

    // Retrieval-quality eval: per-query nDCG@10 over the dense cosine
    // top-10, graded relevance = label proximity (3 − |Δlabel| clamped at
    // 0). Discounts are the FROZEN ppm literals shared verbatim with the
    // oracle, so the whole metric is integer-exact; the ideal-rank window
    // spans ≤k rows per query. The brute-force ranking is the sf-scale
    // baseline — the IVF/PQ paths serve the same frame at 100 TB.
    "q_eval_ndcg" -> ((s, dir) =>
      operators.Eval.ndcgAtK(retrievalEvalRanked(s, dir), "query", "rank",
          "rel", k = 10)
        .orderBy(col("query"))),

    // The binary rank-metric family (reciprocal rank, precision@10,
    // recall@10) over the SAME graded ranking; the corpus-side relevant
    // totals come from a 10-row label histogram theta-joined per query —
    // a deliberately bounded broadcast, never a corpus re-scan per query.
    "q_eval_rankmetrics" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val isQ = pmod(col("vec_id"), lit(25)) === 7
      val hist = emb.filter(!isQ)
        .groupBy(col("label").cast("long").as("__cl"))
        .agg(count(lit(1)).as("__n"))
      val totalRel = emb.filter(isQ)
        .select(col("vec_id").as("query"), col("label").cast("long").as("__ql"))
        .join(broadcast(hist), abs(col("__ql") - col("__cl")) <= 2)
        .groupBy(col("query")).agg(sum(col("__n")).as("n_rel"))
      operators.Eval.rankMetricsAtK(retrievalEvalRanked(s, dir), "query",
          "rank", "rel", k = 10, totalRel)
        .orderBy(col("query"))
    }),

    // Generation eval, BLEU: candidate = tokens 2..14 of each ≥14-token
    // document, reference = tokens 1..12 — a sliding-window pair with
    // genuine partial n-gram overlap (and full clipping on repeated
    // words). Clipped/total counts per n are pure integers from the
    // per-row expression; bleu_milli is the EXACT integer 4th root of
    // the geometric mean (both engines compute ⌊(10¹²·A/B)^¼⌋, the
    // oracle via float-seeded integer-corrected isqrt). Candidate is
    // strictly longer than reference, so the transcendental brevity
    // penalty is pinned to 1 by construction — lengths are emitted so
    // any BP convention can be applied downstream.
    "q_eval_bleu" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 14)
      val pairs = docs.select(col("doc_id"),
        slice(split(col("text"), " "), 2, 13).as("cand"),
        slice(split(col("text"), " "), 1, 12).as("ref"))
      operators.Eval.bleuUpTo4(pairs, "doc_id", "cand", "ref")
        .orderBy(col("doc_id"))
    }),

    // Generation eval, chrF (β=2) over the same pairs as STRINGS:
    // character n-grams (n=1..6, whitespace-stripped — sacrebleu's
    // default), clipped multiset matches, per-n P/R ppm-floored first
    // then integer-averaged over the included n, one more floor division
    // for F. Completes the generation trio (precision-oriented BLEU,
    // recall-oriented ROUGE, tokenization-robust chrF) on one fixture.
    "q_eval_chrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 14)
      val pairs = docs.select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 2, 13), " ").as("cand"),
        array_join(slice(split(col("text"), " "), 1, 12), " ").as("ref"))
      operators.Eval.chrF(pairs, "doc_id", "cand", "ref")
        .orderBy(col("doc_id"))
    }),

    // Generation eval, ROUGE-L over the same pairs: LCS by per-row
    // rolling DP; P/R/F are exactly rational (F₁ = 2L/(c+r)) so the
    // whole metric is three floor divisions to ppm — no frozen tables
    // needed. The oracle recomputes the LCS with a recursive-CTE DP
    // (row-carrying prefix-max form).
    "q_eval_rouge" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 14)
      val pairs = docs.select(col("doc_id"),
        slice(split(col("text"), " "), 2, 13).as("cand"),
        slice(split(col("text"), " "), 1, 12).as("ref"))
      operators.Eval.rougeL(pairs, "doc_id", "cand", "ref")
        .orderBy(col("doc_id"))
    }),

    // Generation eval, WER over the same pairs: unit-cost token
    // Levenshtein by per-row rolling DP (zero shuffle); exactly rational
    // ⇒ one ppm floor. The oracle replays the DP as a recursive CTE in
    // prefix-MIN form — the in-row dependency dp[i][j-1]+1 unrolls to
    // dp[i][j] = j + min over k ≤ j of (t[k] − k), one parallel list
    // comprehension plus a sliced list_min per step (the dual of the
    // ROUGE-L oracle's prefix-max).
    "q_eval_wer" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 14)
      val pairs = docs.select(col("doc_id"),
        slice(split(col("text"), " "), 2, 13).as("cand"),
        slice(split(col("text"), " "), 1, 12).as("ref"))
      operators.Eval.wer(pairs, "doc_id", "cand", "ref")
        .orderBy(col("doc_id"))
    }),

    // Generation eval, ROUGE-1/ROUGE-2 recall over the same pairs: the
    // n-gram-recall half of the summarization pair, from the BLEU
    // clipped-count statistics over reference n-gram totals.
    "q_eval_rouge_n" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 14)
      val pairs = docs.select(col("doc_id"),
        slice(split(col("text"), " "), 2, 13).as("cand"),
        slice(split(col("text"), " "), 1, 12).as("ref"))
      operators.Eval.rougeN(pairs, "doc_id", "cand", "ref")
        .orderBy(col("doc_id"))
    }),

    // Generation eval, token-level F1 (the SQuAD/QA overlap metric) over
    // the same pairs: clipped unigram matches (the BLEU a1 statistic,
    // same codegen expression), exactly-rational P/R/F to ppm.
    "q_eval_token_f1" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 14)
      val pairs = docs.select(col("doc_id"),
        slice(split(col("text"), " "), 2, 13).as("cand"),
        slice(split(col("text"), " "), 1, 12).as("ref"))
      operators.Eval.tokenF1(pairs, "doc_id", "cand", "ref")
        .orderBy(col("doc_id"))
    }),

    // Generation eval, CER over the same pairs as STRINGS: both engines'
    // builtin char-level levenshtein (Spark codegen'd, DuckDB native) —
    // the tokenization-free twin, one ppm floor.
    "q_eval_cer" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 14)
      val pairs = docs.select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 2, 13), " ").as("cand"),
        array_join(slice(split(col("text"), " "), 1, 12), " ").as("ref"))
      operators.Eval.cer(pairs, "doc_id", "cand", "ref")
        .orderBy(col("doc_id"))
    }),

    // Lakehouse maintenance: the compaction PLAN for a small-file
    // manifest (here synthesized from documents: one "file" per
    // (source, doc_id div 20) slice, sized by its character count).
    // Pure metadata pass — start-offset packing via one per-partition
    // prefix-sum window; the data files are never read. Hash-oracled.
    "q_compaction_plan" -> ((s, dir) => {
      val manifest = t(s, dir, "documents")
        .groupBy(col("source"), expr("doc_id div 20").as("file_id"))
        .agg(sum(col("n_chars")).as("bytes"))
      sink.Compaction.planBins(manifest, "source", "file_id", "bytes",
          targetBytes = 4000L)
        .select(col("source"), col("file_id"), col("size"), col("bin"),
          col("bin_files"), col("bin_bytes"))
        .orderBy(col("source"), col("file_id"))
    }),

    // The plan's scheduler view: one row per output bin with the merge
    // rollup — what the rewrite executor consumes, without per-file rows.
    "q_compaction_summary" -> ((s, dir) => {
      val manifest = t(s, dir, "documents")
        .groupBy(col("source"), expr("doc_id div 20").as("file_id"))
        .agg(sum(col("n_chars")).as("bytes"))
      sink.Compaction.planSummary(manifest, "source", "file_id", "bytes",
          targetBytes = 4000L)
        .select(col("source"), col("bin"), col("bin_files"),
          col("bin_bytes"), col("needs_rewrite"))
        .orderBy(col("source"), col("bin"))
    }),

    // Privacy-governance gate: k-anonymity + l-diversity audit of the
    // customer table under the (nation, segment) quasi-identifier with
    // the account-balance thousand-bucket as the sensitive attribute.
    // Exact two-level combining aggregate — no count_distinct expand.
    "q_kanon_audit" -> ((s, dir) =>
      validate.Anonymity.kAnonymityAudit(t(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"),
          expr("cast(floor(c_acctbal / 1000) as bigint)"), k = 10L)
        .select(col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_mktsegment"), col("group_size"), col("l_distinct"),
          col("at_risk"))
        .orderBy(col("c_nationkey"), col("c_mktsegment"))),

    // Generalization FIXPOINT: widen the acctbal bucket (500·2^L) until
    // every (segment, bucket) group reaches k=20 — the level sweep runs
    // over the level-0 GROUPED frame only, and the chosen level is a
    // one-row broadcast joined back. Converges at a data-dependent
    // level the oracle re-derives independently. Hash-oracled.
    "q_kanon_generalize" -> ((s, dir) =>
      validate.Anonymity.generalizeNumericToK(t(s, dir, "customer"),
          Seq("c_mktsegment"), col("c_acctbal"), baseBucket = 500L, k = 20L)
        .withColumn("gen_level", col("gen_level").cast("long"))
        .orderBy(col("c_mktsegment"), col("bucket"))),

    // The SUPPRESSION path of the same fixpoint: k=40 is unreachable
    // (the sparse negative-balance bucket never merges past ~21 rows at
    // any widening), so the search caps at maxLevels and flags the
    // residual risky groups suppressed — generalize-then-suppress.
    "q_kanon_suppress" -> ((s, dir) =>
      validate.Anonymity.generalizeNumericToK(t(s, dir, "customer"),
          Seq("c_mktsegment"), col("c_acctbal"), baseBucket = 500L, k = 40L)
        .withColumn("gen_level", col("gen_level").cast("long"))
        .orderBy(col("c_mktsegment"), col("bucket"))),

    // Entity resolution, step 1 — matched pairs. The oracle is
    // BRUTE-FORCE all-pairs edit distance over the same records, so the
    // row match gates the two-pass blocking's RECALL (a candidate the
    // windows fail to co-locate breaks the compare), exactly the
    // q_image_phash_pairs gating style; the planted corruptions keep
    // every true edit inside the provably-complete region.
    "q_er_match" -> ((s, dir) =>
      operators.EntityResolution.blockedMatches(erRecords(s, dir),
          "rec_id", "name", maxDist = 1)
        .orderBy(col("idA"), col("idB"))),

    // Step 2 — matched pairs resolved into entities by distributed
    // connected components; entity id = min record id of the cluster.
    "q_er_entities" -> ((s, dir) => {
      val recs = erRecords(s, dir)
      operators.EntityResolution.entities(recs, "rec_id",
          operators.EntityResolution.blockedMatches(recs, "rec_id", "name",
            maxDist = 1))
        .select(col("id").as("rec_id"), col("entity_id"), col("canonical"))
        .orderBy(col("rec_id"))
    }),

    // STREAMING entity resolution: the same records arrive in 4
    // micro-batches; each delta is block-keyed once and matched against
    // the standing index only (never corpus-vs-corpus), entities
    // finalize through the shared CC path — stream ≡ batch verbatim, so
    // this streaming query carries q_er_entities' FULL hash oracle.
    "q_stream_er" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_er_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_er_src_${runTag(dir)}"
      erRecords(s, dir).repartition(4).write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamErBounded(s, src, "rec_id", "name",
          maxDist = 1)
        .select(col("id").as("rec_id"), col("entity_id"), col("canonical"))
        .orderBy(col("rec_id"))
    }),

    // Fingerprint: the harness row oracles the ANSI-expressible half (the
    // canonical normalized form); the engine-specific xxhash64 of it is
    // determinism/stability-checked in OperatorsSpec.
    "q_text_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprintNormalized(col("text")).as("fp_norm"),
          length(TextAnalysis.fingerprintNormalized(col("text"))).cast("long").as("fp_len"))
        .orderBy(col("doc_id"))),

    "q_text_chunks" -> ((s, dir) =>
      TextAnalysis.chunkDocuments(t(s, dir, "documents"), "doc_id", "text",
        chunkChars = 200, overlap = 50)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // Average precision @ 10 over the SAME ranking, with the same
    // corpus-side relevant totals as q_eval_rankmetrics; the per-hit
    // precision terms are ppm-floored FIRST (the documented fixed-point
    // contract), so MAP is integer-exact cross-engine.
    "q_eval_map" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val isQ = pmod(col("vec_id"), lit(25)) === 7
      val hist = emb.filter(!isQ)
        .groupBy(col("label").cast("long").as("__cl"))
        .agg(count(lit(1)).as("__n"))
      val totalRel = emb.filter(isQ)
        .select(col("vec_id").as("query"), col("label").cast("long").as("__ql"))
        .join(broadcast(hist), abs(col("__ql") - col("__cl")) <= 2)
        .groupBy(col("query")).agg(sum(col("__n")).as("n_rel"))
      operators.Eval.apAtK(retrievalEvalRanked(s, dir), "query", "rank",
          "rel", k = 10, totalRel)
        .orderBy(col("query"))
    }),

    // Data selection without scoring weights: the Pareto front of
    // documents over (length, vocabulary richness) — the rows no other
    // row dominates in both. Rows collapse to the x-DOMAIN frame before
    // the (domain-sized, deliberately unpartitioned) running-max window;
    // survivors join back broadcast. Oracle is the NOT EXISTS dominance
    // definition itself, so the window derivation is proven against the
    // semantics, not a replay of itself.
    "q_pareto_front" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          explode(operators.Dedup.cleanTokens(col("text"))).as("__tok"))
        .groupBy(col("doc_id"), col("n_chars"))
        .agg(countDistinct(col("__tok")).as("__vocab"),
          count(lit(1)).as("__total"))
        // lexical diversity trades off against length, so the front is a
        // genuine curve, not the two corner points
        .select(col("doc_id"), col("n_chars"),
          expr("(1000000 * __vocab) div __total").as("diversity_ppm"))
      operators.DataSelect.paretoFront2D(toks, "n_chars", "diversity_ppm")
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("diversity_ppm"))
        .orderBy(col("doc_id"))
    }),

    // The per-GROUP skyline — a front per source (the realistic shape:
    // per-language/per-split selection curves); the window partitions by
    // the group, still over the x-domain frame.
    "q_pareto_by_group" -> ((s, dir) => {
      val pts = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          explode(operators.Dedup.cleanTokens(col("text"))).as("__tok"))
        .groupBy(col("doc_id"), col("source"), col("n_chars"))
        .agg(countDistinct(col("__tok")).as("__vocab"),
          count(lit(1)).as("__total"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          expr("(1000000 * __vocab) div __total").as("diversity_ppm"))
      operators.DataSelect.paretoFront2D(pts, "n_chars", "diversity_ppm",
          groupCols = Seq("source"))
        .select(col("doc_id"), col("source"),
          col("n_chars").cast("long").as("n_chars"), col("diversity_ppm"))
        .orderBy(col("doc_id"))
    }),

    // STREAMING skyline: the standing FRONT is the entire cross-batch
    // state (dominance merges — front(A∪B) = front(front(A)∪B), by
    // transitivity), each batch folding through the SAME batch operator
    // code. Stream ≡ batch verbatim ⇒ q_pareto_front's full hash oracle.
    "q_stream_pareto" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_pareto_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_pareto_src_${runTag(dir)}"
      t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          explode(operators.Dedup.cleanTokens(col("text"))).as("__tok"))
        .groupBy(col("doc_id"), col("n_chars"))
        .agg(countDistinct(col("__tok")).as("__vocab"),
          count(lit(1)).as("__total"))
        .select(col("doc_id"), col("n_chars"),
          expr("(1000000 * __vocab) div __total").as("diversity_ppm"))
        .repartition(4).write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamParetoBounded(s, src,
          "n_chars", "diversity_ppm")
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("diversity_ppm"))
        .orderBy(col("doc_id"))
    }),

    // Unicode-normalized EXACT dedup — the canonicalizer composed into
    // the dedup family: mixed precomposed/decomposed/case spellings of
    // the same logical key (synthesized in pairs) collide only after
    // NFC + fold, and the min-id survivor election runs on the
    // normalized key. One combining shuffle on the folded key.
    "q_dedup_unicode" -> ((s, dir) => {
      val variants = array(
        lit("Caf\u00e9"), lit("Cafe\u0301"), // precomposed vs decomposed
        lit("N\u00d6EL"), lit("no\u0308el"), // case + composition
        lit("\u00c9cole"), lit("E\u0301cole"),
        lit("plain"), lit("PLAIN"))
      val raw = concat(
        element_at(variants, (pmod(col("doc_id"), lit(8)) + 1).cast("int")),
        lit(" doc "), expr("cast(doc_id div 8 as string)"))
      val keyed = t(s, dir, "documents")
        .select(col("doc_id"), raw.as("raw"),
          TextAnalysis.normalizeUnicode(raw, lower = true, stripMarks = true)
            .as("key"))
      val survivors = keyed.groupBy(col("key"))
        .agg(min(col("doc_id")).as("canonical"), count(lit(1)).as("group_n"))
      keyed.join(survivors, "key")
        .select(col("doc_id"), col("key"), col("canonical"), col("group_n"),
          (col("doc_id") === col("canonical")).as("survivor"))
        .orderBy(col("doc_id"))
    }),

    // Unicode canonicalization over a combining-mark fixture (the ASCII
    // corpus is decorated with precomposed/decomposed/case variants of
    // the same words): NFC + case-fold + accent-strip. The hash gate
    // pins JDK java.text.Normalizer against DuckDB's utf8proc
    // (nfc_normalize / lower / strip_accents) — both implement the same
    // Unicode tables, and this is what holds them to it.
    "q_text_normalize" -> ((s, dir) => {
      val variants = array(
        lit("\u00c9cole"), lit("E\u0301cole"), // precomposed vs decomposed E-acute
        lit("no\u0308el"), lit("n\u00f6el"), // decomposed vs precomposed o-diaeresis
        lit("\u00dfTRASSE"), lit("Cafe\u0301"), lit("CAF\u00c9"),
        lit("ascii only"))
      val raw = concat(
        element_at(variants, (pmod(col("doc_id"), lit(8)) + 1).cast("int")),
        lit(" "), substring(col("text"), 1, 8))
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.normalizeUnicode(raw).as("nfc"),
          TextAnalysis.normalizeUnicode(raw, lower = true, stripMarks = true)
            .as("folded"),
          length(TextAnalysis.normalizeUnicode(raw)).cast("long")
            .as("nfc_chars"))
        .orderBy(col("doc_id"))
    }),

    // int8 scalar quantization: per-dim codebook from ONE bounded
    // aggregate, codes via pure codegen transform — the 4x scan/shuffle
    // cut of an IVF-SQ vector pipeline; exploded to scalar rows so the
    // hash gate compares every code.
    "q_vec_quantize" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (lo, hi) = operators.VectorQuantize.trainMinMax(emb, "embedding")
      operators.VectorQuantize.quantize(emb.filter(col("vec_id") < 160), "embedding", lo, hi)
        .select(col("vec_id"), posexplode(col("qcode")).as(Seq("dim", "code")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
          col("code").cast("long").as("code"))
        .orderBy(col("vec_id"), col("dim"))
    }),

    // Exactly-k-per-group deterministic sample (hash-ranked reservoir).
    "q_sample_per_group" -> ((s, dir) =>
      operators.Sampling.sampleKPerGroup(t(s, dir, "documents"), "doc_id", "source", k = 5)
        .select(col("doc_id"), col("source"))
        .orderBy(col("source"), col("doc_id"))),

    // Composite quality gate with explainable per-rule reasons — the
    // keep/drop decision of a corpus-cleaning pipeline, fully oracled
    // (every rule is fixed-order double math over oracled stats).
    "q_quality_filter" -> ((s, dir) =>
      TextAnalysis.qualityFilter(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("keep"), col("reasons"))
        .orderBy(col("doc_id"))),

    // The Gopher STRUCTURAL gates fired on purpose: docs re-lined 6
    // words per line, then one pathology per doc_id%5 slot — bullet
    // chrome ("- " on every line), teaser ellipses ("..." on every line
    // end, which also drives the '#'/'...'-per-word symbol ratio over
    // threshold), hash stuffing (" #" per line), and a machine-repeated
    // phrase whose deflate ratio (~0.04) trips the compression gate the
    // token stats alone would see as merely repetitive. The oracle
    // replays every SQL-expressible rule over the SAME reconstructed
    // text; `compressible` is the planted doc_id%5=4 slot by
    // construction (natural-text floor 0.38 vs threshold 0.25 vs
    // planted 0.04 — the exact-regime pin of the q_quality_filter
    // note, here with the rule actually firing).
    "q_quality_filter_gopher" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val words = filter(split(col("text"), " "), w => length(w) > 0)
      val ng = ((size(words) + lit(5)) / lit(6)).cast("int")
      val linesArr = transform(sequence(lit(0), ng - 1), g =>
        array_join(slice(words, g * 6 + 1, lit(6)), " "))
      val m = pmod(col("doc_id"), lit(5))
      val constructed = docs.select(col("doc_id"),
        when(m === 1,
            array_join(transform(linesArr, l => concat(lit("- "), l)), "\n"))
          .when(m === 2,
            array_join(transform(linesArr, l => concat(l, lit("..."))), "\n"))
          .when(m === 3,
            array_join(transform(linesArr, l => concat(l, lit(" #"))), "\n"))
          .when(m === 4, repeat(lit("lorem ipsum "), 40))
          .otherwise(array_join(linesArr, "\n")).as("text"))
      TextAnalysis.qualityFilter(constructed, "doc_id", "text")
        .select(col("doc_id"), col("keep"), col("reasons"))
        .orderBy(col("doc_id"))
    }),

    // Chunk-level exact dedup: boilerplate chunks duplicated across
    // otherwise-distinct documents, with the canonical first owner.
    "q_dedup_chunks" -> ((s, dir) =>
      Dedup.chunkDups(t(s, dir, "documents"), "doc_id", "text",
        chunkChars = 200, overlap = 50, minCount = 2)
        .orderBy(col("owner_doc"), col("owner_chunk"), col("chunk"))),

    // Bloom-prefiltered semi-join: result is EXACTLY the plain semi-join
    // (bloom false positives are removed by the verifying join), so the
    // oracle is a plain IN-subquery; the bloom only cuts shuffle volume.
    "q_join_bloom" -> ((s, dir) =>
      operators.BloomJoin.bloomSemiJoin(
        t(s, dir, "orders"),
        t(s, dir, "customer").filter(col("c_nationkey") === 3),
        "o_custkey", "c_custkey")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // Winnowed fingerprints (Schleimer et al., SIGMOD'03): narrow UDF +
    // explode, zero shuffle; the oracle recomputes the 31-fold poly hash,
    // the w=4 sliding window minimum, and the rightmost-tie selection in
    // pure SQL (selected positions are provably non-decreasing, so the
    // operator's dedupe-vs-last equals the oracle's DISTINCT).
    "q_winnow_fp" -> ((s, dir) =>
      operators.Winnowing.fingerprints(t(s, dir, "documents"), "doc_id", "text",
        k = 4, w = 4)
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("fp_hash"))
        .orderBy(col("doc_id"), col("pos"))),

    // Passage-level overlap: docs sharing >=2 winnowed fingerprints after a
    // doc-frequency cap on ubiquitous fingerprints (the stop-key skew bound)
    // — catches copied passages whole-document jaccard misses.
    "q_winnow_overlap" -> ((s, dir) =>
      operators.Winnowing.passageOverlapPairs(t(s, dir, "documents"),
        "doc_id", "text", k = 4, w = 4, minShared = 2, maxDocFreq = 50)
        .orderBy(col("idA"), col("idB"))),

    // Split-leakage audit: winnowed near-dup pairs whose endpoints fall in
    // DIFFERENT train/val/test splits — evaluation contamination, the gate
    // run after splitting. Pure composition of the q_winnow_overlap pair
    // derivation with the q_corpus_split assignment, so the oracle is the
    // two proven CTE chains joined.
    "q_split_leakage" -> ((s, dir) =>
      operators.Winnowing.splitLeakagePairs(t(s, dir, "documents"),
        "doc_id", "text", Seq(800, 100, 100), seed = 42L,
        k = 4, w = 4, minShared = 2, maxDocFreq = 50)
        .orderBy(col("idA"), col("idB"))),

    // Corpus forensics one level up: per source pair, distinct winnowed
    // fingerprints shared ("which feeds plagiarize which") — the decision
    // input for keeping two feeds at full weight vs downweighting a
    // re-crawl. The self-join runs over (source, fp) sets, corpus-smaller.
    "q_source_overlap" -> ((s, dir) =>
      operators.Winnowing.sourceOverlapMatrix(t(s, dir, "documents"),
        "doc_id", "text", "source", k = 4, w = 4, maxDocFreq = 50)
        .orderBy(col("srcA"), col("srcB"))),

    // The 100-TB sibling of q_source_overlap: per-source KMV sketches of
    // the SAME fingerprint sets, pairwise union/intersect/Jaccard from
    // k-sized sketch state — the fp-level self-join (quadratic in shared
    // fingerprints) never runs. Sketch estimates are engine-internal →
    // the gated output is the per-pair 6σ-bounds claim (round-14 fold;
    // estimates stay in the API, the exact sibling above keeps the
    // fingerprint-level oracle).
    "q_source_overlap_est" -> ((s, dir) => {
      val fps = operators.Winnowing.sourceFingerprints(
        t(s, dir, "documents"), "doc_id", "text", "source",
        k = 4, w = 4, maxDocFreq = 50).localCheckpoint()
      val bad = operators.SetSketch.pairOverlapViolations(fps,
          "src", "fp_hash", k = 512)
        .select(col("seg_a"), col("seg_b")).distinct()
        .withColumn("__bad", lit(true))
      operators.SetSketch.pairOverlap(fps, "src", "fp_hash", k = 512)
        .join(bad, Seq("seg_a", "seg_b"), "left")
        .select(col("seg_a"), col("seg_b"), col("__bad").isNull.as("bounds_ok"))
        .orderBy(col("seg_a"), col("seg_b"))
    }),

    // Every estimate bound-checked against the exact fingerprint sets
    // (the q_kmv_overlap_verify contract on this corpus-derived input).
    // Violations only; oracle = empty relation.
    "q_source_overlap_est_verify" -> ((s, dir) =>
      operators.SetSketch.pairOverlapViolations(
        operators.Winnowing.sourceFingerprints(t(s, dir, "documents"),
          "doc_id", "text", "source", k = 4, w = 4, maxDocFreq = 50),
        "src", "fp_hash", k = 512)
        .orderBy(col("seg_a"), col("seg_b"), col("issue"))),

    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashNearDupPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, k = 64, bands = 16, threshold = 0.2)
        .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("idA"), col("idB"))),

    // Verification-property sibling: every emitted minhash pair, re-scored
    // from RAW TEXT through the built-in-expression jaccard (no shingle
    // UDF, no hashed sets), must score >= threshold and agree with the
    // emitted value. Emits only violations; the oracle is the empty
    // relation — candidates approximate, verification exact and gated.
    "q_dedup_minhash_verify" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // LEFT joins + an explicit null clause: a dangling pair id (no source
      // row) or a null recompute must surface as a violation, not vanish
      // through an inner join / null-propagating predicate.
      Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        n = 3, k = 64, bands = 16, threshold = 0.2)
        .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
        .join(docs.select(col("doc_id").as("idA"), col("text").as("__ta")), Seq("idA"), "left")
        .join(docs.select(col("doc_id").as("idB"), col("text").as("__tb")), Seq("idB"), "left")
        .withColumn("__ta_toks", builtinTokens(col("__ta")))
        .withColumn("__tb_toks", builtinTokens(col("__tb")))
        .withColumn("jaccard_builtin",
          builtinNgramJaccard(col("__ta_toks"), col("__tb_toks"), 3))
        .filter(col("jaccard_builtin").isNull ||
          col("jaccard_builtin") < 0.2 ||
          round(col("jaccard_builtin"), 6) =!= col("jaccard") ||
          col("idA") >= col("idB")) // pair-ordering contract, like the other siblings
        .select(col("idA"), col("idB"), col("jaccard"),
          round(col("jaccard_builtin"), 6).as("jaccard_builtin"))
        .orderBy(col("idA"), col("idB"))
    }),

    // maxHamming=6: tight enough that the pair set stays near-linear in
    // corpus size (<=12 grows ~quadratically on vocabulary-limited text)
    "q_dedup_ngram" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.2)
        .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("idA"), col("idB"))),

    // Directed containment join: |sh(src) ∩ sh(dst)| / |sh(src)| ≥ 0.6 —
    // the quote/excerpt detector Jaccard can't express (union-normalized
    // scores vanish for short-inside-long). Probe prefixes vs full-posting
    // index (one-sided prefix filtering); exact intersect verify ⇒
    // hash-exact against the directional replay of the ngram oracle.
    "q_dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.6)
        .select(col("src_id"), col("dst_id"),
          round(col("containment"), 6).as("containment"))
        .orderBy(col("src_id"), col("dst_id"))),

    // Incremental dedup: 10% of doc_ids (mod-10 class 9, SF-independent)
    // as the "new batch" against the rest as the standing corpus —
    // new-vs-corpus and new-vs-new pairs only, corpus-vs-corpus never
    // joined.
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.incrementalNgramPairs(
        docs.filter(col("doc_id") % 10 =!= 9), docs.filter(col("doc_id") % 10 === 9),
        "doc_id", "text", n = 3, threshold = 0.2)
        .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("idA"), col("idB"))
    }),

    // The same incremental dedup with the standing index PERSISTED as a
    // parquet warehouse table and reloaded from disk (round-11 directive
    // #7): the corpus' hashed shingle sets are written in two per-batch
    // appends (the real ingest shape — and exactly the small-file
    // accumulation the warehouse compaction pass exists for), compacted
    // via Warehouse.compact, reloaded, and joined against the delta.
    // Shares q_dedup_incremental's oracle verbatim: persistence must be
    // a plan detail, never a semantics change.
    "q_dedup_incremental_indexed" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_ngram_index_"))
      val path = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_ngram_index_${runTag(dir)}"
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 9)
      Dedup.saveNgramIndex(
        Dedup.hashedShingles(corpus.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", n = 3), path, mode = "overwrite")
      Dedup.saveNgramIndex(
        Dedup.hashedShingles(corpus.filter(col("doc_id") % 2 =!= 0),
          "doc_id", "text", n = 3), path)
      sink.Warehouse.compact(s, path)
      Dedup.incrementalNgramPairsFromSets(
        Dedup.loadNgramIndex(s, path),
        Dedup.hashedShingles(docs.filter(col("doc_id") % 10 === 9),
          "doc_id", "text", n = 3), threshold = 0.2)
        .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("idA"), col("idB"))
    }),

    // SimHash near-dup detection: simhash proximity is its own metric —
    // a trigram-jaccard recall table is NOT an invariant (a 0.96-jaccard
    // pair can legitimately flip 7+ signature bits; measured at
    // sf0.001), so the gated output is the machinery's deterministic
    // contract: corpus size and zero violations of "every emitted pair's
    // hamming, recomputed from signatures derived directly from raw
    // text, equals the emitted value and respects the bound" (round-14
    // fold; the pair set itself stays in the API, the 7-chunk banding
    // recall guarantee at hamming ≤ 6 is spec-proven).
    "q_dedup_simhash" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sigs = Dedup.withSimhash(
        docs.select(col("doc_id"), col("text")), "text")
      val nv = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
          maxHamming = 6)
        .join(sigs.select(col("doc_id").as("idA"), col("simhash").as("__sa")),
          Seq("idA"), "left")
        .join(sigs.select(col("doc_id").as("idB"), col("simhash").as("__sb")),
          Seq("idB"), "left")
        .withColumn("__hd",
          bit_count(col("__sa").bitwiseXOR(col("__sb"))).cast("int"))
        .filter(col("__hd").isNull || col("__hd") =!= col("hamming") ||
          col("hamming") > 6 || col("idA") >= col("idB"))
        .agg(count(lit(1)).as("n_violations"))
      docs.agg(count(lit(1)).as("n_docs")).crossJoin(nv)
        .select(lit("simhash_near_dup").as("check"), col("n_docs"),
          col("n_violations"))
    }),

    // Verification-property sibling: each emitted pair's hamming distance,
    // recomputed from per-document signatures derived DIRECTLY from raw
    // text (bypassing the banding/bucket/cap/star candidate machinery the
    // query exercises), must equal the emitted value and respect the
    // maxHamming bound. The signature function itself is the shared
    // deterministic constant (spec-tested); what this gates is the entire
    // candidate pipeline. Violations only; oracle = empty relation.
    "q_dedup_simhash_verify" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sigs = Dedup.withSimhash(
        docs.select(col("doc_id"), col("text")), "text")
      // LEFT joins + null clause: dangling ids / null recomputes are
      // violations, never silently dropped (see the minhash sibling).
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 6)
        .join(sigs.select(col("doc_id").as("idA"), col("simhash").as("__sa")), Seq("idA"), "left")
        .join(sigs.select(col("doc_id").as("idB"), col("simhash").as("__sb")), Seq("idB"), "left")
        .withColumn("hamming_direct",
          bit_count(col("__sa").bitwiseXOR(col("__sb"))).cast("int"))
        .filter(col("hamming_direct").isNull ||
          col("hamming_direct") =!= col("hamming") ||
          col("hamming") > 6 || col("idA") >= col("idB"))
        .select(col("idA"), col("idB"), col("hamming"), col("hamming_direct"))
        .orderBy(col("idA"), col("idB"))
    }),

    // End-to-end corpus dedup: exact n-gram pairs → connected components →
    // min-id survivor per duplicate cluster (singletons survive alone).
    "q_dedup_cc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.2)
      Dedup.connectedComponents(docs.select(col("doc_id")), pairs, "doc_id")
        .select(col("id").as("doc_id"),
          col("component").cast("long").as("component"),
          (col("component") === col("id")).as("survivor"))
        .orderBy(col("doc_id"))
    }),

    // Link analysis: 3-iteration damped PageRank over the part↔supplier
    // co-occurrence graph (symmetric bipartite edges from lineitem, node id
    // = 2·partkey / 2·suppkey+1). Rank mass is integer micro-units and every
    // step is long floor-div + long sum, so the iterative result is
    // bit-exact across engines — the oracle replays the same three
    // iterations in BIGINT `//` math. At scale: one edges⋈ranks join + one
    // dst-keyed sum per iteration, ranks side broadcastable (|V| ≪ |E|).
    "q_pagerank" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val fwd = li.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = fwd.unionAll(li.select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst")))
      operators.Graph.pageRank(edges, "src", "dst", iters = 3)
        .orderBy(col("node"))
    }),

    // Exact per-node triangle counts over the part co-purchase graph
    // (parts sharing an order are adjacent) via degree-ordered orientation
    // — each triangle materializes once, at its ≺-minimal corner, and the
    // oriented out-degree bound O(√m) caps the wedge join's fan-out (the
    // celebrity-node guard). Pure counting ⇒ hash-exact cross-engine; the
    // oracle replays orientation + wedge + closure in plain SQL.
    "q_triangles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val pe = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct()
      val co = pe.as("x").join(pe.as("y"),
          col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      operators.Graph.triangleCounts(co, "src", "dst")
        .orderBy(col("node"))
    }),

    // DOULION edge-sampled approximate triangle count (Tsourakakis KDD'09)
    // — the 100×-scale sibling of q_triangles: keep each canonical edge
    // with deterministic-hash probability p, count exactly on the sample,
    // scale by 1/p³. p=0.5 cuts the dominant wedge-join workload ~4× (p²)
    // and closure work 8×; approximate-by-design → no-oracle headline,
    // driver-gated by the 6σ variance-bound sibling below plus the exact
    // q_triangles oracle.
    "q_triangles_approx" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val pe = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct()
      val co = pe.as("x").join(pe.as("y"),
          col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      operators.Graph.triangleEstimate(co, "src", "dst", pPct = 50)
    }),

    // Verification-property sibling: recompute the exact count T and the
    // shared-edge pair count k in-engine, form DOULION's published variance
    // bound Var ≤ T(1/p³−1) + 2k(1/p−1), and flag iff |est − T| > 6·σ.
    // The hash-deterministic sample makes the check stable run to run.
    // Violations only; oracle = empty relation.
    "q_triangles_approx_verify" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val pe = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct()
      val co = pe.as("x").join(pe.as("y"),
          col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      operators.Graph.triangleEstimateViolations(co, "src", "dst", pPct = 50)
    }),

    // k-CORE decomposition of the part co-purchase graph: peel nodes of
    // in-subgraph degree < k until the unique maximal min-degree-≥-k
    // subgraph remains — the dense-nucleus extractor. Output is the
    // peeling-ROUND assignment (−1 = core), which doubles as a
    // CERTIFICATE: the _verify gate re-proves the whole decomposition
    // with two local degree checks (pure joins, no re-peeling). Exact
    // and deterministic but iterative → not ANSI-expressible; rows-only
    // + certificate gate + brute-force-reference spec.
    "q_kcore" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val pe = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct()
      val co = pe.as("x").join(pe.as("y"),
          col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      operators.Graph.kCore(co, "src", "dst", k = 30)
        .orderBy(col("node"))
    }),

    // Certificate gate: REMOVABLE (each removed node had < k surviving
    // neighbors at its round) + SURVIVED (no node could have fallen a
    // round earlier; core nodes keep ≥ k core neighbors) + coverage.
    // Violations only; oracle = empty relation.
    "q_kcore_verify" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val pe = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct()
      val co = pe.as("x").join(pe.as("y"),
          col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      val assignment = operators.Graph.kCore(co, "src", "dst", k = 30)
      operators.Graph.kCoreViolations(co, "src", "dst", k = 30, assignment)
        .orderBy(col("node"), col("issue"))
    }),

    // Weighted bounded-hop shortest paths over the part↔supplier graph,
    // edge cost = min l_quantity of the co-occurrence (integers 1..50):
    // frontier Bellman-Ford ≡ full relaxation per round (proved in the
    // Scaladoc), so the 4 unrolled full-relaxation rounds of the oracle
    // hash-match. Integer min/plus only — no float path cost anywhere.
    "q_weighted_paths" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val fwd = li.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"), col("l_quantity").as("w"))
      val edges = fwd.unionAll(li.select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst"), col("l_quantity").as("w")))
      val seeds = t(s, dir, "part").filter(col("p_partkey") % 100 === 0)
        .select((col("p_partkey") * 2).as("seed"))
      operators.Graph.weightedDistances(edges, "src", "dst", "w",
          seeds, "seed", maxRounds = 4)
        .orderBy(col("node"))
    }),

    // Deterministic synchronous label propagation (3 rounds, min-label
    // ties) over the part↔supplier bipartite graph — community detection
    // as a pure function of the graph, so the oracle replays the same
    // rounds (QUALIFY row_number per node = the same argmax) and hashes
    // must match.
    "q_label_prop" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val fwd = li.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = fwd.unionAll(li.select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst")))
      operators.Graph.labelPropagation(edges, "src", "dst", iters = 3)
        .orderBy(col("node"))
    }),

    // Multi-source bounded-hop BFS over the part↔supplier bipartite graph
    // (same even/odd node encoding as q_pagerank): exact hop-distance from
    // the seed parts (p_partkey % 100 = 0) for everything within 4 hops —
    // the seed-expansion / contamination-radius primitive. Integer min
    // over real paths ⇒ hash-exact; the oracle unrolls 4 Bellman-Ford
    // relaxation rounds, which agree with frontier BFS at every horizon.
    "q_khop" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val fwd = li.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = fwd.unionAll(li.select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst")))
      val seeds = t(s, dir, "part").filter(col("p_partkey") % 100 === 0)
        .select((col("p_partkey") * 2).as("seed"))
      operators.Graph.bfsDistances(edges, "src", "dst", seeds, "seed",
          maxHops = 4)
        .orderBy(col("node"))
    }),

    // Headline embedding near-dup: IVF-cell-bounded candidates + exact
    // cosine verify — candidate volume is set by cluster granularity, not
    // the threshold (hyperplane banding collapses at loose thresholds;
    // measured 0.51 vs 0.40 recall here). The candidate ROW SET is
    // k-means-cell-internal, so the gated output is the machinery's
    // deterministic claim: corpus size and zero precision violations
    // (every emitted pair re-scores ≥ threshold with the matching 6dp
    // cosine via the builtin HOF path) — round-14 fold; candidate pairs
    // stay in the API, recall is spec-measured, exact sibling keeps the
    // value oracle.
    "q_dedup_embedding" -> ((s, dir) => {
      val embT = t(s, dir, "embeddings")
      val emb = embT.select(col("vec_id"),
        col("embedding").cast("array<float>").as("v"))
      val nv = Dedup.ivfNearDupPairs(embT, "vec_id", "embedding",
          threshold = 0.2, k = 16, nprobe = 2)
        .join(emb.select(col("vec_id").as("idA"), col("v").as("__va")),
          Seq("idA"), "left")
        .join(emb.select(col("vec_id").as("idB"), col("v").as("__vb")),
          Seq("idB"), "left")
        .withColumn("__cb", builtinCosine(col("__va"), col("__vb")))
        .filter(col("__cb").isNull || col("__cb") < 0.2 ||
          round(col("__cb"), 6) =!= col("cosine") || col("idA") >= col("idB"))
        .agg(count(lit(1)).as("n_violations"))
      embT.agg(count(lit(1)).as("n_vecs")).crossJoin(nv)
        .select(lit("ivf_near_dup").as("check"), col("n_vecs"),
          col("n_violations"))
    }),

    // Verification-property sibling: every emitted near-dup pair re-scored
    // from the raw embeddings with built-in HOF cosine (no FloatVecDot
    // expression, no IVF machinery) must score >= threshold and agree with
    // the emitted 6dp value. Violations only; oracle = empty relation.
    "q_dedup_embedding_verify" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("v"))
      // LEFT joins + null clause: a dangling pair id or a length-mismatched
      // embedding (zip_with pads with null → null cosine) is a violation,
      // not a silently dropped row.
      Dedup.ivfNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.2, k = 16, nprobe = 2)
        .join(emb.select(col("vec_id").as("idA"), col("v").as("__va")), Seq("idA"), "left")
        .join(emb.select(col("vec_id").as("idB"), col("v").as("__vb")), Seq("idB"), "left")
        .withColumn("cosine_builtin", builtinCosine(col("__va"), col("__vb")))
        .filter(col("cosine_builtin").isNull ||
          col("cosine_builtin") < 0.2 ||
          round(col("cosine_builtin"), 6) =!= col("cosine") ||
          col("idA") >= col("idB"))
        .select(col("idA"), col("idB"), col("cosine"),
          round(col("cosine_builtin"), 6).as("cosine_builtin"))
        .orderBy(col("idA"), col("idB"))
    }),

    // Exact all-pairs variant on a bounded slice — quadratic on purpose and
    // only ever run on a broadcast-sized subset; carries the DuckDB oracle.
    "q_dedup_embedding_exact" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(
        t(s, dir, "embeddings").filter(col("vec_id") < 200),
        "vec_id", "embedding", threshold = 0.2, exact = true)
        .orderBy(col("idA"), col("idB"))),

    // SemDeDup-style semantic dedup headline: k-means cells bound the
    // candidate pairs (nprobe=1 = strict SemDeDup, one cell per vector),
    // exact cosine verifies, connected components pick min-id survivors.
    // Cell assignment is engine-specific, so the gated output is the
    // per-vector CLUSTERING CONTRACT: survivor ⇔ component == id, the
    // component label is the minimum member id, and the component exists
    // as a survivor row — three booleans per vec_id, every one of which
    // flips on a CC/labeling regression (round-14 fold; labels stay in
    // the API, the exact-slice sibling keeps the value oracle).
    "q_dedup_semantic" -> ((s, dir) => {
      val res = Dedup.semanticDedup(t(s, dir, "embeddings"), "vec_id",
          "embedding", threshold = 0.2, k = 16, nprobe = 1)
        .localCheckpoint()
      val w = Window.partitionBy(col("component"))
      res.withColumn("__m", min(col("vec_id")).over(w))
        .join(res.filter(col("survivor"))
          .select(col("component").as("__c")).distinct(),
          col("component") === col("__c"), "left")
        .select(col("vec_id"),
          (col("survivor") === (col("component") === col("vec_id")))
            .as("flag_ok"),
          (col("__m") === col("component")).as("label_min_ok"),
          col("__c").isNotNull.as("component_exists"))
        .orderBy(col("vec_id"))
    }),

    // Exact-candidate sibling on a bounded slice: all-pairs cosine → CC →
    // survivors, ANSI-expressible end to end (recursive reachability
    // closure in the oracle, like q_dedup_cc).
    "q_dedup_semantic_exact" -> ((s, dir) =>
      Dedup.semanticDedup(
        t(s, dir, "embeddings").filter(col("vec_id") < 200),
        "vec_id", "embedding", threshold = 0.2, exact = true)
        .orderBy(col("vec_id"))),

    // Verification-property sibling for the approximate headline: the
    // output must be a well-formed min-label clustering — (a) survivor ⇔
    // component == id, (b) each component's label IS the minimum member
    // id, (c) every row's component exists as a survivor row. Violations
    // only; oracle = empty relation. (Pair-level cosine ≥ threshold is
    // gated by q_dedup_embedding_verify on the shared candidate machinery.)
    "q_dedup_semantic_verify" -> ((s, dir) => {
      val res = Dedup.semanticDedup(t(s, dir, "embeddings"), "vec_id",
        "embedding", threshold = 0.2, k = 16, nprobe = 1)
        .localCheckpoint() // three contract checks read it
      val badFlag = res
        .filter(col("survivor") =!= (col("component") === col("vec_id")))
        .select(col("vec_id"), col("component"), lit("flag_mismatch").as("issue"))
      val w = Window.partitionBy(col("component"))
      val badMin = res
        .withColumn("__m", min(col("vec_id")).over(w))
        .filter(col("__m") =!= col("component"))
        .select(col("vec_id"), col("component"), lit("label_not_min").as("issue"))
      val badRef = res
        .join(res.filter(col("survivor")).select(col("component").as("__c")).distinct(),
          col("component") === col("__c"), "left_anti")
        .select(col("vec_id"), col("component"), lit("no_survivor").as("issue"))
      badFlag.unionByName(badMin).unionByName(badRef)
        .orderBy(col("vec_id"), col("issue"))
    }),

    // Z-order (Morton) clustering value — the layout operator behind
    // two-dimensional scan pruning; pure codegen'd shift-or-mask ladder
    // (no UDF), bit-identical in ANSI SQL. zorderWrite() uses this value
    // with repartitionByRange to produce square-locality files (spec'd).
    "q_zorder_value" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          operators.ZOrder.zValue(col("l_orderkey"), col("l_partkey")).as("zval"))
        .orderBy(col("zval"), col("l_orderkey"), col("l_linenumber"))),

    // Hilbert layout value — the better-locality sibling of
    // q_zorder_value (consecutive values are Manhattan-adjacent cells,
    // no Morton diagonal jumps): a NATIVE expression whose codegen is
    // one static call to the 16-iteration xy2d loop (Column arithmetic
    // can't carry the per-level mutable state compactly — see
    // ZOrder.withHilbertValue); the oracle replays the recurrence as a
    // generated 16-level SQL CTE ladder.
    "q_hilbert_value" -> ((s, dir) =>
      operators.ZOrder.withHilbertValue(
          t(s, dir, "lineitem").select(col("l_orderkey"),
            col("l_linenumber").cast("long").as("l_linenumber"),
            col("l_partkey")),
          "l_orderkey", "l_partkey", "hval")
        .select(col("l_orderkey"), col("l_linenumber"), col("hval"))
        .orderBy(col("hval"), col("l_orderkey"), col("l_linenumber"))),

    "q_sim_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.cosineTopK(emb.filter(col("vec_id") < 16), emb, k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q_sim_topk_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshCosineTopK(emb.filter(col("vec_id") < 16), emb, k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Hard-negative mining: nearest neighbors with a DIFFERENT label —
    // contrastive-training data. Same broadcast-bounded-queries shape as
    // q_sim_topk; label mismatch filtered before any dot product runs.
    "q_mine_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegatives(emb.filter(col("vec_id") < 16), emb, k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // MMR diversity re-rank over the exact top-12 candidates: greedy
    // λ·rel − (1−λ)·max-sim-to-selected with λ = 0.7, k = 5. The entire
    // iterative selection is hash-oracled: relevance and pairwise sims
    // are micro-quantized (round(cos·10⁶)) BEFORE the greedy, the
    // objective is integer arithmetic, and the oracle replays the loop
    // as a recursive CTE carrying (candidate lists, pairwise sim matrix,
    // selected positions) per query.
    "q_sim_mmr" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.mmrRerank(emb.filter(col("vec_id") < 16), emb,
          k = 5, topN = 12)
        .orderBy(col("query_id"), col("step"))
    }),

    // Approximate IVF retrieval (nprobe = 4 of 16 cells): WHICH
    // neighbors the probes reach is engine-internal, so the gated output
    // is the per-query contract frame — k results, every emitted cosine
    // equal to the builtin recompute, monotone contiguous ranks
    // (round-14 fold; the neighbor lists stay in the API, the lossless
    // nprobe=16 twin q_sim_topk_ivf_full keeps the full value oracle).
    "q_sim_topk_ivf" -> ((s, dir) => {
      val embT = t(s, dir, "embeddings")
      val emb = embT.select(col("vec_id"),
        col("embedding").cast("array<float>").as("v"))
      val model = operators.IvfIndex.train(embT, "vec_id", "embedding", k = 16)
      val res = operators.IvfIndex.topK(embT.filter(col("vec_id") < 16),
        embT, model, k = 10, nprobe = 4).localCheckpoint()
      val badScore = res
        .join(emb.select(col("vec_id").as("query_id"), col("v").as("__q")),
          Seq("query_id"), "left")
        .join(emb.select(col("vec_id").as("neighbor_id"), col("v").as("__c")),
          Seq("neighbor_id"), "left")
        .withColumn("__rc", round(builtinCosine(col("__q"), col("__c")), 6))
        .filter(col("__rc").isNull || col("__rc") =!= col("cosine") ||
          col("query_id") === col("neighbor_id"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          lit("cosine_mismatch_or_self").as("issue"))
      annContract(res, badScore.unionByName(rankShapeViolations(res, "cosine")))
    }),

    // Verification-property sibling for the approximate IVF top-k: (a) each
    // emitted neighbor's cosine, re-scored from raw embeddings with the
    // built-in HOF path, must equal the emitted 6dp value and must not be a
    // self-match; (b) per query, cosine must be non-increasing in rank;
    // (c) per query, ranks must be the contiguous sequence 1..n. What stays
    // approximate (and sanctioned) is only WHICH neighbors the probes
    // reach. Violations only; oracle = empty relation.
    "q_sim_topk_ivf_verify" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("v"))
      val model = operators.IvfIndex.train(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 16)
      val res = operators.IvfIndex.topK(
        t(s, dir, "embeddings").filter(col("vec_id") < 16),
        t(s, dir, "embeddings"), model, k = 10, nprobe = 4)
        .localCheckpoint() // three checks read it; the IVF join runs once
      // LEFT joins + null clause (dangling ids / null recomputes are
      // violations); rank contiguity additionally requires DISTINCT ranks —
      // min==1 && max==count alone would pass a duplicate-plus-gap pattern
      // like {1,2,2,4}.
      val badScore = res
        .join(emb.select(col("vec_id").as("query_id"), col("v").as("__q")),
          Seq("query_id"), "left")
        .join(emb.select(col("vec_id").as("neighbor_id"), col("v").as("__c")),
          Seq("neighbor_id"), "left")
        .withColumn("__rc", round(builtinCosine(col("__q"), col("__c")), 6))
        .filter(col("__rc").isNull || col("__rc") =!= col("cosine") ||
          col("query_id") === col("neighbor_id"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          lit("cosine_mismatch_or_self").as("issue"))
      badScore.unionByName(rankShapeViolations(res, "cosine"))
        .orderBy(col("query_id"), col("rank"), col("issue"))
    }),

    // Product-quantization ADC top-k (Jégou et al., TPAMI'11): the corpus
    // side streams 8-byte codes, not 256-byte vectors — the memory-
    // compression half of billion-scale ANN. Codebooks are engine-internal
    // (per-block k-means), so the gated output is the per-query contract
    // frame (k results, ADC score ≡ decoded-vector recompute, monotone
    // contiguous ranks) — round-14 fold; the neighbor lists stay in the
    // API and recall vs the oracled exact q_sim_topk is spec-asserted in
    // PqSpec.
    "q_sim_topk_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = operators.ProductQuantize.train(emb, "vec_id", "embedding",
        m = 16, k = 64)
      val enc = operators.ProductQuantize.encode(
        emb.select(col("vec_id"), col("embedding")), "embedding", model)
        .localCheckpoint()
      val res = operators.ProductQuantize.adcTopKEncoded(
        emb.filter(col("vec_id") < 16),
        enc.select(col("vec_id").as("neighbor_id"), col("pq_code")),
        model, k = 10).localCheckpoint()
      val dec = operators.ProductQuantize.decodeCol(enc, "pq_code", model)
        .select(col("vec_id").as("neighbor_id"), col("pq_decoded").as("__dv"))
      val badScore = res
        .join(emb.select(col("vec_id").as("query_id"),
          col("embedding").cast("array<float>").as("__q")), Seq("query_id"), "left")
        .join(dec, Seq("neighbor_id"), "left")
        .withColumn("__rc",
          round(builtinBlockCosine(col("__q"), col("__dv"), model.m, model.dsub), 6))
        .filter(col("__rc").isNull || col("__rc") =!= col("score") ||
          col("query_id") === col("neighbor_id"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          lit("score_mismatch_or_self").as("issue"))
      annContract(res, badScore.unionByName(rankShapeViolations(res, "score")))
    }),

    // Verification-property sibling: (a) each emitted score re-derived
    // from the reconstruction (decode of the code) via the mirrored
    // block-grouped HOF cosine must equal the emitted 6dp value, with
    // dangling ids / null recomputes flagged; (b) scores non-increasing in
    // rank; (c) ranks contiguous AND distinct. Violations only; oracle =
    // empty relation.
    "q_sim_topk_pq_verify" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = operators.ProductQuantize.train(emb, "vec_id", "embedding",
        m = 16, k = 64)
      // ONE k-means-assignment pass over the corpus feeds both the search
      // and the decoded-vector side (the production codes-at-ingest shape)
      val enc = operators.ProductQuantize.encode(
        emb.select(col("vec_id"), col("embedding")), "embedding", model)
        .localCheckpoint()
      val res = operators.ProductQuantize.adcTopKEncoded(
        emb.filter(col("vec_id") < 16),
        enc.select(col("vec_id").as("neighbor_id"), col("pq_code")),
        model, k = 10)
        .localCheckpoint() // three checks read it; scoring runs once
      val dec = operators.ProductQuantize.decodeCol(enc, "pq_code", model)
        .select(col("vec_id").as("neighbor_id"), col("pq_decoded").as("__dv"))
      val badScore = res
        .join(emb.select(col("vec_id").as("query_id"),
          col("embedding").cast("array<float>").as("__q")), Seq("query_id"), "left")
        .join(dec, Seq("neighbor_id"), "left")
        .withColumn("__rc",
          round(builtinBlockCosine(col("__q"), col("__dv"), model.m, model.dsub), 6))
        .filter(col("__rc").isNull || col("__rc") =!= col("score") ||
          col("query_id") === col("neighbor_id"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          lit("score_mismatch_or_self").as("issue"))
      badScore.unionByName(rankShapeViolations(res, "score"))
        .orderBy(col("query_id"), col("rank"), col("issue"))
    }),

    // IVF with nprobe = k probes every inverted list, so the result provably
    // equals exact brute-force top-k — a DuckDB-oracled row proving the whole
    // IVF machinery (train→assign→probe→rerank) is lossless end-to-end. The
    // nprobe=4 variant above stays the approximate headline (recall-spec'd).
    "q_sim_topk_ivf_full" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = operators.IvfIndex.train(emb, "vec_id", "embedding", k = 16)
      operators.IvfIndex.topK(emb.filter(col("vec_id") < 16), emb, model,
        k = 10, nprobe = 16)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF→PQ two-stage retrieval (Jégou TPAMI'11 IVFADC): probe nprobe
    // cells, ADC-score the probed CODES, exact-cosine re-rank only the
    // short list — the billion-scale serving shape composing the two
    // verified halves. Which neighbors the probes reach is approximate,
    // so the gated output is the per-query contract frame (k results,
    // re-ranked cosines ≡ raw-vector recompute, monotone contiguous
    // ranks) — round-14 fold; neighbor lists in the API, the recall
    // floor stays in the _verify sibling.
    "q_sim_topk_ivfpq" -> ((s, dir) => {
      val embT = t(s, dir, "embeddings")
      val emb = embT.select(col("vec_id"),
        col("embedding").cast("array<float>").as("v"))
      val ivf = operators.IvfIndex.train(embT, "vec_id", "embedding", k = 16)
      val pq = operators.ProductQuantize.train(embT, "vec_id", "embedding",
        m = 16, k = 64)
      val res = operators.IvfPq.topK(embT.filter(col("vec_id") < 16), embT,
        ivf, pq, k = 10, nprobe = 4, shortlist = 32).localCheckpoint()
      val badScore = res
        .join(emb.select(col("vec_id").as("query_id"), col("v").as("__q")),
          Seq("query_id"), "left")
        .join(emb.select(col("vec_id").as("neighbor_id"), col("v").as("__c")),
          Seq("neighbor_id"), "left")
        .withColumn("__rc", round(builtinCosine(col("__q"), col("__c")), 6))
        .filter(col("__rc").isNull || col("__rc") =!= col("cosine") ||
          col("query_id") === col("neighbor_id"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          lit("cosine_mismatch_or_self").as("issue"))
      annContract(res, badScore.unionByName(rankShapeViolations(res, "cosine")))
    }),

    // Verification-property sibling: (a) every emitted cosine re-derived
    // from raw embeddings must equal the emitted 6dp value (the re-rank
    // is exact, so unlike the pure-ADC twin this is a strict equality on
    // true cosines), no self-matches; (b) non-increasing in rank;
    // (c) ranks contiguous and distinct; (d) RECALL GATE — mean
    // recall@10 against the in-engine exact top-k (the same brute force
    // q_sim_topk oracles) must hold the floor the composition is
    // spec-measured to clear. Violations only; oracle = empty relation.
    "q_sim_topk_ivfpq_verify" -> ((s, dir) => {
      val embRaw = t(s, dir, "embeddings")
      val emb = embRaw
        .select(col("vec_id"), col("embedding").cast("array<float>").as("v"))
      val ivf = operators.IvfIndex.train(embRaw, "vec_id", "embedding", k = 16)
      val pq = operators.ProductQuantize.train(embRaw, "vec_id", "embedding",
        m = 16, k = 64)
      val res = operators.IvfPq.topK(embRaw.filter(col("vec_id") < 16),
        embRaw, ivf, pq, k = 10, nprobe = 4, shortlist = 32)
        .localCheckpoint() // four checks read it; the search runs once
      val badScore = res
        .join(emb.select(col("vec_id").as("query_id"), col("v").as("__q")),
          Seq("query_id"), "left")
        .join(emb.select(col("vec_id").as("neighbor_id"), col("v").as("__c")),
          Seq("neighbor_id"), "left")
        .withColumn("__rc", round(builtinCosine(col("__q"), col("__c")), 6))
        .filter(col("__rc").isNull || col("__rc") =!= col("cosine") ||
          col("query_id") === col("neighbor_id"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          lit("cosine_mismatch_or_self").as("issue"))
      // recall gate: exact top-k recomputed in-engine (affordable at
      // oracle scale — shipping the two-stage path is what avoids this
      // brute force in production); one violation row iff the MEAN
      // per-query recall@10 drops below the spec-measured floor
      val exact = operators.Similarity.cosineTopK(
        embRaw.filter(col("vec_id") < 16), embRaw, k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact
        .join(res.select(col("query_id"), col("neighbor_id"),
          lit(1L).as("__hit")), Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("__hit"), lit(0L))).cast("double") /
          count(lit(1)).cast("double")).as("__recall"))
      val badRecall = hits.agg(avg(col("__recall")).as("__mean"))
        .filter(col("__mean") < 0.5)
        .select(lit(null).cast("long").as("query_id"),
          lit(null).cast("long").as("rank"),
          lit("recall_below_floor").as("issue"))
      badScore.unionByName(rankShapeViolations(res, "cosine"))
        .unionByName(badRecall)
        .orderBy(col("query_id"), col("rank"), col("issue"))
    }),

    // Audio sample statistics: REAL PCM math (energy, peak, zero
    // crossings) over the synthetic WAV data chunks — sample-domain
    // numbers, not header fields; all integer arithmetic, oracle
    // recomputes every figure from doc_id by construction.
    "q_audio_stats" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val clips = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.syntheticWavPayload(id)))
        .toDF("doc_id", "payload")
      Multimodal.audioStats(clips, "doc_id", "payload")
        .orderBy(col("media_id"))
    }),

    // Frame-level audio features: 16-sample windows over the decoded
    // 16-bit stream — the VAD/silence-trimming shape; every figure
    // integer-exact and replayed by the oracle from the sample formulas.
    "q_audio_frames" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val clips = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.syntheticWavPayload(id)))
        .toDF("doc_id", "payload")
      Multimodal.audioFrames(clips, "doc_id", "payload", frameSize = 16)
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // Video metadata: synthetic-but-structurally-valid MP4s (every box
    // length real) parsed by a genuine ISO BMFF box walk — ftyp check,
    // any box order, moov children, mvhd v0/v1, trak count; the oracle
    // recomputes (timescale, duration_ms, n_tracks, n_bytes) from doc_id
    // by construction, so a parser that misreads any length field
    // hash-mismatches.
    "q_video_meta" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val vids = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.syntheticMp4Payload(id)))
        .toDF("doc_id", "payload")
      Multimodal.videoMeta(vids, "doc_id", "payload")
        .orderBy(col("media_id"))
    }),

    // Synthetic PNG/GIF/WAV containers (real magic bytes + header fields,
    // deterministic in doc_id) are decoded by genuine header parsing; the
    // oracle recomputes the expected features from doc_id by construction.
    "q_multimodal_features" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val media = Multimodal.syntheticMediaRecords(t(s, dir, "documents"), "doc_id")
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"),
          col("n_bytes").cast("long").as("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          size(col("frame_offsets")).cast("long").as("n_frames"))
        .orderBy(col("media_id"))
    }),

    // Okapi BM25 retrieval over the corpus for a literal query-term set
    // (two common, one mid, one rare term → idf spread). Rounded-idf +
    // rounded-contribution decimal sums per the TfIdf determinism idiom;
    // top-20 by (score desc, doc_id) total order.
    "q_text_bm25" -> ((s, dir) =>
      operators.Bm25.score(t(s, dir, "documents"), "doc_id", "text",
        Seq("join", "stream", "vector", "dup"))),

    // Hybrid retrieval: the BM25 lexical top-20 fused with the dense
    // cosine top-20 of query vector 7 by integer-micro-unit Reciprocal
    // Rank Fusion — only RANKS cross between the two retrievers, so their
    // incomparable score scales never need calibrating, and the long
    // floor-div contributions make the fusion hash-exact cross-engine.
    // The lexical rank window runs over the ALREADY-top-20-limited frame
    // (≤20 rows — not a scale-relevant global window); the dense ranks
    // come per-query-partitioned from cosineTopK.
    "q_retrieval_rrf" -> ((s, dir) => {
      val lex = operators.Bm25.score(t(s, dir, "documents"), "doc_id",
          "text", Seq("join", "stream", "vector", "dup"), topK = 20)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
        .select(col("doc_id"), col("rank"))
      val emb = t(s, dir, "embeddings")
      val dense = Similarity.cosineTopK(
          emb.filter(col("vec_id") === 7), emb, k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      operators.Fusion.rrfFuse(Seq(lex, dense), "doc_id", "rank")
        .select(col("doc_id"), col("rrf"), col("lists"))
    }),

    // Image near-dup, step 1: 63-bit perceptual dHash per media item. The
    // Spark side PARSES the container bytes (real header walk for w/h and
    // the body offset) and hashes the stub-decoded luminance grid; the
    // oracle recomputes the expected hash purely from the id-synthesis
    // formulas — a broken parse, offset, grid, or bit-pack breaks the
    // match, same gating style as q_multimodal_features.
    "q_image_phash" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.withPhash(
        Multimodal.syntheticMediaRecords(t(s, dir, "documents"), "doc_id"))
        .orderBy(col("media_id"))
    }),

    // Step 2: hamming-banded near-dup pairs over those hashes at the
    // pigeonhole-EXACT threshold: 7 bands × 9 bits means any pair at
    // hamming ≤ 6 must share an untouched band, so banding here is
    // complete, not approximate — which lets the oracle be plain
    // all-pairs hamming ≤ 6 with NO band terms, gating the banded
    // candidate generation's recall (a missed pair breaks the row
    // match), not just the hamming filter. Header-only payloads
    // (id % 100 == 0) hash to 0 and surface as the hamming-0
    // "identical blank image" clique.
    "q_image_phash_pairs" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.phashNearDupPairs(
        Multimodal.withPhash(
          Multimodal.syntheticMediaRecords(t(s, dir, "documents"), "doc_id")),
        "media_id", "phash", maxHamming = 6)
        .orderBy(col("idA"), col("idB"))
    }),

    // REAL pixel decode, gated end-to-end: each doc becomes a fully valid
    // PNG (correct CRCs, zlib IDAT, row filters cycling None/Sub/Up/
    // Average/Paeth), the Spark side chunk-walks + inflates + de-filters
    // it back to a luminance plane, and the oracle recomputes the plane
    // checksums from the pixel FORMULAS alone — so any bug in the
    // encoder, the Inflater plumbing, a filter branch, or the palette/
    // luma reduction diverges. lum_wsum weights by position (i%97+1) so
    // a pixel permutation can't cancel.
    "q_image_decode" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val (w, h, plane) = Multimodal
            .decodePngPixels(Multimodal.syntheticPngPixelPayload(id))
            .getOrElse((0, 0, Array.emptyByteArray))
          var lsum = 0L; var wsum = 0L; var i = 0
          while (i < plane.length) {
            val l = plane(i) & 0xff
            lsum += l; wsum += l.toLong * (i % 97 + 1); i += 1
          }
          (id, w.toLong, h.toLong, plane.length.toLong, lsum, wsum)
        }
        .toDF("media_id", "width", "height", "n_pixels", "lum_sum", "lum_wsum")
        .orderBy(col("media_id"))
    }),

    // The GIF edition of q_image_decode: each doc becomes a fully valid
    // GIF89a whose pixel stream is GENUINELY LZW-compressed (compound
    // codes, width growth, KwKwK all arise on the cyclic index walk);
    // the Spark side block-walks + LZW-decodes + palette-reduces back to
    // luminance, and the oracle recomputes the plane checksums from the
    // index/palette formulas alone — an entropy-coder bug on either side
    // diverges.
    "q_image_decode_gif" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val (w, h, plane) = Multimodal
            .decodeGifPixels(Multimodal.syntheticGifPixelPayload(id))
            .getOrElse((0, 0, Array.emptyByteArray))
          var lsum = 0L; var wsum = 0L; var i = 0
          while (i < plane.length) {
            val l = plane(i) & 0xff
            lsum += l; wsum += l.toLong * (i % 97 + 1); i += 1
          }
          (id, w.toLong, h.toLong, plane.length.toLong, lsum, wsum)
        }
        .toDF("media_id", "width", "height", "n_pixels", "lum_sum", "lum_wsum")
        .orderBy(col("media_id"))
    }),

    // The JPEG edition: each doc becomes a fully valid baseline JFIF
    // grayscale JPEG (unit quant table, custom canonical Huffman tables,
    // genuine DC-delta entropy coding with sign-magnitude bits and byte
    // stuffing); tile-constant content makes the lossy format LOSSLESS
    // here, so the fully general Huffman+IDCT decode is gated bit-exactly
    // by the formula-replay oracle.
    "q_image_decode_jpeg" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val (w, h, plane) = Multimodal
            .decodeJpegPixels(Multimodal.syntheticJpegPayload(id))
            .getOrElse((0, 0, Array.emptyByteArray))
          var lsum = 0L; var wsum = 0L; var i = 0
          while (i < plane.length) {
            val l = plane(i) & 0xff
            lsum += l; wsum += l.toLong * (i % 97 + 1); i += 1
          }
          (id, w.toLong, h.toLong, plane.length.toLong, lsum, wsum)
        }
        .toDF("media_id", "width", "height", "n_pixels", "lum_sum", "lum_wsum")
        .orderBy(col("media_id"))
    }),

    // REAL pixel resize: decode the PNG corpus, nearest-neighbor
    // resample each luminance plane to an id-dependent target box, and
    // checksum the RESIZED plane — the oracle replays the integer
    // src=(dst·srcDim)//dstDim mapping over the pixel formulas, so the
    // decode AND the resample must both be exact.
    "q_image_resize" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val (w, h, plane) = Multimodal
            .decodePngPixels(Multimodal.syntheticPngPixelPayload(id))
            .getOrElse((0, 0, Array.emptyByteArray))
          val dw = (8 + id % 9).toInt; val dh = (8 + (id * 3) % 7).toInt
          val r = Multimodal.resizeLuma(plane, w, h, dw, dh)
          var lsum = 0L; var wsum = 0L; var i = 0
          while (i < r.length) {
            val l = r(i) & 0xff
            lsum += l; wsum += l.toLong * (i % 97 + 1); i += 1
          }
          (id, dw.toLong, dh.toLong, lsum, wsum)
        }
        .toDF("media_id", "out_w", "out_h", "lum_sum", "lum_wsum")
        .orderBy(col("media_id"))
    }),

    // REAL frame extraction: walk each MP4's moov→trak→mdia→minf→stbl,
    // parse stsz/stco/stsc, and resolve every sample to its absolute
    // (offset, size) — the lookup a video pipeline performs before
    // decoding frames. The oracle replays offsets as prefix sums over
    // the by-construction sizes, so a mis-parse of ANY table or box
    // length diverges. Replaces the old stride stub with the genuine
    // machinery.
    "q_video_frames" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          Multimodal.decodeMp4Samples(Multimodal.syntheticMp4SamplesPayload(id))
            .getOrElse(Seq.empty).zipWithIndex
            .map { case ((off, sz), k) => (id, k.toLong, off, sz.toLong) }
        }
        .toDF("media_id", "sample_idx", "byte_offset", "size_bytes")
        .orderBy(col("media_id"), col("sample_idx"))
    }),

    // REAL video frame PIXEL decode (MJPEG-in-MP4): each document becomes
    // an MP4 whose mdat holds 1+id%4 complete baseline JPEGs behind a
    // genuine sample table; the query walks the stbl, slices each frame,
    // runs the full Huffman+IDCT JPEG decode, and emits per-frame exact
    // luminance checksums (raster-position-weighted) plus the dHash over
    // the DECODED plane. The oracle replays the tile-constant pixel
    // formulas per frame seed (id·8+k) — container walk, per-frame SOF
    // parse, entropy decode, and hash grid must ALL be bit-exact.
    "q_video_decode" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.syntheticMjpegMp4Payload(id)))
        .toDF("doc_id", "payload")
      Multimodal.videoFrameDecode(media, "doc_id", "payload")
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // dHash over REAL decoded pixels (the round-10 upgrade from the
    // stub-luminance phash): same grid/bit-pack as q_image_phash but the
    // luminance samples come from the genuine PNG decode; the oracle
    // replays the grid over the pixel formulas, so the full
    // encode→decode→hash chain must be pixel-exact to match.
    "q_image_phash_real" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id =>
          operators.MediaRecord(id, Multimodal.syntheticPngPixelPayload(id),
            "image/png"))
      Multimodal.withPhash(media).orderBy(col("media_id"))
    }),

    // Streaming multimodal ingest: per-batch header-parse + feature
    // extraction of arriving binary payloads — pure per-row work, so the
    // bounded stream hash-matches the batch oracle verbatim.
    "q_stream_multimodal" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_mm_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_mm_src_${runTag(dir)}"
      t(s, dir, "documents").select(col("doc_id"))
        .repartition(4).write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamMultimodalBounded(s, src, "doc_id")
        .orderBy(col("media_id"))
    }),

    "q_stream_hourly" -> ((s, dir) =>
      StreamingIngest.runWindowedEventAgg(s, s"$dir/events.parquet",
        s"events_windowed_${streamCounter.incrementAndGet()}")
        .orderBy(col("window_start"), col("event_type"))),

    // Stream-stream interval join (attribution): purchase within 2h of a
    // view, same user — both sides unbounded, state bounded by the
    // interval via watermarks. Inner matches emit immediately; the batch
    // inequality join is the exact oracle.
    "q_stream_join" -> ((s, dir) =>
      StreamingIngest.runAttributionBounded(s, s"$dir/events.parquet",
        windowMicros = 7200000000L,
        queryName = s"stream_join_${streamCounter.incrementAndGet()}")
        .orderBy(col("user_id"), col("view_event_id"), col("purchase_event_id"))),

    // Semi-structured extraction: parse the props JSON column with a typed
    // from_json schema (codegen'd Jackson parse, no UDF) and aggregate —
    // the metadata-sidecar pattern of multimodal/training records.
    "q_json_props" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val propsSchema = StructType(Seq(StructField("k", LongType)))
      t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"), propsSchema).getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // The capstone composition: URL dedup → quality filter → exact dedup →
    // near-dup survivors → token budget, hash-matched as ONE chain so stage
    // ordering and interfaces are verified, not only the parts. The URL
    // stage is provably absorbed by the min-id exact dedup (see
    // CorpusPipeline's scaladoc), so the oracle is unchanged — a green
    // hash IS the proof the composition theorem holds on real data.
    "q_corpus_pipeline" -> ((s, dir) =>
      operators.CorpusPipeline.curate(
        t(s, dir, "documents").withColumn("url",
          concat(lit("https://www."), col("source"), lit(".example.com/docs/"),
            (col("doc_id") % 25).cast("string"), lit("/?utm_source="), col("lang"))),
        operators.CorpusPipeline.Config(urlCol = Some("url")))
        .select(col("doc_id"), col("n_tok"))
        .orderBy(col("doc_id"))),

    // The FULL dedup ladder, production order: URL → exact → substring
    // removal → re-tokenize/re-filter → fuzzy → semantic → budget,
    // hash-matched as ONE chain (the URL stage is absorbed by the min-id
    // exact dedup exactly as in v1: the substring stage runs on the
    // post-exact survivor set, which is invariant to it). k=4 anchors and
    // a 0.4 cosine threshold make the removal and semantic stages
    // genuinely fire on the fixture (180 docs touched, 14 gutted below
    // the re-applied quality floor, 25 semantic casualties at sf0.01);
    // the fuzzy stage verifiably finds zero pairs here — exact dedup
    // already absorbed the corpus's near-identical docs — and the crafted
    // CorpusPipelineV2Spec fixture covers its firing path.
    // semanticExact=true is the bounded oracle path; the spec asserts the
    // LSH scale path yields a survivor superset.
    "q_corpus_pipeline_v2" -> ((s, dir) =>
      operators.CorpusPipeline.curateV2(
        t(s, dir, "documents").withColumn("url",
          concat(lit("https://www."), col("source"), lit(".example.com/docs/"),
            (col("doc_id") % 25).cast("string"), lit("/?utm_source="), col("lang"))),
        t(s, dir, "embeddings"),
        operators.CorpusPipeline.Config(urlCol = Some("url"),
          substringK = 4, semanticThreshold = 0.4))
        .orderBy(col("doc_id"))),

    // MULTIMODAL curation — the image modality joins the guarantee
    // chain: the v2 text ladder's survivors additionally pass banded
    // pHash near-dup removal over each document's attached image
    // (blank-image cliques and planted near-dup planes collapse to
    // their min-id doc) BEFORE the token budget, so a re-encoded copy
    // of one image cannot ship twice even when its text changed enough
    // to clear every text stage. The oracle replays ladder + pHash
    // synthesis + brute hamming pairs + CC + budget in one SQL chain.
    "q_curate_multimodal" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val media = Multimodal.withPhash(
        Multimodal.syntheticMediaRecords(t(s, dir, "documents"), "doc_id"))
      operators.CorpusPipeline.curateMultimodal(
        t(s, dir, "documents").withColumn("url",
          concat(lit("https://www."), col("source"), lit(".example.com/docs/"),
            (col("doc_id") % 25).cast("string"), lit("/?utm_source="), col("lang"))),
        t(s, dir, "embeddings"), media,
        operators.CorpusPipeline.Config(urlCol = Some("url"),
          substringK = 4, semanticThreshold = 0.4))
        .orderBy(col("doc_id"))
    }),

    // Training-prep capstone: the curated set (full v2 ladder) driven
    // through the lineage-stable split, train-only sequence packing on
    // CLEANED token counts, and the deterministic shard shuffle — one
    // hash-matched chain across the curation → training-prep interface.
    "q_train_pipeline" -> ((s, dir) =>
      operators.TrainPipeline.prepare(
        t(s, dir, "documents").withColumn("url",
          concat(lit("https://www."), col("source"), lit(".example.com/docs/"),
            (col("doc_id") % 25).cast("string"), lit("/?utm_source="), col("lang"))),
        t(s, dir, "embeddings"),
        operators.CorpusPipeline.Config(urlCol = Some("url"),
          substringK = 4, semanticThreshold = 0.4),
        capacity = 512L)
        .orderBy(col("doc_id"))),

    // As-of join (backward, inclusive): each click event attached to the
    // same user's latest view event at-or-before it — one window shuffle,
    // no range join. Oracled against DuckDB's native ASOF LEFT JOIN.
    "q_asof_join" -> ((s, dir) => {
      val ev0 = t(s, dir, "events")
      val ev = ev0.withColumn("ts", EventTime.timestamp(ev0))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_event_id"), col("value").as("view_value"))
      operators.AsOfJoin.asOfBackward(clicks, views, Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        rightPayload = Seq("view_event_id", "view_value"), tieCol = "view_event_id")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("view_event_id"), col("view_value"))
        .orderBy(col("event_id"))
    }),

    // Range join: clicks falling inside each view's 1-day attribution
    // window, as a bucketized equi-join (micros-long arithmetic; bucket =
    // window width so each interval spans <= 2 bins). Oracled against a
    // plain inequality join in DuckDB.
    "q_range_join" -> ((s, dir) => {
      val ev0 = t(s, dir, "events")
      val ev = ev0.withColumn("us", EventTime.micros(ev0))
      val win = 86400L * 1000 * 1000 // 1 day in micros
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_event_id"),
          col("us").as("w_start"), (col("us") + win).as("w_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_event_id"),
          col("us").as("click_us"))
      operators.RangeJoin.pointInIntervalJoin(clicks, views, Seq("user_id"),
        pointCol = "click_us", startCol = "w_start", endCol = "w_end",
        bucketWidth = win)
        .select(col("view_event_id"), col("click_event_id"))
        .orderBy(col("view_event_id"), col("click_event_id"))
    }),

    // Interval-interval overlap join: view vs purchase 1-hour windows per
    // user — bucketized equi-join with bin-ownership dedup (each pair meets
    // in exactly the bin holding max(starts); no post-join distinct).
    "q_overlap_join" -> ((s, dir) => {
      val ev0 = t(s, dir, "events")
      val ev = ev0.withColumn("us", EventTime.micros(ev0))
      val win = 3600L * 1000 * 1000
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("vid"),
          col("us").as("vs"), (col("us") + win).as("ve"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"),
          col("us").as("ps"), (col("us") + win).as("pe"))
      operators.RangeJoin.intervalOverlapJoin(views, purchases, Seq("user_id"),
        "vs", "ve", "ps", "pe", bucketWidth = win)
        .select(col("l_vid").as("view_event_id"),
          col("r_pid").as("purchase_event_id"))
        .orderBy(col("view_event_id"), col("purchase_event_id"))
    }),

    // Token-budget corpus selection: distributed prefix sum of BPE-ish token
    // counts in doc_id order (deterministic quantile buckets + per-bucket
    // windows + broadcast offsets — no single-task global window), then keep
    // docs while the running total stays within budget.
    "q_token_budget" -> ((s, dir) => {
      val withToks = t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("n_tok"))
      operators.PrefixSum.selectWithinBudget(withToks, "doc_id", "n_tok",
        budget = 15000L)
        .select(col("doc_id"), col("n_tok"))
        .orderBy(col("doc_id"))
    }),

    // Stateful streaming dedup (flatMapGroupsWithState): emitted KEYS equal
    // batch DISTINCT regardless of which representative row survives, so
    // the key stream is DuckDB-oracle-able; the cross-micro-batch state
    // semantics are spec-checked in OperatorsSpec.
    "q_stream_dedup" -> ((s, dir) => {
      val path = s"$dir/documents.parquet"
      val schema = s.read.parquet(path).schema
      val stream = s.readStream.schema(schema).parquet(path + "*")
      val keyed = stream.select(
        array_join(slice(split(trim(lower(col("text"))), "\\s+"), 1, 5), " ").as("key5"))
      val name = s"stream_dedup_${streamCounter.incrementAndGet()}"
      // state partitions sized to the key cardinality (~500 distinct keys),
      // not the batch session's partition count — see withStatePartitions
      StreamingIngest.withStatePartitions(s, 8) {
        val q = StreamingIngest.streamingDedup(keyed, "key5")
          .writeStream.outputMode("append").format("memory").queryName(name).start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(name).select(col("key5")).orderBy(col("key5"))
    }),

    // Bucketed co-located join: both sides bucketed+sorted on the join key
    // — the join runs with NO exchange (the repeated big-big join layout;
    // shuffle-free shape asserted in WarehouseOpsSpec). Result ≡ the plain
    // join, which is the oracle.
    // SCD Type-2 history: per customer, collapse the order-status change
    // log into validity intervals — re-observed identical statuses extend
    // the run instead of opening a version. One key-sorted window chain.
    "q_scd2_history" -> ((s, dir) =>
      sink.Warehouse.scdType2(
        t(s, dir, "orders").select(col("o_custkey"), col("o_orderstatus"),
          col("o_orderdate"), col("o_orderkey")),
        "o_custkey", Seq("o_orderstatus"), "o_orderdate", Seq("o_orderkey"))
        .orderBy(col("o_custkey"), col("valid_from"), col("o_orderstatus"))),

    // CDC MERGE: an op-tagged change batch (U on %7 keys, D on %11, I of
    // new keys on %13 — so %77 keys carry BOTH a U and a later D, the
    // latest-wins case) applied to the base table. Within-batch winner
    // election reuses the keep-best max_by aggregation; untouched keys
    // pass through. Deterministic → exactly oracled.
    "q_cdc_apply" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      val u = base.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          (col("o_totalprice") + 5).as("o_totalprice"),
          lit(1L).as("seq"), lit("U").as("op"))
      val d = base.filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          lit(2L).as("seq"), lit("D").as("op"))
      val ins = base.filter(col("o_orderkey") % 13 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_orderpriority"), col("o_totalprice"),
          lit(1L).as("seq"), lit("I").as("op"))
      sink.Warehouse.applyCdc(base, u.unionByName(d).unionByName(ins),
        Seq("o_orderkey"), "seq", "op")
        .orderBy(col("o_orderkey"))
    }),

    // Incremental materialized-aggregate maintenance: per-customer order
    // stats refreshed after a sparse CDC batch (~1.5% of keys) by
    // recomputing ONLY touched customer groups — untouched rows carried
    // verbatim from the stored aggregate, the batch key set broadcast
    // into one semi-join. Result must equal a full recompute of the
    // post-CDC table — that's the oracle, and the whole point.
    "q_incr_agg" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val u = base.filter(col("o_orderkey") % 49 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") + 5).as("o_totalprice"),
          lit(1L).as("seq"), lit("U").as("op"))
      val d = base.filter(col("o_orderkey") % 121 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          lit(2L).as("seq"), lit("D").as("op"))
      val ins = base.filter(col("o_orderkey") % 169 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"),
          lit(1L).as("seq"), lit("I").as("op"))
      val batch = u.unionByName(d).unionByName(ins)
      val newBase = sink.Warehouse.applyCdc(base, batch,
        Seq("o_orderkey"), "seq", "op")
      // touched groups = old owners of batched keys (from base) ∪ owners
      // named in the batch itself (covers reassignment and inserts)
      val touched = base
        .join(batch.select(col("o_orderkey")).distinct(),
          Seq("o_orderkey"), "left_semi")
        .select(col("o_custkey"))
        .unionAll(batch.select(col("o_custkey")))
        .distinct()
      val matAgg = base.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice")).cast("long")).as("total_units"))
      operators.IncrementalAgg.refreshTouchedGroups(
        newBase, touched, matAgg, Seq("o_custkey"),
        Seq(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice")).cast("long")).as("total_units")))
        .orderBy(col("o_custkey"))
    }),

    // Warehouse TIME TRAVEL: a snapshot-versioned parquet table (manifest
    // per version, files shared across append commits) built by replaying
    // two CDC batches — v0 = base orders, v1 = the q_cdc_apply batch, v2 =
    // a second destructive batch — then read PINNED AT v1 after v2 has
    // committed. The result must equal replaying exactly one batch (the
    // q_cdc_apply oracle verbatim): the pinned read ignores the newer
    // commit, which is the time-travel contract. Reads cost one KB-scale
    // manifest + a plain parquet scan of its file list (pruning/pushdown
    // intact).
    "q_table_asof" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_vtable_"))
      val tbl = s"${System.getProperty("java.io.tmpdir")}/graft_vtable_${runTag(dir)}"
      val fsPath = new org.apache.hadoop.fs.Path(tbl)
      val fs = fsPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsPath, true)
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      sink.VersionedTable.commit(s, tbl, base, append = false) // v0
      val u = base.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          (col("o_totalprice") + 5).as("o_totalprice"),
          lit(1L).as("seq"), lit("U").as("op"))
      val d = base.filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          lit(2L).as("seq"), lit("D").as("op"))
      val ins = base.filter(col("o_orderkey") % 13 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_orderpriority"), col("o_totalprice"),
          lit(1L).as("seq"), lit("I").as("op"))
      sink.VersionedTable.commitCdc(s, tbl, u.unionByName(d).unionByName(ins),
        Seq("o_orderkey"), "seq", "op") // v1 ≡ q_cdc_apply
      val wipe = sink.VersionedTable.read(s, tbl)
        .filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          (col("o_totalprice") + 100).as("o_totalprice"),
          lit(3L).as("seq"),
          when(col("o_orderkey") % 2 === 0, lit("D")).otherwise(lit("U")).as("op"))
      sink.VersionedTable.commitCdc(s, tbl, wipe,
        Seq("o_orderkey"), "seq", "op") // v2 — must NOT leak into the read
      sink.VersionedTable.read(s, tbl, version = Some(1L))
        .orderBy(col("o_orderkey"))
    }),

    "q_join_bucketed" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val tag = runTag(dir)
      warehouseDir(s).foreach(sweepDeadScratch(_,
        Seq("graft_q_orders_b_", "graft_q_customer_b_"),
        legacy = Seq("graft_q_orders_b", "graft_q_customer_b")))
      sink.Warehouse.writeBucketed(
        orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        s"graft_q_orders_b_$tag", Seq("o_custkey"), numBuckets = 8)
      sink.Warehouse.writeBucketed(
        customer.select(col("c_custkey"), col("c_mktsegment")),
        s"graft_q_customer_b_$tag", Seq("c_custkey"), numBuckets = 8)
      s.table(s"graft_q_orders_b_$tag")
        .join(s.table(s"graft_q_customer_b_$tag"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("c_mktsegment"))
    }),

    // Stream-to-serving-table composition: a multi-file event stream is
    // upserted per micro-batch into a parquet table (latest event per user
    // wins), one file per trigger so the merge crosses FOUR batch
    // boundaries; the final table must equal the one-shot batch dedup,
    // which is the oracle. Exactly-once by idempotence — replaying a batch
    // re-merges already-ranked rows (spec-asserted in WarehouseOpsSpec).
    "q_stream_upsert" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_upsert_src_", "graft_upsert_tbl_"))
      val base = System.getProperty("java.io.tmpdir")
      val tag = runTag(dir)
      val src = s"$base/graft_upsert_src_$tag"
      val tbl = s"$base/graft_upsert_tbl_$tag"
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .repartition(4)
        .write.mode("overwrite").parquet(src)
      val fs = new org.apache.hadoop.fs.Path(tbl)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tbl), true)
      streaming.StreamingIngest.runStreamUpsertBounded(s, src, tbl,
        Seq("user_id"), Seq(col("ts").desc, col("event_id").desc),
        maxFilesPerTrigger = 1)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts)").as("us"), col("value"))
        .orderBy(col("user_id"))
    }),

    // Streaming MODEL INFERENCE: NB trained on the batch 4/5 split, the
    // held-out fifth scored as a 4-file stream (one file per trigger, so
    // scoring crosses four micro-batch boundaries); the final table must
    // equal the one-shot batch classification, which is the oracle (the
    // exact q_classify_nb SQL).
    "q_stream_classify" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_clf_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_clf_src_${runTag(dir)}"
      val docs = t(s, dir, "documents")
      docs.filter(col("doc_id") % 5 === 0).repartition(4)
        .write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamClassifyBounded(s,
        docs.filter(col("doc_id") % 5 =!= 0), src, "doc_id", "text", "lang")
        .orderBy(col("doc_id"))
    }),

    // Streaming DSIR: the raw (non-English) corpus arrives as a 4-file
    // stream — feature extraction runs per micro-batch, the B-row
    // distribution state and scores finalize from the accumulated
    // frames. Bucket counts are multiset functions → stream ≡ batch, so
    // the batch q_dsir_weights SQL gates this verbatim (full hash).
    "q_stream_dsir" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_dsir_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_dsir_src_${runTag(dir)}"
      val docs = t(s, dir, "documents")
      docs.filter(col("lang") =!= "en").select(col("doc_id"), col("text"))
        .repartition(4).write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamDsirBounded(s, src,
        docs.filter(col("lang") === "en"), "doc_id", "text", buckets = 4096)
        .orderBy(col("doc_id"))
    }),

    // Streaming CORPUS CURATION: quality gate + incremental exact n-gram
    // dedup per micro-batch with the standing corpus as cross-batch state
    // — the continuously-fed training-corpus shape. A qualifying pair is
    // found exactly when its later member arrives, so the union of
    // per-batch pair ledgers equals the batch pair set and the status of
    // every doc is arrival-order-invariant → gated by the full-hash BATCH
    // oracle (quality rule + q_dedup_ngram's shingle replay), the same
    // stream ≡ batch discipline as q_stream_classify.
    "q_stream_curate" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_curate_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_curate_src_${runTag(dir)}"
      t(s, dir, "documents").select(col("doc_id"), col("text"))
        .repartition(4).write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamCurateBounded(s, src,
        "doc_id", "text", minTokens = 20, n = 3, threshold = 0.2)
        .orderBy(col("doc_id"))
    }),

    // Streaming FUZZY curation: quality gate + MinHash near-dup against
    // the standing corpus, with per-batch signatures cached and reused as
    // the corpus index (the genuinely-incremental steady state — the
    // corpus is never re-signed, never banded against itself). MinHash
    // banding is engine-internal → no SQL oracle; gated by the strict
    // stream ≡ batch equality sibling below (exact-dedup relatives:
    // q_stream_curate / q_dedup_minhash's own verified family).
    "q_stream_curate_fuzzy" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_curatef_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_curatef_src_${runTag(dir)}"
      t(s, dir, "documents").select(col("doc_id"), col("text"))
        .repartition(4).write.mode("overwrite").parquet(src)
      streaming.StreamingIngest.runStreamCurateFuzzyBounded(s, src,
        "doc_id", "text", minTokens = 20, n = 3, k = 64, bands = 16,
        threshold = 0.5)
        .orderBy(col("doc_id"))
    }),

    // The equality gate: the bounded stream's statuses must equal the
    // batch twin VERBATIM (uncapped pair discovery is arrival-order-
    // invariant — see incrementalMinhashPairs; with caps the stream is
    // only a superset, which is why the gate runs uncapped on both
    // sides). Violations only; oracle = empty relation.
    "q_stream_curate_fuzzy_verify" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_curatefv_src_"))
      val src =
        s"${System.getProperty("java.io.tmpdir")}/graft_curatefv_src_${runTag(dir)}"
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      docs.repartition(4).write.mode("overwrite").parquet(src)
      val streamRes = streaming.StreamingIngest.runStreamCurateFuzzyBounded(
        s, src, "doc_id", "text", minTokens = 20, n = 3, k = 64, bands = 16,
        threshold = 0.5)
      val gated = docs.withColumn("__pass",
        size(operators.Dedup.cleanTokens(col("text"))) >= 20)
      val dups = operators.Dedup.minhashNearDupPairs(
        gated.filter(col("__pass")).select(col("doc_id"), col("text")),
        "doc_id", "text", n = 3, k = 64, bands = 16, threshold = 0.5,
        maxBucket = Int.MaxValue)
        .select(col("idB").as("doc_id")).distinct()
      val batchRes = gated
        .join(dups.withColumn("__dup", lit(true)), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(!col("__pass"), lit("quality"))
            .when(col("__dup").isNotNull, lit("duplicate"))
            .otherwise(lit("curated")).as("status"))
      streamRes.exceptAll(batchRes).withColumn("side", lit("stream_only"))
        .unionAll(batchRes.exceptAll(streamRes).withColumn("side", lit("batch_only")))
        .orderBy(col("doc_id"), col("side"))
    }),

    // Streaming ANN serving: micro-batches of queries scored in
    // foreachBatch against the persisted-and-reloaded IVF+PQ models and
    // the once-built code index — train once, ship the artifact, serve
    // the stream. WHICH neighbors the probes reach is engine-internal
    // (same as q_sim_topk_ivfpq), so the gated output is the per-query
    // claim: k served results, each equal to the batch twin under the
    // same frozen models (per-query top-k is a pure function of (query,
    // models, index) — no cross-batch state) — round-14 fold; the
    // served lists stay in the API.
    "q_stream_ann" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_ann_src_", "graft_ann_model_"))
      val tmp = System.getProperty("java.io.tmpdir")
      val src = s"$tmp/graft_ann_src_${runTag(dir)}"
      val modelPath = s"$tmp/graft_ann_model_${runTag(dir)}"
      t(s, dir, "embeddings").repartition(4).write.mode("overwrite").parquet(src)
      val a = streaming.StreamingIngest.runStreamAnnBounded(s, src, modelPath)
        .localCheckpoint()
      val emb = s.read.parquet(src)
      val (livf, lpq) = operators.IvfPq.loadModels(s, modelPath)
      val b = operators.IvfPq.topKIndexed(
        emb.filter(col("vec_id") < 16),
        operators.IvfPq.index(emb, livf, lpq), emb, livf, lpq,
        k = 10, nprobe = 4, shortlist = 32).localCheckpoint()
      val drift = a.exceptAll(b).unionAll(b.exceptAll(a))
        .select(col("query_id")).distinct().withColumn("__bad", lit(true))
      a.groupBy(col("query_id")).agg(count(lit(1)).as("n_results"))
        .join(drift, Seq("query_id"), "left")
        .select(col("query_id"), col("n_results"),
          col("__bad").isNull.as("stream_eq_batch"))
        .orderBy(col("query_id"))
    }),

    // Per-query top-k is a PURE function of (query, frozen models, frozen
    // index) — no cross-batch state — so the bounded stream must equal
    // the batch topKIndexed run under the SAME persisted models exactly,
    // not merely to a recall floor. Violations only; empty oracle.
    "q_stream_ann_verify" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_annv_src_", "graft_annv_model_"))
      val tmp = System.getProperty("java.io.tmpdir")
      val src = s"$tmp/graft_annv_src_${runTag(dir)}"
      val modelPath = s"$tmp/graft_annv_model_${runTag(dir)}"
      t(s, dir, "embeddings").repartition(4).write.mode("overwrite").parquet(src)
      val emb = s.read.parquet(src)
      val ivf = operators.IvfIndex.train(emb, "vec_id", "embedding", k = 16)
      val pq = operators.ProductQuantize.train(emb, "vec_id", "embedding",
        m = 16, k = 64)
      val streamRes = streaming.StreamingIngest.runStreamAnnBounded(s, src,
        modelPath, pretrained = Some((ivf, pq)))
      // score the batch twin under the models the stream actually SERVED
      // (the reloaded copies — load ∘ save identity is itself spec-pinned)
      val (livf, lpq) = operators.IvfPq.loadModels(s, modelPath)
      // both frames feed BOTH exceptAll sides — checkpoint to sever the
      // shared index lineage (duplicate attribute ids otherwise collide
      // inside the dual anti-join plan) and to run each search once
      val a = streamRes.localCheckpoint()
      val b = operators.IvfPq.topKIndexed(
        emb.filter(col("vec_id") < 16),
        operators.IvfPq.index(emb, livf, lpq), emb, livf, lpq,
        k = 10, nprobe = 4, shortlist = 32).localCheckpoint()
      a.exceptAll(b).withColumn("side", lit("stream_only"))
        .unionAll(b.exceptAll(a).withColumn("side", lit("batch_only")))
        .orderBy(col("query_id"), col("rank"), col("side"))
    }),

    // Streaming hot-key detection: the SAME native MG aggregate as
    // q_heavy_hitters, run as a streaming global aggregate — the
    // capacity-sized buffer is the state carried across micro-batches.
    // Arrival-order-dependent → the gated output is the claim the
    // STREAMING summary must satisfy against exact batch counts
    // (round-14 headliner fold; raw summary in the API).
    "q_stream_hotkeys" -> ((s, dir) => {
      val sk = streaming.StreamingIngest.runStreamHotKeysBounded(s,
        s"$dir/events.parquet", "user_id", capacity = 32,
        queryName = s"stream_hotkeys_${streamCounter.incrementAndGet()}")
      val items = t(s, dir, "events").filter(col("user_id").isNotNull)
        .select(col("user_id").cast("long").as("item"))
      items.agg(count(lit(1)).as("n"))
        .crossJoin(operators.HeavyHitters.violationsAgainst(sk, items,
          capacity = 32).agg(count(lit(1)).as("n_violations")))
        .select(lit(32L).as("capacity"), col("n"), col("n_violations"))
    }),

    // Every MG guarantee checked in-engine on the STREAMING summary
    // against exact batch counts of the same events. Violations only.
    "q_stream_hotkeys_verify" -> ((s, dir) => {
      val sk = streaming.StreamingIngest.runStreamHotKeysBounded(s,
        s"$dir/events.parquet", "user_id", capacity = 32,
        queryName = s"stream_hotkeys_v_${streamCounter.incrementAndGet()}")
      val items = t(s, dir, "events").filter(col("user_id").isNotNull)
        .select(col("user_id").cast("long").as("item"))
      operators.HeavyHitters.violationsAgainst(sk, items, capacity = 32)
    }),

    // Partition pruning: write partitioned by the filter column, read with
    // an equality predicate — the scan must touch ONE partition directory
    // (PartitionFilters in the plan, guarded in PlanSpec), the layout that
    // turns a 100 TB full scan into a directory listing.
    "q_partition_pruning" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_part_orders_"), legacy = Seq("graft_part_orders"))
      val base =
        s"${System.getProperty("java.io.tmpdir")}/graft_part_orders_${runTag(dir)}"
      t(s, dir, "orders").write.mode("overwrite")
        .partitionBy("o_orderpriority").parquet(base)
      s.read.parquet(base)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderpriority"))
    }),

    // Declarative expectations audit (validate.Expectations) — the
    // warehouse generalization of the reference's mandatory-field
    // validator: six rules over lineitem in ONE aggregation pass plus a
    // keyed uniqueness check and a broadcast anti-join foreign-key check,
    // one (rule, n_violations, n_rows) row each. The in_set and in_range
    // rules are tuned to FIRE (tens of thousands of violations), so the
    // hash gate covers real counts, not just zeros. Fully oracled.
    "q_expectations" -> ((s, dir) => {
      import graft.validate.Expectations
      val li = t(s, dir, "lineitem")
      Expectations.audit(li,
        rules = Seq(
          Expectations.notNull("l_orderkey"),
          Expectations.inRange("l_quantity", 1L, 30L),
          Expectations.inSet("l_returnflag", Seq("A", "N")),
          Expectations.matches("l_linestatus", "^[FO]$")),
        uniqueKeys = Seq(Seq("l_orderkey", "l_linenumber")),
        foreignKeys = Seq(("l_orderkey", t(s, dir, "orders"), "o_orderkey")))
        .orderBy(col("rule"))
    }),

    // Zone-map file skipping (sink.ZoneMap): range-cluster lineitem on
    // ship date into 16 files + a per-file (min, max) stats table; a
    // month-range read consults the KB-scale stats FIRST and opens only
    // the files whose envelope intersects — the ordered-high-cardinality
    // complement of q_partition_pruning's directory pruning (at 100 TB:
    // tens of files opened instead of tens of thousands of footer reads).
    // Result must equal the plain full-scan filter — that's the oracle;
    // ZoneMapSpec asserts files were actually skipped.
    "q_zonemap_skip" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_zonemap_"))
      val base =
        s"${System.getProperty("java.io.tmpdir")}/graft_zonemap_${runTag(dir)}"
      graft.sink.ZoneMap.writeClustered(
        t(s, dir, "lineitem"), base, "l_shipdate", nFiles = 16)
      graft.sink.ZoneMap.readRange(s, base, "l_shipdate",
        lit("1996-03-01").cast("timestamp"), lit("1996-03-31").cast("timestamp"))
        .select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_shipdate").cast("date").as("d"),
          col("l_quantity").cast("long").as("qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // File-level BLOOM index (sink.BloomIndex over the native Bloom
    // aggregate): the equality complement of q_zonemap_skip — the table
    // is clustered by SHIP DATE, so a point lookup on ORDER KEY scatters
    // and zone maps prune nothing; the per-file Bloom filters reject
    // every file the key is definitely not in (no false negatives), and
    // the exact residual filter makes the read result-invisible. Result
    // ≡ plain full-scan filter — that's the oracle; BloomIndexSpec
    // asserts files were actually skipped.
    "q_bloom_index" -> ((s, dir) => {
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_bloomidx_"))
      val base =
        s"${System.getProperty("java.io.tmpdir")}/graft_bloomidx_${runTag(dir)}"
      graft.sink.ZoneMap.writeClustered(
        t(s, dir, "lineitem"), base, "l_shipdate", nFiles = 16)
      graft.sink.BloomIndex.buildIndex(s, base, "l_orderkey")
      graft.sink.BloomIndex.pointRead(s, base, "l_orderkey", 5988L)
        .select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_shipdate").cast("date").as("d"),
          col("l_quantity").cast("long").as("qty"))
        .orderBy(col("l_linenumber"))
    }),

    // Source-format surface: the same table round-tripped through orc,
    // json, and csv (schema re-applied on read — never inferred) must be
    // byte-identical to the parquet original; the oracle is the original
    // replicated per format.
    "q_source_formats" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_formats_rt_"), legacy = Seq("graft_formats_rt"))
      val base =
        s"${System.getProperty("java.io.tmpdir")}/graft_formats_rt_${runTag(dir)}"
      val perFormat = Seq("orc", "json", "csv").map { f =>
        sources.Formats.roundTrip(nation, f, s"$base/$f")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
            lit(f).as("via"))
      }
      perFormat.reduce(_.unionByName(_))
        .orderBy(col("via"), col("n_nationkey"))
    }),

    // Built-in bounded-state streaming dedup: dropDuplicatesWithinWatermark
    // with a span-sized delay (bounded replay ⇒ nothing evicts early, every
    // duplicate suppressed) — result ≡ batch DISTINCT, which is the oracle.
    "q_stream_dedup_wm" -> ((s, dir) => {
      val path = s"$dir/events.parquet"
      val ev = s.read.parquet(path)
      val evUs = EventTime.micros(ev)
      val spanUs = ev.agg((max(evUs) - min(evUs)).as("s")).head()
      val delay =
        if (spanUs.isNullAt(0)) "1 microsecond"
        else s"${spanUs.getLong(0) + 1} microseconds"
      val stream = s.readStream.schema(ev.schema).parquet(path + "*")
        .select(col("user_id"), col("event_type"),
          EventTime.timestamp(ev).as("tsm"))
      val name = s"stream_dedup_wm_${streamCounter.incrementAndGet()}"
      StreamingIngest.withStatePartitions(s, 8) {
        val q = StreamingIngest.dedupWithinWatermark(
            stream, Seq("user_id", "event_type"), "tsm", delay)
          .writeStream.outputMode("append").format("memory").queryName(name).start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(name).select(col("user_id"), col("event_type"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Streaming sessionization (session_window + watermark): the streaming
    // twin of q_sessionize, oracled against the same lag/cumsum derivation
    // (session windows merge when they touch, so the split rule is the
    // batch operator's strict >). Bounded-stream finalization via the
    // staged far-future sentinel row.
    "q_stream_sessions" -> ((s, dir) =>
      StreamingIngest.runSessionizeBounded(s, s"$dir/events.parquet",
        gapMicros = 1800L * 1000 * 1000,
        queryName = s"stream_sessions_${streamCounter.incrementAndGet()}")
        .select(col("user_id"), col("session_start"), col("session_last"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))),

    // The events capstone: sessionize + funnel + pivot composed into one
    // user-level feature table (the session/conversion/engagement shape an
    // events warehouse serves) — hash-matched as ONE chain so the
    // operators' interfaces compose, not just pass alone. All three
    // subtrees key on user_id, so the join stage reuses one partitioning.
    "q_events_pipeline" -> ((s, dir) => {
      val ev0 = t(s, dir, "events")
      val ev = ev0
        .select(col("user_id"), col("event_id"), col("event_type"),
          EventTime.micros(ev0).as("us"))
      val sessions = operators.Sessionize.sessionize(ev, Seq("user_id"),
          tsCol = "us", tieCol = "event_id", gap = 1800L * 1000 * 1000)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_session_events"))
      val fun = operators.Funnel.funnel(ev, Seq("user_id"), "us", Seq(
          "view" -> (col("event_type") === "view"),
          "click" -> (col("event_type") === "click"),
          "purchase" -> (col("event_type") === "purchase")))
        .select(col("user_id"), col("depth"))
      val piv = ev.groupBy(col("user_id"))
        .pivot("event_type", Seq("view", "click", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("view", "click", "purchase"))
        .select(col("user_id"), col("view").cast("long").as("n_view"),
          col("click").cast("long").as("n_click"),
          col("purchase").cast("long").as("n_purchase"))
      sessions.join(fun, "user_id").join(piv, "user_id")
        .orderBy(col("user_id"))
    }),

    // Sessionization: 30-min inactivity gap per user over epoch-micros
    // longs — one window shuffle labels sessions, the groupBy collapses
    // them. Oracled against the identical lag/flag/running-sum in DuckDB.
    // Epoch-based upsampling (mixing WITH repetition): src0 x2.3, src1
    // x0.5, src2 x1.0, everything else dropped — the repeated subset is a
    // pure function of the ids (per-mille Knuth slot), each copy indexed.
    "q_sample_epochs" -> ((s, dir) =>
      operators.Sampling.upsampleByEpochs(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source",
        Map("src0" -> 2.3, "src1" -> 0.5, "src2" -> 1.0))
        .select(col("doc_id"), col("source"), col("epoch"))
        .orderBy(col("doc_id"), col("epoch"))),

    // Recency-weighted user features: Σ value·2^(-age/halfLife) per user
    // at a FIXED as-of instant (mid-span, so the future-event leakage
    // filter is exercised). One narrow projection + one key-keyed agg.
    "q_decay_agg" -> ((s, dir) => {
      val ev0 = t(s, dir, "events")
      operators.TimeDecay.decayedAgg(
        ev0.select(col("user_id"), EventTime.micros(ev0).as("us"), col("value")),
        "user_id", "us", "value",
        asOfMicros = 1705276800000000L, halfLifeDays = 7.0)
        .orderBy(col("user_id"))
    }),

    // Keep-BEST dedup as a pure aggregation (partial max_by: only one
    // survivor per key crosses the exchange, vs the window path shuffling
    // every duplicate): best doc per (source, lang) by (text length,
    // doc_id) — the curation rule real pipelines use (keep the
    // highest-quality duplicate, not the lowest id). Ties and the
    // null-score group fall to the LARGEST doc_id.
    "q_dedup_keepbest" -> ((s, dir) =>
      Dedup.keepBestByKey(
        t(s, dir, "documents").select(col("doc_id"), col("source"),
          col("lang"), length(col("text")).as("quality")),
        Seq("source", "lang"), col("quality"), "doc_id")
        .orderBy(col("source"), col("lang"))),

    // Ingest-rate anomaly gate: hourly per-type counts (empty hours
    // zero-filled — a dead source must surface, not vanish) vs the
    // trailing 24h, flagged beyond 3 population-σ by a pure-integer
    // rearrangement of the z-test — no division/sqrt, hash-exact.
    "q_rate_anomalies" -> ((s, dir) => {
      val ev0 = t(s, dir, "events")
      operators.TimeSeries.rateAnomalies(ev0, "event_type",
        EventTime.micros(ev0), bucketMicros = 3600L * 1000 * 1000,
        window = 24, k = 3)
        .orderBy(col("key"), col("bucket"))
    }),

    // Streaming twin of the anomaly gate: grid-sized complete-mode count
    // state, then the SAME densify + integer z-test — exact counts make
    // it bit-identical to batch, so it shares q_rate_anomalies' oracle.
    "q_stream_anomalies" -> ((s, dir) =>
      StreamingIngest.runStreamRateAnomaliesBounded(s, s"$dir/events.parquet",
        "event_type", bucketMicros = 3600L * 1000 * 1000, window = 24, k = 3,
        queryName = s"stream_anom_${streamCounter.incrementAndGet()}")
        .orderBy(col("key"), col("bucket"))),

    // Temporal train/test split with a 1-day embargo after the cutoff —
    // the time-series evaluation split (id-hash splits leak through
    // nearby-in-time near-duplicates). Same fixed mid-span instant as
    // q_decay_agg; pure codegen projection, zero shuffle.
    "q_temporal_split" -> ((s, dir) => {
      val ev0 = t(s, dir, "events")
      operators.Sampling.temporalSplit(
        ev0.select(col("event_id"), col("user_id"),
          EventTime.micros(ev0).as("us")),
        "us", cutoffMicros = 1705276800000000L,
        embargoMicros = 86400L * 1000 * 1000)
        .orderBy(col("event_id"))
    }),

    "q_sessionize" -> ((s, dir) => {
      val ev0 = t(s, dir, "events")
      val ev = ev0
        .select(col("user_id"), col("event_id"), EventTime.micros(ev0).as("us"))
      operators.Sessionize.sessionize(ev, Seq("user_id"), tsCol = "us",
        tieCol = "event_id", gap = 1800L * 1000 * 1000)
        .select(col("user_id"), col("session_seq").cast("long").as("session_seq"),
          col("session_start"), col("session_end"), col("n_events"))
        .orderBy(col("user_id"), col("session_seq"))
    }),

    // TF-IDF top-3 distinctive terms per document; ranking on the ROUNDED
    // score (term tie-break) so it never hinges on sub-ulp log() deltas.
    "q_tfidf_topterms" -> ((s, dir) =>
      operators.TfIdf.topTerms(t(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rank"))),

    // Deterministic stratified sampling: keep-decision is a pure function
    // of doc_id (Knuth multiplicative hash → per-mille slot), reproducible
    // across runs/partitionings/engines — the corpus-lineage requirement
    // df.sample() cannot meet.
    "q_sample_stratified" -> ((s, dir) => {
      val strata = t(s, dir, "documents").withColumn("stratum",
        when(length(col("text")) < 300, "short")
          .when(length(col("text")) < 600, "mid")
          .otherwise("long"))
      operators.Sampling.stratifiedSample(strata, "doc_id", "stratum",
        Map("short" -> 100, "mid" -> 500, "long" -> 1000))
        .select(col("doc_id"), col("stratum"),
          operators.Sampling.perMilleSlot(col("doc_id")).as("slot"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic training-order shuffle: seeded double Knuth hash →
    // shard + in-shard rank, a pure function of the ids (orderBy(rand())
    // changes with partitioning/retries/engine; this never does). The
    // oracle re-derives both hash applications in overflow-free integer
    // arithmetic.
    "q_corpus_shuffle" -> ((s, dir) =>
      operators.Sampling.shuffleIntoShards(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id", numShards = 8, seed = 42L)
        .orderBy(col("shard"), col("pos"))),

    // Deterministic 80/10/10 train/val/test split — lineage-stable split
    // assignment as a pure function of the id (randomSplit's per-partition
    // RNG re-deals on repartition/retry and silently leaks eval docs into
    // train); same seeded double-Knuth machinery as q_corpus_shuffle.
    "q_corpus_split" -> ((s, dir) =>
      operators.Sampling.trainValTestSplit(
        t(s, dir, "documents").select(col("doc_id")), "doc_id",
        Seq(800, 100, 100), seed = 42L)
        .orderBy(col("doc_id"))),

    // Weighted top-k sample — priority sampling (Duffield-Lund-Thorup):
    // u from the seeded Knuth hash, priority w·2^32/(slot+1) in two fixed
    // IEEE-double ops, so the selected SET is engine-exact. Output size
    // exactly k; heavier documents win proportionally more often.
    "q_sample_weighted" -> ((s, dir) =>
      operators.Sampling.prioritySample(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 500, seed = 7L)
        .orderBy(col("doc_id"))),

    // PII redaction over deterministic synthetic PII (the fixture corpus
    // has no punctuation, so raw-documents redaction would be vacuous); the
    // oracle rebuilds the same PII text and redaction chain in SQL.
    "q_pii_redact" -> ((s, dir) => {
      val withPii = operators.PiiRedact.withSyntheticPii(
        t(s, dir, "documents"), "doc_id", "text")
      operators.PiiRedact.redact(withPii, "pii_text")
        .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
          col("redacted"))
        .orderBy(col("doc_id"))
    }),

    // Histogram: fixed-width binning as pure integer arithmetic (identical
    // in any engine — no width_bucket dialect dependence), clamped to
    // [0, nbins-1]; one narrow projection + one aggregation.
    "q_histogram" -> ((s, dir) => {
      val lo = 0.0; val w = 50000.0; val nbins = 12
      val bin = least(greatest(floor((col("o_totalprice") - lo) / w), lit(0)),
        lit(nbins - 1)).cast("long")
      t(s, dir, "orders")
        .select(bin.as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n"))
        .orderBy(col("bin"))
    }),

    // arg-min/arg-max per group with a TIE-FREE composite key (epoch-day
    // in the high bits, orderkey below): min_by/arg_min tie behavior is
    // engine-arbitrary, so determinism must come from the ordering key.
    // Radix 2^40 keeps the key order-preserving for orderkeys < 2^40
    // (~1.1e12 — far past TPC-H SF 100k) and days < 2^23.
    "q_agg_argminmax" -> ((s, dir) => {
      val combined = (datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
        .cast("long") * 1099511627776L + col("o_orderkey"))
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(min_by(col("o_orderkey"), combined).as("first_orderkey"),
          max_by(col("o_orderkey"), combined).as("last_orderkey"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // Fuzzy match: Levenshtein distance between neighboring docs' prefixes
    // — integer-exact in every engine, the classic fuzzy-dedup primitive.
    "q_text_levenshtein" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        substring(col("text"), 1, 30).as("p"))
      d.select(col("doc_id"), col("p"))
        .join(d.select((col("doc_id") - 1).as("doc_id"), col("p").as("p2")),
          "doc_id")
        .select(col("doc_id"), levenshtein(col("p"), col("p2")).cast("long").as("dist"))
        .orderBy(col("doc_id"))
    }),

    // Correlation/covariance per group, rounded to 6 dp: both engines use
    // the same single-pass co-moment formulas; rounding absorbs the
    // last-ulp accumulation-order differences.
    "q_agg_corr" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qty_disc"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),

    // Dispersion aggregates, rounded to absorb accumulation-order ulps.
    "q_agg_stddev" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_extendedprice")), 4).as("var_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),

    // Moving-window aggregation: trailing 4-row average in a total order —
    // the sliding-frame surface (ROWS BETWEEN), distinct from the
    // rank/lag/running-sum windows elsewhere.
    "q_window_moving" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
        .rowsBetween(-3, Window.currentRow)
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderpriority"), col("o_orderkey"),
          round(avg(col("o_totalprice")).over(w), 6).as("ma4"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),

    // Sketch aggregation — the 100 TB default for distinct counting: the
    // HyperLogLog++ sketch is fixed-size and mergeable, so cardinality
    // costs one partial-agg pass instead of a distinct shuffle. The
    // estimate itself is engine-internal, so the gated output is the
    // deterministic CLAIM: exact per-group values plus the sketch's
    // accuracy contract as a boolean — a sketch regression flips hll_ok
    // and breaks the hash (round-14 headliner fold).
    "q_approx_distinct" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd = 0.01).as("__apx"),
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"), col("n_users"), col("n_events"),
          (abs(col("__apx") - col("n_users")).cast("double") <=
            lit(0.05) * col("n_users").cast("double")).as("hll_ok"))
        .orderBy(col("event_type"))),

    // Verification-property sibling: every group's HLL++ estimate must sit
    // within 5× the configured 1% relative error of the exact distinct
    // count computed in the same query (a generous bound — the sketch's
    // own guarantee is ~3σ at 3·rsd). Violations only; oracle = empty
    // relation — the sketch value stays engine-internal, its accuracy
    // contract is what the driver gates.
    "q_approx_distinct_verify" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd = 0.01).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .filter(abs(col("approx_users") - col("exact_users")).cast("double") >
          lit(0.05) * col("exact_users").cast("double"))
        .select(col("event_type"), col("approx_users"), col("exact_users"))
        .orderBy(col("event_type"))),

    // Exact distinct per group: two-level aggregation (partial distinct on
    // (type, user) then count) — the plan Spark expands COUNT(DISTINCT) to.
    "q_distinct_users" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))),

    // MERGEABLE distinct rollup (DataSketches HLL): one sketch per
    // segment, global distinct from hll_union_agg over those sketches —
    // no second scan. The property exact distincts lack: per-segment
    // exacts can't combine (overlap unknown), sketches merge in
    // segment-count time. Engine-internal estimates → rows-only, gated
    // by the _verify error bound; exact sibling carries the oracle.
    "q_hll_rollup" -> ((s, dir) =>
      operators.Profiler.segmentDistinctRollup(
        t(s, dir, "events"), "event_type", "user_id")
        .orderBy(col("segment"))),

    // In-engine error gate: every estimate — per-segment AND the unioned
    // total — within 5% of exact (>3σ for lgConfigK=12). Violations only.
    "q_hll_rollup_verify" -> ((s, dir) =>
      operators.Profiler.segmentDistinctViolations(
        t(s, dir, "events"), "event_type", "user_id")
        .orderBy(col("segment"))),

    // Exact oracled sibling of the rollup, same shape (segments + total).
    "q_hll_rollup_exact" -> ((s, dir) => {
      val vals = t(s, dir, "events").filter(col("user_id").isNotNull)
        .select(col("event_type").cast("string").as("segment"),
          col("user_id").as("v"))
      vals.groupBy(col("segment"))
        .agg(countDistinct(col("v")).as("n_distinct"))
        .unionAll(vals.agg(countDistinct(col("v")).as("n_distinct"))
          .select(lit("__TOTAL__").as("segment"), col("n_distinct")))
        .orderBy(col("segment"))
    }),

    // The same rollup over the engine's NATIVE HLL aggregate lattice
    // (graft.expr.HllAggregate: sketch-agg → binary, sketch-union agg,
    // estimate expression) — a second TypedImperativeAggregate surface
    // alongside Misra–Gries, with a property MG lacks: register-wise max
    // is associative/commutative, so the sketch is a pure function of the
    // input SET and the merged rollup is bit-deterministic. Rows-only +
    // the _verify gate below; exact sibling q_hll_rollup_exact shares the
    // segments+total shape.
    "q_hll_native" -> ((s, dir) =>
      operators.Profiler.nativeDistinctRollup(
        t(s, dir, "events"), "event_type", "user_id")
        .orderBy(col("segment"))),

    // Gate: 5% error bound per segment AND total, plus bit-exact
    // merged-vs-direct estimate equality (the mergeability contract
    // itself). Violations only.
    "q_hll_native_verify" -> ((s, dir) =>
      operators.Profiler.nativeDistinctViolations(
        t(s, dir, "events"), "event_type", "user_id")
        .orderBy(col("segment"), col("issue"))),

    // The SAME native sketch aggregate as streaming state (the MG
    // hot-keys pattern): per-segment registers carry across micro-batches
    // in the state store. Rows-only; the gate below pins the result.
    "q_stream_hll" -> ((s, dir) =>
      StreamingIngest.runStreamDistinctBounded(s, s"$dir/events.parquet",
        "event_type", "user_id", lgK = 12,
        queryName = s"stream_hll_${streamCounter.incrementAndGet()}")
        .orderBy(col("segment"))),

    // Because the sketch is a set function, the streaming rollup must
    // equal the batch rollup BIT-EXACTLY (n and estimate, every segment
    // and the union total) regardless of how the replay batched — a
    // stronger gate than any error bound. Violations only.
    "q_stream_hll_verify" -> ((s, dir) => {
      val stream = StreamingIngest.runStreamDistinctBounded(s,
        s"$dir/events.parquet", "event_type", "user_id", lgK = 12,
        queryName = s"stream_hllv_${streamCounter.incrementAndGet()}")
      val batch = operators.Profiler.nativeDistinctRollup(
        t(s, dir, "events"), "event_type", "user_id")
      // null-safe segment join: a NULL segment is a real segment; a plain
      // equi-join would orphan both copies into spurious violations
      stream.withColumnRenamed("n_rows", "s_n")
        .withColumnRenamed("est_distinct", "s_est").alias("s")
        .join(batch.alias("b"),
          col("s.segment") <=> col("b.segment"), "full_outer")
        .filter(col("s.s_n").isNull || col("b.n_rows").isNull ||
          col("s.s_n") =!= col("b.n_rows") ||
          col("s.s_est") =!= col("b.est_distinct"))
        .select(coalesce(col("s.segment"), col("b.segment")).as("segment"),
          lit("stream_vs_batch").as("issue"))
    }),

    // Snapshot diff: what did this load DO — added/removed/changed per
    // key from ONE full-outer key join, delta-sized output (the input to
    // incremental downstream refresh). The after-image is derived
    // deterministically from orders so the oracle can rebuild both sides.
    "q_table_diff" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      val after = base.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 13 === 0, col("o_totalprice") + lit(10))
            .otherwise(col("o_totalprice")))
        .unionAll(base.filter(col("o_orderkey") % 101 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("o_orderpriority"), col("o_totalprice")))
      sink.Warehouse.snapshotDiff(base, after, Seq("o_orderkey"),
        Seq("o_orderpriority", "o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Anti join: customers who never ordered — LeftAnti is the plan-level
    // NOT EXISTS (one hash join, no materialized null-padded rows).
    "q_join_anti" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    // Set difference: customers who ordered but never with status F.
    "q_set_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.select(col("o_custkey").as("custkey"))
        .except(o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey")))
        .orderBy(col("custkey"))
    }),

    // The SQL front door: the same engine surface through spark.sql with a
    // correlated EXISTS (Catalyst rewrites it to a semi join).
    "q_sql_exists" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""SELECT c_custkey, c_name FROM customer_v c
              |WHERE EXISTS (SELECT 1 FROM orders_v o
              |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
              |ORDER BY c_custkey""".stripMargin)
    }),

    // INTERSECT (set semantics, the except sibling): one aggregate-style
    // shuffle after Catalyst rewrites it to a distinct semi join.
    "q_set_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
        .intersect(o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey")))
        .orderBy(col("custkey"))
    }),

    // Scalar subqueries through the SQL front door: two CORRELATED scalars
    // (Catalyst rewrites both into ONE left outer aggregate join — merged
    // because they share the correlation key) plus an UNCORRELATED scalar
    // in the WHERE clause (computed once, broadcast as a literal filter).
    "q_sql_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""SELECT c_custkey, c_name,
              |  (SELECT COUNT(*) FROM orders_v o
              |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
              |  (SELECT MAX(o_totalprice) FROM orders_v o
              |   WHERE o.o_custkey = c.c_custkey) AS max_price
              |FROM customer_v c
              |WHERE c_custkey <= (SELECT MAX(o_custkey) FROM orders_v)
              |ORDER BY c_custkey""".stripMargin)
    }),

    // Rank-normalized features per group: percent_rank/cume_dist are exact
    // small-integer ratios ((rank-1)/(n-1), n_le/n) — identical doubles in
    // every engine, unlike sums. One key-window shuffle for both.
    "q_window_percent_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
        .orderBy(col("o_orderkey"))
    }),

    // Multi-level rollup aggregation (OLAP surface): grouping_id
    // disambiguates rolled-up NULLs from data NULLs and pins the sort.
    "q_agg_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))),

    // Full CUBE over the rollup's dims — all four grouping sets in one
    // pass (Spark expands grouping sets before the partial aggregate, so
    // it stays a single shuffle).
    "q_agg_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))),

    "q_window_ntile" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          ntile(4).over(Window.partitionBy(col("o_custkey"))
              .orderBy(col("o_totalprice").desc, col("o_orderkey")))
            .cast("long").as("price_quartile"))
        .orderBy(col("o_orderkey"))),

    // Explicit GROUPING SETS (the general form rollup/cube specialize):
    // Spark expands the sets before the partial aggregate — still ONE
    // shuffle, not one per set.
    "q_agg_grouping_sets" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))),

    // FULL OUTER join of two aggregated sides — date spines rarely line up
    // (shipments trail orders by months; the bulk filter sparsifies one
    // side), so unmatched rows survive from BOTH sides. Aggregating BEFORE
    // the join keeps the outer join |dates|-sized, not row-sized.
    "q_join_full_outer" -> ((s, dir) => {
      val od = t(s, dir, "orders")
        .select(col("o_orderdate").cast("date").as("d"))
        .groupBy(col("d")).agg(count(lit(1)).as("n_orders"))
      val ld = t(s, dir, "lineitem").filter(col("l_quantity") >= 48)
        .select(col("l_shipdate").cast("date").as("d"))
        .groupBy(col("d")).agg(count(lit(1)).as("n_bulk_items"))
      od.join(ld, Seq("d"), "full_outer")
        .select(col("d"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_bulk_items"), lit(0L)).as("n_bulk_items"))
        .orderBy(col("d"))
    }),

    // lead/lag event context per user — the feature-extraction window shape
    // (previous-gap, next-action). One key-window shuffle, tie-broken on
    // event_id so the frame order is total.
    "q_window_leadlag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val ev0 = t(s, dir, "events")
      ev0
        .select(col("user_id"), col("event_id"), col("event_type"),
          EventTime.micros(ev0).as("us"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          (col("us") - lag(col("us"), 1).over(w)).as("gap_us"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Top-k per group — the canonical "best k examples per key" selection.
    // The rank filter is pushed into the shuffle as a WindowGroupLimit
    // (per-partition top-k heaps before the exchange), so the full sort
    // never materializes per group (plan-guarded in PlanSpec).
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rk"))
        .filter(col("rk") <= 3)
        .orderBy(col("o_custkey"), col("rk"))
    }),

    // Per-label embedding centroid sums in fixed-point (1e-6 grid) integer
    // arithmetic — order-independent addition makes the result reproducible
    // across engines/partitionings (double sums are not; float→decimal
    // casts round engine-specifically on dyadic ties), which is what lets
    // a vector aggregate carry a DuckDB oracle at all. The oracled surface
    // is integer-only (qsum, n pin the centroid exactly); the derived
    // double `mean` stays in the VectorStats API but out of the hash.
    // Every hashed column is cast to STRING on both sides: the values are
    // proven bit-identical across Spark/DuckDB/Python, but DuckDB's
    // SUM(BIGINT) surfaces as HUGEINT and a comparer may canonicalize
    // int128 differently than int64 — string casts remove the numeric-type
    // repr as a degree of freedom entirely.
    // Distributed Lloyd k-means, fully in-engine and ORACLED: quantized
    // 6dp-decimal inputs make every distance EXACT decimal arithmetic, so
    // assignments (argmin, cluster-id tie-break) replay bit-for-bit in
    // SQL. Per iteration: narrow codegen argmin + one (cluster,pos)-keyed
    // agg + a k·d-bounded driver collect (the MLlib shape).
    "q_kmeans_lloyd" -> ((s, dir) =>
      operators.KMeansOp.lloyd(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 4, iters = 2)
        .orderBy(col("vec_id"))),

    "q_vec_centroid" -> ((s, dir) =>
      operators.VectorStats.centroidSums(
        t(s, dir, "embeddings"), "label", "embedding")
        .orderBy(col("label"), col("pos"))
        .select(col("label").cast("string").as("label"),
          col("pos").cast("string").as("pos"),
          col("qsum").cast("string").as("qsum"),
          col("n").cast("string").as("n"))),

    // Upper-triangle Gram-matrix sums — the second moment behind the
    // distributed-covariance/PCA operator (VectorStats.pcaComponents),
    // under the same fixed-point contract as the centroid: the product of
    // two IEEE doubles is the same double in every engine, floor pins it
    // to a long, long sums commute. All columns string-cast on both sides
    // (the q_vec_centroid lesson: leave no numeric repr to canonicalize).
    "q_vec_gram" -> ((s, dir) =>
      operators.VectorStats.gramSums(t(s, dir, "embeddings"), "embedding")
        .orderBy(col("i"), col("j"))
        .select(col("i").cast("string").as("i"), col("j").cast("string").as("j"),
          col("qsum").cast("string").as("qsum"), col("n").cast("string").as("n"))),

    // Normal-equation moments for the trainable quality regressor
    // (predict text length from token/stopword counts): the distributed
    // half of LinearModel.fit, hash-matched under the q_vec_gram
    // fixed-point contract over the augmented
    // [1, n_tokens, n_stopwords, n_chars] vector.
    "q_reg_moments" -> ((s, dir) =>
      operators.LinearModel.moments(
        regFeatures(t(s, dir, "documents")),
        Seq("f_tokens", "f_stop"), "y_chars")
        .orderBy(col("i"), col("j"))
        .select(col("i").cast("string").as("i"), col("j").cast("string").as("j"),
          col("qsum").cast("string").as("qsum"), col("n").cast("string").as("n"))),

    // Thousands of independent regressions in ONE pass: per-nation OLS of
    // order value against order year as pure BIGINT sufficient statistics
    // (six moment sums + exact rational slope + floor-division milli
    // slope). Dims broadcast; one combining shuffle on the group key; no
    // per-group solver, no driver loop. Hash-oracled end to end.
    "q_reg_per_group" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      operators.LinearModel.groupedOls(joined, "n_name",
        year(col("o_orderdate")) - lit(1995), floor(col("o_totalprice")))
        .orderBy(col("grp"))
    }),

    // The fit's verification gate: per-coefficient normal-equation
    // gradient Σ xⱼ·(y − ŷ) re-derived in-engine (fixed-point folds) must
    // stay within the quantization-derived bound — a wrong pivot, index
    // slip, or sign in the driver solve blows it by orders of magnitude.
    // Violations only; oracle = empty relation.
    "q_reg_verify" -> ((s, dir) => {
      import s.implicits._
      val d = regFeatures(t(s, dir, "documents")).localCheckpoint()
      val feats = Seq("f_tokens", "f_stop")
      val fit = operators.LinearModel.fit(d, feats, "y_chars")
      // bound + the gradient computation's own quantization (n/grid),
      // then 4x safety — see LinearModel scaladoc for the derivation
      val tol = 4.0 * (fit.gradientBound + fit.n / fit.grid)
      val gradVio = operators.LinearModel.gradientSums(d, feats, "y_chars", fit)
        .filter(abs(col("qgrad").cast("double") / fit.grid) > tol ||
          col("n") =!= fit.n)
        .select(col("j"),
          when(col("n") =!= fit.n, lit("row_count_mismatch"))
            .otherwise(lit("gradient_out_of_bound")).as("issue"),
          (col("qgrad").cast("double") / fit.grid).as("value"))
      val badW = fit.weights.zipWithIndex
        .filter { case (w, _) => w.isNaN || w.isInfinite }
        .map { case (w, j) => (j.toLong, "weight_not_finite", w) }
      gradVio.unionByName(badW.toSeq.toDF("j", "issue", "value"))
        .orderBy(col("j"))
    }),

    // PSI distribution drift between the view and purchase value
    // distributions, fixed literal bin bounds (frozen-reference
    // discipline: bounds must not float with the monitored data).
    "q_drift_psi" -> ((s, dir) =>
      operators.Profiler.driftPsi(t(s, dir, "events"), "event_type",
        "view", "purchase", "value", Seq(10, 20, 40, 80, 160))
        .orderBy(col("bin"))),

    // Median/MAD robust outliers over the skewed event values — the
    // distribution-robust data-quality gate (mean/stddev thresholds are
    // dragged by the tail they should flag). Exact-percentile med/mad,
    // flagged rows only.
    "q_outliers_mad" -> ((s, dir) =>
      operators.Profiler.robustOutliers(t(s, dir, "events"), "event_id", "value")
        .orderBy(col("event_id"))),

    // Single-pass table profile: per-column null/distinct/min/max from
    // ONE scan (the pre-training data-quality gate); exact distincts are
    // the oracle contract, approx_count_distinct the 100 TB path (spec'd).
    "q_profile_table" -> ((s, dir) =>
      operators.Profiler.profile(t(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "n_chars"))
        .orderBy(col("col_name"))),

    // Sketch quantiles (GK percentile_approx) — the 100-TB percentile
    // path: fixed-size mergeable state, no sort. The returned values are
    // compaction-order-specific, so the gated output is the CLAIM: for
    // each p, the value's exact rank interval intersects [(p±eps)·n] —
    // rank_ok flips (and breaks the hash) on any GK regression
    // (round-14 headliner fold; the raw values stay in the API).
    "q_quantile_approx" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ps = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
      val bad = operators.Profiler.approxQuantileViolations(li,
          "l_extendedprice", ps, accuracy = 1000)
        .select(col("p")).distinct().withColumn("__bad", lit(true))
      operators.Profiler.approxQuantiles(li, "l_extendedprice", ps,
          accuracy = 1000)
        .join(bad, Seq("p"), "left")
        .crossJoin(broadcast(li.filter(col("l_extendedprice").isNotNull)
          .agg(count(lit(1)).as("n"))))
        .select(col("p"), col("n"), col("__bad").isNull.as("rank_ok"))
        .orderBy(col("p"))
    }),

    // In-engine GK guarantee check: each returned value's exact rank range
    // must intersect [(p-eps)n, (p+eps)n] on the real data. Violations
    // only — empty relation when the sketch honors its contract.
    "q_quantile_approx_verify" -> ((s, dir) =>
      operators.Profiler.approxQuantileViolations(t(s, dir, "lineitem"),
        "l_extendedprice", Seq(0.01, 0.25, 0.5, 0.75, 0.99), accuracy = 1000)),

    // The NATIVE mergeable quantile summary (graft.expr.KllSketchAgg, the
    // fourth TypedImperativeAggregate next to MG/HLL/CMS): per-returnflag
    // KLL compactor stacks over micro-quantized price, expanded to
    // percentile estimates. Map tasks carry one k·log-sized buffer; only
    // summaries cross the shuffle — the 100-TB shape percentile_cont
    // can't have. Summary content is arrival-order-dependent (like MG) →
    // the gated output is the deterministic CLAIM per (segment, p): the
    // sketch-carried n (exact by the KLL invariant) and the worst-case
    // rank-ledger check as a boolean — compaction-order-specific values
    // stay in the API, any KLL regression flips rank_ok (round-14 fold);
    // q_agg_percentiles is the exact-oracled sibling shape.
    "q_quantile_native" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("__price_micro",
          floor(col("l_extendedprice").cast("double") * 1e6).cast("long"))
      val est = operators.QuantileSketch.groupQuantiles(li,
        "l_returnflag", "__price_micro", k = 256,
        ps = Seq(0.01, 0.25, 0.5, 0.75, 0.99)).localCheckpoint()
      val values = li.filter(col("__price_micro").isNotNull)
        .select(col("l_returnflag").cast("string").as("segment"),
          col("__price_micro").as("v"))
      val bad = operators.QuantileSketch.violations(est, values)
        .select(col("segment"), col("p")).distinct()
        .withColumn("__bad", lit(true))
      est.join(bad, Seq("segment", "p"), "left")
        .select(col("segment"), col("p"), col("n"),
          col("__bad").isNull.as("rank_ok"))
        .orderBy(col("segment"), col("p"))
    }),

    // In-engine KLL guarantee gate, all three invariants per (segment, p):
    // n exact, the exact rank interval of the returned value intersects
    // [target − err, target + err] for the sketch's self-reported
    // compaction ledger err, and the value is a genuine input value.
    // Violations only; oracle = empty relation.
    "q_quantile_native_verify" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("__price_micro",
          floor(col("l_extendedprice").cast("double") * 1e6).cast("long"))
      val est = operators.QuantileSketch.groupQuantiles(li,
        "l_returnflag", "__price_micro", k = 256,
        ps = Seq(0.01, 0.25, 0.5, 0.75, 0.99))
      val values = li.filter(col("__price_micro").isNotNull)
        .select(col("l_returnflag").cast("string").as("segment"),
          col("__price_micro").as("v"))
      operators.QuantileSketch.violations(est, values)
        .orderBy(col("segment"), col("p"), col("issue"))
    }),

    // The SAME native KLL aggregate as streaming state (the MG hot-keys
    // pattern): per-event-type compactor stacks carry across micro-batches
    // in the state store. Arrival-order-dependent like the batch headline
    // → the gated output is the same (segment, p, n, rank_ok) claim,
    // checked against the exact batch data (round-14 headliner fold).
    "q_stream_quantile" -> ((s, dir) => {
      val est = StreamingIngest.runStreamQuantileBounded(s,
        s"$dir/events.parquet", "event_type",
        floor(col("value").cast("double") * 1e6), k = 256,
        ps = Seq(0.25, 0.5, 0.75, 0.95),
        queryName = s"stream_kll_${streamCounter.incrementAndGet()}")
        .localCheckpoint()
      val values = t(s, dir, "events")
        .withColumn("__v", floor(col("value").cast("double") * 1e6).cast("long"))
        .filter(col("__v").isNotNull)
        .select(col("event_type").cast("string").as("segment"), col("__v").as("v"))
      val bad = operators.QuantileSketch.violations(est, values)
        .select(col("segment"), col("p")).distinct()
        .withColumn("__bad", lit(true))
      est.join(bad, Seq("segment", "p"), "left")
        .select(col("segment"), col("p"), col("n"),
          col("__bad").isNull.as("rank_ok"))
        .orderBy(col("segment"), col("p"))
    }),

    // The streaming result equals SOME valid KLL run, so the same
    // worst-case rank gate applies verbatim against the exact batch data.
    // Violations only; oracle = empty relation.
    "q_stream_quantile_verify" -> ((s, dir) => {
      val est = StreamingIngest.runStreamQuantileBounded(s,
        s"$dir/events.parquet", "event_type",
        floor(col("value").cast("double") * 1e6), k = 256,
        ps = Seq(0.25, 0.5, 0.75, 0.95),
        queryName = s"stream_kllv_${streamCounter.incrementAndGet()}")
      val values = t(s, dir, "events")
        .withColumn("__v", floor(col("value").cast("double") * 1e6).cast("long"))
        .filter(col("__v").isNotNull)
        .select(col("event_type").cast("string").as("segment"), col("__v").as("v"))
      operators.QuantileSketch.violations(est, values)
        .orderBy(col("segment"), col("p"), col("issue"))
    }),

    // Segment set-OVERLAP via the native KMV (theta) sketch
    // (graft.expr.KmvAggregate) — the set-operation summary HLL cannot
    // be: union / intersection / difference / Jaccard for every
    // returnflag pair over the distinct order-key sets, from ONE row scan
    // into per-segment sketches plus pair-count sketch combinations.
    // Engine-internal estimates (lineitem order keys far exceed k) → the
    // gated output is the per-pair claim: every union/intersection/
    // difference/Jaccard estimate inside its 6σ bound and the merge
    // lattice byte-exact — bounds_ok flips on any theta-sketch
    // regression (round-14 fold; estimates stay in the API, exact
    // sibling q_kmv_overlap_exact keeps the value oracle).
    "q_kmv_overlap" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val bad = operators.SetSketch.pairOverlapViolations(li,
          "l_returnflag", "l_orderkey", k = 512)
        .select(col("seg_a"), col("seg_b")).distinct()
        .withColumn("__bad", lit(true))
      operators.SetSketch.pairOverlap(li, "l_returnflag", "l_orderkey",
          k = 512)
        .join(bad, Seq("seg_a", "seg_b"), "left")
        .select(col("seg_a"), col("seg_b"), col("__bad").isNull.as("bounds_ok"))
        .orderBy(col("seg_a"), col("seg_b"))
    }),

    // Exact oracled sibling, same shape — the value-level self-join the
    // sketch exists to avoid at scale (its shuffle carries every distinct
    // (segment, value) pair twice and re-runs per new segment).
    "q_kmv_overlap_exact" -> ((s, dir) =>
      operators.SetSketch.pairOverlapExact(t(s, dir, "lineitem"),
        "l_returnflag", "l_orderkey")
        .orderBy(col("seg_a"), col("seg_b"))),

    // Gate: every union/intersection/difference estimate within 6·RSE·|A∪B|
    // of exact, Jaccard within 6·½/√k, and the union-merge of per-segment
    // sketches BYTE-IDENTICAL to one direct global sketch (KMV is a pure
    // set function). Violations only; oracle = empty relation.
    "q_kmv_overlap_verify" -> ((s, dir) =>
      operators.SetSketch.pairOverlapViolations(t(s, dir, "lineitem"),
        "l_returnflag", "l_orderkey", k = 512)
        .orderBy(col("seg_a"), col("seg_b"), col("issue"))),

    // The SAME native KMV aggregate as streaming state: per-event-type
    // k-smallest-hash sets carry across micro-batches, pairwise overlap
    // derived from the final state. user_id (150 distinct « k) keeps the
    // sketches in their exact regime, so the overlap figures double as
    // exact set relations between event-type audiences. Rows-only; the
    // gate below pins the result.
    "q_stream_kmv" -> ((s, dir) =>
      StreamingIngest.runStreamOverlapBounded(s, s"$dir/events.parquet",
        "event_type", "user_id", k = 512,
        queryName = s"stream_kmv_${streamCounter.incrementAndGet()}")
        .orderBy(col("seg_a"), col("seg_b"))),

    // Because the sketch is a set function, the streaming pair overlap
    // must equal the batch one BIT-EXACTLY (every figure, every pair)
    // regardless of how the replay batched. Violations only.
    "q_stream_kmv_verify" -> ((s, dir) => {
      val stream = StreamingIngest.runStreamOverlapBounded(s,
        s"$dir/events.parquet", "event_type", "user_id", k = 512,
        queryName = s"stream_kmvv_${streamCounter.incrementAndGet()}")
      val batch = operators.SetSketch.pairOverlap(
        t(s, dir, "events"), "event_type", "user_id", k = 512)
      val sCols = stream.columns.map(c => col(c).as(s"s_$c"))
      val bCols = batch.columns.map(c => col(c).as(s"b_$c"))
      stream.select(sCols: _*)
        .join(batch.select(bCols: _*),
          col("s_seg_a") <=> col("b_seg_a") &&
            col("s_seg_b") <=> col("b_seg_b"), "full_outer")
        .filter(col("s_union_est").isNull || col("b_union_est").isNull ||
          col("s_union_est") =!= col("b_union_est") ||
          col("s_intersect_est") =!= col("b_intersect_est") ||
          col("s_diff_ab_est") =!= col("b_diff_ab_est") ||
          col("s_jaccard_ppm") =!= col("b_jaccard_ppm"))
        .select(coalesce(col("s_seg_a"), col("b_seg_a")).as("seg_a"),
          coalesce(col("s_seg_b"), col("b_seg_b")).as("seg_b"),
          lit("stream_vs_batch").as("issue"))
    }),

    // The native Bloom aggregate as streaming state: per-event-type
    // filters OR-merge across micro-batches. The filter bytes are
    // engine-internal, so the gated output is the Bloom CONTRACT per
    // segment: exact member count and "every present (segment, user)
    // probes TRUE in the streamed filter" — a false negative (impossible
    // by construction) flips the flag and breaks the hash (round-14
    // fold; the bit-level stream ≡ batch gate stays in _verify).
    "q_stream_bloom" -> ((s, dir) => {
      val stream = StreamingIngest.runStreamBloomBounded(s,
        s"$dir/events.parquet", "event_type", "user_id",
        numBits = 1 << 15, numHashes = 7,
        queryName = s"stream_bloom_${streamCounter.incrementAndGet()}")
      val members = t(s, dir, "events").filter(col("user_id").isNotNull)
        .select(col("event_type").cast("string").as("segment"),
          col("user_id").cast("long").as("__v"))
        .distinct()
      members.join(stream, Seq("segment"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_users"),
          min(graft.sink.BloomIndex.bloomContains(col("bloom"), col("__v"))
            .cast("int")).as("__allin"))
        .select(col("segment"), col("n_users"),
          (col("__allin") === 1).as("no_false_negatives"))
        .orderBy(col("segment"))
    }),

    // Two-part gate: (a) streaming filter BYTES equal the batch ones
    // per segment (set-function replay invariance, the strongest claim);
    // (b) the Bloom contract itself — every (segment, user) actually
    // present probes TRUE in the streamed filter (no false negatives,
    // ever). Violations only; oracle = empty relation.
    "q_stream_bloom_verify" -> ((s, dir) => {
      val stream = StreamingIngest.runStreamBloomBounded(s,
        s"$dir/events.parquet", "event_type", "user_id",
        numBits = 1 << 15, numHashes = 7,
        queryName = s"stream_bloomv_${streamCounter.incrementAndGet()}")
      val ev = t(s, dir, "events").filter(col("user_id").isNotNull)
      val batch = ev
        .groupBy(col("event_type").cast("string").as("segment"))
        .agg(graft.sink.BloomIndex.bloomAgg(col("user_id").cast("long"),
          1 << 15, 7).as("bloom"))
      // Null-safe keys throughout: a NULL segment is a real segment (the
      // repo-wide convention for stream-vs-batch comparisons — see the
      // <=> joins in q_stream_kmv_verify above). Plain equality would let
      // NULL-segment rows miss each other (spurious bits drift) and skip
      // the no-false-negative probe entirely.
      val bitsDrift = stream.select(col("segment").as("s_seg"),
          col("bloom").as("sb"))
        .join(batch.select(col("segment").as("b_seg"), col("bloom").as("bb")),
          col("s_seg") <=> col("b_seg"), "full_outer")
        .filter(col("sb").isNull || col("bb").isNull || col("sb") =!= col("bb"))
        .select(coalesce(col("s_seg"), col("b_seg")).as("segment"),
          lit("stream_vs_batch_bits").as("issue"))
      val members = ev.select(col("event_type").cast("string").as("m_seg"),
        col("user_id").cast("long").as("u")).distinct()
      val falseNeg = members
        .join(stream.select(col("segment"), col("bloom")),
          col("m_seg") <=> col("segment"))
        .drop("m_seg")
        .filter(!graft.sink.BloomIndex.bloomContains(col("bloom"), col("u")))
        .select(col("segment"), lit("false_negative").as("issue"))
      bitsDrift.unionByName(falseNeg).orderBy(col("segment"), col("issue"))
    }),

    // Vector-quality gate: fixed-point squared norms, exact-percentile
    // thresholds (the quantile_cont identity), plain comparison flags.
    "q_vec_outliers" -> ((s, dir) =>
      operators.VectorStats.normOutliers(
        t(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy(col("vec_id"))),

    // Length-bucketed dynamic batching: equi-depth buckets by length, then
    // fixed-size batches within each bucket — the padding-efficiency
    // layout; every number is integer/percentile-deterministic.
    "q_length_batches" -> ((s, dir) =>
      operators.Packing.lengthBucketedBatches(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", numBuckets = 8, batchDocs = 32)
        .orderBy(col("bucket"), col("batch"), col("n_chars"), col("doc_id"))),

    // Verification-property sibling: the posexplode fixed-point path must
    // agree exactly (integer equality, no tolerance) with an independent
    // in-Spark recompute that never uses posexplode — a broadcast
    // positions×rows join with element_at, quantized through the same
    // floor(v·1e6) contract. Violations only; oracle = empty relation, so
    // the centroid math is driver-gated even if the cross-engine
    // fingerprint comparison stays environment-sensitive.
    "q_vec_centroid_verify" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val a = operators.VectorStats.centroidSums(e, "label", "embedding")
        .withColumnRenamed("qsum", "qsum_a").withColumnRenamed("n", "n_a")
      val positions = e
        .select(explode(sequence(lit(1), size(col("embedding")))).as("pos"))
        .distinct()
      val b = e.crossJoin(broadcast(positions))
        .select(col("label"), col("pos").cast("long").as("pos"),
          floor(element_at(col("embedding"), col("pos").cast("int"))
            .cast("double") * lit(1e6)).cast("long").as("__q"))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("__q")).as("qsum_b"), count(lit(1)).as("n_b"))
      a.join(b, Seq("label", "pos"), "full_outer")
        .filter(col("qsum_a").isNull || col("qsum_b").isNull ||
          col("qsum_a") =!= col("qsum_b") || col("n_a") =!= col("n_b"))
        .select(col("label").cast("int").as("label"), col("pos"),
          lit("centroid_path_mismatch").as("issue"))
        .orderBy(col("label"), col("pos"))
    }),

    // PCA end-to-end gate (driver-side Jacobi eigensolve + HOF projection
    // — the refactor-fragile half with specs but, until now, no harness
    // row). Violations-only, oracle = empty relation. Per vector, in-engine:
    //   (a) dual-path projection: pcaProject's shared-centering transform
    //       vs an independent per-component inline-centered recompute —
    //       the exact expression shape the CollapseProject re-eval trap
    //       produces, so the two paths also pin that guard's semantics;
    //   (b) Pythagoras: ||v-mean||² − Σ projᵢ² = ||v − v̂||² for the HOF
    //       reconstruction v̂ — ties projection, reconstruction, and
    //       component orthonormality together per row;
    // plus (c) the k×k component Gram matrix vs identity (driver-side
    // doubles, emitted as sentinel-id violation rows).
    "q_vec_pca_verify" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val k = 8
      val (mean, _, comps) = operators.VectorStats.pcaComponents(e, "embedding", k)
      val d = mean.length
      val meanLit = typedlit(mean.toSeq)
      val compsLit = typedlit(comps.map(_.toSeq).toSeq)
      // ONE eigensolve shared by path A and the checks: a second
      // pcaComponents call would re-aggregate moments whose double sums
      // merge in nondeterministic partial order — ulp-different
      // components through the 1/eigengap-amplifying Jacobi solve could
      // trip the 1e-9 gate spuriously.
      val proj = operators.VectorStats.pcaProject(e, "embedding", "proj", mean, comps)
      val withB = comps.indices.foldLeft(proj)((df, i) =>
        df.withColumn(s"__b$i",
          aggregate(
            zip_with(
              zip_with(col("embedding"), meanLit, (x, m) => x.cast("double") - m),
              typedlit(comps(i).toSeq), (ctr, c) => ctr * c),
            lit(0.0), (acc, x) => acc + x)))
      val bArr = array(comps.indices.map(i => col(s"__b$i")): _*)
      val recon = transform(sequence(lit(0), lit(d - 1)), p =>
        element_at(meanLit, (p + 1).cast("int")) +
          aggregate(sequence(lit(0), lit(k - 1)), lit(0.0), (acc, i) =>
            acc + element_at(col("proj"), (i + 1).cast("int")) *
              element_at(element_at(compsLit, (i + 1).cast("int")),
                (p + 1).cast("int"))))
      def sq(x: org.apache.spark.sql.Column) = x * x
      // Materialization BARRIER between the vector-building stage (proj,
      // the 8 path-B folds, the k·d-literal reconstruction) and the
      // scalar checks: without it CollapseProject inlines each giant
      // expression tree into every downstream reference — the trees
      // multiply through err2 → pyth_delta → filter, codegen gives up,
      // and the interpreted query ran 127 s at sf0.1 (vs ~1 s staged).
      val scored = withB
        .withColumn("__recon", recon)
        .localCheckpoint()
        .withColumn("__err2",
          aggregate(zip_with(col("embedding"), col("__recon"),
            (x, y) => sq(x.cast("double") - y)), lit(0.0), (acc, x) => acc + x))
        .withColumn("__dm2",
          aggregate(zip_with(col("embedding"), meanLit,
            (x, m) => sq(x.cast("double") - m)), lit(0.0), (acc, x) => acc + x))
        .withColumn("__pn2",
          aggregate(col("proj"), lit(0.0), (acc, x) => acc + x * x))
        .withColumn("path_delta",
          aggregate(zip_with(col("proj"), bArr, (a, b) => abs(a - b)),
            lit(0.0), (acc, x) => greatest(acc, x)))
        .withColumn("pyth_delta",
          abs(col("__dm2") - col("__pn2") - col("__err2")))
      val vio = scored
        .filter(col("path_delta") > 1e-9 || col("pyth_delta") > 1e-6 ||
          size(col("proj")) =!= k)
        .select(col("vec_id").cast("long").as("vec_id"),
          when(col("path_delta") > 1e-9, lit("projection_path_mismatch"))
            .otherwise(lit("pythagoras_violation")).as("issue"),
          greatest(col("path_delta"), col("pyth_delta")).as("delta"))
      val orthoVio = (for { i <- 0 until k; j <- i until k } yield {
        val dot = (0 until d).map(p => comps(i)(p) * comps(j)(p)).sum
        val want = if (i == j) 1.0 else 0.0
        (i, j, math.abs(dot - want))
      }).filter(_._3 > 1e-9)
        .map { case (i, j, dev) =>
          (-1L - (i * k + j), "component_orthonormality", dev) }
      vio.unionByName(orthoVio.toDF("vec_id", "issue", "delta"))
        .orderBy(col("vec_id"))
    }),

    // PCA persistence gate: solve the basis ONCE, save to parquet, load
    // it back, and demand (a) the loaded mean/components are BITWISE
    // equal to the saved ones (driver-side doubles, sentinel rows on
    // mismatch) and (b) the projections under saved vs loaded basis are
    // exactly equal per vector — bit-identity is the contract because
    // load ∘ save must be the identity on doubles. Empty-relation oracle.
    "q_vec_pca_reload_verify" -> ((s, dir) => {
      import s.implicits._
      sweepDeadScratch(new java.io.File(System.getProperty("java.io.tmpdir")),
        Seq("graft_pca_model_"))
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_pca_model_${runTag(dir)}"
      val e = t(s, dir, "embeddings")
      val (mean, _, comps) = operators.VectorStats.pcaComponents(e, "embedding", 8)
      operators.VectorStats.savePcaBasis(s, mean, comps, path)
      val (mean2, comps2) = operators.VectorStats.loadPcaBasis(s, path)
      val basisVio =
        (if (java.util.Arrays.equals(mean, mean2)) Seq.empty[(Long, String)]
         else Seq((-1L, "mean_roundtrip_mismatch"))) ++
        comps.indices.collect {
          case i if !java.util.Arrays.equals(comps(i), comps2(i)) =>
            (-2L - i, "component_roundtrip_mismatch")
        }
      val a = operators.VectorStats
        .pcaProject(e, "embedding", "proj", mean, comps)
        .select(col("vec_id").cast("long").as("vec_id"), col("proj"))
      val b = operators.VectorStats
        .pcaProject(e, "embedding", "proj2", mean2, comps2)
        .select(col("vec_id").cast("long").as("vec_id"), col("proj2"))
      a.join(b, "vec_id")
        .filter(not(col("proj") <=> col("proj2")))
        .select(col("vec_id"), lit("projection_mismatch").as("issue"))
        .unionByName(basisVio.toDF("vec_id", "issue"))
        .orderBy(col("vec_id"))
    }),

    // Two-phase salted aggregation: decomposable aggregates partial-agg on
    // (keys, salt) then combine — identical to the plain groupBy, so the
    // oracle IS the plain groupBy (3 heavily-skewed return-flag keys).
    "q_agg_salted" -> ((s, dir) =>
      operators.Skew.saltedAggregate(
        t(s, dir, "lineitem")
          .withColumn("lq", col("l_quantity").cast("decimal(18,2)")),
        Seq("l_returnflag"),
        Seq(operators.Skew.AggSpec("sum", "lq", "sum_qty"),
          operators.Skew.AggSpec("count", "l_orderkey", "n_rows"),
          operators.Skew.AggSpec("min", "l_orderkey", "lo_key"),
          operators.Skew.AggSpec("max", "l_orderkey", "hi_key")),
        numSalts = 16, saltCols = Seq("l_orderkey", "l_linenumber"))
        .select(col("l_returnflag"), col("sum_qty").cast("double").as("sum_qty"),
          col("n_rows"), col("lo_key"), col("hi_key"))
        .orderBy(col("l_returnflag"))),

    // Salted join: probe-side skew spread across 8 salt replicas of the
    // build side; result provably identical to the plain join, so the
    // oracle IS the plain join.
    "q_join_salted" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("okey"), col("l_extendedprice"),
          col("l_discount"), col("l_linenumber"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      operators.Skew.saltedJoin(li, ord, Seq("okey"), numSalts = 8,
        saltCols = Seq("okey", "l_linenumber"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    }),

    // Bounded-memory heavy hitters: native Misra–Gries imperative aggregate
    // (expr/MisraGriesAggregate.scala) — which keys are hot, without the
    // full groupBy(key).count shuffle (capacity-sized mergeable summaries
    // only). Estimates are partitioning-order-dependent, so the gated
    // output is the deterministic CLAIM: exact stream length, capacity,
    // and the count of MG-guarantee violations (est ≤ true ≤ est+sub, no
    // missing heavy item, sub bound) — any MG regression makes
    // n_violations non-zero and breaks the hash (round-14 fold; the raw
    // summary stays in the API, exact sibling q_heavy_hitters_exact).
    "q_heavy_hitters" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.filter(col("user_id").isNotNull).agg(count(lit(1)).as("n"))
        .crossJoin(operators.HeavyHitters.violations(ev, "user_id",
          capacity = 32).agg(count(lit(1)).as("n_violations")))
        .select(lit(32L).as("capacity"), col("n"), col("n_violations"))
    }),

    // Exact oracled sibling: true top-25 hottest users, deterministic
    // (count desc, id asc) tie-break. orderBy+limit = TakeOrderedAndProject
    // (per-partition heaps, no one-partition window).
    "q_heavy_hitters_exact" -> ((s, dir) =>
      t(s, dir, "events").filter(col("user_id").isNotNull)
        .groupBy(col("user_id").as("item")).agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("item"))
        .limit(25)),

    // In-engine MG guarantee check against exact counts: est<=true<=est+sub
    // per item, no heavy item missing, stream length exact, sub within its
    // n/(capacity+1) bound. Violations only; oracle = empty relation.
    "q_heavy_hitters_verify" -> ((s, dir) =>
      operators.HeavyHitters.violations(t(s, dir, "events"), "user_id",
        capacity = 32)),

    // Per-group heavy hitters: one capacity-bounded MG summary PER
    // event_type — the grouped dimension the other sketch families
    // already ship (HLL rollup, KMV pairs, CMS segments). est values are
    // engine-internal (decrement schedule) → the gated output is the
    // per-group claim (exact n, zero guarantee violations); the raw
    // summaries stay in the API and the exact sibling keeps its oracle
    // (round-14 headliner fold).
    "q_hotkeys_by_group" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val nv = operators.HeavyHitters.violationsByGroup(ev,
          "event_type", "user_id", capacity = 16)
        .groupBy(col("grp")).agg(count(lit(1)).as("__nv"))
      ev.filter(col("user_id").isNotNull)
        .groupBy(col("event_type").cast("string").as("grp"))
        .agg(count(lit(1)).as("n"))
        .join(nv, Seq("grp"), "left")
        .select(col("grp"), col("n"),
          coalesce(col("__nv"), lit(0L)).as("n_violations"))
        .orderBy(col("grp"))
    }),

    // Exact oracled sibling: per-group true top-10 users, deterministic
    // (count desc, id asc) tie-break via one rank window over the
    // (group, item) count table.
    "q_hotkeys_by_group_exact" -> ((s, dir) => {
      val cnt = t(s, dir, "events").filter(col("user_id").isNotNull)
        .groupBy(col("event_type").cast("string").as("grp"),
          col("user_id").as("item"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
        .orderBy(col("cnt").desc, col("item").asc)
      cnt.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 10)
        .select(col("grp"), col("item"), col("cnt"))
        .orderBy(col("grp"), col("cnt").desc, col("item"))
    }),

    // Per-(group, item) MG guarantee check against exact counts.
    // Violations only; oracle = empty relation.
    "q_hotkeys_by_group_verify" -> ((s, dir) =>
      operators.HeavyHitters.violationsByGroup(t(s, dir, "events"),
        "event_type", "user_id", capacity = 16)),

    // Count-Min point-frequency estimates for the exact top-25 users — the
    // third native sketch (MG: which items are heavy; HLL: how many
    // distinct; CMS: how often did THIS item occur, probed after the
    // scan). One-row sketch crossed into the bounded probe set; estimates
    // are engine-internal → rows-only, gated by the _verify below; exact
    // sibling q_heavy_hitters_exact carries the oracle for the same items.
    "q_cms_native" -> ((s, dir) =>
      operators.FreqSketch.topItemEstimates(
        t(s, dir, "events"), "user_id", k = 25)
        .orderBy(col("exact_cnt").desc, col("item"))),

    // Gate over EVERY distinct item: no undercount ever (counters only
    // add), overcount within 2·e·n/width, and per-segment sketches summed
    // BYTE-equal to the one-pass global sketch. Violations only.
    "q_cms_native_verify" -> ((s, dir) =>
      operators.FreqSketch.violations(
        t(s, dir, "events"), "user_id", "event_type")
        .orderBy(col("subject"), col("issue"))),

    // The SAME CMS grid as streaming state (complete-mode global agg
    // merged across micro-batches), probed with the exact top-25 after
    // the replay. Rows-only; pinned by the gate below.
    "q_stream_cms" -> ((s, dir) =>
      StreamingIngest.runStreamFreqBounded(s, s"$dir/events.parquet",
        "user_id", k = 25, depth = 10, width = 2048,
        queryName = s"stream_cms_${streamCounter.incrementAndGet()}")
        .orderBy(col("exact_cnt").desc, col("item"))),

    // Elementwise-sum merge ⇒ the streaming sketch must reproduce the
    // batch estimates BIT-EXACTLY for every probe item. Violations only.
    "q_stream_cms_verify" -> ((s, dir) => {
      val stream = StreamingIngest.runStreamFreqBounded(s,
        s"$dir/events.parquet", "user_id", k = 25, depth = 10, width = 2048,
        queryName = s"stream_cmsv_${streamCounter.incrementAndGet()}")
      val batch = operators.FreqSketch.topItemEstimates(
        t(s, dir, "events"), "user_id", k = 25)
      stream.withColumnRenamed("exact_cnt", "s_exact")
        .withColumnRenamed("est_cnt", "s_est")
        .join(batch, Seq("item"), "full_outer")
        .filter(col("s_exact").isNull || col("exact_cnt").isNull ||
          col("s_exact") =!= col("exact_cnt") || col("s_est") =!= col("est_cnt"))
        .select(col("item").cast("string").as("subject"),
          lit("stream_vs_batch").as("issue"))
    }),

    // JOIN-SIZE ESTIMATION from sketches (CMS/AMS inner product): the
    // optimizer's pre-join question — how big is events ⋈ events on
    // user_id? — answered from two 512 KB sketches without running the
    // join (this self-join size is also the classic AMS second moment
    // F2). Never underestimates; engine-internal → rows-only, gated by
    // the bound sibling; the exact COUNT carries the oracle.
    "q_join_size_est" -> ((s, dir) =>
      operators.FreqSketch.joinSizeEstimate(
        t(s, dir, "events"), "user_id",
        t(s, dir, "events"), "user_id", depth = 8, width = 8192)),

    "q_join_size_exact" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id").cast("long").as("__k"))
        .filter(col("__k").isNotNull)
      ev.join(ev, Seq("__k")).agg(count(lit(1)).as("true_size"))
    }),

    // Gate: est >= true always (colliding keys only add), and
    // est <= true + e·nA·nB/width (misses w.p. ~exp(−depth)).
    // Violations only; oracle = empty relation.
    "q_join_size_est_verify" -> ((s, dir) =>
      operators.FreqSketch.joinSizeViolations(
        t(s, dir, "events"), "user_id",
        t(s, dir, "events"), "user_id", depth = 8, width = 8192)),

    // Funnel: view → click → purchase per user, earliest ordered chain —
    // one key-window shuffle for all three steps (no joins/collect_list).
    "q_funnel" -> ((s, dir) => {
      val ev0 = t(s, dir, "events")
      val ev = ev0
        .select(col("user_id"), col("event_type"), EventTime.micros(ev0).as("us"))
      operators.Funnel.funnel(ev, Seq("user_id"), "us", Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")))
        .select(col("user_id"), col("t_view"), col("t_click"),
          col("t_purchase"), col("depth"))
        .orderBy(col("user_id"))
    }),

    // Pivot: event-type counts as columns per user — the explicit value
    // list keeps the output schema static (a dynamic pivot would need a
    // driver-side distinct over the pivot column at plan time).
    "q_pivot_events" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("view", "click", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("view", "click", "purchase"))
        .select(col("user_id"), col("view").cast("long").as("n_view"),
          col("click").cast("long").as("n_click"),
          col("purchase").cast("long").as("n_purchase"))
        .orderBy(col("user_id"))),

    // Benchmark decontamination: training docs sharing any 5-gram with the
    // eval slice (doc_id % 97 == 0 — deterministic, SF-independent). The
    // eval shingle set is broadcast; the corpus never shuffles on shingle.
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.Decontaminate.contaminationReport(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))
    }),

    // Sequence packing: concat-and-split at 2048 BPE-ish tokens, every doc
    // assigned the sequence of its first token + a straddle flag. The
    // global order comes from the distributed prefix sum (no one-task
    // window).
    "q_pack_sequences" -> ((s, dir) => {
      val withToks = t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("n_tok"))
      operators.Packing.packSequences(withToks, "doc_id", "n_tok",
        capacity = 2048L)
        .select(col("doc_id"), col("n_tok"), col("seq_id"), col("is_split"))
        .orderBy(col("doc_id"))
    }),

    // Repetition quality filter: fraction of tokens covered by the most
    // frequent word bigram (Gopher-style boilerplate signal).
    "q_text_repetition" -> ((s, dir) =>
      TextAnalysis.topBigramFraction(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"),
          round(col("top_bigram_frac"), 6).as("top_bigram_frac"))
        .orderBy(col("doc_id"))),

    // Data mixing: three sources at exact-binary budget shares, everything
    // else dropped. Acceptance thresholds derive from per-source token
    // totals in fixed-order IEEE double math, so the sampled set is
    // engine-reproducible (the whole point of hash-based mixing).
    "q_corpus_mix" -> ((s, dir) => {
      val withToks = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("n_tok"))
      operators.Sampling.mixByTokenBudget(withToks, "doc_id", "source",
        "n_tok", Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.125),
        totalTokenBudget = 2000L)
        .select(col("doc_id"), col("source"), col("n_tok"))
        .orderBy(col("doc_id"))
    }),
  )

  /** Double-precision cosine between two embedding columns in DuckDB list
    * math — the exact sequential-accumulation form that is bit-identical to
    * the Spark native expression (NOT list_cosine_similarity: float32). */
  /** The Hilbert xy2d ladder unrolled into generated SQL: one CTE per
    * level carrying (x, y, d), the exact mirror of
    * [[graft.operators.ZOrder.hilbertValue]]'s expression tree. */
  private val hilbertOracleSql: String = {
    val levels = (0 until 16).map { i =>
      val s = 1L << (15 - i)
      s"""h${i + 1} AS (SELECT l_orderkey, l_linenumber,
         |  CASE WHEN (y & $s) = 0 THEN
         |    CASE WHEN (x & $s) > 0 THEN ${s - 1} - y ELSE y END
         |  ELSE x END AS x,
         |  CASE WHEN (y & $s) = 0 THEN
         |    CASE WHEN (x & $s) > 0 THEN ${s - 1} - x ELSE x END
         |  ELSE y END AS y,
         |  d + ${s * s} * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
         |                     CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) AS d
         |  FROM h$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH h0 AS (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       |  l_orderkey & 65535 AS x, l_partkey & 65535 AS y, CAST(0 AS BIGINT) AS d
       |  FROM lineitem),
       |$levels
       |SELECT l_orderkey, l_linenumber, CAST(d AS BIGINT) AS hval
       |FROM h16 ORDER BY hval, l_orderkey, l_linenumber""".stripMargin
  }

  /** Brute-force entity resolution replayed in SQL — all-pairs edit
    * distance over the synthesized records, then min-label propagation
    * to a fixpoint. Shared VERBATIM by the batch query and its
    * streaming twin (stream ≡ batch exactly). */
  private val erEntitiesOracleSql: String =
    """WITH RECURSIVE recs AS (
      |  SELECT CAST(p_partkey AS BIGINT) AS rec_id, p_name AS name
      |  FROM part WHERE p_partkey < 300
      |  UNION ALL
      |  SELECT CAST(p_partkey + 100000 AS BIGINT),
      |    substr(p_name, 1, pos - 1) || '#' || substr(p_name, pos + 1)
      |  FROM (SELECT p_partkey, p_name,
      |      CASE WHEN p_partkey % 2 = 0 THEN 1 + (p_partkey % 3)
      |        ELSE length(p_name) - (p_partkey % 3) END AS pos
      |    FROM part WHERE p_partkey < 300) c),
      |pairs AS (
      |  SELECT a.rec_id AS idA, b.rec_id AS idB
      |  FROM recs a JOIN recs b ON a.rec_id < b.rec_id
      |  WHERE levenshtein(a.name, b.name) <= 1),
      |edges AS (SELECT idA AS src, idB AS dst FROM pairs
      |  UNION ALL SELECT idB AS src, idA AS dst FROM pairs),
      |cc(id, label) AS (
      |  SELECT rec_id, rec_id FROM recs
      |  UNION
      |  SELECT e.dst, cc.label FROM edges e JOIN cc ON cc.id = e.src
      |)
      |SELECT id AS rec_id, CAST(MIN(label) AS BIGINT) AS entity_id,
      |  (MIN(label) = id) AS canonical
      |FROM cc GROUP BY id ORDER BY rec_id""".stripMargin

  /** The generalize-to-k oracle, parameterized by k (base bucket 500,
    * maxLevels 20, fixed quasi = segment — the harness configuration). */
  private def kanonGeneralizeSql(k: Int): String =
    s"""WITH g0 AS (
       |  SELECT c_mktsegment, CAST(FLOOR(c_acctbal / 500) AS BIGINT) AS b0,
       |    COUNT(*) AS n
       |  FROM customer GROUP BY 1, 2),
       |lv AS (SELECT unnest(range(0, 21)) AS level),
       |sizes AS (
       |  SELECT c_mktsegment, level,
       |    CAST(FLOOR(b0 / CAST((1 << level) AS DOUBLE)) AS BIGINT) AS bucket,
       |    CAST(SUM(n) AS BIGINT) AS group_size
       |  FROM g0, lv GROUP BY 1, 2, 3),
       |chosen AS (
       |  SELECT COALESCE(MIN(level) FILTER (mn >= $k), 20) AS gen_level
       |  FROM (SELECT level, MIN(group_size) AS mn FROM sizes GROUP BY level))
       |SELECT c_mktsegment, bucket, group_size, (group_size < $k) AS suppressed,
       |  CAST(gen_level AS BIGINT) AS gen_level
       |FROM sizes JOIN chosen ON level = gen_level
       |ORDER BY c_mktsegment, bucket""".stripMargin

  private def cosineSql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |      / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |         * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin

  /** Full SQL re-derivation of the hyperplane-LSH top-k: the seed-7 gaussian
    * planes are data-INDEPENDENT constants, so the oracle embeds them as
    * literals and recomputes signature bits, band buckets, candidate join,
    * and the exact cosine rerank — an independent DuckDB implementation of
    * the whole approximate pipeline, hash-compared end-to-end. Sign bits
    * agree because the dot products are bit-identical doubles. */
  private lazy val lshTopkOracleSql: String = {
    val planes = operators.Similarity.hyperplanesFor(64)
    val bits = operators.Similarity.SignatureBits
    val bands = operators.Similarity.Bands
    val rows = bits / bands
    val mask = (1 << rows) - 1
    val sigTerms = planes.zipWithIndex.map { case (p, i) =>
      val arr = p.mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(list_zip(embedding, $arr), x -> CAST(x[1] AS DOUBLE) * x[2])) > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("\n      + ")
    s"""WITH sigs AS (
       |  SELECT vec_id, $sigTerms AS sig FROM embeddings
       |),
       |bucketed AS (
       |  SELECT vec_id, b.band, (sig >> (b.band * $rows)) & $mask AS bucket
       |  FROM sigs, (SELECT unnest(range(0, $bands)) AS band) b
       |),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM bucketed q JOIN bucketed c ON q.band = c.band AND q.bucket = c.bucket
       |  WHERE q.vec_id < 16 AND q.vec_id <> c.vec_id
       |),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    ${cosineSql("q.embedding", "c.embedding")} AS cosine
       |  FROM cand
       |  JOIN embeddings q ON q.vec_id = query_id
       |  JOIN embeddings c ON c.vec_id = neighbor_id
       |)
       |SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  // The full dedup-ladder CTE chain (stats .. cum) shared by the
  // corpus capstone and the train-prep capstone — one definition, so
  // the two oracles cannot drift. Consumers append their own final
  // SELECT (or further CTEs after a comma).
  private val corpusLadderCoreCtes: String =
    """WITH RECURSIVE
        |stats AS (SELECT doc_id, text,
        |  CASE WHEN trim(text) = '' OR text IS NULL THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
        |  FROM documents),
        |quality AS (SELECT doc_id, text FROM stats WHERE n_tokens >= 30 AND n_punct >= 0),
        |keyed AS (SELECT doc_id, text, array_to_string(list_slice(regexp_split_to_array(trim(lower(text)), '\s+'), 1, 5), ' ') AS key5 FROM quality),
        |exact AS (SELECT doc_id, text FROM (
        |  SELECT doc_id, text, ROW_NUMBER() OVER (PARTITION BY key5 ORDER BY doc_id) AS rn FROM keyed) k
        |  WHERE rn = 1),
        |toks0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS tk
        |  FROM exact),
        |grams0 AS (
        |  SELECT doc_id, tk, UNNEST(range(1, len(tk) - 4 + 2)) AS i
        |  FROM toks0 WHERE len(tk) >= 4),
        |grams AS (
        |  SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+3], ' ') AS gram FROM grams0),
        |occ AS (
        |  SELECT doc_id, pos,
        |    COUNT(*) OVER (PARTITION BY gram) AS c,
        |    MIN(doc_id * 1048576 + pos) OVER (PARTITION BY gram) AS canon
        |  FROM grams),
        |rep AS (
        |  SELECT doc_id, pos, (doc_id * 1048576 + pos = canon) AS is_canon
        |  FROM occ WHERE c >= 2),
        |wins AS (
        |  SELECT doc_id,
        |    list(struct_pack(s := pos, e := pos + 3)) FILTER (WHERE is_canon) AS can,
        |    list(struct_pack(s := pos, e := pos + 3)) FILTER (WHERE NOT is_canon) AS red
        |  FROM rep GROUP BY doc_id),
        |final AS (
        |  SELECT t.doc_id, t.tk,
        |    CASE WHEN w.red IS NULL THEN NULL
        |      ELSE list_filter(range(0, len(t.tk)), p ->
        |        NOT (len(list_filter(w.red, x -> p >= x.s AND p <= x.e)) > 0
        |             AND (w.can IS NULL OR len(list_filter(w.can, x -> p >= x.s AND p <= x.e)) = 0)))
        |      END AS kept
        |  FROM toks0 t LEFT JOIN wins w ON t.doc_id = w.doc_id),
        |cleaned AS (
        |  SELECT doc_id,
        |    CASE WHEN kept IS NULL THEN array_to_string(tk, ' ')
        |      ELSE COALESCE(array_to_string(list_transform(kept, p -> tk[p + 1]), ' '), '') END AS clean_text,
        |    CAST(CASE WHEN kept IS NULL THEN 0 ELSE len(tk) - len(kept) END AS BIGINT) AS n_removed
        |  FROM final),
        |cq AS (
        |  SELECT doc_id, clean_text, n_removed,
        |    CAST(len(regexp_extract_all(clean_text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS n_tok
        |  FROM cleaned
        |  WHERE (CASE WHEN trim(clean_text) = '' OR clean_text IS NULL THEN 0
        |         ELSE len(regexp_split_to_array(trim(clean_text), '\s+')) END) >= 30),
        |toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(clean_text)), '\s+') AS tk FROM cq),
        |sh AS (
        |  SELECT DISTINCT doc_id, list_extract(tk, i) || ' ' || list_extract(tk, i+1) || ' ' || list_extract(tk, i+2) AS s
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk)-1)) AS i) r
        |  WHERE len(tk) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(tk, ' ') AS s FROM toks WHERE len(tk) < 3
        |),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT x.doc_id AS idA, y.doc_id AS idB, count(*) AS c
        |  FROM sh x JOIN sh y USING (s) WHERE x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT idA, idB FROM common
        |  JOIN sizes na ON na.doc_id = idA
        |  JOIN sizes nb ON nb.doc_id = idB
        |  WHERE CAST(c AS DOUBLE) / (na.n_sh + nb.n_sh - c) >= 0.2),
        |edges AS (SELECT idA AS src, idB AS dst FROM pairs UNION ALL SELECT idB AS src, idA AS dst FROM pairs),
        |cc(id, label) AS (
        |  SELECT doc_id, doc_id FROM cq
        |  UNION
        |  SELECT e.dst, cc.label FROM edges e JOIN cc ON cc.id = e.src
        |),
        |fsurv AS (
        |  SELECT x.doc_id, x.n_tok, x.n_removed FROM cq x
        |  JOIN (SELECT id, MIN(label) AS lab FROM cc GROUP BY id) m
        |    ON m.id = x.doc_id AND m.lab = x.doc_id),
        |spairs AS (
        |  SELECT a.vec_id AS idA, b.vec_id AS idB
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  JOIN fsurv sa ON sa.doc_id = a.vec_id
        |  JOIN fsurv sb ON sb.doc_id = b.vec_id
        |  WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.4),
        |sedges AS (SELECT idA AS src, idB AS dst FROM spairs UNION ALL SELECT idB AS src, idA AS dst FROM spairs),
        |scc(id, label) AS (
        |  SELECT doc_id, doc_id FROM fsurv
        |  UNION
        |  SELECT e.dst, scc.label FROM sedges e JOIN scc ON scc.id = e.src
        |),
        |ssurv AS (
        |  SELECT x.doc_id, x.n_tok, x.n_removed FROM fsurv x
        |  JOIN (SELECT id, MIN(label) AS lab FROM scc GROUP BY id) m
        |    ON m.id = x.doc_id AND m.lab = x.doc_id)""".stripMargin

  private val corpusLadderCtes: String =
    corpusLadderCoreCtes + """,
        |cum AS (SELECT doc_id, n_tok, n_removed,
        |  SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM ssurv)""".stripMargin

  /** Multimodal-curation oracle: the full text ladder
    * ([[corpusLadderCoreCtes]]) + the pHash synthesis
    * ([[phashCteSql]]'s body) + the image near-dup stage over the
    * ladder's survivors (brute hamming pairs — the oracle's quadratic
    * sibling of the banded join) + the budget window over what remains.
    * `lazy`: [[phashCteSql]] is declared later in this object, and a
    * strict val here would read it as null during object init. */
  private lazy val curateMultimodalOracleSql: String =
    corpusLadderCoreCtes + ",\n" +
      phashCteSql.stripPrefix("WITH ") + """,
        |ihs AS (
        |  SELECT p.media_id AS doc_id, p.phash
        |  FROM ph p JOIN ssurv s ON s.doc_id = p.media_id),
        |ipairs AS (
        |  SELECT a.doc_id AS idA, b.doc_id AS idB FROM ihs a JOIN ihs b
        |  ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.phash, b.phash)) <= 6),
        |iedges AS (SELECT idA AS src, idB AS dst FROM ipairs
        |  UNION ALL SELECT idB, idA FROM ipairs),
        |icc(id, label) AS (
        |  SELECT doc_id, doc_id FROM ssurv
        |  UNION
        |  SELECT e.dst, icc.label FROM iedges e JOIN icc ON icc.id = e.src),
        |isurv AS (
        |  SELECT x.doc_id, x.n_tok, x.n_removed FROM ssurv x
        |  JOIN (SELECT id, MIN(label) AS lab FROM icc GROUP BY id) m2
        |    ON m2.id = x.doc_id AND m2.lab = x.doc_id),
        |icum AS (SELECT doc_id, n_tok, n_removed,
        |  SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM isurv)
        |SELECT doc_id, n_tok, n_removed FROM icum WHERE cum <= 10000
        |ORDER BY doc_id""".stripMargin

  // Shared oracle fragments: ONE definition gates every variant that
  // claims the identical contract, so copies cannot drift apart.
  private val substringSpansOracleSql: String =
    """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS tk
        |  FROM documents),
        |grams0 AS (
        |  SELECT doc_id, tk, UNNEST(range(1, len(tk) - 8 + 2)) AS i
        |  FROM toks WHERE len(tk) >= 8),
        |grams AS (
        |  SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+7], ' ') AS gram FROM grams0),
        |rep AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
        |marked AS (SELECT g.doc_id, g.pos FROM grams g JOIN rep USING (gram)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    SUM(CASE WHEN prev IS NULL OR pos > prev + 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM (SELECT doc_id, pos, LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM marked) z)
        |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS start_tok,
        |  CAST(MAX(pos) + 8 - 1 AS BIGINT) AS end_tok,
        |  CAST(MAX(pos) + 8 - MIN(pos) AS BIGINT) AS span_tokens
        |FROM isl GROUP BY doc_id, island
        |ORDER BY doc_id, start_tok""".stripMargin

  // Multinomial NB (train on doc_id%5<>0 by lang, classify the held-out
  // fifth) — shared verbatim by q_classify_nb (batch) and
  // q_stream_classify (streaming inference must converge to the batch
  // result). 6dp-round-then-decimal-sum contract throughout; the completed
  // term×label grid gives unseen-for-label tokens the Laplace-smoothed
  // mass; argmax tie-breaks on label.
  /** Shared by q_cdc_apply and q_table_asof (time travel to v1 must equal
    * replaying exactly one CDC batch): ROW_NUMBER winner per key by
    * (seq DESC, op DESC), anti-join + final non-delete rows. */
  private val cdcApplySql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders),
      |u AS (SELECT o_orderkey, o_orderpriority, o_totalprice + 5 AS o_totalprice,
      |        CAST(1 AS BIGINT) AS seq, 'U' AS op FROM base WHERE o_orderkey % 7 = 0),
      |d AS (SELECT o_orderkey, o_orderpriority, o_totalprice,
      |        CAST(2 AS BIGINT) AS seq, 'D' AS op FROM base WHERE o_orderkey % 11 = 0),
      |i AS (SELECT o_orderkey + 10000000 AS o_orderkey, o_orderpriority, o_totalprice,
      |        CAST(1 AS BIGINT) AS seq, 'I' AS op FROM base WHERE o_orderkey % 13 = 0),
      |cdc AS (SELECT * FROM u UNION ALL SELECT * FROM d UNION ALL SELECT * FROM i),
      |latest AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
      |    ORDER BY seq DESC, op DESC) AS rn FROM cdc),
      |fin AS (SELECT o_orderkey, o_orderpriority, o_totalprice, op
      |        FROM latest WHERE rn = 1)
      |SELECT b.o_orderkey, b.o_orderpriority, b.o_totalprice FROM base b
      |WHERE NOT EXISTS (SELECT 1 FROM fin f WHERE f.o_orderkey = b.o_orderkey)
      |UNION ALL
      |SELECT o_orderkey, o_orderpriority, o_totalprice FROM fin WHERE op <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  /** Oracle for q_incr_agg: the FULL recompute of the post-CDC table —
    * the touched-group refresh must be indistinguishable from it. */
  private val incrAggSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
      |u AS (SELECT o_orderkey, o_custkey, o_totalprice + 5 AS o_totalprice,
      |        CAST(1 AS BIGINT) AS seq, 'U' AS op FROM base WHERE o_orderkey % 49 = 0),
      |d AS (SELECT o_orderkey, o_custkey, o_totalprice,
      |        CAST(2 AS BIGINT) AS seq, 'D' AS op FROM base WHERE o_orderkey % 121 = 0),
      |i AS (SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, o_totalprice,
      |        CAST(1 AS BIGINT) AS seq, 'I' AS op FROM base WHERE o_orderkey % 169 = 0),
      |cdc AS (SELECT * FROM u UNION ALL SELECT * FROM d UNION ALL SELECT * FROM i),
      |latest AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
      |    ORDER BY seq DESC, op DESC) AS rn FROM cdc),
      |fin AS (SELECT o_orderkey, o_custkey, o_totalprice, op
      |        FROM latest WHERE rn = 1),
      |after AS (
      |  SELECT b.o_orderkey, b.o_custkey, b.o_totalprice FROM base b
      |  WHERE NOT EXISTS (SELECT 1 FROM fin f WHERE f.o_orderkey = b.o_orderkey)
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM fin WHERE op <> 'D')
      |SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS total_units
      |FROM after GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Shared by q_rate_anomalies and its streaming twin: exact integer
    * counts make the two engines' flagged sets bit-identical. */
  private val rateAnomalySql: String =
    """WITH c AS (
      |  SELECT CAST(event_type AS VARCHAR) AS key,
      |    epoch_us(ts) // 3600000000 AS bucket, CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT min(bucket) AS mn, max(bucket) AS mx FROM c),
      |grid AS (
      |  SELECT k.key, g.bucket
      |  FROM (SELECT DISTINCT key FROM c) k, span,
      |    LATERAL (SELECT unnest(range(span.mn, span.mx + 1)) AS bucket) g),
      |f AS (
      |  SELECT grid.key, grid.bucket, COALESCE(c.cnt, 0) AS cnt
      |  FROM grid LEFT JOIN c ON c.key = grid.key AND c.bucket = grid.bucket),
      |r AS (
      |  SELECT key, bucket, cnt,
      |    SUM(cnt) OVER win AS trail_sum,
      |    SUM(cnt * cnt) OVER win AS trail_sumsq,
      |    COUNT(*) OVER win AS np
      |  FROM f WINDOW win AS (PARTITION BY key ORDER BY bucket
      |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT key, bucket, cnt, CAST(trail_sum AS BIGINT) AS trail_sum,
      |  CAST(trail_sumsq AS BIGINT) AS trail_sumsq
      |FROM r
      |WHERE np = 24
      |  AND (24 * cnt - trail_sum) * (24 * cnt - trail_sum)
      |      > 9 * (24 * trail_sumsq - trail_sum * trail_sum)
      |ORDER BY key, bucket""".stripMargin

  /** DSIR per-doc importance weights (shared verbatim by the batch entry
    * and its streaming twin — bucket counts are multiset functions, so
    * stream ≡ batch exactly). */
  private val dsirWeightsOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                t -> t <> '') AS tk
      |  FROM documents),
      |feats AS (
      |  SELECT doc_id, lang, t.f AS feat FROM toks, UNNEST(tk) AS t(f)
      |  UNION ALL
      |  SELECT doc_id, lang, list_extract(tk, i) || ' ' || list_extract(tk, i + 1) AS feat
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
      |  WHERE len(tk) >= 2),
      |fb AS (
      |  SELECT doc_id, lang,
      |    CAST(('0x' || substr(md5(feat), 1, 8)) AS BIGINT) % 4096 AS bucket
      |  FROM feats),
      |ct AS (SELECT bucket, COUNT(*) AS ct FROM fb WHERE lang = 'en' GROUP BY 1),
      |cr AS (SELECT bucket, COUNT(*) AS cr FROM fb WHERE lang <> 'en' GROUP BY 1),
      |nt AS (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) AS nt FROM ct),
      |nr AS (SELECT CAST(COALESCE(SUM(cr), 0) AS BIGINT) AS nr FROM cr),
      |lr AS (
      |  SELECT cr.bucket,
      |    CAST(ROUND(LN((CAST(COALESCE(ct.ct, 0) AS DOUBLE) + 1)
      |                  / (CAST(nt.nt AS DOUBLE) + 4096)), 6) AS DECIMAL(18,6))
      |    - CAST(ROUND(LN((CAST(cr.cr AS DOUBLE) + 1)
      |                  / (CAST(nr.nr AS DOUBLE) + 4096)), 6) AS DECIMAL(18,6)) AS lr
      |  FROM cr LEFT JOIN ct USING (bucket) CROSS JOIN nt CROSS JOIN nr),
      |pd AS (
      |  SELECT fb.doc_id, COUNT(*) AS n_feat, SUM(lr.lr) AS slw
      |  FROM fb JOIN lr USING (bucket) WHERE fb.lang <> 'en' GROUP BY 1)
      |SELECT d.doc_id, COALESCE(pd.n_feat, 0) AS n_feat,
      |  CAST(pd.slw AS DOUBLE) AS logw
      |FROM documents d LEFT JOIN pd USING (doc_id)
      |WHERE d.lang <> 'en'
      |ORDER BY d.doc_id""".stripMargin

  private val nbOracleSql: String =
    """WITH trtok AS (
      |  SELECT lang AS label, t.term FROM documents,
      |    UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS t(term)
      |  WHERE doc_id % 5 <> 0 AND t.term <> ''),
      |counts AS (SELECT label, term, COUNT(*) AS c FROM trtok GROUP BY 1, 2),
      |ltot AS (SELECT label, SUM(c) AS n_l FROM counts GROUP BY 1),
      |v AS (SELECT COUNT(DISTINCT term) AS v FROM counts),
      |grid AS (SELECT t.term, l.label, l.n_l
      |         FROM (SELECT DISTINCT term FROM counts) t CROSS JOIN ltot l),
      |lp AS (
      |  SELECT g.term, g.label,
      |    CAST(ROUND(LN((COALESCE(c.c, 0) + 1.0) / (CAST(g.n_l AS DOUBLE) + v.v)), 6)
      |      AS DECIMAL(18,6)) AS lp
      |  FROM grid g CROSS JOIN v
      |  LEFT JOIN counts c ON c.term = g.term AND c.label = g.label),
      |ndocs AS (SELECT COUNT(*) AS n FROM documents WHERE doc_id % 5 <> 0),
      |prior AS (
      |  SELECT lang AS label,
      |    CAST(ROUND(LN(CAST(COUNT(*) AS DOUBLE) / n.n), 6) AS DECIMAL(18,6)) AS prior_lp
      |  FROM documents, ndocs n WHERE doc_id % 5 <> 0 GROUP BY lang, n.n),
      |sctok AS (
      |  SELECT doc_id, t.term FROM documents,
      |    UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS t(term)
      |  WHERE doc_id % 5 = 0 AND t.term <> ''),
      |perlab AS (
      |  SELECT doc_id, label, SUM(lp) AS slp, COUNT(*) AS n_in_vocab
      |  FROM sctok JOIN lp USING (term) GROUP BY 1, 2),
      |scored AS (
      |  SELECT a.doc_id, a.label,
      |    a.prior_lp + COALESCE(pl.slp, CAST(0 AS DECIMAL(18,6))) AS score,
      |    COALESCE(pl.n_in_vocab, 0) AS n_in_vocab
      |  FROM (SELECT d.doc_id, p.label, p.prior_lp
      |        FROM documents d CROSS JOIN prior p WHERE d.doc_id % 5 = 0) a
      |  LEFT JOIN perlab pl ON a.doc_id = pl.doc_id AND a.label = pl.label)
      |SELECT doc_id, label AS predicted, CAST(score AS DOUBLE) AS score, n_in_vocab
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |        ORDER BY score DESC, label) AS rn FROM scored) z
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  private val multimodalFeaturesSql: String =
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 13 ELSE 44 END + doc_id % 100 AS BIGINT) AS n_bytes,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 64 + doc_id % 512 WHEN 1 THEN 32 + doc_id % 256 ELSE 8000 + (doc_id % 8) * 1000 END AS BIGINT) AS width,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 64 + (doc_id * 31) % 512 WHEN 1 THEN 32 + (doc_id * 7) % 256 ELSE 16 END AS BIGINT) AS height,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN 3 ELSE 1 + doc_id % 2 END AS BIGINT) AS channels,
      |  CAST(LEAST(8, (CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 13 ELSE 44 END + doc_id % 100) // 100 + 1) AS BIGINT) AS n_frames
      |FROM documents ORDER BY media_id""".stripMargin

  /** Expected extraction of the synthetic crawl page — shared verbatim by
    * the batch (q_text_extract) and streaming (q_stream_text_extract)
    * paths: extraction is a pure per-row function, so stream ≡ batch. */
  private val textExtractOracleSql: String =
    """SELECT doc_id,
      |  'Corpus document from the synthetic crawl corpus' || chr(10) ||
      |  text || chr(10) || upper(text) AS extracted
      |FROM documents ORDER BY doc_id""".stripMargin

  /** The synthetic crawl page rebuilt in SQL — must mirror
    * [[operators.TextExtract.syntheticHtml]] byte for byte, because the
    * WARC oracles check the archive framing ARITHMETIC (Content-Length
    * headers, payload/body octet counts) against this template's octet
    * lengths. Emits (doc_id, html, uri); `uri` is the WARC fixture's
    * target-URI rule. */
  /** The page template as a SQL EXPRESSION over caller-chosen id/text —
    * shared by [[warcPageSql]] and the crawl-loop oracle, which renders
    * frontier targets under their host page's text. */
  private def warcHtmlSqlExpr(idExpr: String, textExpr: String): String =
    s"""'<!doctype html>' || chr(10) || '<html>' || chr(10) || '<head>' || chr(10) ||
      |    '<title>Doc ' || CAST($idExpr AS VARCHAR) || '</title>' || chr(10) ||
      |    '<style>p { color: #222; }</style>' || chr(10) || '</head>' || chr(10) ||
      |    '<body>' || chr(10) ||
      |    '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>' || chr(10) ||
      |    '<h1>Corpus document from the synthetic crawl corpus</h1>' || chr(10) ||
      |    '<p>' || replace(replace(replace($textExpr, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') || '</p>' || chr(10) ||
      |    '<div class="ads"><a href="/buy">Buy now</a> <a href="/sale">Sale</a></div>' || chr(10) ||
      |    '<blockquote>' || replace(replace(replace(upper($textExpr), '&', '&amp;'), '<', '&lt;'), '>', '&gt;') || '</blockquote>' || chr(10) ||
      |    '<script>var t = "track";</script>' || chr(10) ||
      |    '<footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a> &#169; 2026 Example Corp</footer>' || chr(10) ||
      |    '</body>' || chr(10) || '</html>' || chr(10)""".stripMargin

  private lazy val warcPageSql: String =
    s"""SELECT doc_id,
      |    ${warcHtmlSqlExpr("doc_id", "text")} AS html,
      |    'https://www.' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR) AS uri
      |  FROM documents""".stripMargin

  /** Charset-fixture oracle: sniffed charset name and extracted text
    * (h1 + the marker-suffixed paragraph) reconstructed from the
    * documents table and the [[CharsetModes]] rotation — both CASE
    * ladders are generated from the same Scala constant the fixture UDF
    * encodes with, so a decode under the wrong charset cannot match. */
  private lazy val warcCharsetOracleSql: String = {
    val csCase = CharsetModes.zipWithIndex
      .map { case ((cs, _), i) => s"WHEN $i THEN '$cs'" }.mkString(" ")
    val mkCase = CharsetModes.zipWithIndex
      .map { case ((_, mk), i) => s"WHEN $i THEN '$mk'" }.mkString(" ")
    s"""SELECT doc_id,
       |  CASE doc_id % 6 $csCase END AS charset,
       |  'Charset probe document about encodings' || chr(10) ||
       |    text || ' ' || CASE doc_id % 6 $mkCase END AS extracted
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Unigram-tokenizer oracle, shared verbatim by q_unigram_tokenize and
    * the persistence twin: the frozen (piece → cost_milli) vocabulary is
    * LITERALIZED into a DuckDB MAP (the frozen-BPE-merges idiom), the
    * Viterbi DP runs forward over DISTINCT words as a recursive CTE
    * (struct-min of ('c', 'nl' = −L) = min cost then longest piece — the
    * exact Scala tie-break), a second recursion walks the backpointers to
    * reconstruct pieces, and segmentations join back to word instances. */
  private lazy val unigramOracleSql: String =
    unigramSqlWith(
      """SELECT words.doc_id, words.widx, CAST(j - 1 AS BIGINT) AS pidx, seg.pieces[j] AS piece,
        |  coalesce(vocab.m[seg.pieces[j]][1], CAST(20000 AS BIGINT)) AS score_milli
        |FROM words JOIN seg USING (w) CROSS JOIN vocab,
        |     LATERAL (SELECT unnest(range(1, len(seg.pieces) + 1)) AS j) r
        |ORDER BY doc_id, widx, pidx""".stripMargin)

  /** The unigram Viterbi machinery (words / vocab / vit / recon / seg
    * CTEs) with a caller-chosen final SELECT — the token stream and the
    * per-document LM-cost rollup share it. */
  private def unigramSqlWith(finalSelect: String): String = {
    val m = operators.UnigramTokenizer.frozenVocab
      .map { case (p, c) => s"'$p': $c" }.mkString("MAP {", ", ", "}")
    s"""WITH RECURSIVE words AS (
      |  SELECT doc_id, i - 1 AS widx, lst[i] AS w
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS lst FROM documents),
      |       LATERAL (SELECT unnest(range(1, len(lst) + 1)) AS i) r),
      |vocab AS (SELECT $m AS m),
      |dw AS (SELECT DISTINCT w FROM words),
      |vit AS (
      |  SELECT w, 0 AS i, CAST([0] AS BIGINT[]) AS best, CAST([] AS BIGINT[]) AS bp FROM dw
      |  UNION ALL
      |  SELECT w, i + 1, list_append(best, ch.c), list_append(bp, ch.l)
      |  FROM (
      |    SELECT v.w, v.i, v.best, v.bp, list_min(list_append(
      |      [{'c': v.best[v.i - L + 2] + vocab.m[substr(v.w, CAST(v.i - L + 2 AS INTEGER), CAST(L AS INTEGER))][1],
      |        'nl': -L, 'l': L}
      |       for L in range(2, least(6, v.i + 1) + 1)
      |       if len(vocab.m[substr(v.w, CAST(v.i - L + 2 AS INTEGER), CAST(L AS INTEGER))]) > 0],
      |      {'c': v.best[v.i + 1] + coalesce(vocab.m[substr(v.w, CAST(v.i + 1 AS INTEGER), 1)][1],
      |         CAST(${operators.UnigramTokenizer.UnknownCostMilli} AS BIGINT)),
      |       'nl': CAST(-1 AS BIGINT), 'l': CAST(1 AS BIGINT)})) AS ch
      |    FROM vit v CROSS JOIN vocab WHERE v.i < len(v.w)) s),
      |recon AS (
      |  SELECT w, bp, CAST(len(w) AS BIGINT) AS i, CAST([] AS VARCHAR[]) AS pieces
      |  FROM vit WHERE i = len(w)
      |  UNION ALL
      |  SELECT w, bp, i - bp[i],
      |    list_prepend(substr(w, CAST(i - bp[i] + 1 AS INTEGER), CAST(bp[i] AS INTEGER)), pieces)
      |  FROM recon WHERE i > 0),
      |seg AS (SELECT w, pieces FROM recon WHERE i = 0)
      |""".stripMargin + finalSelect
  }

  /** PNG pixel-decode oracle — the plane checksums recomputed from the
    * pixel formulas alone; shared verbatim by the direct decode
    * (q_image_decode) and the decode-out-of-the-WARC chain
    * (q_warc_image_decode), because binary payloads round-trip the
    * archive byte-exact. */
  private val imageDecodeOracleSql: String =
    """WITH m AS (
      |  SELECT doc_id, 16 + doc_id % 17 AS w, 16 + (doc_id * 3) % 13 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, i,
      |    CASE doc_id % 4
      |      WHEN 0 THEN (doc_id * 7 + i * 13) % 251
      |      WHEN 3 THEN (77 * ((doc_id + 3 * i) % 256)
      |        + 150 * (((doc_id + 3 * i) % 256) * 7 % 256)
      |        + 29 * (((doc_id + 3 * i) % 256) * 13 % 256)) // 256
      |      ELSE (77 * ((doc_id + 2 * i) % 256)
      |        + 150 * ((doc_id * 3 + 5 * i) % 256)
      |        + 29 * ((doc_id * 5 + 7 * i) % 256)) // 256
      |    END AS lum
      |  FROM m, LATERAL (SELECT unnest(range(0, w * h)) AS i) r)
      |SELECT CAST(doc_id AS BIGINT) AS media_id,
      |  CAST(MAX(w) AS BIGINT) AS width, CAST(MAX(h) AS BIGINT) AS height,
      |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
      |  CAST(SUM(lum) AS BIGINT) AS lum_sum,
      |  CAST(SUM(lum * (i % 97 + 1)) AS BIGINT) AS lum_wsum
      |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin

  /** Anchor-aggregation oracle — shared verbatim by the batch query and
    * its streaming twin (anchor stats are pure aggregates of the link
    * set, so arrival order cannot matter). */
  private val anchorOracleSql: String =
    """WITH n AS (SELECT count(*) AS n FROM documents),
      |links AS (
      |  SELECT doc_id AS src,
      |    array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS anchor,
      |    (doc_id * 7 + j * 11) % n.n AS dst
      |  FROM documents, n, (SELECT unnest([0, 1, 2]) AS j)
      |  WHERE (doc_id * 7 + j * 11) % n.n <> doc_id),
      |freqs AS (
      |  SELECT dst, anchor, CAST(count(*) AS BIGINT) AS freq,
      |    CAST(count(DISTINCT src) AS BIGINT) AS n_srcs
      |  FROM links GROUP BY dst, anchor),
      |ranked AS (
      |  SELECT dst, anchor, freq, n_srcs,
      |    CAST(row_number() OVER (PARTITION BY dst
      |      ORDER BY freq DESC, anchor ASC) AS BIGINT) AS rank,
      |    CAST(sum(freq) OVER (PARTITION BY dst) AS BIGINT) AS n_inlinks
      |  FROM freqs)
      |SELECT dst, rank, anchor, freq, n_srcs, n_inlinks
      |FROM ranked WHERE rank <= 2
      |ORDER BY dst, rank""".stripMargin

  /** Dirty-JSONL oracle — shared verbatim by the batch read
    * (q_jsonl_source) and its streaming twin: clean rows parse to their
    * fields; the deterministically truncated lines come back all-NULL
    * with the exact truncated raw string. */
  private val jsonlSourceOracleSql: String =
    """WITH lines AS (
      |  SELECT doc_id AS rec_id, lang, n_chars,
      |    '{"doc_id":' || doc_id || ',"lang":"' || lang || '","n_chars":' ||
      |      n_chars || '}' AS full_line,
      |    doc_id % 50 = 13 AS corrupt
      |  FROM documents)
      |SELECT rec_id,
      |  CASE WHEN corrupt THEN NULL ELSE rec_id END AS doc_id,
      |  CASE WHEN corrupt THEN NULL ELSE lang END AS lang,
      |  CASE WHEN corrupt THEN NULL ELSE n_chars END AS n_chars,
      |  corrupt AS is_corrupt,
      |  CASE WHEN corrupt
      |    THEN substring(full_line, 1, length(full_line) - 8) END AS raw
      |FROM lines ORDER BY rec_id""".stripMargin

  /** feed-seeds oracle — shared verbatim by the batch discovery query
    * (q_feed_seeds) and its bounded streaming twin (q_stream_seeds):
    * the per-batch anti-join is stream-static and the seed rank is a
    * pure window over the accumulated survivors, so arrival order
    * cannot matter. */
  private val feedSeedsOracleSql: String =
    """WITH src AS (
      |  SELECT DISTINCT source, source || '.example.com' AS domain,
      |    CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 25 AS k
      |  FROM documents),
      |ent AS (
      |  SELECT s.source, s.domain,
      |    CASE WHEN s.k % 2 = 0 THEN 'rss' ELSE 'atom' END AS feed_kind,
      |    'https://www.' || s.domain || '/docs/' ||
      |      CAST((s.k + ii.i) % 25 AS VARCHAR) AS loc,
      |    CAST('2026-03-' ||
      |      lpad(CAST((s.k + ii.i) % 28 + 1 AS VARCHAR), 2, '0') AS DATE)
      |      AS lastmod
      |  FROM src s CROSS JOIN (SELECT unnest(range(6)) AS i) ii),
      |crawled AS (
      |  SELECT DISTINCT 'https://www.' || source || '.example.com/docs/' ||
      |    CAST(doc_id % 25 AS VARCHAR) AS loc
      |  FROM documents),
      |seeds AS (
      |  SELECT e.domain, e.feed_kind, e.loc, e.lastmod FROM ent e
      |  LEFT JOIN crawled c ON c.loc = e.loc WHERE c.loc IS NULL)
      |SELECT domain, feed_kind, loc, lastmod,
      |  CAST(row_number() OVER (PARTITION BY domain
      |    ORDER BY lastmod DESC, loc ASC) AS BIGINT) AS seed_rank
      |FROM seeds ORDER BY domain, seed_rank""".stripMargin

  /** robots-gate oracle — shared verbatim by the batch gate
    * (q_robots_gate) and its bounded streaming twin: the graftbot
    * group's rules rebuilt from the template, longest-prefix/Allow-tie
    * winner via lexicographic struct-max per URL. */
  private val robotsGateOracleSql: String =
    """WITH src AS (
      |  SELECT DISTINCT source, source || '.example.com' AS domain,
      |    CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 25 AS k
      |  FROM documents),
      |rules AS (
      |  SELECT domain, r.rtype, replace(r.value, '<K>', CAST(k AS VARCHAR)) AS rule_path
      |  FROM src, UNNEST([
      |    {'rtype': 'allow', 'value': '/docs/'},
      |    {'rtype': 'disallow', 'value': '/docs/<K>/'},
      |    {'rtype': 'disallow', 'value': '/tmp/'}
      |  ]) AS t(r)
      |  UNION ALL
      |  SELECT domain, 'disallow', '/' FROM src WHERE k % 5 = 0),
      |urls AS (
      |  SELECT doc_id,
      |    'https://www.' || source || '.example.com/docs/' ||
      |      CAST(doc_id % 25 AS VARCHAR) || '/?utm_source=' || lang AS url,
      |    source || '.example.com' AS domain,
      |    '/docs/' || CAST(doc_id % 25 AS VARCHAR) || '/?utm_source=' || lang AS path
      |  FROM documents
      |  UNION ALL
      |  SELECT -1 - CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT),
      |    'https://www.' || source || '.example.com', domain, '/'
      |  FROM src),
      |won AS (
      |  SELECT u.doc_id, u.url, u.domain, u.path,
      |    max(CASE WHEN starts_with(u.path, r.rule_path) THEN
      |      {'l': strlen(r.rule_path), 'a': CASE WHEN r.rtype = 'allow' THEN 1 ELSE 0 END,
      |       'p': r.rule_path, 't': r.rtype} END) AS win
      |  FROM urls u LEFT JOIN rules r USING (domain)
      |  GROUP BY u.doc_id, u.url, u.domain, u.path)
      |SELECT doc_id, url, domain, path,
      |  coalesce(win.t <> 'disallow', TRUE) AS allowed,
      |  win.p AS matched_path,
      |  CASE WHEN win IS NOT NULL THEN win.t = 'allow' END AS matched_allow
      |FROM won ORDER BY doc_id""".stripMargin

  /** WARC record-table oracle — shared verbatim by the one-shot read
    * (q_warc_records) and the two-wave manifest-driven incremental
    * ingest (q_warc_incremental): every WARC/HTTP framing field is
    * recomputed from the page template's octet arithmetic. */
  private lazy val warcRecordsOracleSql: String =
    s"""WITH page AS ($warcPageSql),
      |resp AS (
      |  SELECT doc_id AS rec_key, 'response' AS warc_type, uri AS target_uri,
      |    CAST(strlen('HTTP/1.1 200 OK') + 2
      |      + strlen('Content-Type: text/html; charset=utf-8') + 2
      |      + strlen('Content-Length: ' || CAST(strlen(html) AS VARCHAR)) + 2
      |      + 2 + strlen(html) AS BIGINT) AS content_length,
      |    CAST(200 AS BIGINT) AS http_status,
      |    'text/html; charset=utf-8' AS http_content_type,
      |    CAST(strlen(html) AS BIGINT) AS body_octets
      |  FROM page),
      |info AS (
      |  SELECT CAST(-(b + 1) AS BIGINT) AS rec_key, 'warcinfo' AS warc_type,
      |    CAST(NULL AS VARCHAR) AS target_uri,
      |    CAST(strlen('software: graft-warc/1.0') + 2
      |      + strlen('bucket: ' || CAST(b AS VARCHAR)) + 2 AS BIGINT) AS content_length,
      |    CAST(NULL AS BIGINT) AS http_status,
      |    CAST(NULL AS VARCHAR) AS http_content_type,
      |    CAST(strlen('software: graft-warc/1.0') + 2
      |      + strlen('bucket: ' || CAST(b AS VARCHAR)) + 2 AS BIGINT) AS body_octets
      |  FROM (SELECT unnest(range(4)) AS b))
      |SELECT * FROM info UNION ALL SELECT * FROM resp
      |ORDER BY rec_key""".stripMargin

  /** Delta-touching ngram-jaccard pair slice — shared verbatim by the
    * in-memory incremental path (q_dedup_incremental) and the
    * persisted-index twin (q_dedup_incremental_indexed). */
  private val incrementalNgramOracleSql: String =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, list_extract(tk, i) || ' ' || list_extract(tk, i+1) || ' ' || list_extract(tk, i+2) AS s
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk)-1)) AS i) r
      |  WHERE len(tk) >= 3
      |  UNION
      |  SELECT DISTINCT doc_id, array_to_string(tk, ' ') AS s FROM toks WHERE len(tk) < 3
      |),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |common AS (
      |  SELECT x.doc_id AS idA, y.doc_id AS idB, count(*) AS c
      |  FROM sh x JOIN sh y USING (s) WHERE x.doc_id < y.doc_id
      |  GROUP BY 1, 2)
      |SELECT idA, idB, ROUND(CAST(c AS DOUBLE) / (na.n_sh + nb.n_sh - c), 6) AS jaccard
      |FROM common
      |JOIN sizes na ON na.doc_id = idA
      |JOIN sizes nb ON nb.doc_id = idB
      |WHERE CAST(c AS DOUBLE) / (na.n_sh + nb.n_sh - c) >= 0.2
      |  AND (idA % 10 = 9 OR idB % 10 = 9)
      |ORDER BY idA, idB""".stripMargin

  private val trigramLpSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                             t -> t <> '') AS tk
      |  FROM documents),
      |tg AS (
      |  SELECT doc_id, list_extract(tk, i) AS w1, list_extract(tk, i + 1) AS w2,
      |         list_extract(tk, i + 2) AS w3
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk) - 1)) AS i) r
      |  WHERE len(tk) >= 3),
      |bg AS (
      |  SELECT list_extract(tk, i) AS a, list_extract(tk, i + 1) AS b
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
      |  WHERE len(tk) >= 2),
      |un AS (SELECT t.term FROM toks, UNNEST(tk) AS t(term)),
      |c3 AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM tg GROUP BY 1, 2, 3),
      |c12 AS (SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c12 FROM c3 GROUP BY 1, 2),
      |c2 AS (SELECT a, b, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
      |c1h AS (SELECT a, CAST(SUM(c2) AS BIGINT) AS c1h FROM c2 GROUP BY 1),
      |c1 AS (SELECT term, COUNT(*) AS c FROM un GROUP BY 1),
      |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c1),
      |lp AS (
      |  SELECT tg.doc_id,
      |    CAST(ROUND(LN((70 * (CAST(c3.c3 AS DOUBLE) / CAST(c12.c12 AS DOUBLE))
      |                 + 20 * (CAST(c2.c2 AS DOUBLE) / CAST(c1h.c1h AS DOUBLE))
      |                 + 10 * (CAST(c1.c AS DOUBLE) / CAST(n.n AS DOUBLE))) / 100), 6)
      |      AS DECIMAL(18,6)) AS lp
      |  FROM tg
      |  JOIN c3 USING (w1, w2, w3)
      |  JOIN c12 USING (w1, w2)
      |  JOIN c2 ON c2.a = tg.w2 AND c2.b = tg.w3
      |  JOIN c1h ON c1h.a = tg.w2
      |  JOIN c1 ON c1.term = tg.w3
      |  CROSS JOIN n),
      |pd AS (SELECT doc_id, COUNT(*) AS n_trigrams, SUM(lp) AS slp
      |       FROM lp GROUP BY 1)
      |SELECT d.doc_id, COALESCE(pd.n_trigrams, 0) AS n_trigrams,
      |  CAST(pd.slp AS DOUBLE) / CAST(pd.n_trigrams AS DOUBLE) AS avg_lp3
      |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** The frozen-BPE oracle: a recursive CTE applying the LITERAL
    * [[operators.BpeTokenizer.frozenMerges]] table (interpolated here, so
    * the two engines share one source of truth) in rank order, each rank
    * replaced to fixpoint. See the q_bpe_tokenize oracle comment. */
  private def bpeFrozenSql: String = {
    // SQL-escape merge symbols (doubled single quote) so a future seed
    // vocabulary containing an apostrophe still literalizes correctly.
    def q(s: String): String = s.replace("'", "''")
    val vals = operators.BpeTokenizer.frozenMerges.zipWithIndex
      .map { case ((x, y), r) => s"($r, '${q(x)}', '${q(y)}')" }.mkString(", ")
    val maxRank = operators.BpeTokenizer.frozenMerges.size
    s"""WITH RECURSIVE
       |mg(r, x, y) AS (SELECT * FROM (VALUES $vals) v(r, x, y)),
       |toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |                             t -> t <> '') AS tk
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, i AS wpos, list_extract(tk, i) AS word
       |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) r),
       |dw AS (SELECT DISTINCT word FROM w),
       |enc AS (
       |  SELECT word,
       |    chr(1) || array_to_string(list_transform(range(1, length(word) + 1),
       |      i -> substring(word, i, 1) ||
       |        CASE WHEN i = length(word) THEN '</w>' ELSE '' END), chr(1))
       |      || chr(1) AS seq,
       |    0 AS r
       |  FROM dw
       |  UNION ALL
       |  SELECT word,
       |    CASE WHEN np <> seq THEN np ELSE seq END,
       |    CASE WHEN np <> seq THEN r ELSE r + 1 END
       |  FROM (
       |    SELECT e.word, e.seq, e.r,
       |      replace(replace(e.seq,
       |        chr(1) || m.x || chr(1) || m.y || chr(1),
       |        chr(1) || m.x || m.y || chr(2)), chr(2), chr(1)) AS np
       |    FROM enc e JOIN mg m ON m.r = e.r) s),
       |tok AS (
       |  SELECT word, list_filter(string_split(seq, chr(1)), t -> t <> '') AS toks
       |  FROM enc WHERE r = $maxRank),
       |wt AS (
       |  SELECT doc_id, wpos, toks, len(toks) AS n,
       |    SUM(len(toks)) OVER (PARTITION BY doc_id ORDER BY wpos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off
       |  FROM w JOIN tok USING (word))
       |SELECT doc_id, CAST(COALESCE(off, 0) + i - 1 AS BIGINT) AS pos,
       |  list_extract(toks, i) AS token
       |FROM wt, LATERAL (SELECT unnest(range(1, n + 1)) AS i) r
       |ORDER BY doc_id, pos""".stripMargin
  }

  private val phashCteSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE doc_id % 3 WHEN 0 THEN 64 + doc_id % 512 WHEN 1 THEN 32 + doc_id % 256 ELSE 8000 + (doc_id % 8) * 1000 END AS w,
      |    CASE doc_id % 3 WHEN 0 THEN 64 + (doc_id * 31) % 512 WHEN 1 THEN 32 + (doc_id * 7) % 256 ELSE 16 END AS h,
      |    doc_id % 100 AS blen
      |  FROM documents),
      |ph AS (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN blen = 0 THEN 0
      |    ELSE CAST(list_sum(flatten(list_transform(range(0, 7), gy ->
      |      list_transform(range(0, 9), gx ->
      |        CASE WHEN
      |          (doc_id * 7 + ((((gy * h) // 7) * w + ((gx + 1) * w) // 10) % blen) * 13) % 251
      |          > (doc_id * 7 + ((((gy * h) // 7) * w + (gx * w) // 10) % blen) * 13) % 251
      |        THEN (CAST(1 AS BIGINT) << (gy * 9 + gx)) ELSE 0 END)))) AS BIGINT)
      |    END AS phash
      |  FROM m)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_w1_latest_order" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) t WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q_a1_distinct" ->
      "SELECT DISTINCT o_orderstatus AS status FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderstatus <> '' ORDER BY status",

    "q_u1_union_by_name" ->
      """SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 1
        |ORDER BY c_custkey""".stripMargin,

    "q_p3_coalesce" ->
      "SELECT c_custkey, COALESCE(NULLIF(c_mktsegment, 'BUILDING'), c_name) AS resolved FROM customer ORDER BY c_custkey",

    "q_p6_validity_filter" ->
      "SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE NULLIF(o_orderstatus, 'O') IS NOT NULL AND o_orderpriority IS NOT NULL AND o_orderpriority <> '' ORDER BY o_orderkey",

    "q_e1_date_roundtrip" ->
      "SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d_slash, CAST(o_orderdate AS DATE) AS d_dash, CAST(o_orderdate AS DATE) AS d_compact FROM orders ORDER BY o_orderkey",

    "q_e2_validation_split" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN 'Invalid month: 13 (must be between 1 and 12)' END AS validation_error,
        |  CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE CAST(o_orderdate AS DATE) END AS parsed
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_e4_e5_derived" ->
      """SELECT o_orderkey,
        |  CAST(year(DATE '1998-12-01') - year(o_orderdate) AS BIGINT) AS age_years,
        |  CASE WHEN date_diff('day', CASE WHEN o_orderstatus = 'O' THEN NULL ELSE CAST(o_orderdate AS DATE) END, DATE '1998-12-01') > 30 THEN TRUE ELSE FALSE END AS stale
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_nation_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_agg_percentiles" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.95) AS p95,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_view_flagship" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, n_name,
        |  CAST(year(DATE '1998-12-01') - year(o_orderdate) AS BIGINT) AS age_years,
        |  CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') > 30 THEN TRUE ELSE FALSE END AS stale
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) o
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE rn = 1 AND n_name = 'NATION_3' ORDER BY o_custkey""".stripMargin,

    "q_dedup_exact" ->
      """SELECT key5, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups FROM (
        |  SELECT doc_id, array_to_string(list_slice(regexp_split_to_array(trim(lower(text)), '\s+'), 1, 5), ' ') AS key5
        |  FROM documents) t
        |GROUP BY key5 ORDER BY key5""".stripMargin,

    // Same pseudo-URL derivation as the Spark side; the normalizer chain
    // (strip scheme+www, strip query/fragment, strip trailing slashes)
    // mirrors Dedup.normalizeUrl pattern for pattern — each regex matches
    // at most once even across newlines ((?s) dot-all + \z end-of-input),
    // so DuckDB's first-match regexp_replace and Spark's replace-all
    // agree on all inputs. md5() is lowercase hex in both engines.
    "q_dedup_url" ->
      """WITH docs AS (
        |  SELECT doc_id, text,
        |    'https://www.' || source || '.example.com/docs/' || CAST(doc_id % 25 AS VARCHAR) || '/?utm_source=' || lang AS url
        |  FROM documents),
        |norm AS (
        |  SELECT doc_id, md5(text) AS content_md5,
        |    regexp_replace(regexp_replace(regexp_replace(lower(trim(url)),
        |      '^https?://(www\.)?', ''), '(?s)[?#].*', ''), '/+\z', '') AS url_key
        |  FROM docs)
        |SELECT url_key, content_md5, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM norm GROUP BY url_key, content_md5
        |ORDER BY url_key, content_md5""".stripMargin,

    // Collapse-by-construction oracle: the engine canonicalizes eight
    // messy spellings per doc back to one key; the oracle just GROUPs
    // the clean (source, slot, md5) key the mess was generated FROM —
    // never re-implementing RFC 3986 — so any spelling that fails to
    // collapse (or any over-collapse) breaks row count and hash alike.
    "q_dedup_url_canon" ->
      """WITH v AS (
        |  SELECT d.doc_id * 8 + r.v AS row_id,
        |    d.source || '.example.com/docs/' || CAST(d.doc_id % 25 AS VARCHAR) AS url_key,
        |    md5(d.text) AS content_md5
        |  FROM documents d, LATERAL (SELECT unnest(range(0, 8)) AS v) r)
        |SELECT url_key, content_md5, MIN(row_id) AS keep_id, COUNT(*) AS n_dups
        |FROM v GROUP BY url_key, content_md5
        |ORDER BY url_key, content_md5""".stripMargin,

    // Anchor-gram reconstruction of maximal repeated-coverage spans: k=8
    // grams, corpus-wide occurrence count, then the same consecutive-
    // anchor island merge (new island when pos > prev + 1) the Spark
    // window performs.
    "q_dedup_substring" -> substringSpansOracleSql,

    // identical contract to q_dedup_substring (see the query comment) —
    // ONE definition gates both variants, so they cannot drift
    "q_dedup_substring_hashed" -> substringSpansOracleSql,

    // Same anchor derivation as q_dedup_substring, then GRAM-level
    // canonical election (min doc·2^20+pos per repeated gram — never by
    // merged-span text, which mixed witnesses would break) and the
    // covered-position removal rule: drop a position iff some redundant
    // window covers it and no canonical window does. COALESCE pins
    // DuckDB's empty-list array_to_string (NULL, it is a string_agg) to
    // Spark's '' when every token of a doc is removed.
    "q_dedup_substring_clean" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS tk
        |  FROM documents),
        |grams0 AS (
        |  SELECT doc_id, tk, UNNEST(range(1, len(tk) - 8 + 2)) AS i
        |  FROM toks WHERE len(tk) >= 8),
        |grams AS (
        |  SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+7], ' ') AS gram FROM grams0),
        |occ AS (
        |  SELECT doc_id, pos,
        |    COUNT(*) OVER (PARTITION BY gram) AS c,
        |    MIN(doc_id * 1048576 + pos) OVER (PARTITION BY gram) AS canon
        |  FROM grams),
        |rep AS (
        |  SELECT doc_id, pos, (doc_id * 1048576 + pos = canon) AS is_canon
        |  FROM occ WHERE c >= 2),
        |wins AS (
        |  SELECT doc_id,
        |    list(struct_pack(s := pos, e := pos + 7)) FILTER (WHERE is_canon) AS can,
        |    list(struct_pack(s := pos, e := pos + 7)) FILTER (WHERE NOT is_canon) AS red
        |  FROM rep GROUP BY doc_id),
        |final AS (
        |  SELECT t.doc_id, t.tk,
        |    CASE WHEN w.red IS NULL THEN NULL
        |      ELSE list_filter(range(0, len(t.tk)), p ->
        |        NOT (len(list_filter(w.red, x -> p >= x.s AND p <= x.e)) > 0
        |             AND (w.can IS NULL OR len(list_filter(w.can, x -> p >= x.s AND p <= x.e)) = 0)))
        |      END AS kept
        |  FROM toks t LEFT JOIN wins w ON t.doc_id = w.doc_id)
        |SELECT doc_id,
        |  CASE WHEN kept IS NULL THEN array_to_string(tk, ' ')
        |    ELSE COALESCE(array_to_string(list_transform(kept, p -> tk[p + 1]), ' '), '') END AS clean_text,
        |  CAST(CASE WHEN kept IS NULL THEN 0 ELSE len(tk) - len(kept) END AS BIGINT) AS n_removed
        |FROM final ORDER BY doc_id""".stripMargin,

    "q_text_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_actual,
        |  CAST(CASE WHEN trim(text) = '' OR text IS NULL THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS n_bpeish,
        |  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
        |  CAST(len(regexp_extract_all(text, '(?i)\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by|from|that|this)\b')) AS BIGINT) AS n_stopwords,
        |  CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) > 0
        |       THEN CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / len(regexp_split_to_array(trim(text), '\s+'))
        |       ELSE 0.0 END AS mean_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Expected features recomputed from doc_id by the synthesis formulas —
    // the Spark side must recover them by PARSING the container bytes, so a
    // broken parser (endianness, offset, magic) breaks the hash match.
    // Audio stats by construction: the data chunk is the deterministic
    // (doc_id·7 + j·13) % 251 byte walk, so energy / peak / zero
    // crossings replay as pure integer SQL — a sample-loop bug on either
    // side diverges.
    // The synthetic WAVs declare 16-bit PCM, so the reader consumes the
    // byte walk as signed little-endian 16-bit sample pairs (trailing odd
    // byte ignored): raw = v(2k) + 256·v(2k+1) with v(j) = (id·7+j·13)%251,
    // sign via the 32768 wrap — a reader that ignores bits_per_sample (the
    // round-10 byte-domain bug) diverges on every odd-length clip.
    "q_audio_stats" ->
      """WITH base AS (SELECT doc_id, doc_id % 100 AS n FROM documents),
        |s AS (
        |  SELECT doc_id, k,
        |    ((doc_id * 7 + (2 * k) * 13) % 251)
        |      + 256 * ((doc_id * 7 + (2 * k + 1) * 13) % 251) AS raw
        |  FROM base, LATERAL (SELECT unnest(range(0, n // 2)) AS k) r),
        |sa AS (
        |  SELECT doc_id, k,
        |    CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS a
        |  FROM s),
        |lagged AS (
        |  SELECT doc_id, a,
        |    LAG(a) OVER (PARTITION BY doc_id ORDER BY k) AS pa
        |  FROM sa),
        |zc AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN (a >= 0) <> (pa >= 0) THEN 1 ELSE 0 END) AS zcnt
        |  FROM lagged WHERE pa IS NOT NULL GROUP BY doc_id),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS ns, SUM(a * a) AS sq, MAX(ABS(a)) AS pk
        |  FROM sa GROUP BY doc_id)
        |SELECT b.doc_id AS media_id,
        |  CAST(8000 + (b.doc_id % 8) * 1000 AS BIGINT) AS sample_rate,
        |  CAST(16 AS BIGINT) AS bits_per_sample,
        |  CAST(1 + b.doc_id % 2 AS BIGINT) AS channels,
        |  CAST(COALESCE(agg.ns, 0) AS BIGINT) AS n_samples,
        |  CAST(COALESCE(agg.sq, 0) AS BIGINT) AS sumsq,
        |  CAST(COALESCE(agg.pk, 0) AS BIGINT) AS peak,
        |  CAST(COALESCE(zc.zcnt, 0) AS BIGINT) AS zero_crossings
        |FROM base b
        |LEFT JOIN agg ON agg.doc_id = b.doc_id
        |LEFT JOIN zc ON zc.doc_id = b.doc_id
        |ORDER BY media_id""".stripMargin,

    // Frame features by construction: the 16-bit sample walk bucketed
    // into 16-sample frames; zero crossings via LAG within (doc, frame).
    "q_audio_frames" ->
      """WITH base AS (SELECT doc_id, doc_id % 100 AS n FROM documents),
        |s AS (
        |  SELECT doc_id, k,
        |    ((doc_id * 7 + (2 * k) * 13) % 251)
        |      + 256 * ((doc_id * 7 + (2 * k + 1) * 13) % 251) AS raw
        |  FROM base, LATERAL (SELECT unnest(range(0, n // 2)) AS k) r),
        |sa AS (
        |  SELECT doc_id, k, k // 16 AS f, k % 16 AS j,
        |    CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS a
        |  FROM s),
        |lagged AS (
        |  SELECT doc_id, f, j, a,
        |    LAG(a) OVER (PARTITION BY doc_id, f ORDER BY j) AS pa
        |  FROM sa)
        |SELECT CAST(doc_id AS BIGINT) AS media_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(a * a) AS BIGINT) AS sumsq,
        |  CAST(MAX(ABS(a)) AS BIGINT) AS peak,
        |  CAST(SUM(CASE WHEN pa IS NOT NULL AND (a >= 0) <> (pa >= 0)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        |FROM lagged GROUP BY doc_id, f
        |ORDER BY media_id, frame_idx""".stripMargin,

    // Video metadata by construction: mirrors syntheticMp4Payload's
    // arithmetic — a box-walk bug on ANY length/offset field diverges.
    "q_video_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(140 + (1 + doc_id % 3) * 100 + doc_id % 50 AS BIGINT) AS n_bytes,
        |  CAST(1000 + (doc_id % 10) * 100 AS BIGINT) AS timescale,
        |  CAST(((2000 + (doc_id % 500) * 10) * 1000)
        |       // (1000 + (doc_id % 10) * 100) AS BIGINT) AS duration_ms,
        |  CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks
        |FROM documents ORDER BY media_id""".stripMargin,

    "q_multimodal_features" -> multimodalFeaturesSql,

    // The streaming twin shares the oracle VERBATIM: feature extraction
    // is a pure per-row payload function, so arrival order and batch
    // boundaries cannot move a single value.
    "q_stream_multimodal" -> multimodalFeaturesSql,


    // Every numeric literal is anchored to DOUBLE: bare decimals are
    // DECIMAL-typed in DuckDB and would silently switch the arithmetic
    // from the IEEE doubles the Spark side computes to exact decimal
    // division. 0.25 = (1 - b), both exact dyadics.
    "q_text_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '')) AS term
        |  FROM documents),
        |dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT (SELECT count(*) FROM documents) AS n, (SELECT count(*) FROM toks) AS sumdl),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term IN ('join', 'stream', 'vector', 'dup')
        |  GROUP BY doc_id, term),
        |idf AS (
        |  SELECT term, ROUND(ln((CAST(s.n AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1), 6) AS idf
        |  FROM (SELECT term, count(*) AS df FROM tf GROUP BY term), stats s),
        |contrib AS (
        |  SELECT t.doc_id,
        |    CAST(ROUND(i.idf * (CAST(t.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1)) /
        |      (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
        |        (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * CAST(d.dl AS DOUBLE) / (CAST(s.sumdl AS DOUBLE) / s.n))), 6)
        |      AS DECIMAL(18,6)) AS c
        |  FROM tf t JOIN idf i USING (term) JOIN dls d USING (doc_id), stats s)
        |SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score
        |FROM contrib GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // RRF: the full BM25 chain and the cosine rank chain replayed, fused
    // with BIGINT `//` contributions — integer micro-units, so the fused
    // scores hash-match exactly.
    "q_retrieval_rrf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '')) AS term
        |  FROM documents),
        |dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT (SELECT count(*) FROM documents) AS n, (SELECT count(*) FROM toks) AS sumdl),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term IN ('join', 'stream', 'vector', 'dup')
        |  GROUP BY doc_id, term),
        |idf AS (
        |  SELECT term, ROUND(ln((CAST(s.n AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1), 6) AS idf
        |  FROM (SELECT term, count(*) AS df FROM tf GROUP BY term), stats s),
        |contrib AS (
        |  SELECT t.doc_id,
        |    CAST(ROUND(i.idf * (CAST(t.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1)) /
        |      (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
        |        (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * CAST(d.dl AS DOUBLE) / (CAST(s.sumdl AS DOUBLE) / s.n))), 6)
        |      AS DECIMAL(18,6)) AS c
        |  FROM tf t JOIN idf i USING (term) JOIN dls d USING (doc_id), stats s),
        |bm AS (
        |  SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score
        |  FROM contrib GROUP BY doc_id
        |  ORDER BY score DESC, doc_id LIMIT 20),
        |lex AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank FROM bm),
        |den AS (
        |  SELECT doc_id, rank FROM (
        |    SELECT c.vec_id AS doc_id,
        |      ROW_NUMBER() OVER (ORDER BY
        |        list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |        / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |           * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC, c.vec_id) AS rank
        |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |    WHERE q.vec_id = 7) t
        |  WHERE rank <= 20),
        |fused AS (
        |  SELECT doc_id, 1000000 // (60 + rank) AS c FROM lex
        |  UNION ALL
        |  SELECT doc_id, 1000000 // (60 + rank) AS c FROM den)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS rrf, CAST(COUNT(*) AS BIGINT) AS lists
        |FROM fused GROUP BY doc_id
        |ORDER BY rrf DESC, doc_id""".stripMargin,

    // The dHash recomputed from the id-synthesis formulas alone: w/h by
    // the same CASE ladder as q_multimodal_features, body length id%100,
    // body byte j = (id*7 + j*13) % 251 — so the Spark side's real
    // container parse + stub decode + grid + bit pack must all agree.
    "q_image_phash" ->
      (phashCteSql + "\nSELECT media_id, phash FROM ph ORDER BY media_id"),

    // All-pairs hamming <= 6 over the same recomputed hashes — no band
    // terms on purpose: at this threshold the 7x9 banding is complete by
    // pigeonhole, so the banded Spark plan must reproduce the FULL pair
    // set (gates recall, not just the filter).
    "q_image_phash_pairs" ->
      (phashCteSql + """
        |SELECT a.media_id AS idA, b.media_id AS idB,
        |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        |FROM ph a JOIN ph b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 6
        |ORDER BY idA, idB""".stripMargin),

    // Plane checksums recomputed from the pixel FORMULAS alone (the
    // payload generator's scaladoc contract): w = 16+id%17, h =
    // 16+(id*3)%13, color branch t = id%4, luma = (77r+150g+29b)//256.
    // The Spark side must round-trip encoder → Inflater → de-filter →
    // luma to land on these exact integers.
    "q_image_decode" -> imageDecodeOracleSql,

    // Binary payloads round-trip the archive byte-exact, so decoding the
    // PNGs OUT OF THE WARC must equal decoding them directly — the
    // q_image_decode oracle verbatim.
    "q_warc_image_decode" -> imageDecodeOracleSql,

    // GIF plane checksums from the formulas alone: w = 16+id%15,
    // h = 12+(id*5)%11, color index j = (id*5+3i)%64, palette entry
    // (3j%256, 7j%256, 11j%256) → luma601 — the Spark side must
    // round-trip LZW encoder → general LZW decoder → palette reduction
    // to land on these exact integers.
    "q_image_decode_gif" ->
      """WITH m AS (
        |  SELECT doc_id, 16 + doc_id % 15 AS w, 12 + (doc_id * 5) % 11 AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h, i,
        |    (77 * ((3 * ((doc_id * 5 + 3 * i) % 64)) % 256)
        |     + 150 * ((7 * ((doc_id * 5 + 3 * i) % 64)) % 256)
        |     + 29 * ((11 * ((doc_id * 5 + 3 * i) % 64)) % 256)) // 256 AS lum
        |  FROM m, LATERAL (SELECT unnest(range(0, w * h)) AS i) r)
        |SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(MAX(w) AS BIGINT) AS width, CAST(MAX(h) AS BIGINT) AS height,
        |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
        |  CAST(SUM(lum) AS BIGINT) AS lum_sum,
        |  CAST(SUM(lum * (i % 97 + 1)) AS BIGINT) AS lum_wsum
        |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin,

    // JPEG plane checksums from the tile formulas alone: w = 8*(2+id%3),
    // h = 8*(2+(id*3)%3), tile t = (i // (w*8)) * (w//8) + (i % w) // 8,
    // lum = (id*7 + t*13) % 251 — the Spark side must run the whole
    // Huffman + dequant + IDCT chain losslessly to land on these.
    "q_image_decode_jpeg" ->
      """WITH m AS (
        |  SELECT doc_id, 8 * (2 + doc_id % 3) AS w,
        |         8 * (2 + (doc_id * 3) % 3) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h, i,
        |    (doc_id * 7 + ((i // (w * 8)) * (w // 8) + (i % w) // 8) * 13) % 251 AS lum
        |  FROM m, LATERAL (SELECT unnest(range(0, w * h)) AS i) r)
        |SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(MAX(w) AS BIGINT) AS width, CAST(MAX(h) AS BIGINT) AS height,
        |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
        |  CAST(SUM(lum) AS BIGINT) AS lum_sum,
        |  CAST(SUM(lum * (i % 97 + 1)) AS BIGINT) AS lum_wsum
        |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin,

    // Nearest-neighbor resample replayed over the PNG pixel formulas:
    // dst (x,y) reads src ((x*w)//dw, (y*h)//dh); checksums over the
    // RESIZED plane in dst raster order.
    "q_image_resize" ->
      """WITH m AS (
        |  SELECT doc_id, 16 + doc_id % 17 AS w, 16 + (doc_id * 3) % 13 AS h,
        |         8 + doc_id % 9 AS dw, 8 + (doc_id * 3) % 7 AS dh
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, dw, dh, i2,
        |    ((i2 // dw) * h // dh) * w + ((i2 % dw) * w // dw) AS i
        |  FROM m, LATERAL (SELECT unnest(range(0, dw * dh)) AS i2) r),
        |lv AS (
        |  SELECT doc_id, dw, dh, i2,
        |    CASE doc_id % 4
        |      WHEN 0 THEN (doc_id * 7 + i * 13) % 251
        |      WHEN 3 THEN (77 * ((doc_id + 3 * i) % 256)
        |        + 150 * (((doc_id + 3 * i) % 256) * 7 % 256)
        |        + 29 * (((doc_id + 3 * i) % 256) * 13 % 256)) // 256
        |      ELSE (77 * ((doc_id + 2 * i) % 256)
        |        + 150 * ((doc_id * 3 + 5 * i) % 256)
        |        + 29 * ((doc_id * 5 + 7 * i) % 256)) // 256
        |    END AS lum
        |  FROM px)
        |SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(MAX(dw) AS BIGINT) AS out_w, CAST(MAX(dh) AS BIGINT) AS out_h,
        |  CAST(SUM(lum) AS BIGINT) AS lum_sum,
        |  CAST(SUM(lum * (i2 % 97 + 1)) AS BIGINT) AS lum_wsum
        |FROM lv GROUP BY doc_id ORDER BY media_id""".stripMargin,

    // Sample offsets replayed as prefix sums over the by-construction
    // sizes: n = 1+id%8 samples of size 1+(id*3+k*7)%64 in one chunk at
    // mdat-body offset 332+4n (every enclosing box length summed).
    "q_video_frames" ->
      """WITH m AS (SELECT doc_id, 1 + doc_id % 8 AS n FROM documents),
        |s AS (
        |  SELECT doc_id, n, k, 1 + (doc_id * 3 + k * 7) % 64 AS sz
        |  FROM m, LATERAL (SELECT unnest(range(0, n)) AS k) r),
        |o AS (
        |  SELECT doc_id, k, sz,
        |    332 + 4 * n + COALESCE(SUM(sz) OVER (PARTITION BY doc_id ORDER BY k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM s)
        |SELECT CAST(doc_id AS BIGINT) AS media_id, CAST(k AS BIGINT) AS sample_idx,
        |  CAST(off AS BIGINT) AS byte_offset, CAST(sz AS BIGINT) AS size_bytes
        |FROM o ORDER BY media_id, sample_idx""".stripMargin,

    // MJPEG frame decode oracle: per frame k of video id, seed = id·8+k;
    // JPEG dims and tile-constant pixels replayed by formula (the same
    // lossless-by-construction contract as q_image_decode_jpeg), plus the
    // dHash grid over the formula pixels — sample-table walk, frame
    // slicing, per-frame SOF parse, Huffman+IDCT, and the hash must all
    // agree bit-exactly.
    "q_video_decode" ->
      """WITH f AS (
        |  SELECT doc_id, k, doc_id * 8 + k AS seed,
        |    8 * (2 + (doc_id * 8 + k) % 3) AS w,
        |    8 * (2 + ((doc_id * 8 + k) * 3) % 3) AS h
        |  FROM documents, LATERAL (SELECT unnest(range(0, 1 + doc_id % 4)) AS k) r),
        |px AS (
        |  SELECT doc_id, k, w, h, i,
        |    (seed * 7 + ((i // (w * 8)) * (w // 8) + (i % w) // 8) * 13) % 251 AS lum
        |  FROM f, LATERAL (SELECT unnest(range(0, w * h)) AS i) r),
        |sums AS (
        |  SELECT doc_id, k, MAX(w) AS w, MAX(h) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS n_pixels,
        |    CAST(SUM(lum) AS BIGINT) AS lum_sum,
        |    CAST(SUM(lum * (i % 97 + 1)) AS BIGINT) AS lum_wsum
        |  FROM px GROUP BY doc_id, k),
        |g AS (
        |  SELECT doc_id, k, gy, gx,
        |    (seed * 7 + ((((gy * h) // 7) // 8) * (w // 8)
        |      + (((gx * w) // 10) // 8)) * 13) % 251 AS ll,
        |    (seed * 7 + ((((gy * h) // 7) // 8) * (w // 8)
        |      + ((((gx + 1) * w) // 10) // 8)) * 13) % 251 AS lr
        |  FROM f, LATERAL (SELECT unnest(range(0, 7)) AS gy) a,
        |          LATERAL (SELECT unnest(range(0, 9)) AS gx) b),
        |dh AS (
        |  SELECT doc_id, k, CAST(SUM(CASE WHEN lr > ll
        |    THEN (CAST(1 AS BIGINT) << (gy * 9 + gx)) ELSE 0 END) AS BIGINT) AS dhash
        |  FROM g GROUP BY doc_id, k)
        |SELECT CAST(s.doc_id AS BIGINT) AS media_id, CAST(s.k AS BIGINT) AS frame_idx,
        |  CAST(s.w AS BIGINT) AS width, CAST(s.h AS BIGINT) AS height,
        |  s.n_pixels, s.lum_sum, s.lum_wsum, d.dhash
        |FROM sums s JOIN dh d ON s.doc_id = d.doc_id AND s.k = d.k
        |ORDER BY media_id, frame_idx""".stripMargin,

    // The dHash grid replayed over the same pixel formulas: sample the
    // 10x7 grid at ((gy*h)//7, (gx*w)//10), set bit gy*9+gx iff the right
    // neighbor is brighter — identical geometry to the Scala dHashGrid,
    // but fed by formula pixels instead of decoded ones, gating the whole
    // encode→decode→hash chain.
    "q_image_phash_real" ->
      """WITH m AS (
        |  SELECT doc_id, 16 + doc_id % 17 AS w, 16 + (doc_id * 3) % 13 AS h
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, gy, gx,
        |    ((gy * h) // 7) * w + ((gx * w) // 10) AS il,
        |    ((gy * h) // 7) * w + (((gx + 1) * w) // 10) AS ir
        |  FROM m, LATERAL (SELECT unnest(range(0, 7)) AS gy) a,
        |          LATERAL (SELECT unnest(range(0, 9)) AS gx) b),
        |lv AS (
        |  SELECT doc_id, gy, gx,
        |    CASE doc_id % 4
        |      WHEN 0 THEN (doc_id * 7 + il * 13) % 251
        |      WHEN 3 THEN (77 * ((doc_id + 3 * il) % 256)
        |        + 150 * (((doc_id + 3 * il) % 256) * 7 % 256)
        |        + 29 * (((doc_id + 3 * il) % 256) * 13 % 256)) // 256
        |      ELSE (77 * ((doc_id + 2 * il) % 256)
        |        + 150 * ((doc_id * 3 + 5 * il) % 256)
        |        + 29 * ((doc_id * 5 + 7 * il) % 256)) // 256
        |    END AS ll,
        |    CASE doc_id % 4
        |      WHEN 0 THEN (doc_id * 7 + ir * 13) % 251
        |      WHEN 3 THEN (77 * ((doc_id + 3 * ir) % 256)
        |        + 150 * (((doc_id + 3 * ir) % 256) * 7 % 256)
        |        + 29 * (((doc_id + 3 * ir) % 256) * 13 % 256)) // 256
        |      ELSE (77 * ((doc_id + 2 * ir) % 256)
        |        + 150 * ((doc_id * 3 + 5 * ir) % 256)
        |        + 29 * ((doc_id * 5 + 7 * ir) % 256)) // 256
        |    END AS lr
        |  FROM g)
        |SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(SUM(CASE WHEN lr > ll
        |    THEN (CAST(1 AS BIGINT) << (gy * 9 + gx)) ELSE 0 END) AS BIGINT) AS phash
        |FROM lv GROUP BY doc_id ORDER BY media_id""".stripMargin,

    "q_dedup_ngram" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, list_extract(tk, i) || ' ' || list_extract(tk, i+1) || ' ' || list_extract(tk, i+2) AS s
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk)-1)) AS i) r
        |  WHERE len(tk) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(tk, ' ') AS s FROM toks WHERE len(tk) < 3
        |),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT x.doc_id AS idA, y.doc_id AS idB, count(*) AS c
        |  FROM sh x JOIN sh y USING (s) WHERE x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT idA, idB, ROUND(CAST(c AS DOUBLE) / (na.n_sh + nb.n_sh - c), 6) AS jaccard
        |FROM common
        |JOIN sizes na ON na.doc_id = idA
        |JOIN sizes nb ON nb.doc_id = idB
        |WHERE CAST(c AS DOUBLE) / (na.n_sh + nb.n_sh - c) >= 0.2
        |ORDER BY idA, idB""".stripMargin,

    // Streaming curation: the batch replay IS the oracle (stream ≡ batch
    // by the pair-discovery argument in StreamingIngest). Quality rule on
    // the empty-filtered token count; shingles/pairs are q_dedup_ngram's
    // derivation restricted to quality-passers; a doc is a duplicate iff
    // some qualifying pair orients it as the larger id.
    "q_stream_curate" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
        |qual AS (
        |  SELECT doc_id, tk FROM toks
        |  WHERE len(list_filter(tk, t -> t <> '')) >= 20),
        |sh AS (
        |  SELECT DISTINCT doc_id, list_extract(tk, i) || ' ' || list_extract(tk, i+1) || ' ' || list_extract(tk, i+2) AS s
        |  FROM qual, LATERAL (SELECT unnest(range(1, len(tk)-1)) AS i) r
        |  WHERE len(tk) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(tk, ' ') AS s FROM qual WHERE len(tk) < 3
        |),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT x.doc_id AS idA, y.doc_id AS idB, count(*) AS c
        |  FROM sh x JOIN sh y USING (s) WHERE x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |dup AS (
        |  SELECT DISTINCT idB AS doc_id
        |  FROM common
        |  JOIN sizes na ON na.doc_id = idA
        |  JOIN sizes nb ON nb.doc_id = idB
        |  WHERE CAST(c AS DOUBLE) / (na.n_sh + nb.n_sh - c) >= 0.2)
        |SELECT d.doc_id,
        |  CASE WHEN q.doc_id IS NULL THEN 'quality'
        |       WHEN dp.doc_id IS NOT NULL THEN 'duplicate'
        |       ELSE 'curated' END AS status
        |FROM documents d
        |LEFT JOIN qual q ON q.doc_id = d.doc_id
        |LEFT JOIN dup dp ON dp.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Containment: same shingle derivation as q_dedup_ngram, but the pair
    // count is DIRECTIONAL (x.doc_id <> y.doc_id, both orders kept) and
    // normalized by the source's shingle count only.
    "q_dedup_containment" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, list_extract(tk, i) || ' ' || list_extract(tk, i+1) || ' ' || list_extract(tk, i+2) AS s
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk)-1)) AS i) r
        |  WHERE len(tk) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(tk, ' ') AS s FROM toks WHERE len(tk) < 3
        |),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT x.doc_id AS src_id, y.doc_id AS dst_id, count(*) AS c
        |  FROM sh x JOIN sh y USING (s) WHERE x.doc_id <> y.doc_id
        |  GROUP BY 1, 2)
        |SELECT src_id, dst_id, ROUND(CAST(c AS DOUBLE) / na.n_sh, 6) AS containment
        |FROM common
        |JOIN sizes na ON na.doc_id = src_id
        |WHERE CAST(c AS DOUBLE) / na.n_sh >= 0.6
        |ORDER BY src_id, dst_id""".stripMargin,

    // Same pair derivation as q_dedup_ngram restricted to pairs touching
    // the mod-10-class-9 delta — the incremental path must produce exactly
    // the delta-touching slice of the full pair set.
    "q_dedup_incremental" -> incrementalNgramOracleSql,

    // Identical oracle: reloading the persisted band index from parquet
    // must not change a single pair.
    "q_dedup_incremental_indexed" -> incrementalNgramOracleSql,

    // Same ngram-pair derivation as q_dedup_ngram, then connected components
    // as a recursive reachability closure: cc holds (node, label) for every
    // label that reaches the node through the symmetric edge set; MIN per
    // node = the component's minimum id — exactly the propagation fixpoint.
    "q_dedup_cc" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, list_extract(tk, i) || ' ' || list_extract(tk, i+1) || ' ' || list_extract(tk, i+2) AS s
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk)-1)) AS i) r
        |  WHERE len(tk) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(tk, ' ') AS s FROM toks WHERE len(tk) < 3
        |),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT x.doc_id AS idA, y.doc_id AS idB, count(*) AS c
        |  FROM sh x JOIN sh y USING (s) WHERE x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT idA, idB FROM common
        |  JOIN sizes na ON na.doc_id = idA
        |  JOIN sizes nb ON nb.doc_id = idB
        |  WHERE CAST(c AS DOUBLE) / (na.n_sh + nb.n_sh - c) >= 0.2),
        |edges AS (SELECT idA AS src, idB AS dst FROM pairs UNION ALL SELECT idB AS src, idA AS dst FROM pairs),
        |cc(id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, cc.label FROM edges e JOIN cc ON cc.id = e.src
        |)
        |SELECT id AS doc_id, CAST(MIN(label) AS BIGINT) AS component, (MIN(label) = id) AS survivor
        |FROM cc GROUP BY id ORDER BY doc_id""".stripMargin,

    // PageRank: the same three integer-arithmetic iterations unrolled as
    // chained CTEs (aggregates are not allowed in a recursive term, and
    // unrolling keeps every step plain ANSI). `//` is DuckDB's integer
    // floor-division = Spark's `div` on the all-positive rank mass.
    "q_pagerank" ->
      """WITH e AS (
        |  SELECT DISTINCT l_partkey*2 AS src, l_suppkey*2+1 AS dst FROM lineitem
        |  UNION
        |  SELECT DISTINCT l_suppkey*2+1 AS src, l_partkey*2 AS dst FROM lineitem),
        |deg AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
        |n AS (SELECT DISTINCT src AS node FROM e),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM n),
        |c1 AS (SELECT e.dst, SUM(r0.pr // d.outd) AS s FROM e JOIN deg d ON e.src = d.src JOIN r0 ON e.src = r0.node GROUP BY e.dst),
        |r1 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS pr FROM n LEFT JOIN c1 ON n.node = c1.dst),
        |c2 AS (SELECT e.dst, SUM(r1.pr // d.outd) AS s FROM e JOIN deg d ON e.src = d.src JOIN r1 ON e.src = r1.node GROUP BY e.dst),
        |r2 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS pr FROM n LEFT JOIN c2 ON n.node = c2.dst),
        |c3 AS (SELECT e.dst, SUM(r2.pr // d.outd) AS s FROM e JOIN deg d ON e.src = d.src JOIN r2 ON e.src = r2.node GROUP BY e.dst),
        |r3 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS pr FROM n LEFT JOIN c3 ON n.node = c3.dst)
        |SELECT node, pr FROM r3 ORDER BY node""".stripMargin,

    // Label propagation: 3 unrolled synchronous rounds. Each round joins
    // the symmetric edge set to the previous labeling at the neighbor
    // end, counts (node, label), and picks per node by (cnt DESC, lab
    // ASC) — exactly the engine's max(struct(cnt, −lab)) argmax.
    "q_label_prop" ->
      """WITH e AS (
        |  SELECT DISTINCT l_partkey*2 AS src, l_suppkey*2+1 AS dst FROM lineitem
        |  UNION
        |  SELECT DISTINCT l_suppkey*2+1 AS src, l_partkey*2 AS dst FROM lineitem),
        |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e),
        |n1 AS (SELECT e.src AS node, l0.lab AS lab, count(*) AS cnt FROM e JOIN l0 ON e.dst = l0.node GROUP BY 1, 2),
        |l1 AS (SELECT node, lab FROM n1 QUALIFY row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lab ASC) = 1),
        |n2 AS (SELECT e.src AS node, l1.lab AS lab, count(*) AS cnt FROM e JOIN l1 ON e.dst = l1.node GROUP BY 1, 2),
        |l2 AS (SELECT node, lab FROM n2 QUALIFY row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lab ASC) = 1),
        |n3 AS (SELECT e.src AS node, l2.lab AS lab, count(*) AS cnt FROM e JOIN l2 ON e.dst = l2.node GROUP BY 1, 2),
        |l3 AS (SELECT node, lab FROM n3 QUALIFY row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lab ASC) = 1)
        |SELECT node, lab FROM l3 ORDER BY node""".stripMargin,

    // Weighted shortest paths: 4 unrolled FULL Bellman-Ford relaxation
    // rounds over the min-weight edge table; min/plus on BIGINT only.
    "q_weighted_paths" ->
      """WITH raw AS (
        |  SELECT l_partkey*2 AS src, l_suppkey*2+1 AS dst, CAST(l_quantity AS BIGINT) AS w FROM lineitem
        |  UNION ALL
        |  SELECT l_suppkey*2+1 AS src, l_partkey*2 AS dst, CAST(l_quantity AS BIGINT) AS w FROM lineitem),
        |e AS (SELECT src, dst, MIN(w) AS w FROM raw GROUP BY src, dst),
        |d0 AS (SELECT DISTINCT p_partkey*2 AS node, CAST(0 AS BIGINT) AS dist FROM part WHERE p_partkey % 100 = 0),
        |d1 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d0 UNION ALL
        |  SELECT e.dst AS node, d0.dist + e.w AS dist FROM d0 JOIN e ON e.src = d0.node) GROUP BY node),
        |d2 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d1 UNION ALL
        |  SELECT e.dst AS node, d1.dist + e.w AS dist FROM d1 JOIN e ON e.src = d1.node) GROUP BY node),
        |d3 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d2 UNION ALL
        |  SELECT e.dst AS node, d2.dist + e.w AS dist FROM d2 JOIN e ON e.src = d2.node) GROUP BY node),
        |d4 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d3 UNION ALL
        |  SELECT e.dst AS node, d3.dist + e.w AS dist FROM d3 JOIN e ON e.src = d3.node) GROUP BY node)
        |SELECT node, dist FROM d4 ORDER BY node""".stripMargin,

    // k-hop BFS: 4 unrolled Bellman-Ford relaxation rounds — each round
    // min-merges the previous distances with every distance+1 reachable
    // over one edge. Agrees with frontier BFS at horizon 4 (every relaxed
    // value sits on a real path; min picks the true hop count). MIN never
    // widens to HUGEINT, so no casts are needed beyond the seed literal.
    "q_khop" ->
      """WITH e AS (
        |  SELECT DISTINCT l_partkey*2 AS src, l_suppkey*2+1 AS dst FROM lineitem
        |  UNION
        |  SELECT DISTINCT l_suppkey*2+1 AS src, l_partkey*2 AS dst FROM lineitem),
        |d0 AS (SELECT DISTINCT p_partkey*2 AS node, 0 AS dist FROM part WHERE p_partkey % 100 = 0),
        |d1 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d0 UNION ALL
        |  SELECT e.dst AS node, d0.dist + 1 AS dist FROM d0 JOIN e ON e.src = d0.node) GROUP BY node),
        |d2 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d1 UNION ALL
        |  SELECT e.dst AS node, d1.dist + 1 AS dist FROM d1 JOIN e ON e.src = d1.node) GROUP BY node),
        |d3 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d2 UNION ALL
        |  SELECT e.dst AS node, d2.dist + 1 AS dist FROM d2 JOIN e ON e.src = d2.node) GROUP BY node),
        |d4 AS (SELECT node, MIN(dist) AS dist FROM (
        |  SELECT node, dist FROM d3 UNION ALL
        |  SELECT e.dst AS node, d3.dist + 1 AS dist FROM d3 JOIN e ON e.src = d3.node) GROUP BY node)
        |SELECT node, dist FROM d4 ORDER BY node""".stripMargin,

    // Triangles: independent replay of orientation + wedge + closure. The
    // wedge predicate compares (deg, id) lexicographically — same total
    // order as the Spark side — and counting is exact integer arithmetic.
    "q_triangles" ->
      """WITH pe AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT x.p AS u, y.p AS v FROM pe x JOIN pe y ON x.ok = y.ok AND x.p < y.p),
        |deg AS (SELECT node, count(*) AS d FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) GROUP BY node),
        |o AS (
        |  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v) THEN e.u ELSE e.v END AS src,
        |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v) THEN e.v ELSE e.u END AS dst,
        |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v) THEN dv.d ELSE du.d END AS ddst
        |  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
        |tri AS (
        |  SELECT o1.dst AS a, o1.src AS c, o2.dst AS b
        |  FROM o o1 JOIN o o2 ON o1.src = o2.src
        |    AND (o1.ddst < o2.ddst OR (o1.ddst = o2.ddst AND o1.dst < o2.dst))
        |  JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst),
        |corner AS (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
        |cnt AS (SELECT node, count(*) AS triangles FROM corner GROUP BY node)
        |SELECT d.node, CAST(COALESCE(c.triangles, 0) AS BIGINT) AS triangles
        |FROM deg d LEFT JOIN cnt c ON d.node = c.node
        |ORDER BY d.node""".stripMargin,

    // DOULION estimate headline is approximate-by-design (Spark-hash edge
    // sample, not ANSI-replayable); its 6σ variance-bound check is the gate.
    "q_triangles_approx_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS subject, CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    // language-ID: the expression fold (replace when strictly greater over
    // langs in order de,en,es,fr,zh) is exactly argmax-ties-to-earliest,
    // which this CASE chain reproduces. The fused TextProfile expression
    // reproduces Java's Unicode-aware \b exactly; on the fixtures the CJK
    // markers never sit at Java word boundaries, and RE2's ASCII \b in
    // DuckDB likewise scores them 0, so the engines agree here.
    "q_text_langid" ->
      """SELECT doc_id, CASE
        |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |  WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |  WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |  WHEN s_fr >= s_zh THEN 'fr'
        |  ELSE 'zh' END AS lang_pred
        |FROM (SELECT doc_id,
        |  len(regexp_extract_all(text, '(?i)\b(der|die|das|und|ist)\b')) AS s_de,
        |  len(regexp_extract_all(text, '(?i)\b(the|and|of|to|is)\b')) AS s_en,
        |  len(regexp_extract_all(text, '(?i)\b(el|la|los|que|es)\b')) AS s_es,
        |  len(regexp_extract_all(text, '(?i)\b(le|la|les|et|est)\b')) AS s_fr,
        |  len(regexp_extract_all(text, '(?i)\b(的|是|了|在|我)\b')) AS s_zh
        |  FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    // extraction oracle: generation∘extraction is the identity on the
    // content blocks, so the expected text is recomputed from the raw
    // column (the corpus is single-spaced with no markup chars — probed
    // at every SF — so whitespace normalization is also the identity).
    "q_text_extract" -> textExtractOracleSql,

    // extraction is stateless per-row ⇒ the streaming twin shares the
    // batch oracle verbatim.
    "q_stream_text_extract" -> textExtractOracleSql,

    // block oracle: the template's 7-block anatomy reconstructed per doc;
    // constant blocks carry hand-counted non-ws/link chars (nav 16/16,
    // ad div 10/10, footer 28/12 — &#169; decodes to one char), text
    // blocks derive counts from the single-spaced source column.
    "q_text_extract_blocks" ->
      """WITH d AS (SELECT doc_id, text,
        |  length(replace(text, ' ', '')) AS t_nw,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS t_words
        |  FROM documents)
        |SELECT * FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS idx, 'title' AS tag,
        |    'Doc ' || doc_id AS text,
        |    CAST(3 + length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS n_chars,
        |    CAST(0 AS BIGINT) AS n_link_chars, CAST(2 AS BIGINT) AS n_words,
        |    'boilerplate' AS label FROM d
        |  UNION ALL SELECT doc_id, 1, 'nav', 'Home About Contact', 16, 16, 3,
        |    'boilerplate' FROM d
        |  UNION ALL SELECT doc_id, 2, 'h1',
        |    'Corpus document from the synthetic crawl corpus', 41, 0, 7,
        |    'content' FROM d
        |  UNION ALL SELECT doc_id, 3, 'p', text, t_nw, 0, t_words,
        |    'content' FROM d
        |  UNION ALL SELECT doc_id, 4, 'div', 'Buy now Sale', 10, 10, 3,
        |    'boilerplate' FROM d
        |  UNION ALL SELECT doc_id, 5, 'blockquote', upper(text), t_nw, 0,
        |    t_words, 'content' FROM d
        |  UNION ALL SELECT doc_id, 6, 'footer',
        |    'Terms Privacy ' || chr(169) || ' 2026 Example Corp', 28, 12, 6,
        |    'boilerplate' FROM d
        |) ORDER BY doc_id, idx""".stripMargin,

    "q_text_fix_mojibake" -> mojibakeOracleSql,

    // code-fence oracle: both blocks rebuilt from word slices (DuckDB
    // 1-based inclusive list slicing mirrors Spark's slice(start,len)).
    "q_text_code_fences" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS lst
        |  FROM documents)
        |SELECT doc_id, CAST(idx AS BIGINT) AS idx, lang, code
        |FROM (
        |  SELECT doc_id, 0 AS idx, 'python' AS lang,
        |    array_to_string(lst[5:8], ' ') AS code FROM w
        |  UNION ALL
        |  SELECT doc_id, 1, '', array_to_string(lst[9:12], ' ') FROM w)
        |ORDER BY doc_id, idx""".stripMargin,

    // opengraph oracle: rows literal-by-construction (title from the
    // first three words, image only on evens).
    "q_html_og" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://www.' || source || '.example.com' AS host,
        |    array_to_string(
        |      list_filter(string_split(text, ' '), x -> x <> '')[1:3],
        |      ' ') AS t3
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, 0 AS idx, 'title' AS key, t3 AS value FROM u
        |  UNION ALL SELECT doc_id, 1, 'type', 'article' FROM u
        |  UNION ALL SELECT doc_id, 2, 'url',
        |    host || '/docs/' || CAST(doc_id AS VARCHAR) FROM u
        |  UNION ALL SELECT doc_id, 3, 'image',
        |    host || '/img/' || CAST(doc_id % 9 AS VARCHAR) || '.png'
        |    FROM u WHERE doc_id % 2 = 0)
        |SELECT doc_id, CAST(idx AS BIGINT) AS idx, key, value
        |FROM l ORDER BY doc_id, idx""".stripMargin,

    // hreflang oracles: pairs and cluster ledgers rebuilt from the
    // id%25 slot / id%2 fr rotation.
    "q_html_alternates" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://www.' || source || '.example.com' AS host,
        |    CAST(doc_id % 25 AS VARCHAR) AS slot
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, 0 AS idx, 'en' AS hreflang,
        |    host || '/en/' || slot AS href FROM u
        |  UNION ALL SELECT doc_id, 1, 'de', host || '/de/' || slot FROM u
        |  UNION ALL SELECT doc_id, 2, 'fr', host || '/fr/' || slot
        |    FROM u WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END, 'x-default',
        |    host || '/en/' || slot FROM u)
        |SELECT doc_id, CAST(idx AS BIGINT) AS idx, hreflang, href
        |FROM l ORDER BY doc_id, idx""".stripMargin,

    "q_lang_clusters" ->
      """WITH d AS (
        |  SELECT doc_id, source, doc_id % 25 AS slot,
        |    doc_id % 2 = 0 AS has_fr
        |  FROM documents)
        |SELECT 'https://www.' || source || '.example.com/en/' ||
        |    CAST(slot AS VARCHAR) AS cluster,
        |  CAST(count(*) AS BIGINT) AS n_pages,
        |  CAST(2 + max(CASE WHEN has_fr THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_langs
        |FROM d GROUP BY source, slot ORDER BY cluster""".stripMargin,

    // head-directive oracles: every field literal-by-construction from
    // the id%3/%2/%4 fixture rotations.
    "q_html_head" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN '/assets/' END AS base,
        |  CASE WHEN doc_id % 2 = 0 THEN 'https://www.' || source ||
        |    '.example.com/docs/c' || CAST(doc_id % 5 AS VARCHAR)
        |  END AS canonical,
        |  doc_id % 4 = 0 AS noindex,
        |  doc_id % 4 <= 1 AS nofollow
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_canonical_dedup" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN 'https://www.' || source || '.example.com/docs/c' ||
        |        CAST(doc_id % 5 AS VARCHAR)
        |      ELSE 'https://www.' || source || '.example.com/docs/' ||
        |        CAST(doc_id AS VARCHAR) END AS canon_key
        |  FROM documents)
        |SELECT canon_key, CAST(min(doc_id) AS BIGINT) AS survivor,
        |  CAST(count(*) AS BIGINT) AS n_members
        |FROM k GROUP BY canon_key ORDER BY canon_key""".stripMargin,

    "q_meta_robots_gate" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_pages,
        |  CAST(sum(CASE WHEN doc_id % 4 = 0 THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(sum(CASE WHEN doc_id % 4 >= 2 THEN 2 ELSE 0 END) AS BIGINT)
        |    AS n_link_votes
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // html-links oracle: nine anchor shapes per document, every
    // (href, resolved, anchor, nofollow) tuple literal-by-construction —
    // a mis-merged relative path, an un-dropped fragment, a re-spelled
    // mailto:, an undecoded &amp;, or a missed rel=nofollow breaks it.
    "q_html_links" -> htmlLinksOracleSql,
    "q_stream_links" -> htmlLinksOracleSql,
    "q_sft_assemble" -> sftAssembleOracleSql,
    "q_stream_sft" -> sftAssembleOracleSql,
    "q_sft_pack" -> sftPackOracleSql,
    "q_sft_pack_tokens" -> sftPackTokensOracleSql,
    "q_sft_pipeline" -> sftPipelineOracleSql,
    "q_stream_pref_pairs" -> prefPairsOracleSql,
    "q_sft_bon" -> sftBonOracleSql,
    "q_stream_bon" -> sftBonOracleSql,
    "q_sft_dedup" -> sftDedupOracleSql,
    "q_pref_pairs" -> prefPairsOracleSql,
    "q_sft_decontam" -> sftDecontamOracleSql,
    "q_image_strip_meta" -> imageStripMetaOracleSql,
    "q_rag_chunks" -> textChunksOracleSql,
    "q_rag_pipeline" -> ragPipelineOracleSql,
    "q_sft_dedup_fuzzy" -> sftDedupFuzzyOracleSql,
    "q_image_text_pairs" -> htmlImagePairsOracleSql,
    "q_stream_images" -> htmlImagePairsOracleSql,
    "q_image_pair_quality" -> imagePairQualityOracleSql,
    "q_stream_markdown" -> htmlMarkdownOracleSql,
    "q_interleaved_docs" -> interleavedDocsOracleSql,
    "q_interleaved_pack" -> interleavedPackOracleSql,
    "q_pack_ffd" -> packFfdOracleSql,
    "q_pack_ffd_stats" -> packFfdStatsOracleSql,
    "q_stream_ffd" -> packFfdStatsOracleSql,
    "q_interleaved_pack_tokens" -> interleavedPackTokensOracleSql,
    "q_sft_assemble_tokens" -> sftAssembleTokensOracleSql,
    "q_stream_sft_tokens" -> sftAssembleTokensOracleSql,
    "q_stream_interleaved" -> interleavedDocsOracleSql,

    // html-markdown oracle (shared with the streaming twin): the
    // rendered string rebuilt verbatim — every prefix, inline mark,
    // bullet, and the image line.
    "q_html_markdown" -> htmlMarkdownOracleSql,
    "q_warc_image_pairs" -> warcImagePairsOracleSql,

    // html-tables oracle: every (t, r, c, header, cell) tuple rebuilt
    // from the first-6 words — header literals ('Word' proves the
    // whitespace normalize), per-word data rows (the <b> strip and the
    // a&amp;b entity decode are the construction), and the one-row
    // totals table at t=1 (depth-1 indexing).
    "q_html_tables" -> htmlTablesOracleSql,
    "q_stream_tables" -> htmlTablesOracleSql,

    // blocklist oracle: same synthesized URL, same two regexes (RE2 and
    // Java agree on these literal-ish patterns).
    "q_url_blocklist" ->
      """WITH d AS (SELECT doc_id,
        |  'https://www.' || source || '.example.com/docs/' ||
        |  CAST(doc_id % 25 AS VARCHAR) || '/?utm_source=' || lang AS url
        |  FROM documents)
        |SELECT doc_id, url FROM d
        |WHERE NOT (regexp_matches(url, 'src1\.example\.com')
        |        OR regexp_matches(url, '/docs/7/'))
        |ORDER BY doc_id""".stripMargin,

    // domain-cap oracle: domain reconstructed from the synthesis rule,
    // rank window replayed with the same deterministic tie-break.
    "q_domain_cap" ->
      """WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |  source || '.example.com' AS domain FROM documents),
        |r AS (SELECT doc_id, domain, n_chars,
        |  ROW_NUMBER() OVER (PARTITION BY domain
        |    ORDER BY n_chars DESC, doc_id ASC) AS rn FROM d)
        |SELECT doc_id, domain, n_chars FROM r WHERE rn <= 15
        |ORDER BY doc_id""".stripMargin,

    "q_domain_profile" ->
      """SELECT source || '.example.com' AS domain,
        |  count(*) AS n_docs,
        |  CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
        |  least(count(*), 15) AS kept_at_cap
        |FROM documents GROUP BY source ORDER BY domain""".stripMargin,

    // pipeline oracle: extracted = h1const \n text \n upper(text) ⇒
    // tokens = 7 + 2·words(text); dedup groups by the extracted text
    // (equivalently by text) keeping the min-doc_id row's lang.
    "q_text_extract_pipeline" ->
      """WITH ext AS (
        |  SELECT doc_id, lang,
        |    'Corpus document from the synthetic crawl corpus' || chr(10) ||
        |      text || chr(10) || upper(text) AS ex,
        |    7 + 2 * (length(text) - length(replace(text, ' ', '')) + 1) AS n_tok
        |  FROM documents),
        |ded AS (
        |  SELECT ex, arg_min(lang, doc_id) AS lang, arg_min(n_tok, doc_id) AS n_tok
        |  FROM ext GROUP BY ex)
        |SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tok
        |FROM ded WHERE n_tok >= 32
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // WARC record-table oracle: every WARC/HTTP framing field recomputed
    // from the page template — Content-Length of a response record is
    // octets(HTTP head incl. the digits of the body's own Content-Length)
    // + octets(html); warcinfo rows are the 4 constant file headers.
    // strlen() is DuckDB's BYTE length (the corpus is ASCII, but the
    // contract is octets).
    "q_warc_records" -> warcRecordsOracleSql,

    // Two-wave manifest-driven ingest accumulates exactly the one-shot
    // record table — oracle shared verbatim.
    "q_warc_incremental" -> warcRecordsOracleSql,

    // Replayed appends deduplicated on the archive-native
    // (file, rec_offset) key restore exactly the one-shot table.
    "q_warc_dedup_replay" -> warcRecordsOracleSql,

    // The crawl front end-to-end must equal extracting from the pages
    // directly — the q_text_extract oracle verbatim.
    "q_warc_extract" -> textExtractOracleSql,

    // warc-links oracle: the synthetic page's seven constant
    // root-relative anchors resolved against each record's own target
    // URI — any framing slip, un-resolved reference, or anchor-text leak
    // (nav/ads/footer text around the <a>s) breaks it.
    "q_warc_links" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://www.' || source || '.example.com' AS host
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, 0 AS idx, host || '/' AS resolved,
        |    'Home' AS anchor FROM u
        |  UNION ALL SELECT doc_id, 1, host || '/about', 'About' FROM u
        |  UNION ALL SELECT doc_id, 2, host || '/contact', 'Contact' FROM u
        |  UNION ALL SELECT doc_id, 3, host || '/buy', 'Buy now' FROM u
        |  UNION ALL SELECT doc_id, 4, host || '/sale', 'Sale' FROM u
        |  UNION ALL SELECT doc_id, 5, host || '/tos', 'Terms' FROM u
        |  UNION ALL SELECT doc_id, 6, host || '/priv', 'Privacy' FROM u)
        |SELECT doc_id, CAST(idx AS BIGINT) AS idx, resolved, anchor
        |FROM l ORDER BY doc_id, idx""".stripMargin,

    // discovery-capstone oracle: every page links the same seven
    // host-local paths, none of which is a crawled /docs/ page, so each
    // host contributes seven frontier targets with inlink mass = its
    // page count; top-50 by (mass DESC, url ASC) replayed literally.
    "q_crawl_discover" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY source),
        |t AS (
        |  SELECT 'https://www.' || source || '.example.com' || p.path AS url,
        |    n
        |  FROM per, (VALUES ('/'), ('/about'), ('/buy'), ('/contact'),
        |    ('/priv'), ('/sale'), ('/tos')) AS p(path)),
        |top AS (
        |  SELECT url, n AS n_inlinks, n AS n_srcs
        |  FROM t ORDER BY n DESC, url ASC LIMIT 50)
        |SELECT CAST(row_number() OVER (ORDER BY n_inlinks DESC, url ASC)
        |    AS BIGINT) AS rank,
        |  url, n_inlinks, n_srcs
        |FROM top ORDER BY rank""".stripMargin,

    // PDF extraction: the 8-word line regrouping rebuilt from the words
    // alone — shared by the direct and out-of-the-archive chains.
    "q_pdf_extract" -> pdfExtractOracleSql,
    "q_pdf_unicode" -> pdfUnicodeOracleSql,
    "q_warc_pdf" -> pdfExtractOracleSql,

    // revisit oracle: unchanged third carries the CRAWL-1 template's
    // octets, the rest the "v2" template's — both recomputed from the
    // shared page expression.
    "q_warc_revisit" ->
      s"""WITH page AS (
        |  SELECT doc_id,
        |    ${warcHtmlSqlExpr("doc_id", "text")} AS h1,
        |    ${warcHtmlSqlExpr("doc_id", "text || ' v2'")} AS h2
        |  FROM documents)
        |SELECT doc_id, doc_id % 3 = 0 AS is_revisit, TRUE AS resolved,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN strlen(h1) ELSE strlen(h2) END
        |    AS BIGINT) AS body_octets
        |FROM page ORDER BY doc_id""".stripMargin,

    // redirect oracle: statuses, landing ids, and hop counts from the
    // chain rule (mode 3 → −3 in one hop; mode 4 → −1 → −4 in two).
    "q_warc_redirects" ->
      """SELECT doc_id,
        |  CAST(CASE doc_id % 5 WHEN 3 THEN 301 WHEN 4 THEN 302
        |    ELSE 200 END AS BIGINT) AS status,
        |  CASE doc_id % 5 WHEN 3 THEN doc_id - 3 WHEN 4 THEN doc_id - 4
        |    ELSE doc_id END AS final_doc,
        |  CAST(CASE doc_id % 5 WHEN 3 THEN 1 WHEN 4 THEN 2
        |    ELSE 0 END AS BIGINT) AS n_hops,
        |  TRUE AS resolved
        |FROM documents ORDER BY doc_id""".stripMargin,

    // mime-sniff oracle: both the (wrong) declared label and the true
    // type the magic bytes must recover, straight from the rotation.
    "q_warc_mime_sniff" ->
      """SELECT doc_id,
        |  CASE doc_id % 5 WHEN 0 THEN 'text/html' WHEN 1 THEN 'image/png'
        |    WHEN 2 THEN 'application/octet-stream' WHEN 3 THEN 'text/plain'
        |    ELSE 'application/pdf' END AS declared,
        |  CASE doc_id % 5 WHEN 0 THEN 'image/png' WHEN 1 THEN 'application/pdf'
        |    WHEN 2 THEN 'text/html' WHEN 3 THEN 'audio/wav'
        |    ELSE 'text/plain' END AS sniffed,
        |  TRUE AS mislabeled
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Crawl-loop oracle: frontier top-50 → host-page resolution →
    // slot ≠ k gate → Knuth-hash queue with (k%3+1)s spacing → the
    // <5 s wave → the full WARC/HTTP framing arithmetic of exactly
    // those records (plus both buckets' warcinfo rows).
    "q_crawl_loop" ->
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
        |links AS (
        |  SELECT doc_id AS src, doc_id * 7 + j * 11 AS dst
        |  FROM documents, (SELECT unnest([0, 1, 2]) AS j)
        |  WHERE doc_id * 7 + j * 11 <> doc_id),
        |agg AS (
        |  SELECT dst, count(*) AS n_inlinks FROM links
        |  WHERE dst NOT IN (SELECT doc_id FROM documents) GROUP BY dst),
        |front AS (SELECT dst FROM agg ORDER BY n_inlinks DESC, dst ASC LIMIT 50),
        |cand AS (
        |  SELECT f.dst, d.source, d.text,
        |    'https://www.' || d.source || '.example.com/docs/' ||
        |      CAST(f.dst % 25 AS VARCHAR) || '/' AS url,
        |    CAST(regexp_extract(d.source, '(\\d+)', 1) AS BIGINT) % 25 AS k
        |  FROM front f CROSS JOIN nn
        |  JOIN documents d ON d.doc_id = f.dst % nn.n),
        |sched AS (
        |  SELECT dst, source, text, url, k, (k % 3 + 1) * 1000 AS delay_ms,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      ((dst % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |       + (dst % 65536) * 2654435761) % 4294967296, dst) - 1 AS pos
        |  FROM cand WHERE dst % 25 <> k),
        |wave AS (SELECT * FROM sched WHERE pos * delay_ms < 5000),
        |page AS (
        |  SELECT dst AS rec_key, url,
        |    ${warcHtmlSqlExpr("dst", "text")} AS html
        |  FROM wave),
        |resp AS (
        |  SELECT rec_key, 'response' AS warc_type, url AS target_uri,
        |    CAST(strlen('HTTP/1.1 200 OK') + 2
        |      + strlen('Content-Type: text/html; charset=utf-8') + 2
        |      + strlen('Content-Length: ' || CAST(strlen(html) AS VARCHAR)) + 2
        |      + 2 + strlen(html) AS BIGINT) AS content_length,
        |    CAST(200 AS BIGINT) AS http_status,
        |    'text/html; charset=utf-8' AS http_content_type,
        |    CAST(strlen(html) AS BIGINT) AS body_octets
        |  FROM page),
        |info AS (
        |  SELECT CAST(-(b + 1) AS BIGINT) AS rec_key, 'warcinfo' AS warc_type,
        |    CAST(NULL AS VARCHAR) AS target_uri,
        |    CAST(strlen('software: graft-warc/1.0') + 2
        |      + strlen('bucket: ' || CAST(b AS VARCHAR)) + 2 AS BIGINT) AS content_length,
        |    CAST(NULL AS BIGINT) AS http_status,
        |    CAST(NULL AS VARCHAR) AS http_content_type,
        |    CAST(strlen('software: graft-warc/1.0') + 2
        |      + strlen('bucket: ' || CAST(b AS VARCHAR)) + 2 AS BIGINT) AS body_octets
        |  FROM (SELECT unnest(range(2)) AS b))
        |SELECT * FROM info UNION ALL SELECT * FROM resp
        |ORDER BY rec_key""".stripMargin,

    // Polite-loop oracle: the surviving fetch queue rebuilt from the
    // candidate construction — trap candidates and fresh held slots
    // are absent BY CONSTRUCTION of the rebuild (the query require()s
    // their exclusion in-engine), stale slots carry their revalidation
    // mode/headers from the held copy, and ranks replay the
    // lastmod-DESC-NULLS-LAST / loc-ASC window over the survivors.
    "q_crawl_loop_polite" ->
      """WITH a AS (
        |  SELECT source || '.example.com' AS domain,
        |    'https://www.' || source || '.example.com/article/new-' ||
        |      CAST(doc_id AS VARCHAR) AS loc,
        |    CAST(NULL AS DATE) AS lastmod, 'new' AS action,
        |    'full' AS mode, CAST(NULL AS VARCHAR) AS if_none_match,
        |    CAST(NULL AS DATE) AS if_modified_since
        |  FROM documents),
        |d AS (
        |  SELECT DISTINCT source || '.example.com' AS domain,
        |    'https://www.' || source || '.example.com/stale/' ||
        |      CAST(doc_id % 10 AS VARCHAR) AS loc,
        |    CAST('2026-02-10' AS DATE) AS lastmod, 'refresh' AS action,
        |    CASE WHEN doc_id % 10 % 2 = 0 THEN 'conditional_etag'
        |         ELSE 'conditional_ims' END AS mode,
        |    CASE WHEN doc_id % 10 % 2 = 0
        |      THEN 'W/"' || CAST(doc_id % 10 AS VARCHAR) || '"' END
        |      AS if_none_match,
        |    CASE WHEN doc_id % 10 % 2 = 1
        |      THEN CAST('2026-01-05' AS DATE) END AS if_modified_since
        |  FROM documents),
        |q AS (SELECT * FROM a UNION ALL SELECT * FROM d),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY domain
        |    ORDER BY lastmod DESC NULLS LAST, loc ASC) AS rk
        |  FROM q)
        |SELECT domain, loc, action, mode, if_none_match,
        |  if_modified_since, CAST(rk AS BIGINT) AS fetch_rank
        |FROM r ORDER BY domain, fetch_rank""".stripMargin,

    // Two-wave crawl-loop oracle: wave 1 is the q_crawl_loop chain
    // verbatim; wave 2 re-runs frontier selection over the SAME inlink
    // aggregate minus wave-1 fetches (the warehouse-derived crawled
    // set), then the same gate/schedule/framing. The union, tagged by
    // wave, must equal the accumulated warehouse.
    "q_crawl_loop_waves" ->
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
        |links AS (
        |  SELECT doc_id AS src, doc_id * 7 + j * 11 AS dst
        |  FROM documents, (SELECT unnest([0, 1, 2]) AS j)
        |  WHERE doc_id * 7 + j * 11 <> doc_id),
        |agg AS (
        |  SELECT dst, count(*) AS n_inlinks FROM links
        |  WHERE dst NOT IN (SELECT doc_id FROM documents) GROUP BY dst),
        |front1 AS (SELECT dst FROM agg ORDER BY n_inlinks DESC, dst ASC LIMIT 50),
        |cand1 AS (
        |  SELECT f.dst, d.source, d.text,
        |    'https://www.' || d.source || '.example.com/docs/' ||
        |      CAST(f.dst % 25 AS VARCHAR) || '/' AS url,
        |    CAST(regexp_extract(d.source, '(\\d+)', 1) AS BIGINT) % 25 AS k
        |  FROM front1 f CROSS JOIN nn
        |  JOIN documents d ON d.doc_id = f.dst % nn.n),
        |sched1 AS (
        |  SELECT dst, source, text, url, k, (k % 3 + 1) * 1000 AS delay_ms,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      ((dst % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |       + (dst % 65536) * 2654435761) % 4294967296, dst) - 1 AS pos
        |  FROM cand1 WHERE dst % 25 <> k),
        |wave1 AS (SELECT * FROM sched1 WHERE pos * delay_ms < 5000),
        |front2 AS (
        |  SELECT dst FROM agg WHERE dst NOT IN (SELECT dst FROM wave1)
        |  ORDER BY n_inlinks DESC, dst ASC LIMIT 50),
        |cand2 AS (
        |  SELECT f.dst, d.source, d.text,
        |    'https://www.' || d.source || '.example.com/docs/' ||
        |      CAST(f.dst % 25 AS VARCHAR) || '/' AS url,
        |    CAST(regexp_extract(d.source, '(\\d+)', 1) AS BIGINT) % 25 AS k
        |  FROM front2 f CROSS JOIN nn
        |  JOIN documents d ON d.doc_id = f.dst % nn.n),
        |sched2 AS (
        |  SELECT dst, source, text, url, k, (k % 3 + 1) * 1000 AS delay_ms,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      ((dst % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |       + (dst % 65536) * 2654435761) % 4294967296, dst) - 1 AS pos
        |  FROM cand2 WHERE dst % 25 <> k),
        |wave2 AS (SELECT * FROM sched2 WHERE pos * delay_ms < 5000),
        |page AS (
        |  SELECT 1 AS wave, dst AS rec_key, url,
        |    ${warcHtmlSqlExpr("dst", "text")} AS html
        |  FROM wave1
        |  UNION ALL
        |  SELECT 2 AS wave, dst AS rec_key, url,
        |    ${warcHtmlSqlExpr("dst", "text")} AS html
        |  FROM wave2),
        |resp AS (
        |  SELECT CAST(wave AS BIGINT) AS wave, rec_key,
        |    'response' AS warc_type, url AS target_uri,
        |    CAST(strlen('HTTP/1.1 200 OK') + 2
        |      + strlen('Content-Type: text/html; charset=utf-8') + 2
        |      + strlen('Content-Length: ' || CAST(strlen(html) AS VARCHAR)) + 2
        |      + 2 + strlen(html) AS BIGINT) AS content_length,
        |    CAST(200 AS BIGINT) AS http_status,
        |    'text/html; charset=utf-8' AS http_content_type,
        |    CAST(strlen(html) AS BIGINT) AS body_octets
        |  FROM page),
        |info AS (
        |  SELECT CAST(w AS BIGINT) AS wave,
        |    CAST(-(b + 1) AS BIGINT) AS rec_key, 'warcinfo' AS warc_type,
        |    CAST(NULL AS VARCHAR) AS target_uri,
        |    CAST(strlen('software: graft-warc/1.0') + 2
        |      + strlen('bucket: ' || CAST(b AS VARCHAR)) + 2 AS BIGINT) AS content_length,
        |    CAST(NULL AS BIGINT) AS http_status,
        |    CAST(NULL AS VARCHAR) AS http_content_type,
        |    CAST(strlen('software: graft-warc/1.0') + 2
        |      + strlen('bucket: ' || CAST(b AS VARCHAR)) + 2 AS BIGINT) AS body_octets
        |  FROM (SELECT unnest(range(2)) AS b), (SELECT unnest([1, 2]) AS w))
        |SELECT * FROM info UNION ALL SELECT * FROM resp
        |ORDER BY wave, rec_key""".stripMargin,

    // Rank-weighted mix oracle: source-level edges from the outlink
    // synthesis, the 3-iteration BIGINT PageRank recursion (the
    // q_pagerank chain over the source graph), isqrt(rank) weights via
    // the float-seeded integer-corrected ladder, floor-div budgets, and
    // the Knuth-hash running take — every stage replayed from scratch.
    "q_mix_ranked" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |sid AS (SELECT doc_id,
        |  CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) AS sn
        |  FROM documents),
        |e AS (
        |  SELECT DISTINCT a.sn AS src, b.sn AS dst
        |  FROM documents d
        |  CROSS JOIN nn
        |  CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) js
        |  JOIN sid a ON a.doc_id = d.doc_id
        |  JOIN sid b ON b.doc_id = (d.doc_id * 7 + js.j * 11) % nn.n
        |  WHERE a.sn <> b.sn),
        |deg AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
        |n AS (SELECT DISTINCT src AS node FROM e),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM n),
        |c1 AS (SELECT e.dst, SUM(r0.pr // d.outd) AS s FROM e JOIN deg d ON e.src = d.src JOIN r0 ON e.src = r0.node GROUP BY e.dst),
        |r1 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS pr FROM n LEFT JOIN c1 ON n.node = c1.dst),
        |c2 AS (SELECT e.dst, SUM(r1.pr // d.outd) AS s FROM e JOIN deg d ON e.src = d.src JOIN r1 ON e.src = r1.node GROUP BY e.dst),
        |r2 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS pr FROM n LEFT JOIN c2 ON n.node = c2.dst),
        |c3 AS (SELECT e.dst, SUM(r2.pr // d.outd) AS s FROM e JOIN deg d ON e.src = d.src JOIN r2 ON e.src = r2.node GROUP BY e.dst),
        |r3 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS pr FROM n LEFT JOIN c3 ON n.node = c3.dst),
        |wts AS (
        |  SELECT 'src' || CAST(node AS VARCHAR) AS source,
        |    list_max([s for s in
        |      [CAST(floor(sqrt(CAST(pr AS DOUBLE))) AS BIGINT) + d for d in range(-4, 5)]
        |      if s >= 0 AND s*s <= pr]) AS w
        |  FROM r3),
        |bud AS (
        |  SELECT source,
        |    CAST(15000 * w // (SELECT sum(w) FROM wts) AS BIGINT) AS src_budget
        |  FROM wts),
        |toks AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |ranked AS (
        |  SELECT doc_id, source, n_tok,
        |    sum(n_tok) OVER (PARTITION BY source ORDER BY sk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |  FROM (
        |    SELECT doc_id, source, n_tok,
        |      ((doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |       + (doc_id % 65536) * 2654435761) % 4294967296 AS sk
        |    FROM toks) k)
        |SELECT r.doc_id, r.source, r.n_tok, b.src_budget,
        |  CAST(r.running AS BIGINT) AS running
        |FROM ranked r JOIN bud b USING (source)
        |WHERE r.running <= b.src_budget
        |ORDER BY r.doc_id""".stripMargin,

    // Sitemap-seed oracle: entries rebuilt from the slot/lastmod
    // synthesis rule (even-k domains direct, odd-k through the index —
    // same 10 entries either way once resolution works), crawled slots
    // anti-joined, newest-first per-domain rank replayed.
    "q_sitemap_seeds" -> sitemapSeedsOracleSql,

    // Codec-transparency gate: the SAME seed table must come out of the
    // gzipped/mixed BINARY sitemap fixture — shares the text path's
    // oracle verbatim.
    "q_sitemap_gz" -> sitemapSeedsOracleSql,

    // Charset round-trip: sniffed charset name + extracted text rebuilt
    // from the documents table and the shared marker rotation — a page
    // that decoded under the wrong charset can't reproduce its marker.
    "q_warc_charset" -> warcCharsetOracleSql,

    // Wire-encoding oracle: raw payload octets recomputed exactly for
    // identity (head arithmetic) and chunked (22 octets per full
    // 16-byte chunk = 2 hex + CRLF + data + CRLF; r+5 for the partial;
    // +5 for the 0-chunk terminator); compressed modes pin the decoded
    // octets and extraction instead (deflate streams aren't
    // SQL-rebuildable).
    "q_warc_encodings" ->
      """WITH page AS (
        |  SELECT doc_id, text,
        |    '<html>' || chr(10) || '<head>' || chr(10) || '<title>E' ||
        |    CAST(doc_id AS VARCHAR) || '</title>' || chr(10) || '</head>' || chr(10) ||
        |    '<body>' || chr(10) || '<h1>Encoding probe document headline</h1>' || chr(10) ||
        |    '<p>' || replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
        |    '</p>' || chr(10) || '</body>' || chr(10) || '</html>' || chr(10) AS html
        |  FROM documents),
        |m AS (SELECT doc_id, text, doc_id % 5 AS md, strlen(html) AS n FROM page)
        |SELECT doc_id,
        |  CASE md WHEN 0 THEN 'identity' WHEN 1 THEN 'chunked'
        |    WHEN 2 THEN 'gzip' WHEN 3 THEN 'gzip+chunked' ELSE 'deflate' END AS mode,
        |  CAST(CASE md
        |    WHEN 0 THEN strlen('HTTP/1.1 200 OK') + 2
        |      + strlen('Content-Type: text/html; charset=utf-8') + 2
        |      + strlen('Content-Length: ' || CAST(n AS VARCHAR)) + 2 + 2 + n
        |    WHEN 1 THEN strlen('HTTP/1.1 200 OK') + 2
        |      + strlen('Content-Type: text/html; charset=utf-8') + 2
        |      + strlen('Transfer-Encoding: chunked') + 2 + 2
        |      + (n // 16) * 22
        |      + CASE WHEN n % 16 > 0 THEN n % 16 + 5 ELSE 0 END + 5
        |  END AS BIGINT) AS payload_octets,
        |  CAST(n AS BIGINT) AS body_octets,
        |  'Encoding probe document headline' || chr(10) || text AS extracted
        |FROM m ORDER BY doc_id""".stripMargin,

    // Extraction must survive its own WET archive round-trip — the same
    // oracle once more.
    "q_warc_wet_roundtrip" -> textExtractOracleSql,

    // sentence oracle: every constructed sentence rebuilt — cap rule,
    // Dr. trap, the '..'-beats-%3 terminator ladder, and the by-
    // construction abbreviation dodge (a group whose last word's
    // trailing letter run is a guard-listed abbreviation takes '!'
    // where the rotation would give '.') — so a segmenter that splits
    // at the trap or misses a boundary breaks the hash.
    "q_text_sentences" ->
      """WITH w AS (
        |  SELECT doc_id, i - 1 AS wi,
        |    CASE WHEN (i - 1) % 6 = 0
        |      THEN upper(substr(lst[i], 1, 1)) || substr(lst[i], 2)
        |      ELSE lst[i] END AS w
        |  FROM (SELECT doc_id,
        |          list_filter(string_split(text, ' '), x -> x <> '') AS lst
        |        FROM documents),
        |       LATERAL (SELECT unnest(range(1, len(lst) + 1)) AS i) r)
        |SELECT doc_id, CAST(wi // 6 AS BIGINT) AS sidx,
        |  CASE WHEN (wi // 6) % 4 = 0 THEN 'Dr. ' ELSE '' END ||
        |  string_agg(w, ' ' ORDER BY wi) ||
        |  CASE WHEN (wi // 6) % 5 = 0 THEN '..'
        |       WHEN (doc_id + wi // 6) % 3 = 0
        |            AND lower(regexp_extract(arg_max(w, wi), '([A-Za-z]+)$', 1))
        |                IN ('dr','mr','mrs','ms','prof','sr','jr','st','no',
        |                    'vs','etc','eg','ie','fig','al') THEN '!'
        |       WHEN (doc_id + wi // 6) % 3 = 0 THEN '.'
        |       WHEN (doc_id + wi // 6) % 3 = 1 THEN '!'
        |       ELSE '?' END AS sentence
        |FROM w GROUP BY doc_id, wi // 6
        |ORDER BY doc_id, sidx""".stripMargin,

    // line-dedup oracle: the 8-word lining + boilerplate synthesis,
    // distinct-doc line frequencies, and the ordered rebuild — all
    // replayed; a fully-dropped doc would rebuild to '' on both sides.
    "q_line_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, i - 1 AS wi, lst[i] AS w
        |  FROM (SELECT doc_id,
        |          list_filter(string_split(text, ' '), x -> x <> '') AS lst
        |        FROM documents),
        |       LATERAL (SELECT unnest(range(1, len(lst) + 1)) AS i) r),
        |content AS (
        |  SELECT doc_id, wi // 8 AS pos, string_agg(w, ' ' ORDER BY wi) AS line
        |  FROM w GROUP BY doc_id, wi // 8),
        |nl AS (SELECT doc_id, max(pos) + 1 AS n FROM content GROUP BY doc_id),
        |alllines AS (
        |  SELECT doc_id, pos, line FROM content
        |  UNION ALL
        |  SELECT d.doc_id, nl.n, 'subscribe to ' || d.source || ' updates today'
        |  FROM documents d JOIN nl USING (doc_id)
        |  UNION ALL
        |  SELECT d.doc_id, nl.n + 1,
        |    'copyright 2026 ' || d.source || ' all rights reserved'
        |  FROM documents d JOIN nl USING (doc_id)),
        |freq AS (SELECT line, count(DISTINCT doc_id) AS df
        |  FROM alllines GROUP BY line),
        |j AS (SELECT a.doc_id, a.pos, a.line, f.df
        |  FROM alllines a JOIN freq f USING (line))
        |SELECT doc_id,
        |  CAST(count(*) FILTER (WHERE df < 5) AS BIGINT) AS n_kept,
        |  CAST(count(*) FILTER (WHERE df >= 5) AS BIGINT) AS n_dropped,
        |  COALESCE(string_agg(line, chr(10) ORDER BY pos)
        |    FILTER (WHERE df < 5), '') AS clean_text
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // canonicalization oracle: the fixed point every mess mode must
    // collapse back to (mode 0 is already canonical ⇒ changed = false).
    "q_url_canonicalize" ->
      """SELECT doc_id,
        |  'https://www.' || source || '.example.com/docs/' ||
        |    CAST(doc_id % 25 AS VARCHAR) || '/?id=' || CAST(doc_id AS VARCHAR) ||
        |    '&lang=' || lang AS url_canon,
        |  doc_id % 8 <> 0 AS changed
        |FROM documents ORDER BY doc_id""".stripMargin,

    // robots→sitemap chain oracle: one directive per domain, 10
    // advertised URLs each, the odd-k domains' count reachable only
    // through the index hop.
    "q_robots_sitemaps" ->
      """WITH src AS (
        |  SELECT DISTINCT source, source || '.example.com' AS domain,
        |    CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 25 AS k
        |  FROM documents)
        |SELECT domain,
        |  'https://www.' || domain || '/sitemap.xml' AS sitemap_url,
        |  CAST(10 AS BIGINT) AS n_urls,
        |  k % 2 = 1 AS via_index
        |FROM src ORDER BY domain""".stripMargin,

    // feed-seed oracle: the slot/March-date synthesis replayed, feed
    // kind from the domain parity, crawled slots anti-joined, the same
    // newest-first rank as the sitemap seeds.
    "q_feed_seeds" -> feedSeedsOracleSql,

    // The discovery twin is stream-static per batch + a pure rank over
    // the accumulated survivors ⇒ shares the batch oracle verbatim.
    "q_stream_seeds" -> feedSeedsOracleSql,

    // recrawl-plan oracle: action from the two date formulas — sitemap
    // lastmod (k+i)%28+1 vs slot-derived fetch date (slot*3)%28+1 for
    // crawled slots — and the per-domain newest-first queue over the
    // non-skip rows.
    "q_recrawl_plan" ->
      """WITH src AS (
        |  SELECT DISTINCT source, source || '.example.com' AS domain,
        |    CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 25 AS k
        |  FROM documents),
        |ent AS (
        |  SELECT s.source, s.domain, (s.k + ii.i) % 25 AS slot,
        |    'https://www.' || s.domain || '/docs/' ||
        |      CAST((s.k + ii.i) % 25 AS VARCHAR) AS loc,
        |    CAST('2026-01-' ||
        |      lpad(CAST((s.k + ii.i) % 28 + 1 AS VARCHAR), 2, '0') AS DATE)
        |      AS lastmod
        |  FROM src s CROSS JOIN (SELECT unnest(range(10)) AS i) ii),
        |crawled AS (SELECT DISTINCT source, doc_id % 25 AS slot FROM documents),
        |plan AS (
        |  SELECT e.domain, e.loc, e.lastmod,
        |    CASE WHEN c.slot IS NULL THEN 'new'
        |         WHEN e.lastmod > CAST('2026-01-' ||
        |           lpad(CAST((e.slot * 3) % 28 + 1 AS VARCHAR), 2, '0') AS DATE)
        |           THEN 'refresh'
        |         ELSE 'skip' END AS action
        |  FROM ent e LEFT JOIN crawled c
        |    ON c.source = e.source AND c.slot = e.slot),
        |todo AS (
        |  SELECT domain, loc,
        |    CAST(row_number() OVER (PARTITION BY domain
        |      ORDER BY lastmod DESC, loc ASC) AS BIGINT) AS fetch_rank
        |  FROM plan WHERE action <> 'skip')
        |SELECT p.domain, p.loc, p.action, t.fetch_rank
        |FROM plan p LEFT JOIN todo t ON t.domain = p.domain AND t.loc = p.loc
        |ORDER BY p.domain, p.loc""".stripMargin,

    // Changefreq-recrawl oracle: the q_recrawl_plan replay with the
    // period ladder folded in — revisit iff held, not refreshed, a
    // finite period advertised, and (2026-02-15 − fetched) ≥ period.
    "q_recrawl_changefreq" ->
      """WITH src AS (
        |  SELECT DISTINCT source, source || '.example.com' AS domain,
        |    CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 25 AS k
        |  FROM documents),
        |ent AS (
        |  SELECT s.source, s.domain, (s.k + ii.i) % 25 AS slot,
        |    'https://www.' || s.domain || '/docs/' ||
        |      CAST((s.k + ii.i) % 25 AS VARCHAR) AS loc,
        |    CAST('2026-01-' ||
        |      lpad(CAST((s.k + ii.i) % 28 + 1 AS VARCHAR), 2, '0') AS DATE)
        |      AS lastmod,
        |    CASE (s.k + ii.i) % 6 WHEN 0 THEN 'always' WHEN 1 THEN 'daily'
        |      WHEN 2 THEN 'weekly' WHEN 3 THEN 'monthly'
        |      WHEN 4 THEN 'yearly' ELSE 'never' END AS changefreq,
        |    CASE (s.k + ii.i) % 6 WHEN 0 THEN 1 WHEN 1 THEN 1
        |      WHEN 2 THEN 7 WHEN 3 THEN 30 WHEN 4 THEN 365 END AS period
        |  FROM src s CROSS JOIN (SELECT unnest(range(10)) AS i) ii),
        |crawled AS (SELECT DISTINCT source, doc_id % 25 AS slot FROM documents),
        |plan AS (
        |  SELECT e.domain, e.loc, e.lastmod, e.changefreq,
        |    CASE WHEN c.slot IS NULL THEN 'new'
        |         WHEN e.lastmod > CAST('2026-01-' ||
        |           lpad(CAST((e.slot * 3) % 28 + 1 AS VARCHAR), 2, '0')
        |           AS DATE) THEN 'refresh'
        |         WHEN e.period IS NOT NULL AND
        |           DATE '2026-02-15' - CAST('2026-01-' ||
        |             lpad(CAST((e.slot * 3) % 28 + 1 AS VARCHAR), 2, '0')
        |             AS DATE) >= e.period THEN 'revisit'
        |         ELSE 'skip' END AS action
        |  FROM ent e LEFT JOIN crawled c
        |    ON c.source = e.source AND c.slot = e.slot),
        |todo AS (
        |  SELECT domain, loc,
        |    CAST(row_number() OVER (PARTITION BY domain
        |      ORDER BY lastmod DESC, loc ASC) AS BIGINT) AS fetch_rank
        |  FROM plan WHERE action <> 'skip')
        |SELECT p.domain, p.loc, p.changefreq, p.action, t.fetch_rank
        |FROM plan p LEFT JOIN todo t ON t.domain = p.domain AND t.loc = p.loc
        |ORDER BY p.domain, p.loc""".stripMargin,

    // Conditional-refetch oracle: the plan replay above, then validators
    // (etag iff slot%3==0, Last-Modified always) pick each non-skip
    // row's mode, the even-slot conditional probes 304, and the ledger
    // aggregates per domain.
    "q_recrawl_conditional" ->
      """WITH src AS (
        |  SELECT DISTINCT source, source || '.example.com' AS domain,
        |    CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 25 AS k
        |  FROM documents),
        |ent AS (
        |  SELECT s.source, s.domain, (s.k + ii.i) % 25 AS slot,
        |    CAST('2026-01-' ||
        |      lpad(CAST((s.k + ii.i) % 28 + 1 AS VARCHAR), 2, '0') AS DATE)
        |      AS lastmod
        |  FROM src s CROSS JOIN (SELECT unnest(range(10)) AS i) ii),
        |crawled AS (SELECT DISTINCT source, doc_id % 25 AS slot FROM documents),
        |plan AS (
        |  SELECT e.domain, e.slot,
        |    CASE WHEN c.slot IS NULL THEN 'new'
        |         WHEN e.lastmod > CAST('2026-01-' ||
        |           lpad(CAST((e.slot * 3) % 28 + 1 AS VARCHAR), 2, '0') AS DATE)
        |           THEN 'refresh'
        |         ELSE 'skip' END AS action
        |  FROM ent e LEFT JOIN crawled c
        |    ON c.source = e.source AND c.slot = e.slot),
        |o AS (
        |  SELECT domain, slot,
        |    CASE WHEN action = 'new' THEN 'full'
        |         WHEN slot % 3 = 0 THEN 'conditional_etag'
        |         ELSE 'conditional_ims' END AS mode
        |  FROM plan WHERE action <> 'skip'),
        |f AS (
        |  SELECT domain, mode,
        |    CASE WHEN mode = 'full' THEN 200
        |         WHEN slot % 2 = 0 THEN 304 ELSE 200 END AS status,
        |    1000 + slot * 7 AS bytes
        |  FROM o)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_fetches,
        |  CAST(sum(CASE WHEN mode = 'full' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_full,
        |  CAST(sum(CASE WHEN mode LIKE 'conditional%' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_conditional,
        |  CAST(sum(CASE WHEN status = 304 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_304,
        |  CAST(sum(CASE WHEN status = 200 THEN bytes ELSE 0 END) AS BIGINT)
        |    AS bytes_transferred,
        |  CAST(sum(CASE WHEN status = 304 THEN bytes ELSE 0 END) AS BIGINT)
        |    AS bytes_saved
        |FROM f GROUP BY domain ORDER BY domain""".stripMargin,

    // robots.txt rule-table oracle: the template's rule rows rebuilt
    // per domain from the source→k rule — the parser must recover
    // exactly these (comments, blank lines, the crawl-delay line, and
    // the group structure all survive or are dropped correctly).
    "q_robots_rules" ->
      """WITH src AS (
        |  SELECT DISTINCT source, source || '.example.com' AS domain,
        |    CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 25 AS k
        |  FROM documents)
        |SELECT domain, r.agent AS agent, r.line_no AS line_no,
        |  r.rtype AS rtype,
        |  replace(replace(replace(r.value, '<K>', CAST(k AS VARCHAR)),
        |          '<D>', CAST(k % 3 + 1 AS VARCHAR)), '<ROOT>', '/') AS value
        |FROM src, UNNEST([
        |  {'agent': '*', 'line_no': CAST(2 AS BIGINT), 'rtype': 'disallow', 'value': '/private/'},
        |  {'agent': '*', 'line_no': CAST(3 AS BIGINT), 'rtype': 'disallow', 'value': '/docs/3/'},
        |  {'agent': '*', 'line_no': CAST(4 AS BIGINT), 'rtype': 'allow', 'value': '/docs/3/open/'},
        |  {'agent': '*', 'line_no': CAST(5 AS BIGINT), 'rtype': 'crawl-delay', 'value': '2'},
        |  {'agent': 'graftbot', 'line_no': CAST(8 AS BIGINT), 'rtype': 'allow', 'value': '/docs/'},
        |  {'agent': 'graftbot', 'line_no': CAST(9 AS BIGINT), 'rtype': 'disallow', 'value': '/docs/<K>/'},
        |  {'agent': 'graftbot', 'line_no': CAST(10 AS BIGINT), 'rtype': 'disallow', 'value': '/tmp/'},
        |  {'agent': 'graftbot', 'line_no': CAST(11 AS BIGINT), 'rtype': 'crawl-delay', 'value': '<D>'},
        |  {'agent': 'graftbot', 'line_no': CAST(12 AS BIGINT), 'rtype': 'disallow', 'value': '<ROOT>'}
        |]) AS t(r)
        |WHERE r.value <> '<ROOT>' OR k % 5 = 0
        |ORDER BY domain, agent, line_no""".stripMargin,

    // Gate oracle: the longest-match ladder replayed generically — the
    // graftbot group's reconstructed rules joined to every URL on
    // prefix match, winner = max lexicographic (len, is_allow, path,
    // type) struct, exactly the Spark side's row-local fold.
    "q_robots_gate" -> robotsGateOracleSql,

    // Wildcard-gate oracle: one fixed rule set, six URL shapes, every
    // verdict pinned by construction — allowed/matched_path/matched_allow
    // are literals per shape, so any wildcard mis-match (under-block,
    // over-block past a $ anchor, or a precedence flip against the
    // longer anchored Allow) breaks the hash.
    "q_robots_wildcards" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://www.' || source || '.example.com' AS host,
        |    CAST(doc_id % 25 AS VARCHAR) AS slot,
        |    CAST(doc_id % 30 + 2000 AS VARCHAR) AS yr,
        |    CAST(doc_id AS VARCHAR) AS id
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, 0 AS shape,
        |    host || '/docs/' || slot || '/open' AS url, TRUE AS allowed,
        |    '/docs/*/open$' AS matched_path, TRUE AS matched_allow FROM u
        |  UNION ALL SELECT doc_id, 1, host || '/docs/' || slot || '/page',
        |    FALSE, '/docs/', FALSE FROM u
        |  UNION ALL SELECT doc_id, 2,
        |    host || '/page/' || id || '?sid=' || id, FALSE, '/*?sid=',
        |    FALSE FROM u
        |  UNION ALL SELECT doc_id, 3,
        |    host || '/files/report' || id || '.pdf', FALSE, '/*.pdf$',
        |    FALSE FROM u
        |  UNION ALL SELECT doc_id, 4,
        |    host || '/files/report' || id || '.pdfx', TRUE, NULL, NULL
        |    FROM u
        |  UNION ALL SELECT doc_id, 5, host || '/cal/' || yr || '/print',
        |    FALSE, '/cal/*/print', FALSE FROM u)
        |SELECT doc_id, CAST(shape AS BIGINT) AS shape, url, allowed,
        |  matched_path, matched_allow
        |FROM s ORDER BY doc_id, shape""".stripMargin,

    // The gate is per-row over a static broadcast table ⇒ the bounded
    // stream shares the batch oracle verbatim.
    "q_stream_robots_gate" -> robotsGateOracleSql,

    // Anchor-text oracle: the same synthetic outlink graph (3 arithmetic
    // targets per doc, leading-trigram anchors, self-links dropped),
    // (dst, anchor) frequencies + distinct sources, inlink totals, and
    // the (freq DESC, anchor ASC) top-2 window replayed.
    "q_anchor_texts" -> anchorOracleSql,

    // Anchor stats are pure aggregates of the link set ⇒ the bounded
    // stream shares the batch oracle verbatim.
    "q_stream_anchor_texts" -> anchorOracleSql,

    // Frontier oracle: un-modded targets, inlink/distinct-source counts,
    // crawled ids anti-joined away, the (n_inlinks DESC, dst) top-50.
    "q_crawl_frontier" ->
      """WITH links AS (
        |  SELECT doc_id AS src, doc_id * 7 + j * 11 AS dst
        |  FROM documents, (SELECT unnest([0, 1, 2]) AS j)
        |  WHERE doc_id * 7 + j * 11 <> doc_id),
        |agg AS (
        |  SELECT dst, CAST(count(*) AS BIGINT) AS n_inlinks,
        |    CAST(count(DISTINCT src) AS BIGINT) AS n_srcs
        |  FROM links
        |  WHERE dst NOT IN (SELECT doc_id FROM documents)
        |  GROUP BY dst),
        |top AS (
        |  SELECT * FROM agg ORDER BY n_inlinks DESC, dst ASC LIMIT 50)
        |SELECT CAST(row_number() OVER (ORDER BY n_inlinks DESC, dst ASC)
        |    AS BIGINT) AS rank,
        |  dst, n_inlinks, n_srcs
        |FROM top ORDER BY rank""".stripMargin,

    // Crawl-trap oracle: the three fixture shapes collapse to three
    // templates per source by construction — article/#-# with per-doc
    // content, cal/#/#/#?sid with one boilerplate page per source,
    // list?page&ref cycling 40 content variants — so the per-template
    // ledger is rebuilt from per-source counts alone, and the verdict
    // thresholds (n_urls >= 10, diversity <= 0.2) replay literally.
    // Shared VERBATIM by the exact, sketch (KMV exact regime), and
    // streaming forms.
    "q_crawl_traps" -> crawlTrapsOracleSql,
    "q_crawl_traps_sketch" -> crawlTrapsOracleSql,
    "q_stream_traps" -> crawlTrapsOracleSql,

    // Canonical-frontier oracle: the frontier replayed over page NUMBERS
    // (spelling collapse is by construction — the engine's job), with
    // the canonical strings rebuilt only for output and the url-string
    // tie-break; crawled pages 0-99 drop as `td >= 100`, self-links as
    // `sp <> td`, both regardless of spelling.
    "q_frontier_canon" ->
      """WITH l AS (
        |  SELECT d.doc_id % 100 AS sp, (d.doc_id * 7 + r.j * 11) % 200 AS td
        |  FROM documents d, LATERAL (SELECT unnest(range(0, 3)) AS j) r),
        |agg AS (
        |  SELECT td, CAST(count(*) AS BIGINT) AS n_inlinks,
        |    CAST(count(DISTINCT sp) AS BIGINT) AS n_srcs
        |  FROM l WHERE sp <> td AND td >= 100
        |  GROUP BY td),
        |top AS (
        |  SELECT 'https://www.w' || CAST(td % 20 AS VARCHAR) || '.example.com/p/' ||
        |    CAST(td AS VARCHAR) || '/?id=' || CAST(td AS VARCHAR) AS url,
        |    n_inlinks, n_srcs
        |  FROM agg ORDER BY n_inlinks DESC, url ASC LIMIT 50)
        |SELECT CAST(row_number() OVER (ORDER BY n_inlinks DESC, url ASC)
        |    AS BIGINT) AS rank,
        |  url, n_inlinks, n_srcs
        |FROM top ORDER BY rank""".stripMargin,

    // Schedule oracle: allowed = slot ≠ the domain's Disallow slot (the
    // gate oracle's conclusion applied directly), delay = the graftbot
    // group's (k % 3 + 1) seconds, queue position = Knuth-hash order
    // within the domain.
    "q_crawl_schedule" ->
      """WITH src AS (
        |  SELECT DISTINCT source, source || '.example.com' AS domain,
        |    CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 25 AS k
        |  FROM documents),
        |allowed AS (
        |  SELECT d.doc_id, s.domain, s.k,
        |    ((d.doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |     + (d.doc_id % 65536) * 2654435761) % 4294967296 AS sk
        |  FROM documents d JOIN src s ON s.source = d.source
        |  WHERE d.doc_id % 25 <> s.k)
        |SELECT doc_id, domain,
        |  CAST((k % 3 + 1) * 1000 AS BIGINT) AS delay_ms,
        |  CAST(row_number() OVER (PARTITION BY domain ORDER BY sk, doc_id) - 1
        |    AS BIGINT) AS pos,
        |  CAST((row_number() OVER (PARTITION BY domain ORDER BY sk, doc_id) - 1)
        |    * (k % 3 + 1) * 1000 AS BIGINT) AS fetch_at_ms
        |FROM allowed ORDER BY doc_id""".stripMargin,

    // Registrable-domain schedule oracle: gate decision (slot <> k),
    // per-host delay (graftbot's k%3+1), site labels rebuilt from the
    // k%4 construction, queue delay = window max over the site's
    // admitted rows, queue position = Knuth-hash order within the SITE.
    "q_crawl_schedule_host" ->
      """WITH src AS (
        |  SELECT DISTINCT source,
        |    CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 25 AS k
        |  FROM documents),
        |h AS (
        |  SELECT source, k,
        |    source || CASE k % 4 WHEN 0 THEN '.market.co.uk'
        |      WHEN 1 THEN '.deals.co.uk' WHEN 2 THEN '.g2.example'
        |      ELSE '.g3.example' END AS domain,
        |    CASE k % 4 WHEN 0 THEN 'market.co.uk' WHEN 1 THEN 'deals.co.uk'
        |      WHEN 2 THEN 'g2.example' ELSE 'g3.example' END AS reg_domain
        |  FROM src),
        |allowed AS (
        |  SELECT d.doc_id, h.domain, h.reg_domain, h.k,
        |    ((d.doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |     + (d.doc_id % 65536) * 2654435761) % 4294967296 AS sk
        |  FROM documents d JOIN h ON h.source = d.source
        |  WHERE d.doc_id % 25 <> h.k)
        |SELECT doc_id, domain, reg_domain,
        |  CAST((k % 3 + 1) * 1000 AS BIGINT) AS delay_ms,
        |  CAST(max((k % 3 + 1) * 1000) OVER (PARTITION BY reg_domain)
        |    AS BIGINT) AS queue_delay_ms,
        |  CAST(row_number() OVER (PARTITION BY reg_domain ORDER BY sk, doc_id)
        |    - 1 AS BIGINT) AS pos,
        |  CAST((row_number() OVER (PARTITION BY reg_domain ORDER BY sk, doc_id) - 1)
        |    * max((k % 3 + 1) * 1000) OVER (PARTITION BY reg_domain)
        |    AS BIGINT) AS fetch_at_ms
        |FROM allowed ORDER BY doc_id""".stripMargin,

    // Per-bucket manifest rollup: responses grouped by doc_id % 4 plus
    // each file's warcinfo record; identical arithmetic for the gzipped
    // bucket 0 (codec transparency).
    "q_warc_stats" ->
      s"""WITH page AS ($warcPageSql),
        |resp AS (
        |  SELECT doc_id % 4 AS bucket, strlen(html) AS body_o,
        |    strlen('HTTP/1.1 200 OK') + 2
        |      + strlen('Content-Type: text/html; charset=utf-8') + 2
        |      + strlen('Content-Length: ' || CAST(strlen(html) AS VARCHAR)) + 2
        |      + 2 + strlen(html) AS pay_o
        |  FROM page),
        |agg AS (
        |  SELECT bucket, count(*) AS nr, CAST(sum(pay_o) AS BIGINT) AS pay,
        |    CAST(sum(body_o) AS BIGINT) AS body
        |  FROM resp GROUP BY bucket),
        |info AS (
        |  SELECT b AS bucket,
        |    strlen('software: graft-warc/1.0') + 2
        |      + strlen('bucket: ' || CAST(b AS VARCHAR)) + 2 AS io
        |  FROM (SELECT unnest(range(4)) AS b))
        |SELECT i.bucket AS bucket,
        |  CAST(coalesce(a.nr, 0) + 1 AS BIGINT) AS n_records,
        |  CAST(coalesce(a.nr, 0) AS BIGINT) AS n_responses,
        |  CAST(coalesce(a.pay, 0) + i.io AS BIGINT) AS payload_octets,
        |  CAST(coalesce(a.body, 0) + i.io AS BIGINT) AS body_octets
        |FROM info i LEFT JOIN agg a ON a.bucket = i.bucket
        |ORDER BY bucket""".stripMargin,

    "q_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // epoch_us comparisons on both bounds — matches the stream side's
    // micros-truncated timestamps exactly (2h = 7_200_000_000 us).
    "q_stream_join" ->
      """SELECT v.user_id, v.event_id AS view_event_id,
        |  p.event_id AS purchase_event_id,
        |  epoch_us(p.ts) - epoch_us(v.ts) AS delta_us
        |FROM events v JOIN events p
        |  ON v.user_id = p.user_id
        | AND v.event_type = 'view' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts) >= epoch_us(v.ts)
        | AND epoch_us(p.ts) <= epoch_us(v.ts) + 7200000000
        |ORDER BY 1, 2, 3""".stripMargin,

    "q_stream_dedup" ->
      """SELECT DISTINCT array_to_string(list_slice(regexp_split_to_array(trim(lower(text)), '\s+'), 1, 5), ' ') AS key5
        |FROM documents ORDER BY key5""".stripMargin,

    "q_stream_dedup_wm" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    // The multi-batch streaming upsert must land exactly the batch
    // latest-per-user dedup. ts is parquet nanos (TIMESTAMP_NS in DuckDB,
    // normalized to MICROSECONDS in Spark before ranking) — so the oracle
    // must RANK on epoch_us(ts) too, not the raw ns timestamp: two events
    // in the same microsecond but different nanoseconds would otherwise
    // elect different winners across the engines.
    "q_stream_upsert" ->
      """SELECT user_id, event_id, epoch_us(ts) AS us, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) e
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // Upsampling: same split-16 Knuth slot as the stratified sample; copy
    // counts in exact integers, copies via range unnest.
    "q_sample_epochs" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    ((doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |     + (doc_id % 65536) * 2654435761) % 4294967296 % 1000 AS slot,
        |    CASE source WHEN 'src0' THEN 2300 WHEN 'src1' THEN 500
        |                WHEN 'src2' THEN 1000 ELSE 0 END AS pm
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, source,
        |    pm // 1000 + CASE WHEN slot < pm % 1000 THEN 1 ELSE 0 END AS n
        |  FROM d)
        |SELECT doc_id, source, CAST(e.epoch AS BIGINT) AS epoch
        |FROM n, LATERAL (SELECT unnest(range(0, n)) AS epoch) e
        |ORDER BY doc_id, epoch""".stripMargin,

    // Time decay: per-term 6dp rounding then decimal sums; age from exact
    // integer micros so the double division is engine-identical.
    "q_decay_agg" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, value FROM events
        |  WHERE epoch_us(ts) <= 1705276800000000 AND value IS NOT NULL),
        |w AS (
        |  SELECT user_id,
        |    CAST(ROUND(exp(-(ln(2) / 7.0) * ((1705276800000000 - us) / 86400000000.0))
        |      * value, 6) AS DECIMAL(18,6)) AS wv,
        |    CAST(ROUND(exp(-(ln(2) / 7.0) * ((1705276800000000 - us) / 86400000000.0)),
        |      6) AS DECIMAL(18,6)) AS w
        |  FROM e)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(wv) AS DOUBLE) AS decayed_sum,
        |  CAST(SUM(w) AS DOUBLE) AS decayed_count
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,

    // SCD2: first row opens run 1 explicitly (ROW_NUMBER=1) so a null
    // first attribute cannot diverge from Spark's null-struct lag compare.
    "q_scd2_history" ->
      """WITH h AS (
        |  SELECT o_custkey AS k, o_orderstatus AS attr, o_orderdate AS ts,
        |    o_orderkey AS tb FROM orders),
        |f AS (
        |  SELECT k, attr, ts, tb,
        |    CASE WHEN ROW_NUMBER() OVER w = 1
        |           OR attr IS DISTINCT FROM LAG(attr) OVER w
        |         THEN 1 ELSE 0 END AS chg
        |  FROM h WINDOW w AS (PARTITION BY k ORDER BY ts, tb)),
        |r AS (
        |  SELECT k, attr, ts,
        |    SUM(chg) OVER (PARTITION BY k ORDER BY ts, tb
        |                   ROWS UNBOUNDED PRECEDING) AS run
        |  FROM f),
        |g AS (SELECT k, run, MIN(ts) AS valid_from, MIN(attr) AS attr
        |      FROM r GROUP BY 1, 2),
        |v AS (
        |  SELECT k, attr, valid_from,
        |    LEAD(valid_from) OVER (PARTITION BY k ORDER BY run) AS valid_to
        |  FROM g)
        |SELECT k AS o_custkey, attr AS o_orderstatus, valid_from, valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM v ORDER BY o_custkey, valid_from, o_orderstatus""".stripMargin,

    "q_join_bucketed" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_partition_pruning" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // One UNION ALL branch per rule, each re-deriving the count the
    // engine's fused single-pass aggregation produces; NULL rule results
    // count as violations on both sides.
    "q_expectations" ->
      """SELECT * FROM (
        |  SELECT 'not_null:l_orderkey' AS rule,
        |    CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_violations,
        |    COUNT(*) AS n_rows
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range:l_quantity',
        |    CAST(SUM(CASE WHEN NOT COALESCE(
        |      l_quantity >= 1 AND l_quantity <= 30, FALSE)
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    COUNT(*)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'in_set:l_returnflag',
        |    CAST(SUM(CASE WHEN NOT COALESCE(
        |      l_returnflag IN ('A', 'N'), FALSE)
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    COUNT(*)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'matches:l_linestatus',
        |    CAST(SUM(CASE WHEN NOT COALESCE(
        |      regexp_matches(l_linestatus, '^[FO]$'), FALSE)
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    COUNT(*)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'unique:l_orderkey,l_linenumber',
        |    CAST(COALESCE(SUM(c - 1), 0) AS BIGINT),
        |    CAST(COALESCE(SUM(c), 0) AS BIGINT)
        |  FROM (SELECT COUNT(*) AS c FROM lineitem
        |        GROUP BY l_orderkey, l_linenumber)
        |  UNION ALL
        |  SELECT 'fk:l_orderkey->o_orderkey',
        |    (SELECT COUNT(*) FROM lineitem l
        |     WHERE l_orderkey IS NOT NULL AND NOT EXISTS
        |       (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        |    (SELECT COUNT(*) FROM lineitem))
        |ORDER BY rule""".stripMargin,

    // Zone-map read ≡ plain full-scan filter: the skipping must be
    // invisible in the result. Timestamp bounds mirror the Spark casts.
    "q_zonemap_skip" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
        |  CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(l_shipdate AS DATE) AS d,
        |  CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate <= TIMESTAMP '1996-03-31 00:00:00'
        |ORDER BY 1, 2""".stripMargin,

    // Bloom-index point read ≡ plain filter: the index must be
    // result-invisible (it only prunes files; the residual filter is
    // exact).
    "q_bloom_index" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
        |  CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(l_shipdate AS DATE) AS d,
        |  CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem WHERE l_orderkey = 5988
        |ORDER BY l_linenumber""".stripMargin,

    "q_source_formats" ->
      """SELECT n_nationkey, n_name, n_regionkey, via FROM (
        |  SELECT n_nationkey, n_name, n_regionkey, 'orc' AS via FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, n_name, n_regionkey, 'json' AS via FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, n_name, n_regionkey, 'csv' AS via FROM nation) u
        |ORDER BY via, n_nationkey""".stripMargin,

    // range(stop exclusive) generates exactly the starts < max(len-50, 1)
    "q_text_chunks" ->
      """SELECT doc_id, st // 150 AS chunk_id, substring(text, CAST(st AS INT) + 1, 200) AS chunk
        |FROM (SELECT doc_id, text, unnest(range(0, greatest(length(text) - 50, 1), 150)) AS st FROM documents)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // CAST the SUM: DuckDB SUM(BIGINT) yields HUGEINT (int128), which some
    // client serializations render differently from Spark's BIGINT — the
    // cast pins both engines to the same 64-bit surface type.
    "q_json_props" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_corpus_pipeline" ->
      """WITH RECURSIVE
        |stats AS (SELECT doc_id, text,
        |  CASE WHEN trim(text) = '' OR text IS NULL THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS n_tok
        |  FROM documents),
        |quality AS (SELECT * FROM stats WHERE n_tokens >= 30 AND n_punct >= 0),
        |keyed AS (SELECT *, array_to_string(list_slice(regexp_split_to_array(trim(lower(text)), '\s+'), 1, 5), ' ') AS key5 FROM quality),
        |exact AS (SELECT * FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY key5 ORDER BY doc_id) AS rn FROM keyed) k
        |  WHERE rn = 1),
        |toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM exact),
        |sh AS (
        |  SELECT DISTINCT doc_id, list_extract(tk, i) || ' ' || list_extract(tk, i+1) || ' ' || list_extract(tk, i+2) AS s
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk)-1)) AS i) r
        |  WHERE len(tk) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(tk, ' ') AS s FROM toks WHERE len(tk) < 3
        |),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT x.doc_id AS idA, y.doc_id AS idB, count(*) AS c
        |  FROM sh x JOIN sh y USING (s) WHERE x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT idA, idB FROM common
        |  JOIN sizes na ON na.doc_id = idA
        |  JOIN sizes nb ON nb.doc_id = idB
        |  WHERE CAST(c AS DOUBLE) / (na.n_sh + nb.n_sh - c) >= 0.2),
        |edges AS (SELECT idA AS src, idB AS dst FROM pairs UNION ALL SELECT idB AS src, idA AS dst FROM pairs),
        |cc(id, label) AS (
        |  SELECT doc_id, doc_id FROM exact
        |  UNION
        |  SELECT e.dst, cc.label FROM edges e JOIN cc ON cc.id = e.src
        |),
        |surv AS (
        |  SELECT x.doc_id, x.n_tok FROM exact x
        |  JOIN (SELECT id, MIN(label) AS lab FROM cc GROUP BY id) m
        |    ON m.id = x.doc_id AND m.lab = x.doc_id),
        |cum AS (SELECT doc_id, n_tok,
        |  SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM surv)
        |SELECT doc_id, n_tok FROM cum WHERE cum <= 10000 ORDER BY doc_id""".stripMargin,

    // v2 ladder oracle: the v1 chain's CTEs with the substring-removal
    // block (gram-level canonical election, k=4) spliced between exact
    // dedup and shingling, token counts recomputed from clean_text, and a
    // second recursive-CC block for the semantic stage (double-precision
    // sequential list math, same contract as q_dedup_embedding_exact).
    // Docs without an embedding survive semantics as singletons because
    // scc seeds from ALL fuzzy survivors while edges exist only among
    // embedded docs — the same pass-through the Spark side's left join
    // implements.
    "q_corpus_pipeline_v2" ->
      (corpusLadderCtes +
        "\nSELECT doc_id, n_tok, n_removed FROM cum WHERE cum <= 10000 ORDER BY doc_id"),

    "q_curate_multimodal" -> curateMultimodalOracleSql,

    // Ladder CTEs + seeded double-Knuth split (q_corpus_split idiom) +
    // the q_pack_sequences prefix-sum over the TRAIN slice only + the
    // q_corpus_shuffle shard hash — every stage the Spark side composes,
    // re-derived in one SQL chain.
    "q_train_pipeline" ->
      (corpusLadderCtes + """,
        |curated AS (SELECT doc_id, n_tok FROM cum WHERE cum <= 10000),
        |sp1 AS (
        |  SELECT doc_id, n_tok,
        |    ((doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |     + (doc_id % 65536) * 2654435761) % 4294967296 AS s1
        |  FROM curated),
        |sp2 AS (
        |  SELECT doc_id, n_tok, s1,
        |    (((s1 + 42) % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |     + ((s1 + 42) % 65536) * 2654435761) % 4294967296 AS sk
        |  FROM sp1),
        |spl AS (
        |  SELECT doc_id, n_tok, s1,
        |    CAST(CASE WHEN sk % 1000 < 800 THEN 0 WHEN sk % 1000 < 900 THEN 1 ELSE 2 END AS BIGINT) AS split
        |  FROM sp2),
        |pcum AS (
        |  SELECT doc_id, n_tok, s1,
        |    SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc
        |  FROM spl WHERE split = 0),
        |packed AS (
        |  SELECT doc_id,
        |    CAST((pc - n_tok) // 512 AS BIGINT) AS seq_id,
        |    (n_tok > 0 AND (pc - 1) // 512 <> (pc - n_tok) // 512) AS is_split,
        |    (((s1 + 43) % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |     + ((s1 + 43) % 65536) * 2654435761) % 4294967296 AS shk
        |  FROM pcum),
        |sharded AS (
        |  SELECT doc_id, seq_id, is_split, shk % 8 AS shard,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY shk % 8 ORDER BY shk, doc_id) - 1 AS BIGINT) AS pos
        |  FROM packed)
        |SELECT s.doc_id, s.n_tok, s.split, p.seq_id, p.is_split, p.shard, p.pos
        |FROM spl s LEFT JOIN sharded p ON s.doc_id = p.doc_id
        |ORDER BY s.doc_id""".stripMargin),

    "q_asof_join" ->
      """SELECT c.event_id, c.user_id, c.ts, v.event_id AS view_event_id, v.value AS view_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,

    "q_overlap_join" ->
      """SELECT v.event_id AS view_event_id, p.event_id AS purchase_event_id
        |FROM events v JOIN events p
        |  ON v.user_id = p.user_id
        | AND v.ts < p.ts + INTERVAL 1 HOUR
        | AND p.ts < v.ts + INTERVAL 1 HOUR
        |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        |ORDER BY view_event_id, purchase_event_id""".stripMargin,

    "q_range_join" ->
      """SELECT v.event_id AS view_event_id, c.event_id AS click_event_id
        |FROM events v JOIN events c
        |  ON v.user_id = c.user_id
        | AND c.ts >= v.ts AND c.ts < v.ts + INTERVAL 1 DAY
        |WHERE v.event_type = 'view' AND c.event_type = 'click'
        |ORDER BY view_event_id, click_event_id""".stripMargin,

    // The oracle computes the same running total with a plain global window
    // — DuckDB doesn't mind the single-stream scan the Spark side avoids.
    "q_token_budget" ->
      """SELECT doc_id, n_tok FROM (
        |  SELECT doc_id, n_tok,
        |    SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM (SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS n_tok FROM documents)
        |) t WHERE cum <= 15000 ORDER BY doc_id""".stripMargin,

    // Embedding similarity oracles use explicit double-precision list math
    // (NOT list_cosine_similarity, which computes in float32 and diverges in
    // the 7th decimal) — verified bit-identical to Spark's sequential
    // zip_with/aggregate double summation.
    "q_dedup_embedding_exact" ->
      """SELECT a.vec_id AS idA, b.vec_id AS idB,
        |  ROUND(list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 200 AND b.vec_id < 200
        |  AND list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.2
        |ORDER BY idA, idB""".stripMargin,

    "q_mine_hard_negatives" ->
      """SELECT query_id, query_label, rank, neighbor_id, neighbor_label, cosine FROM (
        |  SELECT q.vec_id AS query_id, q.label AS query_label,
        |    c.vec_id AS neighbor_id, c.label AS neighbor_label,
        |    ROUND(list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC, c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id <> c.vec_id AND q.label <> c.label
        |  WHERE q.vec_id < 16) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_text_unigram_lp" ->
      """WITH toks AS (
        |  SELECT doc_id, t.term FROM documents,
        |    UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS t(term)
        |  WHERE t.term <> ''),
        |tc AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
        |tot AS (SELECT SUM(c) AS n_total FROM tc),
        |probs AS (
        |  SELECT term,
        |    CAST(ROUND(LN(CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS lp
        |  FROM tc, tot),
        |pd AS (
        |  SELECT doc_id, COUNT(*) AS n_tok, SUM(lp) AS slp
        |  FROM toks JOIN probs USING (term) GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(pd.n_tok, 0) AS n_tok,
        |  CAST(pd.slp AS DOUBLE) / CAST(pd.n_tok AS DOUBLE) AS avg_lp
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Bigram twin of the unigram LM oracle: conditional probs from the
    // bigram table and its head-marginal; same 6dp-round-then-decimal-sum
    // determinism contract. split_part is unambiguous: tokens are
    // whitespace-split, so the first space in "w1 w2" separates the head.
    "q_text_bigram_lp" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                             t -> t <> '') AS tk
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, list_extract(tk, i) || ' ' || list_extract(tk, i + 1) AS bigram
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
        |  WHERE len(tk) >= 2),
        |c2 AS (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram),
        |c1 AS (SELECT split_part(bigram, ' ', 1) AS h, SUM(c) AS hc FROM c2 GROUP BY 1),
        |probs AS (
        |  SELECT bigram,
        |    CAST(ROUND(LN(CAST(c AS DOUBLE) / CAST(hc AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS lp
        |  FROM c2 JOIN c1 ON split_part(bigram, ' ', 1) = h),
        |pd AS (
        |  SELECT doc_id, COUNT(*) AS n_bigrams, SUM(lp) AS slp
        |  FROM bg JOIN probs USING (bigram) GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(pd.n_bigrams, 0) AS n_bigrams,
        |  CAST(pd.slp AS DOUBLE) / CAST(pd.n_bigrams AS DOUBLE) AS avg_lp2
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // DSIR weights: hashed feature buckets via the md5-prefix hash both
    // engines compute identically; each smoothed ln rounded to 6dp and
    // the bucket difference + per-doc sum carried in exact DECIMAL; the
    // one final CAST to DOUBLE maps the same exact decimal to the same
    // double on both engines.
    "q_dsir_weights" -> dsirWeightsOracleSql,

    // Streaming DSIR: bucket counts are pure multiset functions of the
    // input, so stream ≡ batch and the batch SQL gates the streaming
    // query verbatim (full hash).
    "q_stream_dsir" -> dsirWeightsOracleSql,

    // DSIR top-k: identical derivation, cut under the total order.
    "q_dsir_select" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                t -> t <> '') AS tk
        |  FROM documents),
        |feats AS (
        |  SELECT doc_id, lang, t.f AS feat FROM toks, UNNEST(tk) AS t(f)
        |  UNION ALL
        |  SELECT doc_id, lang, list_extract(tk, i) || ' ' || list_extract(tk, i + 1) AS feat
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
        |  WHERE len(tk) >= 2),
        |fb AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(feat), 1, 8)) AS BIGINT) % 4096 AS bucket
        |  FROM feats),
        |ct AS (SELECT bucket, COUNT(*) AS ct FROM fb WHERE lang = 'en' GROUP BY 1),
        |cr AS (SELECT bucket, COUNT(*) AS cr FROM fb WHERE lang <> 'en' GROUP BY 1),
        |nt AS (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) AS nt FROM ct),
        |nr AS (SELECT CAST(COALESCE(SUM(cr), 0) AS BIGINT) AS nr FROM cr),
        |lr AS (
        |  SELECT cr.bucket,
        |    CAST(ROUND(LN((CAST(COALESCE(ct.ct, 0) AS DOUBLE) + 1)
        |                  / (CAST(nt.nt AS DOUBLE) + 4096)), 6) AS DECIMAL(18,6))
        |    - CAST(ROUND(LN((CAST(cr.cr AS DOUBLE) + 1)
        |                  / (CAST(nr.nr AS DOUBLE) + 4096)), 6) AS DECIMAL(18,6)) AS lr
        |  FROM cr LEFT JOIN ct USING (bucket) CROSS JOIN nt CROSS JOIN nr),
        |pd AS (
        |  SELECT fb.doc_id, COUNT(*) AS n_feat, SUM(lr.lr) AS slw
        |  FROM fb JOIN lr USING (bucket) WHERE fb.lang <> 'en' GROUP BY 1)
        |SELECT doc_id, n_feat, CAST(slw AS DOUBLE) AS logw
        |FROM pd
        |WHERE n_feat > 0
        |ORDER BY logw DESC, doc_id
        |LIMIT 100""".stripMargin,

    // Fertility: the q_text_stats word/piece/char derivations rolled up
    // per lang; ppm ratios are BIGINT floor division on both engines.
    "q_tokenizer_fertility" ->
      """WITH st AS (
        |  SELECT lang,
        |    CASE WHEN trim(text) = '' OR text IS NULL THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS w,
        |    len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS b,
        |    length(text) AS c
        |  FROM documents),
        |agg AS (
        |  SELECT CAST(lang AS VARCHAR) AS grp, COUNT(*) AS n_docs,
        |    CAST(SUM(w) AS BIGINT) AS total_words,
        |    CAST(SUM(b) AS BIGINT) AS total_pieces,
        |    CAST(SUM(c) AS BIGINT) AS total_chars
        |  FROM st GROUP BY 1)
        |SELECT grp, n_docs, total_words, total_pieces,
        |  CAST((total_pieces * 1000000) // total_words AS BIGINT) AS fertility_ppm,
        |  CAST((total_chars * 1000000) // total_pieces AS BIGINT) AS chars_per_piece_ppm
        |FROM agg ORDER BY grp""".stripMargin,

    // 3-gram diversity: same trigram derivation as the LM chain, counted
    // distinct-vs-total per doc; the ppm ratio is BIGINT floor division
    // (positive operands, truncate ≡ floor).
    "q_text_diversity" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                             t -> t <> '') AS tk
        |  FROM documents),
        |tg AS (
        |  SELECT doc_id, list_extract(tk, i) || ' ' || list_extract(tk, i + 1)
        |         || ' ' || list_extract(tk, i + 2) AS gram
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk) - 1)) AS i) r
        |  WHERE len(tk) >= 3),
        |pd AS (
        |  SELECT doc_id, COUNT(*) AS total_ngrams,
        |    COUNT(DISTINCT gram) AS distinct_ngrams
        |  FROM tg GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(COALESCE(pd.total_ngrams, 0) AS BIGINT) AS total_ngrams,
        |  CAST(COALESCE(pd.distinct_ngrams, 0) AS BIGINT) AS distinct_ngrams,
        |  CAST((pd.distinct_ngrams * 1000000) // pd.total_ngrams AS BIGINT) AS distinct_ppm
        |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Perplexity terciles: the trigram-LM chain as a CTE, exact
    // quantile_cont thresholds (the q_agg_percentiles interpolation
    // identity), and a plain CASE — unscored docs cut out of the
    // threshold population on both engines.
    "q_text_ppl_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                             t -> t <> '') AS tk
        |  FROM documents),
        |tg AS (
        |  SELECT doc_id, list_extract(tk, i) AS w1, list_extract(tk, i + 1) AS w2,
        |         list_extract(tk, i + 2) AS w3
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk) - 1)) AS i) r
        |  WHERE len(tk) >= 3),
        |bg AS (
        |  SELECT list_extract(tk, i) AS a, list_extract(tk, i + 1) AS b
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
        |  WHERE len(tk) >= 2),
        |un AS (SELECT t.term FROM toks, UNNEST(tk) AS t(term)),
        |c3 AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM tg GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c12 FROM c3 GROUP BY 1, 2),
        |c2 AS (SELECT a, b, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
        |c1h AS (SELECT a, CAST(SUM(c2) AS BIGINT) AS c1h FROM c2 GROUP BY 1),
        |c1 AS (SELECT term, COUNT(*) AS c FROM un GROUP BY 1),
        |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c1),
        |lp AS (
        |  SELECT tg.doc_id,
        |    CAST(ROUND(LN((70 * (CAST(c3.c3 AS DOUBLE) / CAST(c12.c12 AS DOUBLE))
        |                 + 20 * (CAST(c2.c2 AS DOUBLE) / CAST(c1h.c1h AS DOUBLE))
        |                 + 10 * (CAST(c1.c AS DOUBLE) / CAST(n.n AS DOUBLE))) / 100), 6)
        |      AS DECIMAL(18,6)) AS lp
        |  FROM tg
        |  JOIN c3 USING (w1, w2, w3)
        |  JOIN c12 USING (w1, w2)
        |  JOIN c2 ON c2.a = tg.w2 AND c2.b = tg.w3
        |  JOIN c1h ON c1h.a = tg.w2
        |  JOIN c1 ON c1.term = tg.w3
        |  CROSS JOIN n),
        |pd AS (SELECT doc_id, COUNT(*) AS n_trigrams, SUM(lp) AS slp
        |       FROM lp GROUP BY 1),
        |scored AS (
        |  SELECT d.doc_id, COALESCE(pd.n_trigrams, 0) AS n_trigrams,
        |    CAST(pd.slp AS DOUBLE) / CAST(pd.n_trigrams AS DOUBLE) AS avg_lp3
        |  FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id),
        |thr AS (
        |  SELECT quantile_cont(avg_lp3, 1.0/3) AS t1,
        |         quantile_cont(avg_lp3, 2.0/3) AS t2
        |  FROM scored WHERE n_trigrams > 0)
        |SELECT doc_id, n_trigrams, avg_lp3,
        |  CASE WHEN n_trigrams = 0 THEN 'unscored'
        |       WHEN avg_lp3 >= t2 THEN 'head'
        |       WHEN avg_lp3 >= t1 THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket
        |FROM scored CROSS JOIN thr
        |ORDER BY doc_id""".stripMargin,

    // Interpolated trigram LM: every conditional is a single DOUBLE
    // division of BIGINT counts, the λ-weighted sum is the identical
    // left-associative chain on both engines, and only the final LN
    // leans on the 6dp-round + decimal-sum contract.
    "q_text_trigram_lp" -> trigramLpSql,

    // The reloaded-model twin shares the oracle VERBATIM: persistence
    // must be invisible to the scores.
    "q_text_trigram_reload" -> trigramLpSql,

    // Frozen-merge BPE application replayed in SQL: the SAME literal
    // merge table (built from BpeTokenizer.frozenMerges, so the two
    // engines can never drift), applied by a recursive CTE that takes
    // each rank to fixpoint with separator-delimited string replaces —
    // chr(1) delimits symbols, chr(2) is the fresh-merge sentinel that
    // re-opens the boundary for chained occurrences ("x y x y"). Rank-
    // ordered application ≡ best-rank greedy because a pair's rank always
    // exceeds the ranks that formed its symbols. Distinct words encode
    // once; per-doc positions come from a word-offset prefix sum.
    "q_bpe_tokenize" -> bpeFrozenSql,
    "q_bpe_fertility" -> bpeFertilityOracleSql,

    // Curriculum oracle: the per-doc LM difficulty from the shared
    // Viterbi machinery, the global rank over the composite key, the
    // (rank, N) phase arithmetic, and the within-phase Knuth order.
    "q_curriculum" -> unigramSqlWith(
      """, cost AS (
        |  SELECT words.doc_id AS doc_id,
        |    CAST(sum(coalesce(vocab.m[seg.pieces[j]][1], 20000)) // count(*) AS BIGINT) AS difficulty
        |  FROM words JOIN seg USING (w) CROSS JOIN vocab,
        |       LATERAL (SELECT unnest(range(1, len(seg.pieces) + 1)) AS j) r
        |  GROUP BY words.doc_id),
        |ranked AS (
        |  SELECT doc_id, difficulty,
        |    CAST(row_number() OVER (ORDER BY difficulty * 10000000000 + doc_id) AS BIGINT) AS rk,
        |    (SELECT count(*) FROM cost) AS n
        |  FROM cost),
        |phased AS (
        |  SELECT doc_id, difficulty, CAST((rk - 1) * 4 // n AS BIGINT) AS phase,
        |    ((doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |     + (doc_id % 65536) * 2654435761) % 4294967296 AS sk
        |  FROM ranked)
        |SELECT doc_id, difficulty, phase,
        |  CAST(row_number() OVER (PARTITION BY phase ORDER BY sk, doc_id) - 1 AS BIGINT) AS pos
        |FROM phased ORDER BY doc_id""".stripMargin),

    // Crawl-capstone oracle: survivors reconstructed stage by stage —
    // extraction text (the q_text_extract formula), blocklist (url hits
    // 'src1.example.com' iff source = 'src1'; src10..19 keep their dot-
    // separated domain), exact dedup = min doc_id per extracted, token
    // floor on the 7 + 2·words formula — then the trainer lines rebuilt
    // character-exact incl. to_json's newline escaping.
    "q_crawl_pipeline" ->
      """WITH ext AS (
        |  SELECT doc_id, source,
        |    'Corpus document from the synthetic crawl corpus' || chr(10) ||
        |      text || chr(10) || upper(text) AS extracted,
        |    CAST(7 + 2 * (length(text) - length(replace(text, ' ', '')) + 1)
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |gated AS (SELECT * FROM ext WHERE source <> 'src1'),
        |ded AS (
        |  SELECT min(doc_id) AS doc_id, extracted,
        |    arg_min(n_tok, doc_id) AS n_tok
        |  FROM gated GROUP BY extracted),
        |cur AS (SELECT * FROM ded WHERE n_tok >= 32)
        |SELECT doc_id, doc_id % 4 AS shard,
        |  '{"doc_id":' || doc_id || ',"n_tok":' || n_tok || ',"extracted":"'
        |    || replace(extracted, chr(10), '\n') || '"}' AS line
        |FROM cur ORDER BY doc_id""".stripMargin,

    // Temperature-mix oracle: per-lang exact isqrt weights (the BLEU
    // oracle's seed-and-correct integer root), floor-division budgets,
    // and the Knuth-hash-order running-sum take replayed verbatim.
    "q_mix_temperature" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |tot AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS t FROM toks GROUP BY lang),
        |wts AS (
        |  SELECT lang, t, list_max([s for s in
        |      [CAST(floor(sqrt(CAST(t AS DOUBLE))) AS BIGINT) + d for d in range(-4, 5)]
        |      if s >= 0 AND s*s <= t]) AS w
        |  FROM tot),
        |bud AS (
        |  SELECT lang,
        |    CAST(15000 * w // (SELECT sum(w) FROM wts) AS BIGINT) AS lang_budget
        |  FROM wts),
        |ranked AS (
        |  SELECT doc_id, lang, n_tok,
        |    sum(n_tok) OVER (PARTITION BY lang ORDER BY sk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |  FROM (
        |    SELECT doc_id, lang, n_tok,
        |      ((doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |       + (doc_id % 65536) * 2654435761) % 4294967296 AS sk
        |    FROM toks) k)
        |SELECT r.doc_id, r.lang, r.n_tok, b.lang_budget,
        |  CAST(r.running AS BIGINT) AS running
        |FROM ranked r JOIN bud b USING (lang)
        |WHERE r.running <= b.lang_budget
        |ORDER BY r.doc_id""".stripMargin,

    // JSONL round-trip oracle: Spark's to_json output rebuilt character-
    // exact (no spaces, field order = struct order, plain integer
    // rendering; the corpus is quote/backslash-free so no escaping
    // applies); shard = doc_id % 4 from the writer's partition layout.
    "q_jsonl_roundtrip" ->
      """SELECT doc_id, doc_id % 4 AS shard,
        |  '{"doc_id":' || doc_id || ',"lang":"' || lang || '","n_chars":' ||
        |    n_chars || ',"text":"' || text || '"}' AS line
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Dirty-JSONL oracle: clean rows parse to their fields; the
    // deterministically truncated lines (doc_id % 50 = 13, last 8 chars
    // cut) come back all-NULL with the exact truncated raw string.
    "q_jsonl_source" -> jsonlSourceOracleSql,

    // Per-row PERMISSIVE parse ⇒ the bounded stream shares the batch
    // oracle verbatim.
    "q_stream_jsonl_source" -> jsonlSourceOracleSql,

    "q_unigram_tokenize" -> unigramOracleSql,

    // Fertility oracle: the Viterbi stream's per-doc piece counts joined
    // to language + word/char counts, rolled up per language.
    "q_unigram_fertility" -> unigramSqlWith(
      """, perdoc AS (
        |  SELECT words.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_pieces
        |  FROM words JOIN seg USING (w),
        |       LATERAL (SELECT unnest(range(1, len(seg.pieces) + 1)) AS j) r
        |  GROUP BY words.doc_id),
        |meta AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_piece_chars
        |  FROM documents)
        |SELECT m.lang AS lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(m.n_words) AS BIGINT) AS n_words,
        |  CAST(sum(p.n_pieces) AS BIGINT) AS n_pieces,
        |  CAST(sum(m.n_piece_chars) AS BIGINT) AS n_piece_chars,
        |  CAST((1000000 * sum(p.n_pieces)) // sum(m.n_words) AS BIGINT) AS fertility_ppm,
        |  CAST((1000000 * sum(m.n_piece_chars)) // sum(p.n_pieces) AS BIGINT) AS chars_per_piece_ppm
        |FROM perdoc p JOIN meta m USING (doc_id)
        |GROUP BY m.lang ORDER BY lang""".stripMargin),

    // Per-doc LM cost: the Viterbi stream aggregated by document.
    "q_unigram_ppl" -> unigramSqlWith(
      """SELECT words.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_pieces,
        |  CAST(sum(coalesce(vocab.m[seg.pieces[j]][1], 20000)) AS BIGINT) AS sum_cost_milli,
        |  CAST(sum(coalesce(vocab.m[seg.pieces[j]][1], 20000)) // count(*) AS BIGINT) AS mean_cost_milli
        |FROM words JOIN seg USING (w) CROSS JOIN vocab,
        |     LATERAL (SELECT unnest(range(1, len(seg.pieces) + 1)) AS j) r
        |GROUP BY words.doc_id
        |ORDER BY doc_id""".stripMargin),

    // load ∘ save = identity on (piece, cost_milli) parquet ⇒ the frozen
    // oracle applies to the reloaded model verbatim.
    "q_unigram_reload" -> unigramOracleSql,

    "q_bpe_learned_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    "q_bpe_reload_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS pos,
        |  CAST(NULL AS VARCHAR) AS token, CAST(NULL AS VARCHAR) AS side
        |WHERE FALSE""".stripMargin,

    "q_stream_curate_fuzzy_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS status,
        |  CAST(NULL AS VARCHAR) AS side
        |WHERE FALSE""".stripMargin,

    "q_stream_ann_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS INTEGER) AS rank,
        |  CAST(NULL AS BIGINT) AS neighbor_id, CAST(NULL AS DOUBLE) AS cosine,
        |  CAST(NULL AS VARCHAR) AS side
        |WHERE FALSE""".stripMargin,

    "q_vec_pca_reload_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    // Streaming PMI: exact integer pair counts make stream ≡ batch, so
    // the batch SQL gates the streaming query verbatim (full hash).
    "q_stream_pmi" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                             t -> t <> '') AS tk
        |  FROM documents),
        |bg AS (
        |  SELECT list_extract(tk, i) AS w1, list_extract(tk, i + 1) AS w2
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
        |  WHERE len(tk) >= 2),
        |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
        |n2 AS (SELECT CAST(SUM(c12) AS BIGINT) AS n2 FROM c12),
        |heads AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1h FROM c12 GROUP BY 1),
        |tails AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2t FROM c12 GROUP BY 1)
        |SELECT c.w1, c.w2, c.c12,
        |  CAST((CAST(c.c12 AS HUGEINT) * 1000000 * n2.n2)
        |       // (CAST(h.c1h AS HUGEINT) * t.c2t) AS BIGINT) AS pmi_ppm
        |FROM c12 c
        |JOIN heads h ON h.w1 = c.w1
        |JOIN tails t ON t.w2 = c.w2
        |CROSS JOIN n2
        |WHERE c.c12 >= 5
        |ORDER BY pmi_ppm DESC, c.c12 DESC, c.w1, c.w2
        |LIMIT 100""".stripMargin,

    // Class keywords: the same (cls, term) counts and smoothed odds ratio
    // in BIGINT floor division; per-class cut via QUALIFY under the
    // identical total order.
    "q_text_keywords" ->
      """WITH toks AS (
        |  SELECT CAST(lang AS VARCHAR) AS cls, t.term
        |  FROM documents,
        |    UNNEST(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                       x -> x <> '')) AS t(term)),
        |a AS (SELECT cls, term, COUNT(*) AS a FROM toks GROUP BY 1, 2),
        |ct AS (SELECT term, CAST(SUM(a) AS BIGINT) AS ct FROM a GROUP BY 1),
        |nc AS (SELECT cls, CAST(SUM(a) AS BIGINT) AS nc FROM a GROUP BY 1),
        |n AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM a),
        |scored AS (
        |  SELECT a.cls, a.term, a.a,
        |    CAST(((CAST(a.a AS HUGEINT) + 1)
        |           * (n.n - nc.nc - (ct.ct - a.a) + 1) * 1000000)
        |      // ((CAST(ct.ct AS HUGEINT) - a.a + 1)
        |           * (nc.nc - a.a + 1)) AS BIGINT) AS odds_ppm
        |  FROM a JOIN ct ON ct.term = a.term JOIN nc ON nc.cls = a.cls
        |  CROSS JOIN n
        |  WHERE a.a >= 5)
        |SELECT cls, term, a, odds_ppm FROM scored
        |QUALIFY row_number() OVER (PARTITION BY cls
        |  ORDER BY odds_ppm DESC, a DESC, term ASC) <= 20
        |ORDER BY cls, odds_ppm DESC, a DESC, term""".stripMargin,

    // Streaming keywords: exact integer counts make stream ≡ batch, so
    // the batch SQL gates the streaming query verbatim (full hash).
    "q_stream_keywords" ->
      """WITH toks AS (
        |  SELECT CAST(lang AS VARCHAR) AS cls, t.term
        |  FROM documents,
        |    UNNEST(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                       x -> x <> '')) AS t(term)),
        |a AS (SELECT cls, term, COUNT(*) AS a FROM toks GROUP BY 1, 2),
        |ct AS (SELECT term, CAST(SUM(a) AS BIGINT) AS ct FROM a GROUP BY 1),
        |nc AS (SELECT cls, CAST(SUM(a) AS BIGINT) AS nc FROM a GROUP BY 1),
        |n AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM a),
        |scored AS (
        |  SELECT a.cls, a.term, a.a,
        |    CAST(((CAST(a.a AS HUGEINT) + 1)
        |           * (n.n - nc.nc - (ct.ct - a.a) + 1) * 1000000)
        |      // ((CAST(ct.ct AS HUGEINT) - a.a + 1)
        |           * (nc.nc - a.a + 1)) AS BIGINT) AS odds_ppm
        |  FROM a JOIN ct ON ct.term = a.term JOIN nc ON nc.cls = a.cls
        |  CROSS JOIN n
        |  WHERE a.a >= 5)
        |SELECT cls, term, a, odds_ppm FROM scored
        |QUALIFY row_number() OVER (PARTITION BY cls
        |  ORDER BY odds_ppm DESC, a DESC, term ASC) <= 20
        |ORDER BY cls, odds_ppm DESC, a DESC, term""".stripMargin,

    // PMI collocations: same bigram derivation as q_text_bigram_lp kept
    // as (w1, w2) columns; marginals CAST to BIGINT (SUM widens to
    // HUGEINT otherwise); the ppm ratio multiplies in HUGEINT (Spark
    // side: DECIMAL(38,0)) so neither engine can wrap/abort at large
    // corpus counts, then floor-divides back to BIGINT — positive
    // operands, so truncate ≡ floor.
    "q_text_pmi" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |                             t -> t <> '') AS tk
        |  FROM documents),
        |bg AS (
        |  SELECT list_extract(tk, i) AS w1, list_extract(tk, i + 1) AS w2
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
        |  WHERE len(tk) >= 2),
        |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
        |n2 AS (SELECT CAST(SUM(c12) AS BIGINT) AS n2 FROM c12),
        |heads AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1h FROM c12 GROUP BY 1),
        |tails AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2t FROM c12 GROUP BY 1)
        |SELECT c.w1, c.w2, c.c12,
        |  CAST((CAST(c.c12 AS HUGEINT) * 1000000 * n2.n2)
        |       // (CAST(h.c1h AS HUGEINT) * t.c2t) AS BIGINT) AS pmi_ppm
        |FROM c12 c
        |JOIN heads h ON h.w1 = c.w1
        |JOIN tails t ON t.w2 = c.w2
        |CROSS JOIN n2
        |WHERE c.c12 >= 5
        |ORDER BY pmi_ppm DESC, c.c12 DESC, c.w1, c.w2
        |LIMIT 100""".stripMargin,

    // Character entropy: EXACT integer pieces only — the LN-derived value
    // is carried by the tolerance gate q_text_entropy_verify instead of a
    // cross-engine float hash.
    "q_text_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, t.ch FROM documents,
        |    UNNEST(string_split(text, '')) AS t(ch)
        |  WHERE t.ch <> ''),
        |c AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
        |n AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS nd FROM c GROUP BY 1)
        |SELECT d.doc_id, CAST(COALESCE(n.n, 0) AS BIGINT) AS n_chars,
        |  CAST(COALESCE(n.nd, 0) AS BIGINT) AS n_distinct
        |FROM documents d LEFT JOIN n ON d.doc_id = n.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_text_entropy_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    // Multinomial NB: train on doc_id%5<>0 labeled by lang, classify the
    // held-out fifth. Same 6dp-round-then-decimal-sum contract; the
    // completed term×label grid gives unseen-for-label tokens the
    // Laplace-smoothed mass; argmax tie-breaks on label.
    "q_classify_nb" -> nbOracleSql,

    // The reloaded-model twin shares the oracle VERBATIM: the parquet
    // round-trip of the decimal grid must be invisible to every score.
    "q_classify_nb_reload" -> nbOracleSql,

    // Tie-aware Mann–Whitney AUC replayed in SQL: same grouped-counts +
    // windowed-cumulative derivation; CAST every aggregate to BIGINT
    // (DuckDB SUM promotes to HUGEINT) and CASE-guard the single-class
    // division exactly like the engine's when().
    "q_eval_auc" ->
      """WITH base AS (
        |  SELECT CAST(l_linestatus AS VARCHAR) AS grp,
        |    CAST(l_quantity AS BIGINT) AS s,
        |    (l_returnflag = 'R') AS l
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL),
        |g AS (
        |  SELECT grp, s,
        |    CAST(SUM(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS p,
        |    COUNT(*) AS c
        |  FROM base GROUP BY grp, s),
        |r AS (
        |  SELECT grp, p, c,
        |    CAST(COALESCE(SUM(c) OVER (PARTITION BY grp ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum
        |  FROM g),
        |t AS (
        |  SELECT grp, CAST(SUM(p) AS BIGINT) AS n_pos,
        |    CAST(SUM(c) - SUM(p) AS BIGINT) AS n_neg,
        |    CAST(SUM(p * (2 * cum + c + 1)) AS BIGINT) AS r2
        |  FROM r GROUP BY grp)
        |SELECT grp, n_pos, n_neg,
        |  CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
        |  CASE WHEN n_pos > 0 AND n_neg > 0
        |    THEN CAST((1000000 * (r2 - n_pos * (n_pos + 1)))
        |      // (2 * n_pos * n_neg) AS BIGINT)
        |    ELSE NULL END AS auc_ppm
        |FROM t ORDER BY grp""".stripMargin,

    // The BATCH derivation verbatim — exact integer counts make the
    // streaming replay reproduce it identically, so a streaming query
    // gets a full hash oracle.
    "q_stream_auc" ->
      """WITH base AS (
        |  SELECT CAST(user_id % 3 AS VARCHAR) AS grp,
        |    CAST(FLOOR(value * 1000) AS BIGINT) AS s,
        |    (event_type = 'purchase') AS l
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |g AS (
        |  SELECT grp, s,
        |    CAST(SUM(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS p,
        |    COUNT(*) AS c
        |  FROM base GROUP BY grp, s),
        |r AS (
        |  SELECT grp, p, c,
        |    CAST(COALESCE(SUM(c) OVER (PARTITION BY grp ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum
        |  FROM g),
        |t AS (
        |  SELECT grp, CAST(SUM(p) AS BIGINT) AS n_pos,
        |    CAST(SUM(c) - SUM(p) AS BIGINT) AS n_neg,
        |    CAST(SUM(p * (2 * cum + c + 1)) AS BIGINT) AS r2
        |  FROM r GROUP BY grp)
        |SELECT grp, n_pos, n_neg,
        |  CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
        |  CASE WHEN n_pos > 0 AND n_neg > 0
        |    THEN CAST((1000000 * (r2 - n_pos * (n_pos + 1)))
        |      // (2 * n_pos * n_neg) AS BIGINT)
        |    ELSE NULL END AS auc_ppm
        |FROM t ORDER BY grp""".stripMargin,

    // Flooring `//` vs the engine's truncating `div` agree here because
    // the greatest(0) clamp absorbs the one divergent region (negative
    // quotients, score < lo).
    "q_eval_calibration" ->
      """SELECT CAST(source AS VARCHAR) AS grp,
        |  LEAST(GREATEST((CAST(n_chars AS BIGINT) * 6) // 600, 0), 5) AS bin,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS score_sum
        |FROM documents
        |WHERE n_chars IS NOT NULL AND lang IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // nDCG@10 replay: the q_sim_topk ranking idiom over the %25==7 query
    // split, label-proximity relevance, and the SAME frozen ppm discount
    // literals as Eval.NdcgDiscountPpm — every figure integer-exact.
    "q_eval_ndcg" ->
      """WITH ranked AS (
        |  SELECT query, rank, rel FROM (
        |    SELECT q.vec_id AS query, c.vec_id AS neighbor_id,
        |      GREATEST(0, 3 - ABS(CAST(q.label AS BIGINT) - CAST(c.label AS BIGINT))) AS rel,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |        / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |           * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC, c.vec_id) AS rank
        |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |    WHERE q.vec_id % 25 = 7 AND c.vec_id % 25 <> 7) t
        |  WHERE rank <= 10),
        |disc(r, d) AS (VALUES (1, 1000000), (2, 630930), (3, 500000),
        |  (4, 430677), (5, 386853), (6, 356207), (7, 333333), (8, 315465),
        |  (9, 301030), (10, 289065)),
        |ideal AS (
        |  SELECT query, rank, rel,
        |    ROW_NUMBER() OVER (PARTITION BY query ORDER BY rel DESC, rank ASC) AS irank
        |  FROM ranked),
        |agg AS (
        |  SELECT query, COUNT(*) AS n_ranked,
        |    CAST(SUM(rel * ds.d) AS BIGINT) AS dcg_ppm,
        |    CAST(SUM(rel * di.d) AS BIGINT) AS idcg_ppm
        |  FROM ideal JOIN disc ds ON ds.r = rank JOIN disc di ON di.r = irank
        |  GROUP BY query)
        |SELECT query, n_ranked, dcg_ppm, idcg_ppm,
        |  CASE WHEN idcg_ppm > 0
        |    THEN CAST((1000000 * dcg_ppm) // idcg_ppm AS BIGINT)
        |    ELSE NULL END AS ndcg_ppm
        |FROM agg ORDER BY query""".stripMargin,

    // The dominance DEFINITION as the oracle: a row is on the front iff
    // no row beats it weakly in both coordinates and strictly in one —
    // NOT a replay of the window derivation.
    "q_pareto_front" ->
      """WITH toks AS (
        |  SELECT doc_id, n_chars,
        |    unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '')) AS tok
        |  FROM documents),
        |pts AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |    CAST((1000000 * COUNT(DISTINCT tok)) // COUNT(*) AS BIGINT) AS diversity_ppm
        |  FROM toks GROUP BY 1, 2)
        |SELECT doc_id, n_chars, diversity_ppm FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts q
        |  WHERE q.n_chars >= p.n_chars AND q.diversity_ppm >= p.diversity_ppm
        |    AND (q.n_chars > p.n_chars OR q.diversity_ppm > p.diversity_ppm))
        |ORDER BY doc_id""".stripMargin,

    // AP replay: the same ranking + relevant totals; per-hit terms
    // ppm-floored before the sum, then div by n_rel — the documented
    // fixed-point contract.
    "q_eval_map" ->
      """WITH ranked AS (
        |  SELECT query, rank, rel FROM (
        |    SELECT q.vec_id AS query, c.vec_id AS neighbor_id,
        |      GREATEST(0, 3 - ABS(CAST(q.label AS BIGINT) - CAST(c.label AS BIGINT))) AS rel,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |        / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |           * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC, c.vec_id) AS rank
        |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |    WHERE q.vec_id % 25 = 7 AND c.vec_id % 25 <> 7) t
        |  WHERE rank <= 10),
        |rel_tot AS (
        |  SELECT q.vec_id AS query, COUNT(*) AS n_rel
        |  FROM embeddings q JOIN embeddings c
        |    ON c.vec_id % 25 <> 7
        |    AND ABS(CAST(q.label AS BIGINT) - CAST(c.label AS BIGINT)) <= 2
        |  WHERE q.vec_id % 25 = 7 GROUP BY 1),
        |terms AS (
        |  SELECT query, rank, (rel > 0) AS hit,
        |    CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY query ORDER BY rank
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM ranked),
        |m AS (
        |  SELECT query,
        |    CAST(SUM(CASE WHEN hit THEN (1000000 * cum) // rank ELSE 0 END) AS BIGINT) AS tsum,
        |    CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS hits
        |  FROM terms GROUP BY query)
        |SELECT m.query, m.hits,
        |  CAST(COALESCE(r.n_rel, 0) AS BIGINT) AS n_rel,
        |  CASE WHEN COALESCE(r.n_rel, 0) > 0
        |    THEN CAST(tsum // r.n_rel AS BIGINT) ELSE NULL END AS ap_ppm
        |FROM m LEFT JOIN rel_tot r USING (query)
        |ORDER BY m.query""".stripMargin,

    // BLEU oracle: n-gram clip via unnest/count/left-join per n; the
    // exact integer 4th root is a float-seeded isqrt CORRECTED in
    // integer arithmetic (list_max over s±4 candidates with s*s <= N —
    // N reaches 1.7e16, past double's exact-integer range, so the seed
    // alone could be off by a few).
    "q_eval_bleu" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 14),
        |seqs AS (SELECT doc_id, w[2:14] AS c, w[1:12] AS r FROM base),
        |grams AS (
        |  SELECT doc_id, n,
        |    [array_to_string(c[i:i+n-1], ' ') for i in range(1, len(c)-n+2)] AS cg,
        |    [array_to_string(r[i:i+n-1], ' ') for i in range(1, len(r)-n+2)] AS rg
        |  FROM seqs, (SELECT unnest([1, 2, 3, 4]) AS n)),
        |cc AS (SELECT doc_id, n, g, count(*) AS c_cnt
        |  FROM (SELECT doc_id, n, unnest(cg) AS g FROM grams) GROUP BY doc_id, n, g),
        |rc AS (SELECT doc_id, n, g, count(*) AS r_cnt
        |  FROM (SELECT doc_id, n, unnest(rg) AS g FROM grams) GROUP BY doc_id, n, g),
        |ab AS (
        |  SELECT cc.doc_id, cc.n,
        |    CAST(sum(least(cc.c_cnt, coalesce(rc.r_cnt, 0))) AS BIGINT) AS a
        |  FROM cc LEFT JOIN rc
        |    ON cc.doc_id = rc.doc_id AND cc.n = rc.n AND cc.g = rc.g
        |  GROUP BY cc.doc_id, cc.n),
        |piv AS (
        |  SELECT g.doc_id,
        |    CAST(max(CASE WHEN g.n = 1 THEN coalesce(ab.a, 0) END) AS BIGINT) AS a1,
        |    CAST(max(CASE WHEN g.n = 2 THEN coalesce(ab.a, 0) END) AS BIGINT) AS a2,
        |    CAST(max(CASE WHEN g.n = 3 THEN coalesce(ab.a, 0) END) AS BIGINT) AS a3,
        |    CAST(max(CASE WHEN g.n = 4 THEN coalesce(ab.a, 0) END) AS BIGINT) AS a4,
        |    CAST(max(CASE WHEN g.n = 1 THEN len(g.cg) END) AS BIGINT) AS b1,
        |    CAST(max(CASE WHEN g.n = 2 THEN len(g.cg) END) AS BIGINT) AS b2,
        |    CAST(max(CASE WHEN g.n = 3 THEN len(g.cg) END) AS BIGINT) AS b3,
        |    CAST(max(CASE WHEN g.n = 4 THEN len(g.cg) END) AS BIGINT) AS b4
        |  FROM grams g LEFT JOIN ab ON g.doc_id = ab.doc_id AND g.n = ab.n
        |  GROUP BY g.doc_id),
        |scored AS (
        |  SELECT p.doc_id, CAST(len(s.c) AS BIGINT) AS len_c,
        |    CAST(len(s.r) AS BIGINT) AS len_r,
        |    a1, b1, CAST((1000000 * a1) // b1 AS BIGINT) AS p1_ppm,
        |    a2, b2, CAST((1000000 * a2) // b2 AS BIGINT) AS p2_ppm,
        |    a3, b3, CAST((1000000 * a3) // b3 AS BIGINT) AS p3_ppm,
        |    a4, b4, CAST((1000000 * a4) // b4 AS BIGINT) AS p4_ppm,
        |    (a1*a2*a3*a4 * 1000000000000) // (b1*b2*b3*b4) AS nn
        |  FROM piv p JOIN seqs s ON p.doc_id = s.doc_id),
        |rooted AS (
        |  SELECT *, list_max([s for s in
        |      [CAST(floor(sqrt(CAST(nn AS DOUBLE))) AS BIGINT) + d for d in range(-4, 5)]
        |      if s >= 0 AND s*s <= nn]) AS s1
        |  FROM scored),
        |rooted2 AS (
        |  SELECT *, list_max([t for t in
        |      [CAST(floor(sqrt(CAST(s1 AS DOUBLE))) AS BIGINT) + d for d in range(-2, 3)]
        |      if t >= 0 AND t*t <= s1]) AS root4
        |  FROM rooted)
        |SELECT doc_id, len_c, len_r, a1, b1, p1_ppm, a2, b2, p2_ppm,
        |  a3, b3, p3_ppm, a4, b4, p4_ppm,
        |  CAST(CASE WHEN a1 = 0 OR a2 = 0 OR a3 = 0 OR a4 = 0 THEN 0
        |    ELSE root4 END AS BIGINT) AS bleu_milli
        |FROM rooted2 ORDER BY doc_id""".stripMargin,

    // chrF oracle: char n-gram clip via unnest/count/join per n over the
    // space-stripped pair strings; the fixed-point ladder (per-n ppm
    // floors -> integer mean over included n -> one F floor division)
    // replayed verbatim.
    "q_eval_chrf" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 14),
        |seqs AS (
        |  SELECT doc_id,
        |    replace(array_to_string(w[2:14], ' '), ' ', '') AS cs,
        |    replace(array_to_string(w[1:12], ' '), ' ', '') AS rs
        |  FROM base),
        |grams AS (
        |  SELECT doc_id, n,
        |    [substr(cs, i, n) for i in range(1, greatest(len(cs)-n+2, 1))] AS cg,
        |    [substr(rs, i, n) for i in range(1, greatest(len(rs)-n+2, 1))] AS rg
        |  FROM seqs, (SELECT unnest([1, 2, 3, 4, 5, 6]) AS n)),
        |cc AS (SELECT doc_id, n, g, count(*) AS c_cnt
        |  FROM (SELECT doc_id, n, unnest(cg) AS g FROM grams) GROUP BY doc_id, n, g),
        |rc AS (SELECT doc_id, n, g, count(*) AS r_cnt
        |  FROM (SELECT doc_id, n, unnest(rg) AS g FROM grams) GROUP BY doc_id, n, g),
        |mm AS (
        |  SELECT cc.doc_id, cc.n,
        |    CAST(sum(least(cc.c_cnt, coalesce(rc.r_cnt, 0))) AS BIGINT) AS m
        |  FROM cc LEFT JOIN rc
        |    ON cc.doc_id = rc.doc_id AND cc.n = rc.n AND cc.g = rc.g
        |  GROUP BY cc.doc_id, cc.n),
        |tot AS (
        |  SELECT g.doc_id, g.n, CAST(len(g.cg) AS BIGINT) AS c,
        |    CAST(len(g.rg) AS BIGINT) AS r, CAST(coalesce(mm.m, 0) AS BIGINT) AS m
        |  FROM grams g LEFT JOIN mm ON g.doc_id = mm.doc_id AND g.n = mm.n),
        |agg AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN c > 0 AND r > 0 THEN (1000000 * m) // c END) AS BIGINT) AS psum,
        |    CAST(sum(CASE WHEN c > 0 AND r > 0 THEN (1000000 * m) // r END) AS BIGINT) AS rsum,
        |    CAST(count(CASE WHEN c > 0 AND r > 0 THEN 1 END) AS BIGINT) AS inc,
        |    CAST(max(CASE WHEN n = 1 THEN m END) AS BIGINT) AS m1,
        |    CAST(max(CASE WHEN n = 1 THEN c END) AS BIGINT) AS c1,
        |    CAST(max(CASE WHEN n = 1 THEN r END) AS BIGINT) AS r1,
        |    CAST(max(CASE WHEN n = 2 THEN m END) AS BIGINT) AS m2,
        |    CAST(max(CASE WHEN n = 2 THEN c END) AS BIGINT) AS c2,
        |    CAST(max(CASE WHEN n = 2 THEN r END) AS BIGINT) AS r2,
        |    CAST(max(CASE WHEN n = 3 THEN m END) AS BIGINT) AS m3,
        |    CAST(max(CASE WHEN n = 3 THEN c END) AS BIGINT) AS c3,
        |    CAST(max(CASE WHEN n = 3 THEN r END) AS BIGINT) AS r3,
        |    CAST(max(CASE WHEN n = 4 THEN m END) AS BIGINT) AS m4,
        |    CAST(max(CASE WHEN n = 4 THEN c END) AS BIGINT) AS c4,
        |    CAST(max(CASE WHEN n = 4 THEN r END) AS BIGINT) AS r4,
        |    CAST(max(CASE WHEN n = 5 THEN m END) AS BIGINT) AS m5,
        |    CAST(max(CASE WHEN n = 5 THEN c END) AS BIGINT) AS c5,
        |    CAST(max(CASE WHEN n = 5 THEN r END) AS BIGINT) AS r5,
        |    CAST(max(CASE WHEN n = 6 THEN m END) AS BIGINT) AS m6,
        |    CAST(max(CASE WHEN n = 6 THEN c END) AS BIGINT) AS c6,
        |    CAST(max(CASE WHEN n = 6 THEN r END) AS BIGINT) AS r6
        |  FROM tot GROUP BY doc_id)
        |SELECT doc_id, m1, c1, r1, m2, c2, r2, m3, c3, r3, m4, c4, r4,
        |  m5, c5, r5, m6, c6, r6,
        |  CASE WHEN inc = 0 THEN NULL
        |       WHEN (psum // inc) + (rsum // inc) = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST((5 * (psum // inc) * (rsum // inc))
        |         // (4 * (psum // inc) + (rsum // inc)) AS BIGINT) END AS chrf_ppm
        |FROM agg ORDER BY doc_id""".stripMargin,

    // ROUGE-L oracle: LCS via recursive-CTE DP carrying one row per
    // step in prefix-max form — dp[i][j] = max(t[j], dp[i][j-1]) where
    // t[j] = eq ? diag+1 : up, so each step is one parallel list
    // comprehension plus a prefix max (list_max over the 1..j slice).
    "q_eval_rouge" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 14),
        |seqs AS (SELECT doc_id, w[2:14] AS c, w[1:12] AS r FROM base),
        |dp AS (
        |  SELECT doc_id, 0 AS i,
        |    [CAST(0 AS BIGINT) for x in range(0, len(r) + 1)] AS row
        |  FROM seqs
        |  UNION ALL
        |  SELECT doc_id, i + 1,
        |    list_prepend(CAST(0 AS BIGINT),
        |      [list_max(t[1:j]) for j in range(1, m + 1)]) AS row
        |  FROM (
        |    SELECT d.doc_id, d.i AS i, len(s.r) AS m,
        |      [CASE WHEN s.c[d.i + 1] = s.r[j] THEN d.row[j] + 1
        |        ELSE d.row[j + 1] END for j in range(1, len(s.r) + 1)] AS t
        |    FROM dp d JOIN seqs s USING (doc_id)
        |    WHERE d.i < len(s.c)) sub),
        |fin AS (
        |  SELECT s.doc_id, CAST(len(s.c) AS BIGINT) AS len_c,
        |    CAST(len(s.r) AS BIGINT) AS len_r, d.row[len(s.r) + 1] AS lcs
        |  FROM dp d JOIN seqs s USING (doc_id)
        |  WHERE d.i = len(s.c))
        |SELECT doc_id, len_c, len_r, lcs,
        |  CAST((1000000 * lcs) // len_c AS BIGINT) AS rouge_p_ppm,
        |  CAST((1000000 * lcs) // len_r AS BIGINT) AS rouge_r_ppm,
        |  CAST((2000000 * lcs) // (len_c + len_r) AS BIGINT) AS rouge_f_ppm
        |FROM fin ORDER BY doc_id""".stripMargin,

    // WER oracle: Levenshtein via recursive-CTE DP in prefix-MIN form.
    // Per step, t2[k+1] = min(up+1, diag+cost) with t2[1] = i (the new
    // row's j=0 cell); the in-row insertion dependency unrolls to
    // dp[i][j] = j + min over k ≤ j of (t2[k+1] − k), computed as a
    // sliced list_min over u[x] = t2[x] − (x−1).
    "q_eval_wer" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 14),
        |seqs AS (SELECT doc_id, w[2:14] AS c, w[1:12] AS r FROM base),
        |dp AS (
        |  SELECT doc_id, 0 AS i,
        |    [CAST(x AS BIGINT) for x in range(0, len(r) + 1)] AS row
        |  FROM seqs
        |  UNION ALL
        |  SELECT doc_id, i + 1,
        |    [CAST(list_min(u[1:p]) + (p - 1) AS BIGINT) for p in range(1, m + 2)] AS row
        |  FROM (
        |    SELECT doc_id, i, m, [t2[x] - (x - 1) for x in range(1, m + 2)] AS u
        |    FROM (
        |      SELECT d.doc_id, d.i AS i, len(s.r) AS m,
        |        list_prepend(CAST(d.i + 1 AS BIGINT),
        |          [least(d.row[k + 1] + 1,
        |                 d.row[k] + CASE WHEN s.c[d.i + 1] = s.r[k] THEN 0 ELSE 1 END)
        |           for k in range(1, len(s.r) + 1)]) AS t2
        |      FROM dp d JOIN seqs s USING (doc_id)
        |      WHERE d.i < len(s.c)) stepped) sliced),
        |fin AS (
        |  SELECT s.doc_id, CAST(len(s.c) AS BIGINT) AS len_c,
        |    CAST(len(s.r) AS BIGINT) AS len_r, d.row[len(s.r) + 1] AS edit_dist
        |  FROM dp d JOIN seqs s USING (doc_id)
        |  WHERE d.i = len(s.c))
        |SELECT doc_id, len_c, len_r, edit_dist,
        |  CAST((1000000 * edit_dist) // len_r AS BIGINT) AS wer_ppm
        |FROM fin ORDER BY doc_id""".stripMargin,

    // ROUGE-N oracle: per-n clipped matches via the BLEU oracle's n-gram
    // clip machinery for n in (1, 2), recalls over reference totals.
    "q_eval_rouge_n" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 14),
        |seqs AS (SELECT doc_id, w[2:14] AS c, w[1:12] AS r FROM base),
        |grams AS (
        |  SELECT doc_id, n,
        |    [array_to_string(c[i:i+n-1], ' ') for i in range(1, len(c)-n+2)] AS cg,
        |    [array_to_string(r[i:i+n-1], ' ') for i in range(1, len(r)-n+2)] AS rg
        |  FROM seqs, (SELECT unnest([1, 2]) AS n)),
        |cc AS (SELECT doc_id, n, g, count(*) AS c_cnt
        |  FROM (SELECT doc_id, n, unnest(cg) AS g FROM grams) GROUP BY doc_id, n, g),
        |rc AS (SELECT doc_id, n, g, count(*) AS r_cnt
        |  FROM (SELECT doc_id, n, unnest(rg) AS g FROM grams) GROUP BY doc_id, n, g),
        |ab AS (
        |  SELECT cc.doc_id, cc.n,
        |    CAST(sum(least(cc.c_cnt, coalesce(rc.r_cnt, 0))) AS BIGINT) AS a
        |  FROM cc LEFT JOIN rc ON cc.doc_id = rc.doc_id AND cc.n = rc.n AND cc.g = rc.g
        |  GROUP BY cc.doc_id, cc.n),
        |piv AS (
        |  SELECT g.doc_id,
        |    CAST(max(CASE WHEN g.n = 1 THEN coalesce(ab.a, 0) END) AS BIGINT) AS a1,
        |    CAST(max(CASE WHEN g.n = 2 THEN coalesce(ab.a, 0) END) AS BIGINT) AS a2,
        |    CAST(max(CASE WHEN g.n = 1 THEN len(g.rg) END) AS BIGINT) AS t1,
        |    CAST(max(CASE WHEN g.n = 2 THEN len(g.rg) END) AS BIGINT) AS t2
        |  FROM grams g LEFT JOIN ab ON g.doc_id = ab.doc_id AND g.n = ab.n
        |  GROUP BY g.doc_id)
        |SELECT doc_id, a1, t1,
        |  CAST((1000000 * a1) // t1 AS BIGINT) AS rouge1_r_ppm,
        |  a2, t2, CAST((1000000 * a2) // t2 AS BIGINT) AS rouge2_r_ppm
        |FROM piv ORDER BY doc_id""".stripMargin,

    // Token-F1 oracle: clipped unigram overlap via the BLEU oracle's
    // n = 1 machinery, then the three exactly-rational ppm floors.
    "q_eval_token_f1" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 14),
        |seqs AS (SELECT doc_id, w[2:14] AS c, w[1:12] AS r FROM base),
        |cc AS (SELECT doc_id, g, count(*) AS c_cnt
        |  FROM (SELECT doc_id, unnest(c) AS g FROM seqs) GROUP BY doc_id, g),
        |rc AS (SELECT doc_id, g, count(*) AS r_cnt
        |  FROM (SELECT doc_id, unnest(r) AS g FROM seqs) GROUP BY doc_id, g),
        |ov AS (
        |  SELECT cc.doc_id,
        |    CAST(sum(least(cc.c_cnt, coalesce(rc.r_cnt, 0))) AS BIGINT) AS o
        |  FROM cc LEFT JOIN rc ON cc.doc_id = rc.doc_id AND cc.g = rc.g
        |  GROUP BY cc.doc_id)
        |SELECT s.doc_id, CAST(len(s.c) AS BIGINT) AS len_c,
        |  CAST(len(s.r) AS BIGINT) AS len_r,
        |  coalesce(ov.o, 0) AS overlap,
        |  CAST((1000000 * coalesce(ov.o, 0)) // len(s.c) AS BIGINT) AS f1_p_ppm,
        |  CAST((1000000 * coalesce(ov.o, 0)) // len(s.r) AS BIGINT) AS f1_r_ppm,
        |  CAST((2000000 * coalesce(ov.o, 0)) // (len(s.c) + len(s.r)) AS BIGINT) AS f1_ppm
        |FROM seqs s LEFT JOIN ov ON s.doc_id = ov.doc_id
        |ORDER BY s.doc_id""".stripMargin,

    // CER oracle: DuckDB's native char-level levenshtein — both engines
    // run their builtin DP, the cross-check is exact.
    "q_eval_cer" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 14),
        |seqs AS (
        |  SELECT doc_id, array_to_string(w[2:14], ' ') AS cs,
        |    array_to_string(w[1:12], ' ') AS rs
        |  FROM base)
        |SELECT doc_id, CAST(length(cs) AS BIGINT) AS len_c,
        |  CAST(length(rs) AS BIGINT) AS len_r,
        |  CAST(levenshtein(cs, rs) AS BIGINT) AS edit_dist,
        |  CAST((1000000 * levenshtein(cs, rs)) // length(rs) AS BIGINT) AS cer_ppm
        |FROM seqs ORDER BY doc_id""".stripMargin,

    // Per-group dominance definition, grouped by source.
    "q_pareto_by_group" ->
      """WITH toks AS (
        |  SELECT doc_id, source, n_chars,
        |    unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '')) AS tok
        |  FROM documents),
        |pts AS (
        |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
        |    CAST((1000000 * COUNT(DISTINCT tok)) // COUNT(*) AS BIGINT) AS diversity_ppm
        |  FROM toks GROUP BY 1, 2, 3)
        |SELECT doc_id, source, n_chars, diversity_ppm FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts q
        |  WHERE q.source = p.source
        |    AND q.n_chars >= p.n_chars AND q.diversity_ppm >= p.diversity_ppm
        |    AND (q.n_chars > p.n_chars OR q.diversity_ppm > p.diversity_ppm))
        |ORDER BY doc_id""".stripMargin,

    // Stream ≡ batch verbatim (mergeable dominance) ⇒ the batch
    // dominance-definition oracle applies unchanged.
    "q_stream_pareto" ->
      """WITH toks AS (
        |  SELECT doc_id, n_chars,
        |    unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '')) AS tok
        |  FROM documents),
        |pts AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |    CAST((1000000 * COUNT(DISTINCT tok)) // COUNT(*) AS BIGINT) AS diversity_ppm
        |  FROM toks GROUP BY 1, 2)
        |SELECT doc_id, n_chars, diversity_ppm FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts q
        |  WHERE q.n_chars >= p.n_chars AND q.diversity_ppm >= p.diversity_ppm
        |    AND (q.n_chars > p.n_chars OR q.diversity_ppm > p.diversity_ppm))
        |ORDER BY doc_id""".stripMargin,

    // The paired-variant synthesis replayed with chr() codepoints; keys
    // fold through the same utf8proc chain as q_text_normalize.
    "q_dedup_unicode" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |    strip_accents(lower(nfc_normalize(
        |      CASE doc_id % 8
        |        WHEN 0 THEN 'Caf' || chr(233)
        |        WHEN 1 THEN 'Cafe' || chr(769)
        |        WHEN 2 THEN 'N' || chr(214) || 'EL'
        |        WHEN 3 THEN 'no' || chr(776) || 'el'
        |        WHEN 4 THEN chr(201) || 'cole'
        |        WHEN 5 THEN 'E' || chr(769) || 'cole'
        |        WHEN 6 THEN 'plain'
        |        ELSE 'PLAIN' END || ' doc ' || CAST(doc_id // 8 AS VARCHAR)))) AS key
        |  FROM documents),
        |groups AS (
        |  SELECT key, CAST(MIN(doc_id) AS BIGINT) AS canonical,
        |    COUNT(*) AS group_n
        |  FROM keyed GROUP BY key)
        |SELECT doc_id, key, canonical, group_n,
        |  (doc_id = canonical) AS survivor
        |FROM keyed JOIN groups USING (key)
        |ORDER BY doc_id""".stripMargin,

    // The combining-mark fixture rebuilt with chr() codepoints; DuckDB's
    // utf8proc (nfc_normalize / lower / strip_accents) must agree with
    // the JVM normalizer codepoint for codepoint. Fold order matches the
    // engine: NFC → lower → strip.
    "q_text_normalize" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE doc_id % 8
        |      WHEN 0 THEN chr(201) || 'cole'
        |      WHEN 1 THEN 'E' || chr(769) || 'cole'
        |      WHEN 2 THEN 'no' || chr(776) || 'el'
        |      WHEN 3 THEN 'n' || chr(246) || 'el'
        |      WHEN 4 THEN chr(223) || 'TRASSE'
        |      WHEN 5 THEN 'Cafe' || chr(769)
        |      WHEN 6 THEN 'CAF' || chr(201)
        |      ELSE 'ascii only' END || ' ' || substr(text, 1, 8) AS r
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(r) AS nfc,
        |  strip_accents(lower(nfc_normalize(r))) AS folded,
        |  CAST(length(nfc_normalize(r)) AS BIGINT) AS nfc_chars
        |FROM raw ORDER BY doc_id""".stripMargin,

    // Same ranking replay as q_eval_ndcg; binary relevance = graded
    // rel > 0; corpus-side relevant totals by the label-window count.
    "q_eval_rankmetrics" ->
      """WITH ranked AS (
        |  SELECT query, rank, rel FROM (
        |    SELECT q.vec_id AS query, c.vec_id AS neighbor_id,
        |      GREATEST(0, 3 - ABS(CAST(q.label AS BIGINT) - CAST(c.label AS BIGINT))) AS rel,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |        / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |           * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC, c.vec_id) AS rank
        |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |    WHERE q.vec_id % 25 = 7 AND c.vec_id % 25 <> 7) t
        |  WHERE rank <= 10),
        |rel_tot AS (
        |  SELECT q.vec_id AS query, COUNT(*) AS n_rel
        |  FROM embeddings q JOIN embeddings c
        |    ON c.vec_id % 25 <> 7
        |    AND ABS(CAST(q.label AS BIGINT) - CAST(c.label AS BIGINT)) <= 2
        |  WHERE q.vec_id % 25 = 7 GROUP BY 1),
        |m AS (
        |  SELECT query, COUNT(*) AS n_ranked,
        |    CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |    CAST(MIN(CASE WHEN rel > 0 THEN rank END) AS BIGINT) AS first_rel_rank
        |  FROM ranked GROUP BY query)
        |SELECT m.query, m.n_ranked, m.hits, m.first_rel_rank,
        |  CAST(1000000 // first_rel_rank AS BIGINT) AS rr_ppm,
        |  CAST((1000000 * hits) // 10 AS BIGINT) AS p_at_k_ppm,
        |  CAST(COALESCE(r.n_rel, 0) AS BIGINT) AS n_rel,
        |  CASE WHEN COALESCE(r.n_rel, 0) > 0
        |    THEN CAST((1000000 * hits) // r.n_rel AS BIGINT)
        |    ELSE NULL END AS recall_ppm
        |FROM m LEFT JOIN rel_tot r USING (query)
        |ORDER BY m.query""".stripMargin,

    // Start-offset packing replayed as the same exclusive prefix sum //
    // target; bin rollups via a second grouped window.
    "q_compaction_plan" ->
      """WITH manifest AS (
        |  SELECT source, doc_id // 20 AS file_id,
        |    CAST(SUM(n_chars) AS BIGINT) AS size
        |  FROM documents GROUP BY 1, 2),
        |packed AS (
        |  SELECT source, file_id, size,
        |    CAST(COALESCE(SUM(size) OVER (PARTITION BY source ORDER BY file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4000
        |      AS BIGINT) AS bin
        |  FROM manifest)
        |SELECT source, file_id, size, bin,
        |  COUNT(*) OVER (PARTITION BY source, bin) AS bin_files,
        |  CAST(SUM(size) OVER (PARTITION BY source, bin) AS BIGINT) AS bin_bytes
        |FROM packed ORDER BY source, file_id""".stripMargin,

    // The same packing, rolled up per bin.
    "q_compaction_summary" ->
      """WITH manifest AS (
        |  SELECT source, doc_id // 20 AS file_id,
        |    CAST(SUM(n_chars) AS BIGINT) AS size
        |  FROM documents GROUP BY 1, 2),
        |packed AS (
        |  SELECT source, file_id, size,
        |    CAST(COALESCE(SUM(size) OVER (PARTITION BY source ORDER BY file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4000
        |      AS BIGINT) AS bin
        |  FROM manifest)
        |SELECT source, bin, COUNT(*) AS bin_files,
        |  CAST(SUM(size) AS BIGINT) AS bin_bytes,
        |  (COUNT(*) > 1) AS needs_rewrite
        |FROM packed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // k-anonymity / l-diversity: two-level exact aggregate; the NULL
    // bucket (if any) counts as a sensitive value, matching the engine.
    "q_kanon_audit" ->
      """WITH lv AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
        |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS sv, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT c_nationkey, c_mktsegment,
        |  CAST(SUM(n) AS BIGINT) AS group_size,
        |  CAST(COUNT(*) AS BIGINT) AS l_distinct,
        |  (SUM(n) < 10 OR COUNT(*) < 2) AS at_risk
        |FROM lv GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Fixpoint replay: level-0 buckets once, halve per level by explicit
    // FLOOR (DuckDB's // truncates toward zero — measured — so it can't
    // stand in for the engine's arithmetic-shift floor on negatives),
    // pick the first level whose min group size reaches k.
    "q_kanon_generalize" -> kanonGeneralizeSql(20),

    "q_kanon_suppress" -> kanonGeneralizeSql(40),

    // BRUTE-FORCE all-pairs edit distance over the replayed record
    // synthesis — gates the blocking's recall, not just the predicate.
    "q_er_match" ->
      """WITH recs AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS rec_id, p_name AS name
        |  FROM part WHERE p_partkey < 300
        |  UNION ALL
        |  SELECT CAST(p_partkey + 100000 AS BIGINT),
        |    substr(p_name, 1, pos - 1) || '#' || substr(p_name, pos + 1)
        |  FROM (SELECT p_partkey, p_name,
        |      CASE WHEN p_partkey % 2 = 0 THEN 1 + (p_partkey % 3)
        |        ELSE length(p_name) - (p_partkey % 3) END AS pos
        |    FROM part WHERE p_partkey < 300) c)
        |SELECT a.rec_id AS idA, b.rec_id AS idB,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM recs a JOIN recs b ON a.rec_id < b.rec_id
        |WHERE levenshtein(a.name, b.name) <= 1
        |ORDER BY idA, idB""".stripMargin,

    // The streaming twin converges to the batch entities identically
    // (exact integer/string computation end to end) — the batch oracle
    // applies VERBATIM, the q_stream_classify discipline.
    "q_stream_er" -> erEntitiesOracleSql,

    "q_hilbert_value" -> hilbertOracleSql,

    // Min-label propagation to a fixpoint (recursive CTE), the
    // q_dedup_cc idiom, over the brute-force match edges.
    "q_er_entities" -> erEntitiesOracleSql,

    // Streaming inference must converge to the one-shot batch result —
    // the SAME oracle, verbatim.
    "q_stream_classify" -> nbOracleSql,

    "q_sim_topk" ->
      """SELECT query_id, rank, neighbor_id, cosine FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ROUND(list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC, c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 16) t
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // MMR oracle: the greedy replayed as a recursive CTE. Each query
    // carries its candidate id/rel lists and full pairwise sim matrix
    // (micro-quantized like the Spark side); each step picks
    // list_max over remaining positions of the struct (units, −id, …) —
    // lexicographic struct comparison IS the (objective, smaller-id)
    // tie-break — and appends the pick to the selected-positions list.
    // Integer units throughout: no float comparison can diverge.
    "q_sim_mmr" ->
      """WITH RECURSIVE cand AS (
        |  SELECT query_id, neighbor_id, rel_micro, emb FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      CAST(ROUND((list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |        / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |           * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 1000000) AS BIGINT) AS rel_micro,
        |      c.embedding AS emb,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |        / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |           * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC, c.vec_id) AS rank
        |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |    WHERE q.vec_id < 16
        |      AND list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
        |      AND list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0) t
        |  WHERE rank <= 12),
        |packed AS (
        |  SELECT query_id, list(neighbor_id ORDER BY rel_micro DESC, neighbor_id) AS ids,
        |    list(rel_micro ORDER BY rel_micro DESC, neighbor_id) AS rels,
        |    list(emb ORDER BY rel_micro DESC, neighbor_id) AS vecs
        |  FROM cand GROUP BY query_id),
        |simmat AS (
        |  SELECT query_id, ids, rels,
        |    [[CAST(ROUND((list_sum(list_transform(list_zip(vecs[i], vecs[j]), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(vecs[i], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(vecs[j], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 1000000) AS BIGINT)
        |      for j in range(1, len(ids) + 1)] for i in range(1, len(ids) + 1)] AS sims
        |  FROM packed),
        |sel AS (
        |  SELECT query_id, ids, rels, sims, 0 AS step,
        |    CAST([] AS BIGINT[]) AS selp,
        |    CAST([] AS STRUCT(st BIGINT, nid BIGINT, rel BIGINT, ms BIGINT, units BIGINT)[]) AS outp
        |  FROM simmat
        |  UNION ALL
        |  SELECT query_id, ids, rels, sims, step + 1,
        |    list_append(selp, best.p),
        |    list_append(outp, {'st': step + 1, 'nid': ids[best.p], 'rel': rels[best.p],
        |      'ms': best.ms, 'units': best.units})
        |  FROM (
        |    SELECT *, list_max(
        |      [{'units': 700000 * rels[p] - 300000 * coalesce(list_max([sims[p][s] for s in selp]), 0),
        |        'negid': -ids[p], 'p': p,
        |        'ms': coalesce(list_max([sims[p][s] for s in selp]), 0)}
        |       for p in range(1, len(ids) + 1) if NOT list_contains(selp, p)]) AS best
        |    FROM sel WHERE step < 5 AND len(selp) < len(ids)) s)
        |SELECT query_id, st AS step, nid AS neighbor_id, rel AS rel_micro,
        |  ms AS maxsim_micro, units AS mmr_units
        |FROM (SELECT query_id, unnest(outp, recursive := true) FROM sel WHERE step = 5)
        |ORDER BY query_id, step""".stripMargin,

    // nprobe = k probes all lists ⇒ provably identical to exact top-k, so
    // the exact-cosine oracle applies verbatim.
    "q_sim_topk_ivf_full" ->
      """SELECT query_id, rank, neighbor_id, cosine FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ROUND(list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_sum(list_transform(list_zip(q.embedding, c.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC, c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 16) t
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q_sim_topk_lsh" -> lshTopkOracleSql,

    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS fp_norm,
        |  CAST(length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS BIGINT) AS fp_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_events_pipeline" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |labeled AS (
        |  SELECT user_id, us,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged),
        |per_session AS (
        |  SELECT user_id, session_seq, COUNT(*) AS n_ev
        |  FROM labeled GROUP BY user_id, session_seq),
        |sessions AS (
        |  SELECT user_id, COUNT(*) AS n_sessions, MAX(n_ev) AS max_session_events
        |  FROM per_session GROUP BY user_id),
        |t1 AS (SELECT user_id, MIN(us) FILTER (WHERE event_type = 'view') AS t_view
        |       FROM ev GROUP BY user_id),
        |t2 AS (SELECT ev.user_id,
        |         MIN(us) FILTER (WHERE event_type = 'click' AND t_view IS NOT NULL AND us > t_view) AS t_click
        |       FROM ev JOIN t1 USING (user_id) GROUP BY ev.user_id),
        |t3 AS (SELECT ev.user_id,
        |         MIN(us) FILTER (WHERE event_type = 'purchase' AND t_click IS NOT NULL AND us > t_click) AS t_purchase
        |       FROM ev JOIN t2 USING (user_id) GROUP BY ev.user_id),
        |fun AS (
        |  SELECT user_id,
        |    CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
        |              WHEN t_click IS NOT NULL THEN 2
        |              WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth
        |  FROM t1 JOIN t2 USING (user_id) JOIN t3 USING (user_id)),
        |piv AS (
        |  SELECT user_id,
        |    COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
        |    COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
        |    COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
        |  FROM ev GROUP BY user_id)
        |SELECT user_id, n_sessions, max_session_events, depth, n_view, n_click, n_purchase
        |FROM sessions JOIN fun USING (user_id) JOIN piv USING (user_id)
        |ORDER BY user_id""".stripMargin,

    // Same strict-> split rule as q_sessionize (session windows merge when
    // they touch); only the output shape differs.
    "q_stream_sessions" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |labeled AS (
        |  SELECT user_id, us,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged)
        |SELECT user_id, MIN(us) AS session_start, MAX(us) AS session_last,
        |  COUNT(*) AS n_events
        |FROM labeled GROUP BY user_id, session_seq
        |ORDER BY user_id, session_start""".stripMargin,

    "q_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |labeled AS (
        |  SELECT user_id, us,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  MIN(us) AS session_start, MAX(us) AS session_end, COUNT(*) AS n_events
        |FROM labeled GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    "q_tfidf_topterms" ->
      """WITH docterm AS (
        |  SELECT doc_id, term FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |    FROM documents) t
        |  WHERE term <> ''),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM docterm GROUP BY 1, 2),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, term,
        |    ROUND(CAST(tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / df), 6) AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc_id, term, rank, tfidf FROM (
        |  SELECT doc_id, term, tfidf,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        |  FROM scored) z
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // Same fixed-order double arithmetic as VectorQuantize (float->double
    // casts are exact; left-assoc (v-lo)*127/(hi-lo)+0.5 in both engines).
    "q_vec_quantize" ->
      """WITH ex AS (SELECT vec_id, i - 1 AS dim,
        |              CAST(list_extract(embedding, i) AS DOUBLE) AS v
        |            FROM embeddings,
        |              LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) r),
        |cb AS (SELECT dim, min(v) AS lo, max(v) AS hi FROM ex GROUP BY dim)
        |SELECT e.vec_id, e.dim,
        |  CASE WHEN cb.hi = cb.lo THEN 0
        |       ELSE CAST(FLOOR((e.v - cb.lo) * 127.0 / (cb.hi - cb.lo) + 0.5) AS BIGINT) END AS code
        |FROM ex e JOIN cb USING (dim)
        |WHERE e.vec_id < 160
        |ORDER BY e.vec_id, e.dim""".stripMargin,

    "q_sample_per_group" ->
      """WITH h AS (SELECT doc_id, source,
        |    ((doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |     + (doc_id % 65536) * 2654435761) % 4294967296 AS slot
        |  FROM documents)
        |SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY slot, doc_id) AS rn
        |  FROM h) t
        |WHERE rn <= 5 ORDER BY source, doc_id""".stripMargin,

    // Quality gate: stats formulas identical to q_text_stats /
    // q_text_repetition; concat_ws skips the NULL (passing) rules in both
    // engines, so `reasons` is byte-identical. The Gopher structural
    // rules are replayed generically (symbol ratio, bullet/ellipsis line
    // fractions with the >=3-line guard); the COMPRESSIBLE rule is an
    // exact-regime pin rather than a replay (DuckDB cannot deflate):
    // every natural-text doc in the fixture corpus deflates to >= 0.38
    // of its raw bytes (measured floor across sf0.001/0.01/0.1), the
    // threshold sits at 0.25, so the rule provably never fires here —
    // omitting it from the CASE ladder asserts exactly that, and a
    // spurious engine-side fire breaks the hash.
    "q_quality_filter" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
        |bg AS (SELECT doc_id, len(tk) AS n_tok, list_extract(tk, i) || ' ' || list_extract(tk, i+1) AS b
        |       FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
        |       WHERE len(tk) >= 2),
        |m AS (SELECT doc_id, n_tok, max(c) AS maxc FROM (
        |        SELECT doc_id, n_tok, b, count(*) AS c FROM bg GROUP BY 1, 2, 3) z
        |      GROUP BY 1, 2),
        |rep AS (SELECT d.doc_id, COALESCE(2.0 * m.maxc / m.n_tok, 0.0) AS rep
        |        FROM documents d LEFT JOIN m USING (doc_id)),
        |st0 AS (SELECT doc_id, text,
        |    CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
        |         ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |    END AS n_tokens
        |  FROM documents),
        |st AS (SELECT doc_id, n_tokens,
        |    CASE WHEN n_tokens = 0 THEN 0.0
        |         ELSE CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / n_tokens
        |    END AS mtl,
        |    CASE WHEN n_tokens = 0 THEN 0.0
        |         ELSE CAST(len(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS DOUBLE) / n_tokens
        |    END AS ttr,
        |    CASE WHEN n_tokens = 0 THEN 0.0
        |         ELSE CAST(len(regexp_extract_all(text, '(?i)\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by|from|that|this)\b')) AS DOUBLE) / n_tokens
        |    END AS stopr
        |  FROM st0),
        |ln AS (SELECT doc_id, string_split(text, chr(10)) AS ls,
        |    CAST(length(text) - length(replace(text, '#', ''))
        |      + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE) AS syms
        |  FROM documents),
        |lf AS (SELECT doc_id, syms,
        |    CASE WHEN len(ls) >= 3
        |      THEN CAST(len(list_filter(ls, l -> regexp_matches(ltrim(l), '^[-*] '))) AS DOUBLE) / len(ls)
        |      ELSE 0.0 END AS bulletf,
        |    CASE WHEN len(ls) >= 3
        |      THEN CAST(len(list_filter(ls, l -> regexp_matches(rtrim(l), '\.\.\.$'))) AS DOUBLE) / len(ls)
        |      ELSE 0.0 END AS ellipf
        |  FROM ln),
        |r AS (SELECT st.doc_id,
        |    concat_ws(',',
        |      CASE WHEN bulletf > 0.9 THEN 'bullet_lines' END,
        |      CASE WHEN ellipf > 0.3 THEN 'ellipsis_lines' END,
        |      CASE WHEN ttr < 0.35 THEN 'low_diversity' END,
        |      CASE WHEN stopr < 0.02 THEN 'no_stopwords' END,
        |      CASE WHEN rep > 0.125 THEN 'repetitive' END,
        |      CASE WHEN n_tokens > 0 AND syms / n_tokens > 0.1 THEN 'symbol_ratio' END,
        |      CASE WHEN mtl < 3.0 OR mtl > 8.0 THEN 'token_len' END,
        |      CASE WHEN n_tokens > 100000 THEN 'too_long' END,
        |      CASE WHEN n_tokens < 20 THEN 'too_short' END) AS reasons
        |  FROM st JOIN rep USING (doc_id) JOIN lf ON lf.doc_id = st.doc_id)
        |SELECT doc_id, reasons = '' AS keep, reasons FROM r ORDER BY doc_id""".stripMargin,

    // Gopher-gate oracle: the 6-word relining + per-slot pathology is
    // reconstructed, every SQL-expressible rule is replayed over that
    // SAME text, and `compressible` is the planted doc_id%5=4 slot (the
    // deflate pin documented at q_quality_filter — 0.04 planted vs 0.25
    // threshold vs 0.38 natural floor).
    "q_quality_filter_gopher" ->
      """WITH w AS (
        |  SELECT doc_id, i - 1 AS wi, lst[i] AS wd
        |  FROM (SELECT doc_id,
        |          list_filter(string_split(text, ' '), x -> x <> '') AS lst
        |        FROM documents),
        |       LATERAL (SELECT unnest(range(1, len(lst) + 1)) AS i) r),
        |lines0 AS (
        |  SELECT doc_id, wi // 6 AS li, string_agg(wd, ' ' ORDER BY wi) AS line
        |  FROM w GROUP BY doc_id, wi // 6),
        |relined AS (
        |  SELECT doc_id,
        |    string_agg(line, chr(10) ORDER BY li) AS t0,
        |    string_agg('- ' || line, chr(10) ORDER BY li) AS t1,
        |    string_agg(line || '...', chr(10) ORDER BY li) AS t2,
        |    string_agg(line || ' #', chr(10) ORDER BY li) AS t3
        |  FROM lines0 GROUP BY doc_id),
        |txt AS (
        |  SELECT d.doc_id,
        |    CASE d.doc_id % 5 WHEN 1 THEN t1 WHEN 2 THEN t2 WHEN 3 THEN t3
        |      WHEN 4 THEN repeat('lorem ipsum ', 40) ELSE t0 END AS text
        |  FROM documents d JOIN relined USING (doc_id)),
        |toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM txt),
        |bg AS (SELECT doc_id, len(tk) AS n_tok, list_extract(tk, i) || ' ' || list_extract(tk, i+1) AS b
        |       FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
        |       WHERE len(tk) >= 2),
        |m AS (SELECT doc_id, n_tok, max(c) AS maxc FROM (
        |        SELECT doc_id, n_tok, b, count(*) AS c FROM bg GROUP BY 1, 2, 3) z
        |      GROUP BY 1, 2),
        |rep AS (SELECT t.doc_id, COALESCE(2.0 * m.maxc / m.n_tok, 0.0) AS rep
        |        FROM txt t LEFT JOIN m USING (doc_id)),
        |st0 AS (SELECT doc_id, text,
        |    CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
        |         ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |    END AS n_tokens
        |  FROM txt),
        |st AS (SELECT doc_id, n_tokens,
        |    CASE WHEN n_tokens = 0 THEN 0.0
        |         ELSE CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / n_tokens
        |    END AS mtl,
        |    CASE WHEN n_tokens = 0 THEN 0.0
        |         ELSE CAST(len(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS DOUBLE) / n_tokens
        |    END AS ttr,
        |    CASE WHEN n_tokens = 0 THEN 0.0
        |         ELSE CAST(len(regexp_extract_all(text, '(?i)\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by|from|that|this)\b')) AS DOUBLE) / n_tokens
        |    END AS stopr
        |  FROM st0),
        |ln AS (SELECT doc_id, string_split(text, chr(10)) AS ls,
        |    CAST(length(text) - length(replace(text, '#', ''))
        |      + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE) AS syms
        |  FROM txt),
        |lf AS (SELECT doc_id, syms,
        |    CASE WHEN len(ls) >= 3
        |      THEN CAST(len(list_filter(ls, l -> regexp_matches(ltrim(l), '^[-*] '))) AS DOUBLE) / len(ls)
        |      ELSE 0.0 END AS bulletf,
        |    CASE WHEN len(ls) >= 3
        |      THEN CAST(len(list_filter(ls, l -> regexp_matches(rtrim(l), '\.\.\.$'))) AS DOUBLE) / len(ls)
        |      ELSE 0.0 END AS ellipf
        |  FROM ln),
        |r AS (SELECT st.doc_id,
        |    concat_ws(',',
        |      CASE WHEN bulletf > 0.9 THEN 'bullet_lines' END,
        |      CASE WHEN st.doc_id % 5 = 4 THEN 'compressible' END,
        |      CASE WHEN ellipf > 0.3 THEN 'ellipsis_lines' END,
        |      CASE WHEN ttr < 0.35 THEN 'low_diversity' END,
        |      CASE WHEN stopr < 0.02 THEN 'no_stopwords' END,
        |      CASE WHEN rep > 0.125 THEN 'repetitive' END,
        |      CASE WHEN n_tokens > 0 AND syms / n_tokens > 0.1 THEN 'symbol_ratio' END,
        |      CASE WHEN mtl < 3.0 OR mtl > 8.0 THEN 'token_len' END,
        |      CASE WHEN n_tokens > 100000 THEN 'too_long' END,
        |      CASE WHEN n_tokens < 20 THEN 'too_short' END) AS reasons
        |  FROM st JOIN rep USING (doc_id) JOIN lf ON lf.doc_id = st.doc_id)
        |SELECT doc_id, reasons = '' AS keep, reasons FROM r ORDER BY doc_id""".stripMargin,

    // Same chunking arithmetic as q_text_chunks, then group-by-chunk with
    // the composite-min owner key (doc*2^20 + chunk ordinal).
    "q_dedup_chunks" ->
      """WITH ch AS (
        |  SELECT doc_id, st // 150 AS chunk_id, substring(text, CAST(st AS INT) + 1, 200) AS chunk
        |  FROM (SELECT doc_id, text, unnest(range(0, greatest(length(text) - 50, 1), 150)) AS st FROM documents))
        |SELECT CAST(min(doc_id * 1048576 + chunk_id) // 1048576 AS BIGINT) AS owner_doc,
        |  CAST(min(doc_id * 1048576 + chunk_id) % 1048576 AS BIGINT) AS owner_chunk,
        |  count(*) AS n_copies, chunk
        |FROM ch GROUP BY chunk HAVING count(*) >= 2
        |ORDER BY owner_doc, owner_chunk, chunk""".stripMargin,

    "q_join_bloom" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey = 3)
        |ORDER BY o_orderkey""".stripMargin,

    // Morton spread ladder unrolled as CTE rounds; masks are the classic
    // 0x00FF00FF / 0x0F0F0F0F / 0x33333333 / 0x55555555 constants.
    "q_zorder_value" ->
      """WITH z0 AS (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |              l_orderkey & 65535 AS a, l_partkey & 65535 AS b FROM lineitem),
        |z1 AS (SELECT l_orderkey, l_linenumber,
        |         (a | (a << 8)) & 16711935 AS a, (b | (b << 8)) & 16711935 AS b FROM z0),
        |z2 AS (SELECT l_orderkey, l_linenumber,
        |         (a | (a << 4)) & 252645135 AS a, (b | (b << 4)) & 252645135 AS b FROM z1),
        |z3 AS (SELECT l_orderkey, l_linenumber,
        |         (a | (a << 2)) & 858993459 AS a, (b | (b << 2)) & 858993459 AS b FROM z2),
        |z4 AS (SELECT l_orderkey, l_linenumber,
        |         (a | (a << 1)) & 1431655765 AS a, (b | (b << 1)) & 1431655765 AS b FROM z3)
        |SELECT l_orderkey, l_linenumber, (a << 1) | b AS zval
        |FROM z4 ORDER BY zval, l_orderkey, l_linenumber""".stripMargin,

    // Winnowing twins: the 31-fold poly hash is plain BIGINT math (every
    // intermediate < 2^37), the w=4 window min + rightmost-tie selection is
    // a window function + a bounded self-join, and selected positions are
    // non-decreasing so DISTINCT == the operator's dedupe-vs-last.
    "q_winnow_fp" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
        |              FROM documents),
        |kg AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
        |         list_extract(tk,i)||' '||list_extract(tk,i+1)||' '||
        |         list_extract(tk,i+2)||' '||list_extract(tk,i+3) AS g
        |       FROM toks, LATERAL (SELECT unnest(range(1, len(tk)-2)) AS i) r
        |       WHERE len(tk) >= 4),
        |h AS (SELECT doc_id, pos,
        |        list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(split(g,''), c -> CAST(unicode(c) AS BIGINT))),
        |          (a, c) -> (a*31 + c) % 4294967296) AS fp_hash
        |      FROM kg),
        |w AS (SELECT doc_id, pos, fp_hash,
        |        min(fp_hash) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
        |        count(*) OVER (PARTITION BY doc_id) AS m
        |      FROM h),
        |sel AS (SELECT w.doc_id, max(h2.pos) AS pos, w.wmin AS fp_hash
        |        FROM w JOIN h h2 ON h2.doc_id = w.doc_id
        |          AND h2.pos BETWEEN w.pos AND w.pos + 3 AND h2.fp_hash = w.wmin
        |        WHERE w.pos <= greatest(w.m - 4, 0)
        |        GROUP BY w.doc_id, w.pos, w.wmin)
        |SELECT DISTINCT doc_id, pos, fp_hash FROM sel ORDER BY doc_id, pos""".stripMargin,

    "q_winnow_overlap" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
        |              FROM documents),
        |kg AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
        |         list_extract(tk,i)||' '||list_extract(tk,i+1)||' '||
        |         list_extract(tk,i+2)||' '||list_extract(tk,i+3) AS g
        |       FROM toks, LATERAL (SELECT unnest(range(1, len(tk)-2)) AS i) r
        |       WHERE len(tk) >= 4),
        |h AS (SELECT doc_id, pos,
        |        list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(split(g,''), c -> CAST(unicode(c) AS BIGINT))),
        |          (a, c) -> (a*31 + c) % 4294967296) AS fp_hash
        |      FROM kg),
        |w AS (SELECT doc_id, pos, fp_hash,
        |        min(fp_hash) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
        |        count(*) OVER (PARTITION BY doc_id) AS m
        |      FROM h),
        |sel AS (SELECT w.doc_id, max(h2.pos) AS pos, w.wmin AS fp_hash
        |        FROM w JOIN h h2 ON h2.doc_id = w.doc_id
        |          AND h2.pos BETWEEN w.pos AND w.pos + 3 AND h2.fp_hash = w.wmin
        |        WHERE w.pos <= greatest(w.m - 4, 0)
        |        GROUP BY w.doc_id, w.pos, w.wmin),
        |fp AS (SELECT DISTINCT doc_id, fp_hash FROM sel),
        |freq AS (SELECT fp_hash, count(*) AS df FROM fp GROUP BY 1),
        |keep AS (SELECT doc_id, fp_hash FROM fp JOIN freq USING (fp_hash)
        |         WHERE df <= 50),
        |sz AS (SELECT doc_id, count(*) AS nfp FROM keep GROUP BY 1),
        |p AS (SELECT a.doc_id AS idA, b.doc_id AS idB, count(*) AS shared
        |      FROM keep a JOIN keep b
        |        ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT idA, idB, shared,
        |  ROUND(CAST(shared AS DOUBLE) / least(sa.nfp, sb.nfp), 6) AS containment
        |FROM p JOIN sz sa ON sa.doc_id = idA JOIN sz sb ON sb.doc_id = idB
        |ORDER BY idA, idB""".stripMargin,

    // Split leakage: the q_winnow_overlap pair chain joined with the
    // q_corpus_split assignment chain, cross-split pairs only.
    "q_split_leakage" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
        |              FROM documents),
        |kg AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
        |         list_extract(tk,i)||' '||list_extract(tk,i+1)||' '||
        |         list_extract(tk,i+2)||' '||list_extract(tk,i+3) AS g
        |       FROM toks, LATERAL (SELECT unnest(range(1, len(tk)-2)) AS i) r
        |       WHERE len(tk) >= 4),
        |h AS (SELECT doc_id, pos,
        |        list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(split(g,''), c -> CAST(unicode(c) AS BIGINT))),
        |          (a, c) -> (a*31 + c) % 4294967296) AS fp_hash
        |      FROM kg),
        |w AS (SELECT doc_id, pos, fp_hash,
        |        min(fp_hash) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
        |        count(*) OVER (PARTITION BY doc_id) AS m
        |      FROM h),
        |sel AS (SELECT w.doc_id, max(h2.pos) AS pos, w.wmin AS fp_hash
        |        FROM w JOIN h h2 ON h2.doc_id = w.doc_id
        |          AND h2.pos BETWEEN w.pos AND w.pos + 3 AND h2.fp_hash = w.wmin
        |        WHERE w.pos <= greatest(w.m - 4, 0)
        |        GROUP BY w.doc_id, w.pos, w.wmin),
        |fp AS (SELECT DISTINCT doc_id, fp_hash FROM sel),
        |freq AS (SELECT fp_hash, count(*) AS df FROM fp GROUP BY 1),
        |keep AS (SELECT doc_id, fp_hash FROM fp JOIN freq USING (fp_hash)
        |         WHERE df <= 50),
        |sz AS (SELECT doc_id, count(*) AS nfp FROM keep GROUP BY 1),
        |p AS (SELECT a.doc_id AS idA, b.doc_id AS idB, count(*) AS shared
        |      FROM keep a JOIN keep b
        |        ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |pr AS (SELECT idA, idB, shared,
        |         ROUND(CAST(shared AS DOUBLE) / least(sa.nfp, sb.nfp), 6) AS containment
        |       FROM p JOIN sz sa ON sa.doc_id = idA JOIN sz sb ON sb.doc_id = idB),
        |k1 AS (SELECT doc_id,
        |         ((doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |          + (doc_id % 65536) * 2654435761) % 4294967296 AS s1
        |       FROM documents),
        |sp AS (SELECT doc_id,
        |         CAST(CASE WHEN slot < 800 THEN 0 WHEN slot < 900 THEN 1 ELSE 2 END AS BIGINT) AS split
        |       FROM (SELECT doc_id,
        |               (((s1 + 42) % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |                + ((s1 + 42) % 65536) * 2654435761) % 4294967296 % 1000 AS slot
        |             FROM k1))
        |SELECT pr.idA, pr.idB, spa.split AS splitA, spb.split AS splitB,
        |  pr.shared, pr.containment
        |FROM pr JOIN sp spa ON spa.doc_id = pr.idA
        |        JOIN sp spb ON spb.doc_id = pr.idB
        |WHERE spa.split <> spb.split
        |ORDER BY idA, idB""".stripMargin,

    // Source overlap: the q_winnow_overlap CTE chain through the doc-freq
    // prune, then rolled up to DISTINCT (source, fp) sets before the
    // fp-keyed self-join.
    "q_source_overlap" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
        |              FROM documents),
        |kg AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
        |         list_extract(tk,i)||' '||list_extract(tk,i+1)||' '||
        |         list_extract(tk,i+2)||' '||list_extract(tk,i+3) AS g
        |       FROM toks, LATERAL (SELECT unnest(range(1, len(tk)-2)) AS i) r
        |       WHERE len(tk) >= 4),
        |h AS (SELECT doc_id, pos,
        |        list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(split(g,''), c -> CAST(unicode(c) AS BIGINT))),
        |          (a, c) -> (a*31 + c) % 4294967296) AS fp_hash
        |      FROM kg),
        |w AS (SELECT doc_id, pos, fp_hash,
        |        min(fp_hash) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
        |        count(*) OVER (PARTITION BY doc_id) AS m
        |      FROM h),
        |sel AS (SELECT w.doc_id, max(h2.pos) AS pos, w.wmin AS fp_hash
        |        FROM w JOIN h h2 ON h2.doc_id = w.doc_id
        |          AND h2.pos BETWEEN w.pos AND w.pos + 3 AND h2.fp_hash = w.wmin
        |        WHERE w.pos <= greatest(w.m - 4, 0)
        |        GROUP BY w.doc_id, w.pos, w.wmin),
        |fp AS (SELECT DISTINCT doc_id, fp_hash FROM sel),
        |freq AS (SELECT fp_hash, count(*) AS df FROM fp GROUP BY 1),
        |keep AS (SELECT doc_id, fp_hash FROM fp JOIN freq USING (fp_hash)
        |         WHERE df <= 50),
        |sfp AS (SELECT DISTINCT d.source AS src, k.fp_hash
        |        FROM keep k JOIN documents d USING (doc_id)),
        |sz AS (SELECT src, count(*) AS nfp FROM sfp GROUP BY 1),
        |p AS (SELECT a.src AS srcA, b.src AS srcB, count(*) AS shared
        |      FROM sfp a JOIN sfp b ON a.fp_hash = b.fp_hash AND a.src < b.src
        |      GROUP BY 1, 2)
        |SELECT srcA, srcB, shared,
        |  ROUND(CAST(shared AS DOUBLE) / least(sa.nfp, sb.nfp), 6) AS containment
        |FROM p JOIN sz sa ON sa.src = srcA JOIN sz sb ON sb.src = srcB
        |ORDER BY srcA, srcB""".stripMargin,

    "q_sample_stratified" ->
      """SELECT doc_id, stratum, slot FROM (
        |  SELECT doc_id,
        |    CASE WHEN length(text) < 300 THEN 'short'
        |         WHEN length(text) < 600 THEN 'mid' ELSE 'long' END AS stratum,
        |    ((doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |     + (doc_id % 65536) * 2654435761) % 4294967296 % 1000 AS slot
        |  FROM documents) t
        |WHERE slot < CASE stratum WHEN 'short' THEN 100 WHEN 'mid' THEN 500 ELSE 1000 END
        |ORDER BY doc_id""".stripMargin,

    // Double Knuth application with the seed folded in between; every
    // intermediate stays under 2^48 (the split-16 idiom), so JVM and ANSI
    // integer semantics agree at any doc_id.
    "q_corpus_shuffle" ->
      """WITH k1 AS (
        |  SELECT doc_id,
        |    ((doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |     + (doc_id % 65536) * 2654435761) % 4294967296 AS s1
        |  FROM documents),
        |k2 AS (
        |  SELECT doc_id,
        |    (((s1 + 42) % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |     + ((s1 + 42) % 65536) * 2654435761) % 4294967296 AS sk
        |  FROM k1)
        |SELECT doc_id, sk % 8 AS shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY sk % 8 ORDER BY sk, doc_id) - 1 AS BIGINT) AS pos
        |FROM k2 ORDER BY shard, pos""".stripMargin,

    "q_corpus_split" ->
      """WITH k1 AS (
        |  SELECT doc_id,
        |    ((doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |     + (doc_id % 65536) * 2654435761) % 4294967296 AS s1
        |  FROM documents),
        |k2 AS (
        |  SELECT doc_id,
        |    (((s1 + 42) % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |     + ((s1 + 42) % 65536) * 2654435761) % 4294967296 % 1000 AS slot
        |  FROM k1)
        |SELECT doc_id,
        |  CAST(CASE WHEN slot < 800 THEN 0 WHEN slot < 900 THEN 1 ELSE 2 END AS BIGINT) AS split
        |FROM k2 ORDER BY doc_id""".stripMargin,

    // Weighted priority sample: same split-16 double-Knuth slot as
    // q_corpus_split (seed 7, no per-mille reduction), priority
    // w*2^32/(slot+1) as the identical two IEEE-double ops.
    "q_sample_weighted" ->
      """WITH k1 AS (
        |  SELECT doc_id, n_chars,
        |    ((doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |     + (doc_id % 65536) * 2654435761) % 4294967296 AS s1
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0),
        |k2 AS (
        |  SELECT doc_id, n_chars,
        |    (((s1 + 7) % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |     + ((s1 + 7) % 65536) * 2654435761) % 4294967296 AS slot
        |  FROM k1),
        |sel AS (
        |  SELECT doc_id, n_chars FROM k2
        |  ORDER BY CAST(n_chars AS DOUBLE) * 4294967296 / (slot + 1) DESC, doc_id
        |  LIMIT 500)
        |SELECT doc_id, n_chars FROM sel ORDER BY doc_id""".stripMargin,

    // Rebuilds the synthetic PII text and the email→IP→phone redaction
    // chain verbatim (DuckDB regexp_replace needs the 'g' flag — its
    // default replaces only the first match, Spark replaces all).
    "q_pii_redact" ->
      """WITH pii AS (
        |  SELECT doc_id,
        |    substring(text, 1, 40)
        |      || ' user' || CAST(doc_id AS VARCHAR) || '@example' || CAST(doc_id % 7 AS VARCHAR) || '.com'
        |      || CASE WHEN doc_id % 3 = 0
        |              THEN ' 555-01' || CAST(doc_id % 10 AS VARCHAR) || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |              ELSE '' END
        |      || CASE WHEN doc_id % 4 = 0
        |              THEN ' 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 31) % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR)
        |              ELSE '' END AS pii_text
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, pii_text,
        |    regexp_replace(pii_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS after_email
        |  FROM pii),
        |st2 AS (
        |  SELECT doc_id, pii_text, after_email,
        |    regexp_replace(after_email, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS after_ip
        |  FROM st)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(pii_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(after_ip, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(after_email, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  regexp_replace(after_ip, '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |FROM st2 ORDER BY doc_id""".stripMargin,

    "q_distinct_users" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_hll_rollup_exact" ->
      """SELECT CAST(event_type AS VARCHAR) AS segment,
        |  COUNT(DISTINCT user_id) AS n_distinct
        |FROM events WHERE user_id IS NOT NULL GROUP BY 1
        |UNION ALL
        |SELECT '__TOTAL__', COUNT(DISTINCT user_id)
        |FROM events WHERE user_id IS NOT NULL
        |ORDER BY segment""".stripMargin,

    "q_hll_rollup_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS segment,
        |  CAST(NULL AS BIGINT) AS est_distinct, CAST(NULL AS BIGINT) AS exact
        |WHERE FALSE""".stripMargin,

    "q_hll_native_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS segment, CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    "q_stream_hll_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS segment, CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    "q_cms_native_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS subject, CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    // KMV pair overlap: distinct (segment, value) pairs, pairwise sizes +
    // intersections, Jaccard in ppm via pure INTEGER division (no float
    // rounding drift). Every arithmetic output CAST to BIGINT — DuckDB
    // keeps +/- on BIGINT as BIGINT today, but the casts pin the contract.
    "q_kmv_overlap_exact" ->
      """WITH sv AS (
        |  SELECT DISTINCT CAST(l_returnflag AS VARCHAR) AS segment,
        |    CAST(l_orderkey AS BIGINT) AS v
        |  FROM lineitem WHERE l_orderkey IS NOT NULL),
        |sizes AS (SELECT segment, COUNT(*) AS sz FROM sv GROUP BY 1),
        |inter AS (
        |  SELECT a.segment AS seg_a, b.segment AS seg_b, COUNT(*) AS i
        |  FROM sv a JOIN sv b ON a.v = b.v AND a.segment < b.segment
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.segment AS seg_a, b.segment AS seg_b,
        |    a.sz AS sza, b.sz AS szb
        |  FROM sizes a JOIN sizes b ON a.segment < b.segment)
        |SELECT p.seg_a, p.seg_b,
        |  CAST(p.sza + p.szb - COALESCE(i.i, 0) AS BIGINT) AS union_cnt,
        |  CAST(COALESCE(i.i, 0) AS BIGINT) AS intersect_cnt,
        |  CAST(p.sza - COALESCE(i.i, 0) AS BIGINT) AS diff_ab_cnt,
        |  CAST((1000000 * COALESCE(i.i, 0))
        |    // (p.sza + p.szb - COALESCE(i.i, 0)) AS BIGINT) AS jaccard_ppm
        |FROM pairs p
        |LEFT JOIN inter i ON i.seg_a = p.seg_a AND i.seg_b = p.seg_b
        |ORDER BY 1, 2""".stripMargin,

    "q_kmv_overlap_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS seg_a, CAST(NULL AS VARCHAR) AS seg_b,
        |  CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    "q_source_overlap_est_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS seg_a, CAST(NULL AS VARCHAR) AS seg_b,
        |  CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    "q_kcore_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS node, CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    "q_stream_kmv_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS seg_a, CAST(NULL AS VARCHAR) AS seg_b,
        |  CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    "q_stream_cms_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS subject, CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    // Streamed Bloom bits are engine-specific (XXH64 double hashing) —
    // headline is rows-only; the bit-equality + no-false-negative gate is
    // the correctness claim.
    "q_stream_bloom_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS segment, CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    "q_join_size_exact" ->
      """SELECT COUNT(*) AS true_size
        |FROM (SELECT CAST(user_id AS BIGINT) AS k FROM events
        |      WHERE user_id IS NOT NULL) a
        |JOIN (SELECT CAST(user_id AS BIGINT) AS k FROM events
        |      WHERE user_id IS NOT NULL) b ON a.k = b.k""".stripMargin,

    "q_join_size_est_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS subject, CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    // CDC merge: same derived batch, ROW_NUMBER winner per key by
    // (seq DESC, op DESC), anti-join + final non-delete rows.
    "q_cdc_apply" -> cdcApplySql,
    "q_incr_agg" -> incrAggSql,

    // Time travel: reading v1 of the versioned table after v2 committed
    // must equal replaying exactly ONE batch — the q_cdc_apply oracle
    // verbatim. The second (destructive) batch proves the pin is real.
    "q_table_asof" -> cdcApplySql,

    // Keep-best: ROW_NUMBER twin of the max_by(struct) — quality DESC
    // NULLS LAST then doc_id DESC matches Spark's null-smallest struct max.
    "q_dedup_keepbest" ->
      """SELECT doc_id, source, lang, quality FROM (
        |  SELECT doc_id, source, lang, length(text) AS quality,
        |    ROW_NUMBER() OVER (PARTITION BY source, lang
        |      ORDER BY length(text) DESC NULLS LAST, doc_id DESC) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY source, lang""".stripMargin,

    // Rate anomalies: same densified grid (LATERAL range over the global
    // bucket span), same ROWS window, same integer z-test. The STREAMING
    // twin is bit-identical (exact counts), so it shares this oracle.
    "q_rate_anomalies" -> rateAnomalySql,

    "q_stream_anomalies" -> rateAnomalySql,

    // Temporal split: same CASE ladder over epoch micros, same fixed
    // cutoff + 1-day embargo.
    "q_temporal_split" ->
      """SELECT event_id, user_id, epoch_us(ts) AS us,
        |  CASE WHEN epoch_us(ts) <= 1705276800000000 THEN 'train'
        |       WHEN epoch_us(ts) > 1705276800000000 + 86400000000 THEN 'test'
        |       ELSE 'embargo' END AS split
        |FROM events ORDER BY event_id""".stripMargin,

    // Snapshot diff: rebuild the same derived after-image, full-outer join
    // on the key, null-safe attribute compare (IS NOT DISTINCT FROM =
    // Spark's <=>), unchanged keys dropped.
    "q_table_diff" ->
      """WITH base AS (SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders),
        |aft AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 10
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM base WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_orderpriority, o_totalprice
        |  FROM base WHERE o_orderkey % 101 = 0),
        |d AS (
        |  SELECT COALESCE(b.o_orderkey, a.o_orderkey) AS o_orderkey,
        |    CASE WHEN b.o_orderkey IS NULL THEN 'added'
        |         WHEN a.o_orderkey IS NULL THEN 'removed'
        |         WHEN NOT (b.o_orderpriority IS NOT DISTINCT FROM a.o_orderpriority
        |                   AND b.o_totalprice IS NOT DISTINCT FROM a.o_totalprice)
        |           THEN 'changed' END AS status,
        |    b.o_orderpriority AS before_o_orderpriority,
        |    b.o_totalprice AS before_o_totalprice,
        |    a.o_orderpriority AS after_o_orderpriority,
        |    a.o_totalprice AS after_o_totalprice
        |  FROM base b FULL OUTER JOIN aft a ON b.o_orderkey = a.o_orderkey)
        |SELECT * FROM d WHERE status IS NOT NULL ORDER BY o_orderkey""".stripMargin,

    "q_agg_stddev" ->
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
        |  ROUND(var_samp(l_extendedprice), 4) AS var_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_window_moving" ->
      """SELECT o_orderpriority, o_orderkey,
        |  ROUND(AVG(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS ma4
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(LEAST(GREATEST(FLOOR(o_totalprice / 50000.0), 0), 11) AS BIGINT) AS bin,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin,

    "q_agg_argminmax" ->
      """SELECT o_orderpriority,
        |  arg_min(o_orderkey, date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) * 1099511627776 + o_orderkey) AS first_orderkey,
        |  arg_max(o_orderkey, date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) * 1099511627776 + o_orderkey) AS last_orderkey,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_text_levenshtein" ->
      """SELECT a.doc_id, CAST(levenshtein(substring(a.text, 1, 30), substring(b.text, 1, 30)) AS BIGINT) AS dist
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |ORDER BY a.doc_id""".stripMargin,

    "q_agg_corr" ->
      """SELECT l_returnflag,
        |  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  ROUND(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_set_except" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,

    "q_sql_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q_set_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,

    "q_sql_scalar_subquery" ->
      """SELECT c_custkey, c_name,
        |  (SELECT COUNT(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT MAX(o_totalprice) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer c
        |WHERE c_custkey <= (SELECT MAX(o_custkey) FROM orders)
        |ORDER BY c_custkey""".stripMargin,

    "q_window_percent_rank" ->
      """SELECT o_orderkey, o_orderpriority,
        |  PERCENT_RANK() OVER w AS pr, CUME_DIST() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_join_full_outer" ->
      """WITH od AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |ld AS (
        |  SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_bulk_items
        |  FROM lineitem WHERE l_quantity >= 48 GROUP BY 1)
        |SELECT COALESCE(od.d, ld.d) AS d,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  COALESCE(n_bulk_items, 0) AS n_bulk_items
        |FROM od FULL OUTER JOIN ld ON od.d = ld.d
        |ORDER BY d""".stripMargin,

    "q_window_leadlag" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |            FROM events)
        |SELECT user_id, event_id, event_type,
        |  us - LAG(us) OVER w AS gap_us,
        |  LEAD(event_type) OVER w AS next_type
        |FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
        |  FROM orders) r
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    // floor(v·1e6) of the same IEEE double product is the same long in
    // every engine, and long sums are order-independent — so the centroid
    // sum is engine-reproducible bit-for-bit; range(1,65) is the fixture's
    // fixed dim=64 (the Spark side is dimension-agnostic via posexplode).
    // Integer-only surface: qsum + n determine the mean exactly, so the
    // raw-double mean column is excluded from the hashed projection. ALL
    // four columns are CAST to VARCHAR on both sides: DuckDB's SUM(BIGINT)
    // returns HUGEINT (int128) where Spark emits BIGINT, and a driver-side
    // canonicalizer may repr those differently even when the values are
    // bit-identical — strings leave nothing type-dependent to compare.
    // Lloyd k-means, 2 iterations unrolled: exact decimal distances (the
    // quantized inputs make (x-c)^2 sums exact in both engines), centroid
    // updates round sum/count at 6dp, empty clusters keep their centroid.
    "q_kmeans_lloyd" ->
      """WITH v AS (
        |  SELECT vec_id, p.pos,
        |    CAST(ROUND(CAST(embedding[p.pos] AS DOUBLE), 6) AS DECIMAL(9,6)) AS x
        |  FROM embeddings, (SELECT UNNEST(RANGE(1, 65)) AS pos) p),
        |seeds AS (
        |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) AS cluster
        |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
        |c0 AS (SELECT s.cluster, v.pos, v.x AS c
        |       FROM seeds s JOIN v ON v.vec_id = s.vec_id),
        |a1 AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, cluster,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
        |    FROM (SELECT v.vec_id, c.cluster, SUM((v.x - c.c) * (v.x - c.c)) AS d2
        |          FROM v JOIN c0 c ON v.pos = c.pos GROUP BY 1, 2) d) z
        |  WHERE rn = 1),
        |u1 AS (
        |  SELECT a.cluster, v.pos,
        |    CAST(ROUND(CAST(SUM(v.x) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(9,6)) AS c
        |  FROM a1 a JOIN v ON v.vec_id = a.vec_id GROUP BY 1, 2),
        |c1 AS (SELECT c0.cluster, c0.pos, COALESCE(u1.c, c0.c) AS c
        |       FROM c0 LEFT JOIN u1 ON u1.cluster = c0.cluster AND u1.pos = c0.pos),
        |a2 AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, cluster,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
        |    FROM (SELECT v.vec_id, c.cluster, SUM((v.x - c.c) * (v.x - c.c)) AS d2
        |          FROM v JOIN c1 c ON v.pos = c.pos GROUP BY 1, 2) d) z
        |  WHERE rn = 1),
        |u2 AS (
        |  SELECT a.cluster, v.pos,
        |    CAST(ROUND(CAST(SUM(v.x) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(9,6)) AS c
        |  FROM a2 a JOIN v ON v.vec_id = a.vec_id GROUP BY 1, 2),
        |c2 AS (SELECT c1.cluster, c1.pos, COALESCE(u2.c, c1.c) AS c
        |       FROM c1 LEFT JOIN u2 ON u2.cluster = c1.cluster AND u2.pos = c1.pos),
        |a3 AS (
        |  SELECT vec_id, cluster, d2 FROM (
        |    SELECT vec_id, cluster, d2,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
        |    FROM (SELECT v.vec_id, c.cluster, SUM((v.x - c.c) * (v.x - c.c)) AS d2
        |          FROM v JOIN c2 c ON v.pos = c.pos GROUP BY 1, 2) d) z
        |  WHERE rn = 1)
        |SELECT vec_id, CAST(cluster AS INT) AS cluster,
        |  ROUND(CAST(d2 AS DOUBLE), 6) AS d2
        |FROM a3 ORDER BY vec_id""".stripMargin,

    "q_vec_centroid" ->
      """SELECT CAST(e.label AS VARCHAR) AS label, CAST(p.pos AS VARCHAR) AS pos,
        |  CAST(SUM(CAST(FLOOR(CAST(e.embedding[p.pos] AS DOUBLE) * 1000000) AS BIGINT)) AS VARCHAR) AS qsum,
        |  CAST(COUNT(*) AS VARCHAR) AS n
        |FROM embeddings e, (SELECT UNNEST(RANGE(1, 65)) AS pos) p
        |GROUP BY e.label, p.pos
        |ORDER BY e.label, p.pos""".stripMargin,

    "q_vec_centroid_verify" ->
      """SELECT CAST(NULL AS INTEGER) AS label, CAST(NULL AS BIGINT) AS pos,
        |  CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    "q_vec_pca_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS VARCHAR) AS issue,
        |  CAST(NULL AS DOUBLE) AS delta
        |WHERE FALSE""".stripMargin,

    "q_drift_psi" ->
      """WITH s AS (
        |  SELECT CASE WHEN CAST(value AS DOUBLE) <= 10 THEN 0
        |              WHEN CAST(value AS DOUBLE) <= 20 THEN 1
        |              WHEN CAST(value AS DOUBLE) <= 40 THEN 2
        |              WHEN CAST(value AS DOUBLE) <= 80 THEN 3
        |              WHEN CAST(value AS DOUBLE) <= 160 THEN 4
        |              ELSE 5 END AS bin, event_type
        |  FROM events
        |  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
        |c AS (
        |  SELECT bin,
        |    count(*) FILTER (WHERE event_type = 'view') AS n_ref,
        |    count(*) FILTER (WHERE event_type = 'purchase') AS n_cur
        |  FROM s GROUP BY bin),
        |t AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM c)
        |SELECT CAST(bin AS BIGINT) AS bin, n_ref, n_cur,
        |  ROUND(CAST(n_ref AS DOUBLE) / tr, 6) AS p_ref,
        |  ROUND(CAST(n_cur AS DOUBLE) / tc, 6) AS p_cur,
        |  CASE WHEN n_ref > 0 AND n_cur > 0 THEN
        |    ROUND((CAST(n_cur AS DOUBLE) / tc - CAST(n_ref AS DOUBLE) / tr)
        |          * ln((CAST(n_cur AS DOUBLE) / tc) / (CAST(n_ref AS DOUBLE) / tr)), 6)
        |  END AS psi_term
        |FROM c, t ORDER BY bin""".stripMargin,

    "q_outliers_mad" ->
      """WITH m AS (SELECT quantile_cont(CAST(value AS DOUBLE), 0.5) AS med FROM events),
        |d AS (SELECT med, quantile_cont(abs(CAST(value AS DOUBLE) - med), 0.5) AS mad
        |      FROM events, m GROUP BY med)
        |SELECT event_id, CAST(value AS DOUBLE) AS value,
        |  ROUND(CAST(value AS DOUBLE) - med, 6) AS deviation,
        |  CAST(value AS DOUBLE) > med AS is_high
        |FROM events, d
        |WHERE abs(CAST(value AS DOUBLE) - med) > CAST(3.5 AS DOUBLE) * mad
        |ORDER BY event_id""".stripMargin,

    "q_quantile_approx_verify" ->
      """SELECT CAST(NULL AS DOUBLE) AS p, CAST(NULL AS DOUBLE) AS qv,
        |  CAST(NULL AS BIGINT) AS cnt_lt, CAST(NULL AS BIGINT) AS cnt_le,
        |  CAST(NULL AS BIGINT) AS n
        |WHERE FALSE""".stripMargin,

    // Native-KLL headlines are approximate-by-design (arrival-order-
    // dependent summary content); their worst-case rank-ledger checks are
    // the gates, batch and streaming alike.
    "q_quantile_native_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS segment, CAST(NULL AS DOUBLE) AS p,
        |  CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    "q_stream_quantile_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS segment, CAST(NULL AS DOUBLE) AS p,
        |  CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    // One SELECT per profiled column, UNION ALL — the oracle mirror of
    // the one-pass profile (DuckDB reads the view once per branch; the
    // Spark side's single-scan shape is what the plan spec guards).
    "q_profile_table" ->
      """SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
        |  COUNT(*) FILTER (WHERE doc_id IS NULL) AS n_nulls,
        |  COUNT(DISTINCT doc_id) AS n_distinct,
        |  CAST(MIN(doc_id) AS VARCHAR) AS min_value, CAST(MAX(doc_id) AS VARCHAR) AS max_value
        |FROM documents
        |UNION ALL
        |SELECT 'lang', COUNT(*), COUNT(*) FILTER (WHERE lang IS NULL),
        |  COUNT(DISTINCT lang), CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
        |FROM documents
        |UNION ALL
        |SELECT 'source', COUNT(*), COUNT(*) FILTER (WHERE source IS NULL),
        |  COUNT(DISTINCT source), CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
        |FROM documents
        |UNION ALL
        |SELECT 'n_chars', COUNT(*), COUNT(*) FILTER (WHERE n_chars IS NULL),
        |  COUNT(DISTINCT n_chars), CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
        |FROM documents
        |ORDER BY col_name""".stripMargin,

    // Fixed-point norms are per-row HOF folds (BIGINT, no aggregate-type
    // widening); thresholds via the established quantile_cont identity.
    "q_vec_outliers" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    CAST(list_sum(list_transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) * 1000000) AS BIGINT))) AS BIGINT) AS qnorm2
        |  FROM embeddings),
        |t AS (SELECT quantile_cont(qnorm2, [0.01, 0.99]) AS th FROM q)
        |SELECT vec_id, qnorm2,
        |  CAST(qnorm2 AS DOUBLE) < th[1] AS is_low,
        |  CAST(qnorm2 AS DOUBLE) > th[2] AS is_high
        |FROM q, t ORDER BY vec_id""".stripMargin,

    // Equi-depth boundaries via quantile_cont (strict-less assignment keeps
    // boundary docs in the lower bucket, same as the Spark side), then the
    // same rank-chop-max-waste window arithmetic.
    "q_length_batches" ->
      """WITH b AS (SELECT quantile_cont(n_chars, [0.125,0.25,0.375,0.5,0.625,0.75,0.875]) AS bounds FROM documents),
        |bk AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(list_filter(b.bounds, x -> x < CAST(n_chars AS DOUBLE))) AS BIGINT) AS bucket
        |  FROM documents, b),
        |rk AS (
        |  SELECT doc_id, n_chars, bucket,
        |    CAST((ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY n_chars, doc_id) - 1) // 32 AS BIGINT) AS batch
        |  FROM bk)
        |SELECT doc_id, n_chars, bucket, batch,
        |  MAX(n_chars) OVER (PARTITION BY bucket, batch) AS batch_max,
        |  CAST(MAX(n_chars) OVER (PARTITION BY bucket, batch) - n_chars AS BIGINT) AS waste
        |FROM rk ORDER BY bucket, batch, n_chars, doc_id""".stripMargin,

    // Feature expressions are the q_text_stats oracle formulas verbatim;
    // the triangle math mirrors q_vec_gram over the 4-slot augmented
    // vector [1, f_tokens, f_stop, y_chars].
    "q_reg_moments" ->
      """WITH f AS (
        |  SELECT
        |    CAST(CASE WHEN trim(text) = '' OR text IS NULL THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS ft,
        |    CAST(len(regexp_extract_all(text, '(?i)\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by|from|that|this)\b')) AS DOUBLE) AS fs,
        |    CAST(length(text) AS DOUBLE) AS y
        |  FROM documents WHERE text IS NOT NULL),
        |v AS (SELECT [CAST(1 AS DOUBLE), ft, fs, y] AS fv FROM f)
        |SELECT CAST(i.i AS VARCHAR) AS i, CAST(j.j AS VARCHAR) AS j,
        |  CAST(SUM(CAST(FLOOR(fv[i.i + 1] * fv[j.j + 1] * 1000000) AS BIGINT)) AS VARCHAR) AS qsum,
        |  CAST(COUNT(*) AS VARCHAR) AS n
        |FROM v, (SELECT UNNEST(RANGE(0, 4)) AS i) i, (SELECT UNNEST(RANGE(0, 4)) AS j) j
        |WHERE j.j >= i.i
        |GROUP BY i.i, j.j
        |ORDER BY i.i, j.j""".stripMargin,

    "q_reg_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS j, CAST(NULL AS VARCHAR) AS issue,
        |  CAST(NULL AS DOUBLE) AS value
        |WHERE FALSE""".stripMargin,

    // Same integer sufficient-statistics derivation; `//` truncates toward
    // zero exactly like the engine's `div` (measured on negative
    // quotients), and every SUM is CAST back to BIGINT.
    "q_reg_per_group" ->
      """WITH base AS (
        |  SELECT CAST(n.n_name AS VARCHAR) AS grp,
        |    CAST(year(o.o_orderdate) - 1995 AS BIGINT) AS x,
        |    CAST(FLOOR(o.o_totalprice) AS BIGINT) AS y
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE o.o_orderdate IS NOT NULL AND o.o_totalprice IS NOT NULL),
        |m AS (
        |  SELECT grp, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy, CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM base GROUP BY grp)
        |SELECT grp, n, sx, sy, sxx, syy, sxy,
        |  CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
        |  CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
        |  CASE WHEN n * sxx - sx * sx <> 0
        |    THEN CAST((1000 * (n * sxy - sx * sy))
        |      // (n * sxx - sx * sx) AS BIGINT)
        |    ELSE NULL END AS slope_milli
        |FROM m ORDER BY grp""".stripMargin,

    // Same fixed-point determinism argument as q_vec_centroid; i/j are
    // 0-based to match the Spark side's sequence(0, d-1).
    "q_vec_gram" ->
      """SELECT CAST(i.i AS VARCHAR) AS i, CAST(j.j AS VARCHAR) AS j,
        |  CAST(SUM(CAST(FLOOR(CAST(e.embedding[i.i + 1] AS DOUBLE) * CAST(e.embedding[j.j + 1] AS DOUBLE) * 1000000) AS BIGINT)) AS VARCHAR) AS qsum,
        |  CAST(COUNT(*) AS VARCHAR) AS n
        |FROM embeddings e, (SELECT UNNEST(RANGE(0, 64)) AS i) i, (SELECT UNNEST(RANGE(0, 64)) AS j) j
        |WHERE j.j >= i.i
        |GROUP BY i.i, j.j
        |ORDER BY i.i, j.j""".stripMargin,

    "q_agg_salted" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(l_orderkey) AS n_rows,
        |  MIN(l_orderkey) AS lo_key, MAX(l_orderkey) AS hi_key
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Salting refines partitioning, never the match predicate — the oracle
    // is the PLAIN join the salted plan must reproduce exactly.
    "q_join_salted" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // Exact heavy-hitter sibling: deterministic top-25 by (count desc, id).
    "q_heavy_hitters_exact" ->
      """SELECT user_id AS item, COUNT(*) AS cnt
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY user_id ORDER BY cnt DESC, item LIMIT 25""".stripMargin,

    "q_heavy_hitters_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS why, CAST(NULL AS BIGINT) AS item,
        |  CAST(NULL AS BIGINT) AS est, CAST(NULL AS BIGINT) AS cnt
        |WHERE FALSE""".stripMargin,

    "q_stream_hotkeys_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS why, CAST(NULL AS BIGINT) AS item,
        |  CAST(NULL AS BIGINT) AS est, CAST(NULL AS BIGINT) AS cnt
        |WHERE FALSE""".stripMargin,

    // Exact per-group hot-key sibling: top-10 per event_type under the
    // same (cnt DESC, item ASC) total order as the Spark rank window.
    "q_hotkeys_by_group_exact" ->
      """SELECT grp, item, cnt FROM (
        |  SELECT CAST(event_type AS VARCHAR) AS grp, user_id AS item,
        |    COUNT(*) AS cnt
        |  FROM events WHERE user_id IS NOT NULL
        |  GROUP BY 1, 2)
        |QUALIFY row_number() OVER (PARTITION BY grp
        |  ORDER BY cnt DESC, item ASC) <= 10
        |ORDER BY grp, cnt DESC, item""".stripMargin,

    "q_hotkeys_by_group_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS why, CAST(NULL AS VARCHAR) AS grp,
        |  CAST(NULL AS BIGINT) AS item, CAST(NULL AS BIGINT) AS est,
        |  CAST(NULL AS BIGINT) AS cnt
        |WHERE FALSE""".stripMargin,

    "q_window_ntile" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(NTILE(4) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // Same greedy earliest-chain: t1 = min view; t2 = min click AFTER t1;
    // t3 = min purchase AFTER t2 (strict inequalities, as in Funnel).
    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |t1 AS (SELECT user_id, MIN(us) FILTER (WHERE event_type = 'view') AS t_view
        |       FROM ev GROUP BY user_id),
        |t2 AS (SELECT ev.user_id,
        |         MIN(us) FILTER (WHERE event_type = 'click' AND t_view IS NOT NULL AND us > t_view) AS t_click
        |       FROM ev JOIN t1 USING (user_id) GROUP BY ev.user_id),
        |t3 AS (SELECT ev.user_id,
        |         MIN(us) FILTER (WHERE event_type = 'purchase' AND t_click IS NOT NULL AND us > t_click) AS t_purchase
        |       FROM ev JOIN t2 USING (user_id) GROUP BY ev.user_id)
        |SELECT user_id, t_view, t_click, t_purchase,
        |  CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
        |            WHEN t_click IS NOT NULL THEN 2
        |            WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth
        |FROM t1 JOIN t2 USING (user_id) JOIN t3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q_pivot_events" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Same 5-gram shingling scheme as the Spark side (docs shorter than 5
    // tokens collapse to one whole-text shingle); eval slice = doc_id % 97.
    "q_decontaminate" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    list_extract(tk, i) || ' ' || list_extract(tk, i+1) || ' ' || list_extract(tk, i+2)
        |      || ' ' || list_extract(tk, i+3) || ' ' || list_extract(tk, i+4) AS s
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk)-3)) AS i) r
        |  WHERE len(tk) >= 5
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(tk, ' ') AS s FROM toks WHERE len(tk) < 5
        |),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
        |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |FROM sh c JOIN ev USING (s)
        |WHERE c.doc_id % 97 <> 0
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Exclusive-cumsum packing; integer // is floor for the non-negative
    // token counts. Same BPE-ish token regex as q_token_budget.
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS n_tok FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |        SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM t)
        |SELECT doc_id, n_tok,
        |  CAST((cum - n_tok) // 2048 AS BIGINT) AS seq_id,
        |  (n_tok > 0 AND (cum - 1) // 2048 <> (cum - n_tok) // 2048) AS is_split
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_text_repetition" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
        |bg AS (
        |  SELECT doc_id, len(tk) AS n_tok, list_extract(tk, i) || ' ' || list_extract(tk, i+1) AS b
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
        |  WHERE len(tk) >= 2),
        |m AS (
        |  SELECT doc_id, n_tok, max(c) AS maxc FROM (
        |    SELECT doc_id, n_tok, b, count(*) AS c FROM bg GROUP BY 1, 2, 3) q
        |  GROUP BY 1, 2)
        |SELECT d.doc_id, ROUND(COALESCE(2.0 * m.maxc / m.n_tok, 0.0), 6) AS top_bigram_frac
        |FROM documents d LEFT JOIN m USING (doc_id) ORDER BY doc_id""".stripMargin,

    // Shares/budget/threshold math mirrors Sampling.mixByTokenBudget in the
    // same IEEE double operation order (share·B, /T, min 1, ·2^32, floor);
    // shares CAST to DOUBLE so DuckDB doesn't fall into DECIMAL arithmetic.
    "q_corpus_mix" ->
      """WITH t AS (SELECT doc_id, source,
        |             CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS n_tok
        |           FROM documents),
        |th AS (SELECT source,
        |         CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE),
        |           CAST(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
        |                WHEN 'src2' THEN 0.125 ELSE 0.0 END AS DOUBLE)
        |           * 2000 / SUM(n_tok)) * 4294967296.0) AS BIGINT) AS thresh
        |       FROM t GROUP BY source)
        |SELECT doc_id, source, n_tok
        |FROM t JOIN th USING (source)
        |WHERE ((doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |       + (doc_id % 65536) * 2654435761) % 4294967296 < thresh
        |ORDER BY doc_id""".stripMargin,
    // PROPERTY ORACLES for the approximate queries: each *_verify sibling
    // emits only violations of the exact verification property (every
    // emitted pair/neighbor re-scored from raw data through an independent
    // built-in-expression path must meet the threshold / emitted value),
    // so its oracle is the same-schema EMPTY relation — one bad emitted
    // row flips the driver's row-count compare. Candidate selection stays
    // approximate by design; the verification is exact and driver-gated.
    "q_dedup_minhash_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS idA, CAST(NULL AS BIGINT) AS idB,
        |  CAST(NULL AS DOUBLE) AS jaccard, CAST(NULL AS DOUBLE) AS jaccard_builtin
        |WHERE FALSE""".stripMargin,

    "q_dedup_simhash_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS idA, CAST(NULL AS BIGINT) AS idB,
        |  CAST(NULL AS INTEGER) AS hamming, CAST(NULL AS INTEGER) AS hamming_direct
        |WHERE FALSE""".stripMargin,

    "q_dedup_embedding_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS idA, CAST(NULL AS BIGINT) AS idB,
        |  CAST(NULL AS DOUBLE) AS cosine, CAST(NULL AS DOUBLE) AS cosine_builtin
        |WHERE FALSE""".stripMargin,

    // Semantic dedup exact sibling: all-pairs double-precision cosine on
    // the bounded slice (same list math as q_dedup_embedding_exact), then
    // the recursive reachability closure with MIN label — identical
    // fixpoint to the engine's pointer-jumping propagation.
    "q_dedup_semantic_exact" ->
      """WITH RECURSIVE sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
        |pairs AS (
        |  SELECT a.vec_id AS idA, b.vec_id AS idB
        |  FROM sub a JOIN sub b ON a.vec_id < b.vec_id
        |  WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.2),
        |edges AS (SELECT idA AS src, idB AS dst FROM pairs UNION ALL SELECT idB AS src, idA AS dst FROM pairs),
        |cc(id, label) AS (
        |  SELECT vec_id, vec_id FROM sub
        |  UNION
        |  SELECT e.dst, cc.label FROM edges e JOIN cc ON cc.id = e.src
        |)
        |SELECT id AS vec_id, CAST(MIN(label) AS BIGINT) AS component, (MIN(label) = id) AS survivor
        |FROM cc GROUP BY id ORDER BY vec_id""".stripMargin,

    "q_dedup_semantic_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS BIGINT) AS component,
        |  CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    "q_approx_distinct_verify" ->
      """SELECT CAST(NULL AS VARCHAR) AS event_type,
        |  CAST(NULL AS BIGINT) AS approx_users, CAST(NULL AS BIGINT) AS exact_users
        |WHERE FALSE""".stripMargin,

    "q_sim_topk_pq_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS rank,
        |  CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    "q_sim_topk_ivf_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS rank,
        |  CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    "q_sim_topk_ivfpq_verify" ->
      """SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS rank,
        |  CAST(NULL AS VARCHAR) AS issue
        |WHERE FALSE""".stripMargin,

    // ------------------------------------------------------------------
    // Round-14 headliner folds: every formerly rows-only headliner now
    // carries a value oracle. Two mechanisms:
    //  (a) EXACT-REGIME PIN — the sketch is a merge-order-invariant set
    //      function sized so the fixture sits in its exact regime
    //      (CMS width 2048/8192 ≫ 150 keys: collision-free; KMV k=512 ≥
    //      every set: nothing evicted; HLL small-range estimation exact
    //      at 150 ≪ 2^lgK registers; LSH banding at the planted-dup
    //      similarity: full recall, measured pair-set equality). The
    //      oracle states the exact values; ANY regression in sketch,
    //      merge, or banding arithmetic breaks the hash.
    //  (b) CONTRACT FRAME — where the row set itself is engine-internal
    //      (k-means cells, MG decrement schedules, GK/KLL compactions),
    //      the headliner emits its deterministic CLAIM (enumerable keys,
    //      exact side values, contract booleans), keeping the whole
    //      approximate machinery in the measured plan.
    // ------------------------------------------------------------------

    // (a) minhash banding at the fixture's planted-dup similarities has
    // full recall and candidates are exact-jaccard-filtered, so the pair
    // set provably equals the exact trigram-jaccard pairs — the
    // q_dedup_ngram oracle verbatim. A banding/signature regression
    // surfaces as a missing pair here (and in the _verify sibling).
    "q_dedup_minhash" -> incrementalNgramAllPairsSql,

    // (a) CMS with width 2048 over 150 distinct users is collision-free:
    // every estimate must equal the exact count, for the deterministic
    // exact top-25 probe set.
    "q_cms_native" -> cmsExactRegimeSql,
    // elementwise-sum merge ⇒ the streaming sketch shares the pin.
    "q_stream_cms" -> cmsExactRegimeSql,

    // (a) 150 distinct values sit in HLL's small-range-exact regime (and
    // the sketches are register-max set functions, merge-order
    // invariant), so every rollup estimate equals the exact distinct.
    "q_hll_rollup" ->
      """SELECT CAST(event_type AS VARCHAR) AS segment,
        |  COUNT(DISTINCT user_id) AS est_distinct
        |FROM events WHERE user_id IS NOT NULL GROUP BY 1
        |UNION ALL
        |SELECT '__TOTAL__', COUNT(DISTINCT user_id)
        |FROM events WHERE user_id IS NOT NULL
        |ORDER BY segment""".stripMargin,
    "q_hll_native" -> hllNativeExactRegimeSql,
    "q_stream_hll" -> hllNativeExactRegimeSql,

    // (a) KMV k=512 holds every distinct user hash (150 ≪ k): the theta
    // sketch is in its exact regime and all overlap figures equal the
    // exact set relations, integer-ppm arithmetic included.
    "q_stream_kmv" ->
      """WITH sv AS (
        |  SELECT DISTINCT CAST(event_type AS VARCHAR) AS segment,
        |    CAST(user_id AS BIGINT) AS v
        |  FROM events WHERE user_id IS NOT NULL),
        |sizes AS (SELECT segment, COUNT(*) AS sz FROM sv GROUP BY 1),
        |inter AS (
        |  SELECT a.segment AS seg_a, b.segment AS seg_b, COUNT(*) AS i
        |  FROM sv a JOIN sv b ON a.v = b.v AND a.segment < b.segment
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.segment AS seg_a, b.segment AS seg_b, a.sz AS sza, b.sz AS szb
        |  FROM sizes a JOIN sizes b ON a.segment < b.segment)
        |SELECT p.seg_a, p.seg_b,
        |  CAST(p.sza + p.szb - COALESCE(i.i, 0) AS BIGINT) AS union_est,
        |  CAST(COALESCE(i.i, 0) AS BIGINT) AS intersect_est,
        |  CAST(p.sza - COALESCE(i.i, 0) AS BIGINT) AS diff_ab_est,
        |  CAST((1000000 * COALESCE(i.i, 0))
        |    // (p.sza + p.szb - COALESCE(i.i, 0)) AS BIGINT) AS jaccard_ppm
        |FROM pairs p
        |LEFT JOIN inter i ON i.seg_a = p.seg_a AND i.seg_b = p.seg_b
        |ORDER BY 1, 2""".stripMargin,

    // (a) CMS inner-product join-size estimate with width 8192 over 150
    // keys: no colliding pair, so the AMS estimate equals the true
    // self-join size exactly.
    "q_join_size_est" ->
      """WITH k AS (SELECT CAST(user_id AS BIGINT) AS k FROM events
        |  WHERE user_id IS NOT NULL),
        |c AS (SELECT k, COUNT(*) AS c FROM k GROUP BY k)
        |SELECT (SELECT COUNT(*) FROM k) AS n_a,
        |  (SELECT COUNT(*) FROM k) AS n_b,
        |  CAST((SELECT SUM(c * c) FROM c) AS BIGINT) AS est""".stripMargin,

    // (b) contract frames — enumerable keys, exact side values, and the
    // approximate machinery's guarantees as booleans/violation counts.
    "q_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events, TRUE AS hll_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_quantile_approx" ->
      """SELECT CAST(p AS DOUBLE) AS p,
        |  (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice IS NOT NULL) AS n,
        |  TRUE AS rank_ok
        |FROM (SELECT unnest([0.01, 0.25, 0.5, 0.75, 0.99]) AS p)
        |ORDER BY p""".stripMargin,

    "q_quantile_native" ->
      """SELECT CAST(l_returnflag AS VARCHAR) AS segment, CAST(pp AS DOUBLE) AS p,
        |  COUNT(*) AS n, TRUE AS rank_ok
        |FROM lineitem CROSS JOIN (SELECT unnest([0.01, 0.25, 0.5, 0.75, 0.99]) AS pp)
        |WHERE l_extendedprice IS NOT NULL
        |GROUP BY 1, 2 ORDER BY segment, p""".stripMargin,

    "q_stream_quantile" ->
      """SELECT CAST(event_type AS VARCHAR) AS segment, CAST(pp AS DOUBLE) AS p,
        |  COUNT(*) AS n, TRUE AS rank_ok
        |FROM events CROSS JOIN (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS pp)
        |WHERE value IS NOT NULL
        |GROUP BY 1, 2 ORDER BY segment, p""".stripMargin,

    "q_heavy_hitters" -> mgSummaryOracleSql,
    "q_stream_hotkeys" -> mgSummaryOracleSql,

    "q_hotkeys_by_group" ->
      """SELECT CAST(event_type AS VARCHAR) AS grp, COUNT(*) AS n,
        |  CAST(0 AS BIGINT) AS n_violations
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1 ORDER BY grp""".stripMargin,

    "q_kmv_overlap" ->
      """WITH s AS (SELECT DISTINCT CAST(l_returnflag AS VARCHAR) AS seg
        |  FROM lineitem WHERE l_orderkey IS NOT NULL)
        |SELECT a.seg AS seg_a, b.seg AS seg_b, TRUE AS bounds_ok
        |FROM s a JOIN s b ON a.seg < b.seg ORDER BY 1, 2""".stripMargin,

    "q_source_overlap_est" ->
      """WITH s AS (SELECT DISTINCT source AS seg FROM documents)
        |SELECT a.seg AS seg_a, b.seg AS seg_b, TRUE AS bounds_ok
        |FROM s a JOIN s b ON a.seg < b.seg ORDER BY 1, 2""".stripMargin,

    "q_stream_bloom" ->
      """SELECT CAST(event_type AS VARCHAR) AS segment,
        |  COUNT(DISTINCT user_id) AS n_users, TRUE AS no_false_negatives
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1 ORDER BY segment""".stripMargin,

    "q_bpe_learned" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  TRUE AS roundtrip_ok
        |FROM documents ORDER BY doc_id""".stripMargin,

    // simhash contract summary: hamming re-derivation clean over the
    // whole emitted pair set (a jaccard recall table is NOT an
    // invariant — see the query comment).
    "q_dedup_simhash" ->
      """SELECT 'simhash_near_dup' AS check, COUNT(*) AS n_docs,
        |  CAST(0 AS BIGINT) AS n_violations
        |FROM documents""".stripMargin,

    "q_dedup_embedding" ->
      """SELECT 'ivf_near_dup' AS check, COUNT(*) AS n_vecs,
        |  CAST(0 AS BIGINT) AS n_violations
        |FROM embeddings""".stripMargin,

    "q_dedup_semantic" ->
      """SELECT vec_id, TRUE AS flag_ok, TRUE AS label_min_ok,
        |  TRUE AS component_exists
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    // (b) retrieval contract frames: 16 fixture queries × k = 10 served
    // results with every row-level contract check clean.
    "q_sim_topk_ivf" -> annContractOracleSql("contract_ok"),
    "q_sim_topk_pq" -> annContractOracleSql("contract_ok"),
    "q_sim_topk_ivfpq" -> annContractOracleSql("contract_ok"),
    "q_stream_ann" -> annContractOracleSql("stream_eq_batch"),

    // (a) k-core peel replayed by bounded unroll: six explicit rounds of
    // "drop alive nodes with < k alive neighbors" over the co-purchase
    // graph (the fixture converges in round one — every node holds the
    // 30-core — and a graph needing more than six rounds would surface
    // as a hash mismatch, never a silent pass).
    "q_kcore" -> kcoreOracleSql,

    // (a) DOULION replayed end-to-end: the Knuth-multiplicative edge
    // coin, the exact triangle count on the sampled canonical edges, and
    // the ×(1/p)³ scale — all in BIGINT SQL.
    "q_triangles_approx" ->
      """WITH pe AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |co AS (SELECT DISTINCT x.p AS u, y.p AS v
        |  FROM pe x JOIN pe y ON x.ok = y.ok AND x.p < y.p),
        |samp AS (SELECT u, v FROM co
        |  WHERE ((u * 2654435761 + v * 40503) % 4294967296) % 100 < 50),
        |tri AS (
        |  SELECT count(*) AS t FROM samp e1
        |  JOIN samp e2 ON e2.u = e1.u AND e2.v > e1.v
        |  JOIN samp e3 ON e3.u = e1.v AND e3.v = e2.v)
        |SELECT CAST(50 AS INTEGER) AS p_pct,
        |  (SELECT count(*) FROM samp) AS sampled_edges,
        |  tri.t AS sampled_triangles,
        |  CAST(tri.t * 8 AS DOUBLE) AS est_triangles
        |FROM tri""".stripMargin,

    // (a) the fuzzy-curate statuses replayed from scratch: quality =
    // fewer than 20 clean tokens; duplicate = the HIGHER id of any
    // exact-trigram-jaccard ≥ 0.5 pair among gated docs (banding at the
    // planted-dup similarity has full recall — same pin as
    // q_dedup_minhash); else curated.
    "q_stream_curate_fuzzy" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |      x -> x <> '') AS tk
        |  FROM documents),
        |gated AS (SELECT doc_id, tk FROM toks WHERE len(tk) >= 20),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    list_extract(tk, i) || ' ' || list_extract(tk, i+1) || ' ' ||
        |      list_extract(tk, i+2) AS s
        |  FROM gated, LATERAL (SELECT unnest(range(1, len(tk) - 1)) AS i) r
        |  WHERE len(tk) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(tk, ' ') AS s
        |  FROM gated WHERE len(tk) < 3),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT x.doc_id AS idA, y.doc_id AS idB, count(*) AS c
        |  FROM sh x JOIN sh y USING (s) WHERE x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |dups AS (
        |  SELECT DISTINCT idB AS doc_id FROM common
        |  JOIN sizes na ON na.doc_id = idA
        |  JOIN sizes nb ON nb.doc_id = idB
        |  WHERE CAST(c AS DOUBLE) / (na.n_sh + nb.n_sh - c) >= 0.5)
        |SELECT t.doc_id,
        |  CASE WHEN len(t.tk) < 20 THEN 'quality'
        |       WHEN d.doc_id IS NOT NULL THEN 'duplicate'
        |       ELSE 'curated' END AS status
        |FROM toks t LEFT JOIN dups d ON d.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,
  )

  /** Exact trigram-jaccard pairs over the WHOLE corpus (threshold 0.2) —
    * q_dedup_ngram's oracle, shared verbatim by q_dedup_minhash (whose
    * banded pair set provably equals it on this fixture). */
  private val incrementalNgramAllPairsSql: String =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, list_extract(tk, i) || ' ' || list_extract(tk, i+1) || ' ' || list_extract(tk, i+2) AS s
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk)-1)) AS i) r
      |  WHERE len(tk) >= 3
      |  UNION
      |  SELECT DISTINCT doc_id, array_to_string(tk, ' ') AS s FROM toks WHERE len(tk) < 3
      |),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |common AS (
      |  SELECT x.doc_id AS idA, y.doc_id AS idB, count(*) AS c
      |  FROM sh x JOIN sh y USING (s) WHERE x.doc_id < y.doc_id
      |  GROUP BY 1, 2)
      |SELECT idA, idB, ROUND(CAST(c AS DOUBLE) / (na.n_sh + nb.n_sh - c), 6) AS jaccard
      |FROM common
      |JOIN sizes na ON na.doc_id = idA
      |JOIN sizes nb ON nb.doc_id = idB
      |WHERE CAST(c AS DOUBLE) / (na.n_sh + nb.n_sh - c) >= 0.2
      |ORDER BY idA, idB""".stripMargin

  /** Retrieval contract frame: the 16 fixture queries, k = 10 results
    * each, contract clean — shared by the three approximate-ANN folds
    * and (as `stream_eq_batch`) the serving twin. */
  private def annContractOracleSql(flagName: String): String =
    s"""SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_results,
      |  TRUE AS $flagName
      |FROM embeddings WHERE vec_id < 16 ORDER BY query_id""".stripMargin

  /** k-core (k = 30) peel replayed by bounded unroll: alive₀ = every
    * co-purchase node; round i removes alive nodes with fewer than k
    * alive neighbors; survivors after the last unrolled round are the
    * core (round −1). Six rounds is 6× the fixture's measured depth; a
    * deeper graph mislabels survivors and FAILS the hash — loud, never a
    * silent pass. */
  private lazy val kcoreOracleSql: String = {
    val rounds = 6
    val sb = new StringBuilder(4096)
    sb.append(
      """WITH pe AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |co AS (SELECT DISTINCT x.p AS u, y.p AS v
        |  FROM pe x JOIN pe y ON x.ok = y.ok AND x.p < y.p),
        |adj AS (SELECT u AS a, v AS b FROM co UNION ALL SELECT v AS a, u AS b FROM co),
        |alive0 AS (SELECT DISTINCT a FROM adj),
        |""".stripMargin)
    for (i <- 0 until rounds) {
      sb.append(
        s"""deg$i AS (
           |  SELECT adj.a AS a, count(*) AS d FROM adj
           |  JOIN alive$i x ON adj.a = x.a
           |  JOIN alive$i y ON adj.b = y.a
           |  GROUP BY adj.a),
           |alive${i + 1} AS (SELECT a FROM deg$i WHERE d >= 30),
           |rem$i AS (SELECT a FROM alive$i EXCEPT SELECT a FROM alive${i + 1}),
           |""".stripMargin)
    }
    val removed = (0 until rounds)
      .map(i => s"SELECT a, CAST($i AS INTEGER) AS round FROM rem$i")
      .mkString("\n  UNION ALL ")
    sb.append(
      s"""lastd AS (SELECT 1)
         |SELECT a AS node, round FROM (
         |  $removed
         |  UNION ALL SELECT a, CAST(-1 AS INTEGER) AS round FROM alive$rounds
         |) ORDER BY node""".stripMargin)
    sb.toString
  }

  /** Misra–Gries summary claim: exact stream length, capacity, zero
    * guarantee violations — shared by the batch and streaming MG folds. */
  private val mgSummaryOracleSql: String =
    """SELECT CAST(32 AS BIGINT) AS capacity, COUNT(*) AS n,
      |  CAST(0 AS BIGINT) AS n_violations
      |FROM events WHERE user_id IS NOT NULL""".stripMargin

  /** Exact top-25 user frequencies with est = exact (the CMS
    * collision-free regime) — shared by the batch probe and its
    * bit-exact streaming twin. */
  private val cmsExactRegimeSql: String =
    """SELECT user_id AS item, COUNT(*) AS exact_cnt, COUNT(*) AS est_cnt
      |FROM events WHERE user_id IS NOT NULL
      |GROUP BY user_id ORDER BY exact_cnt DESC, item LIMIT 25""".stripMargin

  /** Exact distinct rollup in the native-HLL output shape (n_rows +
    * est_distinct, small-range-exact regime) — shared by the batch
    * rollup and its bit-exact streaming twin. */
  private val hllNativeExactRegimeSql: String =
    """SELECT CAST(event_type AS VARCHAR) AS segment,
      |  COUNT(*) AS n_rows, COUNT(DISTINCT user_id) AS est_distinct
      |FROM events WHERE user_id IS NOT NULL GROUP BY 1
      |UNION ALL
      |SELECT '__TOTAL__', COUNT(*), COUNT(DISTINCT user_id)
      |FROM events WHERE user_id IS NOT NULL
      |ORDER BY segment""".stripMargin
}
