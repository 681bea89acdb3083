package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WarcIngestSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val d = Files.createTempDirectory(s"graft_warcspec_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("synthetic archives round-trip: framing, HTTP parse, gzip bucket") {
    import spark.implicits._
    val out = freshDir("rt")
    val docs = (0L until 10L).map { i =>
      // bodies exercise entities-in-waiting (&, <, >), CRLF-bearing text,
      // and multi-byte UTF-8 — octet arithmetic must hold for all three
      (i, s"https://example.org/d/$i", s"<html><p>body $i &<>\r\n café</p></html>")
    }.toDF("doc_id", "uri", "body")
    WarcIngest.writeSyntheticWarc(spark, docs, "doc_id", "uri", "body", out, nFiles = 3)

    assert(new java.io.File(out, "warc-0.warc.gz").exists(), "bucket 0 must be gzipped")
    assert(new java.io.File(out, "warc-1.warc").exists())
    assert(new java.io.File(out, "warc-2.warc").exists())

    val recs = WarcIngest.readRecords(spark, out).cache()
    assert(recs.count() === 13) // 10 responses + 3 warcinfo
    val resp = recs.filter($"warc_type" === "response")
      .select(regexp_extract($"record_id", "doc:(\\d+)", 1).cast("long").as("doc_id"),
        $"target_uri", $"http_status", $"http_content_type", $"body",
        $"content_length")
      .collect().sortBy(_.getLong(0))
    assert(resp.length === 10)
    resp.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === i.toLong)
      assert(r.getString(1) === s"https://example.org/d/$i")
      assert(r.getInt(2) === 200)
      assert(r.getString(3) === "text/html; charset=utf-8")
      val expectedBody = s"<html><p>body $i &<>\r\n café</p></html>"
      assert(r.getString(4) === expectedBody)
      // WARC Content-Length = HTTP head octets + body octets
      val bodyOctets = expectedBody.getBytes(UTF_8).length
      val head = s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\nContent-Length: $bodyOctets\r\n\r\n"
      assert(r.getLong(5) === head.getBytes(UTF_8).length + bodyOctets)
    }
    // warcinfo: non-HTTP payload passes through whole, HTTP columns null
    val infos = recs.filter($"warc_type" === "warcinfo").collect()
    assert(infos.length === 3)
    infos.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("http_status")))
      assert(r.isNullAt(r.fieldIndex("target_uri")))
      assert(r.getString(r.fieldIndex("body")).startsWith("software: graft-warc/1.0"))
    }
    // the gzipped and plain buckets parse identically: every bucket holds
    // its doc_id % 3 class
    val byFile = recs.filter($"warc_type" === "response")
      .select(regexp_extract($"file", "warc-(\\d+)\\.warc", 1).cast("long").as("b"),
        regexp_extract($"record_id", "doc:(\\d+)", 1).cast("long").as("doc_id"))
      .collect()
    byFile.foreach(r => assert(r.getLong(1) % 3 === r.getLong(0)))
    recs.unpersist()
  }

  test("LF-only line endings and unknown record types are tolerated") {
    val out = freshDir("lf")
    val body = "plain payload"
    val rec = "WARC/1.0\nWARC-Type: metadata\n" +
      "WARC-Record-ID: <urn:x:1>\nContent-Length: " +
      body.getBytes(UTF_8).length + "\n\n" + body + "\n\n"
    Files.write(Paths.get(out, "warc-9.warc"), rec.getBytes(UTF_8))
    val rows = WarcIngest.readRecords(spark, out).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(r.fieldIndex("warc_type")) === "metadata")
    assert(r.getString(r.fieldIndex("body")) === body)
    assert(r.isNullAt(r.fieldIndex("http_status")))
  }

  test("truncated payload fails the task loudly, not silently") {
    val out = freshDir("trunc")
    val rec = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:x:2>\r\nContent-Length: 9999\r\n\r\nshort"
    Files.write(Paths.get(out, "warc-0.warc"), rec.getBytes(UTF_8))
    val e = intercept[org.apache.spark.SparkException] {
      WarcIngest.readRecords(spark, out).collect()
    }
    assert(e.getMessage.contains("truncated") ||
      Option(e.getCause).exists(_.getMessage.contains("truncated")))
  }

  test("binary payloads round-trip byte-exact through the archive") {
    import spark.implicits._
    val out = freshDir("bin")
    // bytes that are NOT valid UTF-8 (0xFF, 0xFE) — a string round-trip
    // would corrupt them; body_bytes must not
    val payload = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0xff.toByte,
      0xfe.toByte, 0x00, 0x0d, 0x0a, 0x1a)
    val docs = Seq((7L, "https://img.example/x.png", payload))
      .toDF("doc_id", "uri", "body")
    WarcIngest.writeSyntheticWarc(spark, docs, "doc_id", "uri", "body", out,
      nFiles = 2, contentType = "image/png")
    val got = WarcIngest.readRecords(spark, out)
      .filter($"warc_type" === "response").collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Array[Byte]]("body_bytes").toSeq === payload.toSeq)
    assert(r.getAs[String]("http_content_type") === "image/png")
    // the WARC content-length counted the raw octets, not a UTF-8 blowup
    val head = s"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\nContent-Length: ${payload.length}\r\n\r\n"
    assert(r.getAs[Long]("content_length") === head.length + payload.length)
  }

  test("incremental ingest: delta-only waves, idempotent re-run") {
    import spark.implicits._
    val warc = freshDir("inc_src")
    val docs = (0L until 9L).map(i =>
      (i, s"https://e.org/$i", s"<p>$i</p>")).toDF("doc_id", "uri", "body")
    WarcIngest.writeSyntheticWarc(spark, docs, "doc_id", "uri", "body", warc,
      nFiles = 3)
    val base = freshDir("inc_wh")
    val wh = s"$base/warehouse"
    val mf = s"$base/manifest"
    // wave 1: only bucket 0 visible to the glob
    val w1 = WarcIngest.ingestIncremental(spark, warc, wh, mf,
      glob = "warc-0.warc*")
    assert(w1.size === 1)
    assert(spark.read.parquet(wh).filter($"warc_type" === "response")
      .count() === 3)
    // wave 2: everything; only the two unseen buckets are parsed
    val w2 = WarcIngest.ingestIncremental(spark, warc, wh, mf)
    assert(w2.size === 2 && !w2.exists(_.contains("warc-0")))
    // wave 3: nothing new; nothing appended
    assert(WarcIngest.ingestIncremental(spark, warc, wh, mf).isEmpty)
    val all = spark.read.parquet(wh)
    assert(all.count() === 12) // 9 responses + 3 warcinfo, each exactly once
    assert(all.select("record_id").distinct().count() === 12)
  }

  test("property: random record mixes round-trip plain and gzipped archives") {
    val rnd = new scala.util.Random(42)
    val out = freshDir("prop")
    def randBody(): Array[Byte] = {
      // bodies mixing text, CRLFs (must not desync record framing), and
      // raw bytes incl. invalid UTF-8
      val n = rnd.nextInt(200)
      Array.fill(n)(rnd.nextInt(256).toByte)
    }
    val recs = (0 until 40).map { i =>
      (i.toLong, s"https://p.example/$i", randBody())
    }
    // half the records through the HTTP response framing, half as raw
    // conversion payloads; archive 0 gzipped per record, archive 1 plain
    val streams = Seq(
      new java.io.FileOutputStream(s"$out/warc-0.warc.gz"),
      new java.io.FileOutputStream(s"$out/warc-1.warc"))
    try {
      recs.foreach { case (id, uri, body) =>
        val framed =
          if (id % 2 == 0) WarcIngest.responseRecord(id, uri, body)
          else WarcIngest.conversionRecord(id, uri, body)
        val b = (id % 2).toInt
        streams(b).write(
          if (b == 0) WarcIngest.gzipMember(framed) else framed)
      }
    } finally streams.foreach(_.close())
    val got = WarcIngest.readRecords(spark, out).collect()
      .map(r => (r.getAs[String]("record_id"),
        r.getAs[String]("warc_type"),
        r.getAs[Array[Byte]]("body_bytes").toSeq))
      .toSet
    val expected = recs.map { case (id, _, body) =>
      (s"<urn:graft:doc:$id>",
        if (id % 2 == 0) "response" else "conversion", body.toSeq)
    }.toSet
    assert(got === expected,
      "every random record must round-trip byte-exact through both codecs")
  }

  test("missing directory and empty directory both read as empty") {
    assert(WarcIngest.readRecords(spark, "/nonexistent/graft/warcs").count() === 0)
    assert(WarcIngest.readRecords(spark, freshDir("empty")).count() === 0)
  }

  test("payload cap guards a malformed length header") {
    val out = freshDir("cap")
    val body = "x" * 100
    val rec = "WARC/1.0\r\nWARC-Type: resource\r\n" +
      "WARC-Record-ID: <urn:x:3>\r\nContent-Length: 100\r\n\r\n" + body + "\r\n\r\n"
    Files.write(Paths.get(out, "warc-0.warc"), rec.getBytes(UTF_8))
    val e = intercept[org.apache.spark.SparkException] {
      WarcIngest.readRecords(spark, out, maxPayloadBytes = 10).collect()
    }
    assert(e.getMessage.contains("maxPayloadBytes") ||
      Option(e.getCause).exists(_.getMessage.contains("maxPayloadBytes")))
  }
}
