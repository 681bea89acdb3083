package graft.expr

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PdfSpec extends SparkSpec {

  private def textOf(pdf: Array[Byte]): Option[String] =
    Option(PdfOps.extractText(pdf)).map(_.toString)

  test("per-page /F1 scoping: same resource name, different encodings") {
    // two pages both naming their font /F1 — WinAnsi on page 1,
    // MacRoman on page 2. Byte 0x96 decodes '–' vs 'ñ', so a global
    // last-wins font map would mojibake page 1 through page 2's table.
    def obj(n: Int, body: String) = s"$n 0 obj\n$body\nendobj\n"
    def page(n: Int, cs: Int, font: Int) =
      obj(n, s"<< /Type /Page /Parent 2 0 R /Contents $cs 0 R " +
        s"/Resources << /Font << /F1 $font 0 R >> >> >>")
    def stream(n: Int, txt: String) = {
      val c = s"BT\n/F1 12 Tf\n72 720 Td\n($txt) Tj\nET"
      obj(n, s"<< /Length ${c.length} >>\nstream\n$c\nendstream")
    }
    val pdf = ("%PDF-1.4\n" +
      obj(1, "<< /Type /Catalog /Pages 2 0 R >>") +
      obj(2, "<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >>") +
      page(3, 4, 5) + stream(4, "AZ") +
      obj(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding /WinAnsiEncoding >>") +
      page(6, 7, 8) + stream(7, "BY") +
      obj(8, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding /MacRomanEncoding >>") +
      "%%EOF\n").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    // no separator between the streams: line state is per-stream and
    // each page's leading Td precedes any shown text
    assert(textOf(pdf) === Some("A–ZBñY"))
  }

  test("synthetic PDF round-trips: lines, TJ kerning, flate, escapes") {
    val text = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu nu xi omicron pi " +
      "rho sigma tau upsilon phi chi psi omega tail"
    val expected = ("alpha beta gamma delta epsilon zeta eta theta\n" +
      "iota kappa lambda mu nu xi omicron pi\n" +
      "rho sigma tau upsilon phi chi psi omega\n" +
      "tail")
    // three full lines + remainder; line 3 (index 2) is the kerned TJ
    assert(textOf(PdfOps.syntheticPdf(1L, text, flate = false))
      === Some(expected))
    assert(textOf(PdfOps.syntheticPdf(1L, text, flate = true))
      === Some(expected))
    // parens and backslashes survive escaping
    val tricky = "open ( close ) back \\ slash (nested (deep)) done x y z"
    val rt = textOf(PdfOps.syntheticPdf(2L, tricky, flate = true)).get
    assert(rt.replace("\n", " ") === tricky)
  }

  test("parser tolerates hex strings, comments, quote operators, octal") {
    def wrap(content: String): Array[Byte] = {
      val c = content.getBytes(UTF_8)
      (s"%PDF-1.4\n1 0 obj << /Length ${c.length} >>\nstream\n").getBytes(UTF_8) ++
        c ++ "\nendstream\nendobj\n%%EOF\n".getBytes(UTF_8)
    }
    // hex string: 68 65 78 = "hex"; odd digit pads; whitespace ignored
    assert(textOf(wrap("BT <68 65 78> Tj ET")) === Some("hex"))
    // ' operator = next line + show; octal \101 = 'A'; comment skipped
    assert(textOf(wrap("BT (one) Tj % comment (not text)\n(\\101two) ' ET"))
      === Some("one\nAtwo"))
    // escapes: \n \t \( \) \\ and line continuation
    assert(textOf(wrap("BT (a\\nb\\t\\(c\\)\\\\d\\\ne) Tj ET"))
      === Some("a\nb\t(c)\\de"))
  }

  test("non-PDF, empty, and filtered-unknown streams degrade to null/skip") {
    assert(textOf("not a pdf at all".getBytes(UTF_8)) === None)
    assert(textOf(Array.emptyByteArray) === None)
    assert(Option(PdfOps.extractText(null)) === None)
    // an unsupported filter is skipped, not fatal: only the plain
    // stream's text comes back
    val c1 = "BT (visible) Tj ET".getBytes(UTF_8)
    val mixed = ("%PDF-1.4\n1 0 obj << /Length 4 /Filter /DCTDecode >>\n" +
      "stream\n\u0001\u0002\u0003\u0004\nendstream\nendobj\n" +
      s"2 0 obj << /Length ${c1.length} >>\nstream\n").getBytes(UTF_8) ++
      c1 ++ "\nendstream\nendobj\n%%EOF\n".getBytes(UTF_8)
    assert(textOf(mixed) === Some("visible"))
  }

  test("unicode PDF round-trips all three font decode paths") {
    val text = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu nu xi omicron pi " +
      "rho sigma tau upsilon phi chi psi omega tail"
    val lines = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "iota kappa lambda mu nu xi omicron pi",
      "rho sigma tau upsilon phi chi psi omega",
      "tail")
    val expected = lines.zipWithIndex
      .map { case (l, i) => l + PdfOps.unicodeSuffix(i) }.mkString("\n")
    assert(textOf(PdfOps.syntheticUnicodePdf(1L, text, flate = false))
      === Some(expected))
    assert(textOf(PdfOps.syntheticUnicodePdf(1L, text, flate = true))
      === Some(expected))
    // the suffixes really are the non-ASCII decode paths
    assert(PdfOps.unicodeSuffix(0).exists(_ > 0x7F))
    assert(PdfOps.unicodeSuffix(1).exists(_ > 0xFF))
    assert(PdfOps.unicodeSuffix(2).exists(c => c >= 'α' && c <= 'ω'))
  }

  test("WinAnsi table, Differences override, and ToUnicode precedence") {
    // CP1252 specials decode from their single bytes
    def font(dict: String, content: String, extra: String = ""): Array[Byte] = {
      val c = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      (s"%PDF-1.4\n1 0 obj << /Font << /G 2 0 R >> >>\nendobj\n" +
        s"2 0 obj $dict\nendobj\n$extra" +
        s"3 0 obj << /Length ${c.length} >>\nstream\n").getBytes(UTF_8) ++
        c ++ "\nendstream\nendobj\n%%EOF\n".getBytes(UTF_8)
    }
    // 0x96 = en dash, 0xE9 = e-acute under WinAnsi
    assert(textOf(font("<< /Type /Font /Encoding /WinAnsiEncoding >>",
      "BT /G 9 Tf (a\\226b\\351c) Tj ET")) === Some("a–béc"))
    // Differences moves code 65 ('A') to /eacute; base keeps the rest
    assert(textOf(font(
      "<< /Type /Font /Encoding << /BaseEncoding /WinAnsiEncoding " +
        "/Differences [65 /eacute] >> >>",
      "BT /G 9 Tf (xAy) Tj ET")) === Some("xéy"))
    // ToUnicode bfchar overrides the encoding table for its codes
    val cmap = ("begincmap\n1 beginbfchar\n<0041> <0394>\nendbfchar\n" +
      "endcmap").getBytes(UTF_8)
    val toUni = (s"4 0 obj << /Length ${cmap.length} >>\nstream\n")
      .getBytes(UTF_8) ++ cmap ++ "\nendstream\nendobj\n".getBytes(UTF_8)
    assert(textOf(font(
      "<< /Type /Font /Encoding /WinAnsiEncoding /ToUnicode 4 0 R >>",
      "BT /G 9 Tf (A\\226) Tj ET",
      new String(toUni, java.nio.charset.StandardCharsets.ISO_8859_1)))
      === Some("Δ–"))
    // a font with no encoding info keeps bytes-as-UTF-8 (é = C3 A9)
    assert(textOf(font("<< /Type /Font /Subtype /Type1 >>",
      "BT /G 9 Tf (caf\\303\\251) Tj ET")) === Some("café"))
    // an unknown resource name falls back to UTF-8 passthrough
    assert(textOf(font("<< /Type /Font /Encoding /WinAnsiEncoding >>",
      "BT /H 9 Tf (plain) Tj ET")) === Some("plain"))
  }

  test("pdf_text expression: codegen path over a DataFrame, null for junk") {
    import spark.implicits._
    val rows = Seq(
      (1L, PdfOps.syntheticPdf(1L, "one two three four five six seven eight nine", flate = false)),
      (2L, PdfOps.syntheticPdf(2L, "a b c", flate = true)),
      (3L, "garbage".getBytes(UTF_8)))
      .toDF("id", "pdf")
    val got = rows.select($"id", PdfExpressions.pdf_text($"pdf").as("t"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) === Some("one two three four five six seven eight\nnine"))
    assert(got(2L) === Some("a b c"))
    assert(got(3L) === None)
  }
}
