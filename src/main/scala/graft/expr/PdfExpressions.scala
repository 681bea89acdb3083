package graft.expr

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PDF text extraction — the second-largest text modality in a web crawl
  * after HTML. Beyond-reference extension (the reference ingests CSV
  * only, `main.py:30-62`); the Spark surface is a codegen'd unary
  * expression over the raw `binary` column the WARC reader already
  * ships, so extraction composes with the archive front exactly like
  * [[HtmlExpressions.html_content_text]] does for pages.
  *
  * Scope (the honest-but-minimal production subset, the synthetic-PNG
  * fixture playbook of [[graft.operators.Multimodal]]):
  *  - object/stream scan without the xref table (real crawl PDFs are
  *    routinely truncated or incrementally updated; tolerant readers
  *    scan), `/Length` honored when direct, `endstream` fallback;
  *  - `FlateDecode` content streams (zlib `Inflater`, in-tree since the
  *    PNG decoder) plus uncompressed streams;
  *  - text operators `Tj`, `'`, `"`, `TJ` (kerning numbers dropped),
  *    line advances `Td`/`TD`/`T*` → '\n', literal strings with the
  *    full escape set (\\n \\r \\t \\b \\f \\( \\) \\\\, octal, line
  *    continuations) and nested parens, hex strings `<...>`;
  *  - no font decoding: string bytes are taken as UTF-8 (the fixture
  *    and the overwhelmingly-ASCII crawl case); encrypted PDFs and
  *    exotic filters yield null, never a task failure.
  *
  * Per-row pure JVM decode — embarrassingly parallel, zero shuffle, the
  * same plan at 100 TB.
  */
object PdfOps {

  /** Extract the text content of every content stream, in stream order;
    * null when the bytes are not a PDF or no text survives parsing. */
  def extractText(pdf: Array[Byte]): UTF8String = {
    if (pdf == null || pdf.length < 8) return null
    if (!(pdf(0) == '%' && pdf(1) == 'P' && pdf(2) == 'D' && pdf(3) == 'F'))
      return null
    // structure scan over the byte-transparent Latin-1 view
    val s = new String(pdf, ISO_8859_1)
    val out = new java.lang.StringBuilder(256)
    var pos = 0
    var ok = true
    while (ok) {
      val si = s.indexOf("stream", pos)
      if (si < 0) ok = false
      else if (si >= 3 && s.regionMatches(si - 3, "end", 0, 3)) pos = si + 6
      else {
        // the stream's dict: between the owning "obj" keyword and
        // "stream". A headerless stream (no "obj" anywhere before it —
        // a torn fragment) gets NO dict rather than the whole document
        // prefix: the prefix would mis-attribute an EARLIER object's
        // /Filter entry to this stream and inflate/skip its bytes wrongly.
        val objAt = s.lastIndexOf("obj", si)
        val dict = if (objAt < 0) "" else s.substring(objAt, si)
        var ds = si + "stream".length
        if (ds < s.length && s.charAt(ds) == '\r') ds += 1
        if (ds < s.length && s.charAt(ds) == '\n') ds += 1
        val lenDirect = LengthRe.findFirstMatchIn(dict)
          .flatMap(m => m.group(1).toIntOption)
          .filter(l => l >= 0 && ds + l <= pdf.length)
        val de = lenDirect.map(ds + _).getOrElse {
          val e = s.indexOf("endstream", ds)
          if (e < 0) pdf.length else e
        }
        var data = java.util.Arrays.copyOfRange(pdf, ds, de)
        var usable = true
        if (dict.contains("/FlateDecode")) {
          graft.ingest.WarcIngest.inflate(data) match {
            case Some(d) => data = d
            case None => usable = false // unsupported/corrupt: skip stream
          }
        } else if (dict.contains("/Filter")) usable = false
        if (usable) appendTextOps(new String(data, UTF_8), out)
        pos = math.max(de, si + 6)
      }
    }
    if (out.length == 0) null else UTF8String.fromString(out.toString)
  }

  private val LengthRe = """/Length\s+(\d+)\b""".r

  /** Run the content-stream tokenizer, appending shown text to `out`:
    * strings accumulate until their text operator; `Td`/`TD`/`T*` (and
    * the leading move of `'`/`"`) emit one '\n' when the current line
    * already has text. */
  private def appendTextOps(cs: String, out: java.lang.StringBuilder): Unit = {
    val n = cs.length
    var i = 0
    val pending = new scala.collection.mutable.ArrayBuffer[String](4)
    var lineHasText = false
    def newline(): Unit =
      if (lineHasText) { out.append('\n'); lineHasText = false }
    def flush(): Unit = {
      pending.foreach { p => out.append(p); if (p.nonEmpty) lineHasText = true }
      pending.clear()
    }
    while (i < n) {
      val c = cs.charAt(i)
      if (c == '(') {
        val (str, next) = parseLiteralString(cs, i + 1)
        pending += str
        i = next
      } else if (c == '<' && i + 1 < n && cs.charAt(i + 1) != '<') {
        val (str, next) = parseHexString(cs, i + 1)
        pending += str
        i = next
      } else if (c == '%') {
        while (i < n && cs.charAt(i) != '\n' && cs.charAt(i) != '\r') i += 1
      } else if (c == '/' || c == '[' || c == ']' || c == '<' || c == '>' ||
          Character.isWhitespace(c)) {
        i += 1
      } else {
        val start = i
        while (i < n && !Character.isWhitespace(cs.charAt(i)) &&
          "()[]<>/%".indexOf(cs.charAt(i)) < 0) i += 1
        cs.substring(start, math.max(i, start + 1)) match {
          case "Tj" | "TJ" => flush()
          case "'" => newline(); flush()
          case "\"" => newline(); flush()
          case "Td" | "TD" | "T*" => newline()
          case _ => () // operands (numbers, names) and other operators
        }
        if (i == start) i += 1 // lone delimiter-ish char, e.g. ' or "
      }
    }
  }

  /** PDF literal string body starting AFTER '(' — nested parens, the
    * standard escapes, octal escapes, backslash-EOL continuations.
    * Returns (decoded, index after the closing paren). */
  private def parseLiteralString(cs: String, from: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder(32)
    var i = from
    var depth = 1
    val n = cs.length
    while (i < n && depth > 0) {
      val c = cs.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val e = cs.charAt(i + 1)
        e match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' | ')' | '\\' => sb.append(e); i += 2
          case '\r' => i += (if (i + 2 < n && cs.charAt(i + 2) == '\n') 3 else 2)
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var v = 0
            var k = 0
            i += 1
            while (k < 3 && i < n && cs.charAt(i) >= '0' && cs.charAt(i) <= '7') {
              v = v * 8 + (cs.charAt(i) - '0'); i += 1; k += 1
            }
            sb.append((v & 0xff).toChar)
          case other => sb.append(other); i += 2 // unknown escape: drop the backslash
        }
      } else {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        if (depth > 0) sb.append(c)
        i += 1
      }
    }
    (sb.toString, i)
  }

  /** PDF hex string body starting AFTER '<': pairs of hex digits (odd
    * count padded with 0), whitespace ignored, bytes taken Latin-1. */
  private def parseHexString(cs: String, from: Int): (String, Int) = {
    val bytes = new ByteArrayOutputStream(16)
    var i = from
    val n = cs.length
    var hi = -1
    while (i < n && cs.charAt(i) != '>') {
      val d = Character.digit(cs.charAt(i), 16)
      if (d >= 0) {
        if (hi < 0) hi = d
        else { bytes.write(hi * 16 + d); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) bytes.write(hi * 16)
    (new String(bytes.toByteArray, ISO_8859_1), math.min(i + 1, n))
  }

  // ------------------------------------------------ synthetic fixture

  /** Deterministic synthetic-invertible PDF (the Multimodal synthetic-PNG
    * playbook): a real 5-object document — catalog, pages, one page,
    * its content stream, a Type1 font — with a CORRECT xref table and
    * trailer. The text is laid out 8 words per line (`Td` start, `T*`
    * advances), every third line split into a kerned `TJ` array, parens
    * and backslashes escaped; odd `flate` builds the content stream
    * FlateDecode-compressed. Extraction must return the lines joined
    * with '\n' — exactly the 8-word regrouping of `text`, which is what
    * the SQL oracle rebuilds. */
  def syntheticPdf(docId: Long, text: String, flate: Boolean): Array[Byte] = {
    def esc(t: String) = t.replace("\\", "\\\\")
      .replace("(", "\\(").replace(")", "\\)")
    val lines = text.split(" ").filter(_.nonEmpty).grouped(8)
      .map(_.mkString(" ")).toSeq
    val content = {
      val sb = new StringBuilder(text.length + 64)
      sb.append("BT\n/F1 12 Tf\n72 720 Td\n")
      lines.zipWithIndex.foreach { case (l, i) =>
        if (i > 0) sb.append("T*\n")
        val cut = l.indexOf(' ')
        if (i % 3 == 2 && cut > 0)
          sb.append("[(").append(esc(l.substring(0, cut + 1)))
            .append(") -250 (").append(esc(l.substring(cut + 1)))
            .append(")] TJ\n")
        else sb.append('(').append(esc(l)).append(") Tj\n")
      }
      sb.append("ET\n").toString.getBytes(UTF_8)
    }
    val stream = if (flate) zlibDeflate(content) else content
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes(UTF_8),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(UTF_8),
      ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
        .getBytes(UTF_8),
      (s"<< /Length ${stream.length}$filter >>\nstream\n").getBytes(UTF_8) ++
        stream ++ "\nendstream".getBytes(UTF_8),
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>".getBytes(UTF_8))
    val out = new ByteArrayOutputStream(512 + stream.length)
    def w(b: Array[Byte]): Unit = out.write(b)
    def ws(t: String): Unit = w(t.getBytes(UTF_8))
    ws(s"%PDF-1.4\n% graft synthetic doc $docId\n")
    val offsets = objs.zipWithIndex.map { case (body, idx) =>
      val off = out.size()
      ws(s"${idx + 1} 0 obj\n"); w(body); ws("\nendobj\n")
      off
    }
    val xrefAt = out.size()
    ws(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => ws(f"$o%010d 00000 n \n"))
    ws(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  private def zlibDeflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b)
    d.finish()
    val bos = new ByteArrayOutputStream(b.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }
}

/** `pdf_text(binary)` — codegen whole-document PDF text extraction. */
case class PdfText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "pdf_text"
  // null also for non-null input that isn't a PDF / has no text
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PdfOps.extractText(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.expr.PdfOps.extractText($a);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PdfExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def pdf_text(pdf: Column): Column =
    ColumnBridge.column(PdfText(ColumnBridge.expression(pdf)))
}
