package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-type sniffing from magic bytes — the tolerance layer between
  * the HTTP header and the decoders: real crawls are full of mislabeled
  * responses (PDFs served as text/html, images as octet-stream), and a
  * pipeline that routes on the DECLARED type feeds garbage to its
  * extractors. The sniffer answers from the first bytes alone, covering
  * exactly the container formats the engine decodes
  * ([[graft.operators.Multimodal]]: PNG/GIF/JPEG/WAV/MP4; [[PdfOps]];
  * gzip/zip; HTML/plain text), `application/octet-stream` otherwise —
  * deliberately NO heuristic scoring, only unambiguous signatures, so
  * the answer is a pure deterministic function of the payload. Per-row
  * codegen, zero shuffle.
  */
object MimeOps {

  @inline private def at(b: Array[Byte], i: Int): Int =
    if (i < b.length) b(i) & 0xff else -1

  private def startsWith(b: Array[Byte], s: String, from: Int = 0): Boolean = {
    if (b.length < from + s.length) return false
    var i = 0
    while (i < s.length) {
      if ((b(from + i) & 0xff) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Lower-cased ASCII prefix view for the HTML check (byte-transparent
    * for the ASCII tags we look for). */
  private def htmlish(b: Array[Byte]): Boolean = {
    var i = 0
    val n = math.min(b.length, 256)
    // skip a UTF-8 BOM, then whitespace
    if (at(b, 0) == 0xef && at(b, 1) == 0xbb && at(b, 2) == 0xbf) i = 3
    while (i < n && (b(i) == ' ' || b(i) == '\t' || b(i) == '\r' ||
      b(i) == '\n')) i += 1
    if (i >= n || b(i) != '<') return false
    val rest = new String(b, i, math.min(16, b.length - i),
      java.nio.charset.StandardCharsets.ISO_8859_1)
      .toLowerCase(java.util.Locale.ROOT)
    rest.startsWith("<!doctype") || rest.startsWith("<html") ||
      rest.startsWith("<head") || rest.startsWith("<body") ||
      rest.startsWith("<?xml")
  }

  /** Printable-ASCII/UTF-8-ish check over the first 512 bytes: no NUL
    * and no C0 control besides tab/newline/CR ⇒ text/plain. */
  private def textish(b: Array[Byte]): Boolean = {
    if (b.isEmpty) return false
    var i = 0
    val n = math.min(b.length, 512)
    while (i < n) {
      val v = b(i) & 0xff
      if (v == 0) return false
      if (v < 0x20 && v != '\t' && v != '\n' && v != '\r') return false
      i += 1
    }
    true
  }

  def sniff(b: Array[Byte]): String = {
    if (b == null || b.length == 0) return "application/octet-stream"
    if (startsWith(b, "%PDF-")) return "application/pdf"
    if (at(b, 0) == 0x89 && at(b, 1) == 'P' && at(b, 2) == 'N' &&
        at(b, 3) == 'G' && at(b, 4) == 0x0d && at(b, 5) == 0x0a &&
        at(b, 6) == 0x1a && at(b, 7) == 0x0a)
      return "image/png"
    if (startsWith(b, "GIF87a") || startsWith(b, "GIF89a")) return "image/gif"
    if (at(b, 0) == 0xff && at(b, 1) == 0xd8 && at(b, 2) == 0xff)
      return "image/jpeg"
    if (startsWith(b, "RIFF") && startsWith(b, "WAVE", 8)) return "audio/wav"
    if (b.length >= 12 && startsWith(b, "ftyp", 4)) return "video/mp4"
    if (at(b, 0) == 0x1f && at(b, 1) == 0x8b) return "application/gzip"
    if (startsWith(b, "PK\u0003\u0004")) return "application/zip"
    if (htmlish(b)) return "text/html"
    if (textish(b)) return "text/plain"
    "application/octet-stream"
  }

  def eval(b: Array[Byte]): UTF8String = UTF8String.fromString(sniff(b))
}

/** `mime_sniff(binary)` — codegen magic-byte content-type detection. */
case class MimeSniff(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "mime_sniff"

  override def nullSafeEval(input: Any): Any =
    MimeOps.eval(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.MimeOps.eval($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MimeExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def mime_sniff(bytes: Column): Column =
    ColumnBridge.column(MimeSniff(ColumnBridge.expression(bytes)))
}
