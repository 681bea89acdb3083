package graft.expr

import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — the ftfy idea (Speer, "fixes text for you")
  * reduced to its deterministic core: text that was UTF-8 on the wire
  * but DECODED as windows-1252/latin-1 ("Ã©" for é, "â‚¬" for €) is
  * repaired by encoding it straight back through the wrong codec and
  * strictly re-decoding as UTF-8. A real crawl hits this constantly —
  * pages declaring one charset and serving another, double-encoded
  * CMSes, copy-paste chains.
  *
  * The repair RULE (everything strict, so the fix is a pure function):
  *  1. pure-ASCII text returns unchanged (cannot be mojibake);
  *  2. encode via windows-1252 (REPORT on unmappable — CP1252 is what
  *     browsers actually decode with); if any char has no CP1252 byte,
  *     fall back to latin-1 (covers the C1-control corruptions a
  *     latin-1 decode produces); if both fail → unchanged;
  *  3. STRICT UTF-8 decode of those bytes; any malformed sequence →
  *     unchanged (this is what keeps legitimately-accented text safe:
  *     "café"'s 0xE9 is not valid UTF-8, so it never "repairs");
  *  4. accept only when the result is SHORTER (multi-byte sequences
  *     collapse — an equal-length round trip fixed nothing);
  *  5. repeat up to 3 passes (double-encoded text unwraps one layer per
  *     pass), stopping at the first fixed point.
  *
  * Per-row pure JVM — zero shuffle, the same plan at 100 TB.
  */
object MojibakeOps {

  private val Cp1252: Charset =
    try Charset.forName("windows-1252") catch { case _: Exception => null }

  private def encodeStrict(s: String, cs: Charset): Array[Byte] = {
    if (cs == null) return null
    try {
      val enc = cs.newEncoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val bb = enc.encode(java.nio.CharBuffer.wrap(s))
      val out = new Array[Byte](bb.remaining())
      bb.get(out)
      out
    } catch { case _: CharacterCodingException => null }
  }

  private def decodeStrictUtf8(b: Array[Byte]): String = {
    try {
      val dec = UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    } catch { case _: CharacterCodingException => null }
  }

  private def fixOnce(s: String): String = {
    var ascii = true
    var i = 0
    while (i < s.length && ascii) {
      if (s.charAt(i) > 0x7f) ascii = false
      i += 1
    }
    if (ascii) return s
    var bytes = encodeStrict(s, Cp1252)
    if (bytes == null) bytes = encodeStrict(s, ISO_8859_1)
    if (bytes == null) return s
    val repaired = decodeStrictUtf8(bytes)
    if (repaired != null && repaired.length < s.length) repaired else s
  }

  def fix(s: String): String = {
    if (s == null) return null
    var cur = s
    var pass = 0
    while (pass < 3) {
      val next = fixOnce(cur)
      if (next eq cur) return cur
      if (next == cur) return cur
      cur = next
      pass += 1
    }
    cur
  }

  def eval(text: UTF8String): UTF8String = {
    if (text == null) return null
    val fixed = fix(text.toString)
    UTF8String.fromString(fixed)
  }
}

/** `fix_mojibake(text)` — codegen encode-back-and-strict-decode repair. */
case class FixMojibake(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"

  override def nullSafeEval(input: Any): Any =
    MojibakeOps.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.MojibakeOps.eval($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MojibakeExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def fix_mojibake(text: Column): Column =
    ColumnBridge.column(FixMojibake(ColumnBridge.expression(text)))
}
