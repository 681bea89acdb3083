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
  *  - SIMPLE-FONT DECODING (PDF 32000-1 §9.6.6 / Annex D): `Tf` tracks
  *    the active font through the page `/Font` resource dictionaries;
  *    a font with `/Encoding /WinAnsiEncoding` or `/MacRomanEncoding`
  *    (by name, inline dict, or indirect object) maps string BYTES
  *    through that single-byte table, `/Differences` overrides
  *    individual codes via an Adobe-glyph-list subset, and a
  *    `/ToUnicode` CMap stream (bfchar + bfrange, UTF-16BE targets)
  *    wins over everything; `/Type0` + `/Identity-H` fonts read
  *    two-byte codes through the same CMap (the CJK/Greek path).
  *    A font carrying NONE of these — or text shown before any `Tf` —
  *    keeps the original bytes-as-UTF-8 behavior, so ASCII documents
  *    decode identically with or without font dictionaries;
  *  - encrypted PDFs and exotic filters yield null, never a task
  *    failure; unknown glyph names keep the base-table entry and
  *    unmapped CIDs fall back to their code point (tolerant reader).
  *
  * Per-row pure JVM decode — embarrassingly parallel, zero shuffle, the
  * same plan at 100 TB.
  */
object PdfOps {

  // ------------------------------------------------ font decoding

  /** Per-font byte→text decoder. `table` is a 256-entry single-byte
    * map (null = no simple encoding), `cmap` the parsed /ToUnicode map
    * (null = none). `twoByte` marks Identity-H composite fonts. With
    * neither table nor cmap, bytes pass through as UTF-8 — the
    * pre-font behavior every ASCII fixture and crawl page relies on. */
  private[expr] final class FontDec(val twoByte: Boolean,
      val table: Array[String], val cmap: java.util.HashMap[Integer, String]) {
    def decode(raw: String): String = {
      val n = raw.length
      if (twoByte) {
        val sb = new java.lang.StringBuilder(n)
        var i = 0
        while (i < n) {
          val code =
            if (i + 1 < n) ((raw.charAt(i) & 0xff) << 8) | (raw.charAt(i + 1) & 0xff)
            else raw.charAt(i) & 0xff
          val m = if (cmap == null) null else cmap.get(code)
          if (m != null) sb.append(m) else sb.append(code.toChar)
          i += 2
        }
        sb.toString
      } else if (table != null || cmap != null) {
        val sb = new java.lang.StringBuilder(n)
        var i = 0
        while (i < n) {
          val code = raw.charAt(i) & 0xff
          val m = if (cmap == null) null else cmap.get(code)
          if (m != null) sb.append(m)
          else if (table != null) sb.append(table(code))
          else sb.append(code.toChar)
          i += 1
        }
        sb.toString
      } else new String(raw.getBytes(ISO_8859_1), UTF_8)
    }
  }

  private[expr] val Utf8Passthrough = new FontDec(false, null, null)

  /** Latin-1 identity baseline: every code maps to its own char. The
    * tolerant stand-in for StandardEncoding and unknown base names —
    * ASCII is identical across all of them. */
  private val IdentityTable: Array[String] =
    Array.tabulate(256)(i => String.valueOf(i.toChar))

  /** WinAnsiEncoding = CP1252: Latin-1 identity plus the 0x80–0x9F
    * specials (PDF 32000-1 Annex D.2). Undefined CP1252 slots keep the
    * identity char rather than erroring. */
  private[expr] val WinAnsiTable: Array[String] = {
    val t = IdentityTable.clone()
    Seq(0x80 -> "€", 0x82 -> "‚", 0x83 -> "ƒ",
      0x84 -> "„", 0x85 -> "…", 0x86 -> "†",
      0x87 -> "‡", 0x88 -> "ˆ", 0x89 -> "‰",
      0x8A -> "Š", 0x8B -> "‹", 0x8C -> "Œ",
      0x8E -> "Ž", 0x91 -> "‘", 0x92 -> "’",
      0x93 -> "“", 0x94 -> "”", 0x95 -> "•",
      0x96 -> "–", 0x97 -> "—", 0x98 -> "˜",
      0x99 -> "™", 0x9A -> "š", 0x9B -> "›",
      0x9C -> "œ", 0x9E -> "ž", 0x9F -> "Ÿ")
      .foreach { case (k, v) => t(k) = v }
    t
  }

  /** MacRomanEncoding from the JVM's own x-MacRoman charset, with the
    * one PDF-spec divergence pinned: Annex D keeps `currency` (U+00A4)
    * at 0xDB where modern Mac OS Roman placed the euro. Falls back to
    * identity when the charset module is absent (ASCII unaffected). */
  private[expr] val MacRomanTable: Array[String] = {
    val t =
      try {
        val cs = java.nio.charset.Charset.forName("x-MacRoman")
        Array.tabulate(256)(i => new String(Array(i.toByte), cs))
      } catch { case _: Exception => IdentityTable.clone() }
    t(0xDB) = "¤"
    t
  }

  /** Adobe-glyph-list subset for `/Differences` names: full ASCII,
    * Latin-1 letters/punctuation, and the CP1252 specials — the names
    * simple-font subset PDFs actually use. */
  private[expr] val Glyphs: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    Seq("space" -> ' ', "exclam" -> '!', "quotedbl" -> '"',
      "numbersign" -> '#', "dollar" -> '$', "percent" -> '%',
      "ampersand" -> '&', "quotesingle" -> '\'', "parenleft" -> '(',
      "parenright" -> ')', "asterisk" -> '*', "plus" -> '+',
      "comma" -> ',', "hyphen" -> '-', "period" -> '.', "slash" -> '/',
      "colon" -> ':', "semicolon" -> ';', "less" -> '<', "equal" -> '=',
      "greater" -> '>', "question" -> '?', "at" -> '@',
      "bracketleft" -> '[', "backslash" -> '\\', "bracketright" -> ']',
      "asciicircum" -> '^', "underscore" -> '_', "grave" -> '`',
      "braceleft" -> '{', "bar" -> '|', "braceright" -> '}',
      "asciitilde" -> '~',
      "exclamdown" -> '¡', "cent" -> '¢',
      "sterling" -> '£', "currency" -> '¤', "yen" -> '¥',
      "brokenbar" -> '¦', "section" -> '§',
      "dieresis" -> '¨', "copyright" -> '©',
      "ordfeminine" -> 'ª', "guillemotleft" -> '«',
      "logicalnot" -> '¬', "registered" -> '®',
      "macron" -> '¯', "degree" -> '°',
      "plusminus" -> '±', "acute" -> '´', "mu" -> 'µ',
      "paragraph" -> '¶', "periodcentered" -> '·',
      "cedilla" -> '¸', "ordmasculine" -> 'º',
      "guillemotright" -> '»', "onequarter" -> '¼',
      "onehalf" -> '½', "threequarters" -> '¾',
      "questiondown" -> '¿', "multiply" -> '×',
      "divide" -> '÷',
      "Agrave" -> 'À', "Aacute" -> 'Á',
      "Acircumflex" -> 'Â', "Atilde" -> 'Ã',
      "Adieresis" -> 'Ä', "Aring" -> 'Å', "AE" -> 'Æ',
      "Ccedilla" -> 'Ç', "Egrave" -> 'È', "Eacute" -> 'É',
      "Ecircumflex" -> 'Ê', "Edieresis" -> 'Ë',
      "Igrave" -> 'Ì', "Iacute" -> 'Í',
      "Icircumflex" -> 'Î', "Idieresis" -> 'Ï',
      "Eth" -> 'Ð', "Ntilde" -> 'Ñ', "Ograve" -> 'Ò',
      "Oacute" -> 'Ó', "Ocircumflex" -> 'Ô',
      "Otilde" -> 'Õ', "Odieresis" -> 'Ö', "Oslash" -> 'Ø',
      "Ugrave" -> 'Ù', "Uacute" -> 'Ú',
      "Ucircumflex" -> 'Û', "Udieresis" -> 'Ü',
      "Yacute" -> 'Ý', "Thorn" -> 'Þ',
      "germandbls" -> 'ß',
      "agrave" -> 'à', "aacute" -> 'á',
      "acircumflex" -> 'â', "atilde" -> 'ã',
      "adieresis" -> 'ä', "aring" -> 'å', "ae" -> 'æ',
      "ccedilla" -> 'ç', "egrave" -> 'è', "eacute" -> 'é',
      "ecircumflex" -> 'ê', "edieresis" -> 'ë',
      "igrave" -> 'ì', "iacute" -> 'í',
      "icircumflex" -> 'î', "idieresis" -> 'ï',
      "eth" -> 'ð', "ntilde" -> 'ñ', "ograve" -> 'ò',
      "oacute" -> 'ó', "ocircumflex" -> 'ô',
      "otilde" -> 'õ', "odieresis" -> 'ö', "oslash" -> 'ø',
      "ugrave" -> 'ù', "uacute" -> 'ú',
      "ucircumflex" -> 'û', "udieresis" -> 'ü',
      "yacute" -> 'ý', "thorn" -> 'þ', "ydieresis" -> 'ÿ',
      "bullet" -> '•', "dagger" -> '†',
      "daggerdbl" -> '‡', "ellipsis" -> '…',
      "emdash" -> '—', "endash" -> '–', "florin" -> 'ƒ',
      "fraction" -> '⁄', "guilsinglleft" -> '‹',
      "guilsinglright" -> '›', "minus" -> '−',
      "perthousand" -> '‰', "quotedblbase" -> '„',
      "quotedblleft" -> '“', "quotedblright" -> '”',
      "quoteleft" -> '‘', "quoteright" -> '’',
      "quotesinglbase" -> '‚', "trademark" -> '™',
      "Euro" -> '€', "OE" -> 'Œ', "oe" -> 'œ',
      "Scaron" -> 'Š', "scaron" -> 'š', "Zcaron" -> 'Ž',
      "zcaron" -> 'ž', "Ydieresis" -> 'Ÿ',
      "circumflex" -> 'ˆ', "tilde" -> '˜',
      "dotlessi" -> 'ı')
      .foreach { case (n, c) => b += n -> c.toString }
    Seq("fi" -> "ﬁ", "fl" -> "ﬂ").foreach(b += _)
    val digits = Seq("zero", "one", "two", "three", "four", "five",
      "six", "seven", "eight", "nine")
    digits.zipWithIndex.foreach { case (n, i) =>
      b += n -> ('0' + i).toChar.toString
    }
    ('A' to 'Z').foreach(c => b += c.toString -> c.toString)
    ('a' to 'z').foreach(c => b += c.toString -> c.toString)
    b.result()
  }

  private val ObjRe = """(\d+)\s+\d+\s+obj\b""".r
  private val FontRefRe = """/([A-Za-z0-9._-]+)\s+(\d+)\s+\d+\s+R""".r
  private val EncNameRe = """/Encoding\s*/([A-Za-z0-9-]+)""".r
  private val EncRefRe = """/Encoding\s+(\d+)\s+\d+\s+R""".r
  private val ToUniRe = """/ToUnicode\s+(\d+)\s+\d+\s+R""".r
  private val BaseEncRe = """/BaseEncoding\s*/([A-Za-z0-9-]+)""".r

  /** End index (exclusive) of the balanced `<< ... >>` starting at
    * `from` (which must point at the opening `<<`). */
  private def balancedDictEnd(s: String, from: Int): Int = {
    var i = from
    var depth = 0
    val n = s.length
    while (i < n) {
      if (i + 1 < n && s.charAt(i) == '<' && s.charAt(i + 1) == '<') {
        depth += 1; i += 2
      } else if (i + 1 < n && s.charAt(i) == '>' && s.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return i
      } else i += 1
    }
    n
  }

  /** The dict text of object `num`: from after its `obj` keyword to the
    * nearer of `stream` / `endobj`. Empty when the object is absent. */
  private def dictOf(s: String, objAt: collection.Map[Int, Int], num: Int): String =
    objAt.get(num) match {
      case None => ""
      case Some(at) =>
        val eo = s.indexOf("endobj", at)
        val st = s.indexOf("stream", at)
        val end =
          if (st >= 0 && (eo < 0 || st < eo)) st
          else if (eo >= 0) eo
          else s.length
        s.substring(at, end)
    }

  /** Decoded stream bytes of object `num` (Flate-inflated when its dict
    * says so); None for absent objects, filter failures, or no stream. */
  private def streamOf(s: String, pdf: Array[Byte],
      objAt: collection.Map[Int, Int], num: Int): Option[Array[Byte]] =
    objAt.get(num).flatMap { at =>
      val eo = s.indexOf("endobj", at)
      val si = s.indexOf("stream", at)
      if (si < 0 || (eo >= 0 && si > eo)) None
      else {
        val dict = s.substring(at, si)
        var ds = si + "stream".length
        if (ds < s.length && s.charAt(ds) == '\r') ds += 1
        if (ds < s.length && s.charAt(ds) == '\n') ds += 1
        val de = LengthRe.findFirstMatchIn(dict)
          .flatMap(_.group(1).toIntOption)
          .filter(l => l >= 0 && ds + l <= pdf.length).map(ds + _)
          .getOrElse {
            val e = s.indexOf("endstream", ds)
            if (e < 0) pdf.length else e
          }
        val data = java.util.Arrays.copyOfRange(pdf, ds, de)
        if (dict.contains("/FlateDecode")) graft.ingest.WarcIngest.inflate(data)
        else if (dict.contains("/Filter")) None
        else Some(data)
      }
    }

  /** Parse a /ToUnicode CMap: `bfchar` pairs and `bfrange` triples
    * (consecutive-destination and array forms), UTF-16BE targets.
    * Range width is capped at 64k entries — a runaway range in a
    * hostile PDF must not allocate unboundedly. */
  private[expr] def parseCmap(t: String): java.util.HashMap[Integer, String] = {
    val m = new java.util.HashMap[Integer, String]()
    def u16(hex: String): String = {
      val sb = new java.lang.StringBuilder(hex.length / 4 + 1)
      var i = 0
      while (i + 4 <= hex.length) {
        sb.append(Integer.parseInt(hex.substring(i, i + 4), 16).toChar)
        i += 4
      }
      if (i < hex.length) // tolerate short (2-digit) targets
        sb.append(Integer.parseInt(hex.substring(i), 16).toChar)
      sb.toString
    }
    val HexTok = """<([0-9A-Fa-f]+)>""".r
    def sections(begin: String, end: String): Iterator[String] = {
      Iterator.unfold(0) { pos =>
        val b = t.indexOf(begin, pos)
        if (b < 0) None
        else {
          val e = t.indexOf(end, b)
          val stop = if (e < 0) t.length else e
          Some((t.substring(b + begin.length, stop), stop + end.length))
        }
      }
    }
    sections("beginbfchar", "endbfchar").foreach { body =>
      HexTok.findAllMatchIn(body).map(_.group(1)).grouped(2).foreach {
        case Seq(src, dst) =>
          try m.put(Integer.parseInt(src, 16), u16(dst))
          catch { case _: NumberFormatException => () }
        case _ => ()
      }
    }
    sections("beginbfrange", "endbfrange").foreach { body =>
      // token walk: <lo> <hi> then either <dst> or [ <d0> <d1> ... ]
      val Tok = """<([0-9A-Fa-f]+)>|(\[)|(\])""".r
      val toks = Tok.findAllMatchIn(body).toList
      var i = 0
      while (i < toks.length) {
        val loM = toks(i)
        if (loM.group(1) != null && i + 1 < toks.length &&
            toks(i + 1).group(1) != null) {
          try {
            val lo = Integer.parseInt(loM.group(1), 16)
            val hi = Integer.parseInt(toks(i + 1).group(1), 16)
            val width = math.min(hi - lo, 65535)
            if (i + 2 < toks.length && toks(i + 2).group(2) != null) {
              // array form: one destination per code
              var j = i + 3
              var c = lo
              while (j < toks.length && toks(j).group(3) == null) {
                if (toks(j).group(1) != null && c <= lo + width) {
                  m.put(c, u16(toks(j).group(1)))
                  c += 1
                }
                j += 1
              }
              i = j + 1
            } else if (i + 2 < toks.length && toks(i + 2).group(1) != null) {
              // consecutive form: increment the last UTF-16 code unit
              val dst = u16(toks(i + 2).group(1))
              var k = 0
              while (k <= width) {
                val out =
                  if (dst.isEmpty) ""
                  else dst.substring(0, dst.length - 1) +
                    (dst.charAt(dst.length - 1) + k).toChar
                m.put(lo + k, out)
                k += 1
              }
              i += 3
            } else i += 2
          } catch { case _: NumberFormatException => i += 2 }
        } else i += 1
      }
    }
    m
  }

  /** Build the resource-name → decoder map for the whole document:
    * every `/Font << /Fk N 0 R ... >>` resource entry resolved through
    * its font object's /Encoding + /Differences + /ToUnicode. Name
    * collisions across pages resolve last-wins — this map is only the
    * FALLBACK for streams no page claims; [[parsePageFonts]] scopes
    * resolution per page for every stream a `/Contents` entry names. */
  private[expr] def parseFonts(s: String,
      pdf: Array[Byte]): collection.Map[String, FontDec] = {
    val objAt = collection.mutable.HashMap.empty[Int, Int]
    ObjRe.findAllMatchIn(s).foreach(mm => objAt.put(mm.group(1).toInt, mm.end))
    val refs = collection.mutable.LinkedHashMap.empty[String, Int]
    var p = s.indexOf("/Font")
    while (p >= 0) {
      var q = p + 5
      while (q < s.length && Character.isWhitespace(s.charAt(q))) q += 1
      if (q + 1 < s.length && s.charAt(q) == '<' && s.charAt(q + 1) == '<') {
        val body = s.substring(q, balancedDictEnd(s, q))
        FontRefRe.findAllMatchIn(body).foreach(mm =>
          refs.put(mm.group(1), mm.group(2).toInt))
      }
      p = s.indexOf("/Font", p + 5)
    }
    refs.map { case (name, num) =>
      name -> fontDecoder(s, pdf, objAt, num)
    }
  }

  private val ContentsRefRe = """/Contents\s+(\d+)\s+\d+\s+R""".r
  private val ResRefRe = """/Resources\s+(\d+)\s+\d+\s+R""".r
  private val FontDictRefRe = """/Font\s+(\d+)\s+\d+\s+R""".r
  private val BareRefRe = """(\d+)\s+\d+\s+R""".r

  /** PER-PAGE font resolution — the fix for the whole-document map's
    * real failure mode: multi-page PDFs routinely reuse `/F1..` per
    * page with DIFFERENT encodings, and a last-wins global map decodes
    * earlier pages through the last page's tables. Each object carrying
    * `/Contents` (a page) has its `/Resources` (inline dict or indirect
    * ref) `/Font` entries resolved into that page's own decoder map,
    * keyed by the page's content-stream object number(s) — direct ref
    * and array form both handled. Streams no page claims fall back to
    * the [[parseFonts]] global map (torn fragments, tolerance). */
  private[expr] def parsePageFonts(s: String, pdf: Array[Byte])
      : collection.Map[Int, collection.Map[String, FontDec]] = {
    val objAt = collection.mutable.HashMap.empty[Int, Int]
    ObjRe.findAllMatchIn(s).foreach(mm => objAt.put(mm.group(1).toInt, mm.end))
    val decCache = collection.mutable.HashMap.empty[Int, FontDec]
    val out =
      collection.mutable.HashMap.empty[Int, collection.Map[String, FontDec]]
    objAt.keysIterator.toSeq.sorted.foreach { num =>
      val dict = dictOf(s, objAt, num)
      val ci = dict.indexOf("/Contents")
      if (ci >= 0) {
        // the page's resources: inline << >> or an indirect object
        val resBody: Option[String] = {
          val ri = dict.indexOf("/Resources")
          if (ri < 0) None
          else {
            var q = ri + "/Resources".length
            while (q < dict.length && Character.isWhitespace(dict.charAt(q)))
              q += 1
            if (q + 1 < dict.length && dict.charAt(q) == '<' &&
              dict.charAt(q + 1) == '<')
              Some(dict.substring(q, balancedDictEnd(dict, q)))
            else ResRefRe.findFirstMatchIn(dict)
              .map(mm => dictOf(s, objAt, mm.group(1).toInt))
              .filter(_.nonEmpty)
          }
        }
        resBody.foreach { res =>
          val fi = res.indexOf("/Font")
          if (fi >= 0) {
            var q = fi + "/Font".length
            while (q < res.length && Character.isWhitespace(res.charAt(q)))
              q += 1
            val fontBody =
              if (q + 1 < res.length && res.charAt(q) == '<' &&
                res.charAt(q + 1) == '<')
                res.substring(q, balancedDictEnd(res, q))
              else FontDictRefRe.findFirstMatchIn(res)
                .map(mm => dictOf(s, objAt, mm.group(1).toInt))
                .getOrElse("")
            if (fontBody.nonEmpty) {
              val pageMap =
                collection.mutable.LinkedHashMap.empty[String, FontDec]
              FontRefRe.findAllMatchIn(fontBody).foreach { mm =>
                if (mm.group(1) != "Font")
                  pageMap.put(mm.group(1), decCache.getOrElseUpdate(
                    mm.group(2).toInt,
                    fontDecoder(s, pdf, objAt, mm.group(2).toInt)))
              }
              if (pageMap.nonEmpty) {
                // claim the page's content streams: "N 0 R" or [ ... ]
                var q2 = ci + "/Contents".length
                while (q2 < dict.length &&
                  Character.isWhitespace(dict.charAt(q2))) q2 += 1
                if (q2 < dict.length && dict.charAt(q2) == '[') {
                  val rb = dict.indexOf(']', q2)
                  val arr = dict.substring(q2 + 1,
                    if (rb < 0) dict.length else rb)
                  BareRefRe.findAllMatchIn(arr).foreach(mm =>
                    out.put(mm.group(1).toInt, pageMap))
                } else ContentsRefRe.findFirstMatchIn(dict).foreach(mm =>
                  out.put(mm.group(1).toInt, pageMap))
              }
            }
          }
        }
      }
    }
    out
  }

  /** The object NUMBER whose `obj` keyword ends at/around
    * `objKeywordAt` (the index `lastIndexOf("obj", ...)` returned);
    * -1 when the preceding tokens are not `<num> <gen> obj`. */
  private def objNumAt(s: String, objKeywordAt: Int): Int = {
    if (objKeywordAt < 0) return -1
    var i = objKeywordAt - 1
    while (i >= 0 && Character.isWhitespace(s.charAt(i))) i -= 1
    val genEnd = i
    while (i >= 0 && Character.isDigit(s.charAt(i))) i -= 1
    if (i == genEnd) return -1
    while (i >= 0 && Character.isWhitespace(s.charAt(i))) i -= 1
    val numEnd = i
    while (i >= 0 && Character.isDigit(s.charAt(i))) i -= 1
    if (i == numEnd) return -1
    s.substring(i + 1, numEnd + 1).toIntOption.getOrElse(-1)
  }

  private def fontDecoder(s: String, pdf: Array[Byte],
      objAt: collection.Map[Int, Int], num: Int): FontDec = {
    val dict = dictOf(s, objAt, num)
    if (dict.isEmpty) return Utf8Passthrough
    val cmap = ToUniRe.findFirstMatchIn(dict)
      .flatMap(mm => streamOf(s, pdf, objAt, mm.group(1).toInt))
      .map(b => parseCmap(new String(b, ISO_8859_1)))
      .orNull
    if (dict.contains("/Type0") || dict.contains("/Identity-H"))
      return new FontDec(true, null, cmap)
    // /Encoding: a bare name, an inline dict, or an indirect object
    val encName = EncNameRe.findFirstMatchIn(dict).map(_.group(1))
    val encBody: Option[String] = {
      val inlineAt = dict.indexOf("/Encoding")
      val inline =
        if (inlineAt < 0) None
        else {
          var q = inlineAt + "/Encoding".length
          while (q < dict.length && Character.isWhitespace(dict.charAt(q))) q += 1
          if (q + 1 < dict.length && dict.charAt(q) == '<' &&
            dict.charAt(q + 1) == '<')
            Some(dict.substring(q, balancedDictEnd(dict, q)))
          else None
        }
      inline.orElse(EncRefRe.findFirstMatchIn(dict)
        .map(mm => dictOf(s, objAt, mm.group(1).toInt))
        .filter(_.nonEmpty))
    }
    val baseName =
      encBody.flatMap(b => BaseEncRe.findFirstMatchIn(b).map(_.group(1)))
        .orElse(encName)
    val table: Array[String] = baseName match {
      case Some("WinAnsiEncoding") => WinAnsiTable.clone()
      case Some("MacRomanEncoding") => MacRomanTable.clone()
      case Some(_) => IdentityTable.clone() // Standard/PDFDoc ≈ identity here
      case None if encBody.isDefined => IdentityTable.clone()
      case None => null
    }
    if (table != null && encBody.isDefined)
      applyDifferences(encBody.get, table)
    if (table == null && cmap == null) Utf8Passthrough
    else new FontDec(false, table, cmap)
  }

  /** `/Differences [ code /name /name ... code /name ... ]` — integers
    * reset the running code, names assign successive codes. Unknown
    * glyph names keep the base entry (notdef tolerance). */
  private def applyDifferences(encBody: String, table: Array[String]): Unit = {
    val di = encBody.indexOf("/Differences")
    if (di < 0) return
    val lb = encBody.indexOf('[', di)
    if (lb < 0) return
    val rb = encBody.indexOf(']', lb)
    val body = encBody.substring(lb + 1, if (rb < 0) encBody.length else rb)
    val Tok = """(\d+)|/([A-Za-z0-9._-]+)""".r
    var code = 0
    Tok.findAllMatchIn(body).foreach { mm =>
      if (mm.group(1) != null) code = mm.group(1).toInt
      else {
        if (code >= 0 && code < 256)
          Glyphs.get(mm.group(2)).foreach(table(code) = _)
        code += 1
      }
    }
  }

  /** Extract the text content of every content stream, in stream order;
    * null when the bytes are not a PDF or no text survives parsing. */
  def extractText(pdf: Array[Byte]): UTF8String = {
    if (pdf == null || pdf.length < 8) return null
    if (!(pdf(0) == '%' && pdf(1) == 'P' && pdf(2) == 'D' && pdf(3) == 'F'))
      return null
    // structure scan over the byte-transparent Latin-1 view
    val s = new String(pdf, ISO_8859_1)
    val fonts: collection.Map[String, FontDec] =
      if (s.contains("/Font")) parseFonts(s, pdf) else Map.empty
    // page-scoped font maps keyed by content-stream object number —
    // /F1 on page 1 and /F1 on page 3 may be DIFFERENT fonts. Only
    // MULTI-page documents pay the second resolution pass: with one
    // /Contents entry the page map and the global map are the same
    // table by construction (measured: the pass costs ~35% on the
    // font-heavy single-page fixture for zero behavior change).
    val pageFonts: collection.Map[Int, collection.Map[String, FontDec]] = {
      val c1 = s.indexOf("/Contents")
      if (fonts.nonEmpty && c1 >= 0 && s.indexOf("/Contents", c1 + 9) >= 0)
        parsePageFonts(s, pdf)
      else Map.empty
    }
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
        if (usable) {
          val owner = objNumAt(s, objAt)
          val streamFonts =
            if (owner >= 0) pageFonts.getOrElse(owner, fonts) else fonts
          appendTextOps(new String(data, ISO_8859_1), out, streamFonts)
        }
        pos = math.max(de, si + 6)
      }
    }
    if (out.length == 0) null else UTF8String.fromString(out.toString)
  }

  private val LengthRe = """/Length\s+(\d+)\b""".r

  /** Run the content-stream tokenizer over the byte-transparent Latin-1
    * view, appending shown text to `out`: strings decode through the
    * font selected by the latest `Tf` (UTF-8 passthrough before any
    * `Tf` or for fonts without encoding info) and accumulate until
    * their text operator; `Td`/`TD`/`T*` (and the leading move of
    * `'`/`"`) emit one '\n' when the current line already has text. */
  private def appendTextOps(cs: String, out: java.lang.StringBuilder,
      fonts: collection.Map[String, FontDec]): Unit = {
    val n = cs.length
    var i = 0
    val pending = new scala.collection.mutable.ArrayBuffer[String](4)
    var lineHasText = false
    var lastName: String = null
    var cur: FontDec = Utf8Passthrough
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
        pending += cur.decode(str)
        i = next
      } else if (c == '<' && i + 1 < n && cs.charAt(i + 1) != '<') {
        val (str, next) = parseHexString(cs, i + 1)
        pending += cur.decode(str)
        i = next
      } else if (c == '%') {
        while (i < n && cs.charAt(i) != '\n' && cs.charAt(i) != '\r') i += 1
      } else if (c == '/') {
        val start = i + 1
        var j = start
        while (j < n && !Character.isWhitespace(cs.charAt(j)) &&
          "()[]<>/%".indexOf(cs.charAt(j)) < 0) j += 1
        lastName = cs.substring(start, j)
        i = j
      } else if (c == '[' || c == ']' || c == '<' || c == '>' ||
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
          case "Tf" =>
            if (lastName != null)
              cur = fonts.getOrElse(lastName, Utf8Passthrough)
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
    assemblePdf(docId, objs)
  }

  /** Serialize numbered objects 1..n with a correct xref table and
    * trailer (shared by both synthetic fixtures). */
  private def assemblePdf(docId: Long, objs: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream(512 + objs.map(_.length).sum)
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

  // ------------------------------------- unicode (font-decode) fixture

  /** The three per-line suffixes [[syntheticUnicodePdf]] appends, cycling
    * by line index mod 3 — each exercises one decode path:
    * 0 = WinAnsiEncoding bytes (CP1252 en-dash + Latin-1 accents),
    * 1 = /Differences-mapped codes over a MacRoman base,
    * 2 = Identity-H two-byte codes through a /ToUnicode CMap (Greek:
    *     bfrange for α–γ, bfchar for δ). Exposed so the oracle SQL is
    *     interpolated from the SAME constants the generator encodes. */
  val WinSuffix: String = " – café «ß»"
  val DiffSuffix: String = " •€éñø"
  val CidSuffix: String = " αβγδ"

  def unicodeSuffix(g: Int): String = (g % 3) match {
    case 0 => WinSuffix
    case 1 => DiffSuffix
    case _ => CidSuffix
  }

  private lazy val WinAnsiInv: Map[Char, Int] =
    WinAnsiTable.zipWithIndex
      .collect { case (v, i) if v.length == 1 => v.charAt(0) -> i }.toMap

  /** /Differences assignments the F2 font declares: codes 200–204. */
  private val DiffCodes: Seq[(String, Char)] = Seq(
    "bullet" -> '•', "Euro" -> '€', "eacute" -> 'é',
    "ntilde" -> 'ñ', "oslash" -> 'ø')
  private lazy val DiffInv: Map[Char, Int] =
    DiffCodes.zipWithIndex.map { case ((_, c), k) => c -> (200 + k) }.toMap

  /** Two-byte CID codes for the F3 font: ASCII identity via bfrange,
    * Greek α/β/γ at 0x0101–0x0103 (bfrange), δ at 0x0104 (bfchar). */
  private lazy val CidInv: Map[Char, Int] = Map(
    'α' -> 0x0101, 'β' -> 0x0102, 'γ' -> 0x0103, 'δ' -> 0x0104)

  /** A PDF literal string for raw byte values: parens/backslash escaped,
    * non-printable and high bytes as octal escapes (keeps the content
    * stream pure ASCII). */
  private def pdfLiteral(bytes: Seq[Int]): String = {
    val sb = new java.lang.StringBuilder(bytes.length + 8)
    sb.append('(')
    bytes.foreach { b =>
      if (b == '(' || b == ')' || b == '\\') {
        sb.append('\\'); sb.append(b.toChar)
      } else if (b >= 0x20 && b <= 0x7E) sb.append(b.toChar)
      else sb.append(f"\\$b%03o")
    }
    sb.append(')')
    sb.toString
  }

  /** Deterministic synthetic PDF exercising every simple-font decode
    * path: text re-lined 8 words per line, line i shown through font
    * F(i%3 + 1) with [[unicodeSuffix]] appended —
    * F1 `/Encoding /WinAnsiEncoding`, F2 an inline encoding dict
    * (`/BaseEncoding /MacRomanEncoding` + `/Differences`), F3
    * `/Type0` + `/Identity-H` + `/ToUnicode` CMap, its strings written
    * as two-byte-code hex. The generator encodes through the INVERSE of
    * the decoder's own tables, so extraction must return exactly
    * `line + unicodeSuffix(i)` joined with '\n' — which is what the
    * SQL oracle rebuilds from the same suffix constants. */
  def syntheticUnicodePdf(docId: Long, text: String,
      flate: Boolean): Array[Byte] = {
    val lines = text.split(" ").filter(_.nonEmpty).grouped(8)
      .map(_.mkString(" ")).toSeq
    val content = {
      val sb = new java.lang.StringBuilder(text.length * 2 + 64)
      sb.append("BT\n72 720 Td\n")
      lines.zipWithIndex.foreach { case (l, i) =>
        if (i > 0) sb.append("T*\n")
        (i % 3) match {
          case 0 =>
            sb.append("/F1 12 Tf\n")
            val bytes = (l + WinSuffix).map(c =>
              WinAnsiInv.getOrElse(c, '?'.toInt))
            sb.append(pdfLiteral(bytes)).append(" Tj\n")
          case 1 =>
            sb.append("/F2 11 Tf\n")
            val bytes = (l + DiffSuffix).map(c =>
              if (c < 0x80) c.toInt else DiffInv.getOrElse(c, '?'.toInt))
            sb.append(pdfLiteral(bytes)).append(" Tj\n")
          case _ =>
            sb.append("/F3 10 Tf\n<")
            (l + CidSuffix).foreach { c =>
              sb.append(f"${CidInv.getOrElse(c, c.toInt)}%04X")
            }
            sb.append("> Tj\n")
        }
      }
      sb.append("ET\n").toString.getBytes(UTF_8)
    }
    val stream = if (flate) zlibDeflate(content) else content
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val cmap = ("""/CIDInit /ProcSet findresource begin
                  |12 dict begin
                  |begincmap
                  |/CMapName /GraftUCS def
                  |/CMapType 2 def
                  |1 begincodespacerange
                  |<0000> <FFFF>
                  |endcodespacerange
                  |1 beginbfchar
                  |<0104> <03B4>
                  |endbfchar
                  |2 beginbfrange
                  |<0020> <007E> <0020>
                  |<0101> <0103> <03B1>
                  |endbfrange
                  |endcmap
                  |CMapName currentdict /CMap defineresource pop
                  |end
                  |end""".stripMargin).getBytes(UTF_8)
    val diffs = DiffCodes.map("/" + _._1).mkString(" ")
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes(UTF_8),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(UTF_8),
      ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font " +
        "<< /F1 5 0 R /F2 6 0 R /F3 7 0 R >> >> >>").getBytes(UTF_8),
      (s"<< /Length ${stream.length}$filter >>\nstream\n").getBytes(UTF_8) ++
        stream ++ "\nendstream".getBytes(UTF_8),
      ("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding /WinAnsiEncoding >>").getBytes(UTF_8),
      ("<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman " +
        "/Encoding << /BaseEncoding /MacRomanEncoding " +
        s"/Differences [200 $diffs] >> >>").getBytes(UTF_8),
      ("<< /Type /Font /Subtype /Type0 /BaseFont /GraftCID " +
        "/Encoding /Identity-H /ToUnicode 8 0 R >>").getBytes(UTF_8),
      (s"<< /Length ${cmap.length} >>\nstream\n").getBytes(UTF_8) ++
        cmap ++ "\nendstream".getBytes(UTF_8))
    assemblePdf(docId, objs)
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
