package graft.functions

import java.util.zip.{DataFormatException, Inflater}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Simple-PDF text extraction — the parser `pdfMeta`'s token census
  * deliberately is not: walk every `<< … >> stream … endstream`
  * object, decode FlateDecode streams with `java.util.zip.Inflater`
  * (zlib framing — the PngDhash machinery) and take unfiltered
  * streams verbatim, then scan each content stream's `BT … ET` text
  * blocks for the show operators — `(…) Tj`, `(…) '`, `(…) "` and
  * `[(…) -120 (…)] TJ` — parsing PDF literal strings in full
  * (balanced nested parens, the `\n \r \t \b \f \( \) \\` escapes,
  * 1-3-digit octal codes, line continuations) plus `<…>` hex
  * strings.
  *
  * Joining contract (deterministic, documented): strings inside one
  * TJ array concatenate (kerning numbers ignored), show operations
  * within a BT block join with a single space, BT blocks and streams
  * join with a newline.
  *
  * TOUNICODE CMAP RESOLUTION (the tier most post-2005 PDFs need —
  * subset fonts embed arbitrary glyph codes that are garbage as raw
  * bytes): when the document contains `/ToUnicode`, the kernel
  * parses the indirect objects (`N G obj … endobj`), decodes each
  * font's ToUnicode CMap stream (FlateDecode or raw), reads its
  * `begincodespacerange`/`beginbfchar`/`beginbfrange` entries
  * (array and incremented-range destinations, UTF-16BE values), and
  * resolves page `/Resources → /Font` name→font maps so that a
  * `/F1 12 Tf` inside a content stream selects the right CMap for
  * the show-string bytes that follow (the font selection persists
  * across BT blocks within a stream, per the graphics state). A
  * content stream not reachable from a page falls back to the union
  * of all font resource dicts. Since round 15 the object walk also
  * EXPANDS `/Type /ObjStm` object streams (PDF 1.5+ cross-reference-
  * stream files keep their font/page/resource dictionaries deflated
  * inside these), so CMap resolution works on modern writers whose
  * dictionaries never appear as top-level `N G obj` text. Fonts WITHOUT a usable CMap (absent,
  * malformed, or over the 64k-entry cap) keep the latin1 tier —
  * fail-closed to the old contract, never a throw.
  *
  * Remaining honestly-documented bounds: fonts whose ToUnicode is
  * absent (pure Identity-H with no CMap) still emit raw code bytes,
  * and `Tf` operators between BT blocks are not tracked (real
  * writers set the font inside the text object). Undecodable or
  * over-`maxOut` streams are SKIPPED and counted, not fatal: output
  * struct `(text, n_streams, n_decoded)` lets a pipeline gate on
  * `n_decoded < n_streams`. Non-PDF payloads (no `%PDF-` magic)
  * yield a null struct. The walk is bounded by `maxStreams`.
  * Per-row bounded work, zero shuffle, codegen'd. */
case class PdfTextExtract(child: Expression, maxStreams: Int, maxOut: Int)
    extends UnaryExpression {
  require(maxStreams > 0, "stream walk bound must be positive")
  require(maxOut > 0, "output cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pdf_text expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_streams", LongType, nullable = false),
    StructField("n_decoded", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    PdfTextExtract.compute(a.asInstanceOf[Array[Byte]], maxStreams, maxOut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PdfTextExtract.compute($c, $maxStreams, $maxOut);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pdf_text"
}

object PdfTextExtract {

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], maxStreams: Int,
              maxOut: Int): InternalRow = {
    if (bytes.length < 5 || bytes(0) != '%' || bytes(1) != 'P' ||
      bytes(2) != 'D' || bytes(3) != 'F' || bytes(4) != '-') return null
    val doc = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    // the CMap environment is built ONLY when the document mentions
    // ToUnicode — the common simple-PDF path pays one indexOf
    val env: FontEnv =
      // /ToUnicode may itself be INSIDE a deflated /ObjStm, so the
      // cheap gate must fire on either token
      if (doc.contains("/ToUnicode") || doc.contains("/ObjStm"))
        buildFontEnv(doc, maxStreams, maxOut)
      else null
    val out = new java.lang.StringBuilder
    var nStreams = 0L
    var nDecoded = 0L
    var pos = 0
    var steps = 0
    while (steps < maxStreams) {
      steps += 1
      val sk = doc.indexOf("stream", pos)
      if (sk < 0) {
        val txt = out.toString
        return new GenericInternalRow(Array[Any](
          UTF8String.fromString(txt), nStreams, nDecoded))
      }
      // require the keyword form: "stream" followed by \r\n or \n
      val dataStart =
        if (doc.startsWith("stream\r\n", sk)) sk + 8
        else if (doc.startsWith("stream\n", sk)) sk + 7
        else -1
      // "endstream" contains "stream" — skip keyword hits that are not
      // a stream opener (also covers "stream" inside string data)
      if (dataStart < 0) { pos = sk + 6 }
      else {
        nStreams += 1
        val end = doc.indexOf("endstream", dataStart)
        if (end < 0) {
          val txt = out.toString
          return new GenericInternalRow(Array[Any](
            UTF8String.fromString(txt), nStreams, nDecoded))
        }
        // raw data (strip one trailing EOL the writer put before the
        // endstream keyword)
        var dEnd = end
        if (dEnd > dataStart && doc.charAt(dEnd - 1) == '\n') dEnd -= 1
        if (dEnd > dataStart && doc.charAt(dEnd - 1) == '\r') dEnd -= 1
        // the dict governing this stream: backwards balanced <</>> scan
        // finds the OUTER opener — a plain lastIndexOf("<<") would stop
        // at a nested dict (/DecodeParms << … >>) and miss /FlateDecode
        val dictStart = dictStartBefore(doc, sk)
        val dict = if (dictStart >= 0) doc.substring(dictStart, sk) else ""
        val flate = dict.contains("/FlateDecode")
        val data = doc.substring(dataStart, dEnd)
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        val content: String =
          if (!flate)
            new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
          else inflateZlib(data, maxOut) match {
            case null => null
            case b =>
              new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
          }
        if (content != null) {
          nDecoded += 1
          val fonts = if (env == null) null else env.fontsFor(dataStart)
          val t = extractShownText(content, fonts)
          if (t.nonEmpty) {
            if (out.length > 0) out.append('\n')
            out.append(t)
          }
        }
        pos = end + 9
      }
    }
    // stream-walk bound exhausted: report what was decoded so far —
    // the n_streams/n_decoded pair shows the truncation
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(out.toString), nStreams, nDecoded))
  }

  /** Start index of the stream dict governing the keyword at `sk`:
    * the first `>>` scanning backwards is the governing dict's closer;
    * balancing `>>`/`<<` pairs from there finds ITS opener, so nested
    * dictionaries (e.g. `/DecodeParms << … >>` after `/Filter`)
    * resolve to the OUTER opener, not the innermost `<<`. A `<<` hit
    * at depth 0 (unterminated dict) is the opener directly. -1 if
    * none found. */
  private def dictStartBefore(doc: String, sk: Int): Int = {
    var i = sk - 2
    var depth = 0
    while (i >= 0) {
      val c = doc.charAt(i)
      if (c == '>' && doc.charAt(i + 1) == '>') { depth += 1; i -= 2 }
      else if (c == '<' && doc.charAt(i + 1) == '<') {
        if (depth == 0) return i
        depth -= 1
        if (depth == 0) return i
        i -= 2
      } else i -= 1
    }
    -1
  }

  /** zlib inflate with the [[GunzipPayload]] cap discipline. */
  private def inflateZlib(data: Array[Byte], maxOut: Int): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      var out = new Array[Byte](math.min(maxOut,
        math.max(64, data.length * 4)))
      var total = 0
      while (!inf.finished()) {
        if (total == out.length) {
          if (out.length >= maxOut) return null
          out = java.util.Arrays.copyOf(out, math.min(maxOut, out.length * 2))
        }
        val got = inf.inflate(out, total, out.length - total)
        if (got == 0 && !inf.finished()) return null
        total += got
        if (total > maxOut) return null
      }
      java.util.Arrays.copyOf(out, total)
    } catch {
      case _: DataFormatException => null
    } finally inf.end()
  }

  /** Shown strings of one content stream under the joining contract.
    * `fonts` (nullable) maps font resource names to their ToUnicode
    * CMaps; a `/Name … Tf` selects, show-string bytes map through the
    * selection, fonts without a CMap keep latin1. */
  private def extractShownText(
      s: String, fonts: java.util.HashMap[String, UCMap]): String = {
    val n = s.length
    val blocks = new java.lang.StringBuilder
    var i = 0
    // graphics state persists across BT blocks within one stream
    var lastName: String = null
    var cm: UCMap = null
    while (i < n) {
      val bt = s.indexOf("BT", i)
      if (bt < 0) return blocks.toString
      val et = s.indexOf("ET", bt + 2)
      val blockEnd = if (et < 0) n else et
      val block = new java.lang.StringBuilder
      var j = bt + 2
      // pending holds the strings of the most recent literal/hex/array
      // until the operator that follows decides whether they are shown
      var pending: String = null
      def flush(): Unit = {
        if (pending != null) {
          val shown = if (cm != null) cm.mapString(pending) else pending
          if (block.length > 0) block.append(' ')
          block.append(shown)
        }
        pending = null
      }
      while (j < blockEnd) {
        val c = s.charAt(j)
        if (c == '(') {
          val (str, nj) = parseLiteral(s, j, blockEnd)
          pending = str; j = nj
        } else if (c == '<' &&
          (j + 1 >= blockEnd || s.charAt(j + 1) != '<')) {
          val (str, nj) = parseHex(s, j, blockEnd)
          pending = str; j = nj
        } else if (c == '[') {
          val (str, nj) = parseArray(s, j, blockEnd)
          pending = str; j = nj
        } else if (c == '/' && fonts != null) {
          val sb = new java.lang.StringBuilder
          var k = j + 1
          while (k < blockEnd && isRegular(s.charAt(k))) {
            sb.append(s.charAt(k)); k += 1
          }
          lastName = sb.toString; j = k
        } else if (c == 'T' && j + 1 < blockEnd &&
          (s.charAt(j + 1) == 'j' || s.charAt(j + 1) == 'J')) {
          flush(); j += 2
        } else if (c == 'T' && j + 1 < blockEnd && s.charAt(j + 1) == 'f' &&
          fonts != null) {
          cm = if (lastName == null) null else fonts.get(lastName)
          j += 2
        } else if (c == '\'' || c == '"') {
          flush(); j += 1
        } else j += 1
      }
      if (block.length > 0) {
        if (blocks.length > 0) blocks.append('\n')
        blocks.append(block)
      }
      i = if (et < 0) n else et + 2
    }
    blocks.toString
  }

  /** PDF "regular" character: not whitespace, not a delimiter. */
  private def isRegular(c: Char): Boolean =
    !c.isWhitespace && c != '(' && c != ')' && c != '<' && c != '>' &&
      c != '[' && c != ']' && c != '{' && c != '}' && c != '/' && c != '%'

  /** PDF literal string at s(i) == '(' → (content, index past ')'). */
  private def parseLiteral(s: String, i0: Int, end: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var depth = 1
    var i = i0 + 1
    while (i < end && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < end) {
        val e = s.charAt(i + 1)
        e match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\n' => i += 2 // line continuation
          case '\r' =>
            i += 2; if (i < end && s.charAt(i) == '\n') i += 1
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < end && s.charAt(i) >= '0' &&
              s.charAt(i) <= '7') { v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1 }
            sb.append(v.toChar)
          case other => sb.append(other); i += 2 // unknown escape: literal
        }
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) sb.append(c)
        i += 1
      } else { sb.append(c); i += 1 }
    }
    (sb.toString, i)
  }

  /** PDF hex string at s(i) == '<' → (content, index past '>'). */
  private def parseHex(s: String, i0: Int, end: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var i = i0 + 1
    var hi = -1
    while (i < end && s.charAt(i) != '>') {
      val c = s.charAt(i)
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else -1
      if (v >= 0) {
        if (hi < 0) hi = v
        else { sb.append(((hi << 4) | v).toChar); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) sb.append((hi << 4).toChar) // odd count: low nibble 0
    (sb.toString, math.min(i + 1, end))
  }

  /** TJ array at s(i) == '[': strings concatenated, numbers ignored. */
  private def parseArray(s: String, i0: Int, end: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var i = i0 + 1
    while (i < end && s.charAt(i) != ']') {
      val c = s.charAt(i)
      if (c == '(') {
        val (str, nj) = parseLiteral(s, i, end); sb.append(str); i = nj
      } else if (c == '<') {
        val (str, nj) = parseHex(s, i, end); sb.append(str); i = nj
      } else i += 1
    }
    (sb.toString, math.min(i + 1, end))
  }

  /** A parsed ToUnicode CMap: codespace ranges pick the code width at
    * each position, per-width hash maps carry code → UTF-16 text.
    * Unmapped codes emit U+FFFD (visible, greppable data loss — never
    * a silent drop). */
  private[functions] final class UCMap {
    // (width, lo, hi) codespace ranges, widths 1..4
    var ranges: Array[Array[Long]] = Array.empty
    val byWidth: Array[java.util.HashMap[java.lang.Long, String]] =
      Array.fill(5)(new java.util.HashMap[java.lang.Long, String]())
    var entries = 0

    private def codeAt(s: String, i: Int, w: Int): Long = {
      var v = 0L
      var k = 0
      while (k < w) { v = (v << 8) | (s.charAt(i + k) & 0xffL); k += 1 }
      v
    }

    private def widthAt(s: String, i: Int): Int = {
      // a codespace range matching the next bytes decides the width
      var w = 1
      while (w <= 4) {
        if (i + w <= s.length) {
          val code = codeAt(s, i, w)
          var r = 0
          while (r < ranges.length) {
            if (ranges(r)(0) == w && code >= ranges(r)(1) &&
              code <= ranges(r)(2)) return w
            r += 1
          }
        }
        w += 1
      }
      // no codespace hit: first width with a mapped entry
      w = 1
      while (w <= 4) {
        if (i + w <= s.length &&
          byWidth(w).containsKey(codeAt(s, i, w))) return w
        w += 1
      }
      1
    }

    def mapString(raw: String): String = {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < raw.length) {
        val w = math.min(widthAt(raw, i), raw.length - i)
        val m = byWidth(w).get(codeAt(raw, i, w))
        if (m != null) sb.append(m) else sb.append('�')
        i += w
      }
      sb.toString
    }
  }

  /** Parse a ToUnicode CMap's text. Null for malformed or over-cap
    * content — the caller keeps the latin1 tier for that font. */
  private[functions] def parseCMap(text: String): UCMap = {
    val MaxEntries = 1 << 16
    val m = new UCMap
    val n = text.length
    // token reader: hex strings and arrays at a moving cursor
    var i = 0
    def skipWs(): Unit =
      while (i < n && text.charAt(i).isWhitespace) i += 1
    def atChar(c: Char): Boolean = { skipWs(); i < n && text.charAt(i) == c }
    def readHex(): String = {
      val (s2, nj) = parseHex(text, i, n)
      i = nj
      s2
    }
    def utf16(dst: String): String = {
      if (dst.length % 2 != 0) return null
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < dst.length) {
        sb.append((((dst.charAt(k) & 0xff) << 8) |
          (dst.charAt(k + 1) & 0xff)).toChar)
        k += 2
      }
      sb.toString
    }
    def put(w: Int, code: Long, v: String): Boolean = {
      if (w < 1 || w > 4 || m.entries >= MaxEntries) return false
      m.byWidth(w).put(code, v)
      m.entries += 1
      true
    }
    def codeOf(hexStr: String): Long = {
      var v = 0L
      var k = 0
      while (k < hexStr.length) { v = (v << 8) | (hexStr.charAt(k) & 0xffL); k += 1 }
      v
    }
    // codespace ranges
    val rbuf = new scala.collection.mutable.ArrayBuffer[Array[Long]]
    var from = 0
    var blk = text.indexOf("begincodespacerange", from)
    while (blk >= 0) {
      i = blk + "begincodespacerange".length
      while (atChar('<')) {
        val lo = readHex()
        if (!atChar('<')) return null
        val hi = readHex()
        if (lo.length != hi.length || lo.isEmpty || lo.length > 4) return null
        rbuf += Array(lo.length.toLong, codeOf(lo), codeOf(hi))
      }
      from = i
      blk = text.indexOf("begincodespacerange", from)
    }
    m.ranges = rbuf.toArray
    // bfchar blocks: <src> <dst> pairs
    from = 0
    blk = text.indexOf("beginbfchar", from)
    while (blk >= 0) {
      i = blk + "beginbfchar".length
      while (atChar('<')) {
        val src = readHex()
        if (!atChar('<')) return null
        val dst = utf16(readHex())
        if (dst == null || src.isEmpty || src.length > 4) return null
        if (!put(src.length, codeOf(src), dst)) return null
      }
      from = i
      blk = text.indexOf("beginbfchar", from)
    }
    // bfrange blocks: <lo> <hi> (<dst> | [<d1> … <dn>])
    from = 0
    blk = text.indexOf("beginbfrange", from)
    while (blk >= 0) {
      i = blk + "beginbfrange".length
      while (atChar('<')) {
        val lo = readHex()
        if (!atChar('<')) return null
        val hi = readHex()
        if (lo.length != hi.length || lo.isEmpty || lo.length > 4) return null
        val w = lo.length
        val loC = codeOf(lo)
        val hiC = codeOf(hi)
        if (hiC < loC || hiC - loC >= MaxEntries) return null
        if (atChar('[')) {
          i += 1 // past '['
          var code = loC
          while (atChar('<')) {
            val dst = utf16(readHex())
            if (dst == null || code > hiC) return null
            if (!put(w, code, dst)) return null
            code += 1
          }
          if (!atChar(']')) return null
          i += 1
        } else if (atChar('<')) {
          val dst = utf16(readHex())
          if (dst == null) return null
          var off = 0L
          while (loC + off <= hiC) {
            // the spec increments the LAST code unit of the value
            val v =
              if (dst.isEmpty) ""
              else dst.substring(0, dst.length - 1) +
                (dst.charAt(dst.length - 1) + off).toChar
            if (!put(w, loC + off, v)) return null
            off += 1
          }
        } else return null
      }
      from = i
      blk = text.indexOf("beginbfrange", from)
    }
    if (m.entries == 0) null else m
  }

  /** One indirect object: number, its dict text, body bounds, and
    * (when present) the raw stream-data bounds within the doc. */
  private final class ObjInfo(val num: Int, val dict: String,
                              val bodyStart: Int, val bodyEnd: Int,
                              val streamStart: Int, val streamEnd: Int)

  /** Balanced `<< … >>` forward scan → index AFTER the closing `>>`
    * (or `end` when unterminated). */
  private def dictEndFrom(doc: String, ds: Int, end: Int): Int = {
    var i = ds
    var depth = 0
    while (i + 1 < end) {
      if (doc.charAt(i) == '<' && doc.charAt(i + 1) == '<') {
        depth += 1; i += 2
      } else if (doc.charAt(i) == '>' && doc.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return i
      } else i += 1
    }
    end
  }

  /** Walk `N G obj … endobj` objects. Bounded by `maxObjs`. */
  private def parseObjects(doc: String, maxObjs: Int): Array[ObjInfo] = {
    val out = new scala.collection.mutable.ArrayBuffer[ObjInfo]
    var pos = 0
    var steps = 0
    while (steps < maxObjs) {
      steps += 1
      val k = doc.indexOf("obj", pos)
      if (k < 0) return out.toArray
      val after = k + 3
      // boundary: "obj" must be its own token ("endobj" has 'd' before)
      val okAfter = after >= doc.length || !isRegular(doc.charAt(after))
      var num = -1
      if (okAfter) {
        var i = k - 1
        while (i >= 0 && (doc.charAt(i) == ' ' || doc.charAt(i) == '\r' ||
          doc.charAt(i) == '\n' || doc.charAt(i) == '\t')) i -= 1
        var genEnd = i
        while (i >= 0 && doc.charAt(i).isDigit) i -= 1
        val genStart = i + 1
        if (genEnd >= genStart) {
          while (i >= 0 && (doc.charAt(i) == ' ' || doc.charAt(i) == '\r' ||
            doc.charAt(i) == '\n' || doc.charAt(i) == '\t')) i -= 1
          var numEnd = i
          while (i >= 0 && doc.charAt(i).isDigit) i -= 1
          val numStart = i + 1
          if (numEnd >= numStart && numEnd - numStart < 9)
            num = Integer.parseInt(doc.substring(numStart, numEnd + 1))
        }
      }
      if (num < 0) pos = after
      else {
        val endobj = doc.indexOf("endobj", after)
        val bodyEnd = if (endobj < 0) doc.length else endobj
        val ds = doc.indexOf("<<", after)
        val dict =
          if (ds >= 0 && ds < bodyEnd)
            doc.substring(ds, dictEndFrom(doc, ds, bodyEnd))
          else ""
        var sStart = -1
        var sEnd = -1
        val sk = doc.indexOf("stream", after)
        if (sk >= 0 && sk < bodyEnd) {
          val dataStart =
            if (doc.startsWith("stream\r\n", sk)) sk + 8
            else if (doc.startsWith("stream\n", sk)) sk + 7
            else -1
          if (dataStart >= 0) {
            val e = doc.indexOf("endstream", dataStart)
            if (e >= 0) {
              var dEnd = e
              if (dEnd > dataStart && doc.charAt(dEnd - 1) == '\n') dEnd -= 1
              if (dEnd > dataStart && doc.charAt(dEnd - 1) == '\r') dEnd -= 1
              sStart = dataStart
              sEnd = dEnd
            }
          }
        }
        out += new ObjInfo(num, dict, after, bodyEnd, sStart, sEnd)
        pos = bodyEnd + 6
      }
    }
    out.toArray
  }

  /** Resolved font environment: per-content-stream and global font
    * name → CMap maps; `fontsFor(pos)` answers for the stream whose
    * data starts at `pos`. */
  private final class FontEnv(
      objs: Array[ObjInfo],
      byContent: java.util.HashMap[Integer,
        java.util.HashMap[String, UCMap]],
      global: java.util.HashMap[String, UCMap]) {
    def fontsFor(dataStart: Int): java.util.HashMap[String, UCMap] = {
      var i = 0
      while (i < objs.length) {
        val o = objs(i)
        if (o.streamStart == dataStart) {
          val m = byContent.get(o.num)
          return if (m != null) m else global
        }
        i += 1
      }
      global
    }
  }

  /** Next `N G R` indirect reference after position `at` in `dict`,
    * or -1 when the value there is not a reference. */
  private def refAt(dict: String, at: Int): Int = {
    var i = at
    val n = dict.length
    while (i < n && dict.charAt(i).isWhitespace) i += 1
    val numStart = i
    while (i < n && dict.charAt(i).isDigit) i += 1
    if (i == numStart || i - numStart > 8) return -1
    val num = Integer.parseInt(dict.substring(numStart, i))
    while (i < n && dict.charAt(i).isWhitespace) i += 1
    val genStart = i
    while (i < n && dict.charAt(i).isDigit) i += 1
    if (i == genStart) return -1
    while (i < n && dict.charAt(i).isWhitespace) i += 1
    if (i < n && dict.charAt(i) == 'R') num else -1
  }

  /** Value position after `/Key` in `dict` (token-boundary match). */
  private def keyValueAt(dict: String, key: String): Int = {
    var from = 0
    var k = dict.indexOf(key, from)
    while (k >= 0) {
      val after = k + key.length
      if (after >= dict.length || !isRegular(dict.charAt(after))) return after
      from = k + 1
      k = dict.indexOf(key, from)
    }
    -1
  }

  /** `/Font` name→ref pairs of a resource-font dict's text. */
  private def fontPairs(fontDict: String)
      : scala.collection.mutable.ArrayBuffer[(String, Int)] = {
    val out = new scala.collection.mutable.ArrayBuffer[(String, Int)]
    var i = 0
    val n = fontDict.length
    while (i < n) {
      if (fontDict.charAt(i) == '/') {
        val sb = new java.lang.StringBuilder
        var k = i + 1
        while (k < n && isRegular(fontDict.charAt(k))) {
          sb.append(fontDict.charAt(k)); k += 1
        }
        val r = refAt(fontDict, k)
        if (r >= 0 && sb.length > 0) out += ((sb.toString, r))
        i = k
      } else i += 1
    }
    out
  }

  /** Build the CMap environment: decode every font's ToUnicode
    * stream, then resolve page `/Resources → /Font` maps onto the
    * pages' content-stream objects. Null when nothing usable. */
  /** Integer value right after `/Key` in `dict`, or -1. */
  private def intValueAt(dict: String, key: String): Int = {
    val at = keyValueAt(dict, key)
    if (at < 0) return -1
    var i = at
    while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
    val s = i
    while (i < dict.length && dict.charAt(i).isDigit) i += 1
    if (i == s || i - s > 8) -1 else Integer.parseInt(dict.substring(s, i))
  }

  /** Expand `/Type /ObjStm` object streams (PDF 1.5+ — the place
    * modern writers put their font, page and resource DICTIONARIES,
    * which the top-level `N G obj` walk cannot see): decode the
    * stream, read the `/N` objnum/offset header pairs, and surface
    * each contained object as a synthetic dict-only [[ObjInfo]]
    * (streams cannot live inside an ObjStm, so `streamStart = -1`).
    * Top-level objects win number collisions. Bounded by `maxObjs`
    * contained objects total and `maxOut` decoded bytes per stream. */
  private def expandObjStms(doc: String, objs: Array[ObjInfo],
                            maxObjs: Int, maxOut: Int): Array[ObjInfo] = {
    var extra: scala.collection.mutable.ArrayBuffer[ObjInfo] = null
    var budget = maxObjs
    for (o <- objs) {
      if (o.streamStart >= 0 && keyValueAt(o.dict, "/ObjStm") >= 0 &&
        budget > 0) {
        val n = intValueAt(o.dict, "/N")
        val first = intValueAt(o.dict, "/First")
        if (n > 0 && n <= budget && first >= 0) {
          val data = doc.substring(o.streamStart, o.streamEnd)
            .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val text =
            if (o.dict.contains("/FlateDecode"))
              inflateZlib(data, maxOut) match {
                case null => null
                case b => new String(b,
                  java.nio.charset.StandardCharsets.ISO_8859_1)
              }
            else new String(data,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          if (text != null && first <= text.length) {
            // header: N whitespace-separated "objnum offset" pairs
            val nums = new Array[Int](n)
            val offs = new Array[Int](n)
            var p = 0
            var k = 0
            var ok = true
            while (k < 2 * n && ok) {
              while (p < first && text.charAt(p).isWhitespace) p += 1
              val s = p
              while (p < first && text.charAt(p).isDigit) p += 1
              if (p == s || p - s > 9) ok = false
              else {
                val v = Integer.parseInt(text.substring(s, p))
                if ((k & 1) == 0) nums(k >> 1) = v else offs(k >> 1) = v
                k += 1
              }
            }
            if (ok) {
              if (extra == null)
                extra = new scala.collection.mutable.ArrayBuffer[ObjInfo]
              var i = 0
              while (i < n) {
                val start = first.toLong + offs(i)
                val end =
                  if (i + 1 < n) math.min(first.toLong + offs(i + 1),
                    text.length.toLong)
                  else text.length.toLong
                if (start >= 0 && start <= end && end <= text.length) {
                  val body = text.substring(start.toInt, end.toInt)
                  val ds = body.indexOf("<<")
                  val dict =
                    if (ds >= 0)
                      body.substring(ds, dictEndFrom(body, ds, body.length))
                    else ""
                  extra += new ObjInfo(nums(i), dict, -1, -1, -1, -1)
                  budget -= 1
                }
                i += 1
              }
            }
          }
        }
      }
    }
    if (extra == null) objs else objs ++ extra
  }

  private def buildFontEnv(doc: String, maxObjs: Int,
                           maxOut: Int): FontEnv = {
    try {
      val top = parseObjects(doc, maxObjs)
      if (top.isEmpty) return null
      val objs = expandObjStms(doc, top, maxObjs, maxOut)
      val byNum = new java.util.HashMap[Integer, ObjInfo]()
      for (o <- objs) // top-level objects win number collisions
        if (!byNum.containsKey(o.num)) byNum.put(o.num, o)
      // font object → CMap
      val fontCmaps = new java.util.HashMap[Integer, UCMap]()
      for (o <- objs) {
        val at = keyValueAt(o.dict, "/ToUnicode")
        if (at >= 0) {
          val ref = refAt(o.dict, at)
          val cm = byNum.get(ref)
          if (cm != null && cm.streamStart >= 0) {
            val data = doc.substring(cm.streamStart, cm.streamEnd)
              .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
            val text =
              if (cm.dict.contains("/FlateDecode"))
                inflateZlib(data, maxOut) match {
                  case null => null
                  case b => new String(b,
                    java.nio.charset.StandardCharsets.ISO_8859_1)
                }
              else new String(data,
                java.nio.charset.StandardCharsets.ISO_8859_1)
            if (text != null) {
              val parsed = parseCMap(text)
              if (parsed != null) fontCmaps.put(o.num, parsed)
            }
          }
        }
      }
      if (fontCmaps.isEmpty) return null
      // resolve /Font dicts (inline or referenced) to name→CMap; keep
      // a first-wins global union as the orphan-stream fallback
      val global = new java.util.HashMap[String, UCMap]()
      def resolveFontMap(dict: String, at: Int)
          : java.util.HashMap[String, UCMap] = {
        var i = at
        while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
        val src =
          if (i + 1 < dict.length && dict.charAt(i) == '<' &&
            dict.charAt(i + 1) == '<')
            dict.substring(i, dictEndFrom(dict, i, dict.length))
          else {
            val r = refAt(dict, i)
            val o = if (r >= 0) byNum.get(r) else null
            if (o == null) return null
            o.dict
          }
        val out = new java.util.HashMap[String, UCMap]()
        for ((name, ref) <- fontPairs(src)) {
          val cm = fontCmaps.get(ref)
          if (cm != null) {
            out.put(name, cm)
            if (!global.containsKey(name)) global.put(name, cm)
          }
        }
        if (out.isEmpty) null else out
      }
      // global union first (first wins) — any dict carrying a /Font
      // map contributes, so orphan streams still resolve
      for (o <- objs) {
        val fat = keyValueAt(o.dict, "/Font")
        if (fat >= 0) resolveFontMap(o.dict, fat)
      }
      val byContent = new java.util.HashMap[Integer,
        java.util.HashMap[String, UCMap]]()
      for (o <- objs) {
        // a Page (not Pages: next char after "/Page" must end the
        // token) with /Resources and /Contents
        val tp = keyValueAt(o.dict, "/Page")
        if (tp >= 0) {
          val res = keyValueAt(o.dict, "/Resources")
          val cts = keyValueAt(o.dict, "/Contents")
          if (res >= 0 && cts >= 0) {
            var fm: java.util.HashMap[String, UCMap] = null
            locally {
              var i = res
              while (i < o.dict.length && o.dict.charAt(i).isWhitespace)
                i += 1
              // resources inline or via ref; /Font within likewise
              val rsrc =
                if (i + 1 < o.dict.length && o.dict.charAt(i) == '<' &&
                  o.dict.charAt(i + 1) == '<')
                  o.dict.substring(i, dictEndFrom(o.dict, i, o.dict.length))
                else {
                  val r = refAt(o.dict, i)
                  val ro = if (r >= 0) byNum.get(r) else null
                  if (ro == null) "" else ro.dict
                }
              val fat = keyValueAt(rsrc, "/Font")
              if (fat >= 0) fm = resolveFontMap(rsrc, fat)
            }
            if (fm != null) {
              // contents: one ref or an array of refs
              var i = cts
              while (i < o.dict.length && o.dict.charAt(i).isWhitespace)
                i += 1
              if (i < o.dict.length && o.dict.charAt(i) == '[') {
                var j = i + 1
                while (j < o.dict.length && o.dict.charAt(j) != ']') {
                  val r = refAt(o.dict, j)
                  if (r >= 0) {
                    byContent.put(r, fm)
                    // skip past this "N G R" triple
                    while (j < o.dict.length && o.dict.charAt(j) != 'R')
                      j += 1
                  }
                  j += 1
                }
              } else {
                val r = refAt(o.dict, i)
                if (r >= 0) byContent.put(r, fm)
              }
            }
          }
        }
      }
      new FontEnv(objs, byContent, global)
    } catch {
      case _: RuntimeException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; defaults: 4096 streams, 16 MiB each. */
  def apply(payload: Column, maxStreams: Int = 4096,
            maxOut: Int = 1 << 24): Column =
    ColumnShim.column(
      PdfTextExtract(ColumnShim.expression(payload), maxStreams, maxOut))
}
