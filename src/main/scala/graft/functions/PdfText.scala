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
  * SIMPLE-PDF TIER, honestly bounded: bytes decode latin1 (1:1), so
  * ASCII/WinAnsi text extracts exactly while CID/Unicode-CMap fonts
  * come out as their raw code bytes — real CMap resolution needs the
  * font dictionaries and is out of scope (same caveat class as
  * pdfMeta's census). Undecodable or over-`maxOut` streams are
  * SKIPPED and counted, not fatal: output struct
  * `(text, n_streams, n_decoded)` lets a pipeline gate on
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
          val t = extractShownText(content)
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

  /** Shown strings of one content stream under the joining contract. */
  private def extractShownText(s: String): String = {
    val n = s.length
    val blocks = new java.lang.StringBuilder
    var i = 0
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
        } else if (c == 'T' && j + 1 < blockEnd &&
          (s.charAt(j + 1) == 'j' || s.charAt(j + 1) == 'J')) {
          if (pending != null) {
            if (block.length > 0) block.append(' ')
            block.append(pending)
          }
          pending = null; j += 2
        } else if (c == '\'' || c == '"') {
          if (pending != null) {
            if (block.length > 0) block.append(' ')
            block.append(pending)
          }
          pending = null; j += 1
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

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; defaults: 4096 streams, 16 MiB each. */
  def apply(payload: Column, maxStreams: Int = 4096,
            maxOut: Int = 1 << 24): Column =
    ColumnShim.column(
      PdfTextExtract(ColumnShim.expression(payload), maxStreams, maxOut))
}
