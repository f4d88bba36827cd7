package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RTF text extraction — the THIRD legacy document format of a mixed
  * lake (after `.doc`/OOXML): a real tokenizer over the public RTF
  * spec, not a regex chain (RTF nests groups and re-binds state, so
  * regexes cannot strip it faithfully):
  *
  *  - control words parsed with their optional numeric parameter and
  *    the spec's single-space delimiter swallow;
  *  - destination groups DROPPED whole: `fonttbl`, `colortbl`,
  *    `stylesheet`, `info`, `pict`, `object`, `header`/`footer`
  *    variants, `footnote`, and every `{\*\…}` unknown destination —
  *    the spec's own forward-compat rule;
  *  - `\par`/`\line`/`\sect`/`\page` → newline, `\tab`/`\cell` →
  *    tab, `\row` → newline, `\emdash`/`\endash`/quote words → their
  *    characters, `\~` → space, escaped `\\ \{ \}` literal;
  *  - `\'xx` hex escapes decode as cp1252 (the `\ansi` default that
  *    covers real archives);
  *  - `\uN` unicode escapes emit their code point (negative N +
  *    65536 per the spec) and swallow the following `\ucN`-many
  *    fallback characters (default 1);
  *  - group nesting tracks the `\uc` state with proper save/restore.
  *
  * FAIL-CLOSED NULL on: payloads not starting `{\rtf`, unbalanced
  * groups, output past `maxOut`. Per-row bounded single pass, zero
  * shuffle, codegen'd. */
case class RtfText(child: Expression, maxOut: Int)
    extends UnaryExpression {
  require(maxOut > 0, "output cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rtf_text expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    RtfText.compute(a.asInstanceOf[Array[Byte]], maxOut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.RtfText.compute($c, $maxOut);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "rtf_text"
}

object RtfText {

  private object Bad extends Exception with scala.util.control.NoStackTrace

  private val SkipDests = Set("fonttbl", "colortbl", "stylesheet",
    "info", "pict", "object", "header", "footer", "headerl", "headerr",
    "headerf", "footerl", "footerr", "footerf", "footnote", "xe", "tc",
    "txe", "pn", "generator", "themedata", "colorschememapping",
    "latentstyles", "datastore", "listtable", "listoverridetable",
    "rsidtbl")

  private lazy val cp1252 = java.nio.charset.Charset.forName("windows-1252")

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], maxOut: Int): UTF8String = {
    try {
      val n = bytes.length
      if (n < 6 || bytes(0) != '{' || bytes(1) != '\\' ||
        bytes(2) != 'r' || bytes(3) != 't' || bytes(4) != 'f') return null
      val out = new java.lang.StringBuilder()
      var pos = 0
      var depth = 0
      var uc = 1 // unicode fallback count
      var skipDepth = -1 // when >= 0: inside a dropped destination
      var pendingUcSkip = 0
      // group state stack for uc
      val ucStack = new java.util.ArrayDeque[Integer]
      def emit(c: Char): Unit =
        if (skipDepth < 0) {
          if (out.length >= maxOut) throw Bad
          out.append(c)
        }
      def emitStr(s: String): Unit = {
        var i = 0
        while (i < s.length) { emit(s.charAt(i)); i += 1 }
      }
      while (pos < n) {
        val b = bytes(pos) & 0xff
        b match {
          case '{' =>
            depth += 1
            ucStack.push(uc)
            pos += 1
            // {\*\dest …}: the unknown-destination rule
            if (skipDepth < 0 && pos + 1 < n && bytes(pos) == '\\' &&
              bytes(pos + 1) == '*') skipDepth = depth
          case '}' =>
            if (depth == 0) throw Bad
            if (skipDepth == depth) skipDepth = -1
            if (pendingUcSkip > 0) pendingUcSkip = 0
            uc = if (ucStack.isEmpty) 1 else ucStack.pop().intValue()
            depth -= 1
            pos += 1
            // text after the final brace: tolerate trailing whitespace
            if (depth == 0) {
              var t = pos
              while (t < n) {
                val c = bytes(t) & 0xff
                if (c != '\r' && c != '\n' && c != ' ' && c != 0) throw Bad
                t += 1
              }
              pos = n
            }
          case '\\' =>
            if (pos + 1 >= n) throw Bad
            val c1 = bytes(pos + 1) & 0xff
            if (c1 == '\'') { // \'xx hex byte, cp1252
              if (pos + 3 >= n) throw Bad
              val hv = Integer.parseInt(
                new String(bytes, pos + 2, 2,
                  java.nio.charset.StandardCharsets.ISO_8859_1), 16)
              if (pendingUcSkip > 0) pendingUcSkip -= 1
              else emitStr(new String(Array(hv.toByte), cp1252))
              pos += 4
            } else if (c1 == '\\' || c1 == '{' || c1 == '}') {
              if (pendingUcSkip > 0) pendingUcSkip -= 1 else emit(c1.toChar)
              pos += 2
            } else if (c1 == '~') { emit(' '); pos += 2 }
            else if (c1 == '-' || c1 == '_' || c1 == ':') pos += 2 // soft
            else if (c1 == '\r' || c1 == '\n') { // \<newline> = \par
              emit('\n'); pos += 2
            } else if (c1 == '*') pos += 2 // handled at group open
            else if ((c1 >= 'a' && c1 <= 'z') || (c1 >= 'A' && c1 <= 'Z')) {
              // control word [letters][-][digits][one space]
              var p = pos + 1
              val w0 = p
              while (p < n && ((bytes(p) >= 'a' && bytes(p) <= 'z') ||
                (bytes(p) >= 'A' && bytes(p) <= 'Z'))) p += 1
              val word = new String(bytes, w0, p - w0,
                java.nio.charset.StandardCharsets.ISO_8859_1)
              var neg = false
              var num = 0L
              var hasNum = false
              if (p < n && bytes(p) == '-') { neg = true; p += 1 }
              while (p < n && bytes(p) >= '0' && bytes(p) <= '9') {
                num = num * 10 + (bytes(p) - '0')
                if (num > Int.MaxValue) throw Bad
                hasNum = true
                p += 1
              }
              if (p < n && bytes(p) == ' ') p += 1 // delimiter swallow
              val value = if (neg) -num else num
              word match {
                case "par" | "line" | "sect" | "page" | "row" => emit('\n')
                case "tab" | "cell" => emit('\t')
                case "emdash" => emit('—')
                case "endash" => emit('–')
                case "lquote" => emit('‘')
                case "rquote" => emit('’')
                case "ldblquote" => emit('“')
                case "rdblquote" => emit('”')
                case "bullet" => emit('•')
                case "uc" => uc = math.max(0, value.toInt)
                case "u" =>
                  if (pendingUcSkip > 0) pendingUcSkip -= 1
                  else {
                    val cp = if (value < 0) value + 65536 else value
                    if (cp >= 0 && cp <= 0xFFFF) emit(cp.toChar)
                    pendingUcSkip = uc
                  }
                case w if SkipDests.contains(w) =>
                  if (skipDepth < 0) skipDepth = depth
                case _ => () // unknown formatting word: ignore
              }
              pos = p
            } else pos += 2 // other control symbol: ignore
          case '\r' | '\n' | 0 => pos += 1 // raw newlines are not text
          case _ =>
            if (pendingUcSkip > 0) pendingUcSkip -= 1
            else if (b >= 0x80) // raw high bytes decode as cp1252
              emitStr(new String(Array(b.toByte), cp1252))
            else emit(b.toChar)
            pos += 1
        }
      }
      if (depth != 0) throw Bad // unbalanced groups
      UTF8String.fromString(out.toString)
    } catch {
      case Bad => null
      case _: NumberFormatException => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; `maxOut` defaults to 16 MiB chars. */
  def apply(payload: Column, maxOut: Int = 1 << 24): Column =
    ColumnShim.column(RtfText(ColumnShim.expression(payload), maxOut))
}
