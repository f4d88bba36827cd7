package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Legacy `.ppt` (PowerPoint 97–2003 binary, MS-PPT public spec)
  * TEXT extraction — the third legacy-Office decoder next to
  * [[DocTextExtract]] and [[XlsCells]]: the `PowerPoint Document`
  * stream extracts through [[CfbDirectory]]'s bounded FAT/miniFAT
  * walks, then the record tree walks depth-first — every record is
  * an 8-byte header (version/instance, type, length) whose version
  * nibble 0xF marks a CONTAINER of child records — collecting
  * `TextCharsAtom` (0x0FA0, UTF-16LE) and `TextBytesAtom` (0x0FA8,
  * low-byte units) paragraphs in stream order.
  *
  * Contract (documented, not guessed): stream order is the
  * presentation's save order — files saved normally carry one edit
  * and extract faithfully; a fast-saved file's superseded edits
  * would append their text too (resolving the UserEditAtom trail is
  * a deeper tier this one does not claim). PowerPoint's control
  * characters normalize the corpus way: CR and vertical tab →
  * newline.
  *
  * FAIL-CLOSED NULL on: anything [[CfbDirectory]] refuses, a payload
  * without a `PowerPoint Document` stream (a `.doc`/`.xls` census row
  * is not a deck), malformed record lengths, output past `maxOut`.
  * Per-row bounded work, zero shuffle, codegen'd. */
case class PptText(child: Expression, maxOut: Int)
    extends UnaryExpression {
  require(maxOut > 0, "output cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ppt_text expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    PptText.compute(a.asInstanceOf[Array[Byte]], maxOut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PptText.compute($c, $maxOut);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ppt_text"
}

object PptText {

  import CfbDirectory.{Bad, le16, le32}

  private final val TextCharsAtom = 0x0FA0
  private final val TextBytesAtom = 0x0FA8

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], maxOut: Int): UTF8String = {
    try {
      val cfb = CfbDirectory.parse(bytes, 1 << 16)
      val ppt = cfb.stream("PowerPoint Document", maxOut)
      if (ppt == null) return null
      val sb = new java.lang.StringBuilder()
      // depth-first record walk; container recVer nibble is 0xF.
      // Nesting in real decks is single digits — depth is HARD-CAPPED
      // so a malicious header chain cannot blow the JVM stack.
      def walk(from: Int, to: Int, depth: Int): Unit = {
        if (depth > 64) throw Bad
        var p = from
        while (p + 8 <= to) {
          val verInst = le16(ppt, p)
          val recType = le16(ppt, p + 2)
          val len = le32(ppt, p + 4)
          val d = p + 8
          if (len < 0 || d + len > to) throw Bad
          val end = (d + len).toInt
          if ((verInst & 0x0F) == 0x0F) walk(d, end, depth + 1)
          else if (recType == TextCharsAtom) {
            if ((len & 1) != 0) throw Bad
            if (sb.length + len / 2 > maxOut) throw Bad
            sb.append(new String(ppt, d, len.toInt,
              java.nio.charset.StandardCharsets.UTF_16LE))
            sb.append('\n')
          } else if (recType == TextBytesAtom) {
            if (sb.length + len > maxOut) throw Bad
            var i = 0
            while (i < len) { sb.append((ppt(d + i) & 0xff).toChar); i += 1 }
            sb.append('\n')
          }
          p = end
        }
        if (p != to) throw Bad // records tile their container exactly
      }
      walk(0, ppt.length, 0)
      // PowerPoint's CR / vertical-tab line breaks → newline
      val out = new java.lang.StringBuilder(sb.length)
      var i = 0
      while (i < sb.length) {
        val c = sb.charAt(i)
        if (c == '\r' || c == 0x0b) out.append('\n')
        else if (c == '\t' || c == '\n' || c >= 0x20) out.append(c)
        i += 1
      }
      UTF8String.fromString(out.toString)
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; `maxOut` defaults to 16 MiB. */
  def apply(payload: Column, maxOut: Int = 1 << 24): Column =
    ColumnShim.column(PptText(ColumnShim.expression(payload), maxOut))
}
