package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** OOXML worksheet cell-grid kernel — one native pass over a
  * `xl/worksheets/sheetN.xml` member (left) plus the workbook's
  * `xl/sharedStrings.xml` member (right, empty bytes when the
  * workbook has none) emitting `(row, col, value)` per valued cell.
  *
  * This replaces `Multimodal.xlsxCells`' former per-cell Catalyst
  * transform tree (regex splits, base-26 `aggregate`, a shared-pool
  * `try_element_at` and the entity-decode chain — several thousand
  * generated expression nodes whose codegen time dominated the query
  * at every scale factor) with ONE static call; semantics are
  * bit-identical to that tree:
  *
  *   - cells match `(?s)<c [^>]*[^/]>.*?</c>` (self-closing empties
  *     never emit), the `r="AA2"` reference splits into base-26
  *     column arithmetic (A=1, Z=26, AA=27) and the 1-based row
  *   - `t="s"` resolves 0-based through the shared-strings pool
  *     (`<si>` entries, each the concatenation of its `<t>` runs —
  *     rich-text entries one run per `<r>`); a bad or out-of-range
  *     index yields a NULL value, never a dropped row
  *   - `t="inlineStr"` concatenates the cell's own `<t>` runs;
  *     plain numeric/formula cells keep their `<v>` text verbatim
  *   - values entity-decode in the same one-pass left-to-right
  *     chain as `TextAnalysis.decodeEntities` (named lt/gt/quot/
  *     nbsp/amp, decimal + hex BMP references, surrogates and
  *     out-of-range codes kept literal)
  *
  * FAIL-CLOSED NULL when the sheet member is not valid UTF-8 (the
  * [[Utf8Text]] rules); a malformed or non-UTF-8 shared-strings
  * member degrades to an empty pool (`t="s"` values null) rather
  * than poisoning the sheet. Per-row bounded work, zero shuffle,
  * codegen'd. */
case class XlsxSheetCells(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: BinaryType, _: BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"xlsx_sheet_cells expects (binary, binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("row", LongType, nullable = true),
    StructField("col", LongType, nullable = false),
    StructField("value", StringType, nullable = true))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(x: Any, s: Any): Any =
    XlsxSheetCells.compute(x.asInstanceOf[Array[Byte]],
      s.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, s) => s"""
      ${ev.value} = graft.functions.XlsxSheetCells.compute($x, $s);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "xlsx_sheet_cells"
}

object XlsxSheetCells {

  // the EXACT patterns the former Catalyst tree used — matching
  // subtleties (attr patterns matching anywhere in the cell text,
  // the non-greedy body, one-space `<c `) are part of the contract
  private val CellPat = Pattern.compile("(?s)<c [^>]*[^/]>.*?</c>")
  private val RefPat = Pattern.compile("r=\"([A-Z]+)([0-9]+)\"")
  private val TypePat = Pattern.compile("t=\"([A-Za-z]+)\"")
  private val VPat = Pattern.compile("(?s)<v>(.*?)</v>")
  private val TPat = Pattern.compile("(?s)<t[^>]*>(.*?)</t>")
  private val SiPat = Pattern.compile("(?s)<si>(.*?)</si>")
  private val EntityPat = Pattern.compile(
    "&(lt|gt|quot|nbsp|amp);|&#[0-9]{1,7};|&#[xX][0-9a-fA-F]{1,6};")

  private def joinRuns(s: String): String = {
    val m = TPat.matcher(s)
    val sb = new java.lang.StringBuilder
    while (m.find()) sb.append(m.group(1))
    sb.toString
  }

  /** One decoded character reference, or the token itself when the
    * code point is outside 1..65535 or a surrogate (the
    * `TextAnalysis.decodeEntities` bmp() rule). */
  private def decodeOne(e: String): String = e match {
    case "&lt;" => "<"
    case "&gt;" => ">"
    case "&quot;" => "\""
    case "&nbsp;" => " "
    case "&amp;" => "&"
    case _ =>
      val code =
        if (e.charAt(2) == 'x' || e.charAt(2) == 'X')
          java.lang.Long.parseLong(e.substring(3, e.length - 1), 16)
        else java.lang.Long.parseLong(e.substring(2, e.length - 1))
      if (code >= 1L && code <= 65535L &&
        !(code >= 0xD800L && code <= 0xDFFFL)) String.valueOf(code.toChar)
      else e
  }

  /** The one-pass left-to-right entity decode — same matches, same
    * rebuild as the Catalyst chain. */
  def decodeEntities(s: String): String = {
    val m = EntityPat.matcher(s)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder
    var last = 0
    var more = true
    while (more) {
      sb.append(s, last, m.start())
      sb.append(decodeOne(m.group()))
      last = m.end()
      more = m.find()
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  /** The shared-strings pool: one entry per `<si>`, each the
    * concatenation of its `<t>` runs, ENTITY-RAW (decode happens per
    * emitted value). Invalid UTF-8 degrades to an empty pool. */
  private def parsePool(sstXml: Array[Byte]): Array[String] = {
    val s = Utf8Text.compute(sstXml)
    if (s == null) return Array.empty
    val m = SiPat.matcher(s.toString)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) buf += joinRuns(m.group(1))
    buf.toArray
  }

  /** `try_cast(int)` semantics: trimmed, optional sign, digits, an
    * ignored all-digit fraction; null on anything else or overflow. */
  private def tryCastInt(s0: String): Integer = {
    val s = s0.trim
    if (s.isEmpty) return null
    var i = 0
    var neg = false
    val c0 = s.charAt(0)
    if (c0 == '+' || c0 == '-') { neg = c0 == '-'; i = 1 }
    var v = 0L
    var seen = false
    while (i < s.length && s.charAt(i) != '.') {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return null
      v = v * 10 + (c - '0')
      seen = true
      if (v > Int.MaxValue.toLong + 1L) return null
      i += 1
    }
    if (!seen) return null
    if (i < s.length) { // fraction: digits only, truncated away
      i += 1
      while (i < s.length) {
        val c = s.charAt(i)
        if (c < '0' || c > '9') return null
        i += 1
      }
    }
    val r = if (neg) -v else v
    if (r < Int.MinValue || r > Int.MaxValue) null
    else Integer.valueOf(r.toInt)
  }

  /** The per-row kernel — public static so generated code can call
    * it. Null only when the sheet member is not valid UTF-8. */
  def compute(sheetXml: Array[Byte], sstXml: Array[Byte]): GenericArrayData = {
    val xmlS = Utf8Text.compute(sheetXml)
    if (xmlS == null) return null
    val xml = xmlS.toString
    val pool = parsePool(sstXml)
    val out = new java.util.ArrayList[Any]()
    val cm = CellPat.matcher(xml)
    while (cm.find()) {
      val cell = cm.group()
      val rm = RefPat.matcher(cell)
      if (rm.find()) {
        val letters = rm.group(1)
        val tm = TypePat.matcher(cell)
        val t = if (tm.find()) tm.group(1) else ""
        val vm = VPat.matcher(cell)
        val v = if (vm.find()) vm.group(1) else ""
        val raw: String =
          if (t == "s") {
            // try_cast int + 1-based try_element_at: bad or
            // out-of-range index -> null value, row still emitted
            val idx = tryCastInt(v)
            if (idx != null && idx >= 0 && idx < pool.length) pool(idx)
            else null
          } else if (t == "inlineStr") joinRuns(cell)
          else v
        val row: Any =
          try java.lang.Long.parseLong(rm.group(2))
          catch { case _: NumberFormatException => null }
        var colNum = 0L
        var i = 0
        while (i < letters.length) {
          colNum = colNum * 26L + (letters.charAt(i) - 64L)
          i += 1
        }
        out.add(new GenericInternalRow(Array[Any](row, colNum,
          if (raw == null) null
          else UTF8String.fromString(decodeEntities(raw)))))
      }
    }
    new GenericArrayData(out.toArray)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(sheetXml: Column, sstXml: Column): Column =
    ColumnShim.column(XlsxSheetCells(ColumnShim.expression(sheetXml),
      ColumnShim.expression(sstXml)))
}
