package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** OpenDocument spreadsheet cell GRID — `xlsxCells`/`XlsCells`' shape
  * for the LibreOffice tier (the `odfText` flattening loses the
  * row/column structure spreadsheet corpora exist for): one native
  * pass over a `.ods` package's `content.xml` emitting
  * `(sheet, row, col, value)` per valued cell, all 1-based.
  *
  *   - `table:table` elements number the sheets in document order
  *     (self-closing empty tables still advance the index)
  *   - `table:number-rows-repeated` / `table:number-columns-repeated`
  *     expand per the spec — a VALUED repeated cell emits one row per
  *     position; valueless runs (LibreOffice's huge trailing-empty
  *     repeats) only advance the counters, costing nothing
  *   - `table:covered-table-cell` (merge shadows) advance the column
  *     without emitting
  *   - a cell's value is its `office:value` attribute when present
  *     (the typed form), else its `text:p` paragraphs — inner spans
  *     stripped, entities decoded in the same one-pass chain as the
  *     xlsx kernel, paragraphs newline-joined; cells with neither
  *     emit nothing
  *
  * FAIL-CLOSED NULL when the member is not valid UTF-8 (the
  * [[Utf8Text]] rules) or the expansion would exceed `maxCells`
  * (repeat-bomb guard). Per-row bounded work, zero shuffle,
  * codegen'd. */
case class OdsCells(child: Expression, maxCells: Int)
    extends UnaryExpression {
  require(maxCells > 0, "cell cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ods_cells expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sheet", LongType, nullable = false),
    StructField("row", LongType, nullable = false),
    StructField("col", LongType, nullable = false),
    StructField("value", StringType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    OdsCells.compute(a.asInstanceOf[Array[Byte]], maxCells)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.OdsCells.compute($c, $maxCells);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ods_cells"
}

object OdsCells {

  private object Bad extends Exception with scala.util.control.NoStackTrace

  private val TablePat = Pattern.compile(
    "(?s)<table:table(?:/>|[ \\t\\r\\n>].*?</table:table>)")
  private val RowPat = Pattern.compile(
    "(?s)<table:table-row(?:[^>]*/>|[^>]*>.*?</table:table-row>)")
  private val CellPat = Pattern.compile(
    "(?s)<table:(covered-)?table-cell(?:[^>]*/>|[^>]*>.*?" +
      "</table:(?:covered-)?table-cell>)")
  private val RowRepPat = Pattern.compile(
    "table:number-rows-repeated=\"([0-9]+)\"")
  private val ColRepPat = Pattern.compile(
    "table:number-columns-repeated=\"([0-9]+)\"")
  private val ValuePat = Pattern.compile("office:value=\"([^\"]*)\"")
  private val ParaPat = Pattern.compile("(?s)<text:p[^>]*>(.*?)</text:p>")
  private val TagPat = Pattern.compile("<[^>]+>")

  /** The open tag of an element match (up to the first '>'). */
  private def openTag(el: String): String = {
    val g = el.indexOf('>')
    if (g < 0) el else el.substring(0, g + 1)
  }

  private def attrNum(tag: String, p: Pattern): Long = {
    val m = p.matcher(tag)
    if (!m.find()) 1L
    else {
      try {
        val v = java.lang.Long.parseLong(m.group(1))
        if (v < 1) 1L else v
      } catch { case _: NumberFormatException => throw Bad }
    }
  }

  /** The per-row kernel — public static so generated code can call
    * it. Null on invalid UTF-8 or a cell-cap breach. */
  def compute(contentXml: Array[Byte], maxCells: Int): GenericArrayData = {
    val xmlS = Utf8Text.compute(contentXml)
    if (xmlS == null) return null
    try {
      val xml = xmlS.toString
      val out = new java.util.ArrayList[Any]()
      val tm = TablePat.matcher(xml)
      var sheet = 0L
      while (tm.find()) {
        sheet += 1
        val table = tm.group()
        val rm = RowPat.matcher(table)
        var row = 0L
        while (rm.find()) {
          val rowEl = rm.group()
          val rowRep = attrNum(openTag(rowEl), RowRepPat)
          // parse the row's cells ONCE; replay per repeated row index
          val cells = new scala.collection.mutable.ArrayBuffer[(Long, String)]
          var col = 1L
          val cm = CellPat.matcher(rowEl)
          while (cm.find()) {
            val cellEl = cm.group()
            val covered = cm.group(1) != null
            val tag = openTag(cellEl)
            val colRep = attrNum(tag, ColRepPat)
            if (!covered) {
              val vm = ValuePat.matcher(tag)
              val value: String =
                if (vm.find()) XlsxSheetCells.decodeEntities(vm.group(1))
                else {
                  val pm = ParaPat.matcher(cellEl)
                  var sb: java.lang.StringBuilder = null
                  while (pm.find()) {
                    if (sb == null) sb = new java.lang.StringBuilder
                    else sb.append('\n')
                    sb.append(XlsxSheetCells.decodeEntities(
                      TagPat.matcher(pm.group(1)).replaceAll("")))
                  }
                  if (sb == null) null else sb.toString
                }
              if (value != null) {
                var k = 0L
                while (k < colRep) {
                  if ((out.size + cells.length) >= maxCells) throw Bad
                  cells += ((col + k, value))
                  k += 1
                }
              }
            }
            col += colRep
          }
          if (cells.isEmpty) row += rowRep // valueless repeat: free skip
          else {
            var r = 0L
            while (r < rowRep) {
              row += 1
              if (out.size + cells.length > maxCells) throw Bad
              var i = 0
              while (i < cells.length) {
                out.add(new GenericInternalRow(Array[Any](sheet, row,
                  cells(i)._1, UTF8String.fromString(cells(i)._2))))
                i += 1
              }
              r += 1
            }
          }
        }
      }
      new GenericArrayData(out.toArray)
    } catch {
      case Bad => null
      case _: StackOverflowError => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 4M-cell expansion cap. */
  def apply(contentXml: Column, maxCells: Int = 1 << 22): Column =
    ColumnShim.column(OdsCells(ColumnShim.expression(contentXml), maxCells))
}
