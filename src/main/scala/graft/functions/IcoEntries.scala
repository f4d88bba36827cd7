package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** ICO/CUR directory census — favicons are a fixture of every web
  * crawl and carry MULTIPLE images per file (the brand-asset dedup /
  * best-resolution-pick input): the ICONDIR header (reserved 0, type
  * 1 icon / 2 cursor, count) then one 16-byte ICONDIRENTRY per image
  * — width/height (byte 0 meaning 256 per the format), bit depth,
  * byte size and payload offset — with each payload sniffed for the
  * embedded-PNG form modern 256-px icons use (vs the classic BMP
  * DIB). Payload pixels never decode; this is the size/format census.
  *
  * Output: array of `(width, height, bpp, size, is_png)` in
  * directory order.
  *
  * FAIL-CLOSED NULL for non-ICO payloads (reserved ≠ 0, type ∉
  * {1, 2}), a truncated entry table, any entry whose payload span
  * lies outside the file, or more than `maxEntries` images. Per-row
  * bounded work, zero shuffle, codegen'd. */
case class IcoEntries(child: Expression, maxEntries: Int)
    extends UnaryExpression {
  require(maxEntries > 0, "entry cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ico_entries expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bpp", IntegerType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("is_png", BooleanType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    IcoEntries.compute(a.asInstanceOf[Array[Byte]], maxEntries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.IcoEntries.compute($c, $maxEntries);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ico_entries"
}

object IcoEntries {

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte], maxEntries: Int): GenericArrayData = {
    if (b == null || b.length < 6) return null
    if (le16(b, 0) != 0) return null
    val tpe = le16(b, 2)
    if (tpe != 1 && tpe != 2) return null
    val count = le16(b, 4)
    if (count == 0 || count > maxEntries) return null
    if (6 + 16 * count > b.length) return null
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val e = 6 + 16 * i
      val w0 = b(e) & 0xff
      val h0 = b(e + 1) & 0xff
      val bpp = le16(b, e + 6)
      val size = le32(b, e + 8)
      val off = le32(b, e + 12)
      if (off < 0 || size < 0 || off + size > b.length) return null
      val isPng = size >= 8 &&
        (b(off.toInt) & 0xff) == 0x89 && b(off.toInt + 1) == 'P' &&
        b(off.toInt + 2) == 'N' && b(off.toInt + 3) == 'G'
      out(i) = new GenericInternalRow(Array[Any](
        if (w0 == 0) 256 else w0,
        if (h0 == 0) 256 else h0,
        bpp, size, java.lang.Boolean.valueOf(isPng)))
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 256-image cap. */
  def apply(payload: Column, maxEntries: Int = 256): Column =
    ColumnShim.column(IcoEntries(ColumnShim.expression(payload), maxEntries))
}
