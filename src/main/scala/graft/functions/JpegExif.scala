package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JPEG EXIF IFD0 metadata — the camera fields an image pipeline
  * gates and deduplicates on (orientation decides whether a dHash
  * needs rotating; make/model/datetime drive provenance splits):
  * walk the JPEG marker chain to APP1 (`Exif\0\0`), honor the TIFF
  * byte order (`II` little / `MM` big — both real), and read IFD0's
  * entries: Orientation (0x0112 SHORT), Make (0x010F ASCII), Model
  * (0x0110 ASCII), DateTime (0x0132 ASCII) — ASCII values inline
  * when ≤ 4 bytes else at their TIFF-base offset, trailing NULs
  * stripped. Absent tags are null FIELDS (a single value slot whose
  * offset runs past the segment also nulls just that field); a
  * missing/malformed APP1, bad TIFF magic or truncated entry table
  * yields a null STRUCT (fail closed). Only IFD0 is read — thumbnail
  * and GPS IFDs
  * are pipeline noise. Output struct (orientation, make, model,
  * datetime). Per-row bounded work, zero shuffle, codegen'd. */
case class JpegExif(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jpeg_exif expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("orientation", IntegerType, nullable = true),
    StructField("make", StringType, nullable = true),
    StructField("model", StringType, nullable = true),
    StructField("datetime", StringType, nullable = true)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    JpegExif.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.JpegExif.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "jpeg_exif"
}

object JpegExif {

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length
    if (n < 4 || bytes(0) != 0xff.toByte || bytes(1) != 0xd8.toByte)
      return null
    // marker walk to APP1 with the Exif signature
    var pos = 2
    var app1 = -1
    var app1End = -1
    while (app1 < 0 && pos + 4 <= n && bytes(pos) == 0xff.toByte) {
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return null // no EXIF before scan
      val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      if (len < 2 || pos + 2 + len > n) return null
      if (marker == 0xe1 && len >= 8 &&
        bytes(pos + 4) == 'E' && bytes(pos + 5) == 'x' &&
        bytes(pos + 6) == 'i' && bytes(pos + 7) == 'f' &&
        bytes(pos + 8) == 0 && bytes(pos + 9) == 0) {
        app1 = pos + 10 // TIFF base
        app1End = pos + 2 + len
      }
      pos += 2 + len
    }
    if (app1 < 0) return null
    tiffIfd(bytes, app1, app1End)
  }

  /** TIFF IFD0 parse shared by the JPEG APP1 path and the PNG `eXIf`
    * chunk (whose payload IS a raw TIFF blob): endianness, the 42
    * check, and the orientation/make/model/datetime entries. */
  private[functions] def tiffIfd(bytes: Array[Byte], base: Int,
                                 app1End: Int): InternalRow = {
    if (base + 8 > app1End) return null
    val le = bytes(base) == 'I' && bytes(base + 1) == 'I'
    val be = bytes(base) == 'M' && bytes(base + 1) == 'M'
    if (!le && !be) return null
    def u16(p: Int): Int =
      if (le) (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      else ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    def u32(p: Int): Long =
      if (le) (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
      else ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
        ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
    if (u16(base + 2) != 42) return null
    val ifd = base + u32(base + 4)
    if (ifd < base || ifd + 2 > app1End) return null
    val count = u16(ifd.toInt)
    var orientation: Any = null
    var make: Any = null
    var model: Any = null
    var datetime: Any = null
    def ascii(entry: Int): UTF8String = {
      val cnt = u32(entry + 4)
      if (cnt > (1 << 16)) return null
      val vpos =
        if (cnt <= 4) entry + 8
        else {
          val off = base + u32(entry + 8)
          if (off < base || off + cnt > app1End) return null
          off.toInt
        }
      if (vpos + cnt > app1End) return null
      var len = cnt.toInt
      while (len > 0 && bytes(vpos + len - 1) == 0) len -= 1
      UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, vpos,
        vpos + len))
    }
    var e = 0
    while (e < count) {
      val entry = ifd.toInt + 2 + e * 12
      if (entry + 12 > app1End) return null
      val tag = u16(entry)
      val typ = u16(entry + 2)
      tag match {
        case 0x0112 if typ == 3 => orientation = u16(entry + 8)
        case 0x010f if typ == 2 => make = ascii(entry)
        case 0x0110 if typ == 2 => model = ascii(entry)
        case 0x0132 if typ == 2 => datetime = ascii(entry)
        case _ => ()
      }
      e += 1
    }
    new GenericInternalRow(Array[Any](orientation, make, model, datetime))
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(payload: Column): Column =
    ColumnShim.column(JpegExif(ColumnShim.expression(payload)))
}
