package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** cpio archive walk — the payload format every RPM carries and
  * initramfs images ship, the third archive sibling next to
  * [[TarEntries]] and [[ArEntries]]. Both ASCII variants decode:
  *
  *  - newc (`070701`) and crc (`070702`): 110-byte headers of 8-hex
  *    fields, name NUL-terminated with header+name padded to 4, data
  *    padded to 4;
  *  - odc / portable (`070707`): 76-byte headers of octal fields
  *    (11-digit mtime/filesize), no padding.
  *
  * Each entry yields `(name, offset, size, mode, mtime)` with
  * `offset` pointing at the verbatim data for `substr` extraction;
  * the `TRAILER!!!` terminator ends the walk and surfaces to nobody.
  * Binary (pre-SVR4) cpio refuses — nothing modern writes it.
  *
  * FAIL-CLOSED NULL for: an unrecognized magic anywhere a header
  * should start, a non-hex/non-octal field, a name without its NUL,
  * data running past the payload, a missing trailer. The walk is
  * bounded by `maxEntries`. Per-row bounded work, zero shuffle,
  * codegen'd. */
case class CpioEntries(child: Expression, maxEntries: Int)
    extends UnaryExpression {
  require(maxEntries > 0, "entry walk bound must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cpio_entries expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("mode", IntegerType, nullable = false),
    StructField("mtime", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    CpioEntries.compute(a.asInstanceOf[Array[Byte]], maxEntries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CpioEntries.compute($c, $maxEntries);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "cpio_entries"
}

object CpioEntries {

  private case object Bad extends Exception { override def fillInStackTrace(): Throwable = this }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte], maxEntries: Int): GenericArrayData = {
    try {
      if (b == null || b.length < 6) return null
      val out = new java.util.ArrayList[Any]
      var pos = 0
      var sawTrailer = false
      while (!sawTrailer && out.size() <= maxEntries) {
        if (pos + 6 > b.length) throw Bad
        val magic = ascii(b, pos, 6)
        if (magic == "070701" || magic == "070702") {
          if (pos + 110 > b.length) throw Bad
          def hx(i: Int): Long = hex8(b, pos + 6 + 8 * i)
          val mode = hx(1)
          val mtime = hx(5)
          val fileSize = hx(6)
          val nameSize = hx(11)
          if (nameSize <= 0 || nameSize > 4096) throw Bad
          val nameOff = pos + 110
          if (nameOff + nameSize > b.length) throw Bad
          if (b((nameOff + nameSize - 1).toInt) != 0) throw Bad
          val name = new String(b, nameOff, nameSize.toInt - 1, "UTF-8")
          var dataOff = pad4(nameOff + nameSize.toInt)
          if (dataOff + fileSize > b.length) throw Bad
          if (name == "TRAILER!!!") sawTrailer = true
          else out.add(new GenericInternalRow(Array[Any](
            UTF8String.fromString(name), dataOff.toLong, fileSize,
            mode.toInt, mtime)))
          pos = pad4((dataOff + fileSize).toInt)
        } else if (magic == "070707") {
          if (pos + 76 > b.length) throw Bad
          val mode = oct(b, pos + 18, 6)
          val mtime = oct(b, pos + 48, 11)
          val nameSize = oct(b, pos + 59, 6)
          val fileSize = oct(b, pos + 65, 11)
          if (nameSize <= 0 || nameSize > 4096) throw Bad
          val nameOff = pos + 76
          if (nameOff + nameSize > b.length) throw Bad
          if (b((nameOff + nameSize - 1).toInt) != 0) throw Bad
          val name = new String(b, nameOff, nameSize.toInt - 1, "UTF-8")
          val dataOff = nameOff + nameSize.toInt
          if (dataOff + fileSize > b.length) throw Bad
          if (name == "TRAILER!!!") sawTrailer = true
          else out.add(new GenericInternalRow(Array[Any](
            UTF8String.fromString(name), dataOff.toLong, fileSize,
            mode.toInt, mtime)))
          pos = (dataOff + fileSize).toInt
        } else throw Bad
      }
      if (out.size() > maxEntries) throw Bad
      new GenericArrayData(out.toArray)
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  private def pad4(p: Int): Int = (p + 3) & ~3

  private def ascii(b: Array[Byte], off: Int, len: Int): String =
    new String(b, off, len, java.nio.charset.StandardCharsets.ISO_8859_1)

  private def hex8(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val c = b(off + i) & 0xff
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else throw Bad
      v = (v << 4) | d
      i += 1
    }
    v
  }

  private def oct(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) {
      val c = b(off + i) & 0xff
      if (c < '0' || c > '7') throw Bad
      v = (v << 3) | (c - '0')
      i += 1
    }
    v
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 65536-entry default walk bound. */
  def apply(payload: Column, maxEntries: Int = 1 << 16): Column =
    ColumnShim.column(CpioEntries(ColumnShim.expression(payload), maxEntries))
}
