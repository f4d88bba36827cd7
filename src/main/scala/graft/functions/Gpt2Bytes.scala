package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The GPT-2 byte↔unicode table (Radford et al. 2019, the public
  * `bytes_to_unicode` construction): every byte maps to a PRINTABLE
  * unicode codepoint — the 188 printable latin-1 bytes
  * (`!`–`~`, `¡`–`¬`, `®`–`ÿ`) map to themselves, the other 68 map
  * to 256+n in byte order — so byte-level BPE can treat arbitrary
  * binary UTF-8 as a string of visible "characters" and round-trip
  * LOSSLESSLY. [[Gpt2ByteMap]] maps a string's UTF-8 bytes into that
  * space; [[Gpt2ByteUnmap]] inverts (null for characters outside the
  * 256-entry image or byte sequences that are not valid UTF-8 —
  * fail-closed, never mojibake). */
object Gpt2Bytes {

  /** byte value → mapped char (the table is a bijection). */
  val ByteToChar: Array[Char] = {
    val keep = new Array[Boolean](256)
    for (b <- '!'.toInt to '~'.toInt) keep(b) = true
    for (b <- 0xA1 to 0xAC) keep(b) = true
    for (b <- 0xAE to 0xFF) keep(b) = true
    val out = new Array[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  /** mapped char → byte value; -1 outside the image. */
  val CharToByte: Array[Int] = {
    val out = Array.fill(324)(-1)
    for (b <- 0 until 256) out(ByteToChar(b).toInt) = b
    out
  }

  def map(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(ByteToChar(bytes(i) & 0xff))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def unmap(s: UTF8String): UTF8String = {
    val str = s.toString
    val bytes = new Array[Byte](str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i).toInt
      if (c >= CharToByte.length) return null
      val b = CharToByte(c)
      if (b < 0) return null
      bytes(i) = b.toByte
      i += 1
    }
    // the bytes must be valid UTF-8 to round-trip as a string
    Utf8Text.compute(bytes)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry points. */
  def mapCol(c: Column): Column =
    ColumnShim.column(Gpt2ByteMap(ColumnShim.expression(c)))
  def unmapCol(c: Column): Column =
    ColumnShim.column(Gpt2ByteUnmap(ColumnShim.expression(c)))
}

/** String → its GPT-2 byte-level unicode form (total function). */
case class Gpt2ByteMap(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gpt2_byte_map expects string input, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(a: Any): Any =
    Gpt2Bytes.map(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Gpt2Bytes.map($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "gpt2_byte_map"
}

/** GPT-2 byte-level unicode form → the original string; null for
  * out-of-image chars or invalid UTF-8 byte sequences. */
case class Gpt2ByteUnmap(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gpt2_byte_unmap expects string input, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any =
    Gpt2Bytes.unmap(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Gpt2Bytes.unmap($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "gpt2_byte_unmap"
}
