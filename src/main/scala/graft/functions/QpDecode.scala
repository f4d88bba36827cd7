package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Quoted-printable decoding (RFC 2045 §6.7) — the transfer encoding
  * half the world's email bodies arrive in (the other half is base64,
  * which Spark has): `=XX` hex pairs become their byte, `=` followed
  * by a line break is a SOFT break (removed), everything else passes
  * through byte-for-byte. Output is BINARY — the caller picks the
  * charset the part's Content-Type declared (`decode(qp, 'UTF-8')`).
  *
  * LENIENT like every real mail decoder: a stray `=` with no valid
  * hex pair stays literal (RFC 2045 calls malformed QP "not fatal"),
  * because bouncing a 40-year-old mailing-list archive over one bad
  * escape would lose the message a census wants to count. Per-row
  * bounded work, zero shuffle, codegen'd. */
case class QpDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qp_decode expects string input, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    QpDecode.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QpDecode.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "qp_decode"
}

object QpDecode {

  private def hexVal(b: Byte): Int = b match {
    case x if x >= '0' && x <= '9' => x - '0'
    case x if x >= 'A' && x <= 'F' => x - 'A' + 10
    case x if x >= 'a' && x <= 'f' => x - 'a' + 10 // tolerated per RFC
    case _ => -1
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(s: UTF8String): Array[Byte] = {
    val in = s.getBytes
    val out = new java.io.ByteArrayOutputStream(in.length)
    var i = 0
    val n = in.length
    while (i < n) {
      val b = in(i)
      if (b == '=' && i + 1 < n) {
        val c1 = in(i + 1)
        if (c1 == '\n') i += 2 // soft break (bare LF)
        else if (c1 == '\r' && i + 2 < n && in(i + 2) == '\n') i += 3
        else if (c1 == '\r') i += 2 // soft break (bare CR — tolerated)
        else if (i + 2 < n && hexVal(c1) >= 0 && hexVal(in(i + 2)) >= 0) {
          out.write((hexVal(c1) << 4) | hexVal(in(i + 2)))
          i += 3
        } else { out.write(b); i += 1 } // malformed escape: literal
      } else { out.write(b); i += 1 }
    }
    out.toByteArray
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(text: Column): Column =
    ColumnShim.column(QpDecode(ColumnShim.expression(text)))
}
