package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fail-closed UTF-8 decode — the mixed-lake front door's safe
  * alternative to `decode(bin, 'UTF-8')`, which THROWS on malformed
  * bytes under Spark 4's codingErrorAction and would kill a whole
  * job over one binary payload in a 100 TB scan: one validation pass
  * (the UTF-8 state machine, overlongs and surrogates rejected, the
  * [[Utf8Stats]] rules), then a zero-copy wrap — valid bytes ARE the
  * string. Invalid input yields NULL, the same contract as every
  * other kernel in the tier: a payload that is not text never
  * surfaces as garbage and never kills the scan. */
case class Utf8Text(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"utf8_text expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    Utf8Text.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Utf8Text.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "utf8_text"
}

object Utf8Text {

  /** The per-row kernel — public static so generated code can call it.
    * Strict validation: overlong encodings, lone continuation bytes,
    * surrogate code points and out-of-range sequences all refuse. */
  def compute(b: Array[Byte]): UTF8String = {
    val n = b.length
    var i = 0
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if ((c & 0xE0) == 0xC0) {
        if (c < 0xC2 || i + 1 >= n || (b(i + 1) & 0xC0) != 0x80)
          return null // overlong or truncated
        i += 2
      } else if ((c & 0xF0) == 0xE0) {
        if (i + 2 >= n || (b(i + 1) & 0xC0) != 0x80 ||
          (b(i + 2) & 0xC0) != 0x80) return null
        val cp = ((c & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) |
          (b(i + 2) & 0x3F)
        if (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF)) return null
        i += 3
      } else if ((c & 0xF8) == 0xF0) {
        if (i + 3 >= n || (b(i + 1) & 0xC0) != 0x80 ||
          (b(i + 2) & 0xC0) != 0x80 || (b(i + 3) & 0xC0) != 0x80)
          return null
        val cp = ((c & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
          ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)
        if (cp < 0x10000 || cp > 0x10FFFF) return null
        i += 4
      } else return null
    }
    UTF8String.fromBytes(b)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  def apply(payload: Column): Column =
    ColumnShim.column(Utf8Text(ColumnShim.expression(payload)))
}
