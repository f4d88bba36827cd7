package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native UTF-8 validity statistics of a binary payload — the encoding
  * QA gate a crawl pipeline runs before any text operator (mis-declared
  * charsets, truncated fetches and binary-in-text pages all surface
  * here): one compiled pass over the bytes validates the RFC 3629
  * well-formedness table exactly (shortest-form enforced via the
  * per-lead first-continuation ranges: no overlongs, no surrogates
  * E D A0-BF, nothing above U+10FFFF) and returns
  * `struct(n_bytes, n_chars, n_invalid)`:
  *
  *  - `n_chars`   — decoded codepoints (valid sequences)
  *  - `n_invalid` — replacement EVENTS under Unicode's maximal-subpart
  *    rule (TR36 / W3C): an invalid byte is one event, a truncated or
  *    ill-formed sequence is one event for its longest valid prefix —
  *    exactly what a REPLACE-mode decoder would emit as U+FFFDs.
  *
  * `n_invalid = 0` iff the payload is well-formed UTF-8. The
  * valid-fraction a filter thresholds is `1 - n_invalid / n_chars`-
  * style arithmetic left to the caller (raw-score rule: one IEEE
  * division outside the kernel). Null input → null. Scale shape: a
  * narrow per-row byte loop, codegen'd, zero shuffle — scan speed.
  */
case class Utf8Stats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"utf8_stats expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_invalid", LongType, nullable = false)))

  override def nullSafeEval(a: Any): Any =
    Utf8Stats.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Utf8Stats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "utf8_stats"
}

object Utf8Stats {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(payload: Column): Column =
    ColumnShim.column(Utf8Stats(ColumnShim.expression(payload)))

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length
    var i = 0
    var chars = 0L
    var invalid = 0L
    // is bytes(j) a continuation byte within [lo, hi]?
    def cont(j: Int, lo: Int, hi: Int): Boolean =
      j < n && { val b = bytes(j) & 0xff; b >= lo && b <= hi }
    while (i < n) {
      val b = bytes(i) & 0xff
      if (b < 0x80) { chars += 1; i += 1 }
      else if (b >= 0xC2 && b <= 0xDF) {
        if (cont(i + 1, 0x80, 0xBF)) { chars += 1; i += 2 }
        else { invalid += 1; i += 1 }
      } else if (b >= 0xE0 && b <= 0xEF) {
        // first-continuation range enforces shortest form + no surrogates
        val lo1 = if (b == 0xE0) 0xA0 else 0x80
        val hi1 = if (b == 0xED) 0x9F else 0xBF
        if (!cont(i + 1, lo1, hi1)) { invalid += 1; i += 1 }
        else if (!cont(i + 2, 0x80, 0xBF)) { invalid += 1; i += 2 }
        else { chars += 1; i += 3 }
      } else if (b >= 0xF0 && b <= 0xF4) {
        // first-continuation range enforces shortest form + <= U+10FFFF
        val lo1 = if (b == 0xF0) 0x90 else 0x80
        val hi1 = if (b == 0xF4) 0x8F else 0xBF
        if (!cont(i + 1, lo1, hi1)) { invalid += 1; i += 1 }
        else if (!cont(i + 2, 0x80, 0xBF)) { invalid += 1; i += 2 }
        else if (!cont(i + 3, 0x80, 0xBF)) { invalid += 1; i += 3 }
        else { chars += 1; i += 4 }
      } else {
        // stray continuation (80-BF), overlong lead (C0-C1), > U+10FFFF (F5-FF)
        invalid += 1; i += 1
      }
    }
    new GenericInternalRow(Array[Any](n.toLong, chars, invalid))
  }
}
