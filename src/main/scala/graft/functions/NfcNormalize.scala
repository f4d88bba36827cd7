package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) — the missing
  * built-in under any multilingual text pipeline: 'é' typed as
  * e + U+0301 and 'é' typed as U+00E9 must hash, shingle, and dedup
  * identically, and CJK/compatibility sources routinely mix the two.
  * Wraps the JDK's `java.text.Normalizer` (Form.NFC) as a native
  * codegen'd expression so the normalize stays inside the whole-stage
  * span (a UDF here would break fusion for every downstream kernel —
  * the [[WsTokens]] argument). DuckDB's `nfc_normalize` is the oracle
  * twin. Fast path: `Normalizer.isNormalized` is O(n) with no
  * allocation, and real corpora are overwhelmingly already-NFC, so
  * the common row pays one scan, not a copy.
  *
  * Null input ⇒ null. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string input, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(a: Any): Any =
    NfcNormalize.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** The per-row kernel — public static so generated code can call it. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(text: Column): Column =
    ColumnShim.column(NfcNormalize(ColumnShim.expression(text)))
}
