package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer: the non-empty runs of a string split
  * on the SPACE character — semantically `filter(split(text, " ", -1),
  * t -> t <> '')`, the tokenizer under every text operator in this
  * library and every `string_split`/`list_filter` oracle.
  *
  * The composable form pays twice per row: `split` materializes an
  * array that includes one empty string per consecutive-space gap, and
  * `filter` is a higher-order function Spark evaluates INTERPRETED
  * (a lambda frame per element) while also breaking the whole-stage
  * codegen span of everything downstream of it — including this
  * library's native kernels (MinhashSig, SimhashPack, ShingleSet,
  * CdcChunks), which consume the token array. This expression emits
  * only the non-empty runs in one compiled pass over the UTF-8 bytes
  * (a space is a single byte in UTF-8, so byte scanning is safe) and
  * keeps the span fused.
  *
  * Null input ⇒ null; empty or all-space input ⇒ empty array. */
case class WsTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens expects string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    WsTokens.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WsTokens.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ws_tokens"
}

object WsTokens {

  /** The per-row kernel — public static so generated code can call it. */
  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[Any]
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        if (i > start)
          out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, i)))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(text: Column): Column =
    ColumnShim.column(WsTokens(ColumnShim.expression(text)))
}
