package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native shingle-repetition statistics of a token array: the maximum
  * multiplicity of any `n`-token shingle (`best`) and the shingle count
  * (`n`), as one hash-count loop per row.
  *
  * Equivalent to (and parity-tested against) the composable form —
  * `array_sort(shingles)` + an `aggregate` run-length scan — whose
  * higher-order functions run interpreted and whose sort is
  * O(m log m) string compares per row. The longest run of equal
  * strings in sorted order IS the maximum multiplicity, so exact
  * per-shingle counting gives identical values. Fewer than `n` tokens
  * → null (the caller drops shingle-less docs, matching the n = 0
  * filter of the scan form). */
case class RepetitionStats(child: Expression, shingleN: Int)
    extends UnaryExpression {
  require(shingleN >= 1, "shingle width must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("best", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    RepetitionStats.compute(a.asInstanceOf[ArrayData], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.RepetitionStats.compute($c, $shingleN);
      |${ev.isNull} = (${ev.value} == null);
      """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {

  /** The per-row kernel — public static so generated code can call it.
    * Returns null when there are fewer than `n` tokens. */
  def compute(arr: ArrayData, n: Int): InternalRow = {
    val numToks = arr.numElements()
    val numSh = numToks - n + 1
    if (numSh <= 0) return null
    val counts = new java.util.HashMap[String, Long](numSh * 2)
    var best = 0L
    var s = 0
    while (s < numSh) {
      val sb = new java.lang.StringBuilder
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(arr.getUTF8String(s + t).toString)
        t += 1
      }
      val key = sb.toString
      val c = counts.merge(key, 1L, (a, b) => a + b)
      if (c > best) best = c
      s += 1
    }
    new GenericInternalRow(Array[Any](best, numSh.toLong))
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(tokens: Column, shingleN: Int): Column =
    ColumnShim.column(RepetitionStats(ColumnShim.expression(tokens), shingleN))
}
