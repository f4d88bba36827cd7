package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram MULTISET of a token array — every space-joined
  * `n`-token window, in order, duplicates kept. The occurrence-stream
  * sibling of [[ShingleSet]] (which dedups for membership-style
  * consumers): language-model counting needs every occurrence, so
  * nothing is dropped.
  *
  * Replaces the composable
  * `transform(sequence(1, size-n+1), i -> ...element_at/struct...)`
  * construction, which runs interpreted with a lambda frame, a
  * `sequence` array allocation and per-position bounds-checked
  * `element_at` calls — the dominant per-row cost of the trigram-LM
  * build. One compiled loop per row instead.
  *
  * Because tokenizer output is whitespace-split, a token can never
  * contain a space, so the joined string is BIJECTIVE with the token
  * tuple: grouping by it counts exactly the same n-grams, and the
  * constituent tokens recover exactly via `substring_index` — the
  * property the LM's lower-order counts rely on. Fewer than `n`
  * tokens ⇒ empty array; null array ⇒ null. */
case class TokenNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram width must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_ngrams expects array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    TokenNgrams.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "token_ngrams"
}

object TokenNgrams {

  /** The per-row kernel — public static so generated code can call it. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val numToks = arr.numElements()
    if (numToks < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[String](numToks)
    var t = 0
    while (t < numToks) {
      val u = arr.getUTF8String(t)
      toks(t) = if (u == null) null else u.toString
      t += 1
    }
    val out = new Array[Any](numToks - n + 1)
    var i = 0
    while (i <= numToks - n) {
      // concat_ws semantics: null tokens are skipped, separators only
      // between emitted elements
      val sb = new java.lang.StringBuilder
      var j = i
      var first = true
      while (j < i + n) {
        if (toks(j) != null) {
          if (!first) sb.append(' ')
          sb.append(toks(j))
          first = false
        }
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(tokens: Column, n: Int): Column =
    ColumnShim.column(TokenNgrams(ColumnShim.expression(tokens), n))
}
