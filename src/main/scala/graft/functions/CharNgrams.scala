package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native character-n-gram census: the map from each overlapping
  * `n`-CHARACTER substring of a string to its occurrence count, in one
  * compiled pass over the UTF-8 bytes.
  *
  * Replaces the composable `explode(transform(sequence(1, len-n+1),
  * i -> substr(text, i, n))) groupBy count` construction under the
  * language-ID family and the bigram-entropy census, which pays three
  * ways: the HOF lambda runs interpreted, every `substr(i, n)` call
  * re-scans the string from byte 0 to find character position `i`
  * (O(len²) total per row), and the explode materializes `len` rows
  * per document that exist only to be count-aggregated straight back
  * down. This kernel walks the byte array once, slicing on the UTF-8
  * character boundaries it just crossed, and returns the already
  * per-document-aggregated (n-gram → count) map — `explode` of it
  * yields exactly the rows the old `groupBy` produced, with no
  * shuffle.
  *
  * Character = Unicode code point, exactly `substr`'s unit (UTF-8
  * continuation bytes have the top bits `10`, so boundaries are
  * `(b & 0xC0) != 0x80`; an astral code point is ONE character here
  * and in `substr`/`length`, unlike UTF-16's surrogate pair). Counts
  * and key sets are therefore bit-identical to the composable form.
  * Strings shorter than `n` characters ⇒ empty map; null ⇒ null.
  * Key order is first occurrence — deterministic for a given input. */
case class CharNgramCounts(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n-gram width must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_counts expects string input, got ${other.catalogString}")
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def nullSafeEval(a: Any): Any =
    CharNgramCounts.compute(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgramCounts.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "char_ngram_counts"
}

object CharNgramCounts {

  /** The per-row kernel — public static so generated code can call it. */
  def compute(s: UTF8String, n: Int): MapData = {
    val bytes = s.getBytes
    val len = bytes.length
    // character start offsets (+ end sentinel): a boundary is any byte
    // that is not a UTF-8 continuation byte
    val starts = new Array[Int](len + 1)
    var numChars = 0
    var i = 0
    while (i < len) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(numChars) = i; numChars += 1 }
      i += 1
    }
    starts(numChars) = len
    if (numChars < n)
      return new ArrayBasedMapData(new GenericArrayData(Array.empty[Any]),
        new GenericArrayData(Array.empty[Any]))
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]
    var c = 0
    while (c <= numChars - n) {
      val from = starts(c)
      val ng = UTF8String.fromBytes(bytes, from, starts(c + n) - from)
      val cell = counts.get(ng)
      if (cell == null) counts.put(ng, Array(1L)) else cell(0) += 1L
      c += 1
    }
    val m = counts.size()
    val keys = new Array[Any](m)
    val vals = new Array[Any](m)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = e.getKey
      vals(k) = e.getValue()(0)
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(text: Column, n: Int): Column =
    ColumnShim.column(CharNgramCounts(ColumnShim.expression(text), n))
}
