package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined chunking of a token array: one compiled pass
  * computes the md5-addressed boundary positions (first hex nibble of
  * the `shingleN`-token window digest below `boundaryNibbles`) and the
  * md5 of each resulting chunk's token span.
  *
  * Drop-in for the composable construction in
  * `ext/TextAnalysis.contentChunks` (a `filter(sequence(...))` boundary
  * scan plus `zip_with` chunk hashing), which runs Spark's higher-order
  * functions interpreted — one lambda frame, joined-string and hex
  * allocation per token position. On a corpus-scale bench that
  * interpreted form was ~20× slower than the rest of the suite; this
  * expression does the same md5 arithmetic in one static call inside
  * whole-stage codegen.
  *
  * Bit-for-bit identical to the composable form and the DuckDB oracle:
  * shingle = space-joined token window ending at position i (1-based,
  * i ≥ shingleN); boundary iff `hexNibble0(md5(shingle)) <
  * boundaryNibbles`; the final token always closes the last chunk;
  * chunk_hash = md5 of the space-joined chunk span. Empty token arrays
  * yield an empty array (→ no rows after posexplode). */
case class CdcChunks(child: Expression, shingleN: Int, boundaryNibbles: Int)
    extends UnaryExpression {
  require(shingleN >= 1 && boundaryNibbles >= 1 && boundaryNibbles <= 16,
    "need a positive window and a boundary probability in (0, 1]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("first_pos", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("chunk_hash", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    CdcChunks.compute(a.asInstanceOf[ArrayData], shingleN, boundaryNibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.CdcChunks.compute($c, $shingleN, $boundaryNibbles);
      """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  private def hexOf(d: Array[Byte]): String = {
    val hex = new Array[Char](32)
    var b = 0
    while (b < 16) {
      hex(2 * b) = hexChars((d(b) >> 4) & 0xf)
      hex(2 * b + 1) = hexChars(d(b) & 0xf)
      b += 1
    }
    new String(hex)
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(arr: ArrayData, n: Int, bn: Int): ArrayData = {
    val numToks = arr.numElements()
    if (numToks == 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[String](numToks)
    var t = 0
    while (t < numToks) { toks(t) = arr.getUTF8String(t).toString; t += 1 }
    val md = md5.get()
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    // boundary scan: window of n tokens ending at i (1-based)
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = n
    while (i <= numToks) {
      val sb = new java.lang.StringBuilder
      var j = i - n
      while (j < i) {
        if (j > i - n) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(utf8))
      if (((d(0) >> 4) & 0xf) < bn) ends += i
      i += 1
    }
    if (ends.isEmpty || ends.last != numToks) ends += numToks
    // chunk spans + hashes
    val out = new Array[Any](ends.length)
    var start = 1
    var ci = 0
    while (ci < ends.length) {
      val e = ends(ci)
      val sb = new java.lang.StringBuilder
      var j = start - 1
      while (j < e) {
        if (j > start - 1) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      md.reset()
      val h = hexOf(md.digest(sb.toString.getBytes(utf8)))
      out(ci) = new GenericInternalRow(Array[Any](
        start.toLong, (e - start + 1).toLong, UTF8String.fromString(h)))
      start = e + 1
      ci += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(tokens: Column, shingleN: Int, boundaryNibbles: Int): Column =
    ColumnShim.column(
      CdcChunks(ColumnShim.expression(tokens), shingleN, boundaryNibbles))
}
