package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature of a token array: `n`-token shingles →
  * md5 hex → k disjoint hex slices → lexicographic minimum per slice,
  * in one compiled loop per row.
  *
  * Drop-in for the composable construction in `ext/Dedup.minhash`
  * (`transform(shingles, md5)` + k × `array_min(transform(substring))`),
  * which runs Spark's higher-order functions interpreted — per shingle
  * it allocates the joined string, the hex string, and k substring
  * copies through lambda frames. This expression allocates the shingle
  * + digest once and compares hex slices in place, staying inside
  * whole-stage codegen via one static call.
  *
  * Bit-for-bit identical to the composable form and the SQL oracles:
  * shingle = space-joined token window; component i = min over
  * shingles of md5-hex[w·i, w·(i+1)) with w = 32/k (lowercase hex,
  * lexicographic = byte order on ASCII). Fewer than `n` tokens → null
  * (each unpacked signature component reads null, exactly like
  * `array_min` of an empty array). Tokens must be non-null (the
  * tokenizers here never emit null elements). */
case class MinhashSig(child: Expression, shingleN: Int, k: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 32, "k minhash functions are sliced from one 32-hex md5")
  require(shingleN >= 1, "shingle width must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    MinhashSig.compute(a.asInstanceOf[ArrayData], shingleN, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.MinhashSig.compute($c, $shingleN, $k);
      |${ev.isNull} = (${ev.value} == null);
      """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinhashSig {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  /** The per-row kernel — public static so generated code can call it.
    * Returns null when there are fewer than `n` tokens (no shingles). */
  def compute(arr: ArrayData, n: Int, k: Int): ArrayData = {
    val numToks = arr.numElements()
    val numSh = numToks - n + 1
    if (numSh <= 0) return null
    val w = 32 / k
    val md = md5.get()
    val mins = new Array[String](k)
    val hex = new Array[Char](32)
    var s = 0
    while (s < numSh) {
      val sb = new java.lang.StringBuilder
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(arr.getUTF8String(s + t).toString)
        t += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexChars((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexChars(d(b) & 0xf)
        b += 1
      }
      var i = 0
      while (i < k) {
        val slice = new String(hex, w * i, w)
        if (mins(i) == null || slice.compareTo(mins(i)) < 0) mins(i) = slice
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(tokens: Column, shingleN: Int, k: Int): Column =
    ColumnShim.column(MinhashSig(ColumnShim.expression(tokens), shingleN, k))
}
