package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native SimHash of a token array at 16 or 64 bits — one compiled
  * loop doing md5 → token hash → ±1 votes → bit pack per token.
  *
  * The composable form (`aggregate(transform(toks, md5...), per-bit
  * vote array, ...)`) runs Spark's higher-order functions
  * *interpreted*: per token it allocates a lambda frame, a fresh
  * vote array, and one `CASE WHEN` branch per bit. This expression
  * stays inside whole-stage codegen (a single static call per row) and
  * walks the digest bytes directly.
  *
  * Bit-for-bit identical to the composable construction and the DuckDB
  * oracle: the token hash is the value of the first `width/4` hex
  * nibbles of md5(token) — big-endian digest bytes, so at 16 bits
  * `(digest[0] << 8) | digest[1]`, at 64 bits the first 8 digest bytes
  * as a (signed, two's-complement) long; vote k is +1 iff bit k of the
  * token hash is set; fingerprint bit k is set iff the vote sum ≥ 0.
  * At width 64 a set bit 63 makes the fingerprint negative — hamming
  * via `bit_count(xor(...))` is unaffected (both Spark and ANSI
  * engines count two's-complement bits). Null tokens are skipped; a
  * null array yields null.
  *
  * The 16-bit form saturates on real corpora (65k distinct
  * fingerprints — unrelated documents collide); 64 bits is the
  * production width (Charikar/Manku-Jain-Sarma crawl dedup used
  * 64-bit fingerprints).
  */
case class SimhashPack(child: Expression, width: Int = 16)
    extends UnaryExpression {
  require(width == 16 || width == 64, "simhash width must be 16 or 64")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    SimhashPack.compute(a.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashPack.compute($c, $width);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = s"simhash$width"
}

object SimhashPack {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(arr: ArrayData, width: Int): Long = {
    val votes = new Array[Int](width)
    val nBytes = width / 8
    val md = md5.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        md.reset()
        val d = md.digest(t.getBytes)
        var h = 0L
        var b = 0
        while (b < nBytes) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        var k = 0
        while (k < width) {
          votes(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
          k += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < width) {
      if (votes(k) >= 0) fp |= 1L << k
      k += 1
    }
    fp
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(tokens: Column): Column = apply(tokens, 16)

  def apply(tokens: Column, width: Int): Column =
    ColumnShim.column(SimhashPack(ColumnShim.expression(tokens), width))
}
