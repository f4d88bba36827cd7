package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 16-bit SimHash of a token array — one compiled loop doing
  * md5 → 16-bit hash → ±1 votes → bit pack per token.
  *
  * The composable form (`aggregate(transform(toks, md5...), 16-lane
  * vote array, ...)`) runs Spark's higher-order functions
  * *interpreted*: per token it allocates a lambda frame, a fresh
  * 16-element vote array, and 16 `CASE WHEN` branches. This expression
  * stays inside whole-stage codegen (a single static call per row) and
  * walks the digest bytes directly.
  *
  * Bit-for-bit identical to the composable construction and the DuckDB
  * oracle: hash16 = value of the first 4 hex nibbles of md5(token) =
  * (digest[0] << 8) | digest[1]; vote k is +1 iff bit k of hash16 is
  * set; fingerprint bit k is set iff vote sum ≥ 0. Null tokens are
  * skipped; a null array yields null.
  */
case class SimhashPack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash16 expects array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    SimhashPack.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashPack.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash16"
}

object SimhashPack {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](16)
    val md = md5.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        md.reset()
        val d = md.digest(t.getBytes)
        val h = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
        var k = 0
        while (k < 16) {
          votes(k) += (if (((h >> k) & 1) == 1) 1 else -1)
          k += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 16) {
      if (votes(k) >= 0) fp |= 1L << k
      k += 1
    }
    fp
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(tokens: Column): Column =
    ColumnShim.column(SimhashPack(ColumnShim.expression(tokens)))
}
