package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native hashed-bag bucket counts of a token array — one compiled
  * loop doing md5 → 16-bit token hash → `% buckets` → count per
  * token, returning the per-bucket occurrence counts as a
  * `buckets`-long array.
  *
  * This is the feature kernel of the hashed-bag logreg/linear-score
  * family. The composable form (explode the token stream, hash each
  * occurrence with `conv(substring(md5(t),1,4),16,10)`, group by
  * (doc, bucket)) pays a per-occurrence hex-encode + string parse and
  * a corpus-sized aggregation exchange; this expression computes the
  * same counts per document row inside whole-stage codegen — the
  * feature build becomes a NARROW map over the corpus, no shuffle.
  *
  * Bucket-for-bucket identical to the composable construction and the
  * SQL oracle: the token hash is the value of the first 4 hex nibbles
  * of md5(token) — big-endian digest bytes, so
  * `(digest[0] << 8) | digest[1]`, always in [0, 65535] — and the
  * bucket is that value mod `buckets` (non-negative, so `%` ≡ pmod).
  * Null tokens are skipped (the exploded form's null bucket never
  * joins the weight table); a null array yields null.
  */
case class HashBucketCounts(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0, "buckets must be > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    HashBucketCounts.compute(a.asInstanceOf[ArrayData], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashBucketCounts.compute($c, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hash_bucket_counts"
}

object HashBucketCounts {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(arr: ArrayData, buckets: Int): GenericArrayData = {
    val counts = new Array[Long](buckets)
    val md = md5.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        md.reset()
        val d = md.digest(t.getBytes)
        val h = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
        counts(h % buckets) += 1L
      }
      i += 1
    }
    new GenericArrayData(counts.map(c => c: Any))
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(tokens: Column, buckets: Int): Column =
    ColumnShim.column(HashBucketCounts(ColumnShim.expression(tokens), buckets))
}
