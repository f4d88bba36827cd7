package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct-shingle set of a token array — one compiled loop
  * building each `n`-token window and inserting it (or, with
  * `hashHexLen > 0`, the first `hashHexLen` hex chars of its md5) into
  * a first-occurrence-ordered set.
  *
  * Replaces the composable
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * slice(toks, i, n))))` construction (optionally wrapped in
  * `substring(md5(...))`), which runs Spark's higher-order functions
  * interpreted: a lambda frame, a sliced array copy, and a joined
  * string per token position, then an O(s²)-ish generic distinct. This
  * is the shingling kernel under decontamination, boilerplate n-grams
  * and Jaccard verification — the dominant per-row cost of the dedup
  * family's narrow stage.
  *
  * Bit-for-bit identical to the composable form and the DuckDB
  * oracles: shingle = space-joined window of `n` non-null tokens
  * starting at 1-based position 1..len−n+1; fewer than `n` tokens ⇒
  * empty array; dedup is by emitted VALUE (the hash prefix when
  * hashing — two colliding shingles count once, exactly like
  * `array_distinct` over the transformed array) keeping first
  * occurrence. Null array ⇒ null. */
case class ShingleSet(child: Expression, n: Int, hashHexLen: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be positive")
  require(hashHexLen >= 0 && hashHexLen <= 32, "md5 has 32 hex chars")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_set expects array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    ShingleSet.compute(a.asInstanceOf[ArrayData], n, hashHexLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleSet.compute($c, $n, $hashHexLen);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_set"
}

object ShingleSet {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  /** The per-row kernel — public static so generated code can call it. */
  def compute(arr: ArrayData, n: Int, hashHexLen: Int): ArrayData = {
    val numToks = arr.numElements()
    if (numToks < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[String](numToks)
    var t = 0
    while (t < numToks) {
      val u = arr.getUTF8String(t)
      toks(t) = if (u == null) null else u.toString
      t += 1
    }
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val md = md5.get()
    val seen = new java.util.LinkedHashSet[String]
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
      val shingle = sb.toString
      if (hashHexLen == 0) seen.add(shingle)
      else {
        md.reset()
        val d = md.digest(shingle.getBytes(utf8))
        val hex = new Array[Char](hashHexLen)
        var b = 0
        while (b < hashHexLen) {
          val byte = d(b / 2)
          hex(b) = hexChars(if (b % 2 == 0) (byte >> 4) & 0xf else byte & 0xf)
          b += 1
        }
        seen.add(new String(hex))
      }
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point: distinct shingles (`hashHexLen = 0`) or
    * distinct md5-prefix keys. */
  def apply(tokens: Column, n: Int, hashHexLen: Int = 0): Column =
    ColumnShim.column(
      ShingleSet(ColumnShim.expression(tokens), n, hashHexLen))
}
