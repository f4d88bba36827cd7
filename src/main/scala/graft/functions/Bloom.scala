package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic Bloom filter over strings — the runtime-filter
  * primitive behind "broadcast a membership summary instead of
  * shuffling for a semi-join". Bit positions come from
  * Kirsch–Mitzenmacher double hashing of ONE md5 (`h1 + i·h2 mod m`,
  * h1/h2 = the digest's two 8-byte halves, h2 forced odd), so build
  * and probe agree on every engine and every run; no RNG, no seed.
  *
  * Build is an `Aggregator` whose partials are the bit array itself:
  * map-side partials OR together, so the shuffle carries
  * `numBits/8 · partitions` bytes regardless of input size. The
  * finished filter is a plain `Array[Byte]` meant to be collected ONCE
  * at index-build time (the same driver-action class as fitting the
  * IVF quantizer — not a per-row hot path) and shipped back into a
  * probe expression as a literal/reference object.
  *
  * False positives only — a probe pass must be followed by the exact
  * check (a semi-join on the survivors); false negatives never, so
  * pre-filtering with [[Bloom.mightContain]] cannot change an exact
  * pipeline's result, only shrink its shuffles.
  */
class BloomBuild(numBits: Int, numHashes: Int)
    extends Aggregator[String, Array[Long], Array[Byte]] {
  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
  require(numHashes >= 1 && numHashes <= 16, "1..16 hash functions")

  def zero: Array[Long] = new Array[Long](numBits / 64)

  def reduce(bits: Array[Long], key: String): Array[Long] = {
    if (key != null) Bloom.setBits(bits, key, numBits, numHashes)
    bits
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  def finish(bits: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](bits.length * 8)
    var i = 0
    while (i < bits.length) {
      var b = 0
      while (b < 8) {
        out(i * 8 + b) = ((bits(i) >>> (8 * b)) & 0xff).toByte
        b += 1
      }
      i += 1
    }
    out
  }

  def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Probe expression: true iff every hashed bit position of the key is
  * set in the (reference-object) filter bytes. Codegen'd — the filter
  * array is attached to the generated class once, not per row. */
case class BloomMightContain(child: Expression, bloom: Array[Byte],
                             numBits: Int, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects string input, got ${other.catalogString}")
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any): Any =
    Bloom.mightContainImpl(bloom, a.asInstanceOf[UTF8String].toString,
      numBits, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bloom, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.Bloom.mightContainImpl(
         |  $ref, $c.toString(), $numBits, $numHashes);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object Bloom {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def hashes(key: String): (Long, Long) = {
    val md = md5.get()
    md.reset()
    val d = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < 8) { h1 = (h1 << 8) | (d(i) & 0xffL); i += 1 }
    while (i < 16) { h2 = (h2 << 8) | (d(i) & 0xffL); i += 1 }
    (h1, h2 | 1L)
  }

  private[functions] def setBits(bits: Array[Long], key: String,
                                 numBits: Int, numHashes: Int): Unit = {
    val (h1, h2) = hashes(key)
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
      bits(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Probe kernel — public static so generated code can call it. */
  def mightContainImpl(bloom: Array[Byte], key: String,
                       numBits: Int, numHashes: Int): Boolean = {
    val (h1, h2) = hashes(key)
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
      if (((bloom(pos >>> 3) >>> (pos & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }

  /** Build the filter over a key column — ONE driver-collected value
    * (index build, same class of action as fitting a quantizer). */
  def build(df: DataFrame, key: Column, numBits: Int, numHashes: Int): Array[Byte] =
    df.select(udaf(new BloomBuild(numBits, numHashes), Encoders.STRING)
      .apply(key).as("bf"))
      .head().getAs[Array[Byte]](0)

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Probe column: does the filter possibly contain `key`? */
  def mightContain(bloom: Array[Byte], numBits: Int, numHashes: Int,
                   key: Column): Column =
    ColumnShim.column(
      BloomMightContain(ColumnShim.expression(key), bloom, numBits, numHashes))
}
