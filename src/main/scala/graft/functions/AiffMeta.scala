package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** AIFF / AIFF-C container census — the big-endian IFF sibling of the
  * WAV tier (Mac-origin audio archives, old sample libraries, ProTools
  * exports): `FORM … AIFF|AIFC` chunk walk to `COMM`, reading
  * channels, sample frames, bit depth and the format's famous 80-BIT
  * IEEE-EXTENDED sample rate (sign/15-bit exponent/64-bit mantissa
  * with explicit integer bit — decoded exactly, no float80 on the
  * JVM needed because audio rates fit a double losslessly). AIFF-C
  * additionally yields the compression fourcc (`NONE`, `sowt`,
  * `fl32`, `ima4`, …). `duration_ms = frames * 1000 / rate` floored.
  *
  * `SSND` and every other chunk are SKIPPED BY SIZE — the walk is
  * header-proportional no matter how large the file; odd-sized
  * chunks consume their IFF pad byte, and a final chunk whose pad
  * the writer omitted is accepted (the WavInfoTags contract).
  *
  * Fails closed (null) for: bad FORM/AIFF magic, truncated chunk
  * walk, a chunk overrunning the FORM window, no COMM, a COMM too
  * short for its form, non-positive channels/rate, an 80-bit rate
  * outside (0, 2^31). Per-row bounded work, zero shuffle,
  * codegen'd. */
case class AiffMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"aiff_meta expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("form", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("sample_rate", DoubleType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("codec", StringType, nullable = true)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    AiffMeta.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AiffMeta.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "aiff_meta"
}

object AiffMeta {

  private case object Bad extends Exception { override def fillInStackTrace(): Throwable = this }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte]): InternalRowT = {
    try {
      if (b == null || b.length < 12) return null
      if (!fourcc(b, 0, "FORM")) return null
      val formSize = be32(b, 4)
      if (formSize < 4 || 8L + formSize > b.length) throw Bad
      val isAifc = fourcc(b, 8, "AIFC")
      if (!isAifc && !fourcc(b, 8, "AIFF")) return null
      val formEnd = 8 + formSize
      var p = 12
      while (p + 8 <= formEnd) {
        val size = be32(b, p + 4)
        if (size < 0 || p + 8 + size > formEnd) throw Bad
        if (fourcc(b, p, "COMM")) {
          val need = if (isAifc) 22 else 18 // AIFC: +compression fourcc
          if (size < need) throw Bad
          val d = p + 8
          val channels = ((b(d) & 0xff) << 8) | (b(d + 1) & 0xff)
          val frames = be32(b, d + 2).toLong & 0xffffffffL
          val bits = ((b(d + 6) & 0xff) << 8) | (b(d + 7) & 0xff)
          val rate = extended80(b, d + 8)
          if (channels <= 0 || bits <= 0 || !(rate > 0) ||
            rate >= (1L << 31).toDouble) throw Bad
          val codec: Any =
            if (isAifc)
              UTF8String.fromString(
                new String(b, d + 18, 4,
                  java.nio.charset.StandardCharsets.ISO_8859_1))
            else null
          val durMs = (frames * 1000.0 / rate).toLong
          return new GenericInternalRow(Array[Any](
            UTF8String.fromString(if (isAifc) "aifc" else "aiff"),
            channels, bits, rate, frames, durMs, codec))
        }
        p += 8 + size + (size & 1)
        // a final odd chunk whose pad byte the writer omitted
        if (p == formEnd + 1) p = formEnd
      }
      null // no COMM: not a decodable AIFF
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  private type InternalRowT = org.apache.spark.sql.catalyst.InternalRow

  private def fourcc(b: Array[Byte], p: Int, s: String): Boolean =
    b(p) == s.charAt(0).toByte && b(p + 1) == s.charAt(1).toByte &&
      b(p + 2) == s.charAt(2).toByte && b(p + 3) == s.charAt(3).toByte

  private def be32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  /** 80-bit IEEE extended → double: 1 sign, 15 exponent (bias 16383),
    * 64-bit mantissa with EXPLICIT integer bit. */
  private def extended80(b: Array[Byte], p: Int): Double = {
    val sign = (b(p) & 0x80) != 0
    val exp = ((b(p) & 0x7f) << 8) | (b(p + 1) & 0xff)
    var mant = 0L
    var i = 0
    while (i < 8) { mant = (mant << 8) | (b(p + 2 + i) & 0xff); i += 1 }
    if (exp == 0 && mant == 0L) return 0.0
    if (exp == 0x7fff) throw Bad // inf/nan rate: refuse
    // value = mant * 2^(exp - 16383 - 63)
    val v = java.lang.Math.scalb(
      // keep all 64 mantissa bits: split to avoid signed-long loss
      (mant >>> 11).toDouble * 2048.0 + (mant & 0x7ff).toDouble,
      exp - 16383 - 63)
    if (sign) -v else v
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(payload: Column): Column =
    ColumnShim.column(AiffMeta(ColumnShim.expression(payload)))
}
