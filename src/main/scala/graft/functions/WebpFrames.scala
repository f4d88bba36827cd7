package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WebP ANIMATION census — [[GifFrames]]' sibling for the other
  * animated web image format (the container is public RIFF): one
  * bounded chunk walk over the `RIFF....WEBP` stream counting `ANMF`
  * frames, summing their 24-bit millisecond durations, and reading
  * the `ANIM` chunk's 16-bit loop count (0 = forever per the spec;
  * -1 reported when the file is not animated). Static files (lossy
  * `VP8 `, lossless `VP8L`, or an extended `VP8X` without the
  * animation bit) report one frame. Frame pixel data is never
  * decoded — VP8 entropy decoding is a genuine codec and stays out
  * of scope; this is the animated-vs-static router and duration
  * fact.
  *
  * Output struct: `(n_frames, total_duration_ms, loop_count,
  * variant ∈ vp8|vp8l|vp8x)`.
  *
  * FAIL-CLOSED NULL for non-WebP signatures, truncated chunks (odd
  * sizes padded per RIFF), an animated file without an `ANIM`
  * chunk, or a walk past `maxChunks`. Per-row bounded work, zero
  * shuffle, codegen'd. */
case class WebpFrames(child: Expression, maxChunks: Int)
    extends UnaryExpression {
  require(maxChunks > 0, "chunk cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"webp_frames expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_frames", IntegerType, nullable = false),
    StructField("total_duration_ms", LongType, nullable = false),
    StructField("loop_count", IntegerType, nullable = false),
    StructField("variant", StringType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    WebpFrames.compute(a.asInstanceOf[Array[Byte]], maxChunks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WebpFrames.compute($c, $maxChunks);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "webp_frames"
}

object WebpFrames {

  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def le24(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) | ((b(p + 2) & 0xffL) << 16)

  private def cc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte], maxChunks: Int): GenericInternalRow = {
    try {
      if (b == null || b.length < 20) return null
      if (cc(b, 0) != "RIFF" || cc(b, 8) != "WEBP") return null
      val riffEnd = math.min(8L + le32(b, 4), b.length.toLong)
      var p = 12L
      var variant: String = null
      var animated = false
      var loop = -1
      var frames = 0
      var duration = 0L
      var sawAnim = false
      var chunks = 0
      while (p + 8 <= riffEnd) {
        chunks += 1
        if (chunks > maxChunks) return null
        val tag = cc(b, p.toInt)
        val size = le32(b, p.toInt + 4)
        val dataAt = p + 8
        if (dataAt + size > riffEnd) return null // truncated chunk
        tag match {
          case "VP8 " => if (variant == null) variant = "vp8"
          case "VP8L" => if (variant == null) variant = "vp8l"
          case "VP8X" =>
            if (size < 10) return null
            variant = "vp8x"
            animated = (b(dataAt.toInt) & 0x02) != 0
          case "ANIM" =>
            if (size < 6) return null
            sawAnim = true
            loop = ((b(dataAt.toInt + 4) & 0xff) |
              ((b(dataAt.toInt + 5) & 0xff) << 8))
          case "ANMF" =>
            if (size < 16) return null
            frames += 1
            duration += le24(b, dataAt.toInt + 12)
          case _ => () // ALPH, ICCP, EXIF, XMP: skipped
        }
        p = dataAt + size + (size & 1L) // RIFF pads odd sizes
      }
      if (variant == null) return null
      if (animated && !sawAnim) return null // spec: ANIM is mandatory
      val n = if (animated) frames else 1
      if (animated && frames == 0) return null
      new GenericInternalRow(Array[Any](n,
        if (animated) duration else 0L,
        if (animated) loop else -1,
        UTF8String.fromString(variant)))
    } catch {
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 64k-chunk walk cap. */
  def apply(payload: Column, maxChunks: Int = 1 << 16): Column =
    ColumnShim.column(WebpFrames(ColumnShim.expression(payload), maxChunks))
}
