package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MP3 duration — the missing duration fact for the dominant audio
  * crawl format (WAV and FLAC carry exact sample counts; MP3 needs
  * the VBR header or frame arithmetic): skip a leading ID3v2 tag
  * (synchsafe size, footer flag honored), parse the first MPEG1
  * Layer III frame header (the same crawl-dominant contract as
  * `mp3Meta`), then:
  *
  *   - a `Xing`/`Info` tag at the side-info offset (17 bytes mono,
  *     32 otherwise, after the 4-byte header) with the FRAMES flag
  *     set gives the exact frame count — the LAME/VBR shape
  *   - else a `VBRI` tag at the Fhg fixed offset (32 bytes after the
  *     header) gives it at its +14 frames field
  *   - else a FULL FRAME WALK (each frame's own bitrate + padding
  *     bit sizes it — exact even for header-less VBR), counted only
  *     when the walk lands exactly on the payload end (an ID3v1
  *     `TAG` trailer accepted)
  *   - else CBR arithmetic: `floor(payload_after_tag / frame_size)`
  *     with `frame_size = 144·bitrate/sample_rate` — the constant-
  *     bitrate estimate every player uses
  *
  * `duration_ms = frames · 1152 · 1000 / sample_rate` (1152 samples
  * per MPEG1 Layer III frame). Output struct
  * `(frames, duration_ms, method ∈ xing|vbri|walk|cbr)`; NULL when no
  * valid first frame parses (other MPEG versions/layers, free-format
  * bitrate, truncation — the fail-closed contract). Fixed-offset
  * byte reads, zero shuffle, codegen'd. */
case class Mp3Duration(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mp3_duration expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("method", StringType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    Mp3Duration.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Mp3Duration.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "mp3_duration"
}

object Mp3Duration {

  private val Bitrates =
    Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val SampleRates = Array(44100, 48000, 32000)

  private def be32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  /** The per-row kernel — public static so generated code can call
    * it. Null when no valid MPEG1 Layer III first frame parses. */
  def compute(b: Array[Byte]): GenericInternalRow = {
    val n = b.length
    // ID3v2 skip: "ID3" + 2 version bytes + flags + synchsafe size;
    // the footer flag (0x10) adds 10 trailing bytes to the tag
    var start = 0
    if (n >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      start = 10 + size + (if ((b(5) & 0x10) != 0) 10 else 0)
    }
    if (start < 0 || start + 4 > n) return null
    val h1 = b(start) & 0xff
    val h2 = b(start + 1) & 0xff
    val h3 = b(start + 2) & 0xff
    val h4 = b(start + 3) & 0xff
    if (h1 != 0xff || (h2 >>> 5) != 7) return null
    if (((h2 >>> 3) & 3) != 3 || ((h2 >>> 1) & 3) != 1) return null // MPEG1 L3
    val brIdx = h3 >>> 4
    val srIdx = (h3 >>> 2) & 3
    if (brIdx < 1 || brIdx > 14 || srIdx > 2) return null
    val bitrate = Bitrates(brIdx - 1)
    val sampleRate = SampleRates(srIdx)
    val mono = (h4 >>> 6) == 3
    def mk(frames: Long, method: String): GenericInternalRow =
      new GenericInternalRow(Array[Any](frames,
        frames * 1152L * 1000L / sampleRate,
        UTF8String.fromString(method)))
    // Xing/Info at the side-info offset
    val xingAt = start + 4 + (if (mono) 17 else 32)
    val xingSig = xingAt + 8 <= n &&
      ((b(xingAt) == 'X' && b(xingAt + 1) == 'i' && b(xingAt + 2) == 'n' &&
        b(xingAt + 3) == 'g') ||
        (b(xingAt) == 'I' && b(xingAt + 1) == 'n' && b(xingAt + 2) == 'f' &&
          b(xingAt + 3) == 'o'))
    if (xingSig) {
      val flags = be32(b, xingAt + 4)
      if ((flags & 1L) != 0 && xingAt + 12 <= n)
        return mk(be32(b, xingAt + 8), "xing")
    }
    // VBRI at the FhG fixed 32-byte offset
    val vbriAt = start + 4 + 32
    if (vbriAt + 18 <= n && b(vbriAt) == 'V' && b(vbriAt + 1) == 'B' &&
      b(vbriAt + 2) == 'R' && b(vbriAt + 3) == 'I')
      return mk(be32(b, vbriAt + 14), "vbri")
    // a FULL FRAME WALK — exact even for header-less VBR: each
    // frame's own bitrate + padding bit sizes it; counts only when
    // the walk lands EXACTLY on the payload end (an optional 128-byte
    // ID3v1 `TAG` trailer accepted), else falls to the estimate
    locally {
      var p = start
      var count = 0L
      var ok = true
      var done = false
      while (ok && !done) {
        if (p == n || (n - p == 128 && p + 3 <= n &&
          b(p) == 'T' && b(p + 1) == 'A' && b(p + 2) == 'G')) done = true
        else if (p + 4 > n) ok = false
        else {
          val f1 = b(p) & 0xff
          val f2 = b(p + 1) & 0xff
          val f3 = b(p + 2) & 0xff
          if (f1 != 0xff || (f2 >>> 5) != 7 || ((f2 >>> 3) & 3) != 3 ||
            ((f2 >>> 1) & 3) != 1) ok = false
          else {
            val bi = f3 >>> 4
            val si = (f3 >>> 2) & 3
            if (bi < 1 || bi > 14 || si != srIdx) ok = false
            else {
              val fs = 144L * Bitrates(bi - 1) * 1000L / sampleRate +
                ((f3 >>> 1) & 1)
              if (fs <= 4) ok = false
              else {
                p += fs.toInt
                count += 1
              }
            }
          }
        }
      }
      // a flag-less Xing/Info tag frame (signature present but no
      // FRAMES flag — we fell through to the walk) is still a real
      // frame the walk counts; players skip it, so subtract it here
      if (ok && count > 0)
        return mk(if (xingSig) count - 1 else count, "walk")
    }
    // CBR arithmetic over the audio bytes
    val frameSize = 144L * bitrate * 1000L / sampleRate
    if (frameSize <= 0) return null
    mk((n - start).toLong / frameSize, "cbr")
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(payload: Column): Column =
    ColumnShim.column(Mp3Duration(ColumnShim.expression(payload)))
}
