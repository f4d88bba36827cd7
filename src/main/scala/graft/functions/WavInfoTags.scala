package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WAV LIST/INFO tags — the third leg of the audio-metadata trio
  * next to [[Id3TextFrames]] (mp3) and [[FlacTags]] (flac): one
  * bounded RIFF chunk walk to the `LIST` chunk whose form is
  * `INFO`, then its sub-chunks — `INAM` title, `IART` artist,
  * `ICRD` date, `ICMT` comment, `ISFT` software and the rest of the
  * public INFO vocabulary — each a NUL-terminated text payload
  * (UTF-8 validated, latin1 fallback per the format's pre-Unicode
  * reality), emitted `(key, value)` in chunk order with the 4-char
  * fourcc verbatim as the key. Odd sizes padded per RIFF.
  *
  * FAIL-CLOSED NULL for non-WAV payloads or truncated chunks; a WAV
  * without a LIST/INFO chunk yields an EMPTY array (a real file,
  * just untagged). Per-row bounded work, zero shuffle, codegen'd. */
case class WavInfoTags(child: Expression, maxTags: Int)
    extends UnaryExpression {
  require(maxTags > 0, "tag cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_info_tags expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    WavInfoTags.compute(a.asInstanceOf[Array[Byte]], maxTags)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WavInfoTags.compute($c, $maxTags);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "wav_info_tags"
}

object WavInfoTags {

  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def cc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte], maxTags: Int): GenericArrayData = {
    try {
      if (b == null || b.length < 12) return null
      if (cc(b, 0) != "RIFF" || cc(b, 8) != "WAVE") return null
      val riffEnd = math.min(8L + le32(b, 4), b.length.toLong)
      val out = new java.util.ArrayList[Any]
      var p = 12L
      while (p + 8 <= riffEnd) {
        val tag = cc(b, p.toInt)
        val size = le32(b, p.toInt + 4)
        val dataAt = p + 8
        if (dataAt + size > riffEnd) return null // truncated chunk
        if (tag == "LIST" && size >= 4 && cc(b, dataAt.toInt) == "INFO") {
          var q = dataAt + 4
          val end = dataAt + size
          while (q + 8 <= end) {
            if (out.size >= maxTags) return null
            val key = cc(b, q.toInt)
            val len = le32(b, q.toInt + 4)
            if (q + 8 + len > end) return null
            // value: strip trailing NULs, UTF-8 first, latin1 fallback
            var vlen = len.toInt
            while (vlen > 0 && b((q + 8 + vlen - 1).toInt) == 0) vlen -= 1
            val raw = java.util.Arrays.copyOfRange(b, (q + 8).toInt,
              (q + 8 + vlen).toInt)
            val s = Utf8Text.compute(raw)
            val value =
              if (s != null) s.toString
              else new String(raw,
                java.nio.charset.StandardCharsets.ISO_8859_1)
            out.add(new GenericInternalRow(Array[Any](
              UTF8String.fromString(key), UTF8String.fromString(value))))
            q += 8 + len + (len & 1L) // RIFF pads odd sizes
          }
        }
        p = dataAt + size + (size & 1L)
      }
      // trailing junk: refuse. p == riffEnd + 1 can ONLY arise from
      // the final odd-sized chunk's RIFF pad byte (dataAt + size <=
      // riffEnd is checked every iteration) — some real-world writers
      // omit that last pad, so accept the one-byte overshoot
      if (p != riffEnd && p != riffEnd + 1) return null
      new GenericArrayData(out.toArray)
    } catch {
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 4096-tag cap. */
  def apply(payload: Column, maxTags: Int = 4096): Column =
    ColumnShim.column(WavInfoTags(ColumnShim.expression(payload), maxTags))
}
