package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ID3v2 text-frame extraction — the metadata TEXT of an audio
  * corpus (`mp3Meta` stops at the header census; titles/artists/albums
  * are what a training pipeline actually wants): parse the `ID3`
  * header (v2.2, v2.3 or v2.4, syncsafe tag size), walk the frames
  * (v2.2 3-char ids with 3-byte big-endian sizes, v2.3 4-char plain
  * big-endian, v2.4 syncsafe — per spec), and yield
  * every `T**`/`T***` text frame (TXXX's user-defined pairs included as
  * their raw description+value bytes) as `(frame_id, text)` with the
  * encoding byte honored: 0 latin1, 1 UTF-16 with BOM, 2 UTF-16BE,
  * 3 UTF-8; trailing NUL terminators stripped.
  *
  * Tag-level unsynchronisation (header flag 0x80 — common for v2.3
  * from older encoders) is REVERSED before the frame walk for v2.3
  * ONLY (every `FF 00` in the tag body collapses back to `FF`), so
  * unsynced v2.3 tags parse exactly instead of garbling silently.
  * v2.4 is different BY SPEC: its syncsafe frame sizes describe the
  * stored (still-unsynced) data, so a tag-wide collapse would
  * misalign any frame whose data contains `FF` bytes (a UTF-16 BOM
  * `FF FE` is enough) — instead the reversal runs PER FRAME, after
  * the size is read, when either the tag flag or the frame's own
  * unsync format flag (0x02) is set; a v2.4 data-length-indicator
  * prefix (format flag 0x01) is skipped before text decoding.
  *
  * Fail-closed null for: no `ID3` magic, unsupported major version,
  * a frame running past the tag, or a malformed size; the walk stops
  * cleanly at padding (NUL frame id) and is bounded by `maxFrames`.
  * Non-text frames (APIC art, COMM…) are skipped, not fatal.
  * Per-row bounded work, zero shuffle, codegen'd. */
case class Id3TextFrames(child: Expression, maxFrames: Int)
    extends UnaryExpression {
  require(maxFrames > 0, "frame walk bound must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"id3_text_frames expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("frame_id", StringType, nullable = false),
    StructField("text", StringType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    Id3TextFrames.compute(a.asInstanceOf[Array[Byte]], maxFrames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Id3TextFrames.compute($c, $maxFrames);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "id3_text_frames"
}

object Id3TextFrames {

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes0: Array[Byte], maxFrames: Int): GenericArrayData = {
    if (bytes0.length < 10 || bytes0(0) != 'I' || bytes0(1) != 'D' ||
      bytes0(2) != '3') return null
    val major = bytes0(3) & 0xff
    if (major != 2 && major != 3 && major != 4) return null
    val flags = bytes0(5) & 0xff
    // tag-level unsynchronisation (common in v2.3 from older encoders):
    // 0xFF 0x00 pairs had a 0x00 inserted after every 0xFF in the tag
    // body — reverse it before the frame walk, or v2.3 frame sizes and
    // text bytes come out silently garbled. v2.4 frame sizes describe
    // the STORED data, so the reversal there happens per frame below.
    val bytes =
      if ((flags & 0x80) == 0 || major == 4) bytes0
      else {
        val tagEnd0 = math.min(10 + (((bytes0(6) & 0x7f) << 21) |
          ((bytes0(7) & 0x7f) << 14) | ((bytes0(8) & 0x7f) << 7) |
          (bytes0(9) & 0x7f)), bytes0.length)
        val b = new java.io.ByteArrayOutputStream(bytes0.length)
        b.write(bytes0, 0, 10)
        var i = 10
        while (i < tagEnd0) {
          b.write(bytes0(i))
          if (bytes0(i) == 0xff.toByte && i + 1 < tagEnd0 &&
            bytes0(i + 1) == 0) i += 2
          else i += 1
        }
        // the de-unsynced body is shorter; the syncsafe size field
        // still describes the WIRE length — clamp via actual length
        b.toByteArray
      }
    val n = bytes.length
    def syncsafe(p: Int): Int =
      ((bytes(p) & 0x7f) << 21) | ((bytes(p + 1) & 0x7f) << 14) |
        ((bytes(p + 2) & 0x7f) << 7) | (bytes(p + 3) & 0x7f)
    def be32(p: Int): Long =
      ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
        ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
    val tagSize = syncsafe(6)
    val tagEnd = math.min(10 + tagSize, n)
    // v2.2 frames: 3-char ids + 3-byte big-endian sizes (6-byte
    // headers, no flags) — the oldest tags still in the wild
    val hdrLen = if (major == 2) 6 else 10
    val idLen = if (major == 2) 3 else 4
    val out = new java.util.ArrayList[Any]
    var pos = 10
    var steps = 0
    while (pos + hdrLen <= tagEnd && steps < maxFrames) {
      steps += 1
      if (bytes(pos) == 0) // padding starts: clean end
        return new GenericArrayData(out.toArray)
      val id = new String(bytes, pos, idLen,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      if (!id.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')))
        return null
      val fsize =
        if (major == 4) syncsafe(pos + 4).toLong
        else if (major == 3) be32(pos + 4)
        else ((bytes(pos + 3) & 0xffL) << 16) |
          ((bytes(pos + 4) & 0xffL) << 8) | (bytes(pos + 5) & 0xffL)
      if (fsize < 0 || pos + hdrLen + fsize > tagEnd) return null
      if (id.startsWith("T") && fsize >= 1) {
        // v2.4: reverse unsynchronisation PER FRAME (tag flag means
        // "every frame is unsynced"; frames can also opt in alone via
        // format flag 0x02), then skip the 4-byte data-length
        // indicator when format flag 0x01 announces one
        val fmtFlags = if (major == 4) bytes(pos + 9) & 0xff else 0
        var data: Array[Byte] =
          java.util.Arrays.copyOfRange(bytes, pos + hdrLen,
            pos + hdrLen + fsize.toInt)
        if (major == 4 && ((flags & 0x80) != 0 || (fmtFlags & 0x02) != 0)) {
          val b = new java.io.ByteArrayOutputStream(data.length)
          var i = 0
          while (i < data.length) {
            b.write(data(i))
            if (data(i) == 0xff.toByte && i + 1 < data.length &&
              data(i + 1) == 0) i += 2
            else i += 1
          }
          data = b.toByteArray
        }
        if (major == 4 && (fmtFlags & 0x01) != 0) {
          if (data.length < 4) return null
          data = java.util.Arrays.copyOfRange(data, 4, data.length)
        }
        val enc = if (data.length >= 1) data(0) & 0xff else -1
        val cs = enc match {
          case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
          case 1 => java.nio.charset.StandardCharsets.UTF_16 // BOM-led
          case 2 => java.nio.charset.StandardCharsets.UTF_16BE
          case 3 => java.nio.charset.StandardCharsets.UTF_8
          case _ => null
        }
        if (cs != null) {
          var text = new String(data, 1, data.length - 1, cs)
          // strip trailing NUL terminator(s)
          while (text.nonEmpty && text.charAt(text.length - 1) == 0)
            text = text.substring(0, text.length - 1)
          out.add(new GenericInternalRow(Array[Any](
            UTF8String.fromString(id), UTF8String.fromString(text))))
        }
      }
      pos += hdrLen + fsize.toInt
    }
    new GenericArrayData(out.toArray)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; the walk bound defaults to 256. */
  def apply(payload: Column, maxFrames: Int = 256): Column =
    ColumnShim.column(
      Id3TextFrames(ColumnShim.expression(payload), maxFrames))
}
