package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Ogg container census — the audio tier's fourth leg next to
  * [[Mp3Duration]]/[[FlacTags]]/[[WavInfoTags]], covering the
  * container Opus voice data and Vorbis music ship in: one bounded
  * `OggS` page walk with every page CRC VERIFIED (Ogg's own CRC-32,
  * polynomial 0x04c11db7 forward, zero init/xor, computed with the
  * checksum field zeroed), lacing-aware packet assembly for the two
  * header packets, and duration from the LAST defined granule
  * position — PCM samples over the identification header's rate for
  * Vorbis, the 48 kHz granule clock minus `OpusHead` pre-skip for
  * Opus.
  *
  * Output struct: `(codec, channels, sample_rate, duration_ms,
  * tags)` — `tags` are the comment header's Vorbis comments
  * (`\x03vorbis` / `OpusTags`, the [[FlacTags]] parser: keys
  * uppercased, `=`-less comments skipped); a stream whose comment
  * packet never completes is a real-but-untagged file (empty array).
  * `sample_rate` is the Vorbis rate or Opus original-input rate;
  * Opus duration always uses the 48 kHz granule contract.
  *
  * FAIL-CLOSED NULL for non-Ogg payloads, any page CRC mismatch or
  * truncation, multiplexed/chained streams (a second BOS page),
  * unknown codecs, or malformed comments. The walk is bounded by
  * `maxPages`. Per-row bounded work, zero shuffle, codegen'd. */
case class OggMeta(child: Expression, maxPages: Int, maxTags: Int)
    extends UnaryExpression {
  require(maxPages > 0, "page walk bound must be positive")
  require(maxTags > 0, "tag cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ogg_meta expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("codec", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("tags", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", StringType, nullable = false))),
      containsNull = false), nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    OggMeta.compute(a.asInstanceOf[Array[Byte]], maxPages, maxTags)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.OggMeta.compute($c, $maxPages, $maxTags);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ogg_meta"
}

object OggMeta {

  /** Ogg CRC-32: 0x04c11db7 forward, no reflection, zero init/xor. */
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def le64(b: Array[Byte], p: Int): Long =
    le32(b, p) | (le32(b, p + 4) << 32)

  /** Page CRC over `b[p, p+len)` with the 4 checksum bytes at
    * `p+22..p+25` treated as zero. */
  private def pageCrc(b: Array[Byte], p: Int, len: Int): Long = {
    var crc = 0
    var i = 0
    while (i < len) {
      val v = if (i >= 22 && i < 26) 0 else b(p + i) & 0xff
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ v) & 0xff)
      i += 1
    }
    crc & 0xFFFFFFFFL
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte], maxPages: Int, maxTags: Int): GenericInternalRow = {
    try {
      if (b == null || b.length < 27) return null
      if (b(0) != 'O' || b(1) != 'g' || b(2) != 'g' || b(3) != 'S') return null
      // header-packet assembly: packets 0 (id) and 1 (comment)
      val pkt = Array[Array[Byte]](null, null)
      var cur = new java.io.ByteArrayOutputStream()
      var pktIdx = 0
      var lastGranule = -1L
      var p = 0
      var pages = 0
      var serial = 0L
      while (p < b.length) {
        pages += 1
        if (pages > maxPages) return null // bomb guard
        if (p + 27 > b.length) return null // truncated header
        if (b(p) != 'O' || b(p + 1) != 'g' || b(p + 2) != 'g' ||
          b(p + 3) != 'S') return null
        if (b(p + 4) != 0) return null // stream structure version
        val headerType = b(p + 5) & 0xff
        val granule = le64(b, p + 6)
        val pageSerial = le32(b, p + 14)
        val crc = le32(b, p + 22)
        val nsegs = b(p + 26) & 0xff
        if (p + 27 + nsegs > b.length) return null
        var payLen = 0
        var s = 0
        while (s < nsegs) { payLen += b(p + 27 + s) & 0xff; s += 1 }
        val pageLen = 27 + nsegs + payLen
        if (p + pageLen > b.length) return null // truncated payload
        if (pageCrc(b, p, pageLen) != crc) return null // CRC mismatch
        if (pages == 1) {
          if ((headerType & 2) == 0) return null // first page must be BOS
          serial = pageSerial
        } else {
          if ((headerType & 2) != 0) return null // chained/multiplexed
          if (pageSerial != serial) return null
        }
        if (granule != -1L) lastGranule = granule
        // lacing: segments of 255 continue the packet, < 255 end it
        if (pktIdx < 2) {
          var at = p + 27 + nsegs
          s = 0
          while (s < nsegs && pktIdx < 2) {
            val segLen = b(p + 27 + s) & 0xff
            cur.write(b, at, segLen)
            at += segLen
            if (segLen < 255) {
              pkt(pktIdx) = cur.toByteArray
              cur = new java.io.ByteArrayOutputStream()
              pktIdx += 1
            }
            s += 1
          }
        }
        p += pageLen
      }
      val id = pkt(0)
      if (id == null) return null
      var codec: String = null
      var channels = 0
      var rate = 0L
      var preskip = 0L
      if (id.length >= 30 && id(0) == 1 && id(1) == 'v' && id(2) == 'o' &&
        id(3) == 'r' && id(4) == 'b' && id(5) == 'i' && id(6) == 's') {
        codec = "vorbis"
        channels = id(11) & 0xff
        rate = le32(id, 12)
        if (rate <= 0) return null
      } else if (id.length >= 19 && id(0) == 'O' && id(1) == 'p' &&
        id(2) == 'u' && id(3) == 's' && id(4) == 'H' && id(5) == 'e' &&
        id(6) == 'a' && id(7) == 'd') {
        codec = "opus"
        channels = id(9) & 0xff
        preskip = (id(10) & 0xffL) | ((id(11) & 0xffL) << 8)
        rate = le32(id, 12) // original input rate, informational
      } else return null // unknown codec: refuse, never guess
      // comment header: \x03vorbis / OpusTags + Vorbis comments
      var tags: java.util.ArrayList[Any] = new java.util.ArrayList[Any]
      val cm = pkt(1)
      if (cm != null) {
        val off =
          if (codec == "vorbis") {
            if (cm.length < 7 || cm(0) != 3 || cm(1) != 'v' ||
              cm(2) != 'o' || cm(3) != 'r' || cm(4) != 'b' ||
              cm(5) != 'i' || cm(6) != 's') return null
            7
          } else {
            if (cm.length < 8 || cm(0) != 'O' || cm(1) != 'p' ||
              cm(2) != 'u' || cm(3) != 's' || cm(4) != 'T' ||
              cm(5) != 'a' || cm(6) != 'g' || cm(7) != 's') return null
            8
          }
        tags = FlacTags.parseVorbisComments(cm, off, cm.length, maxTags)
        if (tags == null) return null
      }
      val durationMs =
        if (lastGranule < 0) 0L
        else if (codec == "vorbis") lastGranule * 1000L / rate
        else math.max(0L, lastGranule - preskip) * 1000L / 48000L
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(codec), channels, rate, durationMs,
        new GenericArrayData(tags.toArray)))
    } catch {
      case _: ArrayIndexOutOfBoundsException => null
      case _: IndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 64k-page walk, 4096-tag caps. */
  def apply(payload: Column, maxPages: Int = 1 << 16,
            maxTags: Int = 4096): Column =
    ColumnShim.column(
      OggMeta(ColumnShim.expression(payload), maxPages, maxTags))
}
