package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MP4/ISO-BMFF per-TRACK sample-table census — the grain below the
  * container metadata `mp4Meta` surfaces: what a video-corpus
  * pipeline actually needs to cost a file (how many samples, how
  * many bytes of which media kind, at what timescale) without
  * decoding any codec. One row per `trak`:
  *
  *   - `track_id`, media `handler` (vide/soun/text/…), `timescale`,
  *     `duration_units` and ISO-639 `lang` from `tkhd`/`mdhd`
  *     (versions 0 AND 1)
  *   - `n_samples`, `total_bytes`, `max_sample` from `stsz` (both
  *     the uniform-size and per-sample-table layouts)
  *   - `n_chunks` from `stco` or `co64`
  *   - `stts_units` — the sum of count×delta over the time-to-sample
  *     table, the decode-independent duration cross-check
  *
  * The box walk verifies every declared size against its container
  * bound (64-bit `largesize` accepted); a lying size, a truncated
  * table, or a missing `moov` fails the whole file closed (null).
  * Unknown boxes are skipped structurally — codec payloads are never
  * read.
  *
  * Reference behavior anchor: oracle-schema-copy streams LOB columns
  * opaquely (AbstractLoadRowsCallback.java:28); the census follows
  * the public ISO 14496-12 layout alone. */
case class Mp4Tracks(child: Expression, maxTracks: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mp4_tracks needs binary input, got ${t.sql}")
  }

  override def dataType: DataType =
    ArrayType(Mp4Tracks.TrackSchema, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    Mp4Tracks.compute(a.asInstanceOf[Array[Byte]], maxTracks)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Mp4Tracks.compute($c, $maxTracks);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "mp4_tracks"
}

object Mp4Tracks {

  val TrackSchema: StructType = StructType(Seq(
    StructField("track_id", LongType, nullable = true),
    StructField("handler", StringType, nullable = true),
    StructField("timescale", LongType, nullable = true),
    StructField("duration_units", LongType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("total_bytes", LongType, nullable = true),
    StructField("max_sample", LongType, nullable = true),
    StructField("n_chunks", LongType, nullable = true),
    StructField("stts_units", LongType, nullable = true)))

  private object Bad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private def be(b: Array[Byte], pos: Long, len: Int): Long = {
    if (pos < 0 || pos + len > b.length) throw Bad
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(pos.toInt + i) & 0xffL); i += 1 }
    v
  }

  /** (dataStart, boxEnd) of the box at `pos`; honors largesize. */
  private def boxBounds(b: Array[Byte], pos: Long,
                        limit: Long): (Long, Long) = {
    if (pos + 8 > limit) throw Bad
    var size = be(b, pos, 4)
    var hdr = 8L
    if (size == 1) { size = be(b, pos + 8, 8); hdr = 16L }
    else if (size == 0) size = limit - pos // box runs to container end
    if (size < hdr || pos + size > limit) throw Bad
    (pos + hdr, pos + size)
  }

  private def tagAt(b: Array[Byte], pos: Long): String = {
    if (pos + 8 > b.length) throw Bad
    new String(b, pos.toInt + 4, 4,
      java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Per-row kernel — public static for generated code. */
  def compute(b: Array[Byte], maxTracks: Int): GenericArrayData = {
    try {
      // locate moov among the top-level boxes
      var pos = 0L
      var moov: (Long, Long) = null
      var steps = 0
      while (pos + 8 <= b.length && moov == null && steps < 1024) {
        steps += 1
        val tag = tagAt(b, pos)
        val (d0, end) = boxBounds(b, pos, b.length)
        // the first top-level box must be a plausible BMFF opener
        if (pos == 0 && tag != "ftyp" && tag != "moov" && tag != "mdat" &&
          tag != "free" && tag != "skip" && tag != "wide" &&
          tag != "styp") return null
        if (tag == "moov") moov = (d0, end)
        pos = end
      }
      if (moov == null) return null
      val rows = new java.util.ArrayList[Any]
      var p = moov._1
      while (p + 8 <= moov._2 && rows.size < maxTracks) {
        val tag = tagAt(b, p)
        val (d0, end) = boxBounds(b, p, moov._2)
        if (tag == "trak") rows.add(trackRow(b, d0, end))
        p = end
      }
      if (rows.isEmpty) return null // a moov with no tracks is a lie
      new GenericArrayData(rows.toArray)
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  private def trackRow(b: Array[Byte], trakStart: Long,
                       trakEnd: Long): GenericInternalRow = {
    var trackId: Any = null
    var handler: Any = null
    var timescale: Any = null
    var duration: Any = null
    var lang: Any = null
    var nSamples: Any = null
    var totalBytes: Any = null
    var maxSample: Any = null
    var nChunks: Any = null
    var sttsUnits: Any = null

    def walk(from: Long, until: Long): Unit = {
      var p = from
      while (p + 8 <= until) {
        val tag = tagAt(b, p)
        val (d0, end) = boxBounds(b, p, until)
        tag match {
          case "mdia" | "minf" | "stbl" => walk(d0, end)
          case "tkhd" =>
            val v = be(b, d0, 1)
            trackId =
              if (v == 0) be(b, d0 + 12, 4)
              else if (v == 1) be(b, d0 + 20, 4)
              else throw Bad
          case "mdhd" =>
            val v = be(b, d0, 1)
            val (ts, du, langAt) =
              if (v == 0) (be(b, d0 + 12, 4), be(b, d0 + 16, 4), d0 + 20)
              else if (v == 1) (be(b, d0 + 20, 4), be(b, d0 + 24, 8),
                d0 + 32)
              else throw Bad
            timescale = ts
            duration = du
            val packed = be(b, langAt, 2).toInt
            // three 5-bit ISO-639 letters, 0x60-based
            val c1 = ((packed >> 10) & 0x1f) + 0x60
            val c2 = ((packed >> 5) & 0x1f) + 0x60
            val c3 = (packed & 0x1f) + 0x60
            lang = UTF8String.fromString(
              s"${c1.toChar}${c2.toChar}${c3.toChar}")
          case "hdlr" =>
            handler = UTF8String.fromBytes(
              java.util.Arrays.copyOfRange(b, (d0 + 8).toInt,
                (d0 + 12).toInt))
          case "stsz" =>
            val uniform = be(b, d0 + 4, 4)
            val count = be(b, d0 + 8, 4)
            if (count > (until - d0) && uniform == 0) throw Bad
            nSamples = count
            if (uniform != 0) {
              totalBytes = uniform * count
              maxSample = if (count > 0) uniform else 0L
            } else {
              if (d0 + 12 + count * 4 > end) throw Bad
              var sum = 0L
              var mx = 0L
              var i = 0L
              while (i < count) {
                val sz = be(b, d0 + 12 + i * 4, 4)
                sum += sz
                if (sz > mx) mx = sz
                i += 1
              }
              totalBytes = sum
              maxSample = mx
            }
          case "stco" =>
            val count = be(b, d0 + 4, 4)
            if (d0 + 8 + count * 4 > end) throw Bad
            nChunks = count
          case "co64" =>
            val count = be(b, d0 + 4, 4)
            if (d0 + 8 + count * 8 > end) throw Bad
            nChunks = count
          case "stts" =>
            val count = be(b, d0 + 4, 4)
            if (d0 + 8 + count * 8 > end) throw Bad
            var sum = 0L
            var i = 0L
            while (i < count) {
              sum += be(b, d0 + 8 + i * 8, 4) * be(b, d0 + 12 + i * 8, 4)
              i += 1
            }
            sttsUnits = sum
          case _ => () // codec configs, edts, udta: skipped
        }
        p = end
      }
    }
    walk(trakStart, trakEnd)
    new GenericInternalRow(Array[Any](trackId, handler, timescale,
      duration, lang, nSamples, totalBytes, maxSample, nChunks,
      sttsUnits))
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  def apply(payload: Column, maxTracks: Int = 64): Column =
    ColumnShim.column(Mp4Tracks(ColumnShim.expression(payload), maxTracks))
}
