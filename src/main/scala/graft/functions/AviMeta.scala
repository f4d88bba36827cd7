package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** AVI container census — the RIFF sibling of [[WebmMeta]]'s EBML
  * walk, completing the video-container trio (MP4 family / WebM /
  * AVI) a media routing pipeline needs: the `RIFF…AVI ` chunk walk
  * into `LIST hdrl`, the `avih` MainAVIHeader (frame period, total
  * frames, declared streams, pixel dimensions) and every
  * `LIST strl` stream's `strh` header (fccType `vids`/`auds`/…,
  * handler fourcc, dwScale/dwRate clock, dwLength samples).
  *
  * duration_ms comes from the first VIDEO stream's own clock
  * (`dwLength * dwScale * 1000 / dwRate` — the authoritative
  * number players use), falling back to
  * `dwTotalFrames * dwMicroSecPerFrame / 1000` when no usable video
  * stream header exists. `movi` payloads are SKIPPED BY SIZE — the
  * walk is header-proportional no matter how large the file.
  *
  * Fails closed (null) for: bad RIFF/AVI magic, truncated chunk
  * walk, a chunk overrunning the RIFF window, no `avih`. Odd-sized
  * chunks consume their RIFF pad byte; a final chunk whose pad the
  * writer omitted is accepted (the WavInfoTags contract). Per-row
  * bounded work, zero shuffle, codegen'd. */
case class AviMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"avi_meta expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = AviMeta.schema
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    AviMeta.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AviMeta.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "avi_meta"
}

object AviMeta {

  private[functions] val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("total_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_streams", IntegerType, nullable = false),
    StructField("tracks", ArrayType(StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("handler", StringType, nullable = false),
      StructField("rate", LongType, nullable = false),
      StructField("scale", LongType, nullable = false),
      StructField("length", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  private object Bad extends Exception with scala.util.control.NoStackTrace

  private val MaxChunks = 4096

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte]): InternalRow = {
    try {
      if (b == null || b.length < 24) return null
      if (!fourcc(b, 0, "RIFF") || !fourcc(b, 8, "AVI ")) return null
      val riffEnd = math.min(8L + u32(b, 4), b.length.toLong).toInt
      // MainAVIHeader fields
      var usPerFrame = -1L
      var totalFrames = -1L
      var declaredStreams = -1
      var w = -1
      var h = -1
      val tracks = new java.util.ArrayList[Any]
      var vidRate = -1L
      var vidScale = -1L
      var vidLength = -1L

      def walk(from: Int, to: Int, depth: Int, budget: Array[Int]): Unit = {
        if (depth > 4) throw Bad
        var p = from
        while (p + 8 <= to) {
          budget(0) -= 1
          if (budget(0) < 0) throw Bad
          val size = u32(b, p + 4)
          val dataAt = p + 8
          // the chunk DATA must fit the window; a final chunk whose
          // PAD byte the writer omitted is fine — the pad advance
          // overshoots `to` and the loop simply ends
          if (size < 0 || dataAt + size > to) throw Bad
          if (fourcc(b, p, "LIST")) {
            if (size < 4) throw Bad
            // recurse into hdrl/strl; movi skipped by size
            if (fourcc(b, dataAt, "hdrl") || fourcc(b, dataAt, "strl"))
              walk(dataAt + 4, dataAt + size.toInt, depth + 1, budget)
          } else if (fourcc(b, p, "avih")) {
            if (size < 40) throw Bad
            usPerFrame = u32(b, dataAt)
            totalFrames = u32(b, dataAt + 16)
            declaredStreams = u32(b, dataAt + 24).toInt
            w = u32(b, dataAt + 32).toInt
            h = u32(b, dataAt + 36).toInt
          } else if (fourcc(b, p, "strh")) {
            if (size < 40) throw Bad
            val kind = ascii(b, dataAt)
            val handler = ascii(b, dataAt + 4)
            val scale = u32(b, dataAt + 20)
            val rate = u32(b, dataAt + 24)
            val length = u32(b, dataAt + 32)
            tracks.add(new GenericInternalRow(Array[Any](
              UTF8String.fromString(kind), UTF8String.fromString(handler),
              rate, scale, length)))
            if (kind == "vids" && vidRate < 0 && rate > 0) {
              vidRate = rate; vidScale = scale; vidLength = length
            }
          }
          var next = dataAt + size.toInt
          if ((size & 1L) == 1L) next += 1 // RIFF pad
          if (next <= p) throw Bad
          p = next
        }
      }
      walk(12, riffEnd, 0, Array(MaxChunks))
      if (usPerFrame < 0) return null // no avih: refuse
      val durMs =
        if (vidRate > 0) vidLength * vidScale * 1000L / vidRate
        else totalFrames * usPerFrame / 1000L
      new GenericInternalRow(Array[Any](
        w, h, totalFrames, durMs,
        if (declaredStreams >= 0) declaredStreams else tracks.size(),
        new GenericArrayData(tracks.toArray)))
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], p: Int, s: String): Boolean =
    p + 4 <= b.length && b(p) == s.charAt(0).toByte &&
      b(p + 1) == s.charAt(1).toByte && b(p + 2) == s.charAt(2).toByte &&
      b(p + 3) == s.charAt(3).toByte

  /** Four printable bytes as ASCII; non-printables become '?'. */
  private def ascii(b: Array[Byte], p: Int): String = {
    val sb = new java.lang.StringBuilder(4)
    var i = 0
    while (i < 4) {
      val c = b(p + i) & 0xff
      sb.append(if (c >= 0x20 && c < 0x7f) c.toChar else '?')
      i += 1
    }
    sb.toString
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(payload: Column): Column =
    ColumnShim.column(AviMeta(ColumnShim.expression(payload)))
}
