package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Matroska/WebM EBML census — the MP4-family's [[graft.ext.Multimodal]]
  * `mp4Meta` sibling for the other dominant web video container: one
  * bounded EBML element walk (IDs keep their length-marker bytes,
  * sizes strip them, per the public EBML spec) that reads the header
  * `DocType`, the `Segment → Info` timestamp scale (default
  * 1,000,000 ns) and float `Duration`, and every
  * `Tracks → TrackEntry`'s number, type and codec id. NO frame
  * decode — clusters and every other element are SKIPPED by their
  * declared sizes, so work is header-proportional regardless of
  * media size.
  *
  * Output struct: `(doctype, timescale_ns, duration_ms, tracks)`,
  * `tracks` ordered as stored with `track_type` labeled
  * video/audio/subtitle/other. `duration_ms` rounds
  * `Duration × scale / 10⁶`; 0 when the Info carries no duration (a
  * live-capture shape).
  *
  * FAIL-CLOSED NULL for non-EBML payloads, truncated or over-`maxElems`
  * walks, invalid VINT shapes, and unknown-size elements anywhere but
  * the Segment itself (an unknown-size cluster cannot be skipped
  * without frame parsing — refusing beats silently stopping early).
  * Per-row bounded work, zero shuffle, codegen'd. */
case class WebmMeta(child: Expression, maxElems: Int)
    extends UnaryExpression {
  require(maxElems > 0, "element walk bound must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"webm_meta expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("doctype", StringType, nullable = false),
    StructField("timescale_ns", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("tracks", ArrayType(StructType(Seq(
      StructField("track_num", LongType, nullable = false),
      StructField("track_type", StringType, nullable = false),
      StructField("codec_id", StringType, nullable = false))),
      containsNull = false), nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    WebmMeta.compute(a.asInstanceOf[Array[Byte]], maxElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WebmMeta.compute($c, $maxElems);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "webm_meta"
}

object WebmMeta {

  private object Bad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Cursor over the EBML bytes with the element-count bomb guard. */
  private final class Cur(val b: Array[Byte], var p: Int,
                          val maxElems: Int) {
    var elems = 0
    def step(): Unit = { elems += 1; if (elems > maxElems) throw Bad }

    /** Element ID: the length-marker byte KEPT (class A..D ids). */
    def id(): Long = {
      if (p >= b.length) throw Bad
      val h = b(p) & 0xff
      val n =
        if ((h & 0x80) != 0) 1
        else if ((h & 0x40) != 0) 2
        else if ((h & 0x20) != 0) 3
        else if ((h & 0x10) != 0) 4
        else throw Bad
      if (p + n > b.length) throw Bad
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
      p += n
      v
    }

    /** Element size: marker bit STRIPPED; -1 for the all-ones
      * unknown-size value. */
    def size(): Long = {
      if (p >= b.length) throw Bad
      val h = b(p) & 0xff
      var n = 1
      var mask = 0x80
      while (n <= 8 && (h & mask) == 0) { n += 1; mask >>= 1 }
      if (n > 8 || p + n > b.length) throw Bad
      var v = (h & (mask - 1)).toLong
      var allOnes = (h & (mask - 1)) == mask - 1
      var i = 1
      while (i < n) {
        v = (v << 8) | (b(p + i) & 0xffL)
        if ((b(p + i) & 0xff) != 0xff) allOnes = false
        i += 1
      }
      p += n
      if (allOnes) -1L else v
    }

    def uint(len: Long): Long = {
      if (len < 0 || len > 8 || p + len > b.length) throw Bad
      var v = 0L
      var i = 0
      while (i < len) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
      p += len.toInt
      v
    }

    def float(len: Long): Double = {
      if (len == 4) java.lang.Float.intBitsToFloat(uint(4).toInt).toDouble
      else if (len == 8) java.lang.Double.longBitsToDouble(uint(8))
      else throw Bad
    }

    def str(len: Long): String = {
      if (len < 0 || p + len > b.length) throw Bad
      var end = (p + len).toInt
      // EBML strings may be NUL-padded
      while (end > p && b(end - 1) == 0) end -= 1
      val s = new String(b, p, end - p,
        java.nio.charset.StandardCharsets.UTF_8)
      p += len.toInt
      s
    }

    def skip(len: Long): Unit = {
      if (len < 0 || p + len > b.length) throw Bad
      p += len.toInt
    }
  }

  private def typeLabel(t: Long): String = t match {
    case 1 => "video"
    case 2 => "audio"
    case 17 => "subtitle"
    case _ => "other"
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte], maxElems: Int): GenericInternalRow = {
    try {
      if (b == null || b.length < 8) return null
      if ((b(0) & 0xff) != 0x1A || (b(1) & 0xff) != 0x45 ||
        (b(2) & 0xff) != 0xDF || (b(3) & 0xff) != 0xA3) return null
      val c = new Cur(b, 0, maxElems)
      // EBML header: DocType within
      if (c.id() != 0x1A45DFA3L) return null
      val hdrLen = c.size()
      if (hdrLen < 0) return null
      val hdrEnd = c.p + hdrLen
      if (hdrEnd > b.length) return null
      var doctype = "matroska" // the EBML default when DocType absent
      while (c.p < hdrEnd) {
        c.step()
        val id = c.id()
        val len = c.size()
        if (len < 0) return null
        if (id == 0x4282L) doctype = c.str(len) else c.skip(len)
      }
      if (c.p != hdrEnd) return null
      // top level: Void elements allowed, then ONE Segment
      var segEnd = -1L
      var segSeen = false
      while (!segSeen) {
        if (c.p >= b.length) return null
        c.step()
        val id = c.id()
        val len = c.size()
        if (id == 0x18538067L) {
          segSeen = true
          segEnd = if (len < 0) b.length.toLong else c.p + len
          if (segEnd > b.length) return null
        } else if (id == 0xECL) { // Void
          if (len < 0) return null
          c.skip(len)
        } else return null
      }
      var timescale = 1000000L // EBML default: 1 ms per tick
      var durationTicks = -1.0
      val tracks = new java.util.ArrayList[Any]
      while (c.p < segEnd) {
        c.step()
        val id = c.id()
        val len = c.size()
        if (len < 0) return null // unknown-size child: cannot skip
        val end = c.p + len
        if (end > b.length) return null
        if (id == 0x1549A966L) { // Info
          while (c.p < end) {
            c.step()
            val iid = c.id()
            val ilen = c.size()
            if (ilen < 0) return null
            if (iid == 0x2AD7B1L) timescale = c.uint(ilen)
            else if (iid == 0x4489L) durationTicks = c.float(ilen)
            else c.skip(ilen)
          }
          if (c.p != end) return null
        } else if (id == 0x1654AE6BL) { // Tracks
          while (c.p < end) {
            c.step()
            val tid = c.id()
            val tlen = c.size()
            if (tlen < 0) return null
            if (tid == 0xAEL) { // TrackEntry
              val tEnd = c.p + tlen
              if (tEnd > b.length) return null
              var num = 0L
              var tpe = 0L
              var codec = ""
              while (c.p < tEnd) {
                c.step()
                val eid = c.id()
                val elen = c.size()
                if (elen < 0) return null
                if (eid == 0xD7L) num = c.uint(elen)
                else if (eid == 0x83L) tpe = c.uint(elen)
                else if (eid == 0x86L) codec = c.str(elen)
                else c.skip(elen)
              }
              if (c.p != tEnd) return null
              tracks.add(new GenericInternalRow(Array[Any](num,
                UTF8String.fromString(typeLabel(tpe)),
                UTF8String.fromString(codec))))
            } else c.skip(tlen)
          }
          if (c.p != end) return null
        } else c.skip(len) // clusters, cues, seek heads, tags …
      }
      if (c.p != segEnd) return null
      // bytes past the segment (trailing junk or a second segment
      // this census would silently miss): refuse
      if (c.p != b.length) return null
      if (timescale <= 0) return null
      val durMs =
        if (durationTicks < 0) 0L
        else math.round(durationTicks * timescale / 1000000.0)
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(doctype), timescale, durMs,
        new GenericArrayData(tracks.toArray)))
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 64k-element walk cap. */
  def apply(payload: Column, maxElems: Int = 1 << 16): Column =
    ColumnShim.column(WebmMeta(ColumnShim.expression(payload), maxElems))
}
