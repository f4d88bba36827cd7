package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native perceptual dHash over GIF bytes — the fourth leg of the
  * cross-format image near-dup family ([[BmpDhash]], [[PngDhash]],
  * [[JpegDhash]]): the FIRST image descriptor's pixel data decodes
  * through the public-spec GIF LZW variant (variable code width
  * 3..12 bits LSB-first, clear/end codes, sub-block framing), colors
  * resolve through the local-else-global color table, interlaced
  * images deinterlace per the spec's four passes, and the sampled
  * 9×8 grid / integer luma `299·R + 587·G + 114·B` / gradient-bit
  * packing are EXACTLY [[BmpDhash]]'s — so a GIF, a PNG and a BMP of
  * the same pixels hash EQUAL and near-dup together through one
  * `Dedup.hash64NearDupPairs` pass.
  *
  * Animation frames after the first are IGNORED by contract (the
  * perceptual identity of a web GIF is its first frame); the
  * transparent-index flag is ignored — the palette color underneath
  * is what hashes, matching how the frame renders over itself.
  *
  * Fails closed (null) for: non-GIF signatures, a first descriptor
  * without any color table, truncated blocks or code streams, LZW
  * codes past the dictionary, fewer decoded pixels than the
  * descriptor promises, degenerate dimensions, and images above
  * `MaxPixels` (2^22) — a hostile payload cannot OOM an executor. */
case class GifDhash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gif_dhash expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    GifDhash.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.functions.GifDhash.compute($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "gif_dhash"
}

object GifDhash {

  private val MaxPixels = 1 << 22

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte]): java.lang.Long = {
    try {
      if (b == null || b.length < 14) return null
      if (b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
        (b(4) != '7' && b(4) != '9') || b(5) != 'a') return null
      var p = 6
      val packed = b(p + 4) & 0xff
      var gctAt = -1
      var gctSize = 0
      p += 7
      if ((packed & 0x80) != 0) {
        gctSize = 2 << (packed & 7)
        gctAt = p
        p += 3 * gctSize
      }
      // walk blocks to the FIRST image descriptor
      while (p < b.length && (b(p) & 0xff) == 0x21) {
        p += 2 // extension introducer + label
        var len = b(p) & 0xff
        while (len != 0) {
          p += 1 + len
          if (p >= b.length) return null
          len = b(p) & 0xff
        }
        p += 1
      }
      if (p >= b.length || (b(p) & 0xff) != 0x2C) return null
      if (p + 10 > b.length) return null
      val w = le16(b, p + 5)
      val h = le16(b, p + 7)
      val ipacked = b(p + 9) & 0xff
      val interlaced = (ipacked & 0x40) != 0
      p += 10
      var ctAt = gctAt
      var ctSize = gctSize
      if ((ipacked & 0x80) != 0) {
        ctSize = 2 << (ipacked & 7)
        ctAt = p
        p += 3 * ctSize
      }
      if (ctAt < 0 || w < 2 || h < 2 || w.toLong * h > MaxPixels) return null
      if (ctAt + 3 * ctSize > b.length || p >= b.length) return null
      // concatenate the code sub-blocks
      val minCode = b(p) & 0xff
      if (minCode < 2 || minCode > 8) return null
      p += 1
      val data = new java.io.ByteArrayOutputStream()
      var len = b(p) & 0xff
      while (len != 0) {
        if (p + 1 + len > b.length) return null
        data.write(b, p + 1, len)
        p += 1 + len
        if (p >= b.length) return null
        len = b(p) & 0xff
      }
      val code = data.toByteArray
      // GIF LZW: prefix/suffix dictionary, 12-bit max
      val clear = 1 << minCode
      val end = clear + 1
      val prefix = new Array[Int](4096)
      val suffix = new Array[Byte](4096)
      val pixels = new Array[Byte](w * h)
      var out = 0
      var next = end + 1
      var codeSize = minCode + 1
      var prev = -1
      var acc = 0L
      var nbits = 0
      var cp = 0
      // expand one dict entry into pixels (root-chase, bounded 4096)
      val stack = new Array[Byte](4097)
      def emit(c0: Int): Int = { // returns the entry's FIRST index
        var c = c0
        var sp = 0
        while (c >= clear) { // composite entries chase to a root
          if (sp >= 4096 || c >= next) throw GifBad
          stack(sp) = suffix(c)
          sp += 1
          c = prefix(c)
        }
        val first = c
        if (out < pixels.length) { pixels(out) = c.toByte }
        out += 1
        while (sp > 0) {
          sp -= 1
          if (out < pixels.length) pixels(out) = stack(sp)
          out += 1
        }
        first
      }
      var done = false
      while (!done) {
        while (nbits < codeSize && cp < code.length) {
          acc |= (code(cp) & 0xffL) << nbits
          nbits += 8
          cp += 1
        }
        if (nbits < codeSize) {
          done = true // stream exhausted without an end code
        } else {
          val c = (acc & ((1L << codeSize) - 1)).toInt
          acc >>>= codeSize
          nbits -= codeSize
          if (c == clear) {
            next = end + 1
            codeSize = minCode + 1
            prev = -1
          } else if (c == end) {
            done = true
          } else if (out >= pixels.length) {
            done = true // frame full: later codes are padding
          } else if (prev == -1) {
            if (c >= clear) throw GifBad // first code must be a root
            emit(c)
            prev = c
          } else {
            if (c > next || (c == next && prev < 0)) throw GifBad
            val first =
              if (c == next) {
                // the KwK case: entry being defined — emit prev + its
                // own first index
                if (next >= 4096) throw GifBad
                prefix(next) = prev
                suffix(next) = firstIndex(prefix, suffix, prev, clear)
                next += 1
                emit(c)
              } else {
                val f = emit(c)
                if (next < 4096) {
                  prefix(next) = prev
                  suffix(next) = f.toByte
                  next += 1
                }
                f
              }
            prev = c
            val _ = first
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
        }
      }
      if (out < w * h) return null // fewer pixels than promised
      // deinterlace: map storage row order -> display rows
      val rowOf = new Array[Int](h)
      if (interlaced) {
        var r = 0
        for (step <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); y <- step._1 until h by step._2) {
          rowOf(r) = y
          r += 1
        }
      } else {
        var y = 0
        while (y < h) { rowOf(y) = y; y += 1 }
      }
      val disp = new Array[Int](h) // display row -> storage row
      var r = 0
      while (r < h) { disp(rowOf(r)) = r; r += 1 }
      def luma(x: Long, y: Long): Long = {
        val idx = pixels(disp(y.toInt) * w + x.toInt) & 0xff
        if (idx >= ctSize) return 0L
        val cpos = ctAt + 3 * idx
        (b(cpos) & 0xff) * 299L + (b(cpos + 1) & 0xff) * 587L +
          (b(cpos + 2) & 0xff) * 114L
      }
      val xs = Array.tabulate(9)(i => i * (w - 1L) / 8)
      var bits = 0L
      var j = 0
      while (j < 8) {
        val y = j * (h - 1L) / 7
        var i = 0
        while (i < 8) {
          if (luma(xs(i + 1), y) > luma(xs(i), y)) bits |= 1L << (8 * j + i)
          i += 1
        }
        j += 1
      }
      java.lang.Long.valueOf(bits)
    } catch {
      case GifBad => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }
  }

  private object GifBad extends Exception with scala.util.control.NoStackTrace

  /** A dict entry's first (root) index — bounded chase. */
  private def firstIndex(prefix: Array[Int], suffix: Array[Byte],
                         c0: Int, clear: Int): Byte = {
    var c = c0
    var guard = 0
    while (c >= clear) {
      c = prefix(c)
      guard += 1
      if (guard > 4096) throw GifBad
    }
    c.toByte
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(payload: Column): Column =
    ColumnShim.column(GifDhash(ColumnShim.expression(payload)))
}
