package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** WebP lossless (VP8L) perceptual dHash — the SIXTH member of the
  * cross-format family ([[BmpDhash]]/[[PngDhash]]/[[JpegDhash]]/
  * [[GifDhash]]/[[TiffDhash]]): a full from-public-spec VP8L decoder —
  * LSB-first bitstream, canonical prefix codes (simple and
  * code-length-coded, 16/17/18 repeats, the optional max-symbol
  * limit), meta prefix groups, LZ77 backward references with the
  * 120-entry 2D distance plane-code map, the color cache
  * (0x1e35a7bd hashing), and all four inverse transforms (predictor
  * with its 14 modes, cross-color, subtract-green, color-indexing
  * incl. sub-byte pixel bundling) — then the family's exact 9×8
  * grid / 299·587·114 luma / `right>left` packing, so a WebP of an
  * image hashes EQUAL to its BMP/PNG/GIF/TIFF/JPEG siblings.
  *
  * Honestly-documented bounds: lossy `VP8 ` payloads null out (the
  * VP8 intra-frame codec is a different engineering project), as do
  * animation-only files (`ANMF`-embedded frames) and a
  * color-indexing transform combined with the other three (a shape
  * no known encoder emits; refusing beats a mis-decode).
  *
  * FAIL-CLOSED NULL for truncation, invalid or incomplete prefix
  * codes, out-of-range back-references/palette indices, and the
  * 2^22-pixel bomb cap. Per-row bounded work, zero shuffle,
  * codegen'd. */
case class WebpDhash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"webp_dhash expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    WebpDhash.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long r = graft.functions.WebpDhash.compute($c);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "webp_dhash"
}

object WebpDhash {

  private object Bad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def mkBad(): Nothing = throw Bad

  private val MaxPixels = 1 << 22

  /** The spec's 120 LZ77 distance plane codes (dx, dy), nearest
    * preceding pixels by euclidean norm; derived from the public
    * nibble table (y = high nibble, x = 8 − low nibble). */
  private val DistX: Array[Int] = Array(
    0,1,1,-1,0,2,1,-1,2,-2,2,-2,0,3,1,-1,3,-3,2,-2,3,-3,0,4,1,-1,4,-4,
    3,-3,2,-2,4,-4,0,3,-3,4,-4,5,1,-1,5,-5,2,-2,5,-5,4,-4,3,-3,5,-5,0,
    6,1,-1,6,-6,2,-2,6,-6,4,-4,5,-5,3,-3,6,-6,0,7,1,-1,5,-5,7,-7,4,-4,
    6,-6,2,-2,7,-7,3,-3,7,-7,5,-5,6,-6,0,8,1,-1,4,-4,7,-7,8,2,-2,8,6,
    -6,3,-3,8,5,-5,7,-7,4,-4,8)
  private val DistY: Array[Int] = Array(
    1,0,1,1,2,0,2,2,1,1,2,2,3,0,3,3,1,1,3,3,2,2,4,0,4,4,1,1,3,3,4,4,2,
    2,5,4,4,3,3,0,5,5,1,1,5,5,2,2,4,4,5,5,3,3,6,0,6,6,1,1,6,6,2,2,5,5,
    4,4,6,6,3,3,7,0,7,7,5,5,1,1,6,6,4,4,7,7,2,2,7,7,3,3,6,6,5,5,8,0,8,
    8,7,7,4,4,1,8,8,2,6,6,8,8,3,7,7,5,5,8,8,4)

  private val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  /** Bounded LSB-first bit reader over `b[start,end)`. */
  private final class Br(b: Array[Byte], start: Int, end: Int) {
    private var pos: Long = start.toLong * 8
    private val limit: Long = end.toLong * 8
    def bit(): Int = {
      if (pos >= limit) mkBad()
      val v = (b((pos >> 3).toInt) >> (pos & 7).toInt) & 1
      pos += 1
      v
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
  }

  /** Canonical prefix code: MSB-first bit walk over first-code
    * ranges; a single-symbol code consumes zero bits. Incomplete or
    * oversubscribed length sets refuse (Kraft sum must be exact). */
  private final class PCode(lengths: Array[Int]) {
    private var singleSym = -1
    private val count = new Array[Int](16)
    private val first = new Array[Int](16)
    private val offset = new Array[Int](16)
    private var syms: Array[Int] = null
    locally {
      var nz = 0
      var last = -1
      var i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l < 0 || l > 15) mkBad()
        if (l > 0) { nz += 1; last = i; count(l) += 1 }
        i += 1
      }
      if (nz == 0) mkBad()
      if (nz == 1) singleSym = last
      else {
        var code = 0
        var total = 0
        var l = 1
        while (l <= 15) {
          first(l) = code
          code = (code + count(l)) << 1
          total += count(l) << (15 - l)
          l += 1
        }
        if (total != (1 << 15)) mkBad()
        val cursor = new Array[Int](16)
        var acc = 0
        l = 1
        while (l <= 15) { offset(l) = acc; cursor(l) = acc; acc += count(l); l += 1 }
        syms = new Array[Int](nz)
        i = 0
        while (i < lengths.length) {
          if (lengths(i) > 0) {
            syms(cursor(lengths(i))) = i
            cursor(lengths(i)) += 1
          }
          i += 1
        }
      }
    }
    def read(br: Br): Int = {
      if (singleSym >= 0) return singleSym
      var code = 0
      var l = 0
      while (l < 15) {
        code = (code << 1) | br.bit()
        l += 1
        if (code - first(l) < count(l)) return syms(offset(l) + code - first(l))
      }
      mkBad()
    }
  }

  /** One entropy-code group: green+length+cache, red, blue, alpha,
    * distance. */
  private final class Group(br: Br, cacheSize: Int) {
    val green = readCode(br, 256 + 24 + cacheSize)
    val red = readCode(br, 256)
    val blue = readCode(br, 256)
    val alpha = readCode(br, 256)
    val dist = readCode(br, 40)
  }

  private def readCode(br: Br, alphabet: Int): PCode = {
    if (br.bits(1) == 1) { // simple
      val numSym = br.bits(1) + 1
      val first8 = br.bits(1)
      val s0 = if (first8 == 1) br.bits(8) else br.bits(1)
      val lengths = new Array[Int](alphabet)
      if (s0 >= alphabet) mkBad()
      if (numSym == 1) lengths(s0) = 1 // single: 0-bit code via PCode
      else {
        val s1 = br.bits(8)
        if (s1 >= alphabet || s1 == s0) mkBad()
        lengths(s0) = 1
        lengths(s1) = 1
      }
      new PCode(lengths)
    } else {
      val ncl = 4 + br.bits(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < ncl) { clLens(ClOrder(i)) = br.bits(3); i += 1 }
      val cl = new PCode(clLens)
      var maxSymbol =
        if (br.bits(1) == 1) {
          val n = 2 + 2 * br.bits(3)
          2 + br.bits(n)
        } else alphabet
      if (maxSymbol > alphabet) mkBad()
      val lengths = new Array[Int](alphabet)
      var sym = 0
      var prev = 8
      while (sym < alphabet && maxSymbol > 0) {
        maxSymbol -= 1
        val c = cl.read(br)
        if (c < 16) {
          lengths(sym) = c
          sym += 1
          if (c != 0) prev = c
        } else if (c == 16) {
          val r = 3 + br.bits(2)
          if (sym + r > alphabet) mkBad()
          var k = 0
          while (k < r) { lengths(sym) = prev; sym += 1; k += 1 }
        } else if (c == 17) {
          val r = 3 + br.bits(3)
          if (sym + r > alphabet) mkBad()
          sym += r
        } else {
          val r = 11 + br.bits(7)
          if (sym + r > alphabet) mkBad()
          sym += r
        }
      }
      new PCode(lengths)
    }
  }

  private def lz77Value(br: Br, sym: Int): Int = {
    if (sym < 4) sym + 1
    else {
      val eb = (sym - 2) >> 1
      val off = (2 + (sym & 1)) << eb
      off + br.bits(eb) + 1
    }
  }

  /** Per-channel add mod 256 via two 16-bit-lane passes. */
  private def addPixels(a: Int, b: Int): Int = {
    val ag = ((a >>> 8) & 0x00ff00ff) + ((b >>> 8) & 0x00ff00ff)
    val rb = (a & 0x00ff00ff) + (b & 0x00ff00ff)
    ((ag & 0x00ff00ff) << 8) | (rb & 0x00ff00ff)
  }

  private def avg2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def select(t: Int, l: Int, tl: Int): Int = {
    var d = 0
    var sh = 0
    while (sh < 32) {
      val tc = (t >>> sh) & 0xff
      val lc = (l >>> sh) & 0xff
      val tlc = (tl >>> sh) & 0xff
      d += math.abs(lc - tlc) - math.abs(tc - tlc)
      sh += 8
    }
    if (d <= 0) t else l
  }

  private def clampAddSubFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val v = clip255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) -
        ((tl >>> sh) & 0xff))
      out |= v << sh
      sh += 8
    }
    out
  }

  private def clampAddSubHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    var out = 0
    var sh = 0
    while (sh < 32) {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      out |= clip255(a + (a - b) / 2) << sh
      sh += 8
    }
    out
  }

  /** Decode the spatial (entropy-coded) pixels of a `w×h` image. */
  private def decodeSpatial(br: Br, w: Int, h: Int,
                            allowMeta: Boolean): Array[Int] = {
    val n = w * h
    if (n <= 0 || n > MaxPixels) mkBad()
    val cacheBits = if (br.bits(1) == 1) {
      val cb = br.bits(4)
      if (cb < 1 || cb > 11) mkBad() // spec range when present
      cb
    } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    var metaImg: Array[Int] = null
    var metaBits = 0
    var metaW = 0
    var numGroups = 1
    if (allowMeta && br.bits(1) == 1) {
      metaBits = br.bits(3) + 2
      metaW = (w + (1 << metaBits) - 1) >> metaBits
      val metaH = (h + (1 << metaBits) - 1) >> metaBits
      metaImg = decodeImageStream(br, metaW, metaH, level0 = false)
      var mx = 0
      var i = 0
      while (i < metaImg.length) {
        val g = (metaImg(i) >>> 8) & 0xffff
        if (g > mx) mx = g
        i += 1
      }
      numGroups = mx + 1
    }
    val groups = new Array[Group](numGroups)
    var gi = 0
    while (gi < numGroups) { groups(gi) = new Group(br, cacheSize); gi += 1 }
    val out = new Array[Int](n)
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    var pos = 0
    while (pos < n) {
      val x = pos % w
      val y = pos / w
      val g =
        if (metaImg == null) groups(0)
        else groups((metaImg((y >> metaBits) * metaW + (x >> metaBits))
          >>> 8) & 0xffff)
      val s = g.green.read(br)
      if (s < 256) {
        val red = g.red.read(br)
        val blue = g.blue.read(br)
        val alpha = g.alpha.read(br)
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = px
        if (cache != null)
          cache((0x1e35a7bd * px) >>> (32 - cacheBits)) = px
        pos += 1
      } else if (s < 280) {
        val len = lz77Value(br, s - 256)
        val distCode = lz77Value(br, g.dist.read(br))
        val dist =
          if (distCode > 120) distCode - 120
          else {
            val d = DistY(distCode - 1) * w + DistX(distCode - 1)
            if (d < 1) 1 else d
          }
        if (dist > pos || pos + len > n) mkBad()
        var k = 0
        while (k < len) {
          val px = out(pos - dist)
          out(pos) = px
          if (cache != null)
            cache((0x1e35a7bd * px) >>> (32 - cacheBits)) = px
          pos += 1
          k += 1
        }
      } else {
        val idx = s - 280
        if (cache == null || idx >= cacheSize) mkBad()
        out(pos) = cache(idx)
        pos += 1
      }
    }
    out
  }

  /** Decode one image stream; `level0` reads transforms and meta
    * prefix groups (sub-images have neither). */
  private def decodeImageStream(br: Br, w0: Int, h0: Int,
                                level0: Boolean): Array[Int] = {
    var predData: Array[Int] = null
    var predBits = 0
    var colorData: Array[Int] = null
    var colorBits = 0
    var palette: Array[Int] = null
    var palWidthBits = 0
    val order = new scala.collection.mutable.ArrayBuffer[Int](4)
    if (level0) {
      var seen = 0
      while (br.bits(1) == 1) {
        val t = br.bits(2)
        if ((seen & (1 << t)) != 0) mkBad()
        seen |= 1 << t
        order += t
        t match {
          case 0 =>
            predBits = br.bits(3) + 2
            predData = decodeImageStream(br,
              (w0 + (1 << predBits) - 1) >> predBits,
              (h0 + (1 << predBits) - 1) >> predBits, level0 = false)
          case 1 =>
            colorBits = br.bits(3) + 2
            colorData = decodeImageStream(br,
              (w0 + (1 << colorBits) - 1) >> colorBits,
              (h0 + (1 << colorBits) - 1) >> colorBits, level0 = false)
          case 2 => ()
          case 3 =>
            val nColors = br.bits(8) + 1
            palette = decodeImageStream(br, nColors, 1, level0 = false)
            var i = 1
            while (i < palette.length) {
              palette(i) = addPixels(palette(i), palette(i - 1))
              i += 1
            }
            palWidthBits =
              if (nColors <= 2) 3
              else if (nColors <= 4) 2
              else if (nColors <= 16) 1
              else 0
        }
      }
      // color-indexing next to any other transform: no known encoder
      // emits the combination — refuse rather than risk a mis-decode
      if (palette != null && seen != (1 << 3)) mkBad()
    }
    val effW =
      if (palette != null && palWidthBits > 0)
        (w0 + (1 << palWidthBits) - 1) >> palWidthBits
      else w0
    var pix = decodeSpatial(br, effW, h0, allowMeta = level0)
    var oi = order.length - 1
    while (oi >= 0) {
      order(oi) match {
        case 3 =>
          val out = new Array[Int](w0 * h0)
          val bitsPer = 8 >> palWidthBits
          val perByte = 1 << palWidthBits
          var y = 0
          while (y < h0) {
            var x = 0
            while (x < w0) {
              val idx =
                if (palWidthBits == 0) (pix(y * effW + x) >>> 8) & 0xff
                else {
                  val packed = pix(y * effW + (x >> palWidthBits))
                  val green = (packed >>> 8) & 0xff
                  val shift = (x & (perByte - 1)) * bitsPer
                  (green >> shift) & ((1 << bitsPer) - 1)
                }
              if (idx >= palette.length) mkBad()
              out(y * w0 + x) = palette(idx)
              x += 1
            }
            y += 1
          }
          pix = out
        case 2 =>
          var i = 0
          while (i < pix.length) {
            val p = pix(i)
            val g = (p >>> 8) & 0xff
            val r = (((p >>> 16) & 0xff) + g) & 0xff
            val b = ((p & 0xff) + g) & 0xff
            pix(i) = (p & 0xff00ff00) | (r << 16) | b
            i += 1
          }
        case 1 =>
          val tw = (w0 + (1 << colorBits) - 1) >> colorBits
          var pos = 0
          var y = 0
          while (y < h0) {
            var x = 0
            while (x < w0) {
              val cte = colorData((y >> colorBits) * tw + (x >> colorBits))
              val g2r = (cte & 0xff).toByte
              val g2b = ((cte >>> 8) & 0xff).toByte
              val r2b = ((cte >>> 16) & 0xff).toByte
              val p = pix(pos)
              val green = ((p >>> 8) & 0xff).toByte
              var red = (p >>> 16) & 0xff
              red = (red + ((g2r * green) >> 5)) & 0xff
              var blue = p & 0xff
              blue = (blue + ((g2b * green) >> 5) +
                ((r2b * red.toByte) >> 5)) & 0xff
              pix(pos) = (p & 0xff00ff00) | (red << 16) | blue
              pos += 1
              x += 1
            }
            y += 1
          }
        case 0 =>
          val tw = (w0 + (1 << predBits) - 1) >> predBits
          var pos = 0
          var y = 0
          while (y < h0) {
            var x = 0
            while (x < w0) {
              val mode =
                if (x == 0 && y == 0) 0
                else if (y == 0) 1
                else if (x == 0) 2
                else (predData((y >> predBits) * tw + (x >> predBits))
                  >>> 8) & 0xff
              val l = if (x > 0) pix(pos - 1) else 0
              val t = if (y > 0) pix(pos - w0) else 0
              val tl = if (x > 0 && y > 0) pix(pos - w0 - 1) else 0
              // at x = w0-1 the top-right wraps to the CURRENT row's
              // first pixel (already reconstructed) — the spec quirk
              val tr = if (y > 0) pix(pos - w0 + 1) else 0
              val pred = mode match {
                case 0 => 0xff000000
                case 1 => l
                case 2 => t
                case 3 => tr
                case 4 => tl
                case 5 => avg2(avg2(l, tr), t)
                case 6 => avg2(l, tl)
                case 7 => avg2(l, t)
                case 8 => avg2(tl, t)
                case 9 => avg2(t, tr)
                case 10 => avg2(avg2(l, tl), avg2(t, tr))
                case 11 => select(t, l, tl)
                case 12 => clampAddSubFull(l, t, tl)
                case 13 => clampAddSubHalf(l, t, tl)
                case _ => mkBad()
              }
              pix(pos) = addPixels(pix(pos), pred)
              pos += 1
              x += 1
            }
            y += 1
          }
      }
      oi -= 1
    }
    pix
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte]): java.lang.Long = {
    try {
      if (b == null || b.length < 20) return null
      if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P')
        return null
      // RIFF chunk walk to the VP8L payload; lossy VP8 refuses
      var p = 12
      var vp8lAt = -1
      var vp8lLen = 0
      while (vp8lAt < 0 && p + 8 <= b.length) {
        val size = (b(p + 4) & 0xff) | ((b(p + 5) & 0xff) << 8) |
          ((b(p + 6) & 0xff) << 16) | ((b(p + 7) & 0xff) << 24)
        if (size < 0 || p + 8 + size > b.length) return null
        if (b(p) == 'V' && b(p + 1) == 'P' && b(p + 2) == '8' &&
          b(p + 3) == 'L') {
          vp8lAt = p + 8
          vp8lLen = size
        } else if (b(p) == 'V' && b(p + 1) == 'P' && b(p + 2) == '8' &&
          b(p + 3) == ' ') return null // lossy: documented refusal
        else p += 8 + size + (size & 1)
      }
      if (vp8lAt < 0) return null
      if (vp8lLen < 5 || (b(vp8lAt) & 0xff) != 0x2f) return null
      val br = new Br(b, vp8lAt + 1, vp8lAt + vp8lLen)
      val w = br.bits(14) + 1
      val h = br.bits(14) + 1
      br.bits(1) // alpha hint
      if (br.bits(3) != 0) return null // version
      if (w < 2 || h < 2 || w.toLong * h > MaxPixels) return null
      val pix = decodeImageStream(br, w, h, level0 = true)
      // the family's exact hash: 9×8 grid, integer luma, right>left
      def luma(x: Int, y: Int): Long = {
        val p0 = pix(y * w + x)
        ((p0 >>> 16) & 0xff) * 299L + ((p0 >>> 8) & 0xff) * 587L +
          (p0 & 0xff) * 114L
      }
      val xs = Array.tabulate(9)(i => i * (w - 1) / 8)
      var bits = 0L
      var j = 0
      while (j < 8) {
        val y = j * (h - 1) / 7
        var i = 0
        while (i < 8) {
          if (luma(xs(i + 1), y) > luma(xs(i), y)) bits |= 1L << (8 * j + i)
          i += 1
        }
        j += 1
      }
      java.lang.Long.valueOf(bits)
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(payload: Column): Column =
    ColumnShim.column(WebpDhash(ColumnShim.expression(payload)))
}
