package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native perceptual dHash over UNCOMPRESSED TIFF bytes — the fifth
  * leg of the cross-format image family ([[BmpDhash]], [[PngDhash]],
  * [[JpegDhash]], [[GifDhash]]): both byte orders' IFD walks, strip
  * offsets/counts concatenated into the top-down pixel grid, 8-bit
  * grayscale (both photometric polarities — white-is-zero inverts)
  * and RGB/RGBA chunky samples, and the same 9×8 grid / integer luma
  * / gradient-bit packing — a TIFF of the same pixels hashes EQUAL
  * to its BMP/PNG/GIF siblings.
  *
  * Compression 1 (none) ONLY by contract: LZW/Deflate/PackBits TIFFs
  * fail closed rather than mis-decode — scan masters and scientific
  * exports are the uncompressed population this tier serves. The
  * FIRST IFD only (multi-page documents hash their first page).
  *
  * Fails closed (null) for: bad magic, compressed or tiled files,
  * planar configuration 2, sub-8-bit or 16-bit samples, palette
  * TIFFs, missing strip tags, strips outside the payload, degenerate
  * dimensions, images above `MaxPixels` (2^22). */
case class TiffDhash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tiff_dhash expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    TiffDhash.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.functions.TiffDhash.compute($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "tiff_dhash"
}

object TiffDhash {

  private val MaxPixels = 1L << 22

  private object Bad extends Exception with scala.util.control.NoStackTrace

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte]): java.lang.Long = {
    try {
      if (b == null || b.length < 8) return null
      val le =
        if (b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) true
        else if (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42) false
        else return null
      def u16(p: Int): Int =
        if (le) (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
        else ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
      def u32(p: Int): Long =
        if (le) (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
          ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
        else ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
          ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
      val ifdAt = u32(4)
      if (ifdAt < 8 || ifdAt + 2 > b.length) return null
      val nTags = u16(ifdAt.toInt)
      if (ifdAt + 2 + 12L * nTags + 4 > b.length) return null
      // one tag's values as longs (SHORT/LONG; ≤2 inline else offset)
      def values(entry: Int): Array[Long] = {
        val tpe = u16(entry + 2)
        val cnt = u32(entry + 4)
        if (cnt <= 0 || cnt > (1 << 20)) throw Bad
        val width = tpe match {
          case 3 => 2 // SHORT
          case 4 => 4 // LONG
          case _ => throw Bad
        }
        val inline = cnt * width <= 4
        val at = if (inline) entry + 8 else u32(entry + 8).toInt
        if (at < 0 || at + cnt * width > b.length) throw Bad
        Array.tabulate(cnt.toInt)(i =>
          if (width == 2) u16(at + 2 * i).toLong else u32(at + 4 * i))
      }
      var w = -1L
      var h = -1L
      var bits: Array[Long] = Array(8L)
      var comp = 1L
      var photo = -1L
      var spp = 1L
      var rowsPerStrip = Long.MaxValue
      var offs: Array[Long] = null
      var cnts: Array[Long] = null
      var planar = 1L
      var tiled = false
      var i = 0
      while (i < nTags) {
        val e = (ifdAt + 2 + 12 * i).toInt
        u16(e) match {
          case 256 => w = values(e)(0)
          case 257 => h = values(e)(0)
          case 258 => bits = values(e)
          case 259 => comp = values(e)(0)
          case 262 => photo = values(e)(0)
          case 273 => offs = values(e)
          case 277 => spp = values(e)(0)
          case 278 => rowsPerStrip = values(e)(0)
          case 279 => cnts = values(e)
          case 284 => planar = values(e)(0)
          case 320 => return null // palette TIFF: refuse
          case 322 | 323 | 324 | 325 => tiled = true
          case _ => ()
        }
        i += 1
      }
      if (tiled || comp != 1L || planar != 1L) return null
      if (w < 2 || h < 2 || w * h > MaxPixels) return null
      if (photo != 0L && photo != 1L && photo != 2L) return null
      if (offs == null || cnts == null || offs.length != cnts.length)
        return null
      if (bits.exists(_ != 8L)) return null
      // explicit SamplesPerPixel bound: a hostile spp (e.g. 65535
      // with w*h near MaxPixels) would wrap an Int byte count — refuse
      // up front rather than rely on a caught allocation failure
      if (spp < 1L || spp > 8L) return null
      val ch = spp.toInt
      if (photo == 2L && ch < 3) return null
      // concatenate strips into the top-down grid; sizes computed in
      // Long and bounded (<= MaxPixels * 8 by the guards above)
      val strideL = w * ch
      val needL = h * strideL
      if (needL > MaxPixels * 8L) return null
      val stride = strideL.toInt
      val need = needL.toInt
      val raw = new Array[Byte](need)
      var out = 0
      var s = 0
      while (s < offs.length && out < need) {
        val o = offs(s)
        val c = math.min(cnts(s), (need - out).toLong)
        if (o < 0 || c < 0 || o + c > b.length) return null
        System.arraycopy(b, o.toInt, raw, out, c.toInt)
        out += c.toInt
        s += 1
      }
      if (out < need) return null
      def luma(x: Long, y: Long): Long = {
        val p = (y * stride + x * ch).toInt
        if (photo == 2L)
          (raw(p) & 0xff) * 299L + (raw(p + 1) & 0xff) * 587L +
            (raw(p + 2) & 0xff) * 114L
        else {
          val g = raw(p) & 0xff
          (if (photo == 0L) 255 - g else g) * 1000L
        }
      }
      val xs = Array.tabulate(9)(i => i * (w - 1) / 8)
      var hash = 0L
      var j = 0
      while (j < 8) {
        val y = j * (h - 1) / 7
        var k = 0
        while (k < 8) {
          if (luma(xs(k + 1), y) > luma(xs(k), y)) hash |= 1L << (8 * j + k)
          k += 1
        }
        j += 1
      }
      java.lang.Long.valueOf(hash)
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(payload: Column): Column =
    ColumnShim.column(TiffDhash(ColumnShim.expression(payload)))
}
