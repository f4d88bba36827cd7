package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** dHash for the two remaining legacy raster families a crawl still
  * surfaces — TGA (Targa: game/texture assets) and netpbm (PPM/PGM:
  * the scientific-pipeline interchange format) — with EXACTLY the
  * BMP kernel's sampling contract (9×8 nearest grid, 299/587/114
  * integer luma, bit = right > left), so the SEVENTH and EIGHTH
  * formats hash EQUAL to BMP/PNG/GIF/TIFF/WebP/JPEG encodes of the
  * same pixels and near-dup clustering works across container
  * boundaries.
  *
  * TGA: types 2/3 (truecolor 24/32, grayscale 8) uncompressed and
  * their RLE forms 10/11, both row origins (descriptor bit 5),
  * bottom-up default; palette and 15/16-bit depths refuse. RLE
  * packets must tile rows exactly — a run crossing the pixel count
  * is corrupt, not clipped.
  *
  * netpbm: P6/P5 binary and P3/P2 ASCII, `#` comments, maxval ≤ 255
  * (16-bit samples refuse, never truncate).
  *
  * Reference behavior anchor: oracle-schema-copy streams LOB columns
  * opaquely (AbstractLoadRowsCallback.java:28); decode follows the
  * public Truevision/netpbm specs alone. */
case class TgaDhash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tga_dhash expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    RasterDhash.computeTga(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.functions.RasterDhash.computeTga($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "tga_dhash"
}

case class PnmDhash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pnm_dhash expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    RasterDhash.computePnm(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.functions.RasterDhash.computePnm($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pnm_dhash"
}

object RasterDhash {

  private final val MaxPixels = 1L << 22 // the family's bomb guard

  /** The shared 9×8 grid hash over a top-down RGB triplet array —
    * bit-identical to the BMP kernel's contract. */
  private def gridHash(rgb: Array[Byte], w: Int, h: Int): java.lang.Long = {
    if (w < 2 || h < 2) return null
    def luma(x: Long, y: Long): Long = {
      val p = (3 * (y * w + x)).toInt
      (rgb(p) & 0xff) * 299L + (rgb(p + 1) & 0xff) * 587L +
        (rgb(p + 2) & 0xff) * 114L
    }
    val xs = Array.tabulate(9)(i => i * (w.toLong - 1) / 8)
    var bits = 0L
    var j = 0
    while (j < 8) {
      val y = j * (h.toLong - 1) / 7
      var i = 0
      while (i < 8) {
        if (luma(xs(i + 1), y) > luma(xs(i), y)) bits |= 1L << (8 * j + i)
        i += 1
      }
      j += 1
    }
    java.lang.Long.valueOf(bits)
  }

  /** TGA kernel — public static for generated code. */
  def computeTga(b: Array[Byte]): java.lang.Long = {
    try {
      if (b == null || b.length < 18) return null
      val idLen = b(0) & 0xff
      val cmapType = b(1) & 0xff
      val imgType = b(2) & 0xff
      if (cmapType != 0) return null // palette images: refuse
      val rle = (imgType & 8) != 0
      val base = imgType & 7
      if (base != 2 && base != 3) return null
      val w = (b(12) & 0xff) | ((b(13) & 0xff) << 8)
      val h = (b(14) & 0xff) | ((b(15) & 0xff) << 8)
      val depth = b(16) & 0xff
      val topDown = (b(17) & 0x20) != 0
      if (w < 2 || h < 2 || w.toLong * h > MaxPixels) return null
      val bypp = depth / 8
      if (base == 2 && depth != 24 && depth != 32) return null
      if (base == 3 && depth != 8) return null
      var pos = 18 + idLen
      val nPix = w * h
      // decode into a bottom-up pixel buffer (the file's own order),
      // flipped on the fly below
      val px = new Array[Byte](nPix * 3)
      def put(i: Int, bAt: Int): Unit = {
        if (base == 3) {
          val g = b(bAt)
          px(i * 3) = g; px(i * 3 + 1) = g; px(i * 3 + 2) = g
        } else { // BGR(A) source order
          px(i * 3) = b(bAt + 2) // R
          px(i * 3 + 1) = b(bAt + 1) // G
          px(i * 3 + 2) = b(bAt) // B
        }
      }
      if (!rle) {
        if (pos + nPix.toLong * bypp > b.length) return null
        var i = 0
        while (i < nPix) { put(i, pos + i * bypp); i += 1 }
      } else {
        var i = 0
        while (i < nPix) {
          if (pos >= b.length) return null
          val ctl = b(pos) & 0xff
          pos += 1
          val n = (ctl & 0x7f) + 1
          if (i + n > nPix) return null // packet over-run: corrupt
          if ((ctl & 0x80) != 0) { // run packet: one pixel, n copies
            if (pos + bypp > b.length) return null
            var k = 0
            while (k < n) { put(i + k, pos); k += 1 }
            pos += bypp
          } else { // raw packet: n literal pixels
            if (pos + n.toLong * bypp > b.length) return null
            var k = 0
            while (k < n) { put(i + k, pos + k * bypp); k += 1 }
            pos += n * bypp
          }
          i += n
        }
      }
      // flip to top-down when the file is bottom-up (the default)
      val out =
        if (topDown) px
        else {
          val f = new Array[Byte](px.length)
          var y = 0
          while (y < h) {
            System.arraycopy(px, (h - 1 - y) * w * 3, f, y * w * 3, w * 3)
            y += 1
          }
          f
        }
      gridHash(out, w, h)
    } catch {
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  /** netpbm kernel — public static for generated code. */
  def computePnm(b: Array[Byte]): java.lang.Long = {
    try {
      if (b == null || b.length < 2 || b(0) != 'P') return null
      val kind = b(1) - '0'
      if (kind != 2 && kind != 3 && kind != 5 && kind != 6) return null
      val rgbKind = kind == 3 || kind == 6
      val ascii = kind == 2 || kind == 3
      var pos = 2
      // header token reader: whitespace + '#' comments to end of line
      def token(): Long = {
        while (pos < b.length &&
          (b(pos).toChar.isWhitespace || b(pos) == '#')) {
          if (b(pos) == '#')
            while (pos < b.length && b(pos) != '\n') pos += 1
          else pos += 1
        }
        var v = -1L
        while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
          v = (if (v < 0) 0 else v) * 10 + (b(pos) - '0')
          if (v > Int.MaxValue) return -1
          pos += 1
        }
        v
      }
      val w = token()
      val h = token()
      val maxval = token()
      if (w < 2 || h < 2 || w * h > MaxPixels) return null
      if (maxval <= 0 || maxval > 255) return null // 16-bit: refuse
      val nPix = (w * h).toInt
      val samples = if (rgbKind) nPix * 3 else nPix
      val px = new Array[Byte](nPix * 3)
      if (ascii) {
        var s = 0
        while (s < samples) {
          val v = token()
          if (v < 0 || v > maxval) return null
          val scaled = (v * 255 / maxval).toByte
          if (rgbKind) px(s) = scaled
          else {
            px(s * 3) = scaled; px(s * 3 + 1) = scaled
            px(s * 3 + 2) = scaled
          }
          s += 1
        }
      } else {
        // binary: EXACTLY one whitespace byte after maxval
        pos += 1
        if (pos + samples > b.length) return null
        var s = 0
        while (s < samples) {
          val v = b(pos + s) & 0xff
          if (v > maxval) return null
          val scaled = (v * 255 / maxval.toInt).toByte
          if (rgbKind) px(s) = scaled
          else {
            px(s * 3) = scaled; px(s * 3 + 1) = scaled
            px(s * 3 + 2) = scaled
          }
          s += 1
        }
      }
      gridHash(px, w.toInt, h.toInt)
    } catch {
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  def tga(payload: Column): Column =
    ColumnShim.column(TgaDhash(ColumnShim.expression(payload)))

  def pnm(payload: Column): Column =
    ColumnShim.column(PnmDhash(ColumnShim.expression(payload)))
}
