package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native perceptual dHash over 24-bit uncompressed BMP bytes — the
  * pixel-decode kernel behind `ext.Multimodal.bmpDhash`. The first,
  * HOF-composed implementation evaluated INTERPRETED (higher-order
  * functions are CodegenFallback) at ~50 ms per row — 1000× slower
  * than this compiled kernel, which walks the raw BGR array once per
  * sampled grid point. Semantics (identical to the composed form,
  * MultimodalSpec pins them): 9×8 nearest-pixel sampling grid
  * (`x_i = ⌊i·(w−1)/8⌋`, `y_j = ⌊j·(h−1)/7⌋`), integer luma
  * `299·R + 587·G + 114·B`, bottom-up rows, bit (j,i) =
  * luma(x_{i+1}, y_j) > luma(x_i, y_j), packed `Σ bit·2^(8j+i)`.
  *
  * Null for non-BMP payloads, compressed or non-24-bit images,
  * degenerate dimensions, or payloads too short for their declared
  * pixel array (the composed form silently zeroed out-of-bounds
  * bits; the kernel fails closed). */
case class BmpDhash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bmp_dhash expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    BmpDhash.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.functions.BmpDhash.compute($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bmp_dhash"
}

object BmpDhash {

  private def le(b: Array[Byte], pos: Int, len: Int): Long = {
    var v = 0L
    var i = len - 1
    while (i >= 0) { v = (v << 8) | (b(pos + i) & 0xffL); i -= 1 }
    v
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte]): java.lang.Long = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val w = le(b, 18, 4)
    val h = le(b, 22, 4)
    val bpp = le(b, 28, 2)
    val comp = le(b, 30, 4)
    val off = le(b, 10, 4)
    if (bpp != 24L || comp != 0L || w < 2L || h < 2L) return null
    if (w > 65535L || h > 65535L) return null // stride overflow guard
    val stride = (w * 3 + 3) / 4 * 4
    if (off + h * stride > b.length) return null
    def luma(x: Long, y: Long): Long = {
      val p = (off + (h - 1 - y) * stride + 3 * x).toInt
      (b(p) & 0xff) * 114L + (b(p + 1) & 0xff) * 587L + (b(p + 2) & 0xff) * 299L
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
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(payload: Column): Column =
    ColumnShim.column(BmpDhash(ColumnShim.expression(payload)))
}
