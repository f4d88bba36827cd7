package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** GIF ANIMATION census — the frame-level facts `gifMeta`'s
  * fixed-offset header read cannot see and a media pipeline needs to
  * split animated from static GIFs: one bounded block walk (no LZW
  * decode — image data sub-blocks are SKIPPED by their length
  * prefixes) counting image descriptors, summing the graphic-control
  * extensions' frame delays (centiseconds — a GCE's delay counts only
  * when the rendered block that consumes it is an image descriptor;
  * one attached to a plain-text extension or left trailing never
  * displays a frame and is dropped) and reading the
  * NETSCAPE2.0 application extension's loop count (0 = forever, per
  * the public extension spec; -1 when absent — a single-pass GIF).
  *
  * Output struct: `(n_frames, total_delay_cs, loop_count, version)`.
  *
  * FAIL-CLOSED NULL for non-GIF signatures and any truncated block
  * (a census over a corrupt tail would undercount silently). Walk
  * bounded by `maxFrames` (bomb guard). Per-row bounded work, zero
  * shuffle, codegen'd. */
case class GifFrames(child: Expression, maxFrames: Int)
    extends UnaryExpression {
  require(maxFrames > 0, "frame cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gif_frames expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_frames", IntegerType, nullable = false),
    StructField("total_delay_cs", LongType, nullable = false),
    StructField("loop_count", IntegerType, nullable = false),
    StructField("version", StringType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    GifFrames.compute(a.asInstanceOf[Array[Byte]], maxFrames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GifFrames.compute($c, $maxFrames);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "gif_frames"
}

object GifFrames {

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte], maxFrames: Int): GenericInternalRow = {
    try {
      if (b == null || b.length < 14) return null
      if (b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
        (b(4) != '7' && b(4) != '9') || b(5) != 'a') return null
      val version = if (b(4) == '7') "87a" else "89a"
      var p = 6
      val packed = b(p + 4) & 0xff
      p += 7
      if ((packed & 0x80) != 0) p += 3 * (2 << (packed & 7)) // GCT
      var frames = 0
      var delay = 0L
      var pendingDelay = 0L
      var loop = -1
      def skipSubBlocks(): Boolean = { // returns false on truncation
        var len = b(p) & 0xff
        while (len != 0) {
          p += 1 + len
          if (p >= b.length) return false
          len = b(p) & 0xff
        }
        p += 1
        true
      }
      var done = false
      while (!done) {
        if (p >= b.length) return null // no trailer: truncated
        (b(p) & 0xff) match {
          case 0x3B => done = true // trailer
          case 0x21 => // extension
            if (p + 2 >= b.length) return null
            val label = b(p + 1) & 0xff
            val bodyAt = p + 2
            if (label == 0xF9 && bodyAt + 4 < b.length &&
              (b(bodyAt) & 0xff) >= 4) {
              // GCE: size(>=4) packed delayLo delayHi transparentIdx.
              // The delay is PENDING until a rendered block consumes
              // it — a GCE attached to a plain-text extension or one
              // trailing the last image never displays a frame
              pendingDelay = (b(bodyAt + 2) & 0xffL) |
                ((b(bodyAt + 3) & 0xffL) << 8)
            }
            // a plain-text extension is the other graphic rendering
            // block: it consumes the pending GCE without a frame
            if (label == 0x01) pendingDelay = 0L
            if (label == 0xFF && bodyAt + 11 < b.length &&
              (b(bodyAt) & 0xff) == 11 &&
              new String(b, bodyAt + 1, 11, "US-ASCII") == "NETSCAPE2.0") {
              // sub-block: 03 01 loopLo loopHi
              val sb = bodyAt + 12
              if (sb + 3 < b.length && (b(sb) & 0xff) == 3 &&
                (b(sb + 1) & 0xff) == 1)
                loop = (b(sb + 2) & 0xff) | ((b(sb + 3) & 0xff) << 8)
            }
            p = bodyAt
            if (!skipSubBlocks()) return null
          case 0x2C => // image descriptor
            if (p + 10 > b.length) return null
            val ip = b(p + 9) & 0xff
            p += 10
            if ((ip & 0x80) != 0) p += 3 * (2 << (ip & 7)) // LCT
            if (p + 1 >= b.length) return null
            p += 1 // LZW min code size
            if (!skipSubBlocks()) return null
            frames += 1
            delay += pendingDelay
            pendingDelay = 0L
            if (frames > maxFrames) return null
          case _ => return null // unknown block: refuse, never guess
        }
      }
      new GenericInternalRow(Array[Any](frames, delay, loop,
        org.apache.spark.unsafe.types.UTF8String.fromString(version)))
    } catch {
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 64k-frame walk cap. */
  def apply(payload: Column, maxFrames: Int = 1 << 16): Column =
    ColumnShim.column(GifFrames(ColumnShim.expression(payload), maxFrames))
}
