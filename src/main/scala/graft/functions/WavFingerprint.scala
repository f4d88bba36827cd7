package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-bit perceptual audio fingerprint over canonical 16-bit PCM WAV
  * bytes — the near-dup tier that connects `wavAudioStats`' real PCM
  * decode to `Dedup.hash64NearDupPairs`, the way `BmpDhash`/`PngDhash`
  * did for images: bit k is the SIGN OF THE DELTA between two samples
  * of a 65-point grid over the first `maxSamples` samples
  * (`idx_k = ⌊k·(n−1)/64⌋`, bit k = s(idx_{k+1}) > s(idx_k), packed
  * `Σ bit·2^k`). Sign-of-delta is invariant under positive gain
  * (volume change) and DC offset — the two transforms a lossless
  * re-encode or normalization pass applies — while any real waveform
  * change flips bits, so hamming distance ranks re-encoded/
  * gain-shifted siblings at 0 and distinct audio far apart.
  *
  * Canonical layout only (RIFF/WAVE, fmt at 13, data at 37 —
  * `wavMeta`'s assumption), 16-bit PCM, and the declared data length
  * must FIT the payload (`44 + data_len ≤ length`): a truncated file
  * fails closed to null rather than fingerprinting garbage. Null
  * also for fewer than 2 samples. */
case class WavFingerprint(child: Expression, maxSamples: Int)
  extends UnaryExpression {

  require(maxSamples >= 2, s"maxSamples must be >= 2, got $maxSamples")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_fingerprint expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    WavFingerprint.compute(a.asInstanceOf[Array[Byte]], maxSamples)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r =
        graft.functions.WavFingerprint.compute($c, $maxSamples);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "wav_fingerprint"
}

object WavFingerprint {

  private def le(b: Array[Byte], pos: Int, len: Int): Long = {
    var v = 0L
    var i = len - 1
    while (i >= 0) { v = (v << 8) | (b(pos + i) & 0xffL); i -= 1 }
    v
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte], maxSamples: Int): java.lang.Long = {
    if (b == null || b.length < 46) return null
    // canonical RIFF/WAVE with fmt at offset 12 and data at offset 36
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E' ||
      b(12) != 'f' || b(13) != 'm' || b(14) != 't' || b(15) != ' ' ||
      b(36) != 'd' || b(37) != 'a' || b(38) != 't' || b(39) != 'a') return null
    val bitsPerSample = le(b, 34, 2)
    val dataLen = le(b, 40, 4)
    if (bitsPerSample != 16L) return null
    if (44L + dataLen > b.length) return null // truncated: fail closed
    val n = math.min(maxSamples.toLong, dataLen / 2).toInt
    if (n < 2) return null
    def sample(i: Int): Int = {
      val raw = (b(44 + 2 * i) & 0xff) | ((b(45 + 2 * i) & 0xff) << 8)
      if (raw >= 32768) raw - 65536 else raw
    }
    var bits = 0L
    var k = 0
    while (k < 64) {
      val i1 = k.toLong * (n - 1) / 64
      val i2 = (k + 1).toLong * (n - 1) / 64
      if (sample(i2.toInt) > sample(i1.toInt)) bits |= 1L << k
      k += 1
    }
    java.lang.Long.valueOf(bits)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(payload: Column, maxSamples: Int = 256): Column =
    ColumnShim.column(WavFingerprint(ColumnShim.expression(payload), maxSamples))
}
