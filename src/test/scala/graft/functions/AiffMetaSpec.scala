package graft.functions

import java.io.ByteArrayOutputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

/** [[AiffMeta]] battery: the JDK's OWN javax.sound AIFF writer as the
  * authoritative cross-check, hand-built AIFC, 80-bit-extended edge
  * rates, refusals. */
class AiffMetaSpec extends AnyFunSuite {

  private def jdkAiff(rate: Float, channels: Int, bits: Int,
                      frames: Int): Array[Byte] = {
    val fmt = new AudioFormat(rate, bits, channels, true, true)
    val data = new Array[Byte](frames * channels * (bits / 8))
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AIFF, bos)
    bos.toByteArray
  }

  private def row(b: Array[Byte]) = AiffMeta.compute(b)

  test("the JDK's own AIFF writer round-trips: channels, bits, rate, " +
    "frames, duration") {
    val b = jdkAiff(8000f, 2, 16, 4000)
    val r = row(b)
    assert(r != null, "refused")
    assert(r.getUTF8String(0).toString == "aiff")
    assert(r.getInt(1) == 2 && r.getInt(2) == 16)
    assert(r.getDouble(3) == 8000.0)
    assert(r.getLong(4) == 4000L && r.getLong(5) == 500L)
    assert(r.isNullAt(6))
    val mono = row(jdkAiff(44100f, 1, 8, 44100))
    assert(mono.getDouble(3) == 44100.0 && mono.getLong(5) == 1000L)
  }

  test("hand-built AIFC: codec fourcc surfaces, fractional 80-bit " +
    "rate decodes exactly") {
    // from tools/make_aiff_fixture.py: 22050.5 Hz, 44101 frames = 2 s
    val hex = "464F524D0000004641494643434F4D4D0000002600010000AC45" +
      "0020400DAC450000000000004E4F4E450E6E6F7420636F6D7072657373" +
      "65640053534E440000000C000000000000000001020304"
    val b = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val r = row(b)
    assert(r != null, "refused")
    assert(r.getUTF8String(0).toString == "aifc")
    assert(r.getDouble(3) == 22050.5)
    assert(r.getLong(4) == 44101L && r.getLong(5) == 2000L)
    assert(r.getUTF8String(6).toString == "NONE")
  }

  test("fail-closed: magic, truncation, chunk overrun, no COMM, " +
    "zero channels, inf rate") {
    val good = jdkAiff(8000f, 1, 16, 100)
    assert(row(null) == null)
    assert(row("FORMxxxx".getBytes) == null)
    val badForm = good.clone(); badForm(8) = 'X'
    assert(row(badForm) == null)
    assert(row(good.take(20)) == null)
    // lie about a chunk size so it overruns the FORM window
    val lie = good.clone()
    // COMM starts at 12 in JDK output; blow up its size field
    assert(new String(lie, 12, 4) == "COMM")
    lie(16) = 0x7f
    assert(row(lie) == null)
    // zero channels
    val zc = good.clone(); zc(20) = 0; zc(21) = 0
    assert(row(zc) == null)
    // exponent 0x7fff (inf) rate
    val inf = good.clone(); inf(28) = 0x7f.toByte; inf(29) = 0xff.toByte
    assert(row(inf) == null)
  }
}
