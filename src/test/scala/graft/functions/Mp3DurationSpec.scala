package graft.functions

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** [[Mp3Duration]] battery over synthetic MPEG1 Layer III payloads:
  * Xing exact counts (stereo and mono side-info offsets), VBRI, the
  * CBR estimate, ID3v2 skip incl. the footer flag, and the
  * fail-closed refusals. */
class Mp3DurationSpec extends AnyFunSuite {

  /** 4-byte MPEG1 L3 header: 128 kbps (idx 9), 44.1 kHz, given mode. */
  private def hdr(mono: Boolean): Array[Byte] =
    Array(0xff.toByte, 0xfb.toByte, 0x90.toByte,
      (if (mono) 0xc0 else 0x00).toByte)

  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def xingMp3(frames: Long, mono: Boolean,
                      id3: Option[Array[Byte]] = None): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    id3.foreach(bos.write)
    bos.write(hdr(mono))
    bos.write(new Array[Byte](if (mono) 17 else 32)) // side info
    bos.write("Xing".getBytes("US-ASCII"))
    bos.write(be32(1L)) // flags: FRAMES
    bos.write(be32(frames))
    bos.toByteArray
  }

  private def id3Tag(size: Int, footer: Boolean): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write("ID3".getBytes("US-ASCII"))
    bos.write(4); bos.write(0)
    bos.write(if (footer) 0x10 else 0)
    bos.write((size >> 21) & 0x7f); bos.write((size >> 14) & 0x7f)
    bos.write((size >> 7) & 0x7f); bos.write(size & 0x7f)
    bos.write(new Array[Byte](size + (if (footer) 10 else 0)))
    bos.toByteArray
  }

  private def got(b: Array[Byte]): Option[(Long, Long, String)] =
    Option(Mp3Duration.compute(b)).map(r =>
      (r.getLong(0), r.getLong(1), r.getUTF8String(2).toString))

  test("Xing frame counts: stereo 32-byte and mono 17-byte side-info " +
    "offsets, duration = frames*1152/44100") {
    assert(got(xingMp3(100, mono = false)) ==
      Some((100L, 100L * 1152 * 1000 / 44100, "xing")))
    assert(got(xingMp3(2500, mono = true)) ==
      Some((2500L, 2500L * 1152 * 1000 / 44100, "xing")))
  }

  test("ID3v2 skip: plain and footer-flagged tags both land on the " +
    "first frame; a truncated tag refuses") {
    assert(got(id3Tag(64, footer = false) ++ xingMp3(7, mono = false))
      .exists(_._1 == 7L))
    assert(got(id3Tag(64, footer = true) ++ xingMp3(7, mono = false))
      .exists(_._1 == 7L))
    assert(got(id3Tag(64, footer = false).take(30)).isEmpty)
  }

  test("VBRI at the fixed 32-byte offset") {
    val bos = new ByteArrayOutputStream()
    bos.write(hdr(mono = false))
    bos.write(new Array[Byte](32))
    bos.write("VBRI".getBytes("US-ASCII"))
    bos.write(new Array[Byte](10)) // ver/delay/quality/bytes
    bos.write(be32(300))
    assert(got(bos.toByteArray) ==
      Some((300L, 300L * 1152 * 1000 / 44100, "vbri")))
  }

  test("CBR estimate: floor(payload/frame_size) at 128kbps/44.1kHz " +
    "(417 bytes per frame)") {
    val b = hdr(mono = false) ++ new Array[Byte](417 * 10 - 4 + 100)
    assert(got(b) == Some((10L, 10L * 1152 * 1000 / 44100, "cbr")))
  }

  test("frame WALK: header-less VBR counts exactly when frames tile " +
    "the payload (per-frame bitrates + padding), ID3v1 trailer " +
    "accepted; a mid-stream sample-rate flip falls back") {
    // three frames at 128/32/320 kbps (sizes 417 / 104 / 1044+pad)
    def fr(brIdx: Int, pad: Int): Array[Byte] = {
      val size = 144 * Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
        192, 224, 256, 320)(brIdx - 1) * 1000 / 44100 + pad
      val h = Array(0xff.toByte, 0xfb.toByte,
        ((brIdx << 4) | (pad << 1)).toByte, 0.toByte)
      h ++ new Array[Byte](size - 4)
    }
    val vbr = fr(9, 0) ++ fr(1, 1) ++ fr(14, 0)
    assert(got(vbr) == Some((3L, 3L * 1152 * 1000 / 44100, "walk")))
    // with an ID3v1 trailer
    val v1 = "TAG".getBytes("US-ASCII") ++ new Array[Byte](125)
    assert(got(vbr ++ v1) == Some((3L, 3L * 1152 * 1000 / 44100, "walk")))
    // trailing garbage that is neither a frame nor TAG: estimate path
    assert(got(vbr ++ new Array[Byte](50)).exists(_._3 == "cbr"))
    // a frame with a different sample rate mid-walk: fall back
    val badSr = fr(9, 0) ++ {
      val f = fr(9, 0); f(2) = (f(2) | 0x04).toByte; f }
    assert(got(badSr).exists(_._3 == "cbr"))
  }

  test("a flag-less Xing/Info tag frame is excluded from the frame " +
    "walk (players skip it)") {
    def fr417(): Array[Byte] = hdr(mono = false) ++ new Array[Byte](413)
    val tag = fr417()
    System.arraycopy("Xing".getBytes("US-ASCII"), 0, tag, 36, 4)
    // flags stay 0: no FRAMES field, the tag is unusable -> walk
    val b = tag ++ fr417() ++ fr417()
    assert(got(b) == Some((2L, 2L * 1152 * 1000 / 44100, "walk")))
    // without the signature the same three frames all count
    assert(got(fr417() ++ fr417() ++ fr417()) ==
      Some((3L, 3L * 1152 * 1000 / 44100, "walk")))
  }

  test("fail-closed: MPEG2, Layer II, free-format bitrate, reserved " +
    "sample rate, truncation") {
    def withB2(v: Int) = { val h = hdr(false); h(1) = v.toByte; h ++ new Array[Byte](500) }
    assert(got(withB2(0xf3)).isEmpty, "MPEG2")
    assert(got(withB2(0xfd)).isEmpty, "Layer II")
    val free = hdr(false); free(2) = 0x00
    assert(got(free ++ new Array[Byte](500)).isEmpty, "free-format")
    val badSr = hdr(false); badSr(2) = 0x9c.toByte
    assert(got(badSr ++ new Array[Byte](500)).isEmpty, "reserved rate")
    assert(got(Array[Byte](0xff.toByte, 0xfb.toByte)).isEmpty, "short")
  }
}
