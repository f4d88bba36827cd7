package graft.functions

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** [[WebpFrames]] battery: animated VP8X walk (ANIM loop + ANMF
  * durations, odd-size RIFF padding), static variants, and the
  * fail-closed refusals. */
class WebpFramesSpec extends AnyFunSuite {

  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
    tag.getBytes("US-ASCII") ++ le(data.length, 4) ++ data ++ pad
  }

  private def riff(body: Array[Byte]): Array[Byte] =
    "RIFF".getBytes ++ le(4 + body.length, 4) ++ "WEBP".getBytes ++ body

  private def anmf(durMs: Long): Array[Byte] =
    chunk("ANMF", new Array[Byte](6) ++ le(15, 3) ++ le(15, 3) ++
      le(durMs, 3) ++ Array[Byte](0) ++ Array[Byte](0x2f, 0, 0))

  private def animated(durs: Seq[Long], loop: Int): Array[Byte] =
    riff(chunk("VP8X", Array[Byte](0x02, 0, 0, 0) ++ le(15, 3) ++ le(15, 3)) ++
      chunk("ANIM", new Array[Byte](4) ++ le(loop, 2)) ++
      durs.flatMap(d => anmf(d).toSeq))

  private def got(b: Array[Byte]): Option[(Int, Long, Int, String)] =
    Option(WebpFrames.compute(b, 1 << 16)).map(r =>
      (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getUTF8String(3).toString))

  test("animated: ANMF count, summed ms durations (odd chunk sizes " +
    "padded), ANIM loop count; an EXIF chunk is skipped") {
    assert(got(animated(Seq(40L, 60L, 100L), 2)) ==
      Some((3, 200L, 2, "vp8x")))
    val withExif = riff(
      chunk("VP8X", Array[Byte](0x02, 0, 0, 0) ++ le(15, 3) ++ le(15, 3)) ++
        chunk("EXIF", Array[Byte](1, 2, 3)) ++ // odd size: padded
        chunk("ANIM", new Array[Byte](4) ++ le(0, 2)) ++
        anmf(500L))
    assert(got(withExif) == Some((1, 500L, 0, "vp8x")))
  }

  test("static variants report one frame, no loop") {
    val vp8l = riff(chunk("VP8L", Array[Byte](0x2f, 0x0f, 0, 0x0f, 0, 0)))
    assert(got(vp8l) == Some((1, 0L, -1, "vp8l")))
    val vp8 = riff(chunk("VP8 ", new Array[Byte](12)))
    assert(got(vp8) == Some((1, 0L, -1, "vp8")))
    // VP8X WITHOUT the animation bit: static extended file
    val vp8x = riff(
      chunk("VP8X", Array[Byte](0x00, 0, 0, 0) ++ le(15, 3) ++ le(15, 3)) ++
        chunk("VP8L", Array[Byte](0x2f, 0x0f, 0, 0x0f, 0, 0)))
    assert(got(vp8x) == Some((1, 0L, -1, "vp8x")))
  }

  test("fail-closed: signature, truncation, animated-without-ANIM, " +
    "animation bit with zero frames, junk") {
    val a = animated(Seq(40L), 1)
    val bad = a.clone(); bad(8) = 'X'
    assert(got(bad).isEmpty)
    for (cut <- Seq(10, 19, a.length / 2, a.length - 3))
      assert(got(a.take(cut)).isEmpty, s"cut $cut")
    // animation bit set but no ANIM chunk: spec violation, refused
    val noAnim = riff(
      chunk("VP8X", Array[Byte](0x02, 0, 0, 0) ++ le(15, 3) ++ le(15, 3)) ++
        anmf(40L))
    assert(got(noAnim).isEmpty)
    val zeroFrames = riff(
      chunk("VP8X", Array[Byte](0x02, 0, 0, 0) ++ le(15, 3) ++ le(15, 3)) ++
        chunk("ANIM", new Array[Byte](4) ++ le(1, 2)))
    assert(got(zeroFrames).isEmpty)
    assert(got("not a webp at all".getBytes).isEmpty)
  }
}
