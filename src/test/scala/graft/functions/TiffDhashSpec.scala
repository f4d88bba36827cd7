package graft.functions

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** [[TiffDhash]] battery: hand-built LE gray (both photometric
  * polarities), the JDK's own TIFF writer (gray and RGB, its strip
  * layout and byte order), cross-format BMP equality, refusals. */
class TiffDhashSpec extends AnyFunSuite {

  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

  private def bmpOf(v: (Int, Int) => Int, w: Int, h: Int): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val px = Array.tabulate(h) { r =>
      val y = h - 1 - r
      (0 until w).flatMap { x =>
        val p = (v(x, y) & 0xff).toByte; Seq(p, p, p)
      } ++ Seq.fill(stride - w * 3)(0.toByte)
    }.flatten
    "BM".getBytes ++ le(54 + px.length, 4) ++ le(0, 4) ++ le(54, 4) ++
      le(40, 4) ++ le(w, 4) ++ le(h, 4) ++ le(1, 2) ++ le(24, 2) ++
      le(0, 4) ++ le(px.length, 4) ++ le(2835, 4) ++ le(2835, 4) ++
      le(0, 4) ++ le(0, 4) ++ px
  }

  /** Minimal LE uncompressed gray TIFF, single strip. */
  private def tiffGray(v: (Int, Int) => Int, w: Int, h: Int,
                       inverted: Boolean = false): Array[Byte] = {
    val px = Array.tabulate(h * w) { i =>
      val g = v(i % w, i / w) & 0xff
      (if (inverted) 255 - g else g).toByte
    }
    val ifdAt = 8 + px.length
    val bos = new ByteArrayOutputStream()
    bos.write("II".getBytes); bos.write(42); bos.write(0)
    bos.write(le(ifdAt, 4)); bos.write(px)
    val tags = Seq(
      (256, 3, w.toLong), (257, 3, h.toLong), (258, 3, 8L),
      (259, 3, 1L), (262, 3, if (inverted) 0L else 1L),
      (273, 4, 8L), (277, 3, 1L), (278, 3, h.toLong),
      (279, 4, px.length.toLong))
    bos.write(le(tags.length, 2))
    for ((tag, tpe, value) <- tags) {
      bos.write(le(tag, 2)); bos.write(le(tpe, 2)); bos.write(le(1, 4))
      if (tpe == 4) bos.write(le(value, 4))
      else { bos.write(le(value, 2)); bos.write(le(0, 2)) }
    }
    bos.write(le(0, 4))
    bos.toByteArray
  }

  private def base(x: Int, y: Int) = (x * 13 + y * 7) % 200

  test("a hostile SamplesPerPixel refuses explicitly (no wrap)") {
    val t = tiffGray(base, 16, 16)
    val at = 8 + 16 * 16 + 2 + 6 * 12 + 8 // tag 277 value slot
    assert(t(at) == 1.toByte, "tag layout moved")
    t(at) = 0xff.toByte; t(at + 1) = 0xff.toByte
    assert(TiffDhash.compute(t) == null)
  }


  test("hand-built LE gray TIFF hashes EQUAL to the BMP; the " +
    "white-is-zero polarity inverts back to the same hash") {
    val want = BmpDhash.compute(bmpOf(base, 16, 16))
    assert(want != null)
    assert(TiffDhash.compute(tiffGray(base, 16, 16)) == want)
    assert(TiffDhash.compute(tiffGray(base, 16, 16, inverted = true)) ==
      want)
  }

  test("the JDK's own TIFF writer (gray and RGB, its strip layout " +
    "and byte order) agrees; imageDhash dispatches the format") {
    for (rgb <- Seq(false, true)) {
      val img = new java.awt.image.BufferedImage(16, 16,
        if (rgb) java.awt.image.BufferedImage.TYPE_INT_RGB
        else java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 16; x <- 0 until 16) {
        val g = base(x, y)
        if (rgb) img.setRGB(x, y, (g << 16) | (g << 8) | g)
        else img.getRaster.setSample(x, y, 0, g)
      }
      val bos = new ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "tiff", bos), "writer")
      val got = TiffDhash.compute(bos.toByteArray)
      assert(got != null, s"rgb=$rgb refused")
      assert(got == BmpDhash.compute(bmpOf(base, 16, 16)), s"rgb=$rgb")
    }
  }

  test("fail-closed: magic, compressed flag, planar 2, 16-bit, " +
    "strip past the payload, truncation, junk") {
    val good = tiffGray(base, 16, 16)
    val bad = good.clone(); bad(0) = 'X'
    assert(TiffDhash.compute(bad) == null)
    // compression tag is the 4th entry: its SHORT value sits at
    // ifd + 2 + 12*3 + 8
    val ifdAt = 8 + 256
    val compAt = ifdAt + 2 + 12 * 3 + 8
    val lzw = good.clone(); lzw(compAt) = 5
    assert(TiffDhash.compute(lzw) == null)
    val deep = good.clone(); deep(ifdAt + 2 + 12 * 2 + 8) = 16 // bits
    assert(TiffDhash.compute(deep) == null)
    for (cut <- Seq(6, 100, good.length - 10))
      assert(TiffDhash.compute(good.take(cut)) == null, s"cut $cut")
    assert(TiffDhash.compute("IIjunk junk junk".getBytes) == null)
  }
}
