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

  /** JDK TIFF writer with an explicit compression type. */
  private def jdkTiff(comp: String, rgb: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      if (rgb) java.awt.image.BufferedImage.TYPE_INT_RGB
      else java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16) {
      val g = base(x, y)
      if (rgb) img.setRGB(x, y, (g << 16) | (g << 8) | g)
      else img.getRaster.setSample(x, y, 0, g)
    }
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType(comp)
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  test("LZW / PackBits / Deflate / ZLib strips from the JDK's own " +
    "writer decode to the SAME hash as the uncompressed siblings " +
    "(gray and RGB)") {
    val want = BmpDhash.compute(bmpOf(base, 16, 16))
    for (comp <- Seq("LZW", "PackBits", "Deflate", "ZLib");
         rgb <- Seq(false, true)) {
      val t = jdkTiff(comp, rgb)
      assert(TiffDhash.compute(t) == want, s"$comp rgb=$rgb")
    }
  }

  test("Predictor 2 (horizontal differencing) over a Deflate strip " +
    "undoes per row per channel — hand-built RGB fixture") {
    val w = 16; val h = 16; val ch = 3
    // row-delta encode the RGB grid, zlib it, wrap in a LE TIFF
    val px = Array.tabulate(h * w * ch) { i =>
      base((i / ch) % w, i / (w * ch)).toByte
    }
    val diff = px.clone()
    for (y <- h - 1 to 0 by -1; p <- w * ch - 1 to ch by -1) {
      val i = y * w * ch + p
      diff(i) = (px(i) - px(i - ch)).toByte
    }
    val defl = {
      val d = new java.util.zip.Deflater()
      d.setInput(diff); d.finish()
      val buf = new Array[Byte](diff.length * 2 + 64)
      val n = d.deflate(buf); d.end()
      buf.take(n)
    }
    val ifdAt = 8 + defl.length + (defl.length & 1)
    val bos = new ByteArrayOutputStream()
    bos.write("II".getBytes); bos.write(42); bos.write(0)
    bos.write(le(ifdAt, 4)); bos.write(defl)
    if ((defl.length & 1) == 1) bos.write(0)
    val tags = Seq(
      (256, 3, w.toLong), (257, 3, h.toLong), (258, 3, 8L),
      (259, 3, 8L), (262, 3, 2L), (273, 4, 8L), (277, 3, ch.toLong),
      (278, 3, h.toLong), (279, 4, defl.length.toLong), (317, 3, 2L))
    bos.write(le(tags.length, 2))
    for ((tag, tpe, value) <- tags) {
      bos.write(le(tag, 2)); bos.write(le(tpe, 2)); bos.write(le(1, 4))
      if (tpe == 4) bos.write(le(value, 4))
      else { bos.write(le(value, 2)); bos.write(le(0, 2)) }
    }
    bos.write(le(0, 4))
    assert(TiffDhash.compute(bos.toByteArray) ==
      BmpDhash.compute(bmpOf(base, 16, 16)))
  }

  test("the q336 committed fixtures (tool-encoded LZW / PackBits / " +
    "Deflate+Predictor2 of the q326 grid) hash to the pinned " +
    "cross-format constant") {
    val lzw = "49492a000a010000800001a1a138d0824e2d9a0ea8247a7152b66181c2821170ec9055311bcf8894b28d60bd0103836281a9089e5c349d906904eaa96ec404854442f1e124ac63381f51497522c57c0308070523621940ba6a3ba11229e55ae18a0a0b88c603d2515cc8713f22d30a5592fc08110f0a86e4428978d67842a493eac5cb181618128c47c4b2c194e47f462654cb360014241f160e08a522f9b0f28649a815aba638303226198fc9859331cd008d4d29d68c10304c402d1d118a660369e90e9450ab97702824189a5a339d1028e4daa16ac2894522c54309b8f6884aa895ebc00c8a492684c2e1b0f6182265349b466371d8f8081f42a251a532b96cbc1216a9552ad01000090000010300010000001000000001010300010000001000000002010300010000000800000003010300010000000500000006010300010000000100000011010400010000000800000015010300010000000100000016010300010000001000000017010400010000000101000000000000"
    val pb = "49492a000a0100007f000d1a2734414e5b6875828f9ca9b6c30714212e3b4855626f7c8996a3b0bd020e1b2835424f5c697683909daab7c40915222f3c495663707d8a97a4b1be03101c293643505d6a7784919eabb8c50a1723303d4a5764717e8b98a5b2bf04111e2a3744515e6b7885929facb9c60b1825313e4b5865727f8c99a6b3c005121f2c7f3845525f6c798693a0adbac70c1926333f4c596673808d9aa7b4c10613202d3a4653606d7a8794a1aebb000d1a2734414d5a6774818e9ba8b5c20714212e3b4854616e7b8895a2afbc010e1b2835424f5b6875828f9ca9b6c30815222f3c4956626f7c8996a3b0bd020f1c293643505d697683909daab7c4091623303d4a5764090000010300010000001000000001010300010000001000000002010300010000000800000003010300010000000580000006010300010000000100000011010400010000000800000015010300010000000100000016010300010000001000000017010400010000000201000000000000"
    val dp = "49492a0046000000789c63e04505eca85c573e34be282a9757068daf8ccae5d542e31ba272792dd0f8f6a85c5e37542eaf2f1a3f0495cb1b8dc64f42e5f266a2f101c12012c10a0000010300010000001000000001010300010000001000000002010300010000000800000003010300010000000800000006010300010000000100000011010400010000000800000015010300010000000100000016010300010000001000000017010400010000003e0000003d010300010000000200000000000000"
    for ((name, hx) <- Seq(("lzw", lzw), ("packbits", pb),
      ("deflate+pred2", dp))) {
      val got = TiffDhash.compute(
        hx.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      assert(got == -1157460564566376449L, name)
    }
  }

  test("fail-closed: magic, compressed flag, planar 2, 16-bit, " +
    "strip past the payload, truncation, junk") {
    val good = tiffGray(base, 16, 16)
    val bad = good.clone(); bad(0) = 'X'
    assert(TiffDhash.compute(bad) == null)
    // compression tag is the 4th entry: its SHORT value sits at
    // ifd + 2 + 12*3 + 8. Flipping it to LZW leaves RAW pixels where
    // an LZW stream must be — corrupt entropy data must stay null
    val ifdAt = 8 + 256
    val compAt = ifdAt + 2 + 12 * 3 + 8
    val lzw = good.clone(); lzw(compAt) = 5
    assert(TiffDhash.compute(lzw) == null)
    val ccitt = good.clone(); ccitt(compAt) = 2 // CCITT: unsupported
    assert(TiffDhash.compute(ccitt) == null)
    val deep = good.clone(); deep(ifdAt + 2 + 12 * 2 + 8) = 16 // bits
    assert(TiffDhash.compute(deep) == null)
    for (cut <- Seq(6, 100, good.length - 10))
      assert(TiffDhash.compute(good.take(cut)) == null, s"cut $cut")
    assert(TiffDhash.compute("IIjunk junk junk".getBytes) == null)
  }
}
