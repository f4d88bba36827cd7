package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Native baseline-JPEG decoder battery: every payload comes from the
  * INDEPENDENT from-scratch python encoder+reference-decoder
  * (tools/make_jpeg_fixture.py) implementing the same pinned integer
  * reconstruction contract, so the hashes must match bit for bit —
  * the tier that used to be per-JRE is now engine-exact. */
class JpegNativeSpec extends AnyFunSuite {

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val jGray = "ffd8ffdb004300100b0a101828333d0c0c0e131a3a3c370e0d1018283945380e11161d3357503e12162538446d674d182337405168715c31404e5767797865485c5f6270646763ffc0000b080010001001011100ffc400160001020000000000000000000000000000050001ffc40023100001020504040000000000000000000001020400031123410521316114323391ffda0008010100003f000b4965d437aa3bf1a4db5526aac37a729a8dc8a11e83f1a47d2597501bc7aa773494a94650b6d13812c640a0fa1df8ae311fffd9"
  private val jColor420 = "ffd8ffdb004300100b0a101828333d0c0c0e131a3a3c370e0d1018283945380e11161d3357503e12162538446d674d182337405168715c31404e5767797865485c5f6270646763ffdb0043011112182f6363636312151a4263636363181a3863636363632f426363636363636363636363636363636363636363636363636363636363636363636363636363ffc00011080010001003012200021101031101ffc400160001020000000000000000000000000000050001ffc40023100001020504040000000000000000000001020400031123410521316114323391ffc4001501020000000000000000000000000000000003ffc4001b11000105020000000000000000000000000111213242a10002ffc4001502020000000000000000000000000000000003ffc4001a120002030200000000000000000000000002a10103330021ffdd00040002ffda000c03010002110322003f000b4965d437aa3bf1a4db5526aac37a729a8dc8a11e83f1a47d2597501bc7aa773494a94650b6d13812c640a0fa1df8ae3117e868d0ea8ea09aa30a4c943faeffd9"
  private val jColor444 = "ffd8ffdb004300100b0a101828333d0c0c0e131a3a3c370e0d1018283945380e11161d3357503e12162538446d674d182337405168715c31404e5767797865485c5f6270646763ffdb0043011112182f6363636312151a4263636363181a3863636363632f426363636363636363636363636363636363636363636363636363636363636363636363636363ffc00011080010001003011100021101031101ffc400160001020000000000000000000000000000050001ffc40023100001020504040000000000000000000001020400031123410521316114323391ffc400160101020000000000000000000000000000020003ffc400211100010205060000000000000000000000010002042272b1b21213233181a1ffc400160201020000000000000000000000000000040005ffc400211200010205060000000000000000000000020003010434416211316191a1d1ffda000c03010002110322003f000b4965d46605b23a936288d49629bd51df8d26daa935561bd394d46e4508f41f8d2186f19f320b9b5258afa4b2ea0b01db3a491d0fc219cf391a764079de3f788378f54ee6929528ca16da270258c8141f43bf15c621443646d42c51cc1c2a874e37d2dd6cbfffd9"

  test("engine-built gray, 4:2:0-with-restarts and 4:4:4 JPEGs decode " +
    "to the python reference's PINNED hashes") {
    assert(JpegDhash.compute(hx(jGray)) != null)
    assert(JpegDhash.compute(hx(jGray)).longValue == -1166467901801136257L)
    assert(JpegDhash.compute(hx(jColor420)).longValue == -1166467901801136129L)
    assert(JpegDhash.compute(hx(jColor444)).longValue == -1202496705279394050L)
  }

  test("the JDK writer's own output decodes natively and lands " +
    "hamming-near the lossless source (gray and RGB)") {
    for (rgb <- Seq(false, true)) {
      val img = new java.awt.image.BufferedImage(32, 32,
        if (rgb) java.awt.image.BufferedImage.TYPE_INT_RGB
        else java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      def v(x: Int, y: Int) = 128 + ((x / 8) % 2 * 24 - 12) + ((y / 8) % 3 * 8)
      for (y <- 0 until 32; x <- 0 until 32) {
        val g = v(x, y)
        if (rgb) img.setRGB(x, y, (g << 16) | (g << 8) | g)
        else img.getRaster.setSample(x, y, 0, g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      val got = JpegDhash.compute(bos.toByteArray)
      assert(got != null, s"rgb=$rgb refused")
      // the block-constant pattern is ~losslessly coded: equal or
      // within the near-dup radius of the true pixels' hash
      val want = {
        val px = Array.tabulate(32 * 32)(i => v(i % 32, i / 32))
        def luma(x: Int, y: Int) = px(y * 32 + x).toLong * 1000L
        val xs = Array.tabulate(9)(i => i * 31 / 8)
        var bits = 0L
        for (j <- 0 until 8; i <- 0 until 8)
          if (luma(xs(i + 1), j * 31 / 7) > luma(xs(i), j * 31 / 7))
            bits |= 1L << (8 * j + i)
        bits
      }
      val drift = java.lang.Long.bitCount(got.longValue ^ want)
      assert(drift <= 3, s"rgb=$rgb drift $drift")
    }
  }

  private def jdkJpeg(rgb: Boolean, progressive: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(32, 32,
      if (rgb) java.awt.image.BufferedImage.TYPE_INT_RGB
      else java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    def v(x: Int, y: Int) =
      128 + ((x / 8) % 2 * 24 - 12) + ((y / 8) % 3 * 8) + (x + 2 * y) % 5
    for (y <- 0 until 32; x <- 0 until 32) {
      val g = v(x, y)
      if (rgb) img.setRGB(x, y, (g << 16) | (g << 8) | g)
      else img.getRaster.setSample(x, y, 0, g)
    }
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  private val jProg420 = "ffd8ffdb004300100b0a101828333d0c0c0e131a3a3c370e0d1018283945380e11161d3357503e12162538446d674d182337405168715c31404e5767797865485c5f6270646763ffdb0043011112182f6363636312151a4263636363181a3863636363632f426363636363636363636363636363636363636363636363636363636363636363636363636363ffc20011080010001003012200021101031101ffc400160001020000000000000000000000000000050001ffc4001501020000000000000000000000000000000003ffc4001502020000000000000000000000000000000003ffda000c0301000210032000000009be1dd7ffc40023100001020504040000000000000000000001020400031123410521316114323391ffda0008010100013f00d259751aa3bf1a4db5526aac37a729a8dc8a11e83f1a4692cba878f54ee6929528ca16da270258c8141f43bf15c623ffc4001b11000105020000000000000000000000000111213242a10002ffda0008010201013f00f4346875477fffc4001a120002030200000000000000000000000002a10103330021ffda0008010302013f0009aa30a4c943faefffd9"

  test("the engine-built SOF2 spectral-selection fixture (same " +
    "quantized coefficients as the baseline 4:2:0) decodes to the " +
    "SAME pinned hash") {
    val got = JpegDhash.compute(hx(jProg420))
    assert(got != null, "refused")
    assert(got.longValue == -1166467901801136129L)
    assert(got.longValue == JpegDhash.compute(hx(jColor420)).longValue)
  }

  test("PROGRESSIVE scans decode: the JDK writer's standard " +
    "progression script (DC successive approximation + AC bands + " +
    "refinements) reconstructs the SAME pixels as its sequential " +
    "output — hashes equal, gray and RGB") {
    for (rgb <- Seq(false, true)) {
      val base = JpegDhash.compute(jdkJpeg(rgb, progressive = false))
      val prog = JpegDhash.compute(jdkJpeg(rgb, progressive = true))
      assert(base != null && prog != null, s"rgb=$rgb refused")
      // same quant tables -> identical quantized coefficients -> the
      // pinned reconstruction must agree EXACTLY
      assert(prog.longValue == base.longValue, s"rgb=$rgb")
    }
  }

  test("fail-closed: malformed SOF2 carrying a baseline full scan, " +
    "missing EOI, truncation, marker inside entropy data, dimension " +
    "bomb, junk") {
    val good = hx(jGray)
    // flip the SOF marker to SOF2: the full Ss=0..Se=63 scan is
    // illegal inside a progressive frame (T.81) and must refuse
    val prog = good.clone()
    val sofAt = {
      var p = 2
      while ((prog(p + 1) & 0xff) != 0xc0) p += 2 +
        (((prog(p + 2) & 0xff) << 8) | (prog(p + 3) & 0xff))
      p
    }
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegDhash.compute(prog) == null, "progressive-full-scan")
    assert(JpegDhash.compute(good.dropRight(1)) == null, "no EOI")
    for (cut <- Seq(3, 20, good.length / 2))
      assert(JpegDhash.compute(good.take(cut)) == null, s"cut $cut")
    val bomb = good.clone()
    bomb(sofAt + 5) = 0xea.toByte; bomb(sofAt + 6) = 0x60.toByte
    bomb(sofAt + 7) = 0xea.toByte; bomb(sofAt + 8) = 0x60.toByte
    assert(JpegDhash.compute(bomb) == null, "bomb")
    assert(JpegDhash.compute("junk".getBytes) == null)
  }
}
