package graft.functions

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** [[GifDhash]] battery: hand-encoded LZW (root-only codes with
  * spec-exact width bumps), the JDK's own GIF writer (composite
  * codes), interlace, cross-format BMP equality, and the fail-closed
  * refusals. */
class GifDhashSpec extends AnyFunSuite {

  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

  /** 24-bit BMP of a grayscale pattern — the cross-format truth. */
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

  /** Minimal valid LZW stream: clear, then every pixel as a ROOT
    * code, tracking the decoder's dictionary growth so the code
    * width bumps in sync; end code last. */
  private def lzwRoots(pixels: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val bits = new ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    var codeSize = minCode + 1
    def put(c: Int): Unit = {
      acc |= c.toLong << nbits
      nbits += codeSize
      while (nbits >= 8) {
        bits.write((acc & 0xff).toInt)
        acc >>>= 8
        nbits -= 8
      }
    }
    put(clear)
    var next = end + 1
    var first = true
    for (p <- pixels) {
      put(p & 0xff)
      if (!first) { // each non-first code defines one entry
        if (next < 4096) {
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
      }
      first = false
    }
    put(end)
    if (nbits > 0) bits.write((acc & 0xff).toInt)
    bits.toByteArray
  }

  /** Hand-built GIF: global gray palette, one image descriptor. */
  private def gifOf(v: (Int, Int) => Int, w: Int, h: Int,
                    interlaced: Boolean = false,
                    withExt: Boolean = true): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write("GIF89a".getBytes("US-ASCII"))
    bos.write(le(w, 2)); bos.write(le(h, 2))
    bos.write(0xF7) // GCT, 256 entries
    bos.write(0); bos.write(0)
    for (i <- 0 until 256) { bos.write(i); bos.write(i); bos.write(i) }
    if (withExt) { // a graphics-control extension must be skipped
      bos.write(Array[Byte](0x21, 0xF9.toByte, 4, 0, 0, 0, 0, 0))
    }
    bos.write(0x2C)
    bos.write(le(0, 2)); bos.write(le(0, 2))
    bos.write(le(w, 2)); bos.write(le(h, 2))
    bos.write(if (interlaced) 0x40 else 0x00)
    // pixel indices in STORAGE order (interlace reorders rows)
    val rows =
      if (!interlaced) (0 until h).toArray
      else (Seq(0 until h by 8, 4 until h by 8, 2 until h by 4,
        1 until h by 2).flatten.toArray)
    val pixels = rows.flatMap(y =>
      (0 until w).map(x => (v(x, y) & 0xff).toByte))
    bos.write(8) // min code size
    val code = lzwRoots(pixels, 8)
    var off = 0
    while (off < code.length) {
      val n = math.min(255, code.length - off)
      bos.write(n)
      bos.write(code, off, n)
      off += n
    }
    bos.write(0)
    bos.write(0x3B)
    bos.toByteArray
  }

  private def base(x: Int, y: Int) = (x * 13 + y * 7) % 200

  test("cross-format: a hand-encoded GIF hashes EQUAL to the BMP of " +
    "the same pixels; the interlaced save of the same image agrees") {
    val want = BmpDhash.compute(bmpOf(base, 16, 16))
    assert(want != null)
    assert(GifDhash.compute(gifOf(base, 16, 16)) == want)
    assert(GifDhash.compute(gifOf(base, 16, 16, interlaced = true)) == want)
    assert(GifDhash.compute(gifOf(base, 16, 16, withExt = false)) == want)
  }

  test("the JDK's own GIF writer (real composite LZW codes) agrees " +
    "with the hand encoding") {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      img.getRaster.setSample(x, y, 0, base(x, y))
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val got = GifDhash.compute(bos.toByteArray)
    assert(got != null)
    assert(got == BmpDhash.compute(bmpOf(base, 16, 16)))
  }

  test("palette cross-format: the JDK's indexed PNG (color type 3, " +
    "PLTE-resolved) and GIF of the same pixels hash EQUAL to the BMP") {
    val cm = new java.awt.image.IndexColorModel(8, 256,
      Array.tabulate(256)(_.toByte), Array.tabulate(256)(_.toByte),
      Array.tabulate(256)(_.toByte))
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until 16; x <- 0 until 16)
      img.getRaster.setSample(x, y, 0, base(x, y))
    val want = BmpDhash.compute(bmpOf(base, 16, 16))
    for (fmt <- Seq("png", "gif")) {
      val bos = new ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), fmt)
      val got =
        if (fmt == "png") PngDhash.compute(bos.toByteArray)
        else GifDhash.compute(bos.toByteArray)
      assert(got == want, s"$fmt hash mismatch")
    }
  }

  test("GifFrames census: frames, summed GCE delays, NETSCAPE loop; " +
    "static GIFs report 1 frame / no loop; truncation refuses") {
    // animated: NETSCAPE loop 7, two frames with delays 10 + 25 cs
    val bos = new ByteArrayOutputStream()
    bos.write("GIF89a".getBytes("US-ASCII"))
    bos.write(le(4, 2)); bos.write(le(4, 2))
    bos.write(0xF7); bos.write(0); bos.write(0)
    for (i <- 0 until 256) { bos.write(i); bos.write(i); bos.write(i) }
    bos.write(Array[Byte](0x21, 0xFF.toByte, 11))
    bos.write("NETSCAPE2.0".getBytes("US-ASCII"))
    bos.write(Array[Byte](3, 1, 7, 0, 0))
    for (delay <- Seq(10, 25)) {
      bos.write(Array[Byte](0x21, 0xF9.toByte, 4, 0,
        delay.toByte, 0, 0, 0))
      bos.write(0x2C)
      bos.write(le(0, 2)); bos.write(le(0, 2))
      bos.write(le(4, 2)); bos.write(le(4, 2)); bos.write(0)
      val px = Array.tabulate(16)(i => (i * 3).toByte)
      val code = lzwRoots(px, 8)
      bos.write(8); bos.write(code.length); bos.write(code); bos.write(0)
    }
    bos.write(0x3B)
    val ani = bos.toByteArray
    def got(b: Array[Byte]) = Option(GifFrames.compute(b, 1 << 16)).map(r =>
      (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getUTF8String(3).toString))
    assert(got(ani) == Some((2, 35L, 7, "89a")))
    val static = gifOf(base, 16, 16)
    assert(got(static) == Some((1, 0L, -1, "89a")))
    for (cut <- Seq(ani.length - 1, ani.length - 10, 800))
      assert(got(ani.take(cut)).isEmpty, s"cut $cut")
    assert(got("junk bytes".getBytes).isEmpty)
    // the animated GIF's FIRST frame still dHashes (4x4 decodable)
    assert(GifDhash.compute(ani) != null)
  }

  test("GCE delays count only when an IMAGE descriptor consumes " +
    "them: plain-text and trailing GCEs are dropped") {
    val bos = new ByteArrayOutputStream()
    bos.write("GIF89a".getBytes("US-ASCII"))
    bos.write(le(4, 2)); bos.write(le(4, 2))
    bos.write(0xF7); bos.write(0); bos.write(0)
    for (i <- 0 until 256) { bos.write(i); bos.write(i); bos.write(i) }
    // GCE(10cs) consumed by a PLAIN TEXT extension: dropped
    bos.write(Array[Byte](0x21, 0xF9.toByte, 4, 0, 10, 0, 0, 0))
    bos.write(Array[Byte](0x21, 0x01, 12))
    bos.write(new Array[Byte](12)) // text grid block
    bos.write(Array[Byte](2, 'h', 'i', 0))
    // GCE(25cs) consumed by an image: counted
    bos.write(Array[Byte](0x21, 0xF9.toByte, 4, 0, 25, 0, 0, 0))
    bos.write(0x2C)
    bos.write(le(0, 2)); bos.write(le(0, 2))
    bos.write(le(4, 2)); bos.write(le(4, 2)); bos.write(0)
    val px = Array.tabulate(16)(i => (i * 3).toByte)
    val code = lzwRoots(px, 8)
    bos.write(8); bos.write(code.length); bos.write(code); bos.write(0)
    // trailing GCE(99cs) nothing consumes: dropped
    bos.write(Array[Byte](0x21, 0xF9.toByte, 4, 0, 99, 0, 0, 0))
    bos.write(0x3B)
    val r = GifFrames.compute(bos.toByteArray, 1 << 16)
    assert(r != null)
    assert((r.getInt(0), r.getLong(1)) == ((1, 25L)))
  }

  test("fail-closed: signature, truncation at every tier, missing " +
    "color table, oversized dimensions, junk") {
    val good = gifOf(base, 16, 16)
    val bad = good.clone(); bad(0) = 'X'
    assert(GifDhash.compute(bad) == null)
    for (cut <- Seq(5, 12, 700, 790, good.length / 2, good.length - 2))
      assert(GifDhash.compute(good.take(cut)) == null, s"cut $cut")
    // GCT flag cleared: the walk lands in palette bytes, refuses
    val noct = good.clone(); noct(10) = 0x07
    assert(GifDhash.compute(noct) == null)
    assert(GifDhash.compute("GIF89a-junk-junk".getBytes) == null)
    // dimension bomb in the IMAGE DESCRIPTOR (sig 6 + LSD 7 + GCT 768
    // + ext 8 + 0x2C,left,top = offset 794): refuses pre-allocation
    val bomb = good.clone()
    bomb(794) = 0xff.toByte; bomb(795) = 0xff.toByte
    bomb(796) = 0xff.toByte; bomb(797) = 0xff.toByte
    assert(GifDhash.compute(bomb) == null)
  }
}
