package graft.functions

import javax.imageio.ImageIO
import javax.imageio.metadata.IIOMetadataNode

import graft.SparkSpec

/** PNG text-chunk census. The engine-built fixture comes from
  * tools/make_png_meta_fixture.py; the CROSS-ENGINE check writes a
  * PNG through the JDK's OWN ImageIO PNG writer with tEXt/zTXt/iTXt
  * metadata and the kernel must read back identical entries. */
class PngMetaSpec extends SparkSpec {

  private val fixtureHex =
    "89504e470d0a1a0a0000000d4948445200000002000000010802000000" +
    "7b40e8dd0000000467414d410000b18f0bfc6105000000197445587453" +
    "6f66747761726500677261667420706e672063656e7375739b3fc84000" +
    "00002574455874706172616d657465727300612073796e746865746963" +
    "2070726f6d70742c20736565642037586e6c98000000207a545874436f" +
    "6d6d656e740000789c4b494dcb492c494d51284acd4d2cca06002eba05" +
    "dcdf1b737500000026695458745469746c65000100656e00746974656c" +
    "00789c2bce4b4d2d2dcf4dcc537834a31900276a05f1c76f2744000000" +
    "1869545874536f757263650000000000706c61696e20756e69636f6465" +
    "18b113730000000a6558496649492a000800000000000b9cc840000000" +
    "0f49444154789c63105030700848000003870151307974e60000000049" +
    "454e44ae426082"

  private def hx(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("the engine-built fixture: geometry, gamma, eXIf, every text " +
    "kind incl. compressed iTXt unicode") {
    val r = PngMeta.compute(hx(fixtureHex), 1 << 20)
    assert(r != null)
    assert(r.getInt(0) === 2 && r.getInt(1) === 1) // 2x1
    assert(r.getInt(2) === 8 && r.getInt(3) === 2) // 8-bit RGB
    assert(r.getInt(4) === 0) // not interlaced
    assert(r.getInt(5) === 45455) // gAMA
    assert(r.getLong(6) === 10L) // eXIf payload bytes
    assert(r.getLong(7) === 10L) // chunks incl. IEND
    val texts = r.getArray(8)
    val got = (0 until texts.numElements()).map { i =>
      val t = texts.getStruct(i, 3)
      (t.getUTF8String(0).toString, t.getUTF8String(1).toString,
        t.getUTF8String(2).toString)
    }
    assert(got === Seq(
      ("tEXt", "Software", "graft png census"),
      ("tEXt", "parameters", "a synthetic prompt, seed 7"),
      ("zTXt", "Comment", "deflated remark"),
      ("iTXt", "Title", "sneeuwman \u2603"),
      ("iTXt", "Source", "plain unicode")))
  }

  test("cross-engine: ImageIO's own PNG writer's tEXt/zTXt/iTXt come " +
    "back identically") {
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xAA5500)
    val writer = ImageIO.getImageWritersByFormatName("png").next()
    val ios = new java.io.ByteArrayOutputStream()
    val mos = ImageIO.createImageOutputStream(ios)
    writer.setOutput(mos)
    val tpe = new javax.imageio.ImageTypeSpecifier(img)
    val meta = writer.getDefaultImageMetadata(tpe, null)
    val fmt = "javax_imageio_png_1.0"
    val root = new IIOMetadataNode(fmt)
    val tEXt = new IIOMetadataNode("tEXt")
    val te = new IIOMetadataNode("tEXtEntry")
    te.setAttribute("keyword", "Software")
    te.setAttribute("value", "jdk imageio writer")
    tEXt.appendChild(te)
    root.appendChild(tEXt)
    val zTXt = new IIOMetadataNode("zTXt")
    val ze = new IIOMetadataNode("zTXtEntry")
    ze.setAttribute("keyword", "Comment")
    ze.setAttribute("compressionMethod", "deflate")
    ze.setAttribute("text", "jdk deflated body")
    zTXt.appendChild(ze)
    root.appendChild(zTXt)
    val iTXt = new IIOMetadataNode("iTXt")
    val ie = new IIOMetadataNode("iTXtEntry")
    ie.setAttribute("keyword", "Title")
    ie.setAttribute("compressionFlag", "FALSE")
    ie.setAttribute("compressionMethod", "0")
    ie.setAttribute("languageTag", "en")
    ie.setAttribute("translatedKeyword", "title")
    ie.setAttribute("text", "jdk unicode \u2603")
    iTXt.appendChild(ie)
    root.appendChild(iTXt)
    meta.mergeTree(fmt, root)
    writer.write(null, new javax.imageio.IIOImage(img, null, meta), null)
    mos.close()
    val png = ios.toByteArray
    val r = PngMeta.compute(png, 1 << 20)
    assert(r != null, "kernel refused the JDK's own PNG")
    assert(r.getInt(0) === 3 && r.getInt(1) === 2)
    val texts = r.getArray(8)
    val got = (0 until texts.numElements()).map { i =>
      val t = texts.getStruct(i, 3)
      (t.getUTF8String(0).toString, t.getUTF8String(1).toString,
        t.getUTF8String(2).toString)
    }.toSet
    assert(got === Set(
      ("tEXt", "Software", "jdk imageio writer"),
      ("zTXt", "Comment", "jdk deflated body"),
      ("iTXt", "Title", "jdk unicode \u2603")))
  }

  test("fail-closed battery: CRC flip, truncation, bad magic, " +
    "missing IEND, corrupt zTXt stream") {
    val good = hx(fixtureHex)
    val flip = good.clone()
    flip(30) = (flip(30) ^ 1).toByte // inside gAMA data -> CRC breaks
    assert(PngMeta.compute(flip, 1 << 20) == null)
    assert(PngMeta.compute(good.take(50), 1 << 20) == null)
    val badMagic = good.clone(); badMagic(1) = 'Q'
    assert(PngMeta.compute(badMagic, 1 << 20) == null)
    // cut before IEND: unterminated
    assert(PngMeta.compute(good.take(good.length - 12), 1 << 20) == null)
    // corrupt the zTXt deflate body AND fix up its CRC: inflate fails
    val doc = good.clone()
    val tagAt = new String(good.map(_.toChar)).indexOf("zTXt")
    val lenAt = tagAt - 4
    val len = ((good(lenAt) & 0xff) << 24) | ((good(lenAt + 1) & 0xff) << 16) |
      ((good(lenAt + 2) & 0xff) << 8) | (good(lenAt + 3) & 0xff)
    doc(tagAt + 4 + 10) = (doc(tagAt + 4 + 10) ^ 0x7f).toByte
    val crc = new java.util.zip.CRC32()
    crc.update(doc, tagAt, 4 + len)
    val cv = crc.getValue
    doc(tagAt + 4 + len) = ((cv >> 24) & 0xff).toByte
    doc(tagAt + 5 + len) = ((cv >> 16) & 0xff).toByte
    doc(tagAt + 6 + len) = ((cv >> 8) & 0xff).toByte
    doc(tagAt + 7 + len) = (cv & 0xff).toByte
    assert(PngMeta.compute(doc, 1 << 20) == null)
  }

  test("a PNG with no text chunks yields an empty array, not null") {
    // strip the text/gAMA/eXIf chunks: keep magic+IHDR+IDAT+IEND
    val good = hx(fixtureHex)
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, 8)
    var pos = 8
    while (pos + 12 <= good.length) {
      val len = ((good(pos) & 0xff) << 24) | ((good(pos + 1) & 0xff) << 16) |
        ((good(pos + 2) & 0xff) << 8) | (good(pos + 3) & 0xff)
      val tag = new String(good, pos + 4, 4, "US-ASCII")
      if (tag == "IHDR" || tag == "IDAT" || tag == "IEND")
        out.write(good, pos, 12 + len)
      pos += 12 + len
    }
    val r = PngMeta.compute(out.toByteArray, 1 << 20)
    assert(r != null)
    assert(r.isNullAt(5) && r.isNullAt(6)) // no gamma, no exif
    assert(r.getLong(7) === 3L)
    assert(r.getArray(8).numElements() === 0)
  }

  private val exifFixtureHex =
    "89504e470d0a1a0a0000000d4948445200000001000000010800000000" +
    "3a7e9b55000000616558496649492a000800000004000f010200090000" +
    "003e000000100102000600000047000000120103000100000006000000" +
    "32010200140000004d00000000000000477261667443616d00504e472d" +
    "3100323032363a30383a31362031323a30303a3030002018f872000000" +
    "0a49444154789c636800000082008177cd72b60000000049454e44ae42" +
    "6082"

  test("eXIf chunk: the raw TIFF blob parses through the shared IFD " +
    "walk — orientation, make, model, datetime") {
    val r = PngExif.compute(hx(exifFixtureHex))
    assert(r != null)
    assert(r.getInt(0) === 6)
    assert(r.getUTF8String(1).toString === "GraftCam")
    assert(r.getUTF8String(2).toString === "PNG-1")
    assert(r.getUTF8String(3).toString === "2026:08:16 12:00:00")
  }

  test("eXIf fail-closed: CRC flip inside the chunk, no-eXIf file, " +
    "truncated TIFF") {
    val good = hx(exifFixtureHex)
    val flip = good.clone()
    flip(40) = (flip(40) ^ 1).toByte // inside eXIf data -> CRC breaks
    assert(PngExif.compute(flip) == null)
    // the q370 fixture's eXIf stub is a VALID empty IFD: a row with
    // every field null, not a refusal
    val stub = PngExif.compute(hx(fixtureHex))
    assert(stub != null && (0 until 4).forall(stub.isNullAt))
    assert(PngExif.compute(good.take(30)) == null)
    assert(PngExif.compute("not png".getBytes) == null)
  }
}
