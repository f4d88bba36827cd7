package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** `.lz4` and `.sz` frame decoding against the REAL libraries' output
  * (lz4-java's LZ4FrameOutputStream, snappy-java's framed stream),
  * a hand-framed block-DEPENDENT lz4 frame, and the fail-closed
  * surface: every checksum verified, dictionary frames refused. */
class FrameCodecsSpec extends SparkSpec {
  import spark.implicits._

  private val text = ("the quick brown fox jumps over the lazy dog — " +
    "padding pad pad ") * 3000 // ~200 KB: multiple 64 KB blocks

  test("lz4 frame: real LZ4FrameOutputStream output round-trips — " +
    "multi-block, content checksum verified; concatenated frames") {
    import net.jpountz.lz4.LZ4FrameOutputStream
    val bos = new ByteArrayOutputStream()
    val w = new LZ4FrameOutputStream(bos)
    w.write(text.getBytes("UTF-8")); w.close()
    val framed = bos.toByteArray
    val got = FrameCodecs.lz4Frame(framed, 1 << 26)
    assert(got != null && new String(got, "UTF-8") == text)
    // concatenated frames decode as concatenated content
    val two = framed ++ framed
    assert(new String(FrameCodecs.lz4Frame(two, 1 << 26), "UTF-8")
      == text + text)
  }

  test("lz4 frame: hand-framed block-DEPENDENT frame — a match in " +
    "block 2 reaches back into block 1's decoded output") {
    val hdr = Array[Byte](0x40, 0x40) // FLG: v01, dependent; BD: 64KB
    val hc = ((FrameCodecs.xxh32(hdr, 0, 2, 0) >>> 8) & 0xff).toByte
    val frame = Array[Byte](0x04, 0x22, 0x4d, 0x18) ++ hdr ++ Array(hc) ++
      Array[Byte](0x08, 0x00, 0x00, 0x80.toByte) ++ // raw block, 8 bytes
      "abcdefgh".getBytes ++
      Array[Byte](0x05, 0x00, 0x00, 0x00) ++ // compressed block, 5 bytes
      Array[Byte](0x04, 0x08, 0x00, 0x10, 'z'.toByte) ++
      Array[Byte](0, 0, 0, 0) // EndMark
    val got = FrameCodecs.lz4Frame(frame, 1 << 20)
    assert(got != null && new String(got) == "abcdefgh" + "abcdefgh" + "z")
  }

  test("snappy framing format: real snappy-java framed output " +
    "round-trips; every chunk CRC verified") {
    import org.xerial.snappy.SnappyFramedOutputStream
    val bos = new ByteArrayOutputStream()
    val w = new SnappyFramedOutputStream(bos)
    w.write(text.getBytes("UTF-8")); w.close()
    val framed = bos.toByteArray
    val got = FrameCodecs.snappyFrame(framed, 1 << 26)
    assert(got != null && new String(got, "UTF-8") == text)
  }

  test("frame decoders fail closed: checksum flips, truncation at " +
    "every cut, DictID refusal, reserved snappy chunk") {
    import net.jpountz.lz4.LZ4FrameOutputStream
    import org.xerial.snappy.SnappyFramedOutputStream
    val bos = new ByteArrayOutputStream()
    // content checksum ON (lz4-java's default frame carries none — a
    // payload flip there decodes to silently different bytes, which
    // is the FORMAT's contract, not a decoder gap)
    val w = new LZ4FrameOutputStream(bos,
      LZ4FrameOutputStream.BLOCKSIZE.SIZE_64KB, -1L,
      LZ4FrameOutputStream.FLG.Bits.BLOCK_INDEPENDENCE,
      LZ4FrameOutputStream.FLG.Bits.CONTENT_CHECKSUM)
    w.write(text.getBytes("UTF-8")); w.close()
    val lz = bos.toByteArray
    // sanity: the checksummed frame round-trips, then a payload flip
    // must refuse
    assert(new String(FrameCodecs.lz4Frame(lz, 1 << 26), "UTF-8") == text)
    val flip = lz.clone()
    flip(lz.length / 2) = (flip(lz.length / 2) ^ 1).toByte
    assert(FrameCodecs.lz4Frame(flip, 1 << 26) == null)
    for (cut <- Seq(3, 6, 10, lz.length / 2, lz.length - 1))
      assert(FrameCodecs.lz4Frame(lz.take(cut), 1 << 26) == null,
        s"cut $cut")
    // DictID flag refused even with a VALID header checksum
    val hdr = Array[Byte](0x41, 0x40) // version 01 + DictID bit
    val hc = ((FrameCodecs.xxh32(hdr, 0, 2, 0) >>> 8) & 0xff).toByte
    val dict = Array[Byte](0x04, 0x22, 0x4d, 0x18) ++ hdr ++
      Array[Byte](1, 2, 3, 4) ++ Array(hc) ++ Array[Byte](0, 0, 0, 0)
    assert(FrameCodecs.lz4Frame(dict, 1 << 20) == null)
    val sb = new ByteArrayOutputStream()
    val sw = new SnappyFramedOutputStream(sb)
    sw.write(text.getBytes("UTF-8")); sw.close()
    val sz = sb.toByteArray
    // deterministic flips: byte 14 = first chunk's CRC field, byte 20
    // = inside its snappy data (10 stream id + 4 chunk header + 4 CRC)
    for (at <- Seq(14, 20)) {
      val sflip = sz.clone()
      sflip(at) = (sflip(at) ^ 1).toByte
      assert(FrameCodecs.snappyFrame(sflip, 1 << 26) == null, s"flip $at")
    }
    for (cut <- Seq(5, 9, 14, sz.length - 1))
      assert(FrameCodecs.snappyFrame(sz.take(cut), 1 << 26) == null)
    // an unskippable reserved chunk type refuses
    val reserved = sz ++ Array[Byte](0x02, 0x01, 0x00, 0x00, 0x00)
    assert(FrameCodecs.snappyFrame(reserved, 1 << 26) == null)
  }

  test("documentText routes lz4 and snappy wrappers") {
    import net.jpountz.lz4.LZ4FrameOutputStream
    import org.xerial.snappy.SnappyFramedOutputStream
    val b1 = new ByteArrayOutputStream()
    val w1 = new LZ4FrameOutputStream(b1)
    w1.write("lz4 wrapped text".getBytes("UTF-8")); w1.close()
    val b2 = new ByteArrayOutputStream()
    val w2 = new SnappyFramedOutputStream(b2)
    w2.write("snappy wrapped text".getBytes("UTF-8")); w2.close()
    // kernel-level first: localize any failure to the kernel vs the
    // dispatcher
    val k1 = FrameCodecs.lz4Frame(b1.toByteArray, 1 << 20)
    assert(k1 != null && new String(k1, "UTF-8") == "lz4 wrapped text",
      s"lz4 kernel: ${if (k1 == null) "null" else new String(k1, "UTF-8")}")
    val k2 = FrameCodecs.snappyFrame(b2.toByteArray, 1 << 20)
    assert(k2 != null && new String(k2, "UTF-8") == "snappy wrapped text",
      s"snappy kernel: ${if (k2 == null) "null" else new String(k2, "UTF-8")}")
    val fmts = Seq((1L, b1.toByteArray), (2L, b2.toByteArray))
      .toDF("doc_id", "payload")
      .select(col("doc_id"),
        graft.ext.Multimodal.sniffFormat(col("payload")).as("f"))
      .orderBy("doc_id").collect()
    assert(fmts.map(_.getString(1)).toSeq == Seq("lz4", "snappy"),
      fmts.map(_.getString(1)).mkString(","))
    val dt = graft.ext.Multimodal.documentText(
      Seq((1L, b1.toByteArray), (2L, b2.toByteArray))
        .toDF("doc_id", "payload")).orderBy("doc_id").collect()
    assert(dt(0).getString(1) == "lz4" &&
      dt(0).getString(2) == "lz4 wrapped text")
    assert(dt(1).getString(1) == "snappy" &&
      dt(1).getString(2) == "snappy wrapped text")
  }
}
