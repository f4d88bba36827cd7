package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Multimodal

class Id3TextFramesSpec extends SparkSpec {
  import spark.implicits._

  private def frame(id: String, data: Array[Byte], v4: Boolean): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(id.getBytes("ISO-8859-1"))
    val s = data.length
    if (v4) bos.write(Array((s >> 21) & 127, (s >> 14) & 127,
      (s >> 7) & 127, s & 127).map(_.toByte))
    else bos.write(Array(s >>> 24, (s >> 16) & 255, (s >> 8) & 255,
      s & 255).map(_.toByte))
    bos.write(Array(0, 0).map(_.toByte))
    bos.write(data)
    bos.toByteArray
  }

  private def tag(major: Int, frames: Array[Byte]*): Array[Byte] = {
    val body = frames.flatten.toArray
    val bos = new ByteArrayOutputStream()
    bos.write("ID3".getBytes); bos.write(major); bos.write(0); bos.write(0)
    val s = body.length
    bos.write(Array((s >> 21) & 127, (s >> 14) & 127, (s >> 7) & 127,
      s & 127).map(_.toByte))
    bos.write(body)
    bos.toByteArray
  }

  private def textData(enc: Int, s: String): Array[Byte] = {
    val cs = enc match {
      case 0 => "ISO-8859-1"; case 1 => "UTF-16"; case 2 => "UTF-16BE"
      case 3 => "UTF-8"
    }
    Array(enc.toByte) ++ s.getBytes(cs)
  }

  test("id3: v2.3 and v2.4 sizes, all four encodings, NUL terminator strip, " +
    "non-text frames skipped, padding ends the walk") {
    val t3 = tag(3,
      frame("TIT2", textData(0, "Café latin1"), v4 = false),
      frame("COMM", Array[Byte](0, 1, 2, 3), v4 = false),
      frame("TPE1", textData(3, "utf8 é") :+ 0.toByte, v4 = false))
    val r3 = Id3TextFrames.compute(t3, 64)
    assert(r3.numElements() == 2)
    def row(a: org.apache.spark.sql.catalyst.util.GenericArrayData, i: Int) = {
      val s = a.getStruct(i, 2)
      (s.getUTF8String(0).toString, s.getUTF8String(1).toString)
    }
    assert(row(r3, 0) == ("TIT2", "Café latin1"))
    assert(row(r3, 1) == ("TPE1", "utf8 é"))
    val t4 = tag(4,
      frame("TIT2", textData(1, "utf16 bom ü"), v4 = true),
      frame("TALB", textData(2, "be à"), v4 = true))
    val r4 = Id3TextFrames.compute(t4, 64)
    assert(row(r4, 0) == ("TIT2", "utf16 bom ü"))
    assert(row(r4, 1) == ("TALB", "be à"))
    // padding after the frames ends the walk cleanly
    val padded = tag(3, frame("TIT2", textData(0, "x"), v4 = false)
      ++ new Array[Byte](20))
    assert(Id3TextFrames.compute(padded, 64).numElements() == 1)
  }

  test("id3: tag-level unsynchronisation (flag 0x80) is reversed before the walk") {
    // text whose latin1 bytes contain 0xFF ('ÿ'): the unsynced wire
    // form inserts 0x00 after every 0xFF in the tag body
    val plain = tag(3, frame("TIT2", textData(0, "ÿaÿb"), v4 = false),
      frame("TPE1", textData(0, "zÿ"), v4 = false))
    val body = plain.drop(10)
    val unsynced = new ByteArrayOutputStream()
    body.foreach { b =>
      unsynced.write(b)
      if (b == 0xff.toByte) unsynced.write(0)
    }
    val wire = unsynced.toByteArray
    val s = wire.length
    val hdr = new ByteArrayOutputStream()
    hdr.write("ID3".getBytes); hdr.write(3); hdr.write(0)
    hdr.write(0x80) // unsynchronisation flag
    hdr.write(Array((s >> 21) & 127, (s >> 14) & 127, (s >> 7) & 127,
      s & 127).map(_.toByte))
    hdr.write(wire)
    val r = Id3TextFrames.compute(hdr.toByteArray, 64)
    assert(r != null && r.numElements() == 2)
    val t0 = r.getStruct(0, 2)
    val t1 = r.getStruct(1, 2)
    assert(t0.getUTF8String(1).toString == "ÿaÿb")
    assert(t1.getUTF8String(1).toString == "zÿ")
    // without the flag the same wire bytes would misparse — prove the
    // flag is what gates the reversal (flag 0 + unsynced body: TIT2's
    // size now points mid-data, so the walk fails or yields junk ids)
    val noFlag = hdr.toByteArray.clone(); noFlag(5) = 0
    val r2 = Id3TextFrames.compute(noFlag, 64)
    assert(r2 == null || (0 until r2.numElements()).forall { i =>
      r2.getStruct(i, 2).getUTF8String(1).toString != "ÿaÿb" })
  }

  test("id3 v2.4: unsynchronisation is PER FRAME (sizes describe the " +
    "stored data) — tag flag, frame format flag 0x02, and the " +
    "data-length-indicator prefix (0x01) all honored") {
    def unsync(b: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      b.foreach { x => bos.write(x); if (x == 0xff.toByte) bos.write(0) }
      bos.toByteArray
    }
    def frame4(id: String, data: Array[Byte], fmtFlags: Int): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      bos.write(id.getBytes("ISO-8859-1"))
      val s = data.length // v2.4: syncsafe size of the STORED data
      bos.write(Array((s >> 21) & 127, (s >> 14) & 127, (s >> 7) & 127,
        s & 127).map(_.toByte))
      bos.write(0); bos.write(fmtFlags)
      bos.write(data)
      bos.toByteArray
    }
    def syncsafe4(v: Int): Array[Byte] = Array((v >> 21) & 127,
      (v >> 14) & 127, (v >> 7) & 127, v & 127).map(_.toByte)
    def row(a: org.apache.spark.sql.catalyst.util.GenericArrayData, i: Int) = {
      val s = a.getStruct(i, 2)
      (s.getUTF8String(0).toString, s.getUTF8String(1).toString)
    }
    // tag-level flag: every frame's DATA is unsynced, sizes are stored
    // sizes — a UTF-16 BOM (FF FE) makes the old tag-wide collapse
    // misalign; the per-frame reversal keeps the second frame intact
    val d1 = unsync(textData(1, "utf16 ü"))
    val body1 = frame4("TIT2", d1, 0) ++ frame4("TALB", textData(0, "next"), 0)
    val bos = new ByteArrayOutputStream()
    bos.write("ID3".getBytes); bos.write(4); bos.write(0); bos.write(0x80)
    bos.write(syncsafe4(body1.length)); bos.write(body1)
    val r1 = Id3TextFrames.compute(bos.toByteArray, 64)
    assert(r1 != null && r1.numElements() == 2)
    assert(row(r1, 0) == ("TIT2", "utf16 ü"))
    assert(row(r1, 1) == ("TALB", "next"))
    // frame-level opt-in (format flag 0x02) with no tag flag
    val t2 = tag(4, frame4("TPE1", unsync(textData(1, "ÿsolo")), 0x02),
      frame4("TIT2", textData(0, "after"), 0))
    val r2 = Id3TextFrames.compute(t2, 64)
    assert(r2 != null && r2.numElements() == 2)
    assert(row(r2, 0) == ("TPE1", "ÿsolo"))
    assert(row(r2, 1) == ("TIT2", "after"))
    // data-length indicator (0x01) + unsync (0x02): a 4-byte syncsafe
    // original-length prefix precedes the unsynced data
    val plain3 = textData(1, "both ÿ")
    val d3 = syncsafe4(plain3.length) ++ unsync(plain3)
    val t3 = tag(4, frame4("TCON", d3, 0x03))
    val r3 = Id3TextFrames.compute(t3, 64)
    assert(r3 != null && r3.numElements() == 1)
    assert(row(r3, 0) == ("TCON", "both ÿ"))
  }

  test("id3 v2.2: 3-char ids with 3-byte big-endian sizes; both v2.2 " +
    "encodings; non-text frames skipped; unsync reversal applies") {
    def frame22(id: String, data: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      bos.write(id.getBytes("ISO-8859-1"))
      val sz = data.length
      bos.write(Array((sz >> 16) & 255, (sz >> 8) & 255, sz & 255)
        .map(_.toByte))
      bos.write(data)
      bos.toByteArray
    }
    val t22 = tag(2,
      frame22("TT2", textData(0, "Old Title")),
      frame22("PIC", Array[Byte](0, 1, 2, 3)), // non-text: skipped
      frame22("TP1", textData(1, "Art\u00e9st")))
    val got = Id3TextFrames.compute(t22, 64)
    assert(got != null)
    val rows = (0 until got.numElements()).map { i =>
      val r = got.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
    }
    assert(rows == Seq(("TT2", "Old Title"), ("TP1", "Art\u00e9st")))
    // v2.2 with the tag-level unsync flag: the UTF-16 BOM's FF gets
    // an inserted 00 on the wire, reversed before the walk
    val body = frame22("TT2", textData(1, "Sync"))
    val unsynced = new ByteArrayOutputStream()
    body.foreach { b =>
      unsynced.write(b)
      if (b == 0xff.toByte) unsynced.write(0)
    }
    val wire = unsynced.toByteArray
    val bos = new ByteArrayOutputStream()
    bos.write("ID3".getBytes); bos.write(2); bos.write(0); bos.write(0x80)
    val sz = wire.length
    bos.write(Array((sz >> 21) & 127, (sz >> 14) & 127, (sz >> 7) & 127,
      sz & 127).map(_.toByte))
    bos.write(wire)
    val g2 = Id3TextFrames.compute(bos.toByteArray, 64)
    assert(g2 != null && g2.numElements() == 1)
    assert(g2.getStruct(0, 2).getUTF8String(1).toString == "Sync")
  }

  test("id3 fails closed: no magic, bad version, oversized frame; operator explodes in order") {
    assert(Id3TextFrames.compute("MP3junk".getBytes, 8) == null)
    assert(Id3TextFrames.compute(tag(2,
      frame("TIT2", textData(0, "x"), v4 = false)), 8) == null)
    val over = tag(3, frame("TIT2", textData(0, "x"), v4 = false))
    over(14) = 0x7f // frame size now runs past the tag
    assert(Id3TextFrames.compute(over, 8) == null)
    val df = Seq((7L, tag(3,
      frame("TIT2", textData(0, "a"), v4 = false),
      frame("TPE1", textData(0, "b"), v4 = false)))).toDF("media_id", "payload")
    val rows = Multimodal.id3Tags(df).orderBy("pos").collect()
    assert(rows.map(r => (r.getLong(1), r.getString(2), r.getString(3))).toSeq
      == Seq((0L, "TIT2", "a"), (1L, "TPE1", "b")))
  }
}
