package graft.functions

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** [[OggMeta]] battery over hand-built spec-exact Ogg pages (own CRC
  * implementation, independent of the kernel's): Vorbis and Opus
  * identification/comment headers, granule-clock durations, lacing
  * across segments and pages, and the fail-closed refusals. */
class OggMetaSpec extends AnyFunSuite {

  private val table: Array[Int] = {
    val t = new Array[Int](256)
    for (i <- 0 until 256) {
      var r = i << 24
      for (_ <- 0 until 8)
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
      t(i) = r
    }
    t
  }

  private def crcOf(d: Array[Byte]): Int = {
    var c = 0
    for (b <- d) c = (c << 8) ^ table(((c >>> 24) ^ (b & 0xff)) & 0xff)
    c
  }

  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

  private def lace(p: Array[Byte]): Seq[Array[Byte]] = {
    val segs = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var i = 0
    while (p.length - i >= 255) { segs += p.slice(i, i + 255); i += 255 }
    segs += p.drop(i)
    segs.toSeq
  }

  private def page(granule: Long, serial: Int, seq: Int, hdrType: Int,
                   packets: Seq[Array[Byte]]): Array[Byte] = {
    val segs = packets.flatMap(lace)
    val payload = segs.flatten.toArray
    val bos = new ByteArrayOutputStream()
    bos.write("OggS".getBytes); bos.write(0); bos.write(hdrType)
    bos.write(le(granule, 8)); bos.write(le(serial, 4)); bos.write(le(seq, 4))
    bos.write(le(0, 4)) // crc placeholder
    bos.write(segs.length)
    for (s <- segs) bos.write(s.length)
    bos.write(payload)
    val b = bos.toByteArray
    val crc = crcOf(b)
    System.arraycopy(le(crc & 0xffffffffL, 4), 0, b, 22, 4)
    b
  }

  private def vorbisId(ch: Int, rate: Long): Array[Byte] =
    Array[Byte](1) ++ "vorbis".getBytes ++ le(0, 4) ++ Array(ch.toByte) ++
      le(rate, 4) ++ new Array[Byte](12) ++ Array[Byte](0xb8.toByte, 1)

  private def comments(cs: Seq[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(le(5, 4)); bos.write("graft".getBytes)
    bos.write(le(cs.length, 4))
    for (c <- cs) { bos.write(le(c.length, 4)); bos.write(c.getBytes) }
    bos.toByteArray
  }

  private def vorbisStream(tags: Seq[String], granule: Long,
                           ch: Int = 2, rate: Long = 44100): Array[Byte] =
    page(-1, 7, 0, 2, Seq(vorbisId(ch, rate))) ++
      page(-1, 7, 1, 0, Seq(Array[Byte](3) ++ "vorbis".getBytes ++
        comments(tags) ++ Array[Byte](1))) ++
      page(granule, 7, 2, 4, Seq(Array.fill(20)(0x55.toByte)))

  private def got(b: Array[Byte]) =
    Option(OggMeta.compute(b, 1 << 16, 4096)).map { r =>
      val a = r.getArray(4)
      (r.getUTF8String(0).toString, r.getInt(1), r.getLong(2), r.getLong(3),
        (0 until a.numElements()).map { i =>
          val t = a.getStruct(i, 2)
          (t.getUTF8String(0).toString, t.getUTF8String(1).toString)
        })
    }

  test("Vorbis: id-header rate drives the granule clock; comment " +
    "keys uppercase; zero comments = untagged, not a refusal") {
    assert(got(vorbisStream(Seq("Title=Song A", "ARTIST=B"), 88200L)) ==
      Some(("vorbis", 2, 44100L, 2000L,
        Seq(("TITLE", "Song A"), ("ARTIST", "B")))))
    assert(got(vorbisStream(Seq(), 22050L)) ==
      Some(("vorbis", 2, 44100L, 500L, Seq())))
  }

  test("Opus: OpusHead pre-skip subtracts on the 48 kHz granule " +
    "clock regardless of the recorded input rate") {
    val opus = page(-1, 9, 0, 2, Seq("OpusHead".getBytes ++
      Array[Byte](1, 1) ++ le(312, 2) ++ le(24000, 4) ++
      Array[Byte](0, 0, 0))) ++
      page(-1, 9, 1, 0, Seq("OpusTags".getBytes ++
        comments(Seq("encoder=opusenc")))) ++
      page(48312L, 9, 2, 4, Seq(Array.fill(10)(0x66.toByte)))
    assert(got(opus) ==
      Some(("opus", 1, 24000L, 1000L, Seq(("ENCODER", "opusenc")))))
  }

  test("lacing: a comment packet spanning segments AND pages " +
    "assembles; a packet of exactly 255*k bytes ends on the empty " +
    "final segment") {
    val big = "x" * 300
    val cmt = Array[Byte](3) ++ "vorbis".getBytes ++
      comments(Seq(s"TITLE=$big")) ++ Array[Byte](1)
    // split the comment packet across two pages by hand: first page
    // carries one full 255 segment (continued), second the rest
    val seg1 = cmt.take(255)
    val seg2 = cmt.drop(255)
    val multi = page(-1, 7, 0, 2, Seq(vorbisId(2, 44100))) ++
      pageRaw(-1, 7, 1, 0, Seq(seg1), open = true) ++
      pageRaw(-1, 7, 2, 1, Seq(seg2), open = false) ++
      page(44100L, 7, 3, 4, Seq(Array.fill(4)(1.toByte)))
    val r = got(multi)
    assert(r.exists(_._5 == Seq(("TITLE", big))), r)
    // 255-multiple packet: lace() emits the empty final segment
    val id255 = vorbisId(2, 44100) ++
      new Array[Byte](255 - vorbisId(2, 44100).length % 255)
    assert(id255.length % 255 == 0)
    // kernel must treat the empty segment as the packet end
    val p255 = page(-1, 7, 0, 2, Seq(id255)) ++
      page(-1, 7, 1, 0, Seq(Array[Byte](3) ++ "vorbis".getBytes ++
        comments(Seq()) ++ Array[Byte](1))) ++
      page(4410L, 7, 2, 4, Seq(Array.fill(4)(1.toByte)))
    assert(got(p255).exists(_._1 == "vorbis"))
  }

  /** Page whose segment table is given verbatim (for splitting one
    * packet across pages): `open=true` ends with a 255 segment. */
  private def pageRaw(granule: Long, serial: Int, seq: Int, hdrType: Int,
                      segs: Seq[Array[Byte]], open: Boolean): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write("OggS".getBytes); bos.write(0); bos.write(hdrType)
    bos.write(le(granule, 8)); bos.write(le(serial, 4)); bos.write(le(seq, 4))
    bos.write(le(0, 4))
    bos.write(segs.length)
    for (s <- segs) bos.write(s.length)
    for (s <- segs) bos.write(s)
    val b = bos.toByteArray
    val crc = crcOf(b)
    System.arraycopy(le(crc & 0xffffffffL, 4), 0, b, 22, 4)
    b
  }

  test("fail-closed: CRC flip, truncation at every tier, a second " +
    "BOS (chained stream), serial switch, unknown codec, junk") {
    val good = vorbisStream(Seq("A=b"), 44100L)
    val flip = good.clone(); flip(40) = (flip(40) ^ 1).toByte
    assert(got(flip).isEmpty, "crc flip")
    for (cut <- Seq(3, 20, 30, good.length / 2, good.length - 1))
      assert(got(good.take(cut)).isEmpty, s"cut $cut")
    val chained = good ++ vorbisStream(Seq(), 100L)
    assert(got(chained).isEmpty, "second BOS")
    val unknown = page(-1, 7, 0, 2, Seq("NotACodec!".getBytes))
    assert(got(unknown).isEmpty, "unknown codec")
    assert(got("junk".getBytes).isEmpty)
    assert(got(Array.empty[Byte]).isEmpty)
  }

}
