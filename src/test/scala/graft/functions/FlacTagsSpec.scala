package graft.functions

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** [[FlacTags]] battery: block walk, key normalization, skip rules,
  * untagged-vs-corrupt distinction, refusals. */
class FlacTagsSpec extends AnyFunSuite {

  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

  private def block(tpe: Int, last: Boolean, data: Array[Byte]): Array[Byte] =
    Array(((if (last) 0x80 else 0) | tpe).toByte,
      ((data.length >> 16) & 0xff).toByte, ((data.length >> 8) & 0xff).toByte,
      (data.length & 0xff).toByte) ++ data

  private def vorbis(comments: Seq[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val vendor = "test".getBytes("UTF-8")
    bos.write(le(vendor.length, 4)); bos.write(vendor)
    bos.write(le(comments.length, 4))
    for (c <- comments) {
      val cb = c.getBytes("UTF-8")
      bos.write(le(cb.length, 4)); bos.write(cb)
    }
    bos.toByteArray
  }

  private def flac(blocks: Array[Byte]*): Array[Byte] =
    "fLaC".getBytes ++ blocks.flatten

  private def got(b: Array[Byte]) =
    Option(FlacTags.compute(b, 4096)).map(a =>
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
      })

  test("tags: keys uppercase, values verbatim (incl. '='), no-equals " +
    "comments skipped; STREAMINFO walked past") {
    val f = flac(
      block(0, last = false, new Array[Byte](34)),
      block(4, last = true, vorbis(Seq(
        "TITLE=T one", "artist=Ünï=code", "garbage", "Album=x"))))
    assert(got(f) == Some(Seq(("TITLE", "T one"),
      ("ARTIST", "Ünï=code"), ("ALBUM", "x"))))
  }

  test("untagged FLAC is an EMPTY array (a real file), corrupt is " +
    "NULL: truncated block, lying comment length, bad UTF-8") {
    val plain = flac(block(0, last = true, new Array[Byte](34)))
    assert(got(plain) == Some(Seq()))
    val f = flac(
      block(4, last = true, vorbis(Seq("TITLE=x"))))
    for (cut <- Seq(3, 6, f.length - 2))
      assert(got(f.take(cut)).isEmpty, s"cut $cut")
    // a comment length running past the block
    val lie = f.clone()
    lie(4 + 4 + 4 + 4 + 4) = 0x7f // first comment's LE32 length low byte
    assert(got(lie).isEmpty)
    // invalid UTF-8 inside a comment refuses
    val bad = flac(block(4, last = true, {
      val v = vorbis(Seq("TITLE=xy"))
      v(v.length - 1) = 0xff.toByte; v
    }))
    assert(got(bad).isEmpty)
    assert(got("not flac".getBytes).isEmpty)
  }
}
