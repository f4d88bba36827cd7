package graft.functions

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** [[WavInfoTags]] battery: LIST/INFO walk with RIFF odd-size
  * padding, NUL stripping, latin1 fallback, untagged-vs-corrupt. */
class WavInfoTagsSpec extends AnyFunSuite {

  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
    tag.getBytes("US-ASCII") ++ le(data.length, 4) ++ data ++ pad
  }

  private def wav(body: Array[Byte]): Array[Byte] =
    "RIFF".getBytes ++ le(4 + body.length, 4) ++ "WAVE".getBytes ++ body

  private def infoList(tags: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write("INFO".getBytes)
    for ((k, v) <- tags) bos.write(chunk(k, v))
    chunk("LIST", bos.toByteArray)
  }

  private def got(b: Array[Byte]) =
    Option(WavInfoTags.compute(b, 4096)).map(a =>
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
      })

  test("INFO tags: fourcc keys, NUL-stripped values, odd-size " +
    "padding walked, latin1 fallback for pre-Unicode writers") {
    val fmt = chunk("fmt ", new Array[Byte](16))
    val list = infoList(Seq(
      "INAM" -> "Title X\u0000".getBytes("UTF-8"), // 8 bytes, even
      "IART" -> "Someone\u0000".getBytes("UTF-8"),
      "ICMT" -> "café\u0000".getBytes("ISO-8859-1"))) // latin1 é
    val data = chunk("data", Array[Byte](1, 2, 3, 4))
    assert(got(wav(fmt ++ list ++ data)) == Some(Seq(
      ("INAM", "Title X"), ("IART", "Someone"), ("ICMT", "café"))))
    // untagged: a real WAV, empty tag set
    assert(got(wav(fmt ++ data)) == Some(Seq()))
  }

  test("fail-closed: magic, truncated chunk, truncated sub-chunk; " +
    "a non-INFO LIST is skipped") {
    val fmt = chunk("fmt ", new Array[Byte](16))
    val adtl = chunk("LIST", "adtl".getBytes ++
      chunk("labl", Array[Byte](1, 2, 3, 4)))
    val list = infoList(Seq("INAM" -> "T\u0000".getBytes))
    val good = wav(fmt ++ adtl ++ list)
    assert(got(good) == Some(Seq(("INAM", "T"))))
    val bad = good.clone(); bad(0) = 'X'
    assert(got(bad).isEmpty)
    for (cut <- Seq(10, 20, good.length - 3))
      assert(got(good.take(cut)).isEmpty, s"cut $cut")
    assert(got("RIFFxxxxWAVE".getBytes ++ Array[Byte](1, 2, 3)).isEmpty)
  }
}
