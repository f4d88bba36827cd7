package graft.functions

import java.io.ByteArrayOutputStream

import org.tukaani.xz.{LZMA2Options, LZMAOutputStream}
import org.scalatest.funsuite.AnyFunSuite

/** [[LzmaAlonePayload]] battery: REAL xz-java alone-encoder output in
  * both size modes, a pinned liblzma (python) stream, refusals. */
class LzmaAloneSpec extends AnyFunSuite {

  private def xzJava(data: Array[Byte], knownSize: Boolean): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new LZMAOutputStream(bos, new LZMA2Options(6),
      if (knownSize) data.length.toLong else -1L)
    out.write(data)
    out.finish()
    bos.toByteArray
  }

  test("xz-java alone encoder round-trips in BOTH size modes") {
    val text = ("lzma alone round trip " * 40).getBytes
    for (known <- Seq(true, false)) {
      val z = xzJava(text, known)
      val got = LzmaAlonePayload.compute(z, 1 << 20)
      assert(got != null, s"known=$known refused")
      assert(got.toSeq == text.toSeq, s"known=$known")
    }
    // empty payload, marker-only stream
    val ez = xzJava(Array.emptyByteArray, false)
    assert(LzmaAlonePayload.compute(ez, 16).length == 0)
  }

  test("pinned liblzma stream (python lzma.FORMAT_ALONE): unknown " +
    "size + end marker") {
    // lzma.compress(b'hello hello hello', format=lzma.FORMAT_ALONE)
    val hex = "5d00008000ffffffffffffffff" +
      "00341949ee8de94f7f35c5a3ffff78a40000"
    val b = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val got = LzmaAlonePayload.compute(b, 1 << 20)
    assert(got != null, "refused")
    assert(new String(got) == "hello hello hello")
  }

  test("fail-closed: short payload, bad props, bomb cap, corrupt " +
    "stream, truncation before the marker") {
    val text = "abcabcabcabc".getBytes
    val z = xzJava(text, false)
    assert(LzmaAlonePayload.compute(null, 16) == null)
    assert(LzmaAlonePayload.compute(z.take(12), 1 << 20) == null)
    val badProps = z.clone(); badProps(0) = 0xe1.toByte
    assert(LzmaAlonePayload.compute(badProps, 1 << 20) == null)
    assert(LzmaAlonePayload.compute(z, 4) == null) // cap < output
    assert(LzmaAlonePayload.compute(z.dropRight(3), 1 << 20) == null)
    val zk = xzJava(text, true)
    // size lies: claim more than the stream encodes
    val lie = zk.clone(); lie(5) = 0x7f.toByte
    assert(LzmaAlonePayload.compute(lie, 1 << 20) == null)
  }
}
