package graft.functions

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** [[WebmMeta]] battery over hand-built spec-exact EBML: header
  * DocType, Info timescale/duration (4- and 8-byte floats, the
  * 1 ms default scale), track tables, unknown-size segments, and the
  * fail-closed refusals. */
class WebmMetaSpec extends AnyFunSuite {

  /** EBML size VINT of minimal-ish width (2 bytes, plenty here). */
  private def sz(v: Int): Array[Byte] =
    Array((0x40 | (v >> 8)).toByte, (v & 0xff).toByte)

  private def elem(id: Long, body: Array[Byte]): Array[Byte] = {
    val idBytes = {
      var n = 1
      while ((id >> (8 * n)) != 0) n += 1
      Array.tabulate(n)(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte)
    }
    idBytes ++ sz(body.length) ++ body
  }

  private def uintBody(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)

  private def f4(v: Float): Array[Byte] =
    uintBody(java.lang.Float.floatToIntBits(v) & 0xffffffffL, 4)

  private def f8(v: Double): Array[Byte] =
    uintBody(java.lang.Double.doubleToLongBits(v), 8)

  private def header(doctype: String): Array[Byte] =
    elem(0x1A45DFA3L, elem(0x4286L, uintBody(1, 1)) ++
      elem(0x4282L, doctype.getBytes("UTF-8")))

  private def track(num: Long, tpe: Long, codec: String): Array[Byte] =
    elem(0xAEL, elem(0xD7L, uintBody(num, 1)) ++
      elem(0x83L, uintBody(tpe, 1)) ++
      elem(0x86L, codec.getBytes("UTF-8")))

  private def segment(body: Array[Byte],
                      unknownSize: Boolean = false): Array[Byte] = {
    val id = Array(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte)
    if (unknownSize) id ++ Array(0xFF.toByte) ++ body
    else id ++ sz(body.length) ++ body
  }

  private def got(b: Array[Byte]) =
    Option(WebmMeta.compute(b, 1 << 16)).map { r =>
      val a = r.getArray(3)
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2),
        (0 until a.numElements()).map { i =>
          val t = a.getStruct(i, 3)
          (t.getLong(0), t.getUTF8String(1).toString,
            t.getUTF8String(2).toString)
        })
    }

  test("webm: DocType, Info scale + float duration, track table in " +
    "stored order; clusters skipped by size") {
    val info = elem(0x1549A966L,
      elem(0x2AD7B1L, uintBody(1000000L, 3)) ++
        elem(0x4489L, f8(5000.0)))
    val tracks = elem(0x1654AE6BL,
      track(1, 1, "V_VP8") ++ track(2, 2, "A_OPUS"))
    val cluster = elem(0x1F43B675L, Array.fill(40)(0x77.toByte))
    val b = header("webm") ++ segment(info ++ tracks ++ cluster)
    assert(got(b) == Some(("webm", 1000000L, 5000L,
      Seq((1L, "video", "V_VP8"), (2L, "audio", "A_OPUS")))))
  }

  test("matroska: default 1 ms timescale when Info has none, 4-byte " +
    "float duration, subtitle/other track labels, unknown-size " +
    "SEGMENT parses to EOF") {
    val info = elem(0x1549A966L, elem(0x4489L, f4(1500f)))
    val tracks = elem(0x1654AE6BL,
      track(3, 17, "S_TEXT/UTF8") ++ track(4, 33, "X_UNKNOWN"))
    val b = header("matroska") ++ segment(info ++ tracks,
      unknownSize = true)
    assert(got(b) == Some(("matroska", 1000000L, 1500L,
      Seq((3L, "subtitle", "S_TEXT/UTF8"), (4L, "other", "X_UNKNOWN")))))
    // no duration at all: a live-capture shape, duration 0
    val live = header("webm") ++ segment(elem(0x1549A966L,
      elem(0x2AD7B1L, uintBody(1000000L, 3))))
    assert(got(live) == Some(("webm", 1000000L, 0L, Seq())))
  }

  test("fail-closed: magic, truncation at every tier, unknown-size " +
    "cluster, trailing junk, element bomb") {
    val info = elem(0x1549A966L, elem(0x4489L, f8(100.0)))
    val good = header("webm") ++ segment(info)
    for (cut <- Seq(2, 5, 12, good.length / 2, good.length - 1))
      assert(got(good.take(cut)).isEmpty, s"cut $cut")
    assert(got("junk".getBytes).isEmpty)
    val flip = good.clone(); flip(0) = 0x1B
    assert(got(flip).isEmpty)
    // an unknown-size CLUSTER inside a sized segment refuses
    val uCluster = Array(0x1F.toByte, 0x43.toByte, 0xB6.toByte,
      0x75.toByte, 0xFF.toByte) ++ Array.fill(10)(0.toByte)
    assert(got(header("webm") ++ segment(info ++ uCluster)).isEmpty)
    // trailing junk after a sized segment refuses
    assert(got(good ++ Array[Byte](1, 2, 3)).isEmpty)
    // element bomb: the walk cap trips
    val many = Array.fill(200)(elem(0xECL, Array.empty[Byte]))
      .flatten
    assert(WebmMeta.compute(header("webm") ++ segment(many), 64) == null)
  }
}
