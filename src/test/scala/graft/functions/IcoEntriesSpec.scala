package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** [[IcoEntries]] battery: directory parse with the 256 zero-byte
  * rule and PNG sniffing, cursor type, fail-closed refusals. */
class IcoEntriesSpec extends AnyFunSuite {

  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

  private def ico(tpe: Int, entries: Seq[(Int, Int, Int, Array[Byte])])
      : Array[Byte] = {
    val hdr = le(0, 2) ++ le(tpe, 2) ++ le(entries.length, 2)
    var off = 6 + 16 * entries.length
    val dir = entries.flatMap { case (w, h, bpp, data) =>
      val e = Array(w.toByte, h.toByte, 0.toByte, 0.toByte) ++
        le(1, 2) ++ le(bpp, 2) ++ le(data.length, 4) ++ le(off, 4)
      off += data.length
      e
    }
    hdr ++ dir ++ entries.flatMap(_._4)
  }

  private def got(b: Array[Byte]) =
    Option(IcoEntries.compute(b, 256)).map(a =>
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 5)
        (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
          r.getBoolean(4))
      })

  test("directory census: sizes, the 256 zero-byte rule, PNG " +
    "sniffing; cursor files parse too") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
      0x1a, 0x0a, 1, 2, 3)
    val b = ico(1, Seq((16, 16, 4, Array[Byte](1, 2, 3, 4)),
      (0, 0, 32, png)))
    assert(got(b) == Some(Seq((16, 16, 4, 4L, false),
      (256, 256, 32, 11L, true))))
    assert(got(ico(2, Seq((32, 32, 1, Array[Byte](9))))) ==
      Some(Seq((32, 32, 1, 1L, false))))
  }

  test("fail-closed: reserved word, bad type, zero count, truncated " +
    "table, payload span outside the file, junk") {
    val good = ico(1, Seq((16, 16, 4, Array[Byte](1, 2, 3, 4))))
    val badRes = good.clone(); badRes(0) = 1
    assert(got(badRes).isEmpty)
    val badType = good.clone(); badType(2) = 3
    assert(got(badType).isEmpty)
    val zeroCount = good.clone(); zeroCount(4) = 0
    assert(got(zeroCount).isEmpty)
    assert(got(good.take(12)).isEmpty)
    assert(got(good.dropRight(2)).isEmpty, "payload span cut")
    assert(got("junkjunk".getBytes).isEmpty)
  }
}
