package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** RAR header-census battery: fixtures come from the committed
  * python writer (tools/make_rar_fixture.py — a second, independent
  * serialization of the public format docs), expectations computed
  * here from the documented fields. Decompression is a documented
  * refusal; the census never touches packed bytes. */
class RarEntriesSpec extends AnyFunSuite {

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def crc(s: String): Long = {
    val c = new java.util.zip.CRC32()
    c.update(s.getBytes("ISO-8859-1"))
    c.getValue
  }

  private val rarV4 = "526172211a0700cf907300000d0000000000000091177400802f00110000001100000003ab8e9bf200003c5a1d300f00a4010000646f63732f726561646d652e74787473746f726564206279746573206865726583687414802800050000004000000003f4990b4700003c5a1d330800a4010000646174612e62696e0102030405c43d7b00400700"
  private val rarV5 = "526172211a070100dcde5e35030100046878b64221020214068020a40300f153655604f7e1c003010d6269672f6d6f64656c2e62696e6f7061717565207061636b656420627974657321f7c9dde2140202030800a40300010a73747265616d2e64617478797a19b23a3503050000"
  private val rarV4Enc = "526172211a0700ce997380000d0000000000000091177400802f00110000001100000003ab8e9bf200003c5a1d300f00a4010000646f63732f726561646d652e74787473746f726564206279746573206865726583687414802800050000004000000003f4990b4700003c5a1d330800a4010000646174612e62696e0102030405c43d7b00400700"
  private val rarV5Enc = "526172211a070100c6f352d1140400000100000000000000000000000000000000"

  test("RAR4 census: names, sizes, method, VERIFIED header CRCs, " +
    "solid/encrypted entry flags, host OS") {
    val r = RarEntries.compute(hx(rarV4), 64)
    assert(r != null, "refused")
    assert(r.getUTF8String(0).toString == "rar4")
    assert(!r.getBoolean(1)) // archive not solid
    val es = r.getArray(2)
    assert(es.numElements == 2)
    val e0 = es.getStruct(0, 10)
    assert(e0.getUTF8String(0).toString == "docs/readme.txt")
    assert(e0.getLong(1) == 17L && e0.getLong(2) == 17L) // unp, packed
    assert(e0.getInt(3) == 0) // stored
    assert(e0.getLong(4) == crc("stored bytes here"))
    assert(!e0.getBoolean(5) && !e0.getBoolean(6) && !e0.getBoolean(7))
    assert(e0.getInt(8) == 3) // unix
    assert(e0.isNullAt(9)) // RAR4: no honest epoch
    val e1 = es.getStruct(1, 10)
    assert(e1.getUTF8String(0).toString == "data.bin")
    assert(e1.getLong(1) == 64L && e1.getLong(2) == 5L)
    assert(e1.getInt(3) == 3) // normal compression
    assert(e1.getBoolean(6) && e1.getBoolean(7)) // solid, encrypted
  }

  test("RAR5 census: vint fields, solid archive flag, mtime+crc " +
    "presence flags, size-unknown entry, VERIFIED header CRC32s") {
    val r = RarEntries.compute(hx(rarV5), 64)
    assert(r != null, "refused")
    assert(r.getUTF8String(0).toString == "rar5")
    assert(r.getBoolean(1)) // solid archive
    val es = r.getArray(2)
    assert(es.numElements == 2)
    val e0 = es.getStruct(0, 10)
    assert(e0.getUTF8String(0).toString == "big/model.bin")
    assert(e0.getLong(1) == 4096L)
    assert(e0.getLong(2) == "opaque packed bytes!".length.toLong)
    assert(e0.getInt(3) == 3 && e0.getBoolean(6)) // method 3, solid
    assert(e0.getLong(4) == crc("opaque packed bytes!"))
    assert(e0.getLong(9) == 1700000000L)
    val e1 = es.getStruct(1, 10)
    assert(e1.getUTF8String(0).toString == "stream.dat")
    assert(e1.isNullAt(1)) // size unknown
    assert(e1.getLong(2) == 3L && e1.getInt(3) == 0)
    assert(e1.isNullAt(4) && e1.isNullAt(9))
  }

  test("refusals: encrypted headers (both formats), corrupt header " +
    "CRC, truncation, junk, bombs") {
    assert(RarEntries.compute(hx(rarV4Enc), 64) == null)
    assert(RarEntries.compute(hx(rarV5Enc), 64) == null)
    // flip one byte inside the RAR4 main header: CRC must catch it
    val bad4 = hx(rarV4)
    bad4(10) = (bad4(10) ^ 0x01).toByte
    assert(RarEntries.compute(bad4, 64) == null)
    // flip a RAR5 name byte: CRC32 must catch it
    val bad5 = hx(rarV5)
    val nameAt = rarV5.indexOf("6269672f") / 2
    bad5(nameAt) = 'X'.toByte
    assert(RarEntries.compute(bad5, 64) == null)
    // truncations at every prefix never throw, always refuse
    val whole = hx(rarV5)
    for (n <- 0 until whole.length)
      assert(RarEntries.compute(java.util.Arrays.copyOf(whole, n), 64) == null,
        s"prefix $n")
    val whole4 = hx(rarV4)
    for (n <- 8 until whole4.length)
      assert(RarEntries.compute(java.util.Arrays.copyOf(whole4, n), 64) == null,
        s"r4 prefix $n")
    assert(RarEntries.compute("not a rar".getBytes, 64) == null)
    // entry bomb cap: maxEntries 1 refuses the 2-entry archive
    assert(RarEntries.compute(hx(rarV4), 1) == null)
  }
}
