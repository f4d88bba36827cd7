package graft.functions

import graft.SparkSpec

/** CBOR decoding over RFC-exact hand-built items, incl. the RFC 8949
  * appendix-A example values: every major type, indefinite strings/
  * containers, tags unwrapped, half floats, exact −2⁶⁴ integers,
  * sequence tiling and the fail-closed battery. */
class CborRecordsSpec extends SparkSpec {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def one(h: String): String = {
    val r = CborRecords.compute(hex(h), 1 << 20, 1 << 26)
    assert(r != null && r.numElements() == 1, s"decoding $h")
    r.getUTF8String(0).toString
  }

  test("cbor: RFC 8949 appendix-A values decode exactly") {
    assert(one("00") == "0")
    assert(one("17") == "23")
    assert(one("1818") == "24")
    assert(one("1a000f4240") == "1000000")
    assert(one("1bffffffffffffffff") == "18446744073709551615")
    assert(one("3bffffffffffffffff") == "-18446744073709551616")
    assert(one("20") == "-1")
    assert(one("3863") == "-100")
    assert(one("f90000") == "0")
    assert(one("f93c00") == "1")
    assert(one("f9c400") == "-4")
    assert(one("fb3ff199999999999a") == "1.1")
    assert(one("f97e00") == "\"NaN\"")
    assert(one("f4") == "false")
    assert(one("f5") == "true")
    assert(one("f6") == "null")
    assert(one("f7") == "null") // undefined → null
    assert(one("6161") == "\"a\"")
    assert(one("62c3bc") == "\"ü\"")
    assert(one("4401020304") == "\"01020304\"") // bytes → hex
    assert(one("83010203") == "[1,2,3]")
    assert(one("a201020304") == "{\"1\":2,\"3\":4}") // int keys quoted
    assert(one("a26161016162820203") == "{\"a\":1,\"b\":[2,3]}")
    // tags unwrap: epoch date tag 1 around an int
    assert(one("c11a514b67b0") == "1363896240")
    // indefinite text, bytes, array, map
    assert(one("7f657374726561646d696e67ff") == "\"streaming\"")
    assert(one("5f42010243030405ff") == "\"0102030405\"")
    assert(one("9f018202039f0405ffff") == "[1,[2,3],[4,5]]")
    assert(one("bf61610161629f0203ffff") == "{\"a\":1,\"b\":[2,3]}")
  }

  test("cbor: a sequence is back-to-back items") {
    val r = CborRecords.compute(hex("0102a16161f5"), 1 << 20, 1 << 26)
    assert(r != null && r.numElements() == 3)
    assert((0 until 3).map(i => r.getUTF8String(i).toString) ==
      Seq("1", "2", "{\"a\":true}"))
  }

  test("cbor fails closed: reserved ai, stray break, truncation at " +
    "every cut, bad two-byte simple, caps, junk") {
    assert(CborRecords.compute(hex("1c"), 1 << 20, 1 << 26) == null)
    assert(CborRecords.compute(hex("ff"), 1 << 20, 1 << 26) == null)
    assert(CborRecords.compute(hex("f810"), 1 << 20, 1 << 26) == null)
    val doc = hex("a26161016162820203")
    for (cut <- 1 until doc.length)
      assert(CborRecords.compute(doc.take(cut), 1 << 20, 1 << 26) == null,
        s"cut $cut")
    assert(CborRecords.compute(Array.emptyByteArray, 1 << 20,
      1 << 26) == null)
    assert(CborRecords.compute(doc ++ doc, 1, 1 << 26) == null)
    assert(CborRecords.compute(doc, 1 << 20, 4) == null)
  }
}
