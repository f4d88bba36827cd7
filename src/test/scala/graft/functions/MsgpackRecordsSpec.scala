package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** MessagePack decoding over spec-exact hand-built streams: every
  * format family, non-string map keys, unsigned uint64, dump
  * concatenation + ingestion composition, fail-closed battery. */
class MsgpackRecordsSpec extends SparkSpec {
  import spark.implicits._

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def be(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray

  private def fixstr(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8")
    require(b.length < 32)
    (0xa0 | b.length).toByte +: b
  }

  private def decode(b: Array[Byte]): Seq[String] = {
    val r = MsgpackRecords.compute(b, 1 << 20, 1 << 26)
    if (r == null) null
    else (0 until r.numElements()).map(i => r.getUTF8String(i).toString)
  }

  test("msgpack: every family — fixint/ints/uints incl. unsigned " +
    "uint64, floats, nil/bool, str widths, bin, ext, arrays, maps " +
    "with non-string keys") {
    val doc = Array[Byte]((0x80 | 10).toByte) ++ // fixmap of 10
      fixstr("i") ++ bytes(42) ++
      fixstr("neg") ++ bytes(0xe0 | 0x1c) ++ // -4? fixint 0xfc = -4
      fixstr("u64") ++ (0xcf.toByte +: be(-1L, 8)) ++ // 2^64-1
      fixstr("i16") ++ (0xd1.toByte +: be(-5L & 0xffff, 2)) ++
      fixstr("f") ++ (0xcb.toByte +: be(
        java.lang.Double.doubleToLongBits(2.5), 8)) ++
      fixstr("s8") ++ (Array(0xd9.toByte, 5.toByte) ++
        "héllo".getBytes("UTF-8").take(5)) ++
      fixstr("nil") ++ bytes(0xc0) ++
      fixstr("b") ++ bytes(0xc3) ++
      fixstr("bin") ++ (Array(0xc4.toByte, 2.toByte) ++ bytes(0xDE, 0xAD)) ++
      fixstr("arr") ++ (Array((0x90 | 3).toByte) ++ bytes(1) ++
        bytes(0xc2) ++ fixstr("x"))
    val got = decode(doc)
    assert(got != null && got.size == 1, got)
    assert(got.head ==
      """{"i":42,"neg":-4,"u64":18446744073709551615,"i16":-5,""" +
      """"f":2.5,"s8":"héll","nil":null,"b":true,"bin":"dead",""" +
      """"arr":[1,false,"x"]}""")
    // non-string keys render as their JSON text in quotes
    val nk = Array[Byte]((0x80 | 1).toByte) ++ bytes(7) ++ fixstr("v")
    assert(decode(nk).head == """{"7":"v"}""")
    // fixext renders as hex, type byte ignored
    val fe = Array[Byte]((0x80 | 1).toByte) ++ fixstr("e") ++
      (Array(0xd5.toByte, 1.toByte) ++ bytes(0xBE, 0xEF))
    assert(decode(fe).head == """{"e":"beef"}""")
  }

  test("msgpack: a dump is back-to-back values; ingestion composes " +
    "with from_json") {
    val d1 = Array[Byte]((0x80 | 1).toByte) ++ fixstr("a") ++ bytes(1)
    val d2 = Array[Byte]((0x80 | 1).toByte) ++ fixstr("a") ++ bytes(2)
    val dump = d1 ++ d2
    assert(decode(dump) == Seq("""{"a":1}""", """{"a":2}"""))
    val rows = Seq((1L, dump)).toDF("doc_id", "payload")
      .select(explode(MsgpackRecords(col("payload"))).as("j"))
      .select(from_json(col("j"),
        org.apache.spark.sql.types.StructType.fromDDL("a INT")).as("r"))
      .select("r.a").orderBy("a").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
  }

  test("msgpack fails closed: reserved 0xc1, truncation at every " +
    "cut, length overruns, caps, junk") {
    assert(decode(bytes(0xc1)) == null)
    val doc = Array[Byte]((0x80 | 2).toByte) ++ fixstr("a") ++ bytes(1) ++
      fixstr("long") ++ (Array(0xd9.toByte, 200.toByte) ++
        Array.fill(200)('x'.toByte))
    assert(decode(doc) != null)
    for (cut <- 1 until doc.length)
      assert(decode(doc.take(cut)) == null, s"cut $cut")
    assert(decode(Array.emptyByteArray) == null)
    assert(MsgpackRecords.compute(doc, 1 << 20, 8) == null)
    val two = doc ++ doc
    assert(MsgpackRecords.compute(two, 1, 1 << 26) == null)
  }
}
