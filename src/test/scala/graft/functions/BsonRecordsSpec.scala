package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BSON dump decoding over spec-exact hand-built documents: every
  * supported element type, nested documents/arrays, back-to-back
  * dump concatenation, the jsonInferSchema + from_json ingestion
  * composition, and the fail-closed surface. */
class BsonRecordsSpec extends SparkSpec {
  import spark.implicits._

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le64(v: Long): Array[Byte] =
    (0 until 8).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  private def cstr(s: String): Array[Byte] = s.getBytes("UTF-8") :+ 0.toByte

  private def elem(t: Int, name: String, value: Array[Byte]): Array[Byte] =
    Array(t.toByte) ++ cstr(name) ++ value

  private def bstr(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8")
    le32(b.length + 1) ++ b :+ 0.toByte
  }

  private def doc(elems: Array[Byte]*): Array[Byte] = {
    val body = elems.flatten.toArray
    le32(4 + body.length + 1) ++ body :+ 0.toByte
  }

  test("bson_records: every element type — double, string, nested " +
    "doc, array, binary, ObjectId, bool, datetime, null, regex, " +
    "int32/64, timestamp, decimal128, min/max keys") {
    val oid = (1 to 12).map(_.toByte).toArray
    val d = doc(
      elem(0x10, "i", le32(42)),
      elem(0x12, "l", le64(1234567890123L)),
      elem(0x01, "d", le64(java.lang.Double.doubleToLongBits(2.5))),
      elem(0x02, "s", bstr("héllo")),
      elem(0x08, "b", Array(1.toByte)),
      elem(0x0A, "n", Array.emptyByteArray),
      elem(0x07, "id", oid),
      elem(0x09, "ts", le64(1700000000000L)),
      elem(0x05, "bin", le32(3) ++ Array(0.toByte, 0xDE.toByte,
        0xAD.toByte, 0x01.toByte)),
      elem(0x0B, "re", cstr("a+b") ++ cstr("i")),
      elem(0x13, "dec", (1 to 16).map(_ => 0xAB.toByte).toArray),
      elem(0x7F, "mx", Array.emptyByteArray),
      elem(0x03, "sub", doc(elem(0x10, "x", le32(7)))),
      elem(0x04, "arr", doc(elem(0x10, "0", le32(1)),
        elem(0x02, "1", bstr("two")))))
    val r = BsonRecords.compute(d, 1 << 20, 1 << 26)
    assert(r != null && r.numElements() == 1)
    assert(r.getUTF8String(0).toString ==
      """{"i":42,"l":1234567890123,"d":2.5,"s":"héllo","b":true,""" +
      """"n":null,"id":"0102030405060708090a0b0c",""" +
      """"ts":1700000000000,"bin":"dead01","re":"/a+b/i",""" +
      """"dec":"abababababababababababababababab","mx":null,""" +
      """"sub":{"x":7},"arr":[1,"two"]}""")
  }

  test("bson_records: a mongodump-shaped file is back-to-back docs; " +
    "ingestion composes with jsonInferSchema-style from_json") {
    val dump = doc(elem(0x10, "a", le32(1)), elem(0x02, "t", bstr("x"))) ++
      doc(elem(0x10, "a", le32(2)), elem(0x02, "t", bstr("y")))
    val r = BsonRecords.compute(dump, 1 << 20, 1 << 26)
    assert(r != null && r.numElements() == 2)
    val rows = Seq((1L, dump)).toDF("doc_id", "payload")
      .select(col("doc_id"),
        explode(BsonRecords(col("payload"))).as("j"))
      .select(col("doc_id"), from_json(col("j"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "a INT, t STRING")).as("r"))
      .select("doc_id", "r.a", "r.t").orderBy("a").collect()
    assert(rows.map(x => (x.getInt(1), x.getString(2))).toSeq ==
      Seq((1, "x"), (2, "y")))
  }

  test("CorpusIO.readBson/readMsgpack/readCbor: shard-level ingestion " +
    "with the explicit-ddl + quarantine contract; corrupt shards " +
    "vanish whole") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nosql")
    val bsonShard = doc(elem(0x10, "a", le32(1)), elem(0x02, "t", bstr("x")))
    java.nio.file.Files.write(dir.resolve("a.bson"), bsonShard)
    java.nio.file.Files.write(dir.resolve("b.bson"),
      bsonShard.dropRight(1)) // corrupt: vanishes whole
    val got = graft.sources.CorpusIO.readBson(spark,
      dir.toString + "/*.bson", "a INT, t STRING").collect()
    assert(got.length == 1 && got(0).getInt(0) == 1 &&
      got(0).getString(1) == "x")
    val mp = java.nio.file.Files.createTempDirectory("graft-mp")
    java.nio.file.Files.write(mp.resolve("a.msgpack"),
      Array[Byte]((0x80 | 1).toByte, (0xa0 | 1).toByte, 'a'.toByte, 5))
    val gm = graft.sources.CorpusIO.readMsgpack(spark,
      mp.toString, "a INT").collect()
    assert(gm.length == 1 && gm(0).getInt(0) == 5)
    val cb = java.nio.file.Files.createTempDirectory("graft-cb")
    // a1 61 61 02 = {"a": 2}
    java.nio.file.Files.write(cb.resolve("a.cbor"),
      Array[Byte](0xa1.toByte, 0x61, 'a'.toByte, 0x02))
    val gc = graft.sources.CorpusIO.readCbor(spark,
      cb.toString, "a INT").collect()
    assert(gc.length == 1 && gc(0).getInt(0) == 2)
  }

  test("bson_records fails closed: bad terminator, length overruns, " +
    "deprecated types refused, truncation at every cut, caps") {
    val ok = doc(elem(0x10, "a", le32(1)))
    val noTerm = ok.clone(); noTerm(ok.length - 1) = 1
    assert(BsonRecords.compute(noTerm, 1 << 20, 1 << 26) == null)
    val badLen = ok.clone(); badLen(0) = (badLen(0) + 4).toByte
    assert(BsonRecords.compute(badLen, 1 << 20, 1 << 26) == null)
    // deprecated 'undefined' (0x06) refused
    val dep = doc(elem(0x06, "u", Array.emptyByteArray))
    assert(BsonRecords.compute(dep, 1 << 20, 1 << 26) == null)
    for (cut <- 1 until ok.length)
      assert(BsonRecords.compute(ok.take(cut), 1 << 20, 1 << 26) == null,
        s"cut $cut")
    assert(BsonRecords.compute(Array.emptyByteArray, 1 << 20, 1 << 26) == null)
    assert(BsonRecords.compute("junk not bson".getBytes, 1 << 20,
      1 << 26) == null)
    val two = ok ++ ok
    assert(BsonRecords.compute(two, 1, 1 << 26) == null) // record cap
    assert(BsonRecords.compute(ok, 1 << 20, 4) == null) // output cap
  }
}
