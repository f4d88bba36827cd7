package graft.functions

import java.io.ByteArrayOutputStream

import graft.SparkSpec

class AvroSchemaJsonSpec extends SparkSpec {

  private def zig(v: Long): Array[Byte] = {
    var zz = (v << 1) ^ (v >> 63)
    val bos = new ByteArrayOutputStream()
    var more = true
    while (more) {
      val b = (zz & 0x7f).toInt
      zz >>>= 7
      more = zz != 0
      bos.write(if (more) b | 0x80 else b)
    }
    bos.toByteArray
  }

  private def str(s: String): Array[Byte] =
    zig(s.length) ++ s.getBytes("UTF-8")

  private def ocf(entries: Seq[(String, String)],
                  negBlock: Boolean = false): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write("Obj".getBytes); bos.write(1)
    val body = entries.flatMap(e => str(e._1) ++ str(e._2)).toArray
    if (negBlock) { // negative count + advisory byte size, per spec
      bos.write(zig(-entries.length)); bos.write(zig(body.length))
    } else bos.write(zig(entries.length))
    bos.write(body)
    bos.write(zig(0))
    bos.write(new Array[Byte](16)) // sync
    bos.toByteArray
  }

  test("avro_schema: plain and negative-count blocks, long schemas, " +
    "missing key null, fail-closed on junk") {
    val longSchema = "{\"type\":\"record\",\"fields\":[" +
      ("{\"name\":\"xxxxxxxx\"}," * 30) + "{\"name\":\"y\"}]}"
    assert(longSchema.length > 127, "exercise the two-byte varint")
    val a = ocf(Seq("avro.codec" -> "null", "avro.schema" -> longSchema))
    assert(AvroSchemaJson.compute(a, 1 << 20).toString == longSchema)
    val b = ocf(Seq("avro.schema" -> "{\"type\":\"string\"}"),
      negBlock = true)
    assert(AvroSchemaJson.compute(b, 1 << 20).toString
      == "{\"type\":\"string\"}")
    // header without the schema key: null (valid file, no schema)
    assert(AvroSchemaJson.compute(
      ocf(Seq("avro.codec" -> "null")), 1 << 20) == null)
    // junk and truncation fail closed
    assert(AvroSchemaJson.compute("PAR1junk".getBytes, 1 << 20) == null)
    assert(AvroSchemaJson.compute(a.take(12), 1 << 20) == null)
    // a declared length past the cap is rejected
    assert(AvroSchemaJson.compute(a, 16) == null)
  }
}
