package graft.functions

import java.io.ByteArrayOutputStream

import graft.SparkSpec

/** Avro OCF block census: hand-built containers with known framing,
  * a REAL avro-library file (DataFileWriter, deflate, forced multi-
  * block) whose counts must match by construction, and the
  * fail-closed surface (sync mismatch, truncation, trailing junk). */
class AvroBlocksSpec extends SparkSpec {

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

  private def ocf(meta: Seq[(String, String)],
                  blocks: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write("Obj".getBytes); bos.write(1)
    if (meta.nonEmpty) {
      bos.write(zig(meta.length))
      meta.foreach(e => { bos.write(str(e._1)); bos.write(str(e._2)) })
    }
    bos.write(zig(0))
    val sync = Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte)
    bos.write(sync)
    blocks.foreach { case (cnt, data) =>
      bos.write(zig(cnt)); bos.write(zig(data.length))
      bos.write(data); bos.write(sync)
    }
    bos.toByteArray
  }

  private def census(b: Array[Byte]): (String, Long, Long, Long) = {
    val r = AvroBlocks.compute(b, 1 << 20)
    assert(r != null)
    (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("avro_blocks: exact record/block/byte counts off the framing; " +
    "codec defaults to null when the key is absent; empty file OK") {
    val f = ocf(Seq("avro.codec" -> "deflate", "avro.schema" -> "\"int\""),
      Seq((3L, Array[Byte](1, 2, 3, 4)), (2L, Array[Byte](9))))
    assert(census(f) == (("deflate", 2L, 5L, 5L)))
    val noCodec = ocf(Seq("avro.schema" -> "\"int\""),
      Seq((7L, Array[Byte](0, 0))))
    assert(census(noCodec) == (("null", 1L, 7L, 2L)))
    assert(census(ocf(Seq("avro.schema" -> "\"int\""), Seq())) ==
      (("null", 0L, 0L, 0L)))
  }

  test("avro_blocks matches the real avro library's own output: " +
    "DataFileWriter + deflate + forced multi-block") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema: Schema = SchemaBuilder.record("r").fields()
      .requiredLong("id").requiredString("s").endRecord()
    val bos = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.setSyncInterval(64) // tiny: forces many blocks
    w.create(schema, bos)
    (1 to 500).foreach { i =>
      val rec = new GenericData.Record(schema)
      rec.put("id", i.toLong); rec.put("s", "row " + i)
      w.append(rec)
    }
    w.close()
    val (codec, nBlocks, nRecords, dataBytes) = census(bos.toByteArray)
    assert(codec == "deflate" && nRecords == 500L && nBlocks > 5 &&
      dataBytes > 0)
    // and the schema kernel agrees on the same payload
    assert(AvroSchemaJson.compute(bos.toByteArray, 1 << 20)
      .toString.contains("\"name\":\"id\""))
  }

  test("avro_blocks fails closed: sync mismatch, truncation at every " +
    "cut, trailing junk, block-count bomb cap") {
    val f = ocf(Seq("avro.schema" -> "\"int\""),
      Seq((3L, Array[Byte](1, 2, 3, 4)), (2L, Array[Byte](9))))
    val badSync = f.clone()
    badSync(f.length - 1) = (badSync(f.length - 1) ^ 1).toByte
    assert(AvroBlocks.compute(badSync, 1 << 20) == null)
    for (cut <- Seq(3, 8, f.length - 1, f.length - 17))
      assert(AvroBlocks.compute(f.take(cut), 1 << 20) == null,
        s"truncated at $cut")
    assert(AvroBlocks.compute(f ++ Array[Byte](1), 1 << 20) == null)
    assert(AvroBlocks.compute(f, 1) == null) // two blocks > cap 1
  }
}
