package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Avro datum decoding against the REAL avro library's output: a
  * schema exercising every branch of the binary encoding (unions,
  * enums, fixed, bytes, arrays, maps, nested + RECURSIVE records),
  * identical JSON under all six spec codecs, the from_json ingestion
  * composition, and the fail-closed surface. */
class AvroRecordsJsonSpec extends SparkSpec {

  private def rich(): (Schema, Array[Byte]) = {
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"node","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"s","type":"string"},
        |  {"name":"opt","type":["null","string"]},
        |  {"name":"d","type":"double"},
        |  {"name":"f","type":"float"},
        |  {"name":"b","type":"boolean"},
        |  {"name":"by","type":"bytes"},
        |  {"name":"fx","type":{"type":"fixed","name":"f4","size":4}},
        |  {"name":"e","type":{"type":"enum","name":"col",
        |                      "symbols":["A","B","C"]}},
        |  {"name":"arr","type":{"type":"array","items":"long"}},
        |  {"name":"m","type":{"type":"map","values":"int"}},
        |  {"name":"next","type":["null","node"]}
        |]}""".stripMargin)
    val bos = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, bos)
    def rec(id: Long, next: GenericRecord): GenericRecord = {
      val r = new GenericData.Record(schema)
      r.put("id", id)
      r.put("s", "héllo")
      r.put("opt", if (id == 1) null else "x")
      r.put("d", 2.5)
      r.put("f", 0.5f)
      r.put("b", true)
      r.put("by", java.nio.ByteBuffer.wrap(Array[Byte](1, -1)))
      r.put("fx", new GenericData.Fixed(schema.getField("fx").schema(),
        Array[Byte](0xDE.toByte, 0xAD.toByte, 0xBE.toByte, 0xEF.toByte)))
      r.put("e", new GenericData.EnumSymbol(
        schema.getField("e").schema(), "B"))
      r.put("arr", java.util.Arrays.asList(1L, 2L))
      val m = new java.util.LinkedHashMap[String, Integer]
      m.put("k", 3)
      r.put("m", m)
      r.put("next", next)
      r
    }
    w.append(rec(1, rec(2, null)))
    w.close()
    (schema, bos.toByteArray)
  }

  private def records(b: Array[Byte]): Seq[String] = {
    val r = AvroRecordsJson.compute(b, 1 << 20, 1 << 26)
    assert(r != null)
    (0 until r.numElements()).map(i => r.getUTF8String(i).toString)
  }

  test("avro_records: every encoding branch decodes against the real " +
    "library's output — unions, enum, fixed, bytes, array, map, " +
    "RECURSIVE named-type reference") {
    val (_, bytes) = rich()
    val got = records(bytes)
    assert(got.size == 1)
    val by = "\"by\":\"" + "\\u0001" + "\\u00ff" + "\""
    val fx = "\"fx\":\"" + "\\u00de" + "\\u00ad" + "\\u00be" + "\\u00ef" + "\""
    assert(got.head ==
      """{"id":1,"s":"héllo","opt":null,"d":2.5,"f":0.5,"b":true,""" +
      by + "," + fx + ""","e":"B","arr":[1,2],"m":{"k":3},""" +
      """"next":{"id":2,"s":"héllo","opt":"x","d":2.5,"f":0.5,"b":true,""" +
      by + "," + fx + ""","e":"B","arr":[1,2],"m":{"k":3},"next":null}}""")
  }

  test("avro_records: identical JSON under all six spec codecs, each " +
    "decoded by the engine's own kernel") {
    val schema = SchemaBuilder.record("r").fields()
      .requiredLong("id").requiredString("s").endRecord()
    def fileWith(codec: CodecFactory): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      if (codec != null) w.setCodec(codec)
      w.setSyncInterval(64)
      w.create(schema, bos)
      (1 to 100).foreach { i =>
        val r = new GenericData.Record(schema)
        r.put("id", i.toLong); r.put("s", "row " + i + " padding padding")
        w.append(r)
      }
      w.close()
      bos.toByteArray
    }
    val expected = records(fileWith(null))
    assert(expected.size == 100 &&
      expected.head == """{"id":1,"s":"row 1 padding padding"}""")
    for ((name, c) <- Seq(
      "deflate" -> CodecFactory.deflateCodec(6),
      "snappy" -> CodecFactory.snappyCodec(),
      "bzip2" -> CodecFactory.bzip2Codec(),
      "xz" -> CodecFactory.xzCodec(6),
      "zstandard" -> CodecFactory.zstandardCodec(3)))
      assert(records(fileWith(c)) == expected, s"codec $name")
  }

  test("avro_records composes into typed ingestion: explode + " +
    "from_json over the payload column") {
    import spark.implicits._
    val (_, bytes) = rich()
    val rows = Seq((1L, bytes)).toDF("doc_id", "payload")
      .select(col("doc_id"),
        explode(AvroRecordsJson(col("payload"))).as("j"))
      .select(col("doc_id"),
        from_json(col("j"), org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, s STRING, arr ARRAY<BIGINT>")).as("r"))
      .select("doc_id", "r.id", "r.s", "r.arr")
      .collect()
    assert(rows.length == 1 && rows(0).getLong(1) == 1L &&
      rows(0).getString(2) == "héllo" &&
      rows(0).getSeq[Long](3) == Seq(1L, 2L))
  }

  test("CorpusIO.readAvro: the Spark schema derives from the shard's " +
    "OWN header (exact, not sampled); a corrupt shard vanishes whole; " +
    "sparkDdl maps unions/bytes/recursion as documented") {
    val schema = SchemaBuilder.record("doc").fields()
      .requiredLong("doc_id").requiredString("text")
      .optionalString("lang").endRecord()
    def shard(from: Int, to: Int): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, bos)
      (from to to).foreach { i =>
        val r = new GenericData.Record(schema)
        r.put("doc_id", i.toLong); r.put("text", "t" + i)
        r.put("lang", if (i % 2 == 0) "en" else null)
        w.append(r)
      }
      w.close()
      bos.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-avro")
    java.nio.file.Files.write(dir.resolve("a.avro"), shard(1, 3))
    val bad = shard(4, 6)
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 1).toByte
    java.nio.file.Files.write(dir.resolve("b.avro"), bad)
    val got = graft.sources.CorpusIO.readAvro(spark, dir.toString)
      .orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1),
      Option(r.getString(2)))).toSeq == Seq(
      (1L, "t1", None), (2L, "t2", Some("en")), (3L, "t3", None)))
    // sparkDdl contracts: nullable union unwraps, bytes→STRING,
    // recursion→STRING
    assert(AvroRecordsJson.sparkDdl(
      """{"type":"record","name":"n","fields":[
        |{"name":"a","type":["null","long"]},
        |{"name":"b","type":"bytes"},
        |{"name":"c","type":["null","n"]}]}""".stripMargin)
      == "`a` BIGINT, `b` STRING, `c` STRING")
    assert(AvroRecordsJson.sparkDdl("""{"bad json""") == null)
  }

  test("avro LOGICAL TYPES render as logical values: decimal (bytes " +
    "AND fixed), date, timestamp-millis/micros, time-millis, uuid; " +
    "unknown logical names keep the base rendering") {
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"lt","fields":[
        |  {"name":"dec","type":{"type":"bytes","logicalType":"decimal",
        |    "precision":10,"scale":2}},
        |  {"name":"decf","type":{"type":"fixed","name":"d8","size":8,
        |    "logicalType":"decimal","precision":18,"scale":4}},
        |  {"name":"dt","type":{"type":"int","logicalType":"date"}},
        |  {"name":"tsm","type":{"type":"long",
        |    "logicalType":"timestamp-millis"}},
        |  {"name":"tsu","type":{"type":"long",
        |    "logicalType":"timestamp-micros"}},
        |  {"name":"tm","type":{"type":"int","logicalType":"time-millis"}},
        |  {"name":"uid","type":{"type":"string","logicalType":"uuid"}},
        |  {"name":"mystery","type":{"type":"int",
        |    "logicalType":"not-a-real-one"}}
        |]}""".stripMargin)
    val bos = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, bos)
    val r = new GenericData.Record(schema)
    // -12345 unscaled, scale 2 => -123.45
    r.put("dec", java.nio.ByteBuffer.wrap(
      java.math.BigInteger.valueOf(-12345L).toByteArray))
    // 98765 unscaled in an 8-byte fixed, scale 4 => 9.8765
    val fx = new Array[Byte](8)
    val src = java.math.BigInteger.valueOf(98765L).toByteArray
    System.arraycopy(src, 0, fx, 8 - src.length, src.length)
    r.put("decf", new GenericData.Fixed(
      schema.getField("decf").schema(), fx))
    r.put("dt", 19723)          // 2024-01-01
    r.put("tsm", 1700000000123L)
    r.put("tsu", 1700000000123456L)
    r.put("tm", 3723250)        // 01:02:03.25
    r.put("uid", "0f8fad5b-d9cb-469f-a165-70867728950e")
    r.put("mystery", 7)
    w.append(r)
    w.close()
    val got = records(bos.toByteArray)
    assert(got.length == 1)
    val j = got.head
    assert(j.contains("\"dec\":-123.45"), j)
    assert(j.contains("\"decf\":9.8765"), j)
    assert(j.contains("\"dt\":\"" +
      java.time.LocalDate.ofEpochDay(19723) + "\""), j)
    assert(j.contains("\"tsm\":\"" +
      java.time.Instant.ofEpochMilli(1700000000123L) + "\""), j)
    assert(j.contains("\"tsu\":\"" + java.time.Instant.ofEpochSecond(
      1700000000L, 123456000L) + "\""), j)
    assert(j.contains("\"tm\":\"01:02:03.250\""), j)
    assert(j.contains(
      "\"uid\":\"0f8fad5b-d9cb-469f-a165-70867728950e\""), j)
    assert(j.contains("\"mystery\":7"), j)
  }

  test("avro_records fails closed: schema junk, unsupported codec, " +
    "corrupt block data, record-count bomb, datum overrun") {
    val (_, bytes) = rich()
    // poison the schema json (header value bytes): find "record" and
    // break it
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val at = s.indexOf("\"record\"")
    val badSchema = bytes.clone()
    badSchema(at + 1) = '}'.toByte
    assert(AvroRecordsJson.compute(badSchema, 1 << 20, 1 << 26) == null)
    // an unsupported codec name refuses
    val schema2 = SchemaBuilder.record("r").fields()
      .requiredLong("id").endRecord()
    val bos = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema2))
    w.setCodec(CodecFactory.deflateCodec(1))
    w.create(schema2, bos)
    val r0 = new GenericData.Record(schema2); r0.put("id", 5L)
    w.append(r0); w.close()
    val df = bos.toByteArray
    val txt = new String(df, java.nio.charset.StandardCharsets.ISO_8859_1)
    val ci = txt.indexOf("deflate")
    val badCodec = df.clone()
    badCodec(ci) = 'x'.toByte // "xeflate": unknown → refuse
    assert(AvroRecordsJson.compute(badCodec, 1 << 20, 1 << 26) == null)
    // corrupt compressed data
    val badData = df.clone()
    badData(badData.length - 18) = (badData(badData.length - 18) ^ 0x55).toByte
    assert(AvroRecordsJson.compute(badData, 1 << 20, 1 << 26) == null)
    // caps
    assert(AvroRecordsJson.compute(bytes, 1 << 20, 8) == null)
    val (_, many) = rich()
    assert(AvroRecordsJson.compute(many, 1, 1 << 26) != null) // 1 record OK
  }
}
