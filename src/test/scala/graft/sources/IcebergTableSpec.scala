package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import graft.SparkSpec

/** Iceberg census over a table laid out per the public spec —
  * metadata JSON (version-hint discovery), a real-avro manifest list,
  * real-avro manifests with added/existing/deleted entries and a v2
  * delete file — all decoded by the engine's own avro kernel. */
class IcebergTableSpec extends SparkSpec {

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string"},
      |  {"name":"manifest_length","type":"long"},
      |  {"name":"partition_spec_id","type":"int"},
      |  {"name":"added_snapshot_id","type":"long"}]}""".stripMargin)

  private val manifestEntrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int"},
      |  {"name":"snapshot_id","type":["null","long"]},
      |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |    {"name":"content","type":"int"},
      |    {"name":"file_path","type":"string"},
      |    {"name":"file_format","type":"string"},
      |    {"name":"record_count","type":"long"},
      |    {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

  private def avroFile(schema: Schema, recs: Seq[GenericRecord]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, bos)
    recs.foreach(w.append)
    w.close()
    bos.toByteArray
  }

  private def entry(status: Int, content: Int, path: String,
                    fmt: String, records: Long, size: Long): GenericRecord = {
    val df = new GenericData.Record(
      manifestEntrySchema.getField("data_file").schema())
    df.put("content", content)
    df.put("file_path", path)
    df.put("file_format", fmt)
    df.put("record_count", records)
    df.put("file_size_in_bytes", size)
    val e = new GenericData.Record(manifestEntrySchema)
    e.put("status", status)
    e.put("snapshot_id", 7L)
    e.put("data_file", df)
    e
  }

  private def buildTable(withHint: Boolean): Path = {
    val dir = Files.createTempDirectory("graft-iceberg")
    val meta = Files.createDirectories(dir.resolve("metadata"))
    val m1 = avroFile(manifestEntrySchema, Seq(
      entry(1, 0, "data/a.parquet", "PARQUET", 100, 1000),
      entry(1, 0, "data/b.parquet", "PARQUET", 200, 2000),
      entry(2, 0, "data/gone.parquet", "PARQUET", 9, 90)))
    val m2 = avroFile(manifestEntrySchema, Seq(
      entry(0, 0, "data/c.avro", "AVRO", 50, 500),
      entry(1, 1, "data/deletes.parquet", "PARQUET", 4, 40),
      entry(1, 2, "data/eqdel.parquet", "PARQUET", 2, 20),
      entry(2, 1, "data/olddel.parquet", "PARQUET", 9, 90)))
    Files.write(meta.resolve("m1.avro"), m1)
    Files.write(meta.resolve("m2.avro"), m2)
    def mf(p: String, len: Long): GenericRecord = {
      val r = new GenericData.Record(manifestListSchema)
      r.put("manifest_path", p)
      r.put("manifest_length", len)
      r.put("partition_spec_id", 0)
      r.put("added_snapshot_id", 7L)
      r
    }
    Files.write(meta.resolve("snap-7.avro"), avroFile(manifestListSchema,
      Seq(mf("metadata/m1.avro", m1.length.toLong),
        mf("metadata/m2.avro", m2.length.toLong))))
    val metadataJson =
      """{"format-version":2,"table-uuid":"0000-test",
        |"location":"ignored","current-snapshot-id":7,
        |"snapshots":[
        |  {"snapshot-id":3,"timestamp-ms":1,
        |   "manifest-list":"metadata/old.avro"},
        |  {"snapshot-id":7,"timestamp-ms":2,
        |   "manifest-list":"metadata/snap-7.avro"}]}""".stripMargin
    Files.write(meta.resolve("v2.metadata.json"),
      metadataJson.getBytes(StandardCharsets.UTF_8))
    // a decoy OLDER metadata doc proves discovery picks the right one
    Files.write(meta.resolve("v1.metadata.json"),
      metadataJson.replace("\"current-snapshot-id\":7",
        "\"current-snapshot-id\":3").getBytes(StandardCharsets.UTF_8))
    if (withHint)
      Files.write(meta.resolve("version-hint.text"),
        "2".getBytes(StandardCharsets.UTF_8))
    dir
  }

  test("iceberg snapshot: live files = non-deleted entries minus v2 " +
    "delete files, across manifests, via the engine's avro kernel") {
    val dir = buildTable(withHint = true)
    val live = IcebergTable.snapshot(spark, dir.toString)
      .orderBy("file_path").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(live.toSeq == Seq(
      ("data/a.parquet", "PARQUET", 100L, 1000L),
      ("data/b.parquet", "PARQUET", 200L, 2000L),
      ("data/c.avro", "AVRO", 50L, 500L)))
  }

  test("iceberg tableMeta: exact row total is a metadata-only " +
    "aggregation; version-hint AND lexicographic discovery agree") {
    for (hint <- Seq(true, false)) {
      val dir = buildTable(withHint = hint)
      val m = IcebergTable.tableMeta(spark, dir.toString).collect()(0)
      assert(m.getAs[Int]("format_version") == 2, s"hint=$hint")
      assert(m.getAs[Long]("current_snapshot_id") == 7L)
      assert(m.getAs[Int]("n_snapshots") == 2)
      assert(m.getAs[Long]("n_files") == 3L)
      assert(m.getAs[Long]("total_bytes") == 3500L)
      assert(m.getAs[Long]("total_records") == 350L)
      // merge-on-read honesty columns: total_records is an UPPER
      // bound, bounded by the delete-file census
      assert(m.getAs[Long]("n_delete_files") == 2L)
      assert(m.getAs[Long]("delete_records") == 6L)
    }
  }

  test("iceberg deleteFiles: live v2 delete files with content kinds " +
    "and record counts; dropped delete entries excluded") {
    val dir = buildTable(withHint = true)
    val dels = IcebergTable.deleteFiles(spark, dir.toString)
      .orderBy("file_path").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    assert(dels.toSeq == Seq(
      ("data/deletes.parquet", "position", 4L),
      ("data/eqdel.parquet", "equality", 2L)))
  }

  test("iceberg metadataStream tails the metadata log: documents " +
    "landed AFTER the stream starts arrive as micro-batches with the " +
    "version parsed from BOTH public naming shapes") {
    import org.apache.spark.sql.functions.col
    val dir = buildTable(withHint = true)
    val meta = dir.resolve("metadata")
    val q = IcebergTable.metadataStream(spark, dir.toString)
      .select(col("version"), col("`current-snapshot-id`").as("snap"))
      .writeStream.format("memory").queryName("iceberg_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val first = spark.table("iceberg_tail").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(first == Set((1L, 3L), (2L, 7L)))
      // a writer flips the snapshot while the stream runs — the
      // Spark-writer naming shape (zero-padded + uuid)
      Files.write(meta.resolve("00003-0a1b2c3d.metadata.json"),
        new String(Files.readAllBytes(meta.resolve("v2.metadata.json")),
          StandardCharsets.UTF_8)
          .replace("\"current-snapshot-id\":7",
            "\"current-snapshot-id\":9")
          .getBytes(StandardCharsets.UTF_8))
      q.processAllAvailable()
      val rows = spark.table("iceberg_tail").orderBy("version").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((1L, 3L), (2L, 7L), (3L, 9L)))
    } finally q.stop()
  }

  test("iceberg census refuses non-tables") {
    val plain = Files.createTempDirectory("graft-noticeberg")
    intercept[IllegalArgumentException] {
      IcebergTable.snapshot(spark, plain.toString)
    }
  }
}
