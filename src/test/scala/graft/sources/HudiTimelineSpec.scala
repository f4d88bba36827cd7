package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import graft.SparkSpec

/** Hudi census over a synthesized layout-exact table: instant-state
  * naming, commit write-stats JSON with explicit schema, properties
  * facts, refusal. */
class HudiTimelineSpec extends SparkSpec {

  private def commitJson(ts: String): String =
    s"""{
       |  "partitionToWriteStats": {
       |    "lang=en": [
       |      {"fileId": "f1-$ts", "path": "lang=en/f1-$ts.parquet",
       |       "numWrites": 100, "numDeletes": 0, "numUpdateWrites": 0,
       |       "totalWriteBytes": 1000, "fileSizeInBytes": 1000}],
       |    "lang=de": [
       |      {"fileId": "f2-$ts", "path": "lang=de/f2-$ts.parquet",
       |       "numWrites": 50, "numDeletes": 5, "numUpdateWrites": 2,
       |       "totalWriteBytes": 500, "fileSizeInBytes": 500}]
       |  },
       |  "operationType": "UPSERT"
       |}""".stripMargin

  private def buildTable(): Path = {
    val dir = Files.createTempDirectory("graft-hudi")
    val h = Files.createDirectories(dir.resolve(".hoodie"))
    Files.write(h.resolve("hoodie.properties"),
      ("hoodie.table.name=docs\nhoodie.table.type=COPY_ON_WRITE\n" +
        "hoodie.table.version=6\n").getBytes(StandardCharsets.UTF_8))
    Files.write(h.resolve("001.commit"),
      commitJson("001").getBytes(StandardCharsets.UTF_8))
    Files.write(h.resolve("002.deltacommit"),
      commitJson("002").getBytes(StandardCharsets.UTF_8))
    Files.write(h.resolve("003.commit.requested"), Array.emptyByteArray)
    Files.write(h.resolve("003.commit.inflight"), Array.emptyByteArray)
    Files.write(h.resolve("002.clean"), "{}".getBytes(StandardCharsets.UTF_8))
    dir
  }

  test("hudi timeline: instant states off the file-name contract") {
    val t = buildTable().toString
    val tl = HudiTimeline.timeline(spark, t).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(tl.toSeq == Seq(
      ("001", "commit", "completed"),
      ("002", "clean", "completed"),
      ("002", "deltacommit", "completed"),
      ("003", "commit", "inflight"),
      ("003", "commit", "requested")))
  }

  test("hudi commitStats: per-file write statistics across completed " +
    "commit-class instants, explicit schema, distributed JSON scan") {
    val t = buildTable().toString
    val cs = HudiTimeline.commitStats(spark, t)
      .orderBy("instant_ts", "partition").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(4), r.getLong(5), r.getLong(6), r.getLong(8)))
    assert(cs.toSeq == Seq(
      ("001", "commit", "lang=de", "lang=de/f2-001.parquet", 50L, 5L, 500L),
      ("001", "commit", "lang=en", "lang=en/f1-001.parquet", 100L, 0L, 1000L),
      ("002", "deltacommit", "lang=de", "lang=de/f2-002.parquet", 50L, 5L, 500L),
      ("002", "deltacommit", "lang=en", "lang=en/f1-002.parquet", 100L, 0L, 1000L)))
  }

  test("hudi tableMeta: properties facts + timeline census") {
    val m = HudiTimeline.tableMeta(spark, buildTable().toString).collect()(0)
    assert(m.getAs[String]("name") == "docs")
    assert(m.getAs[String]("table_type") == "COPY_ON_WRITE")
    assert(m.getAs[String]("table_version") == "6")
    assert(m.getAs[Long]("n_instants") == 5L)
    assert(m.getAs[Long]("n_completed") == 3L)
    assert(m.getAs[Long]("n_pending") == 2L)
    assert(m.getAs[String]("latest_completed") == "002")
  }

  test("hudi commitStream tails completed instants: commits landed " +
    "AFTER the stream starts arrive; pending markers never fire") {
    import org.apache.spark.sql.functions.col
    val dir = buildTable()
    val h = dir.resolve(".hoodie")
    val q = HudiTimeline.commitStream(spark, dir.toString)
      .select(col("instant_ts"), col("action"), col("file_id"),
        col("num_writes"))
      .writeStream.format("memory").queryName("hudi_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val first = spark.table("hudi_tail").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(first == Set(("001", "commit"), ("002", "deltacommit")))
      // a writer completes instant 003 while the stream runs; a new
      // pending marker for 004 must NOT fire
      Files.write(h.resolve("003.commit"),
        commitJson("003").getBytes(StandardCharsets.UTF_8))
      Files.write(h.resolve("004.commit.requested"), Array.emptyByteArray)
      q.processAllAvailable()
      val rows = spark.table("hudi_tail")
        .orderBy("instant_ts", "file_id").collect()
        .map(r => (r.getString(0), r.getString(2), r.getLong(3)))
      assert(rows.toSeq == Seq(
        ("001", "f1-001", 100L), ("001", "f2-001", 50L),
        ("002", "f1-002", 100L), ("002", "f2-002", 50L),
        ("003", "f1-003", 100L), ("003", "f2-003", 50L)))
    } finally q.stop()
  }

  test("hudi census refuses non-tables") {
    val plain = Files.createTempDirectory("graft-nothudi")
    intercept[IllegalArgumentException] {
      HudiTimeline.timeline(spark, plain.toString)
    }
  }
}
