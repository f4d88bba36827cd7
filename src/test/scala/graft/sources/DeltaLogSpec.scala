package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Delta-log census over synthesized protocol-exact logs: JSON-only
  * replay (adds, removes, a same-version rewrite), the checkpoint +
  * tail path (extra stats column conformed away, commits at or before
  * the checkpoint version skipped), and the not-a-delta-table
  * refusal. No data file ever exists — the census touches only the
  * log by construction. */
class DeltaLogSpec extends SparkSpec {

  private def writeCommit(log: Path, v: Long, lines: Seq[String]): Unit =
    Files.write(log.resolve(f"$v%020d.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))

  private val v0 = Seq(
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
    """{"metaData":{"id":"t1","name":"docs","schemaString":"{\"type\":\"struct\"}","partitionColumns":["lang"],"createdTime":1}}""",
    """{"add":{"path":"lang=en/a.parquet","partitionValues":{"lang":"en"},"size":100,"modificationTime":10,"dataChange":true}}""",
    """{"add":{"path":"lang=de/b.parquet","partitionValues":{"lang":"de"},"size":200,"modificationTime":11,"dataChange":true}}""")
  private val v1 = Seq(
    """{"remove":{"path":"lang=de/b.parquet","deletionTimestamp":20,"dataChange":true}}""",
    """{"add":{"path":"lang=de/c.parquet","partitionValues":{"lang":"de"},"size":300,"modificationTime":21,"dataChange":true}}""")
  private val v2 = Seq(
    """{"remove":{"path":"lang=en/a.parquet","deletionTimestamp":30,"dataChange":true}}""",
    """{"add":{"path":"lang=en/a.parquet","partitionValues":{"lang":"en"},"size":150,"modificationTime":31,"dataChange":true}}""",
    """{"metaData":{"id":"t1","name":"docs2","schemaString":"{\"type\":\"struct2\"}","partitionColumns":["lang"],"createdTime":1}}""")

  private def jsonTable(): String = {
    val dir = Files.createTempDirectory("graft-delta")
    val log = Files.createDirectories(dir.resolve("_delta_log"))
    writeCommit(log, 0, v0); writeCommit(log, 1, v1); writeCommit(log, 2, v2)
    dir.toString
  }

  test("delta snapshot: adds minus later removes; a same-version " +
    "remove+add of one path resolves to the add (rewrite)") {
    val t = jsonTable()
    val live = DeltaLog.snapshot(spark, t)
      .select(col("path"), col("size"), col("modification_time"),
        col("partition_values")("lang").as("lang"), col("added_version"))
      .orderBy("path").collect()
    assert(live.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getLong(4))).toSeq == Seq(
      ("lang=de/c.parquet", 300L, 21L, "de", 1L),
      ("lang=en/a.parquet", 150L, 31L, "en", 2L)))
  }

  test("delta tableMeta and history: latest metaData wins, live " +
    "census sums only live bytes, per-commit add/remove audit") {
    val t = jsonTable()
    val m = DeltaLog.tableMeta(spark, t).collect()(0)
    assert(m.getAs[String]("name") == "docs2")
    assert(m.getAs[String]("schema_string") == """{"type":"struct2"}""")
    assert(m.getAs[scala.collection.Seq[String]]("partition_columns")
      .toSeq == Seq("lang"))
    assert(m.getAs[Int]("min_reader_version") == 1)
    assert(m.getAs[Long]("version") == 2L)
    assert(m.getAs[Long]("n_files") == 2L)
    assert(m.getAs[Long]("total_bytes") == 450L)
    val h = DeltaLog.history(spark, t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(h.toSeq == Seq((0L, 2L, 300L, 0L), (1L, 1L, 300L, 1L),
      (2L, 1L, 150L, 1L)))
  }

  test("delta checkpoint path: tail commits after the checkpoint " +
    "version replay over it; extra checkpoint columns conform away; " +
    "commits at or before the checkpoint are SKIPPED") {
    val dir = Files.createTempDirectory("graft-delta-ck")
    val log = Files.createDirectories(dir.resolve("_delta_log"))
    // the v0+v1 state collapsed into a checkpoint at version 1 the
    // way Delta writes it: RECONCILED — the removed file appears only
    // as its tombstone (never next to its superseded add), plus the
    // real-world extra stats column
    val collapsed = Files.createTempFile("ck", ".json")
    Files.write(collapsed, Seq(v0(0), v0(1), v0(2), v1(1),
      """{"remove":{"path":"lang=de/b.parquet","deletionTimestamp":20,"dataChange":true}}""")
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    spark.read.schema(DeltaLog.actionSchema)
      .json(collapsed.toString)
      .withColumn("stats", lit("""{"numRecords":1}"""))
      .coalesce(1).write.mode("overwrite")
      .parquet(log.resolve(f"${1L}%020d.checkpoint.parquet").toString)
    Files.write(log.resolve("_last_checkpoint"),
      """{"version":1,"size":7}""".getBytes(StandardCharsets.UTF_8))
    // a poisoned commit AT the checkpoint version proves the skip
    writeCommit(log, 1, Seq("""{"add":{"path":"POISON","size":1}}"""))
    writeCommit(log, 2, v2)
    val live = DeltaLog.snapshot(spark, dir.toString)
      .orderBy("path").collect()
    assert(live.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(
      ("lang=de/c.parquet", 300L), ("lang=en/a.parquet", 150L)))
    val m = DeltaLog.tableMeta(spark, dir.toString).collect()(0)
    assert(m.getAs[String]("name") == "docs2" &&
      m.getAs[Long]("total_bytes") == 450L)
  }

  test("delta deletion vectors: a DV-carrying add surfaces has_dv + " +
    "dv_cardinality in the snapshot, a later DV-free rewrite clears " +
    "them, and the columns survive a checkpoint round-trip") {
    val dir = Files.createTempDirectory("graft-delta-dv")
    val log = Files.createDirectories(dir.resolve("_delta_log"))
    writeCommit(log, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}""",
      """{"metaData":{"id":"t2","name":"dv","schemaString":"{}","partitionColumns":[],"createdTime":1}}""",
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":100,"modificationTime":10,"dataChange":true}}""",
      """{"add":{"path":"f2.parquet","partitionValues":{},"size":200,"modificationTime":11,"dataChange":true}}"""))
    // a DELETE wrote a deletion vector against f1 (Delta 3.x shape)
    writeCommit(log, 1, Seq(
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":100,"modificationTime":10,"dataChange":false,"deletionVector":{"storageType":"u","pathOrInlineDv":"ab^-aqEH.-t","offset":1,"sizeInBytes":36,"cardinality":7}}}"""))
    val live = DeltaLog.snapshot(spark, dir.toString)
      .orderBy("path").collect()
    assert(live.map(r => (r.getString(0), r.getBoolean(5),
      if (r.isNullAt(6)) -1L else r.getLong(6))).toSeq ==
      Seq(("f1.parquet", true, 7L), ("f2.parquet", false, -1L)))
    // census stays honest: size still reported, DV flags the bound
    assert(live(0).getLong(1) == 100L)
    // a compaction rewrite drops the DV
    writeCommit(log, 2, Seq(
      """{"remove":{"path":"f1.parquet","deletionTimestamp":30,"dataChange":false}}""",
      """{"add":{"path":"f1c.parquet","partitionValues":{},"size":90,"modificationTime":31,"dataChange":false}}"""))
    val live2 = DeltaLog.snapshot(spark, dir.toString)
      .orderBy("path").collect()
    assert(live2.map(r => (r.getString(0), r.getBoolean(5))).toSeq ==
      Seq(("f1c.parquet", false), ("f2.parquet", false)))
    // checkpoint the DV state at v1 (extra checkpoint columns AND the
    // DV struct must conform by NAME, never by position) and replay
    val dir2 = Files.createTempDirectory("graft-delta-dv-ck")
    val log2 = Files.createDirectories(dir2.resolve("_delta_log"))
    val collapsed = Files.createTempFile("dvck", ".json")
    Files.write(collapsed, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}""",
      """{"metaData":{"id":"t2","name":"dv","schemaString":"{}","partitionColumns":[],"createdTime":1}}""",
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":100,"modificationTime":10,"dataChange":false,"deletionVector":{"storageType":"u","pathOrInlineDv":"ab^-aqEH.-t","offset":1,"sizeInBytes":36,"cardinality":7}}}""",
      """{"add":{"path":"f2.parquet","partitionValues":{},"size":200,"modificationTime":11,"dataChange":true}}""")
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    spark.read.schema(DeltaLog.actionSchema)
      .json(collapsed.toString)
      .withColumn("stats", lit("""{"numRecords":5}"""))
      .coalesce(1).write.mode("overwrite")
      .parquet(log2.resolve(f"${1L}%020d.checkpoint.parquet").toString)
    Files.write(log2.resolve("_last_checkpoint"),
      """{"version":1,"size":4}""".getBytes(StandardCharsets.UTF_8))
    val liveCk = DeltaLog.snapshot(spark, dir2.toString)
      .orderBy("path").collect()
    assert(liveCk.map(r => (r.getString(0), r.getBoolean(5),
      if (r.isNullAt(6)) -1L else r.getLong(6))).toSeq ==
      Seq(("f1.parquet", true, 7L), ("f2.parquet", false, -1L)))
  }

  test("delta multi-part checkpoint: the parts field resolves every " +
    "part file; a missing part and a v2 UUID layout both refuse with " +
    "explicit errors") {
    val dir = Files.createTempDirectory("graft-delta-mp")
    val log = Files.createDirectories(dir.resolve("_delta_log"))
    // the v0+v1 reconciled state split across two checkpoint parts
    def writePart(lines: Seq[String], part: Int, of: Int): Unit = {
      val f = Files.createTempFile("ckp", ".json")
      Files.write(f, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      spark.read.schema(DeltaLog.actionSchema).json(f.toString)
        .coalesce(1).write.mode("overwrite")
        .parquet(log.resolve(
          f"${1L}%020d.checkpoint.$part%010d.$of%010d.parquet").toString)
    }
    writePart(Seq(v0(0), v0(1), v0(2)), 1, 2)
    writePart(Seq(v1(1),
      """{"remove":{"path":"lang=de/b.parquet","deletionTimestamp":20,"dataChange":true}}"""),
      2, 2)
    Files.write(log.resolve("_last_checkpoint"),
      """{"version":1,"size":7,"parts":2}""".getBytes(StandardCharsets.UTF_8))
    writeCommit(log, 1, Seq("""{"add":{"path":"POISON","size":1}}"""))
    writeCommit(log, 2, v2)
    val live = DeltaLog.snapshot(spark, dir.toString)
      .orderBy("path").collect()
    assert(live.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(
      ("lang=de/c.parquet", 300L), ("lang=en/a.parquet", 150L)))
    // a missing part refuses with the part named
    Files.write(log.resolve("_last_checkpoint"),
      """{"version":1,"size":7,"parts":3}""".getBytes(StandardCharsets.UTF_8))
    val e1 = intercept[IllegalArgumentException](
      DeltaLog.snapshot(spark, dir.toString).collect())
    assert(e1.getMessage.contains("multi-part checkpoint"))
    // a JSON-named v2 top-level (no classic file, no parts) refuses
    val dir2 = Files.createTempDirectory("graft-delta-v2j")
    val log2 = Files.createDirectories(dir2.resolve("_delta_log"))
    writeCommit(log2, 0, v0)
    Files.write(log2.resolve(
      f"${0L}%020d.checkpoint.80a083e8-7026.json"),
      "{}".getBytes(StandardCharsets.UTF_8))
    Files.write(log2.resolve("_last_checkpoint"),
      """{"version":0,"size":4}""".getBytes(StandardCharsets.UTF_8))
    val e2 = intercept[IllegalArgumentException](
      DeltaLog.snapshot(spark, dir2.toString).collect())
    assert(e2.getMessage.contains("v2"))
  }

  test("delta v2 UUID checkpoint: sidecar file actions replay with " +
    "the top-level's non-file actions, snapshot EQUALS the pure " +
    "commit-replay answer; a missing sidecar refuses") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-delta-v2")
    val log = Files.createDirectories(dir.resolve("_delta_log"))
    val side = Files.createDirectories(log.resolve("_sidecars"))
    val v2Schema = DeltaLog.actionSchema
      .add(StructField("sidecar", StructType(Seq(
        StructField("path", StringType),
        StructField("sizeInBytes", LongType)))))
      .add(StructField("checkpointMetadata", StructType(Seq(
        StructField("version", LongType)))))
    def writeParquet(lines: Seq[String], to: Path): Unit = {
      val f = Files.createTempFile("v2ck", ".json")
      Files.write(f, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      spark.read.schema(v2Schema).json(f.toString)
        .coalesce(1).write.mode("overwrite").parquet(to.toString)
    }
    // top-level: protocol + metaData + checkpointMetadata + 2 sidecar
    // pointers; the file actions live ONLY in the sidecars
    writeParquet(Seq(v0(0), v0(1),
      """{"checkpointMetadata":{"version":1}}""",
      """{"sidecar":{"path":"s1.parquet","sizeInBytes":10}}""",
      """{"sidecar":{"path":"s2.parquet","sizeInBytes":10}}"""),
      log.resolve(f"${1L}%020d.checkpoint.b02b3c88-7d2e-4f3a-a1de-1f4c0c9f0001.parquet"))
    writeParquet(Seq(v0(2)), side.resolve("s1.parquet"))
    writeParquet(Seq(v1(1),
      """{"remove":{"path":"lang=de/b.parquet","deletionTimestamp":20,"dataChange":true}}"""),
      side.resolve("s2.parquet"))
    Files.write(log.resolve("_last_checkpoint"),
      """{"version":1,"size":7}""".getBytes(StandardCharsets.UTF_8))
    // a poisoned commit AT the checkpoint version proves the skip
    writeCommit(log, 1, Seq("""{"add":{"path":"POISON","size":1}}"""))
    writeCommit(log, 2, v2)
    // the pure-json replay of the same history is the truth
    val truth = DeltaLog.snapshot(spark, jsonTable())
      .select("path", "size", "added_version").orderBy("path").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val live = DeltaLog.snapshot(spark, dir.toString)
      .select("path", "size", "added_version").orderBy("path").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // added_version: the checkpoint collapses v0 adds into version 1
    assert(truth == Seq(("lang=de/c.parquet", 300L, 1L),
      ("lang=en/a.parquet", 150L, 2L)))
    assert(live == truth)
    val m = DeltaLog.tableMeta(spark, dir.toString).collect()(0)
    assert(m.getAs[String]("name") == "docs2" &&
      m.getAs[Long]("total_bytes") == 450L)
    // a named-but-missing sidecar refuses explicitly
    Files.delete(side.resolve("s2.parquet").resolve("_SUCCESS"))
    for (f <- side.resolve("s2.parquet").toFile.listFiles())
      f.delete()
    Files.delete(side.resolve("s2.parquet"))
    val e = intercept[IllegalArgumentException](
      DeltaLog.snapshot(spark, dir.toString).collect())
    assert(e.getMessage.contains("sidecar"))
  }

  test("delta commitStream tails the log: commits landed AFTER the " +
    "stream starts arrive as micro-batches, version attached") {
    val dir = Files.createTempDirectory("graft-delta-stream")
    val log = Files.createDirectories(dir.resolve("_delta_log"))
    writeCommit(log, 0, v0)
    val q = DeltaLog.commitStream(spark, dir.toString)
      .filter(col("add").isNotNull)
      .select(col("version"), col("add.path").as("path"),
        col("add.size").as("size"))
      .writeStream.format("memory").queryName("delta_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val first = spark.table("delta_tail").collect()
      assert(first.map(_.getString(1)).toSet ==
        Set("lang=en/a.parquet", "lang=de/b.parquet"))
      // a writer lands v1 while the stream runs
      writeCommit(log, 1, v1)
      q.processAllAvailable()
      val rows = spark.table("delta_tail")
        .orderBy("version", "path").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(rows.toSeq == Seq(
        (0L, "lang=de/b.parquet", 200L), (0L, "lang=en/a.parquet", 100L),
        (1L, "lang=de/c.parquet", 300L)))
    } finally q.stop()
  }

  test("delta census refuses non-tables: no _delta_log, empty log") {
    val plain = Files.createTempDirectory("graft-notdelta")
    intercept[IllegalArgumentException] {
      DeltaLog.snapshot(spark, plain.toString)
    }
    Files.createDirectories(plain.resolve("_delta_log"))
    intercept[IllegalArgumentException] {
      DeltaLog.snapshot(spark, plain.toString)
    }
  }
}
