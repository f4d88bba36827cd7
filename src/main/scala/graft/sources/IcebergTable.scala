package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Apache Iceberg table census — [[DeltaLog]]'s sibling for the other
  * open table format (the spec is public): `metadata/` holds
  * versioned `*.metadata.json` documents (discovered via
  * `version-hint.text` or the lexicographically-latest fallback);
  * the current snapshot names a MANIFEST LIST (an avro file of
  * `manifest_file` records); each manifest is an avro file of
  * `manifest_entry` records carrying the data-file facts. Both avro
  * layers decode through the engine's own
  * [[graft.functions.AvroRecordsJson]] kernel — no Iceberg library,
  * no library probe.
  *
  * What a 100 TB pipeline gets without opening a data file: the live
  * data-file set (paths, formats, EXACT record counts and sizes —
  * Iceberg manifests carry per-file row counts, so a table's true
  * row count is a metadata-only aggregation), snapshot lineage, and
  * format/uuid facts.
  *
  * Scale shape: metadata JSON and the manifest list are driver-read
  * (KB-sized by construction); MANIFESTS fan out as a distributed
  * `binaryFile` scan — one task per manifest, the layer that grows
  * with table size — then explode + from_json, no shuffle until the
  * caller aggregates. Entry statuses: 0=EXISTING 1=ADDED 2=DELETED;
  * live = status != 2, and v2 content != 0 (delete files) excluded.
  *
  * Manifest paths resolve as written when absolute (`scheme://` or
  * `/`-rooted), else relative to the table dir. */
object IcebergTable {

  private val snapshotSchema = StructType(Seq(
    StructField("snapshot-id", LongType),
    StructField("timestamp-ms", LongType),
    StructField("manifest-list", StringType)))

  private val metadataSchema = StructType(Seq(
    StructField("format-version", IntegerType),
    StructField("table-uuid", StringType),
    StructField("location", StringType),
    StructField("current-snapshot-id", LongType),
    StructField("snapshots", ArrayType(snapshotSchema))))

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def readSmall(spark: SparkSession, p: Path): String = {
    val in = fs(spark, p).open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** The current metadata document's path: `version-hint.text` names
    * the version; otherwise the lexicographically-latest
    * `*.metadata.json` (zero-padded versions sort correctly — the
    * spec's naming). Driver-side, one directory listing. */
  private def metadataPath(spark: SparkSession, tableDir: String): Path = {
    val metaDir = new Path(tableDir, "metadata")
    val f = fs(spark, metaDir)
    if (!f.exists(metaDir))
      throw new IllegalArgumentException(
        s"not an Iceberg table: no metadata dir under $tableDir")
    val hint = new Path(metaDir, "version-hint.text")
    if (f.exists(hint)) {
      val v = readSmall(spark, hint).trim
      val cand = Seq(new Path(metaDir, s"v$v.metadata.json"),
        new Path(metaDir, s"$v.metadata.json"))
      cand.find(f.exists).getOrElse(
        throw new IllegalArgumentException(
          s"version-hint $v names no metadata file under $metaDir"))
    } else {
      val all = f.listStatus(metaDir).map(_.getPath.getName)
        .filter(_.endsWith(".metadata.json")).sorted
      if (all.isEmpty) throw new IllegalArgumentException(
        s"no *.metadata.json under $metaDir")
      new Path(metaDir, all.last)
    }
  }

  private def resolve(tableDir: String, p: String): String =
    if (p.contains("://") || p.startsWith("/")) p
    else new Path(tableDir, p).toString

  /** One row of table facts straight from the metadata document. */
  def metadata(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.option("multiLine", "true").schema(metadataSchema)
      .json(metadataPath(spark, tableDir).toString)

  /** The current snapshot's manifest-list rows. */
  def manifests(spark: SparkSession, tableDir: String): DataFrame = {
    val meta = metadata(spark, tableDir)
      .select(col("`current-snapshot-id`").as("cur"),
        explode(col("snapshots")).as("s"))
      .filter(col("s.`snapshot-id`") === col("cur"))
      .select(col("s.`manifest-list`").as("ml"))
      .collect()
    if (meta.isEmpty)
      throw new IllegalArgumentException("no current snapshot")
    val mlPath = resolve(tableDir, meta(0).getString(0))
    spark.read.format("binaryFile").load(mlPath)
      .select(explode(graft.functions.AvroRecordsJson(col("content")))
        .as("j"))
      .select(from_json(col("j"), StructType.fromDDL(
        "manifest_path STRING, manifest_length BIGINT, " +
          "partition_spec_id INT, added_snapshot_id BIGINT")).as("m"))
      .select(col("m.manifest_path"), col("m.manifest_length"),
        col("m.partition_spec_id"), col("m.added_snapshot_id"))
  }

  /** The LIVE data-file set of the current snapshot: `(file_path,
    * file_format, record_count, file_size_in_bytes)` — status 2
    * (deleted) entries and v2 delete files (content != 0) excluded.
    * The manifest layer is a distributed binaryFile scan. */
  def snapshot(spark: SparkSession, tableDir: String): DataFrame = {
    // manifest COUNT is log-sized: collecting the paths is bounded
    val paths = manifests(spark, tableDir)
      .select("manifest_path").collect()
      .map(r => resolve(tableDir, r.getString(0)))
    if (paths.isEmpty)
      throw new IllegalArgumentException("snapshot has no manifests")
    spark.read.format("binaryFile").load(paths: _*)
      .select(explode(graft.functions.AvroRecordsJson(col("content")))
        .as("j"))
      .select(from_json(col("j"), StructType.fromDDL(
        "status INT, snapshot_id BIGINT, data_file STRUCT<" +
          "content: INT, file_path: STRING, file_format: STRING, " +
          "record_count: BIGINT, file_size_in_bytes: BIGINT>")).as("e"))
      .filter(col("e.status") =!= 2 &&
        coalesce(col("e.data_file.content"), lit(0)) === 0)
      .select(col("e.data_file.file_path").as("file_path"),
        col("e.data_file.file_format").as("file_format"),
        col("e.data_file.record_count").as("record_count"),
        col("e.data_file.file_size_in_bytes").as("file_size_in_bytes"))
  }

  /** The current snapshot's v2 DELETE files — [[DeltaLog]]'s
    * deletion-vector columns, Iceberg-shaped: one row per live delete
    * file with `content_kind` (`position` = content 1, `equality` =
    * content 2) and its record count, so data-file row counts from
    * [[snapshot]] read as honest UPPER BOUNDS on a merge-on-read
    * table. Same manifest walk (delete manifests are ordinary avro
    * manifests whose entries carry content != 0); the delete files
    * themselves are never opened. Empty on v1/copy-on-write tables. */
  def deleteFiles(spark: SparkSession, tableDir: String): DataFrame = {
    val paths = manifests(spark, tableDir)
      .select("manifest_path").collect()
      .map(r => resolve(tableDir, r.getString(0)))
    if (paths.isEmpty)
      throw new IllegalArgumentException("snapshot has no manifests")
    spark.read.format("binaryFile").load(paths: _*)
      .select(explode(graft.functions.AvroRecordsJson(col("content")))
        .as("j"))
      .select(from_json(col("j"), StructType.fromDDL(
        "status INT, snapshot_id BIGINT, data_file STRUCT<" +
          "content: INT, file_path: STRING, file_format: STRING, " +
          "record_count: BIGINT, file_size_in_bytes: BIGINT>")).as("e"))
      .filter(col("e.status") =!= 2 &&
        coalesce(col("e.data_file.content"), lit(0)) =!= 0)
      .select(col("e.data_file.file_path").as("file_path"),
        when(col("e.data_file.content") === 1, "position")
          .when(col("e.data_file.content") === 2, "equality")
          .otherwise(concat(lit("content_"),
            col("e.data_file.content").cast("string")))
          .as("content_kind"),
        col("e.data_file.file_format").as("file_format"),
        col("e.data_file.record_count").as("record_count"),
        col("e.data_file.file_size_in_bytes").as("file_size_in_bytes"))
  }

  /** One-row census: format/uuid/snapshot facts + the live file
    * count, byte total and EXACT row total (a metadata-only number —
    * Iceberg manifests carry per-file record counts), plus the
    * DELETE-file census (`n_delete_files`, `delete_records`) that
    * marks `total_records` as an upper bound on merge-on-read
    * tables — the honesty columns [[DeltaLog.snapshot]]'s
    * `has_dv`/`dv_cardinality` give the Delta side. */
  def tableMeta(spark: SparkSession, tableDir: String): DataFrame = {
    val m = metadata(spark, tableDir)
      .select(col("`format-version`").as("format_version"),
        col("`table-uuid`").as("table_uuid"),
        col("`current-snapshot-id`").as("current_snapshot_id"),
        size(col("snapshots")).as("n_snapshots"))
    val live = snapshot(spark, tableDir)
      .agg(count(lit(1)).as("n_files"),
        coalesce(sum(col("file_size_in_bytes")), lit(0L)).as("total_bytes"),
        coalesce(sum(col("record_count")), lit(0L)).as("total_records"))
    val dels = deleteFiles(spark, tableDir)
      .agg(count(lit(1)).as("n_delete_files"),
        coalesce(sum(col("record_count")), lit(0L)).as("delete_records"))
    m.crossJoin(live).crossJoin(dels)
  }

  /** Structured-streaming tail of the METADATA LOG — [[DeltaLog]]'s
    * `commitStream` sibling for the Iceberg layout: every
    * metadata-JSON document written after the stream starts
    * arrives as a micro-batch row carrying the snapshot facts
    * plus a `version` parsed from the file name (both public naming
    * shapes: `v<N>.metadata.json` and the `<NNNNN>-<uuid>` form).
    * The commit census for a table-growth monitor:
    * `metadataStream(...).select($"version",
    * $"`current-snapshot-id`")` is the stream of snapshot flips.
    * Explicit schema (never inference); work per trigger is
    * proportional to NEW metadata documents only — the file source's
    * own checkpointing makes the tail exactly-once. */
  def metadataStream(spark: SparkSession, tableDir: String): DataFrame = {
    val metaDir = new Path(tableDir, "metadata")
    if (!fs(spark, metaDir).exists(metaDir))
      throw new IllegalArgumentException(
        s"not an Iceberg table: no metadata dir under $tableDir")
    spark.readStream.option("multiLine", "true").schema(metadataSchema)
      .json(new Path(metaDir, "*.metadata.json").toString)
      .withColumn("version",
        regexp_extract(input_file_name(),
          "v?0*([0-9]+)[^/]*\\.metadata\\.json$", 1).cast("long"))
  }
}
