package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Delta-Lake transaction-log census — the lake-discovery tier for
  * the most common open table format layered over parquet (the log
  * protocol is public: `_delta_log/` holds zero-padded
  * `<version>.json` commit files of newline-delimited actions, plus
  * periodic `<version>.checkpoint.parquet` files collapsing
  * everything up to that version, advertised by `_last_checkpoint`).
  * Classic single-file, multi-part
  * (`<v>.checkpoint.<part>.<numParts>.parquet`, the `parts` field of
  * `_last_checkpoint`) AND v2 UUID-named
  * (`<v>.checkpoint.<uuid>.parquet`) checkpoints are read — a v2
  * top-level's `sidecar` actions name the `_sidecars/` parquet files
  * holding the file actions, and both tiers replay together (a
  * driver-side collect of the sidecar NAMES only — log-proportional,
  * like the listing itself). Genuinely unsupported shapes keep
  * explicit refusals: a JSON-named v2 top-level, or named sidecar
  * files that do not exist.
  *
  * What this gives a 100 TB pipeline WITHOUT opening a single data
  * file: the live-file set (the table's true size and partition
  * census — parquet paths listed under the table dir can include
  * gigabytes of tombstoned files a naive `spark.read.parquet` of the
  * directory would wrongly include), schema/partition-column
  * discovery, and table-growth auditing per commit.
  *
  * Scale shape: work is proportional to the LOG, never the data —
  * the checkpoint parquet is a normal distributed scan, the JSON
  * tail reads with an EXPLICIT action schema (no inference pass),
  * and the replay is one shuffle keyed by file path (the log's
  * cardinality, i.e. file count — millions at most). Checkpointed
  * logs skip every commit file at or before the checkpoint version.
  *
  * Replay rule: per path, the action with the highest version wins;
  * an add and remove of the same path in the SAME version resolves
  * to the add (a rewriting commit re-adds the path it removes).
  */
object DeltaLog {

  /** The action fields the census reads (a strict subset of the
    * public protocol's action schema — unknown fields ignored). */
  val actionSchema: StructType = StructType(Seq(
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      // Delta 3.x deletion vectors: without these columns a DV table's
      // census would silently report soft-deleted rows as live size
      StructField("deletionVector", StructType(Seq(
        StructField("storageType", StringType),
        StructField("pathOrInlineDv", StringType),
        StructField("offset", IntegerType),
        StructField("sizeInBytes", IntegerType),
        StructField("cardinality", LongType))))))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("deletionTimestamp", LongType),
      StructField("dataChange", BooleanType)))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))),
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType))))))

  private final case class LogFiles(jsons: Seq[String],
                                    checkpoint: Option[(Seq[String], Long)],
                                    sidecars: Seq[String])

  /** List the log: the `_last_checkpoint` pointer (if any) plus every
    * commit json AFTER the checkpoint version. Driver-side listing of
    * ONE directory — bounded by log retention, not table size. */
  private def listLog(spark: SparkSession, tableDir: String): LogFiles = {
    val logDir = new Path(tableDir, "_delta_log")
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(logDir))
      throw new IllegalArgumentException(
        s"not a Delta table: no _delta_log under $tableDir")
    val ckptPointer: Option[(Long, Option[Int])] = {
      val lc = new Path(logDir, "_last_checkpoint")
      if (!fs.exists(lc)) None
      else {
        val in = fs.open(lc)
        val txt = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
        """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(txt).map { m =>
          val parts = """"parts"\s*:\s*(\d+)""".r
            .findFirstMatchIn(txt).map(_.group(1).toInt)
          (m.group(1).toLong, parts)
        }
      }
    }
    val names = fs.listStatus(logDir).map(_.getPath.getName)
    val jsonV = names.flatMap { n =>
      if (n.length == 25 && n.endsWith(".json") &&
        n.take(20).forall(_.isDigit)) Some(n.take(20).toLong) else None
    }.sorted
    // Resolve the checkpoint pointer to concrete parquet files:
    //   classic    <v>.checkpoint.parquet                      (1 file)
    //   multi-part <v>.checkpoint.<part>.<numParts>.parquet    (P files)
    //   v2         <v>.checkpoint.<uuid>.parquet + its sidecar
    //              actions' files under _sidecars/ (the top-level
    //              carries the non-file actions and the pointers;
    //              sidecar NAMES are collected driver-side —
    //              log-proportional, like this listing)
    //   A JSON-named v2 top-level and missing sidecars refuse with
    //   explicit errors — silently dropping file actions would
    //   corrupt the census.
    val resolved = ckptPointer.map { case (v, partsOpt) =>
      partsOpt match {
        case Some(p) =>
          val files = (1 to p).map(i =>
            new Path(logDir, f"$v%020d.checkpoint.$i%010d.$p%010d.parquet"))
          val missing = files.filterNot(fs.exists)
          if (missing.nonEmpty) throw new IllegalArgumentException(
            s"multi-part checkpoint v$v is missing ${missing.size} of $p " +
              s"parts under $logDir (first missing: ${missing.head.getName})")
          ((files.map(_.toString), v), Seq.empty[String])
        case None =>
          val classic = new Path(logDir, f"$v%020d.checkpoint.parquet")
          if (fs.exists(classic)) ((Seq(classic.toString), v), Seq.empty[String])
          else {
            val prefix = f"$v%020d.checkpoint."
            val uuidParquet = names.filter(n => n.startsWith(prefix) &&
              n.endsWith(".parquet") && n.count(_ == '.') == 3).sorted
            if (uuidParquet.nonEmpty) {
              val top = new Path(logDir, uuidParquet.head).toString
              val topDf = spark.read.parquet(top)
              val sidecars =
                if (!topDf.columns.contains("sidecar")) Seq.empty[String]
                else topDf.select(col("sidecar.path"))
                  .where(col("sidecar.path").isNotNull)
                  .collect().map(_.getString(0)).toSeq.map { sp =>
                    if (sp.contains("://") || sp.startsWith("/")) sp
                    else new Path(new Path(logDir, "_sidecars"), sp).toString
                  }
              val missing = sidecars.filterNot(sp => fs.exists(new Path(sp)))
              if (missing.nonEmpty) throw new IllegalArgumentException(
                s"v2 checkpoint v$v names ${missing.size} sidecar file(s) " +
                  s"that do not exist under $logDir/_sidecars " +
                  s"(first missing: ${missing.head})")
              ((Seq(top), v), sidecars)
            } else {
              val candidates = names.filter(n =>
                n.startsWith(prefix) && n.endsWith(".json"))
              if (candidates.nonEmpty) throw new IllegalArgumentException(
                s"unsupported checkpoint layout for v$v under $logDir: " +
                  s"found ${candidates.sorted.mkString(", ")} — JSON-named " +
                  "v2 top-level checkpoints are not supported by this reader")
              else throw new IllegalArgumentException(
                s"_last_checkpoint points at v$v but ${classic.getName} " +
                  s"does not exist under $logDir")
            }
          }
      }
    }
    val ckpt = resolved.map(_._1)
    val tail = jsonV.filter(v => ckpt.forall(v > _._2))
    LogFiles(tail.map(v => new Path(logDir, f"$v%020d.json").toString).toSeq,
      ckpt, resolved.map(_._2).getOrElse(Nil))
  }

  /** Every action in the current log window, with its `version`:
    * checkpoint rows carry the checkpoint version (their collapsed
    * origin versions are gone by design — replay order among them is
    * already resolved), json rows their commit version. */
  def actions(spark: SparkSession, tableDir: String): DataFrame = {
    val log = listLog(spark, tableDir)
    val fromJson = if (log.jsons.isEmpty) None
    else Some(spark.read.schema(actionSchema).json(log.jsons: _*)
      .withColumn("version",
        regexp_extract(input_file_name(), "(\\d+)\\.json$", 1)
          .cast("long")))
    // conform the checkpoint to the census's action schema field by
    // field: real checkpoints carry extra columns (stats, tags,
    // commitInfo, a v2 top-level's sidecar/checkpointMetadata) and
    // may lack others — absent actions/fields read as null, never a
    // failed struct cast
    def conform(ck: DataFrame): DataFrame = {
      // struct fields conform RECURSIVELY BY NAME (a positional
      // struct cast would scramble e.g. a checkpoint deletionVector
      // struct carrying extra or reordered fields)
      def conformField(src: Column, srcType: DataType,
                       want: DataType): Column = (srcType, want) match {
        case (s: StructType, w: StructType) =>
          when(src.isNotNull, struct(w.fields.map { f =>
            (if (s.fieldNames.contains(f.name))
              conformField(src.getField(f.name), s(f.name).dataType,
                f.dataType)
            else lit(null).cast(f.dataType)).as(f.name)
          }: _*))
        case _ => src.cast(want)
      }
      val cols = actionSchema.fields.map { af =>
        if (!ck.columns.contains(af.name))
          lit(null).cast(af.dataType).as(af.name)
        else
          conformField(col(af.name), ck.schema(af.name).dataType,
            af.dataType).as(af.name)
      }
      ck.select(cols: _*)
    }
    val fromCkpt = log.checkpoint.map { case (paths, v) =>
      val top = conform(spark.read.parquet(paths: _*))
        .withColumn("version", lit(v))
      // v2 sidecars hold the file actions — same conform, same
      // checkpoint version, read as one distributed parquet scan
      if (log.sidecars.isEmpty) top
      else top.unionByName(conform(spark.read.parquet(log.sidecars: _*))
        .withColumn("version", lit(v)))
    }
    (fromJson, fromCkpt) match {
      case (Some(j), Some(c)) => c.unionByName(j)
      case (Some(j), None) => j
      case (None, Some(c)) => c
      case (None, None) => throw new IllegalArgumentException(
        s"empty _delta_log under $tableDir")
    }
  }

  /** The LIVE file set: one row per data file in the current table
    * version — `(path, size, modification_time, partition_values,
    * added_version, has_dv, dv_cardinality)`. The deletion-vector
    * columns keep the census HONEST on Delta 3.x tables: a file with
    * `has_dv` carries `dv_cardinality` soft-deleted rows, so file
    * sizes and row counts derived from it are upper bounds (the DV
    * bitmap itself is not decoded — no data file is opened). One
    * shuffle keyed by path. */
  def snapshot(spark: SparkSession, tableDir: String): DataFrame = {
    val acts = actions(spark, tableDir)
      .filter(col("add").isNotNull || col("remove").isNotNull)
      .select(coalesce(col("add.path"), col("remove.path")).as("path"),
        col("add").isNotNull.as("is_add"),
        col("add.size").as("size"),
        col("add.modificationTime").as("modification_time"),
        col("add.partitionValues").as("partition_values"),
        col("add.deletionVector").as("__dv"),
        col("version"))
    val w = Window.partitionBy("path")
      .orderBy(col("version").desc, col("is_add").desc)
    acts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("is_add"))
      .select(col("path"), col("size"), col("modification_time"),
        col("partition_values"), col("version").as("added_version"),
        col("__dv").isNotNull.as("has_dv"),
        col("__dv.cardinality").as("dv_cardinality"))
  }

  /** Table-level facts: latest metaData + protocol + version + live
    * census (file count, total bytes). One row. */
  def tableMeta(spark: SparkSession, tableDir: String): DataFrame = {
    val acts = actions(spark, tableDir)
    val meta = acts.filter(col("metaData").isNotNull)
      .orderBy(col("version").desc).limit(1)
      .select(col("metaData.id").as("table_id"),
        col("metaData.name").as("name"),
        col("metaData.schemaString").as("schema_string"),
        col("metaData.partitionColumns").as("partition_columns"))
    val proto = acts.filter(col("protocol").isNotNull)
      .orderBy(col("version").desc).limit(1)
      .select(col("protocol.minReaderVersion").as("min_reader_version"),
        col("protocol.minWriterVersion").as("min_writer_version"))
    val vers = acts.agg(max(col("version")).as("version"))
    val live = snapshot(spark, tableDir)
      .agg(count(lit(1)).as("n_files"),
        coalesce(sum(col("size")), lit(0L)).as("total_bytes"))
    meta.crossJoin(proto).crossJoin(vers).crossJoin(live)
  }

  /** STREAMING commit tail — the live counterpart of [[history]]: a
    * Structured Streaming file source over the `_delta_log` JSON
    * glob, so every commit another writer lands becomes a micro-batch of its
    * actions (with `version` from the file name). The natural feed
    * for a table-growth monitor or an incremental-ingest trigger:
    * `commitStream(...).filter($"add".isNotNull)` is the stream of
    * newly added files. Explicit action schema (never inference),
    * work per trigger proportional to NEW commits only — the file
    * source's own checkpointing makes the tail exactly-once. */
  def commitStream(spark: SparkSession, tableDir: String): DataFrame = {
    val logDir = new Path(tableDir, "_delta_log")
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(logDir))
      throw new IllegalArgumentException(
        s"not a Delta table: no _delta_log under $tableDir")
    spark.readStream.schema(actionSchema)
      .json(new Path(logDir, "*.json").toString)
      .withColumn("version",
        regexp_extract(input_file_name(), "(\\d+)\\.json$", 1)
          .cast("long"))
  }

  /** Per-commit growth audit off the json tail: files/bytes added and
    * removed at each version (checkpointed history collapses into the
    * checkpoint version's row). */
  def history(spark: SparkSession, tableDir: String): DataFrame =
    actions(spark, tableDir)
      .groupBy(col("version"))
      .agg(
        count(col("add.path")).as("n_added"),
        coalesce(sum(col("add.size")), lit(0L)).as("bytes_added"),
        count(col("remove.path")).as("n_removed"))
      .orderBy("version")
}
