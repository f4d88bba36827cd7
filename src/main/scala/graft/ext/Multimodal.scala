package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.11): media travel as opaque
  * `binary` payloads next to a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as batched
  * per-partition transformations.
  *
  * The actual codec step is STUBBED — no image/audio libraries exist in
  * this environment — with a deterministic fake (byte-histogram
  * "features", stride "frame sampling"). Everything Spark-side is real
  * and tested: the schema, the binary column handling, the
  * mapPartitions batching, and the partition-parallel execution shape
  * that a Pandas-UDF/mapInPandas pipeline would use on a cluster.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType))))))

  /** Build a media frame from the documents fixture: payload = UTF-8
    * bytes of the text (deterministic fake media), metadata derived
    * from doc fields. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("image").as("kind"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit(16000).as("sample_rate")).as("meta"))

  /** STUB decode + feature extraction: a real pipeline would decode the
    * payload (JPEG/WAV/...) here; the stub computes a 16-bin byte
    * histogram, normalized — deterministic, so tests can assert on it.
    * Runs per-partition over iterator batches (the mapInPandas shape)
    * as a typed Dataset transform — rows stay in Tungsten encoding,
    * nothing is collected to the driver. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val hist = new Array[Double](16)
          if (payload != null) payload.foreach(b => hist((b & 0xff) % 16) += 1.0)
          val n = if (payload == null) 0L else payload.length.toLong
          val norm = if (n > 0) hist.map(_ / n) else hist
          (id, n, norm)
        }
      }
      .toDF("media_id", "n_bytes", "features")
  }

  /** STUB frame sampling: a real pipeline would decode and select video
    * frames; the stub takes every `stride`-th byte — same partitioning
    * and batch shape. */
  def frameSample(media: DataFrame, stride: Int): DataFrame = {
    val sampled = udf { payload: Array[Byte] =>
      if (payload == null) Array.empty[Byte]
      else payload.grouped(stride).map(_.head).toArray
    }
    media.withColumn("sampled", sampled(col("payload")))
      .withColumn("n_sampled", length(col("sampled")).cast("long"))
  }

  /** Resize metadata (the pure-metadata half of a resize op; payload
    * transcoding is the stubbed codec step). */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(col("meta.kind"), lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate")))
}
