package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  // ---- container-header parsing: REAL (not stubbed) ----------------
  // The codec step needs libraries, but the container headers are
  // plain byte arithmetic — parsed with builtin (codegen'd) binary
  // slicing + hex conversion, narrow per-row, no UDF.

  /** Big-endian unsigned int from `len` bytes of a binary column at
    * 1-based `pos` — substring on binary yields a binary slice, whose
    * hex digits convert exactly. */
  private def beUint(bin: Column, pos: Int, len: Int): Column =
    conv(hex(substring(bin, pos, len)), 16, 10).cast("long")

  /** Little-endian unsigned int: byte-reverse via per-byte slices. */
  private def leUint(bin: Column, pos: Int, len: Int): Column =
    (0 until len).map(i => beUint(bin, pos + i, 1) * (1L << (8 * i)))
      .reduce(_ + _)

  /** Parse PNG IHDR metadata straight from payload bytes: signature
    * check (`\x89PNG\r\n\x1a\n`), then width/height/bit-depth/color-type
    * from the IHDR chunk at fixed offsets (PNG spec §5.2, §11.2.2 —
    * IHDR is always first: a well-formed stream has the 13-byte IHDR
    * length then the 'IHDR' tag at bytes 13-16, both checked so a
    * signature-matching but truncated/malformed payload yields a null
    * struct instead of garbage fields). Non-PNG payloads yield nulls,
    * so a mixed 100 TB media lake can be scanned with one narrow
    * projection and filtered by `png_width IS NOT NULL`. */
  def pngMeta(payload: Column): Column = {
    val isPng = hex(substring(payload, 1, 8)) === lit("89504E470D0A1A0A") &&
      hex(substring(payload, 9, 8)) === lit("0000000D49484452")
    val meta = struct(
      beUint(payload, 17, 4).cast("int").as("width"),
      beUint(payload, 21, 4).cast("int").as("height"),
      beUint(payload, 25, 1).cast("int").as("bit_depth"),
      beUint(payload, 26, 1).cast("int").as("color_type"))
    when(isPng, meta)
  }

  /** Parse WAV/RIFF fmt metadata from payload bytes: `RIFF....WAVE`
    * signature, then the canonical fmt chunk at offset 13 (audio
    * format, channels, sample rate, bits per sample — all
    * little-endian per the RIFF spec). Non-WAV payloads yield nulls. */
  def wavMeta(payload: Column): Column = {
    val isWav = hex(substring(payload, 1, 4)) === lit("52494646") &&
      hex(substring(payload, 9, 8)) === lit("57415645666D7420")
    val meta = struct(
      leUint(payload, 21, 2).cast("int").as("audio_format"),
      leUint(payload, 23, 2).cast("int").as("channels"),
      leUint(payload, 25, 4).cast("int").as("sample_rate"),
      leUint(payload, 35, 2).cast("int").as("bits_per_sample"))
    when(isWav, meta)
  }

  /** Byte at COLUMN position `pos` (1-based) as an unsigned long;
    * null past the end of the payload. */
  private def byteAt(bin: Column, pos: Column): Column =
    when(length(bin.substr(pos, lit(1))) === 1,
      conv(hex(bin.substr(pos, lit(1))), 16, 10).cast("long"))

  /** Big-endian unsigned int of `len` bytes at COLUMN position `pos`;
    * null when the payload is shorter. */
  private def beUintAt(bin: Column, pos: Column, len: Int): Column =
    when(length(bin.substr(pos, lit(len))) === len,
      conv(hex(bin.substr(pos, lit(len))), 16, 10).cast("long"))

  /** JFIF/JPEG SOF markers carrying frame dimensions (every SOFn
    * except the non-frame C4/C8/CC). */
  private val JpegSofMarkers: Seq[Long] =
    Seq(0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF).map(_.toLong)

  /** Parse JPEG frame metadata (width, height, precision,
    * n_components) from the SOFn segment. Unlike PNG's fixed-offset
    * IHDR, JPEG puts the frame header after a VARIABLE number of
    * variable-length segments (APPn/EXIF blobs, comments,
    * quantization tables), so this is a genuine marker-segment scan:
    * a bounded fold (`maxSegments` steps, default 32 — real files
    * carry a few dozen pre-SOF segments at most) walks
    * `pos → pos + 2 + len` through the segment chain entirely in
    * codegen-friendly binary slicing (`substr`/`hex`/`conv` — no
    * UDF, narrow, zero shuffles). Malformed chains (no 0xFF where a
    * marker must start, entropy data / EOI before any SOF, truncated
    * lengths) and non-JPEG payloads yield a null struct, so a mixed
    * 100 TB media lake scans with one projection and filters by
    * `jpeg.width IS NOT NULL`. */
  def jpegMeta(payload: Column, maxSegments: Int = 32): Column = {
    val isJpeg = hex(substring(payload, 1, 2)) === lit("FFD8")
    def st(pos: Column, w: Column, h: Column, prec: Column, nc: Column,
           found: Column, dead: Column): Column =
      struct(pos.as("pos"), w.as("w"), h.as("h"), prec.as("prec"),
        nc.as("nc"), found.as("found"), dead.as("dead"))
    val zero = lit(0L)
    val init = st(lit(3L), zero, zero, zero, zero, lit(false), lit(false))
    val state = aggregate(sequence(lit(1), lit(maxSegments)), init, (acc, _) => {
      val pos = acc.getField("pos")
      val keep = st(pos, acc.getField("w"), acc.getField("h"),
        acc.getField("prec"), acc.getField("nc"),
        acc.getField("found"), acc.getField("dead"))
      val deadSt = st(pos, zero, zero, zero, zero, lit(false), lit(true))
      val ff = byteAt(payload, pos)
      val m = byteAt(payload, pos + 1)
      val segLen = beUintAt(payload, pos + 2, 2)
      val w = beUintAt(payload, pos + 7, 2)
      val h = beUintAt(payload, pos + 5, 2)
      val prec = byteAt(payload, pos + 4)
      val nc = byteAt(payload, pos + 9)
      val sof = st(pos, w, h, prec, nc, lit(true), lit(false))
      when(acc.getField("found") || acc.getField("dead"), keep)
        // a marker must start here; entropy data (SOS), EOI, or
        // length-less restart markers before any SOF = no frame header
        .when(ff.isNull || ff =!= 255L || m.isNull ||
          m === 217L || m === 218L || (m >= 208L && m <= 215L), deadSt)
        .when(m.isin(JpegSofMarkers: _*),
          when(w.isNull || h.isNull || prec.isNull || nc.isNull, deadSt)
            .otherwise(sof))
        .when(segLen.isNull, deadSt)
        .otherwise(st(pos + 2 + segLen, zero, zero, zero, zero,
          lit(false), lit(false)))
    })
    when(isJpeg && state.getField("found"),
      struct(state.getField("w").cast("int").as("width"),
        state.getField("h").cast("int").as("height"),
        state.getField("prec").cast("int").as("precision"),
        state.getField("nc").cast("int").as("n_components")))
  }

  /** Scan a media frame, attaching parsed container metadata columns —
    * the real half of "decode": header fields come from the bytes
    * themselves, only pixel/sample decoding remains stubbed. */
  def containerMeta(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      pngMeta(col("payload")).as("png"),
      wavMeta(col("payload")).as("wav"),
      jpegMeta(col("payload")).as("jpeg"))
}
