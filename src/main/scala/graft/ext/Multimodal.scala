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

  /** Parse GIF header metadata: `GIF87a`/`GIF89a` signature, then
    * the logical-screen width/height (little-endian u16 at fixed
    * offsets 7/9 — GIF89a spec §18). Non-GIF payloads yield nulls. */
  def gifMeta(payload: Column): Column = {
    val sig = hex(substring(payload, 1, 6))
    val isGif = sig === lit("474946383761") || sig === lit("474946383961")
    when(isGif, struct(
      leUint(payload, 7, 2).cast("int").as("width"),
      leUint(payload, 9, 2).cast("int").as("height"),
      when(sig === lit("474946383761"), "87a").otherwise("89a").as("version")))
  }

  /** ICO/CUR favicon census — one row per contained image
    * (width/height with the 256 zero-byte rule, bit depth, byte
    * size, embedded-PNG flag) via [[graft.functions.IcoEntries]];
    * corrupt payloads contribute no rows. The brand-asset dedup /
    * best-resolution-pick input; pixels never decode. */
  def icoEntries(docs: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload",
                 maxEntries: Int = 256): DataFrame =
    docs.select(col(idCol),
        posexplode(graft.functions.IcoEntries(col(payloadCol), maxEntries))
          .as(Seq("entry_idx", "__e")))
      .select(col(idCol), col("entry_idx").cast("long").as("entry_idx"),
        col("__e.width").as("width"), col("__e.height").as("height"),
        col("__e.bpp").as("bpp"), col("__e.size").as("size"),
        col("__e.is_png").as("is_png"))

  /** GIF animation census — frame count, summed GCE delays and the
    * NETSCAPE2.0 loop count off one bounded block walk (image data
    * skipped by sub-block lengths, never decoded) via the native
    * [[graft.functions.GifFrames]] kernel: the animated-vs-static
    * split and duration facts a media pipeline routes on. Null for
    * non-GIF or truncated payloads. */
  def gifFrames(payload: Column): Column =
    graft.functions.GifFrames(payload)

  /** WebP animation census — [[gifFrames]]' sibling for the other
    * animated web format via the native
    * [[graft.functions.WebpFrames]] RIFF chunk walk: ANMF frame
    * count, summed millisecond durations and the ANIM loop count
    * (static VP8/VP8L/VP8X files report one frame, loop -1). Frame
    * pixels never decode — VP8 entropy coding is a genuine codec;
    * this is the animated-vs-static router. Null for non-WebP or
    * truncated payloads. */
  def webpFrames(payload: Column): Column =
    graft.functions.WebpFrames(payload)

  /** Parse WebP dimensions from the first chunk after `RIFF....WEBP`:
    * the extended `VP8X` header (24-bit LE canvas minus-one), the
    * lossy `VP8 ` frame header (9D 01 2A start code, 14-bit LE
    * dims), or the lossless `VP8L` stream (0x2F signature, width-1
    * in bits 0-13 and height-1 in bits 14-27 of the LE u32) — the
    * three on-disk variants of the format. Anything else (or a
    * malformed variant body) yields a null struct. */
  def webpMeta(payload: Column): Column = {
    val isWebp = hex(substring(payload, 1, 4)) === lit("52494646") &&
      hex(substring(payload, 9, 4)) === lit("57454250")
    val cc = hex(substring(payload, 13, 4))
    val vp8x = struct(
      (leUint(payload, 25, 3) + 1L).cast("int").as("width"),
      (leUint(payload, 28, 3) + 1L).cast("int").as("height"),
      lit("vp8x").as("variant"))
    val vp8 = struct(
      leUint(payload, 27, 2).bitwiseAND(0x3FFFL).cast("int").as("width"),
      leUint(payload, 29, 2).bitwiseAND(0x3FFFL).cast("int").as("height"),
      lit("vp8").as("variant"))
    val v = leUint(payload, 22, 4)
    val vp8l = struct(
      (v.bitwiseAND(0x3FFFL) + 1L).cast("int").as("width"),
      (shiftright(v, 14).bitwiseAND(0x3FFFL) + 1L).cast("int").as("height"),
      lit("vp8l").as("variant"))
    when(isWebp,
      when(cc === lit("56503858"), vp8x)
        .when(cc === lit("56503820") &&
          hex(substring(payload, 24, 3)) === lit("9D012A"), vp8)
        .when(cc === lit("5650384C") &&
          hex(substring(payload, 21, 1)) === lit("2F"), vp8l))
  }

  /** Parse TIFF dimensions by walking the first IFD: `II*\0` / `MM\0*`
    * byte-order mark, IFD offset from the header, then the entry table
    * scanned for ImageWidth (256) and ImageLength (257) with
    * endian-correct SHORT/LONG value reads (TIFF 6.0 §2). The entry
    * scan is a bounded `transform` over at most `maxEntries`
    * independent 12-byte records — no sequential fold needed, entries
    * are position-addressed. Truncated tables and non-TIFF payloads
    * yield a null struct. */
  def tiffMeta(payload: Column, maxEntries: Int = 16): Column = {
    val h4 = hex(substring(payload, 1, 4))
    val isLe = h4 === lit("49492A00")
    val isBe = h4 === lit("4D4D002A")
    def u16at(pos: Column): Column =
      when(isLe, byteAt(payload, pos) + byteAt(payload, pos + 1) * 256L)
        .otherwise(byteAt(payload, pos) * 256L + byteAt(payload, pos + 1))
    def u32at(pos: Column): Column =
      when(isLe,
        byteAt(payload, pos) + byteAt(payload, pos + 1) * 256L +
          byteAt(payload, pos + 2) * 65536L + byteAt(payload, pos + 3) * 16777216L)
        .otherwise(beUintAt(payload, pos, 4))
    val ifd = u32at(lit(5L)) + 1L // 1-based position of the entry count
    val n = u16at(ifd)
    val entries = transform(
      sequence(lit(0L), least(n, lit(maxEntries.toLong)) - 1L),
      e => {
        val base = ifd + 2L + e * 12L
        struct(u16at(base).as("tag"),
          when(u16at(base + 2L) === 3L, u16at(base + 8L))
            .otherwise(u32at(base + 8L)).as("v"))
      })
    def tagVal(t: Long): Column =
      get(filter(entries, x => x.getField("tag") === t), lit(0)).getField("v")
    when((isLe || isBe) && n >= 1L, struct(
      tagVal(256L).cast("int").as("width"),
      tagVal(257L).cast("int").as("height"),
      when(isLe, "II").otherwise("MM").as("byte_order")))
  }

  /** Parse MP4/ISO-BMFF container metadata without any codec: brand
    * from the leading `ftyp` box, movie timescale + duration from
    * `moov`/`mvhd` (version 0 and 1 layouts), and the first track's
    * pixel dimensions from `trak`/`tkhd` (the 16.16 fixed-point
    * width/height, integer part). ISO/IEC 14496-12 §4.3, §8.2.2,
    * §8.3.2. The box tree is walked by ONE bounded pre-order fold
    * (`maxBoxes` steps) that skips leaf boxes by their size (so the
    * typically-huge `mdat` costs one step) and DESCENDS into
    * `moov`/`trak` (pos → pos + 8), recording where the first `mvhd`
    * and `tkhd` sit — a single fold, not nested per-child scans,
    * because every nested fold would embed its parent's whole
    * expression tree at each reference and the plan balloons
    * (16.8 MiB task binaries measured with the nested form). Same
    * pos→pos+len binary-slicing class as the JPEG marker scan:
    * narrow, zero shuffles, no decoding. Non-MP4 payloads (no
    * leading `ftyp`) yield a null struct; truncated/malformed box
    * chains and unknown mvhd/tkhd versions yield null fields (size 0
    * "to end of file" and size 1 "64-bit largesize" stop the walk —
    * both below the 8-byte minimal header). */
  def mp4Meta(payload: Column, maxBoxes: Int = 24): Column = {
    val isMp4 = hex(substring(payload, 5, 4)) === lit("66747970") &&
      beUint(payload, 1, 4) >= 16L
    val brand = substring(payload, 9, 4).cast("string")
    val end = length(payload).cast("long") + 1L
    val nul = lit(null).cast("long")
    def st(pos: Column, mvhd: Column, tkhd: Column): Column =
      struct(pos.as("pos"), mvhd.as("mvhd"), tkhd.as("tkhd"))
    val walk = aggregate(sequence(lit(1), lit(maxBoxes)),
      st(lit(1L), nul, nul), (acc, _) => {
        val pos = acc.getField("pos")
        val mh = acc.getField("mvhd")
        val th = acc.getField("tkhd")
        val sz = beUintAt(payload, pos, 4)
        val tag = hex(payload.substr(pos + 4, lit(4)))
        when(mh.isNotNull && th.isNotNull, acc)
          .when(pos + 7L > end || sz.isNull || sz < 8L, st(end + 1L, mh, th))
          .when(tag === lit("6D6F6F76") || tag === lit("7472616B"), // moov/trak
            st(pos + 8L, mh, th))
          .when(tag === lit("6D766864"), st(pos + sz, coalesce(mh, pos), th))
          .when(tag === lit("746B6864"), st(pos + sz, mh, coalesce(th, pos)))
          .otherwise(st(pos + sz, mh, th))
      })
    val mvhd = walk.getField("mvhd")
    val tkhd = walk.getField("tkhd")
    val mv = byteAt(payload, mvhd + 8L) // mvhd version
    val timescale = when(mv === 0L, beUintAt(payload, mvhd + 20L, 4))
      .when(mv === 1L, beUintAt(payload, mvhd + 28L, 4))
    val duration = when(mv === 0L, beUintAt(payload, mvhd + 24L, 4))
      .when(mv === 1L,
        beUintAt(payload, mvhd + 32L, 4) * 4294967296L +
          beUintAt(payload, mvhd + 36L, 4))
    val tv = byteAt(payload, tkhd + 8L) // tkhd version
    val width = when(tv === 0L, beUintAt(payload, tkhd + 84L, 2))
      .when(tv === 1L, beUintAt(payload, tkhd + 96L, 2))
    val height = when(tv === 0L, beUintAt(payload, tkhd + 88L, 2))
      .when(tv === 1L, beUintAt(payload, tkhd + 100L, 2))
    when(isMp4, struct(
      brand.as("brand"),
      timescale.as("timescale"),
      duration.as("duration"),
      width.cast("int").as("width"),
      height.cast("int").as("height")))
  }

  /** Parse HEIF/AVIF image dimensions — the `ftyp`-family containers
    * modern crawls carry for images (iPhone HEIC, AVIF): brand from
    * the leading `ftyp`, then the `ispe` (image spatial extents)
    * property from the `meta` → `iprp` → `ipco` box path
    * (ISO/IEC 23008-12 §6.5.3). Same single bounded pre-order fold
    * as [[mp4Meta]], with one twist: `meta` is a FULL box, so the
    * descent lands at +12 (version/flags) while `iprp`/`ipco`
    * descend at +8; leaf boxes between them (`hdlr`, `pitm`,
    * `iloc`, `iinf`, `pixi`, codec config…) skip by size. The first
    * `ispe` wins (the primary item's, in every real encoder's
    * layout). Non-HEIF payloads (wrong brand) yield a null struct;
    * truncated chains yield null dims. */
  def heifMeta(payload: Column, maxBoxes: Int = 24): Column = {
    val brand = substring(payload, 9, 4).cast("string")
    val isHeif = hex(substring(payload, 5, 4)) === lit("66747970") &&
      brand.isin("avif", "heic", "heix", "mif1")
    val end = length(payload).cast("long") + 1L
    val nul = lit(null).cast("long")
    def st(pos: Column, found: Column): Column =
      struct(pos.as("pos"), found.as("found"))
    val walk = aggregate(sequence(lit(1), lit(maxBoxes)),
      st(lit(1L), nul), (acc, _) => {
        val pos = acc.getField("pos")
        val f = acc.getField("found")
        val sz = beUintAt(payload, pos, 4)
        val tag = hex(payload.substr(pos + 4, lit(4)))
        when(f.isNotNull, acc)
          .when(pos + 7L > end || sz.isNull || sz < 8L, st(end + 1L, f))
          .when(tag === lit("6D657461"), st(pos + 12L, f)) // meta: full box
          .when(tag === lit("69707270") || tag === lit("6970636F"), // iprp/ipco
            st(pos + 8L, f))
          .when(tag === lit("69737065"), st(pos, pos))     // ispe
          .otherwise(st(pos + sz, f))
      })
    val ispe = walk.getField("found")
    when(isHeif, struct(
      brand.as("brand"),
      beUintAt(payload, ispe + 12L, 4).cast("int").as("width"),
      beUintAt(payload, ispe + 16L, 4).cast("int").as("height")))
  }

  /** Parse FLAC STREAMINFO metadata by exact bit slicing (flac format
    * spec): `fLaC` magic, a first metadata block of type STREAMINFO
    * (length 34 — both checked, so a bare magic with junk behind it
    * yields a null struct), then min/max block size and the packed
    * 64-bit field: sample rate (20 bits), channels-1 (3), bits per
    * sample-1 (5), total samples (36). All shifts are exact integer
    * arithmetic over single bytes — no float, fully hashable. */
  def flacMeta(payload: Column): Column = {
    val isFlac = hex(substring(payload, 1, 4)) === lit("664C6143") &&
      beUint(payload, 5, 1).bitwiseAND(127L) === 0L && // first block: STREAMINFO
      beUint(payload, 6, 3) === 34L
    def b(pos: Int): Column = beUint(payload, pos, 1)
    val sampleRate = shiftleft(b(19), 12) + shiftleft(b(20), 4) +
      shiftright(b(21), 4)
    val channels = shiftright(b(21), 1).bitwiseAND(7L) + 1L
    val bps = shiftleft(b(21).bitwiseAND(1L), 4) + shiftright(b(22), 4) + 1L
    val totalSamples = shiftleft(b(22).bitwiseAND(15L), 32) +
      shiftleft(b(23), 24) + shiftleft(b(24), 16) + shiftleft(b(25), 8) + b(26)
    when(isFlac, struct(
      beUint(payload, 9, 2).cast("int").as("min_block"),
      beUint(payload, 11, 2).cast("int").as("max_block"),
      sampleRate.cast("int").as("sample_rate"),
      channels.cast("int").as("channels"),
      bps.cast("int").as("bits_per_sample"),
      totalSamples.as("total_samples")))
  }

  /** MPEG1 Layer III bitrate table, index 1-14 (0 = free-format and
    * 15 = bad are both rejected). */
  private val Mp3Bitrates: Seq[Long] =
    Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** Parse an MP3 (MPEG1 Layer III) frame header, skipping a leading
    * ID3v2 tag when present (its synchsafe 28-bit size, 7 bits per
    * byte). Contract: only MPEG1 Layer III frames parse — the
    * crawl-dominant case — so the bitrate/samplerate tables stay
    * small; other versions/layers, free-format (bitrate index 0) and
    * bad indices yield a null struct. Fields: bitrate_kbps,
    * sample_rate, channel_mode (stereo/joint/dual/mono), has_id3.
    * Fixed offsets after the computed frame start — narrow byte
    * arithmetic, no decoding. */
  def mp3Meta(payload: Column): Column = {
    val hasId3 = substring(payload, 1, 3).cast("string") === "ID3"
    val id3Size = shiftleft(beUint(payload, 7, 1), 21) +
      shiftleft(beUint(payload, 8, 1), 14) +
      shiftleft(beUint(payload, 9, 1), 7) + beUint(payload, 10, 1)
    val start = when(hasId3, id3Size + 11L).otherwise(lit(1L))
    def b(off: Int): Column = byteAt(payload, start + off)
    val sync = b(0) === 255L && shiftright(b(1), 5) === 7L
    val isMpeg1L3 = shiftright(b(1), 3).bitwiseAND(3L) === 3L &&
      shiftright(b(1), 1).bitwiseAND(3L) === 1L
    val brIdx = shiftright(b(2), 4)
    val srIdx = shiftright(b(2), 2).bitwiseAND(3L)
    val bitrate = Mp3Bitrates.zipWithIndex.foldLeft(lit(null).cast("long")) {
      case (acc, (kbps, i)) => when(brIdx === (i + 1).toLong, lit(kbps)).otherwise(acc)
    }
    val sampleRate = when(srIdx === 0L, 44100L).when(srIdx === 1L, 48000L)
      .when(srIdx === 2L, 32000L)
    val mode = when(shiftright(b(3), 6) === 0L, "stereo")
      .when(shiftright(b(3), 6) === 1L, "joint")
      .when(shiftright(b(3), 6) === 2L, "dual")
      .otherwise("mono")
    when(sync && isMpeg1L3 && bitrate.isNotNull && sampleRate.isNotNull, struct(
      bitrate.cast("int").as("bitrate_kbps"),
      sampleRate.cast("int").as("sample_rate"),
      mode.as("channel_mode"),
      hasId3.as("has_id3")))
  }

  /** MP3 duration — exact frame counts off a Xing/Info or VBRI
    * header, CBR arithmetic otherwise, via the native
    * [[graft.functions.Mp3Duration]] kernel (ID3v2 skipped, MPEG1
    * Layer III per the [[mp3Meta]] contract). Struct
    * (frames, duration_ms, method); null when no first frame
    * parses. */
  def mp3Duration(payload: Column): Column =
    graft.functions.Mp3Duration(payload)

  /** Ogg container census — codec (vorbis/opus), channels, rate,
    * granule-clock duration and Vorbis-comment tags via the native
    * [[graft.functions.OggMeta]] kernel (every page CRC verified,
    * fail-closed null). */
  def oggMeta(payload: Column): Column =
    graft.functions.OggMeta(payload)

  /** Matroska/WebM census — DocType, timestamp scale, duration and
    * the per-track type/codec table via the native
    * [[graft.functions.WebmMeta]] EBML walk (clusters skipped by
    * size, never decoded; fail-closed null). */
  def webmMeta(payload: Column): Column =
    graft.functions.WebmMeta(payload)

  /** AVI container census — avih dimensions/frame clock and the
    * per-stream strh type/handler/rate table via the native
    * [[graft.functions.AviMeta]] RIFF walk (movi payloads skipped by
    * size; fail-closed null). Completes the video-container trio
    * with [[mp4Meta]] and [[webmMeta]]. */
  def aviMeta(payload: Column): Column =
    graft.functions.AviMeta(payload)

  /** AIFF / AIFF-C census — channels, bit depth, the 80-bit-extended
    * sample rate decoded exactly, frame count, duration and the
    * AIFF-C compression fourcc via the native
    * [[graft.functions.AiffMeta]] big-endian IFF walk (sound data
    * skipped by size; fail-closed null). Completes the audio
    * container family with the WAV, FLAC, MP3, MP4 and Ogg tiers. */
  def aiffMeta(payload: Column): Column =
    graft.functions.AiffMeta(payload)

  /** Little-endian unsigned int of `len` bytes at COLUMN position
    * `pos`; null when the payload is shorter. */
  private def leUintAt(bin: Column, pos: Column, len: Int): Column =
    when(length(bin.substr(pos, lit(len))) === len,
      (0 until len).map(i =>
        conv(hex(bin.substr(pos + i, lit(1))), 16, 10).cast("long") *
          (1L << (8 * i))).reduce(_ + _))

  /** PDF document census — the crawl-payload PDF tier without a PDF
    * library: `%PDF-x.y` version from the header, then token counts
    * over the latin1-decoded head (`decode(..., ISO-8859-1)` maps
    * every byte 1:1 to a char, so binary streams pass through the
    * regexes unharmed): `endobj` object count, `/Type /Page` page
    * count (the `[^s]` guard excludes `/Pages` tree nodes),
    * `/Encrypt` flag, `%%EOF` trailer presence. A token CENSUS, not
    * an xref-walking parser — counts can over-read tokens that occur
    * inside unfiltered content streams (documented heuristic; real
    * page extraction needs a codec and lives behind the frameSample
    * stub convention). Bounded to `headBytes`; non-PDF payloads
    * yield a null struct. */
  def pdfMeta(payload: Column, headBytes: Int = 1 << 20): Column = {
    val isPdf = hex(substring(payload, 1, 5)) === lit("255044462D")
    val txt = decode(substring(payload, 1, headBytes), "ISO-8859-1")
    val version0 = regexp_extract(txt, "^%PDF-([0-9]\\.[0-9])", 1)
    val meta = struct(
      when(version0 === "", lit(null: String)).otherwise(version0)
        .as("version"),
      size(regexp_extract_all(txt, lit("endobj"), lit(0))).cast("long")
        .as("n_objs"),
      size(regexp_extract_all(txt, lit("/Type[ ]?/Page([^s]|$)"), lit(0)))
        .cast("long").as("n_pages"),
      txt.contains("/Encrypt").as("encrypted"),
      txt.contains("%%EOF").as("has_eof"))
    when(isPdf, meta)
  }

  /** Simple-PDF text extraction — the parser [[pdfMeta]]'s census is
    * not: content streams decoded (FlateDecode via Inflater,
    * unfiltered verbatim), `BT…ET` show operators (`Tj`/`TJ`/`'`/`"`)
    * parsed with full literal-string/hex-string/octal-escape
    * handling by the native [[graft.functions.PdfTextExtract]]
    * kernel. Latin1 tier: ASCII/WinAnsi text extracts exactly,
    * CID/CMap fonts surface as raw code bytes (documented bound).
    * Output struct (text, n_streams, n_decoded) — gate on
    * `n_decoded < n_streams` for skipped/undecodable streams;
    * non-PDF payloads null. */
  def pdfText(payload: Column, maxStreams: Int = 4096,
              maxBytes: Int = 1 << 24): Column =
    graft.functions.PdfTextExtract(payload, maxStreams, maxBytes)

  /** ZIP archive walk + document-kind detection — the OOXML/epub/jar
    * tier: sequential local-file-header walk (`PK\x03\x04`:
    * `pos → pos + 30 + namelen + extralen + csize`) in ONE bounded
    * fold (`maxEntries` steps), collecting entry count, name list,
    * and total uncompressed size until the central directory
    * (`PK\x01\x02`) terminates the chain (`complete` = it was
    * reached). Entries using data descriptors (flag bit 3 — csize
    * unknown in the local header) stop the walk with
    * `complete = false` rather than guessing. `kind` classifies by
    * the well-known member names: `word/`→docx, `xl/`→xlsx,
    * `ppt/`→pptx, `META-INF/container.xml`→epub,
    * `META-INF/MANIFEST.MF`→jar, bare `[Content_Types].xml`→ooxml,
    * else zip. Non-ZIP payloads (no leading local header — including
    * empty archives, which start at the end-of-central-directory
    * record) yield a null struct. */
  def zipMeta(payload: Column, maxEntries: Int = 32): Column = {
    val isZip = hex(substring(payload, 1, 4)) === lit("504B0304")
    val end = length(payload).cast("long") + 1L
    def st(pos: Column, n: Column, names: Column, usize: Column,
           done: Column, bad: Column): Column =
      struct(pos.as("pos"), n.as("n"), names.as("names"),
        usize.as("usize"), done.as("done"), bad.as("bad"))
    val walk = aggregate(sequence(lit(1), lit(maxEntries + 1)),
      st(lit(1L), lit(0L), lit("\n"), lit(0L), lit(false), lit(false)),
      (acc, _) => {
        val pos = acc.getField("pos")
        val magic = hex(payload.substr(pos, lit(4)))
        val flags = leUintAt(payload, pos + 6L, 2)
        val csize = leUintAt(payload, pos + 18L, 4)
        val usz = leUintAt(payload, pos + 22L, 4)
        val nl = leUintAt(payload, pos + 26L, 2)
        val el = leUintAt(payload, pos + 28L, 2)
        val name = decode(payload.substr(pos + 30L, least(nl, lit(255L))),
          "ISO-8859-1")
        when(acc.getField("done") || acc.getField("bad"), acc)
          .when(magic === lit("504B0102"),
            st(pos, acc.getField("n"), acc.getField("names"),
              acc.getField("usize"), lit(true), lit(false)))
          .when(magic =!= lit("504B0304") || nl.isNull ||
            flags.bitwiseAND(8L) =!= 0L,
            st(pos, acc.getField("n"), acc.getField("names"),
              acc.getField("usize"), lit(false), lit(true)))
          .otherwise(st(pos + 30L + nl + el + csize,
            acc.getField("n") + 1L,
            concat(acc.getField("names"), name, lit("\n")),
            acc.getField("usize") + usz, lit(false), lit(false)))
      })
    val names = walk.getField("names")
    val kind = when(names.contains("\nword/"), "docx")
      .when(names.contains("\nxl/"), "xlsx")
      .when(names.contains("\nppt/"), "pptx")
      .when(names.contains("\nMETA-INF/container.xml"), "epub")
      .when(names.contains("\nMETA-INF/MANIFEST.MF"), "jar")
      .when(names.contains("\n[Content_Types].xml"), "ooxml")
      .otherwise("zip")
    val first = element_at(split(names, "\n"), 2)
    when(isZip, struct(
      walk.getField("n").as("n_entries"),
      walk.getField("done").as("complete"),
      when(first === "", lit(null: String)).otherwise(first)
        .as("first_name"),
      walk.getField("usize").as("total_usize"),
      kind.as("kind")))
  }

  /** DOCX main-document text — the top document-corpus source behind
    * [[zipMeta]]'s `kind = docx` label, extracted without a library:
    * [[graft.functions.ZipEntryBytes]] walks the local headers to
    * `word/document.xml` (stored members sliced, DEFLATE members
    * inflated raw — both bounded by `maxBytes`, data-descriptor
    * entries fail closed exactly like the zipMeta walk), then the
    * WordprocessingML cleans the htmlToText way: paragraph closes
    * (`</w:p>`) become newlines and explicit tabs (`<w:tab/>`)
    * become tabs BEFORE tags strip (all document text lives inside
    * `<w:t>` elements, so stripping keeps exactly the text runs),
    * and the XML character references decode in
    * [[TextAnalysis.decodeEntities]]' one-pass chain. Non-ZIP
    * payloads, archives without the member, and malformed members
    * all yield null. Narrow per-row work, zero shuffle. */
  def docxText(payload: Column, maxBytes: Int = 1 << 24): Column =
    docxXmlText(graft.functions.Utf8Text(
      graft.functions.ZipEntryBytes(payload, "word/document.xml", maxBytes)))

  /** [[docxText]] plus the AUXILIARY text members real documents
    * carry outside the body — `word/header*.xml`, `word/footer*.xml`,
    * `word/footnotes.xml`, `word/endnotes.xml` — each through the
    * same tag-strip + entity-decode transform, appended after the
    * body in ARCHIVE order, newline-separated. A separate entry
    * point (not a default-flip) so [[docxText]]'s body-only contract
    * stays stable. One [[graft.functions.ZipEntries]] listing, aux
    * members extracted by coordinates; documents without aux members
    * return exactly the body; a missing/corrupt body stays null. */
  def docxFullText(payload: Column, maxBytes: Int = 1 << 24): Column = {
    val body = docxText(payload, maxBytes)
    val aux = filter(graft.functions.ZipEntries(payload, 4096),
      e => e.getField("name").rlike(
        "^word/(header[0-9]*|footer[0-9]*|footnotes|endnotes)\\.xml$"))
    val texts = filter(transform(aux, e =>
      docxXmlText(graft.functions.Utf8Text(
        graft.functions.ZipMemberData(payload, e, maxBytes)))),
      t => t.isNotNull)
    when(body.isNotNull,
      when(size(texts) > 0,
        concat(body, lit("\n"), array_join(texts, "\n")))
        .otherwise(body))
  }

  /** The WordprocessingML→text transform alone (member already
    * extracted) — shared by [[docxText]] and the resolve-once
    * [[documentText]] dispatcher. */
  private[ext] def docxXmlText(xml: Column): Column = {
    val para = regexp_replace(regexp_replace(xml,
      "</w:p>", "\n"), "<w:tab[^>]*/>", "\t")
    TextAnalysis.decodeEntities(regexp_replace(para, "<[^>]+>", ""))
  }

  /** OpenDocument text (`.odt`/`.ods`/`.odp` — the LibreOffice tier;
    * the ODF package is a zip whose `mimetype` member names the kind
    * and whose `content.xml` carries the document): `text:p`
    * paragraph and `text:h` heading ends become newlines, every
    * other tag (spans, styles, table machinery) strips, entities
    * decode. One member extraction, one regexp pass — the docx
    * recipe for the other office suite. Non-ODF zips and corrupt
    * payloads null. */
  def odfText(payload: Column, maxBytes: Int = 1 << 24): Column =
    odfXmlText(graft.functions.Utf8Text(
      graft.functions.ZipEntryBytes(payload, "content.xml", maxBytes)))

  /** The ODF-content→text transform alone (member already
    * extracted) — shared by [[odfText]] and the resolve-once
    * [[documentText]] dispatcher. */
  private[ext] def odfXmlText(xml: Column): Column = {
    val para = regexp_replace(xml, "</text:[ph]>", "\n")
    TextAnalysis.decodeEntities(regexp_replace(para, "<[^>]+>", ""))
  }

  /** The ODF KIND off the package's `mimetype` member — text /
    * spreadsheet / presentation; null for non-ODF payloads. */
  def odfKind(payload: Column): Column = {
    val mt = graft.functions.Utf8Text(graft.functions.ZipEntryBytes(payload, "mimetype",
      256))
    when(mt.startsWith("application/vnd.oasis.opendocument."),
      regexp_extract(mt, "opendocument\\.([a-z-]+)", 1))
  }

  /** JPEG EXIF IFD0 fields — orientation (whether a dHash needs
    * rotating), make/model/datetime (provenance splits) via the
    * native [[graft.functions.JpegExif]] marker-chain + TIFF-IFD
    * walk; both byte orders honored, absent tags null fields,
    * missing/malformed EXIF a null struct. */
  def jpegExif(payload: Column): Column =
    graft.functions.JpegExif(payload)

  /** ID3v2 text tags exploded per media row — the metadata text of an
    * audio corpus ([[graft.functions.Id3TextFrames]]: v2.3/v2.4 frame
    * walk, all four text encodings honored, non-text frames skipped,
    * corrupt tags fail closed to zero rows). Output (idCol, pos,
    * frame_id, text) in frame order. */
  def id3Tags(docs: DataFrame, idCol: String = "media_id",
              payloadCol: String = "payload",
              maxFrames: Int = 256): DataFrame =
    docs.select(col(idCol),
        posexplode(graft.functions.Id3TextFrames(col(payloadCol),
          maxFrames)).as(Seq("pos", "__f")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("__f.frame_id").as("frame_id"), col("__f.text").as("text"))

  /** FLAC Vorbis comments exploded per media row — [[id3Tags]]' shape
    * for the lossless tier via [[graft.functions.FlacTags]] (metadata
    * block walk to VORBIS_COMMENT, keys ASCII-uppercased per the
    * spec's case-insensitivity, values verbatim). Untagged FLACs
    * contribute no rows; corrupt payloads fail closed to none.
    * Output (idCol, pos, key, value) in comment order. */
  def flacTags(docs: DataFrame, idCol: String = "media_id",
               payloadCol: String = "payload",
               maxTags: Int = 4096): DataFrame =
    docs.select(col(idCol),
        posexplode(graft.functions.FlacTags(col(payloadCol), maxTags))
          .as(Seq("pos", "__t")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("__t.key").as("key"), col("__t.value").as("value"))

  /** WAV LIST/INFO tags exploded per media row — the third leg of
    * the audio-metadata trio ([[id3Tags]], [[flacTags]]) via
    * [[graft.functions.WavInfoTags]]: INAM/IART/ICRD/ICMT and the
    * rest of the public INFO vocabulary, fourcc keys verbatim,
    * NUL-stripped values (UTF-8 validated, latin1 fallback).
    * Untagged WAVs contribute no rows; corrupt payloads none.
    * Output (idCol, pos, key, value) in chunk order. */
  def wavInfoTags(docs: DataFrame, idCol: String = "media_id",
                  payloadCol: String = "payload",
                  maxTags: Int = 4096): DataFrame =
    docs.select(col(idCol),
        posexplode(graft.functions.WavInfoTags(col(payloadCol), maxTags))
          .as(Seq("pos", "__t")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("__t.key").as("key"), col("__t.value").as("value"))

  /** TAR archive listing — release tarballs are how code corpora
    * arrive: [[graft.functions.TarEntries]] walks the checksummed
    * ustar headers and each entry explodes with its index, name,
    * DATA offset, size and typeflag (`0` file, `5` dir, `2` symlink,
    * `L`/`x` long-name extensions verbatim). Corrupt archives (bad
    * checksum, malformed octal, truncated data) contribute NO rows —
    * whole-archive fail-closed, the GunzipMembers contract. Narrow
    * explode, zero shuffle. */
  def tarList(docs: DataFrame, idCol: String = "doc_id",
              payloadCol: String = "payload",
              maxEntries: Int = 1 << 16): DataFrame =
    docs.select(col(idCol),
        posexplode(graft.functions.TarEntries(col(payloadCol), maxEntries))
          .as(Seq("entry_idx", "__e")))
      .select(col(idCol), col("entry_idx").cast("long").as("entry_idx"),
        col("__e.name").as("name"), col("__e.offset").as("offset"),
        col("__e.size").as("size"), col("__e.typeflag").as("typeflag"))

  /** ZIP archive listing — the [[tarList]] sibling for the OOXML/
    * epub/jar tier: [[graft.functions.ZipEntries]] resolves every
    * entry via the CENTRAL DIRECTORY when an EOCD exists (exact
    * `(name, method, csize, usize, data offset)` even for the
    * data-descriptor archives streaming writers produce) and falls
    * back to the sequential local-header walk for truncated
    * CD-less payloads. Corrupt CDs, ZIP64 markers and junk payloads
    * contribute NO rows — whole-archive fail-closed, the
    * GunzipMembers contract. Narrow explode, zero shuffle. */
  def zipList(docs: DataFrame, idCol: String = "doc_id",
              payloadCol: String = "payload",
              maxEntries: Int = 4096): DataFrame =
    docs.select(col(idCol),
        posexplode(graft.functions.ZipEntries(col(payloadCol), maxEntries))
          .as(Seq("entry_idx", "__e")))
      .select(col(idCol), col("entry_idx").cast("long").as("entry_idx"),
        col("__e.name").as("name"),
        col("__e.method").as("method"),
        col("__e.csize").as("csize"), col("__e.usize").as("usize"),
        col("__e.offset").as("offset"))

  /** EVERY member's text from a ZIP — the [[tarFileTexts]] sibling
    * for zip-shaped corpora (source archives, jar/ooxml bundles):
    * entries explode via the CD-primary listing, directories (names
    * ending `/`) drop, and each member extracts AT ITS COORDINATES
    * ([[graft.functions.ZipMemberData]] over the exploded entry —
    * stored sliced, DEFLATE inflated, data-descriptor entries carry
    * CD sizes; ONE archive resolution per row, no per-member EOCD
    * re-scans) and decodes UTF-8. Corrupt archives contribute no
    * rows; a member whose extraction fails closed keeps its row with
    * null text. Output (idCol, name, usize, text); narrow explode,
    * zero shuffle. */
  def zipFileTexts(docs: DataFrame, idCol: String = "doc_id",
                   payloadCol: String = "payload",
                   maxBytes: Int = 1 << 24,
                   maxEntries: Int = 4096): DataFrame =
    docs.select(col(idCol), col(payloadCol).as("__p"),
        explode(graft.functions.ZipEntries(col(payloadCol), maxEntries))
          .as("__e"))
      .filter(!col("__e.name").endsWith("/"))
      .select(col(idCol), col("__e.name").as("name"),
        col("__e.usize").as("usize"),
        graft.functions.Utf8Text(graft.functions.ZipMemberData(col("__p"),
          col("__e"), maxBytes)).as("text"))

  /** [[tarList]] over a gzip-compressed tarball — `.tar.gz`, the
    * shape source releases actually ship: one bounded
    * [[graft.functions.GunzipPayload]] inflate (CRC-verified,
    * capped, fail-closed) feeds the checksummed ustar walk. The
    * inflated archive is aliased in its own projection so the walk's
    * single kernel call shares one inflate per row. Corrupt gzip OR
    * corrupt tar ⇒ no rows. */
  def tarGzList(docs: DataFrame, idCol: String = "doc_id",
                payloadCol: String = "payload",
                maxOut: Int = 1 << 26,
                maxEntries: Int = 1 << 16): DataFrame =
    tarList(docs.select(col(idCol),
        graft.functions.GunzipPayload(col(payloadCol), maxOut)
          .as("__tar")),
      idCol, "__tar", maxEntries)

  /** [[tarList]] over an xz-compressed tarball — `.tar.xz`, the
    * other shape source releases ship: one bounded
    * [[graft.functions.XzPayload]] decode (checks verified, capped,
    * fail-closed) feeds the checksummed ustar walk, aliased so the
    * walk shares ONE decode per row. Corrupt xz OR corrupt tar ⇒ no
    * rows. */
  def tarXzList(docs: DataFrame, idCol: String = "doc_id",
                payloadCol: String = "payload",
                maxOut: Int = 1 << 26,
                maxEntries: Int = 1 << 16): DataFrame =
    tarList(docs.select(col(idCol),
        graft.functions.XzPayload(col(payloadCol), maxOut)
          .as("__tar")),
      idCol, "__tar", maxEntries)

  /** [[tarList]] over the remaining wrapper matrix — `.tar.zst`
    * (the modern default), `.tar.bz2` (the long tail of releases),
    * `.tar.lz4` and `.tar.sz`: one bounded from-format
    * decompression feeding the same header walk; corrupt archives
    * contribute no rows (the kernels' fail-closed nulls). */
  def tarZstList(docs: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload",
                 maxOut: Int = 1 << 26,
                 maxEntries: Int = 1 << 16): DataFrame =
    tarList(docs.select(col(idCol),
        graft.functions.ZstdPayload(col(payloadCol), maxOut)
          .as("__tar")),
      idCol, "__tar", maxEntries)

  /** See [[tarZstList]]. */
  def tarBz2List(docs: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload",
                 maxOut: Int = 1 << 26,
                 maxEntries: Int = 1 << 16): DataFrame =
    tarList(docs.select(col(idCol),
        graft.functions.Bunzip2(col(payloadCol), maxOut)
          .as("__tar")),
      idCol, "__tar", maxEntries)

  /** See [[tarZstList]]. */
  def tarLz4List(docs: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload",
                 maxOut: Int = 1 << 26,
                 maxEntries: Int = 1 << 16): DataFrame =
    tarList(docs.select(col(idCol),
        graft.functions.Lz4FramePayload(col(payloadCol), maxOut)
          .as("__tar")),
      idCol, "__tar", maxEntries)

  /** Executable census — ELF / PE / Mach-O (incl. FAT) headers into
    * `(format, arch, bits, kind, n_sections)`: the routing step a
    * software corpus runs before any code analysis
    * ([[graft.functions.BinaryMeta]]; fail-closed null). */
  def binaryMeta(payload: Column): Column =
    graft.functions.BinaryMeta(payload)

  /** WebAssembly module census — `\0asm` section walk into version,
    * section/type/import/export/function counts and the bounded
    * `module.field` import + export name lists
    * ([[graft.functions.WasmMeta]]; fail-closed null). */
  def wasmMeta(payload: Column, maxNames: Int = 256): Column =
    graft.functions.WasmMeta(payload, maxNames)

  /** Font census — TTF/OTF/TTC sfnt headers into family, full name,
    * glyph count and unitsPerEm with the name-record precedence real
    * font stacks use ([[graft.functions.FontMeta]]; WOFF refuses —
    * it is a compressed wrapper, not sfnt). */
  def fontMeta(payload: Column): Column =
    graft.functions.FontMeta(payload)

  /** WOFF 1.0 → sfnt reconstruction — per-table zlib unwrap + sfnt
    * directory rebuild per the spec, so crawled webfonts feed
    * [[fontMeta]] directly: `fontMeta(woffSfnt(payload))`. WOFF2
    * refuses (Brotli, the documented absence).
    * ([[graft.functions.WoffSfnt]]; fail-closed, bomb-capped.) */
  def woffSfnt(payload: Column, maxOut: Int = 1 << 24): Column =
    graft.functions.WoffSfnt(payload, maxOut)

  /** Standard MIDI File census — format, tracks, division, a
    * tempo-map-integrated duration and the note count via the native
    * [[graft.functions.MidiMeta]] event walk (running status, meta/
    * sysex framing, SMPTE divisions; fail-closed null). */
  def midiMeta(payload: Column, maxEvents: Int = 1 << 20): Column =
    graft.functions.MidiMeta(payload, maxEvents)

  /** Legacy `.lzma`-alone decompression — both the known-size and
    * the marker-terminated unknown-size forms, through the repo's
    * own LZMA machinery ([[graft.functions.LzmaAlonePayload]];
    * fail-closed, bomb-capped). The format carries no magic, so it
    * never joins `sniffFormat` — route by extension upstream. */
  def lzmaAlone(payload: Column, maxOut: Int = 1 << 24): Column =
    graft.functions.LzmaAlonePayload(payload, maxOut)

  /** Unix `ar` archive listing — `.deb` packages, static `.a`
    * libraries, old distfiles: one row per REAL member (GNU `//`
    * name tables and `/` symbol indexes resolve names but never
    * surface; BSD `#1/LEN` inline names handled), `offset` pointing
    * at the member's verbatim bytes for `substr` extraction, exactly
    * the [[graft.functions.TarEntries]] contract. Corrupt archives
    * fail the whole row closed to null. */
  def arEntries(payload: Column, maxEntries: Int = 1 << 16): Column =
    graft.functions.ArEntries(payload, maxEntries)

  /** RAR4/RAR5 HEADER census — `(format, solid_archive, entries[])`
    * with per-entry name/sizes/method/crc/solid/encrypted flags, all
    * header CRCs verified; see [[graft.functions.RarEntries]].
    * DECOMPRESSION is a documented refusal (the RAR codec family is
    * proprietary) — the 7z posture: the listing is first-class, the
    * packed bytes are never interpreted. Encrypted-header archives
    * refuse whole (a partial census would lie). */
  def rarEntries(payload: Column, maxEntries: Int = 1 << 16): Column =
    graft.functions.RarEntries(payload, maxEntries)

  /** Debian package census — the `.deb` onboarding step a software
    * corpus needs: `.deb` IS an ar archive, so the walk is
    * `arEntries → control.tar.{gz,xz,zst} member → decompress by its
    * own extension → ustar walk → ./control text`, every stage the
    * repo's own fail-closed kernel. Yields
    * `(deb_version, control_text, package, version, architecture)` —
    * the three header fields parsed from the control text (RFC-822
    * style `Key: value` lines); anything corrupt along the chain
    * leaves that row's fields null. One kernel pass per stage, zero
    * shuffle. */
  def debControl(docs: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload",
                 maxOut: Int = 1 << 26): DataFrame = {
    def member(e: Column): Column = e.getField("name")
    val entries = graft.functions.ArEntries(col(payloadCol), 64)
    def field(key: String): Column = {
      val v = regexp_extract(col("control_text"),
        "(?m)^" + key + ":[ \\t]*(.*?)[ \\t]*$", 1)
      when(v =!= "", v)
    }
    docs
      .select(col(idCol), col(payloadCol), entries.as("__e"))
      .select(col(idCol), col(payloadCol),
        element_at(filter(col("__e"),
          e => member(e) === "debian-binary"), 1).as("__dv"),
        element_at(filter(col("__e"),
          e => member(e).startsWith("control.tar")), 1).as("__ce"))
      .select(col(idCol),
        trim(decode(col(payloadCol).substr(
          col("__dv").getField("offset").cast("int") + 1,
          least(col("__dv").getField("size"), lit(16L)).cast("int")),
          "UTF-8"), "\n ").as("deb_version"),
        member(col("__ce")).as("__cn"),
        col(payloadCol).substr(
          col("__ce").getField("offset").cast("int") + 1,
          col("__ce").getField("size").cast("int")).as("__cb"))
      .select(col(idCol), col("deb_version"),
        when(col("__cn") === "control.tar.gz",
          graft.functions.GunzipPayload(col("__cb"), maxOut))
          .when(col("__cn") === "control.tar.xz",
            graft.functions.XzPayload(col("__cb"), maxOut))
          .when(col("__cn") === "control.tar.zst",
            graft.functions.ZstdPayload(col("__cb"), maxOut))
          .when(col("__cn") === "control.tar", col("__cb"))
          .as("__tar"))
      .select(col(idCol), col("deb_version"), col("__tar"),
        element_at(filter(
          graft.functions.TarEntries(col("__tar"), 4096),
          e => member(e) === "./control" || member(e) === "control"), 1)
          .as("__te"))
      .select(col(idCol), col("deb_version"),
        graft.functions.Utf8Text(col("__tar").substr(
          col("__te").getField("offset").cast("int") + 1,
          col("__te").getField("size").cast("int"))).as("control_text"))
      .select(col(idCol), col("deb_version"), col("control_text"),
        field("Package").as("package"),
        field("Version").as("version"),
        field("Architecture").as("architecture"))
  }

  /** cpio archive listing — RPM payloads and initramfs images: one
    * row per entry (newc/crc hex headers and odc octal headers both
    * decode, the TRAILER!!! terminator surfaces to nobody), `offset`
    * pointing at the verbatim data, the [[arEntries]] contract. */
  def cpioEntries(payload: Column, maxEntries: Int = 1 << 16): Column =
    graft.functions.CpioEntries(payload, maxEntries)

  /** RPM identity census — name/version/release/arch/summary plus the
    * payload format and compressor tags, via the native
    * [[graft.functions.RpmInfo]] lead + header-structure walk. */
  def rpmInfo(payload: Column): Column =
    graft.functions.RpmInfo(payload)

  /** RPM payload file listing — [[debControl]]'s sibling chain for
    * the other package universe: `rpmInfo` finds where the payload
    * starts and which codec the package's OWN header declares
    * (absent = gzip, the rpmlib default), the matching from-format
    * kernel decompresses it, and [[cpioEntries]] lists the files.
    * Yields `(name, version, release, file_pos, file_name,
    * file_size, file_mode)`; anything corrupt along the chain leaves
    * null fields. */
  def rpmFiles(docs: DataFrame, idCol: String = "doc_id",
               payloadCol: String = "payload",
               maxOut: Int = 1 << 26): DataFrame = {
    val info = graft.functions.RpmInfo(col(payloadCol))
    docs
      .select(col(idCol), col(payloadCol), info.as("__i"))
      .select(col(idCol),
        col("__i.name").as("name"), col("__i.version").as("version"),
        col("__i.release").as("release"),
        coalesce(col("__i.payload_compressor"), when(
          col("__i").isNotNull, lit("gzip"))).as("__comp"),
        col(payloadCol).substr(
          col("__i.payload_offset").cast("int") + 1,
          (length(col(payloadCol)) -
            col("__i.payload_offset").cast("int")).cast("int"))
          .as("__pb"))
      .select(col(idCol), col("name"), col("version"), col("release"),
        when(col("__comp") === "gzip",
          graft.functions.GunzipPayload(col("__pb"), maxOut))
          .when(col("__comp") === "xz",
            graft.functions.XzPayload(col("__pb"), maxOut))
          .when(col("__comp") === "zstd",
            graft.functions.ZstdPayload(col("__pb"), maxOut))
          .when(col("__comp") === "bzip2",
            graft.functions.Bunzip2(col("__pb"), maxOut))
          .as("__cpio"))
      .select(col(idCol), col("name"), col("version"), col("release"),
        posexplode_outer(graft.functions.CpioEntries(col("__cpio"), 4096))
          .as(Seq("file_pos", "__e")))
      .select(col(idCol), col("name"), col("version"), col("release"),
        col("file_pos").cast("long").as("file_pos"),
        col("__e.name").as("file_name"),
        col("__e.size").as("file_size"),
        col("__e.mode").cast("int").as("file_mode"))
  }

  /** [[tarList]] over a `.tar.Z` (Unix compress) tarball — the
    * pre-gzip source-drop shape old FTP mirrors still serve: one
    * bounded [[graft.functions.LzwUncompress]] decode feeds the
    * checksummed ustar walk. Corrupt LZW OR corrupt tar ⇒ no rows. */
  def tarZList(docs: DataFrame, idCol: String = "doc_id",
               payloadCol: String = "payload",
               maxOut: Int = 1 << 26,
               maxEntries: Int = 1 << 16): DataFrame =
    tarList(docs.select(col(idCol),
        graft.functions.LzwUncompress(col(payloadCol), maxOut)
          .as("__tar")),
      idCol, "__tar", maxEntries)

  /** See [[tarZstList]]. */
  def tarSzList(docs: DataFrame, idCol: String = "doc_id",
                payloadCol: String = "payload",
                maxOut: Int = 1 << 26,
                maxEntries: Int = 1 << 16): DataFrame =
    tarList(docs.select(col(idCol),
        graft.functions.SnappyFramePayload(col(payloadCol), maxOut)
          .as("__tar")),
      idCol, "__tar", maxEntries)

  /** EVERY regular file's text from a tar — the code-corpus onboard
    * step ([[tarMemberText]] pulls one known member; a repository
    * tarball wants them all): entries explode, regular files keep
    * their resolved names, and each slices its own bytes from the
    * payload (`substr(offset+1, size)` — tar is uncompressed).
    * Output (idCol, name, size, text); pipe straight into
    * `CodeCorpus.codeLangId`/`licenseScan`/`codeStats`. Narrow
    * explode, zero shuffle. */
  def tarFileTexts(docs: DataFrame, idCol: String = "doc_id",
                   payloadCol: String = "payload",
                   maxEntries: Int = 1 << 16): DataFrame =
    docs.select(col(idCol), col(payloadCol).as("__p"),
        explode(graft.functions.TarEntries(col(payloadCol), maxEntries))
          .as("__e"))
      .filter(col("__e.typeflag") === "0")
      .select(col(idCol), col("__e.name").as("name"),
        col("__e.size").as("size"),
        graft.functions.Utf8Text(col("__p").substr(col("__e.offset") + 1, col("__e.size"))).as("text"))

  /** One named REGULAR file's text from a tar — tar stores bytes
    * uncompressed, so after the walk locates `(offset, size)` the
    * extraction is a plain per-row `substr` slice, decoded UTF-8.
    * Archives without the member (or non-file entries of that name,
    * or corrupt archives) contribute no rows. */
  def tarMemberText(docs: DataFrame, member: String,
                    idCol: String = "doc_id",
                    payloadCol: String = "payload",
                    maxEntries: Int = 1 << 16): DataFrame =
    docs.select(col(idCol), col(payloadCol).as("__p"),
        explode(graft.functions.TarEntries(col(payloadCol), maxEntries))
          .as("__e"))
      .filter(col("__e.name") === member && col("__e.typeflag") === "0")
      .select(col(idCol),
        graft.functions.Utf8Text(col("__p").substr(col("__e.offset") + 1, col("__e.size"))).as("text"))

  /** PPTX slide text — the deck sibling of [[docxText]]: the named
    * slide's DrawingML cleans the same way (paragraph closes
    * `</a:p>` become newlines before tags strip; all visible text
    * lives in `<a:t>` runs, which concatenate in order), entities
    * decoded in one pass. Slides are numbered members
    * (`ppt/slides/slideN.xml`) — call per slide index; archives
    * without that slide yield null. */
  def pptxSlideText(payload: Column, slide: Int = 1,
                    maxBytes: Int = 1 << 24): Column =
    slideXmlText(graft.functions.Utf8Text(graft.functions.ZipEntryBytes(payload,
      s"ppt/slides/slide$slide.xml", maxBytes)))

  /** The DrawingML→text transform alone — shared by [[pptxSlideText]]
    * and the resolve-once [[documentText]] dispatcher. */
  private[ext] def slideXmlText(xml: Column): Column =
    TextAnalysis.decodeEntities(regexp_replace(
      regexp_replace(xml, "</a:p>", "\n"), "<[^>]+>", ""))

  /** XLSX document TEXT as one Column — the spreadsheet tier's entry
    * in the [[documentText]] dispatcher ([[xlsxCells]] keeps the
    * grid; a text dispatcher wants the words): the shared-strings
    * entries in table order, one per line, runs concatenated and
    * entities decoded. Workbooks without the member yield null. */
  def xlsxText(payload: Column, maxBytes: Int = 1 << 24): Column =
    sharedStringsText(graft.functions.Utf8Text(graft.functions.ZipEntryBytes(payload,
      "xl/sharedStrings.xml", maxBytes)))

  /** The shared-strings→text transform alone — shared by [[xlsxText]]
    * and the resolve-once [[documentText]] dispatcher. */
  private[ext] def sharedStringsText(sst: Column): Column =
    array_join(transform(
      regexp_extract_all(sst, lit("(?s)<si>(.*?)</si>"), lit(1)),
      si => TextAnalysis.decodeEntities(array_join(
        regexp_extract_all(si, lit("(?s)<t[^>]*>(.*?)</t>"), lit(1)), ""))),
      "\n")

  /** EPUB book TEXT as one Column — [[epubChapters]] flattened for
    * the [[documentText]] dispatcher: container → OPF → spine order,
    * each chapter extracted per-row-named and cleaned through
    * [[TextAnalysis.htmlToText]], readable chapters joined by blank
    * lines (missing ones skipped — the dispatcher's text is
    * best-effort; use [[epubChapters]] when per-chapter fail-closure
    * matters). Expression-tree form: the OPF text is re-derived per
    * reference inside one projection (no cross-alias CSE), which is
    * book-bounded work — acceptable for a per-row dispatcher, not
    * for a corpus-wide epub pass (that is [[epubChapters]]). */
  def epubText(payload: Column, maxBytes: Int = 1 << 24): Column = {
    val opfp = regexp_extract(graft.functions.Utf8Text(graft.functions.ZipEntryBytes(payload,
      "META-INF/container.xml", maxBytes)),
      "(?s)<rootfile[^>]*full-path=\"([^\"]*)\"", 1)
    val opf = graft.functions.Utf8Text(graft.functions.ZipEntryBytesAt(payload,
      when(opfp =!= "", opfp), maxBytes))
    val dir = when(opfp.contains("/"),
      regexp_extract(opfp, "^(.*/)[^/]*$", 1)).otherwise(lit(""))
    val items = transform(
      regexp_extract_all(opf, lit("(?s)<item [^>]*>"), lit(0)),
      tag => struct(
        regexp_extract(tag, "id=\"([^\"]*)\"", 1).as("id"),
        regexp_extract(tag, "href=\"([^\"]*)\"", 1).as("href")))
      .cast("array<struct<id:string,href:string>>")
    val idrefs = regexp_extract_all(opf,
      lit("(?s)<itemref[^>]*idref=\"([^\"]*)\""), lit(1))
    val texts = transform(idrefs, idref => {
      val m = filter(items, it => it.getField("id") === idref)
      when(size(m) > 0, TextAnalysis.htmlToText(
        graft.functions.Utf8Text(graft.functions.ZipEntryBytesAt(payload,
          concat(dir, m.getItem(0).getField("href")), maxBytes))))
    })
    when(opf.isNotNull,
      array_join(filter(texts, t => t.isNotNull), "\n\n"))
  }

  /** Sniff-dispatched document text — the front door of a mixed
    * document lake: ONE pass labels each payload
    * ([[sniffFormat]], aliased so the label evaluates once); `zip`
    * payloads resolve their archive structure EXACTLY ONCE (the
    * CD-primary [[graft.functions.ZipEntries]] listing behind its
    * own alias, so streamed OOXML resolves too) — the DOCUMENT-KIND
    * routing blob and every member extraction read that one listing,
    * extractions by COORDINATES ([[graft.functions.ZipMemberData]])
    * with no per-member EOCD re-scans. Kind rules: `xl/`→xlsx
    * shared-strings text, `ppt/`→pptx slide 1,
    * `META-INF/container.xml`→epub chapters in spine order,
    * `word/`→docx; any OTHER zip (jars, source archives) yields its
    * concatenated non-directory member texts — a mixed lake's plain
    * zips read instead of nulling. Remaining tiers: `pdf` →
    * [[pdfText]], `gzip` → bounded
    * [[graft.functions.GunzipPayload]] + UTF-8, `bzip2` →
    * [[graft.functions.Bunzip2]], `zstd` →
    * [[graft.functions.ZstdPayload]], `xz` →
    * [[graft.functions.XzPayload]] (all bounded, fail-closed),
    * `7z` → the first member whose single-coder folder decodes to
    * UTF-8 text ([[graft.functions.SevenZipMembers]]),
    * `cfb` → the legacy Word piece-table tier
    * ([[graft.functions.DocTextExtract]]; non-Word compound files
    * null explicitly — sectors are not UTF-8),
    * everything unrecognized → UTF-8 as plain text. Codegen short-circuits the
    * non-matching branches per row, so each payload pays only its
    * own parser (the containerMeta(formats) lesson, solved per row
    * instead of per call). At cluster scale prefer `sniff →
    * repartition-by-format → the specific tier` — this dispatcher is
    * the single-pass form for mixed small lakes and the tail of
    * partitioned ones. Output (idCol, format — the sniffed container
    * family, text — null when the matched tier fails closed). */
  def documentText(docs: DataFrame, idCol: String = "doc_id",
                   payloadCol: String = "payload",
                   maxBytes: Int = 1 << 24): DataFrame = {
    // ONE archive resolution per zip row: the CD/local walk runs once
    // behind the __e alias; the kind-routing name blob AND every
    // member extraction below read coordinates from it
    // ([[graft.functions.ZipMemberData]]) — no per-member EOCD scans
    def mem(name: Column): Column =
      graft.functions.ZipMemberData(col("__p"),
        try_element_at(filter(col("__e"),
          x => x.getField("name") === name), lit(1)), maxBytes)
    def memText(name: Column): Column = graft.functions.Utf8Text(mem(name))
    // epub: container → OPF → spine, all via the shared listing.
    // The OPF derivation chain is MATERIALIZED as columns below
    // (__opf/__dir/__items/__idrefs) instead of inlined per
    // reference: Catalyst's CollapseProject re-inlines a produced
    // column only when it is cheap or referenced once, so every
    // tree here is referenced at least twice by its consumers —
    // keeping the per-row derivation single and the compiled
    // dispatcher expression SMALL (the inlined form's codegen
    // constant dominated this query's wall time at small SF)
    val chapterTexts = transform(col("__idrefs"), idref => {
      val m = filter(col("__items"), it => it.getField("id") === idref)
      when(size(m) > 0, TextAnalysis.htmlToText(
        memText(concat(col("__dir"), m.getItem(0).getField("href")))))
    })
    // the size(...)>=0 guards are reference FENCES: a second cheap
    // consumer reference that stops CollapseProject from pushing the
    // __items/__idrefs derivations inside the per-chapter lambda
    val epubTier = when(col("__opf").isNotNull &&
      size(col("__items")) >= 0 && size(col("__idrefs")) >= 0 &&
      length(col("__dir")) >= 0,
      array_join(filter(chapterTexts, t => t.isNotNull), "\n\n"))
    // unknown-kind zips (jars, source archives): every non-directory
    // member's text, the zipFileTexts shape collapsed to one column —
    // a mixed lake's plain zips yield their text instead of nulling
    val allMembers = when(size(col("__e")) > 0, array_join(
      filter(
        transform(
          filter(col("__e"), e => !e.getField("name").endsWith("/")),
          e => graft.functions.Utf8Text(
            graft.functions.ZipMemberData(col("__p"), e, maxBytes))),
        t => t.isNotNull),
      "\n\n"))
    docs.select(col(idCol), col(payloadCol).as("__p"),
        sniffFormat(col(payloadCol)).as("format"))
      .select(col(idCol), col("format"), col("__p"),
        when(col("format") === "zip", coalesce(
          graft.functions.ZipEntries(col("__p"), 4096),
          array().cast("array<struct<name:string,method:int," +
            "csize:bigint,usize:bigint,offset:bigint>>"))).as("__e"))
      .select(col(idCol), col("format"), col("__p"), col("__e"),
        // member-name blob derived from the SAME listing; "\n"-framed
        // so prefix rules anchor on entry starts
        when(col("format") === "zip", concat(lit("\n"), array_join(
          transform(col("__e"), e => e.getField("name")), "\n"),
          lit("\n"))).as("__names"),
        regexp_extract(memText(lit("META-INF/container.xml")),
          "(?s)<rootfile[^>]*full-path=\"([^\"]*)\"", 1).as("__opfp"))
      .select(col(idCol), col("format"), col("__p"), col("__e"),
        col("__names"),
        memText(when(col("__opfp") =!= "", col("__opfp"))).as("__opf"),
        when(col("__opfp").contains("/"),
          regexp_extract(col("__opfp"), "^(.*/)[^/]*$", 1))
          .otherwise(lit("")).as("__dir"))
      .select(col(idCol), col("format"), col("__p"), col("__e"),
        col("__names"), col("__opf"), col("__dir"),
        transform(
          regexp_extract_all(col("__opf"), lit("(?s)<item [^>]*>"),
            lit(0)),
          tag => struct(
            regexp_extract(tag, "id=\"([^\"]*)\"", 1).as("id"),
            regexp_extract(tag, "href=\"([^\"]*)\"", 1).as("href")))
          .cast("array<struct<id:string,href:string>>").as("__items"),
        regexp_extract_all(col("__opf"),
          lit("(?s)<itemref[^>]*idref=\"([^\"]*)\""), lit(1))
          .as("__idrefs"))
      .select(col(idCol), col("format"),
        when(col("format") === "pdf",
          pdfText(col("__p"), maxBytes = maxBytes).getField("text"))
          .when(col("format") === "zip",
            when(col("__names").contains("\nxl/"),
              sharedStringsText(memText(lit("xl/sharedStrings.xml"))))
              .when(col("__names").contains("\nppt/"),
                slideXmlText(memText(lit("ppt/slides/slide1.xml"))))
              .when(col("__names").contains("\nMETA-INF/container.xml"),
                epubTier)
              // ODF packages (odt/ods/odp): mimetype + content.xml —
              // checked AFTER epub, whose packages also carry mimetype
              .when(col("__names").contains("\nmimetype\n") &&
                col("__names").contains("\ncontent.xml\n"),
                odfXmlText(memText(lit("content.xml"))))
              .when(col("__names").contains("\nword/"),
                docxXmlText(memText(lit("word/document.xml"))))
              .otherwise(allMembers))
          .when(col("format") === "gzip", graft.functions.Utf8Text(
            graft.functions.GunzipPayload(col("__p"), maxBytes)))
          .when(col("format") === "bzip2", graft.functions.Utf8Text(
            graft.functions.Bunzip2(col("__p"), maxBytes)))
          .when(col("format") === "zstd", graft.functions.Utf8Text(
            graft.functions.ZstdPayload(col("__p"), maxBytes)))
          .when(col("format") === "xz", graft.functions.Utf8Text(
            graft.functions.XzPayload(col("__p"), maxBytes)))
          .when(col("format") === "lz4", graft.functions.Utf8Text(
            graft.functions.Lz4FramePayload(col("__p"), maxBytes)))
          .when(col("format") === "snappy", graft.functions.Utf8Text(
            graft.functions.SnappyFramePayload(col("__p"), maxBytes)))
          .when(col("format") === "z", graft.functions.Utf8Text(
            graft.functions.LzwUncompress(col("__p"), maxBytes)))
          // tar: every regular member's text, newline-joined (the
          // zip allMembers shape — tarballs ARE the source-release
          // container); corrupt archives null
          .when(col("format") === "tar",
            array_join(filter(transform(
              filter(graft.functions.TarEntries(col("__p"), 4096),
                e => e.getField("typeflag") === "0"),
              e => graft.functions.Utf8Text(col("__p").substr(
                e.getField("offset") + 1, e.getField("size")))),
              t => t.isNotNull), "\n\n"))
          // 7z: the FIRST member whose single-coder folder decodes
          // to valid UTF-8 (the source-release README shape);
          // multi-coder folders and corrupt archives null
          .when(col("format") === "7z",
            try_element_at(filter(transform(
              graft.functions.SevenZipMembers(col("__p"), 4096, maxBytes),
              m => graft.functions.Utf8Text(m.getField("data"))),
              t => t.isNotNull), lit(1)))
          // legacy Office containers: Word documents extract through
          // the piece-table tier, Excel workbooks through the BIFF8
          // cell grid (values joined in walk order), PowerPoint decks
          // through the text-atom walk — each refusal before a match
          // is one wasted bounded CFB parse; any other CFB yields an
          // EXPLICIT null (never UTF-8 junk) — census via cfbMeta
          .when(col("format") === "cfb",
            coalesce(
              graft.functions.DocTextExtract(col("__p"), maxBytes),
              array_join(transform(
                graft.functions.XlsCells(col("__p"), maxBytes),
                c => c.getField("value")), "\n"),
              graft.functions.PptText(col("__p"), maxBytes)))
          .when(col("format") === "rtf",
            graft.functions.RtfText(col("__p"), maxBytes))
          // binary junk in a mixed lake NULLS here instead of
          // killing the scan (decode(...,'UTF-8') throws on malformed)
          .otherwise(graft.functions.Utf8Text(col("__p"))).as("text"))
  }

  /** Parquet footer metadata — the lake-discovery tier for the
    * format lakes are made of ([[avroSchema]]'s parquet sibling):
    * version, EXACT row count, row-group count, writer string and
    * the schema tree's leaf columns (dotted paths, physical types,
    * repetition) straight from the Thrift compact-protocol footer
    * via [[graft.functions.ParquetFooterMeta]] — no table read, no
    * library probe. `sniff → parquet_meta → explicit read`. */
  def parquetMeta(payload: Column, maxColumns: Int = 4096): Column =
    graft.functions.ParquetFooterMeta(payload, maxColumns)

  /** CFB/OLE2 compound-file census — legacy Office (`.doc`/`.xls`/
    * `.ppt`), MSI and the rest of the Windows-era lake tail:
    * header facts + the directory walked into stream/storage
    * entries via [[graft.functions.CfbDirectory]] (header DIFAT +
    * chained DIFAT → FAT → directory chain, names UTF-16LE).
    * Corrupt/non-CFB payloads yield a null struct. */
  def cfbMeta(payload: Column, maxSectors: Int = 1 << 16): Column =
    graft.functions.CfbDirectory(payload, maxSectors)

  /** The legacy-Office KIND of a [[cfbMeta]] struct, from its
    * directory stream names (the public file-format markers):
    * `WordDocument`→doc, `Workbook`/`Book`→xls,
    * `PowerPoint Document`→ppt, anything else a generic `cfb`;
    * null struct → null. */
  def cfbKind(meta: Column): Column = {
    val names = transform(meta.getField("entries"), e => e.getField("name"))
    when(meta.isNull, lit(null).cast("string"))
      .when(array_contains(names, "WordDocument"), "doc")
      .when(array_contains(names, "Workbook") ||
        array_contains(names, "Book"), "xls")
      .when(array_contains(names, "PowerPoint Document"), "ppt")
      .otherwise("cfb")
  }

  /** Parquet column-chunk statistics — the pruning/skew/NULL-rate
    * census [[parquetMeta]] stops short of: per (row group × column)
    * rows/bytes/value counts and the Statistics null_count/min/max
    * decoded per physical type, straight from the same Thrift footer
    * ([[graft.functions.ParquetColumnStats]]) — no table read. */
  def parquetStats(payload: Column, maxChunks: Int = 16384): Column =
    graft.functions.ParquetColumnStats(payload, maxChunks)

  /** Parquet PAGE-INDEX census — the scan-planning grain below
    * [[parquetStats]]: per-PAGE first_row_index/offset/size from the
    * OffsetIndex and null_page/null_count/min/max/boundary_order from
    * the ColumnIndex (what predicate-pushdown page skipping actually
    * reads; parquet-mr ≥ 1.11 writes them by default). Files without
    * page indexes yield an EMPTY array; malformed index regions fail
    * the row closed ([[graft.functions.ParquetPageIndex]]). */
  /** MP4 per-TRACK sample-table census — the costing grain of a
    * video corpus: samples/bytes/chunks per trak with handler,
    * timescale and language, no codec decode
    * ([[graft.functions.Mp4Tracks]]). */
  def mp4Tracks(payload: Column, maxTracks: Int = 64): Column =
    graft.functions.Mp4Tracks(payload, maxTracks)

  /** PNG metadata census — geometry, gamma, eXIf presence and the
    * tEXt/zTXt/iTXt text chunks (generative-pipeline provenance
    * lives here: `parameters`, `Software`, XMP). Chunk CRCs are
    * verified; one bad chunk nulls the file
    * ([[graft.functions.PngMeta]]). */
  def pngMeta(payload: Column, maxText: Int = 1 << 20): Column =
    graft.functions.PngMeta(payload, maxText)

  /** Parquet bloom-filter census: one row per (row group, column)
    * carrying a bloom, header facts verified at their offsets
    * ([[graft.functions.ParquetBloomInfo]]). */
  /** ORC bloom-filter membership probe — BLOOM_FILTER_UTF8 index
    * streams tested with ORC's own Murmur3-64 double hashing; null
    * when the column has no bloom ([[graft.functions.OrcBloomCheck]]). */
  def orcBloomMightContain(payload: Column, colName: String,
                           probe: Column): Column =
    graft.functions.OrcBloom.mightContain(payload, colName, probe)

  def parquetBloomInfo(payload: Column, maxColumns: Int = 4096): Column =
    graft.functions.ParquetBloom.bloomInfo(payload, maxColumns)

  /** Parquet bloom-filter membership probe — the split-block xxHash64
    * check a scan planner runs before opening a row group; null when
    * the file or column has no bloom
    * ([[graft.functions.ParquetBloomCheck]]). */
  def parquetBloomMightContain(payload: Column, colName: String,
                               probe: Column): Column =
    graft.functions.ParquetBloom.mightContain(payload, colName, probe)

  def parquetPageIndex(payload: Column, maxPages: Int = 1 << 16): Column =
    graft.functions.ParquetPageIndex(payload, maxPages)

  /** Parquet DATA decode — sample a top-level column's real values
    * out of raw file bytes, no reader stack: row group 0's page
    * chain, the dictionary/PLAIN encodings, RLE/bit-packed
    * definition levels, and the uncompressed/snappy/gzip/zstd page
    * codecs all through the repo's own from-spec kernels
    * ([[graft.functions.ParquetPageValues]]). Null slots stay null
    * in the values array; nested/repeated columns refuse. */
  def parquetPageValues(payload: Column, column: String,
                        maxVals: Int = 1 << 16): Column =
    graft.functions.ParquetPageValues(payload, column, maxVals)

  /** SQLite database-header metadata — the long tail of data lakes
    * is full of `.db`/`.sqlite` files, and the 100-byte header is a
    * census in itself (SQLite file format, all big-endian fixed
    * offsets): page size (the stored value 1 means 65536), page
    * count, text encoding, user version and the writing library's
    * version number. Fixed-offset slicing on the payload, zero
    * shuffle; payloads without the `SQLite format 3\0` magic or
    * shorter than the header yield a null struct. */
  def sqliteMeta(payload: Column): Column = {
    val isDb = hex(substring(payload, 1, 16)) ===
      lit("53514C69746520666F726D6174203300") &&
      length(payload) >= 100
    val rawPage = beUint(payload, 17, 2)
    val pageSize = when(rawPage === 1L, lit(65536L)).otherwise(rawPage)
    val enc = beUint(payload, 57, 4)
    when(isDb, struct(
      pageSize.cast("int").as("page_size"),
      beUint(payload, 29, 4).as("n_pages"),
      when(enc === 1L, "utf8").when(enc === 2L, "utf16le")
        .when(enc === 3L, "utf16be").otherwise("unknown").as("encoding"),
      beUint(payload, 61, 4).cast("int").as("user_version"),
      beUint(payload, 97, 4).cast("int").as("sqlite_version")))
  }

  /** SQLite TABLE-ROW decode — the data tier [[sqliteMeta]]'s header
    * census stops short of: resolve the table's root page through
    * sqlite_master, walk its b-tree (interior + leaf + overflow
    * chains), decode every record's serial types
    * ([[graft.functions.SqliteRows]]). Rows come back as
    * `(rowid, vals array<string>)`; INTEGER PRIMARY KEY alias
    * columns read NULL by SQLite's own storage rule (the value is
    * the rowid). UTF-16 databases fail closed. */
  def sqliteRows(payload: Column, table: String,
                 maxRows: Int = 4096): Column =
    graft.functions.SqliteRows(payload, table, maxRows)

  /** ORC tail metadata — the third leg of the lake-census trio:
    * compression codec, writer version, exact row count, stripe
    * count, content length and the root struct's top-level columns
    * with ORC type-kind names, via the protobuf postscript/footer
    * walk in [[graft.functions.OrcFooterMeta]] (NONE/ZLIB/SNAPPY/LZ4
    * footers decode; the remaining codecs yield postscript facts
    * with null footer fields). */
  def orcMeta(payload: Column, maxFooter: Int = 1 << 24): Column =
    graft.functions.OrcFooterMeta(payload, maxFooter)

  /** ORC DATA decode — sample a top-level column's real values out
    * of raw file bytes, no reader stack: stripe 0's streams through
    * the full RLEv2 reader (all four sub-formats), byte/boolean RLE,
    * IEEE lanes, DIRECT_V2 + DICTIONARY_V2 strings, PRESENT-stream
    * nulls, every decodable codec
    * ([[graft.functions.OrcColumnValues]]) — the parquet sibling of
    * [[parquetPageValues]]. */
  def orcColumnValues(payload: Column, column: String,
                      maxVals: Int = 1 << 16): Column =
    graft.functions.OrcColumnValues(payload, column, maxVals)

  /** 7z archive listing — names, sizes, directory flags off the
    * (possibly LZMA-compressed) header via
    * [[graft.functions.SevenZipList]]; one row per entry, corrupt
    * archives contribute no rows. */
  def sevenZipList(docs: DataFrame, idCol: String = "doc_id",
                   payloadCol: String = "payload",
                   maxEntries: Int = 1 << 16): DataFrame =
    docs.select(col(idCol),
        posexplode(graft.functions.SevenZipList(col(payloadCol),
          maxEntries)).as(Seq("entry_idx", "__e")))
      .select(col(idCol), col("entry_idx").cast("long").as("entry_idx"),
        col("__e.name").as("name"), col("__e.size").as("size"),
        col("__e.is_dir").as("is_dir"))

  /** 7z member EXTRACTION — [[sevenZipList]] plus each member's
    * decompressed bytes via [[graft.functions.SevenZipMembers]]:
    * single-coder COPY/LZMA/LZMA2/BZIP2/DEFLATE folders decode (the
    * source-release shape), substream CRCs verified; multi-coder/
    * filtered folders keep their rows with `data` null (the
    * documented listing-tier refusal), directories null, corrupt
    * archives contribute no rows. One bounded kernel call per
    * archive (solid folders decode once), zero shuffle. */
  def sevenZipMembers(docs: DataFrame, idCol: String = "doc_id",
                      payloadCol: String = "payload",
                      maxEntries: Int = 1 << 16,
                      maxOut: Int = 1 << 26): DataFrame =
    docs.select(col(idCol),
        posexplode(graft.functions.SevenZipMembers(col(payloadCol),
          maxEntries, maxOut)).as(Seq("entry_idx", "__e")))
      .select(col(idCol), col("entry_idx").cast("long").as("entry_idx"),
        col("__e.name").as("name"), col("__e.size").as("size"),
        col("__e.is_dir").as("is_dir"), col("__e.data").as("data"))

  /** Arrow IPC file (feather v2) footer census — version, the
    * dictionary/record-batch block lists and column names off the
    * footer flatbuffer ([[graft.functions.ArrowFooterMeta]]), no
    * batch data touched. */
  /** Arrow IPC FILE data decode — the third columnar-values member
    * next to [[parquetPageValues]] and [[orcColumnValues]]: a named
    * top-level column's values out of every record batch, both
    * envelope generations, validity-restored nulls
    * ([[graft.functions.ArrowColumnValues]]). */
  def arrowColumnValues(payload: Column, column: String,
                        maxVals: Int = 1 << 16): Column =
    graft.functions.ArrowColumnValues(payload, column, maxVals)

  def arrowMeta(payload: Column, maxColumns: Int = 4096): Column =
    graft.functions.ArrowFooterMeta(payload, maxColumns)

  /** ORC per-stripe census — offset/index/data/footer lengths and
    * EXACT rows per stripe off the footer's StripeInformation
    * messages ([[graft.functions.OrcStripeStats]]): the split-planner
    * and skew-audit numbers, no stripe data touched. */
  def orcStripes(payload: Column, maxFooter: Int = 1 << 24): Column =
    graft.functions.OrcStripeStats(payload, maxFooter)

  /** Avro OCF embedded schema — the lake format that CARRIES its
    * schema: the `avro.schema` JSON from the file-metadata map
    * ([[graft.functions.AvroSchemaJson]], full Avro binary map
    * encoding, fail-closed), ready for an explicit-schema Avro read.
    * `sniff → avro_schema → read` needs no library probe pass. */
  def avroSchema(payload: Column, maxLen: Int = 1 << 20): Column =
    graft.functions.AvroSchemaJson(payload, maxLen)

  /** Avro OCF block census — the EXACT row count, block count and
    * payload bytes straight off the block framing (count + size +
    * sync per block), no datum decoded, any codec
    * ([[graft.functions.AvroBlocks]]): avro's counterpart of
    * [[parquetMeta]]'s `num_rows`. */
  def avroBlocks(payload: Column, maxBlocks: Int = 1 << 20): Column =
    graft.functions.AvroBlocks(payload, maxBlocks)

  /** EPUB package metadata — the book-corpus tier behind [[zipMeta]]'s
    * `epub` label, resolved the way the spec says (and a fixed member
    * name cannot): `META-INF/container.xml` NAMES the OPF package
    * member per book, so the second extraction runs through the
    * per-row-name kernel ([[graft.functions.ZipEntryBytesAt]]);
    * Dublin Core `dc:title`/`dc:creator`/`dc:language` then come out
    * of the OPF with entities decoded. Each extraction is aliased in
    * its own projection (one walk per row per member — the
    * CollapseProject boundary). Books without a container/OPF yield
    * null fields. Output (idCol, opf_path, title, creator,
    * language). */
  def epubMeta(docs: DataFrame, idCol: String = "doc_id",
               payloadCol: String = "payload",
               maxBytes: Int = 1 << 24): DataFrame = {
    def dc(tag: String): Column = {
      val v = regexp_extract(col("__opf"),
        s"(?s)<dc:$tag[^>]*>[ \\t\\n\\r]*(.*?)[ \\t\\n\\r]*</dc:$tag>", 1)
      when(v =!= "", TextAnalysis.decodeEntities(v)).as(tag)
    }
    docs.select(col(idCol), col(payloadCol).as("__p"))
      .select(col(idCol), col("__p"),
        regexp_extract(graft.functions.Utf8Text(graft.functions.ZipEntryBytes(col("__p"),
            "META-INF/container.xml", maxBytes)),
          "(?s)<rootfile[^>]*full-path=\"([^\"]*)\"", 1).as("__opfp"))
      .select(col(idCol), col("__opfp"),
        graft.functions.Utf8Text(graft.functions.ZipEntryBytesAt(col("__p"),
          when(col("__opfp") =!= "", col("__opfp")), maxBytes))
          .as("__opf"))
      .select(col(idCol),
        when(col("__opfp") =!= "", col("__opfp")).as("opf_path"),
        dc("title"), dc("creator"), dc("language"))
  }

  /** EPUB chapter TEXT in spine order — the step [[epubMeta]] stops
    * short of (Dublin Core names the book; the corpus wants the
    * words): `META-INF/container.xml` names the OPF, the OPF's
    * `<spine>` lists chapter `idref`s in READING ORDER, each resolves
    * through the `<manifest>` to its `href` (both attribute orders
    * handled), hrefs resolve relative to the OPF's own directory, and
    * each chapter's XHTML extracts AT COORDINATES from the book's one
    * shared [[graft.functions.ZipEntries]] listing
    * ([[graft.functions.ZipMemberData]] — CD-primary, so streamed
    * epubs read too; no per-chapter EOCD re-scans) and cleans through
    * [[TextAnalysis.htmlToText]].
    * Chapters whose member is missing/corrupt keep their spine row
    * with NULL text (fail closed, position preserved); books without
    * a container/OPF contribute no rows. Output
    * (idCol, chapter_idx, href, text); narrow explodes, zero
    * shuffle. */
  def epubChapters(docs: DataFrame, idCol: String = "doc_id",
                   payloadCol: String = "payload",
                   maxBytes: Int = 1 << 24): DataFrame = {
    // ONE archive resolution per book (the __es alias): container,
    // OPF and every chapter extract at coordinates from it
    def memText(name: Column): Column =
      graft.functions.Utf8Text(graft.functions.ZipMemberData(col("__p"),
        try_element_at(filter(col("__es"),
          x => x.getField("name") === name), lit(1)), maxBytes))
    val withOpf = docs.select(col(idCol), col(payloadCol).as("__p"),
        graft.functions.ZipEntries(col(payloadCol), 4096).as("__es"))
      .select(col(idCol), col("__p"), col("__es"),
        regexp_extract(memText(lit("META-INF/container.xml")),
          "(?s)<rootfile[^>]*full-path=\"([^\"]*)\"", 1).as("__opfp"))
      .filter(col("__opfp") =!= "")
      .select(col(idCol), col("__p"), col("__es"), col("__opfp"),
        memText(col("__opfp")).as("__opf"))
      .filter(col("__opf").isNotNull)
    // the OPF's directory prefixes relative hrefs ("ops/pkg.opf" +
    // "ch1.xhtml" => "ops/ch1.xhtml"; a root-level OPF adds nothing)
    val opfDir = when(col("__opfp").contains("/"),
      concat(regexp_extract(col("__opfp"), "^(.*/)[^/]*$", 1)))
      .otherwise(lit(""))
    // the manifest as an (id, href) array built ONCE per book —
    // spine rows then resolve with an array filter, no per-row regex
    // the cast names the lambda's struct fields (aliases inside HOF
    // lambdas come out col1/col2)
    val items = transform(
      regexp_extract_all(col("__opf"), lit("(?s)<item [^>]*>"), lit(0)),
      tag => struct(
        regexp_extract(tag, "id=\"([^\"]*)\"", 1).as("id"),
        regexp_extract(tag, "href=\"([^\"]*)\"", 1).as("href")))
      .cast("array<struct<id:string,href:string>>")
    val spine = withOpf.select(col(idCol), col("__p"), col("__es"),
        items.as("__items"), opfDir.as("__dir"),
        posexplode(regexp_extract_all(col("__opf"),
          lit("(?s)<itemref[^>]*idref=\"([^\"]*)\""), lit(1)))
          .as(Seq("chapter_idx", "__idref")))
    val matches = filter(col("__items"),
      it => it.getField("id") === col("__idref"))
    val href = when(size(matches) > 0,
      matches.getItem(0).getField("href"))
    spine.select(col(idCol),
        col("chapter_idx").cast("long").as("chapter_idx"),
        href.as("href"), col("__p"), col("__es"), col("__dir"))
      .select(col(idCol), col("chapter_idx"), col("href"),
        when(col("href").isNotNull, TextAnalysis.htmlToText(
          memText(concat(col("__dir"), col("href"))))).as("text"))
  }

  /** XLSX shared-strings extraction — the text content of a
    * spreadsheet corpus (cell values referencing the shared table ARE
    * the document text): [[graft.functions.ZipEntryBytes]] pulls
    * `xl/sharedStrings.xml`, each `<si>` entry explodes with its
    * index (cell references are by this index), and the entry's text
    * is the concatenation of its `<t>` runs (plain entries have one,
    * rich-text entries one per `<r>` run — concatenation is exactly
    * how Excel renders them), entities decoded in
    * [[TextAnalysis.decodeEntities]]' one-pass chain. Archives
    * without the member (or malformed members) contribute no rows.
    * Output (idCol, si_idx, text); narrow explode, zero shuffle. */
  def xlsxSharedStrings(docs: DataFrame, idCol: String = "doc_id",
                        payloadCol: String = "payload",
                        maxBytes: Int = 1 << 24): DataFrame = {
    val xml = graft.functions.Utf8Text(graft.functions.ZipEntryBytes(col(payloadCol),
      "xl/sharedStrings.xml", maxBytes))
    docs.select(col(idCol),
        posexplode(regexp_extract_all(xml,
          lit("(?s)<si>(.*?)</si>"), lit(1))).as(Seq("si_idx", "__si")))
      .select(col(idCol), col("si_idx").cast("long").as("si_idx"),
        TextAnalysis.decodeEntities(array_join(
          regexp_extract_all(col("__si"),
            lit("(?s)<t[^>]*>(.*?)</t>"), lit(1)), "")).as("text"))
  }

  /** XLSX sheet-cell GRID extraction — the spreadsheet sibling of
    * [[TextAnalysis.htmlTables]] ([[xlsxSharedStrings]] yields a bag
    * of strings; real spreadsheet mining needs row/column structure):
    * every `xl/worksheets/sheetN.xml` member (found via the
    * [[graft.functions.ZipEntries]] CD-primary listing, so streamed
    * workbooks resolve too) explodes its valued `<c>` cells into
    * `(sheet, row, col, value)` — the `r="AA2"` reference split into
    * base-26 column arithmetic (A=1, Z=26, AA=27) and the row
    * number; `t="s"` cells resolve through the doc's OWN
    * shared-strings array (built once per sheet row, indexed with
    * `try_element_at` — no join, no shuffle), `t="inlineStr"` cells
    * concatenate their `<is>` runs, and plain numeric/formula cells
    * keep their `<v>` text verbatim. Entities decode in
    * [[TextAnalysis.decodeEntities]]' one-pass chain. Self-closing
    * empty cells contribute no rows; workbooks without sheets (or
    * corrupt archives) contribute none. Output
    * (idCol, sheet, row, col, value); narrow explodes over
    * doc-bounded state, zero shuffle. */
  def xlsxCells(docs: DataFrame, idCol: String = "doc_id",
                payloadCol: String = "payload",
                maxBytes: Int = 1 << 24,
                maxEntries: Int = 4096): DataFrame = {
    // ONE archive resolution per workbook (the __es alias); sheet xml
    // and the shared-strings member both extract at coordinates, and
    // the whole per-cell pipeline (reference split, base-26 column,
    // SST resolution, entity decode) is ONE native kernel call —
    // [[graft.functions.XlsxSheetCells]] replaced the former
    // per-cell Catalyst transform tree whose codegen constant
    // dominated this path at every scale factor
    val sst = coalesce(
      graft.functions.ZipMemberData(col("__p"),
        try_element_at(filter(col("__es"), x =>
          x.getField("name") === "xl/sharedStrings.xml"), lit(1)),
        maxBytes),
      lit(Array.empty[Byte]))
    val sheets = docs.select(col(idCol), col(payloadCol).as("__p"),
        graft.functions.ZipEntries(col(payloadCol), maxEntries).as("__es"))
      .select(col(idCol), col("__p"), col("__es"),
        explode(col("__es")).as("__e"))
      .filter(col("__e.name").rlike("^xl/worksheets/sheet[0-9]+\\.xml$"))
      .select(col(idCol),
        regexp_extract(col("__e.name"), "sheet([0-9]+)\\.xml$", 1)
          .cast("long").as("sheet"),
        graft.functions.XlsxSheetCells(
          graft.functions.ZipMemberData(col("__p"), col("__e"), maxBytes),
          sst).as("__cells"))
    sheets.select(col(idCol), col("sheet"),
        explode(col("__cells")).as("__c"))
      .select(col(idCol), col("sheet"),
        col("__c.row").as("row"), col("__c.col").as("col"),
        col("__c.value").as("value"))
  }

  /** XLSX sheet NAMES in workbook order — the mapping [[xlsxCells]]'
    * file-number `sheet` column needs to become user-facing:
    * `xl/workbook.xml`'s `<sheet>` elements carry the display name
    * (entity-decoded) and an `r:id` that
    * `xl/_rels/workbook.xml.rels` resolves to the worksheet member
    * path. Output (idCol, pos, name, sheet_file) in workbook order —
    * `pos` is the TAB order, which need not match the sheetN file
    * numbering. Workbooks without the members contribute no rows;
    * an unresolvable r:id keeps its row with a null sheet_file.
    * Two member extractions, narrow explode, zero shuffle. */
  def xlsxSheets(docs: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload",
                 maxBytes: Int = 1 << 24): DataFrame = {
    val wb = graft.functions.Utf8Text(graft.functions.ZipEntryBytes(
      col(payloadCol), "xl/workbook.xml", maxBytes))
    val rels = graft.functions.Utf8Text(graft.functions.ZipEntryBytes(
      col(payloadCol), "xl/_rels/workbook.xml.rels", maxBytes))
    val relPairs = transform(
      regexp_extract_all(rels, lit("(?s)<Relationship [^>]*>"), lit(0)),
      t => struct(regexp_extract(t, "Id=\"([^\"]*)\"", 1).as("id"),
        regexp_extract(t, "Target=\"([^\"]*)\"", 1).as("target")))
    docs.select(col(idCol),
        relPairs.cast("array<struct<id:string,target:string>>").as("__rp"),
        posexplode(regexp_extract_all(wb,
          lit("(?s)<sheet [^>]*/?>"), lit(0))).as(Seq("pos", "__t")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        TextAnalysis.decodeEntities(
          regexp_extract(col("__t"), "name=\"([^\"]*)\"", 1)).as("name"),
        try_element_at(filter(col("__rp"), x => x.getField("id") ===
          regexp_extract(col("__t"), "r:id=\"([^\"]*)\"", 1)), lit(1))
          .getField("target").as("sheet_file"))
  }

  /** Legacy `.xls` (BIFF8) cell grid — [[xlsxCells]]' shape for the
    * Excel 97–2003 binary tier: one row per non-blank cell,
    * `(sheet, row, col, value)` all 1-based, via the
    * [[graft.functions.XlsCells]] kernel (CFB stream walk → BIFF
    * records → SST/RK/formula-cached values). One bounded kernel
    * call per workbook, the per-cell widening a plain explode;
    * corrupt/non-BIFF8 payloads contribute no rows (the kernel's
    * fail-closed null). Zero shuffle. */
  def xlsCells(docs: DataFrame, idCol: String = "doc_id",
               payloadCol: String = "payload",
               maxBytes: Int = 1 << 24, maxCells: Int = 1 << 22): DataFrame =
    docs.select(col(idCol),
        explode(graft.functions.XlsCells(col(payloadCol), maxBytes,
          maxCells)).as("__c"))
      .select(col(idCol), col("__c.sheet").as("sheet"),
        col("__c.row").as("row"), col("__c.col").as("col"),
        col("__c.value").as("value"))

  /** OpenDocument spreadsheet cell grid — [[xlsxCells]]/[[xlsCells]]'
    * shape for the LibreOffice `.ods` tier via the native
    * [[graft.functions.OdsCells]] kernel over the package's
    * `content.xml` (repeat expansion, covered-cell skips,
    * `office:value`/text values, entity decode). One bounded kernel
    * call per workbook; corrupt packages or missing members
    * contribute no rows. Zero shuffle. */
  def odfCells(docs: DataFrame, idCol: String = "doc_id",
               payloadCol: String = "payload",
               maxBytes: Int = 1 << 24,
               maxCells: Int = 1 << 22): DataFrame =
    docs.select(col(idCol),
        explode(graft.functions.OdsCells(
          graft.functions.ZipEntryBytes(col(payloadCol), "content.xml",
            maxBytes), maxCells)).as("__c"))
      .select(col(idCol), col("__c.sheet").as("sheet"),
        col("__c.row").as("row"), col("__c.col").as("col"),
        col("__c.value").as("value"))

  /** gzip member header (RFC 1952) — the compression wrapper around
    * most crawl payloads: magic `\x1f\x8b`, compression method,
    * little-endian MTIME, OS byte, the FTEXT flag, and the optional
    * FNAME original filename (null-terminated latin1 after the
    * 10-byte header and any FEXTRA field; read bounded to 256
    * bytes). Fixed-offset slicing, zero shuffle; non-gzip payloads
    * yield a null struct. */
  def gzipMeta(payload: Column): Column = {
    val isGz = hex(substring(payload, 1, 2)) === lit("1F8B")
    val flg = beUint(payload, 4, 1)
    val xlen = when(flg.bitwiseAND(4L) =!= 0L, leUint(payload, 11, 2) + 2L)
      .otherwise(lit(0L))
    val namePos = lit(11L) + xlen
    val fname = when(flg.bitwiseAND(8L) =!= 0L,
      substring_index(
        decode(payload.substr(namePos, lit(256L)), "ISO-8859-1"),
        "\u0000", 1))
    when(isGz, struct(
      beUint(payload, 3, 1).cast("int").as("method"),
      leUint(payload, 5, 4).as("mtime"),
      beUint(payload, 10, 1).cast("int").as("os"),
      (flg.bitwiseAND(1L) =!= 0L).as("is_text"),
      fname.as("fname")))
  }

  /** Magic-byte format sniffing — the dispatcher in front of
    * [[containerMeta]] on a mixed media lake: ONE prefix scan labels
    * each payload with the container family it will parse as, so the
    * expensive per-format parser trees run only over their own
    * partitions (`sniff → repartition-by-format → containerMeta(that
    * format)` is the 100 TB shape; round 9 measured that Catalyst
    * does NOT prune unused parser trees). Distinguishes the ftyp
    * family by brand (mp4 vs heif/avif) and RIFF by its form tag
    * (wav vs webp); data-lake magics (parquet/orc/avro/sqlite) and
    * compression wrappers (gzip/zstd/xz/bzip2/7z) included; unknown
    * payloads label "unknown". Zero shuffle. */
  def sniffFormat(payload: Column): Column = {
    def pfx(hexStr: String): Column =
      hex(substring(payload, 1, hexStr.length / 2)) === lit(hexStr)
    val riffForm = hex(substring(payload, 9, 4))
    val ftypBrand = substring(payload, 9, 4).cast("string")
    when(pfx("89504E47"), "png")
      .when(pfx("FFD8FF"), "jpeg")
      .when(pfx("474946383761") || pfx("474946383961"), "gif")
      .when(pfx("52494646") && riffForm === "57415645", "wav")
      .when(pfx("464F524D") &&
        (riffForm === "41494646" || riffForm === "41494643"), "aiff")
      .when(pfx("52494646") && riffForm === "57454250", "webp")
      .when(pfx("49492A00") || pfx("4D4D002A"), "tiff")
      .when(pfx("664C6143"), "flac")
      .when(pfx("4F676753"), "ogg")
      .when(pfx("1A45DFA3"),
        when(locate("7765626D", hex(substring(payload, 1, 48))) > 0,
          "webm").otherwise("mkv"))
      .when(pfx("494433") || pfx("FFFB") || pfx("FFFA"), "mp3")
      .when(hex(substring(payload, 5, 4)) === "66747970",
        when(ftypBrand.isin("avif", "heic", "heix", "mif1"), "heif")
          .otherwise("mp4"))
      .when(pfx("255044462D"), "pdf")
      .when(pfx("504B0304"), "zip")
      .when(pfx("504B0506"), "zip_empty")
      .when(pfx("526172211A0700") || pfx("526172211A070100"), "rar")
      .when(pfx("1F8B"), "gzip")
      .when(pfx("1F9D"), "z")
      .when(pfx("EDABEEDB"), "rpm")
      .when(pfx("7F454C46"), "elf")
      .when(pfx("0061736D"), "wasm")
      .when(pfx("FEEDFACE") || pfx("FEEDFACF") || pfx("CEFAEDFE") ||
        pfx("CFFAEDFE"), "macho")
      .when(pfx("4F54544F"), "otf")
      .when(pfx("74746366"), "ttc")
      .when(pfx("00010000"), "ttf")
      .when(pfx("774F4646"), "woff")
      .when(pfx("774F4632"), "woff2")
      .when(pfx("4D546864"), "midi")
      .when(pfx("303730373031") || pfx("303730373032") ||
        pfx("303730373037"), "cpio")
      .when(pfx("213C617263683E0A"), "ar")
      .when(pfx("50415231"), "parquet")
      .when(pfx("4F5243"), "orc")
      .when(pfx("4F626A01"), "avro")
      .when(pfx("4152524F57310000"), "arrow")
      .when(pfx("53514C697465"), "sqlite")
      .when(pfx("D0CF11E0A1B11AE1"), "cfb")
      .when(pfx("7B5C727466"), "rtf")
      .when(pfx("377ABCAF271C"), "7z")
      .when(pfx("FD377A585A00"), "xz")
      .when(pfx("425A68"), "bzip2")
      .when(pfx("28B52FFD"), "zstd")
      .when(pfx("04224D18"), "lz4")
      .when(pfx("FF060000734E61507059"), "snappy")
      .when(substring(payload, 1, 5).cast("string") === "WARC/", "warc")
      // POSIX tar: the ustar magic sits at byte 257 (0-based) of the
      // first header — sniffed LAST among containers so short
      // payloads never pay the deep read
      .when(hex(substring(payload, 258, 5)) === lit("7573746172"), "tar")
      .otherwise("unknown")
  }

  /** SVG document metadata — the vector-image tier of a crawl (no
    * pixels to decode; the root tag IS the metadata): explicit
    * width/height attributes (unit suffixes like `px`/`%` tolerated —
    * the leading number is taken) and the four viewBox floats from
    * the root `<svg>` tag, split on whitespace/commas per the SVG
    * spec. Absent attributes stay null (real SVGs often carry only a
    * viewBox); double-quoted attributes (the serializer norm), text
    * without an `<svg` root yields a null struct. One regexp pass,
    * zero shuffle. */
  def svgMeta(text: Column): Column = {
    val isSvg = text.rlike("(?is)<svg[ \\t\\n\\r>]")
    val root = regexp_extract(text, "(?is)<svg\\b([^>]*)>", 1)
    def attr(name: String): Column = {
      val v = regexp_extract(root,
        "(?i)\\b" + name + "[ \\t]*=[ \\t]*\"([^\"]*)\"", 1)
      when(v =!= "", v)
    }
    def leadNum(c: Column): Column = {
      val v = regexp_extract(c, "^[ \\t]*(-?[0-9][0-9.]*)", 1)
      when(v =!= "", v.cast("double"))
    }
    val vb = split(trim(attr("viewBox")), "[ \\t\\n\\r,]+")
    val meta = struct(
      leadNum(attr("width")).as("width"),
      leadNum(attr("height")).as("height"),
      when(size(vb) === 4,
        struct(leadNum(element_at(vb, 1)).as("min_x"),
          leadNum(element_at(vb, 2)).as("min_y"),
          leadNum(element_at(vb, 3)).as("vb_width"),
          leadNum(element_at(vb, 4)).as("vb_height"))).as("view_box"))
    when(isSvg, meta)
  }

  /** Scan a media frame, attaching parsed container metadata columns —
    * the real half of "decode": header fields come from the bytes
    * themselves, only pixel/sample decoding remains stubbed. Covers
    * the containers web crawls actually carry: PNG, WAV, JPEG, GIF,
    * WebP, TIFF, MP4, HEIF/AVIF, FLAC, MP3, PDF, ZIP/OOXML, gzip —
    * one narrow projection over a mixed media lake, filter by
    * `<fmt>.width IS NOT NULL`.
    *
    * `formats` restricts which parser expression trees are built at
    * all: Catalyst does NOT prune the unused struct columns out of a
    * multi-parser projection (each format's whole tree is evaluated
    * per row even when the query consumes one field — measured 4× on
    * the single-format queries, round 9), so a caller that knows its
    * format must say so. */
  def containerMeta(media: DataFrame,
                    formats: Seq[String] = ContainerFormats): DataFrame = {
    val parsers = Map[String, Column => Column](
      "png" -> (pngMeta(_)), "wav" -> (wavMeta(_)), "jpeg" -> (jpegMeta(_)),
      "gif" -> (gifMeta(_)), "webp" -> (webpMeta(_)), "tiff" -> (tiffMeta(_)),
      "mp4" -> (mp4Meta(_)), "heif" -> (heifMeta(_)),
      "flac" -> (flacMeta(_)), "mp3" -> (mp3Meta(_)),
      "pdf" -> (pdfMeta(_)), "zip" -> (zipMeta(_)),
      "gzip" -> (gzipMeta(_)))
    val unknown = formats.filterNot(parsers.contains)
    require(unknown.isEmpty, s"unknown container formats: ${unknown.mkString(",")}")
    media.select(
      col("media_id") +:
        length(col("payload")).cast("long").as("n_bytes") +:
        formats.map(f => parsers(f)(col("payload")).as(f)): _*)
  }

  /** Every format [[containerMeta]] can parse, in its default column
    * order. */
  val ContainerFormats: Seq[String] =
    Seq("png", "wav", "jpeg", "gif", "webp", "tiff", "mp4", "heif",
      "flac", "mp3", "pdf", "zip", "gzip")

  /** PNG pixel-stream bytes: the CONCATENATED data of every IDAT
    * chunk, walked chunk-by-chunk (`pos → pos + 12 + len`: length,
    * tag, data, CRC) from after the 8-byte signature — so two PNGs
    * with identical pixels but different ancillary chunks (tEXt
    * comments, tIME stamps, gAMA…) produce identical bytes. Bounded
    * fold over `maxChunks` steps; stops at IEND or a truncated
    * length. Null for non-PNG payloads. */
  private def pngContentBytes(payload: Column, maxChunks: Int): Column = {
    val isPng = hex(substring(payload, 1, 8)) === lit("89504E470D0A1A0A")
    def st(pos: Column, dat: Column, done: Column): Column =
      struct(pos.as("pos"), dat.as("dat"), done.as("done"))
    val init = st(lit(9L), lit(Array.empty[Byte]), lit(false))
    val state = aggregate(sequence(lit(1), lit(maxChunks)), init, (acc, _) => {
      val pos = acc.getField("pos")
      val dat = acc.getField("dat")
      val len = beUintAt(payload, pos, 4)
      val tag = hex(payload.substr(pos + 4, lit(4)))
      val doneSt = st(pos, dat, lit(true))
      when(acc.getField("done"), acc)
        .when(len.isNull || tag === lit("49454E44"), doneSt) // IEND / truncated
        .when(tag === lit("49444154"),                       // IDAT
          st(pos + 12 + len, concat(dat, payload.substr(pos + 8, len)), lit(false)))
        .otherwise(st(pos + 12 + len, dat, lit(false)))
    })
    when(isPng, state.getField("dat"))
  }

  /** JPEG entropy-coded bytes: everything from after the SOS header to
    * the EOI marker — APPn/EXIF blobs, comments and quantization-table
    * reshuffles (the bytes that differ between "the same photo saved
    * twice") are all pre-SOS and excluded. Reuses [[jpegMeta]]'s
    * marker-segment walk, stopping at SOS instead of SOF. Null for
    * non-JPEG payloads or when no SOS appears in `maxSegments`. */
  private def jpegContentBytes(payload: Column, maxSegments: Int): Column = {
    val isJpeg = hex(substring(payload, 1, 2)) === lit("FFD8")
    def st(pos: Column, start: Column, dead: Column): Column =
      struct(pos.as("pos"), start.as("start"), dead.as("dead"))
    val init = st(lit(3L), lit(null).cast("long"), lit(false))
    val state = aggregate(sequence(lit(1), lit(maxSegments)), init, (acc, _) => {
      val pos = acc.getField("pos")
      val ff = byteAt(payload, pos)
      val m = byteAt(payload, pos + 1)
      val segLen = beUintAt(payload, pos + 2, 2)
      val deadSt = st(pos, lit(null).cast("long"), lit(true))
      when(acc.getField("start").isNotNull || acc.getField("dead"), acc)
        .when(ff.isNull || ff =!= 255L || m.isNull ||
          m === 217L || (m >= 208L && m <= 215L), deadSt)
        .when(m === 218L, // SOS: entropy data starts after its header
          when(segLen.isNull, deadSt)
            .otherwise(st(pos, pos + 2 + segLen, lit(false))))
        .when(segLen.isNull, deadSt)
        .otherwise(st(pos + 2 + segLen, lit(null).cast("long"), lit(false)))
    })
    val start = state.getField("start")
    // strip the trailing EOI so padding after FFD9 can't split dups
    val hasEoi = hex(payload.substr(length(payload) - 1, lit(2))) === lit("FFD9")
    val dataLen = when(hasEoi, length(payload) - start - 1)
      .otherwise(length(payload) - start + 1)
    when(isJpeg && start.isNotNull, payload.substr(start, dataLen))
  }

  /** WAV sample bytes: the data-chunk payload of a CANONICAL RIFF
    * file (fmt at 13, data at 37 — [[wavMeta]]'s layout assumption),
    * so re-tagged copies with identical samples fingerprint equal.
    * Null when the layout doesn't match. */
  private def wavContentBytes(payload: Column): Column = {
    val isWav = hex(substring(payload, 1, 4)) === lit("52494646") &&
      hex(substring(payload, 9, 8)) === lit("57415645666D7420") &&
      hex(substring(payload, 37, 4)) === lit("64617461")
    val dataLen = leUint(payload, 41, 4)
    when(isWav, payload.substr(lit(45L), dataLen))
  }

  /** BMP metadata (BITMAPFILEHEADER + BITMAPINFOHEADER): width,
    * height, bits-per-pixel, compression, pixel-array offset — all
    * little-endian at fixed offsets. Non-BMP payloads yield nulls. */
  def bmpMeta(payload: Column): Column = {
    val isBmp = hex(substring(payload, 1, 2)) === lit("424D")
    when(isBmp, struct(
      leUint(payload, 19, 4).cast("int").as("width"),
      leUint(payload, 23, 4).cast("int").as("height"),
      leUint(payload, 29, 2).cast("int").as("bpp"),
      leUint(payload, 31, 4).cast("int").as("compression"),
      leUint(payload, 11, 4).as("pixel_offset")))
  }

  /** Difference hash (dHash) over REAL decoded pixels — the
    * perceptual image near-dup tier, computable without any codec
    * library for 24-bit UNCOMPRESSED BMP (raw BGR bytes at integer
    * offsets; JPEG/PNG stay behind the declared codec stub). The
    * classic dHash resizes to 9×8 grayscale and emits the horizontal
    * gradient sign; this variant samples the 9×8 grid at
    * nearest-pixel positions (`x_i = ⌊i·(w−1)/8⌋`,
    * `y_j = ⌊j·(h−1)/7⌋`) — equal hashes for re-encoded copies,
    * Hamming-near for brightness shifts and small crops, which is
    * exactly what [[graft.ext.Dedup]]'s pigeonhole simhash machinery
    * consumes: band the returned long with `simhashNearDup64`'s
    * block scheme for image near-dup pairs at scale. Integer luma
    * (299·R + 587·G + 114·B), bottom-up row order per the BMP spec,
    * bit (j,i) = luma(x_{i+1}, y_j) > luma(x_i, y_j), packed
    * little-endian (`Σ bit · 2^(8j+i)`).
    *
    * Runs as the NATIVE codegen'd kernel
    * [[graft.functions.BmpDhash]] — a HOF-composed form of the same
    * arithmetic evaluates interpreted (higher-order functions are
    * CodegenFallback) at ~50 ms/row, three orders of magnitude off
    * scan speed. Null for non-BMP, compressed, non-24-bit, or
    * truncated payloads. */
  def bmpDhash(payload: Column): Column =
    graft.functions.BmpDhash(payload)

  /** dHash over REAL decoded PNG pixels — closes the codec gap for
    * the format web corpora are actually made of. The IDAT stream is
    * zlib (public JVM `Inflater`), scanline defiltering
    * (None/Sub/Up/Average/Paeth) is byte arithmetic, and the grid /
    * luma / bit packing are EXACTLY [[bmpDhash]]'s — a PNG and a BMP
    * of the same pixels hash EQUAL, so both formats near-dup together
    * through one [[imageNearDupPairs]] pass. 8-bit gray / gray+alpha
    * / RGB / RGBA / palette (color type 3, PLTE-resolved — the
    * indexed web-graphics shape), non-interlaced, multi-IDAT;
    * anything else (and any
    * truncation, zlib error, size mismatch, or > 2^22-pixel image —
    * the bounded-decode guard) fails closed to null. Runs as the
    * native codegen'd kernel [[graft.functions.PngDhash]]; JPEG
    * remains the documented codec stub (DCT entropy decode is a
    * genuine codec, not byte arithmetic). */
  def pngDhash(payload: Column): Column =
    graft.functions.PngDhash(payload)

  /** dHash over NATIVELY decoded JPEG pixels — the from-public-spec
    * decoder in [[graft.functions.JpegDhash]] (canonical Huffman
    * entropy decode, restart markers, a PINNED integer
    * IDCT/upsampling/color contract shared bit for bit with the
    * committed python reference), which retired the old per-JRE
    * `ImageIO` tier: JPEG hash VALUES are now deterministic ACROSS
    * engines and oracle rows can pin them. BASELINE and PROGRESSIVE
    * (SOF2 — the dominant web shape) frames both decode; a
    * progressive and sequential encode of one image hash EQUAL.
    * Identical grid/luma/packing to [[bmpDhash]]/[[pngDhash]], so a
    * JPEG save of the same image lands hamming-NEAR its lossless
    * source. Arithmetic/12-bit frames fail closed; SOF dimensions
    * are checked before pixel decode (the 2^22-pixel guard). */
  def jpegDhash(payload: Column): Column =
    graft.functions.JpegDhash(payload)

  /** dHash over REAL decoded GIF pixels — the fourth ubiquitous web
    * image format joins the family: the first image descriptor's
    * data decodes through the engine's own public-spec LZW
    * (variable-width codes, sub-block framing, interlace honored),
    * colors resolve through the local-else-global table, and the
    * grid/luma/packing are EXACTLY [[bmpDhash]]'s — a GIF, PNG and
    * BMP of the same pixels hash EQUAL. Animation frames after the
    * first are ignored by contract. Native codegen'd kernel
    * [[graft.functions.GifDhash]]; fail-closed null on truncation,
    * bad codes, missing color tables, > 2^22 pixels. */
  def gifDhash(payload: Column): Column =
    graft.functions.GifDhash(payload)

  /** dHash over UNCOMPRESSED TIFF pixels — the scan-master/
    * scientific-export tier joins the family via the native
    * [[graft.functions.TiffDhash]] IFD walk (both byte orders,
    * strip concatenation, gray both polarities + RGB/RGBA chunky);
    * compressed/tiled/planar/palette files fail closed rather than
    * mis-decode. Same grid/luma/packing as [[bmpDhash]]. */
  def tiffDhash(payload: Column): Column =
    graft.functions.TiffDhash(payload)

  /** dHash over LOSSLESS WebP pixels — the web-native format joins
    * the family via the native [[graft.functions.WebpDhash]] VP8L
    * decoder (canonical prefix codes, LZ77 plane codes, color cache,
    * all four inverse transforms); lossy `VP8 ` payloads fail closed
    * rather than approximate. Same grid/luma/packing as
    * [[bmpDhash]]. */
  def webpDhash(payload: Column): Column =
    graft.functions.WebpDhash(payload)

  /** Format-dispatched perceptual hash: BMP, PNG, JPEG, GIF,
    * uncompressed-TIFF and lossless-WebP payloads decode to the SAME
    * dHash space (identical grid/luma/packing), other formats null
    * out — one hash column for a mixed media lake, one
    * [[imageNearDupPairs]] pass across all six. */
  def imageDhash(payload: Column): Column =
    coalesce(bmpDhash(payload), pngDhash(payload), jpegDhash(payload),
      gifDhash(payload), tiffDhash(payload), webpDhash(payload))

  /** Perceptual image near-duplicate pairs over a mixed BMP/PNG media
    * frame — the image-side sibling of text simhash dedup, end to end
    * on REAL pixels: [[imageDhash]] per payload (BMP and PNG share
    * one hash space, so a BMP re-save of a PNG pairs up), then
    * `Dedup.hash64NearDupPairs`' pigeonhole-blocked candidate
    * generation and exact hamming filter. Undecodable payloads are
    * excluded (no hash, no pairs). Output (doc_a, doc_b, hamming).
    * For JPEG lakes the same pipeline applies once a decoder supplies
    * the pixel grid — only the hash column's producer changes. */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 3,
                        idCol: String = "media_id",
                        maxBucket: Int = Int.MaxValue): DataFrame =
    graft.ext.Dedup.hash64NearDupPairs(
      // materialize the (id, hash) table: the banding stage references
      // the hash column once per block plus the bucket build, and each
      // UNmaterialized reference re-runs the full 128-point pixel
      // decode per row — the hash-table persist is the standard stage
      // boundary of every fingerprint dedup pipeline here (8 bytes a
      // row, corpus-count-sized)
      // checkpoint BEFORE the null filter: pushing isnotnull through
      // the projection substitutes the full decode tree into the
      // predicate and Catalyst's constraint propagation grinds on it
      media.select(col(idCol), imageDhash(col("payload")).as("dhash"))
        .localCheckpoint()
        .filter(col("dhash").isNotNull),
      maxHamming, maxBucket)

  /** Real audio statistics from canonical PCM WAV bytes — no codec
    * library needed because PCM IS raw samples: exact duration in
    * milliseconds from the parsed fmt chunk
    * (`data_len·1000 div byte_rate` — all integer), plus peak
    * absolute amplitude and sum of |amplitude| over the first
    * `maxSamples` 16-bit samples, decoded sample-by-sample with
    * little-endian binary slicing inside one bounded fold. The
    * prefix bound keeps the per-row work constant at 100 TB scan
    * scale (document-level audio QC needs the clipping/silence
    * signal, not a full decode — lift `maxSamples` when it does).
    * All-integer outputs, exact in any engine. Non-canonical or
    * non-16-bit payloads yield a null struct.
    * Returns struct(duration_ms, n_prefix, peak_abs, sum_abs). */
  def wavAudioStats(payload: Column, maxSamples: Int = 256): Column = {
    val isWav = hex(substring(payload, 1, 4)) === lit("52494646") &&
      hex(substring(payload, 9, 8)) === lit("57415645666D7420") &&
      hex(substring(payload, 37, 4)) === lit("64617461")
    val bitsPerSample = leUint(payload, 35, 2)
    val byteRate = leUint(payload, 29, 4)
    val dataLen = leUint(payload, 41, 4)
    // exact integer duration: decimal division + floor (long / long in
    // Spark SQL is a DOUBLE divide — inexact past 2^53)
    val durationMs = floor(
      (dataLen * 1000L).cast("decimal(30,0)") / byteRate.cast("decimal(30,0)"))
      .cast("long")
    val n = least(lit(maxSamples.toLong), floor(dataLen / lit(2L)).cast("long"))
    // signed 16-bit LE sample at index i (0-based): bytes 45+2i, 46+2i
    def sample(i: Column): Column = {
      val raw = byteAt(payload, lit(45L) + i * 2) +
        byteAt(payload, lit(46L) + i * 2) * 256L
      when(raw >= 32768L, raw - 65536L).otherwise(raw)
    }
    val zero = lit(0L)
    val st = aggregate(sequence(lit(0L), n - 1),
      struct(zero.as("peak"), zero.as("sum")),
      (acc, i) => {
        val a = abs(sample(i))
        struct(greatest(acc.getField("peak"), a).as("peak"),
          (acc.getField("sum") + a).as("sum"))
      })
    // the declared data length must FIT the payload: a truncated file
    // fails closed to a null struct (the BmpDhash convention) instead
    // of emitting null stats inside a plausible-looking struct
    when(isWav && bitsPerSample === 16L && byteRate > 0L && dataLen >= 2L &&
      lit(44L) + dataLen <= length(payload),
      struct(
        durationMs.as("duration_ms"),
        n.as("n_prefix"),
        st.getField("peak").cast("long").as("peak_abs"),
        st.getField("sum").cast("long").as("sum_abs")))
  }

  /** 64-bit sign-of-delta audio fingerprint over the PCM prefix — the
    * near-dup tier connecting [[wavAudioStats]]' real decode to the
    * pigeonhole dedup machinery, the way [[bmpDhash]]/[[pngDhash]] did
    * for images: 65 grid samples over the first `maxSamples`, bit k =
    * s(idx_{k+1}) > s(idx_k). Invariant under positive gain and DC
    * offset (what a normalize/re-encode pass applies), split by any
    * real waveform change. Canonical 16-bit PCM only; truncated
    * payloads (declared data length past the bytes) fail closed.
    * Native codegen'd kernel ([[graft.functions.WavFingerprint]]). */
  def wavFingerprint(payload: Column, maxSamples: Int = 256): Column =
    graft.functions.WavFingerprint(payload, maxSamples)

  /** Audio near-duplicate pairs over a WAV media frame — re-encoded /
    * gain-shifted / DC-shifted siblings pair at hamming 0, the
    * audio-side sibling of [[imageNearDupPairs]]: [[wavFingerprint]]
    * per payload, then `Dedup.hash64NearDupPairs`' pigeonhole-blocked
    * candidates and exact hamming filter. Undecodable payloads are
    * excluded. Output (doc_a, doc_b, hamming). */
  def audioNearDupPairs(media: DataFrame, maxHamming: Int = 3,
                        idCol: String = "media_id",
                        maxBucket: Int = Int.MaxValue): DataFrame =
    graft.ext.Dedup.hash64NearDupPairs(
      // same stage boundary as imageNearDupPairs: materialize the
      // 8-bytes-a-row hash table so banding doesn't re-decode PCM
      media.select(col(idCol), wavFingerprint(col("payload")).as("fp"))
        .localCheckpoint()
        .filter(col("fp").isNotNull),
      maxHamming, maxBucket)

  /** Format-aware payload fingerprint — the EXACT-dup tier of image/
    * audio dedup: md5 over the post-header CONTENT bytes (PNG IDAT
    * stream, JPEG entropy data, WAV samples), so byte-level re-wraps
    * — new EXIF, added comments, re-tagged audio — collapse onto one
    * fingerprint while any pixel/sample change splits it. Payloads of
    * unknown format (or broken containers) hash whole, degrading to
    * plain exact dedup, and are labeled so the dedup policy can treat
    * them separately. Output (media_id, n_bytes, format, fingerprint).
    *
    * The NEAR-dup tier (pHash/dHash over decoded pixels) needs the
    * codec step this environment stubs ([[extractFeatures]]): decode
    * → downscale to 8×8 luma → DCT → sign-of-coefficient bits. The
    * Spark shape would be identical — one narrow projection producing
    * a 64-bit column, then [[Dedup.simhashNearDupPairs]]' pigeonhole
    * banding on it — so the slot is reserved, not designed around.
    *
    * Narrow, zero shuffles, codegen'd binary slicing end to end —
    * scan speed over a 100 TB media lake. */
  def payloadFingerprint(media: DataFrame, maxChunks: Int = 64): DataFrame = {
    val p = col("payload")
    val png = pngContentBytes(p, maxChunks)
    val jpeg = jpegContentBytes(p, maxChunks)
    val wav = wavContentBytes(p)
    val mp4 = mp4ContentBytes(p, maxChunks)
    val flac = flacContentBytes(p, maxChunks)
    val mp3 = mp3ContentBytes(p)
    val format = when(png.isNotNull, "png")
      .when(jpeg.isNotNull, "jpeg")
      .when(wav.isNotNull, "wav")
      .when(mp4.isNotNull, "mp4")
      .when(flac.isNotNull, "flac")
      .when(mp3.isNotNull, "mp3") // weakest gate (2-byte sync): probed last
      .otherwise("other")
    media.select(col("media_id"),
      length(p).cast("long").as("n_bytes"),
      format.as("format"),
      md5(coalesce(png, jpeg, wav, mp4, flac, mp3, p)).as("fingerprint"))
  }

  /** FLAC audio-frame bytes: everything after the metadata-block
    * chain (STREAMINFO, padding, vorbis comments, pictures — the
    * bytes that differ between "the same recording re-tagged") —
    * walked block-by-block (`pos → pos + 4 + len`) until the
    * last-block flag (high bit of the block-type byte). Null for
    * non-FLAC payloads or truncated chains. */
  private def flacContentBytes(payload: Column, maxBlocks: Int): Column = {
    val isFlac = hex(substring(payload, 1, 4)) === lit("664C6143")
    val nul = lit(null).cast("long")
    def st(pos: Column, found: Column): Column =
      struct(pos.as("pos"), found.as("found"))
    val walk = aggregate(sequence(lit(1), lit(maxBlocks)),
      st(lit(5L), nul), (acc, _) => {
        val pos = acc.getField("pos")
        val f = acc.getField("found")
        val b = byteAt(payload, pos)
        val len = beUintAt(payload, pos + 1L, 3)
        when(f.isNotNull || b.isNull || len.isNull, acc)
          .when(b >= 128L, st(pos, pos + 4L + len)) // last-block flag
          .otherwise(st(pos + 4L + len, nul))
      })
    val s = walk.getField("found")
    when(isFlac && s.isNotNull,
      payload.substr(s, length(payload).cast("long") - s + 1L))
  }

  /** MP3 frame bytes: the stream after any leading ID3v2 tag — the
    * tag carries titles/artists/cover art (the bytes that differ
    * between "the same encode re-tagged"), the frames carry the
    * audio. Gated on a valid frame sync at the computed start. */
  private def mp3ContentBytes(payload: Column): Column = {
    val hasId3 = substring(payload, 1, 3).cast("string") === "ID3"
    val id3Size = shiftleft(beUint(payload, 7, 1), 21) +
      shiftleft(beUint(payload, 8, 1), 14) +
      shiftleft(beUint(payload, 9, 1), 7) + beUint(payload, 10, 1)
    val start = when(hasId3, id3Size + 11L).otherwise(lit(1L))
    val sync = byteAt(payload, start) === 255L &&
      shiftright(byteAt(payload, start + 1L), 5) === 7L
    when(sync, payload.substr(start, length(payload).cast("long") - start + 1L))
  }

  /** UTF-8 encoding QA over binary payloads — the gate a crawl
    * pipeline runs before any text operator touches a fetched body
    * (mis-declared charsets, truncated fetches, binary-in-text):
    * the native [[graft.functions.Utf8Stats]] kernel validates RFC
    * 3629 well-formedness exactly (shortest form, no surrogates,
    * ≤ U+10FFFF) in one compiled pass and reports decoded-codepoint
    * and replacement-event counts (Unicode maximal-subpart rule) plus
    * the strict verdict. Narrow codegen'd scan, zero shuffle. */
  def encodingStats(media: DataFrame): DataFrame =
    media.select(col("media_id"),
        graft.functions.Utf8Stats(col("payload")).as("__s"))
      .select(col("media_id"),
        col("__s.n_bytes").as("n_bytes"),
        col("__s.n_chars").as("n_chars"),
        col("__s.n_invalid").as("n_invalid"),
        (col("__s.n_invalid") === 0L).as("is_valid_utf8"))

  /** MP4 sample-data bytes: the payload of the first top-level `mdat`
    * box — the part that carries the encoded media, while `ftyp`
    * brands, `free` padding and `moov` metadata (titles, timestamps,
    * track ordering — the bytes that differ between "the same video
    * re-muxed twice") all drop out. One bounded sibling walk, no
    * descent needed: `mdat` is always top-level. Null for non-MP4
    * payloads or when no `mdat` appears in `maxBoxes`. */
  private def mp4ContentBytes(payload: Column, maxBoxes: Int): Column = {
    val isMp4 = hex(substring(payload, 5, 4)) === lit("66747970")
    val end = length(payload).cast("long") + 1L
    val nul = lit(null).cast("long")
    def st(pos: Column, found: Column): Column =
      struct(pos.as("pos"), found.as("found"))
    val walk = aggregate(sequence(lit(1), lit(maxBoxes)),
      st(lit(1L), nul), (acc, _) => {
        val pos = acc.getField("pos")
        val f = acc.getField("found")
        val sz = beUintAt(payload, pos, 4)
        val tag = hex(payload.substr(pos + 4, lit(4)))
        when(f.isNotNull, acc)
          .when(pos + 7L > end || sz.isNull || sz < 8L, st(end + 1L, f))
          .when(tag === lit("6D646174"), st(pos, pos)) // mdat
          .otherwise(st(pos + sz, f))
      })
    val m = walk.getField("found")
    when(isMp4 && m.isNotNull,
      payload.substr(m + 8L, beUintAt(payload, m, 4) - 8L))
  }
}
