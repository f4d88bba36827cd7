package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.file.Files

import org.apache.commons.compress.archivers.sevenz.{SevenZArchiveEntry, SevenZMethod, SevenZOutputFile}
import graft.SparkSpec

/** 7z listing over REAL commons-compress archives (plain headers) and
  * a hand-wrapped LZMA-ENCODED header compressed with xz-java —
  * names, sizes, directory flags, multi-file substreams; CRC and
  * fail-closed batteries. */
class SevenZipSpec extends SparkSpec {

  private def buildArchive(method: SevenZMethod): Array[Byte] = {
    val f = Files.createTempFile("graft", ".7z").toFile
    val z = new SevenZOutputFile(f)
    z.setContentCompression(method)
    val dir = new SevenZArchiveEntry
    dir.setName("docs")
    dir.setDirectory(true)
    z.putArchiveEntry(dir)
    z.closeArchiveEntry()
    val e1 = new SevenZArchiveEntry
    e1.setName("docs/a.txt")
    z.putArchiveEntry(e1)
    z.write("hello seven zip".getBytes("UTF-8"))
    z.closeArchiveEntry()
    val e2 = new SevenZArchiveEntry
    e2.setName("b.bin")
    z.putArchiveEntry(e2)
    z.write(Array.fill(100)(7.toByte))
    z.closeArchiveEntry()
    val e3 = new SevenZArchiveEntry
    e3.setName("empty.txt")
    z.putArchiveEntry(e3)
    z.closeArchiveEntry()
    z.close()
    val bytes = Files.readAllBytes(f.toPath)
    f.delete()
    bytes
  }

  private def entries(b: Array[Byte]): Seq[(String, Long, Boolean)] = {
    val r = SevenZipList.compute(b, 1 << 16, 1 << 24)
    if (r == null) null
    else (0 until r.numElements()).map { i =>
      val e = r.getStruct(i, 3)
      (e.getUTF8String(0).toString, e.getLong(1), e.getBoolean(2))
    }
  }

  test("7z listing: real commons-compress archives under LZMA2, LZMA, " +
    "COPY, BZIP2 and DEFLATE content — names, sizes, dir flags") {
    for (m <- Seq(SevenZMethod.LZMA2, SevenZMethod.LZMA, SevenZMethod.COPY,
      SevenZMethod.BZIP2, SevenZMethod.DEFLATE)) {
      val got = entries(buildArchive(m))
      assert(got != null, s"method $m")
      assert(got.toSet == Set(
        ("docs", 0L, true),
        ("docs/a.txt", 15L, false),
        ("b.bin", 100L, false),
        ("empty.txt", 0L, false)), s"method $m: $got")
    }
  }

  test("7z listing: an LZMA-ENCODED header (the 7z CLI default) " +
    "decodes through the engine's own LZMA machinery") {
    val plain = buildArchive(SevenZMethod.COPY)
    // locate the plain next header and re-wrap it as kEncodedHeader
    def le64(b: Array[Byte], p: Int): Long =
      (0 until 8).map(i => (b(p + i) & 0xffL) << (8 * i)).sum
    val nextOff = le64(plain, 12)
    val nextSize = le64(plain, 20)
    val hdr = java.util.Arrays.copyOfRange(plain,
      (32 + nextOff).toInt, (32 + nextOff + nextSize).toInt)
    val body = java.util.Arrays.copyOfRange(plain, 32, (32 + nextOff).toInt)
    // compress the header with raw LZMA1 (xz-java), props lc3 lp0 pb2
    val opts = new org.tukaani.xz.LZMA2Options()
    val cbos = new ByteArrayOutputStream()
    val lz = new org.tukaani.xz.LZMAOutputStream(cbos, opts, false)
    lz.write(hdr); lz.close()
    val packed = cbos.toByteArray
    // kernel-level first: the raw LZMA1 round-trip must hold
    val propByte0 = ((opts.getPb * 5 + opts.getLp) * 9 + opts.getLc).toByte
    val raw = XzPayload.lzma1(packed, 0, packed.length, hdr.length,
      propByte0 & 0xff, 1 << 24)
    assert(raw != null, "raw lzma1 decode refused")
    assert(java.util.Arrays.equals(raw, hdr), "raw lzma1 mismatch")
    def num(v: Long): Array[Byte] = {
      // the spec's variable-length uint, two-byte tier is enough here
      require(v >= 0 && v < (1 << 14), "test num helper range")
      if (v < 0x80) Array(v.toByte)
      else Array((0x80 | (v >> 8)).toByte, (v & 0xff).toByte)
    }
    val propByte = ((opts.getPb * 5 + opts.getLp) * 9 + opts.getLc).toByte
    val props = Array[Byte](propByte) ++
      (0 until 4).map(i => ((opts.getDictSize >> (8 * i)) & 0xff).toByte)
    val tree = Array[Byte](0x17) ++
      Array[Byte](0x06) ++ num(body.length) ++ num(1) ++
      Array[Byte](0x09) ++ num(packed.length) ++ Array[Byte](0x00) ++
      Array[Byte](0x07, 0x0B) ++ num(1) ++ Array[Byte](0x00) ++
      Array[Byte](0x01, 0x23, 0x03, 0x01, 0x01) ++ num(props.length) ++
      props ++
      Array[Byte](0x0C) ++ num(hdr.length) ++ Array[Byte](0x00, 0x00)
    val out = new ByteArrayOutputStream()
    out.write(plain, 0, 12)
    // Long shifts: an Int >> 32 silently wraps to >> 0
    val newNextOff = (body.length + packed.length).toLong
    (0 until 8).foreach(i =>
      out.write(((newNextOff >> (8 * i)) & 0xff).toInt))
    (0 until 8).foreach(i =>
      out.write(((tree.length.toLong >> (8 * i)) & 0xff).toInt))
    val crc = new java.util.zip.CRC32()
    crc.update(tree)
    (0 until 4).foreach(i => out.write(((crc.getValue >> (8 * i)) & 0xff).toInt))
    out.write(body)
    out.write(packed)
    out.write(tree)
    val wrapped = out.toByteArray
    // fix the start-header CRC? — the kernel does not read it; the
    // NEXT-header CRC (verified) is correct by construction
    val got = entries(wrapped)
    assert(got != null, s"encoded header refused: plainNextOff=$nextOff " +
      s"plainNextSize=$nextSize body=${body.length} packed=${packed.length} " +
      s"tree=${tree.length} wrapped=${wrapped.length} " +
      s"expectHdrStart=${32 + body.length + packed.length} " +
      s"wrappedNextOff=${le64(wrapped, 12)} " +
      s"wrappedNextSize=${le64(wrapped, 20)}")
    assert(got.toSet == Set(
      ("docs", 0L, true),
      ("docs/a.txt", 15L, false),
      ("b.bin", 100L, false),
      ("empty.txt", 0L, false)), got)
  }

  test("7z listing fails closed: signature, next-header CRC flip, " +
    "truncation, unsupported coder in an encoded header") {
    val a = buildArchive(SevenZMethod.LZMA2)
    val badSig = a.clone(); badSig(0) = 'X'
    assert(entries(badSig) == null)
    val badCrc = a.clone()
    badCrc(28) = (badCrc(28) ^ 1).toByte
    assert(entries(badCrc) == null)
    for (cut <- Seq(10, 31, a.length / 2, a.length - 1))
      assert(entries(a.take(cut)) == null, s"cut $cut")
    assert(entries("1234567".getBytes) == null)
  }

  private def members(b: Array[Byte], maxOut: Int = 1 << 26)
      : Seq[(String, Long, Boolean, Option[Array[Byte]])] = {
    val r = SevenZipList.computeMembers(b, 1 << 16, maxOut)
    if (r == null) null
    else (0 until r.numElements()).map { i =>
      val e = r.getStruct(i, 4)
      (e.getUTF8String(0).toString, e.getLong(1), e.getBoolean(2),
        if (e.isNullAt(3)) None else Some(e.getBinary(3)))
    }
  }

  test("7z member extraction: real commons-compress archives under " +
    "all five codecs decode their contents; dirs null, empty files empty") {
    for (m <- Seq(SevenZMethod.LZMA2, SevenZMethod.LZMA, SevenZMethod.COPY,
      SevenZMethod.BZIP2, SevenZMethod.DEFLATE)) {
      val got = members(buildArchive(m))
      assert(got != null, s"method $m")
      val byName = got.map(e => e._1 -> e).toMap
      assert(byName("docs")._3 && byName("docs")._4.isEmpty, s"$m dir")
      assert(byName("docs/a.txt")._4.map(new String(_, "UTF-8"))
        .contains("hello seven zip"), s"$m a.txt")
      assert(byName("b.bin")._4.exists(_.sameElements(
        Array.fill(100)(7.toByte))), s"$m b.bin")
      assert(byName("empty.txt")._4.exists(_.isEmpty), s"$m empty")
    }
  }

  /** Hand-assembled SOLID archive: ONE COPY folder holding all the
    * member bytes, substream sizes + CRCs in kSubStreamsInfo — the
    * shape the 7z CLI writes for -ms=on. */
  private def solidCopyArchive(slices: Seq[(String, Array[Byte])])
      : Array[Byte] = {
    def num(v: Long): Array[Byte] = {
      require(v >= 0 && v < 0x80, "single-byte num only in this builder")
      Array(v.toByte)
    }
    val payload = slices.flatMap(_._2).toArray
    val crcs = slices.map { case (_, d) =>
      val c = new java.util.zip.CRC32(); c.update(d); c.getValue & 0xFFFFFFFFL
    }
    val nameBlock = {
      val bos = new ByteArrayOutputStream()
      bos.write(0) // external=0
      for ((n, _) <- slices)
        bos.write((n + "\u0000").getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
      bos.toByteArray
    }
    val tree = new ByteArrayOutputStream()
    tree.write(0x01) // kHeader
    tree.write(0x04) // kMainStreamsInfo
    tree.write(0x06) // kPackInfo
    tree.write(num(0)); tree.write(num(1)) // packPos, nPack
    tree.write(0x09); tree.write(num(payload.length)) // kSize
    tree.write(0x00)
    tree.write(0x07) // kUnPackInfo
    tree.write(0x0B); tree.write(num(1)); tree.write(0x00) // kFolder, ext
    tree.write(num(1)) // 1 coder
    tree.write(0x01); tree.write(0x00) // flags: idSize 1; id = COPY
    tree.write(0x0C); tree.write(num(payload.length)) // unpack size
    tree.write(0x00)
    tree.write(0x08) // kSubStreamsInfo
    tree.write(0x0D); tree.write(num(slices.length)) // kNumUnPackStream
    tree.write(0x09) // kSize: all but the last
    for ((_, d) <- slices.dropRight(1)) tree.write(num(d.length))
    tree.write(0x0A); tree.write(1) // kCrc, allDefined
    for (c <- crcs)
      (0 until 4).foreach(i => tree.write(((c >> (8 * i)) & 0xff).toInt))
    tree.write(0x00)
    tree.write(0x00) // end kMainStreamsInfo
    tree.write(0x05) // kFilesInfo
    tree.write(num(slices.length))
    tree.write(0x11); tree.write(num(nameBlock.length)) // kName
    tree.write(nameBlock)
    tree.write(0x00)
    tree.write(0x00) // end kHeader
    val t = tree.toByteArray
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x37, 0x7A, 0xBC.toByte, 0xAF.toByte, 0x27, 0x1C,
      0, 4, 0, 0, 0, 0))
    (0 until 8).foreach(i =>
      out.write(((payload.length.toLong >> (8 * i)) & 0xff).toInt))
    (0 until 8).foreach(i =>
      out.write(((t.length.toLong >> (8 * i)) & 0xff).toInt))
    val crc = new java.util.zip.CRC32(); crc.update(t)
    (0 until 4).foreach(i => out.write(((crc.getValue >> (8 * i)) & 0xff).toInt))
    out.write(payload)
    out.write(t)
    out.toByteArray
  }

  test("7z FILTER CHAINS: real commons-compress BCJ_X86+LZMA2 and " +
    "DELTA+LZMA2 archives extract byte-identically; the raw x86 " +
    "filter round-trips against xz-java's own encoder") {
    import org.apache.commons.compress.archivers.sevenz.SevenZMethodConfiguration
    // pseudo-x86 payload: E8/E9 opcodes with small offsets — the
    // shape the BCJ encoder genuinely transforms
    val x86ish = {
      val b = new Array[Byte](4096)
      var i = 0
      while (i < b.length) { b(i) = (i * 37 + (i >> 5)).toByte; i += 1 }
      i = 16
      while (i + 5 < b.length) {
        b(i) = 0xe8.toByte
        b(i + 1) = (i * 3).toByte; b(i + 2) = (i >> 3).toByte
        b(i + 3) = 0; b(i + 4) = 0
        i += 97
      }
      b
    }
    def chained(methods: Seq[SevenZMethodConfiguration],
                payload: Array[Byte]): Array[Byte] = {
      val f = Files.createTempFile("graft-chain", ".7z").toFile
      val z = new SevenZOutputFile(f)
      z.setContentMethods(java.util.Arrays.asList(methods: _*))
      val e = new SevenZArchiveEntry
      e.setName("prog.bin")
      z.putArchiveEntry(e)
      z.write(payload)
      z.closeArchiveEntry()
      z.close()
      val bytes = Files.readAllBytes(f.toPath)
      f.delete()
      bytes
    }
    val bcjArc = chained(Seq(
      new SevenZMethodConfiguration(SevenZMethod.BCJ_X86_FILTER),
      new SevenZMethodConfiguration(SevenZMethod.LZMA2)), x86ish)
    val gotB = members(bcjArc)
    assert(gotB != null, "bcj archive refused")
    assert(gotB.head._4.exists(_.sameElements(x86ish)), "bcj bytes differ")
    val deltaArc = chained(Seq(
      new SevenZMethodConfiguration(SevenZMethod.DELTA_FILTER, 4),
      new SevenZMethodConfiguration(SevenZMethod.LZMA2)), x86ish)
    val gotD = members(deltaArc)
    assert(gotD != null, "delta archive refused")
    assert(gotD.head._4.exists(_.sameElements(x86ish)), "delta bytes differ")
    // raw-filter cross-check: xz-java's own x86 ENCODER, our decoder
    for (seed <- 1 to 5) {
      val buf = Array.tabulate[Byte](2048)(i =>
        ((i * seed * 131) ^ (i >> 2)).toByte)
      val enc = buf.clone()
      val n = new org.tukaani.xz.simple.X86(true, 0).code(enc, 0, enc.length)
      assert(n > 0)
      SevenZipList.bcjX86Decode(enc)
      assert(enc.sameElements(buf), s"seed $seed x86 roundtrip")
    }
  }

  test("7z member extraction: a SOLID folder slices substreams by " +
    "size with CRCs VERIFIED; a payload flip nulls only the hit " +
    "member; an aggregate cap refuses data but keeps the listing") {
    val a = solidCopyArchive(Seq(
      "a.txt" -> "AAAA".getBytes("UTF-8"),
      "b.txt" -> "BBBBB".getBytes("UTF-8")))
    val got = members(a)
    assert(got != null, "solid archive refused")
    assert(got.map(e => (e._1, e._2, e._3)) ==
      Seq(("a.txt", 4L, false), ("b.txt", 5L, false)))
    assert(got(0)._4.map(new String(_, "UTF-8")).contains("AAAA"))
    assert(got(1)._4.map(new String(_, "UTF-8")).contains("BBBBB"))
    // flip one byte inside b.txt's slice: its CRC refuses, a.txt keeps
    val flip = a.clone()
    flip(32 + 4 + 2) = 'X'.toByte
    val g2 = members(flip)
    assert(g2(0)._4.isDefined && g2(1)._4.isEmpty)
    // flip inside a.txt: only a.txt nulls
    val flip2 = a.clone()
    flip2(32 + 1) = 'X'.toByte
    val g3 = members(flip2)
    assert(g3(0)._4.isEmpty && g3(1)._4.isDefined)
    // a cap below the folder unpack size: listing intact, data refused
    val g4 = members(a, maxOut = 4)
    assert(g4 != null && g4.map(_._2) == Seq(4L, 5L) &&
      g4.forall(_._4.isEmpty))
  }

  /** Hand-assembled single-file archive whose CRC lives in
    * kUnpackInfo's FOLDER digests (the shape the spec allows when a
    * folder has one stream): kSubStreamsInfo's kCrc then stores ZERO
    * digests — the covered stream seeds from the folder digest. */
  private def folderCrcArchive(name: String, data: Array[Byte],
                               withSubStreams: Boolean): Array[Byte] = {
    def num(v: Long): Array[Byte] = {
      require(v >= 0 && v < 0x80, "single-byte num only in this builder")
      Array(v.toByte)
    }
    val crc = { val c = new java.util.zip.CRC32(); c.update(data)
      c.getValue & 0xFFFFFFFFL }
    val nameBlock = {
      val bos = new ByteArrayOutputStream()
      bos.write(0)
      bos.write((name + "\u0000").getBytes(
        java.nio.charset.StandardCharsets.UTF_16LE))
      bos.toByteArray
    }
    val tree = new ByteArrayOutputStream()
    tree.write(0x01) // kHeader
    tree.write(0x04) // kMainStreamsInfo
    tree.write(0x06) // kPackInfo
    tree.write(num(0)); tree.write(num(1))
    tree.write(0x09); tree.write(num(data.length))
    tree.write(0x00)
    tree.write(0x07) // kUnPackInfo
    tree.write(0x0B); tree.write(num(1)); tree.write(0x00)
    tree.write(num(1))
    tree.write(0x01); tree.write(0x00) // COPY coder
    tree.write(0x0C); tree.write(num(data.length))
    tree.write(0x0A); tree.write(1) // kCrc: FOLDER digest, allDefined
    (0 until 4).foreach(i => tree.write(((crc >> (8 * i)) & 0xff).toInt))
    tree.write(0x00)
    if (withSubStreams) {
      tree.write(0x08) // kSubStreamsInfo
      tree.write(0x0A); tree.write(1) // kCrc: allDefined, ZERO digests
      tree.write(0x00)
    }
    tree.write(0x00) // end kMainStreamsInfo
    tree.write(0x05) // kFilesInfo
    tree.write(num(1))
    tree.write(0x11); tree.write(num(nameBlock.length))
    tree.write(nameBlock)
    tree.write(0x00)
    tree.write(0x00) // end kHeader
    val t = tree.toByteArray
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x37, 0x7A, 0xBC.toByte, 0xAF.toByte, 0x27, 0x1C,
      0, 4, 0, 0, 0, 0))
    (0 until 8).foreach(i =>
      out.write(((data.length.toLong >> (8 * i)) & 0xff).toInt))
    (0 until 8).foreach(i =>
      out.write(((t.length.toLong >> (8 * i)) & 0xff).toInt))
    val hc = new java.util.zip.CRC32(); hc.update(t)
    (0 until 4).foreach(i => out.write(((hc.getValue >> (8 * i)) & 0xff).toInt))
    out.write(data)
    out.write(t)
    out.toByteArray
  }

  test("7z folder digests in kUnpackInfo: a single-stream folder's " +
    "CRC seeds the substream (with and without kSubStreamsInfo), is " +
    "VERIFIED, and the digest count excludes covered streams") {
    for (sub <- Seq(true, false)) {
      val a = folderCrcArchive("f.txt", "folder crc".getBytes, sub)
      val got = members(a)
      assert(got != null, s"withSubStreams=$sub refused")
      assert(got.map(e => (e._1, e._2)) == Seq(("f.txt", 10L)), s"$sub")
      assert(got(0)._4.map(new String(_, "UTF-8")).contains("folder crc"),
        s"withSubStreams=$sub data")
      // payload flip: the SEEDED folder CRC must catch it
      val flip = a.clone(); flip(32 + 3) = 'X'.toByte
      val g2 = members(flip)
      assert(g2 != null && g2(0)._4.isEmpty, s"withSubStreams=$sub flip")
    }
  }

  test("7z member extraction fails closed on everything the listing " +
    "refuses; multi-coder folders keep rows with null data") {
    val a = buildArchive(SevenZMethod.LZMA2)
    val badCrc = a.clone(); badCrc(28) = (badCrc(28) ^ 1).toByte
    assert(members(badCrc) == null)
    assert(members("junk".getBytes) == null)
  }

  test("documentText routes 7z: the first member whose folder " +
    "decodes to UTF-8 text surfaces; a CRC flip nulls") {
    import spark.implicits._
    val a = buildArchive(SevenZMethod.LZMA2)
    val badCrc = a.clone(); badCrc(28) = (badCrc(28) ^ 1).toByte
    val dt = graft.ext.Multimodal.documentText(
      Seq((1L, a), (2L, badCrc)).toDF("doc_id", "payload"))
      .orderBy("doc_id").collect()
    assert(dt(0).getString(1) == "7z" &&
      dt(0).getString(2) == "hello seven zip")
    assert(dt(1).getString(1) == "7z" && dt(1).isNullAt(2))
  }

  // ---- BCJ2 (round 16): fixtures from tools/make_7z_bcj2_fixture.py
  // — an independent python implementation of the range coder and
  // stream split; the decoder must reproduce the payload exactly ----

  private val bcj2CopyHex: String =
    "377abcaf271c0004da94aaf810010000000000004000000000000000ad" +
    "fdee2c42434a32206669787475726520707265616d626c653a20e82063" +
    "616c6c3020e907000000206a6d7030200f80206a63633020e82063616c" +
    "6c3120e9d6040000206a6d7031200f81206a63633120e8cb0700002063" +
    "616c6c3220e9a5090000206a6d7032200f821e030000206a63633220e8" +
    "2063616c6c3320e9740e0000206a6d7033200f83206a63633320e82063" +
    "616c6c3420e943130000206a6d7034200f84206a63633420e83e130000" +
    "2063616c6c3520e912180000206a6d7035200f85cb070000206a636335" +
    "20706c61696e207461696c2077697468206e6f206272616e636865732e" +
    "2e2e2e2e000000450000043900000c210000101500000034000001e600" +
    "00054a000006fc00b3fc166e7a0001040600040980e910100700070b01" +
    "0001140303011b0401000102030c81090a018017d16b00000501111300" +
    "63006f00640065002e00620069006e0000000000"
  private val bcj2Lzma2Hex: String =
    "377abcaf271c00042ed693e4c8000000000000004800000000000000bc" +
    "499ee9e000e800995d002110c5721c830d33bae026b2e073e9943c5b7b" +
    "ac0e2265c89f50adc5f52178ac79d6d47fcf0e20dc9910dede8085dd4c" +
    "e74ec24d45b38e8aa2785c9239467065843202ed9788b3bce021fbef2f" +
    "a43567c0ea36d48497711a1235035c187843b2a00fbf5214d3d3629cac" +
    "65114a1d8138fcdfd4325c853bfd3a038e40a545137669efc1e3eb335f" +
    "64b1b051fc530876e7d65f62dd9a150d99000000000045000004390000" +
    "0c210000101500000034000001e60000054a000006fc00b3fc166e7a00" +
    "01040600040980a110100700070b01000221210116140303011b040101" +
    "00000203040c80e981090a018017d16b0000050111130063006f006400" +
    "65002e00620069006e0000000000"
  private val bcj2PayloadHex: String =
    "42434a32206669787475726520707265616d626c653a20e82900000020" +
    "63616c6c3020e907000000206a6d7030200f8000000000206a63633020" +
    "e8fa0300002063616c6c3120e9d6040000206a6d7031200f818f010000" +
    "206a63633120e8cb0700002063616c6c3220e9a5090000206a6d703220" +
    "0f821e030000206a63633220e89c0b00002063616c6c3320e9740e0000" +
    "206a6d7033200f83ad040000206a63633320e86d0f00002063616c6c34" +
    "20e943130000206a6d7034200f843c060000206a63633420e83e130000" +
    "2063616c6c3520e912180000206a6d7035200f85cb070000206a636335" +
    "20706c61696e207461696c2077697468206e6f206272616e636865732e" +
    "2e2e2e2e"
  // payload length 265

  private def hx(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def memberData(ar: Array[Byte]): Array[Byte] = {
    val rows = SevenZipList.computeMembers(ar, 64, 1 << 24)
    assert(rows != null && rows.numElements() == 1)
    val row = rows.getStruct(0, 4)
    if (row.isNullAt(3)) null else row.getBinary(3)
  }

  test("BCJ2 four-stream folder (stored streams) reproduces the " +
    "payload byte for byte") {
    assert(java.util.Arrays.equals(memberData(hx(bcj2CopyHex)),
      hx(bcj2PayloadHex)))
  }

  test("BCJ2 behind LZMA2 via the bind pair (the real-world shape) " +
    "decodes through the folder graph") {
    assert(java.util.Arrays.equals(memberData(hx(bcj2Lzma2Hex)),
      hx(bcj2PayloadHex)))
  }

  test("BCJ2: a packed-byte flip mismatches the declared CRC — data " +
    "nulls, the row stays") {
    val flip = hx(bcj2Lzma2Hex)
    flip(40) = (flip(40) ^ 1).toByte // inside the LZMA2 packed stream
    assert(memberData(flip) == null)
  }

  test("BCJ2: a corrupted rc stream desyncs the branch decisions — " +
    "the stream-consumption check fails the folder closed") {
    // the copy archive's packed layout is main(233) call(16)
    // jump(16) rc(7): byte 297+2 is the rc code — flipping it
    // changes which branches convert, so call/jump consumption no
    // longer matches the stream lengths
    val flip = hx(bcj2CopyHex)
    flip(299) = (flip(299) ^ 0x55).toByte
    assert(memberData(flip) == null)
  }
}
