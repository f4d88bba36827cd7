package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, GZIPOutputStream}

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GunzipPayloadSpec extends SparkSpec {
  import spark.implicits._

  private def gzip(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(data); g.close()
    bos.toByteArray
  }

  /** Hand-built member with a STORED deflate block — the shape the
    * oracle fixtures synthesize (no compressor needed engine-side). */
  private def storedGzip(data: Array[Byte], flg: Int = 0,
                         fname: Array[Byte] = Array.empty): Array[Byte] = {
    require(data.length < 65536)
    val crc = new CRC32(); crc.update(data)
    val c = crc.getValue
    val len = data.length
    val bos = new ByteArrayOutputStream()
    bos.write(Array(0x1f, 0x8b, 8, flg, 0, 0, 0, 0, 0, 0xff)
      .map(_.toByte))
    if ((flg & 8) != 0) { bos.write(fname); bos.write(0) }
    bos.write(Array(1, len & 0xff, (len >> 8) & 0xff,
      ~len & 0xff, (~len >> 8) & 0xff).map(_.toByte))
    bos.write(data)
    bos.write(Array(c & 0xff, (c >> 8) & 0xff, (c >> 16) & 0xff,
      (c >> 24) & 0xff).map(_.toLong.toByte))
    bos.write(Array(len & 0xff, (len >> 8) & 0xff, (len >> 16) & 0xff,
      (len >> 24) & 0xff).map(_.toByte))
    bos.toByteArray
  }

  test("gunzip: real GZIPOutputStream member round-trips; fname header skipped") {
    val text = "WARC/1.0\r\nWARC-Type: response\r\n\r\nhello body " * 20
    val got = GunzipPayload.compute(gzip(text.getBytes("UTF-8")), 1 << 20)
    assert(new String(got, "UTF-8") == text)
    val named = storedGzip("abc".getBytes, flg = 8, fname = "f.txt".getBytes)
    assert(new String(GunzipPayload.compute(named, 1024)) == "abc")
  }

  test("gunzip: stored-block member (the fixture shape) round-trips through the Column API") {
    val data = "synthesized warc record body"
    val df = Seq((1L, storedGzip(data.getBytes("UTF-8")))).toDF("id", "gz")
    val out = df.select(
      GunzipPayload(col("gz")).cast("string").as("txt")).collect()(0)
    assert(out.getString(0) == data)
  }

  test("gunzip fails closed: bad magic, truncation, CRC corrupt, over-cap, null") {
    val ok = gzip(("x" * 1000).getBytes)
    assert(GunzipPayload.compute(ok, 1 << 20) != null)
    // wrong magic
    val bad = ok.clone(); bad(0) = 0x42
    assert(GunzipPayload.compute(bad, 1 << 20) == null)
    // truncated mid-stream (drop trailer + some data)
    assert(GunzipPayload.compute(ok.take(ok.length - 12), 1 << 20) == null)
    // corrupt CRC byte in the trailer
    val crcBad = ok.clone(); crcBad(ok.length - 6) = (crcBad(ok.length - 6) ^ 0x55).toByte
    assert(GunzipPayload.compute(crcBad, 1 << 20) == null)
    // decompression past the cap is rejected, never clipped
    assert(GunzipPayload.compute(ok, 999) == null)
    assert(GunzipPayload.compute(ok, 1000) != null)
    // tiny/garbage buffers
    assert(GunzipPayload.compute(Array[Byte](0x1f, 0x8b.toByte, 8), 64) == null)
    val nullRow = Seq((1L, null: Array[Byte])).toDF("id", "gz")
      .select(GunzipPayload(col("gz")).as("p")).collect()(0)
    assert(nullRow.isNullAt(0))
    // the single-member form refuses trailing bytes (use GunzipMembers)
    assert(GunzipPayload.compute(ok ++ ok, 1 << 20) == null)
  }

  test("gunzip_members: concatenated archive walks in order; any bad member, " +
    "trailing garbage or member-count cap fails the whole row") {
    val parts = Seq("first record", "second", "third one here")
    val archive = parts.flatMap(p => gzip(p.getBytes("UTF-8"))).toArray
    val got = GunzipPayload.computeMembers(archive, 16, 1 << 20, 1L << 28)
    assert(got != null && got.numElements() == 3)
    val texts = (0 until 3).map(i => new String(got.getBinary(i), "UTF-8"))
    assert(texts == parts)
    // member-count cap
    assert(GunzipPayload.computeMembers(archive, 2, 1 << 20, 1L << 28) == null)
    // corrupt the middle member's magic (member 2 starts right after
    // member 1 — same compressor, same length)
    val off = gzip(parts(0).getBytes("UTF-8")).length
    val bad = archive.clone(); bad(off) = 0x42
    assert(GunzipPayload.computeMembers(bad, 16, 1 << 20, 1L << 28) == null)
    // trailing garbage after the last member
    assert(GunzipPayload.computeMembers(archive ++ Array[Byte](1, 2), 16,
      1 << 20, 1L << 28) == null)
    // column form over a stored-block archive
    val sb = (storedGzip("x1".getBytes) ++ storedGzip("y22".getBytes))
    val row = Seq((1L, sb)).toDF("id", "gz")
      .select(GunzipMembers(col("gz")).as("ms")).collect()(0)
    assert(row.getSeq[Array[Byte]](0).map(new String(_)).toSeq
      == Seq("x1", "y22"))
  }

  test("gunzip_members: aggregate output cap trips on a concatenated bomb " +
    "whose members each pass the per-member cap") {
    // 8 members of 1000 bytes each: per-member cap 4096 never trips,
    // but the 8000-byte aggregate crosses a 4 KiB total cap
    val member = gzip(("z" * 1000).getBytes)
    val archive = Array.fill(8)(member).flatten
    assert(GunzipPayload.computeMembers(archive, 16, 4096, 4096L) == null)
    // same archive under a roomy total cap reads clean
    val ok = GunzipPayload.computeMembers(archive, 16, 4096, 1L << 20)
    assert(ok != null && ok.numElements() == 8)
  }
}
