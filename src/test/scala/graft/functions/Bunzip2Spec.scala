package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Bunzip2Spec extends SparkSpec {
  import spark.implicits._

  // Reference streams produced by a stock bzip2 implementation —
  // pinned as constants so the kernel is tested against the real
  // format, not against itself.
  private val helloBz = // "hello bzip2 world", level 9
    "425A68393141592653591F4E70BA0000031980400010001664D0902000" +
      "3100D0014C034696A185D1DC8F13A0F0BB9229C28480FA7385D0"
  private val wikiBz = // "wiki dump text " * 40, level 9
    "425A68393141592653590BF3E11E00011791804000062A46C02000508069A680" +
      "A549A1A64C89E89A1322604F44D89E09B1362704D09B1302704FC5DC914E1424" +
      "02FCF84780"
  private val runsBz = // "a"*300 + "end", level 9 (RLE1 + long runs)
    "425A6839314159265359D11925BB0000029100802026010008200030C0064C6A" +
      "72458CC5F177245385090D11925BB0"
  private val emptyBz = // empty input: header + EOS only
    "425A683917724538509000000000"
  private val twoBlockBz = // "block filler 7 " * 9000 at level 1: 2 blocks
    "425A6831314159265359A74E7EE20041171980400000801B2C9000200090201A" +
      "69A02954D01B532204B51025F240973440962409644096A204B71025F2409731" +
      "02591025B4812D2409644097E6282B24CA6B26E8C5864003FD63300800001003" +
      "65920004001204034D3409AAA680DA980A95A054AFA0A95CA0A959054AC054AD" +
      "02A56C152BE82A5720A9580A95B82A56A0A9580A95F8BB9229C28483CED68FB8"

  private def un(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("bunzip2: reference streams round-trip — simple text, repeated " +
    "text, long runs (RLE1), the empty stream, and a two-block file " +
    "with the combined stream CRC") {
    assert(new String(Bunzip2.compute(un(helloBz), 1 << 20), "UTF-8")
      == "hello bzip2 world")
    assert(new String(Bunzip2.compute(un(wikiBz), 1 << 20), "UTF-8")
      == "wiki dump text " * 40)
    assert(new String(Bunzip2.compute(un(runsBz), 1 << 20), "UTF-8")
      == "a" * 300 + "end")
    assert(Bunzip2.compute(un(emptyBz), 1 << 20).length == 0)
    assert(new String(Bunzip2.compute(un(twoBlockBz), 1 << 24), "UTF-8")
      == "block filler 7 " * 9000)
  }

  test("bunzip2: concatenated streams (pbzip2/lbzip2 and Wikipedia " +
    "multistream shape) decode back-to-back, levels may differ, the " +
    "output cap is aggregate, and a truncated second stream still " +
    "fails the whole payload closed") {
    assert(new String(Bunzip2.compute(un(helloBz + wikiBz), 1 << 20), "UTF-8")
      == "hello bzip2 world" + "wiki dump text " * 40)
    // empty stream sandwiched between real ones
    assert(new String(
      Bunzip2.compute(un(helloBz + emptyBz + runsBz), 1 << 20), "UTF-8")
      == "hello bzip2 world" + "a" * 300 + "end")
    // mixed levels: level-1 two-block file then a level-9 stream
    assert(new String(Bunzip2.compute(un(twoBlockBz + helloBz), 1 << 24),
      "UTF-8") == "block filler 7 " * 9000 + "hello bzip2 world")
    // aggregate cap: each stream alone fits (17 and 303 bytes), the
    // 320-byte concatenation does not
    assert(Bunzip2.compute(un(helloBz + runsBz), 310) == null)
    // a truncated/corrupt second stream nulls the WHOLE payload
    assert(Bunzip2.compute(un(helloBz + wikiBz).dropRight(3), 1 << 20) == null)
    val both = un(helloBz + wikiBz)
    both(both.length - 2) = (both(both.length - 2) ^ 1).toByte
    assert(Bunzip2.compute(both, 1 << 20) == null)
  }

  test("bunzip2 -> wikiDumpPages -> wikitextClean: a real compressed " +
    "dump reads end to end") {
    val dumpBz = // stock bzip2 of a 2-page MediaWiki export
      "425A683931415926535955A566B10000239F805983F31F2E20560A3FEFDFCE30" +
        "00CD58251498400687A83D4D01EA3F540C9A6804AA3F529EA69A7A2640D34D31" +
        "000001EA09534A7EA434F28D0D34D000304D19034D54533544ED071A3990C970" +
        "9A48868637A05F512513B6107BF5BE578A0EBA29940241D1692905F04020A615" +
        "112038A0D0DBD8A099DAF1D2DC5A369202B8CD3C75216A98C5AF837E74A02A59" +
        "C9BD442A2965E1536D6D6190211E1E4BDE99EC4E6561D43E8F05973842C2332B" +
        "583CBA5748F782182C35B8299EE911B5A99A2B430CC3790240F63DD35B6C30A8" +
        "1B82F8E27A50C24806D1159304646828573B69FE2EE48A70A120AB4ACD62"
    val df = Seq((1L, un(dumpBz))).toDF("doc_id", "bz")
      .select(col("doc_id"), Bunzip2(col("bz")).cast("string").as("xml"))
    val pages = graft.ext.TextAnalysis.wikiDumpPages(df)
    val kept = pages
      .filter(col("ns") === 0 && col("redirect").isNull)
      .select(col("title"),
        graft.ext.TextAnalysis.wikitextClean(col("text")).as("clean"))
      .collect()
    assert(kept.length == 1)
    assert(kept(0).getString(0) == "Pi")
    assert(kept(0).getString(1) == "Pi is a constant.")
    assert(pages.count() == 2)
  }

  test("bunzip2 fails closed: bad magic, corrupt data, truncation, " +
    "doctored CRC, over-cap; Column API") {
    val ok = un(helloBz)
    val badMagic = ok.clone(); badMagic(0) = 'X'.toByte
    assert(Bunzip2.compute(badMagic, 1 << 20) == null)
    val badLevel = ok.clone(); badLevel(3) = '0'.toByte
    assert(Bunzip2.compute(badLevel, 1 << 20) == null)
    // corrupt a payload byte mid-stream: CRC or Huffman must refuse
    val corrupt = ok.clone()
    corrupt(20) = (corrupt(20) ^ 0x55).toByte
    assert(Bunzip2.compute(corrupt, 1 << 20) == null)
    // truncation at every late cut must never return data
    for (cut <- Seq(10, 20, ok.length - 5, ok.length - 1))
      assert(Bunzip2.compute(ok.take(cut), 1 << 20) == null,
        s"truncated at $cut")
    // doctor the block CRC field (bytes 10..13 hold part of it)
    val badCrc = ok.clone(); badCrc(11) = (badCrc(11) ^ 1).toByte
    assert(Bunzip2.compute(badCrc, 1 << 20) == null)
    // output cap: rejected, never clipped
    assert(Bunzip2.compute(ok, 5) == null)
    assert(Bunzip2.compute(ok, 17) != null)
    // trailing garbage after the stream
    assert(Bunzip2.compute(ok ++ Array[Byte](1, 2, 3), 1 << 20) == null)
    val row = Seq((1L, un(wikiBz)), (2L, null: Array[Byte]))
      .toDF("id", "bz")
      .select(col("id"), Bunzip2(col("bz")).cast("string").as("t"))
      .orderBy("id").collect()
    assert(row(0).getString(1) == "wiki dump text " * 40)
    assert(row(1).isNullAt(1))
  }
}
