package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CFB/OLE2 census: synthesized spec-exact compound files (v3
  * layout: header + FAT + directory + stream sector) with known
  * directories, kind labeling, sniff routing, and the fail-closed
  * surface. */
class CfbDirectorySpec extends SparkSpec {
  import spark.implicits._

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    assert(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("cfb_directory: header facts and the directory walk — names " +
    "UTF-16LE, types, start sectors, sizes; kind labels doc/xls") {
    val doc = res("/cfb/doc.cfb")
    val r = CfbDirectory.compute(doc, 1 << 16)
    assert(r != null)
    assert(r.getInt(0) == 3 && r.getInt(1) == 512 && r.getInt(2) == 1)
    val es = r.getArray(3)
    assert(es.numElements() == 3)
    def ent(i: Int) = {
      val e = es.getStruct(i, 4)
      (e.getUTF8String(0).toString, e.getUTF8String(1).toString,
        e.getLong(2), e.getLong(3))
    }
    assert(ent(0) == (("Root Entry", "root", 0L, 0L)))
    assert(ent(1) ==
      (("WordDocument", "stream", 2L, "legacy word text payload".length.toLong)))
    assert(ent(2) ==
      (("SummaryInformation", "stream", 0xFFFFFFFEL, 0L)))
    val xls = res("/cfb/xls.cfb")
    val rx = CfbDirectory.compute(xls, 1 << 16)
    assert(rx != null && rx.getArray(3).numElements() == 3)
    assert(rx.getArray(3).getStruct(1, 4).getUTF8String(0).toString
      == "Workbook")
    // kind + sniff through the Column API
    val rows = Seq((1L, doc), (2L, xls), (3L, "plain".getBytes))
      .toDF("doc_id", "payload")
      .select(col("doc_id"),
        graft.ext.Multimodal.sniffFormat(col("payload")).as("fmt"),
        graft.ext.Multimodal.cfbKind(
          graft.ext.Multimodal.cfbMeta(col("payload"))).as("kind"))
      .orderBy("doc_id").collect()
    assert(rows(0).getString(1) == "cfb" && rows(0).getString(2) == "doc")
    assert(rows(1).getString(1) == "cfb" && rows(1).getString(2) == "xls")
    assert(rows(2).getString(1) == "unknown" && rows(2).isNullAt(2))
  }

  test("doc_text: Word 97 piece-table extraction — cp1252 and UTF-16 " +
    "pieces in CP order, mini-stream AND FAT WordDocument layouts, " +
    "0Table and 1Table flags, control-char normalization") {
    val expected =
      "Legacy Word text. Café résumé.\nUnicode piece — ünïcode.\n"
    // small.doc: WordDocument lives in the MINI stream (miniFAT walk)
    val small = res("/cfb/small.doc")
    val gotS = DocTextExtract.compute(small, 1 << 24)
    assert(gotS != null && gotS.toString == expected)
    // big.doc: FAT-resident WordDocument, table stream named 1Table
    val big = res("/cfb/big.doc")
    val gotB = DocTextExtract.compute(big, 1 << 24)
    assert(gotB != null && gotB.toString == expected)
    // an xls-shaped CFB has no WordDocument: null, never a guess
    assert(DocTextExtract.compute(res("/cfb/xls.cfb"), 1 << 24) == null)
    // encrypted flag refuses
    val enc = small.clone()
    // WordDocument is mini sector 0 => container sector holds FIB at
    // its start; find the A5EC magic and set fEncrypted
    var fib = -1
    var i = 512
    while (fib < 0 && i < enc.length - 1) {
      if ((enc(i) & 0xff) == 0xEC && (enc(i + 1) & 0xff) == 0xA5) fib = i
      i += 1
    }
    assert(fib > 0)
    enc(fib + 0x0A) = (enc(fib + 0x0A) | 0x01).toByte // low byte of flags...
    // fEncrypted is bit 8 of the 16-bit field: set the HIGH byte
    val enc2 = small.clone()
    enc2(fib + 0x0B) = (enc2(fib + 0x0B) | 0x01).toByte
    assert(DocTextExtract.compute(enc2, 1 << 24) == null,
      "encrypted documents refuse")
    // truncation fails closed at every structural cut
    for (cut <- Seq(512, 1024, small.length / 2))
      assert(DocTextExtract.compute(small.take(cut), 1 << 24) == null)
    // documentText routes cfb WordDocument payloads through doc_text
    import spark.implicits._
    val dt = graft.ext.Multimodal.documentText(
      Seq((1L, small), (2L, res("/cfb/xls.cfb")))
        .toDF("doc_id", "payload")).orderBy("doc_id").collect()
    assert(dt(0).getString(1) == "cfb" && dt(0).getString(2) == expected)
    assert(dt(1).getString(1) == "cfb" && dt(1).isNullAt(2))
  }

  test("cfb_directory fails closed: signature, byte-order mark, " +
    "version/shift disagreement, truncation, chain bound; " +
    "documentText refuses cfb instead of UTF-8 junk") {
    val ok = res("/cfb/doc.cfb")
    val badSig = ok.clone(); badSig(0) = 'X'.toByte
    assert(CfbDirectory.compute(badSig, 1 << 16) == null)
    val badBom = ok.clone(); badBom(28) = 0
    assert(CfbDirectory.compute(badBom, 1 << 16) == null)
    val badShift = ok.clone(); badShift(30) = 12 // v3 must be 512
    assert(CfbDirectory.compute(badShift, 1 << 16) == null)
    // cuts through the header, FAT and directory sectors fail; the
    // stream sector is never read by a DIRECTORY census, so cutting
    // into it alone does not (byte-range reads are the stream tier)
    for (cut <- Seq(100, 512, 1024, 1535))
      assert(CfbDirectory.compute(ok.take(cut), 1 << 16) == null,
        s"truncated at $cut")
    assert(CfbDirectory.compute(ok.take(1536), 1 << 16) != null)
    // directory start pointing past the payload
    val badDir = ok.clone(); badDir(48) = 0x7f
    assert(CfbDirectory.compute(badDir, 1 << 16) == null)
    import spark.implicits._
    val dt = graft.ext.Multimodal.documentText(
      Seq((1L, ok)).toDF("doc_id", "payload")).collect()(0)
    assert(dt.getString(1) == "cfb" && dt.isNullAt(2),
      "documentText labels cfb and refuses, never UTF-8 junk")
  }
}
