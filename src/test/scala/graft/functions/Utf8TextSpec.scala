package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The fail-closed UTF-8 decode and the mixed-lake robustness it
  * buys: binary junk through documentText NULLS instead of throwing
  * MALFORMED_CHARACTER_CODING and killing the scan. */
class Utf8TextSpec extends SparkSpec {
  import spark.implicits._

  test("utf8_text: valid text round-trips zero-copy; overlongs, " +
    "surrogates, truncations and lone continuations refuse") {
    assert(Utf8Text.compute("héllo ✓ 𝄞".getBytes("UTF-8")).toString
      == "héllo ✓ 𝄞")
    assert(Utf8Text.compute(Array.emptyByteArray).toString == "")
    // overlong '/' (C0 AF)
    assert(Utf8Text.compute(Array(0xC0.toByte, 0xAF.toByte)) == null)
    // UTF-8-encoded surrogate (ED A0 80)
    assert(Utf8Text.compute(Array(0xED.toByte, 0xA0.toByte,
      0x80.toByte)) == null)
    // truncated 3-byte sequence
    assert(Utf8Text.compute("é".getBytes("UTF-8").take(1)) == null)
    // lone continuation
    assert(Utf8Text.compute(Array(0x80.toByte)) == null)
    // past U+10FFFF (F4 90 80 80)
    assert(Utf8Text.compute(Array(0xF4.toByte, 0x90.toByte,
      0x80.toByte, 0x80.toByte)) == null)
  }

  test("documentText survives binary junk: unknown non-text payloads " +
    "NULL instead of throwing; a gzip of binary NULLS its row") {
    val binary = Array.tabulate[Byte](64)(i => (i * 37 + 129).toByte)
    val gzBin = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(binary); g.close()
      bos.toByteArray
    }
    val rows = graft.ext.Multimodal.documentText(
      Seq((1L, binary), (2L, gzBin), (3L, "fine text".getBytes("UTF-8")))
        .toDF("doc_id", "payload")).orderBy("doc_id").collect()
    assert(rows(0).isNullAt(2), "raw binary junk must null")
    assert(rows(1).getString(1) == "gzip" && rows(1).isNullAt(2),
      "gzip-of-binary must null")
    assert(rows(2).getString(2) == "fine text")
  }
}
