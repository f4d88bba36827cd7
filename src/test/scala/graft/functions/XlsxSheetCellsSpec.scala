package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The [[XlsxSheetCells]] kernel's own battery — the integration path
  * (zip member resolution, multi-sheet, the oracle grid) lives in
  * ZipEntryBytesSpec's xlsxCells test; here the static kernel's edge
  * semantics are pinned directly: entity decode parity with the
  * Catalyst chain it replaced, shared-pool degradation, fail-closed
  * UTF-8, and the reference/self-closing cell rules. */
class XlsxSheetCellsSpec extends AnyFunSuite {

  private def cells(sheet: String, sst: String = "") =
    Option(XlsxSheetCells.compute(sheet.getBytes("UTF-8"),
        sst.getBytes("UTF-8")))
      .map(_.array.toSeq.map { r =>
        val row = r.asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
        (if (row.isNullAt(0)) null else row.getLong(0),
          row.getLong(1),
          if (row.isNullAt(2)) null else row.getUTF8String(2).toString)
      })

  test("entity decode parity: named, decimal, hex, surrogate and " +
    "out-of-range stay literal, unknown names stay literal") {
    assert(XlsxSheetCells.decodeEntities("a &amp; b &lt;c&gt; &quot;d&quot; &nbsp;!") ==
      "a & b <c> \"d\"  !")
    assert(XlsxSheetCells.decodeEntities("&#65;&#x42;&#X43;") == "ABC")
    // surrogate range and zero keep the token text
    assert(XlsxSheetCells.decodeEntities("&#55296; &#0; &#70000;") ==
      "&#55296; &#0; &#70000;")
    // unknown named entity is NOT in the pattern: untouched
    assert(XlsxSheetCells.decodeEntities("&apos;x&unknown;") ==
      "&apos;x&unknown;")
    // no-entity fast path returns the input
    val plain = "just text"
    assert(XlsxSheetCells.decodeEntities(plain) eq plain)
  }

  test("cell rules: self-closing cells skipped, missing r= skipped, " +
    "base-26 references, inlineStr run concat, verbatim <v>") {
    val xml = "<worksheet><sheetData>" +
      "<row r=\"1\"><c r=\"A1\"><v>1</v></c><c r=\"D1\"/>" +
      "<c t=\"n\"><v>ghost</v></c>" +
      "<c r=\"ZZ1\" t=\"inlineStr\"><is><t>a&amp;</t><t xml:space=\"preserve\"> b</t></is></c></row>" +
      "</sheetData></worksheet>"
    assert(cells(xml).get == Seq((1L, 1L, "1"), (1L, 702L, "a& b")))
  }

  test("shared strings: 0-based index, rich-run concat, bad index and " +
    "junk index null the VALUE but keep the row") {
    val sst = "<sst><si><t>one</t></si><si><r><t>t</t></r><r><t>wo</t></r></si></sst>"
    val xml = "<worksheet>" +
      "<c r=\"A1\" t=\"s\"><v>0</v></c>" +
      "<c r=\"B1\" t=\"s\"><v>1</v></c>" +
      "<c r=\"C1\" t=\"s\"><v>9</v></c>" +
      "<c r=\"D1\" t=\"s\"><v>x</v></c>" +
      "<c r=\"E1\" t=\"s\"><v>1.0</v></c></worksheet>"
    assert(cells(xml, sst).get == Seq((1L, 1L, "one"), (1L, 2L, "two"),
      (1L, 3L, null), (1L, 4L, null), (1L, 5L, "two")))
  }

  test("fail-closed: invalid sheet UTF-8 is NULL; invalid sst UTF-8 " +
    "degrades to an empty pool (rows kept, shared values null)") {
    val bad = Array[Byte](0x3c, 0x77, 0xff.toByte, 0xfe.toByte)
    assert(XlsxSheetCells.compute(bad, Array.empty) == null)
    val xml = "<worksheet><c r=\"A1\" t=\"s\"><v>0</v></c>" +
      "<c r=\"B1\"><v>7</v></c></worksheet>"
    val got = Option(XlsxSheetCells.compute(xml.getBytes("UTF-8"), bad))
    assert(got.isDefined)
    assert(cells(xml, "x").get == Seq((1L, 1L, null), (1L, 2L, "7")))
  }
}
