package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BIFF8 `.xls` cell extraction: spec-exact fixtures from
  * tools/make_xls_fixture.py — workbook A exercises every cell-record
  * kind over two sheets, workbook B splits an SST string across a
  * CONTINUE record with a wide-flag restart. Fail-closed surface and
  * the Multimodal routing are pinned here too. */
class XlsCellsSpec extends SparkSpec {
  import spark.implicits._

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    assert(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  private def cells(bytes: Array[Byte]): Seq[(Long, Long, Long, String)] = {
    val r = XlsCells.compute(bytes, 1 << 24, 1 << 22)
    if (r == null) null
    else (0 until r.numElements()).map { i =>
      val e = r.getStruct(i, 4)
      (e.getLong(0), e.getLong(1), e.getLong(2),
        e.getUTF8String(3).toString)
    }
  }

  test("xls_cells: every BIFF8 cell-record kind — LabelSst, inline " +
    "Label, Number, RK int/x100/double, MulRk, BoolErr bool+error, " +
    "Formula number/string/bool/empty — over two sheets") {
    val got = cells(res("/xls/a.xls"))
    assert(got == Seq(
      (1L, 1L, 1L, "hello"), (1L, 1L, 2L, "wörld ✓"),
      (1L, 2L, 1L, "3.25"),
      (1L, 2L, 2L, "42"), (1L, 2L, 3L, "1.23"), (1L, 2L, 4L, "2.5"),
      (1L, 3L, 1L, "1"), (1L, 3L, 2L, "2"), (1L, 3L, 3L, "3"),
      (1L, 4L, 1L, "TRUE"), (1L, 4L, 2L, "#DIV/0!"),
      (1L, 5L, 1L, "7.5"), (1L, 5L, 2L, "fx"), (1L, 5L, 3L, "TRUE"),
      (1L, 5L, 4L, ""),
      (1L, 6L, 1L, "inline"),
      (2L, 1L, 1L, "rich")))
  }

  test("xls_cells: SST CONTINUE split restarts the option flags — " +
    "compressed chars before the boundary, UTF-16 after, ONE string") {
    val got = cells(res("/xls/b.xls"))
    assert(got == Seq(
      (1L, 1L, 1L, "aaaaБВГДЕЖ"), (1L, 1L, 2L, "tail")))
  }

  test("xls_cells fails closed: truncation at every cut, BIFF5 " +
    "version refused, doc-shaped CFB (no Workbook stream) null, " +
    "malformed SST flags null") {
    val a = res("/xls/a.xls")
    for (cut <- Seq(100, 512, 1024, 1536, 2048, a.length - 64))
      assert(cells(a.take(cut)) == null, s"truncated at $cut")
    // the Workbook stream starts at mini sector 0 = container start;
    // flip the BOF version field (offset +4..5 inside the stream)
    val miniStart = 512 * 4 // header + FAT + dir + miniFAT sectors
    val biff5 = a.clone()
    biff5(miniStart + 4) = 0x00
    biff5(miniStart + 5) = 0x05 // BIFF5 vers 0x0500: refuse, never guess
    assert(cells(biff5) == null)
    // a .doc payload has no Workbook/Book stream
    assert(cells(res("/cfb/small.doc")) == null)
    // SST flags with reserved bits set
    val badFlags = a.clone()
    // find the SST record (id 0x00FC) inside the stream and poison the
    // first string's flags byte
    var p = miniStart
    while (!((badFlags(p) & 0xff) == 0xFC && (badFlags(p + 1) & 0xff) == 0)) p += 1
    badFlags(p + 4 + 8 + 2) = 0x70
    assert(cells(badFlags) == null)
  }

  test("xls routing: Multimodal.xlsCells explodes the grid; " +
    "documentText extracts xls payloads via the cell tier and keeps " +
    "doc payloads on the piece-table tier") {
    val df = Seq((1L, res("/xls/a.xls")), (2L, res("/cfb/small.doc")),
      (3L, "plain text".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val grid = graft.ext.Multimodal.xlsCells(df)
      .orderBy("doc_id", "sheet", "row", "col").collect()
    assert(grid.length == 17 && grid.head.getLong(0) == 1L)
    assert(grid.map(_.getString(4)).take(2).toSeq == Seq("hello", "wörld ✓"))
    val dt = graft.ext.Multimodal.documentText(df)
      .orderBy("doc_id").collect()
    assert(dt(0).getString(1) == "cfb" &&
      dt(0).getString(2).startsWith("hello\nwörld ✓\n3.25\n42\n1.23"))
    assert(dt(1).getString(1) == "cfb" &&
      dt(1).getString(2).startsWith("Legacy Word text."))
    assert(dt(2).getString(1) == "unknown" &&
      dt(2).getString(2) == "plain text")
  }
}
