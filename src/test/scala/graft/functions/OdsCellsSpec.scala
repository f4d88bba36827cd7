package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** [[OdsCells]] kernel battery: repeat expansion, covered cells,
  * typed vs text values, sheet indexing with empty tables, the
  * repeat-bomb cap and fail-closed UTF-8. */
class OdsCellsSpec extends AnyFunSuite {

  private def cells(xml: String, maxCells: Int = 1 << 22) =
    Option(OdsCells.compute(xml.getBytes("UTF-8"), maxCells))
      .map(a => (0 until a.numElements()).map { i =>
        val r = a.array(i).asInstanceOf[
          org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
        (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getUTF8String(3).toString)
      })

  private def doc(body: String) =
    "<office:document-content><office:body><office:spreadsheet>" +
      body + "</office:spreadsheet></office:body></office:document-content>"

  test("grid basics: office:value beats text, paragraphs newline-join " +
    "with spans stripped and entities decoded, empty cells skip") {
    val xml = doc("<table:table table:name=\"S1\">" +
      "<table:table-row>" +
      "<table:table-cell office:value-type=\"string\">" +
      "<text:p>a &amp; <text:span>b</text:span></text:p>" +
      "<text:p>line2</text:p></table:table-cell>" +
      "<table:table-cell office:value=\"42\"><text:p>42</text:p>" +
      "</table:table-cell>" +
      "<table:table-cell/>" +
      "<table:table-cell><text:p>d</text:p></table:table-cell>" +
      "</table:table-row></table:table>")
    assert(cells(xml).get == Seq(
      (1L, 1L, 1L, "a & b\nline2"), (1L, 1L, 2L, "42"),
      (1L, 1L, 4L, "d")))
  }

  test("repeats: valued column repeats emit per position, valueless " +
    "runs and covered cells only advance, row repeats replay the row, " +
    "huge trailing empties cost nothing") {
    val xml = doc("<table:table>" +
      "<table:table-row>" +
      "<table:table-cell table:number-columns-repeated=\"2\" " +
      "office:value=\"7\"/>" +
      "<table:table-cell table:number-columns-repeated=\"1000000\"/>" +
      "<table:table-cell office:value=\"9\"/>" +
      "</table:table-row>" +
      "<table:table-row table:number-rows-repeated=\"2\">" +
      "<table:covered-table-cell/>" +
      "<table:table-cell office:value=\"x\"/>" +
      "</table:table-row>" +
      "<table:table-row table:number-rows-repeated=\"1048576\"/>" +
      "<table:table-row><table:table-cell office:value=\"last\"/>" +
      "</table:table-row></table:table>")
    assert(cells(xml).get == Seq(
      (1L, 1L, 1L, "7"), (1L, 1L, 2L, "7"), (1L, 1L, 1000003L, "9"),
      (1L, 2L, 2L, "x"), (1L, 3L, 2L, "x"),
      (1L, 1048580L, 1L, "last")))
  }

  test("sheet indexing: self-closing empty tables still advance; a " +
    "second table restarts rows") {
    val xml = doc("<table:table/>" +
      "<table:table table:name=\"B\"><table:table-row>" +
      "<table:table-cell office:value=\"b\"/></table:table-row>" +
      "</table:table>")
    assert(cells(xml).get == Seq((2L, 1L, 1L, "b")))
  }

  test("fail-closed: a valued repeat past maxCells refuses; invalid " +
    "UTF-8 refuses; junk xml yields zero cells") {
    val bomb = doc("<table:table><table:table-row>" +
      "<table:table-cell table:number-columns-repeated=\"100\" " +
      "office:value=\"x\"/></table:table-row></table:table>")
    assert(cells(bomb, maxCells = 50).isEmpty)
    assert(cells(bomb, maxCells = 200).get.size == 100)
    assert(OdsCells.compute(Array[Byte](0x3c, 0xff.toByte), 100) == null)
    assert(cells("<not ods/>").get.isEmpty)
  }
}
