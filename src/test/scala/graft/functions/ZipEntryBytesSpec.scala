package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec
import graft.ext.Multimodal

class ZipEntryBytesSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  /** Real STORED-entry zip via the JDK writer (stored entries carry
    * sizes in the local header — no data descriptor). */
  private def storedZip(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.setMethod(ZipOutputStream.STORED)
    for ((name, data) <- entries) {
      val e = new ZipEntry(name)
      e.setSize(data.length); e.setCompressedSize(data.length)
      val crc = new CRC32(); crc.update(data); e.setCrc(crc.getValue)
      z.putNextEntry(e); z.write(data); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** Hand-framed DEFLATE member (real Deflater stream, sizes in the
    * local header — the shape OOXML writers emit). */
  private def deflateZip(name: String, data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val cbuf = new Array[Byte](data.length * 2 + 64)
    val clen = d.deflate(cbuf); d.end()
    val crc = new CRC32(); crc.update(data)
    val bos = new ByteArrayOutputStream()
    def le(v: Long, n: Int): Unit =
      (0 until n).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    bos.write(Array(0x50, 0x4b, 3, 4, 0x14, 0, 0, 0, 8, 0).map(_.toByte))
    le(0, 4) // time+date
    le(crc.getValue, 4); le(clen, 4); le(data.length, 4)
    le(name.length, 2); le(0, 2)
    bos.write(name.getBytes("UTF-8")); bos.write(cbuf, 0, clen)
    bos.toByteArray
  }

  test("zip_entry_bytes: stored members found by exact name; missing entry null") {
    val z = storedZip(
      "[Content_Types].xml" -> "<Types/>".getBytes,
      "word/document.xml" -> "<w:t>hi</w:t>".getBytes)
    assert(new String(ZipEntryBytes.compute(z, u("word/document.xml"),
      1 << 20, 64)) == "<w:t>hi</w:t>")
    assert(new String(ZipEntryBytes.compute(z, u("[Content_Types].xml"),
      1 << 20, 64)) == "<Types/>")
    assert(ZipEntryBytes.compute(z, u("word/other.xml"), 1 << 20, 64) == null)
  }

  test("zip_entry_bytes: real-Deflater member inflates; usize cap and corrupt stream fail closed") {
    val text = "body text " * 500
    val z = deflateZip("word/document.xml", text.getBytes("UTF-8"))
    assert(new String(ZipEntryBytes.compute(z, u("word/document.xml"),
      1 << 20, 64), "UTF-8") == text)
    // declared usize above the cap: rejected, not clipped
    assert(ZipEntryBytes.compute(z, u("word/document.xml"), 100, 64) == null)
    // corrupt a deflate byte mid-stream
    val bad = z.clone(); bad(z.length - 20) = (bad(z.length - 20) ^ 0x7f).toByte
    assert(ZipEntryBytes.compute(bad, u("word/document.xml"),
      1 << 20, 64) == null)
    // JDK streaming DEFLATED entries use data descriptors — resolved
    // via the central directory (exact sizes live there, not in the
    // local header)
    val bos = new ByteArrayOutputStream(); val zo = new ZipOutputStream(bos)
    zo.putNextEntry(new ZipEntry("word/document.xml"))
    zo.write("streamed body".getBytes); zo.closeEntry(); zo.close()
    assert(new String(ZipEntryBytes.compute(bos.toByteArray,
      u("word/document.xml"), 1 << 20, 64)) == "streamed body")
    // junk payload
    assert(ZipEntryBytes.compute("not a zip".getBytes, u("a"), 64, 64) == null)
  }

  test("zip central directory: corrupt CD and doctored EOCD fail closed; " +
    "a zip comment does not fool the EOCD scan") {
    def ddZip(entries: (String, String)*): Array[Byte] = {
      val b = new ByteArrayOutputStream(); val z = new ZipOutputStream(b)
      for ((n, d) <- entries) {
        z.putNextEntry(new ZipEntry(n)); z.write(d.getBytes); z.closeEntry()
      }
      z.close(); b.toByteArray
    }
    val z = ddZip("a.txt" -> "alpha", "b/c.txt" -> ("bravo " * 100))
    assert(new String(ZipEntryBytes.compute(z, u("b/c.txt"), 1 << 20, 64))
      == "bravo " * 100)
    // a trailing zip comment moves the EOCD off the tail — still found
    val zc = {
      val b = new ByteArrayOutputStream(); val zo2 = new ZipOutputStream(b)
      zo2.setComment("archive comment here")
      zo2.putNextEntry(new ZipEntry("a.txt")); zo2.write("alpha".getBytes)
      zo2.closeEntry(); zo2.close(); b.toByteArray
    }
    assert(new String(ZipEntryBytes.compute(zc, u("a.txt"), 1 << 20, 64))
      == "alpha")
    // corrupt a CD entry signature: whole archive fails closed (the
    // fallback walk never second-guesses a claimed CD)
    val eocd = ZipEntryBytes.findEocd(z)
    assert(eocd >= 0)
    val cdOff = ((z(eocd + 16) & 0xff) | ((z(eocd + 17) & 0xff) << 8) |
      ((z(eocd + 18) & 0xff) << 16) | ((z(eocd + 19) & 0xff) << 24))
    val badCd = z.clone(); badCd(cdOff) = 0x42
    assert(ZipEntryBytes.compute(badCd, u("a.txt"), 1 << 20, 64) == null)
    // truncating the EOCD mid-record leaves no valid EOCD: the
    // fallback walk sees data-descriptor locals and fails closed
    val trunc = z.take(z.length - 10)
    assert(ZipEntryBytes.compute(trunc, u("a.txt"), 1 << 20, 64) == null)
    // doctored CD count past the walk bound fails closed
    val hugeCount = z.clone()
    hugeCount(eocd + 10) = 0xff.toByte; hugeCount(eocd + 11) = 0x7f
    assert(ZipEntryBytes.compute(hugeCount, u("a.txt"), 1 << 20, 64) == null)
    // ZIP64 marker values fail closed
    val z64 = z.clone()
    (16 until 20).foreach(i => z64(eocd + i) = 0xff.toByte)
    assert(ZipEntryBytes.compute(z64, u("a.txt"), 1 << 20, 64) == null)
  }

  test("zipList: CD-primary listing with exact sizes for data-descriptor " +
    "entries; CD-less payloads fall back; junk contributes no rows") {
    val bos2 = new ByteArrayOutputStream()
    val zo2 = new ZipOutputStream(bos2)
    zo2.putNextEntry(new ZipEntry("one.txt")); zo2.write("first".getBytes)
    zo2.closeEntry()
    zo2.putNextEntry(new ZipEntry("two.txt"))
    zo2.write(("second " * 50).getBytes); zo2.closeEntry(); zo2.close()
    val dd = bos2.toByteArray
    val noCd = deflateZip("only.xml", "<x>no cd</x>".getBytes)
    val df = Seq((1L, dd), (2L, noCd), (3L, "junk!".getBytes))
      .toDF("doc_id", "payload")
    val rows = Multimodal.zipList(df).orderBy("doc_id", "entry_idx").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "one.txt"), (1L, "two.txt"), (2L, "only.xml")))
    // usize is exact even though the local headers carried zeros
    assert(rows(0).getLong(5) == 5L)
    assert(rows(1).getLong(5) == ("second " * 50).length.toLong)
    assert(rows(2).getLong(5) == "<x>no cd</x>".length.toLong)
    // offsets point at data: the stored-or-deflate slice round-trips
    // through ZipEntryBytes for the named entry
    assert(new String(ZipEntryBytes.compute(dd, u("one.txt"), 1 << 20, 64))
      == "first")
  }

  test("xlsxSharedStrings: plain and rich-run entries indexed in order, " +
    "runs concatenated, entities decoded; missing member yields no rows") {
    val sst = "<?xml version=\"1.0\"?><sst>" +
      "<si><t>one</t></si>" +
      "<si><r><rPr/><t>two </t></r><r><t>parts</t></r></si>" +
      "<si><t xml:space=\"preserve\"> pre &lt;x&gt;</t></si></sst>"
    val good = storedZip("xl/sharedStrings.xml" -> sst.getBytes("UTF-8"))
    val other = storedZip("xl/styles.xml" -> "<x/>".getBytes)
    val out = Multimodal.xlsxSharedStrings(
        Seq((1L, good), (2L, other)).toDF("doc_id", "payload"))
      .orderBy("doc_id", "si_idx").collect()
    assert(out.length == 3 && out.forall(_.getLong(0) == 1L))
    assert(out.map(_.getString(2)).toSeq ==
      Seq("one", "two parts", " pre <x>"))
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
  }

  test("zipFileTexts: every member's text, directories dropped, DD " +
    "archives resolved via the CD; junk contributes no rows") {
    val bos = new ByteArrayOutputStream()
    val zo = new ZipOutputStream(bos) // streaming: DD entries + CD
    zo.putNextEntry(new ZipEntry("src/")); zo.closeEntry()
    zo.putNextEntry(new ZipEntry("src/a.py")); zo.write("print(1)".getBytes)
    zo.closeEntry()
    zo.putNextEntry(new ZipEntry("README")); zo.write("readme!".getBytes)
    zo.closeEntry(); zo.close()
    val rows = Multimodal.zipFileTexts(
        Seq((1L, bos.toByteArray), (2L, "junk".getBytes))
          .toDF("doc_id", "payload"))
      .orderBy("name").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(3)))
      .toSeq == Seq((1L, "README", "readme!"), (1L, "src/a.py", "print(1)")))
  }

  test("xlsxCells: cell grid with shared/inline/numeric values; base-26 " +
    "column letters pinned (A=1, Z=26, AA=27, AB=28, ZZ=702); empty " +
    "self-closing cells skipped; multi-sheet via the CD listing") {
    val sst = "<sst><si><t>shared one</t></si>" +
      "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>"
    val s1 = "<worksheet><sheetData>" +
      "<row r=\"1\"><c r=\"A1\" t=\"s\"><v>0</v></c>" +
      "<c r=\"Z1\"><v>26</v></c><c r=\"AA1\" t=\"s\"><v>1</v></c></row>" +
      "<row r=\"9\"><c r=\"AB9\"><v>28</v></c><c r=\"D9\"/>" +
      "<c r=\"ZZ9\" t=\"inlineStr\"><is><t>in &amp; line</t></is></c></row>" +
      "</sheetData></worksheet>"
    val s2 = "<worksheet><sheetData><row r=\"2\">" +
      "<c r=\"B2\"><v>7</v></c></row></sheetData></worksheet>"
    val z = storedZip(
      "xl/sharedStrings.xml" -> sst.getBytes("UTF-8"),
      "xl/worksheets/sheet1.xml" -> s1.getBytes("UTF-8"),
      "xl/worksheets/sheet2.xml" -> s2.getBytes("UTF-8"),
      "xl/styles.xml" -> "<x/>".getBytes)
    val rows = Multimodal.xlsxCells(Seq((1L, z)).toDF("doc_id", "payload"))
      .orderBy("sheet", "row", "col").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(rows.toSeq == Seq(
      (1L, 1L, 1L, "shared one"), (1L, 1L, 26L, "26"),
      (1L, 1L, 27L, "rich"), (1L, 9L, 28L, "28"),
      (1L, 9L, 702L, "in & line"), (2L, 2L, 2L, "7")))
    // out-of-range shared index and junk payloads are nulls / no rows
    val bad = storedZip("xl/worksheets/sheet1.xml" ->
      "<worksheet><c r=\"A1\" t=\"s\"><v>99</v></c></worksheet>".getBytes)
    val b = Multimodal.xlsxCells(Seq((1L, bad)).toDF("doc_id", "payload"))
      .collect()
    assert(b.length == 1 && b(0).isNullAt(4))
    assert(Multimodal.xlsxCells(Seq((1L, "junk".getBytes))
      .toDF("doc_id", "payload")).count() == 0)
  }

  test("xlsxSheets: workbook tab order resolved through rels; " +
    "unresolvable r:id keeps a null file; junk contributes no rows") {
    val wb = "<workbook><sheets>" +
      "<sheet name=\"A &amp; B\" sheetId=\"1\" r:id=\"rId2\"/>" +
      "<sheet name=\"Two\" sheetId=\"2\" r:id=\"rId1\"/>" +
      "<sheet name=\"Ghost\" sheetId=\"3\" r:id=\"rId9\"/>" +
      "</sheets></workbook>"
    val rels = "<Relationships>" +
      "<Relationship Id=\"rId1\" Target=\"worksheets/sheet1.xml\"/>" +
      "<Relationship Id=\"rId2\" Target=\"worksheets/sheet2.xml\"/>" +
      "</Relationships>"
    val z = storedZip(
      "xl/workbook.xml" -> wb.getBytes("UTF-8"),
      "xl/_rels/workbook.xml.rels" -> rels.getBytes("UTF-8"))
    val rows = Multimodal.xlsxSheets(Seq((1L, z)).toDF("doc_id", "payload"))
      .orderBy("pos").collect()
      .map(r => (r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3)))
    assert(rows.toSeq == Seq(
      (0L, "A & B", "worksheets/sheet2.xml"),
      (1L, "Two", "worksheets/sheet1.xml"),
      (2L, "Ghost", null)))
    assert(Multimodal.xlsxSheets(Seq((1L, "junk".getBytes))
      .toDF("doc_id", "payload")).count() == 0)
  }

  test("ZIP64: a real Zip64Mode.Always archive (marker EOCD fields, " +
    "per-entry 0x0001 extras) lists and extracts; a lying locator " +
    "refuses") {
    import org.apache.commons.compress.archivers.zip.{Zip64Mode, ZipArchiveEntry, ZipArchiveOutputStream}
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipArchiveOutputStream(bos)
    z.setUseZip64(Zip64Mode.Always)
    for ((n, body) <- Seq("a.txt" -> "zip64 text a",
      "dir/b.txt" -> "zip64 text b")) {
      z.putArchiveEntry(new ZipArchiveEntry(n))
      z.write(body.getBytes("UTF-8"))
      z.closeArchiveEntry()
    }
    z.close()
    val zb = bos.toByteArray
    // kernel-level extraction by name
    val got = ZipEntryBytes.compute(zb,
      org.apache.spark.unsafe.types.UTF8String.fromString("dir/b.txt"),
      1 << 20, 1024)
    assert(got != null && new String(got, "UTF-8") == "zip64 text b")
    // listing sees both entries with true sizes
    val es = ZipEntryBytes.computeEntries(zb, 1024)
    assert(es != null)
    val names = (0 until es.numElements()).map(i =>
      es.getStruct(i, 5).getUTF8String(0).toString)
    assert(names.toSet == Set("a.txt", "dir/b.txt"))
    val sizes = (0 until es.numElements()).map(i =>
      es.getStruct(i, 5).getLong(3))
    assert(sizes.forall(_ == 12L))
    // the df tier reads it end to end
    val dt = graft.ext.Multimodal.documentText(
      Seq((1L, zb)).toDF("doc_id", "payload")).collect()(0)
    assert(dt.getString(1) == "zip" &&
      dt.getString(2) == "zip64 text a\n\nzip64 text b")
    // FORCE the EOCD markers (count/cdSize/cdOff all 0xFF): the
    // resolution must now go through the zip64 locator + EOCD64 the
    // writer emitted — the true >4 GiB shape
    val eocdAt = ZipEntryBytes.findEocd(zb)
    val forced = zb.clone()
    java.util.Arrays.fill(forced, eocdAt + 8, eocdAt + 20, 0xff.toByte)
    val fes = ZipEntryBytes.computeEntries(forced, 1024)
    assert(fes != null && fes.numElements() == 2)
    val fgot = ZipEntryBytes.compute(forced,
      org.apache.spark.unsafe.types.UTF8String.fromString("a.txt"),
      1 << 20, 1024)
    assert(fgot != null && new String(fgot, "UTF-8") == "zip64 text a")
    // a lying locator (offset field garbage) then refuses
    val lie = forced.clone()
    java.util.Arrays.fill(lie, eocdAt - 12, eocdAt - 4, 0x7f.toByte)
    assert(ZipEntryBytes.computeEntries(lie, 1024) == null)
    assert(ZipEntryBytes.compute(lie,
      org.apache.spark.unsafe.types.UTF8String.fromString("a.txt"),
      1 << 20, 1024) == null)
  }

  test("odfCells: the ods grid over a stored package — typed value, " +
    "text value, repeat; junk packages contribute no rows") {
    val content = "<office:document-content><office:body>" +
      "<office:spreadsheet><table:table><table:table-row>" +
      "<table:table-cell office:value=\"42\"><text:p>42</text:p>" +
      "</table:table-cell>" +
      "<table:table-cell table:number-columns-repeated=\"2\">" +
      "<text:p>t &amp; u</text:p></table:table-cell>" +
      "</table:table-row></table:table></office:spreadsheet>" +
      "</office:body></office:document-content>"
    val z = storedZip(
      "mimetype" -> "application/vnd.oasis.opendocument.spreadsheet".getBytes,
      "content.xml" -> content.getBytes("UTF-8"))
    val rows = Multimodal.odfCells(Seq((1L, z)).toDF("doc_id", "payload"))
      .orderBy("col").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(rows.toSeq == Seq((1L, 1L, 1L, "42"), (1L, 1L, 2L, "t & u"),
      (1L, 1L, 3L, "t & u")))
    assert(Multimodal.odfCells(Seq((1L, "junk".getBytes))
      .toDF("doc_id", "payload")).count() == 0)
  }

  test("epubMeta: container.xml NAMES the OPF (per-row member name), " +
    "Dublin Core decoded; missing container nulls the row") {
    val container = "<?xml version=\"1.0\"?><container><rootfiles>" +
      "<rootfile full-path=\"ops/pkg.opf\" media-type=\"x\"/>" +
      "</rootfiles></container>"
    val opf = "<package><metadata><dc:title>T &amp; t</dc:title>" +
      "<dc:creator>Ann</dc:creator><dc:language>fr</dc:language>" +
      "</metadata></package>"
    val good = storedZip("mimetype" -> "application/epub+zip".getBytes,
      "META-INF/container.xml" -> container.getBytes("UTF-8"),
      "ops/pkg.opf" -> opf.getBytes("UTF-8"))
    val noC = storedZip("mimetype" -> "application/epub+zip".getBytes,
      "ops/pkg.opf" -> opf.getBytes("UTF-8"))
    val out = Multimodal.epubMeta(
        Seq((1L, good), (2L, noC)).toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "ops/pkg.opf" &&
      out(1L).getString(2) == "T & t" &&
      out(1L).getString(3) == "Ann" && out(1L).getString(4) == "fr")
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(2))
    // the dynamic kernel agrees with the static one on a known name
    val d = Seq((1L, good)).toDF("id", "p")
    val both = d.select(
      ZipEntryBytes(col("p"), "ops/pkg.opf").cast("string").as("a"),
      ZipEntryBytesAt(col("p"), lit("ops/pkg.opf")).cast("string").as("b"),
      ZipEntryBytesAt(col("p"), lit(null).cast("string")).as("c"))
      .collect()(0)
    assert(both.getString(0) == both.getString(1))
    assert(both.isNullAt(2), "null name is a null result")
  }

  test("epubChapters: spine order (not manifest order), hrefs relative to " +
    "the OPF dir, both attribute orders; missing chapter keeps a null row") {
    val container = "<container><rootfiles>" +
      "<rootfile full-path=\"ops/pkg.opf\" media-type=\"x\"/>" +
      "</rootfiles></container>"
    // manifest lists ch2 first; spine orders ch1 -> ch2 -> ghost
    val opf = "<package><manifest>" +
      "<item href=\"ch2.xhtml\" id=\"c2\" media-type=\"x\"/>" +
      "<item id=\"c1\" href=\"ch1.xhtml\" media-type=\"x\"/>" +
      "<item id=\"g\" href=\"gone.xhtml\"/>" +
      "</manifest><spine><itemref idref=\"c1\"/>" +
      "<itemref idref=\"c2\"/><itemref idref=\"g\"/></spine></package>"
    val ch1 = "<html><body><p>First chapter &amp; text.</p></body></html>"
    val ch2 = "<html><body><p>Second one.</p></body></html>"
    val book = storedZip(
      "mimetype" -> "application/epub+zip".getBytes,
      "META-INF/container.xml" -> container.getBytes("UTF-8"),
      "ops/pkg.opf" -> opf.getBytes("UTF-8"),
      "ops/ch1.xhtml" -> ch1.getBytes("UTF-8"),
      "ops/ch2.xhtml" -> ch2.getBytes("UTF-8"))
    val rows = Multimodal.epubChapters(
        Seq((1L, book), (2L, "junk".getBytes)).toDF("doc_id", "payload"))
      .orderBy("doc_id", "chapter_idx").collect()
    assert(rows.length == 3 && rows.forall(_.getLong(0) == 1L))
    assert(rows.map(r => (r.getLong(1), r.getString(2))).toSeq ==
      Seq((0L, "ch1.xhtml"), (1L, "ch2.xhtml"), (2L, "gone.xhtml")))
    assert(rows(0).getString(3) == "First chapter & text.")
    assert(rows(1).getString(3) == "Second one.")
    assert(rows(2).isNullAt(3), "missing member fails closed to null text")
  }

  test("pptxSlideText: a:p paragraphs become lines, a:t runs concatenate, " +
    "entities decode; missing slide null; slide index addressable") {
    val slide = "<p:sld><a:p><a:r><a:t>One </a:t></a:r>" +
      "<a:r><a:t>run</a:t></a:r></a:p><a:p><a:r><a:t>&lt;2&gt;</a:t>" +
      "</a:r></a:p></p:sld>"
    val z = storedZip("ppt/slides/slide2.xml" -> slide.getBytes("UTF-8"))
    val df = Seq((1L, z)).toDF("id", "payload")
    val got = df.select(
      Multimodal.pptxSlideText(col("payload"), slide = 2).as("t"),
      Multimodal.pptxSlideText(col("payload"), slide = 1).as("missing"))
      .collect()(0)
    assert(got.getString(0) == "One run\n<2>\n")
    assert(got.isNullAt(1))
  }

  test("docxText: tags stripped, paragraphs/tabs kept, entities decoded; null payload null") {
    val xml = "<?xml version=\"1.0\"?><w:document><w:body>" +
      "<w:p><w:r><w:t>One &amp; two</w:t></w:r></w:p>" +
      "<w:p><w:r><w:t>a</w:t></w:r><w:r><w:tab/><w:t>b</w:t></w:r></w:p>" +
      "</w:body></w:document>"
    val z = storedZip("word/document.xml" -> xml.getBytes("UTF-8"))
    val df = Seq((1L, z), (2L, null: Array[Byte])).toDF("id", "payload")
    val out = df.select(col("id"),
      Multimodal.docxText(col("payload")).as("t")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    assert(out(1L) == "One & two\na\tb\n")
    assert(out(2L) == null)
  }

  test("odfText: ODF paragraphs/headings become lines, spans strip, " +
    "entities decode; odfKind off the mimetype member; documentText " +
    "routes ODF after epub") {
    val content =
      """<?xml version="1.0"?><office:document-content>""" +
      """<office:body><office:text>""" +
      """<text:h text:outline-level="1">Titre &amp; plus</text:h>""" +
      """<text:p>First par with <text:span text:style-name="T1">""" +
      """nested ü</text:span> run.</text:p><text:p/>""" +
      """<text:p>Second par.</text:p>""" +
      """</office:text></office:body></office:document-content>"""
    val odt = storedZip(
      "mimetype" -> "application/vnd.oasis.opendocument.text".getBytes,
      "META-INF/manifest.xml" -> "<manifest/>".getBytes,
      "content.xml" -> content.getBytes("UTF-8"))
    val ods = storedZip(
      "mimetype" -> "application/vnd.oasis.opendocument.spreadsheet".getBytes,
      "content.xml" -> ("<office:document-content><table:table>" +
        "<table:table-cell><text:p>cell A1</text:p></table:table-cell>" +
        "<table:table-cell><text:p>42</text:p></table:table-cell>" +
        "</table:table></office:document-content>").getBytes("UTF-8"))
    val rows = Seq((1L, odt), (2L, ods), (3L, "junk".getBytes))
      .toDF("doc_id", "payload")
      .select(col("doc_id"),
        Multimodal.odfText(col("payload")).as("text"),
        Multimodal.odfKind(col("payload")).as("kind"))
      .orderBy("doc_id").collect()
    assert(rows(0).getString(1) ==
      "Titre & plus\nFirst par with nested ü run.\nSecond par.\n")
    assert(rows(0).getString(2) == "text")
    assert(rows(1).getString(1) == "cell A1\n42\n")
    assert(rows(1).getString(2) == "spreadsheet")
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
    val dt = Multimodal.documentText(
      Seq((1L, odt)).toDF("doc_id", "payload")).collect()(0)
    assert(dt.getString(1) == "zip" &&
      dt.getString(2).startsWith("Titre & plus\n"))
  }

  // ---- modern compression methods (round 16): python zipfile's OWN
  // bzip2/lzma members, a liblzma .xz member, a zstd-jni member ----

  private val methodsZipHex: String =
    "504b03041400000000002fbe105d338518a312000000120000000a0000" +
    "0073746f7265642e74787473746f726564206d656d62657220626f6479" +
    "504b03041400000008002fbe105d9028077917000000270000000b0000" +
    "006465666c6174652e7478744b494dcb492c4955c84dcd4d4a2d5248ca" +
    "4fa9c4460000504b03042e0000000c002fbe105d66514db23e00000048" +
    "00000009000000627a6970322e747874425a6839314159265359bfb172" +
    "3f00000d9980400010001622d03020005081a068055434064f1241278d" +
    "093070a24d105105107c5dc914e14242fec5c8fc504b03043f0002000e" +
    "002fbe105db14dc9dc2700000044000000080000006c7a6d612e747874" +
    "090405005d0000800000361e89dd7d4952e0f51c55829a6ec01f46f4c6" +
    "3eda8c36cbfffee99000504b010214031400000000002fbe105d338518" +
    "a312000000120000000a00000000000000000000008001000000007374" +
    "6f7265642e747874504b010214031400000008002fbe105d9028077917" +
    "000000270000000b000000000000000000000080013a0000006465666c" +
    "6174652e747874504b01022e032e0000000c002fbe105d66514db23e00" +
    "00004800000009000000000000000000000080017a000000627a697032" +
    "2e747874504b01023f033f0002000e002fbe105db14dc9dc2700000044" +
    "0000000800000000000000000000008001df0000006c7a6d612e747874" +
    "504b05060000000004000400de0000002c0100000000"
  private val xzZipHex: String =
    "504b03043f0000005f00000000007475004e540000003c000000060000" +
    "00787a2e747874fd377a585a000004e6d6b4460200210116000000742f" +
    "e5a3e0003b00165d003c1e8005d1b923adada2ed295dd4837f3ff684f9" +
    "800000000031081b0af1e38bee0001323cdd9d99e21fb6f37d01000000" +
    "0004595a504b01023f003f0000005f00000000007475004e540000003c" +
    "000000060000000000000000000000000000000000787a2e747874504b" +
    "0506000000000100010034000000780000000000"

  private def hx(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def entryText(ar: Array[Byte], name: String): String = {
    val b = ZipEntryBytes.compute(ar, UTF8String.fromString(name),
      1 << 24, 4096)
    if (b == null) null else new String(b, "UTF-8")
  }

  test("python zipfile's own members: stored, deflate, bzip2 and " +
    "LZMA all extract") {
    val ar = hx(methodsZipHex)
    assert(entryText(ar, "stored.txt") === "stored member body")
    assert(entryText(ar, "deflate.txt") ===
      "deflate member body body body body body")
    assert(entryText(ar, "bzip2.txt") === "bzip2 member body " * 4)
    assert(entryText(ar, "lzma.txt") === "lzma member body " * 4)
  }

  test("a method-95 xz member (liblzma container) extracts") {
    assert(entryText(hx(xzZipHex), "xz.txt") === "xz member body " * 4)
  }

  test("a method-93 zstd member compressed by zstd-jni extracts") {
    val plain = ("zstd member body " * 4).getBytes("UTF-8")
    val packed = com.github.luben.zstd.Zstd.compress(plain)
    val name = "zstd.txt".getBytes("UTF-8")
    val crc = { val c = new java.util.zip.CRC32(); c.update(plain); c.getValue }
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    val local = "PK\u0003\u0004".getBytes("ISO-8859-1") ++
      le(63, 2) ++ le(0, 2) ++ le(93, 2) ++ le(0, 4) ++
      le(crc, 4) ++ le(packed.length, 4) ++ le(plain.length, 4) ++
      le(name.length, 2) ++ le(0, 2) ++ name ++ packed
    val cd = "PK\u0001\u0002".getBytes("ISO-8859-1") ++
      le(63, 2) ++ le(63, 2) ++ le(0, 2) ++ le(93, 2) ++ le(0, 4) ++
      le(crc, 4) ++ le(packed.length, 4) ++ le(plain.length, 4) ++
      le(name.length, 2) ++ le(0, 2) ++ le(0, 2) ++ le(0, 2) ++
      le(0, 2) ++ le(0, 4) ++ le(0, 4) ++ name
    val eocd = "PK\u0005\u0006".getBytes("ISO-8859-1") ++
      le(0, 2) ++ le(0, 2) ++ le(1, 2) ++ le(1, 2) ++
      le(cd.length, 4) ++ le(local.length, 4) ++ le(0, 2)
    val ar = local ++ cd ++ eocd
    assert(entryText(ar, "zstd.txt") === "zstd member body " * 4)
  }

  test("modern-method members fail closed on corrupt payloads and " +
    "size lies") {
    val ar = hx(methodsZipHex)
    // flip a byte inside the bzip2 member's compressed data
    val doc = new String(ar.map(c => (c & 0xff).toChar))
    val at = doc.indexOf("bzip2.txt", doc.indexOf("PK\u0003\u0004",
      doc.indexOf("bzip2.txt") - 40)) + "bzip2.txt".length
    val flip = ar.clone()
    flip(at + 12) = (flip(at + 12) ^ 0x40).toByte
    assert(entryText(flip, "bzip2.txt") == null)
    // others in the same archive still extract (per-member isolation)
    assert(entryText(flip, "lzma.txt") === "lzma member body " * 4)
  }
}
