package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Multimodal

class PdfTextSpec extends SparkSpec {
  import spark.implicits._

  private def zlib(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](data.length * 2 + 64)
    val n = d.deflate(buf); d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  private def pdf(streams: (String, Boolean)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("%PDF-1.4\n".getBytes)
    for (((content, flate), i) <- streams.zipWithIndex) {
      val data =
        if (flate) zlib(content.getBytes("ISO-8859-1"))
        else content.getBytes("ISO-8859-1")
      bos.write((s"${i + 1} 0 obj << /Length ${data.length}" +
        (if (flate) " /Filter /FlateDecode" else "") +
        " >>\nstream\n").getBytes)
      bos.write(data)
      bos.write("\nendstream\nendobj\n".getBytes)
    }
    bos.write("%%EOF".getBytes)
    bos.toByteArray
  }

  private def extract(p: Array[Byte]): (String, Long, Long) = {
    val r = PdfTextExtract.compute(p, 64, 1 << 20)
    (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
  }

  test("pdf_text: FlateDecode and raw streams, Tj/TJ/' operators, escapes, " +
    "hex strings, block and stream joining") {
    val p = pdf(
      ("BT (Plain \\(escaped\\) \\101ctal) Tj [(A) -120 (B)] TJ ET", false),
      ("BT <48656C6C6F> Tj ET BT (second block) ' ET", true))
    val (text, ns, nd) = extract(p)
    assert(ns == 2 && nd == 2)
    assert(text ==
      "Plain (escaped) Actal AB\nHello\nsecond block")
  }

  test("pdf_text: undecodable stream skipped and counted; non-PDF null; " +
    "nested parens; Column API") {
    val corrupt = pdf(("BT (kept) Tj ET", false))
    // append a stream that declares FlateDecode but holds garbage
    val mix = new String(corrupt, "ISO-8859-1") +
      "9 0 obj << /Filter /FlateDecode >>\nstream\nnotzlib!!\nendstream\n"
    val (t2, ns2, nd2) = extract(mix.getBytes("ISO-8859-1"))
    assert(ns2 == 2 && nd2 == 1 && t2 == "kept")
    assert(PdfTextExtract.compute("no magic".getBytes, 8, 1024) == null)
    // nested balanced parens inside a literal
    val (t3, _, _) = extract(pdf(("BT (a (nested) b) Tj ET", false)))
    assert(t3 == "a (nested) b")
    val df = Seq((1L, pdf(("BT (col api) Tj ET", true)))).toDF("id", "p")
      .select(Multimodal.pdfText(col("p")).getField("text").as("t"))
    assert(df.collect()(0).getString(0) == "col api")
  }

  /** Raw indirect-object PDF builder for the CMap battery. */
  private def objPdf(objs: (Int, String, Option[Array[Byte]])*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("%PDF-1.4\n".getBytes)
    for ((num, dict, stream) <- objs) {
      bos.write(s"$num 0 obj $dict\n".getBytes("ISO-8859-1"))
      stream.foreach { d =>
        bos.write("stream\n".getBytes)
        bos.write(d)
        bos.write("\nendstream".getBytes)
      }
      bos.write("\nendobj\n".getBytes)
    }
    bos.write("%%EOF".getBytes)
    bos.toByteArray
  }

  private val cmapBody =
    """/CIDInit /ProcSet findresource begin
      |12 dict begin
      |begincmap
      |1 begincodespacerange
      |<0000> <FFFF>
      |endcodespacerange
      |2 beginbfchar
      |<0001> <0048>
      |<0002> <0394>
      |endbfchar
      |1 beginbfrange
      |<1030> <1039> <0030>
      |endbfrange
      |endcmap
      |""".stripMargin

  /** Full page-structured CID PDF: catalog, pages, page with
    * /Resources /Font /F1 -> Type0 font -> FlateDecode ToUnicode. */
  private def cidPdf(content: String, cmap: String = cmapBody,
                     flateCmap: Boolean = true): Array[Byte] = {
    val cm = if (flateCmap) zlib(cmap.getBytes("ISO-8859-1"))
      else cmap.getBytes("ISO-8859-1")
    objPdf(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>", None),
      (4, s"<< /Length ${content.length} >>",
        Some(content.getBytes("ISO-8859-1"))),
      (5, "<< /Type /Font /Subtype /Type0 /BaseFont /Test " +
        "/ToUnicode 6 0 R >>", None),
      (6, s"<< /Length ${cm.length}" +
        (if (flateCmap) " /Filter /FlateDecode" else "") + " >>", Some(cm)))
  }

  test("ToUnicode CMap: bfchar, incremented bfrange, 2-byte " +
    "codespace -- subset-font codes come out as real text") {
    val (t, ns, nd) = extract(cidPdf(
      "BT /F1 12 Tf <00010002> Tj <10311032> Tj ET"))
    assert(ns == 2 && nd == 2, s"$ns/$nd")
    assert(t == "H\u0394 12", t)
  }

  test("ToUnicode CMap: array-destination bfrange with multi-char " +
    "(ligature) values; unmapped codes emit U+FFFD") {
    val cm = cmapBody.replace("endcmap",
      """1 beginbfrange
        |<0005> <0006> [<00660066> <00660069>]
        |endbfrange
        |endcmap""".stripMargin)
    val (t, _, _) = extract(cidPdf("BT /F1 1 Tf <000500060009> Tj ET", cm))
    assert(t == "fffi\uFFFD", t)
  }

  test("ToUnicode CMap: mixed 1-byte and 2-byte codespaces resolve " +
    "widths per position") {
    val cm =
      """begincmap
        |2 begincodespacerange
        |<00> <7F>
        |<8000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<41> <0058>
        |<8001> <0059>
        |endbfchar
        |endcmap""".stripMargin
    // bytes: 41 (1-byte code -> X), 80 01 (2-byte code -> Y)
    val (t, _, _) = extract(cidPdf("BT /F1 1 Tf <418001> Tj ET", cm))
    assert(t == "XY", t)
  }

  /** The cidPdf document restructured the modern-writer way: every
    * DICTIONARY (catalog, pages, page, font) lives deflated inside a
    * `/Type /ObjStm` object stream; only the content stream and the
    * ToUnicode CMap stream stay top-level (streams cannot nest). */
  private def objStmPdf(content: String,
                        flateObjStm: Boolean = true): Array[Byte] = {
    val inner = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /Resources " +
        "<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      5 -> ("<< /Type /Font /Subtype /Type0 /BaseFont /Test " +
        "/ToUnicode 6 0 R >>"))
    val hdr = new StringBuilder
    val body = new StringBuilder
    for ((n, d) <- inner) {
      hdr.append(s"$n ${body.length} ")
      body.append(d).append(' ')
    }
    val first = hdr.length
    val raw = (hdr.toString + body.toString).getBytes("ISO-8859-1")
    val data = if (flateObjStm) zlib(raw) else raw
    val cm = zlib(cmapBody.getBytes("ISO-8859-1"))
    objPdf(
      (7, s"<< /Type /ObjStm /N ${inner.length} /First $first" +
        (if (flateObjStm) " /Filter /FlateDecode" else "") +
        s" /Length ${data.length} >>", Some(data)),
      (4, s"<< /Length ${content.length} >>",
        Some(content.getBytes("ISO-8859-1"))),
      (6, s"<< /Length ${cm.length} /Filter /FlateDecode >>", Some(cm)))
  }

  test("/ObjStm expansion: font/page/resource dicts deflated inside " +
    "an object stream still resolve the CMap (modern xref-stream " +
    "writers); raw ObjStm too") {
    for (flate <- Seq(true, false)) {
      val (t, ns, nd) = extract(
        objStmPdf("BT /F1 12 Tf <00010002> Tj <10311032> Tj ET",
          flateObjStm = flate))
      assert(ns == 3 && nd == 3, s"flate=$flate $ns/$nd")
      assert(t == "H\u0394 12", s"flate=$flate: $t")
    }
  }

  test("a corrupt /ObjStm (bad header, truncated deflate) never " +
    "throws — the latin1 tier survives") {
    val good = objStmPdf("BT /F1 12 Tf (plain) Tj ET")
    val s = new String(good, "ISO-8859-1")
    // break the /First offset so the header parse fails
    val broken = s.replace("/First", "/First 9999 /X")
    val (t, _, _) = extract(broken.getBytes("ISO-8859-1"))
    assert(t.contains("plain"), t)
  }

  test("fonts WITHOUT a CMap keep the latin1 tier, and a mid-block " +
    "Tf switch moves between the tiers") {
    val content = "BT /F1 1 Tf <0001> Tj /F2 1 Tf (plain) Tj ET"
    val cm = zlib(cmapBody.getBytes("ISO-8859-1"))
    val p = objPdf(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Resources << /Font " +
        "<< /F1 5 0 R /F2 7 0 R >> >> /Contents 4 0 R >>", None),
      (4, s"<< /Length ${content.length} >>",
        Some(content.getBytes("ISO-8859-1"))),
      (5, "<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>", None),
      (6, s"<< /Length ${cm.length} /Filter /FlateDecode >>", Some(cm)),
      (7, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>", None))
    val (t, _, _) = extract(p)
    assert(t == "H plain", t)
  }

  test("malformed CMaps fall back to the latin1 tier, never throw: " +
    "garbage flate, truncated entries, zero entries, over-cap range") {
    for (cm <- Seq("notzlib", "begincmap 1 beginbfchar <0001>",
      "begincmap endcmap",
      "begincmap 1 beginbfrange <0000> <FFFFFF> <0000> endbfrange endcmap")) {
      val flate = cm == "notzlib"
      val p = cidPdf("BT /F1 1 Tf (ok) Tj ET", cm, flateCmap = flate)
      val r = PdfTextExtract.compute(p, 64, 1 << 20)
      assert(r != null, cm)
      assert(r.getUTF8String(0).toString == "ok", cm)
    }
  }

  test("resources via indirect ref + contents ARRAY resolve; a " +
    "stream no page claims uses the global font union") {
    val content = "BT /F1 1 Tf <0001> Tj ET"
    val cm = zlib(cmapBody.getBytes("ISO-8859-1"))
    val p = objPdf(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R /Resources 8 0 R " +
        "/Contents [4 0 R 9 0 R] >>", None),
      (4, s"<< /Length ${content.length} >>",
        Some(content.getBytes("ISO-8859-1"))),
      (5, "<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>", None),
      (6, s"<< /Length ${cm.length} /Filter /FlateDecode >>", Some(cm)),
      (8, "<< /Font << /F1 5 0 R >> >>", None),
      (9, "<< /Length 26 >>", Some("BT /F1 1 Tf <0002> Tj ET  ".getBytes)))
    val (t, _, _) = extract(p)
    assert(t == "H\n\u0394", t)
    // an orphan stream (no /Contents points at it): global union
    val orphan = objPdf(
      (5, "<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>", None),
      (6, s"<< /Length ${cm.length} /Filter /FlateDecode >>", Some(cm)),
      (8, "<< /Font << /F1 5 0 R >> >>", None),
      (9, s"<< /Length ${content.length} >>",
        Some(content.getBytes("ISO-8859-1"))))
    val (t2, _, _) = extract(orphan)
    assert(t2 == "H", t2)
  }

  test("pdf_text: /FlateDecode found past a nested dict (/DecodeParms << >>)") {
    // a stream dict whose LAST '<<' before the keyword is a nested
    // dictionary AFTER /Filter — lastIndexOf would miss /FlateDecode
    val data = zlib("BT (nested dict) Tj ET".getBytes("ISO-8859-1"))
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("%PDF-1.4\n".getBytes)
    bos.write((s"1 0 obj << /Length ${data.length} /Filter /FlateDecode" +
      " /DecodeParms << /Predictor 1 >> >>\nstream\n").getBytes)
    bos.write(data)
    bos.write("\nendstream\nendobj\n%%EOF".getBytes)
    val (t, ns, nd) = extract(bos.toByteArray)
    assert(ns == 1 && nd == 1)
    assert(t == "nested dict")
  }

  // ---- round-16 Identity-H tier: glyph→unicode through the
  // embedded TrueType program's own cmap ----

  /** Minimal single-table sfnt: a format-4 cmap mapping
    * 'A'..'C' → glyphs 5,6,7 (idDelta arithmetic, no range array). */
  private def miniSfnt(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    def w32(v: Long): Unit = { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
    w32(0x00010000L); w16(1); w16(16); w16(0); w16(0) // header, 1 table
    bos.write("cmap".getBytes); w32(0); w32(28); w32(44) // tag chk off len
    // cmap header at 28: version 0, one record (3,1) at offset 12
    w16(0); w16(1); w16(3); w16(1); w32(12)
    // format 4 subtable: segCount 2
    w16(4); w16(32); w16(0) // format, length, language
    w16(4); w16(4); w16(1); w16(0) // segCountX2, search, entry, shift
    w16(0x43); w16(0xffff) // endCode
    w16(0) // pad
    w16(0x41); w16(0xffff) // startCode
    w16((5 - 0x41) & 0xffff); w16(1) // idDelta
    w16(0); w16(0) // idRangeOffset
    bos.toByteArray
  }

  /** Page-structured Identity-H PDF with an embedded font program. */
  private def identityHPdf(program: Array[Byte], content: String,
                           cidToGid: String = "/Identity",
                           fontFileKey: String = "/FontFile2")
      : Array[Byte] = {
    objPdf(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>", None),
      (4, s"<< /Length ${content.length} >>",
        Some(content.getBytes("ISO-8859-1"))),
      (5, "<< /Type /Font /Subtype /Type0 /BaseFont /Emb " +
        "/Encoding /Identity-H /DescendantFonts [10 0 R] >>", None),
      (10, "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Emb " +
        s"/CIDToGIDMap $cidToGid /FontDescriptor 11 0 R >>", None),
      (11, s"<< /Type /FontDescriptor /FontName /Emb $fontFileKey " +
        "12 0 R >>", None),
      (12, s"<< /Length ${program.length} >>", Some(program)))
  }

  test("Identity-H without ToUnicode: glyph ids invert through the " +
    "embedded program's format-4 cmap; unmapped glyphs U+FFFD") {
    val p = identityHPdf(miniSfnt(), "BT /F1 12 Tf <000500060007> Tj ET")
    val (t, _, _) = extract(p)
    assert(t == "ABC", t)
    // glyph 8 has no cmap source: U+FFFD, never a silent drop
    val (t2, _, _) = extract(identityHPdf(miniSfnt(),
      "BT /F1 12 Tf <00050008> Tj ET"))
    assert(t2 == "A�", t2)
  }

  test("Identity-H refusals keep the raw tier: stream-valued " +
    "CIDToGIDMap, FontFile3 (CFF), corrupt program") {
    // CIDToGIDMap as a stream ref: codes are NOT glyph ids — raw tier
    val (t1, _, _) = extract(identityHPdf(miniSfnt(),
      "BT /F1 12 Tf (ok) Tj ET", cidToGid = "13 0 R"))
    assert(t1 == "ok", t1)
    // FontFile3: CFF program, not inverted — raw tier
    val (t2, _, _) = extract(identityHPdf(miniSfnt(),
      "BT /F1 12 Tf (raw) Tj ET", fontFileKey = "/FontFile3"))
    assert(t2 == "raw", t2)
    // corrupt program: refused, raw tier survives
    val junk = Array.fill[Byte](40)(0x5a)
    val (t3, _, _) = extract(identityHPdf(junk,
      "BT /F1 12 Tf (junk) Tj ET"))
    assert(t3 == "junk", t3)
  }

  test("Identity-H cross-engine: java.awt.Font's own glyph ids for a " +
    "REAL system TrueType (DejaVu Sans) round-trip through the " +
    "kernel's cmap inversion — flate-compressed font program") {
    val path = java.nio.file.Paths.get(
      "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
    assume(java.nio.file.Files.exists(path))
    val fontBytes = java.nio.file.Files.readAllBytes(path)
    val awt = java.awt.Font.createFont(java.awt.Font.TRUETYPE_FONT,
      new java.io.ByteArrayInputStream(fontBytes))
    val frc = new java.awt.font.FontRenderContext(null, false, false)
    val msg = "Subset fonts decode!"
    val gv = awt.createGlyphVector(frc, msg)
    val hexCodes = (0 until gv.getNumGlyphs)
      .map(i => f"${gv.getGlyphCode(i)}%04X").mkString
    val program = zlib(fontBytes)
    val pdf = objPdf(
      (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
      (2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
      (3, "<< /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>", None),
      (4, {
        val c = s"BT /F1 12 Tf <$hexCodes> Tj ET"
        s"<< /Length ${c.length} >>"
      }, Some(s"BT /F1 12 Tf <$hexCodes> Tj ET".getBytes("ISO-8859-1"))),
      (5, "<< /Type /Font /Subtype /Type0 /BaseFont /DejaVuSans " +
        "/Encoding /Identity-H /DescendantFonts [10 0 R] >>", None),
      (10, "<< /Type /Font /Subtype /CIDFontType2 " +
        "/CIDToGIDMap /Identity /FontDescriptor 11 0 R >>", None),
      (11, "<< /Type /FontDescriptor /FontFile2 12 0 R >>", None),
      (12, s"<< /Length ${program.length} /Filter /FlateDecode >>",
        Some(program)))
    val r = PdfTextExtract.compute(pdf, 64, 1 << 24)
    assert(r != null)
    assert(r.getUTF8String(0).toString == msg)
  }

  // ---- round-16 filter completion: test-side ENCODERS (independent
  // from-spec implementations) drive the kernel's decoders ----

  /** PDF/TIFF LZW encoder: MSB-first 9→12-bit codes, leading Clear,
    * trailing EOD, width bump at 2^w - earlyChange. */
  private def lzwEncode(data: Array[Byte], earlyChange: Int): Array[Byte] = {
    val dict = new java.util.HashMap[String, Integer]()
    def reset(): Unit = {
      dict.clear()
      for (i <- 0 until 256) dict.put(s"$i", i)
    }
    reset()
    val bits = new scala.collection.mutable.ArrayBuffer[Boolean]
    var width = 9
    var next = 258
    def put(code: Int): Unit =
      for (i <- width - 1 to 0 by -1) bits += ((code >> i) & 1) == 1
    put(256) // leading Clear
    var cur = ""
    for (b <- data) {
      val k = b & 0xff
      val cand = if (cur.isEmpty) s"$k" else s"$cur,$k"
      if (dict.containsKey(cand)) cur = cand
      else {
        put(dict.get(cur))
        if (next < 4096) { dict.put(cand, next); next += 1 }
        // the encoder's table runs ONE AHEAD of the decoder's: bump
        // so the decoder's `next == 2^w - earlyChange` check aligns
        if (next == (1 << width) - earlyChange + 1 && width < 12) width += 1
        cur = s"$k"
      }
    }
    if (cur.nonEmpty) put(dict.get(cur))
    put(257) // EOD
    val out = new Array[Byte]((bits.length + 7) / 8)
    for ((bit, i) <- bits.zipWithIndex if bit)
      out(i / 8) = (out(i / 8) | (1 << (7 - i % 8))).toByte
    out
  }

  /** ASCII85 encoder with `z` shorthand and `~>` terminator. */
  private def a85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var acc = 0L
      for (k <- 0 until 4)
        acc = (acc << 8) | (if (i + k < data.length) data(i + k) & 0xffL else 0L)
      if (n == 4 && acc == 0) sb += 'z'
      else {
        val cs = new Array[Char](5)
        var a = acc
        for (k <- 4 to 0 by -1) { cs(k) = ('!' + (a % 85)).toChar; a /= 85 }
        sb ++= new String(cs, 0, n + 1)
      }
      i += 4
    }
    (sb.toString + "~>").getBytes("ISO-8859-1")
  }

  private def rlEncode(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && data(i + run) == data(i) && run < 127)
        run += 1
      if (run >= 3) {
        bos.write(257 - run); bos.write(data(i)); i += run
      } else {
        var lit = i + 1
        while (lit < data.length && lit - i < 128 &&
          !(lit + 2 < data.length && data(lit) == data(lit + 1) &&
            data(lit) == data(lit + 2))) lit += 1
        bos.write(lit - i - 1)
        bos.write(data, i, lit - i)
        i = lit
      }
    }
    bos.write(128)
    bos.toByteArray
  }

  private def rawStream(dict: String, data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("%PDF-1.4\n".getBytes)
    bos.write(s"1 0 obj << /Length ${data.length} $dict >>\nstream\n".getBytes)
    bos.write(data)
    bos.write("\nendstream\nendobj\n%%EOF".getBytes)
    bos.toByteArray
  }

  test("LZWDecode: early-change (default) and /EarlyChange 0 streams " +
    "extract; missing EOD or a code past the table fails closed") {
    val content = "BT (lzw lzw lzw repeats compress well well well) Tj ET"
    val enc1 = lzwEncode(content.getBytes("ISO-8859-1"), 1)
    val (t1, _, nd1) = extract(rawStream("/Filter /LZWDecode", enc1))
    assert(nd1 == 1 && t1 == "lzw lzw lzw repeats compress well well well")
    val enc0 = lzwEncode(content.getBytes("ISO-8859-1"), 0)
    val (t0, _, nd0) = extract(rawStream(
      "/Filter /LZWDecode /DecodeParms << /EarlyChange 0 >>", enc0))
    assert(nd0 == 1 && t0 == "lzw lzw lzw repeats compress well well well")
    // a long input forces width bumps: exercise 10..12-bit codes
    val long = ("BT (" + (0 until 400).map(i => s"w${i % 37}").mkString(" ") +
      ") Tj ET").getBytes("ISO-8859-1")
    val encL = lzwEncode(long, 1)
    val (tL, _, ndL) = extract(rawStream("/Filter /LZWDecode", encL))
    assert(ndL == 1 && tL.startsWith("w0 w1 w2") && tL.endsWith("w29"))
    // missing EOD: corrupt, skipped
    val noEod = java.util.Arrays.copyOf(enc1, enc1.length - 2)
    val (_, _, ndBad) = extract(rawStream("/Filter /LZWDecode", noEod))
    assert(ndBad == 0)
  }

  test("ASCII85Decode and ASCIIHexDecode streams extract; 'z' groups, " +
    "partial final group, whitespace and '>' EOD all handled") {
    val content = "BT (ascii85 partial group) Tj ET"
    val a85 = a85Encode(content.getBytes("ISO-8859-1"))
    val (t, _, nd) = extract(rawStream("/Filter /ASCII85Decode", a85))
    assert(nd == 1 && t == "ascii85 partial group")
    // 'z' shorthand: four zero bytes (kernel-level - NULs don't show)
    val zb = PdfTextExtract.a85Decode("z~>".getBytes("ISO-8859-1"), 100)
    assert(zb != null && zb.length == 4 && zb.forall(_ == 0))
    val hexContent = "BT (hex text) Tj ET"
    val hx = hexContent.getBytes("ISO-8859-1")
      .map(b => f"${b & 0xff}%02X").mkString(" ") + " >"
    val (t2, _, nd2) = extract(rawStream("/Filter /ASCIIHexDecode",
      hx.getBytes("ISO-8859-1")))
    assert(nd2 == 1 && t2 == "hex text")
    // 'z' inside a group is corrupt
    val badZ = "!!z!!~>".getBytes("ISO-8859-1")
    val (_, _, ndZ) = extract(rawStream("/Filter /ASCII85Decode", badZ))
    assert(ndZ == 0)
    // non-hex junk is corrupt
    val (_, _, ndJ) = extract(rawStream("/Filter /ASCIIHexDecode",
      "41 zz 42 >".getBytes("ISO-8859-1")))
    assert(ndJ == 0)
  }

  test("RunLengthDecode extracts; truncated run (no EOD) fails closed") {
    val content = "BT (rrrrrrrrrrun length encoded) Tj ET"
    val rl = rlEncode(content.getBytes("ISO-8859-1"))
    val (t, _, nd) = extract(rawStream("/Filter /RunLengthDecode", rl))
    assert(nd == 1 && t == "rrrrrrrrrrun length encoded")
    val noEod = java.util.Arrays.copyOf(rl, rl.length - 1)
    val (_, _, ndBad) = extract(rawStream("/Filter /RunLengthDecode", noEod))
    assert(ndBad == 0)
  }

  test("/Filter ARRAYS apply in sequence: [/ASCII85Decode /FlateDecode] " +
    "and [/AHx /LZW] (short names); unknown member fails closed") {
    val content = "BT (chained filters) Tj ET"
    val chained = a85Encode(zlib(content.getBytes("ISO-8859-1")))
    val (t, _, nd) = extract(rawStream(
      "/Filter [/ASCII85Decode /FlateDecode]", chained))
    assert(nd == 1 && t == "chained filters")
    val short = lzwEncode(content.getBytes("ISO-8859-1"), 1)
      .map(b => f"${b & 0xff}%02x").mkString.getBytes("ISO-8859-1")
    val (t2, _, nd2) = extract(rawStream("/Filter [/AHx /LZW]", short))
    assert(nd2 == 1 && t2 == "chained filters")
    val (_, _, nd3) = extract(rawStream(
      "/Filter [/ASCII85Decode /DCTDecode]", chained))
    assert(nd3 == 0)
  }

  test("unknown single filters (DCTDecode) skip-and-count — never raw-" +
    "scanned; /Predictor 12 (PNG Up) and 2 (TIFF) invert after Flate") {
    val (tU, nsU, ndU) = extract(rawStream("/Filter /DCTDecode",
      "BT (must not leak) Tj ET".getBytes("ISO-8859-1")))
    assert(nsU == 1 && ndU == 0 && tU == "")
    // PNG Up predictor: rows of (tag=2, row - prevRow), 10 columns
    val content = "BT (predicted content rows!!) Tj ET" // 35 chars
    val plain = (content + " " * (40 - content.length)).getBytes("ISO-8859-1")
    val cols = 10
    val pred = new java.io.ByteArrayOutputStream()
    for (r <- 0 until plain.length / cols) {
      pred.write(2)
      for (i <- 0 until cols) {
        val up = if (r > 0) plain((r - 1) * cols + i) & 0xff else 0
        pred.write(((plain(r * cols + i) & 0xff) - up) & 0xff)
      }
    }
    val (tP, _, ndP) = extract(rawStream(
      "/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 10 >>",
      zlib(pred.toByteArray)))
    assert(ndP == 1 && tP == "predicted content rows!!")
    // TIFF predictor 2: horizontal differencing, 1 component x 8 bits
    val tiff = plain.clone()
    for (i <- tiff.length - 1 until 0 by -1)
      if (i % cols != 0) tiff(i) = ((tiff(i) & 0xff) - (tiff(i - 1) & 0xff)).toByte
    val (tT, _, ndT) = extract(rawStream(
      "/Filter /FlateDecode /DecodeParms << /Predictor 2 /Columns 10 >>",
      zlib(tiff)))
    assert(ndT == 1 && tT == "predicted content rows!!")
    // bad PNG geometry (length not a multiple of rowBytes+1): skipped
    val (_, _, ndG) = extract(rawStream(
      "/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 9 >>",
      zlib(pred.toByteArray)))
    assert(ndG == 0)
  }
}
