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
}
