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
