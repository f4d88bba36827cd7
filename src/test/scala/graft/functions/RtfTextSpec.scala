package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RtfTextSpec extends SparkSpec {
  import spark.implicits._

  private def rtf(s: String): String = {
    val r = RtfText.compute(s.getBytes("ISO-8859-1"), 1 << 20)
    if (r == null) null else r.toString
  }

  test("rtf_text: control words, destinations dropped, pars/tabs, " +
    "escapes, hex cp1252, unicode with uc fallback skip") {
    // NB: the single space after \b0 is the control-word DELIMITER
    // (swallowed per spec) — a literal space needs a second one,
    // exactly as Word's own writer emits
    assert(rtf("{\\rtf1\\ansi\\deff0 {\\fonttbl{\\f0 Times;}}" +
      "{\\colortbl;\\red0\\green0\\blue0;}\\f0\\fs24 Hello \\b bold\\b0" +
      "  world.\\par Second line.\\par}")
      == "Hello bold world.\nSecond line.\n")
    // hex escape é, \~ nbsp, em dash, escaped braces
    assert(rtf("{\\rtf1 caf\\'e9\\~au\\~lait \\emdash \\{ok\\}}")
      == "café au lait —{ok}")
    // unicode escapes: euro, default uc=1 fallback swallowed
    assert(rtf("{\\rtf1 price \\u8364?100}") == "price €100")
    // negative code points (the spec's signed-16 form) + surrogates
    assert(rtf("{\\rtf1 \\u-10179?\\u-8704? done}") == "😀 done")
    // \uc2 swallows TWO fallback chars (here a hex escape + a raw
    // char); the group close restores uc=1 for the following \u234
    assert(rtf("{\\rtf1 {\\uc2 x\\u233\\'e9y}\\u234?z}") == "xéêz")
    // unknown {\*\dest} and named destinations drop whole
    assert(rtf("{\\rtf1 A{\\*\\generator Riched20;}B{\\info{\\author x}}C" +
      "{\\pict 0102abcd}D}") == "ABCD")
    // raw newlines in the file are NOT text; \<newline> is a par
    assert(rtf("{\\rtf1 one\r\ntwo \\\nthree}") == "onetwo \nthree")
    // tabs and cells
    assert(rtf("{\\rtf1 a\\tab b\\cell c\\row}") == "a\tb\tc\n")
  }

  test("rtf_text fails closed + dispatches: non-RTF, unbalanced " +
    "groups, trailing garbage; sniffFormat labels rtf and " +
    "documentText extracts it") {
    assert(rtf("plain text") == null)
    assert(rtf("{\\rtf1 unbalanced") == null)
    assert(rtf("{\\rtf1 ok}trailing junk") == null)
    assert(rtf("{\\rtf1 ok}\r\n  ") == "ok") // trailing whitespace fine
    val payload = "{\\rtf1 From \\b doc\\b0 .\\par}".getBytes("ISO-8859-1")
    val rows = Seq((1L, payload)).toDF("doc_id", "payload")
    val dt = graft.ext.Multimodal.documentText(rows).collect()(0)
    assert(dt.getString(1) == "rtf" && dt.getString(2) == "From doc.\n")
  }
}
