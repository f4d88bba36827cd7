package graft.functions

import graft.SparkSpec

/** PowerPoint 97 text extraction over the spec-exact fixture from
  * tools/make_ppt_fixture.py: containers recurse, TextCharsAtom and
  * TextBytesAtom collect in stream order, non-text atoms skip,
  * control chars normalize; fail-closed surface pinned. */
class PptTextSpec extends SparkSpec {
  import spark.implicits._

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    assert(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  private val expected =
    "Unicode slide — ünïcode ✓\nsecond line\nBytes title\nsubtitle\n"

  test("ppt_text: container recursion, both text atom kinds in " +
    "stream order, CR/VT normalization, non-text atoms skipped") {
    val got = PptText.compute(res("/ppt/deck.ppt"), 1 << 24)
    assert(got != null && got.toString == expected)
  }

  test("ppt_text fails closed: truncation cuts, malformed record " +
    "length, no PowerPoint Document stream, nesting bomb") {
    val ok = res("/ppt/deck.ppt")
    for (cut <- Seq(100, 512, 1024, 1536, ok.length - 600))
      assert(PptText.compute(ok.take(cut), 1 << 24) == null,
        s"truncated at $cut")
    // poison the Document container's length field (stream starts at
    // the mini-stream container, file offset 512*4; len at +4)
    val bad = ok.clone()
    bad(512 * 4 + 4) = 0x7f.toByte
    assert(PptText.compute(bad, 1 << 24) == null)
    // a .doc / .xls payload is not a deck
    assert(PptText.compute(res("/cfb/small.doc"), 1 << 24) == null)
    assert(PptText.compute(res("/xls/a.xls"), 1 << 24) == null)
  }

  test("documentText routes cfb decks through ppt_text alongside " +
    "doc and xls payloads") {
    val dt = graft.ext.Multimodal.documentText(
      Seq((1L, res("/ppt/deck.ppt")), (2L, res("/cfb/small.doc")),
        (3L, res("/xls/a.xls")))
        .toDF("doc_id", "payload")).orderBy("doc_id").collect()
    assert(dt(0).getString(1) == "cfb" && dt(0).getString(2) == expected)
    assert(dt(1).getString(2).startsWith("Legacy Word text."))
    assert(dt(2).getString(2).startsWith("hello\nwörld ✓"))
  }
}
