package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** [[AssCues]] battery: Format-declared field order (including a
  * REORDERED declaration), V4 `Marked=` layers, override-tag strip,
  * `\N` newlines, literal commas in text, refusals. */
class AssCuesSpec extends AnyFunSuite {

  private def cues(s: String)
      : Seq[(Int, String, String, Long, Long, String)] = {
    val a = AssCues.compute(s, 1 << 16)
    assert(a != null, "refused")
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 6)
      (r.getInt(0), r.getUTF8String(1).toString,
        if (r.isNullAt(2)) null else r.getUTF8String(2).toString,
        r.getLong(3), r.getLong(4), r.getUTF8String(5).toString)
    }
  }

  private val standard =
    """[Script Info]
      |Title: graft test
      |ScriptType: v4.00+
      |
      |[V4+ Styles]
      |Format: Name, Fontname
      |Style: Default,Arial
      |
      |[Events]
      |Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
      |Dialogue: 0,0:00:01.50,0:00:03.25,Default,Rei,0,0,0,,{\i1}Hello{\i0} world
      |Comment: 0,0:00:04.00,0:00:05.00,Default,,0,0,0,,never shown
      |Dialogue: 2,0:01:00.00,0:01:02.00,Sign,,0,0,0,,line one\Nline two, with comma
      |""".stripMargin

  test("standard V4+ file: layer/style/speaker, centisecond times, " +
    "override strip, \\N newline, literal comma in text, Comment skip") {
    assert(cues(standard) == Seq(
      (0, "Default", "Rei", 1500L, 3250L, "Hello world"),
      (2, "Sign", null, 60000L, 62000L, "line one\nline two, with comma")))
  }

  test("REORDERED Format declaration resolves by name, not position; " +
    "V4 Marked= spells the layer; \\h hard space") {
    val reordered =
      """[Events]
        |Format: Start, End, Style, Layer, Text
        |Dialogue: 0:00:02.00,0:00:03.00,Top,5,a\hb
        |""".stripMargin
    assert(cues(reordered) == Seq((5, "Top", null, 2000L, 3000L, "a b")))
    val v4 =
      """[Events]
        |Format: Marked, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
        |Dialogue: Marked=1,0:00:01.00,0:00:02.00,Default,,0,0,0,,old ssa
        |""".stripMargin
    assert(cues(v4) == Seq((1, "Default", null, 1000L, 2000L, "old ssa")))
  }

  test("empties and refusals: no [Events] is an empty array; " +
    "Dialogue before Format, bad timecode, end<start, Format " +
    "without Text-last all refuse") {
    assert(cues("[Script Info]\nTitle: x\n").isEmpty)
    assert(AssCues.compute(
      "[Events]\nDialogue: 0,0:00:01.00,0:00:02.00,S,,0,0,0,,x\n",
      64) == null)
    assert(AssCues.compute(
      "[Events]\nFormat: Layer, Start, End, Style, Text\n" +
        "Dialogue: 0,garbage,0:00:02.00,S,x\n", 64) == null)
    assert(AssCues.compute(
      "[Events]\nFormat: Layer, Start, End, Style, Text\n" +
        "Dialogue: 0,0:00:05.00,0:00:02.00,S,x\n", 64) == null)
    assert(AssCues.compute(
      "[Events]\nFormat: Layer, Start, Text, End\n" +
        "Dialogue: 0,0:00:01.00,x,0:00:02.00\n", 64) == null)
    // cue bomb
    assert(AssCues.compute(standard, 1) == null)
    // a Format in a LATER section does not leak into [Events]
    assert(AssCues.compute(
      "[Other]\nFormat: Layer, Start, End, Style, Text\n" +
        "[Events]\nDialogue: 0,0:00:01.00,0:00:02.00,S,x\n", 64) == null)
  }
}
