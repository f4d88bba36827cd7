package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** [[SubtitleCues]] battery: SRT and VTT shapes, CRLF + BOM, NOTE/
  * STYLE skipping, karaoke tags, refusals. */
class SubtitleCuesSpec extends AnyFunSuite {

  private def cues(s: String): Seq[(String, Long, Long, String)] = {
    val a = SubtitleCues.compute(s, 1 << 16)
    assert(a != null, "refused")
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 4)
      (if (r.isNullAt(0)) null else r.getUTF8String(0).toString,
        r.getLong(1), r.getLong(2), r.getUTF8String(3).toString)
    }
  }

  test("SRT: index lines, comma decimals, multi-line text, tag strip, " +
    "CRLF") {
    val srt = "1\r\n00:00:01,000 --> 00:00:02,500\r\n" +
      "Hello <i>world</i>\r\nsecond line\r\n\r\n" +
      "2\r\n01:02:03,250 --> 01:02:04,000\r\nBye\r\n"
    assert(cues(srt) == Seq(
      ("1", 1000L, 2500L, "Hello world\nsecond line"),
      ("2", 3723250L, 3724000L, "Bye")))
    // dot decimal tolerated; no index line tolerated
    assert(cues("00:00:01.500 --> 00:00:02.000\nx\n") ==
      Seq((null, 1500L, 2000L, "x")))
  }

  test("VTT: BOM + header text, NOTE/STYLE blocks, cue ids, short " +
    "timestamps, settings, karaoke tags") {
    val vtt = "﻿WEBVTT - with header\n\n" +
      "STYLE\n::cue { color: red }\n\n" +
      "NOTE\nthis is a note\n\n" +
      "chapter-1\n05:00.000 --> 05:02.000 align:start position:10%\n" +
      "<c.yellow>styled</c> and <00:05:01.000>karaoke\n\n" +
      "00:00:07.000 --> 00:00:08.000\nplain\n"
    assert(cues(vtt) == Seq(
      ("chapter-1", 300000L, 302000L, "styled and karaoke"),
      (null, 7000L, 8000L, "plain")))
  }

  test("empties: header-only VTT and whitespace input yield zero " +
    "cues, not null") {
    assert(cues("WEBVTT\n").isEmpty)
    assert(cues("").isEmpty)
    assert(cues("  \n \n").isEmpty)
  }

  test("fail-closed: malformed timing, end < start, minutes/seconds " +
    "out of range, junk block, cue bomb") {
    assert(SubtitleCues.compute("1\n00:00:01,000 --> junk\nX\n", 16) == null)
    assert(SubtitleCues.compute(
      "00:00:05,000 --> 00:00:04,000\nX\n", 16) == null)
    assert(SubtitleCues.compute(
      "00:61:00,000 --> 00:62:00,000\nX\n", 16) == null)
    assert(SubtitleCues.compute("random prose\nno timing here\n", 16)
      == null)
    val many = (1 to 5).map(i =>
      s"00:00:0$i,000 --> 00:00:0$i,500\nc$i\n").mkString("\n")
    assert(SubtitleCues.compute(many, 3) == null)
    assert(SubtitleCues.compute(many, 5) != null)
  }
}
