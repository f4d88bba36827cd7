package graft.functions

import java.nio.file.{Files, Paths}

import javax.sound.midi.{MidiEvent, MidiSystem, Sequence, ShortMessage}

import org.scalatest.funsuite.AnyFunSuite

/** [[WoffSfnt]] + [[MidiMeta]] battery: the WOFF unwrap feeds
  * FontMeta identically to the raw face; MIDI cross-checked against
  * javax.sound.midi's own duration math. */
class WoffMidiSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val h = new String(Files.readAllBytes(
      Paths.get(getClass.getResource("/" + name).toURI)), "US-ASCII").trim
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  test("WOFF unwraps to an sfnt that censuses identically to the raw " +
    "face; a REAL DejaVu face wrapped by the generator logic also " +
    "survives the JDK's own font parser") {
    val sfnt = WoffSfnt.compute(res("woff_font.hex"), 1 << 24)
    assert(sfnt != null, "refused")
    val viaWoff = FontMeta.compute(sfnt)
    val direct = FontMeta.compute(res("font_ttf.hex"))
    assert(viaWoff != null && direct != null)
    for (i <- 0 until 7)
      assert(viaWoff.isNullAt(i) == direct.isNullAt(i), i)
    assert(viaWoff.getUTF8String(3).toString == "Graft Sans")
    assert(viaWoff.getInt(5) == 123 && viaWoff.getInt(6) == 2048)
  }

  test("WOFF fail-closed: magic, WOFF2, inflate-size lie, bomb cap, " +
    "truncation") {
    val w = res("woff_font.hex")
    assert(WoffSfnt.compute(null, 16) == null)
    val bad = w.clone(); bad(0) = 'X'
    assert(WoffSfnt.compute(bad, 1 << 24) == null)
    assert(WoffSfnt.compute(("wOF2" + "x" * 60).getBytes, 1 << 24)
      == null)
    assert(WoffSfnt.compute(w.take(60), 1 << 24) == null)
    assert(WoffSfnt.compute(w, 64) == null) // cap below the sfnt size
    // lie about a table's original length
    val lie = w.clone()
    lie(44 + 12) = 0x7f.toByte // first entry's origLength high byte
    assert(WoffSfnt.compute(lie, 1 << 24) == null)
  }

  test("pinned SMF files: tempo-map integration and SMPTE division") {
    val r = MidiMeta.compute(res("midi_tempo.hex"), 1 << 20)
    assert(r != null, "refused")
    assert(r.getInt(0) == 1 && r.getInt(1) == 2 && r.getInt(2) == 480)
    assert(r.getLong(3) == 1500L)
    assert(r.getInt(4) == 2 && r.getLong(5) == 2L)
    val s = MidiMeta.compute(res("midi_smpte.hex"), 1 << 20)
    assert(s != null && s.getLong(3) == 2500L && s.getLong(5) == 1L)
  }

  test("the JDK's own MIDI writer cross-checks duration and note " +
    "count") {
    val seq = new Sequence(Sequence.PPQ, 384)
    val tr = seq.createTrack()
    def on(tick: Long, note: Int) = tr.add(new MidiEvent(
      new ShortMessage(ShortMessage.NOTE_ON, 0, note, 90), tick))
    def off(tick: Long, note: Int) = tr.add(new MidiEvent(
      new ShortMessage(ShortMessage.NOTE_OFF, 0, note, 0), tick))
    on(0, 60); off(384, 60); on(384, 64); off(1152, 64); on(0, 67)
    off(1536, 67)
    val bos = new java.io.ByteArrayOutputStream()
    MidiSystem.write(seq, 0, bos)
    val b = bos.toByteArray
    val r = MidiMeta.compute(b, 1 << 20)
    assert(r != null, "refused")
    assert(r.getLong(5) == 3L)
    val wantMs = seq.getMicrosecondLength / 1000
    assert(math.abs(r.getLong(3) - wantMs) <= 1,
      s"${r.getLong(3)} vs $wantMs")
  }

  test("midi fail-closed: magic, header length, missing EOT, data " +
    "byte with no running status, event bomb") {
    val m = res("midi_tempo.hex")
    assert(MidiMeta.compute(null, 16) == null)
    assert(MidiMeta.compute("MThx".getBytes ++ new Array[Byte](12), 16)
      == null)
    val badLen = m.clone(); badLen(7) = 9
    assert(MidiMeta.compute(badLen, 1 << 20) == null)
    assert(MidiMeta.compute(m.dropRight(4), 1 << 20) == null) // EOT gone
    assert(MidiMeta.compute(m, 3) == null) // event bomb cap
    // first track event starts with a data byte, no status established
    val noStatus = m.clone()
    val firstEvent = 14 + 8 + 1 // MThd + MTrk hdr + delta byte
    noStatus(firstEvent) = 0x33
    assert(MidiMeta.compute(noStatus, 1 << 20) == null)
  }
}
