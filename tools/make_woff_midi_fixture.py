#!/usr/bin/env python3
"""q355/q356 fixtures: a WOFF 1.0 wrapping the q354 'Graft Sans' face
(per-table zlib, spec-exact directory) and Standard MIDI Files — a
format-1 two-track file with a mid-song tempo change (duration
integrates to exactly 1500 ms) and an SMPTE-division variant
(25 fps x 40 tpf -> millisecond ticks). The JVM suite additionally
cross-checks the MIDI kernel against javax.sound.midi's own
sequencer math.

Prints Scala hex literals."""
import struct
import sys
import zlib

sys.path.insert(0, "tools")
from make_font_bin_fixture import ttf  # noqa: E402


def woff(sfnt):
    n = struct.unpack(">H", sfnt[4:6])[0]
    tables = []
    for i in range(n):
        r = 12 + 16 * i
        tag = sfnt[r:r + 4]
        off, ln = struct.unpack(">II", sfnt[r + 8:r + 16])
        tables.append((tag, sfnt[off:off + ln]))
    dir_ = b""
    body = b""
    pos = 44 + 20 * n
    for tag, data in tables:
        comp = zlib.compress(data, 9)
        use = comp if len(comp) < len(data) else data
        dir_ += tag + struct.pack(">IIII", pos, len(use), len(data),
                                  zlib.crc32(data) & 0)  # checksum unused
        body += use + b"\x00" * (-len(use) % 4)
        pos += len(use) + (-len(use) % 4)
    total_sfnt = 12 + 16 * n + sum(len(d) + (-len(d) % 4)
                                   for _, d in tables)
    hdr = (b"wOFF" + sfnt[0:4] + struct.pack(">I", pos) +
           struct.pack(">HH", n, 0) + struct.pack(">I", total_sfnt) +
           struct.pack(">HH", 1, 0) +
           struct.pack(">IIIII", 0, 0, 0, 0, 0))
    assert len(hdr) == 44
    return hdr + dir_ + body


def vlq(v):
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append(0x80 | (v & 0x7F))
        v >>= 7
    return bytes(reversed(out))


def track(events):
    body = b"".join(vlq(d) + e for d, e in events)
    return b"MTrk" + struct.pack(">I", len(body)) + body


def midi_tempo():
    t0 = track([
        (0, b"\xff\x51\x03" + b"\x07\xa1\x20"),   # 500000 us/qn
        (960, b"\xff\x51\x03" + b"\x03\xd0\x90"),  # 250000 us/qn
        (0, b"\xff\x2f\x00"),
    ])
    t1 = track([
        (0, b"\x90\x3c\x64"),      # note on C4
        (480, b"\x80\x3c\x00"),    # note off
        (480, b"\x90\x3c\x64"),    # tick 960
        (960, b"\x3c\x00"),        # RUNNING STATUS note-on vel 0 = off
        (0, b"\xff\x2f\x00"),
    ])
    return (b"MThd" + struct.pack(">IHHH", 6, 1, 2, 480) + t0 + t1)


def midi_smpte():
    div = ((-25 & 0xFF) << 8) | 40  # 25 fps x 40 tpf = ms ticks
    t0 = track([
        (0, b"\x90\x40\x50"),
        (2500, b"\x80\x40\x00"),
        (0, b"\xff\x2f\x00"),
    ])
    return b"MThd" + struct.pack(">IHHH", 6, 0, 1, div) + t0


def scala_hex(name, b):
    h = b.hex().upper()
    lines = [h[i:i + 60] for i in range(0, len(h), 60)]
    body = " +\n    ".join('"%s"' % ln for ln in lines)
    print("  private val %s: String =\n    %s\n" % (name, body))


if __name__ == "__main__":
    w = woff(ttf())
    m1 = midi_tempo()
    m2 = midi_smpte()
    print("// woff %d, midi %d / %d bytes" % (len(w), len(m1), len(m2)))
    scala_hex("woffHex", w)
    scala_hex("midiTempoHex", m1)
    scala_hex("midiSmpteHex", m2)
