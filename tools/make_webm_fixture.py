#!/usr/bin/env python3
"""q331_webm_meta fixture generator: spec-exact EBML bytes for a webm
(VP8 video + Opus audio, 8-byte-float duration, explicit timescale)
and a matroska (subtitle-only, 4-byte float, DEFAULT timescale)
stream. The first track's 1-byte TrackNumber is a dynamic splice
point (EBML carries no checksum), so the oracle replays
doc_id % 5 + 1. Prints Scala hex literals."""
import struct


def sz(n):
    return bytes([0x40 | (n >> 8), n & 0xFF])


def elem(eid, body):
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    return idb + sz(len(body)) + body


def uint(v, n):
    return v.to_bytes(n, "big")


def header(doctype):
    return elem(0x1A45DFA3, elem(0x4286, uint(1, 1)) +
                elem(0x4282, doctype.encode()))


def track(num, tpe, codec):
    return elem(0xAE, elem(0xD7, uint(num, 1)) + elem(0x83, uint(tpe, 1)) +
                elem(0x86, codec.encode()))


def segment(body):
    return b"\x18\x53\x80\x67" + sz(len(body)) + body


# m0: webm, explicit 1e6 scale, duration 5000 ms, video+audio tracks;
# first track number = 0xEE placeholder byte (spliced per doc)
info0 = elem(0x1549A966, elem(0x2AD7B1, uint(1000000, 3)) +
             elem(0x4489, struct.pack(">d", 5000.0)))
tracks0 = elem(0x1654AE6B, track(0xEE, 1, "V_VP8") + track(2, 2, "A_OPUS"))
cluster = elem(0x1F43B675, b"\x77" * 24)
m0 = header("webm") + segment(info0 + tracks0 + cluster)
hex0 = m0.hex()
assert hex0.count("d74001ee") == 1
pre, post = hex0.split("d74001ee")

# m1: matroska, DEFAULT timescale, 4-byte float 1500 ms, subtitle only
info1 = elem(0x1549A966, elem(0x4489, struct.pack(">f", 1500.0)))
tracks1 = elem(0x1654AE6B, track(3, 17, "S_TEXT/UTF8"))
m1 = header("matroska") + segment(info1 + tracks1)

print('val m0pre = "%sd74001"' % pre)
print('val m0post = "%s"' % post)
print('val m1 = "%s"' % m1.hex())
