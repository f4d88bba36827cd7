#!/usr/bin/env python3
"""q339_avi_meta fixture: a minimal-but-complete AVI — RIFF/AVI,
LIST hdrl with MainAVIHeader (40 ms frames, 250 total, 320x240) and
two LIST strl streams (mjpg video on the 30000/1001 clock, 300
samples -> 10010 ms; 8 kHz pcm audio), then a LIST movi payload the
walk must skip by size. Prints the Scala hex literal."""
import struct


def le32(v):
    return struct.pack("<I", v)


def chunk(cc, body):
    pad = b"\0" if len(body) & 1 else b""
    return cc + le32(len(body)) + body + pad


def lst(kind, body):
    return chunk(b"LIST", kind + body)


def avih(us_per_frame, frames, streams, w, h):
    b = (le32(us_per_frame) + le32(0) + le32(0) + le32(0) + le32(frames)
         + le32(0) + le32(streams) + le32(0) + le32(w) + le32(h))
    return chunk(b"avih", b)


def strh(kind, handler, scale, rate, length):
    b = (kind + handler + le32(0) + le32(0) + le32(0) + le32(scale)
         + le32(rate) + le32(0) + le32(length) + le32(0))
    return chunk(b"strh", b)


hdrl = lst(b"hdrl",
           avih(40000, 250, 2, 320, 240)
           + lst(b"strl", strh(b"vids", b"mjpg", 1001, 30000, 300)
                 + chunk(b"strf", b"\0" * 40))
           + lst(b"strl", strh(b"auds", b"pcm ", 1, 8000, 80000)
                 + chunk(b"strf", b"\0" * 16)))
movi = lst(b"movi", chunk(b"00dc", b"\x01\x02\x03"))
body = b"AVI " + hdrl + movi
avi = b"RIFF" + le32(len(body)) + body

print("(%d bytes)" % len(avi))
print('val avi = "%s"' % avi.hex())
