#!/usr/bin/env python3
"""q348_aiff_meta fixtures: spec-exact AIFF / AIFF-C files with
hand-encoded 80-bit IEEE-extended sample rates, cross-checked with
python's own aifc reader where the module still exists (<=3.12).

- a_aiff: AIFF, 2ch x 16-bit @ 44100, 44100 frames -> 1000 ms
- a_aifc: AIFF-C 'NONE', 1ch x 32-bit @ 22050.5, 44101 frames ->
  2000 ms exactly (the non-integer rate proves the extended decode)

Prints Scala hex literals."""
import struct


def extended80(x):
    if x == 0:
        return b"\x00" * 10
    sign = 0
    if x < 0:
        sign = 0x8000
        x = -x
    m, e = 0, 16383 + 63
    f = x
    # normalize so the integer bit of the 64-bit mantissa is set
    while f < (1 << 63):
        f *= 2
        e -= 1
    while f >= (1 << 64):
        f /= 2
        e += 1
    m = int(f)
    return struct.pack(">HQ", sign | e, m)


def chunk(cc, body):
    out = cc + struct.pack(">i", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return out


def build(form, channels, bits, rate, frames, codec=None):
    comm = struct.pack(">hLh", channels, frames, bits) + extended80(rate)
    if form == b"AIFC":
        comm += codec + b"\x0enot compressed\x00"  # pstring, padded
    body = (chunk(b"COMM", comm) +
            chunk(b"SSND", struct.pack(">LL", 0, 0) + b"\x01\x02\x03\x04"))
    return b"FORM" + struct.pack(">i", 4 + len(body)) + form + body


def scala_hex(name, b):
    h = b.hex().upper()
    lines = [h[i:i + 60] for i in range(0, len(h), 60)]
    body = " +\n    ".join('"%s"' % ln for ln in lines)
    print("  private val %s: String =\n    %s\n" % (name, body))


if __name__ == "__main__":
    blob_aiff = build(b"AIFF", 2, 16, 44100.0, 44100)
    blob_aifc = build(b"AIFC", 1, 32, 22050.5, 44101, codec=b"NONE")
    try:
        import aifc as aifc_mod
        import io
        f = aifc_mod.open(io.BytesIO(blob_aiff))
        assert (f.getnchannels(), f.getsampwidth() * 8, f.getframerate(),
                f.getnframes()) == (2, 16, 44100, 44100)
        g = aifc_mod.open(io.BytesIO(blob_aifc))
        assert (g.getnchannels(), g.getframerate(),
                g.getnframes()) == (1, 22050, 44101)  # aifc floors rate
        print("// cross-checked with python aifc")
    except ImportError:
        print("// python aifc module absent (3.13+): manual build only")
    print("// %d / %d bytes" % (len(blob_aiff), len(blob_aifc)))
    scala_hex("aiffHex", blob_aiff)
    scala_hex("aifcHex", blob_aifc)
