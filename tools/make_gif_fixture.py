#!/usr/bin/env python3
"""Pinned GIF fixtures for q320_gif_dhash.

Builds two deterministic grayscale GIFs (hand LZW, root-only codes)
plus computes their expected dHash INDEPENDENTLY of the Scala kernel
(same public contract: 9x8 nearest grid, luma 299R+587G+114B,
bit (j,i) = right>left, packed sum bit<<(8j+i)).

Run: python3 tools/make_gif_fixture.py
Paste the printed hex + hash constants into SparkEntry's q320.
"""
import sys


def lzw_roots(pixels, min_code):
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = nbits = 0
    code_size = min_code + 1

    def put(c):
        nonlocal acc, nbits
        acc |= c << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    nxt = end + 1
    first = True
    for p in pixels:
        put(p)
        if not first and nxt < 4096:
            nxt += 1
            if nxt == (1 << code_size) and code_size < 12:
                code_size += 1
        first = False
    put(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_of(v, w, h):
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0xF7, 0, 0])
    for i in range(256):
        out += bytes([i, i, i])
    out += bytes([0x2C]) + b"\0\0\0\0"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\0"
    pixels = [v(x, y) & 0xFF for y in range(h) for x in range(w)]
    out.append(8)
    code = lzw_roots(pixels, 8)
    for off in range(0, len(code), 255):
        chunk = code[off:off + 255]
        out.append(len(chunk))
        out += chunk
    out += bytes([0, 0x3B])
    return bytes(out)


def dhash(v, w, h):
    xs = [i * (w - 1) // 8 for i in range(9)]
    bits = 0
    for j in range(8):
        y = j * (h - 1) // 7
        def luma(x):
            g = v(x, y) & 0xFF
            return g * 299 + g * 587 + g * 114
        for i in range(8):
            if luma(xs[i + 1]) > luma(xs[i]):
                bits |= 1 << (8 * j + i)
    # Scala Long is signed 64-bit
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def png3_of(v, w, h):
    """Color-type-3 (palette) PNG of the same gray pattern — the
    cross-format branch: its dHash must equal the GIF/BMP hash."""
    import zlib, struct

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data +
                struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    plte = bytes(i for i in range(256) for _ in range(3))
    raw = b"".join(
        b"\0" + bytes((v(x, y) & 0xFF) for x in range(w))
        for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"PLTE", plte) + chunk(b"IDAT", zlib.compress(raw)) +
            chunk(b"IEND", b""))


def animated_gif(v, w, h, delays, loop):
    """Two-frame GIF89a: NETSCAPE2.0 loop extension + one GCE per
    frame — the q322 animation-census fixture."""
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0xF7, 0, 0])
    for i in range(256):
        out += bytes([i, i, i])
    out += bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0"
    out += bytes([3, 1]) + loop.to_bytes(2, "little") + b"\0"
    for f, delay in enumerate(delays):
        out += bytes([0x21, 0xF9, 4, 0]) + delay.to_bytes(2, "little")
        out += bytes([0, 0])
        out += bytes([0x2C]) + b"\0\0\0\0"
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\0"
        pixels = [(v(x, y) + f) & 0xFF for y in range(h) for x in range(w)]
        out.append(8)
        code = lzw_roots(pixels, 8)
        for off in range(0, len(code), 255):
            chunk = code[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += bytes([0x3B])
    return bytes(out)


def tiff_gray(v, w, h, inverted=False):
    """Minimal little-endian uncompressed grayscale TIFF of the same
    pattern — its dHash must equal the GIF/BMP/PNG hash (q326);
    inverted=True stores 255-v with photometric 0, hashing the same."""
    import struct
    pixels = bytes(((255 - (v(x, y) & 0xFF)) if inverted else
                    (v(x, y) & 0xFF))
                   for y in range(h) for x in range(w))
    # layout: header(8) + pixels + IFD
    ifd_at = 8 + len(pixels)
    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
        (259, 3, 1, 1), (262, 3, 1, 0 if inverted else 1),
        (273, 4, 1, 8), (277, 3, 1, 1), (278, 3, 1, h),
        (279, 4, 1, len(pixels)),
    ]
    out = b"II*\0" + struct.pack("<I", ifd_at) + pixels
    out += struct.pack("<H", len(tags))
    for tag, tpe, cnt, val in tags:
        out += struct.pack("<HHI", tag, tpe, cnt)
        out += struct.pack("<I", val) if tpe == 4 else struct.pack("<HH", val, 0)
    out += struct.pack("<I", 0)
    return out


def webp_anim(durations, loop):
    """Animated WebP (VP8X animation bit + ANIM + one ANMF per
    duration) — the q324 census fixture; frame data is opaque."""
    def chunk(tag, data):
        pad = b"\0" if len(data) % 2 else b""
        return tag + len(data).to_bytes(4, "little") + data + pad

    body = chunk(b"VP8X", bytes([0x02, 0, 0, 0]) +
                 (15).to_bytes(3, "little") + (15).to_bytes(3, "little"))
    body += chunk(b"ANIM", b"\0\0\0\0" + loop.to_bytes(2, "little"))
    for d in durations:
        anmf = (b"\0\0\0" * 2 + (15).to_bytes(3, "little") +
                (15).to_bytes(3, "little") + d.to_bytes(3, "little") +
                bytes([0]) + b"\x2f\x00\x00")
        body += chunk(b"ANMF", anmf)
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" + body


def main():
    a = lambda x, y: (x * 13 + y * 7) % 200
    b = lambda x, y: (x * 29 + y * 3 + 31) % 177
    ga, gb = gif_of(a, 16, 16), gif_of(b, 16, 16)
    print("gifA hex:")
    print(ga.hex())
    print("gifB hex:")
    print(gb.hex())
    print("png3A hex:")
    print(png3_of(a, 16, 16).hex())
    print("animated hex (2 frames, delays 10+25 cs, loop 3):")
    print(animated_gif(a, 4, 4, [10, 25], 3).hex())
    print("webp anim hex (3 frames, 40+60+100 ms, loop 2):")
    print(webp_anim([40, 60, 100], 2).hex())
    print("tiff gray hex (pattern A -> hashA):")
    print(tiff_gray(a, 16, 16).hex())
    print("tiff inverted hex (photometric 0 -> same hash):")
    print(tiff_gray(a, 16, 16, inverted=True).hex())
    print("hashA =", dhash(a, 16, 16))
    print("hashB =", dhash(b, 16, 16))


if __name__ == "__main__":
    sys.exit(main())
