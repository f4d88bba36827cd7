#!/usr/bin/env python3
"""TGA + netpbm dHash fixtures. Pixels come from a fixed arithmetic
formula; the expected hash is computed HERE by an independent python
reimplementation of the 9x8 grid contract, and a hand-framed BMP of
the same pixels lets the unit suite assert cross-KERNEL equality
(TGA == PPM == BMP through three different decoders)."""
import struct

W, H = 16, 8


def rgb(x, y):
    # wraps inside the sampled range so the hash has both bit values
    return ((x * 53 + y * 13) % 256, (x * 29 + y * 71) % 256,
            (x * 11 + y * 2) % 193)


def gray(x, y):
    return (x * 47 + y * 29) % 256


def dhash(px_func, w=W, h=H):
    """Independent python implementation of the shared grid hash."""
    def luma(x, y):
        r, g, b = px_func(x, y)
        return r * 299 + g * 587 + b * 114
    xs = [i * (w - 1) // 8 for i in range(9)]
    bits = 0
    for j in range(8):
        y = j * (h - 1) // 7
        for i in range(8):
            if luma(xs[i + 1], y) > luma(xs[i], y):
                bits |= 1 << (8 * j + i)
    return bits


def tga_truecolor():
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, W, H, 24, 0)
    body = b""
    for y in range(H - 1, -1, -1):  # bottom-up
        for x in range(W):
            r, g, b = rgb(x, y)
            body += bytes([b, g, r])
    return hdr + body


def tga_rle_topdown():
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0, W, H, 24,
                      0x20)
    pix = []
    for y in range(H):  # top-down origin
        for x in range(W):
            r, g, b = rgb(x, y)
            pix.append(bytes([b, g, r]))
    body = b""
    i = 0
    while i < len(pix):
        # alternate run and raw packets deterministically
        if (i // 5) % 2 == 0 and i + 1 < len(pix) and pix[i] == pix[i]:
            n = min(3, len(pix) - i)
            # runs must repeat ONE pixel: emit as raw unless truly equal
            if all(p == pix[i] for p in pix[i:i + n]) and n > 1:
                body += bytes([0x80 | (n - 1)]) + pix[i]
                i += n
                continue
        n = min(7, len(pix) - i)
        body += bytes([n - 1]) + b"".join(pix[i:i + n])
        i += n
    return hdr + body


def tga_gray():
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 3, 0, 0, 0, 0, 0, W, H, 8, 0)
    body = b""
    for y in range(H - 1, -1, -1):
        for x in range(W):
            body += bytes([gray(x, y)])
    return hdr + body


def ppm():
    body = b"".join(bytes(rgb(x, y)) for y in range(H) for x in range(W))
    return b"P6\n# graft raster fixture\n%d %d\n255\n" % (W, H) + body


def p3():
    vals = " ".join(" ".join(map(str, rgb(x, y)))
                    for y in range(H) for x in range(W))
    return (b"P3\n%d %d\n255\n" % (W, H)) + vals.encode() + b"\n"


def pgm():
    body = bytes(gray(x, y) for y in range(H) for x in range(W))
    return b"P5\n%d %d\n255\n" % (W, H) + body


def bmp():
    stride = (W * 3 + 3) // 4 * 4
    body = b""
    for y in range(H - 1, -1, -1):
        row = b""
        for x in range(W):
            r, g, b = rgb(x, y)
            row += bytes([b, g, r])
        body += row + b"\x00" * (stride - len(row))
    off = 54
    hdr = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off) +
           struct.pack("<IiiHHIIiiII", 40, W, H, 1, 24, 0, len(body),
                       2835, 2835, 0, 0))
    return hdr + body


def main():
    color_hash = dhash(rgb)
    gray_hash = dhash(lambda x, y: (gray(x, y),) * 3)
    print(f"COLOR_HASH {color_hash}")
    print(f"GRAY_HASH {gray_hash}")
    for name, data in [("tga_tc", tga_truecolor()),
                       ("tga_rle", tga_rle_topdown()),
                       ("tga_gray", tga_gray()), ("ppm", ppm()),
                       ("p3", p3()), ("pgm", pgm()), ("bmp", bmp())]:
        print(f"== {name} ({len(data)} bytes)")
        h = data.hex()
        for i in range(0, len(h), 76):
            print(h[i:i + 76])
        print()


if __name__ == "__main__":
    main()
