#!/usr/bin/env python3
"""Build the q336 compressed-TIFF fixtures.

Takes the q326 uncompressed LE gray TIFF's pixel grid (16x16, the
cross-format dHash pattern) and re-encodes it three ways — TIFF LZW
(early-change variable-width codes), PackBits, and Deflate with
Predictor 2 (horizontal differencing) — wrapping each in a minimal
little-endian TIFF. All three must hash to the SAME pinned dHash
constant as the uncompressed q326 fixture (-1157460564566376449),
verified here with an independent from-spec dHash implementation.

Validation-only tooling (python stdlib); never a library dependency.
"""
import struct
import zlib

# q326 "plain" fixture: II, IFD at 8+256, pixels at [8, 264)
PLAIN_HEX = (
    "49492a0008010000000d1a2734414e5b6875828f9ca9b6c30714212e3b4855626f7c"
    "8996a3b0bd020e1b2835424f5c697683909daab7c40915222f3c495663707d8a97a4"
    "b1be03101c293643505d6a7784919eabb8c50a1723303d4a5764717e8b98a5b2bf04"
    "111e2a3744515e6b7885929facb9c60b1825313e4b5865727f8c99a6b3c005121f2c"
    "3845525f6c798693a0adbac70c1926333f4c596673808d9aa7b4c10613202d3a4653"
    "606d7a8794a1aebb000d1a2734414d5a6774818e9ba8b5c20714212e3b4854616e7b"
    "8895a2afbc010e1b2835424f5b6875828f9ca9b6c30815222f3c4956626f7c8996a3"
    "b0bd020f1c293643505d697683909daab7c4091623303d4a5764"
)
W = H = 16
PINNED = -1157460564566376449


def pixels():
    b = bytes.fromhex(PLAIN_HEX)
    assert b[:4] == b"II*\0"
    return b[8:8 + W * H]


def dhash(px):
    xs = [i * (W - 1) // 8 for i in range(9)]
    h = 0
    for j in range(8):
        y = j * (H - 1) // 7
        for k in range(8):
            if px[y * W + xs[k + 1]] > px[y * W + xs[k]]:
                h |= 1 << (8 * j + k)
    return h - (1 << 64) if h >= (1 << 63) else h


def packbits(data):
    # all-literal runs of <=128 bytes: valid, simple, deterministic
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i:i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def tiff_lzw(data):
    """TIFF LZW encode: MSB-first codes, width 9..12, EARLY CHANGE
    (bump when the next code to assign is 2^w - 1)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf, nbits = 0, 0

    state = {"table": {bytes([i]): i for i in range(256)},
             "next": 258, "width": 9}

    def put(code):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << state["width"]) | code
        nbits += state["width"]
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    put(CLEAR)
    w = b""
    for c in data:
        wc = w + bytes([c])
        if wc in state["table"]:
            w = wc
        else:
            put(state["table"][w])
            state["table"][wc] = state["next"]
            state["next"] += 1
            # early change: width grows when next == 2^w - 1
            if state["next"] == (1 << state["width"]) - 1 \
                    and state["width"] < 12:
                state["width"] += 1
            w = bytes([c])
    if w:
        put(state["table"][w])
    put(EOI)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def predictor2(px, channels=1):
    out = bytearray(px)
    for y in range(H):
        base = y * W * channels
        for p in range(W * channels - 1, channels - 1, -1):
            out[base + p] = (px[base + p] - px[base + p - channels]) & 0xFF
    return bytes(out)


def tiff_wrap(strip, comp, predictor=None):
    tags = [
        (256, 3, W), (257, 3, H), (258, 3, 8), (259, 3, comp),
        (262, 3, 1), (273, 4, 8), (277, 3, 1), (278, 3, H),
        (279, 4, len(strip)),
    ]
    if predictor:
        tags.append((317, 3, predictor))
    pad = len(strip) & 1
    ifd_at = 8 + len(strip) + pad
    out = bytearray(b"II*\0")
    out += struct.pack("<I", ifd_at)
    out += strip + b"\0" * pad
    out += struct.pack("<H", len(tags))
    for tag, tpe, val in sorted(tags):
        out += struct.pack("<HHI", tag, tpe, 1)
        out += struct.pack("<I", val) if tpe == 4 \
            else struct.pack("<HH", val, 0)
    out += struct.pack("<I", 0)
    return bytes(out)


def main():
    px = pixels()
    assert dhash(px) == PINNED, dhash(px)
    fixtures = {
        "lzw": tiff_wrap(tiff_lzw(px), 5),
        "packbits": tiff_wrap(packbits(px), 32773),
        "deflate_pred2": tiff_wrap(zlib.compress(predictor2(px)), 8,
                                   predictor=2),
    }
    for name, data in fixtures.items():
        print(f"{name} ({len(data)} bytes):\n{data.hex()}\n")


if __name__ == "__main__":
    main()
