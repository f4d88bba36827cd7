#!/usr/bin/env python3
"""BCJ2 7z fixtures: an independent python implementation of the
public BCJ2 four-stream x86 branch converter (LZMA-SDK-documented
format: main/call/jump streams + an LZMA-style range-coded decision
stream with 11-bit adaptive models) plus a minimal 7z container
writer. The Scala decoder must reproduce the original payload byte
for byte — a cross-language round-trip, the same posture as the
engine-framed lz4/snappy fixtures.

Two archives:
  bcj2_copy   one folder, ONE coder (BCJ2), four stored packed
              streams in declared pack order
  bcj2_lzma2  the real-world shape: main stream LZMA2-compressed,
              bind pair LZMA2.out -> BCJ2.in0, packed indices
              [0, 2, 3, 4]
"""
import lzma
import zlib

K_TOP = 1 << 24


class RcEnc:
    """LZMA-style binary range encoder (11-bit models, shift 5)."""

    def __init__(self):
        self.low = 0
        self.range = 0xFFFFFFFF
        self.cache = 0
        self.cache_size = 1
        self.out = bytearray()

    def shift_low(self):
        if self.low < 0xFF000000 or self.low > 0xFFFFFFFF:
            carry = self.low >> 32
            self.out.append((self.cache + carry) & 0xFF)
            for _ in range(self.cache_size - 1):
                self.out.append((0xFF + carry) & 0xFF)
            self.cache_size = 0
            self.cache = (self.low >> 24) & 0xFF
        self.cache_size += 1
        self.low = (self.low << 8) & 0xFFFFFFFF

    def encode_bit(self, probs, i, bit):
        bound = (self.range >> 11) * probs[i]
        if bit == 0:
            self.range = bound
            probs[i] += (2048 - probs[i]) >> 5
        else:
            self.low += bound
            self.range -= bound
            probs[i] -= probs[i] >> 5
        while self.range < K_TOP:
            self.range = (self.range << 8) & 0xFFFFFFFF
            self.shift_low()

    def flush(self):
        for _ in range(5):
            self.shift_low()


def bcj2_encode(data):
    """-> (main, call, jump, rc). Conversion policy: deterministic
    (abs % 3 != 2) so both range-coder branches are exercised."""
    main = bytearray()
    call = bytearray()
    jump = bytearray()
    probs = [1024] * (2 + 256)
    rc = RcEnc()
    i = 0
    prev = 0
    n = len(data)
    while i < n:
        b = data[i]
        main.append(b)
        is_branch = (b & 0xFE) == 0xE8 or (prev == 0x0F and (b & 0xF0) == 0x80)
        if is_branch and i + 5 <= n:
            idx = (2 + prev) if b == 0xE8 else (1 if b == 0xE9 else 0)
            rel = int.from_bytes(data[i + 1:i + 5], "little")
            abs_ = (rel + i + 5) & 0xFFFFFFFF
            convert = (abs_ % 3) != 2
            rc.encode_bit(probs, idx, 1 if convert else 0)
            if convert:
                (call if b == 0xE8 else jump).extend(abs_.to_bytes(4, "big"))
                prev = (rel >> 24) & 0xFF
                i += 5
                continue
        prev = b
        i += 1
    rc.flush()
    return bytes(main), bytes(call), bytes(jump), bytes(rc.out)


def wnum(v):
    """7z variable-length number."""
    for n in range(8):
        if v < (1 << (8 * n + 7 - n)):
            first = ((0xFF << (8 - n)) & 0xFF) | (v >> (8 * n))
            return bytes([first]) + (v & ((1 << (8 * n)) - 1)).to_bytes(
                n, "little")
    return bytes([0xFF]) + v.to_bytes(8, "little")


def payload():
    """Pseudo-x86: planted E8/E9/0F 8x branch sites among text."""
    out = bytearray()
    out += b"BCJ2 fixture preamble: "
    for k in range(6):
        out += bytes([0xE8]) + ((k * 977 + 41) & 0xFFFF).to_bytes(4, "little")
        out += f" call{k} ".encode()
        out += bytes([0xE9]) + ((k * 1231 + 7) & 0xFFFF).to_bytes(4, "little")
        out += f" jmp{k} ".encode()
        out += bytes([0x0F, 0x80 + k]) + (k * 399).to_bytes(4, "little")
        out += f" jcc{k} ".encode()
    out += b"plain tail with no branches....."
    return bytes(out)


def folder_bcj2_copy(sizes):
    f = bytearray()
    f += wnum(1)  # one coder
    f += bytes([0x14]) + bytes.fromhex("0303011b")  # 4-byte id + attrs
    f += wnum(4) + wnum(1)  # 4 in, 1 out
    # no bind pairs (totalOut-1 == 0); packed indices (4 > 1)
    for i in range(4):
        f += wnum(i)
    return bytes(f)


def folder_bcj2_lzma2(sizes):
    f = bytearray()
    f += wnum(2)
    # flags 0x21 = 1-byte id + props; id 0x21 = LZMA2; props dict=8MiB
    f += bytes([0x21, 0x21]) + wnum(1) + bytes([22])
    f += bytes([0x14]) + bytes.fromhex("0303011b") + wnum(4) + wnum(1)
    f += wnum(1) + wnum(0)  # bind: in g1 (BCJ2 main) <- out 0 (LZMA2)
    for i in (0, 2, 3, 4):  # packed order: lzma2-packed, call, jump, rc
        f += wnum(i)
    return bytes(f)


def build(kind):
    data = payload()
    main, call, jump, rc = bcj2_encode(data)
    if kind == "copy":
        packs = [main, call, jump, rc]
        folder = folder_bcj2_copy(None)
        unpack_sizes = [len(data)]
    else:
        lz = lzma.compress(main, format=lzma.FORMAT_RAW,
                           filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}])
        packs = [lz, call, jump, rc]
        folder = folder_bcj2_lzma2(None)
        unpack_sizes = [len(main), len(data)]

    si = bytearray()
    si += bytes([0x06]) + wnum(0) + wnum(len(packs)) + bytes([0x09])
    for p in packs:
        si += wnum(len(p))
    si += bytes([0x00])  # end of pack info
    si += bytes([0x07, 0x0B]) + wnum(1) + bytes([0x00]) + folder
    si += bytes([0x0C])
    for u in unpack_sizes:
        si += wnum(u)
    si += bytes([0x0A, 0x01]) + zlib.crc32(data).to_bytes(4, "little")
    si += bytes([0x00])  # end of unpack info

    name = "code.bin"
    name_data = bytes([0x00]) + name.encode("utf-16-le") + b"\x00\x00"
    fi = bytearray()
    fi += bytes([0x05]) + wnum(1)
    fi += bytes([0x11]) + wnum(len(name_data)) + name_data
    fi += bytes([0x00])

    header = bytes([0x01, 0x04]) + si + bytes([0x00]) + fi + bytes([0x00])

    packed = b"".join(packs)
    next_off = len(packed)
    tail = (next_off.to_bytes(8, "little") +
            len(header).to_bytes(8, "little") +
            zlib.crc32(header).to_bytes(4, "little"))
    sig = (b"7z\xbc\xaf\x27\x1c" + bytes([0, 4]) +
           zlib.crc32(tail).to_bytes(4, "little") + tail)
    return sig + packed + header, data


def main():
    for kind in ("copy", "lzma2"):
        ar, data = build(kind)
        print(f"== bcj2_{kind} ({len(ar)} bytes, payload {len(data)})")
        h = ar.hex()
        for i in range(0, len(h), 76):
            print(h[i:i + 76])
        print()
    print("== payload hex")
    h = payload().hex()
    for i in range(0, len(h), 76):
        print(h[i:i + 76])


if __name__ == "__main__":
    main()
