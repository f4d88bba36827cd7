#!/usr/bin/env python3
"""q359_rar_entries fixtures: RAR4 and RAR5 archives assembled from
the public format documentation (header census only — the engine
never decompresses RAR data, so the packed bytes here are opaque
filler whose sizes/CRCs are what the census must report).

Emits scala hex constants: a two-entry RAR4 (one stored, one
compressed+solid+encrypted entry), a two-entry solid RAR5 with
mtime+crc on the first entry and size-unknown on the second, and an
encrypted-headers RAR4 that must refuse.
"""
import struct
import zlib


def crc32(data: bytes) -> int:
    return zlib.crc32(data) & 0xFFFFFFFF


# ---------------- RAR4 ----------------

def r4_block(head_type: int, flags: int, body: bytes,
             data: bytes = b"") -> bytes:
    head = struct.pack("<BHH", head_type, flags, 7 + len(body)) + body
    return struct.pack("<H", crc32(head) & 0xFFFF) + head + data


def r4_file(name: bytes, data: bytes, unp_size: int, method: int,
            flags: int = 0) -> bytes:
    body = struct.pack("<IIBIIBBHI",
                       len(data), unp_size, 3, crc32(data), 0x5A3C0000,
                       29, 0x30 + method, len(name), 0o644) + name
    return r4_block(0x74, flags | 0x8000, body, data)


def rar4(encrypted_headers: bool = False) -> bytes:
    sig = b"Rar!\x1a\x07\x00"
    main_flags = 0x0080 if encrypted_headers else 0x0000
    main = r4_block(0x73, main_flags, struct.pack("<HI", 0, 0))
    f1 = r4_file(b"docs/readme.txt", b"stored bytes here", 17, 0)
    f2 = r4_file(b"data.bin", b"\x01\x02\x03\x04\x05", 64, 3,
                 flags=0x10 | 0x04)
    end = r4_block(0x7B, 0x4000, b"")
    return sig + main + f1 + f2 + end


# ---------------- RAR5 ----------------

def vint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def r5_block(head_type: int, head_flags: int, rest: bytes,
             data: bytes = b"") -> bytes:
    hdr = vint(head_type) + vint(head_flags)
    if head_flags & 0x0002:
        hdr += vint(len(data))
    hdr += rest
    payload = vint(len(hdr)) + hdr
    return struct.pack("<I", crc32(payload)) + payload + data


def rar5() -> bytes:
    sig = b"Rar!\x1a\x07\x01\x00"
    main = r5_block(1, 0x0000, vint(0x0004))  # archive flags: solid
    d1 = b"opaque packed bytes!"
    f1 = r5_block(2, 0x0002,
                  vint(0x0002 | 0x0004) +   # mtime + crc present
                  vint(4096) + vint(0o644) +
                  struct.pack("<I", 1700000000) +
                  struct.pack("<I", crc32(d1)) +
                  vint((3 << 7) | 0x40) +   # method 3, solid
                  vint(1) + vint(len(b"big/model.bin")) + b"big/model.bin",
                  d1)
    f2 = r5_block(2, 0x0002,
                  vint(0x0008) +            # unpacked size unknown
                  vint(0) + vint(0o644) +
                  vint(0 << 7) +            # stored
                  vint(1) + vint(len(b"stream.dat")) + b"stream.dat",
                  b"xyz")
    end = r5_block(5, 0x0000, vint(0))
    return sig + main + f1 + f2 + end


def rar5_encrypted() -> bytes:
    sig = b"Rar!\x1a\x07\x01\x00"
    enc = r5_block(4, 0x0000, vint(0) + vint(0x0001) + bytes(16))
    return sig + enc


def main():
    for name, payload in (("rarV4Hex", rar4()),
                          ("rarV5Hex", rar5()),
                          ("rarV4EncHex", rar4(encrypted_headers=True)),
                          ("rarV5EncHex", rar5_encrypted())):
        print(f"// {name} ({len(payload)} bytes)")
        print(f'"{payload.hex()}"')
        print()


if __name__ == "__main__":
    main()
