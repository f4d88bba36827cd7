#!/usr/bin/env python3
"""ZIP modern-compression-method fixtures for ZipEntryBytes:

  methods.zip   written by python's OWN zipfile — one member per
                method it supports: stored (0), deflate (8),
                bzip2 (12), lzma (14, the APPNOTE version+props
                preamble) — an authoritative cross-engine writer
  xz.zip        a hand-framed single-member method-95 archive whose
                member data is a real .xz container from liblzma
                (python lzma FORMAT_XZ)

The zstd (93) member is exercised in the unit suite with zstd-jni as
the compressor; no python zstd binding exists in this container."""
import io
import lzma
import struct
import zipfile
import zlib


TEXTS = {
    "stored.txt": "stored member body",
    "deflate.txt": "deflate member body body body body body",
    "bzip2.txt": "bzip2 member body " * 4,
    "lzma.txt": "lzma member body " * 4,
}


def methods_zip():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("stored.txt", TEXTS["stored.txt"],
                   compress_type=zipfile.ZIP_STORED)
        z.writestr("deflate.txt", TEXTS["deflate.txt"],
                   compress_type=zipfile.ZIP_DEFLATED)
        z.writestr("bzip2.txt", TEXTS["bzip2.txt"],
                   compress_type=zipfile.ZIP_BZIP2)
        z.writestr("lzma.txt", TEXTS["lzma.txt"],
                   compress_type=zipfile.ZIP_LZMA)
    return buf.getvalue()


def xz_zip():
    name = b"xz.txt"
    plain = b"xz member body " * 4
    data = lzma.compress(plain, format=lzma.FORMAT_XZ)
    crc = zlib.crc32(plain)
    local = (b"PK\x03\x04" + struct.pack("<HHHHH", 63, 0, 95, 0, 0) +
             struct.pack("<III", crc, len(data), len(plain)) +
             struct.pack("<HH", len(name), 0) + name + data)
    cd = (b"PK\x01\x02" + struct.pack("<HHHHHH", 63, 63, 0, 95, 0, 0) +
          struct.pack("<III", crc, len(data), len(plain)) +
          struct.pack("<HHHHHII", len(name), 0, 0, 0, 0, 0, 0) + name)
    eocd = (b"PK\x05\x06" + struct.pack("<HHHHIIH", 0, 0, 1, 1,
                                        len(cd), len(local), 0))
    return local + cd + eocd, plain.decode()


def main():
    a = methods_zip()
    print(f"== methods.zip ({len(a)} bytes)")
    h = a.hex()
    for i in range(0, len(h), 76):
        print(h[i:i + 76])
    print()
    b, xz_text = xz_zip()
    print(f"== xz.zip ({len(b)} bytes) text={xz_text!r}")
    h = b.hex()
    for i in range(0, len(h), 76):
        print(h[i:i + 76])


if __name__ == "__main__":
    main()
