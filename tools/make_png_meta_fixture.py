#!/usr/bin/env python3
"""PNG metadata fixture for PngMeta: a real 2x1 RGB PNG carrying the
full text-chunk family — tEXt (incl. the Stable-Diffusion-style
`parameters` provenance key), zTXt (deflated), iTXt both compressed
and plain — plus gAMA and an eXIf blob. Chunk CRCs are real; the
oracle row derives every value from this construction."""
import struct
import zlib


def chunk(tag, data):
    return (struct.pack(">I", len(data)) + tag + data +
            struct.pack(">I", zlib.crc32(tag + data)))


def build():
    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0))
    out += chunk(b"gAMA", struct.pack(">I", 45455))
    out += chunk(b"tEXt", b"Software\x00graft png census")
    out += chunk(b"tEXt", b"parameters\x00a synthetic prompt, seed 7")
    out += chunk(b"zTXt", b"Comment\x00\x00" +
                 zlib.compress(b"deflated remark"))
    out += chunk(b"iTXt", b"Title\x00\x01\x00en\x00titel\x00" +
                 zlib.compress("sneeuwman ☃".encode("utf-8")))
    out += chunk(b"iTXt", b"Source\x00\x00\x00\x00\x00plain unicode")
    out += chunk(b"eXIf", b"II*\x00\x08\x00\x00\x00\x00\x00")
    raw = b"\x00\x10\x20\x30\x40\x50\x60"  # filter 0 + 2 RGB pixels
    out += chunk(b"IDAT", zlib.compress(raw))
    out += chunk(b"IEND", b"")
    return out


def tiff_blob():
    """Little-endian TIFF IFD0: orientation 6, make/model/datetime."""
    make = b"GraftCam\x00"
    model = b"PNG-1\x00"
    dt = b"2026:08:16 12:00:00\x00"
    # header(8) + count(2) + 4 entries(48) + next(4) = 62
    data_at = 62
    entries = b""
    entries += struct.pack("<HHI", 0x010F, 2, len(make)) + \
        struct.pack("<I", data_at)
    entries += struct.pack("<HHI", 0x0110, 2, len(model)) + \
        struct.pack("<I", data_at + len(make))
    entries += struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<HH", 6, 0)
    entries += struct.pack("<HHI", 0x0132, 2, len(dt)) + \
        struct.pack("<I", data_at + len(make) + len(model))
    return (b"II*\x00" + struct.pack("<I", 8) +
            struct.pack("<H", 4) + entries + struct.pack("<I", 0) +
            make + model + dt)


def build_exif():
    """A PNG whose eXIf chunk carries the [[tiff_blob]] TIFF."""
    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
    out += chunk(b"eXIf", tiff_blob())
    raw = b"\x00\x80"
    out += chunk(b"IDAT", zlib.compress(raw))
    out += chunk(b"IEND", b"")
    return out


def main():
    png = build()
    print(f"== png_meta fixture ({len(png)} bytes)")
    h = png.hex()
    for i in range(0, len(h), 76):
        print(h[i:i + 76])
    png2 = build_exif()
    print(f"== png_exif fixture ({len(png2)} bytes)")
    h = png2.hex()
    for i in range(0, len(h), 76):
        print(h[i:i + 76])


if __name__ == "__main__":
    main()
