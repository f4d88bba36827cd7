#!/usr/bin/env python3
"""q353/q354 fixtures: minimal spec-exact executables (ELF shared
object, PE DLL, Mach-O 64 executable, FAT header) and sfnt fonts
(TTF with name/maxp/head tables; a TTC wrapping the same face).
The JVM suite additionally cross-checks the font kernel against the
REAL DejaVu faces on disk and java.awt.Font's own family parse.

Prints Scala hex literals."""
import struct


def ttf(family="Graft Sans", full="Graft Sans Regular",
        n_glyphs=123, upem=2048, base=0):
    def name_table():
        recs = []
        strings = b""
        for plat, enc, lang, data in [
            (1, 0, 0, family.encode("latin-1")),
            (3, 1, 0x409, family.encode("utf-16-be")),
        ]:
            recs.append((plat, enc, lang, 1, len(data), len(strings)))
            strings += data
        for plat, enc, lang, data in [
            (3, 1, 0x409, full.encode("utf-16-be")),
        ]:
            recs.append((plat, enc, lang, 4, len(data), len(strings)))
            strings += data
        hdr = struct.pack(">HHH", 0, len(recs), 6 + 12 * len(recs))
        body = b"".join(struct.pack(">6H", *r) for r in recs)
        return hdr + body + strings

    def maxp_table():
        return struct.pack(">IH", 0x00010000, n_glyphs) + b"\x00" * 26

    def head_table():
        # version, fontRevision, checkSumAdjustment, magic, flags, upem
        return (struct.pack(">III", 0x00010000, 0, 0) +
                struct.pack(">I", 0x5F0F3CF5) +
                struct.pack(">HH", 0, upem) + b"\x00" * 34)

    tables = [(b"head", head_table()), (b"maxp", maxp_table()),
              (b"name", name_table())]
    n = len(tables)
    offset = base + 12 + 16 * n
    dir_ = struct.pack(">IHHHH", 0x00010000, n, 16, 0, 0)
    recs = b""
    body = b""
    for tag, data in tables:
        recs += tag + struct.pack(">III", 0, offset, len(data))
        body += data
        offset += len(data)
    return dir_ + recs + body


def ttc():
    inner = ttf(base=16)
    return b"ttcf" + struct.pack(">HHI I", 1, 0, 1, 16) + inner


def elf_so():
    e = bytearray(64)
    e[0:4] = b"\x7fELF"
    e[4] = 2  # 64-bit
    e[5] = 1  # little-endian
    e[6] = 1
    struct.pack_into("<HH", e, 16, 3, 62)  # ET_DYN, x86-64
    struct.pack_into("<I", e, 20, 1)
    struct.pack_into("<H", e, 52, 64)  # ehsize
    struct.pack_into("<H", e, 60, 29)  # e_shnum
    return bytes(e)


def pe_dll():
    mz = bytearray(64)
    mz[0:2] = b"MZ"
    struct.pack_into("<I", mz, 0x3C, 64)
    coff = (b"PE\x00\x00" +
            struct.pack("<HHIIIHH", 0x8664, 6, 0, 0, 0, 240, 0x2022))
    opt = struct.pack("<H", 0x20B) + b"\x00" * 238
    return bytes(mz) + coff + opt


def macho64():
    return struct.pack("<IIIIII", 0xFEEDFACF, 0x0100000C, 0, 2, 15, 0) + \
        b"\x00" * 8


def fat():
    return struct.pack(">II", 0xCAFEBABE, 2) + b"\x00" * 40


def scala_hex(name, b):
    h = b.hex().upper()
    lines = [h[i:i + 60] for i in range(0, len(h), 60)]
    body = " +\n    ".join('"%s"' % ln for ln in lines)
    print("  private val %s: String =\n    %s\n" % (name, body))


if __name__ == "__main__":
    t = ttf()
    c = ttc()
    print("// ttf %d, ttc %d, elf %d, pe %d, macho %d bytes" %
          (len(t), len(c), len(elf_so()), len(pe_dll()), len(macho64())))
    scala_hex("fontTtfHex", t)
    scala_hex("fontTtcHex", c)
    scala_hex("binElfHex", elf_so())
    scala_hex("binPeHex", pe_dll())
    scala_hex("binMachoHex", macho64())
    scala_hex("binFatHex", fat())
