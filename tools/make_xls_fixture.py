#!/usr/bin/env python3
"""Build spec-exact BIFF8 .xls fixtures (MS-XLS + MS-CFB public specs)
for XlsCellsSpec and the q298 oracle row.

Writes src/test/resources/xls/{a.xls,b.xls} and prints their hex for
embedding in SparkEntry. Workbook A exercises every cell-record kind;
workbook B splits one SST string across a CONTINUE record with a
flags restart (compressed chars before the split, UTF-16 after).
The CFB wrapper stores the Workbook stream in the MINI stream (root
container + miniFAT), keeping the fixture small.
"""
import struct, os

NOSTREAM = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE


def rec(rid, data):
    return struct.pack("<HH", rid, len(data)) + data


def bof(dt):
    return rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


def eof():
    return rec(0x000A, b"")


def sststr(s, rich_runs=0):
    wide = any(ord(c) > 255 for c in s)
    flags = (1 if wide else 0) | (8 if rich_runs else 0)
    b = struct.pack("<H", len(s)) + bytes([flags])
    if rich_runs:
        b += struct.pack("<H", rich_runs)
    b += s.encode("utf-16-le") if wide else s.encode("latin-1")
    b += b"\x00" * (4 * rich_runs)
    return b


def boundsheet(pos, name):
    return rec(0x0085, struct.pack("<IBB", pos, 0, 0)
               + bytes([len(name), 0]) + name.encode("latin-1"))


def labelsst(rw, col, isst):
    return rec(0x00FD, struct.pack("<HHHI", rw, col, 15, isst))


def number(rw, col, v):
    return rec(0x0203, struct.pack("<HHHd", rw, col, 15, v))


def rk_int(v, x100=False):
    return ((v << 2) | 2 | (1 if x100 else 0)) & 0xFFFFFFFF


def rk_dbl(v):
    bits = struct.unpack("<Q", struct.pack("<d", v))[0]
    assert bits & 0x3FFFFFFFF == 0, "low 34 bits must be zero for an RK double"
    return (bits >> 32) & 0xFFFFFFFC


def rkrec(rw, col, rk):
    return rec(0x027E, struct.pack("<HHHI", rw, col, 15, rk))


def mulrk(rw, col_first, rks):
    d = struct.pack("<HH", rw, col_first)
    d += b"".join(struct.pack("<HI", 15, rk) for rk in rks)
    d += struct.pack("<H", col_first + len(rks) - 1)
    return rec(0x00BD, d)


def boolerr(rw, col, v, ferr):
    return rec(0x0205, struct.pack("<HHHBB", rw, col, 15, v, ferr))


def formula(rw, col, result8):
    return rec(0x0006, struct.pack("<HHH", rw, col, 15) + result8
               + struct.pack("<HIH", 0, 0, 0))


def stringrec(s):
    return rec(0x0207, struct.pack("<H", len(s)) + b"\x00" + s.encode("latin-1"))


def label(rw, col, s):
    return rec(0x0204, struct.pack("<HHH", rw, col, 15)
               + struct.pack("<H", len(s)) + b"\x00" + s.encode("latin-1"))


def workbook_a():
    sheet1 = (bof(0x0010)
              + labelsst(0, 0, 0) + labelsst(0, 1, 1)
              + number(1, 0, 3.25)
              + rkrec(1, 1, rk_int(42)) + rkrec(1, 2, rk_int(123, x100=True))
              + rkrec(1, 3, rk_dbl(2.5))
              + mulrk(2, 0, [rk_int(1), rk_int(2), rk_int(3)])
              + boolerr(3, 0, 1, 0) + boolerr(3, 1, 0x07, 1)
              + formula(4, 0, struct.pack("<d", 7.5))
              + formula(4, 1, bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF])) + stringrec("fx")
              + formula(4, 2, bytes([1, 0, 1, 0, 0, 0, 0xFF, 0xFF]))
              + formula(4, 3, bytes([3, 0, 0, 0, 0, 0, 0xFF, 0xFF]))
              + label(5, 0, "inline")
              + eof())
    sheet2 = bof(0x0010) + labelsst(0, 0, 2) + eof()
    sst = rec(0x00FC, struct.pack("<II", 3, 3)
              + sststr("hello") + sststr("wörld ✓") + sststr("rich", 1))

    def globals_(p1, p2):
        return (bof(0x0005) + sst + boundsheet(p1, "S1") + boundsheet(p2, "S2")
                + eof())
    glen = len(globals_(0, 0))
    return globals_(glen, glen + len(sheet1)) + sheet1 + sheet2


def workbook_b():
    # s0's chars split across a CONTINUE: 4 compressed chars in the SST
    # record, then the restart byte flips to wide for 6 UTF-16 chars
    frag1 = (struct.pack("<II", 2, 2)
             + struct.pack("<H", 10) + bytes([0]) + b"aaaa")
    cont = (bytes([1]) + "БВГДЕЖ".encode("utf-16-le")
            + sststr("tail"))
    sst = rec(0x00FC, frag1) + rec(0x003C, cont)
    sheet1 = bof(0x0010) + labelsst(0, 0, 0) + labelsst(0, 1, 1) + eof()

    def globals_(p1):
        return bof(0x0005) + sst + boundsheet(p1, "S1") + eof()
    glen = len(globals_(0))
    return globals_(glen) + sheet1


def direntry(name, otype, color, left, right, child, start, size):
    nm = name.encode("utf-16-le")
    e = nm + b"\x00" * (64 - len(nm))
    e += struct.pack("<H", len(nm) + 2)
    e += struct.pack("<BB", otype, color)
    e += struct.pack("<III", left, right, child)
    e += b"\x00" * 16 + b"\x00" * 4 + b"\x00" * 16
    e += struct.pack("<IQ", start, size)
    assert len(e) == 128
    return e


def cfb_mini(stream, name="Workbook"):
    """v3 compound file with the stream in the MINI stream: sector 0
    FAT, sector 1 directory, sector 2 miniFAT, sectors 3.. the root
    mini-stream container."""
    assert len(stream) < 4096
    mini = stream + b"\x00" * ((-len(stream)) % 64)
    nmini = len(mini) // 64
    container = mini + b"\x00" * ((-len(mini)) % 512)
    ncont = len(container) // 512

    minifat = [(i + 1 if i < nmini - 1 else ENDOFCHAIN) for i in range(nmini)]
    minifat += [NOSTREAM] * (128 - len(minifat))

    fat = [0xFFFFFFFD, ENDOFCHAIN, ENDOFCHAIN]  # FAT, dir, miniFAT
    for i in range(ncont):
        fat.append(3 + i + 1 if i < ncont - 1 else ENDOFCHAIN)
    fat += [NOSTREAM] * (128 - len(fat))

    root = direntry("Root Entry", 5, 1, NOSTREAM, NOSTREAM, 1, 3, len(container))
    wb = direntry(name, 2, 1, NOSTREAM, NOSTREAM, NOSTREAM, 0, len(stream))
    dirsec = root + wb + b"\x00" * 256

    hdr = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 16
    hdr += struct.pack("<HHHHH", 0x003E, 0x0003, 0xFFFE, 9, 6)
    hdr += b"\x00" * 6
    hdr += struct.pack("<IIIIIIIII", 0, 1, 1, 0, 4096, 2, 1,
                       ENDOFCHAIN, 0)
    hdr += struct.pack("<109I", *([0] + [NOSTREAM] * 108))
    assert len(hdr) == 512
    return (hdr + struct.pack("<128I", *fat) + dirsec
            + struct.pack("<128I", *minifat) + container)


def main():
    out = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources", "xls")
    os.makedirs(out, exist_ok=True)
    for nm, wbs in (("a", workbook_a()), ("b", workbook_b())):
        f = cfb_mini(wbs)
        with open(os.path.join(out, nm + ".xls"), "wb") as fh:
            fh.write(f)
        print(f"== {nm}.xls ({len(f)} bytes) ==")
        h = f.hex()
        for i in range(0, len(h), 58):
            print(h[i:i + 58])


if __name__ == "__main__":
    main()
