#!/usr/bin/env python3
"""q349/q350 fixtures: a spec-exact .rpm (lead + signature header
structure + main header structure + gzip'd newc cpio payload) and a
standalone odc cpio — built from the public rpmlib file format and
POSIX cpio layouts. The inner cpio/gzip layers use the stdlib; the
newc walk is additionally cross-checked in the JVM suite against
commons-compress's own cpio writer.

Prints Scala hex literals."""
import gzip
import struct


def newc_entry(name, data, mode=0o100644, mtime=1700000000, ino=1):
    nb = name.encode() + b"\x00"
    hdr = (b"070701" +
           b"%08X" % ino + b"%08X" % mode + b"%08X" % 0 + b"%08X" % 0 +
           b"%08X" % 1 + b"%08X" % mtime + b"%08X" % len(data) +
           b"%08X" % 0 + b"%08X" % 0 + b"%08X" % 0 + b"%08X" % 0 +
           b"%08X" % len(nb) + b"%08X" % 0)
    out = hdr + nb
    out += b"\x00" * (-len(out) % 4)
    out += data
    out += b"\x00" * (-len(out) % 4)
    return out


def newc_cpio(members):
    out = b"".join(newc_entry(n, d, ino=i + 1)
                   for i, (n, d) in enumerate(members))
    return out + newc_entry("TRAILER!!!", b"", mode=0, mtime=0, ino=0)


def odc_entry(name, data, mode=0o100644, mtime=1700000000):
    nb = name.encode() + b"\x00"
    hdr = ("070707" + "%06o" % 0 + "%06o" % 1 + "%06o" % mode +
           "%06o" % 0 + "%06o" % 0 + "%06o" % 1 + "%06o" % 0 +
           "%011o" % mtime + "%06o" % len(nb) +
           "%011o" % len(data)).encode()
    assert len(hdr) == 76
    return hdr + nb + data


def odc_cpio(members):
    return (b"".join(odc_entry(n, d) for n, d in members) +
            odc_entry("TRAILER!!!", b"", mode=0, mtime=0))


def header_structure(entries):
    """rpm header structure: entries = [(tag, type, value_bytes,
    count)] with offsets assigned in order, 1-byte alignment (all
    ours are strings)."""
    index = b""
    store = b""
    for tag, typ, val, count in entries:
        index += struct.pack(">iiii", tag, typ, len(store), count)
        store += val
    return (b"\x8e\xad\xe8\x01" + b"\x00" * 4 +
            struct.pack(">ii", len(entries), len(store)) + index + store)


def build_rpm(compressor):
    lead = (b"\xed\xab\xee\xdb" + bytes([3, 0]) + struct.pack(">h", 0) +
            struct.pack(">h", 1) + b"graft-rpm-demo".ljust(66, b"\x00") +
            struct.pack(">h", 1) + struct.pack(">h", 5) + b"\x00" * 16)
    assert len(lead) == 96
    sig = header_structure([(1000, 6, b"\x00" * 4, 1)])  # dummy SIZE-ish
    sig_padded = sig + b"\x00" * (-len(sig) % 8)
    cs = lambda s: s.encode() + b"\x00"
    hdr_entries = [
        (1000, 6, cs("graft-rpm-demo"), 1),
        (1001, 6, cs("2.4"), 1),
        (1002, 6, cs("7.el9"), 1),
        (1004, 9, cs("pinned fixture package"), 1),
        (1022, 6, cs("x86_64"), 1),
        (1124, 6, cs("cpio"), 1),
    ]
    if compressor is not None:
        hdr_entries.append((1125, 6, cs(compressor), 1))
    hdr = header_structure(hdr_entries)
    payload = newc_cpio([("./usr/bin/graft", b"#!/bin/sh\necho hi\n"),
                         ("./usr/share/doc/graft/README", b"docs\n")])
    if compressor == "zstd":
        raise SystemExit("zstd payload needs the JVM side")
    blob = gzip.compress(payload, mtime=0)
    return lead + sig_padded + hdr + blob


def scala_hex(name, b):
    h = b.hex().upper()
    lines = [h[i:i + 60] for i in range(0, len(h), 60)]
    body = " +\n    ".join('"%s"' % ln for ln in lines)
    print("  private val %s: String =\n    %s\n" % (name, body))


if __name__ == "__main__":
    rpm_gz = build_rpm("gzip")
    rpm_default = build_rpm(None)  # no 1125 tag: gzip by rpmlib default
    cpio_odc = odc_cpio([("conf/app.ini", b"[core]\nkey=1\n")])
    cpio_newc = newc_cpio([("./usr/bin/graft", b"#!/bin/sh\necho hi\n"),
                           ("./usr/share/doc/graft/README", b"docs\n")])
    print("// %d / %d / %d / %d bytes" %
          (len(rpm_gz), len(rpm_default), len(cpio_odc), len(cpio_newc)))
    scala_hex("rpmGzHex", rpm_gz)
    scala_hex("rpmDefHex", rpm_default)
    scala_hex("cpioOdcHex", cpio_odc)
    scala_hex("cpioNewcHex", cpio_newc)
    # entry tables for the oracles (offset/size/mode/mtime)
    for label, blob in (("newc", cpio_newc), ("odc", cpio_odc)):
        import io
        pos = 0
        while True:
            if blob[pos:pos + 6] in (b"070701", b"070702"):
                f = lambda i: int(blob[pos + 6 + 8 * i:pos + 14 + 8 * i], 16)
                ns, fs = f(11), f(6)
                name = blob[pos + 110:pos + 110 + ns - 1].decode()
                doff = (pos + 110 + ns + 3) & ~3
                mode, mtime = f(1), f(5)
                pos = (doff + fs + 3) & ~3
            else:
                hdr = blob[pos:pos + 76].decode()
                mode = int(hdr[18:24], 8)
                mtime = int(hdr[48:59], 8)
                ns = int(hdr[59:65], 8)
                fs = int(hdr[65:76], 8)
                name = blob[pos + 76:pos + 76 + ns - 1].decode()
                doff = pos + 76 + ns
                pos = doff + fs
            if name == "TRAILER!!!":
                break
            print("// %s %-30s off=%d size=%d mode=%d mtime=%d" %
                  (label, name, doff, fs, mode, mtime))
