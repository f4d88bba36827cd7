#!/usr/bin/env python3
"""q345_ar_deb fixtures: real .deb packages assembled from the spec
shapes dpkg emits — an `ar` archive holding `debian-binary`,
`control.tar.{gz,xz}` and `data.tar.gz` — with every inner layer
written by the REAL python stdlib (tarfile/gzip/lzma) so the kernel
chain (ArEntries → codec → TarEntries → control text) is
cross-checked against authoritative writers. All timestamps pinned
for byte-stable output.

Prints Scala hex literals + the control text."""
import gzip
import io
import lzma
import tarfile

CONTROL = (b"Package: graft-demo\n"
           b"Version: 1.2-3\n"
           b"Architecture: amd64\n"
           b"Description: pinned fixture package\n")
MD5SUMS = b"d41d8cd98f00b204e9800998ecf8427e  usr/share/doc/x\n"


def tar_bytes(members):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) \
            as t:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 1700000000
            ti.uid = ti.gid = 0
            ti.uname = ti.gname = "root"
            t.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def ar_member(name, data, mtime=1700000000):
    hdr = "%-16s%-12d%-6d%-6d%-8s%-10d`\n" % (
        name, mtime, 0, 0, "100644", len(data))
    assert len(hdr) == 60, len(hdr)
    out = hdr.encode("ascii") + data
    if len(data) & 1:
        out += b"\n"
    return out


def build_deb(codec):
    control_tar = tar_bytes([("./control", CONTROL),
                             ("./md5sums", MD5SUMS)])
    data_tar = tar_bytes([("./usr/share/doc/x", b"doc body\n")])
    if codec == "gz":
        ctrl = gzip.compress(control_tar, mtime=0)
        cname = "control.tar.gz"
    else:
        ctrl = lzma.compress(control_tar, format=lzma.FORMAT_XZ,
                             check=lzma.CHECK_CRC64)
        cname = "control.tar.xz"
    data = gzip.compress(data_tar, mtime=0)
    return (b"!<arch>\n" + ar_member("debian-binary", b"2.0\n") +
            ar_member(cname, ctrl) + ar_member("data.tar.gz", data))


def scala_hex(name, b):
    h = b.hex().upper()
    lines = [h[i:i + 60] for i in range(0, len(h), 60)]
    body = " +\n    ".join('"%s"' % ln for ln in lines)
    print("  private val %s: String =\n    %s\n" % (name, body))


if __name__ == "__main__":
    dg = build_deb("gz")
    dx = build_deb("xz")
    print("// %d / %d bytes" % (len(dg), len(dx)))
    scala_hex("debGzHex", dg)
    scala_hex("debXzHex", dx)
    print("// control text = %r" % CONTROL)
