#!/usr/bin/env python3
"""Build a spec-exact PowerPoint 97 .ppt fixture (MS-PPT + MS-CFB
public specs) for PptTextSpec and the q301 oracle row: a record tree
with containers (recVer 0xF) wrapping TextCharsAtom/TextBytesAtom,
interleaved with non-text atoms, inside a mini-stream CFB container.
"""
import struct, os
from make_xls_fixture import cfb_mini


def rec(ver_inst, rtype, data):
    return struct.pack("<HHI", ver_inst, rtype, len(data)) + data


def container(rtype, *children):
    body = b"".join(children)
    return rec(0x000F, rtype, body)


def text_chars(s):
    return rec(0x0000, 0x0FA0, s.encode("utf-16-le"))


def text_bytes(s):
    return rec(0x0000, 0x0FA8, s.encode("latin-1"))


def ppt_stream():
    slide_list = container(
        0x0FF0,
        text_chars("Unicode slide — ünïcode ✓\rsecond line"),
        rec(0x0001, 0x03E9, b"\x00" * 8),  # a non-text atom, skipped
        text_bytes("Bytes title\x0bsubtitle"))
    document = container(0x03E8, slide_list,
                         rec(0x0000, 0x0FBA, b""))  # empty CString
    trailer = rec(0x0000, 0x1772, b"\x01\x02")       # top-level atom
    return document + trailer


def main():
    out = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources", "ppt")
    os.makedirs(out, exist_ok=True)
    f = cfb_mini(ppt_stream(), name="PowerPoint Document")
    with open(os.path.join(out, "deck.ppt"), "wb") as fh:
        fh.write(f)
    print(f"== deck.ppt ({len(f)} bytes) ==")
    h = f.hex()
    for i in range(0, len(h), 88):
        print(h[i:i + 88])


if __name__ == "__main__":
    main()
