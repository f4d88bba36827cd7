#!/usr/bin/env python3
"""q358_pdf_identity_h fixtures: page-structured Identity-H PDFs.

Variant 0: a Type0 font with NO ToUnicode but an embedded (flate)
TrueType program whose format-4 cmap maps ' '->3 and 'a'..'z'->4..29;
the content stream shows the glyph ids of "identity h fixture", so
extraction through the kernel's cmap INVERSION must produce exactly
that text.
Variant 1: /CIDToGIDMap is a stream ref -> codes are not glyph ids,
the kernel must keep the raw tier (literal string shows directly).
Variant 2: the font program is junk -> inversion refuses, raw tier
survives (never a throw).
Prints scala hex constants.
"""
import struct
import zlib


def mini_sfnt() -> bytes:
    def seg(end, start, delta, ro):
        return struct.pack(">H", end), struct.pack(">H", start), \
            struct.pack(">H", delta & 0xFFFF), struct.pack(">H", ro)

    segs = [(0x20, 0x20, 3 - 0x20, 0), (0x7A, 0x61, 4 - 0x61, 0),
            (0xFFFF, 0xFFFF, 1, 0)]
    n = len(segs)
    sub = struct.pack(">HHHHHHH", 4, 16 + 8 * n, 0, 2 * n, 4, 1, 2)
    ends = b"".join(struct.pack(">H", s[0]) for s in segs)
    starts = b"".join(struct.pack(">H", s[1]) for s in segs)
    deltas = b"".join(struct.pack(">H", s[2] & 0xFFFF) for s in segs)
    ros = b"".join(struct.pack(">H", s[3]) for s in segs)
    subtable = sub + ends + b"\x00\x00" + starts + deltas + ros
    cmap = struct.pack(">HHHHI", 0, 1, 3, 1, 12) + subtable
    header = struct.pack(">IHHHH", 0x00010000, 1, 16, 0, 0)
    direntry = b"cmap" + struct.pack(">III", 0, 28, len(cmap))
    return header + direntry + cmap


def glyph_codes(text: str) -> str:
    out = []
    for ch in text:
        g = 3 if ch == " " else 4 + (ord(ch) - ord("a"))
        out.append(f"{g:04X}")
    return "".join(out)


def pdf(font_obj_10: str, program: bytes, content: bytes) -> bytes:
    prog = zlib.compress(program, 9)
    parts = [
        b"%PDF-1.4\n",
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Resources "
        b"<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n",
        b"4 0 obj << /Length %d >>\nstream\n" % len(content),
        content, b"\nendstream\nendobj\n",
        b"5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Emb "
        b"/Encoding /Identity-H /DescendantFonts [10 0 R] >>\nendobj\n",
        font_obj_10.encode(),
        b"11 0 obj << /Type /FontDescriptor /FontName /Emb "
        b"/FontFile2 12 0 R >>\nendobj\n",
        b"12 0 obj << /Length %d /Filter /FlateDecode >>\nstream\n"
        % len(prog),
        prog, b"\nendstream\nendobj\n%%EOF",
    ]
    return b"".join(parts)


def main():
    identity10 = ("10 0 obj << /Type /Font /Subtype /CIDFontType2 "
                  "/BaseFont /Emb /CIDToGIDMap /Identity "
                  "/FontDescriptor 11 0 R >>\nendobj\n")
    stream10 = ("10 0 obj << /Type /Font /Subtype /CIDFontType2 "
                "/BaseFont /Emb /CIDToGIDMap 13 0 R "
                "/FontDescriptor 11 0 R >>\nendobj\n")
    text = "identity h fixture"
    codes = glyph_codes(text)
    v0 = pdf(identity10, mini_sfnt(),
             f"BT /F1 12 Tf <{codes}> Tj ET".encode())
    v1 = pdf(stream10, mini_sfnt(), b"BT /F1 12 Tf (raw tier holds) Tj ET")
    v2 = pdf(identity10, b"Z" * 40, b"BT /F1 12 Tf (fallback text) Tj ET")
    for name, payload, note in (
            ("pdfIdhEmbHex", v0, f'extracts "{text}"'),
            ("pdfIdhRawHex", v1, 'stream CIDToGIDMap -> "raw tier holds"'),
            ("pdfIdhJunkHex", v2, 'junk program -> "fallback text"')):
        print(f"// {name}: {note}")
        print(f'"{payload.hex()}"')
        print()


if __name__ == "__main__":
    main()
