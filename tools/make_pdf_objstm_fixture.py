#!/usr/bin/env python3
"""q337_pdf_objstm fixture generator: the q329 CID document
restructured the modern-writer (PDF 1.5+ cross-reference-stream) way
— catalog, pages, page and font DICTIONARIES live deflated inside a
`/Type /ObjStm` object stream; only the content stream and the
FlateDecode ToUnicode CMap stay top-level (streams cannot nest inside
an ObjStm). Same CMap, same dynamic two-digit content codes, so the
extracted text replays the q329 oracle shape with n_streams = 3.

Emits the Scala hex constants for the three literal segments around
the two dynamic digit chars.
"""
import zlib

CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfchar
<0001> <0048>
<0002> <0394>
endbfchar
1 beginbfrange
<1030> <1039> <0030>
endbfrange
endcmap
"""

cm = zlib.compress(CMAP, 9)

inner = [
    (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
    (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
    (3, b"<< /Type /Page /Parent 2 0 R /Resources "
        b"<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
    (5, b"<< /Type /Font /Subtype /Type0 /BaseFont /GraftCID "
        b"/ToUnicode 6 0 R >>"),
]
hdr = b""
body = b""
for num, d in inner:
    hdr += b"%d %d " % (num, len(body))
    body += d + b" "
first = len(hdr)
objstm = zlib.compress(hdr + body, 9)

content_pre = b"BT /F1 12 Tf <00010002> Tj <103"
content_mid = b"103"
content_post = b"> Tj ET"
content_len = len(content_pre) + 1 + len(content_mid) + 1 + len(content_post)

part_a = (
    b"%PDF-1.5\n"
    + b"7 0 obj << /Type /ObjStm /N %d /First %d /Filter /FlateDecode"
      b" /Length %d >>\nstream\n" % (len(inner), first, len(objstm))
    + objstm
    + b"\nendstream\nendobj\n"
    + b"4 0 obj << /Length %d >>\nstream\n" % content_len
    + content_pre)
part_b = (
    content_post
    + b"\nendstream\nendobj\n"
    + b"6 0 obj << /Length %d /Filter /FlateDecode >>\nstream\n" % len(cm)
    + cm
    + b"\nendstream\nendobj\n%%EOF")

print("// part A (header + deflated ObjStm + content '<103'):")
print('val partA = "%s"' % part_a.hex())
print("// mid ('103'):")
print('val mid = "%s"' % content_mid.hex())
print("// part B ('> Tj ET'..%%EOF incl. zlib CMap):")
print('val partB = "%s"' % part_b.hex())
