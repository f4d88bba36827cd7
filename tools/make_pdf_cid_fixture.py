#!/usr/bin/env python3
"""q329_pdf_cid fixture generator: a page-structured PDF whose /F1 is
a Type0 font with a FlateDecode ToUnicode CMap (bfchar H/Delta +
bfrange digits), content stream uncompressed with two fixed-width
dynamic hex-digit codes. Emits the Scala hex constants for the three
literal segments around the two dynamic digit chars.

The CMap maps <0001>->U+0048 'H', <0002>->U+0394 Delta, and
<1030>..<1039> -> '0'..'9', so the content's <103a103b> codes (a, b =
ASCII decimal digit chars of doc_id%100) extract as the digits
themselves -- proving CMap resolution end-to-end with a fixed-width
dynamic field.
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

# content with digit placeholders D (each one ASCII char)
content_pre = b"BT /F1 12 Tf <00010002> Tj <103"
content_mid = b"103"
content_post = b"> Tj ET"
content_len = len(content_pre) + 1 + len(content_mid) + 1 + len(content_post)

part_a = (
    b"%PDF-1.4\n"
    b"1 0 obj << /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    b"3 0 obj << /Type /Page /Parent 2 0 R /Resources "
    b"<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
    + b"4 0 obj << /Length %d >>\nstream\n" % content_len
    + content_pre)
part_b = (
    content_post
    + b"\nendstream\nendobj\n"
    b"5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /GraftCID "
    b"/ToUnicode 6 0 R >>\nendobj\n"
    + b"6 0 obj << /Length %d /Filter /FlateDecode >>\nstream\n" % len(cm)
    + cm
    + b"\nendstream\nendobj\n%%EOF")

print("// part A (header..content '<103'):")
print('val partA = "%s"' % part_a.hex())
print("// mid ('103'):")
print('val mid = "%s"' % content_mid.hex())
print("// part B ('> Tj ET'..%%EOF incl. zlib CMap):")
print('val partB = "%s"' % part_b.hex())
