#!/usr/bin/env python3
"""Engine-independent PDF stream-filter fixtures for q357_pdf_filters.

Builds four tiny one-stream PDFs whose content streams are encoded
with each decodable non-Flate filter chain: LZWDecode (EarlyChange 1),
[/ASCII85Decode /FlateDecode], ASCIIHexDecode, RunLengthDecode.
The ASCII85 stage uses the stdlib's own encoder (base64.a85encode,
adobe framing) so the chain fixture is cross-implementation, not
self-referential. Prints scala-ready hex literals.
"""
import base64
import zlib


def lzw_encode(data: bytes, early: int = 1) -> bytes:
    dic = {bytes([i]): i for i in range(256)}
    nxt, width = 258, 9
    bits = []

    def put(code):
        for i in range(width - 1, -1, -1):
            bits.append((code >> i) & 1)

    put(256)  # leading Clear
    cur = b""
    for b in data:
        cand = cur + bytes([b])
        if cand in dic:
            cur = cand
        else:
            put(dic[cur])
            if nxt < 4096:
                dic[cand] = nxt
                nxt += 1
            # encoder's table runs one ahead of the decoder's
            if nxt == (1 << width) - early + 1 and width < 12:
                width += 1
            cur = bytes([b])
    if cur:
        put(dic[cur])
    put(257)  # EOD
    out = bytearray((len(bits) + 7) // 8)
    for i, bit in enumerate(bits):
        if bit:
            out[i // 8] |= 1 << (7 - i % 8)
    return bytes(out)


def rl_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 127:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            j = i + 1
            while (j < len(data) and j - i < 128 and
                   not (j + 2 < len(data) and
                        data[j] == data[j + 1] == data[j + 2])):
                j += 1
            out.append(j - i - 1)
            out.extend(data[i:j])
            i = j
    out.append(128)
    return bytes(out)


def pdf(dict_extra: str, data: bytes) -> bytes:
    head = (f"%PDF-1.4\n1 0 obj << /Length {len(data)} {dict_extra} >>"
            "\nstream\n").encode("latin-1")
    return head + data + b"\nendstream\nendobj\n%%EOF"


def main():
    fixtures = []
    t = b"BT (lzw early-change text) Tj ET"
    fixtures.append(("lzw", pdf("/Filter /LZWDecode", lzw_encode(t)),
                     "lzw early-change text"))
    t = b"BT (ascii85 flate chain) Tj ET"
    enc = base64.a85encode(zlib.compress(t), adobe=True)[2:]  # strip <~
    fixtures.append(("a85_flate",
                     pdf("/Filter [/ASCII85Decode /FlateDecode]", enc),
                     "ascii85 flate chain"))
    t = b"BT (hex encoded stream) Tj ET"
    fixtures.append(("ahx", pdf("/Filter /ASCIIHexDecode",
                                t.hex().upper().encode() + b">"),
                     "hex encoded stream"))
    t = b"BT (ruuuuuuuuun length data) Tj ET"
    fixtures.append(("rl", pdf("/Filter /RunLengthDecode", rl_encode(t)),
                     "ruuuuuuuuun length data"))
    for name, payload, text in fixtures:
        print(f'// {name}: text "{text}"')
        print(f'"{payload.hex()}"')
        print()


if __name__ == "__main__":
    main()
