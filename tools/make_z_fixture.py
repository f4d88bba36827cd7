#!/usr/bin/env python3
"""q344_unlzw fixtures: a from-scratch implementation of Unix
compress(1)'s LZW output format (ncompress compress42.c semantics —
9..16-bit LSB-first codes, block mode with CLEAR=256, the group
padding quirk on every width change and clear), VALIDATED against the
system `uncompress` (gzip's unlzw.c) so the pinned bytes are
authoritative: if this encoder drifted from the canonical decoder the
validation step would fail.

Fixtures:
- z16: maxbits=16 block-mode text crossing the 9->10 bit width bump
- z10: maxbits=10 block-mode text long enough to fill the table and
  emit CLEAR (exercises table reset + post-clear decode)
- znb: non-block-mode (flag bit 7 clear) small text
- zempty: header-only (compress of an empty file)

Prints Scala hex literals + the expected texts."""

import subprocess
import tempfile
import os


def compress_lzw(data, maxbits=16, block_mode=True):
    out = bytearray([0x1F, 0x9D, (0x80 if block_mode else 0) | maxbits])
    pending = bytearray()
    state = {"bitbuf": 0, "bitcnt": 0, "outbits": 0, "n_bits": 9}

    def putcode(c):
        state["bitbuf"] |= c << state["bitcnt"]
        state["bitcnt"] += state["n_bits"]
        state["outbits"] += state["n_bits"]
        while state["bitcnt"] >= 8:
            pending.append(state["bitbuf"] & 0xFF)
            state["bitbuf"] >>= 8
            state["bitcnt"] -= 8

    def pad_group():
        # flush to a multiple of n_bits bytes since the last boundary
        g = state["n_bits"] << 3
        rem = state["outbits"] % g
        if rem:
            state["bitcnt"] += g - rem
            while state["bitcnt"] >= 8:
                pending.append(state["bitbuf"] & 0xFF)
                state["bitbuf"] >>= 8
                state["bitcnt"] -= 8
        state["outbits"] = 0

    if not data:
        return bytes(out)
    maxmax = 1 << maxbits
    free_ent = 257 if block_mode else 256
    table = {}

    def emit(code):
        # width bump BEFORE the code whose read would see the decoder's
        # (lagging-by-one) table spill past its maxcode
        if free_ent >= (1 << state["n_bits"]) + 1 and \
                state["n_bits"] < maxbits:
            pad_group()
            state["n_bits"] += 1
        putcode(code)

    ent = data[0]
    for c in data[1:]:
        key = (ent, c)
        if key in table:
            ent = table[key]
            continue
        emit(ent)
        # compress42.c order: output, ent=c, THEN table insert / clear —
        # so a CLEAR is always followed by a literal-rooted chain
        ent = c
        if free_ent < maxmax:
            table[key] = free_ent
            free_ent += 1
        elif block_mode:
            emit(256)
            pad_group()
            table.clear()
            free_ent = 257
            state["n_bits"] = 9
    emit(ent)
    while state["bitcnt"] > 0:
        pending.append(state["bitbuf"] & 0xFF)
        state["bitbuf"] >>= 8
        state["bitcnt"] -= 8
    return bytes(out) + bytes(pending)


def validate(blob, want):
    with tempfile.NamedTemporaryFile(suffix=".Z", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        got = subprocess.run(["uncompress", "-c", path],
                             capture_output=True, check=True).stdout
        assert got == want, (len(got), len(want), got[:40], want[:40])
    finally:
        os.unlink(path)


def scala_hex(name, b):
    h = b.hex().upper()
    lines = [h[i:i + 60] for i in range(0, len(h), 60)]
    body = " +\n    ".join('"%s"' % ln for ln in lines)
    print("  private val %s: String =\n    %s\n" % (name, body))


if __name__ == "__main__":
    # texts chosen to be replayable ARITHMETICALLY by the DuckDB
    # oracle (string_agg over range) — no giant literals anywhere
    t16 = " ".join("tok%d" % (i * 7 % 97) for i in range(300)).encode()
    t10 = " ".join("w%d" % (i * 13 % 701) for i in range(1200)).encode()
    tnb = b"non-block mode lzw, the pre-1985 shape"
    tkwk = b"a" * 40  # run of one byte: the KwK code path every step

    z16 = compress_lzw(t16, 16, True)
    z10 = compress_lzw(t10, 10, True)
    znb = compress_lzw(tnb, 16, False)
    zkwk = compress_lzw(tkwk, 16, True)
    zempty = compress_lzw(b"", 16, True)
    for blob, want in ((z16, t16), (z10, t10), (znb, tnb), (zkwk, tkwk),
                       (zempty, b"")):
        validate(blob, want)
    print("// validated against uncompress: %d %d %d %d %d bytes" %
          (len(z16), len(z10), len(znb), len(zkwk), len(zempty)))
    scala_hex("z16Hex", z16)
    scala_hex("z10Hex", z10)
    scala_hex("znbHex", znb)
    scala_hex("zkwkHex", zkwk)
    print("// tnb = %r  tkwk = 'a'*40" % tnb)
