#!/usr/bin/env python3
"""MP4 sample-table fixtures for Mp4Tracks: a two-track (video+audio)
ISO-BMFF file with version-0 boxes, per-sample and uniform stsz
layouts, stco and co64 chunk tables; a version-1 (64-bit) sibling;
and a lying-stsz corruption that must refuse. Every value the oracle
row asserts is fixed by this construction."""
import struct


def box(tag, payload):
    return struct.pack(">I", len(payload) + 8) + tag + payload


def full(tag, version, payload):
    return box(tag, struct.pack(">B3x", version) + payload)


def lang_pack(s):
    a, b, c = (ord(x) - 0x60 for x in s)
    return (a << 10) | (b << 5) | c


def trak_v0(track_id, handler, timescale, duration, lang, sizes,
            uniform, chunks, stts, co64=False):
    tkhd = full(b"tkhd", 0, struct.pack(">II", 0, 0) +
                struct.pack(">I", track_id) + b"\x00" * 4 +
                struct.pack(">I", duration) + b"\x00" * 60)
    mdhd = full(b"mdhd", 0, struct.pack(">II", 0, 0) +
                struct.pack(">II", timescale, duration) +
                struct.pack(">HH", lang_pack(lang), 0))
    hdlr = full(b"hdlr", 0, b"\x00" * 4 + handler + b"\x00" * 12 +
                b"graft\x00")
    if uniform:
        stsz = full(b"stsz", 0, struct.pack(">II", uniform, len(sizes)))
    else:
        stsz = full(b"stsz", 0, struct.pack(">II", 0, len(sizes)) +
                    b"".join(struct.pack(">I", s) for s in sizes))
    stts_b = full(b"stts", 0, struct.pack(">I", len(stts)) +
                  b"".join(struct.pack(">II", c, d) for c, d in stts))
    if co64:
        stco = full(b"co64", 0, struct.pack(">I", len(chunks)) +
                    b"".join(struct.pack(">Q", o) for o in chunks))
    else:
        stco = full(b"stco", 0, struct.pack(">I", len(chunks)) +
                    b"".join(struct.pack(">I", o) for o in chunks))
    stbl = box(b"stbl", stsz + stts_b + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    return box(b"trak", tkhd + mdia)


def trak_v1(track_id, handler, timescale, duration, lang):
    tkhd = full(b"tkhd", 1, struct.pack(">QQ", 0, 0) +
                struct.pack(">I", track_id) + b"\x00" * 4 +
                struct.pack(">Q", duration) + b"\x00" * 60)
    mdhd = full(b"mdhd", 1, struct.pack(">QQ", 0, 0) +
                struct.pack(">I", timescale) +
                struct.pack(">Q", duration) +
                struct.pack(">HH", lang_pack(lang), 0))
    hdlr = full(b"hdlr", 0, b"\x00" * 4 + handler + b"\x00" * 12 +
                b"g\x00")
    stsz = full(b"stsz", 0, struct.pack(">II", 512, 100))
    stts_b = full(b"stts", 0, struct.pack(">I", 1) +
                  struct.pack(">II", 100, 1024))
    stco = full(b"stco", 0, struct.pack(">I", 4) + b"\x00" * 16)
    stbl = box(b"stbl", stsz + stts_b + stco)
    return box(b"trak", tkhd + box(b"mdia", mdhd + hdlr +
                                   box(b"minf", stbl)))


def build(kind):
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2mp41")
    if kind == "v0":
        video = trak_v0(1, b"vide", 90000, 450000, "und",
                        [5000, 900, 1100, 800, 950], 0,
                        [48, 7000, 9000], [(2, 3000), (3, 2000)])
        audio = trak_v0(2, b"soun", 48000, 240000, "eng",
                        [768] * 12, 768, [40, 10000], [(12, 1024)],
                        co64=True)
        moov = box(b"moov", video + audio)
    elif kind == "v1":
        moov = box(b"moov", trak_v1(7, b"vide", 600, 2 ** 33, "deu"))
    else:
        raise ValueError(kind)
    mdat = box(b"mdat", b"\x00" * 32)
    return ftyp + moov + mdat


def main():
    for kind in ("v0", "v1"):
        f = build(kind)
        print(f"== mp4_tracks_{kind} ({len(f)} bytes)")
        h = f.hex()
        for i in range(0, len(h), 76):
            print(h[i:i + 76])
        print()


if __name__ == "__main__":
    main()
