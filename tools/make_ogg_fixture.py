#!/usr/bin/env python3
"""q330_ogg_meta fixture generator: three spec-exact Ogg streams
(Vorbis tagged, Opus tagged, Vorbis zero-comment) built from the
public Ogg/Vorbis/Opus specs with an INDEPENDENT CRC implementation
(0x04c11db7 forward, zero init/xor), so the kernel's page-CRC
verification is cross-checked by construction. Prints Scala hex
literals."""
import struct


def crc_table():
    t = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1) & 0xFFFFFFFF
        t.append(r)
    return t


TABLE = crc_table()


def ogg_crc(data):
    crc = 0
    for by in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ TABLE[((crc >> 24) ^ by) & 0xFF]
    return crc


def lace(packet):
    segs = []
    i = 0
    while len(packet) - i >= 255:
        segs.append(packet[i:i + 255])
        i += 255
    segs.append(packet[i:])  # final short (possibly empty) segment
    return segs


def page(granule, serial, seq, header_type, packets):
    segs = []
    for p in packets:
        segs.extend(lace(p))
    segtable = bytes(len(s) for s in segs)
    payload = b"".join(segs)
    hdr = (b"OggS" + b"\x00" + bytes([header_type]) +
           struct.pack("<q", granule) + struct.pack("<I", serial) +
           struct.pack("<I", seq) + b"\x00\x00\x00\x00" +
           bytes([len(segs)]) + segtable)
    crc = ogg_crc(hdr + payload)
    return hdr[:22] + struct.pack("<I", crc) + hdr[26:] + payload


def vorbis_id(channels, rate):
    return (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels]) +
            struct.pack("<I", rate) + b"\x00" * 12 + b"\xb8" + b"\x01")


def vorbis_comments(comments, vendor=b"graft"):
    out = struct.pack("<I", len(vendor)) + vendor
    out += struct.pack("<I", len(comments))
    for c in comments:
        out += struct.pack("<I", len(c)) + c
    return out


def opus_head(channels, preskip, rate):
    return (b"OpusHead" + b"\x01" + bytes([channels]) +
            struct.pack("<H", preskip) + struct.pack("<I", rate) +
            b"\x00\x00" + b"\x00")


SERIAL = 0x6772616F  # 'grao'

# m0: Vorbis stereo 44.1k, granule 88200 -> 2000 ms, two tags
m0 = (page(-1, SERIAL, 0, 2, [vorbis_id(2, 44100)]) +
      page(-1, SERIAL, 1, 0,
           [b"\x03vorbis" + vorbis_comments(
               [b"Title=Song A", b"ARTIST=V Art"]) + b"\x01"]) +
      page(88200, SERIAL, 2, 4, [b"\xaa" * 20]))

# m1: Opus mono, pre-skip 312, input 24k, granule 48312 -> 1000 ms
m1 = (page(-1, SERIAL, 0, 2, [opus_head(1, 312, 24000)]) +
      page(-1, SERIAL, 1, 0,
           [b"OpusTags" + vorbis_comments([b"encoder=opusenc"])]) +
      page(48312, SERIAL, 2, 4, [b"\xbb" * 10]))

# m2: Vorbis mono 8k, ZERO comments, granule 4000 -> 500 ms
m2 = (page(-1, SERIAL, 0, 2, [vorbis_id(1, 8000)]) +
      page(-1, SERIAL, 1, 0, [b"\x03vorbis" + vorbis_comments([]) + b"\x01"]) +
      page(4000, SERIAL, 2, 4, [b"\xcc" * 5]))

for name, data in (("m0", m0), ("m1", m1), ("m2", m2)):
    print('val %s = "%s"' % (name, data.hex()))
