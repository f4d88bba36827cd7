#!/usr/bin/env python3
"""Native-JPEG fixtures: a from-scratch baseline JPEG ENCODER (own
huffman tables in the DHT, Annex-K quality-50 quant tables, forward
DCT) plus a REFERENCE DECODER implementing the engine's pinned
integer contract — the 2^14 fixed-point IDCT table, (S + 2^29) >> 30
rounding, replication chroma upsampling, and the 2^16 fixed-point
YCbCr→RGB constants — so the Scala decoder's hashes are cross-checked
bit for bit by an independent implementation.

Prints: the IDCT/color constants to embed in Scala, fixture hexes
(gray 1-component, color 4:2:0 with restart markers, color 4:4:4) and
their pinned dHashes.
"""
import math
import sys

# ---- the pinned integer contract ------------------------------------
IDCT_A = [[round((math.sqrt(0.5) if u == 0 else 1.0) *
                 math.cos((2 * x + 1) * u * math.pi / 16) * 16384)
           for x in range(8)] for u in range(8)]
CR_R = round(1.402 * 65536)
CB_G = round(0.344136 * 65536)
CR_G = round(0.714136 * 65536)
CB_B = round(1.772 * 65536)


def zigzag():
    """The 64-entry zigzag order, generated algorithmically."""
    out = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            ij.reverse()
        out.extend(i * 8 + j for i, j in ij)
    return out


ZZ = zigzag()

# Annex K luminance / chrominance quantization tables (quality 50)
QT_L = [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113,
        92, 49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112,
        100, 103, 99]
QT_C = [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99]


def fdct(block):
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += block[y * 8 + x] * \
                        math.cos((2 * x + 1) * u * math.pi / 16) * \
                        math.cos((2 * y + 1) * v * math.pi / 16)
            cu = math.sqrt(0.5) if u == 0 else 1.0
            cv = math.sqrt(0.5) if v == 0 else 1.0
            out[v * 8 + u] = s * cu * cv / 4.0
    return out


def build_huffman(freq):
    """Canonical (counts-per-length, symbols) from frequencies —
    simple package: assign lengths by frequency-sorted heap."""
    import heapq
    items = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freq.items()))]
    if len(items) == 1:
        sym = items[0][2][0]
        return [0, 1] + [0] * 15, [sym]
    heapq.heapify(items)
    depth = {s: 0 for s in freq}
    n = len(items)
    while len(items) > 1:
        f1, _, s1 = heapq.heappop(items)
        f2, _, s2 = heapq.heappop(items)
        for s in s1 + s2:
            depth[s] += 1
        n += 1
        heapq.heappush(items, (f1 + f2, n, s1 + s2))
    assert max(depth.values()) <= 16
    counts = [0] * 17
    for s in depth:
        counts[depth[s]] += 1
    syms = [s for _, s in sorted((l, s) for s, l in depth.items())]
    return counts, syms


def canonical_codes(counts, syms):
    codes = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(counts[l]):
            codes[syms[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    return codes


class JBits:
    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, code, length):  # MSB-first
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def align(self):
        while self.n:
            self.put(1, 1)  # pad with 1s per spec


def csize(v):
    s = 0
    v = abs(v)
    while v:
        s += 1
        v >>= 1
    return s


def encode_jpeg(planes, w, h, sampling, qts, restart=0):
    """planes: list of full-res component sample arrays (values
    0..255); sampling: [(hi, vi)]; qts: quant table index per comp."""
    ncomp = len(planes)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # component planes subsampled by AVERAGING, padded to MCU grid
    comp = []
    for c in range(ncomp):
        hi, vi = sampling[c]
        cw, ch = mcux * hi * 8, mcuy * vi * 8
        sw, sh = (hmax // hi), (vmax // vi)
        arr = [[0] * cw for _ in range(ch)]
        for y in range(ch):
            for x in range(cw):
                sx = min(x * sw, w - 1)
                sy = min(y * sh, h - 1)
                acc = 0
                for dy in range(sh):
                    for dx in range(sw):
                        acc += planes[c][min(sy + dy, h - 1) * w +
                                         min(sx + dx, w - 1)]
                arr[y][x] = acc // (sw * sh)
        comp.append(arr)
    # quantized coefficient blocks per MCU, plus symbol frequencies
    dcf = [{} for _ in range(ncomp)]
    acf = [{} for _ in range(ncomp)]
    mcu_list = []
    for my in range(mcuy):
        for mx in range(mcux):
            mcu = []
            for c in range(ncomp):
                hi, vi = sampling[c]
                for by in range(vi):
                    for bx in range(hi):
                        x0, y0 = (mx * hi + bx) * 8, (my * vi + by) * 8
                        blk = [comp[c][y0 + y][x0 + x] - 128
                               for y in range(8) for x in range(8)]
                        co = fdct(blk)
                        q = [int(round(co[ZZ[k]] / qts[c][k]))
                             for k in range(64)]
                        mcu.append((c, q))
            mcu_list.append(mcu)
    # restart-aware DC prediction for frequency counting
    def walk(emit):
        preds = [0] * ncomp
        for i, mcu in enumerate(mcu_list):
            if restart and i and i % restart == 0:
                preds = [0] * ncomp
                emit("rst", i // restart - 1, None)
            for c, q in mcu:
                diff = q[0] - preds[c]
                preds[c] = q[0]
                emit("dc", c, diff)
                run = 0
                for k in range(1, 64):
                    if q[k] == 0:
                        run += 1
                    else:
                        while run > 15:
                            emit("ac", c, (15, 0, 0))
                            run -= 16
                        emit("ac", c, (run, csize(q[k]), q[k]))
                        run = 0
                if run:
                    emit("eob", c, None)

    def count(kind, c, v):
        if kind == "dc":
            s = csize(v)
            dcf[c][s] = dcf[c].get(s, 0) + 1
        elif kind == "ac":
            r, s, _ = v
            acf[c][(r << 4) | s] = acf[c].get((r << 4) | s, 0) + 1
        elif kind == "eob":
            acf[c][0] = acf[c].get(0, 0) + 1
    walk(count)
    for c in range(ncomp):
        dcf[c].setdefault(0, 0)
        acf[c].setdefault(0, 0)
        if len(dcf[c]) == 1:  # canonical needs >= 1; pad a second
            dcf[c][11] = dcf[c].get(11, 0) + 1
        if len(acf[c]) == 1:
            acf[c][0xF0] = acf[c].get(0xF0, 0) + 1
    dct = [build_huffman(dcf[c]) for c in range(ncomp)]
    act = [build_huffman(acf[c]) for c in range(ncomp)]
    dcc = [canonical_codes(*t) for t in dct]
    acc_ = [canonical_codes(*t) for t in act]
    bits = JBits()

    def emit(kind, c, v):
        if kind == "rst":
            bits.align()
            bits.out.append(0xFF)
            bits.out.append(0xD0 + (c % 8))
        elif kind == "dc":
            s = csize(v)
            code, l = dcc[c][s]
            bits.put(code, l)
            if s:
                vv = v if v >= 0 else v + (1 << s) - 1
                bits.put(vv & ((1 << s) - 1), s)
        elif kind == "ac":
            r, s, val = v
            code, l = acc_[c][(r << 4) | s]
            bits.put(code, l)
            vv = val if val >= 0 else val + (1 << s) - 1
            bits.put(vv & ((1 << s) - 1), s)
        else:
            code, l = acc_[c][0]
            bits.put(code, l)
    walk(emit)
    bits.align()
    # assemble the file
    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.append(0xFF)
        out.append(marker)
        out.extend((len(payload) + 2).to_bytes(2, "big"))
        out.extend(payload)
    # emit each distinct quant table once
    emitted = {}
    for c in range(ncomp):
        key = id(qts[c])
        if key not in emitted:
            emitted[key] = len(emitted)
            seg(0xDB, bytes([emitted[key]]) + bytes(qts[c]))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, (sampling[c][0] << 4) | sampling[c][1],
                      emitted[id(qts[c])]])
    seg(0xC0, bytes(sof))
    for c in range(ncomp):
        cnt, syms = dct[c]
        seg(0xC4, bytes([c]) + bytes(cnt[1:]) + bytes(syms))
        cnt, syms = act[c]
        seg(0xC4, bytes([0x10 | c]) + bytes(cnt[1:]) + bytes(syms))
    if restart:
        seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytearray([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, (c << 4) | c])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))
    out += bits.out
    out += b"\xff\xd9"
    return bytes(out)


# ---- reference decoder (the engine contract) ------------------------
def decode_jpeg(b):
    pos = 2
    qt = {}
    huff = {}
    sof = None
    ri = 0
    while True:
        assert b[pos] == 0xFF
        m = b[pos + 1]
        if m == 0xDA:
            break
        ln = int.from_bytes(b[pos + 2:pos + 4], "big")
        pay = b[pos + 4:pos + 2 + ln]
        if m == 0xDB:
            i = 0
            while i < len(pay):
                pq, tq = pay[i] >> 4, pay[i] & 15
                assert pq == 0
                qt[tq] = list(pay[i + 1:i + 65])
                i += 65
        elif m == 0xC4:
            i = 0
            while i < len(pay):
                tc, th = pay[i] >> 4, pay[i] & 15
                counts = [0] + list(pay[i + 1:i + 17])
                ns = sum(counts)
                syms = list(pay[i + 17:i + 17 + ns])
                huff[(tc, th)] = canonical_codes(counts, syms)
                i += 17 + ns
        elif m == 0xC0 or m == 0xC1:
            prec = pay[0]
            assert prec == 8
            hh = int.from_bytes(pay[1:3], "big")
            ww = int.from_bytes(pay[3:5], "big")
            nc = pay[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = pay[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (ww, hh, comps)
        elif m == 0xDD:
            ri = int.from_bytes(pay, "big")
        pos += 2 + ln
    ln = int.from_bytes(b[pos + 2:pos + 4], "big")
    pay = b[pos + 4:pos + 2 + ln]
    ns = pay[0]
    scomp = []
    for c in range(ns):
        cs, tt = pay[1 + 2 * c:3 + 2 * c]
        scomp.append((cs, tt >> 4, tt & 15))
    data = b[pos + 2 + ln:]
    w, h, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for _, hi, vi, _ in comps:
        planes.append([[0] * (mcux * hi * 8) for _ in range(mcuy * vi * 8)])

    class RD:
        def __init__(self, d):
            self.d = d
            self.i = 0
            self.acc = 0
            self.n = 0

        def bit(self):
            if self.n == 0:
                v = self.d[self.i]
                self.i += 1
                if v == 0xFF:
                    assert self.d[self.i] == 0x00
                    self.i += 1
                self.acc = v
                self.n = 8
            self.n -= 1
            return (self.acc >> self.n) & 1

        def align_rst(self):
            self.n = 0
            assert self.d[self.i] == 0xFF and 0xD0 <= self.d[self.i + 1] <= 0xD7
            self.i += 2

    rd = RD(data)
    inv = {k: {} for k in huff}
    for k, codes in huff.items():
        for s, (c, l) in codes.items():
            inv[k][(c, l)] = s

    def dec(k):
        c, l = 0, 0
        while l < 16:
            c = (c << 1) | rd.bit()
            l += 1
            if (c, l) in inv[k]:
                return inv[k][(c, l)]
        raise AssertionError("bad code")

    def recv(s):
        v = 0
        for _ in range(s):
            v = (v << 1) | rd.bit()
        if s and v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v

    preds = [0] * len(comps)
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and nmcu and nmcu % ri == 0:
                rd.align_rst()
                preds = [0] * len(comps)
            nmcu += 1
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                td = next(t[1] for t in scomp if t[0] == cid)
                ta = next(t[2] for t in scomp if t[0] == cid)
                for by in range(vi):
                    for bx in range(hi):
                        zz = [0] * 64
                        s = dec((0, td))
                        diff = recv(s)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = dec((1, ta))
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            zz[k] = recv(s)
                            k += 1
                        coef = [0] * 64
                        for k in range(64):
                            coef[ZZ[k]] = zz[k] * qt[tq][k]
                        # the pinned integer IDCT
                        x0, y0 = (mx * hi + bx) * 8, (my * vi + by) * 8
                        for y in range(8):
                            for x in range(8):
                                S = 0
                                for v in range(8):
                                    for u in range(8):
                                        S += coef[v * 8 + u] * \
                                            IDCT_A[u][x] * IDCT_A[v][y]
                                val = ((S + (1 << 29)) >> 30) + 128
                                planes[ci][y0 + y][x0 + x] = \
                                    0 if val < 0 else (255 if val > 255
                                                       else val)
    # upsample by replication + color convert
    px = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            if len(comps) == 1:
                g = planes[0][y][x]
                px[y * w + x] = (255 << 24) | (g << 16) | (g << 8) | g
            else:
                yv = planes[0][y * comps[0][2] // vmax][x * comps[0][1] // hmax]
                cb = planes[1][y * comps[1][2] // vmax][x * comps[1][1] // hmax]
                cr = planes[2][y * comps[2][2] // vmax][x * comps[2][1] // hmax]
                r = yv + ((CR_R * (cr - 128) + 32768) >> 16)
                g = yv - ((CB_G * (cb - 128) + CR_G * (cr - 128) + 32768) >> 16)
                bl = yv + ((CB_B * (cb - 128) + 32768) >> 16)
                def cl(v):
                    return 0 if v < 0 else (255 if v > 255 else v)
                px[y * w + x] = (255 << 24) | (cl(r) << 16) | \
                    (cl(g) << 8) | cl(bl)
    return px, w, h


def encode_progressive(planes, w, h, sampling, qts):
    """Spectral-selection progressive (SOF2) encode of the SAME
    quantized coefficients encode_jpeg would produce: one interleaved
    DC scan (Ss=Se=0, Al=0) then one full AC band scan per component
    (Ss=1, Se=63, non-interleaved, the component's UNPADDED block
    grid). Pixels therefore decode identically to the baseline encode
    of the same planes — the fixture's pinned hash is the baseline
    hash, cross-checking the engine's progressive path against its
    independently verified sequential one."""
    ncomp = len(planes)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    comp = []
    for c in range(ncomp):
        hi, vi = sampling[c]
        cw, ch = mcux * hi * 8, mcuy * vi * 8
        sw, sh = (hmax // hi), (vmax // vi)
        arr = [[0] * cw for _ in range(ch)]
        for y in range(ch):
            for x in range(cw):
                sx = min(x * sw, w - 1)
                sy = min(y * sh, h - 1)
                acc = 0
                for dy in range(sh):
                    for dx in range(sw):
                        acc += planes[c][min(sy + dy, h - 1) * w +
                                         min(sx + dx, w - 1)]
                arr[y][x] = acc // (sw * sh)
        comp.append(arr)
    # quantized blocks per component, padded grid, zigzag order
    qb = []
    for c in range(ncomp):
        hi, vi = sampling[c]
        rows = []
        for brow in range(mcuy * vi):
            row = []
            for bcol in range(mcux * hi):
                x0, y0 = bcol * 8, brow * 8
                blk = [comp[c][y0 + y][x0 + x] - 128
                       for y in range(8) for x in range(8)]
                co = fdct(blk)
                row.append([int(round(co[ZZ[k]] / qts[c][k]))
                            for k in range(64)])
            rows.append(row)
        qb.append(rows)
    scan_wh = [((( (w * sampling[c][0] + hmax - 1) // hmax) + 7) // 8,
                (((h * sampling[c][1] + vmax - 1) // vmax) + 7) // 8)
               for c in range(ncomp)]

    # ---- DC scan symbols (interleaved MCU walk, padded grid) ----
    def dc_walk(emit):
        preds = [0] * ncomp
        for my in range(mcuy):
            for mx in range(mcux):
                for c in range(ncomp):
                    hi, vi = sampling[c]
                    for by in range(vi):
                        for bx in range(hi):
                            q0 = qb[c][my * vi + by][mx * hi + bx][0]
                            emit(c, q0 - preds[c])
                            preds[c] = q0

    dcf = [{} for _ in range(ncomp)]

    def dc_count(c, diff):
        s = csize(diff)
        dcf[c][s] = dcf[c].get(s, 0) + 1
    dc_walk(dc_count)
    for c in range(ncomp):
        dcf[c].setdefault(0, 0)
        if len(dcf[c]) == 1:
            dcf[c][11] = dcf[c].get(11, 0) + 1
    dct = [build_huffman(dcf[c]) for c in range(ncomp)]
    dcc = [canonical_codes(*t) for t in dct]

    # ---- AC scan symbols per component (unpadded grid) ----
    def ac_syms(c):
        sw, sh = scan_wh[c]
        out = []
        for brow in range(sh):
            for bcol in range(sw):
                q = qb[c][brow][bcol]
                run = 0
                for k in range(1, 64):
                    if q[k] == 0:
                        run += 1
                    else:
                        while run > 15:
                            out.append((15, 0, 0))
                            run -= 16
                        out.append((run, csize(q[k]), q[k]))
                        run = 0
                if run:
                    out.append((0, 0, 0))  # EOB (run of 1)
        return out
    acs = [ac_syms(c) for c in range(ncomp)]
    act = []
    acc_ = []
    for c in range(ncomp):
        f = {}
        for r, s, _ in acs[c]:
            f[(r << 4) | s] = f.get((r << 4) | s, 0) + 1
        f.setdefault(0, 0)
        if len(f) == 1:
            f[0xF0] = f.get(0xF0, 0) + 1
        t = build_huffman(f)
        act.append(t)
        acc_.append(canonical_codes(*t))

    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.append(0xFF)
        out.append(marker)
        out.extend((len(payload) + 2).to_bytes(2, "big"))
        out.extend(payload)
    emitted = {}
    for c in range(ncomp):
        key = id(qts[c])
        if key not in emitted:
            emitted[key] = len(emitted)
            seg(0xDB, bytes([emitted[key]]) + bytes(qts[c]))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, (sampling[c][0] << 4) | sampling[c][1],
                      emitted[id(qts[c])]])
    seg(0xC2, bytes(sof))
    # DC scan: DHTs then the interleaved scan
    for c in range(ncomp):
        cnt, syms = dct[c]
        seg(0xC4, bytes([c]) + bytes(cnt[1:]) + bytes(syms))
    sos = bytearray([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, c << 4])
    sos += bytes([0, 0, 0])
    seg(0xDA, bytes(sos))
    bits = JBits()

    def dc_emit(c, diff):
        s = csize(diff)
        code, l = dcc[c][s]
        bits.put(code, l)
        if s:
            vv = diff if diff >= 0 else diff + (1 << s) - 1
            bits.put(vv & ((1 << s) - 1), s)
    dc_walk(dc_emit)
    bits.align()
    out += bits.out
    # one AC band scan per component
    for c in range(ncomp):
        cnt, syms = act[c]
        seg(0xC4, bytes([0x10 | c]) + bytes(cnt[1:]) + bytes(syms))
        seg(0xDA, bytes([1, c + 1, c]) + bytes([1, 63, 0]))
        bits = JBits()
        for r, s, val in acs[c]:
            code, l = acc_[c][(r << 4) | s]
            bits.put(code, l)
            if s:
                vv = val if val >= 0 else val + (1 << s) - 1
                bits.put(vv & ((1 << s) - 1), s)
        bits.align()
        out += bits.out
    out += b"\xff\xd9"
    return bytes(out)


def dhash(px, w, h):
    xs = [i * (w - 1) // 8 for i in range(9)]
    bits = 0
    for j in range(8):
        y = j * (h - 1) // 7

        def luma(x):
            p = px[y * w + x]
            return (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 +
                    (p & 255) * 114)
        for i in range(8):
            if luma(xs[i + 1]) > luma(xs[i]):
                bits |= 1 << (8 * j + i)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def main():
    print("// IDCT_A rows (embed in Scala):")
    for u in range(8):
        print("//", IDCT_A[u])
    print("// color consts: CR_R=%d CB_G=%d CR_G=%d CB_B=%d" %
          (CR_R, CB_G, CR_G, CB_B))
    A = lambda x, y: (x * 13 + y * 7) % 200
    W = H = 16
    gray = [A(x, y) for y in range(H) for x in range(W)]
    jg = encode_jpeg([gray], W, H, [(1, 1)], [QT_L])
    pg, _, _ = decode_jpeg(jg)
    print('val jGray = "%s"' % jg.hex())
    print("hashGray =", dhash(pg, W, H))
    # color 4:2:0 with a restart interval
    ry = [(A(x, y)) for y in range(H) for x in range(W)]
    rb = [((x * 29 + y * 3) % 200) for y in range(H) for x in range(W)]
    rg = [((x * 5 + y * 17) % 200) for y in range(H) for x in range(W)]
    # build YCbCr planes from RGB semantics: treat these AS Y/Cb/Cr
    ycc = [ry, [v + 28 for v in rb], [v + 28 for v in rg]]
    jc = encode_jpeg(ycc, W, H, [(2, 2), (1, 1), (1, 1)],
                     [QT_L, QT_C, QT_C], restart=2)
    pc, _, _ = decode_jpeg(jc)
    print('val jColor420 = "%s"' % jc.hex())
    print("hashColor420 =", dhash(pc, W, H))
    # color 4:4:4, no restart
    jc444 = encode_jpeg(ycc, W, H, [(1, 1), (1, 1), (1, 1)],
                        [QT_L, QT_C, QT_C])
    p444, _, _ = decode_jpeg(jc444)
    print('val jColor444 = "%s"' % jc444.hex())
    print("hashColor444 =", dhash(p444, W, H))
    # progressive 4:2:0 of the SAME planes: identical quantized
    # coefficients -> identical pixels -> the baseline 4:2:0 hash
    # (computed WITHOUT restarts: coefficients are restart-invariant)
    jc_norst = encode_jpeg(ycc, W, H, [(2, 2), (1, 1), (1, 1)],
                           [QT_L, QT_C, QT_C])
    pc_norst, _, _ = decode_jpeg(jc_norst)
    assert dhash(pc_norst, W, H) == dhash(pc, W, H)
    jprog = encode_progressive(ycc, W, H, [(2, 2), (1, 1), (1, 1)],
                               [QT_L, QT_C, QT_C])
    assert jprog[3] != 0xC0  # really SOF2
    print('val jProg420 = "%s"' % jprog.hex())
    print("hashProg420 =", dhash(pc, W, H), "(== hashColor420)")


if __name__ == "__main__":
    sys.exit(main())
