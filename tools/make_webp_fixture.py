#!/usr/bin/env python3
"""q332_webp_dhash fixtures: an INDEPENDENT from-spec VP8L encoder
(LSB-first bit writer, canonical prefix codes emitted through the
code-length code, LZ77 plane-code distances, color cache, and the
predictor / cross-color / subtract-green / color-indexing transforms)
so the Scala decoder is cross-checked by construction.

Pattern A is the SAME (x*13+y*7)%200 16x16 gray pattern as
tools/make_gif_fixture.py, so the WebP hashes must equal the pinned
q320/q326 GIF/TIFF/BMP/PNG constant -- the sixth format in the
cross-format dHash family.

Run: python3 tools/make_webp_fixture.py  -> Scala hex + hash constants.
"""
import heapq
import sys

CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]


class BW:
    def __init__(self):
        self.bits = []

    def put(self, v, n):  # LSB-first value field
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def code(self, c, n):  # prefix code: MSB-first
        for i in range(n - 1, -1, -1):
            self.bits.append((c >> i) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def huff_lengths(freq):
    """Code lengths from frequencies; returns {sym: len}."""
    items = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freq.items()))]
    if len(items) == 1:
        return {items[0][2][0]: 1}
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
    assert max(depth.values()) <= 15, "depth overflow"
    return depth


def canonical(lengths):
    """{sym: len} -> {sym: (code, len)} canonical assignment."""
    by = sorted((l, s) for s, l in lengths.items() if l > 0)
    codes = {}
    code = 0
    prev = 0
    for l, s in by:
        code <<= (l - prev)
        codes[s] = (code, l)
        code += 1
        prev = l
    return codes


def write_prefix_code(bw, lengths, alphabet):
    """Emit one stored prefix code for a {sym: len} map."""
    used = sorted(s for s, l in lengths.items() if l > 0)
    if len(used) <= 2 and all(s < 256 for s in used):
        bw.put(1, 1)  # simple
        bw.put(len(used) - 1, 1)
        if used[0] < 2 and len(used) == 1:
            bw.put(0, 1)
            bw.put(used[0], 1)
        else:
            bw.put(1, 1)
            bw.put(used[0], 8)
        if len(used) == 2:
            bw.put(used[1], 8)
        return
    bw.put(0, 1)  # complex
    # code-length sequence with 17/18 zero-run compression
    arr = [lengths.get(s, 0) for s in range(alphabet)]
    while arr and arr[-1] == 0:
        arr.pop()
    seq = []  # (clsym, extra, extrabits)
    i = 0
    while i < len(arr):
        if arr[i] == 0:
            run = 0
            while i + run < len(arr) and arr[i + run] == 0:
                run += 1
            while run >= 11:
                take = min(run, 138)
                seq.append((18, take - 11, 7))
                run -= take
                i += take
            while run >= 3:
                take = min(run, 10)
                seq.append((17, take - 3, 3))
                run -= take
                i += take
            for _ in range(run):
                seq.append((0, 0, 0))
                i += 1
        else:
            seq.append((arr[i], 0, 0))
            i += 1
    clfreq = {}
    for s, _, _ in seq:
        clfreq[s] = clfreq.get(s, 0) + 1
    cl = huff_lengths(clfreq)
    assert max(cl.values()) <= 7
    ncl = max(4, 1 + max(CL_ORDER.index(s) for s in cl))
    bw.put(ncl - 4, 4)
    for k in range(ncl):
        bw.put(cl.get(CL_ORDER[k], 0), 3)
    # the trailing zeros were trimmed, so the max-symbol field must
    # tell the decoder how many cl-code reads to perform
    bw.put(1, 1)
    n = 2
    while len(seq) - 2 >= (1 << n):
        n += 2
    bw.put((n - 2) // 2, 3)
    bw.put(len(seq) - 2, n)
    ccodes = canonical(cl)
    for s, extra, ebits in seq:
        c, l = ccodes[s]
        bw.code(c, l)
        if ebits:
            bw.put(extra, ebits)


def lz77_sym(value):
    """value -> (symbol, extra, extrabits) for length/distance codes."""
    if value <= 4:
        return value - 1, 0, 0
    eb = 1
    while True:
        for odd in (0, 1):
            off = (2 + odd) << eb
            if off + 1 <= value <= off + (1 << eb):
                return 2 * eb + 2 + odd, value - off - 1, eb
        eb += 1


def encode_spatial(bw, ops, cache_bits=0, meta=None, allow_meta=False):
    """ops: ('lit', argb) | ('copy', length, distance) |
    ('cache', argb). meta: (meta_bits, meta_w, block->group list,
    per-group op index list) -- here simplified: meta is None or
    (meta_bits, group_of_op list) with ops tagged per group."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = sorted(set(g for g, _ in ops)) if meta else [0]
    # symbol streams per group
    streams = {g: {"g": {}, "r": {}, "b": {}, "a": {}, "d": {}}
               for g in groups}
    cache = [0] * cache_size if cache_size else None

    def key(px):
        return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)

    plan = []
    for g, op in ops:
        st = streams[g]
        if op[0] == "lit":
            px = op[1]
            a, r, gg, b = (px >> 24) & 255, (px >> 16) & 255, \
                (px >> 8) & 255, px & 255
            plan.append((g, "lit", gg, r, b, a))
            for d, s in (("g", gg), ("r", r), ("b", b), ("a", a)):
                st[d][s] = st[d].get(s, 0) + 1
            if cache is not None:
                cache[key(px)] = px
        elif op[0] == "cache":
            px = op[1]
            idx = key(px)
            assert cache[idx] == px, "cache fixture out of sync"
            sym = 280 + idx
            plan.append((g, "sym", sym, 0, 0))
            st["g"][sym] = st["g"].get(sym, 0) + 1
        else:
            _, length, dist_code = op
            ls, le, leb = lz77_sym(length)
            ds, de, deb = lz77_sym(dist_code)
            plan.append((g, "copy", 256 + ls, le, leb, ds, de, deb))
            st["g"][256 + ls] = st["g"].get(256 + ls, 0) + 1
            st["d"][ds] = st["d"].get(ds, 0) + 1
            # cache inserts for copied pixels happen at decode; the
            # fixture builder must mirror them if cache ops follow a
            # copy (our fixtures don't)
    bw.put(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.put(cache_bits, 4)
    if allow_meta:
        if meta is not None:
            meta_bits, meta_pixels, meta_w, meta_h = meta
            bw.put(1, 1)
            bw.put(meta_bits - 2, 3)
            encode_image_stream(bw, meta_pixels, meta_w, meta_h,
                                level0=False)
        else:
            bw.put(0, 1)
    codes = {}
    for g in groups:
        st = streams[g]
        gl = huff_lengths(st["g"]) if st["g"] else {0: 1}
        rl = huff_lengths(st["r"]) if st["r"] else {0: 1}
        bl = huff_lengths(st["b"]) if st["b"] else {0: 1}
        al = huff_lengths(st["a"]) if st["a"] else {255: 1}
        dl = huff_lengths(st["d"]) if st["d"] else {0: 1}
        write_prefix_code(bw, gl, 256 + 24 + cache_size)
        write_prefix_code(bw, rl, 256)
        write_prefix_code(bw, bl, 256)
        write_prefix_code(bw, al, 256)
        write_prefix_code(bw, dl, 40)
        codes[g] = tuple(canonical(x) for x in (gl, rl, bl, al, dl))
    for entry in plan:
        g = entry[0]
        gc, rc, bc, ac, dc = codes[g]
        if entry[1] == "lit":
            _, _, gg, r, b, a = entry
            for cd, s in ((gc, gg), (rc, r), (bc, b), (ac, a)):
                if len(cd) > 1:
                    bw.code(*cd[s])
        elif entry[1] == "sym":
            if len(gc) > 1:
                bw.code(*gc[entry[2]])
        else:
            _, _, gsym, le, leb, ds, de, deb = entry
            if len(gc) > 1:
                bw.code(*gc[gsym])
            bw.put(le, leb)
            if len(dc) > 1:
                bw.code(*dc[ds])
            bw.put(de, deb)


def encode_image_stream(bw, pixels, w, h, level0, transforms=(),
                        cache_bits=0, meta=None, ops=None):
    """pixels: list of argb ints (already transform-RESIDUAL for the
    given transform list). transforms: emitted header entries,
    each ('pred', bits, sub_pixels) | ('color', bits, sub_pixels) |
    ('subgreen',) | ('palette', colors_delta)."""
    if level0:
        for t in transforms:
            bw.put(1, 1)
            if t[0] == "pred":
                bw.put(0, 2)
                bw.put(t[1] - 2, 3)
                sw = (w + (1 << t[1]) - 1) >> t[1]
                sh = (h + (1 << t[1]) - 1) >> t[1]
                encode_image_stream(bw, t[2], sw, sh, level0=False)
            elif t[0] == "color":
                bw.put(1, 2)
                bw.put(t[1] - 2, 3)
                sw = (w + (1 << t[1]) - 1) >> t[1]
                sh = (h + (1 << t[1]) - 1) >> t[1]
                encode_image_stream(bw, t[2], sw, sh, level0=False)
            elif t[0] == "subgreen":
                bw.put(2, 2)
            else:
                bw.put(3, 2)
                bw.put(len(t[1]) - 1, 8)
                encode_image_stream(bw, t[1], len(t[1]), 1, level0=False)
        bw.put(0, 1)  # end of transforms
    if ops is None:
        ops = [(0, ("lit", px)) for px in pixels]
    encode_spatial(bw, ops, cache_bits=cache_bits, meta=meta,
                   allow_meta=level0)


def vp8l(w, h, body_bits_fn):
    bw = BW()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version
    body_bits_fn(bw)
    return b"\x2f" + bw.bytes()


def riff(chunks):
    body = b""
    for tag, data in chunks:
        body += tag + len(data).to_bytes(4, "little") + data
        if len(data) % 2:
            body += b"\x00"
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" + body


def webp(payload):
    return riff([(b"VP8L", payload)])


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


def gray(v):
    return 0xFF000000 | (v << 16) | (v << 8) | v


A = lambda x, y: (x * 13 + y * 7) % 200
W = H = 16
pixA = [gray(A(x, y)) for y in range(H) for x in range(W)]


def sub3(a, b, c):
    return abs(b - c) - abs(a - c)


def predict(mode, l, t, tl, tr):
    def avg2(a, b):
        return tuple((x + y) >> 1 for x, y in zip(a, b))

    def ch(p):
        return ((p >> 24) & 255, (p >> 16) & 255, (p >> 8) & 255, p & 255)
    L, T, TL, TR = ch(l), ch(t), ch(tl), ch(tr)
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return avg2(avg2(L, TR), T)
    if mode == 6:
        return avg2(L, TL)
    if mode == 7:
        return avg2(L, T)
    if mode == 8:
        return avg2(TL, T)
    if mode == 9:
        return avg2(T, TR)
    if mode == 10:
        return avg2(avg2(L, TL), avg2(T, TR))
    if mode == 11:
        d = sum(sub3(a, b, c) for a, b, c in zip(T, L, TL))
        return T if d <= 0 else L
    if mode == 12:
        return tuple(min(255, max(0, a + b - c))
                     for a, b, c in zip(L, T, TL))
    if mode == 13:
        av = avg2(L, T)

        # C trunc-toward-zero division
        def half(a, b):
            q = (a - b) // 2 if (a - b) >= 0 else -((b - a) // 2)
            return min(255, max(0, a + q))
        return tuple(half(a, b) for a, b in zip(av, TL))
    raise ValueError(mode)


def forward_predictor(pix, w, h, bits, modes, mw):
    out = []
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                mode = 0
            elif y == 0:
                mode = 1
            elif x == 0:
                mode = 2
            else:
                mode = modes[(y >> bits) * mw + (x >> bits)]
            pos = y * w + x
            l = pix[pos - 1] if x > 0 else 0
            t = pix[pos - w] if y > 0 else 0
            tl = pix[pos - w - 1] if x > 0 and y > 0 else 0
            tr = pix[pos - w + 1] if y > 0 else 0
            p = predict(mode, l, t, tl, tr)
            cur = pix[pos]
            res = 0
            for i, sh in enumerate((24, 16, 8, 0)):
                res |= ((((cur >> sh) & 255) - p[i]) & 255) << sh
            out.append(res)
    return out


def delta(t, c):
    def s8(v):
        return v - 256 if v >= 128 else v
    return (s8(t) * s8(c)) >> 5


def forward_color(pix, w, h, bits, ctes, tw):
    out = []
    for y in range(h):
        for x in range(w):
            g2r, g2b, r2b = ctes[(y >> bits) * tw + (x >> bits)]
            p = pix[y * w + x]
            a, r, g, b = (p >> 24) & 255, (p >> 16) & 255, \
                (p >> 8) & 255, p & 255
            nr = (r - delta(g2r, g)) & 255
            nb = (b - delta(g2b, g) - delta(r2b, r)) & 255
            out.append((a << 24) | (nr << 16) | (g << 8) | nb)
    return out


def main():
    print("hashA =", dhash(pixA, W, H))

    # A: literal-only
    vA = webp(vp8l(W, H, lambda bw: encode_image_stream(
        bw, pixA, W, H, level0=True)))
    print('val vLit = "%s"' % vA.hex())

    # B: subtract-green (residual r-g, b-g)
    resB = [(p & 0xFF00FF00) |
            (((((p >> 16) & 255) - ((p >> 8) & 255)) & 255) << 16) |
            (((p & 255) - ((p >> 8) & 255)) & 255) for p in pixA]
    vB = webp(vp8l(W, H, lambda bw: encode_image_stream(
        bw, resB, W, H, level0=True, transforms=[("subgreen",)])))
    print('val vSubGreen = "%s"' % vB.hex())

    # C: predictor, block 4 (bits=2), ALL 14 modes across the 4x4 grid
    bits = 2
    mw = (W + 3) >> 2
    modes = [(i % 14) for i in range(mw * ((H + 3) >> 2))]
    resC = forward_predictor(pixA, W, H, bits, modes, mw)
    sub = [0xFF000000 | (m << 8) for m in modes]
    vC = webp(vp8l(W, H, lambda bw: encode_image_stream(
        bw, resC, W, H, level0=True, transforms=[("pred", bits, sub)])))
    print('val vPredictor = "%s"' % vC.hex())

    # D: cross-color on an RGB pattern
    pixD = [0xFF000000 | ((A(x, y) << 16)) |
            (((A(x, y) * 3) % 256) << 8) | ((A(x, y) * 7) % 256)
            for y in range(H) for x in range(W)]
    tw = (W + 3) >> 2
    ctes = [((17 + i) % 256, (256 - 9 + i) % 256, (5 + 3 * i) % 256)
            for i in range(tw * ((H + 3) >> 2))]
    resD = forward_color(pixD, W, H, 2, ctes, tw)
    subD = [0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
            for (g2r, g2b, r2b) in ctes]
    vD = webp(vp8l(W, H, lambda bw: encode_image_stream(
        bw, resD, W, H, level0=True, transforms=[("color", 2, subD)])))
    print("hashD =", dhash(pixD, W, H))
    print('val vColor = "%s"' % vD.hex())

    # E: palette, 17 colors (no bundling)
    palE = [0xFF000000 | ((i * 11 % 256) << 16) | ((i * 29 % 256) << 8) |
            (i * 53 % 256) for i in range(17)]
    idxE = [(x + y) % 17 for y in range(H) for x in range(W)]
    pixE = [palE[i] for i in idxE]
    deltaPal = [palE[0]] + [
        tuple_sub(palE[i], palE[i - 1]) for i in range(1, 17)]
    resE = [0xFF000000 | (i << 8) for i in idxE]
    # palette entries are delta-coded pixels of a w=17 h=1 image
    vE = webp(vp8l(W, H, lambda bw: encode_image_stream(
        bw, [p & 0xFFFFFFFF for p in resE], W, H, level0=True,
        transforms=[("palette", deltaPal)])))
    print("hashE =", dhash(pixE, W, H))
    print('val vPalette = "%s"' % vE.hex())

    # F: palette 5 colors, bundling widthBits=1 (2 px/byte)
    palF = [0xFF000000, 0xFF4080C0, 0xFF206010, 0xFFB0B0B0, 0xFF805020]
    idxF = [(x * 3 + y) % 5 for y in range(H) for x in range(W)]
    pixF = [palF[i] for i in idxF]
    deltaF = [palF[0]] + [tuple_sub(palF[i], palF[i - 1])
                          for i in range(1, 5)]
    effW = (W + 1) >> 1
    packed = []
    for y in range(H):
        for px in range(effW):
            g = 0
            for k in range(2):
                x = px * 2 + k
                if x < W:
                    g |= idxF[y * W + x] << (4 * k)
            packed.append(0xFF000000 | (g << 8))
    vF = webp(vp8l(W, H, lambda bw: encode_image_stream(
        bw, packed, W, H, level0=True, transforms=[("palette", deltaF)])))
    print("hashF =", dhash(pixF, W, H))
    print('val vBundled = "%s"' % vF.hex())

    # G: LZ77 copies (plane-coded AND raw-coded dist 16) + cache hit
    ops = []
    for x in range(W - 1):
        ops.append((0, ("lit", pixA[x])))
    # pixel 15 repeats pixel 0 via a color-cache hit
    opsPixels = pixA[:15] + [pixA[0]]
    ops.append((0, ("cache", pixA[0])))
    # rows 1..8: length 128, distance 16 as PLANE code (0,1) -> value 1
    ops.append((0, ("copy", 128, 1)))
    # rows 9..15: length 112, distance 16 RAW-coded -> value 16+120
    ops.append((0, ("copy", 112, 136)))
    pixG = opsPixels * 16
    vG = webp(vp8l(W, H, lambda bw: encode_image_stream(
        bw, None, W, H, level0=True, cache_bits=7, ops=ops)))
    print("hashG =", dhash(pixG, W, H))
    print('val vLz77 = "%s"' % vG.hex())

    # H: meta prefix, 2 groups (block 8): group layout [[0,1],[1,0]]
    metaBits = 3
    metaPix = [0xFF000000 | (g << 8)
               for g in (0, 1, 1, 0)]
    opsH = []
    for y in range(H):
        for x in range(W):
            g = (0, 1, 1, 0)[(y >> 3) * 2 + (x >> 3)]
            v = A(x, y) if g == 0 else (A(x, y) + 97) % 256
            opsH.append((g, ("lit", gray(v))))
    pixH = [gray(A(x, y) if (0, 1, 1, 0)[(y >> 3) * 2 + (x >> 3)] == 0
                 else (A(x, y) + 97) % 256)
            for y in range(H) for x in range(W)]
    vH = webp(vp8l(W, H, lambda bw: encode_image_stream(
        bw, None, W, H, level0=True,
        meta=(metaBits, metaPix, 2, 2), ops=opsH)))
    print("hashH =", dhash(pixH, W, H))
    print('val vMeta = "%s"' % vH.hex())

    # I: VP8X-wrapped literal image (extended container)
    vI = riff([(b"VP8X", bytes([0, 0, 0, 0]) +
                (W - 1).to_bytes(3, "little") +
                (H - 1).to_bytes(3, "little")),
               (b"VP8L", vp8l(W, H, lambda bw: encode_image_stream(
                   bw, pixA, W, H, level0=True)))])
    print('val vVp8x = "%s"' % vI.hex())

    # J: lossy refusal
    vJ = riff([(b"VP8 ", b"\x00" * 32)])
    print('val vLossy = "%s"' % vJ.hex())


def tuple_sub(a, b):
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((a >> sh) & 255) - ((b >> sh) & 255)) & 255) << sh
    return out


if __name__ == "__main__":
    sys.exit(main())
