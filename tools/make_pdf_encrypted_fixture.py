#!/usr/bin/env python3
"""Encrypted-PDF fixtures for PdfCrypt/PdfTextExtract.

Builds minimal single-page PDFs protected by the Standard security
handler with an EMPTY user password (the crawl-dominant owner-only
"protection"), one per supported scheme, plus a genuinely
user-password-protected file that must refuse:

  rc4_40    V1/R2  RC4 40-bit
  rc4_128   V2/R3  RC4 128-bit
  aes128    V4/R4  /CFM /AESV2 (content stream ALSO FlateDecode'd:
                   decrypt-then-inflate chain)
  aes256    V5/R6  /CFM /AESV3 (Algorithm 2.B iterated hash)
  aes256r5  V5/R5  deprecated interim scheme (unit-only)
  locked    V2/R3  user password "hunter2" -> Locked refusal
  identity  V4/R4  /StmF /Identity (encrypted file, plaintext streams)

The crypto here is an INDEPENDENT python implementation (hashlib MD5/
SHA-2, python RC4, `cryptography` AES) of the public ISO 32000
algorithms - the Scala side must round-trip against it, making the
fixture cross-engine, not self-referential.
"""
import hashlib
import zlib

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])

DOC_ID = bytes(range(0xA0, 0xB0))  # 16 fixed bytes


def md5(*parts):
    d = hashlib.md5()
    for p in parts:
        d.update(p)
    return d.digest()


def rc4(key, data):
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    x = y = 0
    for b in data:
        x = (x + 1) & 0xFF
        y = (y + s[x]) & 0xFF
        s[x], s[y] = s[y], s[x]
        out.append(b ^ s[(s[x] + s[y]) & 0xFF])
    return bytes(out)


def aes_cbc(key, iv, data, encrypt):
    c = Cipher(algorithms.AES(key), modes.CBC(iv))
    op = c.encryptor() if encrypt else c.decryptor()
    return op.update(data) + op.finalize()


def aes_ecb(key, data):
    c = Cipher(algorithms.AES(key), modes.ECB())
    op = c.encryptor()
    return op.update(data) + op.finalize()


def pad_pw(pw):
    return (pw + PAD)[:32]


def compute_o(owner_pw, user_pw, r, n):
    """Algorithm 3: the /O entry."""
    h = md5(pad_pw(owner_pw))
    if r >= 3:
        for _ in range(50):
            h = md5(h)
    okey = h[:n]
    x = rc4(okey, pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            x = rc4(bytes(b ^ i for b in okey), x)
    return x


def file_key(user_pw, o, p, doc_id, r, n, v4_no_meta=False):
    """Algorithm 2: the legacy file key."""
    p_le = (p & 0xFFFFFFFF).to_bytes(4, "little")
    tail = b"\xff\xff\xff\xff" if v4_no_meta else b""
    h = md5(pad_pw(user_pw), o, p_le, doc_id, tail)
    if r >= 3:
        for _ in range(50):
            h = md5(h[:n])
    return h[:n]


def compute_u(key, doc_id, r):
    """Algorithms 4/5: the /U entry."""
    if r == 2:
        return rc4(key, PAD)
    x = md5(PAD, doc_id)
    x = rc4(key, x)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in key), x)
    return x + b"\x00" * 16  # 16 arbitrary padding bytes


def obj_key(key, num, gen, aes):
    ext = num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    salt = b"sAlT" if aes else b""
    return md5(key, ext, salt)[: min(len(key) + 5, 16)]


def hash_2b(pw, salt, udata):
    """ISO 32000-2 Algorithm 2.B (R6)."""
    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc(k[:16], k[16:32], k1, encrypt=True)
        mod = sum(e[:16]) % 3
        k = [hashlib.sha256, hashlib.sha384, hashlib.sha512][mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def pkcs7(data):
    n = 16 - len(data) % 16
    return data + bytes([n]) * n


def build_pdf(variant):
    """Returns (pdf_bytes, expected_text)."""
    owner_pw, user_pw = b"owner", b""
    p = -44  # print+copy denied, the common owner-lock shape
    enc_extra = b""

    if variant == "rc4_40":
        text, v, r, n, cfm = "Secret forty bit stream", 1, 2, 5, "rc4"
    elif variant == "rc4_128":
        text, v, r, n, cfm = "Secret RC4 one two eight", 2, 3, 16, "rc4"
    elif variant == "aes128":
        text, v, r, n, cfm = "Secret AES via crypt filter", 4, 4, 16, "aes"
    elif variant == "identity":
        text, v, r, n, cfm = "Plain streams in a locked shell", 4, 4, 16, "id"
    elif variant == "locked":
        text, v, r, n, cfm = "You cannot read this", 2, 3, 16, "rc4"
        user_pw = b"hunter2"
    elif variant in ("aes256", "aes256r5"):
        return build_pdf_v5(variant)
    else:
        raise ValueError(variant)

    content = f"BT /F1 12 Tf ({text}) Tj ET".encode()
    use_flate = variant == "aes128"
    if use_flate:
        body0 = zlib.compress(content)
    else:
        body0 = content

    o_entry = compute_o(owner_pw, user_pw, r, n)
    key = file_key(user_pw, o_entry, p, DOC_ID, r, n)
    u_entry = compute_u(key, DOC_ID, r)

    if cfm == "rc4":
        body = rc4(obj_key(key, 4, 0, aes=False), body0)
    elif cfm == "aes":
        iv = bytes(range(0x50, 0x60))
        body = iv + aes_cbc(obj_key(key, 4, 0, aes=True), iv,
                            pkcs7(body0), encrypt=True)
    else:  # identity: streams stay plaintext
        body = body0

    enc = [b"/Filter /Standard", f"/V {v}".encode(), f"/R {r}".encode(),
           f"/Length {n * 8}".encode(), f"/P {p}".encode(),
           b"/O <" + o_entry.hex().encode() + b">",
           b"/U <" + u_entry.hex().encode() + b">"]
    if v == 4:
        m = b"/V2" if cfm == "rc4" else (
            b"/AESV2" if cfm == "aes" else b"/None")
        if cfm == "id":
            enc.append(b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                       b" /StmF /Identity /StrF /Identity")
        else:
            enc.append(b"/CF << /StdCF << /CFM " + m +
                       b" /Length 16 >> >> /StmF /StdCF /StrF /StdCF")
    enc_dict = b"<< " + b" ".join(enc) + enc_extra + b" >>"
    expected = "" if variant == "locked" else text
    return assemble(body, use_flate, enc_dict), expected


def build_pdf_v5(variant):
    owner_pw = b"owner"
    p = -44
    text = ("Secret AES two five six" if variant == "aes256"
            else "Secret interim R5 scheme")
    r = 6 if variant == "aes256" else 5
    fkey = bytes(range(0x30, 0x50))  # 32-byte file key
    v_salt, k_salt = b"GRvsalt!", b"GRksalt!"

    def h(pw, salt, udata=b""):
        if r == 6:
            return hash_2b(pw, salt, udata)
        return hashlib.sha256(pw + salt + udata).digest()

    u_hash = h(b"", v_salt)
    u_entry = u_hash + v_salt + k_salt
    ik = h(b"", k_salt)
    ue = aes_cbc(ik, bytes(16), fkey, encrypt=True)
    ov_salt, ok_salt = b"GROvsal!", b"GROksal!"
    o_hash = h(owner_pw, ov_salt, u_entry)
    o_entry = o_hash + ov_salt + ok_salt
    oe = aes_cbc(h(owner_pw, ok_salt, u_entry), bytes(16), fkey,
                 encrypt=True)
    perms = aes_ecb(fkey, (p & 0xFFFFFFFF).to_bytes(4, "little") +
                    b"\xff\xff\xff\xffTadb" + bytes(4))

    content = f"BT /F1 12 Tf ({text}) Tj ET".encode()
    iv = bytes(range(0x60, 0x70))
    body = iv + aes_cbc(fkey, iv, pkcs7(content), encrypt=True)

    enc_dict = (b"<< /Filter /Standard /V 5 /R " + str(r).encode() +
                b" /Length 256 /CF << /StdCF << /CFM /AESV3 /Length 32"
                b" >> >> /StmF /StdCF /StrF /StdCF" +
                f" /P {p}".encode() +
                b" /O <" + o_entry.hex().encode() + b">" +
                b" /U <" + u_entry.hex().encode() + b">" +
                b" /OE <" + oe.hex().encode() + b">" +
                b" /UE <" + ue.hex().encode() + b">" +
                b" /Perms <" + perms.hex().encode() + b"> >>")
    return assemble(body, False, enc_dict), text


def assemble(stream_body, use_flate, enc_dict):
    objs = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs.append(b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    filt = b" /Filter /FlateDecode" if use_flate else b""
    objs.append(b"<< /Length " + str(len(stream_body)).encode() + filt +
                b" >>\nstream\n" + stream_body + b"\nendstream")
    objs.append(enc_dict)

    out = bytearray(b"%PDF-1.6\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj ".encode() + o + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    idh = DOC_ID.hex().encode()
    out += (b"trailer << /Size " + str(len(objs) + 1).encode() +
            b" /Root 1 0 R /Encrypt 5 0 R /ID [<" + idh + b"> <" +
            idh + b">] >>\nstartxref\n" + str(xref_at).encode() +
            b"\n%%EOF")
    return bytes(out)


def main():
    variants = ["rc4_40", "rc4_128", "aes128", "aes256", "aes256r5",
                "identity", "locked"]
    for v in variants:
        pdf, expected = build_pdf(v)
        print(f"== {v} ({len(pdf)} bytes) expected={expected!r}")
        h = pdf.hex()
        for i in range(0, len(h), 76):
            print(h[i:i + 76])
        print()


if __name__ == "__main__":
    main()
