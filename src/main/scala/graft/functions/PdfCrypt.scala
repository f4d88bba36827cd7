package graft.functions

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.security.MessageDigest

/** PDF Standard security handler (public spec: ISO 32000-1 §7.6.3,
  * ISO 32000-2 §7.6.4) — EMPTY-user-password decryption for the
  * crawl-dominant case: documents "protected" with an owner password
  * only, which readers are expected to open and display. Supports
  * revision 2 (RC4-40), 3 (RC4 40–128), 4 (`/CF` crypt filters:
  * `/V2` RC4, `/AESV2` AES-128-CBC, `/None`), the deprecated interim
  * revision 5 and the ISO revision 6 (`/AESV3` AES-256-CBC with the
  * Algorithm-2.B iterated hash). All primitives are public-JDK
  * (`MessageDigest` MD5/SHA-2, `javax.crypto` AES/CBC); RC4 is the
  * textbook KSA/PRGA, implemented inline.
  *
  * A document whose `/U` entry does NOT authenticate the empty
  * password is genuinely user-password-protected; that and every
  * unsupported shape (non-/Standard handlers, V 0/3, malformed
  * O/U/ID) returns [[PdfCrypt.Locked]]: the caller reports the
  * document as encrypted with nothing decoded — never guessed text.
  *
  * Bound (documented): the `/Encrypt` dict is located by a balanced
  * `<< >>` scan, so an O/U entry written as a RAW literal string
  * containing unescaped `<<`/`>>` bytes can truncate the dict and
  * fall to Locked (fail-closed). Hex strings — the common modern
  * writer shape — and escaped literals parse exactly.
  *
  * Reference behavior anchor: oracle-schema-copy streams documents
  * opaquely (`AbstractLoadRowsCallback.java:28`); text recovery from
  * protected PDFs has no reference counterpart and follows the
  * public spec alone. */
private[functions] object PdfCrypt {

  /** Outcome of [[build]]: `null` = not encrypted, [[Locked]] =
    * encrypted but undecryptable (refusal), [[Decryptor]] = ready. */
  sealed trait State

  /** Encrypted, cannot decrypt: password-protected or unsupported. */
  case object Locked extends State

  /** cfm: 0 = identity (V4 `/StmF /Identity` or `/CFM /None` —
    * streams are plaintext in an otherwise encrypted file), 1 = RC4
    * with the per-object MD5 key, 2 = AES-128-CBC with the per-object
    * MD5 key + sAlT, 3 = AES-256-CBC with the file key directly. */
  final class Decryptor(val cfm: Int, val key: Array[Byte])
      extends State {
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      cfm match {
        case 0 => data
        case 1 => rc4(objectKey(key, num, gen, aes = false), data)
        case 2 => aesCbc(objectKey(key, num, gen, aes = true), data)
        case 3 => aesCbc(key, data)
        case _ => null
      }
  }

  /** The 32-byte password pad (ISO 32000-1 Table 21 preamble). An
    * empty password padded is the pad itself. */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** Resolve the document's encryption state. `objDict` resolves a
    * top-level object number to its dict text (the encrypt dict shall
    * not live inside an ObjStm — it is needed before stream decode).
    * Returns `null` when no valid `/Encrypt N G R` (or inline dict)
    * reference exists — the caller's cheap `contains` gate may
    * false-positive on plaintext content bytes, which must NOT lock
    * out an unencrypted file. */
  def build(doc: String, objDict: Int => String): State = {
    try {
      var at = doc.lastIndexOf("/Encrypt")
      while (at >= 0) {
        val after = at + 8
        if (after >= doc.length ||
          !PdfTextExtract.isRegular(doc.charAt(after))) {
          val dict = encryptDictAt(doc, after, objDict)
          if (dict != null) return buildFromDict(doc, dict)
        }
        at = doc.lastIndexOf("/Encrypt", at - 1)
      }
      null
    } catch {
      case _: RuntimeException => Locked // malformed encrypted shape
    }
  }

  /** The encrypt dict's text: inline `<< … >>` or via `N G R`. */
  private def encryptDictAt(doc: String, after: Int,
                            objDict: Int => String): String = {
    var i = after
    while (i < doc.length && doc.charAt(i).isWhitespace) i += 1
    if (i + 1 < doc.length && doc.charAt(i) == '<' &&
      doc.charAt(i + 1) == '<')
      return doc.substring(i, PdfTextExtract.dictEndFrom(doc, i, doc.length))
    val num = PdfTextExtract.refAt(doc, after)
    if (num < 0) return null
    objDict(num)
  }

  private def buildFromDict(doc: String, dict: String): State = {
    // only the Standard (password) handler is implemented
    val fAt = PdfTextExtract.keyValueAt(dict, "/Filter")
    if (fAt < 0 || !nameAt(dict, fAt).contains("Standard")) return Locked
    val v = intAt(dict, "/V", 0)
    val r = intAt(dict, "/R", 0)
    val o = stringAt(dict, "/O")
    val u = stringAt(dict, "/U")
    if (o == null || u == null) return Locked
    val p = signedIntAt(dict, "/P")
    val encryptMetadata = boolAt(dict, "/EncryptMetadata", default = true)
    // stream crypt method: V<4 is the whole-document RC4; V4/V5 route
    // through /StmF (DEFAULT /Identity per spec) into the /CF dict
    val cfm: Int =
      if (v == 1 || v == 2) 1
      else if (v == 4 || v == 5) {
        val stmf = PdfTextExtract.keyValueAt(dict, "/StmF") match {
          case -1 => "Identity"
          case a => nameAt(dict, a).getOrElse(return Locked)
        }
        if (stmf == "Identity") 0
        else {
          // one named crypt filter (the universal writer shape):
          // its /CFM decides the algorithm
          PdfTextExtract.keyValueAt(dict, "/CFM") match {
            case -1 => return Locked
            case a => nameAt(dict, a) match {
              case Some("None") => 0
              case Some("V2") => 1
              case Some("AESV2") => 2
              case Some("AESV3") => 3
              case _ => return Locked
            }
          }
        }
      } else return Locked // V 0 (undocumented) / V 3 (unpublished)
    if (v == 5) {
      if (r != 5 && r != 6) return Locked
      if (u.length < 48) return Locked
      val uHash = u.slice(0, 32)
      val vSalt = u.slice(32, 40)
      val kSalt = u.slice(40, 48)
      val check =
        if (r == 6) hash2B(Array.empty, vSalt, Array.empty)
        else sha("SHA-256", vSalt) // R5: SHA-256(pw ++ vSalt), pw empty
      if (!java.util.Arrays.equals(check, uHash)) return Locked
      val ue = stringAt(dict, "/UE")
      if (ue == null || ue.length < 32) return Locked
      val ik =
        if (r == 6) hash2B(Array.empty, kSalt, Array.empty)
        else sha("SHA-256", kSalt)
      val fileKey = aesNoPad(ik, new Array[Byte](16), ue.take(32),
        encryptMode = false)
      if (fileKey == null) return Locked
      if (cfm != 3 && cfm != 0) return Locked // V5 pairs with AESV3 only
      new Decryptor(cfm, fileKey)
    } else {
      if (r != 2 && r != 3 && r != 4) return Locked
      if (o.length < 32 || u.length < 32) return Locked
      val bits = intAt(dict, "/Length", 40)
      val n =
        if (v == 1 || r == 2) 5
        else if (cfm == 2) 16 // AESV2 is 128-bit by definition
        else if (bits >= 40 && bits <= 128 && bits % 8 == 0) bits / 8
        else return Locked
      val key = legacyKey(o.take(32), p, docId0(doc), r, n, encryptMetadata)
      // Algorithm 6: authenticate the empty user password via /U
      val ok =
        if (r == 2) java.util.Arrays.equals(rc4(key, Pad), u.take(32))
        else {
          var x = md5(Pad, docId0(doc))
          x = rc4(key, x)
          var i = 1
          while (i <= 19) {
            val ki = key.map(b => (b ^ i).toByte)
            x = rc4(ki, x)
            i += 1
          }
          java.util.Arrays.equals(x, u.take(16))
        }
      if (!ok) return Locked
      new Decryptor(cfm, key)
    }
  }

  /** Algorithm 2: the legacy (R2–4) file key for the EMPTY user
    * password. `P` enters as a signed 32-bit little-endian value. */
  private def legacyKey(o32: Array[Byte], p: Long, id0: Array[Byte],
                        r: Int, n: Int,
                        encryptMetadata: Boolean): Array[Byte] = {
    val pw = Pad // empty password padded
    val pLe = Array[Byte](
      (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)
    val tail =
      if (r >= 4 && !encryptMetadata)
        Array[Byte](-1, -1, -1, -1)
      else Array.empty[Byte]
    var h = md5(pw, o32, pLe, id0, tail)
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h.take(n)); i += 1 }
    }
    h.take(n)
  }

  /** First element of the trailer `/ID` array (empty when absent —
    * legal for unencrypted files, tolerated by readers here too). */
  private def docId0(doc: String): Array[Byte] = {
    var at = doc.lastIndexOf("/ID")
    while (at >= 0) {
      val after = at + 3
      if (after < doc.length && !PdfTextExtract.isRegular(doc.charAt(after))) {
        var i = after
        while (i < doc.length && doc.charAt(i).isWhitespace) i += 1
        if (i < doc.length && doc.charAt(i) == '[') {
          i += 1
          while (i < doc.length && doc.charAt(i).isWhitespace) i += 1
          if (i < doc.length && doc.charAt(i) == '<')
            return PdfTextExtract.parseHex(doc, i, doc.length)._1
              .getBytes(ISO_8859_1)
          if (i < doc.length && doc.charAt(i) == '(')
            return PdfTextExtract.parseLiteral(doc, i, doc.length)._1
              .getBytes(ISO_8859_1)
        }
      }
      at = doc.lastIndexOf("/ID", at - 1)
    }
    Array.empty
  }

  /** ISO 32000-2 Algorithm 2.B: the R6 iterated hash. With the empty
    * user password every AES input length is a block multiple. */
  private[functions] def hash2B(pw: Array[Byte], salt: Array[Byte],
                                udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", pw, salt, udata)
    var round = 0
    var lastByte = 0x100
    while (round < 64 || lastByte > round - 32) {
      val block = pw ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(block, 0, k1, i * block.length, block.length)
        i += 1
      }
      val e = aesNoPad(k.take(16), k.slice(16, 32), k1, encryptMode = true)
      if (e == null) return new Array[Byte](32) // cannot happen: sizes fit
      var sum = 0
      i = 0
      while (i < 16) { sum += e(i) & 0xff; i += 1 }
      k = (sum % 3) match {
        case 0 => sha("SHA-256", e)
        case 1 => sha("SHA-384", e)
        case _ => sha("SHA-512", e)
      }
      lastByte = e(e.length - 1) & 0xff
      round += 1
    }
    k.take(32)
  }

  /** Algorithm 1 per-object key: MD5 of key ++ objnum(le24) ++
    * gen(le16) ++ (AES: the sAlT constant), truncated. */
  private def objectKey(key: Array[Byte], num: Int, gen: Int,
                        aes: Boolean): Array[Byte] = {
    val ext = Array[Byte](
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    val salt =
      if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54)
      else Array.empty[Byte]
    md5(key, ext, salt).take(math.min(key.length + 5, 16))
  }

  /** Textbook RC4 (KSA + PRGA). */
  private[functions] def rc4(key: Array[Byte],
                             data: Array[Byte]): Array[Byte] = {
    val s = new Array[Int](256)
    var i = 0
    while (i < 256) { s(i) = i; i += 1 }
    var j = 0
    i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
    i = 0
    while (i < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(i) = (data(i) ^ s((s(x) + s(y)) & 0xff)).toByte
      i += 1
    }
    out
  }

  /** AES-CBC with the PDF stream shape: 16-byte IV prefix, PKCS#7
    * padding stripped after decrypt. Null on any malformed length or
    * padding — the caller counts the skip. */
  private def aesCbc(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || data.length % 16 != 0) return null
    val plain = aesNoPad(key, data.take(16), data.drop(16),
      encryptMode = false)
    if (plain == null) return null
    val padLen = plain(plain.length - 1) & 0xff
    if (padLen < 1 || padLen > 16 || padLen > plain.length) return null
    java.util.Arrays.copyOf(plain, plain.length - padLen)
  }

  private def aesNoPad(key: Array[Byte], iv: Array[Byte],
                       data: Array[Byte],
                       encryptMode: Boolean): Array[Byte] = {
    try {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(
        if (encryptMode) javax.crypto.Cipher.ENCRYPT_MODE
        else javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      c.doFinal(data)
    } catch {
      case _: java.security.GeneralSecurityException => null
    }
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  // ---- small dict readers over the encrypt dict's text ----

  /** Name token at value position `at`: `Some("AESV2")` etc. */
  private def nameAt(dict: String, at: Int): Option[String] = {
    var i = at
    while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
    if (i >= dict.length || dict.charAt(i) != '/') return None
    i += 1
    val s = i
    while (i < dict.length && PdfTextExtract.isRegular(dict.charAt(i)))
      i += 1
    if (i == s) None else Some(dict.substring(s, i))
  }

  private def intAt(dict: String, key: String, default: Int): Int = {
    val at = PdfTextExtract.keyValueAt(dict, key)
    if (at < 0) return default
    var i = at
    while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
    val s = i
    while (i < dict.length && dict.charAt(i).isDigit) i += 1
    if (i == s || i - s > 8) default
    else Integer.parseInt(dict.substring(s, i))
  }

  /** Signed integer value (the `/P` permissions word is negative in
    * practically every real file). 0 when absent/malformed. */
  private def signedIntAt(dict: String, key: String): Long = {
    val at = PdfTextExtract.keyValueAt(dict, key)
    if (at < 0) return 0L
    var i = at
    while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
    var sign = 1L
    if (i < dict.length && dict.charAt(i) == '-') { sign = -1L; i += 1 }
    else if (i < dict.length && dict.charAt(i) == '+') i += 1
    val s = i
    while (i < dict.length && dict.charAt(i).isDigit) i += 1
    if (i == s || i - s > 11) 0L
    else sign * java.lang.Long.parseLong(dict.substring(s, i))
  }

  private def boolAt(dict: String, key: String, default: Boolean): Boolean = {
    val at = PdfTextExtract.keyValueAt(dict, key)
    if (at < 0) return default
    var i = at
    while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
    if (dict.startsWith("true", i)) true
    else if (dict.startsWith("false", i)) false
    else default
  }

  /** PDF string value (literal or hex) after `/Key`, as raw bytes. */
  private def stringAt(dict: String, key: String): Array[Byte] = {
    val at = PdfTextExtract.keyValueAt(dict, key)
    if (at < 0) return null
    var i = at
    while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
    if (i >= dict.length) return null
    val str =
      if (dict.charAt(i) == '(')
        PdfTextExtract.parseLiteral(dict, i, dict.length)._1
      else if (dict.charAt(i) == '<' &&
        (i + 1 >= dict.length || dict.charAt(i + 1) != '<'))
        PdfTextExtract.parseHex(dict, i, dict.length)._1
      else return null
    str.getBytes(ISO_8859_1)
  }
}
