package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Multimodal

class TarEntriesSpec extends SparkSpec {
  import spark.implicits._

  /** Reference ustar writer: proper NUL-padded fields + the
    * spaces-for-checksum rule. */
  private def tarOf(entries: (String, Array[Byte], Char)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    for ((name, data, tf) <- entries) {
      val h = new Array[Byte](512)
      def put(off: Int, s: String): Unit =
        System.arraycopy(s.getBytes("UTF-8"), 0, h, off, s.length)
      put(0, name)
      put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
      put(124, f"${data.length.toLong.toOctalString}%11s".replace(' ', '0') + " ")
      put(136, "00000000000 ")
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      h(156) = tf.toByte
      put(257, "ustar"); put(263, "00")
      val sum = h.map(_ & 0xff).sum
      put(148, f"${sum.toOctalString}%6s".replace(' ', '0'))
      h(154) = 0; h(155) = ' '.toByte
      bos.write(h)
      bos.write(data)
      val pad = (512 - data.length % 512) % 512
      bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](1024))
    bos.toByteArray
  }

  test("tar_entries: names, offsets, sizes, typeflags in order; substr " +
    "extraction round-trips; dir entries flagged") {
    val tar = tarOf(
      ("src/", Array.empty[Byte], '5'),
      ("src/a.py", "print(1)\n".getBytes, '0'),
      ("notes.txt", ("x" * 700).getBytes, '0'))
    val df = Seq((1L, tar)).toDF("doc_id", "payload")
    val rows = Multimodal.tarList(df).orderBy("entry_idx").collect()
    assert(rows.map(r => (r.getString(2), r.getLong(4), r.getString(5))).toSeq
      == Seq(("src/", 0L, "5"), ("src/a.py", 9L, "0"),
        ("notes.txt", 700L, "0")))
    // offsets: dir data at 512 (empty), a.py at 1024, notes at 2048
    // (a.py's 9 bytes pad to one block)
    assert(rows.map(_.getLong(3)).toSeq == Seq(512L, 1024L, 2048L))
    val txt = Multimodal.tarMemberText(df, "src/a.py").collect()
    assert(txt.length == 1 && txt(0).getString(1) == "print(1)\n")
  }

  test("tar_entries: POSIX ustar split paths (prefix+name) join with '/' — " +
    "the bsdtar/python-tarfile ustar-mode long-name form") {
    // like tarOf but with the 155-byte prefix field at 345 populated
    def tarSplit(prefix: String, name: String,
                 data: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val h = new Array[Byte](512)
      def put(off: Int, s: String): Unit =
        System.arraycopy(s.getBytes("UTF-8"), 0, h, off, s.length)
      put(0, name)
      put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
      put(124, f"${data.length.toLong.toOctalString}%11s".replace(' ', '0') + " ")
      put(136, "00000000000 ")
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      h(156) = '0'.toByte
      put(257, "ustar"); put(263, "00")
      put(345, prefix)
      val sum = h.map(_ & 0xff).sum
      put(148, f"${sum.toOctalString}%6s".replace(' ', '0'))
      h(154) = 0; h(155) = ' '.toByte
      bos.write(h)
      bos.write(data)
      bos.write(new Array[Byte]((512 - data.length % 512) % 512))
      bos.write(new Array[Byte](1024))
      bos.toByteArray
    }
    val prefix = "long/project/tree/" + ("p" * 80)
    val tar = tarSplit(prefix, "module/file.py", "split\n".getBytes)
    val got = TarEntries.compute(tar, 64)
    assert(got != null && got.numElements() == 1)
    assert(got.getStruct(0, 4).getUTF8String(0).toString
      == prefix + "/module/file.py")
  }

  test("tar_entries: the prefix field is honored ONLY under the exact " +
    "POSIX magic+version (ustar\\0 + 00) — GNU 'ustar  ' headers reuse " +
    "that region for atime/ctime in oldgnu incremental archives") {
    def tarMagic(magic8: Array[Byte], prefixRegion: String,
                 name: String, data: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val h = new Array[Byte](512)
      def put(off: Int, s: String): Unit =
        System.arraycopy(s.getBytes("UTF-8"), 0, h, off, s.length)
      put(0, name)
      put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
      put(124, f"${data.length.toLong.toOctalString}%11s".replace(' ', '0') + " ")
      put(136, "00000000000 ")
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      h(156) = '0'.toByte
      System.arraycopy(magic8, 0, h, 257, 8)
      put(345, prefixRegion)
      val sum = h.map(_ & 0xff).sum
      put(148, f"${sum.toOctalString}%6s".replace(' ', '0'))
      h(154) = 0; h(155) = ' '.toByte
      bos.write(h)
      bos.write(data)
      bos.write(new Array[Byte]((512 - data.length % 512) % 512))
      bos.write(new Array[Byte](1024))
      bos.toByteArray
    }
    val posixMagic = "ustar".getBytes("UTF-8") ++
      Array[Byte](0, '0'.toByte, '0'.toByte)
    val gnuMagic = "ustar  ".getBytes("UTF-8") ++ Array[Byte](0)
    // oldgnu incremental: atime octal squats in the prefix region
    val atimeJunk = "13737546361 "
    val gnu = TarEntries.compute(
      tarMagic(gnuMagic, atimeJunk, "file.txt", "g\n".getBytes), 64)
    assert(gnu != null && gnu.numElements() == 1)
    assert(gnu.getStruct(0, 4).getUTF8String(0).toString == "file.txt",
      "GNU magic must not join the atime bytes as a path prefix")
    val posix = TarEntries.compute(
      tarMagic(posixMagic, "real/prefix", "file.txt", "p\n".getBytes), 64)
    assert(posix != null && posix.getStruct(0, 4).getUTF8String(0).toString
      == "real/prefix/file.txt")
  }

  test("tar_entries: GNU 'L' long-name record renames the NEXT entry and " +
    "never surfaces itself") {
    val longName = "very/deep/source/tree/" + ("x" * 90) + "/file.py"
    assert(longName.length > 100)
    val tar = tarOf(
      ("././@LongLink", (longName + "\u0000").getBytes("UTF-8"), 'L'),
      ("very/deep/source/tree/truncated", "code\n".getBytes, '0'),
      ("short.txt", "s".getBytes, '0'))
    val got = TarEntries.compute(tar, 64)
    assert(got.numElements() == 2, "the L record itself is hidden")
    val names = (0 until 2).map(i =>
      got.getStruct(i, 4).getUTF8String(0).toString)
    assert(names == Seq(longName, "short.txt"))
    // extraction still works through the operator path
    import spark.implicits._
    val txt = graft.ext.Multimodal.tarMemberText(
      Seq((1L, tar)).toDF("doc_id", "payload"), longName).collect()
    assert(txt.length == 1 && txt(0).getString(1) == "code\n")
  }

  test("tar_entries: PAX 'x' path record renames the next entry; malformed " +
    "records fail the archive; tarFileTexts slices every regular file") {
    val longPath = "pax/resolved/" + ("y" * 95) + ".txt"
    val rec = {
      val body = s" path=$longPath\n"
      // the length prefix counts ITSELF — solve the fixpoint
      var l = body.length + 1
      while (l.toString.length + body.length != l) l += 1
      s"$l$body"
    }
    val tar = tarOf(
      ("PaxHeaders/f", rec.getBytes("UTF-8"), 'x'),
      ("pax/resolved/truncated", "pax body".getBytes, '0'),
      ("plain.txt", "p".getBytes, '0'))
    val got = TarEntries.compute(tar, 64)
    assert(got.numElements() == 2)
    assert(got.getStruct(0, 4).getUTF8String(0).toString == longPath)
    // malformed PAX record (bad length prefix) kills the archive
    val bad = tarOf(("PaxHeaders/f", "zz path=x\n".getBytes, 'x'),
      ("a", "b".getBytes, '0'))
    assert(TarEntries.compute(bad, 64) == null)
    // PAX lengths count BYTES: a multibyte UTF-8 path must resolve
    val uniPath = "répertoire/ünïcode/文件.txt"
    val uniBody = s" path=$uniPath\n".getBytes("UTF-8")
    var ul = uniBody.length + 1
    while (ul.toString.length + uniBody.length != ul) ul += 1
    val uniRec = ul.toString.getBytes("UTF-8") ++ uniBody
    val uniTar = tarOf(("PaxHeaders/u", uniRec, 'x'),
      ("short", "u".getBytes, '0'))
    val uout = TarEntries.compute(uniTar, 64)
    assert(uout != null &&
      uout.getStruct(0, 4).getUTF8String(0).toString == uniPath)
    // tarFileTexts: every regular file, resolved names, sliced text
    import spark.implicits._
    val rows = graft.ext.Multimodal.tarFileTexts(
        Seq((1L, tar)).toDF("doc_id", "payload"))
      .orderBy("name").collect()
      .map(r => (r.getString(1), r.getString(3)))
    assert(rows.toSeq == Seq(longPath -> "pax body", "plain.txt" -> "p"))
  }

  test("documentText routes tar: regular members' text newline-joined; " +
    "directories skipped; a corrupted checksum nulls") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = tarOf(
      ("docs/", Array.emptyByteArray, '5'),
      ("a.txt", "tar text a".getBytes("UTF-8"), '0'),
      ("b/c.txt", "tar text c".getBytes("UTF-8"), '0'))
    val bad = t.clone()
    bad(150) = (bad(150) ^ 1).toByte // inside the first checksum field
    val dt = graft.ext.Multimodal.documentText(
      Seq((1L, t), (2L, bad)).toDF("doc_id", "payload"))
      .orderBy("doc_id").collect()
    assert(dt(0).getString(1) == "tar" &&
      dt(0).getString(2) == "tar text a\n\ntar text c")
    assert(dt(1).isNullAt(2))
  }

  test("tar_entries fails closed: bad checksum, truncated data, trailing junk; " +
    "empty archive (pure terminator) yields zero entries") {
    val tar = tarOf(("f.txt", "data".getBytes, '0'))
    assert(TarEntries.compute(tar, 64) != null)
    val badChk = tar.clone(); badChk(148) = '7'
    assert(TarEntries.compute(badChk, 64) == null)
    // truncate inside the data padding
    assert(TarEntries.compute(tar.take(600), 64) == null)
    // junk after the TERMINATOR is blocking-factor padding: ignored
    assert(TarEntries.compute(tar ++ "junk".getBytes, 64).numElements() == 1)
    // junk where the terminator should be: rejected
    assert(TarEntries.compute(
      tar.dropRight(1024) ++ "junk".getBytes, 64) == null)
    // walk bound
    assert(TarEntries.compute(tar, 1) != null)
    val two = tarOf(("a", "1".getBytes, '0'), ("b", "2".getBytes, '0'))
    assert(TarEntries.compute(two, 1) == null)
    // a bare terminator is a valid empty archive
    assert(TarEntries.compute(new Array[Byte](1024), 64).numElements() == 0)
  }
}
