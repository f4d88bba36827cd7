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
