package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.commons.compress.archivers.ar.{ArArchiveEntry, ArArchiveOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.scalatest.funsuite.AnyFunSuite

/** [[ArEntries]] battery: REAL commons-compress archives (short and
  * BSD long names), a hand-built GNU `//` name table, the .deb shape,
  * refusals. */
class ArEntriesSpec extends AnyFunSuite {

  private def entries(b: Array[Byte]): Seq[(String, Long, Long)] = {
    val a = ArEntries.compute(b, 1 << 16)
    assert(a != null, "refused")
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 4)
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
    }
  }

  private def ccArchive(longMode: Int,
                        members: (String, Array[Byte])*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ar = new ArArchiveOutputStream(bos)
    ar.setLongFileMode(longMode)
    for ((name, data) <- members) {
      ar.putArchiveEntry(new ArArchiveEntry(name, data.length, 0, 0,
        33188, 1700000000L))
      ar.write(data)
      ar.closeArchiveEntry()
    }
    ar.close()
    bos.toByteArray
  }

  test("commons-compress round-trip: short names, data slices, " +
    "even-padding, mtime") {
    val b = ccArchive(ArArchiveOutputStream.LONGFILE_ERROR,
      "hello.txt" -> "hi there\n".getBytes,
      "odd.bin" -> Array[Byte](1, 2, 3),
      "third" -> "x".getBytes)
    val es = entries(b)
    assert(es.map(_._1) == Seq("hello.txt", "odd.bin", "third"))
    for ((name, off, size) <- es) {
      val want = name match {
        case "hello.txt" => "hi there\n".getBytes.toSeq
        case "odd.bin" => Seq[Byte](1, 2, 3)
        case _ => "x".getBytes.toSeq
      }
      assert(b.slice(off.toInt, (off + size).toInt).toSeq == want, name)
    }
    val a = ArEntries.compute(b, 1 << 16)
    assert(a.getStruct(0, 4).getLong(3) == 1700000000L)
  }

  test("BSD #1/LEN long names: commons-compress output resolves, " +
    "offset/size exclude the inline name") {
    val long = "a-name-longer-than-sixteen-bytes.txt"
    val b = ccArchive(ArArchiveOutputStream.LONGFILE_BSD,
      long -> "payload".getBytes, "short" -> "q".getBytes)
    val es = entries(b)
    assert(es.map(_._1) == Seq(long, "short"))
    val (_, off, size) = es.head
    assert(size == 7L)
    assert(new String(b.slice(off.toInt, (off + size).toInt)) == "payload")
  }

  test("GNU // name table: /N references resolve, the table and the " +
    "/ symbol index never surface") {
    val names = "very-long-name-number-one.o/\nsecond-long-name.o/\n"
    def hdr(name: String, size: Int): Array[Byte] =
      ("%-16s%-12d%-6d%-6d%-8s%-10d`\n"
        .format(name, 1700000000L, 0, 0, "100644", size)).getBytes
    val sym = Array[Byte](0, 0, 0, 0)
    val tbl = names.getBytes
    val d1 = "obj-one".getBytes
    val d2 = "obj-two!".getBytes
    val b = "!<arch>\n".getBytes ++
      hdr("/", sym.length) ++ sym ++
      hdr("//", tbl.length) ++ tbl ++ "\n".getBytes ++ // 49 bytes: padded
      hdr("/0", d1.length) ++ d1 ++ "\n".getBytes ++
      hdr("/29", d2.length) ++ d2
    val es = entries(b)
    assert(es.map(_._1) ==
      Seq("very-long-name-number-one.o", "second-long-name.o"))
    assert(new String(b.slice(es(0)._2.toInt,
      (es(0)._2 + es(0)._3).toInt)) == "obj-one")
    assert(new String(b.slice(es(1)._2.toInt,
      (es(1)._2 + es(1)._3).toInt)) == "obj-two!")
  }

  test("fail-closed: magic, header terminator, size overrun, bad " +
    "table reference, junk, truncation") {
    val good = ccArchive(ArArchiveOutputStream.LONGFILE_ERROR,
      "a.txt" -> "abc".getBytes)
    assert(ArEntries.compute(null, 16) == null)
    assert(ArEntries.compute("junk".getBytes, 16) == null)
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(ArEntries.compute(badMagic, 16) == null)
    val badTerm = good.clone(); badTerm(8 + 58) = 'X'
    assert(ArEntries.compute(badTerm, 16) == null)
    assert(ArEntries.compute(good.dropRight(2), 16) == null) // data cut
    // /N without a // table
    val noTbl = "!<arch>\n".getBytes ++
      ("%-16s%-12d%-6d%-6d%-8s%-10d`\n"
        .format("/5", 1700000000L, 0, 0, "100644", 2)).getBytes ++
      "ab".getBytes
    assert(ArEntries.compute(noTbl, 16) == null)
  }
}
