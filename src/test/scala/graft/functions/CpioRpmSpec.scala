package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.commons.compress.archivers.cpio.{CpioArchiveEntry, CpioArchiveOutputStream, CpioConstants}
import org.scalatest.funsuite.AnyFunSuite

/** [[CpioEntries]] + [[RpmInfo]] battery: REAL commons-compress cpio
  * archives in both ASCII formats, the generator's spec-exact rpm,
  * refusal batteries. */
class CpioRpmSpec extends AnyFunSuite {

  private def ccCpio(format: Short,
                     members: (String, Array[Byte])*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new CpioArchiveOutputStream(bos, format)
    for ((name, data) <- members) {
      val e = new CpioArchiveEntry(format, name, data.length)
      e.setTime(1700000000L)
      out.putArchiveEntry(e)
      out.write(data)
      out.closeArchiveEntry()
    }
    out.close()
    bos.toByteArray
  }

  private def entries(b: Array[Byte]): Seq[(String, Long, Long, Long)] = {
    val a = CpioEntries.compute(b, 1 << 16)
    assert(a != null, "refused")
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 5)
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(4))
    }
  }

  test("commons-compress NEW (newc) archives: names, data slices, " +
    "4-byte padding, mtime") {
    val b = ccCpio(CpioConstants.FORMAT_NEW,
      "usr/bin/tool" -> "#!/bin/sh\n".getBytes,
      "etc/odd" -> Array[Byte](1, 2, 3),
      "empty" -> Array.emptyByteArray)
    val es = entries(b)
    assert(es.map(_._1) == Seq("usr/bin/tool", "etc/odd", "empty"))
    for ((name, off, size, mtime) <- es) {
      assert(mtime == 1700000000L, name)
      val got = b.slice(off.toInt, (off + size).toInt).toSeq
      val want = name match {
        case "usr/bin/tool" => "#!/bin/sh\n".getBytes.toSeq
        case "etc/odd" => Seq[Byte](1, 2, 3)
        case _ => Seq.empty[Byte]
      }
      assert(got == want, name)
    }
  }

  test("commons-compress OLD_ASCII (odc) archives decode the octal " +
    "headers") {
    val b = ccCpio(CpioConstants.FORMAT_OLD_ASCII,
      "a.conf" -> "k=v\n".getBytes)
    val es = entries(b)
    assert(es.map(_._1) == Seq("a.conf"))
    assert(b.slice(es.head._2.toInt,
      (es.head._2 + es.head._3).toInt).toSeq == "k=v\n".getBytes.toSeq)
  }

  test("cpio fail-closed: bad magic, truncation, missing trailer, " +
    "binary format refused") {
    val good = ccCpio(CpioConstants.FORMAT_NEW, "x" -> "y".getBytes)
    assert(CpioEntries.compute(null, 16) == null)
    assert(CpioEntries.compute("junk".getBytes, 16) == null)
    val bad = good.clone(); bad(5) = '9'
    assert(CpioEntries.compute(bad, 16) == null)
    // cut right after the first entry's data: the trailer is gone
    assert(CpioEntries.compute(good.take(116), 16) == null)
    // binary cpio magic 0x71c7 LE
    assert(CpioEntries.compute(Array[Byte](0xc7.toByte, 0x71) ++
      new Array[Byte](80), 16) == null)
  }

  private def hexRes(p: String): Array[Byte] = {
    val h = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(getClass.getResource("/" + p).toURI)),
      "US-ASCII").trim
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  test("rpm: identity tags, compressor default, payload chains to " +
    "the cpio file table") {
    val rpm = hexRes("rpm_gz.hex")
    val r = RpmInfo.compute(rpm)
    assert(r != null, "refused")
    assert(r.getUTF8String(0).toString == "graft-rpm-demo")
    assert(r.getUTF8String(1).toString == "2.4")
    assert(r.getUTF8String(2).toString == "7.el9")
    assert(r.getUTF8String(3).toString == "x86_64")
    assert(r.getUTF8String(4).toString == "pinned fixture package")
    assert(r.getUTF8String(5).toString == "cpio")
    assert(r.getUTF8String(6).toString == "gzip")
    val off = r.getLong(7).toInt
    val cpio = GunzipPayload.compute(
      java.util.Arrays.copyOfRange(rpm, off, rpm.length), 1 << 20)
    assert(cpio != null)
    assert(entries(cpio).map(_._1) ==
      Seq("./usr/bin/graft", "./usr/share/doc/graft/README"))
    // default-compressor variant: 1125 tag absent -> null here
    val rd = RpmInfo.compute(hexRes("rpm_def.hex"))
    assert(rd.isNullAt(6))
  }

  test("rpm fail-closed: lead magic, header magic, store-size lie, " +
    "missing required tag, truncation") {
    val rpm = hexRes("rpm_gz.hex")
    val badLead = rpm.clone(); badLead(0) = 0
    assert(RpmInfo.compute(badLead) == null)
    val badHdr = rpm.clone(); badHdr(96) = 0
    assert(RpmInfo.compute(badHdr) == null)
    assert(RpmInfo.compute(rpm.take(150)) == null)
    assert(RpmInfo.compute("junk".getBytes) == null)
    // blow up the signature store size so headers run past the file
    val lie = rpm.clone(); lie(96 + 12) = 0x7f.toByte
    assert(RpmInfo.compute(lie) == null)
  }
}
