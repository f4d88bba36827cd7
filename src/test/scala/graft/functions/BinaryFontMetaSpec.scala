package graft.functions

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** [[BinaryMeta]] + [[FontMeta]] battery: REAL system ELF binaries,
  * REAL DejaVu fonts cross-checked against java.awt.Font's own
  * parse, generator fixtures for PE/Mach-O/TTC, refusals. */
class BinaryFontMetaSpec extends AnyFunSuite {

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def res(name: String): Array[Byte] =
    hexBytes(new String(Files.readAllBytes(
      Paths.get(getClass.getResource("/" + name).toURI)), "US-ASCII").trim)

  test("a real system ELF censuses: format, 64-bit, x86_64, " +
    "sections > 0; a real .so reads shared") {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java")
    assume(Files.exists(javaBin))
    val r = BinaryMeta.compute(Files.readAllBytes(javaBin))
    assert(r != null, "refused")
    assert(r.getUTF8String(0).toString == "elf")
    assert(r.getUTF8String(1).toString == "x86_64")
    assert(r.getInt(2) == 64)
    assert(Seq("executable", "shared").contains(
      r.getUTF8String(3).toString))
    assert(r.getInt(4) > 0)
    val so = Paths.get(sys.props("java.home"), "lib", "libjava.so")
    assume(Files.exists(so))
    val r2 = BinaryMeta.compute(Files.readAllBytes(so))
    assert(r2.getUTF8String(3).toString == "shared")
  }

  test("generator PE / Mach-O fixtures census; a Java class file is " +
    "NOT a FAT binary") {
    val pe = BinaryMeta.compute(res("bin_pe.hex"))
    assert(pe != null && pe.getUTF8String(0).toString == "pe")
    assert(pe.getUTF8String(1).toString == "x86_64" && pe.getInt(2) == 64)
    assert(pe.getUTF8String(3).toString == "dll" && pe.getInt(4) == 6)
    val mo = BinaryMeta.compute(res("bin_macho.hex"))
    assert(mo != null && mo.getUTF8String(0).toString == "macho")
    assert(mo.getUTF8String(1).toString == "aarch64")
    assert(mo.getUTF8String(3).toString == "executable" &&
      mo.getInt(4) == 15)
    // class file: CAFEBABE + minor 0 + major 61 -> FAT count 61 > 18
    assert(BinaryMeta.compute(hexBytes("CAFEBABE0000003D" + "00" * 8))
      == null)
    assert(BinaryMeta.compute(hexBytes("CAFEBABE00000002" + "00" * 40))
      != null)
  }

  test("binary fail-closed: short, unknown magic, ELF bad class, " +
    "PE bad lfanew") {
    assert(BinaryMeta.compute(null) == null)
    assert(BinaryMeta.compute("ELF".getBytes) == null)
    assert(BinaryMeta.compute("randomtext".getBytes) == null)
    assert(BinaryMeta.compute(
      hexBytes("7F454C46" + "07" + "01" + "00" * 58)) == null)
    assert(BinaryMeta.compute(
      hexBytes("4D5A" + "00" * 58 + "FFFF0000")) == null)
  }

  test("REAL DejaVu faces: family agrees with java.awt.Font's own " +
    "parse, glyph count positive, head magic verified") {
    val dir = Paths.get("/usr/share/fonts/truetype/dejavu")
    assume(Files.exists(dir))
    val faces = Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith(".ttf")).sorted.take(3)
    assume(faces.nonEmpty)
    for (f <- faces) {
      val b = Files.readAllBytes(Paths.get(f))
      val r = FontMeta.compute(b)
      assert(r != null, s"$f refused")
      assert(r.getUTF8String(0).toString == "ttf", f)
      val awt = java.awt.Font.createFont(java.awt.Font.TRUETYPE_FONT,
        new java.io.ByteArrayInputStream(b))
      assert(r.getUTF8String(3).toString == awt.getFamily, f)
      assert(r.getInt(5) > 0 && r.getInt(6) > 0, f)
    }
  }

  test("generator TTF and its TTC agree; font fail-closed: WOFF, " +
    "head-magic lie, truncation") {
    val ttf = res("font_ttf.hex")
    val ttc = res("font_ttc.hex")
    val rt = FontMeta.compute(ttf)
    val rc = FontMeta.compute(ttc)
    assert(rt.getUTF8String(0).toString == "ttf")
    assert(rt.getUTF8String(3).toString == "Graft Sans")
    assert(rt.getUTF8String(4).toString == "Graft Sans Regular")
    assert(rt.getInt(5) == 123 && rt.getInt(6) == 2048)
    assert(rc.getUTF8String(0).toString == "ttc" && rc.getInt(1) == 1)
    assert(rc.getUTF8String(3).toString == "Graft Sans")
    assert(FontMeta.compute("wOFF000100000000".getBytes) == null)
    // head is the fixture's first table: its offset lives at
    // record 0 + 8; breaking the magic must refuse
    val bad = ttf.clone()
    val headOff = ((bad(20) & 0xff) << 24) | ((bad(21) & 0xff) << 16) |
      ((bad(22) & 0xff) << 8) | (bad(23) & 0xff)
    bad(headOff + 12) = 0
    assert(FontMeta.compute(bad) == null)
    assert(FontMeta.compute(ttf.take(40)) == null)
  }
}
