package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** [[WasmMeta]] battery over the committed python-writer module
  * (tools/make_wasm_fixture.py) plus truncation/corruption refusals
  * and the [[BinaryMeta]] routing row. */
class WasmMetaSpec extends AnyFunSuite {

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val mod = "0061736d01000000010a0260017f0060017f017f02200303656e76036c6f67000003656e76036d656d0201010403656e760167037f00030201010710020372756e0001066d656d6f727902000a0601040020000b000e0870726f64756365726772616674"

  test("module census: version, section/type/import/export/function " +
    "counts, module.field import names, export names in order") {
    val r = WasmMeta.compute(hx(mod), 256)
    assert(r != null, "refused")
    assert(r.getInt(0) == 1) // version
    assert(r.getInt(1) == 6) // sections incl. code + custom
    assert(r.getInt(2) == 2) // types
    assert(r.getInt(3) == 3) // imports
    assert(r.getInt(4) == 2) // exports
    assert(r.getInt(5) == 1) // local functions
    val imp = r.getArray(6)
    assert((0 until imp.numElements).map(imp.getUTF8String(_).toString) ==
      Seq("env.log", "env.mem", "env.g"))
    val exp = r.getArray(7)
    assert((0 until exp.numElements).map(exp.getUTF8String(_).toString) ==
      Seq("run", "memory"))
    // the name cap bounds LISTS, never the counts
    val capped = WasmMeta.compute(hx(mod), 1)
    assert(capped.getInt(3) == 3 && capped.getArray(6).numElements == 1)
  }

  test("BinaryMeta routes wasm as the fourth executable format") {
    val r = BinaryMeta.compute(hx(mod))
    assert(r != null)
    assert(r.getUTF8String(0).toString == "wasm")
    assert(r.getUTF8String(1).toString == "wasm")
    assert(r.getInt(2) == 32)
    assert(r.getUTF8String(3).toString == "module")
    assert(r.getInt(4) == 6)
  }

  test("refusals: truncation at every prefix, bad version, section " +
    "size past end, unknown section id, malformed import descriptor") {
    val whole = hx(mod)
    // a prefix ending ON a section boundary is a VALID shorter module
    // (sections are self-delimiting; `(module)` is 8 bytes) — every
    // other prefix must refuse
    val boundaries = {
      val bs = scala.collection.mutable.Set(8)
      var p = 8
      while (p < whole.length) {
        var size = 0L; var shift = 0; var q = p + 1
        while ({ val x = whole(q) & 0xff; size |= (x & 0x7fL) << shift;
          shift += 7; q += 1; (whole(q - 1) & 0x80) != 0 }) ()
        p = q + size.toInt
        bs += p
      }
      bs
    }
    for (n <- 0 until whole.length if !boundaries(n))
      assert(WasmMeta.compute(java.util.Arrays.copyOf(whole, n), 64) == null,
        s"prefix $n")
    assert(WasmMeta.compute(java.util.Arrays.copyOf(whole, 8), 64) != null)
    val v2 = whole.clone(); v2(4) = 2
    assert(WasmMeta.compute(v2, 64) == null)
    // inflate the type section's declared size past the payload end
    val bigSec = whole.clone(); bigSec(9) = 0x7f
    assert(WasmMeta.compute(bigSec, 64) == null)
    val badId = whole.clone(); badId(8) = 13
    assert(WasmMeta.compute(badId, 64) == null)
    // import kind byte 4 is invalid
    val badKind = hx(mod)
    val kindAt = mod.indexOf("036c6f6700") / 2 + 4
    badKind(kindAt) = 4
    assert(WasmMeta.compute(badKind, 64) == null)
    assert(WasmMeta.compute("no magic!".getBytes, 64) == null)
  }
}
