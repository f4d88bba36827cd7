package graft.functions

import graft.SparkSpec

/** Arrow IPC file footer census over pinned pyarrow output: the
  * flatbuffer walk (vtables, struct vectors, field-name strings),
  * a dictionary-encoded file, and the fail-closed surface. */
class ArrowFooterSpec extends SparkSpec {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    assert(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("arrow_meta: version, batch/dictionary census, body bytes, " +
    "column names off the footer flatbuffer") {
    val t = res("/arrow/t.arrow")
    val r = ArrowFooterMeta.compute(t, 4096, 1 << 20)
    assert(r != null)
    assert(r.getInt(0) == 4) // MetadataVersion V5
    assert(r.getInt(1) == 0 && r.getInt(2) == 2) // 2 record batches
    assert(r.getLong(3) > 0)
    val cols = r.getArray(4)
    assert((0 until cols.numElements())
      .map(cols.getUTF8String(_).toString) == Seq("id", "name", "x"))
    // dictionary-encoded file: one dictionary batch
    val d = ArrowFooterMeta.compute(res("/arrow/dict.arrow"), 4096, 1 << 20)
    assert(d != null && d.getInt(1) == 1 && d.getInt(2) == 1)
    val dcols = d.getArray(4)
    assert((0 until dcols.numElements())
      .map(dcols.getUTF8String(_).toString) == Seq("cat", "v"))
  }

  test("arrow_meta fails closed: magic flips, truncation at every " +
    "structural cut, footer-length lies, column bomb cap") {
    val t = res("/arrow/t.arrow")
    val badHead = t.clone(); badHead(0) = 'X'
    assert(ArrowFooterMeta.compute(badHead, 4096, 1 << 20) == null)
    val badTail = t.clone(); badTail(t.length - 1) = 'X'
    assert(ArrowFooterMeta.compute(badTail, 4096, 1 << 20) == null)
    for (cut <- Seq(10, 100, t.length / 2))
      assert(ArrowFooterMeta.compute(t.take(cut), 4096, 1 << 20) == null,
        s"cut $cut")
    // footer length pointing outside the buffer
    val lie = t.clone()
    lie(t.length - 10) = 0x7f.toByte
    lie(t.length - 9) = 0x7f.toByte
    assert(ArrowFooterMeta.compute(lie, 4096, 1 << 20) == null)
    assert(ArrowFooterMeta.compute(t, 1, 1 << 20) == null) // 3 cols > 1
  }
}
