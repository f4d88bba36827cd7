package graft.functions

import graft.SparkSpec

/** Generic protobuf census over a hand-built wire-exact message:
  * scalar wires, repeated fields, nested-message descent, the
  * string-vs-bytes heuristic, and the fail-closed surface. */
class ProtoFieldsSpec extends SparkSpec {

  private def vint(v: Long): Array[Byte] = {
    var x = v
    val out = collection.mutable.ArrayBuffer[Byte]()
    var more = true
    while (more) {
      val b = (x & 0x7f).toInt
      x >>>= 7
      more = x != 0
      out += (if (more) (b | 0x80).toByte else b.toByte)
    }
    out.toArray
  }

  private def tag(field: Int, wire: Int): Array[Byte] =
    vint((field.toLong << 3) | wire)

  private def len(field: Int, data: Array[Byte]): Array[Byte] =
    tag(field, 2) ++ vint(data.length) ++ data

  private def census(b: Array[Byte]): Seq[(String, String, Long, Long)] = {
    val r = ProtoFields.compute(b, 16, 4096)
    if (r == null) null
    else (0 until r.numElements()).map { i =>
      val e = r.getStruct(i, 4)
      (e.getUTF8String(0).toString, e.getUTF8String(1).toString,
        e.getLong(2), e.getLong(3))
    }
  }

  test("proto_fields: wires, repeats, nested descent, string vs " +
    "bytes heuristic") {
    val nested = tag(1, 0) ++ vint(1) ++ tag(2, 1) ++
      Array.fill(8)(0x11.toByte)
    val msg = tag(1, 0) ++ vint(150) ++
      len(2, "testing".getBytes("UTF-8")) ++
      len(3, nested) ++
      (tag(4, 5) ++ Array.fill(4)(0x22.toByte)) ++
      len(5, Array(0xFF.toByte, 0x00.toByte)) ++
      tag(1, 0) ++ vint(7)
    val got = census(msg)
    assert(got == Seq(
      ("1", "varint", 2L, 0L),
      ("2", "string", 1L, 7L),
      ("3", "message", 1L, nested.length.toLong),
      ("3.1", "varint", 1L, 0L),
      ("3.2", "fixed64", 1L, 0L),
      ("4", "fixed32", 1L, 0L),
      ("5", "bytes", 1L, 2L)), got)
  }

  test("proto_fields fails closed: groups, bad field numbers, " +
    "truncation at every cut, path bomb cap") {
    val group = tag(1, 3) // deprecated group wire
    assert(census(group) == null)
    val msg = tag(1, 0) ++ vint(150) ++
      len(2, "some payload text here".getBytes)
    assert(census(msg) != null)
    for (cut <- 1 until msg.length) {
      val c = census(msg.take(cut))
      // any prefix either refuses or censuses a smaller valid tiling
      // — but a cut INSIDE a declared length must refuse
      if (cut > 3 && cut < msg.length) assert(c == null, s"cut $cut")
    }
    // field number 0 refuses
    assert(census(Array(0x00.toByte, 0x01.toByte)) == null)
    // path cap
    val many = (1 to 50).flatMap(i => tag(i, 0) ++ vint(1)).toArray
    assert(ProtoFields.compute(many, 16, 10) == null)
    assert(ProtoFields.compute(many, 16, 100) != null)
  }
}
