package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** [[ArrowColumnValues]] battery over REAL pyarrow files (v5 + legacy
  * v4 envelopes, two record batches each), plus refusals. */
class ArrowColumnValuesSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val h = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(getClass.getResource("/" + name).toURI)),
      "US-ASCII").trim
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  private def values(b: Array[Byte], col: String): (String, Int, Long,
    Seq[String]) = {
    val r = ArrowColumnValues.compute(b, col, 1 << 16)
    assert(r != null, s"$col refused")
    val a = r.getArray(3)
    (r.getUTF8String(0).toString, r.getInt(1), r.getLong(2),
      (0 until a.numElements()).map(i =>
        if (a.isNullAt(i)) null else a.getUTF8String(i).toString))
  }

  test("both envelope forms decode every supported type across two " +
    "batches: int64+nulls, uint16, float64, utf8+nulls, binary-as-hex, " +
    "bool+nulls") {
    for (f <- Seq("arrow_v5.hex", "arrow_v4.hex")) {
      val b = res(f)
      val (t1, nb, nv, i64) = values(b, "i64")
      assert(t1 == "int64" && nb == 2 && nv == 6L, f)
      assert(i64 == Seq("5", null, "-7", (1L << 40).toString, "0", "42"), f)
      val (t2, _, _, u16) = values(b, "u16")
      assert(t2 == "uint16")
      assert(u16 == Seq("0", "1", "65535", "7", "300", "9"), f)
      val (t3, _, _, f64) = values(b, "f64")
      assert(t3 == "double")
      assert(f64 == Seq("0.5", "-1.25", "1.0E10", "-0.0", "2.5", "0.125"), f)
      val (t4, _, _, s) = values(b, "s")
      assert(t4 == "utf8")
      assert(s == Seq("alpha", null, "", "beta", "café", "zz"), f)
      val (t5, _, _, bin) = values(b, "bin")
      assert(t5 == "binary")
      assert(bin == Seq("0102", "", "ff", "616263", "00", "1020"), f)
      val (t6, _, _, flag) = values(b, "flag")
      assert(t6 == "bool")
      assert(flag == Seq("true", "false", "true", "true", null, "false"), f)
    }
  }

  test("BODY COMPRESSION: pyarrow's zstd and lz4-frame IPC files " +
    "decode every column identically to the plain file") {
    for (f <- Seq("arrow_zstd.hex", "arrow_lz4.hex")) {
      val b = res(f)
      val (_, nb, nv, i64) = values(b, "i64")
      assert(nb == 2 && nv == 6L, f)
      assert(i64 == Seq("5", null, "-7", (1L << 40).toString, "0", "42"), f)
      val (_, _, _, s) = values(b, "s")
      assert(s == Seq("alpha", null, "", "beta", "café", "zz"), f)
      val (_, _, _, bin) = values(b, "bin")
      assert(bin == Seq("0102", "", "ff", "616263", "00", "1020"), f)
      val (_, _, _, flag) = values(b, "flag")
      assert(flag == Seq("true", "false", "true", "true", null, "false"), f)
    }
  }

  test("maxVals caps materialization, n_values stays exact") {
    val r = ArrowColumnValues.compute(res("arrow_v5.hex"), "i64", 3)
    assert(r.getArray(3).numElements() == 3 && r.getLong(2) == 6L)
  }

  test("fail-closed: absent column, bad magics, truncation, footer " +
    "lies") {
    val b = res("arrow_v5.hex")
    assert(ArrowColumnValues.compute(b, "nope", 16) == null)
    assert(ArrowColumnValues.compute(null, "i64", 16) == null)
    assert(ArrowColumnValues.compute("junk".getBytes, "i64", 16) == null)
    val bad = b.clone(); bad(0) = 'X'
    assert(ArrowColumnValues.compute(bad, "i64", 16) == null)
    assert(ArrowColumnValues.compute(b.take(b.length / 2), "i64", 16)
      == null)
    // flip bytes across the first message envelope: never throws,
    // never claims more rows than the file holds
    for (off <- 8 until 160) {
      val c = b.clone()
      c(off) = (c(off) ^ 0x5a).toByte
      val r = ArrowColumnValues.compute(c, "i64", 1 << 16)
      if (r != null) assert(r.getLong(2) <= 64L)
    }
  }
}
