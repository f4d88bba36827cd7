package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** [[SqliteRows]] battery over databases written by the REAL SQLite
  * library (python stdlib sqlite3 — tools/make_sqlite_fixture.py):
  * every serial type, root-page resolution among multiple tables, an
  * interior-node b-tree, an overflow chain, caps and refusals. */
class SqliteRowsSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val hex = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(getClass.getResource(s"/$name").toURI))).trim
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  private lazy val small = res("sqlite_small_db.hex")
  private lazy val tree = res("sqlite_tree_db.hex")

  private def rows(r: org.apache.spark.sql.catalyst.InternalRow)
      : Seq[(Long, Seq[String])] = {
    val a = r.getArray(2)
    (0 until a.numElements()).map { i =>
      val row = a.getStruct(i, 2)
      val vals = row.getArray(1)
      (row.getLong(0), (0 until vals.numElements()).map(k =>
        if (vals.isNullAt(k)) null else vals.getUTF8String(k).toString))
    }
  }

  test("every serial type decodes: NULL, 0/1 constants, 1..8-byte " +
    "ints (negatives sign-extended), float64, text (UTF-8), blob hex") {
    val r = SqliteRows.compute(small, "docs", 4096)
    assert(r != null)
    assert(r.getLong(1) == 11L)
    val got = rows(r)
    assert(got.map(_._1) == (1L to 11L))
    val v = got.map(_._2)
    assert(v(0) == Seq(null, "0.25", "hello", "0102"))
    assert(v(1) == Seq("0", null, "", ""))
    assert(v(2) == Seq("1", "-1.5", "café", null))
    // the REAL library packed the integral 1e10 as an INTEGER
    // (SQLite's lossless REAL->int storage optimization) — the
    // decode surfaces what the bytes actually say
    assert(v(3) == Seq("127", "10000000000", "x" * 30, "ff"))
    assert(v(4) == Seq("-129", null, null, "0010"))
    assert(v(5) == Seq("32767", "2", "t", null)) // 2.0 packed too
    assert(v(6) == Seq("8388607", null, "u", null))
    assert(v(7) == Seq("2147483647", null, "v", null))
    assert(v(8) == Seq("140737488355327", null, "w", null))
    assert(v(9) == Seq("9223372036854775807", null, "z", null))
    assert(v(10) == Seq("-9223372036854775808", null, "neg", null))
  }

  test("root-page resolution picks the right sqlite_master row; " +
    "missing table refuses") {
    val r = SqliteRows.compute(small, "langs", 4096)
    assert(r != null)
    assert(rows(r) == Seq((1L, Seq("en"))))
    assert(SqliteRows.compute(small, "nope", 16) == null)
    assert(SqliteRows.compute(small, "sqlite_master", 16) == null)
  }

  test("interior-node b-tree walks in rowid order; the 2000-byte " +
    "text row gathers its OVERFLOW CHAIN; maxRows caps but n_rows " +
    "stays exact") {
    val r = SqliteRows.compute(tree, "t", 4096)
    assert(r != null)
    assert(r.getLong(1) == 121L)
    val got = rows(r)
    assert(got.length == 121)
    assert(got.map(_._1) == (1L to 121L))
    for (i <- 0 until 120)
      assert(got(i)._2 == Seq("row%03d".format(i) + "x" * 34), s"row $i")
    assert(got(120)._2 == Seq("Y" * 2000), "overflow row")
    val capped = SqliteRows.compute(tree, "t", 7)
    assert(capped.getLong(1) == 121L)
    assert(rows(capped).length == 7)
  }

  test("fail-closed: bad magic, truncation, junk, bogus page size") {
    val bad = small.clone(); bad(0) = 'X'
    assert(SqliteRows.compute(bad, "docs", 16) == null)
    assert(SqliteRows.compute(small.take(300), "docs", 16) == null)
    assert(SqliteRows.compute("junk".getBytes, "docs", 16) == null)
    val ps = small.clone(); ps(16) = 0x01; ps(17) = 0x23 // not a power of 2
    assert(SqliteRows.compute(ps, "docs", 16) == null)
  }
}
