package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native SQLite TABLE-ROW decode — the tier `sqliteMeta`'s 100-byte
  * header census stops short of, for the `.db`/`.sqlite` long tail of
  * data lakes: resolve the named table's root page through the
  * `sqlite_master` b-tree on page 1, walk its table b-tree (interior
  * cells' left children + the right-most pointer, leaf cells'
  * varint payload-length/rowid headers), follow overflow-page chains
  * (the U-35 / minLocal spill rule from the file-format doc), and
  * decode each record's serial-type header: NULL, 1/2/3/4/6/8-byte
  * big-endian twos-complement ints, the 0/1 constants, IEEE float64,
  * UTF-8 text, blobs (rendered as lowercase hex).
  *
  * Output `(root_page, n_rows, rows)` where each row is
  * `(rowid, vals array<string>)` — an INTEGER PRIMARY KEY alias
  * column reads as NULL by SQLite's own storage rule (the value
  * lives in rowid), which is exactly what this surfaces. Row
  * materialization is capped by `maxRows`; `n_rows` counts every
  * leaf cell visited (the cap only stops value decode).
  *
  * Fails closed (null) for: bad magic, UTF-16 databases, page-size
  * bombs, a missing table, cyclic/out-of-bounds page references,
  * malformed varints or serial types, journal-spanning truncation.
  * Per-row bounded work, zero shuffle, codegen'd. */
case class SqliteRows(child: Expression, table: String, maxRows: Int)
    extends UnaryExpression {
  require(maxRows > 0, "row cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sqlite_rows expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("root_page", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("rows", ArrayType(StructType(Seq(
      StructField("rowid", LongType, nullable = false),
      StructField("vals", ArrayType(StringType, containsNull = true),
        nullable = false))), containsNull = false), nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    SqliteRows.compute(a.asInstanceOf[Array[Byte]], table, maxRows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("table", table, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SqliteRows.compute($c, $tRef, $maxRows);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sqlite_rows"
}

object SqliteRows {

  private object Bad extends Exception with scala.util.control.NoStackTrace

  private val MaxPages = 1 << 16

  private final class Db(val b: Array[Byte], val pageSize: Int,
                         val usable: Int) {
    val nPages: Int = b.length / pageSize
    def page(n: Int): Int = { // 1-based -> byte offset
      if (n < 1 || n > nPages) throw Bad
      (n - 1) * pageSize
    }
  }

  private def u16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  /** SQLite varint: 1-9 bytes, big-endian 7-bit groups, 9th byte
    * contributes 8 bits. Returns (value, bytesRead) packed — value
    * in the array, length as return. */
  private def varint(b: Array[Byte], p: Int, out: Array[Long]): Int = {
    var v = 0L
    var i = 0
    while (i < 8) {
      if (p + i >= b.length) throw Bad
      val x = b(p + i) & 0xff
      if ((x & 0x80) == 0) { out(0) = (v << 7) | x; return i + 1 }
      v = (v << 7) | (x & 0x7f)
      i += 1
    }
    if (p + 8 >= b.length) throw Bad
    out(0) = (v << 8) | (b(p + 8) & 0xff)
    9
  }

  /** A record payload possibly spilled to overflow pages: gather the
    * local prefix + the chain into one array (bounded). */
  private def gather(db: Db, cellAt: Int, payloadLen: Long,
                     localEnd: Int): Array[Byte] = {
    val u = db.usable
    val maxLocal = u - 35
    if (payloadLen <= maxLocal) {
      if (cellAt + payloadLen > db.b.length) throw Bad
      return java.util.Arrays.copyOfRange(db.b, cellAt,
        cellAt + payloadLen.toInt)
    }
    if (payloadLen > (1L << 26)) throw Bad
    val minLocal = (u - 12) * 32 / 255 - 23
    val k = minLocal + ((payloadLen - minLocal) % (u - 4)).toInt
    val local = if (k <= maxLocal) k else minLocal
    if (cellAt + local + 4 > db.b.length) throw Bad
    val out = new Array[Byte](payloadLen.toInt)
    System.arraycopy(db.b, cellAt, out, 0, local)
    var got = local
    var next = u32(db.b, cellAt + local).toInt
    var hops = 0
    while (got < payloadLen && next != 0) {
      hops += 1
      if (hops > MaxPages) throw Bad
      val po = db.page(next)
      val take = math.min(u - 4, payloadLen.toInt - got)
      if (po + 4 + take > db.b.length) throw Bad
      System.arraycopy(db.b, po + 4, out, got, take)
      got += take
      next = u32(db.b, po).toInt
    }
    if (got < payloadLen) throw Bad
    out
  }

  /** Decode one record into (values as strings, null slots kept). */
  private def record(p: Array[Byte]): Array[UTF8String] = {
    val tmp = new Array[Long](1)
    var pos = varint(p, 0, tmp)
    val hdrLen = tmp(0)
    if (hdrLen < 1 || hdrLen > p.length) throw Bad
    val types = new scala.collection.mutable.ArrayBuffer[Long](8)
    while (pos < hdrLen) {
      pos += varint(p, pos, tmp)
      types += tmp(0)
    }
    if (pos != hdrLen) throw Bad
    var body = hdrLen.toInt
    val out = new Array[UTF8String](types.length)
    var i = 0
    while (i < types.length) {
      val t = types(i)
      t match {
        case 0 => out(i) = null
        case 8 => out(i) = UTF8String.fromString("0")
        case 9 => out(i) = UTF8String.fromString("1")
        case 7 =>
          if (body + 8 > p.length) throw Bad
          var bits = 0L
          var k = 0
          while (k < 8) { bits = (bits << 8) | (p(body + k) & 0xffL); k += 1 }
          body += 8
          out(i) = UTF8String.fromString(
            java.lang.Double.longBitsToDouble(bits).toString)
        case n if n >= 1 && n <= 6 =>
          val w = n match {
            case 1 => 1; case 2 => 2; case 3 => 3
            case 4 => 4; case 5 => 6; case 6 => 8
          }
          if (body + w > p.length) throw Bad
          var v = (p(body).toLong) // sign-extended first byte
          var k = 1
          while (k < w) { v = (v << 8) | (p(body + k) & 0xffL); k += 1 }
          body += w
          out(i) = UTF8String.fromString(v.toString)
        case n if n >= 13 && (n & 1) == 1 =>
          val len = ((n - 13) / 2).toInt
          if (len < 0 || body + len > p.length) throw Bad
          out(i) = UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(p, body, body + len))
          body += len
        case n if n >= 12 && (n & 1) == 0 =>
          val len = ((n - 12) / 2).toInt
          if (len < 0 || body + len > p.length) throw Bad
          val sb = new java.lang.StringBuilder(len * 2)
          var k = 0
          while (k < len) {
            sb.append("%02x".format(p(body + k) & 0xff)); k += 1
          }
          body += len
          out(i) = UTF8String.fromString(sb.toString)
        case _ => throw Bad // 10/11 reserved
      }
      i += 1
    }
    out
  }

  /** Walk a table b-tree rooted at `root` (1-based page), calling
    * `f(rowid, payload)` per leaf cell until it returns false. */
  private def walkTable(db: Db, root: Int, f: (Long, Array[Byte]) => Boolean): Unit = {
    val tmp = new Array[Long](1)
    var visited = 0
    def go(pageNo: Int): Boolean = {
      visited += 1
      if (visited > MaxPages) throw Bad
      val po = db.page(pageNo)
      val hdrAt = if (pageNo == 1) po + 100 else po
      val tpe = db.b(hdrAt) & 0xff
      val nCells = u16(db.b, hdrAt + 3)
      tpe match {
        case 13 => // leaf table
          val ptrs = hdrAt + 8
          var c = 0
          while (c < nCells) {
            val cellAt = po + u16(db.b, ptrs + 2 * c)
            var p = cellAt
            p += varint(db.b, p, tmp)
            val payloadLen = tmp(0)
            p += varint(db.b, p, tmp)
            val rowid = tmp(0)
            if (payloadLen < 0) throw Bad
            val payload = gather(db, p, payloadLen, 0)
            if (!f(rowid, payload)) return false
            c += 1
          }
          true
        case 5 => // interior table
          val ptrs = hdrAt + 12
          var c = 0
          while (c < nCells) {
            val cellAt = po + u16(db.b, ptrs + 2 * c)
            val child = u32(db.b, cellAt).toInt
            if (!go(child)) return false
            c += 1
          }
          go(u32(db.b, hdrAt + 8).toInt) // right-most child
        case _ => throw Bad
      }
    }
    go(root)
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], table: String, maxRows: Int): InternalRow = {
    try {
      if (bytes == null || bytes.length < 512 || table == null) return null
      val magic = "SQLite format 3\u0000"
      var i = 0
      while (i < 16) {
        if (bytes(i) != magic.charAt(i).toByte) return null
        i += 1
      }
      var pageSize = u16(bytes, 16)
      if (pageSize == 1) pageSize = 65536
      if (pageSize < 512 || (pageSize & (pageSize - 1)) != 0) return null
      val reserved = bytes(20) & 0xff
      val usable = pageSize - reserved
      if (usable < 480) return null
      // UTF-8 databases only (text encoding at offset 56)
      val enc = u32(bytes, 56)
      if (enc != 0 && enc != 1) return null // 0: empty db never written
      val db = new Db(bytes, pageSize, usable)
      // sqlite_master row: type,name,tbl_name,rootpage,sql
      var rootPage = -1
      walkTable(db, 1, (_, payload) => {
        val vals = record(payload)
        if (vals.length >= 4 && vals(0) != null && vals(1) != null &&
          vals(0).toString == "table" && vals(1).toString == table) {
          if (vals(3) == null) throw Bad
          rootPage = vals(3).toString.toInt
          false
        } else true
      })
      if (rootPage < 1) return null
      val rows = new java.util.ArrayList[Any]
      var total = 0L
      walkTable(db, rootPage, (rowid, payload) => {
        total += 1
        if (rows.size() < maxRows) {
          val vals = record(payload)
          rows.add(new GenericInternalRow(Array[Any](
            rowid, new GenericArrayData(vals.asInstanceOf[Array[Any]]))))
        }
        true
      })
      new GenericInternalRow(Array[Any](
        rootPage, total, new GenericArrayData(rows.toArray)))
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: NumberFormatException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; row materialization capped at 4096
    * by default. */
  def apply(payload: Column, table: String, maxRows: Int = 4096): Column =
    ColumnShim.column(
      SqliteRows(ColumnShim.expression(payload), table, maxRows))
}
