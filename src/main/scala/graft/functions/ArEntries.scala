package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unix `ar` archive walk — the container Debian packages (`.deb`),
  * static libraries (`.a`) and old distfiles arrive in, the software
  * tier's sibling of [[TarEntries]]: the `!<arch>\n` global magic,
  * then 60-byte TEXT headers (name 16, mtime 12, uid/gid 6+6,
  * mode 8, size 10, the 0x60 0x0A terminator) with data padded to
  * even offsets by a single `\n`. Each entry yields
  * `(name, offset, size, mtime)` where `offset` points at the DATA —
  * ar stores bytes verbatim, so extraction is a plain
  * `substr(payload, offset+1, size)` like tar.
  *
  * Long names resolve BOTH ways real writers spell them:
  *  - GNU: a `//` member holds `\n`-separated names each terminated
  *    `/`; entries named `/N` take the table name at byte offset N.
  *    The `//` table and the `/` symbol index surface to NOBODY —
  *    they are format plumbing, not members.
  *  - BSD: `#1/LEN` entries prepend the LEN-byte real name to the
  *    data (size and offset are adjusted to the payload proper).
  * GNU regular names drop their single trailing `/` (the
  * spaces-in-names guard); trailing-space padding strips.
  *
  * FAIL-CLOSED NULL for: missing magic, a header without its 0x60 0A
  * terminator, non-numeric size, data running past the payload, a
  * `/N` reference outside the name table, a BSD length longer than
  * the member. The walk is bounded by `maxEntries` and stops at end
  * of payload (ar has no terminator record). Per-row bounded work,
  * zero shuffle, codegen'd. */
case class ArEntries(child: Expression, maxEntries: Int)
    extends UnaryExpression {
  require(maxEntries > 0, "entry walk bound must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ar_entries expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("mtime", LongType, nullable = true))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    ArEntries.compute(a.asInstanceOf[Array[Byte]], maxEntries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ArEntries.compute($c, $maxEntries);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ar_entries"
}

object ArEntries {

  private case object Bad extends Exception { override def fillInStackTrace(): Throwable = this }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte], maxEntries: Int): GenericArrayData = {
    try {
      if (b == null || b.length < 8) return null
      val magic = "!<arch>\n"
      var i = 0
      while (i < 8) {
        if (b(i) != magic.charAt(i).toByte) return null
        i += 1
      }
      var pos = 8
      var gnuTable: Array[Byte] = null
      val out = new java.util.ArrayList[Any]
      while (pos < b.length && out.size() < maxEntries) {
        if (pos + 60 > b.length) throw Bad
        if (b(pos + 58) != 0x60.toByte || b(pos + 59) != 0x0a.toByte)
          throw Bad
        val rawName = ascii(b, pos, 16).replaceAll("[ ]+$", "")
        val mtimeStr = ascii(b, pos + 16, 12).trim
        val size = decimal(ascii(b, pos + 48, 10).trim)
        if (size < 0) throw Bad
        var dataOff = pos + 60L
        if (dataOff + size > b.length) throw Bad
        val mtime: Any =
          if (mtimeStr.isEmpty) null
          else {
            val m = decimal(mtimeStr)
            if (m < 0) throw Bad else java.lang.Long.valueOf(m)
          }
        var name: String = null
        var dataSize = size
        if (rawName == "//") {
          // GNU extended name table: remember, surface nothing
          gnuTable = java.util.Arrays.copyOfRange(b, dataOff.toInt,
            (dataOff + size).toInt)
        } else if (rawName == "/" || rawName == "/SYM64/") {
          // symbol index: format plumbing
        } else if (rawName.startsWith("#1/")) {
          val nl = decimal(rawName.substring(3))
          if (nl <= 0 || nl > size) throw Bad
          name = ascii(b, dataOff.toInt, nl.toInt)
            .replaceAll("[ \\u0000]+$", "")
          dataOff += nl
          dataSize = size - nl
        } else if (rawName.startsWith("/")) {
          val off = decimal(rawName.substring(1))
          if (gnuTable == null || off < 0 || off >= gnuTable.length)
            throw Bad
          var e = off.toInt
          while (e < gnuTable.length && gnuTable(e) != '\n'.toByte) e += 1
          var s = new String(gnuTable, off.toInt, e - off.toInt, "UTF-8")
          if (s.endsWith("/")) s = s.substring(0, s.length - 1)
          name = s
        } else {
          name = if (rawName.endsWith("/"))
            rawName.substring(0, rawName.length - 1)
          else rawName
          if (name.isEmpty) throw Bad
        }
        if (name != null) {
          out.add(new GenericInternalRow(Array[Any](
            UTF8String.fromString(name), dataOff, dataSize, mtime)))
        }
        pos = (pos + 60 + size + (size & 1)).toInt
        if (pos < 0) throw Bad
      }
      new GenericArrayData(out.toArray)
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: NumberFormatException => null
    }
  }

  private def ascii(b: Array[Byte], off: Int, len: Int): String =
    new String(b, off, math.min(len, b.length - off),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  private def decimal(s: String): Long = {
    if (s.isEmpty) return -1
    var v = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return -1
      v = v * 10 + (c - '0')
      if (v > (1L << 40)) return -1
      i += 1
    }
    v
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 65536-entry default walk bound. */
  def apply(payload: Column, maxEntries: Int = 1 << 16): Column =
    ColumnShim.column(ArEntries(ColumnShim.expression(payload), maxEntries))
}
