package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Legacy `.xls` (Excel 97–2003, BIFF8 per the public MS-XLS spec)
  * CELL-GRID extraction — the third leg of the legacy-Office tier
  * next to [[DocTextExtract]] and the OOXML `xlsxCells` path: the
  * `Workbook` (or `Book`) stream extracts through [[CfbDirectory]]'s
  * bounded FAT/miniFAT walks, then a BIFF record walk reads the
  * globals substream (BOF version gate, `BoundSheet8` positions in
  * substream order, the shared-string table `SST` with its
  * CONTINUE-record splits — a string's character data resuming in a
  * CONTINUE record restarts with a FRESH option-flags byte, so wide
  * and compressed runs of one string mix; rich-run and ExtRst
  * payloads skip WITHOUT a restart byte per the spec) and each
  * worksheet substream's cell records:
  *
  *   - `LabelSst` (SST index), `Label` (inline string)
  *   - `Number` (IEEE double), `RK` and `MulRk` (the packed 30-bit
  *     encodings: integer / IEEE-high-bits, each optionally ×1/100)
  *   - `BoolErr` (TRUE/FALSE or the spec's error names)
  *   - `Formula` cached results — numeric, boolean, error, empty, or
  *     a string carried by the FOLLOWING `String` record (skipping
  *     any interleaved `ShrFmla`/`Array`/`Table` record)
  *
  * Output mirrors `xlsxCells`: one entry per non-blank cell,
  * `(sheet, row, col, value)` with the 1-based sheet position among
  * worksheet-type BoundSheet8 entries and 1-based row/column.
  * Numbers render integral-as-integer (the `xlsxCells` `<v>`
  * convention), otherwise shortest-double.
  *
  * FAIL-CLOSED NULL on: anything [[CfbDirectory]] refuses, a payload
  * without a `Workbook`/`Book` stream, a BOF that is not BIFF8
  * (0x0600 — BIFF5 `.xls` is a different tier, refused rather than
  * mis-decoded), malformed SST counts/flags, record or piece
  * pointers outside the stream, more than `maxCells` cells (bomb
  * guard). Per-row bounded work, zero shuffle, codegen'd. */
case class XlsCells(child: Expression, maxBytes: Int, maxCells: Int)
    extends UnaryExpression {
  require(maxBytes > 0 && maxCells > 0, "bounds must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"xls_cells expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sheet", LongType, nullable = false),
    StructField("row", LongType, nullable = false),
    StructField("col", LongType, nullable = false),
    StructField("value", StringType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    XlsCells.compute(a.asInstanceOf[Array[Byte]], maxBytes, maxCells)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.XlsCells.compute($c, $maxBytes, $maxCells);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "xls_cells"
}

object XlsCells {

  import CfbDirectory.{Bad, le16, le32}

  private def le64(b: Array[Byte], p: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
    v
  }

  /** The spec's BoolErr/Formula error codes by name; anything else is
    * a malformed payload. */
  private def errName(code: Int): String = code match {
    case 0x00 => "#NULL!"
    case 0x07 => "#DIV/0!"
    case 0x0F => "#VALUE!"
    case 0x17 => "#REF!"
    case 0x1D => "#NAME?"
    case 0x24 => "#NUM!"
    case 0x2A => "#N/A"
    case _ => throw Bad
  }

  /** Integral doubles render as integers — the same convention the
    * OOXML `<v>` text carries — otherwise shortest round-trip. */
  private def numStr(v: Double): String =
    if (!v.isInfinite && !v.isNaN && v == math.rint(v) &&
      math.abs(v) < 1e15) java.lang.Long.toString(v.toLong)
    else java.lang.Double.toString(v)

  /** RK: bit0 = ×1/100, bit1 = integer-vs-IEEE-high-30-bits. */
  private def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  /** Cursor over an SST record's fragments (the record itself plus
    * its CONTINUE records). Header/run/ExtRst bytes straddle
    * boundaries plainly; CHARACTER reads crossing into a new fragment
    * consume that fragment's fresh option-flags byte first. */
  private final class Frags(frags: java.util.ArrayList[Array[Byte]]) {
    private var fi = 0
    private var off = 0
    private def ensure(): Unit = {
      while (fi < frags.size() && off >= frags.get(fi).length) {
        fi += 1; off = 0
      }
      if (fi >= frags.size()) throw Bad
    }
    def u8(): Int = { ensure(); val v = frags.get(fi)(off) & 0xff; off += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def skip(n: Long): Unit = {
      if (n < 0) throw Bad
      var left = n
      while (left > 0) {
        ensure()
        val take = math.min(left, (frags.get(fi).length - off).toLong)
        off += take.toInt
        left -= take
      }
    }
    /** cch characters, wide/compressed per the running flag, the flag
      * re-read at every fragment boundary crossed mid-characters. */
    def chars(cch: Int, wideInit: Boolean, sb: java.lang.StringBuilder): Unit = {
      var wide = wideInit
      var left = cch
      while (left > 0) {
        val boundary = fi < frags.size() && off >= frags.get(fi).length
        if (boundary) {
          wide = (u8() & 1) != 0 // ensure() inside u8 advances first
        }
        ensure()
        val f = frags.get(fi)
        if (wide) {
          if (off + 2 > f.length) throw Bad // chars never split mid-unit
          sb.append(((f(off) & 0xff) | ((f(off + 1) & 0xff) << 8)).toChar)
          off += 2
        } else {
          sb.append((f(off) & 0xff).toChar) // low-byte ("compressed") unit
          off += 1
        }
        left -= 1
      }
    }
  }

  /** One XLUnicodeRichExtendedString off the fragment cursor. */
  private def readSstString(c: Frags): String = {
    val cch = c.u16()
    val flags = c.u8()
    if ((flags & ~0x0D) != 0) throw Bad // only fHighByte/fExtSt/fRichSt
    val cRun = if ((flags & 0x08) != 0) c.u16() else 0
    val cbExt = if ((flags & 0x04) != 0) c.u32() else 0L
    if (cbExt < 0) throw Bad
    val sb = new java.lang.StringBuilder(cch)
    c.chars(cch, (flags & 1) != 0, sb)
    c.skip(4L * cRun)
    c.skip(cbExt)
    sb.toString
  }

  /** An in-record XLUnicodeString (Label / String records): cch(2),
    * flags(1), chars — entirely inside one record's data. */
  private def readInlineString(d: Array[Byte], p0: Int, end: Int): String = {
    if (p0 + 3 > end) throw Bad
    val cch = le16(d, p0)
    val wide = (d(p0 + 2) & 1) != 0
    val p = p0 + 3
    if (wide) {
      if (p + 2 * cch > end) throw Bad
      new String(d, p, 2 * cch, java.nio.charset.StandardCharsets.UTF_16LE)
    } else {
      val sb = new java.lang.StringBuilder(cch)
      if (p + cch > end) throw Bad
      var i = 0
      while (i < cch) { sb.append((d(p + i) & 0xff).toChar); i += 1 }
      sb.toString
    }
  }

  private final val Continue = 0x003C
  private final val Eof = 0x000A
  private final val Bof = 0x0809

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], maxBytes: Int, maxCells: Int): GenericArrayData = {
    try {
      val cfb = CfbDirectory.parse(bytes, 1 << 16)
      var wb = cfb.stream("Workbook", maxBytes)
      if (wb == null) wb = cfb.stream("Book", maxBytes)
      if (wb == null) return null
      val n = wb.length

      def recId(p: Int): Int = { if (p + 4 > n) throw Bad; le16(wb, p) }
      def recLen(p: Int): Int = le16(wb, p + 2)
      def recEnd(p: Int): Int = {
        val e = p + 4 + recLen(p)
        if (e > n) throw Bad
        e
      }

      // ---- globals substream: BIFF8 gate, BoundSheet8, SST --------
      if (recId(0) != Bof || recLen(0) < 8) return null
      if (le16(wb, 4) != 0x0600) return null // BIFF8 only, never a guess
      if (le16(wb, 6) != 0x0005) return null // workbook-globals substream
      val sheetPos = new java.util.ArrayList[Integer]
      var sst: Array[String] = null
      var p = recEnd(0)
      var id = recId(p)
      while (id != Eof) {
        val d = p + 4
        val end = recEnd(p)
        id match {
          case 0x0085 => // BoundSheet8
            if (d + 6 > end) throw Bad
            val pos = le32(wb, d)
            if ((wb(d + 5) & 0xff) == 0) { // dt: worksheet
              if (pos < 0 || pos > n - 4) throw Bad
              sheetPos.add(pos.toInt)
            }
          case 0x00FC => // SST + its CONTINUE records
            if (d + 8 > end) throw Bad
            val unique = le32(wb, d + 4)
            if (unique < 0 || unique > maxCells) throw Bad
            val frags = new java.util.ArrayList[Array[Byte]]
            frags.add(java.util.Arrays.copyOfRange(wb, d + 8, end))
            var q = end
            while (recId(q) == Continue) {
              frags.add(java.util.Arrays.copyOfRange(wb, q + 4, recEnd(q)))
              q = recEnd(q)
            }
            val cur = new Frags(frags)
            sst = new Array[String](unique.toInt)
            var i = 0
            while (i < unique) { sst(i) = readSstString(cur); i += 1 }
          case _ => ()
        }
        p = end
        id = recId(p)
      }

      // ---- each worksheet substream: the cell records -------------
      val out = new java.util.ArrayList[Any]
      def emit(sheet: Int, rw: Int, col: Int, value: String): Unit = {
        if (out.size() >= maxCells) throw Bad
        out.add(new GenericInternalRow(Array[Any](
          (sheet + 1).toLong, (rw + 1).toLong, (col + 1).toLong,
          UTF8String.fromString(value))))
      }
      var s = 0
      while (s < sheetPos.size()) {
        p = sheetPos.get(s)
        if (recId(p) != Bof || recLen(p) < 8) throw Bad
        if (le16(wb, p + 6) != 0x0010) throw Bad // worksheet substream
        p = recEnd(p)
        id = recId(p)
        while (id != Eof) {
          val d = p + 4
          val end = recEnd(p)
          id match {
            case 0x00FD => // LabelSst
              if (d + 10 > end || sst == null) throw Bad
              val isst = le32(wb, d + 6)
              if (isst < 0 || isst >= sst.length) throw Bad
              emit(s, le16(wb, d), le16(wb, d + 2), sst(isst.toInt))
            case 0x0204 => // Label (inline)
              if (d + 6 > end) throw Bad
              emit(s, le16(wb, d), le16(wb, d + 2),
                readInlineString(wb, d + 6, end))
            case 0x0203 => // Number
              if (d + 14 > end) throw Bad
              emit(s, le16(wb, d), le16(wb, d + 2), numStr(
                java.lang.Double.longBitsToDouble(le64(wb, d + 6))))
            case 0x027E => // RK
              if (d + 10 > end) throw Bad
              emit(s, le16(wb, d), le16(wb, d + 2),
                numStr(rkValue(le32(wb, d + 6).toInt)))
            case 0x00BD => // MulRk
              if (d + 12 > end) throw Bad
              val cnt = (end - d - 6) / 6
              val colFirst = le16(wb, d + 2)
              if (le16(wb, end - 2) != colFirst + cnt - 1) throw Bad
              var k = 0
              while (k < cnt) {
                emit(s, le16(wb, d), colFirst + k,
                  numStr(rkValue(le32(wb, d + 6 + 6 * k).toInt)))
                k += 1
              }
            case 0x0205 => // BoolErr
              if (d + 8 > end) throw Bad
              val v = wb(d + 6) & 0xff
              emit(s, le16(wb, d), le16(wb, d + 2),
                if ((wb(d + 7) & 0xff) == 0) { if (v != 0) "TRUE" else "FALSE" }
                else errName(v))
            case 0x0006 => // Formula: the cached result
              if (d + 16 > end) throw Bad
              val rw = le16(wb, d); val col = le16(wb, d + 2)
              if ((wb(d + 12) & 0xff) == 0xFF && (wb(d + 13) & 0xff) == 0xFF)
                (wb(d + 6) & 0xff) match {
                  case 0 => // string result: the following String record
                    var q = end
                    var qid = recId(q)
                    while (qid == 0x04BC || qid == 0x0221 || qid == 0x0236) {
                      q = recEnd(q); qid = recId(q)
                    }
                    if (qid != 0x0207) throw Bad
                    emit(s, rw, col, readInlineString(wb, q + 4, recEnd(q)))
                  case 1 => emit(s, rw, col,
                    if ((wb(d + 8) & 0xff) != 0) "TRUE" else "FALSE")
                  case 2 => emit(s, rw, col, errName(wb(d + 8) & 0xff))
                  case 3 => emit(s, rw, col, "")
                  case _ => throw Bad
                }
              else emit(s, rw, col, numStr(
                java.lang.Double.longBitsToDouble(le64(wb, d + 6))))
            case _ => ()
          }
          p = end
          id = recId(p)
        }
        s += 1
      }
      new GenericArrayData(out.toArray)
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 16 MiB stream cap, 4M cells. */
  def apply(payload: Column, maxBytes: Int = 1 << 24,
            maxCells: Int = 1 << 22): Column =
    ColumnShim.column(XlsCells(ColumnShim.expression(payload), maxBytes, maxCells))
}
