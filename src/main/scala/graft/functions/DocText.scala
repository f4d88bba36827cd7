package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Legacy `.doc` (Word 97–2003 binary, MS-DOC public spec) TEXT
  * extraction — the step [[CfbDirectory]]'s census stops short of:
  * the `WordDocument` stream's FIB names the table stream
  * (`0Table`/`1Table` per the `fWhichTblStm` flag) and locates the
  * Clx (`fcClx`/`lcbClx` in `FibRgFcLcb97`); the Clx's piece table
  * (`Pcdt` → `PlcPcd`) maps every CP run to its file position with
  * the fc bit-30 COMPRESSION flag — compressed pieces are cp1252
  * bytes at `fc/2`, uncompressed pieces UTF-16LE at `fc`. Pieces for
  * the MAIN document range (`ccpText`) concatenate in CP order;
  * Word's control characters normalize the corpus way (CR and
  * vertical tab → newline, cell/row marks → tab/newline, field and
  * other control bytes drop). Both streams extract through the
  * bounded FAT/miniFAT walks (small table streams really do live in
  * the mini stream).
  *
  * FAIL-CLOSED NULL on: anything [[CfbDirectory]] refuses, a payload
  * without a `WordDocument` stream (an `.xls`/`.ppt` census row is
  * not a Word document), a FIB without the 0xA5EC magic, an
  * encrypted document (`fEncrypted` — refusal, never a guess), a
  * Clx whose piece table is malformed or whose pieces point outside
  * the stream, output past `maxOut`. Per-row bounded work, zero
  * shuffle, codegen'd. */
case class DocTextExtract(child: Expression, maxOut: Int)
    extends UnaryExpression {
  require(maxOut > 0, "output cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"doc_text expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    DocTextExtract.compute(a.asInstanceOf[Array[Byte]], maxOut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.DocTextExtract.compute($c, $maxOut);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "doc_text"
}

object DocTextExtract {

  import CfbDirectory.{Bad, le16, le32}

  /** Word control characters → corpus text: CR and vertical tab are
    * paragraph/line breaks, 0x07 ends table cells/rows, field
    * machinery (0x13/0x14/0x15) and the rest of C0 drop. */
  private def normalize(sb: java.lang.StringBuilder): String = {
    val out = new java.lang.StringBuilder(sb.length)
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == '\r' || c == 0x0b) out.append('\n')
      else if (c == 0x07) out.append('\t')
      else if (c == '\t' || c == '\n' || c >= 0x20) out.append(c)
      i += 1
    }
    out.toString
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], maxOut: Int): UTF8String = {
    try {
      val cfb = CfbDirectory.parse(bytes, 1 << 16)
      val word = cfb.stream("WordDocument", maxOut)
      if (word == null || word.length < 0x200) return null
      if (le16(word, 0) != 0xA5EC) return null // wIdent
      val flags = le16(word, 0x0A)
      if ((flags & 0x0100) != 0) return null // fEncrypted: refuse
      val tableName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
      val ccpText = le32(word, 0x004C) // FibRgLw97.ccpText
      if (ccpText < 0 || ccpText > maxOut) return null
      val fcClx = le32(word, 0x01A2)
      val lcbClx = le32(word, 0x01A6)
      if (lcbClx <= 0) return null
      val table = cfb.stream(tableName, maxOut)
      if (table == null) return null
      if (fcClx < 0 || fcClx + lcbClx > table.length) return null
      // Clx: RgPrc (clxt=1 blocks) then Pcdt (clxt=2 + lcb + PlcPcd)
      var p = fcClx.toInt
      val clxEnd = (fcClx + lcbClx).toInt
      while (p < clxEnd && table(p) == 1) {
        if (p + 3 > clxEnd) throw Bad
        val cb = le16(table, p + 1)
        p += 3 + cb
      }
      if (p >= clxEnd || table(p) != 2) throw Bad
      val lcb = le32(table, p + 1)
      p += 5
      if (lcb < 4 || p + lcb > clxEnd) throw Bad
      val nPieces = ((lcb - 4) / 12).toInt
      if (nPieces <= 0 || (nPieces + 1) * 4L + nPieces * 8L != lcb)
        throw Bad
      val cpOff = p
      val pcdOff = p + (nPieces + 1) * 4
      val sb = new java.lang.StringBuilder()
      var i = 0
      var emitted = 0L
      while (i < nPieces && emitted < ccpText) {
        val cpStart = le32(table, cpOff + 4 * i)
        val cpEnd = le32(table, cpOff + 4 * (i + 1))
        if (cpEnd <= cpStart) throw Bad
        // PCD: flags(2), fc(4), prm(2) — 8 bytes each
        val fcRaw = le32(table, pcdOff + 8 * i + 2)
        val compressed = (fcRaw & 0x40000000L) != 0
        val fc = fcRaw & 0x3FFFFFFFL
        // clamp the last piece to the main-document range
        val take = math.min(cpEnd, ccpText) - cpStart
        if (take > 0) {
          if (emitted + take > maxOut) throw Bad
          if (compressed) {
            val off = fc / 2
            if (off < 0 || off + take > word.length) throw Bad
            sb.append(new String(word, off.toInt, take.toInt,
              java.nio.charset.Charset.forName("windows-1252")))
          } else {
            if (fc < 0 || fc + 2 * take > word.length) throw Bad
            sb.append(new String(word, fc.toInt, 2 * take.toInt,
              java.nio.charset.StandardCharsets.UTF_16LE))
          }
          emitted += take
        }
        i += 1
      }
      if (emitted != ccpText) throw Bad // piece table must cover it
      UTF8String.fromString(normalize(sb))
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; `maxOut` defaults to 16 MiB. */
  def apply(payload: Column, maxOut: Int = 1 << 24): Column =
    ColumnShim.column(DocTextExtract(ColumnShim.expression(payload), maxOut))
}
