package graft.functions

import java.util.zip.{DataFormatException, Inflater}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ZIP member content extraction — the step [[graft.ext.Multimodal]]'s
  * `zipMeta` walk stops short of: walk the local file headers
  * (`PK\x03\x04`, the same `pos → pos+30+namelen+extralen+csize`
  * chain) until the entry named `entryName`, then yield its bytes —
  * stored members (method 0) sliced directly, DEFLATE members
  * (method 8) inflated with `Inflater(nowrap)`. This is what turns a
  * crawled OOXML payload into text: `word/document.xml` is one
  * extraction away from the document corpus.
  *
  * FAIL-CLOSED NULL on: non-ZIP payload, malformed/truncated header,
  * any data-descriptor entry encountered before the target (flag bit
  * 3 — csize unknown in the local header, same refusal as zipMeta),
  * unknown compression method, corrupt DEFLATE data, a declared or
  * actual uncompressed size past `maxOut` (bomb guard — rejected,
  * never clipped), inflate output diverging from the declared usize,
  * and entry-not-found. The walk is bounded to `maxEntries` local
  * headers. Per-row bounded work, zero shuffle, codegen'd. */
case class ZipEntryBytes(child: Expression, entryName: String, maxOut: Int,
                         maxEntries: Int)
    extends UnaryExpression {
  require(maxOut > 0, "output cap must be positive")
  require(maxEntries > 0, "entry walk bound must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zip_entry_bytes expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    ZipEntryBytes.compute(a.asInstanceOf[Array[Byte]],
      UTF8String.fromString(entryName), maxOut, maxEntries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nameRef = ctx.addReferenceObj("entryName",
      UTF8String.fromString(entryName), "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ZipEntryBytes.compute($c, $nameRef, $maxOut, $maxEntries);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "zip_entry_bytes"
}

/** [[ZipEntryBytes]] with a PER-ROW member name — the form indirect
  * container formats need: EPUB's `META-INF/container.xml` names the
  * OPF member, so the second extraction's target is data, not a
  * constant. Same walk, same fail-closed contract; a null name is a
  * null result. */
case class ZipEntryBytesAt(left: Expression, right: Expression,
                           maxOut: Int, maxEntries: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(maxOut > 0, "output cap must be positive")
  require(maxEntries > 0, "entry walk bound must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: BinaryType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zip_entry_bytes_at expects (binary, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def nullSafeEval(p: Any, name: Any): Any =
    ZipEntryBytes.compute(p.asInstanceOf[Array[Byte]],
      name.asInstanceOf[UTF8String], maxOut, maxEntries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, nm) => s"""
      ${ev.value} = graft.functions.ZipEntryBytes.compute($p, $nm, $maxOut, $maxEntries);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zip_entry_bytes_at"
}

object ZipEntryBytesAt {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point with a per-row member name. */
  def apply(payload: Column, entryName: Column,
            maxOut: Int = 1 << 24, maxEntries: Int = 1024): Column =
    ColumnShim.column(ZipEntryBytesAt(ColumnShim.expression(payload),
      ColumnShim.expression(entryName), maxOut, maxEntries))
}

object ZipEntryBytes {

  /** The per-row kernel — public static so generated code can call it.
    * `entryName` arrives as UTF8String so the comparison is raw-bytes
    * against the stored name (ZIP names are byte strings; OOXML
    * writers emit ASCII/UTF-8). */
  def compute(bytes: Array[Byte], entryName: UTF8String, maxOut: Int,
              maxEntries: Int): Array[Byte] = {
    val n = bytes.length
    val target = entryName.getBytes
    def le16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    def le32(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    var pos = 0
    var steps = 0
    while (steps < maxEntries) {
      steps += 1
      if (pos < 0 || pos + 4 > n) return null
      val sig = le32(pos)
      if (sig != 0x04034b50L) return null // central dir / EOCD / junk: not found
      if (pos + 30 > n) return null
      val flags = le16(pos + 6)
      val method = le16(pos + 8)
      val csize = le32(pos + 18)
      val usize = le32(pos + 22)
      val nlen = le16(pos + 26)
      val elen = le16(pos + 28)
      if ((flags & 8) != 0) return null // data descriptor: csize unknown
      val dataStart = pos + 30 + nlen + elen
      if (dataStart.toLong + csize > n) return null
      val isTarget = nlen == target.length && {
        var i = 0
        var eq = true
        while (eq && i < nlen) {
          if (bytes(pos + 30 + i) != target(i)) eq = false
          i += 1
        }
        eq
      }
      if (isTarget) {
        if (usize > maxOut) return null // declared bomb
        if (method == 0) {
          if (csize != usize) return null
          return java.util.Arrays.copyOfRange(bytes, dataStart,
            dataStart + csize.toInt)
        }
        if (method != 8) return null
        if (usize == 0) return Array.empty[Byte] // empty member
        val inf = new Inflater(true)
        try {
          inf.setInput(bytes, dataStart, csize.toInt)
          val out = new Array[Byte](usize.toInt)
          var total = 0
          while (total < out.length && !inf.finished()) {
            val got = inf.inflate(out, total, out.length - total)
            if (got == 0 && !inf.finished()) return null // truncated
            total += got
          }
          // the member must inflate to EXACTLY the declared size
          if (total != usize || !inf.finished()) return null
          return out
        } catch {
          case _: DataFormatException => return null
          case _: ArrayIndexOutOfBoundsException => return null
        } finally inf.end()
      }
      pos = dataStart + csize.toInt
    }
    null // walk bound exhausted
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; `maxOut` defaults to 16 MiB, the
    * header walk to 1024 entries. */
  def apply(payload: Column, entryName: String,
            maxOut: Int = 1 << 24, maxEntries: Int = 1024): Column =
    ColumnShim.column(
      ZipEntryBytes(ColumnShim.expression(payload), entryName, maxOut,
        maxEntries))
}
