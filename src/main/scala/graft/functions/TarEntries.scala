package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TAR (ustar) archive walk — the container code corpora actually
  * arrive in (release tarballs, `git archive` output): 512-byte
  * headers walked `pos → pos + 512 + ⌈size/512⌉·512`, each yielding
  * `(name, offset, size, typeflag)` where `offset` points at the
  * entry's DATA — tar stores bytes uncompressed, so extraction is a
  * plain `substr(payload, offset+1, size)` on the caller's side, no
  * second kernel needed. Long names resolve ALL THREE ways tars spell
  * them: GNU `L` records (data = the NEXT entry's name,
  * NUL-stripped), POSIX PAX `x` headers (`len key=value\n`
  * records, the `path=` key overriding the next entry's name; other
  * keys ignored, malformed records fail the archive) — neither
  * record surfaces itself — and the plain-ustar split-path form
  * (bsdtar/python-tarfile ustar mode: `prefix(155) + '/' + name`),
  * honored only when the ustar magic is present. Global `g` headers still surface verbatim
  * with their typeflag (callers filter on `typeflag = '0'` for
  * regular files; `5` directories, `2` symlinks keep their flags).
  *
  * Integrity: every header's checksum field is VERIFIED (sum of
  * header bytes with the checksum field read as spaces — the ustar
  * rule); a bad checksum, malformed octal size, truncated header or
  * data running past the payload fails the WHOLE row closed to null
  * (the [[GunzipMembers]] corrupt-archive contract). The walk stops
  * cleanly at the two-zero-block terminator or end of payload, and
  * is bounded by `maxEntries`. Per-row bounded work, zero shuffle,
  * codegen'd. */
case class TarEntries(child: Expression, maxEntries: Int)
    extends UnaryExpression {
  require(maxEntries > 0, "entry walk bound must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tar_entries expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("typeflag", StringType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    TarEntries.compute(a.asInstanceOf[Array[Byte]], maxEntries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TarEntries.compute($c, $maxEntries);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "tar_entries"
}

object TarEntries {

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], maxEntries: Int): GenericArrayData = {
    val n = bytes.length
    val out = new java.util.ArrayList[Any]
    var pos = 0
    var steps = 0
    var pendingLongName: String = null
    while (pos + 512 <= n) {
      // terminator: an all-zero block ends the archive (checked
      // before the walk bound — the terminator is not an entry)
      var allZero = true
      var z = pos
      while (allZero && z < pos + 512) {
        if (bytes(z) != 0) allZero = false
        z += 1
      }
      if (allZero) // anything after the terminator is blocking-factor
        return new GenericArrayData(out.toArray) // padding — ignored
      if (steps >= maxEntries) return null
      steps += 1
      // checksum: sum of header bytes, the 8-byte field at 148 as spaces
      var sum = 0L
      var i = pos
      while (i < pos + 512) {
        sum += (if (i - pos >= 148 && i - pos < 156) 32
          else bytes(i) & 0xff)
        i += 1
      }
      val declared = octal(bytes, pos + 148, 8)
      if (declared < 0 || declared != sum) return null
      val name = cString(bytes, pos, 100)
      if (name.isEmpty) return null
      val size = octal(bytes, pos + 124, 12)
      if (size < 0) return null
      val dataStart = pos + 512
      if (dataStart + size > n) return null
      val tf = bytes(pos + 156) match {
        case 0 => "0" // old tars use NUL for regular files
        case b => String.valueOf(b.toChar)
      }
      if (tf == "L") {
        // GNU long-name record: its data names the NEXT entry
        if (size > (1 << 16)) return null
        var len = size.toInt
        while (len > 0 && bytes(dataStart + len - 1) == 0) len -= 1
        pendingLongName = new String(bytes, dataStart, len,
          java.nio.charset.StandardCharsets.UTF_8)
      } else if (tf == "x") {
        // PAX extended header: "len key=value\n" records; a path=
        // record overrides the NEXT entry's name (the POSIX way
        // modern tars spell long names). Record lengths count BYTES
        // (values are UTF-8), so the walk stays on the byte array.
        // Other keys are ignored; malformed records fail the archive.
        if (size > (1 << 16)) return null
        val end = dataStart + size.toInt
        var i = dataStart
        while (i < end) {
          var recLen = 0
          var digits = 0
          while (i < end && bytes(i) >= '0' && bytes(i) <= '9') {
            recLen = recLen * 10 + (bytes(i) - '0'); i += 1; digits += 1
          }
          if (digits == 0 || i >= end || bytes(i) != ' ') return null
          val recStart = i - digits
          val recEnd = recStart + recLen
          if (recLen <= 0 || recEnd > end || bytes(recEnd - 1) != '\n')
            return null
          var eq = i + 1
          while (eq < recEnd && bytes(eq) != '=') eq += 1
          if (eq >= recEnd) return null
          val key = new String(bytes, i + 1, eq - i - 1,
            java.nio.charset.StandardCharsets.UTF_8)
          if (key == "path")
            pendingLongName = new String(bytes, eq + 1, recEnd - 1 - (eq + 1),
              java.nio.charset.StandardCharsets.UTF_8)
          i = recEnd
        }
      } else {
        // POSIX ustar's third long-name spelling: bsdtar/libarchive and
        // python tarfile in ustar mode split 100-255 char paths as
        // prefix(155)+name(100), joined with '/'. Only honored under
        // the EXACT POSIX magic+version "ustar\0" + "00" at 257..262:
        // GNU tar's "ustar  " magic shares the first five bytes but
        // reuses the prefix region for atime/ctime in oldgnu
        // incremental archives — joining those octal strings as a path
        // prefix would fabricate names. An explicit GNU-L/PAX
        // pendingLongName still overrides.
        val ustarName =
          if (bytes(pos + 257) == 'u' && bytes(pos + 258) == 's' &&
            bytes(pos + 259) == 't' && bytes(pos + 260) == 'a' &&
            bytes(pos + 261) == 'r' && bytes(pos + 262) == 0 &&
            bytes(pos + 263) == '0' && bytes(pos + 264) == '0') {
            val prefix = cString(bytes, pos + 345, 155)
            if (prefix.isEmpty) name else prefix + "/" + name
          } else name
        val effName =
          if (pendingLongName != null) pendingLongName else ustarName
        pendingLongName = null
        out.add(new GenericInternalRow(Array[Any](
          UTF8String.fromString(effName), dataStart.toLong, size,
          UTF8String.fromString(tf))))
      }
      pos = dataStart + (((size + 511) / 512) * 512).toInt
    }
    // ran off the end without a full terminator block: accept a clean
    // block-aligned end or pure zero padding (writers differ on how
    // many terminator zeros they emit); anything else — truncated
    // data padding or trailing junk — fails closed
    if (pos > n) null
    else if ((pos until n).forall(bytes(_) == 0))
      new GenericArrayData(out.toArray)
    else null
  }

  /** NUL-terminated string field. */
  private def cString(bytes: Array[Byte], off: Int, max: Int): String = {
    var len = 0
    while (len < max && bytes(off + len) != 0) len += 1
    new String(bytes, off, len, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Octal numeric field (leading spaces/NULs tolerated, value digits,
    * space/NUL terminated); -1 on malformed. */
  private def octal(bytes: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val end = off + len
    while (i < end && (bytes(i) == ' ' || bytes(i) == 0)) i += 1
    var v = 0L
    var digits = 0
    while (i < end && bytes(i) >= '0' && bytes(i) <= '7') {
      v = v * 8 + (bytes(i) - '0'); i += 1; digits += 1
    }
    while (i < end && (bytes(i) == ' ' || bytes(i) == 0)) i += 1
    if (digits == 0 || i != end) -1 else v
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; the walk bound defaults to 65536. */
  def apply(payload: Column, maxEntries: Int = 1 << 16): Column =
    ColumnShim.column(TarEntries(ColumnShim.expression(payload), maxEntries))
}
