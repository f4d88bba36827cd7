package graft.functions

import java.util.zip.CRC32

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RAR archive HEADER census — RAR4 (1.5–4.x) and RAR5 (5.0+)
  * formats, from the public format documentation (rarlab technotes /
  * the unarchiver notes). Like the 7z tier started: the LISTING is
  * first-class (names, sizes, methods, CRCs, solid/encrypted flags —
  * what a crawl pipeline needs to census an archive corpus);
  * DECOMPRESSION is a documented refusal (the RAR codec family is
  * proprietary — pretending to unpack would be silent corruption).
  *
  * RAR4: 7-byte signature `Rar!\x1a\x07\x00`, then blocks of
  * `HEAD_CRC(u16le) HEAD_TYPE(u8) HEAD_FLAGS(u16le) HEAD_SIZE(u16le)`
  * + type-specific fields. Every visited header's CRC is VERIFIED
  * (low 16 bits of CRC32 over bytes from HEAD_TYPE to the header
  * end). File blocks (0x74) carry pack/unp sizes (+32-bit high parts
  * when flag 0x100), host OS, CRC32, DOS time, method byte
  * (0x30..0x35 → 0..5), and the name (flag 0x200: the unicode form —
  * the ASCII prefix before the NUL separator is taken). Flag 0x04 =
  * encrypted entry, 0x10 = solid; main-header (0x73) flag 0x08 marks
  * a solid ARCHIVE, 0x80 (encrypted headers) REFUSES — names are
  * unreadable, a partial census would lie.
  *
  * RAR5: 8-byte signature `Rar!\x1a\x07\x01\x00`, vint-coded blocks
  * of `CRC32(u32le) HeaderSize(vint) HeaderData` where the CRC covers
  * the HeaderSize field AND the header data (VERIFIED). File headers
  * (type 2) carry file flags (dir / mtime / crc / size-unknown),
  * unpacked size, attributes, optional mtime+crc, compression info
  * (bit 6 solid, bits 7-9 method, bits 10-13 dict), host OS and the
  * UTF-8 name; data size comes from the block's common flags. An
  * archive-encryption header (type 4) REFUSES the whole archive.
  *
  * Output: `(format, solid_archive, entries[])` with per-entry
  * `(name, unpacked_size, packed_size, method, crc32, is_dir, solid,
  * encrypted, host_os, mtime_unix)`. `unpacked_size` is null when
  * RAR5 flags it unknown; `mtime_unix` is RAR5-only (RAR4 stores DOS
  * local time — no honest epoch exists without a timezone).
  * FAIL-CLOSED NULL for: bad magic, any header-CRC mismatch,
  * truncation, vint overruns, encrypted headers, bombs over
  * `maxEntries`. Per-row bounded work, zero shuffle, codegen'd. */
case class RarEntries(child: Expression, maxEntries: Int)
    extends UnaryExpression {
  require(maxEntries > 0, "entry walk bound must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rar_entries expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = RarEntries.schema

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    RarEntries.compute(a.asInstanceOf[Array[Byte]], maxEntries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.RarEntries.compute($c, $maxEntries);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "rar_entries"
}

object RarEntries {

  val entrySchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("unpacked_size", LongType, nullable = true),
    StructField("packed_size", LongType, nullable = false),
    StructField("method", IntegerType, nullable = false),
    StructField("crc32", LongType, nullable = true),
    StructField("is_dir", BooleanType, nullable = false),
    StructField("solid", BooleanType, nullable = false),
    StructField("encrypted", BooleanType, nullable = false),
    StructField("host_os", IntegerType, nullable = false),
    StructField("mtime_unix", LongType, nullable = true)))

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("solid_archive", BooleanType, nullable = false),
    StructField("entries", ArrayType(entrySchema, containsNull = false),
      nullable = false)))

  private object Bad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private def u16(b: Array[Byte], p: Int): Int = {
    if (p + 2 > b.length) throw Bad
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  }

  private def u32(b: Array[Byte], p: Int): Long = {
    if (p + 4 > b.length) throw Bad
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  }

  private def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new CRC32()
    c.update(b, off, len)
    c.getValue
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte], maxEntries: Int): GenericInternalRow = {
    try {
      if (b == null || b.length < 8) return null
      val isR4 = b(0) == 'R' && b(1) == 'a' && b(2) == 'r' && b(3) == '!' &&
        b(4) == 0x1a && b(5) == 0x07 && b(6) == 0x00
      val isR5 = b.length >= 9 && b(0) == 'R' && b(1) == 'a' && b(2) == 'r' &&
        b(3) == '!' && b(4) == 0x1a && b(5) == 0x07 && b(6) == 0x01 &&
        b(7) == 0x00
      if (isR5) rar5(b, maxEntries)
      else if (isR4) rar4(b, maxEntries)
      else null
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  private def result(format: String, solidArchive: Boolean,
                     entries: Seq[GenericInternalRow]): GenericInternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(format), solidArchive,
      new GenericArrayData(entries.toArray[Any])))

  private def entryRow(name: String, unp: Any, packed: Long, method: Int,
                       crc: Any, isDir: Boolean, solid: Boolean,
                       enc: Boolean, hostOs: Int,
                       mtime: Any): GenericInternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(name), unp, packed, method, crc, isDir,
      solid, enc, hostOs, mtime))

  // ---------------- RAR4 ----------------

  private def rar4(b: Array[Byte], maxEntries: Int): GenericInternalRow = {
    var p = 7
    var solidArchive = false
    val out = new scala.collection.mutable.ArrayBuffer[GenericInternalRow]
    var done = false
    while (!done) {
      // the end block is REQUIRED: EOF at a block boundary is
      // indistinguishable from boundary truncation — fail closed
      if (p + 7 > b.length) throw Bad
      locally {
        val headCrc = u16(b, p)
        val headType = b(p + 2) & 0xff
        val flags = u16(b, p + 3)
        val headSize = u16(b, p + 5)
        if (headSize < 7 || p + headSize > b.length) throw Bad
        // CRC over HEAD_TYPE..end of header, low 16 bits
        if ((crc32(b, p + 2, headSize - 2) & 0xffff).toInt != headCrc)
          throw Bad
        var dataSize = 0L
        headType match {
          case 0x73 => // MAIN_HEAD
            if ((flags & 0x0080) != 0) throw Bad // encrypted headers
            solidArchive = (flags & 0x0008) != 0
          case 0x74 => // FILE_HEAD
            if (out.size >= maxEntries) throw Bad
            if (p + 32 > b.length) throw Bad
            val packLo = u32(b, p + 7)
            val unpLo = u32(b, p + 11)
            val hostOs = b(p + 15) & 0xff
            val fileCrc = u32(b, p + 16)
            val method = (b(p + 25) & 0xff) - 0x30
            if (method < 0 || method > 5) throw Bad
            val nameSize = u16(b, p + 26)
            var nameAt = p + 32
            var pack = packLo
            var unp = unpLo
            if ((flags & 0x100) != 0) { // LARGE: 64-bit high parts
              pack |= u32(b, nameAt) << 32
              unp |= u32(b, nameAt + 4) << 32
              nameAt += 8
            }
            if (nameAt + nameSize > p + headSize) throw Bad
            val rawName = new Array[Byte](nameSize)
            System.arraycopy(b, nameAt, rawName, 0, nameSize)
            val name =
              if ((flags & 0x200) != 0) {
                // unicode form: ASCII prefix before the NUL separator
                val z = rawName.indexOf(0: Byte)
                new String(rawName, 0, if (z < 0) nameSize else z,
                  java.nio.charset.StandardCharsets.ISO_8859_1)
              } else new String(rawName,
                java.nio.charset.StandardCharsets.ISO_8859_1)
            if (name.isEmpty) throw Bad
            val isDir = (flags & 0xe0) == 0xe0 // dictionary bits all set
            out += entryRow(name.replace('\\', '/'), unp, pack, method,
              fileCrc, isDir, (flags & 0x10) != 0, (flags & 0x04) != 0,
              hostOs, null)
            dataSize = pack
          case 0x7b => // ENDARC
            done = true
          case _ =>
            // other block kinds (comment, recovery, sub blocks):
            // skip with their ADD_SIZE when the long-block flag is set
            if ((flags & 0x8000) != 0) dataSize = u32(b, p + 7)
        }
        if (!done) {
          val next = p.toLong + headSize + dataSize
          if (next > b.length || next <= p) throw Bad
          p = next.toInt
        }
      }
    }
    result("rar4", solidArchive, out.toSeq)
  }

  // ---------------- RAR5 ----------------

  /** vint: little-endian base-128, high bit continues. */
  private final class R5(b: Array[Byte], var p: Int) {
    def vint(limit: Int): Long = {
      var v = 0L
      var shift = 0
      while (shift < 70) {
        if (p >= limit) throw Bad
        val x = b(p) & 0xff
        p += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      throw Bad
    }
    def u32le(limit: Int): Long = {
      if (p + 4 > limit) throw Bad
      val v = u32(b, p)
      p += 4
      v
    }
  }

  private def rar5(b: Array[Byte], maxEntries: Int): GenericInternalRow = {
    var p = 8
    var solidArchive = false
    val out = new scala.collection.mutable.ArrayBuffer[GenericInternalRow]
    var done = false
    while (!done) {
      // end-of-archive header REQUIRED (same truncation argument)
      if (p + 5 > b.length) throw Bad
      locally {
        val headCrc = u32(b, p)
        val r = new R5(b, p + 4)
        val sizeStart = r.p
        val headerSize = r.vint(b.length)
        val dataStart = r.p
        if (headerSize <= 0 || headerSize > b.length - dataStart) throw Bad
        val headerEnd = dataStart + headerSize.toInt
        // CRC covers the HeaderSize vint AND the header data
        if (crc32(b, sizeStart, headerEnd - sizeStart) != headCrc) throw Bad
        val headType = r.vint(headerEnd)
        val headFlags = r.vint(headerEnd)
        if ((headFlags & 0x0001) != 0) r.vint(headerEnd) // extra size
        var dataSize = 0L
        if ((headFlags & 0x0002) != 0) dataSize = r.vint(headerEnd)
        headType match {
          case 1 => // main archive header
            val archFlags = r.vint(headerEnd)
            solidArchive = (archFlags & 0x0004) != 0
          case 2 => // file header
            if (out.size >= maxEntries) throw Bad
            val fileFlags = r.vint(headerEnd)
            val unpRaw = r.vint(headerEnd)
            r.vint(headerEnd) // attributes
            val mtime: Any =
              if ((fileFlags & 0x0002) != 0)
                java.lang.Long.valueOf(r.u32le(headerEnd)) else null
            val crc: Any =
              if ((fileFlags & 0x0004) != 0)
                java.lang.Long.valueOf(r.u32le(headerEnd)) else null
            val comp = r.vint(headerEnd)
            val hostOs = r.vint(headerEnd).toInt
            val nameLen = r.vint(headerEnd).toInt
            if (nameLen <= 0 || nameLen > 4096 ||
              r.p + nameLen > headerEnd) throw Bad
            val name = new String(b, r.p, nameLen,
              java.nio.charset.StandardCharsets.UTF_8)
            val isDir = (fileFlags & 0x0001) != 0
            val unp: Any =
              if ((fileFlags & 0x0008) != 0) null // size unknown
              else java.lang.Long.valueOf(unpRaw)
            out += entryRow(name, unp, dataSize,
              ((comp >> 7) & 0x7).toInt, crc, isDir,
              (comp & 0x40) != 0, false, hostOs, mtime)
          case 4 => throw Bad // archive encryption: names unreadable
          case 5 => done = true // end of archive
          case _ => () // service/other blocks: skip via sizes
        }
        if (!done) {
          val next = headerEnd.toLong + dataSize
          if (next > b.length || next <= p) throw Bad
          p = next.toInt
        }
      }
    }
    result("rar5", solidArchive, out.toSeq)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; default walk bound 64k entries. */
  def apply(payload: Column, maxEntries: Int = 1 << 16): Column =
    ColumnShim.column(
      RarEntries(ColumnShim.expression(payload), maxEntries))
}
