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

/** CFB/OLE2 compound-file census — the container legacy Office
  * (`.doc`/`.xls`/`.ppt`), MSI and a long tail of Windows-era lake
  * payloads are made of (the MS-CFB format is a public spec): the
  * 512-byte header (signature, version, sector size, FAT/miniFAT
  * geometry), the FAT assembled from the header DIFAT plus any
  * chained DIFAT sectors, and the DIRECTORY chain walked sector by
  * sector into its entries — stream/storage names (UTF-16LE
  * decoded), object types and sizes. That is enough to LABEL a
  * legacy Office payload and census its streams without decoding
  * any of them (WordDocument text extraction is a different tier).
  *
  * Output struct: `(major, sector_size, n_fat_sectors, entries
  * array<(name, otype, start_sector, size)>)` — entries in
  * directory order, unused slots skipped; v3 stream sizes read as
  * their valid low 32 bits per the spec.
  *
  * FAIL-CLOSED NULL on: wrong signature/byte-order mark, a version
  * whose sector shift disagrees with the spec (v3=512, v4=4096),
  * sector ids out of bounds, truncated sectors, malformed name
  * lengths, or chains longer than `maxSectors` (loop guard).
  * Per-row bounded work, zero shuffle, codegen'd. */
case class CfbDirectory(child: Expression, maxSectors: Int)
    extends UnaryExpression {
  require(maxSectors > 0, "sector walk bound must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cfb_directory expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("major", IntegerType, nullable = false),
    StructField("sector_size", IntegerType, nullable = false),
    StructField("n_fat_sectors", IntegerType, nullable = false),
    StructField("entries", ArrayType(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("otype", StringType, nullable = false),
      StructField("start_sector", LongType, nullable = false),
      StructField("size", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    CfbDirectory.compute(a.asInstanceOf[Array[Byte]], maxSectors)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CfbDirectory.compute($c, $maxSectors);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "cfb_directory"
}

object CfbDirectory {

  private[functions] object Bad extends Exception with scala.util.control.NoStackTrace

  private final val Free = 0xFFFFFFFFL
  private final val EndOfChain = 0xFFFFFFFEL
  private final val FatSect = 0xFFFFFFFDL
  private final val DifSect = 0xFFFFFFFCL

  private[functions] def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private[functions] def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def le64(b: Array[Byte], p: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
    v
  }

  private def otypeName(t: Int): String = t match {
    case 1 => "storage"
    case 2 => "stream"
    case 5 => "root"
    case _ => "unknown"
  }

  private[functions] final case class CfbEntry(name: String, otype: Int,
                                               start: Long, size: Long)
  private[functions] final class Parsed(val major: Int, val secSize: Int,
                                        val nFat: Int, val fat: Array[Long],
                                        val miniCutoff: Long,
                                        val firstMiniFat: Long,
                                        val entries: java.util.ArrayList[CfbEntry],
                                        val bytes: Array[Byte],
                                        val maxSectors: Int) {
    def sectorOff(sid: Long): Int = {
      if (sid < 0 || 512 + (sid + 1) * secSize > bytes.length) throw Bad
      (512 + sid * secSize).toInt
    }
    /** Follow a FAT chain, concatenating full sectors, truncated to
      * `size`; bounded and bomb-capped. */
    def fatChain(start: Long, size: Long, maxOut: Int): Array[Byte] = {
      if (size < 0 || size > maxOut) throw Bad
      val out = new Array[Byte](size.toInt)
      var got = 0
      var s = start
      var steps = 0
      while (got < size) {
        if (s == EndOfChain || s == Free) throw Bad // chain too short
        steps += 1
        if (steps > maxSectors) throw Bad
        val off = sectorOff(s)
        val take = math.min(secSize.toLong, size - got).toInt
        System.arraycopy(bytes, off, out, got, take)
        got += take
        if (s >= fat.length) throw Bad
        s = fat(s.toInt)
      }
      out
    }
    /** One stream's bytes: FAT chain for big streams, the root
      * mini-stream + miniFAT for streams under the cutoff. */
    def stream(name: String, maxOut: Int): Array[Byte] = {
      var e: CfbEntry = null
      var i = 0
      while (i < entries.size()) {
        val c = entries.get(i)
        if (c.otype == 2 && c.name == name) { e = c; i = entries.size() }
        i += 1
      }
      if (e == null) return null
      if (e.size >= miniCutoff) return fatChain(e.start, e.size, maxOut)
      // mini stream: the root entry's FAT chain is the container
      var root: CfbEntry = null
      i = 0
      while (i < entries.size()) {
        val c = entries.get(i)
        if (c.otype == 5) { root = c; i = entries.size() }
        i += 1
      }
      if (root == null) throw Bad
      if (root.size > maxOut) throw Bad
      val container = fatChain(root.start, root.size, maxOut)
      // the miniFAT itself is a FAT chain of sectors
      val miniPerSec = secSize / 4
      val miniFat = new java.util.ArrayList[Long]
      var mf = firstMiniFat
      var steps = 0
      while (mf != EndOfChain && mf != Free) {
        steps += 1
        if (steps > maxSectors) throw Bad
        val off = sectorOff(mf)
        var j = 0
        while (j < miniPerSec) {
          miniFat.add(le32(bytes, off + 4 * j))
          j += 1
        }
        if (mf >= fat.length) throw Bad
        mf = fat(mf.toInt)
      }
      if (e.size > maxOut) throw Bad
      val out = new Array[Byte](e.size.toInt)
      var got = 0
      var ms = e.start
      steps = 0
      while (got < e.size) {
        if (ms == EndOfChain || ms == Free) throw Bad
        steps += 1
        if (steps > maxSectors) throw Bad
        val off = ms * 64L
        if (off < 0 || off + 64 > container.length) throw Bad
        val take = math.min(64L, e.size - got).toInt
        System.arraycopy(container, off.toInt, out, got, take)
        got += take
        if (ms >= miniFat.size()) throw Bad
        ms = miniFat.get(ms.toInt)
      }
      out
    }
  }

  /** Shared header/FAT/directory parse behind [[compute]] and the
    * stream-extraction tier; throws Bad / returns null on every
    * malformed shape. */
  private[functions] def parse(bytes: Array[Byte],
                               maxSectors: Int): Parsed = {
    val n = bytes.length
    if (n < 512 + 4) throw Bad
    if (le64(bytes, 0) != 0xE11AB1A1E011CFD0L) throw Bad // signature
    if (le16(bytes, 28) != 0xFFFE) throw Bad // little-endian mark
    val major = le16(bytes, 26)
    val shift = le16(bytes, 30)
    // the spec pins the shift to the version
    if (!((major == 3 && shift == 9) || (major == 4 && shift == 12)))
      throw Bad
    val secSize = 1 << shift
    val perSec = secSize / 4
    def sectorOff(sid: Long): Int = {
      if (sid < 0 || 512 + (sid + 1) * secSize > n) throw Bad
      (512 + sid * secSize).toInt
    }
    val numFat = le32(bytes, 44)
    if (numFat < 0 || numFat > maxSectors) throw Bad
    // FAT sector list: header DIFAT (109 slots) then chained DIFAT
    val fatSectors = new java.util.ArrayList[Long]
    var i = 0
    while (i < 109 && fatSectors.size() < numFat) {
      val v = le32(bytes, 76 + 4 * i)
      if (v != Free) fatSectors.add(v)
      i += 1
    }
    var difat = le32(bytes, 68)
    var difatSteps = 0
    while (difat != EndOfChain && difat != Free &&
      fatSectors.size() < numFat) {
      difatSteps += 1
      if (difatSteps > maxSectors) throw Bad
      val off = sectorOff(difat)
      var j = 0
      while (j < perSec - 1 && fatSectors.size() < numFat) {
        val v = le32(bytes, off + 4 * j)
        if (v != Free) fatSectors.add(v)
        j += 1
      }
      difat = le32(bytes, off + 4 * (perSec - 1))
    }
    if (fatSectors.size() < numFat) throw Bad
    // assemble the FAT
    val fat = new Array[Long](fatSectors.size() * perSec)
    i = 0
    while (i < fatSectors.size()) {
      val off = sectorOff(fatSectors.get(i))
      var j = 0
      while (j < perSec) {
        fat(i * perSec + j) = le32(bytes, off + 4 * j)
        j += 1
      }
      i += 1
    }
    // directory chain
    val entries = new java.util.ArrayList[CfbEntry]
    var dir = le32(bytes, 48)
    var steps = 0
    while (dir != EndOfChain && dir != Free) {
      steps += 1
      if (steps > maxSectors) throw Bad
      val off = sectorOff(dir)
      var e = 0
      while (e < secSize / 128) {
        val p = off + e * 128
        val otype = bytes(p + 66) & 0xff
        if (otype != 0) {
          val nameLen = le16(bytes, p + 64)
          if (nameLen < 2 || nameLen > 64 || (nameLen & 1) != 0) throw Bad
          val name = new String(bytes, p, nameLen - 2,
            java.nio.charset.StandardCharsets.UTF_16LE)
          val start = le32(bytes, p + 116)
          val size0 = le64(bytes, p + 120)
          // v3 writers leave garbage in the high half per the spec
          val size = if (major == 3) size0 & 0xFFFFFFFFL else size0
          entries.add(CfbEntry(name, otype, start, size))
        }
        e += 1
      }
      if (dir >= fat.length) throw Bad
      dir = fat(dir.toInt)
    }
    new Parsed(major, secSize, fatSectors.size(), fat,
      le32(bytes, 56), le32(bytes, 60), entries, bytes, maxSectors)
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], maxSectors: Int): InternalRow = {
    try {
      val p = parse(bytes, maxSectors)
      val out = new java.util.ArrayList[Any]
      var i = 0
      while (i < p.entries.size()) {
        val e = p.entries.get(i)
        out.add(new GenericInternalRow(Array[Any](
          UTF8String.fromString(e.name),
          UTF8String.fromString(otypeName(e.otype)), e.start, e.size)))
        i += 1
      }
      new GenericInternalRow(Array[Any](p.major, p.secSize, p.nFat,
        new GenericArrayData(out.toArray)))
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; the sector walk bound defaults to
    * 65536 (a 32 MiB v3 directory — far past any census need). */
  def apply(payload: Column, maxSectors: Int = 1 << 16): Column =
    ColumnShim.column(CfbDirectory(ColumnShim.expression(payload), maxSectors))
}
