package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Font-file census — web crawls are full of woff-less raw sfnt fonts
  * (TTF/OTF/TTC) a corpus wants to label and dedup by family: the
  * big-endian sfnt offset table (0x00010000 / `true` TrueType, `OTTO`
  * CFF, `ttcf` collections — censused through their FIRST face with
  * the face count surfaced), the table records bounds-checked, then
  *
  *  - `name`: family (nameID 1) and full name (nameID 4), preferring
  *    the Windows 3/1 UTF-16BE record (any language) and falling
  *    back to the Mac 1/0 latin1 record, exactly the precedence real
  *    font stacks use;
  *  - `maxp`: the glyph count;
  *  - `head`: unitsPerEm, with the 0x5F0F3CF5 magic VERIFIED.
  *
  * Output `(format, n_faces, n_tables, family, full_name, n_glyphs,
  * units_per_em)`; name fields stay null when the record is absent,
  * `n_glyphs`/`units_per_em` require their tables. FAIL-CLOSED NULL:
  * unknown sfnt version, table records or name strings out of
  * bounds, a head table with the wrong magic, table counts past
  * 4096. WOFF/WOFF2 are compressed wrappers, not sfnt — they refuse
  * here (a dedicated unwrapper would be its own kernel). Per-row
  * bounded work, zero shuffle, codegen'd. */
case class FontMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"font_meta expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_faces", IntegerType, nullable = false),
    StructField("n_tables", IntegerType, nullable = false),
    StructField("family", StringType, nullable = true),
    StructField("full_name", StringType, nullable = true),
    StructField("n_glyphs", IntegerType, nullable = true),
    StructField("units_per_em", IntegerType, nullable = true)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    FontMeta.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.FontMeta.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "font_meta"
}

object FontMeta {

  private object Bad extends Exception with scala.util.control.NoStackTrace

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte]): InternalRow = {
    try {
      if (b == null || b.length < 12) return null
      val v = be32(b, 0)
      var format: String = null
      var nFaces = 1
      var face = 0
      if (v == 0x00010000 || v == 0x74727565) format = "ttf"
      else if (v == 0x4f54544f) format = "otf"
      else if (v == 0x74746366) { // ttcf collection
        nFaces = be32(b, 8)
        if (nFaces <= 0 || nFaces > 1024 || b.length < 12 + 4 * nFaces)
          return null
        face = be32(b, 12)
        if (face < 0 || face + 12 > b.length) return null
        val fv = be32(b, face)
        format =
          if (fv == 0x4f54544f) "ttc-otf"
          else if (fv == 0x00010000 || fv == 0x74727565) "ttc"
          else return null
      } else return null

      val nTables = be16(b, face + 4)
      if (nTables <= 0 || nTables > 4096) throw Bad
      if (face + 12 + 16 * nTables > b.length) throw Bad
      var nameOff = -1; var nameLen = -1
      var maxpOff = -1
      var headOff = -1
      var i = 0
      while (i < nTables) {
        val r = face + 12 + 16 * i
        val tag = new String(b, r, 4,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val off = be32(b, r + 8)
        val len = be32(b, r + 12)
        if (off < 0 || len < 0 || off.toLong + len > b.length) throw Bad
        tag match {
          case "name" => nameOff = off; nameLen = len
          case "maxp" => maxpOff = off
          case "head" => headOff = off
          case _ =>
        }
        i += 1
      }
      var family: UTF8String = null
      var fullName: UTF8String = null
      if (nameOff >= 0 && nameLen >= 6) {
        val count = be16(b, nameOff + 2)
        val strBase = nameOff + be16(b, nameOff + 4)
        if (nameOff + 6 + 12 * count <= nameOff + nameLen) {
          def lookup(nameId: Int): UTF8String = {
            var best: UTF8String = null
            var bestScore = -1
            var k = 0
            while (k < count) {
              val r = nameOff + 6 + 12 * k
              val plat = be16(b, r)
              val enc = be16(b, r + 2)
              val nid = be16(b, r + 6)
              val len = be16(b, r + 8)
              val off = strBase + be16(b, r + 10)
              if (nid == nameId && off + len <= b.length) {
                val score =
                  if (plat == 3 && enc == 1) 2
                  else if (plat == 1 && enc == 0) 1
                  else 0
                if (score > bestScore) {
                  best =
                    if (plat == 3)
                      UTF8String.fromString(new String(b, off, len,
                        java.nio.charset.StandardCharsets.UTF_16BE))
                    else
                      UTF8String.fromString(new String(b, off, len,
                        java.nio.charset.StandardCharsets.ISO_8859_1))
                  bestScore = score
                }
              }
              k += 1
            }
            best
          }
          family = lookup(1)
          fullName = lookup(4)
        }
      }
      val nGlyphs: Any =
        if (maxpOff >= 0 && maxpOff + 6 <= b.length)
          Integer.valueOf(be16(b, maxpOff + 4))
        else null
      val unitsPerEm: Any =
        if (headOff >= 0 && headOff + 20 <= b.length) {
          if (be32(b, headOff + 12) != 0x5f0f3cf5) throw Bad
          Integer.valueOf(be16(b, headOff + 18))
        } else null
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(format), nFaces, nTables, family, fullName,
        nGlyphs, unitsPerEm))
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  private def be16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  private def be32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(payload: Column): Column =
    ColumnShim.column(FontMeta(ColumnShim.expression(payload)))
}
