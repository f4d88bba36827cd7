package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** FLAC Vorbis-comment extraction — [[Id3TextFrames]]' sibling for
  * the lossless tier (titles/artists/albums of a FLAC corpus):
  * `fLaC` magic, then the metadata-block walk (1-byte last-flag +
  * type, 24-bit big-endian length) to the VORBIS_COMMENT block
  * (type 4), whose payload is the public Vorbis comment spec —
  * little-endian vendor length + vendor, a little-endian count, then
  * per comment a little-endian length and a `KEY=value` UTF-8
  * string. Keys are ASCII-uppercased (the spec makes them
  * case-insensitive; normalizing makes TITLE/Title/title group);
  * values stay verbatim. Comments without `=` are skipped, not
  * fatal. Output `(key, value)` in comment order.
  *
  * FAIL-CLOSED NULL for non-FLAC payloads, a block or comment
  * running past the payload, invalid UTF-8 in a comment (the
  * [[Utf8Text]] rules), or more than `maxTags` comments; a FLAC
  * without the block yields an EMPTY array (a real file, just
  * untagged). Per-row bounded work, zero shuffle, codegen'd. */
case class FlacTags(child: Expression, maxTags: Int)
    extends UnaryExpression {
  require(maxTags > 0, "tag cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"flac_tags expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    FlacTags.compute(a.asInstanceOf[Array[Byte]], maxTags)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.FlacTags.compute($c, $maxTags);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "flac_tags"
}

object FlacTags {

  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte], maxTags: Int): GenericArrayData = {
    try {
      if (b == null || b.length < 8) return null
      if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C')
        return null
      var p = 4
      var last = false
      var vcAt = -1
      var vcLen = 0L
      while (!last) {
        if (p + 4 > b.length) return null
        val head = b(p) & 0xff
        last = (head & 0x80) != 0
        val tpe = head & 0x7f
        val len = ((b(p + 1) & 0xffL) << 16) | ((b(p + 2) & 0xffL) << 8) |
          (b(p + 3) & 0xffL)
        if (p + 4 + len > b.length) return null
        if (tpe == 4 && vcAt < 0) { vcAt = p + 4; vcLen = len }
        p += 4 + len.toInt
      }
      if (vcAt < 0) return new GenericArrayData(Array.empty[Any])
      val out = parseVorbisComments(b, vcAt, vcAt + vcLen.toInt, maxTags)
      if (out == null) return null
      new GenericArrayData(out.toArray)
    } catch {
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }
  }

  /** The public Vorbis-comment structure at `b[start,end)` — shared
    * by FLAC's VORBIS_COMMENT block and Ogg's Vorbis/Opus comment
    * headers: LE vendor length + vendor, LE count, then per comment a
    * LE length and a `KEY=value` UTF-8 string. Keys ASCII-uppercased,
    * `=`-less comments skipped. Null on any malformed shape. */
  private[functions] def parseVorbisComments(
      b: Array[Byte], start: Int, end: Int,
      maxTags: Int): java.util.ArrayList[Any] = {
    var q = start
    if (q + 4 > end) return null
    val vlen = le32(b, q)
    q += 4
    if (vlen < 0 || q + vlen > end) return null
    q += vlen.toInt
    if (q + 4 > end) return null
    val count = le32(b, q)
    q += 4
    if (count < 0 || count > maxTags) return null
    val out = new java.util.ArrayList[Any]
    var i = 0L
    while (i < count) {
      if (q + 4 > end) return null
      val clen = le32(b, q)
      q += 4
      if (clen < 0 || q + clen > end) return null
      val s = Utf8Text.compute(
        java.util.Arrays.copyOfRange(b, q, q + clen.toInt))
      if (s == null) return null // a comment must be UTF-8 per spec
      val text = s.toString
      val eq = text.indexOf('=')
      if (eq > 0) {
        val key = new java.lang.StringBuilder
        var k = 0
        while (k < eq) {
          val c = text.charAt(k)
          key.append(if (c >= 'a' && c <= 'z') (c - 32).toChar else c)
          k += 1
        }
        out.add(new GenericInternalRow(Array[Any](
          UTF8String.fromString(key.toString),
          UTF8String.fromString(text.substring(eq + 1)))))
      }
      q += clen.toInt
      i += 1
    }
    out
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 4096-comment cap. */
  def apply(payload: Column, maxTags: Int = 4096): Column =
    ColumnShim.column(FlacTags(ColumnShim.expression(payload), maxTags))
}
