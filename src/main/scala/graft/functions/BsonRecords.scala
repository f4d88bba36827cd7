package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BSON dump decoding — MongoDB's `mongodump` ships `.bson` files of
  * back-to-back BSON documents (the BSON spec is public), a standard
  * source of chat/comment/forum corpora. Each top-level document
  * renders as one JSON object, so dumps ingest exactly like
  * [[AvroRecordsJson]]'s `.avro` path: `binaryFile → bson_records →
  * explode → from_json` (schema via the engine's `jsonInferSchema` —
  * BSON carries no schema of its own).
  *
  * Full element coverage from the spec: double, string, embedded
  * document, array (rendered as a JSON array, its `"0","1",…` keys
  * by POSITION per the spec), binary (hex string + subtype ignored,
  * documented), ObjectId (24-hex string), bool, UTC datetime
  * (epoch-millis integer), null, regex (`/pattern/options` string),
  * JS code (string), int32/int64 (integers), timestamp (integer),
  * decimal128 (32-hex string — not arithmetic-decoded, documented),
  * min/max keys (null). Deprecated types (undefined, DBPointer,
  * symbol, code-with-scope) are REFUSED — fail-closed beats a wrong
  * guess on a format nobody writes anymore.
  *
  * FAIL-CLOSED NULL on: a document length not matching its
  * terminator, any element running past its document, unknown type
  * bytes, nesting past 128, more than `maxRecords` documents or
  * `maxOut` output chars. Per-row bounded work, zero shuffle,
  * codegen'd. */
case class BsonRecords(child: Expression, maxRecords: Int, maxOut: Int)
    extends UnaryExpression {
  require(maxRecords > 0 && maxOut > 0, "bounds must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bson_records expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    BsonRecords.compute(a.asInstanceOf[Array[Byte]], maxRecords, maxOut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BsonRecords.compute($c, $maxRecords, $maxOut);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bson_records"
}

object BsonRecords {

  private object Bad extends Exception with scala.util.control.NoStackTrace

  private def le32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  private def le64(b: Array[Byte], p: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
    v
  }

  private def appendJsonString(out: java.lang.StringBuilder, s: String): Unit = {
    out.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => out.append("\\\"")
        case '\\' => out.append("\\\\")
        case '\n' => out.append("\\n")
        case '\r' => out.append("\\r")
        case '\t' => out.append("\\t")
        case '\b' => out.append("\\b")
        case '\f' => out.append("\\f")
        case cc if cc < ' ' => out.append(f"\\u${cc.toInt}%04x")
        case cc => out.append(cc)
      }
      i += 1
    }
    out.append('"')
  }

  private def appendHex(out: java.lang.StringBuilder, b: Array[Byte],
                        from: Int, len: Int): Unit = {
    out.append('"')
    var i = 0
    while (i < len) {
      out.append(f"${b(from + i) & 0xff}%02x")
      i += 1
    }
    out.append('"')
  }

  private def appendDouble(out: java.lang.StringBuilder, d: Double): Unit =
    if (java.lang.Double.isNaN(d)) out.append("\"NaN\"")
    else if (d == java.lang.Double.POSITIVE_INFINITY) out.append("\"Infinity\"")
    else if (d == java.lang.Double.NEGATIVE_INFINITY) out.append("\"-Infinity\"")
    else if (d == math.rint(d) && math.abs(d) < 1e15) out.append(d.toLong)
    else out.append(d)

  /** One document at b(p0): renders into `out`, returns the index
    * past the document. `asArray` renders JSON array syntax (keys by
    * position, the spec's array contract). */
  private def document(b: Array[Byte], p0: Int, out: java.lang.StringBuilder,
                       asArray: Boolean, maxOut: Int, depth: Int): Int = {
    if (depth > 128) throw Bad
    if (out.length > maxOut) throw Bad
    if (p0 + 5 > b.length) throw Bad
    val len = le32(b, p0)
    val end = p0 + len
    if (len < 5 || end > b.length || b(end - 1) != 0) throw Bad
    out.append(if (asArray) '[' else '{')
    var p = p0 + 4
    var first = true
    while (p < end - 1) {
      val t = b(p) & 0xff
      p += 1
      val nameStart = p
      while (p < end - 1 && b(p) != 0) p += 1
      if (p >= end - 1) throw Bad
      val name = new String(b, nameStart, p - nameStart,
        java.nio.charset.StandardCharsets.UTF_8)
      p += 1
      if (!first) out.append(',')
      first = false
      if (!asArray) {
        appendJsonString(out, name)
        out.append(':')
      }
      def str(): String = {
        if (p + 4 > end) throw Bad
        val sl = le32(b, p)
        if (sl < 1 || p + 4 + sl > end || b(p + 4 + sl - 1) != 0) throw Bad
        val s = new String(b, p + 4, sl - 1,
          java.nio.charset.StandardCharsets.UTF_8)
        p += 4 + sl
        s
      }
      def cstr(): String = {
        val s0 = p
        while (p < end && b(p) != 0) p += 1
        if (p >= end) throw Bad
        val s = new String(b, s0, p - s0,
          java.nio.charset.StandardCharsets.UTF_8)
        p += 1
        s
      }
      t match {
        case 0x01 => // double
          if (p + 8 > end) throw Bad
          appendDouble(out, java.lang.Double.longBitsToDouble(le64(b, p)))
          p += 8
        case 0x02 => appendJsonString(out, str())
        case 0x03 => p = document(b, p, out, asArray = false, maxOut, depth + 1)
        case 0x04 => p = document(b, p, out, asArray = true, maxOut, depth + 1)
        case 0x05 => // binary: int32 len, subtype, bytes → hex string
          if (p + 5 > end) throw Bad
          val bl = le32(b, p)
          if (bl < 0 || p + 5 + bl > end) throw Bad
          appendHex(out, b, p + 5, bl)
          p += 5 + bl
        case 0x07 => // ObjectId
          if (p + 12 > end) throw Bad
          appendHex(out, b, p, 12)
          p += 12
        case 0x08 =>
          if (p + 1 > end) throw Bad
          val v = b(p)
          if (v != 0 && v != 1) throw Bad
          out.append(if (v == 1) "true" else "false")
          p += 1
        case 0x09 | 0x11 | 0x12 => // datetime / timestamp / int64
          if (p + 8 > end) throw Bad
          out.append(le64(b, p))
          p += 8
        case 0x0A => out.append("null")
        case 0x0B => // regex: /pattern/options
          val pat = cstr(); val opts = cstr()
          appendJsonString(out, "/" + pat + "/" + opts)
        case 0x0D => appendJsonString(out, str()) // JS code
        case 0x10 =>
          if (p + 4 > end) throw Bad
          out.append(le32(b, p))
          p += 4
        case 0x13 => // decimal128: 32-hex, not arithmetic-decoded
          if (p + 16 > end) throw Bad
          appendHex(out, b, p, 16)
          p += 16
        case 0xFF | 0x7F => out.append("null") // min/max keys
        case _ => throw Bad // deprecated/unknown types: refuse
      }
    }
    if (p != end - 1) throw Bad
    out.append(if (asArray) ']' else '}')
    end
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], maxRecords: Int,
              maxOut: Int): GenericArrayData = {
    try {
      val out = new java.util.ArrayList[Any]
      var p = 0
      var totalChars = 0L
      while (p < bytes.length) {
        if (out.size() >= maxRecords) throw Bad
        val sb = new java.lang.StringBuilder
        p = document(bytes, p, sb, asArray = false, maxOut, 0)
        totalChars += sb.length
        if (totalChars > maxOut) throw Bad
        out.add(UTF8String.fromString(sb.toString))
      }
      if (out.isEmpty) return null // not a BSON payload at all
      new GenericArrayData(out.toArray)
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 1M documents / 64 MiB output default. */
  def apply(payload: Column, maxRecords: Int = 1 << 20,
            maxOut: Int = 1 << 26): Column =
    ColumnShim.column(
      BsonRecords(ColumnShim.expression(payload), maxRecords, maxOut))
}
