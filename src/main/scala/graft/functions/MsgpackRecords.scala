package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MessagePack stream decoding — the third NoSQL interchange next to
  * [[AvroRecordsJson]] and [[BsonRecords]] (the msgpack spec is
  * public): a `.msgpack` dump is back-to-back top-level values; each
  * renders as one JSON text, so dumps ingest through the same
  * `binaryFile → msgpack_records → explode → from_json` path.
  *
  * Full family coverage: positive/negative fixint, all int/uint
  * widths (uint64 past Long range rendered UNSIGNED), float32/64,
  * nil/bool, fixstr/str8/16/32 (UTF-8), bin (hex string), fixext/ext
  * (hex string, type byte ignored — documented), fixarray/array16/32,
  * fixmap/map16/32 (string keys used directly; a NON-string key
  * renders as the JSON text of its value inside quotes, documented —
  * JSON has no non-string keys). The reserved byte 0xc1 refuses.
  *
  * FAIL-CLOSED NULL on: truncation anywhere, reserved bytes, nesting
  * past 128, declared lengths past the buffer, more than `maxRecords`
  * values or `maxOut` output chars, or a stream whose bytes do not
  * tile into whole values. Per-row bounded work, zero shuffle,
  * codegen'd. */
case class MsgpackRecords(child: Expression, maxRecords: Int, maxOut: Int)
    extends UnaryExpression {
  require(maxRecords > 0 && maxOut > 0, "bounds must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"msgpack_records expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    MsgpackRecords.compute(a.asInstanceOf[Array[Byte]], maxRecords, maxOut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MsgpackRecords.compute($c, $maxRecords, $maxOut);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "msgpack_records"
}

object MsgpackRecords {

  private object Bad extends Exception with scala.util.control.NoStackTrace

  private final class Cur(val b: Array[Byte]) {
    var pos = 0
    def u8(): Int = {
      if (pos >= b.length) throw Bad
      val v = b(pos) & 0xff
      pos += 1
      v
    }
    def take(n: Int): Int = {
      if (n < 0 || pos + n > b.length) throw Bad
      val at = pos
      pos += n
      at
    }
    def beUint(n: Int): Long = {
      val at = take(n)
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(at + i) & 0xffL); i += 1 }
      v
    }
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
    while (i < len) { out.append(f"${b(from + i) & 0xff}%02x"); i += 1 }
    out.append('"')
  }

  private def appendDouble(out: java.lang.StringBuilder, d: Double): Unit =
    if (java.lang.Double.isNaN(d)) out.append("\"NaN\"")
    else if (d == java.lang.Double.POSITIVE_INFINITY) out.append("\"Infinity\"")
    else if (d == java.lang.Double.NEGATIVE_INFINITY) out.append("\"-Infinity\"")
    else if (d == math.rint(d) && math.abs(d) < 1e15) out.append(d.toLong)
    else out.append(d)

  private def value(c: Cur, out: java.lang.StringBuilder,
                    maxOut: Int, depth: Int): Unit = {
    if (depth > 128) throw Bad
    if (out.length > maxOut) throw Bad
    val t = c.u8()
    def str(len: Int): Unit = {
      val at = c.take(len)
      appendJsonString(out, new String(c.b, at, len,
        java.nio.charset.StandardCharsets.UTF_8))
    }
    def bin(len: Int): Unit = {
      val at = c.take(len)
      appendHex(out, c.b, at, len)
    }
    def arr(n: Long): Unit = {
      if (n < 0 || n > Int.MaxValue) throw Bad
      out.append('[')
      var i = 0L
      while (i < n) {
        if (i > 0) out.append(',')
        value(c, out, maxOut, depth + 1)
        i += 1
      }
      out.append(']')
    }
    def map(n: Long): Unit = {
      if (n < 0 || n > Int.MaxValue) throw Bad
      out.append('{')
      var i = 0L
      while (i < n) {
        if (i > 0) out.append(',')
        // key: strings render directly; anything else renders as its
        // JSON text wrapped in a string (JSON keys must be strings)
        val kt = if (c.pos < c.b.length) c.b(c.pos) & 0xff else throw Bad
        if ((kt >= 0xa0 && kt <= 0xbf) || kt == 0xd9 || kt == 0xda ||
          kt == 0xdb) value(c, out, maxOut, depth + 1)
        else {
          val tmp = new java.lang.StringBuilder
          value(c, tmp, maxOut, depth + 1)
          appendJsonString(out, tmp.toString)
        }
        out.append(':')
        value(c, out, maxOut, depth + 1)
        i += 1
      }
      out.append('}')
    }
    t match {
      case x if x <= 0x7f => out.append(x) // positive fixint
      case x if x >= 0xe0 => out.append(x - 256) // negative fixint
      case x if x >= 0x80 && x <= 0x8f => map(x & 0x0f)
      case x if x >= 0x90 && x <= 0x9f => arr(x & 0x0f)
      case x if x >= 0xa0 && x <= 0xbf => str(x & 0x1f)
      case 0xc0 => out.append("null")
      case 0xc2 => out.append("false")
      case 0xc3 => out.append("true")
      case 0xc4 => bin(c.beUint(1).toInt)
      case 0xc5 => bin(c.beUint(2).toInt)
      case 0xc6 => bin(c.beUint(4).toInt)
      case 0xc7 => val l = c.beUint(1).toInt; c.u8(); bin(l)
      case 0xc8 => val l = c.beUint(2).toInt; c.u8(); bin(l)
      case 0xc9 => val l = c.beUint(4).toInt; c.u8(); bin(l)
      case 0xca =>
        appendDouble(out, java.lang.Float.intBitsToFloat(
          c.beUint(4).toInt).toDouble)
      case 0xcb =>
        appendDouble(out, java.lang.Double.longBitsToDouble(c.beUint(8)))
      case 0xcc => out.append(c.beUint(1))
      case 0xcd => out.append(c.beUint(2))
      case 0xce => out.append(c.beUint(4))
      case 0xcf =>
        val v = c.beUint(8)
        if (v >= 0) out.append(v)
        else out.append(java.lang.Long.toUnsignedString(v))
      case 0xd0 => out.append(c.beUint(1).toByte.toLong)
      case 0xd1 => out.append(c.beUint(2).toShort.toLong)
      case 0xd2 => out.append(c.beUint(4).toInt.toLong)
      case 0xd3 => out.append(c.beUint(8))
      case 0xd4 => c.u8(); bin(1)
      case 0xd5 => c.u8(); bin(2)
      case 0xd6 => c.u8(); bin(4)
      case 0xd7 => c.u8(); bin(8)
      case 0xd8 => c.u8(); bin(16)
      case 0xd9 => str(c.beUint(1).toInt)
      case 0xda => str(c.beUint(2).toInt)
      case 0xdb => str(c.beUint(4).toInt)
      case 0xdc => arr(c.beUint(2))
      case 0xdd => arr(c.beUint(4))
      case 0xde => map(c.beUint(2))
      case 0xdf => map(c.beUint(4))
      case _ => throw Bad // 0xc1: never used
    }
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], maxRecords: Int,
              maxOut: Int): GenericArrayData = {
    try {
      val c = new Cur(bytes)
      val out = new java.util.ArrayList[Any]
      var totalChars = 0L
      while (c.pos < bytes.length) {
        if (out.size() >= maxRecords) throw Bad
        val sb = new java.lang.StringBuilder
        value(c, sb, maxOut, 0)
        totalChars += sb.length
        if (totalChars > maxOut) throw Bad
        out.add(UTF8String.fromString(sb.toString))
      }
      if (out.isEmpty) return null
      new GenericArrayData(out.toArray)
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 1M values / 64 MiB output default. */
  def apply(payload: Column, maxRecords: Int = 1 << 20,
            maxOut: Int = 1 << 26): Column =
    ColumnShim.column(
      MsgpackRecords(ColumnShim.expression(payload), maxRecords, maxOut))
}
