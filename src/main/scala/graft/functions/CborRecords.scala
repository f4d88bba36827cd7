package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CBOR sequence decoding (RFC 8949 + the RFC 8742 sequence shape) —
  * the fourth self-describing binary next to avro/BSON/MessagePack:
  * back-to-back data items each rendering as one JSON text, the same
  * `binaryFile → cbor_records → explode → from_json` ingestion path.
  *
  * Full major-type coverage: unsigned/negative integers at every
  * width (values past Long range rendered exactly via BigInteger —
  * CBOR negatives reach −2⁶⁴), byte strings (hex, indefinite chunks
  * concatenated; chunks must be definite byte strings per the RFC),
  * text strings (UTF-8, indefinite chunks concatenated), arrays and
  * maps (definite and indefinite with the 0xFF break; non-string map
  * keys render as their JSON text in quotes), TAGS transparently
  * unwrapped (documented — tag semantics like dates stay the
  * carried item's rendering), simple values (false/true/null,
  * undefined → null, other simples as integers), half/single/double
  * floats (the RFC's binary16 decoded by hand).
  *
  * FAIL-CLOSED NULL on: reserved additional-info values 28–30, a
  * break outside an indefinite container, malformed UTF-8 lengths
  * past the buffer, an indefinite string whose chunk is the wrong
  * type, nesting past 128, more than `maxRecords` items or `maxOut`
  * chars, or bytes that do not tile into whole items. Per-row
  * bounded work, zero shuffle, codegen'd. */
case class CborRecords(child: Expression, maxRecords: Int, maxOut: Int)
    extends UnaryExpression {
  require(maxRecords > 0 && maxOut > 0, "bounds must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cbor_records expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    CborRecords.compute(a.asInstanceOf[Array[Byte]], maxRecords, maxOut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CborRecords.compute($c, $maxRecords, $maxOut);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "cbor_records"
}

object CborRecords {

  private object Bad extends Exception with scala.util.control.NoStackTrace

  private final class Cur(val b: Array[Byte]) {
    var pos = 0
    def u8(): Int = {
      if (pos >= b.length) throw Bad
      val v = b(pos) & 0xff
      pos += 1
      v
    }
    def peek(): Int = {
      if (pos >= b.length) throw Bad
      b(pos) & 0xff
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

  private def appendDouble(out: java.lang.StringBuilder, d: Double): Unit =
    if (java.lang.Double.isNaN(d)) out.append("\"NaN\"")
    else if (d == java.lang.Double.POSITIVE_INFINITY) out.append("\"Infinity\"")
    else if (d == java.lang.Double.NEGATIVE_INFINITY) out.append("\"-Infinity\"")
    else if (d == math.rint(d) && math.abs(d) < 1e15) out.append(d.toLong)
    else out.append(d)

  /** RFC 8949's binary16 → double. */
  private def half(bits: Int): Double = {
    val sign = if ((bits & 0x8000) != 0) -1.0 else 1.0
    val exp = (bits >> 10) & 0x1f
    val frac = bits & 0x3ff
    if (exp == 0) sign * frac * math.pow(2, -24)
    else if (exp == 31) {
      if (frac != 0) Double.NaN else sign * Double.PositiveInfinity
    } else sign * (1024 + frac) * math.pow(2, exp - 25)
  }

  private def appendUnsigned(out: java.lang.StringBuilder, v: Long): Unit =
    if (v >= 0) out.append(v)
    else out.append(java.lang.Long.toUnsignedString(v))

  private def appendNegative(out: java.lang.StringBuilder, n: Long): Unit =
    // value = -1 - n with n unsigned 64-bit: exact via BigInteger
    if (n >= 0 && n < Long.MaxValue) out.append(-1L - n)
    else out.append(java.math.BigInteger.valueOf(-1).subtract(
      new java.math.BigInteger(java.lang.Long.toUnsignedString(n))).toString)

  private def isTextHead(t: Int): Boolean = (t >> 5) == 3

  private def value(c: Cur, out: java.lang.StringBuilder,
                    maxOut: Int, depth: Int): Unit = {
    if (depth > 128) throw Bad
    if (out.length > maxOut) throw Bad
    val ib = c.u8()
    val mt = ib >> 5
    val ai = ib & 0x1f
    def argOrIndef(): (Long, Boolean) = ai match {
      case x if x < 24 => (x.toLong, false)
      case 24 => (c.beUint(1), false)
      case 25 => (c.beUint(2), false)
      case 26 => (c.beUint(4), false)
      case 27 => (c.beUint(8), false)
      case 31 => (0L, true)
      case _ => throw Bad // 28-30 reserved
    }
    def lenArg(): Long = {
      val (v, indef) = argOrIndef()
      if (indef) throw Bad
      if (v < 0 || v > Int.MaxValue) throw Bad
      v
    }
    mt match {
      case 0 =>
        val (v, indef) = argOrIndef()
        if (indef) throw Bad
        appendUnsigned(out, v)
      case 1 =>
        val (v, indef) = argOrIndef()
        if (indef) throw Bad
        appendNegative(out, v)
      case 2 | 3 =>
        val (_, indef) = if (ai == 31) (0L, true) else (0L, false)
        if (indef) {
          // indefinite string: definite same-type chunks until break
          val chunks = new java.lang.StringBuilder
          if (mt == 2) chunks.append('"')
          var first = true
          while (c.peek() != 0xff) {
            val ch = c.u8()
            if ((ch >> 5) != mt || (ch & 0x1f) == 31) throw Bad
            val clen = (ch & 0x1f) match {
              case x if x < 24 => x.toLong
              case 24 => c.beUint(1)
              case 25 => c.beUint(2)
              case 26 => c.beUint(4)
              case 27 => c.beUint(8)
              case _ => throw Bad
            }
            if (clen < 0 || clen > Int.MaxValue) throw Bad
            val at = c.take(clen.toInt)
            if (mt == 2) {
              var i = 0
              while (i < clen) {
                chunks.append(f"${c.b(at + i) & 0xff}%02x")
                i += 1
              }
            } else chunks.append(new String(c.b, at, clen.toInt,
              java.nio.charset.StandardCharsets.UTF_8))
            first = false
          }
          c.u8() // the break
          if (mt == 2) { chunks.append('"'); out.append(chunks) }
          else appendJsonString(out, chunks.toString)
        } else {
          val len = (ai match {
            case x if x < 24 => x.toLong
            case 24 => c.beUint(1)
            case 25 => c.beUint(2)
            case 26 => c.beUint(4)
            case 27 => c.beUint(8)
            case _ => throw Bad
          })
          if (len < 0 || len > Int.MaxValue) throw Bad
          val at = c.take(len.toInt)
          if (mt == 2) {
            out.append('"')
            var i = 0
            while (i < len) { out.append(f"${c.b(at + i) & 0xff}%02x"); i += 1 }
            out.append('"')
          } else appendJsonString(out, new String(c.b, at, len.toInt,
            java.nio.charset.StandardCharsets.UTF_8))
        }
      case 4 =>
        val (n, indef) = argOrIndef()
        out.append('[')
        if (indef) {
          var first = true
          while (c.peek() != 0xff) {
            if (!first) out.append(',')
            first = false
            value(c, out, maxOut, depth + 1)
          }
          c.u8()
        } else {
          var i = 0L
          while (i < n) {
            if (i > 0) out.append(',')
            value(c, out, maxOut, depth + 1)
            i += 1
          }
        }
        out.append(']')
      case 5 =>
        val (n, indef) = argOrIndef()
        out.append('{')
        def pair(first: Boolean): Unit = {
          if (!first) out.append(',')
          if (isTextHead(c.peek())) value(c, out, maxOut, depth + 1)
          else {
            val tmp = new java.lang.StringBuilder
            value(c, tmp, maxOut, depth + 1)
            appendJsonString(out, tmp.toString)
          }
          out.append(':')
          value(c, out, maxOut, depth + 1)
        }
        if (indef) {
          var first = true
          while (c.peek() != 0xff) { pair(first); first = false }
          c.u8()
        } else {
          var i = 0L
          while (i < n) { pair(i == 0); i += 1 }
        }
        out.append('}')
      case 6 => // tag: transparently unwrapped
        val (_, indef) = argOrIndef()
        if (indef) throw Bad
        value(c, out, maxOut, depth + 1)
      case 7 => ai match {
        case 20 => out.append("false")
        case 21 => out.append("true")
        case 22 | 23 => out.append("null") // null / undefined
        case 24 =>
          val v = c.beUint(1)
          if (v < 32) throw Bad // RFC: two-byte simples must be ≥ 32
          out.append(v)
        case 25 => appendDouble(out, half(c.beUint(2).toInt))
        case 26 => appendDouble(out,
          java.lang.Float.intBitsToFloat(c.beUint(4).toInt).toDouble)
        case 27 => appendDouble(out,
          java.lang.Double.longBitsToDouble(c.beUint(8)))
        case x if x < 20 => out.append(x) // simple values 0-19
        case _ => throw Bad // 28-30 reserved, 31 = stray break
      }
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

  /** Column-level entry point; 1M items / 64 MiB output default. */
  def apply(payload: Column, maxRecords: Int = 1 << 20,
            maxOut: Int = 1 << 26): Column =
    ColumnShim.column(
      CborRecords(ColumnShim.expression(payload), maxRecords, maxOut))
}
