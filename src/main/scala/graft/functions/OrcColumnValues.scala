package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native ORC DATA decode — the parquet sibling
  * ([[ParquetPageValues]]) for the other mainstream columnar format:
  * given whole-file bytes and a top-level column name, resolve the
  * column id through the footer's type tree, read stripe 0's footer
  * (streams + column encodings), decompress each needed stream
  * through the chunked codec framing ([[OrcFooterMeta.inflateChunks]]
  * — none/zlib/snappy/lz4/zstd), and decode the values:
  *
  *  - integer family (bigint/int/smallint) via the FULL RLEv2
  *    reader — SHORT_REPEAT, DIRECT, PATCHED_BASE (base + patch-list
  *    high-bit fix-ups) and DELTA (fixed and variable width), with
  *    the closed 5-bit width table and zigzag where the type signs;
  *  - tinyint via byte RLE, boolean via bit-packed byte RLE;
  *  - float/double as little-endian IEEE;
  *  - string/char/varchar/binary in both DIRECT_V2 (LENGTH + DATA)
  *    and DICTIONARY_V2 (LENGTH + DICTIONARY_DATA + index DATA);
  *  - a PRESENT stream (bit-packed byte RLE) restores null slots.
  *
  * Output `(ctype, codec, encoding, n_values, values array<string>)`
  * — values render as strings the census way (ints decimal, floats
  * via shortest round-trip, text verbatim, binary as hex, booleans
  * true/false), null slots stay null. Row materialization capped by
  * `maxVals`; `n_values` is the stripe's row count.
  *
  * Fails closed (null): bad magic, lzo files, date/timestamp/decimal
  * /nested columns, absent column, v0 (RLEv1) encodings, malformed
  * streams. Per-row bounded work, zero shuffle, codegen'd. */
case class OrcColumnValues(child: Expression, column: String, maxVals: Int)
    extends UnaryExpression {
  require(maxVals > 0, "value cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"orc_column_values expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("ctype", StringType, nullable = false),
    StructField("codec", StringType, nullable = false),
    StructField("encoding", StringType, nullable = false),
    StructField("n_values", LongType, nullable = false),
    StructField("values", ArrayType(StringType, containsNull = true),
      nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    OrcColumnValues.compute(a.asInstanceOf[Array[Byte]], column, maxVals)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val colRef = ctx.addReferenceObj("column", column, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.OrcColumnValues.compute($c, $colRef, $maxVals);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "orc_column_values"
}

object OrcColumnValues {
  import OrcFooterMeta.{Bad, Pb, inflateChunks, compressionName}

  private val MaxDecoded = 1 << 26

  /** Smallest CLOSED width >= n (the reference getClosestFixedBits). */
  private def closestWidth(n: Int): Int = {
    if (n <= 24) math.max(1, n)
    else if (n <= 26) 26
    else if (n <= 28) 28
    else if (n <= 30) 30
    else if (n <= 32) 32
    else if (n <= 40) 40
    else if (n <= 48) 48
    else if (n <= 56) 56
    else 64
  }

  /** Closed 5-bit width table (ORC spec): encoded n -> bit width. */
  private def decodeWidth(n: Int): Int =
    if (n >= 0 && n <= 23) n + 1
    else n match {
      case 24 => 26; case 25 => 28; case 26 => 30; case 27 => 32
      case 28 => 40; case 29 => 48; case 30 => 56; case 31 => 64
      case _ => throw Bad
    }

  // ---- primitive bit/byte readers over a decompressed stream ----

  private final class ByteIn(val b: Array[Byte]) {
    var p = 0
    def u8(): Int = {
      if (p >= b.length) throw Bad
      val v = b(p) & 0xff
      p += 1
      v
    }
    def hasMore: Boolean = p < b.length
    /** Base-128 varint, unsigned (little-endian groups). */
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var x = 0
      do {
        if (shift > 63) throw Bad
        x = u8()
        v |= (x & 0x7fL) << shift
        shift += 7
      } while ((x & 0x80) != 0)
      v
    }
    def signedVarint(): Long = { val n = varint(); (n >>> 1) ^ -(n & 1L) }
    /** Big-endian MSB-first bit-packed unsigned values. Widths over
      * 56 bits go bit-serial so the accumulator never overflows. */
    def bits(width: Int, count: Int, out: Array[Long], at: Int): Unit = {
      if (width > 56) {
        var i = 0
        var acc = 0L
        var nbits = 0
        while (i < count) {
          var v = 0L
          var need = width
          while (need > 0) {
            if (nbits == 0) { acc = u8(); nbits = 8 }
            val take = math.min(need, nbits)
            v = (v << take) | ((acc >>> (nbits - take)) &
              ((1L << take) - 1))
            nbits -= take
            need -= take
          }
          out(at + i) = v
          i += 1
        }
        return
      }
      var acc = 0L
      var nbits = 0
      var i = 0
      while (i < count) {
        while (nbits < width) {
          acc = (acc << 8) | u8()
          nbits += 8
        }
        out(at + i) = (acc >>> (nbits - width)) & ((1L << width) - 1)
        nbits -= width
        i += 1
      }
    }
  }

  /** Integer RLEv2: decode exactly `count` (pre-null-restore) longs.
    * `signed` applies zigzag to SHORT_REPEAT/DIRECT elements and
    * varint signing to DELTA bases. */
  private def rleV2(in: ByteIn, count: Int, signed: Boolean): Array[Long] = {
    val out = new Array[Long](count)
    var got = 0
    while (got < count) {
      val h = in.u8()
      (h >>> 6) & 3 match {
        case 0 => // SHORT_REPEAT: 3-bit byte width, 3-bit count
          val w = ((h >>> 3) & 7) + 1
          val run = (h & 7) + 3
          if (got + run > count) throw Bad
          var v = 0L
          var i = 0
          while (i < w) { v = (v << 8) | in.u8(); i += 1 }
          val value = if (signed) (v >>> 1) ^ -(v & 1L) else v
          java.util.Arrays.fill(out, got, got + run, value)
          got += run
        case 1 => // DIRECT: 5-bit width, 9-bit length
          val w = decodeWidth((h >>> 1) & 0x1f)
          val len = (((h & 1) << 8) | in.u8()) + 1
          if (got + len > count) throw Bad
          in.bits(w, len, out, got)
          if (signed) {
            var i = got
            while (i < got + len) {
              out(i) = (out(i) >>> 1) ^ -(out(i) & 1L)
              i += 1
            }
          }
          got += len
        case 2 => // PATCHED_BASE
          val w = decodeWidth((h >>> 1) & 0x1f)
          val len = (((h & 1) << 8) | in.u8()) + 1
          if (got + len > count) throw Bad
          val third = in.u8()
          val bw = ((third >>> 5) & 7) + 1 // base byte width
          val pw = decodeWidth(third & 0x1f) // patch value width
          val fourth = in.u8()
          val pgw = ((fourth >>> 5) & 7) + 1 // patch gap width
          val pll = fourth & 0x1f // patch list length
          var base = 0L
          var i = 0
          while (i < bw) { base = (base << 8) | in.u8(); i += 1 }
          // MSB of the base is its sign bit
          val signBit = 1L << (bw * 8 - 1)
          if ((base & signBit) != 0) base = -(base & (signBit - 1))
          in.bits(w, len, out, got)
          if (pll > 0) {
            // the combined gap+patch entry is rounded UP to the
            // nearest CLOSED width (the reference reader's
            // getClosestFixedBits)
            val pwAligned = closestWidth(pgw + pw)
            val tmpIn = new Array[Long](pll)
            in.bits(pwAligned, pll, tmpIn, 0)
            var idx = got
            var k = 0
            while (k < pll) {
              val gap = (tmpIn(k) >>> pw).toInt
              val patch = tmpIn(k) & ((1L << pw) - 1)
              idx += gap
              if (idx - got >= len) throw Bad
              out(idx) |= patch << w
              k += 1
            }
          }
          i = got
          while (i < got + len) { out(i) += base; i += 1 }
          got += len
        case 3 => // DELTA
          val encW = (h >>> 1) & 0x1f
          val len = (((h & 1) << 8) | in.u8()) + 1
          if (got + len > count) throw Bad
          val base = if (signed) in.signedVarint() else in.varint()
          out(got) = base
          if (len > 1) {
            val deltaBase = in.signedVarint()
            out(got + 1) = base + deltaBase
            if (len > 2) {
              if (encW == 0) { // fixed delta
                var i = 2
                while (i < len) {
                  out(got + i) = out(got + i - 1) + deltaBase
                  i += 1
                }
              } else {
                val w = decodeWidth(encW)
                val deltas = new Array[Long](len - 2)
                in.bits(w, len - 2, deltas, 0)
                val sign = if (deltaBase < 0) -1L else 1L
                var i = 2
                while (i < len) {
                  out(got + i) = out(got + i - 1) + sign * deltas(i - 2)
                  i += 1
                }
              }
            }
          }
          got += len
      }
    }
    out
  }

  /** Byte RLE: runs (control 0..127 -> control+3 copies) and literal
    * groups (control -1..-128 -> -control literals). */
  private def byteRle(in: ByteIn, count: Int): Array[Byte] = {
    val out = new Array[Byte](count)
    var got = 0
    while (got < count) {
      if (in.p >= in.b.length) throw Bad
      val c = in.b(in.p); in.p += 1
      if (c >= 0) {
        val run = c + 3
        if (got + run > count || in.p >= in.b.length) throw Bad
        val v = in.b(in.p); in.p += 1
        java.util.Arrays.fill(out, got, got + run, v)
        got += run
      } else {
        val lit = -c
        if (got + lit > count || in.p + lit > in.b.length) throw Bad
        System.arraycopy(in.b, in.p, out, got, lit)
        in.p += lit
        got += lit
      }
    }
    out
  }

  /** Boolean stream: byte RLE over bit-packed bytes, MSB first. */
  private def boolRle(data: Array[Byte], count: Int): Array[Boolean] = {
    val bytes = byteRle(new ByteIn(data), (count + 7) / 8)
    Array.tabulate(count)(i => ((bytes(i >> 3) >> (7 - (i & 7))) & 1) != 0)
  }

  private def typeName(kind: Int): String = kind match {
    case 0 => "boolean"; case 1 => "tinyint"; case 2 => "smallint"
    case 3 => "int"; case 4 => "bigint"; case 5 => "float"
    case 6 => "double"; case 7 => "string"; case 8 => "binary"
    case 16 => "varchar"; case 17 => "char"
    case _ => "other"
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], column: String, maxVals: Int): InternalRow = {
    try {
      val n = bytes.length
      if (n < 16 || column == null) return null
      if (bytes(0) != 'O' || bytes(1) != 'R' || bytes(2) != 'C') return null
      val psLen = bytes(n - 1) & 0xff
      if (psLen < 4 || n - 1 - psLen < 3) return null
      var footerLen = -1L
      var codec = 0
      locally {
        val ps = new Pb(bytes, n - 1 - psLen, n - 1)
        while (ps.hasMore) {
          val (f, w) = ps.tag()
          (f, w) match {
            case (1, 0) => footerLen = ps.varint()
            case (2, 0) => codec = ps.varint().toInt
            case _ => ps.skip(w)
          }
        }
      }
      if (footerLen <= 0 || codec == 3) return null // lzo: refuse
      // NONE (codec 0) streams carry no chunk framing — plain copy
      def chunks(start: Int, end: Int, maxOut: Int): Array[Byte] = {
        if (start < 0 || end > n || start >= end) throw Bad
        if (codec == 0) {
          if (end - start > maxOut) throw Bad
          java.util.Arrays.copyOfRange(bytes, start, end)
        } else inflateChunks(bytes, start, end, maxOut, codec)
      }
      val fEnd = n - 1 - psLen
      val fStart = fEnd - footerLen.toInt
      if (fStart < 3) return null
      val footer = chunks(fStart, fEnd, 1 << 24)
      // footer: stripes(3), types(4)
      var stripeOff = -1L
      var stripeIdxLen = -1L
      var stripeDataLen = -1L
      var stripeFooterLen = -1L
      var stripeRows = -1L
      var colId = -1
      var colKind = -1
      locally {
        val fb = new Pb(footer, 0, footer.length)
        var typeIdx = 0
        var rootSubtypes: Array[Int] = null
        var rootNames: java.util.ArrayList[String] = null
        val kinds = new java.util.HashMap[Integer, Integer]()
        while (fb.hasMore) {
          val (f, w) = fb.tag()
          (f, w) match {
            case (3, 2) if stripeOff < 0 => // FIRST stripe only
              val len = fb.varint().toInt
              val end = fb.pos + len
              if (len < 0 || end > footer.length) throw Bad
              val sp = new Pb(footer, fb.pos, end)
              fb.pos = end
              while (sp.hasMore) {
                val (sf, sw) = sp.tag()
                (sf, sw) match {
                  case (1, 0) => stripeOff = sp.varint()
                  case (2, 0) => stripeIdxLen = sp.varint()
                  case (3, 0) => stripeDataLen = sp.varint()
                  case (4, 0) => stripeFooterLen = sp.varint()
                  case (5, 0) => stripeRows = sp.varint()
                  case _ => sp.skip(sw)
                }
              }
            case (4, 2) => // one Type
              val len = fb.varint().toInt
              val end = fb.pos + len
              if (len < 0 || end > footer.length) throw Bad
              val tp = new Pb(footer, fb.pos, end)
              fb.pos = end
              var kind = 0
              val subs = new java.util.ArrayList[Integer]()
              val names = new java.util.ArrayList[String]()
              while (tp.hasMore) {
                val (tf, tw) = tp.tag()
                (tf, tw) match {
                  case (1, 0) => kind = tp.varint().toInt
                  case (2, 0) => subs.add(tp.varint().toInt)
                  case (2, 2) => // packed repeated
                    val l2 = tp.varint().toInt
                    val e2 = tp.pos + l2
                    if (l2 < 0 || e2 > footer.length) throw Bad
                    while (tp.pos < e2) subs.add(tp.varint().toInt)
                  case (3, 2) =>
                    val (s2, e2) = tp.lenDelimited()
                    names.add(tp.string(s2, e2))
                  case _ => tp.skip(tw)
                }
              }
              if (typeIdx == 0) {
                if (kind != 12) throw Bad // root must be a struct
                rootSubtypes = Array.tabulate(subs.size())(subs.get(_).toInt)
                rootNames = names
              } else kinds.put(typeIdx, kind)
              typeIdx += 1
            case _ => fb.skip(w)
          }
        }
        if (rootSubtypes == null || rootNames == null) throw Bad
        var i = 0
        while (i < rootNames.size() && colId < 0) {
          if (rootNames.get(i) == column && i < rootSubtypes.length) {
            colId = rootSubtypes(i)
            val k = kinds.get(colId)
            if (k == null) throw Bad
            colKind = k
          }
          i += 1
        }
      }
      if (colId < 0 || stripeOff < 0 || stripeRows < 0) return null
      val ctype = typeName(colKind)
      if (ctype == "other") return null
      // stripe footer: stream layout + column encodings
      val sfStart = (stripeOff + stripeIdxLen + stripeDataLen).toInt
      val sfEnd = sfStart + stripeFooterLen.toInt
      if (sfStart < 0 || sfEnd > n || stripeFooterLen <= 0) return null
      val sfooter = chunks(sfStart, sfEnd, 1 << 24)
      // per-column encoding; streams in declared order carry offsets
      var encKind = -1
      var dictSize = 0
      var presentAt = -1L
      var presentLen = -1L
      var dataAt = -1L
      var dataLen = -1L
      var lengthAt = -1L
      var lengthLen = -1L
      var dictAt = -1L
      var dictLen = -1L
      locally {
        val sb = new Pb(sfooter, 0, sfooter.length)
        var streamOff = stripeOff // index streams first, then data
        var encIdx = 0
        while (sb.hasMore) {
          val (f, w) = sb.tag()
          (f, w) match {
            case (1, 2) => // Stream
              val len = sb.varint().toInt
              val end = sb.pos + len
              if (len < 0 || end > sfooter.length) throw Bad
              val st = new Pb(sfooter, sb.pos, end)
              sb.pos = end
              var kind = 0
              var scol = -1
              var slen = 0L
              while (st.hasMore) {
                val (sf2, sw2) = st.tag()
                (sf2, sw2) match {
                  case (1, 0) => kind = st.varint().toInt
                  case (2, 0) => scol = st.varint().toInt
                  case (3, 0) => slen = st.varint()
                  case _ => st.skip(sw2)
                }
              }
              if (scol == colId) kind match {
                case 0 => presentAt = streamOff; presentLen = slen
                case 1 => dataAt = streamOff; dataLen = slen
                case 2 => lengthAt = streamOff; lengthLen = slen
                case 3 => dictAt = streamOff; dictLen = slen
                case _ => ()
              }
              streamOff += slen
            case (2, 2) => // ColumnEncoding, in column-id order
              val len = sb.varint().toInt
              val end = sb.pos + len
              if (len < 0 || end > sfooter.length) throw Bad
              val ce = new Pb(sfooter, sb.pos, end)
              sb.pos = end
              var k = 0
              var ds = 0
              while (ce.hasMore) {
                val (cf, cw) = ce.tag()
                (cf, cw) match {
                  case (1, 0) => k = ce.varint().toInt
                  case (2, 0) => ds = ce.varint().toInt
                  case _ => ce.skip(cw)
                }
              }
              if (encIdx == colId) { encKind = k; dictSize = ds }
              encIdx += 1
            case _ => sb.skip(w)
          }
        }
      }
      if (dataAt < 0) return null
      // v0 (RLEv1) encodings refuse — DIRECT/DICTIONARY without _V2
      // only matter for int/string; doubles use DIRECT(0) legally
      val intLike = colKind == 2 || colKind == 3 || colKind == 4
      val strLike = colKind == 7 || colKind == 8 || colKind == 16 ||
        colKind == 17
      if ((intLike || strLike) && encKind != 2 && encKind != 3) return null
      if (encKind == 3 && !strLike) return null

      def stream(at: Long, len: Long): Array[Byte] = {
        if (at < 0 || len <= 0 || at + len > n) throw Bad
        chunks(at.toInt, (at + len).toInt, MaxDecoded)
      }
      val rows = stripeRows.toInt
      if (rows < 0 || rows > (1 << 24)) return null
      val present: Array[Boolean] =
        if (presentAt >= 0) boolRle(stream(presentAt, presentLen), rows)
        else null
      var nPresent = rows
      if (present != null) {
        nPresent = 0
        var i = 0
        while (i < rows) { if (present(i)) nPresent += 1; i += 1 }
      }
      val vals: Array[UTF8String] = colKind match {
        case 0 => // boolean
          val bits = boolRle(stream(dataAt, dataLen), nPresent)
          bits.map(v => UTF8String.fromString(if (v) "true" else "false"))
        case 1 => // tinyint: byte RLE, signed bytes
          val bs = byteRle(new ByteIn(stream(dataAt, dataLen)), nPresent)
          bs.map(v => UTF8String.fromString(v.toString))
        case 2 | 3 | 4 =>
          val longs = rleV2(new ByteIn(stream(dataAt, dataLen)), nPresent,
            signed = true)
          longs.map(v => UTF8String.fromString(v.toString))
        case 5 => // float LE
          val d = stream(dataAt, dataLen)
          if (d.length < nPresent * 4) throw Bad
          Array.tabulate(nPresent) { i =>
            var bits = 0
            var k = 0
            while (k < 4) { bits |= (d(4 * i + k) & 0xff) << (8 * k); k += 1 }
            UTF8String.fromString(java.lang.Float.intBitsToFloat(bits).toString)
          }
        case 6 => // double LE
          val d = stream(dataAt, dataLen)
          if (d.length < nPresent * 8) throw Bad
          Array.tabulate(nPresent) { i =>
            var bits = 0L
            var k = 0
            while (k < 8) {
              bits |= (d(8 * i + k) & 0xffL) << (8 * k); k += 1
            }
            UTF8String.fromString(
              java.lang.Double.longBitsToDouble(bits).toString)
          }
        case 7 | 8 | 16 | 17 =>
          val isBinary = colKind == 8
          def render(b: Array[Byte], from: Int, len: Int): UTF8String =
            if (isBinary) {
              val sb2 = new java.lang.StringBuilder(len * 2)
              var k = 0
              while (k < len) {
                sb2.append("%02x".format(b(from + k) & 0xff)); k += 1
              }
              UTF8String.fromString(sb2.toString)
            } else UTF8String.fromBytes(
              java.util.Arrays.copyOfRange(b, from, from + len))
          if (encKind == 2) { // DIRECT_V2
            val lens = rleV2(new ByteIn(stream(lengthAt, lengthLen)),
              nPresent, signed = false)
            val blob = stream(dataAt, dataLen)
            val out = new Array[UTF8String](nPresent)
            var off = 0
            var i = 0
            while (i < nPresent) {
              val l = lens(i).toInt
              if (l < 0 || off + l > blob.length) throw Bad
              out(i) = render(blob, off, l)
              off += l
              i += 1
            }
            out
          } else { // DICTIONARY_V2
            val lens = rleV2(new ByteIn(stream(lengthAt, lengthLen)),
              dictSize, signed = false)
            val blob =
              if (dictLen > 0) stream(dictAt, dictLen) else new Array[Byte](0)
            val dict = new Array[UTF8String](dictSize)
            var off = 0
            var i = 0
            while (i < dictSize) {
              val l = lens(i).toInt
              if (l < 0 || off + l > blob.length) throw Bad
              dict(i) = render(blob, off, l)
              off += l
              i += 1
            }
            val idx = rleV2(new ByteIn(stream(dataAt, dataLen)), nPresent,
              signed = false)
            idx.map { v =>
              if (v < 0 || v >= dictSize) throw Bad
              dict(v.toInt)
            }
          }
        case _ => return null
      }
      // restore null slots
      val out = new java.util.ArrayList[Any]
      var vi = 0
      var i = 0
      while (i < rows && out.size() < maxVals) {
        if (present == null || present(i)) {
          out.add(vals(vi)); vi += 1
        } else out.add(null)
        i += 1
      }
      val encName = encKind match {
        case 0 => "direct"; case 1 => "dictionary"
        case 2 => "direct_v2"; case 3 => "dictionary_v2"
        case _ => "unknown"
      }
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(ctype),
        UTF8String.fromString(compressionName(codec)),
        UTF8String.fromString(encName),
        stripeRows,
        new GenericArrayData(out.toArray)))
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; value materialization capped at
    * 65536 by default. */
  def apply(payload: Column, column: String, maxVals: Int = 1 << 16): Column =
    ColumnShim.column(
      OrcColumnValues(ColumnShim.expression(payload), column, maxVals))
}
