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

/** Arrow IPC FILE data decode — the third member of the
  * columnar-values family next to [[ParquetPageValues]] and
  * [[OrcColumnValues]]: given whole-file bytes and a top-level column
  * name, resolve the field through the footer flatbuffer's Schema
  * (name, type union, bit width, signedness), then walk EVERY
  * record-batch block: the message envelope (both the v5
  * continuation-prefixed and the legacy v4 bare length form), the
  * `RecordBatch` flatbuffer's FieldNode/Buffer struct vectors, and
  * the column's own buffers located by a pre-order walk over the
  * schema's buffer layout (validity+data for fixed-width and bool,
  * validity+offsets+data for utf8/binary).
  *
  * Values render as strings the census way: ints in decimal
  * (unsigned widths via the sign-free reading), floats via the
  * shortest round-trip, utf8 verbatim, binary as lowercase hex,
  * bools true/false; validity bits restore null slots (a zero-length
  * validity buffer with null_count 0 is all-valid, per the spec).
  * Batches concatenate in file order; `n_values` is the exact total
  * row count even when `maxVals` caps materialization.
  *
  * BODY COMPRESSION decodes too — the feather-v2 defaults: a
  * `BodyCompression` of LZ4_FRAME or ZSTD routes every buffer
  * through the repo's own frame codecs (8-byte LE uncompressed-size
  * prefix per buffer, -1 meaning stored raw, output length
  * VERIFIED).
  *
  * FAIL-CLOSED NULL for: bad magics, an absent column,
  * dictionary-encoded fields, nested/list/decimal/temporal types,
  * unknown compression codecs or methods, any buffer or
  * flatbuffer offset escaping its slice, node/buffer counts that
  * disagree with the schema walk. Per-row bounded work, zero
  * shuffle, codegen'd. */
case class ArrowColumnValues(child: Expression, column: String, maxVals: Int)
    extends UnaryExpression {
  require(maxVals > 0, "value cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"arrow_column_values expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("ctype", StringType, nullable = false),
    StructField("n_batches", IntegerType, nullable = false),
    StructField("n_values", LongType, nullable = false),
    StructField("values", ArrayType(StringType, containsNull = true),
      nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    ArrowColumnValues.compute(a.asInstanceOf[Array[Byte]], column, maxVals)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val colRef = ctx.addReferenceObj("column", column, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ArrowColumnValues.compute($c, $colRef, $maxVals);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "arrow_column_values"
}

object ArrowColumnValues {

  private object Bad extends Exception with scala.util.control.NoStackTrace

  /** Field shape: type tag + width info + buffer count. */
  private final class FType(val kind: Int, val bits: Int,
                            val signed: Boolean) {
    // kinds: 0 int, 1 float, 2 utf8, 3 binary, 4 bool
    def nBuffers: Int = kind match {
      case 2 | 3 => 3
      case _ => 2
    }
    def name: String = kind match {
      case 0 => (if (signed) "int" else "uint") + bits
      case 1 => if (bits == 32) "float" else "double"
      case 2 => "utf8"
      case 3 => "binary"
      case _ => "bool"
    }
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], column: String, maxVals: Int): InternalRow = {
    try {
      if (bytes == null || column == null) return null
      val n = bytes.length
      if (n < 8 + 10) return null
      val head = Array[Byte]('A', 'R', 'R', 'O', 'W', '1', 0, 0)
      var i = 0
      while (i < 8) { if (bytes(i) != head(i)) return null; i += 1 }
      i = 0
      while (i < 6) {
        if (bytes(n - 6 + i) != "ARROW1".charAt(i).toByte) return null
        i += 1
      }
      def le16(p: Int): Int = {
        if (p < 0 || p + 2 > n) throw Bad
        (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      }
      def le32(p: Int): Int = {
        if (p < 0 || p + 4 > n) throw Bad
        (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
          ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)
      }
      def le64(p: Int): Long = {
        if (p < 0 || p + 8 > n) throw Bad
        var v = 0L
        var k = 7
        while (k >= 0) { v = (v << 8) | (bytes(p + k) & 0xffL); k -= 1 }
        v
      }
      // generic flatbuffer table access bounded by [lo, hi)
      def fieldPos(table: Int, id: Int, lo: Int, hi: Int): Int = {
        if (table < lo || table >= hi) throw Bad
        val vt = table - le32(table)
        if (vt < lo || vt >= hi) throw Bad
        val vtSize = le16(vt)
        val slot = 4 + 2 * id
        if (slot + 2 > vtSize) return 0
        val off = le16(vt + slot)
        if (off == 0) 0 else table + off
      }
      def indirect(p: Int, lo: Int, hi: Int): Int = {
        if (p < lo || p >= hi) throw Bad
        val t = p + le32(p)
        if (t < lo || t >= hi) throw Bad
        t
      }
      def str(p: Int, lo: Int, hi: Int): String = {
        val s = indirect(p, lo, hi)
        val len = le32(s)
        if (len < 0 || s + 4 + len > hi) throw Bad
        new String(bytes, s + 4, len,
          java.nio.charset.StandardCharsets.UTF_8)
      }

      val footerLen = le32(n - 10)
      val fLo = n - 10 - footerLen
      val fHi = n - 10
      if (footerLen <= 0 || fLo < 8) return null
      val root = indirect(fLo, fLo, fHi)

      // ---- schema: field list with types, find the target --------
      val sp = fieldPos(root, 1, fLo, fHi)
      if (sp == 0) return null
      val schema = indirect(sp, fLo, fHi)
      val fieldsP = fieldPos(schema, 1, fLo, fHi)
      if (fieldsP == 0) return null
      val fvec = indirect(fieldsP, fLo, fHi)
      val nFields = le32(fvec)
      if (nFields < 0 || nFields > 4096) throw Bad
      val ftypes = new Array[FType](nFields)
      var target = -1
      i = 0
      while (i < nFields) {
        val ft = indirect(fvec + 4 + 4 * i, fLo, fHi)
        val namP = fieldPos(ft, 0, fLo, fHi)
        val nam = if (namP == 0) "" else str(namP, fLo, fHi)
        // dictionary-encoded (slot 4) or children (slot 5 non-empty):
        // unsupported shapes only matter for the TARGET column, but a
        // nested field changes the buffer pre-order — refuse globally
        val dictP = fieldPos(ft, 4, fLo, fHi)
        val chP = fieldPos(ft, 5, fLo, fHi)
        val nCh = if (chP == 0) 0 else le32(indirect(chP, fLo, fHi))
        if (dictP != 0 || nCh != 0) throw Bad
        val tt = fieldPos(ft, 2, fLo, fHi) // type_type union byte
        val tTag = if (tt == 0) 0 else bytes(tt) & 0xff
        val tp = fieldPos(ft, 3, fLo, fHi)
        val ftype = tTag match {
          case 2 => // Int: bitWidth(0), is_signed(1)
            val t = indirect(tp, fLo, fHi)
            val bwP = fieldPos(t, 0, fLo, fHi)
            val bw = if (bwP == 0) 0 else le32(bwP)
            val sgP = fieldPos(t, 1, fLo, fHi)
            val sg = sgP != 0 && bytes(sgP) != 0
            if (bw != 8 && bw != 16 && bw != 32 && bw != 64) throw Bad
            new FType(0, bw, sg)
          case 3 => // FloatingPoint: precision(0) 1=single 2=double
            val t = indirect(tp, fLo, fHi)
            val prP = fieldPos(t, 0, fLo, fHi)
            val pr = if (prP == 0) 0 else le16(prP)
            if (pr != 1 && pr != 2) throw Bad
            new FType(1, if (pr == 1) 32 else 64, signed = true)
          case 4 => new FType(3, 0, signed = false) // Binary
          case 5 => new FType(2, 0, signed = false) // Utf8
          case 6 => new FType(4, 1, signed = false) // Bool
          case _ => null // unsupported type
        }
        ftypes(i) = ftype
        if (nam == column) {
          if (ftype == null) throw Bad
          target = i
        }
        i += 1
      }
      if (target < 0) return null
      // any unsupported field BEFORE the target breaks buffer order
      i = 0
      while (i < target) { if (ftypes(i) == null) throw Bad; i += 1 }
      val tType = ftypes(target)

      // ---- record-batch blocks -----------------------------------
      val rbP = fieldPos(root, 3, fLo, fHi)
      val out = new java.util.ArrayList[Any]
      var totalRows = 0L
      var nBatches = 0
      if (rbP != 0) {
        val vec = indirect(rbP, fLo, fHi)
        val count = le32(vec)
        if (count < 0 || count > (1 << 20)) throw Bad
        nBatches = count
        var b = 0
        while (b < count) {
          val bp = vec + 4 + 24 * b
          val off = le64(bp)
          val metaLen = le32(bp + 8)
          val bodyLen = le64(bp + 16)
          if (off < 8 || metaLen <= 0 || bodyLen < 0 ||
            off + metaLen + bodyLen > n - 10) throw Bad
          val o = off.toInt
          // message flatbuffer slice: v5 has the 0xFFFFFFFF prefix
          val (msgLo, msgLen) =
            if (le32(o) == -1) (o + 8, le32(o + 4))
            else (o + 4, le32(o))
          if (msgLen <= 0 || msgLo + msgLen > o + metaLen) throw Bad
          val msgHi = msgLo + msgLen
          val bodyStart = o + metaLen
          val msg = indirect(msgLo, msgLo, msgHi)
          val htP = fieldPos(msg, 1, msgLo, msgHi) // header_type
          val ht = if (htP == 0) 0 else bytes(htP) & 0xff
          if (ht != 3) throw Bad // expected a RecordBatch
          val hP = fieldPos(msg, 2, msgLo, msgHi)
          val rb = indirect(hP, msgLo, msgHi)
          // BodyCompression: codec 0 = LZ4_FRAME, 1 = ZSTD; method
          // must be the per-buffer default
          var comp = -1
          val cP = fieldPos(rb, 3, msgLo, msgHi)
          if (cP != 0) {
            val ct = indirect(cP, msgLo, msgHi)
            val codecP = fieldPos(ct, 0, msgLo, msgHi)
            comp = if (codecP == 0) 0 else bytes(codecP) & 0xff
            val methodP = fieldPos(ct, 1, msgLo, msgHi)
            if (methodP != 0 && bytes(methodP) != 0) throw Bad
            if (comp != 0 && comp != 1) throw Bad
          }
          val rows = le64(fieldPos(rb, 0, msgLo, msgHi) match {
            case 0 => throw Bad
            case p => p
          })
          if (rows < 0 || rows > (1 << 28)) throw Bad
          val nodesP = fieldPos(rb, 1, msgLo, msgHi)
          val bufsP = fieldPos(rb, 2, msgLo, msgHi)
          if (nodesP == 0 || bufsP == 0) throw Bad
          val nodes = indirect(nodesP, msgLo, msgHi)
          val bufs = indirect(bufsP, msgLo, msgHi)
          val nNodes = le32(nodes)
          val nBufs = le32(bufs)
          if (nNodes != nFields) throw Bad
          // pre-order buffer index of the target column
          var bufIdx = 0
          i = 0
          while (i < target) { bufIdx += ftypes(i).nBuffers; i += 1 }
          if (bufIdx + tType.nBuffers > nBufs) throw Bad
          def buffer(k: Int): (Long, Long) = {
            val p = bufs + 4 + 16 * (bufIdx + k)
            if (p + 16 > msgHi) throw Bad
            (le64(p), le64(p + 8))
          }
          val nodeP = nodes + 4 + 16 * target
          if (nodeP + 16 > msgHi) throw Bad
          val nullCount = le64(nodeP + 8)
          // materialize a buffer: slice when plain, decompress when
          // the batch declares BodyCompression (per-buffer 8-byte LE
          // uncompressed-length prefix; -1 means stored raw)
          def bufferBytes(k: Int): Array[Byte] = {
            val (bOff, bLen) = buffer(k)
            if (bLen == 0) return Array.emptyByteArray
            if (bOff < 0 || bLen < 0 ||
              bodyStart + bOff + bLen > o + metaLen + bodyLen) throw Bad
            val st = (bodyStart + bOff).toInt
            if (comp < 0)
              java.util.Arrays.copyOfRange(bytes, st, st + bLen.toInt)
            else {
              if (bLen < 8) throw Bad
              var ul = 0L
              var k2 = 7
              while (k2 >= 0) {
                ul = (ul << 8) | (bytes(st + k2) & 0xffL)
                k2 -= 1
              }
              if (ul == -1L)
                java.util.Arrays.copyOfRange(bytes, st + 8, st + bLen.toInt)
              else {
                if (ul < 0 || ul > (1 << 28)) throw Bad
                val packed = java.util.Arrays.copyOfRange(
                  bytes, st + 8, st + bLen.toInt)
                val outB =
                  if (comp == 0) FrameCodecs.lz4Frame(packed, ul.toInt)
                  else ZstdPayload.compute(packed, ul.toInt)
                if (outB == null || outB.length != ul) throw Bad
                outB
              }
            }
          }
          def aLe16(a: Array[Byte], p: Int): Int =
            (a(p) & 0xff) | ((a(p + 1) & 0xff) << 8)
          def aLe32(a: Array[Byte], p: Int): Int =
            (a(p) & 0xff) | ((a(p + 1) & 0xff) << 8) |
              ((a(p + 2) & 0xff) << 16) | ((a(p + 3) & 0xff) << 24)
          def aLe64(a: Array[Byte], p: Int): Long = {
            var v = 0L
            var k = 7
            while (k >= 0) { v = (v << 8) | (a(p + k) & 0xffL); k -= 1 }
            v
          }
          val validity = bufferBytes(0)
          if (validity.length == 0 && nullCount != 0) throw Bad
          if (validity.length != 0 && validity.length.toLong * 8 < rows)
            throw Bad
          def isValid(r: Int): Boolean =
            validity.length == 0 ||
              ((validity(r >> 3) >> (r & 7)) & 1) != 0

          tType.kind match {
            case 0 | 1 | 4 => // fixed width / bool
              val d = bufferBytes(1)
              val w = tType.bits
              if (d.length.toLong * 8 < rows * w) throw Bad
              var r = 0
              while (r < rows && out.size() < maxVals) {
                if (!isValid(r)) out.add(null)
                else out.add(UTF8String.fromString(tType.kind match {
                  case 4 =>
                    if (((d(r >> 3) >> (r & 7)) & 1) != 0)
                      "true" else "false"
                  case 1 =>
                    if (w == 32)
                      java.lang.Float.intBitsToFloat(aLe32(d, 4 * r))
                        .toString
                    else
                      java.lang.Double.longBitsToDouble(aLe64(d, 8 * r))
                        .toString
                  case _ =>
                    val raw = w match {
                      case 8 => d(r).toLong
                      case 16 => (aLe16(d, 2 * r).toShort).toLong
                      case 32 => aLe32(d, 4 * r).toLong
                      case _ => aLe64(d, 8 * r)
                    }
                    if (tType.signed) raw.toString
                    else w match {
                      case 8 => (raw & 0xffL).toString
                      case 16 => (raw & 0xffffL).toString
                      case 32 => (raw & 0xffffffffL).toString
                      case _ => java.lang.Long.toUnsignedString(raw)
                    }
                }))
                r += 1
              }
            case _ => // utf8 / binary: offsets int32 + data
              val op = bufferBytes(1)
              val dBuf = bufferBytes(2)
              if (op.length.toLong < (rows + 1) * 4) throw Bad
              var r = 0
              while (r < rows && out.size() < maxVals) {
                if (!isValid(r)) out.add(null)
                else {
                  val s = aLe32(op, 4 * r)
                  val e = aLe32(op, 4 * (r + 1))
                  if (s < 0 || e < s || e > dBuf.length) throw Bad
                  if (tType.kind == 2)
                    out.add(UTF8String.fromBytes(
                      java.util.Arrays.copyOfRange(dBuf, s, e)))
                  else {
                    val sb = new java.lang.StringBuilder(2 * (e - s))
                    var q = s
                    while (q < e) {
                      sb.append("%02x".format(dBuf(q) & 0xff))
                      q += 1
                    }
                    out.add(UTF8String.fromString(sb.toString))
                  }
                }
                r += 1
              }
          }
          totalRows += rows
          b += 1
        }
      }
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(tType.name), nBatches, totalRows,
        new GenericArrayData(out.toArray)))
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; value materialization capped at
    * 65536 by default. */
  def apply(payload: Column, column: String, maxVals: Int = 1 << 16): Column =
    ColumnShim.column(
      ArrowColumnValues(ColumnShim.expression(payload), column, maxVals))
}
